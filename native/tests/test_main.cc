// Tiny self-registering test harness (pattern from the reference dev-tools
// harness, /root/reference/dev-tools/tests.cc:28-60, re-implemented).
#include "test_harness.h"

#include <cstdio>
#include <cstring>

namespace tde265::testing {

static TestCase* g_head = nullptr;

TestCase::TestCase(const char* name, void (*fn)()) : name_(name), fn_(fn) {
  next_ = g_head;
  g_head = this;
}

int g_failures = 0;
const char* g_current = "";

int run_all(const char* filter) {
  int n_run = 0, n_fail = 0;
  for (TestCase* t = g_head; t; t = t->next_) {
    if (filter && !strstr(t->name_, filter)) continue;
    g_failures = 0;
    g_current = t->name_;
    t->fn_();
    n_run++;
    if (g_failures) {
      n_fail++;
      fprintf(stderr, "[FAIL] %s (%d failures)\n", t->name_, g_failures);
    } else {
      fprintf(stderr, "[ ok ] %s\n", t->name_);
    }
  }
  fprintf(stderr, "%d tests, %d failed\n", n_run, n_fail);
  return n_fail ? 1 : 0;
}

}  // namespace tde265::testing

int main(int argc, char** argv) {
  const char* filter = argc > 1 ? argv[1] : nullptr;
  return tde265::testing::run_all(filter);
}
