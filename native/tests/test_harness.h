#pragma once

#include <cstdio>

namespace tde265::testing {

class TestCase {
 public:
  TestCase(const char* name, void (*fn)());
  const char* name_;
  void (*fn_)();
  TestCase* next_;
};

extern int g_failures;
extern const char* g_current;
int run_all(const char* filter);

}  // namespace tde265::testing

#define TDE_TEST(name)                                        \
  static void tde_test_##name();                              \
  static ::tde265::testing::TestCase tde_case_##name(#name, tde_test_##name); \
  static void tde_test_##name()

#define TDE_CHECK(cond)                                                     \
  do {                                                                      \
    if (!(cond)) {                                                          \
      fprintf(stderr, "  CHECK failed: %s (%s:%d in %s)\n", #cond, __FILE__, \
              __LINE__, ::tde265::testing::g_current);                      \
      ::tde265::testing::g_failures++;                                      \
    }                                                                       \
  } while (0)

#define TDE_CHECK_EQ(a, b)                                                   \
  do {                                                                       \
    auto tde_va_ = (a);                                                      \
    auto tde_vb_ = (b);                                                      \
    if (!(tde_va_ == tde_vb_)) {                                             \
      fprintf(stderr, "  CHECK_EQ failed: %s=%lld vs %s=%lld (%s:%d in %s)\n", \
              #a, (long long)tde_va_, #b, (long long)tde_vb_, __FILE__,      \
              __LINE__, ::tde265::testing::g_current);                       \
      ::tde265::testing::g_failures++;                                       \
    }                                                                        \
  } while (0)
