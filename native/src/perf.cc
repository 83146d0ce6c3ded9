// SIGPROF PC sampler (TDE_PROF=<outfile>).  The decode hot loops are
// bit-serial CABAC code where stage timers (perf.h Scope) are too coarse
// and this environment has no perf(1); sampling the interrupted PC at
// ITIMER_PROF frequency gives line-level attribution after addr2line.
#define _GNU_SOURCE 1
#include <dlfcn.h>
#include <signal.h>
#include <sys/time.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <ucontext.h>

#include "tde265/perf.h"

namespace tde265 {
namespace perf {

namespace {

constexpr int kMaxSamples = 1 << 21;  // 2M samples (~35 min at 1 kHz)
uintptr_t* g_samples = nullptr;
volatile int g_nsamples = 0;
const char* g_out = nullptr;

void on_prof(int, siginfo_t*, void* uc_v) {
  if (!g_samples || g_nsamples >= kMaxSamples) return;
  ucontext_t* uc = (ucontext_t*)uc_v;
#if defined(__x86_64__)
  uintptr_t pc = (uintptr_t)uc->uc_mcontext.gregs[REG_RIP];
#elif defined(__aarch64__)
  uintptr_t pc = (uintptr_t)uc->uc_mcontext.pc;
#else
  uintptr_t pc = 0;
#endif
  g_samples[g_nsamples++] = pc;
}

}  // namespace

void prof_start() {
  const char* out = getenv("TDE_PROF");
  if (!out || !*out) return;
  g_out = out;
  g_samples = (uintptr_t*)malloc(kMaxSamples * sizeof(uintptr_t));
  struct sigaction sa;
  memset(&sa, 0, sizeof(sa));
  sa.sa_sigaction = on_prof;
  sa.sa_flags = SA_SIGINFO | SA_RESTART;
  sigaction(SIGPROF, &sa, nullptr);
  struct itimerval tv;
  tv.it_interval.tv_sec = 0;
  tv.it_interval.tv_usec = 1000;  // ~1 kHz of CPU time
  tv.it_value = tv.it_interval;
  setitimer(ITIMER_PROF, &tv, nullptr);
}

void prof_report() {
  if (!g_out || !g_samples) return;
  struct itimerval off;
  memset(&off, 0, sizeof(off));
  setitimer(ITIMER_PROF, &off, nullptr);
  // aggregate per (module, offset)
  std::map<std::pair<const char*, uintptr_t>, int> hist;
  std::map<const char*, int> mod_count;
  for (int i = 0; i < g_nsamples; i++) {
    Dl_info info;
    if (dladdr((void*)g_samples[i], &info) && info.dli_fname) {
      uintptr_t off_addr = g_samples[i] - (uintptr_t)info.dli_fbase;
      hist[{info.dli_fname, off_addr}]++;
      mod_count[info.dli_fname]++;
    }
  }
  FILE* f = fopen(g_out, "w");
  if (!f) return;
  fprintf(f, "# %d samples\n", g_nsamples);
  for (auto& [mod, cnt] : mod_count)
    fprintf(f, "# module %s %d\n", mod, cnt);
  for (auto& [key, cnt] : hist)
    fprintf(f, "%s+0x%zx %d\n", key.first, key.second, cnt);
  fclose(f);
  free(g_samples);
  g_samples = nullptr;
}

}  // namespace perf
}  // namespace tde265
