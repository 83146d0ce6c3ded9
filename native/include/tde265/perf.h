// Env-gated stage profiler (TDE_PERF=1): accumulates wall time per decode
// stage and prints a summary at decoder teardown.  Zero overhead when the
// env var is unset (single branch on a cached flag).
#pragma once

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>

namespace tde265 {
namespace perf {

enum Stage {
  kParse = 0,
  kIntra,
  kTransform,
  kInter,
  kDeblock,
  kSao,
  kOther,
  // parse sub-stages (nested inside kParse; subtract when summing)
  kResidual,
  kNumStages,
};

inline const char* stage_name(int s) {
  static const char* names[] = {"parse",   "intra", "transform", "inter",
                                "deblock", "sao",   "other",
                                "-residual"};
  return names[s];
}

inline uint64_t g_ns[kNumStages] = {};
inline uint64_t g_calls[kNumStages] = {};

inline bool enabled() {
  static const bool on = [] {
    const char* e = getenv("TDE_PERF");
    return e && *e && *e != '0';
  }();
  return on;
}

class Scope {
 public:
  explicit Scope(Stage s) : s_(s), on_(enabled()) {
    if (on_) t0_ = std::chrono::steady_clock::now();
  }
  ~Scope() {
    if (on_) {
      auto dt = std::chrono::steady_clock::now() - t0_;
      g_ns[s_] += (uint64_t)
          std::chrono::duration_cast<std::chrono::nanoseconds>(dt).count();
      g_calls[s_]++;
    }
  }

 private:
  Stage s_;
  bool on_;
  std::chrono::steady_clock::time_point t0_;
};

// --- PC sampling profiler (TDE_PROF=out.txt): SIGPROF at ~1 kHz records
// the interrupted program counter; teardown dumps "module+offset count"
// lines for offline addr2line aggregation (scripts/profile_lines.py).
// This box has no perf(1); this is the line-level profiler for the hot
// CABAC/syntax loops. ---
void prof_start();
void prof_report();

inline void report() {
  if (!enabled()) return;
  uint64_t total = 0;
  for (int s = 0; s < kNumStages; s++) total += g_ns[s];
  if (!total) return;
  fprintf(stderr, "TDE_PERF stage breakdown:\n");
  for (int s = 0; s < kNumStages; s++) {
    if (!g_calls[s]) continue;
    fprintf(stderr, "  %-10s %8.1f ms  (%5.1f%%)  %9llu calls\n",
            stage_name(s), g_ns[s] / 1e6, 100.0 * g_ns[s] / total,
            (unsigned long long)g_calls[s]);
  }
}

}  // namespace perf
}  // namespace tde265
