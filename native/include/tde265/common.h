// tde265 — TPU-native HEVC decoder, host-side core.
//
// Common types and small helpers. Counterpart of the reference's util.h
// (/root/reference/libde265/util.h:60-95) but independently designed: we use
// a narrow error-code enum and keep all spec-math helpers constexpr.
#pragma once

#include <cstdint>
#include <cstddef>
#include <cassert>

namespace tde265 {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i8 = int8_t;
using i16 = int16_t;
using i32 = int32_t;
using i64 = int64_t;

// Error codes. Numeric values of the public C API mirror de265.h; internally
// we use this richer enum and map at the API boundary (capi.cc).
enum class Err : int {
  OK = 0,
  NoSuchFile,
  BitstreamOverrun,       // read past end of NAL payload
  InvalidSyntax,          // value out of spec range
  MissingSPS,
  MissingPPS,
  MissingRefPic,
  ChecksumMismatch,
  UnsupportedFeature,
  ImageBufferFull,
  WaitingForInput,
  LimitExceeded,          // security limit hit
  EndOfStream,
  InternalError,
};

constexpr int clip3(int lo, int hi, int v) { return v < lo ? lo : (v > hi ? hi : v); }
constexpr int clip_u8(int v) { return clip3(0, 255, v); }
constexpr int clip_bd(int v, int bd) { return clip3(0, (1 << bd) - 1, v); }
constexpr int sign3(int v) { return v > 0 ? 1 : (v < 0 ? -1 : 0); }
constexpr int abs_i(int v) { return v < 0 ? -v : v; }
constexpr int min_i(int a, int b) { return a < b ? a : b; }
constexpr int max_i(int a, int b) { return a > b ? a : b; }

// floor(log2(v)) for v>=1
constexpr int ilog2(u32 v) {
  int r = 0;
  while (v > 1) { v >>= 1; r++; }
  return r;
}
// ceil(log2(v))
constexpr int ilog2_ceil(u32 v) {
  int r = 0;
  while ((1u << r) < v) r++;
  return r;
}
constexpr int ceil_div(int a, int b) { return (a + b - 1) / b; }

}  // namespace tde265
