// MSB-first bitstream reader with Exp-Golomb support.
//
// Capability counterpart of the reference bitreader
// (/root/reference/libde265/bitstream.h:30-62); independent design: we keep a
// 64-bit MSB-aligned cache and a sticky error flag instead of sentinel return
// values, so parser code can batch-check `ok()` once per syntax structure.
#pragma once

#include "tde265/common.h"

namespace tde265 {

class BitReader {
 public:
  BitReader() = default;
  BitReader(const u8* data, size_t size) { reset(data, size); }

  void reset(const u8* data, size_t size) {
    start_ = data;
    p_ = data;
    end_ = data + size;
    cache_ = 0;
    ncache_ = 0;
    overrun_ = false;
    refill();
  }

  // Read n bits (0..32), MSB first. Returns 0 and sets error on overrun.
  u32 u(int n) {
    assert(n >= 0 && n <= 32);
    if (n == 0) return 0;
    if (ncache_ < n) refill();
    if (ncache_ < n) { overrun_ = true; return 0; }
    u32 v = (u32)(cache_ >> (64 - n));
    cache_ <<= n;
    ncache_ -= n;
    return v;
  }

  u32 peek(int n) {
    assert(n >= 1 && n <= 32);
    if (ncache_ < n) refill();
    return (u32)(cache_ >> (64 - n));  // zero-padded past end
  }

  void skip(int n) { (void)u(n); }

  // Exp-Golomb. Spec 9.2 (ue(v)/se(v)).
  u32 ue() {
    int zeros = 0;
    while (peek(1) == 0 && !overrun_) {
      skip(1);
      zeros++;
      if (zeros > 32) { overrun_ = true; return 0; }
    }
    if (overrun_) return 0;
    skip(1);  // the terminating 1
    if (zeros == 0) return 0;
    u32 suffix = u(zeros);
    // value = 2^zeros - 1 + suffix
    return ((1u << zeros) - 1) + suffix;
  }

  i32 se() {
    u32 k = ue();
    // map: 0->0, 1->1, 2->-1, 3->2, 4->-2 ...
    i32 m = (i32)((k + 1) >> 1);
    return (k & 1) ? m : -m;
  }

  bool get_flag() { return u(1) != 0; }

  // Number of whole bits consumed from the start of the buffer.
  i64 bits_consumed() const {
    return ((p_ - start_) * 8) - ncache_;
  }
  i64 bits_remaining() const {
    return ((end_ - p_) * 8) + ncache_;
  }
  bool byte_aligned() const { return (bits_consumed() & 7) == 0; }

  // rbsp_trailing_bits present and only zero bits remain? (spec 7.3.2.11 /
  // more_rbsp_data() of 7.2)
  bool more_rbsp_data() const;

  bool ok() const { return !overrun_; }
  void set_error() { overrun_ = true; }

  // Byte pointer to current (aligned) position; used to hand the rest of the
  // payload to the CABAC engine.
  const u8* aligned_ptr() const {
    assert(byte_aligned());
    return p_ - ncache_ / 8;
  }
  const u8* end() const { return end_; }

 private:
  void refill() {
    while (ncache_ <= 56 && p_ < end_) {
      cache_ |= (u64)(*p_++) << (56 - ncache_);
      ncache_ += 8;
    }
  }

  const u8* start_ = nullptr;
  const u8* p_ = nullptr;
  const u8* end_ = nullptr;
  u64 cache_ = 0;   // MSB-aligned
  int ncache_ = 0;  // valid bits in cache
  bool overrun_ = false;
};

}  // namespace tde265
