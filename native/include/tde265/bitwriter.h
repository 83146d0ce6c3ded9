// Bitstream writer + CABAC binary arithmetic encoder (spec 9.3.4.3 encoding
// process).  Capability counterpart of the write-side of
// /root/reference/libde265/bitstream.{h,cc} and cabac.h:105-212
// (CABAC_encoder_bitstream); independent implementation following the spec's
// PutBit/RenormE/EncodeFlush procedures, with RBSP emulation prevention
// applied at NAL assembly.
#pragma once

#include <cmath>
#include <vector>

#include "tde265/cabac.h"
#include "tde265/common.h"

namespace tde265 {

class BitWriter {
 public:
  void write_bits(u32 value, int n) {
    assert(n >= 0 && n <= 32);
    for (int i = n - 1; i >= 0; i--) put_bit((value >> i) & 1);
  }
  void put_bit(int b) {
    cur_ = (u8)((cur_ << 1) | b);
    nbits_++;
    if (nbits_ == 8) {
      data_.push_back(cur_);
      cur_ = 0;
      nbits_ = 0;
    }
  }
  void write_uvlc(u32 value) {
    u64 v = (u64)value + 1;
    int bits = 0;
    while ((v >> bits) > 1) bits++;
    write_bits(0, bits);
    write_bits((u32)v, bits + 1);
  }
  void write_svlc(i32 value) {
    u32 k = (value <= 0) ? (u32)(-2 * value) : (u32)(2 * value - 1);
    write_uvlc(k);
  }
  void write_flag(bool b) { put_bit(b ? 1 : 0); }

  // rbsp_trailing_bits / byte_alignment(): stop bit + zero padding
  void trailing_bits() {
    put_bit(1);
    while (nbits_ != 0) put_bit(0);
  }
  void byte_align_zero() {
    while (nbits_ != 0) put_bit(0);
  }
  bool byte_aligned() const { return nbits_ == 0; }
  size_t bit_position() const { return data_.size() * 8 + nbits_; }

  void append_bytes(const u8* p, size_t n) {
    assert(byte_aligned());
    data_.insert(data_.end(), p, p + n);
  }

  const std::vector<u8>& rbsp() const { return data_; }
  void clear() {
    data_.clear();
    cur_ = 0;
    nbits_ = 0;
  }

  // Positional snapshot for trial-encode rollback (RD search): restoring
  // truncates everything written after pos() was taken.
  struct Pos {
    size_t bytes = 0;
    u8 cur = 0;
    int nbits = 0;
  };
  Pos pos() const { return {data_.size(), cur_, nbits_}; }
  void restore(const Pos& p) {
    data_.resize(p.bytes);
    cur_ = p.cur;
    nbits_ = p.nbits;
  }
  // Re-apply a previously captured byte tail on top of `base` (the bytes
  // written after base already embed base's partial byte, so appending
  // them verbatim and restoring the final partial byte reproduces the
  // post-trial stream exactly).
  void set_tail(const Pos& base, const std::vector<u8>& tail, u8 cur,
                int nbits) {
    data_.resize(base.bytes);
    data_.insert(data_.end(), tail.begin(), tail.end());
    cur_ = cur;
    nbits_ = nbits;
  }

 private:
  std::vector<u8> data_;
  u8 cur_ = 0;
  int nbits_ = 0;
};

// Assemble an Annex-B NAL unit: start code + 2-byte header + RBSP with
// emulation prevention (00 00 {00..03} -> 00 00 03 xx).
void append_nal(std::vector<u8>* out, int nal_type, int temporal_id,
                const std::vector<u8>& rbsp);

// ---------------------------------------------------------------------------
// CABAC encoder (spec 9.3.4.3: EncodeDecision / EncodeBypass /
// EncodeTerminate with PutBit / RenormE / EncodeFlush)
// ---------------------------------------------------------------------------
class CabacEncoder {
 public:
  explicit CabacEncoder(BitWriter* out) : out_(out) { reset(); }

  void reset() {
    low_ = 0;
    range_ = 510;
    bits_outstanding_ = 0;
    first_bit_ = true;
  }

  void encode_bin(ContextModel* m, int bin) {
    if (g_bin_trace) bin_trace("ctx", bin, m);
    u32 sm = m->sm;
    u32 lps = kCabacRangeTabLps[sm >> 1][(range_ >> 6) & 3];
    range_ -= lps;
    int is_lps = (u32)bin != (sm & 1);
    if (is_lps) {
      low_ += range_;
      range_ = lps;
    }
    m->sm = kCabacNextSm[(is_lps << 7) | sm];
    renorm();
  }

  void encode_bypass(int bin) {
    if (g_bin_trace) bin_trace("byp", bin, nullptr);
    low_ <<= 1;
    if (bin) low_ += range_;
    if (low_ >= 1024) {
      put_bit(1);
      low_ -= 1024;
    } else if (low_ < 512) {
      put_bit(0);
    } else {
      low_ -= 512;
      bits_outstanding_++;
    }
  }

  void encode_bypass_bits(u32 value, int n) {
    for (int i = n - 1; i >= 0; i--) encode_bypass((value >> i) & 1);
  }

  // bin==1 flushes the arithmetic state (used for the final
  // end_of_slice_segment_flag; the flush pattern embeds the stop bit).
  void encode_terminate(int bin) {
    if (g_bin_trace) bin_trace("trm", bin, nullptr);
    range_ -= 2;
    if (bin) {
      low_ += range_;
      // EncodeFlush (spec 9.3.4.3.6)
      range_ = 2;
      renorm();
      put_bit((low_ >> 9) & 1);
      write_raw(((low_ >> 7) & 3) | 1, 2);
      out_->byte_align_zero();
    } else {
      renorm();
    }
  }

  // Arithmetic-engine snapshot (paired with BitWriter::Pos for rollback).
  struct State {
    u32 low = 0, range = 510;
    int outstanding = 0;
    bool first = true;
  };
  State state() const {
    return {low_, range_, bits_outstanding_, first_bit_};
  }
  void set_state(const State& s) {
    low_ = s.low;
    range_ = s.range;
    bits_outstanding_ = s.outstanding;
    first_bit_ = s.first;
  }
  BitWriter* writer() const { return out_; }

  // Information written so far in 1/32768-bit units: committed bits plus
  // the fractional entropy still held in the arithmetic range (renorm keeps
  // range in [256, 512); pending info = 9 - log2(range) bits).  Only DIFFS
  // of this value are meaningful — the RD trial rate is
  // info_scaled(end) - info_scaled(start).
  u64 info_scaled() const {
    double pend = 9.0 - std::log2((double)range_);
    return 32768ull * ((u64)out_->bit_position() + (u64)bits_outstanding_) +
           (u64)(32768.0 * pend);
  }

  void encode_egk(u32 value, int k) {
    u32 v = value;
    int zeros = 0;
    while (v >= (1u << (zeros + k))) {
      v -= (1u << (zeros + k));
      zeros++;
    }
    for (int i = 0; i < zeros; i++) encode_bypass(1);
    encode_bypass(0);
    if (zeros + k > 0) encode_bypass_bits(v, zeros + k);
  }

 private:
  void renorm() {
    while (range_ < 256) {
      if (low_ >= 512) {
        put_bit(1);
        low_ -= 512;
      } else if (low_ < 256) {
        put_bit(0);
      } else {
        bits_outstanding_++;
        low_ -= 256;
      }
      range_ <<= 1;
      low_ <<= 1;
    }
  }

  void put_bit(int bit) {
    if (first_bit_) {
      first_bit_ = false;  // spec PutBit: the first output bit is suppressed
    } else {
      out_->put_bit(bit);
    }
    while (bits_outstanding_ > 0) {
      out_->put_bit(bit ^ 1);
      bits_outstanding_--;
    }
  }

  void write_raw(u32 v, int n) {
    for (int i = n - 1; i >= 0; i--) put_bit((v >> i) & 1);
  }

  BitWriter* out_;
  u32 low_ = 0;
  u32 range_ = 510;
  int bits_outstanding_ = 0;
  bool first_bit_ = true;
};

}  // namespace tde265
