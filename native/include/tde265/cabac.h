// CABAC binary arithmetic decoder + HEVC context model table.
//
// Capability counterpart of /root/reference/libde265/cabac.{h,cc} and
// contextmodel.{h,cc}.  Independent design: the decoding engine implements
// the spec 9.3.4.3 register semantics (9-bit range/offset with bit-serial
// renormalization from a 64-bit cache) rather than the reference's 16-bit
// sliding-window registers; bypass runs are decoded in batches straight from
// the cache, which is where HEVC spends most of its bypass bins.
#pragma once

#include <cstring>

#include "tde265/common.h"

namespace tde265 {

struct ContextModel {
  // merged (pStateIdx << 1) | valMps: ONE byte load/store per bin in
  // decode_bin, with a single 256-entry transition table covering the
  // state advance AND the state-0 MPS flip
  u8 sm = 0;
  bool operator==(const ContextModel& o) const { return sm == o.sm; }
};

// Spec Tables 9-46/9-47, shared by the decoder and encoder engines.
extern const u8 kCabacRangeTabLps[64][4];
extern const u8 kCabacTransIdxMps[64];
extern const u8 kCabacTransIdxLps[64];
// merged (is_lps << 6) | state transition table (fast path)
extern const u8 kCabacNextState[128];
// merged-byte transition: index (is_lps << 7) | sm -> next sm
extern const u8 kCabacNextSm[256];

// Context table layout: one enum of offsets, sized kNumContexts total.
// Grouping mirrors HEVC Table 9-4 syntax elements.
enum CtxIdx : int {
  CTX_SAO_MERGE_FLAG = 0,           // 1
  CTX_SAO_TYPE_IDX,                 // 1
  CTX_SPLIT_CU_FLAG,                // 3
  CTX_CU_TRANSQUANT_BYPASS = CTX_SPLIT_CU_FLAG + 3,  // 1
  CTX_CU_SKIP_FLAG,                 // 3
  CTX_PRED_MODE_FLAG = CTX_CU_SKIP_FLAG + 3,  // 1
  CTX_PART_MODE,                    // 4
  CTX_PREV_INTRA_LUMA_PRED = CTX_PART_MODE + 4,  // 1
  CTX_INTRA_CHROMA_PRED_MODE,       // 1
  CTX_RQT_ROOT_CBF,                 // 1
  CTX_MERGE_FLAG,                   // 1
  CTX_MERGE_IDX,                    // 1
  CTX_INTER_PRED_IDC,               // 5
  CTX_REF_IDX_LX = CTX_INTER_PRED_IDC + 5,  // 2
  CTX_MVP_LX_FLAG = CTX_REF_IDX_LX + 2,     // 1
  CTX_ABS_MVD_GREATER0,             // 1
  CTX_ABS_MVD_GREATER1,             // 1
  CTX_SPLIT_TRANSFORM_FLAG,         // 3
  CTX_CBF_LUMA = CTX_SPLIT_TRANSFORM_FLAG + 3,  // 2
  CTX_CBF_CHROMA = CTX_CBF_LUMA + 2,            // 4
  CTX_TRANSFORM_SKIP_LUMA = CTX_CBF_CHROMA + 4, // 1
  CTX_TRANSFORM_SKIP_CHROMA,        // 1
  CTX_CU_QP_DELTA_ABS,              // 2
  CTX_LAST_SIG_X_PREFIX = CTX_CU_QP_DELTA_ABS + 2,  // 18
  CTX_LAST_SIG_Y_PREFIX = CTX_LAST_SIG_X_PREFIX + 18,  // 18
  CTX_CODED_SUB_BLOCK_FLAG = CTX_LAST_SIG_Y_PREFIX + 18,  // 4
  CTX_SIG_COEFF_FLAG = CTX_CODED_SUB_BLOCK_FLAG + 4,      // 42 + 2 (skip mode)
  CTX_COEFF_ABS_GT1 = CTX_SIG_COEFF_FLAG + 44,  // 24
  CTX_COEFF_ABS_GT2 = CTX_COEFF_ABS_GT1 + 24,   // 6
  CTX_RDPCM_FLAG = CTX_COEFF_ABS_GT2 + 6,       // 2
  CTX_RDPCM_DIR = CTX_RDPCM_FLAG + 2,           // 2
  CTX_LOG2_RES_SCALE_ABS = CTX_RDPCM_DIR + 2,   // 8
  CTX_RES_SCALE_SIGN = CTX_LOG2_RES_SCALE_ABS + 8,  // 2
  CTX_CU_CHROMA_QP_OFFSET_FLAG = CTX_RES_SCALE_SIGN + 2,  // 1
  CTX_CU_CHROMA_QP_OFFSET_IDX,      // 1
  kNumContexts,
};

struct ContextTable {
  ContextModel m[kNumContexts];

  // initType: 0 for I slices, 1/2 per slice type + cabac_init_flag
  // (spec Table 9-4 ctxIdx init mapping).
  void init(int init_type, int slice_qp_y);

  ContextModel& operator[](int i) { return m[i]; }
  bool operator==(const ContextTable& o) const {
    return memcmp(m, o.m, sizeof(m)) == 0;
  }
};

// bin-level debug tracing (TDE_BIN_TRACE); implemented in cabac.cc
extern bool g_bin_trace;
void bin_trace(const char* kind, int bin, const void* ctx);

class CabacDecoder {
 public:
  void init(const u8* data, size_t len) {
    p_ = data;
    end_ = data + len;
    cache_ = 0;
    ncache_ = 0;
    range_ = 510;
    offset_ = read_bits(9);
  }

  // Spec 9.3.4.3.2 DecodeDecision.  The MPS/LPS selection is branchless
  // (the bin value IS the entropy, so that branch is inherently
  // unpredictable — the reference resorts to inline asm here,
  // /root/reference/libde265/cabac.cc:186-257); state advances through the
  // merged kCabacNextState table with no data-dependent branch.
  inline int decode_bin(ContextModel* m) {
    u32 q = (range_ >> 6) & 3;
    u32 sm = m->sm;
    u32 lps = kCabacRangeTabLps[sm >> 1][q];
    u32 rmps = range_ - lps;
    u32 is_lps = (u32)(-(i32)(offset_ >= rmps));  // all-ones on the LPS path
    int bin = (int)((sm ^ is_lps) & 1);
    offset_ -= rmps & is_lps;
    range_ = rmps ^ ((rmps ^ lps) & is_lps);
    m->sm = kCabacNextSm[(is_lps & 128) | sm];
    // RenormD, all shifts at once: range_ is in [2,255] when renorm is needed.
    if (range_ < 256) {
      int n = 8 - ilog2_of(range_);
      range_ <<= n;
      offset_ = (offset_ << n) | read_bits(n);
    }
    if (g_bin_trace) bin_trace("ctx", bin, m);
    return bin;
  }

  // Spec 9.3.4.3.4 DecodeBypass.
  inline int decode_bypass() {
    offset_ = (offset_ << 1) | read_bits(1);
    int b = 0;
    if (offset_ >= range_) {
      offset_ -= range_;
      b = 1;
    }
    if (g_bin_trace) bin_trace("byp", b, nullptr);
    return b;
  }

  // n bypass bins at once (MSB first).  Bypass decoding is a pure binary
  // expansion against a fixed range, so k bins reduce to ONE integer
  // division: after shifting k fresh bits into the offset, the bin string
  // is offset / range (< 2^k since offset < range beforehand) and the new
  // offset is the remainder — replacing k data-dependent-branch iterations.
  inline u32 decode_bypass_bits(int n) {
    u32 v = 0;
    while (n > 0) {
      int k = min_i(n, 16);
      offset_ = (offset_ << k) | read_bits(k);
      u32 bits = offset_ / range_;
      offset_ -= bits * range_;
      if (g_bin_trace)
        for (int i = k - 1; i >= 0; i--) bin_trace("byp", (bits >> i) & 1, nullptr);
      v = (v << k) | bits;
      n -= k;
    }
    return v;
  }

  // coeff_abs_level_remaining (spec 9.3.3.9): truncated-rice prefix +
  // EG(rice) hybrid.  Bypass bins are the binary expansion of the
  // offset/range fraction, so SIXTEEN of them are one integer division;
  // the whole prefix+terminator+suffix decodes from that lookahead in
  // the common case (the bit-serial prefix loop is a data-dependent
  // branch per bin — inherently mispredicted).  Unconsumed bins are
  // pushed back exactly (nested-floor identity: the quotient of the
  // truncated window equals the truncated quotient).  Returns -1 on a
  // corrupt >32-bit prefix.
  inline i32 decode_coeff_remaining(int rice) {
    if (g_bin_trace) return decode_coeff_remaining_slow(rice);
    u32 v = (offset_ << 16) | read_bits(16);
    u32 q = v / range_;
    int prefix = __builtin_clz(~(q << 16));  // leading ones, <= 16
    int j;
    i32 rem;
    if (prefix <= 3) {
      j = prefix + 1 + rice;
      rem = (i32)((u32)(prefix << rice) +
                  ((q >> (16 - j)) & ((1u << rice) - 1)));
    } else if (prefix < 16 && 2 * prefix - 2 + rice <= 16) {
      int nb = prefix - 3 + rice;
      j = prefix + 1 + nb;
      u32 suf = (q >> (16 - j)) & ((1u << nb) - 1);
      rem = (i32)((((1u << (prefix - 3)) + 2u) << rice) + suf);
    } else {
      // rare long prefix: push the whole window back, go bit-serial
      unread_bits(16, v & 0xFFFF);
      return decode_coeff_remaining_slow(rice);
    }
    offset_ = (v >> (16 - j)) - (q >> (16 - j)) * range_;
    unread_bits(16 - j, v & ((1u << (16 - j)) - 1));
    return rem;
  }

  i32 decode_coeff_remaining_slow(int rice) {
    int prefix = 0;
    while (decode_bypass()) {
      prefix++;
      if (prefix > 32) return -1;
    }
    if (prefix <= 3)
      return (i32)((u32)(prefix << rice) + decode_bypass_bits(rice));
    return (i32)((((1u << (prefix - 3)) + 2u) << rice) +
                 decode_bypass_bits(prefix - 3 + rice));
  }

  // Spec 9.3.4.3.5 DecodeTerminate.
  inline int decode_terminate() {
    range_ -= 2;
    if (g_bin_trace) bin_trace("trm", offset_ >= range_, nullptr);
    if (offset_ >= range_) return 1;
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | read_bits(1);
    }
    return 0;
  }

  // Truncated-rice / EGk helpers used by residual coding (spec 9.3.3.x).
  inline u32 decode_TU_bypass(int cmax) {
    for (int i = 0; i < cmax; i++) {
      if (decode_bypass() == 0) return i;
    }
    return cmax;
  }
  inline u32 decode_EGk_bypass(int k) {
    int zeros = 0;
    while (decode_bypass()) zeros++;
    // value = (2^zeros - 1) << k + bits(zeros + k)
    u32 v = ((1u << zeros) - 1) << k;
    if (zeros + k > 0) v += decode_bypass_bits(zeros + k);
    return v;
  }

  const u8* current_byte() const { return p_; }
  // First byte not consumed by the arithmetic engine (= ceil of the consumed
  // bit position).  This is where PCM sample data begins (spec 9.3.1
  // re-initialization point after pcm_flag).
  const u8* pcm_ptr() const { return p_ - (ncache_ >> 3); }

 private:
  static inline int ilog2_of(u32 v) {
    return 31 - __builtin_clz(v);
  }
  inline u32 read_bits(int n) {
    if (ncache_ < n) {
      if (end_ - p_ >= 8) {
        // bulk refill: one 64-bit byte-swapped load tops the cache up with
        // every whole byte that fits (vs the byte-at-a-time tail loop)
        u64 b;
        memcpy(&b, p_, 8);
        b = __builtin_bswap64(b);
        int k = (63 - ncache_) >> 3;  // bytes inserted
        b &= ~0ull << (64 - 8 * k);
        cache_ |= b >> ncache_;
        ncache_ += 8 * k;
        p_ += k;
      } else {
        while (ncache_ <= 56) {
          u64 b = (p_ < end_) ? *p_++ : 0;  // feed zeros past the end
          cache_ |= b << (56 - ncache_);
          ncache_ += 8;
        }
      }
    }
    u32 v = (u32)(cache_ >> (64 - n));
    cache_ <<= n;
    ncache_ -= n;
    return v;
  }

  // Push back the last n bits read (values in the low n of `bits`).
  inline void unread_bits(int n, u32 bits) {
    if (!n) return;
    cache_ = (cache_ >> n) | ((u64)bits << (64 - n));
    ncache_ += n;
  }

  const u8* p_ = nullptr;
  const u8* end_ = nullptr;
  u64 cache_ = 0;
  int ncache_ = 0;
  u32 range_ = 510;
  u32 offset_ = 0;
};

}  // namespace tde265
