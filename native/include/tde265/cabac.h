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
// One-load decode_bin table: index (sm << 2) | qRangeIdx ->
//   lps | (next_sm_mps << 8) | (next_sm_lps << 16).  Folding both possible
// next states into the SAME load as the LPS range keeps the context-model
// update off the load path: the late is_lps result only picks a shift
// amount instead of indexing a second table (2 KB, L1-resident).
extern u32 kCabacPacked[512];

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

// Engine state layout: one 64-bit register `ov_` fuses the 9-bit arithmetic
// offset with up to 55 bits of bitstream lookahead below it:
//   ov_ = offset * 2^navail_ + (next navail_ bits of the stream)
// Renormalization then consumes lookahead bits by *decrementing navail_* —
// no cache shuffling on the per-bin path; `refill()` tops the register up
// from the byte stream only every ~5 renorms.  All invariants keep ov_
// within 64 bits: offset < range_ <= 510 (9 bits) and navail_ <= 55, and
// every public op enters with navail_ >= 16 (refill() restores this), so a
// 16-bit bypass batch or coeff_remaining window never underflows.
class CabacDecoder {
 public:
  void init(const u8* data, size_t len) {
    p_ = data;
    end_ = data + len;
    ov_ = 0;
    navail_ = 0;
    range_ = 510;
    refill();       // navail_ in [48,55] (zero-fed past end on tiny inputs)
    navail_ -= 9;   // top 9 bits become the arithmetic offset
  }

  // Spec 9.3.4.3.2 DecodeDecision.  The MPS/LPS selection is branchless
  // (the bin value IS the entropy, so that branch is inherently
  // unpredictable — the reference resorts to inline asm here,
  // /root/reference/libde265/cabac.cc:186-257); state advances through the
  // merged kCabacNextState table with no data-dependent branch.
  inline int decode_bin(ContextModel* m) {
    u32 sm = m->sm;
    u32 pk = kCabacPacked[(sm << 2) | ((range_ >> 6) & 3)];
    u32 lps = pk & 0xff;
    u32 rmps = range_ - lps;
    // rmps <= 510 and navail_ <= 55 so rmps << navail_ < 2^64.
    u64 big = (u64)rmps << navail_;
    u64 is_lps64 = (u64)(-(i64)(ov_ >= big));  // all-ones on the LPS path
    u32 is_lps = (u32)is_lps64;
    int bin = (int)((sm ^ is_lps) & 1);
    ov_ -= big & is_lps64;
    range_ = rmps ^ ((rmps ^ lps) & is_lps);
    // next state rides in the pk word already loaded: is_lps only selects
    // a shift (ALU) instead of indexing a second table (load latency on the
    // repeated-context store->load chain, common in sig-flag runs)
    m->sm = (u8)(pk >> (8 + (is_lps & 8)));
    // RenormD, all shifts at once and UNconditionally: range_ >= 256 gives
    // n = 0, so the inherently entropy-correlated "renorm needed" branch
    // disappears (the MPS/LPS branch is already branchless above).
    int n = 8 - ilog2_of(range_);
    range_ <<= n;
    navail_ -= n;
    if (navail_ < 16) refill();
    if (__builtin_expect(g_bin_trace, 0)) bin_trace("ctx", bin, m);
    return bin;
  }

  // Spec 9.3.4.3.4 DecodeBypass.
  inline int decode_bypass() {
    navail_ -= 1;
    u64 big = (u64)range_ << navail_;
    int b = 0;
    if (ov_ >= big) {
      ov_ -= big;
      b = 1;
    }
    if (navail_ < 16) refill();
    if (__builtin_expect(g_bin_trace, 0)) bin_trace("byp", b, nullptr);
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
      int k = min_i(n, 16);  // navail_ >= 16 on op entry, so k fits
      navail_ -= k;
      u32 off = (u32)(ov_ >> navail_);  // offset<<k | k fresh bits, < 2^25
      u32 bits = off / range_;
      ov_ -= (u64)(bits * range_) << navail_;
      if (navail_ < 16) refill();
      if (__builtin_expect(g_bin_trace, 0))
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
  // branch per bin — inherently mispredicted).  With the fused
  // offset+lookahead register this is a pure peek: the window is read
  // without consuming, and only the j bins actually used are consumed
  // (nested-floor identity: the quotient of the truncated window equals
  // the truncated quotient).  Returns -1 on a corrupt >32-bit prefix.
  inline i32 decode_coeff_remaining(int rice) {
    if (__builtin_expect(g_bin_trace, 0)) return decode_coeff_remaining_slow(rice);
    u32 v = (u32)(ov_ >> (navail_ - 16));  // offset<<16 | 16-bit peek, < 2^25
    u32 q = v / range_;
    int prefix = __builtin_clz(~(q << 16));  // leading ones, <= 16
    int j;
    i32 rem;
    if (prefix <= 3) {
      j = prefix + 1 + rice;
      if (j > 16) return decode_coeff_remaining_slow(rice);  // rice >= 13
      rem = (i32)((u32)(prefix << rice) +
                  ((q >> (16 - j)) & ((1u << rice) - 1)));
    } else if (prefix < 16 && 2 * prefix - 2 + rice <= 16) {
      int nb = prefix - 3 + rice;
      j = prefix + 1 + nb;
      u32 suf = (q >> (16 - j)) & ((1u << nb) - 1);
      rem = (i32)((((1u << (prefix - 3)) + 2u) << rice) + suf);
    } else {
      // rare long prefix: nothing was consumed, go bit-serial
      return decode_coeff_remaining_slow(rice);
    }
    u32 offj = (v >> (16 - j)) - (q >> (16 - j)) * range_;
    navail_ -= j;
    ov_ = ((u64)offj << navail_) | (ov_ & (((u64)1 << navail_) - 1));
    if (navail_ < 16) refill();
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
    u64 big = (u64)range_ << navail_;
    if (__builtin_expect(g_bin_trace, 0)) bin_trace("trm", ov_ >= big, nullptr);
    if (ov_ >= big) return 1;
    if (range_ < 256) {
      int n = 8 - ilog2_of(range_);
      range_ <<= n;
      navail_ -= n;
      if (navail_ < 16) refill();
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
  // re-initialization point after pcm_flag).  navail_ lookahead bits are
  // unconsumed, so the consumed position is navail_ bits behind p_.
  const u8* pcm_ptr() const { return p_ - (navail_ >> 3); }

 private:
  static inline int ilog2_of(u32 v) {
    return 31 - __builtin_clz(v);
  }
  // Top the lookahead up to navail_ in [48,55] (whole bytes only; feeds
  // zeros past the end like the spec's infinite-zero tail).  Called only
  // when navail_ dropped below 16 — roughly every 4-5 renorms.
  inline void refill() {
    if (end_ - p_ >= 8) {
      // one 64-bit byte-swapped load supplies all inserted bytes
      u64 b;
      memcpy(&b, p_, 8);
      b = __builtin_bswap64(b);
      int k = (55 - navail_) >> 3;  // bytes inserted, navail_ stays <= 55
      ov_ = (ov_ << (8 * k)) | (b >> (64 - 8 * k));
      navail_ += 8 * k;
      p_ += k;
    } else {
      while (navail_ <= 47) {
        u64 b = (p_ < end_) ? *p_++ : 0;  // feed zeros past the end
        ov_ = (ov_ << 8) | b;
        navail_ += 8;
      }
    }
  }

  const u8* p_ = nullptr;
  const u8* end_ = nullptr;
  u64 ov_ = 0;      // offset * 2^navail_ + lookahead bits
  int navail_ = 0;  // lookahead bits held below the offset, in [16,55]
  u32 range_ = 510;
};

}  // namespace tde265
