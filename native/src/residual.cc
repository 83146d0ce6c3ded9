#include <cstdio>
#include <cstdlib>
// residual_coding (spec 7.3.8.11) — parses one channel's coefficients and
// emits a TuRec + sparse coefficient list into the FrameProgram.
// Behavior counterpart of /root/reference/libde265/slice.cc:2943-3457.
#include <cstring>

#include "tde265/decoder.h"
#include "tde265/perf.h"
#include "tde265/syntax.h"

namespace tde265 {

namespace {

// sig_coeff_flag context map for 4x4 TUs (spec 9.3.4.2.5), indexed 4*y+x.
const u8 kSigCtx4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8};

}  // namespace

// shared with the encoder's residual writer (syntax.h)
int sig_ctx_inc(int log2_size, int cidx, int xc, int yc, int prev_csbf,
                int scan_idx) {
  int sig;
  if (log2_size == 2) {
    sig = kSigCtx4x4[(yc << 2) + xc];
  } else if (xc + yc == 0) {
    sig = 0;
  } else {
    int xp = xc & 3, yp = yc & 3;
    switch (prev_csbf) {
      case 0: sig = (xp + yp >= 3) ? 0 : (xp + yp > 0) ? 1 : 2; break;
      case 1: sig = (yp == 0) ? 2 : (yp == 1) ? 1 : 0; break;
      case 2: sig = (xp == 0) ? 2 : (xp == 1) ? 1 : 0; break;
      default: sig = 2; break;
    }
    if (cidx == 0) {
      if ((xc >> 2) + (yc >> 2) > 0) sig += 3;
      if (log2_size == 3)
        sig += (scan_idx == 0) ? 9 : 15;
      else
        sig += 21;
    } else {
      sig += (log2_size == 3) ? 9 : 12;
    }
  }
  return (cidx == 0) ? sig : 27 + sig;
}

namespace {

int intra_scan_idx(int log2_size, int mode, int cidx, const Sps& sps) {
  if (log2_size == 2 ||
      (log2_size == 3 && (cidx == 0 || sps.chroma_array_type == 3))) {
    if (mode >= 6 && mode <= 14) return 2;   // vertical scan
    if (mode >= 22 && mode <= 30) return 1;  // horizontal scan
  }
  return 0;
}

}  // namespace

bool SliceParser::residual_coding(int x0, int y0, int log2_size, int cidx) {
  perf::Scope ps(perf::kResidual);
  const int size = 1 << log2_size;
  static const bool trace = getenv("TDE_RES_TRACE") != nullptr;

  if (cidx == 0) {
    // mark nonzero-coefficient flag over the TU area (deblock bS input)
    int n4 = max_i(1, size >> 2);
    for (int y = 0; y < n4; y++)
      for (int x = 0; x < n4; x++) {
        int px = (x0 >> 2) + x, py = (y0 >> 2) + y;
        if (px < frame_->pb_w && py < frame_->pb_h)
          frame_->nonzero_coeff[py * frame_->pb_w + px] |= 1;
      }
  }

  // --- transform_skip_flag ---
  int tskip = 0;
  if (pps_->transform_skip_enabled && !cu_transquant_bypass_ &&
      log2_size <= pps_->log2_max_transform_skip_block_size) {
    tskip = cabac_.decode_bin(
        &ctx_[cidx == 0 ? CTX_TRANSFORM_SKIP_LUMA : CTX_TRANSFORM_SKIP_CHROMA]);
  }
  transform_skip_flag_[cidx] = (u8)tskip;

  // --- explicit RDPCM (RExt, inter) ---
  explicit_rdpcm_flag_ = false;
  if (!cu_is_intra_ && sps_->explicit_rdpcm_enabled &&
      (tskip || cu_transquant_bypass_)) {
    explicit_rdpcm_flag_ =
        cabac_.decode_bin(&ctx_[CTX_RDPCM_FLAG + (cidx ? 1 : 0)]) != 0;
    if (explicit_rdpcm_flag_)
      explicit_rdpcm_dir_ =
          cabac_.decode_bin(&ctx_[CTX_RDPCM_DIR + (cidx ? 1 : 0)]) != 0;
  }

  int sb_type = (cidx == 0) ? 2 : 0;
  if (tskip || cu_transquant_bypass_) sb_type++;

  // --- last significant coefficient position ---
  auto decode_last_prefix = [&](int ctx_base) {
    int cmax = (log2_size << 1) - 1;
    int ctx_offset, ctx_shift;
    if (cidx == 0) {
      ctx_offset = 3 * (log2_size - 2) + ((log2_size - 1) >> 2);
      ctx_shift = (log2_size + 1) >> 2;
    } else {
      ctx_offset = 15;
      ctx_shift = log2_size - 2;
    }
    int v = 0;
    while (v < cmax &&
           cabac_.decode_bin(&ctx_[ctx_base + ctx_offset + (v >> ctx_shift)]))
      v++;
    return v;
  };
  int last_x_prefix = decode_last_prefix(CTX_LAST_SIG_X_PREFIX);
  int last_y_prefix = decode_last_prefix(CTX_LAST_SIG_Y_PREFIX);

  int last_x = last_x_prefix, last_y = last_y_prefix;
  if (last_x_prefix > 3) {
    int nbits = (last_x_prefix >> 1) - 1;
    last_x = ((2 + (last_x_prefix & 1)) << nbits) + (int)cabac_.decode_bypass_bits(nbits);
  }
  if (last_y_prefix > 3) {
    int nbits = (last_y_prefix >> 1) - 1;
    last_y = ((2 + (last_y_prefix & 1)) << nbits) + (int)cabac_.decode_bypass_bits(nbits);
  }

  // --- scan selection ---
  int scan_idx = 0;
  if (cu_is_intra_) {
    int mode = (cidx == 0)
                   ? frame_->intra_pred_mode[(y0 >> 2) * frame_->pb_w + (x0 >> 2)]
                   : frame_->intra_mode_c[(y0 >> 2) * frame_->pb_w + (x0 >> 2)];
    scan_idx = intra_scan_idx(log2_size, mode, cidx, *sps_);
  }
  if (scan_idx == 2) std::swap(last_x, last_y);
  if (trace) printf("RES (%d,%d) s%d c%d scan%d last=%d,%d\n", x0, y0, size, cidx, scan_idx, last_x, last_y);

  const ScanPos* scan_sub = scan_order(log2_size - 2, scan_idx);
  const ScanPos* scan_pos = scan_order(2, scan_idx);

  // --- find last sub-block / last scan pos (inverse-scan LUTs) ---
  int sb_w = 1 << (log2_size - 2);
  if (last_x >= size || last_y >= size) return false;
  int last_sb = scan_order_inv(log2_size - 2, scan_idx)
      [((last_y >> 2) << (log2_size - 2)) + (last_x >> 2)];
  int last_scan_pos =
      scan_order_inv(2, scan_idx)[((last_y & 3) << 2) + (last_x & 3)];

  u8 csbf_neighbors[8 * 8];
  memset(csbf_neighbors, 0, sb_w * sb_w);

  // per-TU RDPCM / sign-hiding context
  bool implicit_rdpcm = false;
  int rdpcm_dir = 0;  // 1 horizontal, 2 vertical
  if (cu_is_intra_) {
    int mode = (cidx == 0)
                   ? frame_->intra_pred_mode[(y0 >> 2) * frame_->pb_w + (x0 >> 2)]
                   : frame_->intra_mode_c[(y0 >> 2) * frame_->pb_w + (x0 >> 2)];
    if (sps_->implicit_rdpcm_enabled && (cu_transquant_bypass_ || tskip) &&
        (mode == 10 || mode == 26)) {
      implicit_rdpcm = true;
      rdpcm_dir = (mode == 26) ? 2 : 1;
    }
  } else if (explicit_rdpcm_flag_) {
    rdpcm_dir = explicit_rdpcm_dir_ ? 2 : 1;
  }

  u32 coeff_start = (u32)prog_->coeff_val.size();
  int c1 = 1;

  for (int i = last_sb; i >= 0; i--) {
    int sx = scan_sub[i].x, sy = scan_sub[i].y;
    int infer_sb_dc = 0;
    int sb_coded = 1;

    if (i < last_sb && i > 0) {
      int csbf_ctx = (csbf_neighbors[sx + sy * sb_w] & 1) |
                     (csbf_neighbors[sx + sy * sb_w] >> 1);
      sb_coded = cabac_.decode_bin(
          &ctx_[CTX_CODED_SUB_BLOCK_FLAG + (cidx ? 2 : 0) + csbf_ctx]);
      infer_sb_dc = 1;
    }
    if (sb_coded) {
      if (sx > 0) csbf_neighbors[sx - 1 + sy * sb_w] |= 1;
      if (sy > 0) csbf_neighbors[sx + (sy - 1) * sb_w] |= 2;
    } else {
      continue;
    }

    // --- significance flags ---
    i16 coeff_base[16];   // base level 1..3
    i8 coeff_pos_[16];    // scan pos within sub-block, descending
    i8 has_max_base[16];
    i8 sign_arr[16];
    int n_coeffs = 0;

    int prev_csbf = csbf_neighbors[sx + sy * sb_w];

    int first_coded = (i == last_sb) ? last_scan_pos - 1 : 15;
    if (i == last_sb) {
      coeff_base[0] = 1;
      has_max_base[0] = 1;
      coeff_pos_[0] = (i8)last_scan_pos;
      n_coeffs = 1;
    }

    bool skip_ctx = sps_->transform_skip_context_enabled &&
                    (cu_transquant_bypass_ || tskip);

    // per-sub-block significance context: a static inner-position pattern
    // (function of prev_csbf and the 4x4 position only) plus a constant
    // base offset per sub-block — no per-coefficient branch tree
    i16 ctx_lut[16];
    if (skip_ctx) {
      for (int n = 0; n < 16; n++) ctx_lut[n] = (i16)(cidx == 0 ? 42 : 43);
    } else if (log2_size == 2) {
      for (int n = 0; n < 16; n++)
        ctx_lut[n] = (i16)((cidx ? 27 : 0) +
                           kSigCtx4x4[(scan_pos[n].y << 2) + scan_pos[n].x]);
    } else {
      // kSigInner[prev_csbf][4*yp+xp] (spec 9.3.4.2.5 position patterns)
      static const i8 kSigInner[4][16] = {
          {2, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0},
          {2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0},
          {2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0},
          {2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2}};
      int base = cidx == 0
                     ? (((sx | sy) ? 3 : 0) +
                        (log2_size == 3 ? (scan_idx == 0 ? 9 : 15) : 21))
                     : (27 + (log2_size == 3 ? 9 : 12));
      const i8* inner = kSigInner[prev_csbf];
      for (int n = 0; n < 16; n++)
        ctx_lut[n] = (i16)(base +
                           inner[(scan_pos[n].y << 2) + scan_pos[n].x]);
      if ((sx | sy) == 0) ctx_lut[0] = (i16)(cidx == 0 ? 0 : 27);
    }

    for (int n = first_coded; n > 0; n--) {
      int ctx_inc = ctx_lut[n];
      if (cabac_.decode_bin(&ctx_[CTX_SIG_COEFF_FLAG + ctx_inc])) {
        coeff_base[n_coeffs] = 1;
        has_max_base[n_coeffs] = 1;
        coeff_pos_[n_coeffs] = (i8)n;
        n_coeffs++;
        infer_sb_dc = 0;
      }
    }

    // DC significance
    if (first_coded >= 0) {
      if (!infer_sb_dc) {
        int ctx_inc = ctx_lut[0];
        if (cabac_.decode_bin(&ctx_[CTX_SIG_COEFF_FLAG + ctx_inc])) {
          coeff_base[n_coeffs] = 1;
          has_max_base[n_coeffs] = 1;
          coeff_pos_[n_coeffs] = 0;
          n_coeffs++;
        }
      } else {
        coeff_base[n_coeffs] = 1;
        has_max_base[n_coeffs] = 1;
        coeff_pos_[n_coeffs] = 0;
        n_coeffs++;
      }
    }

    if (!n_coeffs) continue;
    if (trace) {
      printf("  sb %d n%d pos:", i, n_coeffs);
      for (int k = 0; k < n_coeffs; k++) printf(" %d", coeff_pos_[k]);
      printf("\n");
    }

    // --- greater-1 flags (max 8) ---
    int ctx_set = (i == 0 || cidx > 0) ? 0 : 2;
    if (c1 == 0) ctx_set++;
    c1 = 1;

    int last_gt1_idx = -1;
    int n_gt1 = min_i(8, n_coeffs);
    for (int c = 0; c < n_gt1; c++) {
      int ctx_inc = ctx_set * 4 + min_i(c1, 3);
      if (cidx > 0) ctx_inc += 16;
      int gt1 = cabac_.decode_bin(&ctx_[CTX_COEFF_ABS_GT1 + ctx_inc]);
      if (gt1) {
        coeff_base[c]++;
        c1 = 0;
        if (last_gt1_idx == -1) last_gt1_idx = c;
      } else {
        has_max_base[c] = 0;
        if (c1 < 3 && c1 > 0) c1++;
      }
    }
    // (coefficients beyond the first 8 keep has_max_base=1: no gt1 flag coded)

    // --- greater-2 flag (one per sub-block) ---
    if (last_gt1_idx != -1) {
      int ctx_inc = ctx_set + (cidx > 0 ? 4 : 0);
      int gt2 = cabac_.decode_bin(&ctx_[CTX_COEFF_ABS_GT2 + ctx_inc]);
      coeff_base[last_gt1_idx] += (i16)gt2;
      has_max_base[last_gt1_idx] = (i8)gt2;
    }

    // --- signs ---
    bool sign_hidden;
    if (cu_transquant_bypass_ || implicit_rdpcm || explicit_rdpcm_flag_) {
      sign_hidden = false;
    } else {
      sign_hidden = (coeff_pos_[0] - coeff_pos_[n_coeffs - 1] > 3);
    }
    {
      int n_signs = (pps_->sign_data_hiding && sign_hidden) ? n_coeffs - 1
                                                            : n_coeffs;
      u32 bits = n_signs ? cabac_.decode_bypass_bits(n_signs) : 0;
      for (int n = 0; n < n_signs; n++)
        sign_arr[n] = (i8)((bits >> (n_signs - 1 - n)) & 1);
      if (n_signs < n_coeffs) sign_arr[n_coeffs - 1] = 0;
    }

    // --- remaining levels ---
    int rice = 0;
    if (sps_->persistent_rice_adaptation_enabled) rice = stat_coeff_[sb_type] / 4;
    bool first_remaining = true;
    i64 sum_level = 0;

    for (int n = 0; n < n_coeffs; n++) {
      i32 base = coeff_base[n];
      i32 remaining = 0;
      if (has_max_base[n]) {
        // bypass-coded TR/EGk hybrid (spec 9.3.3.9), batched decode
        remaining = cabac_.decode_coeff_remaining(rice);
        if (remaining < 0) return false;
        // in-block rice growth caps at 4 normally, 29 under persistent
        // rice adaptation (spec 9.3.3.9; reference slice.cc:3380-3393)
        if (base + remaining > 3 * (1 << rice))
          rice = min_i(rice + 1,
                       sps_->persistent_rice_adaptation_enabled ? 29 : 4);
        if (sps_->persistent_rice_adaptation_enabled && first_remaining) {
          u8& sc = stat_coeff_[sb_type];
          if (remaining >= (3 << (sc / 4))) {
            if (sc < 119) sc++;  // 119: largest with sc/4 <= 29
          } else if (2 * remaining < (1 << (sc / 4)) && sc > 0) {
            sc--;
          }
        }
        first_remaining = false;
      }
      i32 level = base + remaining;
      if (sign_arr[n]) level = -level;

      if (pps_->sign_data_hiding && sign_hidden) {
        sum_level += level;
        if (n == n_coeffs - 1 && (sum_level & 1)) level = -level;
      }

      int p = coeff_pos_[n];
      int xc = (sx << 2) + scan_pos[p].x;
      int yc = (sy << 2) + scan_pos[p].y;
      if (trace) printf("    coeff p%d = %d\n", p, level);
      prog_->coeff_val.push_back((i16)clip3(-32768, 32767, level));
      prog_->coeff_pos.push_back((u16)((yc << 6) | xc));
    }
  }

  // --- emit the TU record ---
  TuRec tu;
  if (cidx == 0) {
    tu.x = (u16)x0;
    tu.y = (u16)y0;
    tu.qp = (i8)(qp_y_ + sps_->qp_bd_offset_luma);
  } else {
    tu.x = (u16)(x0 / sps_->sub_width_c);
    tu.y = (u16)(y0 / sps_->sub_height_c);
    tu.qp = (i8)get_chroma_qp(qp_y_, cidx);
  }
  tu.log2_size = (u8)log2_size;
  tu.cidx = (u8)cidx;
  if (cidx != 0) tu.cross_comp_scale = (i8)cur_res_scale_;
  tu.coeff_start = coeff_start;
  tu.ncoeff = (u16)(prog_->coeff_val.size() - coeff_start);
  u8 flags = 0;
  if (tskip) flags |= TuRec::kTransformSkip;
  if (cu_transquant_bypass_) flags |= TuRec::kTransquantBypass;
  if (cu_is_intra_) flags |= TuRec::kIntra;
  if (log2_size == 2 && cidx == 0 && cu_is_intra_) flags |= TuRec::kUseDst;
  if (implicit_rdpcm || explicit_rdpcm_flag_) {
    flags |= TuRec::kRdpcm;
    if (rdpcm_dir == 2) flags |= TuRec::kRdpcmVertical;
  }
  tu.flags = flags;
  prog_->tus.push_back(tu);
  prog_->ops.push_back({Op::kAddResidual, (u32)(prog_->tus.size() - 1)});
  return true;
}

}  // namespace tde265
