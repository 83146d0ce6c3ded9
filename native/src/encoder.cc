// Intra HEVC encoder (spec-conformant Main profile bitstreams).
// Capability counterpart of /root/reference/libde265/encoder/*; see
// encoder.h for the design notes.
#include <cmath>
#include "tde265/encoder.h"

#include <algorithm>
#include <climits>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "tde265/decoder.h"
#include "tde265/md5.h"
#include "tde265/syntax.h"

namespace tde265 {

// defined in intra.cc / transform.cc (scalar backend)
void execute_intra_scalar(const FrameProgram& prog, const IntraRec& rec);
void execute_tu_scalar(const FrameProgram& prog, const TuRec& tu,
                       i32* luma_residual_cache = nullptr);
void idct_2d(i32* dst, const i16* coeffs, int nT, int bd_shift);
void idst_4x4(i32* dst, const i16* coeffs, int bd_shift);

// ---------------------------------------------------------------------------
// forward transform + quantization
// ---------------------------------------------------------------------------
// The same spec transMatrix as the inverse path; accessor defined in
// transform.cc.  Forward transform is y = M x (rows are basis functions).
namespace detail {
const i8 (*dct_matrix_32())[32];
}

void fwd_dct_2d(i32* coeffs, const i32* residual, int log2_size, int bit_depth) {
  const int n = 1 << log2_size;
  const auto* M = detail::dct_matrix_32();
  const int step = 32 / n;
  // HM-convention shifts: stage1 = log2 + bd - 9, stage2 = log2 + 6.
  int shift1 = log2_size + bit_depth - 9;
  int shift2 = log2_size + 6;
  i32 tmp[32 * 32];
  int rnd1 = 1 << (shift1 - 1);
  int rnd2 = 1 << (shift2 - 1);

  // vertical: tmp[k][x] = (sum_y M[k][y] * res[y][x] + rnd) >> shift1
  for (int k = 0; k < n; k++) {
    const i8* row = M[k * step];
    for (int x = 0; x < n; x++) {
      i64 sum = 0;
      for (int y = 0; y < n; y++) sum += (i64)row[y] * residual[y * n + x];
      tmp[k * n + x] = (i32)((sum + rnd1) >> shift1);
    }
  }
  // horizontal: coeff[k][l] = (sum_x M[l][x] * tmp[k][x] + rnd) >> shift2
  for (int k = 0; k < n; k++) {
    for (int l = 0; l < n; l++) {
      const i8* row = M[l * step];
      i64 sum = 0;
      for (int x = 0; x < n; x++) sum += (i64)row[x] * tmp[k * n + x];
      coeffs[k * n + l] = (i32)((sum + rnd2) >> shift2);
    }
  }
}

static const int kQuantScale[6] = {26214, 23302, 20560, 18396, 16384, 14564};

void quantize(i32* levels, const i32* coeffs, int n, int qp, int log2_size,
              int bit_depth, bool intra) {
  // qbits such that quantize inverts the decoder's dequant scale:
  // quantScale[i] * levelScale[i] ~= 2^20, fwd-transform DC gain is 2^7, and
  // the dequant+IDCT gain works out so qbits = 29 - bitDepth - log2 + qp/6
  // (equal to HM's QUANT_SHIFT + qp/6 + (MAX_TR_DYNAMIC_RANGE - bd - log2)).
  int qbits = 29 - bit_depth - log2_size + qp / 6;
  i64 offset = intra ? ((i64)171 << (qbits - 9)) : ((i64)85 << (qbits - 9));
  int q = kQuantScale[qp % 6];
  for (int i = 0; i < n; i++) {
    i64 a = (i64)abs_i(coeffs[i]);
    i32 lv = (i32)((a * q + offset) >> qbits);
    levels[i] = (coeffs[i] < 0) ? -lv : lv;
  }
}

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------
Encoder::Encoder(const EncoderConfig& cfg) : cfg_(cfg) {
  sps_ = std::make_shared<Sps>();
  Sps& s = *sps_;
  s.sps_id = 0;
  s.chroma_format_idc =
      (cfg.chroma_format >= 0 && cfg.chroma_format <= 3) ? cfg.chroma_format
                                                         : 1;
  s.pic_width_in_luma_samples = (cfg.width + 7) & ~7;
  s.pic_height_in_luma_samples = (cfg.height + 7) & ~7;
  s.conformance_window_flag = (s.pic_width_in_luma_samples != cfg.width) ||
                              (s.pic_height_in_luma_samples != cfg.height);
  // conformance-window offsets are in chroma units (SubWidthC/SubHeightC)
  const int sw_c = (s.chroma_format_idc == 1 || s.chroma_format_idc == 2) ? 2 : 1;
  const int sh_c = (s.chroma_format_idc == 1) ? 2 : 1;
  s.conf_win_right = (s.pic_width_in_luma_samples - cfg.width) / sw_c;
  s.conf_win_bottom = (s.pic_height_in_luma_samples - cfg.height) / sh_c;
  s.bit_depth_luma = s.bit_depth_chroma = clip3(8, 14, cfg.bit_depth);
  s.log2_max_pic_order_cnt_lsb = 8;
  const bool pyr2 = cfg.b_pyramid && cfg.pyramid_levels >= 2 &&
                    !cfg.open_gop && cfg.intra_period >= 4;
  for (int i = 0; i < kMaxSubLayers; i++) {
    s.max_dec_pic_buffering[i] = max_i(pyr2 ? 6 : 4, cfg.num_refs + 1);
    s.max_num_reorder_pics[i] = pyr2 ? 2 : (cfg.b_pyramid ? 1 : 0);
    s.max_latency_increase[i] = 0;
  }
  s.log2_min_cb_size = cfg.min_cb_log2;
  s.log2_diff_max_min_cb_size = cfg.ctb_log2 - cfg.min_cb_log2;
  s.log2_min_tb_size = 2;
  // max TB 32 (32x32 one-TU CU leaves), bounded by the CTB size
  s.log2_diff_max_min_tb_size = min_i(3, cfg.ctb_log2 - 2);
  // depth 1 lets a rect-partitioned CU keep its single CU-sized TU
  // (split_transform_flag coded as 0 instead of inferred 1)
  s.max_transform_hierarchy_depth_inter = cfg.rect_parts ? 1 : 0;
  s.max_transform_hierarchy_depth_intra = 0;
  s.scaling_list_enabled = cfg.scaling_lists;
  if (cfg.scaling_lists) s.scaling_lists.set_default();
  s.amp_enabled = cfg.amp;
  s.sao_enabled = cfg.sao;
  s.pcm_enabled = cfg.pcm;
  if (cfg.pcm) {
    s.pcm_bit_depth_luma = s.bit_depth_luma;
    s.pcm_bit_depth_chroma = s.bit_depth_chroma;
    s.log2_min_pcm_cb_size = 3;
    s.log2_max_pcm_cb_size = 5;
    s.pcm_loop_filter_disable = true;  // PCM blocks stay lossless
  }
  s.temporal_mvp_enabled = cfg.tmvp;
  s.strong_intra_smoothing_enabled = true;
  // RExt decoder-differential flags (see EncoderConfig comment)
  s.range_extension = cfg.rext_persistent_rice || cfg.rext_ts_rotation ||
                      cfg.rext_implicit_rdpcm || cfg.rext_explicit_rdpcm;
  s.transform_skip_rotation_enabled = cfg.rext_ts_rotation;
  s.implicit_rdpcm_enabled = cfg.rext_implicit_rdpcm;
  s.explicit_rdpcm_enabled = cfg.rext_explicit_rdpcm;
  s.persistent_rice_adaptation_enabled = cfg.rext_persistent_rice;
  if (cfg.rext_implicit_rdpcm) cfg_.sign_hiding = false;
  cfg_.num_refs = clip3(1, cfg.lt_ref ? 14 : 15, cfg.num_refs);
  s.compute_derived();

  pps_ = std::make_shared<Pps>();
  Pps& p = *pps_;
  p.pps_id = 0;
  p.sps_id = 0;
  p.sps = sps_;
  p.init_qp = 26;
  p.cu_qp_delta_enabled = cfg.adaptive_qp;
  p.sign_data_hiding = cfg_.sign_hiding;
  p.transform_skip_enabled = cfg.transform_skip;
  p.constrained_intra_pred = cfg.constrained_intra;
  p.log2_max_transform_skip_block_size = 2;
  p.weighted_pred = cfg.weighted_pred;
  p.weighted_bipred = cfg.weighted_pred;
  p.diff_cu_qp_delta_depth = 0;  // QP group = CTB
  p.transquant_bypass_enabled = cfg.lossless;
  p.loop_filter_across_slices = true;
  p.dependent_slice_segments_enabled = cfg.dependent_slices;
  p.log2_parallel_merge_level = 2;
  p.entropy_coding_sync_enabled = cfg.wpp;
  p.cross_component_prediction_enabled = cfg.ccp && cfg.chroma_format == 3;
  p.cb_qp_offset = clip3(-12, 12, cfg.cb_qp_offset);
  p.cr_qp_offset = clip3(-12, 12, cfg.cr_qp_offset);

  if (cfg.tile_cols > 1 || cfg.tile_rows > 1) {
    p.tiles_enabled = true;
    p.num_tile_columns = cfg.tile_cols;
    p.num_tile_rows = cfg.tile_rows;
    p.uniform_spacing = true;
    p.loop_filter_across_tiles = cfg.across_tiles;
  }
  p.compute_derived();

  recon_ = std::make_unique<Frame>();
}

void Encoder::write_headers(std::vector<u8>* out) {
  const Sps& s = *sps_;

  // --- VPS ---
  BitWriter vps;
  vps.write_bits(0, 4);   // vps_id
  vps.write_bits(3, 2);   // reserved_three_2bits
  vps.write_bits(0, 6);   // max_layers_minus1
  vps.write_bits(0, 3);   // max_sub_layers_minus1
  vps.write_flag(true);   // temporal_id_nesting
  vps.write_bits(0xFFFF, 16);
  // profile_tier_level; Main10 (profile 2) for bit depths above 8
  const int profile = (s.bit_depth_luma > 8) ? 2 : 1;
  const int level_idc =
      cfg_.level_idc > 0
          ? cfg_.level_idc
          : annex_a_min_level_idc(s.pic_width_in_luma_samples,
                                  s.pic_height_in_luma_samples,
                                  cfg_.fps_num / std::max(cfg_.fps_den, 1));
  auto write_ptl = [profile, level_idc](BitWriter& bw) {
    bw.write_bits(0, 2);       // profile_space
    bw.write_flag(false);      // tier
    bw.write_bits((u32)profile, 5);
    u32 compat = 1u << (31 - 2);  // everything conforms to Main10
    if (profile == 1) compat |= 1u << (31 - 1);
    bw.write_bits(compat, 32);
    bw.write_flag(true);       // progressive_source
    bw.write_flag(false);      // interlaced
    bw.write_flag(true);       // non_packed
    bw.write_flag(true);       // frame_only
    bw.write_bits(0, 32);      // reserved 44 bits
    bw.write_bits(0, 12);
    bw.write_bits((u32)level_idc, 8);  // general_level_idc
  };
  write_ptl(vps);
  vps.write_flag(false);  // sub_layer_ordering_info_present (== max layer only)
  vps.write_uvlc((u32)(sps_->max_dec_pic_buffering[0] - 1));
  vps.write_uvlc((u32)sps_->max_num_reorder_pics[0]);  // max_num_reorder
  vps.write_uvlc(0);      // max_latency_increase_plus1
  vps.write_bits(0, 6);   // max_layer_id
  vps.write_uvlc(0);      // num_layer_sets_minus1
  vps.write_flag(false);  // timing_info_present
  vps.write_flag(false);  // extension
  vps.trailing_bits();
  append_nal(out, NAL_VPS, 0, vps.rbsp());

  // --- SPS ---
  BitWriter sp;
  sp.write_bits(0, 4);  // vps_id
  sp.write_bits(0, 3);  // max_sub_layers_minus1
  sp.write_flag(true);  // temporal_id_nesting
  write_ptl(sp);
  sp.write_uvlc(0);  // sps_id
  sp.write_uvlc((u32)s.chroma_format_idc);
  if (s.chroma_format_idc == 3) sp.write_flag(false);  // separate_colour_plane
  sp.write_uvlc((u32)s.pic_width_in_luma_samples);
  sp.write_uvlc((u32)s.pic_height_in_luma_samples);
  sp.write_flag(s.conformance_window_flag);
  if (s.conformance_window_flag) {
    sp.write_uvlc(0);
    sp.write_uvlc((u32)s.conf_win_right);
    sp.write_uvlc(0);
    sp.write_uvlc((u32)s.conf_win_bottom);
  }
  sp.write_uvlc((u32)(s.bit_depth_luma - 8));
  sp.write_uvlc((u32)(s.bit_depth_chroma - 8));
  sp.write_uvlc((u32)(s.log2_max_pic_order_cnt_lsb - 4));
  sp.write_flag(false);  // sub_layer_ordering_info_present
  sp.write_uvlc((u32)(s.max_dec_pic_buffering[0] - 1));
  sp.write_uvlc((u32)s.max_num_reorder_pics[0]);  // num_reorder
  sp.write_uvlc(0);  // max_latency
  sp.write_uvlc((u32)(s.log2_min_cb_size - 3));
  sp.write_uvlc((u32)s.log2_diff_max_min_cb_size);
  sp.write_uvlc((u32)(s.log2_min_tb_size - 2));
  sp.write_uvlc((u32)s.log2_diff_max_min_tb_size);
  sp.write_uvlc(s.max_transform_hierarchy_depth_inter);
  sp.write_uvlc(0);  // ..._intra
  sp.write_flag(s.scaling_list_enabled);
  if (s.scaling_list_enabled)
    sp.write_flag(false);  // sps_scaling_list_data_present (use defaults)
  sp.write_flag(s.amp_enabled);  // amp
  sp.write_flag(s.sao_enabled);
  sp.write_flag(s.pcm_enabled);
  if (s.pcm_enabled) {
    sp.write_bits((u32)(s.pcm_bit_depth_luma - 1), 4);
    sp.write_bits((u32)(s.pcm_bit_depth_chroma - 1), 4);
    sp.write_uvlc((u32)(s.log2_min_pcm_cb_size - 3));
    sp.write_uvlc((u32)(s.log2_max_pcm_cb_size - s.log2_min_pcm_cb_size));
    sp.write_flag(s.pcm_loop_filter_disable);
  }
  sp.write_uvlc(0);      // num_short_term_ref_pic_sets
  sp.write_flag(cfg_.lt_ref);  // long_term_ref_pics_present
  if (cfg_.lt_ref) sp.write_uvlc(0);  // num_long_term_ref_pics_sps
  sp.write_flag(s.temporal_mvp_enabled);
  sp.write_flag(true);   // strong_intra_smoothing
  sp.write_flag(false);  // vui_present
  if (s.range_extension) {
    sp.write_flag(true);   // sps_extension_present
    sp.write_flag(true);   // sps_range_extension
    sp.write_flag(false);  // sps_multilayer_extension
    sp.write_flag(false);  // sps_3d_extension
    sp.write_bits(0, 5);   // sps_extension_5bits
    // sps_range_extension() — order mirrors params.cc:552-561
    sp.write_flag(s.transform_skip_rotation_enabled);
    sp.write_flag(false);  // transform_skip_context
    sp.write_flag(s.implicit_rdpcm_enabled);
    sp.write_flag(s.explicit_rdpcm_enabled);
    sp.write_flag(false);  // extended_precision_processing
    sp.write_flag(false);  // intra_smoothing_disabled
    sp.write_flag(false);  // high_precision_offsets
    sp.write_flag(s.persistent_rice_adaptation_enabled);
    sp.write_flag(false);  // cabac_bypass_alignment
  } else {
    sp.write_flag(false);  // extension
  }
  sp.trailing_bits();
  append_nal(out, NAL_SPS, 0, sp.rbsp());

  // --- PPS ---
  BitWriter pp;
  pp.write_uvlc(0);      // pps_id
  pp.write_uvlc(0);      // sps_id
  pp.write_flag(pps_->dependent_slice_segments_enabled);
  pp.write_flag(false);  // output_flag_present
  pp.write_bits(0, 3);   // num_extra_slice_header_bits
  pp.write_flag(pps_->sign_data_hiding);
  pp.write_flag(false);  // cabac_init_present
  pp.write_uvlc(0);      // num_ref_idx_l0_default_minus1
  pp.write_uvlc(0);      // num_ref_idx_l1_default_minus1
  pp.write_svlc(0);      // init_qp_minus26
  pp.write_flag(pps_->constrained_intra_pred);
  pp.write_flag(pps_->transform_skip_enabled);
  pp.write_flag(pps_->cu_qp_delta_enabled);
  if (pps_->cu_qp_delta_enabled) pp.write_uvlc(0);  // diff_cu_qp_delta_depth
  pp.write_svlc(pps_->cb_qp_offset);
  pp.write_svlc(pps_->cr_qp_offset);
  pp.write_flag(false);  // slice_chroma_qp_offsets_present
  pp.write_flag(pps_->weighted_pred);
  pp.write_flag(pps_->weighted_bipred);
  pp.write_flag(pps_->transquant_bypass_enabled);
  const Pps& ppr = *pps_;
  pp.write_flag(ppr.tiles_enabled);
  pp.write_flag(ppr.entropy_coding_sync_enabled);
  if (ppr.tiles_enabled) {
    pp.write_uvlc((u32)(ppr.num_tile_columns - 1));
    pp.write_uvlc((u32)(ppr.num_tile_rows - 1));
    pp.write_flag(true);  // uniform_spacing
    pp.write_flag(ppr.loop_filter_across_tiles);
  }
  pp.write_flag(true);   // loop_filter_across_slices
  pp.write_flag(ppr.deblocking_filter_control_present);
  if (ppr.deblocking_filter_control_present) {
    pp.write_flag(false);  // deblocking_filter_override_enabled
    pp.write_flag(ppr.pps_deblocking_filter_disabled);
    // (disabled -> no beta/tc offsets)
  }
  pp.write_flag(false);  // pps_scaling_list_data_present
  pp.write_flag(false);  // lists_modification_present
  pp.write_uvlc(0);      // log2_parallel_merge_level_minus2
  pp.write_flag(false);  // slice_segment_header_extension
  if (ppr.cross_component_prediction_enabled) {
    // pps_range_extension (spec 7.3.2.3.2): only CCP switched on
    pp.write_flag(true);   // pps_extension_present
    pp.write_flag(true);   // pps_range_extension
    pp.write_flag(false);  // pps_multilayer_extension
    pp.write_flag(false);  // pps_3d_extension
    for (int i = 0; i < 5; i++) pp.write_flag(false);  // pps_extension_5bits
    if (ppr.transform_skip_enabled)
      pp.write_uvlc(0);    // log2_max_transform_skip_block_size_minus2
    pp.write_flag(true);   // cross_component_prediction_enabled
    pp.write_flag(false);  // chroma_qp_offset_list_enabled
    pp.write_uvlc(0);      // log2_sao_offset_scale_luma
    pp.write_uvlc(0);      // log2_sao_offset_scale_chroma
  } else {
    pp.write_flag(false);  // pps_extension
  }
  pp.trailing_bits();
  append_nal(out, NAL_PPS, 0, pp.rbsp());
}

void Encoder::write_slice_header(BitWriter* bw, int ctb_rs,
                                 const std::vector<u32>* entry_sizes,
                                 bool dependent) {
  bool first = (ctb_rs == 0);
  bool idr = cur_is_idr_;
  bw->write_flag(first);  // first_slice_segment_in_pic_flag
  if (cur_is_intra_pic_)
    bw->write_flag(false);  // no_output_of_prior_pics (IRAP incl. CRA)
  bw->write_uvlc(0);      // pps_id
  if (!first) {
    if (pps_->dependent_slice_segments_enabled)
      bw->write_flag(dependent);  // dependent_slice_segment_flag
    int n_ctbs = sps_->pic_size_in_ctbs;
    int bits = 0;
    while ((1 << bits) < n_ctbs) bits++;
    bw->write_bits((u32)ctb_rs, bits);  // slice_segment_address
  }
  if (dependent) {
    // dependent segments inherit the whole header from the independent one
    bw->trailing_bits();
    return;
  }
  int stype = cur_is_intra_pic_ ? SLICE_I
                                : (cur_is_b_ ? SLICE_B : SLICE_P);
  bw->write_uvlc((u32)stype);
  if (!idr) {
    // non-IDR pictures (incl. CRA) carry poc_lsb + an RPS; a CRA's RPS is
    // empty (intra, no references)
    bw->write_bits((u32)(poc_ & (sps_->max_pic_order_cnt_lsb - 1)),
                   sps_->log2_max_pic_order_cnt_lsb);
    bw->write_flag(false);  // short_term_ref_pic_set_sps_flag -> inline RPS
    if (cfg_.b_pyramid) {
      // per-picture RPS from the reorder driver (negative AND positive
      // pictures — the B pictures reference the future even picture)
      // (an open-GOP CRA signals its pre-CRA keep-alive entry with
      // used_by_curr = 0 so the following RASL can still reference it)
      int nn = cur_rps_.n_neg;
      int np = cur_is_intra_pic_ ? 0 : cur_rps_.n_pos;
      bw->write_uvlc((u32)nn);
      bw->write_uvlc((u32)np);
      for (int i = 0; i < nn; i++) {
        bw->write_uvlc((u32)(cur_rps_.neg_delta[i] - 1));
        bw->write_flag(cur_rps_.neg_used[i]);
      }
      for (int i = 0; i < np; i++) {
        int prev = i ? cur_rps_.pos_delta[i - 1] : 0;
        bw->write_uvlc((u32)(cur_rps_.pos_delta[i] - prev - 1));
        bw->write_flag(cur_rps_.pos_used[i]);
      }
    } else {
    // st_ref_pic_set: the previous 1..num_refs pictures, all used
    int nrefs = cur_is_intra_pic_ ? 0 : min_i(cfg_.num_refs, since_irap_());
    bw->write_uvlc((u32)nrefs);  // num_negative_pics
    bw->write_uvlc(0);           // num_positive_pics
    for (int i = 0; i < nrefs; i++) {
      bw->write_uvlc(0);         // delta_poc_s0_minus1 (each 1 apart)
      bw->write_flag(true);      // used_by_curr_pic_s0
    }
    }
    if (cfg_.lt_ref) {
      // one long-term picture: the last IDR (not at poc 1, where the IDR
      // is already the short-term reference)
      int nlt = (!cur_is_intra_pic_ && poc_ > 1) ? 1 : 0;
      bw->write_uvlc((u32)nlt);  // num_long_term_pics
      if (nlt) {
        bw->write_bits(0, sps_->log2_max_pic_order_cnt_lsb);  // poc_lsb = 0
        bw->write_flag(true);   // used_by_curr_pic_lt
        bw->write_flag(false);  // delta_poc_msb_present
      }
    }
    if (sps_->temporal_mvp_enabled)
      // must mirror the candidate derivation's actual state: the
      // b-pyramid path runs with TMVP off (sh_->temporal_mvp_enabled =
      // false), and writing 1 here would make decoders derive a
      // temporal candidate the encoder never considered
      bw->write_flag(sh_->temporal_mvp_enabled);
  }
  if (sps_->sao_enabled) {
    bw->write_flag(true);  // slice_sao_luma
    if (sps_->chroma_array_type != 0) bw->write_flag(true);  // slice_sao_chroma
  }
  if (stype != SLICE_I) {
    int nrefs = cfg_.b_pyramid ? 1 : min_i(cfg_.num_refs, since_irap_());
    if (nrefs > 1) {
      bw->write_flag(true);  // num_ref_idx_active_override
      bw->write_uvlc((u32)(nrefs - 1));
      if (stype == SLICE_B) bw->write_uvlc((u32)(nrefs - 1));
    } else {
      bw->write_flag(false);  // defaults (= 1)
    }
    if (stype == SLICE_B) bw->write_flag(false);  // mvd_l1_zero
    if (sh_->temporal_mvp_enabled) {
      if (stype == SLICE_B) bw->write_flag(true);  // collocated_from_l0
      if (nrefs > 1) bw->write_uvlc(0);  // collocated_ref_idx
    }
    if (pps_->weighted_pred) {
      // pred_weight_table (7.3.6.3): luma weights estimated per reference,
      // chroma identity (mirrors parse_pred_weight_table)
      const WeightedPredParams& wp = sh_->wp;
      bw->write_uvlc((u32)wp.luma_log2_weight_denom);
      if (sps_->chroma_array_type != 0)
        bw->write_svlc(wp.chroma_log2_weight_denom - wp.luma_log2_weight_denom);
      int n_lists = (sh_->slice_type == SLICE_B) ? 2 : 1;
      for (int l = 0; l < n_lists; l++) {
        int n = sh_->num_ref_idx[l];
        for (int i = 0; i < n; i++)
          bw->write_flag(wp.luma_weight_flag[l][i]);
        if (sps_->chroma_array_type != 0)
          for (int i = 0; i < n; i++) bw->write_flag(false);  // chroma ident
        for (int i = 0; i < n; i++) {
          if (wp.luma_weight_flag[l][i]) {
            bw->write_svlc(wp.luma_weight[l][i] -
                           (1 << wp.luma_log2_weight_denom));
            bw->write_svlc(wp.luma_offset[l][i]);
          }
        }
      }
    }
    bw->write_uvlc(0);      // five_minus_max_num_merge_cand (= 5)
  }
  bw->write_svlc(pic_qp() - 26);  // slice_qp_delta (init_qp = 26)
  // deblocking override not enabled -> no per-slice deblock fields.
  // slice_loop_filter_across_slices present iff across-slices allowed in the
  // PPS and any in-loop filter is active (sliceheader.cc:234)
  if (pps_->loop_filter_across_slices &&
      !pps_->pps_deblocking_filter_disabled)
    bw->write_flag(true);  // slice_loop_filter_across_slices_enabled_flag
  if (pps_->tiles_enabled || pps_->entropy_coding_sync_enabled) {
    u32 n = entry_sizes ? (u32)entry_sizes->size() : 0;
    bw->write_uvlc(n);  // num_entry_point_offsets
    if (n > 0) {
      u32 maxv = 0;
      for (u32 v : *entry_sizes) maxv = maxv > v - 1 ? maxv : v - 1;
      int len = 1;
      while ((1u << len) <= maxv) len++;
      bw->write_uvlc((u32)(len - 1));  // offset_len_minus1
      for (u32 v : *entry_sizes) bw->write_bits(v - 1, len);
    }
  }
  // byte_alignment
  bw->trailing_bits();
}

// Slice-data emission with substreams (WPP rows / tiles), entry points and
// emulation-prevention-aware offsets (spec 7.4.7.1 entry_point_offset).
// Mirrors the decoder's substream walk in syntax.cc SliceParser::decode.
// Honors cfg_.ctbs_per_slice: the picture splits into independent slice
// segments along the tile-scan order, each carrying only the entry points
// of the substream boundaries it contains; WPP context inheritance at a row
// start applies only when the above-right CTB is in the same slice
// (spec 9.3.1 availability), exactly as the decoder checks it.
void Encoder::encode_slice_substreams(std::vector<u8>* out) {
  const Sps& s = *sps_;
  const Pps& p = *pps_;
  int n_ctbs = s.pic_size_in_ctbs;
  int pw = s.pic_width_in_ctbs;
  const int per_slice =
      (cfg_.ctbs_per_slice > 0) ? cfg_.ctbs_per_slice : n_ctbs;

  ContextTable wpp_saved;
  u8 wpp_saved_stat[4] = {0, 0, 0, 0};
  bool wpp_saved_valid = false;
  u16 slice_no = 0;

  for (int slice_start = 0; slice_start < n_ctbs;
       slice_start += per_slice, slice_no++) {
    const int slice_end = min_i(slice_start + per_slice, n_ctbs);  // excl, ts
    const int slice_addr = p.ctb_ts_to_rs[slice_start];

    BitWriter data_bw;
    cabac_ = std::make_unique<CabacEncoder>(&data_bw);
    ctx_.init(cur_is_intra_pic_ ? 0 : (cur_is_b_ ? 2 : 1), pic_qp());
    memset(stat_coeff_enc_, 0, 4);  // persistent-Rice stats reset per slice
    qg_first_ = true;
    qg_prev_qp_ = last_cu_qp_ = pic_qp();

    std::vector<u32> raw_bounds;  // cumulative RBSP offsets of substream ends
    for (int ts = slice_start; ts < slice_end; ts++) {
      int rs = p.ctb_ts_to_rs[ts];
      int cx = rs % pw, cy = rs / pw;
      recon_->slice_addr_rs[rs] = slice_addr;
      recon_->slice_idx[rs] = slice_no;
      if (sps_->sao_enabled) write_sao(cx, cy);
      encode_ctb(cx, cy);
      if (p.entropy_coding_sync_enabled && cx == 1) {
        wpp_saved = ctx_;
        memcpy(wpp_saved_stat, stat_coeff_enc_, 4);
        wpp_saved_valid = true;
      }
      if (ts == slice_end - 1) {
        cabac_->encode_terminate(1);  // end_of_slice_segment_flag
        break;
      }
      cabac_->encode_terminate(0);
      int next_rs = p.ctb_ts_to_rs[ts + 1];
      int next_cx = next_rs % pw, next_cy = next_rs / pw;
      bool new_row = p.entropy_coding_sync_enabled && next_cx == 0;
      bool new_tile = p.tiles_enabled && !p.same_tile(rs, next_rs);
      if (new_row || new_tile) {
        cabac_->encode_terminate(1);  // end_of_subset_one_bit (flush + align)
        raw_bounds.push_back((u32)data_bw.rbsp().size());
        cabac_ = std::make_unique<CabacEncoder>(&data_bw);
        // inherit iff the above-right CTB is available in THIS slice
        // (mirrors syntax.cc decode() row-start availability check)
        int above_rs = (next_cy - 1) * pw + min_i(1, pw - 1);
        bool inherit = new_row && !new_tile && next_cy > 0 &&
                       wpp_saved_valid && pw >= 2 &&
                       recon_->slice_addr_rs[above_rs] == slice_addr &&
                       p.same_tile(next_rs, above_rs);
        if (inherit) {
          ctx_ = wpp_saved;
          memcpy(stat_coeff_enc_, wpp_saved_stat, 4);
        } else {
          ctx_.init(cur_is_intra_pic_ ? 0 : (cur_is_b_ ? 2 : 1), pic_qp());
          memset(stat_coeff_enc_, 0, 4);
        }
        // per-substream QP-prediction reset (syntax.cc:1086-1140)
        qg_first_ = true;
        qg_prev_qp_ = last_cu_qp_ = pic_qp();
      }
    }

    emit_substream_slice_nal(out, data_bw, raw_bounds, slice_addr);
  }
}

// Entry-point fixpoint + NAL emission for one substream-carrying slice.
// entry_point_offsets are in the STUFFED byte stream; iterate since the
// header bytes (which contain the offsets) feed the emulation scan state.
void Encoder::emit_substream_slice_nal(std::vector<u8>* out,
                                       const BitWriter& data_bw,
                                       const std::vector<u32>& raw_bounds,
                                       int slice_addr) {
  std::vector<u32> stuffed = raw_bounds;
  std::vector<u8> header_rbsp;
  const std::vector<u8>& data = data_bw.rbsp();
  for (int iter = 0; iter < 4; iter++) {
    std::vector<u32> sizes(stuffed.size());
    for (size_t i = 0; i < stuffed.size(); i++)
      sizes[i] = stuffed[i] - (i ? stuffed[i - 1] : 0);
    BitWriter hb;
    write_slice_header(&hb, slice_addr, sizes.empty() ? nullptr : &sizes);
    header_rbsp = hb.rbsp();
    // simulate emulation prevention over header||data
    std::vector<u32> ns(raw_bounds.size());
    int zrun = 0;
    u32 inserted = 0;
    size_t bi = 0;
    for (u8 b : header_rbsp) {
      if (zrun >= 2 && b <= 3) zrun = 0;  // stuffed byte inside header
      zrun = (b == 0) ? zrun + 1 : 0;
    }
    for (size_t i = 0; i < data.size(); i++) {
      u8 b = data[i];
      if (zrun >= 2 && b <= 3) {
        inserted++;
        zrun = 0;
      }
      if (bi < raw_bounds.size() && raw_bounds[bi] == i) {
        ns[bi] = (u32)i + inserted;
        bi++;
      }
      zrun = (b == 0) ? zrun + 1 : 0;
    }
    if (ns == stuffed) break;
    stuffed = ns;
  }

  std::vector<u8> rbsp = header_rbsp;
  rbsp.insert(rbsp.end(), data.begin(), data.end());
  append_nal(out,
             nal_type_override_ >= 0
                 ? nal_type_override_
                 : (cur_is_intra_pic_ ? (cur_is_idr_ ? NAL_IDR_W_RADL
                                                     : NAL_CRA)
                                      : NAL_TRAIL_R),
             0, rbsp);
}

std::vector<u8> Encoder::encode_frame(const u8* y, int stride_y, const u8* cb,
                                      const u8* cr, int stride_c) {
  src16_ = false;
  return encode_frame_common(y, stride_y, cb, cr, stride_c);
}

std::vector<u8> Encoder::encode_frame16(const u16* y, int stride_y,
                                        const u16* cb, const u16* cr,
                                        int stride_c) {
  src16_ = true;
  return encode_frame_common(y, stride_y, cb, cr, stride_c);
}

std::vector<u8> Encoder::encode_frame_common(const void* y, int stride_y,
                                             const void* cb, const void* cr,
                                             int stride_c) {
  std::vector<u8> out;
  if (!headers_written_) {
    write_headers(&out);
    headers_written_ = true;
  }

  const bool gop = cfg_.intra_period > 1;
  if (!pyr_override_) pic_qp_delta_ = 0;
  if (cfg_.b_pyramid && gop && !pyr_override_) {
    if (cfg_.pyramid_levels >= 2 && !cfg_.open_gop && cfg_.intra_period >= 4)
      encode_bpyramid2_(&out, y, stride_y, cb, cr, stride_c);
    else
      encode_bpyramid_(&out, y, stride_y, cb, cr, stride_c);
    return out;
  }
  if (!pyr_override_) {
    cur_is_intra_pic_ = !gop || (frame_count_ % (u32)cfg_.intra_period == 0);
    // open GOP: intra recovery points after picture 0 are CRA (POC runs
    // on); closed GOP: every intra picture is an IDR (POC resets)
    cur_is_idr_ = cur_is_intra_pic_ && (!cfg_.open_gop || frame_count_ == 0);
    cur_is_b_ = !cur_is_intra_pic_ && cfg_.use_b_slices;
    poc_ = !gop ? 0
                : (cfg_.open_gop
                       ? (int)frame_count_
                       : (int)(frame_count_ % (u32)cfg_.intra_period));
    l1_dpb_map_[0] = 0;
    l1_dpb_map_[1] = 1;
    l1_dpb_map_[2] = 2;
    if (gop && frame_count_ > 0) {
      // rotate: recon -> ref1 -> ref2 -> hist[0] -> ... (deep DPB);
      // the expired frame's buffer is recycled as the new recon scratch
      if (!ref_frame_) ref_frame_ = std::make_unique<Frame>();
      if (!ref_frame2_) ref_frame2_ = std::make_unique<Frame>();
      if (cfg_.num_refs > 2) {
        ref_hist_.insert(ref_hist_.begin(), std::move(ref_frame2_));
        const size_t keep = (size_t)cfg_.num_refs - 2;
        if (ref_hist_.size() > keep) {
          ref_frame2_ = std::move(ref_hist_.back());
          ref_hist_.pop_back();
        } else {
          ref_frame2_ = std::make_unique<Frame>();
        }
      }
      std::swap(ref_frame2_, ref_frame_);
      std::swap(ref_frame_, recon_);
      if (!recon_) recon_ = std::make_unique<Frame>();
    }
  }

  recon_->alloc(sps_, pps_);
  recon_->poc = poc_;
  prog_.clear();
  prog_.frame = recon_.get();

  // current picture's slice header (also consumed by the motion-derivation
  // and MC machinery shared with the decoder)
  sh_ = std::make_shared<SliceHeader>();
  sh_->slice_type = cur_is_intra_pic_
                        ? SLICE_I
                        : (cur_is_b_ ? SLICE_B : SLICE_P);
  sh_->pps = pps_;
  sh_->slice_qp_y = pic_qp();
  sh_->max_num_merge_cand = 5;
  sh_->slice_index = 0;
  sh_->loop_filter_across_slices = true;
  sh_->sao_luma = sps_->sao_enabled;
  sh_->sao_chroma = sps_->sao_enabled && sps_->chroma_array_type != 0;
  sh_->deblocking_filter_disabled = pps_->pps_deblocking_filter_disabled;
  if (!cur_is_intra_pic_ && pyr_override_) {
    // reorder driver supplies the lists (distinct L0/L1 for B pictures)
    sh_->num_ref_idx[0] = cur_refs_.n0;
    for (int i = 0; i < cur_refs_.n0; i++) {
      sh_->ref_list[0][i] = cur_refs_.l0[i];
      sh_->ref_poc[0][i] = cur_refs_.poc0[i];
      prog_.ref_frames.push_back(cur_refs_.l0[i]);
    }
    sh_->num_ref_idx[1] = cur_refs_.n1;
    for (int i = 0; i < cur_refs_.n1; i++) {
      sh_->ref_list[1][i] = cur_refs_.l1[i];
      sh_->ref_poc[1][i] = cur_refs_.poc1[i];
      int at = -1;
      for (int j = 0; j < cur_refs_.n0; j++)
        if (cur_refs_.l0[j] == cur_refs_.l1[i]) at = j;
      if (at < 0) {
        at = (int)prog_.ref_frames.size();
        prog_.ref_frames.push_back(cur_refs_.l1[i]);
      }
      l1_dpb_map_[i] = at;
    }
    // TMVP rides the shared derivation (motion.cc collocated_mv) with
    // the collocated picture = L0[0]; its motion field is populated by
    // the shared recon
    sh_->temporal_mvp_enabled = sps_->temporal_mvp_enabled;
    sh_->collocated_from_l0 = true;
    sh_->collocated_ref_idx = 0;
    if (pps_->weighted_pred || pps_->weighted_bipred) {
      // identity explicit weights (the reorder driver does not run the
      // fade estimator): without this the shared recon would multiply
      // by the default-zero weights while decoders parse identity
      WeightedPredParams& wp = sh_->wp;
      wp.luma_log2_weight_denom = 6;
      wp.chroma_log2_weight_denom = 6;
      for (int l = 0; l < 2; l++)
        for (int i = 0; i < 16; i++) {
          wp.luma_weight[l][i] = 1 << 6;
          wp.chroma_weight[l][i][0] = 1 << 6;
          wp.chroma_weight[l][i][1] = 1 << 6;
        }
    }
  } else if (!cur_is_intra_pic_) {
    int nrefs = min_i(cfg_.num_refs, since_irap_());
    Frame* refs[16] = {ref_frame_.get(), ref_frame2_.get()};
    for (size_t i = 0; i + 2 < 16 && i < ref_hist_.size(); i++)
      refs[i + 2] = ref_hist_[i].get();
    sh_->num_ref_idx[0] = nrefs;
    for (int i = 0; i < nrefs; i++) {
      sh_->ref_list[0][i] = refs[i];
      sh_->ref_poc[0][i] = poc_ - 1 - i;
      if (cfg_.use_b_slices) {
        sh_->ref_list[1][i] = refs[i];
        sh_->ref_poc[1][i] = poc_ - 1 - i;
      }
      prog_.ref_frames.push_back(refs[i]);
    }
    if (cfg_.lt_ref && poc_ > 1 && lt_frame_) {
      // append the long-term IDR after the short-term refs (8.3.4 order)
      sh_->ref_list[0][nrefs] = lt_frame_.get();
      sh_->ref_poc[0][nrefs] = 0;
      sh_->ref_longterm[0][nrefs] = true;
      sh_->num_ref_idx[0] = nrefs + 1;
      prog_.ref_frames.push_back(lt_frame_.get());
      if (cfg_.use_b_slices) {
        sh_->ref_list[1][nrefs] = lt_frame_.get();
        sh_->ref_poc[1][nrefs] = 0;
        sh_->ref_longterm[1][nrefs] = true;
      }
    }
    if (cfg_.use_b_slices) sh_->num_ref_idx[1] = sh_->num_ref_idx[0];
    sh_->temporal_mvp_enabled = sps_->temporal_mvp_enabled;
    sh_->collocated_from_l0 = true;
    sh_->collocated_ref_idx = 0;

    if (pps_->weighted_pred) {
      // estimate a global luma weight/offset per reference (fade model
      // src ~ w/64 * ref + o); identity when the gain is negligible
      WeightedPredParams& wp = sh_->wp;
      wp.luma_log2_weight_denom = 6;
      wp.chroma_log2_weight_denom = 6;
      int n_lists = cfg_.use_b_slices ? 2 : 1;
      for (int l = 0; l < n_lists; l++)
        for (int i = 0; i < sh_->num_ref_idx[l]; i++) {
          wp.luma_weight[l][i] = 64;
          wp.luma_offset[l][i] = 0;
          wp.luma_weight_flag[l][i] = false;
          for (int j = 0; j < 2; j++) {
            wp.chroma_weight[l][i][j] = 64;
            wp.chroma_offset[l][i][j] = 0;
            wp.chroma_weight_flag[l][i] = false;
          }
          const Frame& rf = *sh_->ref_list[l][i];
          i64 ssum = 0, rsum = 0;
          i64 npx = (i64)cfg_.width * cfg_.height;
          for (int yy = 0; yy < cfg_.height; yy++)
            for (int xx = 0; xx < cfg_.width; xx++) {
              ssum += src_px(0, xx, yy);
              rsum += rf.bytes_pp == 1 ? *rf.px8(0, xx, yy)
                                       : *rf.px16(0, xx, yy);
            }
          if (rsum > 0) {
            int w = (int)clip3((i64)32, (i64)127, (ssum * 64 + rsum / 2) / rsum);
            int o = (int)clip3((i64)-128, (i64)127,
                               (ssum - (i64)w * rsum / 64) / npx);
            if (abs_i(w - 64) > 1 || abs_i(o) > 1) {
              wp.luma_weight[l][i] = (i16)w;
              wp.luma_offset[l][i] = (i16)o;
              wp.luma_weight_flag[l][i] = true;
            }
          }
        }
    }
  }
  picture_refs_.assign(prog_.ref_frames.begin(), prog_.ref_frames.end());
  prog_.slices.push_back(sh_);
  // the recon program needs slice-addr grids for availability checks
  for (auto& s : recon_->slice_addr_rs) s = -1;

  src_[0] = y;
  src_[1] = cb;
  src_[2] = cr;
  src_stride_[0] = stride_y;
  src_stride_[1] = src_stride_[2] = stride_c;

  if (pps_->tiles_enabled || pps_->entropy_coding_sync_enabled) {
    if (sps_->sao_enabled) {
      sao_chosen_.assign(recon_->sao.size(), SaoParams());
      std::vector<u8> scratch;
      encode_slice_substreams(&scratch);
      apply_deblocking(prog_);
      estimate_sao();
      recon_->alloc(sps_, pps_);
      recon_->poc = poc_;
      for (auto& a : recon_->slice_addr_rs) a = -1;
      prog_.clear();
      prog_.frame = recon_.get();
      prog_.slices.push_back(sh_);
      repush_refs_();
    }
    encode_slice_substreams(&out);
    if (gop || sps_->sao_enabled || cfg_.sei_hash) {
      apply_deblocking(prog_);
      if (sps_->sao_enabled) {
        recon_->sao = sao_chosen_;
        apply_sao(prog_);
      }
    }
    if (cfg_.sei_hash) append_hash_sei(&out);
    frame_count_++;
    return out;
  }

  auto encode_slice_main = [&](std::vector<u8>* outp) {
    int n_ctbs = sps_->pic_size_in_ctbs;
    int per_slice = (cfg_.ctbs_per_slice > 0) ? cfg_.ctbs_per_slice : n_ctbs;
    int slice_start = 0;
    int indep_start = 0;
    u16 slice_no = 0;
    ContextTable dep_saved;
    u8 dep_saved_stat[4] = {0, 0, 0, 0};
    const bool dep = pps_->dependent_slice_segments_enabled;
    for (int rs = 0; rs < n_ctbs; rs++) {
      if (rs == slice_start) {
        bool dependent = dep && rs > 0;
        if (!dependent) indep_start = rs;
        slice_bw_.clear();
        write_slice_header(&slice_bw_, rs, nullptr, dependent);
        cabac_ = std::make_unique<CabacEncoder>(&slice_bw_);
        if (dependent) {
          // CABAC contexts continue across dependent segments (9.3.1)
          ctx_ = dep_saved;
          memcpy(stat_coeff_enc_, dep_saved_stat, 4);
        } else {
          memset(stat_coeff_enc_, 0, 4);
          ctx_.init(cur_is_intra_pic_ ? 0 : (cur_is_b_ ? 2 : 1),
                    pic_qp());
        }
        qg_first_ = true;
        qg_prev_qp_ = last_cu_qp_ = pic_qp();
      }
      int cx = rs % sps_->pic_width_in_ctbs;
      int cy = rs / sps_->pic_width_in_ctbs;
      recon_->slice_addr_rs[rs] = indep_start;
      recon_->slice_idx[rs] = slice_no;
      if (sps_->sao_enabled) write_sao(cx, cy);
      encode_ctb(cx, cy);
      bool last_in_slice =
          (rs == n_ctbs - 1) || (rs + 1 - slice_start >= per_slice);
      cabac_->encode_terminate(last_in_slice ? 1 : 0);
      if (last_in_slice) {
        dep_saved = ctx_;
        memcpy(dep_saved_stat, stat_coeff_enc_, 4);
        append_nal(outp,
                   nal_type_override_ >= 0
                       ? nal_type_override_
                       : (cur_is_intra_pic_ ? (cur_is_idr_ ? NAL_IDR_W_RADL
                                                           : NAL_CRA)
                                            : NAL_TRAIL_R),
                   0, slice_bw_.rbsp());
        slice_start = rs + 1;
        if (!dep) slice_no++;
      }
    }
  };

  if (sps_->sao_enabled) {
    // pass 1: throwaway bitstream (all-off SAO params), then deblock the
    // reconstruction and estimate per-CTB parameters against the source
    sao_chosen_.assign(recon_->sao.size(), SaoParams());
    std::vector<u8> scratch;
    encode_slice_main(&scratch);
    apply_deblocking(prog_);
    estimate_sao();
    // reset picture state for the real pass (decisions are deterministic,
    // so pass 2 reproduces the same reconstruction before the loop filters)
    recon_->alloc(sps_, pps_);
    recon_->poc = poc_;
    for (auto& a : recon_->slice_addr_rs) a = -1;
    prog_.clear();
    prog_.frame = recon_.get();
    prog_.slices.push_back(sh_);
    repush_refs_();
  }

  encode_slice_main(&out);
  const bool filter_recon = gop || sps_->sao_enabled || cfg_.sei_hash;
  if (filter_recon) {
    apply_deblocking(prog_);
    if (sps_->sao_enabled) {
      recon_->sao = sao_chosen_;
      apply_sao(prog_);
    }
  }
  if (cfg_.sei_hash) append_hash_sei(&out);
  frame_count_++;
  return out;
}

// ---------------------------------------------------------------------------
// Hierarchical-B (IbP) reorder driver: odd display positions buffer their
// source and encode as B pictures after the following even (P) picture.
// Decode order I P b P b ...; POC = display order (max_num_reorder_pics=1).
// No reference counterpart (libde265's encoder is low-delay only).
// ---------------------------------------------------------------------------
void Encoder::encode_bpyramid_(std::vector<u8>* out, const void* y,
                               int stride_y, const void* cb, const void* cr,
                               int stride_c) {
  const u32 N = (u32)cfg_.intra_period;
  const u32 d = display_count_++;
  const int pos = (int)(d % N);

  auto rotate_even = [&]() {
    if (!bref_prev_) bref_prev_ = std::make_unique<Frame>();
    std::swap(bref_prev_, ref_frame_);
    if (!ref_frame_) ref_frame_ = std::make_unique<Frame>();
    std::swap(ref_frame_, recon_);
    if (!recon_) recon_ = std::make_unique<Frame>();
  };

  const bool og = cfg_.open_gop;  // open-GOP pyramid: CRA + RASL leading
  auto encode_now = [&](bool intra, bool is_b, int poc, const void* yy,
                        int syy, const void* cbb, const void* crr, int scc) {
    pyr_override_ = true;
    pic_qp_delta_ = is_b ? 1 : 0;  // non-anchor B: coarser QP
    cur_is_intra_pic_ = intra;
    cur_is_idr_ = intra && (!og || d == 0);
    cur_is_b_ = is_b;
    poc_ = poc;
    cur_refs_ = PicRefs();
    cur_rps_ = PicRps();
    if (intra && !cur_is_idr_ && pending_.valid && !cfg_.radl) {
      // CRA keep-alive: retain the pre-CRA even picture (the pending
      // RASL's L0 reference) in the foll set. RADL mode needs no
      // keep-alive: the leading picture references only the CRA.
      cur_rps_.n_neg = 1;
      cur_rps_.neg_delta[0] = 2;
      cur_rps_.neg_used[0] = false;
    }
    if (!intra) {
      if (is_b) {
        cur_refs_.n0 = 1;
        cur_refs_.l0[0] = bref_prev_.get();
        cur_refs_.poc0[0] = poc - 1;
        cur_refs_.n1 = 1;
        cur_refs_.l1[0] = ref_frame_.get();
        cur_refs_.poc1[0] = poc + 1;
        cur_rps_.n_neg = 1;
        cur_rps_.neg_delta[0] = 1;
        cur_rps_.n_pos = 1;
        cur_rps_.pos_delta[0] = 1;
      } else {
        cur_refs_.n0 = 1;
        cur_refs_.l0[0] = ref_frame_.get();
        cur_refs_.poc0[0] = ref_frame_->poc;
        cur_rps_.n_neg = 1;
        cur_rps_.neg_delta[0] = poc - cur_refs_.poc0[0];
      }
    }
    auto bits = encode_frame_common(yy, syy, cbb, crr, scc);
    out->insert(out->end(), bits.begin(), bits.end());
    pyr_override_ = false;
  };

  if (pos == 0) {
    if (og && d > 0 && pending_.valid) {
      // leading picture: the CRA goes first in decode order, then the
      // buffered odd picture as a RASL B referencing the pre-CRA even
      // (L0) and the CRA itself (L1) — spec 7.4.2.2 leading-picture
      // semantics, decoder counterpart decoder.cc NoRaslOutputFlag
      encode_now(true, false, (int)d, y, stride_y, cb, cr, stride_c);
      rotate_even();
      if (cfg_.radl) {
        // RADL leading P: references only the CRA (decodable on tune-in)
        nal_type_override_ = NAL_RADL_R;
        encode_pending_(out, /*as_b=*/false, /*radl_only_cra=*/true);
      } else {
        nal_type_override_ = NAL_RASL_R;
        encode_pending_(out, /*as_b=*/true);
      }
      nal_type_override_ = -1;
      return;
    }
    if (pending_.valid) encode_pending_(out, /*as_b=*/false);
    encode_now(true, false, og ? (int)d : 0, y, stride_y, cb, cr, stride_c);
    rotate_even();
    return;
  }
  if (pos % 2 == 1) {
    // buffer the odd picture; it encodes as B after the next even one
    // (or as trailing P at a GOP/stream boundary)
    PendingSrc& ps = pending_;
    ps.valid = true;
    ps.is16 = src16_;
    ps.pos = pos;
    ps.abs = (int)d;
    ps.sy = stride_y;
    ps.sc = stride_c;
    const int h = cfg_.height, ch = sps_->chroma_array_type
                                        ? cfg_.height / sps_->sub_height_c
                                        : 0;
    if (src16_) {
      const u16* yp = (const u16*)y;
      ps.y16.assign(yp, yp + (size_t)stride_y * h);
      if (ch) {
        const u16* c1 = (const u16*)cb;
        const u16* c2 = (const u16*)cr;
        ps.cb16.assign(c1, c1 + (size_t)stride_c * ch);
        ps.cr16.assign(c2, c2 + (size_t)stride_c * ch);
      }
    } else {
      const u8* yp = (const u8*)y;
      ps.y8.assign(yp, yp + (size_t)stride_y * h);
      if (ch) {
        const u8* c1 = (const u8*)cb;
        const u8* c2 = (const u8*)cr;
        ps.cb8.assign(c1, c1 + (size_t)stride_c * ch);
        ps.cr8.assign(c2, c2 + (size_t)stride_c * ch);
      }
    }
    return;
  }
  // even position: encode it as P (ref = previous even), then the pending
  // odd picture as B (refs = both surrounding evens)
  encode_now(false, false, og ? (int)d : pos, y, stride_y, cb, cr, stride_c);
  rotate_even();
  if (pending_.valid) encode_pending_(out, /*as_b=*/true);
}

void Encoder::encode_pending_(std::vector<u8>* out, bool as_b,
                              bool radl_only_cra) {
  PendingSrc ps = std::move(pending_);
  pending_ = PendingSrc();
  src16_ = ps.is16;
  pyr_override_ = true;
  pic_qp_delta_ = (as_b || radl_only_cra) ? 1 : 0;
  cur_is_intra_pic_ = false;
  cur_is_idr_ = false;
  cur_is_b_ = as_b;
  const int p = cfg_.open_gop ? ps.abs : ps.pos;
  poc_ = p;
  cur_refs_ = PicRefs();
  cur_rps_ = PicRps();
  if (radl_only_cra) {
    // RADL leading picture: L0 = {the CRA} only (forward reference,
    // positive-delta RPS) — spec 7.4.2.2 forbids RADL from referencing
    // anything that precedes its IRAP in decode order
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = ref_frame_.get();
    cur_refs_.poc0[0] = p + 1;
    cur_rps_.n_pos = 1;
    cur_rps_.pos_delta[0] = 1;
  } else if (as_b) {
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = bref_prev_.get();
    cur_refs_.poc0[0] = p - 1;
    cur_refs_.n1 = 1;
    cur_refs_.l1[0] = ref_frame_.get();
    cur_refs_.poc1[0] = p + 1;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 1;
    cur_rps_.n_pos = 1;
    cur_rps_.pos_delta[0] = 1;
  } else {
    // trailing P at a GOP/stream boundary (no future reference exists)
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = ref_frame_.get();
    cur_refs_.poc0[0] = p - 1;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 1;
  }
  std::vector<u8> bits;
  if (ps.is16)
    bits = encode_frame_common(ps.y16.data(), ps.sy,
                               ps.cb16.empty() ? nullptr : ps.cb16.data(),
                               ps.cr16.empty() ? nullptr : ps.cr16.data(),
                               ps.sc);
  else
    bits = encode_frame_common(ps.y8.data(), ps.sy,
                               ps.cb8.empty() ? nullptr : ps.cb8.data(),
                               ps.cr8.empty() ? nullptr : ps.cr8.data(),
                               ps.sc);
  out->insert(out->end(), bits.begin(), bits.end());
  pyr_override_ = false;
}

std::vector<u8> Encoder::flush_reorder() {
  std::vector<u8> out;
  if (pending_.valid) encode_pending_(&out, /*as_b=*/false);
  flush_chunk2_(&out);
  return out;
}

// ---------------------------------------------------------------------------
// Two-level hierarchical-B pyramid (closed GOP).  Display positions within
// a GOP: anchors at multiples of 4 (I/P referencing the previous anchor),
// a mid B at anchor+2 referencing both anchors, and level-2 b pictures at
// anchor+1/+3 referencing their nearest (anchor, mid) pair.  Decode order
// A4 B2 b1 b3; POC = display order; max_num_reorder_pics = 2.  No
// reference-encoder counterpart (its sop-structures are low-delay only).
// ---------------------------------------------------------------------------
void Encoder::stash_src_(PendingSrc& ps, int pos, int abs, const void* y,
                         int sy, const void* cb, const void* cr, int sc) {
  ps.valid = true;
  ps.is16 = src16_;
  ps.pos = pos;
  ps.abs = abs;
  ps.sy = sy;
  ps.sc = sc;
  const int h = cfg_.height, ch = sps_->chroma_array_type
                                      ? cfg_.height / sps_->sub_height_c
                                      : 0;
  if (src16_) {
    const u16* yp = (const u16*)y;
    ps.y16.assign(yp, yp + (size_t)sy * h);
    if (ch) {
      const u16* c1 = (const u16*)cb;
      const u16* c2 = (const u16*)cr;
      ps.cb16.assign(c1, c1 + (size_t)sc * ch);
      ps.cr16.assign(c2, c2 + (size_t)sc * ch);
    }
  } else {
    const u8* yp = (const u8*)y;
    ps.y8.assign(yp, yp + (size_t)sy * h);
    if (ch) {
      const u8* c1 = (const u8*)cb;
      const u8* c2 = (const u8*)cr;
      ps.cb8.assign(c1, c1 + (size_t)sc * ch);
      ps.cr8.assign(c2, c2 + (size_t)sc * ch);
    }
  }
}

void Encoder::encode_src_(std::vector<u8>* out, const PendingSrc& ps) {
  src16_ = ps.is16;
  std::vector<u8> bits;
  if (ps.is16)
    bits = encode_frame_common(ps.y16.data(), ps.sy,
                               ps.cb16.empty() ? nullptr : ps.cb16.data(),
                               ps.cr16.empty() ? nullptr : ps.cr16.data(),
                               ps.sc);
  else
    bits = encode_frame_common(ps.y8.data(), ps.sy,
                               ps.cb8.empty() ? nullptr : ps.cb8.data(),
                               ps.cr8.empty() ? nullptr : ps.cr8.data(),
                               ps.sc);
  out->insert(out->end(), bits.begin(), bits.end());
  pyr_override_ = false;
}

void Encoder::encode_bpyramid2_(std::vector<u8>* out, const void* y,
                                int stride_y, const void* cb, const void* cr,
                                int stride_c) {
  const u32 N = (u32)cfg_.intra_period;
  const u32 d = display_count_++;
  const int pos = (int)(d % N);
  const int ph = pos % 4;

  if (pos != 0 && ph != 0) {
    stash_src_(pend3_[ph - 1], pos, (int)d, y, stride_y, cb, cr, stride_c);
    return;
  }

  auto rotate_anchor = [&]() {
    if (!bref_prev_) bref_prev_ = std::make_unique<Frame>();
    std::swap(bref_prev_, ref_frame_);
    if (!ref_frame_) ref_frame_ = std::make_unique<Frame>();
    std::swap(ref_frame_, recon_);
    if (!recon_) recon_ = std::make_unique<Frame>();
  };

  if (pos == 0) {
    // tail of the previous GOP, then a fresh IDR (closed GOP)
    flush_chunk2_(out);
    pyr_override_ = true;
    pic_qp_delta_ = 0;
    cur_is_intra_pic_ = true;
    cur_is_idr_ = true;
    cur_is_b_ = false;
    poc_ = 0;
    cur_refs_ = PicRefs();
    cur_rps_ = PicRps();
    auto bits = encode_frame_common(y, stride_y, cb, cr, stride_c);
    out->insert(out->end(), bits.begin(), bits.end());
    pyr_override_ = false;
    rotate_anchor();
    return;
  }

  // anchor P (pos % 4 == 0): references the previous anchor
  pyr_override_ = true;
  pic_qp_delta_ = 0;
  cur_is_intra_pic_ = false;
  cur_is_idr_ = false;
  cur_is_b_ = false;
  poc_ = pos;
  cur_refs_ = PicRefs();
  cur_rps_ = PicRps();
  cur_refs_.n0 = 1;
  cur_refs_.l0[0] = ref_frame_.get();
  cur_refs_.poc0[0] = pos - 4;
  cur_rps_.n_neg = 1;
  cur_rps_.neg_delta[0] = 4;
  auto bits = encode_frame_common(y, stride_y, cb, cr, stride_c);
  out->insert(out->end(), bits.begin(), bits.end());
  pyr_override_ = false;
  rotate_anchor();  // bref_prev_ = A0, ref_frame_ = A4
  emit_chunk_bs_(out, pos);
}

void Encoder::emit_chunk_bs_(std::vector<u8>* out, int pos) {
  PendingSrc p1 = std::move(pend3_[0]);
  PendingSrc p2 = std::move(pend3_[1]);
  PendingSrc p3 = std::move(pend3_[2]);
  for (auto& p : pend3_) p = PendingSrc();

  auto begin_b = [&](int poc, int qp_delta) {
    pyr_override_ = true;
    pic_qp_delta_ = qp_delta;
    cur_is_intra_pic_ = false;
    cur_is_idr_ = false;
    cur_is_b_ = true;
    poc_ = poc;
    cur_refs_ = PicRefs();
    cur_rps_ = PicRps();
  };

  if (p2.valid) {
    // mid B: L0 = {A0}, L1 = {A4}
    begin_b(pos - 2, 1);   // mid level: +1
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = bref_prev_.get();
    cur_refs_.poc0[0] = pos - 4;
    cur_refs_.n1 = 1;
    cur_refs_.l1[0] = ref_frame_.get();
    cur_refs_.poc1[0] = pos;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 2;
    cur_rps_.n_pos = 1;
    cur_rps_.pos_delta[0] = 2;
    encode_src_(out, p2);
    if (!bmid_) bmid_ = std::make_unique<Frame>();
    std::swap(bmid_, recon_);
    if (!recon_) recon_ = std::make_unique<Frame>();
  }
  if (p1.valid) {
    // level-2 b at anchor+1: L0 = {A0}, L1 = {B2}; A4 rides the RPS as
    // a foll entry so it survives for b3
    begin_b(pos - 3, 2);   // leaf level: +2
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = bref_prev_.get();
    cur_refs_.poc0[0] = pos - 4;
    cur_refs_.n1 = 1;
    cur_refs_.l1[0] = bmid_.get();
    cur_refs_.poc1[0] = pos - 2;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 1;
    cur_rps_.n_pos = 2;
    cur_rps_.pos_delta[0] = 1;
    cur_rps_.pos_delta[1] = 3;
    cur_rps_.pos_used[1] = false;
    encode_src_(out, p1);
  }
  if (p3.valid) {
    // level-2 b at anchor+3: L0 = {B2}, L1 = {A4}
    begin_b(pos - 1, 2);   // leaf level: +2
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = bmid_.get();
    cur_refs_.poc0[0] = pos - 2;
    cur_refs_.n1 = 1;
    cur_refs_.l1[0] = ref_frame_.get();
    cur_refs_.poc1[0] = pos;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 1;
    cur_rps_.n_pos = 1;
    cur_rps_.pos_delta[0] = 1;
    encode_src_(out, p3);
  }
}

void Encoder::flush_chunk2_(std::vector<u8>* out) {
  // partial-chunk tail (GOP end or stream flush): no future anchor exists
  PendingSrc p1 = std::move(pend3_[0]);
  PendingSrc p2 = std::move(pend3_[1]);
  PendingSrc p3 = std::move(pend3_[2]);
  for (auto& p : pend3_) p = PendingSrc();
  if (!p1.valid && !p2.valid && !p3.valid) return;

  auto begin = [&](bool is_b, int poc, int qp_delta) {
    pyr_override_ = true;
    pic_qp_delta_ = qp_delta;
    cur_is_intra_pic_ = false;
    cur_is_idr_ = false;
    cur_is_b_ = is_b;
    poc_ = poc;
    cur_refs_ = PicRefs();
    cur_rps_ = PicRps();
  };

  if (p2.valid) {
    // trailing mid as P (ref = last anchor, delta 2)
    begin(false, p2.pos, 1);
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = ref_frame_.get();
    cur_refs_.poc0[0] = p2.pos - 2;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 2;
    encode_src_(out, p2);
    if (!bmid_) bmid_ = std::make_unique<Frame>();
    std::swap(bmid_, recon_);
    if (!recon_) recon_ = std::make_unique<Frame>();
  }
  if (p1.valid) {
    if (p2.valid) {
      // b between the anchor and the trailing mid; keep the mid alive
      begin(true, p1.pos, 2);
      cur_refs_.n0 = 1;
      cur_refs_.l0[0] = ref_frame_.get();
      cur_refs_.poc0[0] = p1.pos - 1;
      cur_refs_.n1 = 1;
      cur_refs_.l1[0] = bmid_.get();
      cur_refs_.poc1[0] = p1.pos + 1;
      cur_rps_.n_neg = 1;
      cur_rps_.neg_delta[0] = 1;
      cur_rps_.n_pos = 1;
      cur_rps_.pos_delta[0] = 1;
    } else {
      // lone pending: trailing P off the last anchor
      begin(false, p1.pos, 1);
      cur_refs_.n0 = 1;
      cur_refs_.l0[0] = ref_frame_.get();
      cur_refs_.poc0[0] = p1.pos - 1;
      cur_rps_.n_neg = 1;
      cur_rps_.neg_delta[0] = 1;
    }
    encode_src_(out, p1);
  }
  if (p3.valid) {
    // trailing P off the mid
    begin(false, p3.pos, 2);
    cur_refs_.n0 = 1;
    cur_refs_.l0[0] = bmid_.get();
    cur_refs_.poc0[0] = p3.pos - 1;
    cur_rps_.n_neg = 1;
    cur_rps_.neg_delta[0] = 1;
    encode_src_(out, p3);
  }
}

int Encoder::derive_qp_pred_enc(int x_qg, int y_qg) const {
  // mirrors SliceParser::derive_qp_pred (spec 8.6.1)
  Frame& f = *recon_;
  int qp_a, qp_b;
  int ctb_mask = ~(sps_->ctb_size - 1);
  if (!z_available(f, x_qg, y_qg, x_qg - 1, y_qg) ||
      ((x_qg - 1) & ctb_mask) != (x_qg & ctb_mask))
    qp_a = qg_prev_qp_;
  else
    qp_a = f.qp_y[(y_qg >> 2) * f.pb_w + ((x_qg - 1) >> 2)];
  if (!z_available(f, x_qg, y_qg, x_qg, y_qg - 1) ||
      ((y_qg - 1) & ctb_mask) != (y_qg & ctb_mask))
    qp_b = qg_prev_qp_;
  else
    qp_b = f.qp_y[((y_qg - 1) >> 2) * f.pb_w + (x_qg >> 2)];
  return (qp_a + qp_b + 1) >> 1;
}

void Encoder::set_cu_qp_grid(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int qp = cu_grid_qp();
  int n4 = 1 << (log2_size - 2);
  for (int dy = 0; dy < n4; dy++)
    for (int dx = 0; dx < n4; dx++) {
      int px = (x0 >> 2) + dx, py = (y0 >> 2) + dy;
      if (px < f.pb_w && py < f.pb_h) f.qp_y[py * f.pb_w + px] = (i8)qp;
    }
  last_cu_qp_ = qp;
}

void Encoder::maybe_write_cu_qp_delta() {
  // inverse of SliceParser::decode_cu_qp_delta (first coded TU in the QG)
  if (!pps_->cu_qp_delta_enabled || qg_delta_written_) return;
  qg_delta_written_ = true;
  int delta = cur_qp_ - qg_pred_;
  int a = abs_i(delta);
  cabac_->encode_bin(&ctx_[CTX_CU_QP_DELTA_ABS + 0], a > 0);
  if (a > 0) {
    int prefix = min_i(a, 5);
    for (int i = 1; i < prefix; i++)
      cabac_->encode_bin(&ctx_[CTX_CU_QP_DELTA_ABS + 1], 1);
    if (prefix < 5)
      cabac_->encode_bin(&ctx_[CTX_CU_QP_DELTA_ABS + 1], 0);
    if (a >= 5) cabac_->encode_egk((u32)(a - 5), 0);
    cabac_->encode_bypass(delta < 0);
  }
}

void Encoder::encode_ctb(int ctb_x, int ctb_y) {
  int x0 = ctb_x << sps_->log2_ctb_size;
  int y0 = ctb_y << sps_->log2_ctb_size;
  if (pps_->cu_qp_delta_enabled) {
    // QP-group start (QG = CTB): choose the CTB QP from luma variance and
    // cache the prediction exactly as the decoder derives it
    qg_delta_written_ = false;
    if (!qg_first_) qg_prev_qp_ = last_cu_qp_;
    qg_first_ = false;
    qg_pred_ = derive_qp_pred_enc(x0, y0);

    int n = sps_->ctb_size;
    i64 sum = 0, sum2 = 0, cnt = 0;
    for (int yy = y0; yy < min_i(y0 + n, cfg_.height); yy++)
      for (int xx = x0; xx < min_i(x0 + n, cfg_.width); xx++) {
        int v = src_px(0, xx, yy);
        sum += v;
        sum2 += (i64)v * v;
        cnt++;
      }
    i64 var = cnt ? (sum2 - sum * sum / cnt) / cnt : 0;
    // log-variance mapping into [-aq_range, +aq_range]
    int adj = 0;
    while (var > (i64)64 << (2 * adj) && adj < cfg_.aq_range) adj++;
    cur_qp_ = clip3(1, 51, pic_qp() + adj - cfg_.aq_range / 2);
  } else {
    cur_qp_ = pic_qp();
  }
  if (cfg_.split_algo == EncoderConfig::SplitAlgo::kRd)
    rd_encode_cq(x0, y0, sps_->log2_ctb_size, 0);
  else
    encode_cq(x0, y0, sps_->log2_ctb_size, 0);
}

void Encoder::encode_cq(int x0, int y0, int log2_size, int depth) {
  const Sps& s = *sps_;
  if (x0 >= s.pic_width_in_luma_samples || y0 >= s.pic_height_in_luma_samples)
    return;

  bool inside = (x0 + (1 << log2_size) <= s.pic_width_in_luma_samples) &&
                (y0 + (1 << log2_size) <= s.pic_height_in_luma_samples);
  // policy: CUs are 16x16 (log2 4); larger blocks split, 8x8 only at forced
  // boundary splits.  P pictures: a large CU whose best merge candidate
  // leaves an all-zero quantized residual is coded as one big skip CU.
  const int target_log2 =
      (cfg_.split_algo == EncoderConfig::SplitAlgo::kMin8) ? 3 : 4;
  bool split = (log2_size > target_log2) || !inside;
  if (log2_size <= s.log2_min_cb_size) split = false;
  bool large_skip = false;
  if (!cur_is_intra_pic_ && inside && log2_size > target_log2 &&
      try_large_skip(x0, y0, log2_size)) {
    split = false;
    large_skip = true;
  }

  if (inside && log2_size > s.log2_min_cb_size)
    write_split_flag(x0, y0, depth, split);

  if (split) {
    int half = 1 << (log2_size - 1);
    encode_cq(x0, y0, log2_size - 1, depth + 1);
    encode_cq(x0 + half, y0, log2_size - 1, depth + 1);
    encode_cq(x0, y0 + half, log2_size - 1, depth + 1);
    encode_cq(x0 + half, y0 + half, log2_size - 1, depth + 1);
    return;
  }
  encode_cq_leaf(x0, y0, log2_size, depth, large_skip);
}

void Encoder::write_split_flag(int x0, int y0, int depth, bool split) {
  // split_cu_flag with the decoder's context derivation
  int inc = 0;
  if (z_available(*recon_, x0, y0, x0 - 1, y0) &&
      recon_->ct_depth[(y0 >> 2) * recon_->pb_w + ((x0 - 1) >> 2)] > depth)
    inc++;
  if (z_available(*recon_, x0, y0, x0, y0 - 1) &&
      recon_->ct_depth[((y0 - 1) >> 2) * recon_->pb_w + (x0 >> 2)] > depth)
    inc++;
  cabac_->encode_bin(&ctx_[CTX_SPLIT_CU_FLAG + inc], split ? 1 : 0);
}

void Encoder::encode_cq_leaf(int x0, int y0, int log2_size, int depth,
                             bool large_skip) {
  // record depth over CU area (context for later CUs)
  int n4 = 1 << (log2_size - 2);
  for (int dy = 0; dy < n4; dy++)
    for (int dx = 0; dx < n4; dx++) {
      int px = (x0 >> 2) + dx, py = (y0 >> 2) + dy;
      if (px < recon_->pb_w && py < recon_->pb_h)
        recon_->ct_depth[py * recon_->pb_w + px] = (u8)depth;
    }
  if (large_skip) {
    encode_large_skip(x0, y0, log2_size);
    return;
  }
  encode_cu(x0, y0, log2_size);
}

// ---------------------------------------------------------------------------
// RD split search (SplitAlgo::kRd): per-node leaf-vs-split trial encodes
// with full rollback.  Counterpart of the reference's
// encoder/algo/cb-split.cc Algo_CB_Split_BruteForce; independent mechanism:
// instead of parallel CABAC-estimator contexts we trial-encode with the
// real arithmetic engine and roll the writer/contexts/recon/program back,
// so the committed stream is exactly the winning trial's bits.
// ---------------------------------------------------------------------------

Encoder::EncSave Encoder::save_cu(int x0, int y0, int log2_size) {
  EncSave s;
  s.ctx = ctx_;
  s.cb = cabac_->state();
  s.bw = cabac_->writer()->pos();
  s.cur_qp = cur_qp_;
  s.qg_pred = qg_pred_;
  s.qg_prev_qp = qg_prev_qp_;
  s.last_cu_qp = last_cu_qp_;
  s.qg_first = qg_first_;
  s.qg_delta_written = qg_delta_written_;
  s.n_ops = prog_.ops.size();
  s.n_intras = prog_.intras.size();
  s.n_tus = prog_.tus.size();
  s.n_pus = prog_.pus.size();
  s.n_pcms = prog_.pcms.size();
  s.n_cval = prog_.coeff_val.size();
  s.n_cpos = prog_.coeff_pos.size();
  s.n_pcmd = prog_.pcm_data.size();
  Frame& f = *recon_;
  int n = 1 << log2_size;
  s.x0 = x0;
  s.y0 = y0;
  s.n = n;
  for (int c = 0; c < 3; c++) {
    if (c > 0 && sps_->chroma_array_type == 0) break;
    int sx = c ? sps_->sub_width_c : 1, sy = c ? sps_->sub_height_c : 1;
    int xc = x0 / sx, yc = y0 / sy;
    int w = min_i(n / sx, f.plane_width(c) - xc);
    int h = min_i(n / sy, f.plane_height(c) - yc);
    s.px[c].resize((size_t)w * h * f.bytes_pp);
    for (int yy = 0; yy < h; yy++)
      memcpy(s.px[c].data() + (size_t)yy * w * f.bytes_pp,
             f.plane[c].data() + ((size_t)(yc + yy) * f.stride[c] + xc) *
                                     f.bytes_pp,
             (size_t)w * f.bytes_pp);
  }
  int gx = x0 >> 2, gy = y0 >> 2;
  int gw = min_i(n >> 2, f.pb_w - gx), gh = min_i(n >> 2, f.pb_h - gy);
  s.a_motion.resize((size_t)gw * gh);
  s.a_qp.resize((size_t)gw * gh);
  s.a_nz.resize((size_t)gw * gh);
  s.a_dbf.resize((size_t)gw * gh);
  s.a_ipm.resize((size_t)gw * gh);
  s.a_ipmc.resize((size_t)gw * gh);
  s.a_cui.resize((size_t)gw * gh);
  s.a_ctd.resize((size_t)gw * gh);
  for (int yy = 0; yy < gh; yy++) {
    size_t src = (size_t)(gy + yy) * f.pb_w + gx, dst = (size_t)yy * gw;
    memcpy(&s.a_motion[dst], &f.motion[src], gw * sizeof(PbMotion));
    memcpy(&s.a_qp[dst], &f.qp_y[src], gw);
    memcpy(&s.a_nz[dst], &f.nonzero_coeff[src], gw);
    memcpy(&s.a_dbf[dst], &f.deblock_flags[src], gw);
    memcpy(&s.a_ipm[dst], &f.intra_pred_mode[src], gw);
    memcpy(&s.a_ipmc[dst], &f.intra_mode_c[src], gw);
    memcpy(&s.a_cui[dst], &f.cu_info[src], gw);
    memcpy(&s.a_ctd[dst], &f.ct_depth[src], gw);
  }
  return s;
}

void Encoder::restore_cu(const EncSave& s) {
  ctx_ = s.ctx;
  cabac_->set_state(s.cb);
  cabac_->writer()->restore(s.bw);
  cur_qp_ = s.cur_qp;
  qg_pred_ = s.qg_pred;
  qg_prev_qp_ = s.qg_prev_qp;
  last_cu_qp_ = s.last_cu_qp;
  qg_first_ = s.qg_first;
  qg_delta_written_ = s.qg_delta_written;
  prog_.ops.resize(s.n_ops);
  prog_.intras.resize(s.n_intras);
  prog_.tus.resize(s.n_tus);
  prog_.pus.resize(s.n_pus);
  prog_.pcms.resize(s.n_pcms);
  prog_.coeff_val.resize(s.n_cval);
  prog_.coeff_pos.resize(s.n_cpos);
  prog_.pcm_data.resize(s.n_pcmd);
  Frame& f = *recon_;
  for (int c = 0; c < 3; c++) {
    if (c > 0 && sps_->chroma_array_type == 0) break;
    int sx = c ? sps_->sub_width_c : 1, sy = c ? sps_->sub_height_c : 1;
    int xc = s.x0 / sx, yc = s.y0 / sy;
    int w = min_i(s.n / sx, f.plane_width(c) - xc);
    int h = min_i(s.n / sy, f.plane_height(c) - yc);
    for (int yy = 0; yy < h; yy++)
      memcpy(f.plane[c].data() + ((size_t)(yc + yy) * f.stride[c] + xc) *
                                     f.bytes_pp,
             s.px[c].data() + (size_t)yy * w * f.bytes_pp,
             (size_t)w * f.bytes_pp);
  }
  int gx = s.x0 >> 2, gy = s.y0 >> 2;
  int gw = min_i(s.n >> 2, f.pb_w - gx), gh = min_i(s.n >> 2, f.pb_h - gy);
  for (int yy = 0; yy < gh; yy++) {
    size_t dst = (size_t)(gy + yy) * f.pb_w + gx, src = (size_t)yy * gw;
    memcpy(&f.motion[dst], &s.a_motion[src], gw * sizeof(PbMotion));
    memcpy(&f.qp_y[dst], &s.a_qp[src], gw);
    memcpy(&f.nonzero_coeff[dst], &s.a_nz[src], gw);
    memcpy(&f.deblock_flags[dst], &s.a_dbf[src], gw);
    memcpy(&f.intra_pred_mode[dst], &s.a_ipm[src], gw);
    memcpy(&f.intra_mode_c[dst], &s.a_ipmc[src], gw);
    memcpy(&f.cu_info[dst], &s.a_cui[src], gw);
    memcpy(&f.ct_depth[dst], &s.a_ctd[src], gw);
  }
}

Encoder::EncDelta Encoder::capture_cu(const EncSave& base) {
  EncDelta d;
  d.end = save_cu(base.x0, base.y0, ilog2((u32)base.n));
  const std::vector<u8>& bw = cabac_->writer()->rbsp();
  d.bw_tail.assign(bw.begin() + base.bw.bytes, bw.end());
  BitWriter::Pos cur = cabac_->writer()->pos();
  d.bw_cur = cur.cur;
  d.bw_nbits = cur.nbits;
  d.ops.assign(prog_.ops.begin() + base.n_ops, prog_.ops.end());
  d.intras.assign(prog_.intras.begin() + base.n_intras, prog_.intras.end());
  d.tus.assign(prog_.tus.begin() + base.n_tus, prog_.tus.end());
  d.pus.assign(prog_.pus.begin() + base.n_pus, prog_.pus.end());
  d.pcms.assign(prog_.pcms.begin() + base.n_pcms, prog_.pcms.end());
  d.cval.assign(prog_.coeff_val.begin() + base.n_cval,
                prog_.coeff_val.end());
  d.cpos.assign(prog_.coeff_pos.begin() + base.n_cpos,
                prog_.coeff_pos.end());
  d.pcmd.assign(prog_.pcm_data.begin() + base.n_pcmd, prog_.pcm_data.end());
  return d;
}

void Encoder::apply_cu(const EncSave& base, const EncDelta& d) {
  // bitstream tail + arithmetic state
  cabac_->writer()->set_tail(base.bw, d.bw_tail, d.bw_cur, d.bw_nbits);
  // program ops
  prog_.ops.resize(base.n_ops);
  prog_.ops.insert(prog_.ops.end(), d.ops.begin(), d.ops.end());
  prog_.intras.resize(base.n_intras);
  prog_.intras.insert(prog_.intras.end(), d.intras.begin(), d.intras.end());
  prog_.tus.resize(base.n_tus);
  prog_.tus.insert(prog_.tus.end(), d.tus.begin(), d.tus.end());
  prog_.pus.resize(base.n_pus);
  prog_.pus.insert(prog_.pus.end(), d.pus.begin(), d.pus.end());
  prog_.pcms.resize(base.n_pcms);
  prog_.pcms.insert(prog_.pcms.end(), d.pcms.begin(), d.pcms.end());
  prog_.coeff_val.resize(base.n_cval);
  prog_.coeff_val.insert(prog_.coeff_val.end(), d.cval.begin(),
                         d.cval.end());
  prog_.coeff_pos.resize(base.n_cpos);
  prog_.coeff_pos.insert(prog_.coeff_pos.end(), d.cpos.begin(),
                         d.cpos.end());
  prog_.pcm_data.resize(base.n_pcmd);
  prog_.pcm_data.insert(prog_.pcm_data.end(), d.pcmd.begin(), d.pcmd.end());
  // contexts + scalar state + recon area: the captured post-trial state
  // (save_cu restores by value through restore_cu's non-prog fields)
  EncSave end = d.end;
  end.n_ops = prog_.ops.size();
  end.n_intras = prog_.intras.size();
  end.n_tus = prog_.tus.size();
  end.n_pus = prog_.pus.size();
  end.n_pcms = prog_.pcms.size();
  end.n_cval = prog_.coeff_val.size();
  end.n_cpos = prog_.coeff_pos.size();
  end.n_pcmd = prog_.pcm_data.size();
  restore_cu(end);
}

i64 Encoder::ssd_rect(int cidx, int x0, int y0, int w, int h) const {
  i64 ssd = 0;
  for (int yy = 0; yy < h; yy++)
    for (int xx = 0; xx < w; xx++) {
      int d = src_px(cidx, x0 + xx, y0 + yy) - rec_px(cidx, x0 + xx, y0 + yy);
      ssd += (i64)d * d;
    }
  return ssd;
}

i64 Encoder::area_ssd(int x0, int y0, int n) const {
  const Frame& f = *recon_;
  i64 ssd = 0;
  for (int c = 0; c < 3; c++) {
    if (c > 0 && sps_->chroma_array_type == 0) break;
    int sx = c ? sps_->sub_width_c : 1, sy = c ? sps_->sub_height_c : 1;
    int xc = x0 / sx, yc = y0 / sy;
    int w = min_i(n / sx, f.plane_width(c) - xc);
    int h = min_i(n / sy, f.plane_height(c) - yc);
    ssd += ssd_rect(c, xc, yc, w, h);
  }
  return ssd;
}

double Encoder::rd_encode_cq(int x0, int y0, int log2_size, int depth) {
  const Sps& s = *sps_;
  if (x0 >= s.pic_width_in_luma_samples || y0 >= s.pic_height_in_luma_samples)
    return 0.0;
  bool inside = (x0 + (1 << log2_size) <= s.pic_width_in_luma_samples) &&
                (y0 + (1 << log2_size) <= s.pic_height_in_luma_samples);
  int half = 1 << (log2_size - 1);
  if (!inside) {
    // forced split: no flag, no choice
    double c = rd_encode_cq(x0, y0, log2_size - 1, depth + 1);
    c += rd_encode_cq(x0 + half, y0, log2_size - 1, depth + 1);
    c += rd_encode_cq(x0, y0 + half, log2_size - 1, depth + 1);
    c += rd_encode_cq(x0 + half, y0 + half, log2_size - 1, depth + 1);
    return c;
  }
  const double lam = rd_lambda();
  int n = 1 << log2_size;
  if (log2_size <= s.log2_min_cb_size) {
    // leaf only (no split_cu_flag at minimum size)
    u64 b0 = cabac_->info_scaled();
    encode_cq_leaf(x0, y0, log2_size, depth, false);
    return (double)area_ssd(x0, y0, n) +
           lam * (double)(cabac_->info_scaled() - b0) / 32768.0;
  }

  EncSave pre = save_cu(x0, y0, log2_size);
  u64 b0 = cabac_->info_scaled();

  // Large residual-free merge skips compete as leaves at any size
  bool ls = !cur_is_intra_pic_ && log2_size >= 5 &&
            try_large_skip(x0, y0, log2_size);

  // CU-as-one-TU is only legal up to the SPS max transform size; larger
  // leaves are representable solely as residual-free merge skips (the
  // transform tree would otherwise implicitly split below the CU)
  const int max_tb_log2 = s.log2_min_tb_size + s.log2_diff_max_min_tb_size;
  if (log2_size > max_tb_log2 && !ls) {
    restore_cu(pre);
    write_split_flag(x0, y0, depth, true);
    rd_encode_cq(x0, y0, log2_size - 1, depth + 1);
    rd_encode_cq(x0 + half, y0, log2_size - 1, depth + 1);
    rd_encode_cq(x0, y0 + half, log2_size - 1, depth + 1);
    rd_encode_cq(x0 + half, y0 + half, log2_size - 1, depth + 1);
    return (double)area_ssd(x0, y0, n) +
           lam * (double)(cabac_->info_scaled() - b0) / 32768.0;
  }
  // trial A: leaf at this size
  write_split_flag(x0, y0, depth, false);
  encode_cq_leaf(x0, y0, log2_size, depth, ls);
  double cost_leaf = (double)area_ssd(x0, y0, n) +
                     lam * (double)(cabac_->info_scaled() - b0) / 32768.0;
  EncDelta dleaf = capture_cu(pre);
  restore_cu(pre);

  // trial B: split (children recursively pick their own best and stay
  // applied, so the writer/recon hold the full subtree afterwards)
  write_split_flag(x0, y0, depth, true);
  rd_encode_cq(x0, y0, log2_size - 1, depth + 1);
  rd_encode_cq(x0 + half, y0, log2_size - 1, depth + 1);
  rd_encode_cq(x0, y0 + half, log2_size - 1, depth + 1);
  rd_encode_cq(x0 + half, y0 + half, log2_size - 1, depth + 1);
  double cost_split = (double)area_ssd(x0, y0, n) +
                      lam * (double)(cabac_->info_scaled() - b0) / 32768.0;

  if (cost_leaf <= cost_split) {
    restore_cu(pre);
    apply_cu(pre, dleaf);
    return cost_leaf;
  }
  return cost_split;
}

int Encoder::choose_luma_mode(int x0, int y0, int log2_size) {
  int n = 1 << log2_size;
  int best_mode = 1;
  i64 best_cost = INT64_MAX;
  IntraRec rec;
  rec.x = (u16)x0;
  rec.y = (u16)y0;
  rec.log2_size = (u8)log2_size;
  rec.cidx = 0;
  double lam = rd_lambda();
  const bool brute = cfg_.intra_algo == EncoderConfig::IntraAlgo::kBrute;
  const bool min_sad = cfg_.intra_algo == EncoderConfig::IntraAlgo::kMinSad;
  static const int kAll[35] = {0,  1,  2,  3,  4,  5,  6,  7,  8,  9,
                               10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                               20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
                               30, 31, 32, 33, 34};
  const int* cand = brute ? kAll : cfg_.intra_candidates.data();
  const int n_cand = brute ? 35 : (int)cfg_.intra_candidates.size();
  // true mode-signalling rate from the live context state (the estimator
  // tier): prev_intra_luma_pred bin + mpm_idx TR bypass, or 5 fixed bins
  int mpm_cand[3];
  derive_luma_mpm(x0, y0, mpm_cand);
  const double kb = 1.0 / 32768.0;
  const ContextModel& pm = ctx_[CTX_PREV_INTRA_LUMA_PRED];
  double bits_mpm0 = cabac_ctx_bits(pm, 1) * kb + 1.0;
  double bits_mpm12 = cabac_ctx_bits(pm, 1) * kb + 2.0;
  double bits_rem = cabac_ctx_bits(pm, 0) * kb + 5.0;
  for (int ci = 0; ci < n_cand; ci++) {
    rec.mode = (u8)cand[ci];
    execute_intra_scalar(prog_, rec);
    double bits = bits_rem;
    if (cand[ci] == mpm_cand[0]) bits = bits_mpm0;
    else if (cand[ci] == mpm_cand[1] || cand[ci] == mpm_cand[2])
      bits = bits_mpm12;
    i64 j = min_sad ? sad_luma_rect(x0, y0, n, n)
                    : ssd_luma_rect(x0, y0, n, n) + (i64)(lam * bits);
    if (j < best_cost) {
      best_cost = j;
      best_mode = cand[ci];
    }
  }
  return best_mode;
}

void Encoder::derive_luma_mpm(int x0, int y0, int cand[3]) {
  // candidate derivation identical to the decoder (spec 8.4.2)
  Frame& f = *recon_;
  int cand_a = 1, cand_b = 1;
  if (z_available(f, x0, y0, x0 - 1, y0)) {
    int i4 = (y0 >> 2) * f.pb_w + ((x0 - 1) >> 2);
    if ((f.cu_info[i4] & 1) && !(f.cu_info[i4] & 2))
      cand_a = f.intra_pred_mode[i4];
  }
  if (z_available(f, x0, y0, x0, y0 - 1) &&
      ((y0 - 1) >> sps_->log2_ctb_size) == (y0 >> sps_->log2_ctb_size)) {
    int i4 = ((y0 - 1) >> 2) * f.pb_w + (x0 >> 2);
    if ((f.cu_info[i4] & 1) && !(f.cu_info[i4] & 2))
      cand_b = f.intra_pred_mode[i4];
  }
  if (cand_a == cand_b) {
    if (cand_a < 2) {
      cand[0] = 0; cand[1] = 1; cand[2] = 26;
    } else {
      cand[0] = cand_a;
      cand[1] = 2 + ((cand_a + 29) % 32);
      cand[2] = 2 + ((cand_a - 2 + 1) % 32);
    }
  } else {
    cand[0] = cand_a;
    cand[1] = cand_b;
    if (cand_a != 0 && cand_b != 0) cand[2] = 0;
    else if (cand_a != 1 && cand_b != 1) cand[2] = 1;
    else cand[2] = 26;
  }
}

void Encoder::write_intra_luma_mode(int x0, int y0, int mode) {
  int cand[3];
  derive_luma_mpm(x0, y0, cand);

  int mpm = -1;
  for (int k = 0; k < 3; k++)
    if (cand[k] == mode) mpm = k;

  cabac_->encode_bin(&ctx_[CTX_PREV_INTRA_LUMA_PRED], mpm >= 0 ? 1 : 0);
  if (mpm >= 0) {
    // TR cMax=2 bypass
    if (mpm == 0) {
      cabac_->encode_bypass(0);
    } else {
      cabac_->encode_bypass(1);
      cabac_->encode_bypass(mpm == 2 ? 1 : 0);
    }
  } else {
    // rem_intra_luma_pred_mode: subtract the (sorted) candidates above it
    int c0 = cand[0], c1 = cand[1], c2 = cand[2];
    if (c0 > c1) std::swap(c0, c1);
    if (c0 > c2) std::swap(c0, c2);
    if (c1 > c2) std::swap(c1, c2);
    int rem = mode;
    if (mode > c2) rem--;
    if (mode > c1) rem--;
    if (mode > c0) rem--;
    cabac_->encode_bypass_bits((u32)rem, 5);
  }
}

void Encoder::encode_cu(int x0, int y0, int log2_size) {
  if (!cur_is_intra_pic_) {
    encode_cu_inter(x0, y0, log2_size);
    return;
  }
  encode_cu_intra(x0, y0, log2_size);
}

void Encoder::encode_cu_intra(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int n4 = 1 << (log2_size - 2);

  if (pps_->transquant_bypass_enabled)
    cabac_->encode_bin(&ctx_[CTX_CU_TRANSQUANT_BYPASS], 1);  // all-lossless

  // P slice: intra CU needs cu_skip_flag=0 + pred_mode_flag=1 first
  if (!cur_is_intra_pic_) {
    write_cu_skip_flag(x0, y0, 0);
    cabac_->encode_bin(&ctx_[CTX_PRED_MODE_FLAG], 1);
  }

  // part_mode (intra, coded only at minimum CB size): always 2Nx2N
  if (log2_size == sps_->log2_min_cb_size)
    cabac_->encode_bin(&ctx_[CTX_PART_MODE], 1);

  int mode = choose_luma_mode(x0, y0, log2_size);

  // --- PCM (spec 7.3.8.5 pcm_flag + 7.3.9 pcm_sample) ---
  if (sps_->pcm_enabled && log2_size >= sps_->log2_min_pcm_cb_size &&
      log2_size <= sps_->log2_max_pcm_cb_size) {
    bool use_pcm = sad_luma(x0, y0, 1 << log2_size) > cfg_.pcm_sad_threshold;
    cabac_->encode_terminate(use_pcm ? 1 : 0);
    if (use_pcm) {
      // terminate(1) flushed + byte-aligned the writer; raw samples follow,
      // then the arithmetic engine restarts with the current contexts
      // (mirrors SliceParser::pcm_sample)
      int size = 1 << log2_size;
      int bd_y = sps_->pcm_bit_depth_luma, bd_c = sps_->pcm_bit_depth_chroma;
      for (int yy = 0; yy < size; yy++)
        for (int xx = 0; xx < size; xx++) {
          int v = src_px(0, x0 + xx, y0 + yy);
          slice_bw_.write_bits((u32)v, bd_y);
          if (recon_->bytes_pp == 1)
            *recon_->px8(0, x0 + xx, y0 + yy) = (u8)v;
          else
            *recon_->px16(0, x0 + xx, y0 + yy) = (u16)v;
        }
      if (sps_->chroma_array_type != 0) {
        int cw = size / sps_->sub_width_c, chh = size / sps_->sub_height_c;
        int xc = x0 / sps_->sub_width_c, yc = y0 / sps_->sub_height_c;
        for (int c = 1; c <= 2; c++)
          for (int yy = 0; yy < chh; yy++)
            for (int xx = 0; xx < cw; xx++) {
              int v = src_px(c, xc + xx, yc + yy);
              slice_bw_.write_bits((u32)v, bd_c);
              if (recon_->bytes_pp == 1)
                *recon_->px8(c, xc + xx, yc + yy) = (u8)v;
              else
                *recon_->px16(c, xc + xx, yc + yy) = (u16)v;
            }
      }
      slice_bw_.byte_align_zero();
      cabac_ = std::make_unique<CabacEncoder>(&slice_bw_);
      // metadata: intra + pcm
      for (int dy = 0; dy < n4; dy++)
        for (int dx = 0; dx < n4; dx++) {
          int px = (x0 >> 2) + dx, py = (y0 >> 2) + dy;
          if (px >= f.pb_w || py >= f.pb_h) continue;
          f.cu_info[py * f.pb_w + px] = 1 | 2;
        }
      set_cu_qp_grid(x0, y0, log2_size);
      mark_cu_edges(x0, y0, log2_size);
      return;
    }
  }
  write_intra_luma_mode(x0, y0, mode);
  // chroma: derived mode (DM) -> single context bin 0 (absent in monochrome)
  if (sps_->chroma_array_type != 0)
    cabac_->encode_bin(&ctx_[CTX_INTRA_CHROMA_PRED_MODE], 0);

  // update metadata grids (intra flags + modes) over the CU
  for (int dy = 0; dy < n4; dy++)
    for (int dx = 0; dx < n4; dx++) {
      int px = (x0 >> 2) + dx, py = (y0 >> 2) + dy;
      if (px >= f.pb_w || py >= f.pb_h) continue;
      f.cu_info[py * f.pb_w + px] =
          (u8)(1 | (pps_->transquant_bypass_enabled ? 4 : 0));  // intra
      f.intra_pred_mode[py * f.pb_w + px] = (u8)mode;
      f.intra_mode_c[py * f.pb_w + px] = (u8)mode;  // DM
    }

  // --- transform tree: single TU = CU (max depth 0) ---
  // The chroma cbf flags precede cbf_luma in the bitstream, so transform the
  // channels first to learn the cbfs, then write flags, then residuals.
  // Order of reconstruction must follow the decoder: luma pred+res, cb, cr.

  // 1. luma predict + transform (prediction uses final recon borders)
  struct Pending {
    bool cbf;
    bool tskip = false;
    std::vector<i32> levels;
    int scan;
    int x0c, y0c, log2, cidx, mode;
    int ccp_scale = 0;  // RExt cross-component prediction ResScaleVal
  } ch[5];  // Y, Cb0, Cr0, Cb1 (4:2:2), Cr1 (4:2:2)

  // decoded luma residual of this TU, for cross-component prediction
  i32 ccp_luma_res[32 * 32];
  const bool ccp_active = pps_->cross_component_prediction_enabled;
  i32* ccp_cache = ccp_active ? ccp_luma_res : nullptr;

  auto prepare_channel = [&](int slot, int log2c, int x0c, int y0c, int m) {
    Pending& pc = ch[slot];
    int cidx = (slot >= 3) ? slot - 2 : slot;  // 3/4 -> planes 1/2
    pc.x0c = x0c;
    pc.y0c = y0c;
    pc.log2 = log2c;
    pc.cidx = cidx;
    pc.mode = m;
    int n = 1 << log2c;
    // predict into recon
    IntraRec rec;
    rec.x = (u16)x0c;
    rec.y = (u16)y0c;
    rec.log2_size = (u8)log2c;
    rec.cidx = (u8)cidx;
    rec.mode = (u8)m;
    execute_intra_scalar(prog_, rec);
    prog_.intras.push_back(rec);
    prog_.ops.push_back({Op::kIntraPred, (u32)(prog_.intras.size() - 1)});

    // residual = src - pred
    i32 res[32 * 32];
    for (int yy = 0; yy < n; yy++)
      for (int xx = 0; xx < n; xx++)
        res[yy * n + xx] =
            src_px(cidx, x0c + xx, y0c + yy) - rec_px(cidx, x0c + xx, y0c + yy);

    // Cross-component prediction: pick the ResScaleVal that minimizes the
    // energy of res - (scale * decoded_luma_residual) >> 3, then code that
    // adjusted residual (decoder applies the inverse, transform.cc CCP hook).
    pc.ccp_scale = 0;
    if (ccp_active && cidx != 0 && ch[0].cbf) {
      const int bd_y = sps_->bit_depth_luma, bd_c = sps_->bit_depth_chroma;
      static const int kScales[9] = {0, 1, -1, 2, -2, 4, -4, 8, -8};
      i64 best = -1;
      int best_s = 0;
      // terms use the decoder's exact integer behavior (see transform.cc
      // CCP hook: logical shifts + int32 wrap, matching the reference)
      auto ccp_term = [&](int s, i32 r_y) {
        i32 t = (i32)(((u32)r_y << bd_c) >> bd_y);
        return (i32)((u32)s * (u32)t) >> 3;
      };
      for (int s : kScales) {
        i64 ssd = 0;
        for (int i = 0; i < n * n; i++) {
          i64 d = res[i] - ccp_term(s, ccp_luma_res[i]);
          ssd += d * d;
        }
        if (best < 0 || ssd < best) { best = ssd; best_s = s; }
      }
      if (best_s != 0) {
        pc.ccp_scale = best_s;
        for (int i = 0; i < n * n; i++)
          res[i] -= ccp_term(best_s, ccp_luma_res[i]);
      }
    }
    pc.levels.resize(n * n);
    if (pps_->transquant_bypass_enabled) {
      // lossless: the coded levels ARE the residual samples
      for (int i = 0; i < n * n; i++)
        pc.levels[i] = clip3(-32768, 32767, res[i]);
    } else {
      i32 coeffs[32 * 32];
      const int bd = cidx == 0 ? sps_->bit_depth_luma : sps_->bit_depth_chroma;
      // quantize against Qp' (with the bit-depth offset), matching the
      // decoder's dequant (residual.cc tu.qp convention)
      const int qpp = cur_qp_ + (cidx == 0 ? sps_->qp_bd_offset_luma
                                           : sps_->qp_bd_offset_chroma);
      fwd_dct_2d(coeffs, res, log2c, bd);
      // scan from intra mode (residual.cc intra_scan_idx); computed before
      // quantization because RDOQ follows the coding order
      {
        int scan = 0;
        if (log2c == 2 ||
            (log2c == 3 && (cidx == 0 || sps_->chroma_array_type == 3))) {
          if (m >= 6 && m <= 14) scan = 2;
          else if (m >= 22 && m <= 30) scan = 1;
        }
        pc.scan = scan;
      }
      if (cfg_.rdoq)
        rdoq_quantize(pc.levels.data(), coeffs, qpp, log2c, cidx, pc.scan,
                      bd, true, ctx_, rd_lambda());
      else
        quantize(pc.levels.data(), coeffs, n * n, qpp, log2c, bd, true);
      pc.tskip = false;
      if (pps_->transform_skip_enabled && log2c == 2) {
        // transform-skip alternative: the coefficients are the residual
        // samples scaled into the transform domain (inverse of the
        // decoder's r = (c << (5+log2)) >> (20-bd) path)
        i32 ts_coeffs[16];
        int up = 15 - bd - log2c;
        for (int i = 0; i < 16; i++)
          ts_coeffs[i] = up >= 0 ? (res[i] << up) : (res[i] >> -up);
        i32 ts_levels[16];
        quantize(ts_levels, ts_coeffs, 16, qpp, log2c, bd, true);
        // pick by absolute-level sum (rate proxy); ties keep the DCT
        i64 a_dct = 0, a_ts = 0;
        for (int i = 0; i < 16; i++) {
          a_dct += abs_i(pc.levels[i]);
          a_ts += abs_i(ts_levels[i]);
        }
        if (a_ts < a_dct) {
          pc.tskip = true;
          for (int i = 0; i < 16; i++) pc.levels[i] = ts_levels[i];
        }
      }
      if (pps_->sign_data_hiding)
        apply_sign_hiding(pc.levels.data(), log2c, pc.scan,
                          pc.tskip ? nullptr : coeffs, qpp, bd);
    }
    if (pps_->transquant_bypass_enabled) {
      // scan still needed for the bypass residual write
      int scan = 0;
      if (log2c == 2 ||
          (log2c == 3 && (cidx == 0 || sps_->chroma_array_type == 3))) {
        if (m >= 6 && m <= 14) scan = 2;
        else if (m >= 22 && m <= 30) scan = 1;
      }
      pc.scan = scan;
    }

    pc.cbf = false;
    for (int i = 0; i < n * n; i++)
      if (pc.levels[i]) pc.cbf = true;

    // append + execute the residual now, in decode order — later channel
    // blocks (4:2:2 second TBs) predict from this reconstruction
    if (pc.cbf || pc.ccp_scale) {
      u32 start = (u32)prog_.coeff_val.size();
      for (int i = 0; i < n * n && pc.cbf; i++) {
        if (pc.levels[i]) {
          prog_.coeff_val.push_back((i16)clip3(-32768, 32767, pc.levels[i]));
          int xc = i % n, yc = i / n;
          prog_.coeff_pos.push_back((u16)((yc << 6) | xc));
        }
      }
      TuRec tu;
      tu.x = (u16)x0c;
      tu.y = (u16)y0c;
      tu.log2_size = (u8)log2c;
      tu.cidx = (u8)cidx;
      tu.qp = (i8)(cidx == 0
                       ? cur_qp_ + sps_->qp_bd_offset_luma
                       : chroma_qp(cur_qp_, cidx) + sps_->qp_bd_offset_chroma);
      tu.flags = TuRec::kIntra |
                 ((log2c == 2 && cidx == 0 && !pc.tskip) ? TuRec::kUseDst : 0) |
                 (pc.tskip ? TuRec::kTransformSkip : 0) |
                 (pps_->transquant_bypass_enabled ? TuRec::kTransquantBypass
                                                  : 0);
      tu.coeff_start = start;
      tu.ncoeff = (u16)(prog_.coeff_val.size() - start);
      tu.cross_comp_scale = (i8)pc.ccp_scale;
      prog_.tus.push_back(tu);
      prog_.ops.push_back({Op::kAddResidual, (u32)(prog_.tus.size() - 1)});
      execute_tu_scalar(prog_, tu, ccp_cache);
    }

  };

  // NB: chroma prediction borders depend on the *luma* reconstruction only
  // through the chroma plane; channel order below matches the decoder.
  prepare_channel(0, log2_size, x0, y0, mode);

  const int cat = sps_->chroma_array_type;
  if (cat == 0) {
    // monochrome: luma only
    mark_cu_edges(x0, y0, log2_size);
    if (ch[0].cbf) mark_nonzero(x0, y0, log2_size);
    cabac_->encode_bin(&ctx_[CTX_CBF_LUMA + 1], ch[0].cbf ? 1 : 0);
    if (ch[0].cbf) maybe_write_cu_qp_delta();
    if (ch[0].cbf)
      write_residual(x0, y0, log2_size, 0, ch[0].levels.data(), ch[0].scan);
    set_cu_qp_grid(x0, y0, log2_size);
    return;
  }
  const bool c444 = cat == 3;
  const bool c422 = cat == 2;
  int log2c = c444 ? log2_size : log2_size - 1;
  int x0c = c444 ? x0 : (x0 >> 1);
  int y0c = (cat == 1) ? (y0 >> 1) : y0;
  int cmode = map_dm_chroma(mode);
  if (c422) {
    // spec 8.4.4.2.1 Table 8-3: 4:2:2 chroma mode conversion
    static const u8 kMode422[35] = {
        0,  1,  2,  2,  2,  2,  3,  5,  7,  8,  10, 12, 13, 15, 17, 18,
        19, 20, 21, 22, 23, 23, 24, 24, 25, 25, 26, 27, 27, 28, 28, 29,
        29, 30, 31};
    cmode = kMode422[cmode];
  }
  int y_off = 1 << log2c;  // 4:2:2 second TB offset (chroma rows)

  // channel jobs: 1/2 = first Cb/Cr TB; 3/4 = 4:2:2 second Cb/Cr TB
  // (prediction of the second TB reads the first TB's reconstruction, so
  // prepare order matches the decoder: Cb0, Cb1, Cr0, Cr1 — see
  // syntax.cc transform_unit)
  prepare_channel(1, log2c, x0c, y0c, cmode);
  if (c422) prepare_channel(3, log2c, x0c, y0c + y_off, cmode);
  prepare_channel(2, log2c, x0c, y0c, cmode);
  if (c422) prepare_channel(4, log2c, x0c, y0c + y_off, cmode);

  mark_cu_edges(x0, y0, log2_size);
  if (ch[0].cbf) mark_nonzero(x0, y0, log2_size);

  // --- write transform_unit syntax ---
  // cbf_cb (both TBs for 4:2:2), cbf_cr, then cbf_luma (ctx depth==0 -> 1)
  cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[1].cbf ? 1 : 0);
  if (c422) cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[3].cbf ? 1 : 0);
  cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[2].cbf ? 1 : 0);
  if (c422) cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[4].cbf ? 1 : 0);
  cabac_->encode_bin(&ctx_[CTX_CBF_LUMA + 1], ch[0].cbf ? 1 : 0);

  if (ch[0].cbf || ch[1].cbf || ch[2].cbf || (c422 && (ch[3].cbf || ch[4].cbf)))
    maybe_write_cu_qp_delta();

  if (ch[0].cbf)
    write_residual(x0, y0, log2_size, 0, ch[0].levels.data(), ch[0].scan,
                   ch[0].tskip);

  // Cross-component prediction res_scale syntax (spec 7.3.8.12): one value
  // per chroma component, before its residual, whenever CCP is possible
  // (444 + DM chroma + coded luma) — even when the value is zero.
  const bool write_ccp_syntax = ccp_active && ch[0].cbf;
  auto write_ccp = [&](int c_minus1, int scale) {
    int abs_plus1 = 0;
    int a = scale < 0 ? -scale : scale;
    while ((1 << abs_plus1) <= a) abs_plus1++;  // 0->0, 1->1, 2->2, 4->3, 8->4
    for (int b = 0; b < abs_plus1; b++)
      cabac_->encode_bin(&ctx_[CTX_LOG2_RES_SCALE_ABS + 4 * c_minus1 + b], 1);
    if (abs_plus1 < 4)
      cabac_->encode_bin(
          &ctx_[CTX_LOG2_RES_SCALE_ABS + 4 * c_minus1 + abs_plus1], 0);
    if (abs_plus1)
      cabac_->encode_bin(&ctx_[CTX_RES_SCALE_SIGN + c_minus1],
                         scale < 0 ? 1 : 0);
  };

  if (write_ccp_syntax) write_ccp(0, ch[1].ccp_scale);
  if (ch[1].cbf)
    write_residual(x0, y0, log2c, 1, ch[1].levels.data(), ch[1].scan,
                   ch[1].tskip);
  if (c422) {
    if (ch[3].cbf)
      write_residual(x0, y0, log2c, 1, ch[3].levels.data(), ch[3].scan,
                     ch[3].tskip);
  }
  if (write_ccp_syntax) write_ccp(1, ch[2].ccp_scale);
  if (ch[2].cbf)
    write_residual(x0, y0, log2c, 2, ch[2].levels.data(), ch[2].scan,
                   ch[2].tskip);
  if (c422) {
    if (ch[4].cbf)
      write_residual(x0, y0, log2c, 2, ch[4].levels.data(), ch[4].scan,
                     ch[4].tskip);
  }
  set_cu_qp_grid(x0, y0, log2_size);
}

// Decoded-picture-hash suffix SEI (spec D.3.19): MD5 of the filtered
// reconstruction per plane; lets any decoder (ours and the reference)
// verify the decode with `-c`.
void Encoder::append_hash_sei(std::vector<u8>* out) {
  const Frame& f = *recon_;
  int planes = (sps_->chroma_array_type == 0) ? 1 : 3;
  BitWriter sei;
  sei.write_bits(132, 8);                      // payload type
  sei.write_bits((u32)(1 + 16 * planes), 8);   // payload size
  sei.write_bits(0, 8);                        // hash_type = MD5
  for (int c = 0; c < planes; c++) {
    u8 digest[16];
    md5_plane(f.plane_ptr(c), f.plane_width(c), f.plane_height(c),
              f.stride[c], f.bytes_pp, digest);
    for (int i = 0; i < 16; i++) sei.write_bits(digest[i], 8);
  }
  sei.trailing_bits();
  append_nal(out, NAL_SEI_SUFFIX, 0, sei.rbsp());
}

// ---------------------------------------------------------------------------
// inter CU coding (P slices, 2Nx2N, single-TU): candidate search over the
// decoder-identical merge/AMVP lists (motion.h), reconstruction through the
// decoder's MC + transform kernels.  Counterpart of the reference's
// encoder-motion.cc / algo/cb-intra-inter.cc decision layer.
// ---------------------------------------------------------------------------
void execute_pu_scalar(const FrameProgram& prog, const PuRec& pu);  // recon.cc

// CU-boundary deblock-edge bits (our CUs are 2Nx2N single-TU, so the CU
// boundary is the only TU/PU edge; mirrors SliceParser::mark_cu_edges)
void Encoder::mark_cu_edges(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int n4 = 1 << (log2_size - 2);
  int x4 = x0 >> 2, y4 = y0 >> 2;
  for (int i = 0; i < n4; i++) {
    int py = y4 + i, px = x4 + i;
    if (py < f.pb_h && x4 < f.pb_w) f.deblock_flags[py * f.pb_w + x4] |= 1 | 4;
    if (px < f.pb_w && y4 < f.pb_h) f.deblock_flags[y4 * f.pb_w + px] |= 2 | 8;
  }
}

void Encoder::mark_nonzero(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int n4 = max_i(1, (1 << log2_size) >> 2);
  for (int y = 0; y < n4; y++)
    for (int x = 0; x < n4; x++) {
      int px = (x0 >> 2) + x, py = (y0 >> 2) + y;
      if (px < f.pb_w && py < f.pb_h) f.nonzero_coeff[py * f.pb_w + px] |= 1;
    }
}

// sao() syntax writer (inverse of SliceParser::decode_sao, spec 7.3.8.3).
// Merge flags are always written as 0 (full parameters per CTB).
void Encoder::write_sao(int ctb_x, int ctb_y) {
  Frame& f = *recon_;
  int rs = ctb_y * f.ctb_w + ctb_x;
  const SaoParams& sao = sao_chosen_.empty() ? f.sao[rs] : sao_chosen_[rs];

  // merge flags are only present when the neighbor is in the same slice
  // and tile (SliceParser::decode_sao)
  int slice_addr = f.slice_addr_rs[rs];  // set by the slice loop
  if (ctb_x > 0 && rs > slice_addr && pps_->same_tile(rs, rs - 1))
    cabac_->encode_bin(&ctx_[CTX_SAO_MERGE_FLAG], 0);
  if (ctb_y > 0 && (rs - f.ctb_w) >= slice_addr &&
      pps_->same_tile(rs, rs - f.ctb_w))
    cabac_->encode_bin(&ctx_[CTX_SAO_MERGE_FLAG], 0);

  auto write_tu_bypass = [&](int v, int cmax) {
    for (int k = 0; k < v; k++) cabac_->encode_bypass(1);
    if (v < cmax) cabac_->encode_bypass(0);
  };

  int n_chan = (sps_->chroma_array_type == 0) ? 1 : 3;
  for (int c = 0; c < n_chan; c++) {
    int t = sao.type_idx[c];
    if (c <= 1) {
      cabac_->encode_bin(&ctx_[CTX_SAO_TYPE_IDX], t != 0);
      if (t != 0) cabac_->encode_bypass(t == 2 ? 1 : 0);
    }
    if (t == 0) continue;
    int bd = f.bit_depth[c];
    int cmax = (1 << (min_i(bd, 10) - 5)) - 1;
    for (int i = 0; i < 4; i++)
      write_tu_bypass(abs_i(sao.offset[c][i]), cmax);
    if (t == 1) {
      for (int i = 0; i < 4; i++)
        if (sao.offset[c][i] != 0)
          cabac_->encode_bypass(sao.offset[c][i] < 0 ? 1 : 0);
      cabac_->encode_bypass_bits((u32)sao.band_pos[c], 5);
    } else if (c <= 1) {
      cabac_->encode_bypass_bits((u32)sao.eo_class[c], 2);
    }
  }
  f.sao[rs] = sao;  // mirror the decoder's grid state
}

// Per-CTB SAO parameter estimation on the deblocked reconstruction
// (counterpart of the reference encoder's SAO search; simple SSD-gain
// maximisation: gain(offset o over n samples with diff-sum d) = 2od - no^2).
void Encoder::estimate_sao() {
  Frame& f = *recon_;
  const int cmax_bd = (1 << (min_i(sps_->bit_depth_luma, 10) - 5)) - 1;
  static const int eo_dx[4][2] = {{-1, 1}, {0, 0}, {-1, 1}, {1, -1}};
  static const int eo_dy[4][2] = {{0, 0}, {-1, 1}, {-1, 1}, {1, -1}};

  for (int cy = 0; cy < f.ctb_h; cy++)
    for (int cx = 0; cx < f.ctb_w; cx++) {
      int rs = cy * f.ctb_w + cx;
      SaoParams best;  // default: type 0 everywhere

      // channel evaluation helper: returns (gain, params for channel c)
      auto eval_channel = [&](int c, int force_type, int force_eo,
                              i16 off_out[4], u8* band_pos_out) -> i64 {
        int sub_x = (c == 0) ? 1 : sps_->sub_width_c;
        int sub_y = (c == 0) ? 1 : sps_->sub_height_c;
        int w = f.plane_width(c), h = f.plane_height(c);
        int cs_x = sps_->ctb_size / sub_x, cs_y = sps_->ctb_size / sub_y;
        int x0 = cx * cs_x, y0 = cy * cs_y;
        int x1 = min_i(x0 + cs_x, w), y1 = min_i(y0 + cs_y, h);
        int bd = f.bit_depth[c];
        auto rec = [&](int x, int y) {
          return f.bytes_pp == 1 ? (int)*f.px8(c, x, y) : (int)*f.px16(c, x, y);
        };
        for (int i = 0; i < 4; i++) off_out[i] = 0;

        if (force_type == 1) {
          // band offset: per-band diff stats, best 4-band window
          i64 dsum[32] = {};
          i64 cnt[32] = {};
          int shift = bd - 5;
          for (int y = y0; y < y1; y++)
            for (int x = x0; x < x1; x++) {
              int r = rec(x, y);
              int b = r >> shift;
              dsum[b] += src_px(c, x, y) - r;
              cnt[b]++;
            }
          i64 best_gain = 0;
          int best_pos = 0;
          i16 best_off[4] = {};
          for (int pos = 0; pos < 32; pos++) {
            i64 g = 0;
            i16 offs[4];
            for (int k = 0; k < 4; k++) {
              int b = (pos + k) & 31;
              i64 o = cnt[b] ? (dsum[b] >= 0 ? (dsum[b] + cnt[b] / 2) / cnt[b]
                                             : -((-dsum[b] + cnt[b] / 2) / cnt[b]))
                             : 0;
              o = clip3(-cmax_bd, cmax_bd, (int)o);
              offs[k] = (i16)o;
              g += 2 * o * dsum[b] - cnt[b] * o * o;
            }
            if (g > best_gain) {
              best_gain = g;
              best_pos = pos;
              for (int k = 0; k < 4; k++) best_off[k] = offs[k];
            }
          }
          for (int k = 0; k < 4; k++) off_out[k] = best_off[k];
          *band_pos_out = (u8)best_pos;
          return best_gain;
        }

        // edge offset for class force_eo
        int e = force_eo;
        i64 dsum[4] = {};
        i64 cnt[4] = {};
        int xs = max_i(x0, max_i(-eo_dx[e][0], -eo_dx[e][1]));
        int xe = min_i(x1, w - max_i(0, max_i(eo_dx[e][0], eo_dx[e][1])));
        int ys = max_i(y0, max_i(-eo_dy[e][0], -eo_dy[e][1]));
        int ye = min_i(y1, h - max_i(0, max_i(eo_dy[e][0], eo_dy[e][1])));
        static const int cat_of[5] = {1, 2, 0, 3, 4};
        for (int y = ys; y < ye; y++)
          for (int x = xs; x < xe; x++) {
            int v = rec(x, y);
            int a = rec(x + eo_dx[e][0], y + eo_dy[e][0]);
            int b = rec(x + eo_dx[e][1], y + eo_dy[e][1]);
            int idx = 2 + (v > a ? 1 : v < a ? -1 : 0) +
                      (v > b ? 1 : v < b ? -1 : 0);
            int cat = cat_of[idx];
            if (!cat) continue;
            dsum[cat - 1] += src_px(c, x, y) - v;
            cnt[cat - 1]++;
          }
        i64 g = 0;
        for (int k = 0; k < 4; k++) {
          i64 o = cnt[k] ? (dsum[k] >= 0 ? (dsum[k] + cnt[k] / 2) / cnt[k]
                                         : -((-dsum[k] + cnt[k] / 2) / cnt[k]))
                         : 0;
          // spec sign constraints: categories 1/2 >= 0, 3/4 <= 0
          if (k < 2) o = clip3(0, cmax_bd, (int)o);
          else o = clip3(-cmax_bd, 0, (int)o);
          off_out[k] = (i16)o;
          g += 2 * o * dsum[k] - cnt[k] * o * o;
        }
        return g;
      };

      // luma: best of {off, band, eo0..3}
      {
        i64 best_gain = 16;  // minimum worthwhile gain (bits cost guard)
        for (int t = 1; t <= 2; t++)
          for (int e = 0; e < (t == 1 ? 1 : 4); e++) {
            i16 offs[4];
            u8 pos = 0;
            i64 g = eval_channel(0, t, e, offs, &pos);
            if (g > best_gain) {
              best_gain = g;
              best.type_idx[0] = (u8)t;
              best.eo_class[0] = (u8)e;
              best.band_pos[0] = pos;
              for (int k = 0; k < 4; k++) best.offset[0][k] = offs[k];
            }
          }
      }
      // chroma: shared type/eo-class, separate offsets/band positions
      if (sps_->chroma_array_type != 0) {
        i64 best_gain = 16;
        for (int t = 1; t <= 2; t++)
          for (int e = 0; e < (t == 1 ? 1 : 4); e++) {
            i16 ocb[4], ocr[4];
            u8 pcb = 0, pcr = 0;
            i64 g = eval_channel(1, t, e, ocb, &pcb) +
                    eval_channel(2, t, e, ocr, &pcr);
            if (g > best_gain) {
              best_gain = g;
              best.type_idx[1] = best.type_idx[2] = (u8)t;
              best.eo_class[1] = best.eo_class[2] = (u8)e;
              best.band_pos[1] = pcb;
              best.band_pos[2] = pcr;
              for (int k = 0; k < 4; k++) {
                best.offset[1][k] = ocb[k];
                best.offset[2][k] = ocr[k];
              }
            }
          }
      }
      sao_chosen_[rs] = best;
    }
}

// Sign-data-hiding parity fixup (inverse of residual.cc:296-347): for each
// sub-block whose first..last coded-scan distance exceeds 3, the DC-most
// coefficient's sign is inferred from the level-sum parity; adjust that
// coefficient's magnitude by +-1 when the parity disagrees.
void Encoder::apply_sign_hiding(i32* levels, int log2, int scan_idx,
                                const i32* coeffs, int qpp, int bd) {
  if (coeffs && cfg_.rdoq) {
    // RDOQ-tier parity fix: same pixel-domain error scale + tuned lambda
    // as the level decisions (rdoq.cc); the plain heuristic below
    // measured +13% BD-rate on GOP content
    rdoq_sign_fix(levels, coeffs, qpp, log2, scan_idx, bd, rd_lambda());
    return;
  }
  int n = 1 << log2;
  const ScanPos* scan_sub = scan_order(log2 - 2, scan_idx);
  const ScanPos* scan_pos = scan_order(2, scan_idx);
  int sbw = 1 << (log2 - 2);
  // quantizer scale for the distortion-aware adjustment choice
  const int qbits = 29 - bd - log2 + qpp / 6;
  const i64 q = kQuantScale[qpp % 6];
  for (int i = sbw * sbw - 1; i >= 0; i--) {
    int xs = scan_sub[i].x, ys = scan_sub[i].y;
    int first = -1, last = -1;  // parse order: descending scan position
    i64 sum = 0;
    int last_idx = -1;
    for (int p = 15; p >= 0; p--) {
      int xc = (xs << 2) + scan_pos[p].x, yc = (ys << 2) + scan_pos[p].y;
      i32 v = levels[yc * n + xc];
      if (!v) continue;
      if (first < 0) first = p;
      last = p;
      last_idx = yc * n + xc;
      sum += v;
    }
    if (first < 0) continue;
    if (first - last <= 3) continue;  // sign not hidden for this sub-block
    // decoder infers: negative iff (sum with last level taken positive) odd
    i64 s0 = sum - levels[last_idx] + abs_i(levels[last_idx]);
    bool implied_neg = (s0 & 1) != 0;
    bool want_neg = levels[last_idx] < 0;
    if (implied_neg != want_neg) {
      int best = -1, best_d = 0;
      i64 best_derr = INT64_MAX;
      if (coeffs) {
        // distortion-aware parity fix: adjust the level whose +-1 change
        // moves it least from its unquantized value (RDOQ-style)
        for (int p = 15; p >= 0; p--) {
          int xc = (xs << 2) + scan_pos[p].x, yc = (ys << 2) + scan_pos[p].y;
          int idx = yc * n + xc;
          i32 l = levels[idx];
          if (!l) continue;
          i64 a = (i64)abs_i(coeffs[idx]) * q;
          i64 cur = a - ((i64)abs_i(l) << qbits);
          i64 e0 = cur < 0 ? -cur : cur;
          // rate-aware: growing a magnitude costs ~1.5 extra bins while
          // shrinking saves them, so bias the error comparison by half a
          // quantization step in favor of shrinking
          for (int d : {1, -1}) {
            if (d < 0 && abs_i(l) <= 1) continue;  // keep significance
            i64 e1 = a - ((i64)(abs_i(l) + d) << qbits);
            if (e1 < 0) e1 = -e1;
            i64 dcost = e1 - e0 + ((d > 0) ? ((i64)1 << (qbits - 1))
                                           : -((i64)1 << (qbits - 1)));
            if (dcost < best_derr) {
              best_derr = dcost;
              best = idx;
              best_d = (l > 0) ? d : -d;
            }
          }
        }
      }
      if (best < 0) {
        // fallback: shrink the largest-magnitude coefficient
        int best_abs = 1;
        for (int p = 15; p >= 0; p--) {
          int xc = (xs << 2) + scan_pos[p].x, yc = (ys << 2) + scan_pos[p].y;
          int idx = yc * n + xc;
          if (abs_i(levels[idx]) > best_abs) {
            best_abs = abs_i(levels[idx]);
            best = idx;
            best_d = (levels[idx] > 0) ? -1 : 1;
          }
        }
      }
      if (best >= 0)
        levels[best] += best_d;
      else
        levels[last_idx] += (levels[last_idx] > 0) ? 1 : -1;
    }
  }
}

void Encoder::write_cu_skip_flag(int x0, int y0, int flag) {
  Frame& f = *recon_;
  int inc = 0;
  if (z_available(f, x0, y0, x0 - 1, y0) &&
      (f.cu_info[(y0 >> 2) * f.pb_w + ((x0 - 1) >> 2)] & 8))
    inc++;
  if (z_available(f, x0, y0, x0, y0 - 1) &&
      (f.cu_info[((y0 - 1) >> 2) * f.pb_w + (x0 >> 2)] & 8))
    inc++;
  cabac_->encode_bin(&ctx_[CTX_CU_SKIP_FLAG + inc], flag);
}

void Encoder::write_merge_idx(int idx) {
  if (sh_->max_num_merge_cand <= 1) return;
  cabac_->encode_bin(&ctx_[CTX_MERGE_IDX], idx > 0 ? 1 : 0);
  if (idx > 0) {
    for (int k = 1; k < idx; k++) cabac_->encode_bypass(1);
    if (idx < sh_->max_num_merge_cand - 1) cabac_->encode_bypass(0);
  }
}

void Encoder::write_ref_idx(int idx, int num_active) {
  // inverse of SliceParser::decode_ref_idx (TR: ctx, ctx+1, bypass...)
  if (num_active <= 1) return;
  int cmax = num_active - 1;
  cabac_->encode_bin(&ctx_[CTX_REF_IDX_LX + 0], idx > 0 ? 1 : 0);
  for (int k = 1; k <= idx && k < cmax; k++) {
    int more = (idx > k) ? 1 : 0;
    if (k == 1)
      cabac_->encode_bin(&ctx_[CTX_REF_IDX_LX + 1], more);
    else
      cabac_->encode_bypass(more);
    if (!more) break;
  }
  (void)cmax;
}

void Encoder::write_mvd(i32 mvd_x, i32 mvd_y) {
  // inverse of SliceParser::decode_mvd (spec 7.3.8.9)
  i32 ax = abs_i(mvd_x), ay = abs_i(mvd_y);
  cabac_->encode_bin(&ctx_[CTX_ABS_MVD_GREATER0], ax > 0);
  cabac_->encode_bin(&ctx_[CTX_ABS_MVD_GREATER0], ay > 0);
  if (ax > 0) cabac_->encode_bin(&ctx_[CTX_ABS_MVD_GREATER1], ax > 1);
  if (ay > 0) cabac_->encode_bin(&ctx_[CTX_ABS_MVD_GREATER1], ay > 1);
  if (ax > 0) {
    if (ax > 1) cabac_->encode_egk((u32)(ax - 2), 1);
    cabac_->encode_bypass(mvd_x < 0);
  }
  if (ay > 0) {
    if (ay > 1) cabac_->encode_egk((u32)(ay - 2), 1);
    cabac_->encode_bypass(mvd_y < 0);
  }
}

int Encoder::sad_luma(int x0, int y0, int n) const {
  return sad_luma_rect(x0, y0, n, n);
}

// ---------------------------------------------------------------------------
// RD cost model: lambda-weighted distortion+rate decisions (the estimation
// counterpart of the reference's CABACEncoderEstim tier, encoder-core design;
// decisions only — syntax and reconstruction are exact as before).
// ---------------------------------------------------------------------------
double Encoder::rd_lambda() const {
  // HM-style: lambda = 0.57 * 2^((QP-12)/3) for SSD-based costs
  return 0.57 * std::pow(2.0, (cur_qp_ - 12) / 3.0);
}

i64 Encoder::ssd_luma_rect(int x0, int y0, int w, int h) const {
  i64 ssd = 0;
  for (int yy = 0; yy < h; yy++)
    for (int xx = 0; xx < w; xx++) {
      int d = src_px(0, x0 + xx, y0 + yy) - rec_px(0, x0 + xx, y0 + yy);
      ssd += (i64)d * d;
    }
  return ssd;
}

// exp-golomb bit length of one mvd component (abs_mvd_greater0/1 bins plus
// the EG1 suffix), a close upper estimate of the CABAC cost
static inline int mvd_bits(i32 v) {
  u32 a = (u32)abs_i(v);
  if (a == 0) return 1;
  if (a == 1) return 3;
  int k = 1;
  u32 r = a - 2;
  int len = 2;                 // greater0 + greater1 bins
  while (r >= (1u << k)) {     // EG1 prefix/suffix
    r -= 1u << k;
    k++;
    len += 2;
  }
  return len + k + 1;          // suffix bits + sign
}

int Encoder::sad_luma_rect(int x0, int y0, int w, int h) const {
  int sad = 0;
  for (int yy = 0; yy < h; yy++)
    for (int xx = 0; xx < w; xx++)
      sad += abs_i(src_px(0, x0 + xx, y0 + yy) - rec_px(0, x0 + xx, y0 + yy));
  return sad;
}

PbMotion Encoder::predict_inter(int x0, int y0, int n, const PbMotion& m,
                                bool emit_op) {
  return predict_inter_pu(x0, y0, n, n, m, emit_op);
}

PbMotion Encoder::predict_inter_pu(int x0, int y0, int w, int h,
                                   const PbMotion& m, bool emit_op) {
  PuRec pu;
  pu.x = (u16)x0;
  pu.y = (u16)y0;
  pu.w = (u16)w;
  pu.h = (u16)h;
  pu.mv[0] = m.mv[0];
  pu.mv[1] = m.mv[1];
  pu.ref_idx[0] = m.ref_idx[0];
  pu.ref_idx[1] = m.ref_idx[1];
  pu.pred_flags = m.pred_flags;
  pu.slice = 0;
  // prog_.ref_frames is laid out in L0 order (both lists share it, GPB)
  pu.ref_dpb[0] = (m.pred_flags & 1) ? m.ref_idx[0] : -1;
  pu.ref_dpb[1] =
      (m.pred_flags & 2) ? (i8)l1_dpb_map_[max_i(m.ref_idx[1], 0)] : -1;
  execute_pu_scalar(prog_, pu);
  if (emit_op) {
    prog_.pus.push_back(pu);
    prog_.ops.push_back({Op::kInterPred, (u32)(prog_.pus.size() - 1)});
  }
  return m;
}

// Evaluate whether the CU at (x0,y0) can be coded as one big skip CU: some
// merge candidate whose prediction leaves an all-zero quantized residual in
// every 16x16 sub-transform of every channel.
bool Encoder::try_large_skip(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int n = 1 << log2_size;
  PbMotion cand[5];
  derive_merge_list(f, *sh_, x0, y0, log2_size, x0, y0, n, n, 0, PART_2Nx2N,
                    cand);

  auto quantizes_to_zero = [&](int cidx, int bx, int by, int bs) {
    i32 res[16 * 16], coeffs[16 * 16];
    for (int yy = 0; yy < bs; yy++)
      for (int xx = 0; xx < bs; xx++)
        res[yy * bs + xx] = src_px(cidx, bx + xx, by + yy) -
                            rec_px(cidx, bx + xx, by + yy);
    if (cfg_.lossless) {
      // transquant bypass codes the residual raw: a skip is only valid
      // when the prediction is already exact
      for (int i = 0; i < bs * bs; i++)
        if (res[i]) return false;
      return true;
    }
    int lg = ilog2((u32)bs);
    const int bd = cidx == 0 ? sps_->bit_depth_luma : sps_->bit_depth_chroma;
    const int qpp = cur_qp_ + (cidx == 0 ? sps_->qp_bd_offset_luma
                                         : sps_->qp_bd_offset_chroma);
    fwd_dct_2d(coeffs, res, lg, bd);
    i32 levels[16 * 16];
    quantize(levels, coeffs, bs * bs, qpp, lg, bd, false);
    for (int i = 0; i < bs * bs; i++)
      if (levels[i]) return false;
    return true;
  };

  for (int k = 0; k < sh_->max_num_merge_cand; k++) {
    if (!cand[k].pred_flags) continue;
    predict_inter(x0, y0, n, cand[k], false);
    bool zero = true;
    for (int by = 0; by < n && zero; by += 16)
      for (int bx = 0; bx < n && zero; bx += 16)
        if (!quantizes_to_zero(0, x0 + bx, y0 + by, 16)) zero = false;
    if (zero && sps_->chroma_array_type != 0) {
      int sw = sps_->sub_width_c, shc = sps_->sub_height_c;
      int cw = n / sw, chh = n / shc;
      for (int c = 1; c <= 2 && zero; c++)
        for (int by = 0; by < chh && zero; by += 16)
          for (int bx = 0; bx < cw && zero; bx += 16)
            if (!quantizes_to_zero(c, x0 / sw + bx, y0 / shc + by,
                                   min_i(16, min_i(cw - bx, chh - by))))
              zero = false;
    }
    if (zero) {
      large_skip_merge_idx_ = k;
      return true;
    }
  }
  return false;
}

void Encoder::encode_large_skip(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int n = 1 << log2_size;
  int n4 = n >> 2;

  PuMotionSyntax syn;
  syn.merge_flag = true;
  syn.merge_idx = large_skip_merge_idx_;
  PbMotion m = derive_pu_motion(f, *sh_, x0, y0, log2_size, x0, y0, n, n, 0,
                                PART_2Nx2N, syn);
  predict_inter(x0, y0, n, m, true);

  if (pps_->transquant_bypass_enabled)
    cabac_->encode_bin(&ctx_[CTX_CU_TRANSQUANT_BYPASS], 1);  // all-lossless
  write_cu_skip_flag(x0, y0, 1);
  write_merge_idx(large_skip_merge_idx_);

  u8 info = (u8)(8 | (pps_->transquant_bypass_enabled ? 4 : 0));  // skip
  for (int dy = 0; dy < n4; dy++)
    for (int dx = 0; dx < n4; dx++) {
      int px = (x0 >> 2) + dx, py = (y0 >> 2) + dy;
      if (px >= f.pb_w || py >= f.pb_h) continue;
      f.cu_info[py * f.pb_w + px] = info;
    }
  mark_cu_edges(x0, y0, log2_size);
  set_cu_qp_grid(x0, y0, log2_size);
}

// Evaluate merge + AMVP for one PU rectangle; returns the best syntax and
// its SAD+bits cost.  Leaves a prediction in the recon planes (eval only,
// no motion stored) — the caller re-derives through derive_pu_motion at
// commit time so the emitted syntax always matches the decoder's candidate
// lists.
Encoder::PuChoice Encoder::choose_pu(int cb_x0, int cb_y0, int log2_cb,
                                     int xP, int yP, int w, int h,
                                     int part_idx, int part_mode) {
  Frame& f = *recon_;
  PuChoice out;

  PbMotion merge_cand[5];
  derive_merge_list(f, *sh_, cb_x0, cb_y0, log2_cb, xP, yP, w, h, part_idx,
                    part_mode, merge_cand);
  int best_merge = -1, best_merge_cost = INT32_MAX;
  for (int k = 0; k < sh_->max_num_merge_cand; k++) {
    if (!merge_cand[k].pred_flags) continue;
    predict_inter_pu(xP, yP, w, h, merge_cand[k], false);
    double lam = rd_lambda();
    int cost = (int)min_i((i64)INT32_MAX,
                          (i64)(ssd_luma_rect(xP, yP, w, h) +
                                lam * (2 + k)));
    if (cost < best_merge_cost) {
      best_merge_cost = cost;
      best_merge = k;
    }
  }

  // AMVP: per-reference coarse-to-fine full-pel search (SAD on raw samples)
  int n_active = sh_->num_ref_idx[0];
  MotionVector mvp[2];
  int best_ref = 0, bx = 0, by = 0, bsad = INT32_MAX;
  for (int r = 0; r < n_active; r++) {
    const Frame& rf = *sh_->ref_list[0][r];
    MotionVector mvp_r[2];
    derive_mvp_list(f, *sh_, cb_x0, cb_y0, log2_cb, part_idx, xP, yP, w, h,
                    0, r, mvp_r);
    auto sad_fullpel = [&](int dx, int dy) {
      int sad = 0;
      for (int yy = 0; yy < h; yy++) {
        int ry = clip3(0, rf.height - 1, yP + yy + dy);
        for (int xx = 0; xx < w; xx++) {
          int rx = clip3(0, rf.width - 1, xP + xx + dx);
          sad += abs_i(src_px(0, xP + xx, yP + yy) -
                       (rf.bytes_pp == 1 ? *rf.px8(0, rx, ry)
                                         : *rf.px16(0, rx, ry)));
        }
      }
      return sad;
    };
    int rbx = 0, rby = 0, rsad = sad_fullpel(0, 0);
    int px = mvp_r[0].x >> 2, py = mvp_r[0].y >> 2;
    int sd0 = sad_fullpel(px, py);
    if (sd0 < rsad) { rsad = sd0; rbx = px; rby = py; }
    if (cfg_.me_algo == EncoderConfig::MeAlgo::kFull) {
      // exhaustive full-pel scan of the +-me_range window at the predictor
      for (int dy = -cfg_.me_range; dy <= cfg_.me_range; dy++)
        for (int dx = -cfg_.me_range; dx <= cfg_.me_range; dx++) {
          int sd = sad_fullpel(px + dx, py + dy);
          if (sd < rsad) { rsad = sd; rbx = px + dx; rby = py + dy; }
        }
    } else if (cfg_.me_algo == EncoderConfig::MeAlgo::kDiamond) {
      for (int step = 8; step >= 1; step >>= 1) {
        if (step > cfg_.me_range) continue;
        bool improved = true;
        while (improved) {
          improved = false;
          static const int dxs[8] = {-1, 1, 0, 0, -1, -1, 1, 1};
          static const int dys[8] = {0, 0, -1, 1, -1, 1, -1, 1};
          for (int d = 0; d < 8; d++) {
            int nx = rbx + dxs[d] * step, ny = rby + dys[d] * step;
            if (abs_i(nx) > cfg_.me_range + abs_i(mvp_r[0].x >> 2) ||
                abs_i(ny) > cfg_.me_range + abs_i(mvp_r[0].y >> 2))
              continue;
            int sd = sad_fullpel(nx, ny);
            if (sd < rsad) { rsad = sd; rbx = nx; rby = ny; improved = true; }
          }
        }
      }
    }  // kZero: the predictor/zero candidates above, no search
    rsad += r * 8;  // ref_idx bit cost
    if (rsad < bsad) {
      bsad = rsad;
      best_ref = r;
      bx = rbx;
      by = rby;
      mvp[0] = mvp_r[0];
      mvp[1] = mvp_r[1];
    }
  }
  PbMotion amvp_m;
  amvp_m.intra = false;
  amvp_m.pred_flags = 1;
  amvp_m.ref_idx[0] = (i8)best_ref;
  amvp_m.ref_poc[0] = sh_->ref_poc[0][best_ref];
  amvp_m.mv[0].x = (i16)(bx * 4);
  amvp_m.mv[0].y = (i16)(by * 4);
  // sub-pel refinement: half- then quarter-pel, SAD on the real
  // interpolated prediction (the decoder's MC kernels)
  {
    predict_inter_pu(xP, yP, w, h, amvp_m, false);
    int best = sad_luma_rect(xP, yP, w, h);
    for (int step : {2, 1}) {
      bool improved = true;
      while (improved) {
        improved = false;
        static const int dxs[8] = {-1, 1, 0, 0, -1, -1, 1, 1};
        static const int dys[8] = {0, 0, -1, 1, -1, 1, -1, 1};
        for (int d = 0; d < 8; d++) {
          PbMotion t = amvp_m;
          t.mv[0].x = (i16)(amvp_m.mv[0].x + dxs[d] * step);
          t.mv[0].y = (i16)(amvp_m.mv[0].y + dys[d] * step);
          predict_inter_pu(xP, yP, w, h, t, false);
          int sd = sad_luma_rect(xP, yP, w, h);
          if (sd < best) {
            best = sd;
            amvp_m = t;
            improved = true;
          }
        }
      }
    }
    bsad = best;
  }
  int mvp_flag = 0;
  {
    i64 c0 = (i64)abs_i(amvp_m.mv[0].x - mvp[0].x) +
             abs_i(amvp_m.mv[0].y - mvp[0].y);
    i64 c1 = (i64)abs_i(amvp_m.mv[0].x - mvp[1].x) +
             abs_i(amvp_m.mv[0].y - mvp[1].y);
    if (c1 < c0) mvp_flag = 1;
  }
  int rate = 3 + 2 * best_ref +
             mvd_bits(amvp_m.mv[0].x - mvp[mvp_flag].x) +
             mvd_bits(amvp_m.mv[0].y - mvp[mvp_flag].y);
  int amvp_cost = (int)min_i(
      (i64)INT32_MAX,
      (i64)(ssd_luma_rect(xP, yP, w, h) + rd_lambda() * rate));

  if (best_merge >= 0 && best_merge_cost <= amvp_cost) {
    out.syn.merge_flag = true;
    out.syn.merge_idx = best_merge;
    out.cost = best_merge_cost;
  } else {
    out.syn.merge_flag = false;
    out.syn.inter_pred_idc = 0;  // L0
    out.syn.ref_idx[0] = best_ref;
    out.syn.mvp_flag[0] = mvp_flag;
    out.syn.mvd[0][0] = amvp_m.mv[0].x - mvp[mvp_flag].x;
    out.syn.mvd[0][1] = amvp_m.mv[0].y - mvp[mvp_flag].y;
    out.cost = amvp_cost;
  }
  return out;
}

// Motion syntax of one PU (merge, or L0 AMVP with explicit mvd).
void Encoder::write_pu_syntax(const PuMotionSyntax& syn, int x0, int y0) {
  Frame& f = *recon_;
  cabac_->encode_bin(&ctx_[CTX_MERGE_FLAG], syn.merge_flag ? 1 : 0);
  if (syn.merge_flag) {
    write_merge_idx(syn.merge_idx);
    return;
  }
  if (sh_->slice_type == SLICE_B) {
    // inter_pred_idc = PRED_L0 (spec 9.3.4.2.2)
    int ct_depth = f.ct_depth[(y0 >> 2) * f.pb_w + (x0 >> 2)];
    cabac_->encode_bin(&ctx_[CTX_INTER_PRED_IDC + ct_depth], 0);
    cabac_->encode_bin(&ctx_[CTX_INTER_PRED_IDC + 4], 0);
  }
  write_ref_idx(syn.ref_idx[0], sh_->num_ref_idx[0]);
  write_mvd(syn.mvd[0][0], syn.mvd[0][1]);
  cabac_->encode_bin(&ctx_[CTX_MVP_LX_FLAG], syn.mvp_flag[0]);
}

void Encoder::encode_cu_inter(int x0, int y0, int log2_size) {
  Frame& f = *recon_;
  int n = 1 << log2_size;
  int n4 = n >> 2;

  // --- candidate evaluation -------------------------------------------
  PuChoice full = choose_pu(x0, y0, log2_size, x0, y0, n, n, 0, PART_2Nx2N);

  // rect partitions (2NxN / Nx2N): greedy per-half estimate.  PU1's
  // candidate lists here see the pre-CU motion grid; the commit below
  // re-chooses PU1 after PU0 is stored so syntax matches the decoder.
  int part_mode = PART_2Nx2N;
  i64 best_inter = full.cost;
  PuChoice h0;
  if (cfg_.rect_parts && log2_size > sps_->log2_min_cb_size &&
      !cfg_.lossless) {
    PuChoice a0 = choose_pu(x0, y0, log2_size, x0, y0, n, n / 2, 0,
                            PART_2NxN);
    PuChoice a1 = choose_pu(x0, y0, log2_size, x0, y0 + n / 2, n, n / 2, 1,
                            PART_2NxN);
    if ((i64)a0.cost + a1.cost + (i64)(rd_lambda() * 4) < best_inter) {
      best_inter = (i64)a0.cost + a1.cost + (i64)(rd_lambda() * 4);
      part_mode = PART_2NxN;
      h0 = a0;
    }
    PuChoice b0 = choose_pu(x0, y0, log2_size, x0, y0, n / 2, n, 0,
                            PART_Nx2N);
    PuChoice b1 = choose_pu(x0, y0, log2_size, x0 + n / 2, y0, n / 2, n, 1,
                            PART_Nx2N);
    if ((i64)b0.cost + b1.cost + (i64)(rd_lambda() * 4) < best_inter) {
      best_inter = (i64)b0.cost + b1.cost + (i64)(rd_lambda() * 4);
      part_mode = PART_Nx2N;
      h0 = b0;
    }
    if (sps_->amp_enabled) {
      const int q = n / 4;
      struct AmpShape { int pm, w0, h0_, x1, y1, w1, h1; };
      const AmpShape shapes[4] = {
          {PART_2NxnU, n, q, x0, y0 + q, n, n - q},
          {PART_2NxnD, n, n - q, x0, y0 + n - q, n, q},
          {PART_nLx2N, q, n, x0 + q, y0, n - q, n},
          {PART_nRx2N, n - q, n, x0 + n - q, y0, q, n},
      };
      for (const AmpShape& a : shapes) {
        PuChoice c0 = choose_pu(x0, y0, log2_size, x0, y0, a.w0, a.h0_, 0,
                                a.pm);
        PuChoice c1 = choose_pu(x0, y0, log2_size, a.x1, a.y1, a.w1, a.h1,
                                1, a.pm);
        i64 j = (i64)c0.cost + c1.cost + (i64)(rd_lambda() * 5);
        if (j < best_inter) {
          best_inter = j;
          part_mode = a.pm;
          h0 = c0;
        }
      }
    }
  }

  // intra estimate (prediction left in recon planes), same J = D + lam*R
  int intra_mode = choose_luma_mode(x0, y0, log2_size);
  i64 intra_cost = ssd_luma_rect(x0, y0, n, n) +
                   (i64)(rd_lambda() * 8);
  (void)intra_mode;
  bool use_intra = intra_cost < best_inter;
  if (use_intra) {
    encode_cu_intra(x0, y0, log2_size);
    return;
  }

  // --- final motion + prediction (through the decoder path) ------------
  bool use_merge = false;
  PuMotionSyntax syn0, syn1;
  if (part_mode == PART_2Nx2N) {
    syn0 = full.syn;
    use_merge = syn0.merge_flag;
    PbMotion m = derive_pu_motion(f, *sh_, x0, y0, log2_size, x0, y0, n, n,
                                  0, PART_2Nx2N, syn0);
    predict_inter(x0, y0, n, m, true);
  } else {
    // PU geometry per part mode (spec Table: PartMode -> PU rectangles)
    const int q = n / 4;
    int w0p = n, h0p = n / 2, x1 = x0, y1 = y0 + n / 2, w1p = n,
        h1p = n / 2;
    bool horiz = true;
    switch (part_mode) {
      case PART_2NxN: break;
      case PART_Nx2N:
        w0p = n / 2; h0p = n; x1 = x0 + n / 2; y1 = y0; w1p = n / 2;
        h1p = n; horiz = false;
        break;
      case PART_2NxnU:
        h0p = q; y1 = y0 + q; h1p = n - q;
        break;
      case PART_2NxnD:
        h0p = n - q; y1 = y0 + n - q; h1p = q;
        break;
      case PART_nLx2N:
        w0p = q; h0p = n; x1 = x0 + q; y1 = y0; w1p = n - q; h1p = n;
        horiz = false;
        break;
      case PART_nRx2N:
        w0p = n - q; h0p = n; x1 = x0 + n - q; y1 = y0; w1p = q; h1p = n;
        horiz = false;
        break;
    }
    syn0 = h0.syn;
    PbMotion m0 = derive_pu_motion(f, *sh_, x0, y0, log2_size, x0, y0, w0p,
                                   h0p, 0, part_mode, syn0);
    predict_inter_pu(x0, y0, w0p, h0p, m0, true);
    // PU0 is committed: re-choose PU1 against the real candidate lists
    PuChoice h1 = choose_pu(x0, y0, log2_size, x1, y1, w1p, h1p, 1,
                            part_mode);
    syn1 = h1.syn;
    PbMotion m1 = derive_pu_motion(f, *sh_, x0, y0, log2_size, x1, y1, w1p,
                                   h1p, 1, part_mode, syn1);
    predict_inter_pu(x1, y1, w1p, h1p, m1, true);
    // internal PU deblock edge (8-sample grid only, spec 8.7.2.2)
    if (horiz) {
      int ey = y1;
      if ((ey & 7) == 0) {
        int yy4 = ey >> 2;
        for (int i = 0; i < n4; i++) {
          int px = (x0 >> 2) + i;
          if (px < f.pb_w && yy4 < f.pb_h)
            f.deblock_flags[yy4 * f.pb_w + px] |= 8;
        }
      }
    } else {
      int ex = x1;
      if ((ex & 7) == 0) {
        int xx4 = ex >> 2;
        for (int i = 0; i < n4; i++) {
          int py = (y0 >> 2) + i;
          if (py < f.pb_h && xx4 < f.pb_w)
            f.deblock_flags[py * f.pb_w + xx4] |= 4;
        }
      }
    }
  }

  // --- residuals for all channels -------------------------------------
  struct Ch {
    bool cbf = false;
    std::vector<i32> levels;
    int x0c, y0c, log2, cidx;
  } ch[5];  // Y, Cb0, Cr0, Cb1 (4:2:2), Cr1 (4:2:2)
  auto prepare = [&](int slot, int log2c, int x0c, int y0c) {
    Ch& pc = ch[slot];
    int cidx = (slot >= 3) ? slot - 2 : slot;
    pc.x0c = x0c;
    pc.y0c = y0c;
    pc.log2 = log2c;
    pc.cidx = cidx;
    int nn = 1 << log2c;
    i32 res[32 * 32];
    for (int yy = 0; yy < nn; yy++)
      for (int xx = 0; xx < nn; xx++)
        res[yy * nn + xx] =
            src_px(cidx, x0c + xx, y0c + yy) - rec_px(cidx, x0c + xx, y0c + yy);
    pc.levels.resize(nn * nn);
    if (pps_->transquant_bypass_enabled) {
      // lossless: the coded levels ARE the residual samples
      for (int i = 0; i < nn * nn; i++)
        pc.levels[i] = clip3(-32768, 32767, res[i]);
    } else {
      i32 coeffs[32 * 32];
      const int bd = cidx == 0 ? sps_->bit_depth_luma : sps_->bit_depth_chroma;
      const int qpp = cur_qp_ + (cidx == 0 ? sps_->qp_bd_offset_luma
                                           : sps_->qp_bd_offset_chroma);
      fwd_dct_2d(coeffs, res, log2c, bd);
      if (cfg_.rdoq)
        rdoq_quantize(pc.levels.data(), coeffs, qpp, log2c, cidx, 0, bd,
                      false, ctx_, rd_lambda());
      else
        quantize(pc.levels.data(), coeffs, nn * nn, qpp, log2c, bd, false);
      if (pps_->sign_data_hiding)
        apply_sign_hiding(pc.levels.data(), log2c, 0, coeffs, qpp, bd);
    }
    pc.cbf = false;
    for (int i = 0; i < nn * nn; i++)
      if (pc.levels[i]) pc.cbf = true;
  };
  const int cat = sps_->chroma_array_type;
  const bool c444i = cat == 3;
  const bool c422i = cat == 2;
  int log2ci = c444i ? log2_size : log2_size - 1;
  int x0ci = c444i ? x0 : (x0 >> 1);
  int y0ci = (cat == 1) ? (y0 >> 1) : y0;
  int y_offi = 1 << log2ci;
  prepare(0, log2_size, x0, y0);
  if (cat != 0) {
    prepare(1, log2ci, x0ci, y0ci);
    prepare(2, log2ci, x0ci, y0ci);
    if (c422i) {
      prepare(3, log2ci, x0ci, y0ci + y_offi);
      prepare(4, log2ci, x0ci, y0ci + y_offi);
    }
  }
  bool any_cbf = ch[0].cbf || ch[1].cbf || ch[2].cbf || ch[3].cbf || ch[4].cbf;

  mark_cu_edges(x0, y0, log2_size);
  if (ch[0].cbf) mark_nonzero(x0, y0, log2_size);

  // update metadata grids (bit3 skip for context derivation, bit2 bypass
  // for the loop-filter exclusion)
  u8 info = (u8)(((use_merge && !any_cbf) ? 8 : 0) |
                 (pps_->transquant_bypass_enabled ? 4 : 0));
  for (int dy = 0; dy < n4; dy++)
    for (int dx = 0; dx < n4; dx++) {
      int px = (x0 >> 2) + dx, py = (y0 >> 2) + dy;
      if (px >= f.pb_w || py >= f.pb_h) continue;
      f.cu_info[py * f.pb_w + px] = info;
    }

  // --- syntax ----------------------------------------------------------
  if (pps_->transquant_bypass_enabled)
    cabac_->encode_bin(&ctx_[CTX_CU_TRANSQUANT_BYPASS], 1);  // all-lossless
  if (part_mode == PART_2Nx2N && use_merge && !any_cbf) {
    // skip CU: prediction is the reconstruction
    write_cu_skip_flag(x0, y0, 1);
    write_merge_idx(syn0.merge_idx);
    set_cu_qp_grid(x0, y0, log2_size);
    return;
  }

  write_cu_skip_flag(x0, y0, 0);
  cabac_->encode_bin(&ctx_[CTX_PRED_MODE_FLAG], 0);  // inter
  if (part_mode == PART_2Nx2N) {
    cabac_->encode_bin(&ctx_[CTX_PART_MODE + 0], 1);
  } else {
    // log2 > min_cb binarization (9.3.3.7), incl. the AMP bins
    bool horiz_pm = (part_mode == PART_2NxN || part_mode == PART_2NxnU ||
                     part_mode == PART_2NxnD);
    cabac_->encode_bin(&ctx_[CTX_PART_MODE + 0], 0);
    cabac_->encode_bin(&ctx_[CTX_PART_MODE + 1], horiz_pm ? 1 : 0);
    if (sps_->amp_enabled) {
      bool sym = (part_mode == PART_2NxN || part_mode == PART_Nx2N);
      cabac_->encode_bin(&ctx_[CTX_PART_MODE + 3], sym ? 1 : 0);
      if (!sym)
        cabac_->encode_bypass(
            (part_mode == PART_2NxnD || part_mode == PART_nRx2N) ? 1 : 0);
    }
  }
  write_pu_syntax(syn0, x0, y0);
  if (part_mode != PART_2Nx2N) {
    const int q = n / 4;
    int x1 = x0, y1 = y0;
    switch (part_mode) {
      case PART_2NxN: y1 = y0 + n / 2; break;
      case PART_Nx2N: x1 = x0 + n / 2; break;
      case PART_2NxnU: y1 = y0 + q; break;
      case PART_2NxnD: y1 = y0 + n - q; break;
      case PART_nLx2N: x1 = x0 + q; break;
      case PART_nRx2N: x1 = x0 + n - q; break;
    }
    write_pu_syntax(syn1, x1, y1);
  }
  if (!(part_mode == PART_2Nx2N && use_merge)) {
    // rqt_root_cbf (inferred 1 only for 2Nx2N merge, syntax.cc:790)
    cabac_->encode_bin(&ctx_[CTX_RQT_ROOT_CBF], any_cbf ? 1 : 0);
    if (!any_cbf) {
      set_cu_qp_grid(x0, y0, log2_size);
      return;
    }
  }

  // transform tree (single TU = CU): split flag when MaxTrafoDepth > 0,
  // then chroma cbfs, then cbf_luma
  if (sps_->max_transform_hierarchy_depth_inter > 0 &&
      log2_size <= sps_->log2_max_tb_size &&
      log2_size > sps_->log2_min_tb_size)
    cabac_->encode_bin(&ctx_[CTX_SPLIT_TRANSFORM_FLAG + 5 - log2_size], 0);
  if (cat != 0) {
    cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[1].cbf ? 1 : 0);
    if (c422i)
      cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[3].cbf ? 1 : 0);
    cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[2].cbf ? 1 : 0);
    if (c422i)
      cabac_->encode_bin(&ctx_[CTX_CBF_CHROMA + 0], ch[4].cbf ? 1 : 0);
  }
  // cbf_luma inferred 1 when inter, depth 0, no chroma cbf (syntax.cc:866)
  if (ch[1].cbf || ch[2].cbf || ch[3].cbf || ch[4].cbf)
    cabac_->encode_bin(&ctx_[CTX_CBF_LUMA + 1], ch[0].cbf ? 1 : 0);
  maybe_write_cu_qp_delta();  // any_cbf is true here

  auto emit = [&](Ch& pc) {
    if (!pc.cbf) return;
    int nn = 1 << pc.log2;
    u32 start = (u32)prog_.coeff_val.size();
    for (int i = 0; i < nn * nn; i++) {
      if (pc.levels[i]) {
        prog_.coeff_val.push_back((i16)clip3(-32768, 32767, pc.levels[i]));
        int xc = i % nn, yc = i / nn;
        prog_.coeff_pos.push_back((u16)((yc << 6) | xc));
      }
    }
    TuRec tu;
    tu.x = (u16)pc.x0c;
    tu.y = (u16)pc.y0c;
    tu.log2_size = (u8)pc.log2;
    tu.cidx = (u8)pc.cidx;
    tu.qp = (i8)(pc.cidx == 0
                     ? cur_qp_ + sps_->qp_bd_offset_luma
                     : chroma_qp(cur_qp_, pc.cidx) + sps_->qp_bd_offset_chroma);
    tu.flags = pps_->transquant_bypass_enabled ? TuRec::kTransquantBypass
                                               : 0;  // inter: no intra flag
    tu.coeff_start = start;
    tu.ncoeff = (u16)(prog_.coeff_val.size() - start);
    prog_.tus.push_back(tu);
    prog_.ops.push_back({Op::kAddResidual, (u32)(prog_.tus.size() - 1)});
    execute_tu_scalar(prog_, tu);
  };
  // residual syntax + reconstruction, decoder channel order (Y, Cb, Cr);
  // inter residual scan is always diagonal (scan_idx 0)
  if (ch[0].cbf)
    write_residual(x0, y0, log2_size, 0, ch[0].levels.data(), 0, false,
                   false);
  emit(ch[0]);
  if (ch[1].cbf)
    write_residual(x0, y0, log2ci, 1, ch[1].levels.data(), 0, false, false);
  emit(ch[1]);
  if (c422i) {
    if (ch[3].cbf)
      write_residual(x0, y0, log2ci, 1, ch[3].levels.data(), 0, false,
                     false);
    emit(ch[3]);
  }
  if (ch[2].cbf)
    write_residual(x0, y0, log2ci, 2, ch[2].levels.data(), 0, false, false);
  emit(ch[2]);
  if (c422i) {
    if (ch[4].cbf)
      write_residual(x0, y0, log2ci, 2, ch[4].levels.data(), 0, false,
                     false);
    emit(ch[4]);
  }
  set_cu_qp_grid(x0, y0, log2_size);
}

// ---------------------------------------------------------------------------
// residual_coding writer (inverse of residual.cc; spec 7.3.8.11)
// ---------------------------------------------------------------------------
void Encoder::write_residual(int x0c, int y0c, int log2, int cidx,
                             const i32* levels, int scan_idx, bool tskip,
                             bool cu_intra) {
  CabacEncoder& c = *cabac_;
  static const bool trace = getenv("TDE_RES_TRACE") != nullptr;
  int n = 1 << log2;
  const ScanPos* scan_sub = scan_order(log2 - 2, scan_idx);
  const ScanPos* scan_pos = scan_order(2, scan_idx);
  int sbw = 1 << (log2 - 2);

  if (pps_->transform_skip_enabled && !pps_->transquant_bypass_enabled &&
      log2 <= pps_->log2_max_transform_skip_block_size) {
    c.encode_bin(&ctx_[cidx == 0 ? CTX_TRANSFORM_SKIP_LUMA
                                 : CTX_TRANSFORM_SKIP_CHROMA],
                 tskip ? 1 : 0);
  }

  // explicit RDPCM (RExt): the decoder parses this flag for inter TUs with
  // transform-skip or transquant bypass (residual.cc:89-97); always signal
  // "off" — the SPS flag exists for decoder-differential coverage only
  if (!cu_intra && sps_->explicit_rdpcm_enabled &&
      (tskip || pps_->transquant_bypass_enabled)) {
    c.encode_bin(&ctx_[CTX_RDPCM_FLAG + (cidx ? 1 : 0)], 0);
  }

  // --- locate last significant coefficient in scan order ---
  int last_sb = -1, last_pos = -1;
  for (int i = sbw * sbw - 1; i >= 0 && last_sb < 0; i--) {
    for (int p = 15; p >= 0; p--) {
      int xc = (scan_sub[i].x << 2) + scan_pos[p].x;
      int yc = (scan_sub[i].y << 2) + scan_pos[p].y;
      if (levels[yc * n + xc]) {
        last_sb = i;
        last_pos = p;
        break;
      }
    }
  }
  assert(last_sb >= 0);

  int lx = (scan_sub[last_sb].x << 2) + scan_pos[last_pos].x;
  int ly = (scan_sub[last_sb].y << 2) + scan_pos[last_pos].y;
  if (scan_idx == 2) std::swap(lx, ly);

  // --- last_sig_coeff prefixes/suffixes ---
  auto write_last = [&](int v, int ctx_base) {
    int cmax = (log2 << 1) - 1;
    int ctx_offset, ctx_shift;
    if (cidx == 0) {
      ctx_offset = 3 * (log2 - 2) + ((log2 - 1) >> 2);
      ctx_shift = (log2 + 1) >> 2;
    } else {
      ctx_offset = 15;
      ctx_shift = log2 - 2;
    }
    int prefix;
    if (v <= 3) {
      prefix = v;
    } else {
      int g = ilog2((u32)v);
      prefix = 2 * g + (v >= (3 << (g - 1)) ? 1 : 0);
    }
    for (int b = 0; b < prefix; b++)
      c.encode_bin(&ctx_[ctx_base + ctx_offset + (b >> ctx_shift)], 1);
    if (prefix < cmax)
      c.encode_bin(&ctx_[ctx_base + ctx_offset + (prefix >> ctx_shift)], 0);
    return prefix;
  };
  auto write_last_suffix = [&](int v, int prefix) {
    if (prefix > 3) {
      int nbits = (prefix >> 1) - 1;
      int suffix = v - ((2 + (prefix & 1)) << nbits);
      c.encode_bypass_bits((u32)suffix, nbits);
    }
  };
  if (trace) printf("RES (%d,%d) s%d c%d scan%d last=%d,%d\n", x0c, y0c, n, cidx, scan_idx, lx, ly);
  // spec bin order: x-prefix, y-prefix, then x-suffix, y-suffix
  int prefix_x = write_last(lx, CTX_LAST_SIG_X_PREFIX);
  int prefix_y = write_last(ly, CTX_LAST_SIG_Y_PREFIX);
  write_last_suffix(lx, prefix_x);
  write_last_suffix(ly, prefix_y);

  // --- sub-block loop ---
  u8 csbf[8 * 8];
  memset(csbf, 0, sizeof(csbf));
  // mark which sub-blocks have coefficients
  bool sb_has[8 * 8];
  for (int i = 0; i < sbw * sbw; i++) {
    int xs = scan_sub[i].x, ys = scan_sub[i].y;
    bool has = false;
    for (int p = 0; p < 16; p++) {
      int xc = (xs << 2) + scan_pos[p].x, yc = (ys << 2) + scan_pos[p].y;
      if (levels[yc * n + xc]) has = true;
    }
    sb_has[i] = has;
  }

  int c1 = 1;
  for (int i = last_sb; i >= 0; i--) {
    int xs = scan_sub[i].x, ys = scan_sub[i].y;
    int coded;
    int infer_sb_dc = 0;
    if (i < last_sb && i > 0) {
      coded = sb_has[i] ? 1 : 0;
      int csbf_ctx = (csbf[xs + ys * sbw] & 1) | (csbf[xs + ys * sbw] >> 1);
      c.encode_bin(&ctx_[CTX_CODED_SUB_BLOCK_FLAG + (cidx ? 2 : 0) + csbf_ctx],
                   coded);
      infer_sb_dc = 1;
    } else {
      coded = 1;
    }
    if (coded) {
      if (xs > 0) csbf[xs - 1 + ys * sbw] |= 1;
      if (ys > 0) csbf[xs + (ys - 1) * sbw] |= 2;
    }
    if (!coded) continue;

    int prev_csbf = csbf[xs + ys * sbw];

    // significance flags + coefficient collection (descending scan order)
    i32 coeff_abs[16];
    i8 coeff_sign[16], pos_list[16];
    int n_coeffs = 0;
    int first_coded = (i == last_sb) ? last_pos - 1 : 15;
    if (i == last_sb) {
      int xc = (xs << 2) + scan_pos[last_pos].x;
      int yc = (ys << 2) + scan_pos[last_pos].y;
      i32 v = levels[yc * n + xc];
      coeff_abs[0] = abs_i(v);
      coeff_sign[0] = v < 0;
      pos_list[0] = (i8)last_pos;
      n_coeffs = 1;
    }
    for (int p = first_coded; p > 0; p--) {
      int xc = (xs << 2) + scan_pos[p].x, yc = (ys << 2) + scan_pos[p].y;
      i32 v = levels[yc * n + xc];
      int sig = v != 0;
      int ctx_inc = sig_ctx_inc(log2, cidx, xc, yc, prev_csbf, scan_idx);
      c.encode_bin(&ctx_[CTX_SIG_COEFF_FLAG + ctx_inc], sig);
      if (sig) {
        coeff_abs[n_coeffs] = abs_i(v);
        coeff_sign[n_coeffs] = v < 0;
        pos_list[n_coeffs] = (i8)p;
        n_coeffs++;
        infer_sb_dc = 0;
      }
    }
    // DC
    if (first_coded >= 0) {
      int xc = xs << 2, yc = ys << 2;
      i32 v = levels[yc * n + xc];
      if (infer_sb_dc) {
        // inference requires a nonzero DC (enforced by sb_has + no AC case)
        assert(v != 0);
        coeff_abs[n_coeffs] = abs_i(v);
        coeff_sign[n_coeffs] = v < 0;
        pos_list[n_coeffs] = 0;
        n_coeffs++;
      } else {
        int sig = v != 0;
        int ctx_inc = sig_ctx_inc(log2, cidx, xc, yc, prev_csbf, scan_idx);
        c.encode_bin(&ctx_[CTX_SIG_COEFF_FLAG + ctx_inc], sig);
        if (sig) {
          coeff_abs[n_coeffs] = abs_i(v);
          coeff_sign[n_coeffs] = v < 0;
          pos_list[n_coeffs] = 0;
          n_coeffs++;
        }
      }
    }
    if (!n_coeffs) continue;
    if (trace) {
      printf("  sb %d n%d pos:", i, n_coeffs);
      for (int k = 0; k < n_coeffs; k++) printf(" %d", pos_list[k]);
      printf("\n");
      for (int k = 0; k < n_coeffs; k++)
        printf("    coeff p%d = %d\n", pos_list[k], coeff_sign[k] ? -(int)coeff_abs[k] : (int)coeff_abs[k]);
    }

    // greater1 flags (max 8) with the caller-side c1 tracking
    int ctx_set = (i == 0 || cidx > 0) ? 0 : 2;
    if (c1 == 0) ctx_set++;
    c1 = 1;
    i8 has_max_base[16];
    int first_gt1 = -1;
    int n_gt1 = min_i(8, n_coeffs);
    for (int k = 0; k < n_coeffs; k++) has_max_base[k] = 1;
    for (int k = 0; k < n_gt1; k++) {
      int gt1 = coeff_abs[k] > 1;
      int ctx_inc = ctx_set * 4 + min_i(c1, 3) + (cidx ? 16 : 0);
      c.encode_bin(&ctx_[CTX_COEFF_ABS_GT1 + ctx_inc], gt1);
      if (gt1) {
        c1 = 0;
        if (first_gt1 < 0) first_gt1 = k;
      } else {
        has_max_base[k] = 0;
        if (c1 < 3 && c1 > 0) c1++;
      }
    }
    int base_level_gt2 = -1;
    if (first_gt1 >= 0) {
      int gt2 = coeff_abs[first_gt1] > 2;
      c.encode_bin(&ctx_[CTX_COEFF_ABS_GT2 + ctx_set + (cidx ? 4 : 0)], gt2);
      has_max_base[first_gt1] = (i8)gt2;
      base_level_gt2 = first_gt1;
    }

    // signs (last one hidden when SDH applies to this sub-block)
    bool sign_hidden = pps_->sign_data_hiding &&
                       !pps_->transquant_bypass_enabled && n_coeffs > 0 &&
                       (pos_list[0] - pos_list[n_coeffs - 1] > 3);
    int n_signs = sign_hidden ? n_coeffs - 1 : n_coeffs;
    for (int k = 0; k < n_signs; k++) c.encode_bypass(coeff_sign[k]);

    // remaining levels (mirrors the decoder: coded only where the base level
    // reached its maximum; decoder base = 1 + gt1 + gt2-as-coded)
    int rice = 0;
    int sb_type = (cidx == 0 ? 2 : 0) +
                  ((tskip || pps_->transquant_bypass_enabled) ? 1 : 0);
    if (sps_->persistent_rice_adaptation_enabled)
      rice = stat_coeff_enc_[sb_type] / 4;  // residual.cc:327
    bool first_rem = true;
    for (int k = 0; k < n_coeffs; k++) {
      int coded_base = 1;
      if (k < n_gt1) {
        coded_base += (coeff_abs[k] > 1) ? 1 : 0;
        if (k == base_level_gt2) coded_base += (coeff_abs[k] > 2) ? 1 : 0;
      }
      if (!has_max_base[k]) continue;
      int remaining = (int)coeff_abs[k] - coded_base;
      assert(remaining >= 0);
      // TR/EGk hybrid (spec 9.3.3.9), inverse of the decoder's parse
      if ((remaining >> rice) < 4) {
        int prefix = remaining >> rice;
        for (int b = 0; b < prefix; b++) c.encode_bypass(1);
        c.encode_bypass(0);
        if (rice)
          c.encode_bypass_bits((u32)(remaining & ((1 << rice) - 1)), rice);
      } else {
        // prefix p>3 covers [((1<<(p-3))+2) << rice, ((1<<(p-2))+2) << rice)
        int pfx = 4;
        while (remaining >= (((1 << (pfx - 2)) + 2) << rice)) pfx++;
        int suffix = remaining - (((1 << (pfx - 3)) + 2) << rice);
        for (int b = 0; b < pfx; b++) c.encode_bypass(1);
        c.encode_bypass(0);
        c.encode_bypass_bits((u32)suffix, pfx - 3 + rice);
      }
      if (coded_base + remaining > 3 * (1 << rice))
        rice = min_i(rice + 1,
                     sps_->persistent_rice_adaptation_enabled ? 29 : 4);
      if (sps_->persistent_rice_adaptation_enabled && first_rem) {
        // adapt on the first coded remaining of the sub-block
        // (residual.cc:339-350)
        u8& sc = stat_coeff_enc_[sb_type];
        if (remaining >= (3 << (sc / 4))) {
          if (sc < 119) sc++;
        } else if (2 * remaining < (1 << (sc / 4)) && sc > 0) {
          sc--;
        }
      }
      first_rem = false;
    }
  }
}

int Encoder::map_dm_chroma(int luma_mode) { return luma_mode; }

int Encoder::chroma_qp(int qp_y, int cidx) const {
  int off = (cidx == 2) ? pps_->cr_qp_offset : pps_->cb_qp_offset;
  int qpi = clip3(0, 57, qp_y + off);
  if (sps_->chroma_array_type != 1) return min_i(qpi, 51);
  if (qpi < 30) return qpi;
  if (qpi > 43) return qpi - 6;
  static const int tab[14] = {29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37};
  return tab[qpi - 30];
}

}  // namespace tde265
