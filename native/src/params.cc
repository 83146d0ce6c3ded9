// Parameter-set parsing.  Syntax follows ITU-T H.265 sections 7.3.2/7.3.3/
// 7.3.4/7.3.7 and Annex E.  Behavior counterpart of the reference parsers in
// /root/reference/libde265/{vps,sps,pps,vui}.cc.
#include "tde265/params.h"

#include <cstring>

namespace tde265 {

// ---------------------------------------------------------------------------
// profile_tier_level
// ---------------------------------------------------------------------------
static void parse_ptl_common(BitReader& br, int* profile_space, bool* tier,
                             int* profile_idc, u32* compat) {
  *profile_space = br.u(2);
  *tier = br.get_flag();
  *profile_idc = br.u(5);
  u32 c = 0;
  for (int i = 0; i < 32; i++) c |= (u32)br.u(1) << i;
  *compat = c;
}

bool ProfileTierLevel::parse(BitReader& br, bool profile_present, int max_sub_layers) {
  if (profile_present) {
    parse_ptl_common(br, &general_profile_space, &general_tier_flag,
                     &general_profile_idc, &general_profile_compatibility_flags);
    general_progressive_source_flag = br.get_flag();
    general_interlaced_source_flag = br.get_flag();
    general_non_packed_constraint_flag = br.get_flag();
    general_frame_only_constraint_flag = br.get_flag();
    br.skip(32);  // general_reserved_zero_44bits
    br.skip(12);
  }
  general_level_idc = br.u(8);

  int n = max_sub_layers - 1;
  if (n > kMaxSubLayers - 1) return false;
  for (int i = 0; i < n; i++) {
    sub_layer[i].profile_present = br.get_flag();
    sub_layer[i].level_present = br.get_flag();
  }
  if (n > 0) {
    for (int i = n; i < 8; i++) br.skip(2);  // reserved_zero_2bits
  }
  for (int i = 0; i < n; i++) {
    if (sub_layer[i].profile_present) {
      bool tier;
      u32 compat;
      parse_ptl_common(br, &sub_layer[i].profile_space, &tier,
                       &sub_layer[i].profile_idc, &compat);
      br.skip(32);  // source flags + reserved 44 bits
      br.skip(16);
    }
    if (sub_layer[i].level_present) sub_layer[i].level_idc = br.u(8);
  }
  return br.ok();
}

// ---------------------------------------------------------------------------
// Annex A capability limits (Table A.8, Main tier); mirrors
// libde265_tpu/models/profiles.py.
// ---------------------------------------------------------------------------
namespace {
struct LevelLimit { int idc; i64 max_luma_ps; i64 max_luma_sr; };
const LevelLimit kLevels[] = {
    {30, 36864, 552960},          {60, 122880, 3686400},
    {63, 245760, 7372800},        {90, 552960, 16588800},
    {93, 983040, 33177600},       {120, 2228224, 66846720},
    {123, 2228224, 133693440},    {150, 8912896, 267386880},
    {153, 8912896, 534773760},    {156, 8912896, 1069547520},
    {180, 35651584, 1069547520},  {183, 35651584, 2139095040},
    {186, 35651584, 4278190080LL},
};
}  // namespace

i64 annex_a_max_luma_ps(int level_idc) {
  for (const auto& l : kLevels)
    if (l.idc >= level_idc) return l.max_luma_ps;
  return 0;
}

i64 annex_a_max_luma_sr(int level_idc) {
  for (const auto& l : kLevels)
    if (l.idc >= level_idc) return l.max_luma_sr;
  return 0;
}

int annex_a_min_level_idc(int width, int height, int fps) {
  const i64 ps = (i64)width * height;
  const i64 sr = ps * (fps > 0 ? fps : 30);
  for (const auto& l : kLevels)
    if (l.max_luma_ps >= ps && l.max_luma_sr >= sr) return l.idc;
  return kLevels[sizeof(kLevels) / sizeof(kLevels[0]) - 1].idc;
}

// ---------------------------------------------------------------------------
// short-term ref pic sets (spec 7.3.7 + 7.4.8 derivation)
// ---------------------------------------------------------------------------
bool parse_strps(BitReader& br, const std::vector<ShortTermRefPicSet>& sets,
                 int idx, bool slice_header, int sps_max_dec_pic_buffering,
                 ShortTermRefPicSet* out) {
  *out = ShortTermRefPicSet();

  bool inter_pred = false;
  if (idx != 0) inter_pred = br.get_flag();

  if (inter_pred) {
    int delta_idx = 1;
    if (slice_header) delta_idx = (int)br.ue() + 1;
    if (delta_idx > idx) return false;
    int ref_idx = idx - delta_idx;
    const ShortTermRefPicSet& ref = sets[ref_idx];

    int sign = br.u(1);
    int abs_delta = (int)br.ue() + 1;
    int delta_rps = (1 - 2 * sign) * abs_delta;

    int num_delta = ref.num_pics();
    bool used_flag[kMaxRefPics * 2 + 2];
    bool use_delta[kMaxRefPics * 2 + 2];
    for (int j = 0; j <= num_delta; j++) {
      used_flag[j] = br.get_flag();
      use_delta[j] = used_flag[j] ? true : br.get_flag();
    }

    // Derivation 7.4.8 (7-47..7-50).  Index convention into the reference
    // set's pictures: j in [0, numNeg) -> S0[j]; j in [numNeg, numDelta) ->
    // S1[j-numNeg]; j == numDelta -> the delta_rps itself.
    int i = 0;
    for (int j = ref.num_positive - 1; j >= 0; j--) {
      int d = ref.delta_poc_s1[j] + delta_rps;
      if (d < 0 && use_delta[ref.num_negative + j]) {
        out->delta_poc_s0[i] = d;
        out->used_s0[i] = used_flag[ref.num_negative + j];
        i++;
      }
    }
    if (delta_rps < 0 && use_delta[num_delta]) {
      out->delta_poc_s0[i] = delta_rps;
      out->used_s0[i] = used_flag[num_delta];
      i++;
    }
    for (int j = 0; j < ref.num_negative; j++) {
      int d = ref.delta_poc_s0[j] + delta_rps;
      if (d < 0 && use_delta[j]) {
        out->delta_poc_s0[i] = d;
        out->used_s0[i] = used_flag[j];
        i++;
      }
    }
    out->num_negative = i;

    i = 0;
    for (int j = ref.num_negative - 1; j >= 0; j--) {
      int d = ref.delta_poc_s0[j] + delta_rps;
      if (d > 0 && use_delta[j]) {
        out->delta_poc_s1[i] = d;
        out->used_s1[i] = used_flag[j];
        i++;
      }
    }
    if (delta_rps > 0 && use_delta[num_delta]) {
      out->delta_poc_s1[i] = delta_rps;
      out->used_s1[i] = used_flag[num_delta];
      i++;
    }
    for (int j = 0; j < ref.num_positive; j++) {
      int d = ref.delta_poc_s1[j] + delta_rps;
      if (d > 0 && use_delta[ref.num_negative + j]) {
        out->delta_poc_s1[i] = d;
        out->used_s1[i] = used_flag[ref.num_negative + j];
        i++;
      }
    }
    out->num_positive = i;
  } else {
    out->num_negative = (int)br.ue();
    out->num_positive = (int)br.ue();
    if (out->num_negative > kMaxRefPics || out->num_positive > kMaxRefPics ||
        out->num_negative + out->num_positive > sps_max_dec_pic_buffering)
      return false;
    int last = 0;
    for (int j = 0; j < out->num_negative; j++) {
      int d = (int)br.ue() + 1;
      last -= d;
      out->delta_poc_s0[j] = last;
      out->used_s0[j] = br.get_flag();
    }
    last = 0;
    for (int j = 0; j < out->num_positive; j++) {
      int d = (int)br.ue() + 1;
      last += d;
      out->delta_poc_s1[j] = last;
      out->used_s1[j] = br.get_flag();
    }
  }
  return br.ok();
}

// ---------------------------------------------------------------------------
// Scaling lists (spec 7.3.4).  Default lists are spec Tables 7-5/7-6, stored
// in the coded (up-right diagonal) order as in the spec.
// ---------------------------------------------------------------------------
static const u8 kDefaultList4x4[16] = {16, 16, 16, 16, 16, 16, 16, 16,
                                       16, 16, 16, 16, 16, 16, 16, 16};
static const u8 kDefaultList8x8Intra[64] = {
    16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 17, 16, 17, 16, 17, 18,
    17, 18, 18, 17, 18, 21, 19, 20, 21, 20, 19, 21, 24, 22, 22, 24,
    24, 22, 22, 24, 25, 25, 27, 30, 27, 25, 25, 29, 31, 35, 35, 31,
    29, 36, 41, 44, 41, 36, 47, 54, 54, 47, 65, 70, 65, 88, 88, 115};
static const u8 kDefaultList8x8Inter[64] = {
    16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 17, 17, 17, 17, 17, 18,
    18, 18, 18, 18, 18, 20, 20, 20, 20, 20, 20, 20, 24, 24, 24, 24,
    24, 24, 24, 24, 25, 25, 25, 25, 25, 25, 25, 28, 28, 28, 28, 28,
    28, 33, 33, 33, 33, 33, 41, 41, 41, 41, 54, 54, 54, 71, 71, 91};

void ScalingLists::set_default() {
  for (int m = 0; m < 6; m++) {
    memcpy(list4x4[m], kDefaultList4x4, 16);
    const u8* def8 = (m < 3) ? kDefaultList8x8Intra : kDefaultList8x8Inter;
    memcpy(list8x8[m], def8, 64);
    memcpy(list16x16[m], def8, 64);
    memcpy(list32x32[m], def8, 64);
    dc16x16[m] = 16;
    dc32x32[m] = 16;
  }
}

bool ScalingLists::parse(BitReader& br) {
  set_default();
  for (int size_id = 0; size_id < 4; size_id++) {
    int n_coefs = (size_id == 0) ? 16 : 64;
    for (int matrix_id = 0; matrix_id < 6; matrix_id += (size_id == 3) ? 3 : 1) {
      u8* list = (size_id == 0)   ? list4x4[matrix_id]
                 : (size_id == 1) ? list8x8[matrix_id]
                 : (size_id == 2) ? list16x16[matrix_id]
                                  : list32x32[matrix_id];
      u8* dc = (size_id == 2) ? &dc16x16[matrix_id]
               : (size_id == 3) ? &dc32x32[matrix_id] : nullptr;

      bool pred_mode = br.get_flag();
      if (!pred_mode) {
        int delta = (int)br.ue();
        if (size_id == 3) delta *= 3;
        if (delta > matrix_id) return false;
        if (delta == 0) {
          // default list (already set by set_default)
          const u8* def = (size_id == 0) ? kDefaultList4x4
                          : (matrix_id < 3) ? kDefaultList8x8Intra
                                            : kDefaultList8x8Inter;
          memcpy(list, def, n_coefs);
          if (dc) *dc = 16;
        } else {
          int ref = matrix_id - delta;
          const u8* ref_list = (size_id == 0)   ? list4x4[ref]
                               : (size_id == 1) ? list8x8[ref]
                               : (size_id == 2) ? list16x16[ref]
                                                : list32x32[ref];
          memcpy(list, ref_list, n_coefs);
          if (dc) *dc = (size_id == 2) ? dc16x16[ref] : dc32x32[ref];
        }
      } else {
        int next = 8;
        if (size_id > 1) {
          int dc_coef = br.se();
          if (dc_coef < -7 || dc_coef > 247) return false;
          next = dc_coef + 8;
          *dc = (u8)next;
        }
        for (int i = 0; i < n_coefs; i++) {
          int d = br.se();
          if (d < -128 || d > 127) return false;
          next = (next + d + 256) % 256;
          list[i] = (u8)next;
        }
      }
    }
  }
  return br.ok();
}

// ---------------------------------------------------------------------------
// HRD parameters (Annex E.2.2) — parsed to keep bit position, values dropped.
// ---------------------------------------------------------------------------
static bool skip_sub_layer_hrd(BitReader& br, int cpb_cnt, bool sub_pic) {
  for (int i = 0; i < cpb_cnt; i++) {
    br.ue();  // bit_rate_value_minus1
    br.ue();  // cpb_size_value_minus1
    if (sub_pic) {
      br.ue();  // cpb_size_du_value_minus1
      br.ue();  // bit_rate_du_value_minus1
    }
    br.skip(1);  // cbr_flag
  }
  return br.ok();
}

static bool skip_hrd_parameters(BitReader& br, bool common_inf, int max_sub_layers) {
  bool nal_hrd = false, vcl_hrd = false, sub_pic = false;
  if (common_inf) {
    nal_hrd = br.get_flag();
    vcl_hrd = br.get_flag();
    if (nal_hrd || vcl_hrd) {
      sub_pic = br.get_flag();
      if (sub_pic) {
        br.skip(8);  // tick_divisor_minus2
        br.skip(5);  // du_cpb_removal_delay_increment_length_minus1
        br.skip(1);  // sub_pic_cpb_params_in_pic_timing_sei_flag
        br.skip(5);  // dpb_output_delay_du_length_minus1
      }
      br.skip(4);  // bit_rate_scale
      br.skip(4);  // cpb_size_scale
      if (sub_pic) br.skip(4);  // cpb_size_du_scale
      br.skip(5);  // initial_cpb_removal_delay_length_minus1
      br.skip(5);  // au_cpb_removal_delay_length_minus1
      br.skip(5);  // dpb_output_delay_length_minus1
    }
  }
  for (int i = 0; i < max_sub_layers; i++) {
    bool fixed_rate_general = br.get_flag();
    bool fixed_rate_cvs = fixed_rate_general ? true : br.get_flag();
    bool low_delay = false;
    if (fixed_rate_cvs) {
      br.ue();  // elemental_duration_in_tc_minus1
    } else {
      low_delay = br.get_flag();
    }
    int cpb_cnt = 1;
    if (!low_delay) cpb_cnt = (int)br.ue() + 1;
    if (cpb_cnt < 1 || cpb_cnt > 32) return false;
    if (nal_hrd && !skip_sub_layer_hrd(br, cpb_cnt, sub_pic)) return false;
    if (vcl_hrd && !skip_sub_layer_hrd(br, cpb_cnt, sub_pic)) return false;
  }
  return br.ok();
}

// ---------------------------------------------------------------------------
// VUI
// ---------------------------------------------------------------------------
bool VuiParams::parse(BitReader& br, int sps_max_sub_layers) {
  present = true;
  aspect_ratio_info_present = br.get_flag();
  if (aspect_ratio_info_present) {
    aspect_ratio_idc = br.u(8);
    if (aspect_ratio_idc == 255) {  // EXTENDED_SAR
      sar_width = br.u(16);
      sar_height = br.u(16);
    }
  }
  overscan_info_present = br.get_flag();
  if (overscan_info_present) overscan_appropriate = br.get_flag();
  video_signal_type_present = br.get_flag();
  if (video_signal_type_present) {
    video_format = br.u(3);
    video_full_range_flag = br.get_flag();
    colour_description_present = br.get_flag();
    if (colour_description_present) {
      colour_primaries = br.u(8);
      transfer_characteristics = br.u(8);
      matrix_coeffs = br.u(8);
    }
  }
  chroma_loc_info_present = br.get_flag();
  if (chroma_loc_info_present) {
    chroma_sample_loc_type_top_field = (int)br.ue();
    chroma_sample_loc_type_bottom_field = (int)br.ue();
  }
  neutral_chroma_indication_flag = br.get_flag();
  field_seq_flag = br.get_flag();
  frame_field_info_present = br.get_flag();
  default_display_window_flag = br.get_flag();
  if (default_display_window_flag) {
    def_disp_win_left = (int)br.ue();
    def_disp_win_right = (int)br.ue();
    def_disp_win_top = (int)br.ue();
    def_disp_win_bottom = (int)br.ue();
  }
  timing_info_present = br.get_flag();
  if (timing_info_present) {
    num_units_in_tick = br.u(32);
    time_scale = br.u(32);
    poc_proportional_to_timing = br.get_flag();
    if (poc_proportional_to_timing) num_ticks_poc_diff_one = (int)br.ue() + 1;
    hrd_parameters_present = br.get_flag();
    if (hrd_parameters_present) {
      if (!skip_hrd_parameters(br, true, sps_max_sub_layers)) return false;
    }
  }
  bitstream_restriction_flag = br.get_flag();
  if (bitstream_restriction_flag) {
    tiles_fixed_structure_flag = br.get_flag();
    motion_vectors_over_pic_boundaries_flag = br.get_flag();
    restricted_ref_pic_lists_flag = br.get_flag();
    min_spatial_segmentation_idc = (int)br.ue();
    max_bytes_per_pic_denom = (int)br.ue();
    max_bits_per_min_cu_denom = (int)br.ue();
    log2_max_mv_length_horizontal = (int)br.ue();
    log2_max_mv_length_vertical = (int)br.ue();
  }
  return br.ok();
}

// ---------------------------------------------------------------------------
// VPS
// ---------------------------------------------------------------------------
bool Vps::parse(BitReader& br) {
  vps_id = br.u(4);
  br.skip(2);  // vps_reserved_three_2bits (base_layer flags in later versions)
  max_layers = br.u(6) + 1;
  max_sub_layers = br.u(3) + 1;
  if (max_sub_layers > kMaxSubLayers) return false;
  temporal_id_nesting = br.get_flag();
  br.skip(16);  // vps_reserved_0xffff_16bits
  if (!ptl.parse(br, true, max_sub_layers)) return false;
  sub_layer_ordering_info_present = br.get_flag();
  int first = sub_layer_ordering_info_present ? 0 : max_sub_layers - 1;
  for (int i = first; i < max_sub_layers; i++) {
    max_dec_pic_buffering[i] = (int)br.ue() + 1;
    max_num_reorder_pics[i] = (int)br.ue();
    max_latency_increase[i] = (int)br.ue();  // plus1 semantics, 0 = off
  }
  for (int i = 0; i < first; i++) {
    max_dec_pic_buffering[i] = max_dec_pic_buffering[max_sub_layers - 1];
    max_num_reorder_pics[i] = max_num_reorder_pics[max_sub_layers - 1];
    max_latency_increase[i] = max_latency_increase[max_sub_layers - 1];
  }
  max_layer_id = br.u(6);
  num_layer_sets = (int)br.ue() + 1;
  if (num_layer_sets < 1 || num_layer_sets > 1024) return false;
  for (int i = 1; i < num_layer_sets; i++) {
    for (int j = 0; j <= max_layer_id; j++) br.skip(1);  // layer_id_included_flag
  }
  timing_info_present = br.get_flag();
  if (timing_info_present) {
    num_units_in_tick = br.u(32);
    time_scale = br.u(32);
    poc_proportional_to_timing = br.get_flag();
    if (poc_proportional_to_timing) num_ticks_poc_diff_one = (int)br.ue() + 1;
    int num_hrd = (int)br.ue();
    if (num_hrd > 1024) return false;
    for (int i = 0; i < num_hrd; i++) {
      br.ue();  // hrd_layer_set_idx
      bool common_inf = (i == 0) ? true : br.get_flag();
      if (!skip_hrd_parameters(br, common_inf, max_sub_layers)) return false;
    }
  }
  // vps_extension_flag + ext data: ignored
  return br.ok();
}

// ---------------------------------------------------------------------------
// SPS
// ---------------------------------------------------------------------------
bool Sps::parse(BitReader& br) {
  vps_id = br.u(4);
  max_sub_layers = br.u(3) + 1;
  if (max_sub_layers > kMaxSubLayers) return false;
  temporal_id_nesting = br.get_flag();
  if (!ptl.parse(br, true, max_sub_layers)) return false;
  sps_id = (int)br.ue();
  if (sps_id >= 16) return false;
  chroma_format_idc = (int)br.ue();
  if (chroma_format_idc > 3) return false;
  if (chroma_format_idc == 3) separate_colour_plane_flag = br.get_flag();
  pic_width_in_luma_samples = (int)br.ue();
  pic_height_in_luma_samples = (int)br.ue();
  if (pic_width_in_luma_samples == 0 || pic_height_in_luma_samples == 0) return false;
  conformance_window_flag = br.get_flag();
  if (conformance_window_flag) {
    conf_win_left = (int)br.ue();
    conf_win_right = (int)br.ue();
    conf_win_top = (int)br.ue();
    conf_win_bottom = (int)br.ue();
  }
  bit_depth_luma = (int)br.ue() + 8;
  bit_depth_chroma = (int)br.ue() + 8;
  if (bit_depth_luma > 16 || bit_depth_chroma > 16) return false;
  log2_max_pic_order_cnt_lsb = (int)br.ue() + 4;
  if (log2_max_pic_order_cnt_lsb > 16) return false;
  sub_layer_ordering_info_present = br.get_flag();
  int first = sub_layer_ordering_info_present ? 0 : max_sub_layers - 1;
  for (int i = first; i < max_sub_layers; i++) {
    max_dec_pic_buffering[i] = (int)br.ue() + 1;
    max_num_reorder_pics[i] = (int)br.ue();
    max_latency_increase[i] = (int)br.ue();
  }
  for (int i = 0; i < first; i++) {
    max_dec_pic_buffering[i] = max_dec_pic_buffering[max_sub_layers - 1];
    max_num_reorder_pics[i] = max_num_reorder_pics[max_sub_layers - 1];
    max_latency_increase[i] = max_latency_increase[max_sub_layers - 1];
  }
  log2_min_cb_size = (int)br.ue() + 3;
  log2_diff_max_min_cb_size = (int)br.ue();
  log2_min_tb_size = (int)br.ue() + 2;
  log2_diff_max_min_tb_size = (int)br.ue();
  max_transform_hierarchy_depth_inter = (int)br.ue();
  max_transform_hierarchy_depth_intra = (int)br.ue();
  if (log2_min_cb_size + log2_diff_max_min_cb_size > 6) return false;
  if (log2_min_tb_size + log2_diff_max_min_tb_size > 5) return false;
  if (log2_min_tb_size >= log2_min_cb_size) return false;
  scaling_list_enabled = br.get_flag();
  scaling_lists.set_default();
  if (scaling_list_enabled) {
    sps_scaling_list_data_present = br.get_flag();
    if (sps_scaling_list_data_present) {
      if (!scaling_lists.parse(br)) return false;
    }
  }
  amp_enabled = br.get_flag();
  sao_enabled = br.get_flag();
  pcm_enabled = br.get_flag();
  if (pcm_enabled) {
    pcm_bit_depth_luma = br.u(4) + 1;
    pcm_bit_depth_chroma = br.u(4) + 1;
    log2_min_pcm_cb_size = (int)br.ue() + 3;
    log2_max_pcm_cb_size = log2_min_pcm_cb_size + (int)br.ue();
    pcm_loop_filter_disable = br.get_flag();
    if (log2_max_pcm_cb_size > 5) return false;
  }
  int num_strps = (int)br.ue();
  if (num_strps > 64) return false;
  st_rps.clear();
  st_rps.reserve(num_strps);
  for (int i = 0; i < num_strps; i++) {
    ShortTermRefPicSet s;
    if (!parse_strps(br, st_rps, i, false, max_dec_pic_buffering[max_sub_layers - 1], &s))
      return false;
    st_rps.push_back(s);
  }
  long_term_ref_pics_present = br.get_flag();
  if (long_term_ref_pics_present) {
    num_long_term_ref_pics_sps = (int)br.ue();
    if (num_long_term_ref_pics_sps > 32) return false;
    for (int i = 0; i < num_long_term_ref_pics_sps; i++) {
      lt_ref_pic_poc_lsb_sps[i] = br.u(log2_max_pic_order_cnt_lsb);
      used_by_curr_pic_lt_sps[i] = br.get_flag();
    }
  }
  temporal_mvp_enabled = br.get_flag();
  strong_intra_smoothing_enabled = br.get_flag();
  bool vui_present = br.get_flag();
  if (vui_present) {
    if (!vui.parse(br, max_sub_layers)) return false;
  }
  bool ext_present = br.get_flag();
  if (ext_present) {
    range_extension = br.get_flag();
    br.skip(1);  // sps_multilayer_extension_flag
    br.skip(1);  // sps_3d_extension_flag
    br.skip(5);  // sps_extension_5bits
    if (range_extension) {
      transform_skip_rotation_enabled = br.get_flag();
      transform_skip_context_enabled = br.get_flag();
      implicit_rdpcm_enabled = br.get_flag();
      explicit_rdpcm_enabled = br.get_flag();
      extended_precision_processing = br.get_flag();
      intra_smoothing_disabled = br.get_flag();
      high_precision_offsets_enabled = br.get_flag();
      persistent_rice_adaptation_enabled = br.get_flag();
      cabac_bypass_alignment_enabled = br.get_flag();
    }
  }
  if (!br.ok()) return false;

  // spec A.4/7.4.3.2 constraints a conformant stream must satisfy; violations
  // would let coding blocks extend past the allocated planes
  int min_cb = 1 << log2_min_cb_size;
  if (pic_width_in_luma_samples <= 0 || pic_height_in_luma_samples <= 0)
    return false;
  if (pic_width_in_luma_samples % min_cb || pic_height_in_luma_samples % min_cb)
    return false;
  if (log2_min_tb_size >= log2_min_cb_size) return false;
  if (log2_min_tb_size + log2_diff_max_min_tb_size >
      min_i(log2_min_cb_size + log2_diff_max_min_cb_size, 5))
    return false;
  {
    int sw = (chroma_format_idc == 1 || chroma_format_idc == 2) ? 2 : 1;
    int sh = (chroma_format_idc == 1) ? 2 : 1;
    if ((conf_win_left + conf_win_right) * sw >= pic_width_in_luma_samples ||
        (conf_win_top + conf_win_bottom) * sh >= pic_height_in_luma_samples)
      return false;
  }

  compute_derived();
  return true;
}

void Sps::compute_derived() {
  chroma_array_type = separate_colour_plane_flag ? 0 : chroma_format_idc;
  sub_width_c = (chroma_format_idc == 1 || chroma_format_idc == 2) ? 2 : 1;
  sub_height_c = (chroma_format_idc == 1) ? 2 : 1;
  qp_bd_offset_luma = 6 * (bit_depth_luma - 8);
  qp_bd_offset_chroma = 6 * (bit_depth_chroma - 8);
  log2_ctb_size = log2_min_cb_size + log2_diff_max_min_cb_size;
  ctb_size = 1 << log2_ctb_size;
  pic_width_in_ctbs = ceil_div(pic_width_in_luma_samples, ctb_size);
  pic_height_in_ctbs = ceil_div(pic_height_in_luma_samples, ctb_size);
  pic_size_in_ctbs = pic_width_in_ctbs * pic_height_in_ctbs;
  log2_max_tb_size = log2_min_tb_size + log2_diff_max_min_tb_size;
  pic_width_in_min_cbs = pic_width_in_luma_samples >> log2_min_cb_size;
  pic_height_in_min_cbs = pic_height_in_luma_samples >> log2_min_cb_size;
  pic_width_in_tbs = ceil_div(pic_width_in_luma_samples, 1 << log2_min_tb_size);
  pic_height_in_tbs = ceil_div(pic_height_in_luma_samples, 1 << log2_min_tb_size);
  pic_width_in_min_pus = ceil_div(pic_width_in_luma_samples, 4);
  pic_height_in_min_pus = ceil_div(pic_height_in_luma_samples, 4);
  max_pic_order_cnt_lsb = 1u << log2_max_pic_order_cnt_lsb;
}

// ---------------------------------------------------------------------------
// PPS
// ---------------------------------------------------------------------------
bool Pps::parse(BitReader& br, std::shared_ptr<const Sps> sps_in) {
  pps_id = (int)br.ue();
  if (pps_id >= 64) return false;
  sps_id = (int)br.ue();
  if (sps_id >= 16) return false;
  sps = sps_in;
  if (!sps) return false;

  dependent_slice_segments_enabled = br.get_flag();
  output_flag_present = br.get_flag();
  num_extra_slice_header_bits = br.u(3);
  sign_data_hiding = br.get_flag();
  cabac_init_present = br.get_flag();
  num_ref_idx_l0_default = (int)br.ue() + 1;
  num_ref_idx_l1_default = (int)br.ue() + 1;
  if (num_ref_idx_l0_default > 16 || num_ref_idx_l1_default > 16) return false;
  init_qp = br.se() + 26;
  constrained_intra_pred = br.get_flag();
  transform_skip_enabled = br.get_flag();
  cu_qp_delta_enabled = br.get_flag();
  diff_cu_qp_delta_depth = cu_qp_delta_enabled ? (int)br.ue() : 0;
  cb_qp_offset = br.se();
  cr_qp_offset = br.se();
  if (cb_qp_offset < -12 || cb_qp_offset > 12) return false;
  if (cr_qp_offset < -12 || cr_qp_offset > 12) return false;
  slice_chroma_qp_offsets_present = br.get_flag();
  weighted_pred = br.get_flag();
  weighted_bipred = br.get_flag();
  transquant_bypass_enabled = br.get_flag();
  tiles_enabled = br.get_flag();
  entropy_coding_sync_enabled = br.get_flag();

  num_tile_columns = 1;
  num_tile_rows = 1;
  uniform_spacing = true;
  if (tiles_enabled) {
    num_tile_columns = (int)br.ue() + 1;
    num_tile_rows = (int)br.ue() + 1;
    if (num_tile_columns > 256 || num_tile_rows > 256) return false;
    uniform_spacing = br.get_flag();
    if (!uniform_spacing) {
      tile_col_width.resize(num_tile_columns);
      tile_row_height.resize(num_tile_rows);
      int sum = 0;
      for (int i = 0; i < num_tile_columns - 1; i++) {
        tile_col_width[i] = (int)br.ue() + 1;
        sum += tile_col_width[i];
      }
      if (sum >= sps->pic_width_in_ctbs) return false;
      tile_col_width[num_tile_columns - 1] = sps->pic_width_in_ctbs - sum;
      sum = 0;
      for (int i = 0; i < num_tile_rows - 1; i++) {
        tile_row_height[i] = (int)br.ue() + 1;
        sum += tile_row_height[i];
      }
      if (sum >= sps->pic_height_in_ctbs) return false;
      tile_row_height[num_tile_rows - 1] = sps->pic_height_in_ctbs - sum;
    }
    loop_filter_across_tiles = br.get_flag();
  } else {
    loop_filter_across_tiles = true;
  }
  if (num_tile_columns > sps->pic_width_in_ctbs ||
      num_tile_rows > sps->pic_height_in_ctbs)
    return false;

  loop_filter_across_slices = br.get_flag();
  deblocking_filter_control_present = br.get_flag();
  if (deblocking_filter_control_present) {
    deblocking_filter_override_enabled = br.get_flag();
    pps_deblocking_filter_disabled = br.get_flag();
    if (!pps_deblocking_filter_disabled) {
      beta_offset = br.se() * 2;
      tc_offset = br.se() * 2;
      if (beta_offset < -12 || beta_offset > 12) return false;
      if (tc_offset < -12 || tc_offset > 12) return false;
    }
  }
  pps_scaling_list_data_present = br.get_flag();
  if (pps_scaling_list_data_present) {
    if (!scaling_lists.parse(br)) return false;
  }
  lists_modification_present = br.get_flag();
  log2_parallel_merge_level = (int)br.ue() + 2;
  if (log2_parallel_merge_level > sps->log2_ctb_size) return false;
  slice_segment_header_extension_present = br.get_flag();
  bool ext_present = br.get_flag();
  if (ext_present) {
    range_extension = br.get_flag();
    br.skip(1);  // pps_multilayer_extension_flag
    br.skip(1);  // pps_3d_extension_flag
    br.skip(5);  // pps_extension_5bits
    if (range_extension) {
      if (transform_skip_enabled)
        log2_max_transform_skip_block_size = (int)br.ue() + 2;
      cross_component_prediction_enabled = br.get_flag();
      chroma_qp_offset_list_enabled = br.get_flag();
      if (chroma_qp_offset_list_enabled) {
        diff_cu_chroma_qp_offset_depth = (int)br.ue();
        chroma_qp_offset_list_len = (int)br.ue() + 1;
        if (chroma_qp_offset_list_len > 6) return false;
        for (int i = 0; i < chroma_qp_offset_list_len; i++) {
          cb_qp_offset_list[i] = br.se();
          cr_qp_offset_list[i] = br.se();
        }
      }
      log2_sao_offset_scale_luma = (int)br.ue();
      log2_sao_offset_scale_chroma = (int)br.ue();
    }
  }
  if (!br.ok()) return false;
  compute_derived();
  return true;
}

void Pps::compute_derived() {
  const Sps& s = *sps;
  log2_min_cu_qp_delta_size = s.log2_ctb_size - diff_cu_qp_delta_depth;
  log2_min_cu_chroma_qp_offset_size = s.log2_ctb_size - diff_cu_chroma_qp_offset_depth;

  int w = s.pic_width_in_ctbs, h = s.pic_height_in_ctbs;

  // Tile boundaries (spec 6.5.1).
  col_bd.assign(num_tile_columns + 1, 0);
  row_bd.assign(num_tile_rows + 1, 0);
  std::vector<int> cw(num_tile_columns), rh(num_tile_rows);
  if (uniform_spacing) {
    for (int i = 0; i < num_tile_columns; i++)
      cw[i] = ((i + 1) * w) / num_tile_columns - (i * w) / num_tile_columns;
    for (int j = 0; j < num_tile_rows; j++)
      rh[j] = ((j + 1) * h) / num_tile_rows - (j * h) / num_tile_rows;
  } else {
    cw = tile_col_width;
    rh = tile_row_height;
  }
  for (int i = 0; i < num_tile_columns; i++) col_bd[i + 1] = col_bd[i] + cw[i];
  for (int j = 0; j < num_tile_rows; j++) row_bd[j + 1] = row_bd[j] + rh[j];

  // Raster <-> tile scan conversion.
  int n = w * h;
  ctb_rs_to_ts.assign(n, 0);
  ctb_ts_to_rs.assign(n, 0);
  for (int rs = 0; rs < n; rs++) {
    int tbx = rs % w, tby = rs / w;
    int tile_x = 0, tile_y = 0;
    for (int i = 0; i < num_tile_columns; i++)
      if (tbx >= col_bd[i]) tile_x = i;
    for (int j = 0; j < num_tile_rows; j++)
      if (tby >= row_bd[j]) tile_y = j;
    int ts = 0;
    for (int i = 0; i < tile_x; i++) ts += rh[tile_y] * cw[i];
    for (int j = 0; j < tile_y; j++) ts += w * rh[j];
    ts += (tby - row_bd[tile_y]) * cw[tile_x] + tbx - col_bd[tile_x];
    ctb_rs_to_ts[rs] = ts;
    ctb_ts_to_rs[ts] = rs;
  }

  // Tile ids by tile-scan address.
  tile_id_ts.assign(n, 0);
  int tid = 0;
  for (int j = 0; j < num_tile_rows; j++)
    for (int i = 0; i < num_tile_columns; i++, tid++)
      for (int y = row_bd[j]; y < row_bd[j + 1]; y++)
        for (int x = col_bd[i]; x < col_bd[i + 1]; x++)
          tile_id_ts[ctb_rs_to_ts[y * w + x]] = tid;

  // Z-scan order per min-TB (spec 6.5.2).  Raster-indexed by min-TB address.
  int tb_w = ceil_div(s.pic_width_in_luma_samples, 1 << s.log2_min_tb_size);
  int tb_h = ceil_div(s.pic_height_in_luma_samples, 1 << s.log2_min_tb_size);
  int shift = s.log2_ctb_size - s.log2_min_tb_size;
  min_tb_addr_zs.assign(tb_w * tb_h, 0);
  for (int y = 0; y < tb_h; y++) {
    for (int x = 0; x < tb_w; x++) {
      int ctb_x = x >> shift, ctb_y = y >> shift;
      int addr = ctb_rs_to_ts[ctb_y * w + ctb_x] << (2 * shift);
      int p = 0;
      for (int i = 0; i < shift; i++) {
        int m = 1 << i;
        p += (x & m ? m * m : 0) + (y & m ? 2 * m * m : 0);
      }
      min_tb_addr_zs[y * tb_w + x] = addr + p;
    }
  }
}

}  // namespace tde265
