// Parameter sets: VPS / SPS / PPS / VUI, scaling lists, and the CTB/TB
// address scan tables.
//
// Capability counterpart of /root/reference/libde265/{vps,sps,pps,vui}.{h,cc};
// independent design: plain aggregate structs with a single parse() +
// compute_derived() pair each, and the tile/z-scan tables built straight from
// the spec 6.5.x pseudo-code.
#pragma once

#include <memory>
#include <vector>

#include "tde265/bits.h"
#include "tde265/common.h"

namespace tde265 {

constexpr int kMaxSubLayers = 7;
constexpr int kMaxRefPics = 16;
constexpr int kMaxNumRefLists = 2;

// ---------------------------------------------------------------------------
// profile_tier_level (spec 7.3.3)
// ---------------------------------------------------------------------------
struct ProfileTierLevel {
  int general_profile_space = 0;
  bool general_tier_flag = false;
  int general_profile_idc = 0;
  u32 general_profile_compatibility_flags = 0;  // bit i = flag[i]
  bool general_progressive_source_flag = false;
  bool general_interlaced_source_flag = false;
  bool general_non_packed_constraint_flag = false;
  bool general_frame_only_constraint_flag = false;
  int general_level_idc = 0;

  struct SubLayer {
    bool profile_present = false;
    bool level_present = false;
    int profile_space = 0, profile_idc = 0, level_idc = 0;
  };
  SubLayer sub_layer[kMaxSubLayers];

  bool parse(BitReader& br, bool profile_present, int max_sub_layers);
};

// ---------------------------------------------------------------------------
// Short-term reference picture set (spec 7.3.7).  Stored fully resolved
// (absolute DeltaPoc values), like the spec's derived variables.
// ---------------------------------------------------------------------------
struct ShortTermRefPicSet {
  int num_negative = 0;
  int num_positive = 0;
  int delta_poc_s0[kMaxRefPics] = {};  // negative values
  int delta_poc_s1[kMaxRefPics] = {};  // positive values
  bool used_s0[kMaxRefPics] = {};
  bool used_s1[kMaxRefPics] = {};

  int num_pics() const { return num_negative + num_positive; }
};

// Parse one st_ref_pic_set, possibly predicted from earlier sets in `sets`.
// `idx` is this set's index (== sets.size() when parsing from a slice header).
bool parse_strps(BitReader& br, const std::vector<ShortTermRefPicSet>& sets,
                 int idx, bool slice_header, int sps_max_dec_pic_buffering,
                 ShortTermRefPicSet* out);

// ---------------------------------------------------------------------------
// Scaling lists (spec 7.3.4 / 7.4.5), stored as flat 2D matrices per
// sizeId/matrixId plus DC values for 16x16/32x32.
// ---------------------------------------------------------------------------
struct ScalingLists {
  // [sizeId][matrixId][coef]; sizes 4x4(16), 8x8(64), 16x16(64 subsampled),
  // 32x32(64 subsampled).  We expand to full resolution at derivation time in
  // the dequant path; here we keep the coded 64-entry representation.
  u8 list4x4[6][16];
  u8 list8x8[6][64];
  u8 list16x16[6][64];
  u8 list32x32[6][64];  // only matrixId 0,3 coded; others mirrored
  u8 dc16x16[6];
  u8 dc32x32[6];

  void set_default();
  bool parse(BitReader& br);
};

// ---------------------------------------------------------------------------
// VUI (spec E.2)
// ---------------------------------------------------------------------------
struct VuiParams {
  bool present = false;

  bool aspect_ratio_info_present = false;
  int aspect_ratio_idc = 0;
  int sar_width = 0, sar_height = 0;

  bool overscan_info_present = false;
  bool overscan_appropriate = false;

  bool video_signal_type_present = false;
  int video_format = 5;
  bool video_full_range_flag = false;
  bool colour_description_present = false;
  int colour_primaries = 2;
  int transfer_characteristics = 2;
  int matrix_coeffs = 2;

  bool chroma_loc_info_present = false;
  int chroma_sample_loc_type_top_field = 0;
  int chroma_sample_loc_type_bottom_field = 0;

  bool neutral_chroma_indication_flag = false;
  bool field_seq_flag = false;
  bool frame_field_info_present = false;

  bool default_display_window_flag = false;
  int def_disp_win_left = 0, def_disp_win_right = 0;
  int def_disp_win_top = 0, def_disp_win_bottom = 0;

  bool timing_info_present = false;
  u32 num_units_in_tick = 0;
  u32 time_scale = 0;
  bool poc_proportional_to_timing = false;
  int num_ticks_poc_diff_one = 1;
  bool hrd_parameters_present = false;

  bool bitstream_restriction_flag = false;
  bool tiles_fixed_structure_flag = false;
  bool motion_vectors_over_pic_boundaries_flag = true;
  bool restricted_ref_pic_lists_flag = false;
  int min_spatial_segmentation_idc = 0;
  int max_bytes_per_pic_denom = 2;
  int max_bits_per_min_cu_denom = 1;
  int log2_max_mv_length_horizontal = 15;
  int log2_max_mv_length_vertical = 15;

  bool parse(BitReader& br, int sps_max_sub_layers);
};

// ---------------------------------------------------------------------------
// VPS (spec 7.3.2.1) — parsed for completeness; only a few fields are used.
// ---------------------------------------------------------------------------
struct Vps {
  int vps_id = 0;
  int max_layers = 1;
  int max_sub_layers = 1;
  bool temporal_id_nesting = false;
  ProfileTierLevel ptl;
  bool sub_layer_ordering_info_present = false;
  int max_dec_pic_buffering[kMaxSubLayers] = {};
  int max_num_reorder_pics[kMaxSubLayers] = {};
  int max_latency_increase[kMaxSubLayers] = {};
  int max_layer_id = 0;
  int num_layer_sets = 1;
  bool timing_info_present = false;
  u32 num_units_in_tick = 0;
  u32 time_scale = 0;
  bool poc_proportional_to_timing = false;
  int num_ticks_poc_diff_one = 1;

  bool parse(BitReader& br);
};

// ---------------------------------------------------------------------------
// SPS (spec 7.3.2.2)
// ---------------------------------------------------------------------------
struct Sps {
  int vps_id = 0;
  int max_sub_layers = 1;
  bool temporal_id_nesting = false;
  ProfileTierLevel ptl;
  int sps_id = 0;

  int chroma_format_idc = 1;  // 0 mono, 1 4:2:0, 2 4:2:2, 3 4:4:4
  bool separate_colour_plane_flag = false;
  int pic_width_in_luma_samples = 0;
  int pic_height_in_luma_samples = 0;

  bool conformance_window_flag = false;
  int conf_win_left = 0, conf_win_right = 0, conf_win_top = 0, conf_win_bottom = 0;

  int bit_depth_luma = 8;
  int bit_depth_chroma = 8;
  int log2_max_pic_order_cnt_lsb = 8;

  bool sub_layer_ordering_info_present = false;
  int max_dec_pic_buffering[kMaxSubLayers] = {};  // value (minus1 applied)
  int max_num_reorder_pics[kMaxSubLayers] = {};
  int max_latency_increase[kMaxSubLayers] = {};   // value (plus1 applied; 0 = off)

  int log2_min_cb_size = 3;         // log2_min_luma_coding_block_size
  int log2_diff_max_min_cb_size = 0;
  int log2_min_tb_size = 2;
  int log2_diff_max_min_tb_size = 0;
  int max_transform_hierarchy_depth_inter = 0;
  int max_transform_hierarchy_depth_intra = 0;

  bool scaling_list_enabled = false;
  bool sps_scaling_list_data_present = false;
  ScalingLists scaling_lists;

  bool amp_enabled = false;
  bool sao_enabled = false;

  bool pcm_enabled = false;
  int pcm_bit_depth_luma = 8;
  int pcm_bit_depth_chroma = 8;
  int log2_min_pcm_cb_size = 3;
  int log2_max_pcm_cb_size = 3;
  bool pcm_loop_filter_disable = false;

  std::vector<ShortTermRefPicSet> st_rps;

  bool long_term_ref_pics_present = false;
  int num_long_term_ref_pics_sps = 0;
  int lt_ref_pic_poc_lsb_sps[32] = {};
  bool used_by_curr_pic_lt_sps[32] = {};

  bool temporal_mvp_enabled = false;
  bool strong_intra_smoothing_enabled = false;

  VuiParams vui;

  // Range extension (spec 7.3.2.2.2)
  bool range_extension = false;
  bool transform_skip_rotation_enabled = false;
  bool transform_skip_context_enabled = false;
  bool implicit_rdpcm_enabled = false;
  bool explicit_rdpcm_enabled = false;
  bool extended_precision_processing = false;
  bool intra_smoothing_disabled = false;
  bool high_precision_offsets_enabled = false;
  bool persistent_rice_adaptation_enabled = false;
  bool cabac_bypass_alignment_enabled = false;

  // ----- derived (spec 7.4.3.2.1) -----
  int chroma_array_type = 1;
  int sub_width_c = 2, sub_height_c = 2;
  int qp_bd_offset_luma = 0, qp_bd_offset_chroma = 0;
  int log2_ctb_size = 6;        // Log2CtbSizeY
  int ctb_size = 64;            // CtbSizeY
  int pic_width_in_ctbs = 0;
  int pic_height_in_ctbs = 0;
  int pic_size_in_ctbs = 0;
  int log2_max_tb_size = 5;
  int pic_width_in_min_cbs = 0, pic_height_in_min_cbs = 0;
  int pic_width_in_tbs = 0, pic_height_in_tbs = 0;   // in min TBs
  int pic_width_in_min_pus = 0, pic_height_in_min_pus = 0;  // 4x4 grid
  u32 max_pic_order_cnt_lsb = 256;

  bool parse(BitReader& br);
  void compute_derived();

  int width_chroma() const {
    return chroma_format_idc == 0 ? 0 : pic_width_in_luma_samples / sub_width_c;
  }
  int height_chroma() const {
    return chroma_format_idc == 0 ? 0 : pic_height_in_luma_samples / sub_height_c;
  }
};

// ---------------------------------------------------------------------------
// PPS (spec 7.3.2.3) + tile geometry and scan tables (spec 6.5.1 / 6.5.2)
// ---------------------------------------------------------------------------
struct Pps {
  int pps_id = 0;
  int sps_id = 0;
  bool dependent_slice_segments_enabled = false;
  bool output_flag_present = false;
  int num_extra_slice_header_bits = 0;
  bool sign_data_hiding = false;
  bool cabac_init_present = false;
  int num_ref_idx_l0_default = 1;
  int num_ref_idx_l1_default = 1;
  int init_qp = 26;
  bool constrained_intra_pred = false;
  bool transform_skip_enabled = false;
  bool cu_qp_delta_enabled = false;
  int diff_cu_qp_delta_depth = 0;
  int cb_qp_offset = 0;
  int cr_qp_offset = 0;
  bool slice_chroma_qp_offsets_present = false;
  bool weighted_pred = false;      // P slices
  bool weighted_bipred = false;    // B slices
  bool transquant_bypass_enabled = false;
  bool tiles_enabled = false;
  bool entropy_coding_sync_enabled = false;  // WPP

  int num_tile_columns = 1;
  int num_tile_rows = 1;
  bool uniform_spacing = true;
  std::vector<int> tile_col_width;   // in CTBs, size num_tile_columns
  std::vector<int> tile_row_height;  // in CTBs
  bool loop_filter_across_tiles = true;

  bool loop_filter_across_slices = false;  // pps_loop_filter_across_slices_enabled
  bool deblocking_filter_control_present = false;
  bool deblocking_filter_override_enabled = false;
  bool pps_deblocking_filter_disabled = false;
  int beta_offset = 0;  // /2 coded
  int tc_offset = 0;

  bool pps_scaling_list_data_present = false;
  ScalingLists scaling_lists;  // valid if present (else from SPS/default)

  bool lists_modification_present = false;
  int log2_parallel_merge_level = 2;
  bool slice_segment_header_extension_present = false;

  // Range extension (7.3.2.3.2)
  bool range_extension = false;
  int log2_max_transform_skip_block_size = 2;
  bool cross_component_prediction_enabled = false;
  bool chroma_qp_offset_list_enabled = false;
  int diff_cu_chroma_qp_offset_depth = 0;
  int chroma_qp_offset_list_len = 0;
  int cb_qp_offset_list[6] = {};
  int cr_qp_offset_list[6] = {};
  int log2_sao_offset_scale_luma = 0;
  int log2_sao_offset_scale_chroma = 0;

  // ----- derived -----
  std::shared_ptr<const Sps> sps;  // resolved at activation time
  int log2_min_cu_qp_delta_size = 6;
  int log2_min_cu_chroma_qp_offset_size = 6;

  // Tile boundaries in CTBs: colBd[0..numCols], rowBd[0..numRows].
  std::vector<int> col_bd, row_bd;
  // Scan tables over CTB addresses (spec 6.5.1):
  std::vector<int> ctb_rs_to_ts;   // raster -> tile scan
  std::vector<int> ctb_ts_to_rs;   // tile scan -> raster
  std::vector<int> tile_id_ts;     // tile id by tile-scan address
  // Z-scan order index per min-TB address (spec 6.5.2), raster-indexed.
  std::vector<int> min_tb_addr_zs;

  bool parse(BitReader& br, std::shared_ptr<const Sps> sps);
  void compute_derived();

  int tile_id_rs(int ctb_rs) const { return tile_id_ts[ctb_rs_to_ts[ctb_rs]]; }
  // Is ctbB (raster addr) in the same tile as ctbA?
  bool same_tile(int rsA, int rsB) const { return tile_id_rs(rsA) == tile_id_rs(rsB); }
};

// Annex A (Table A.8) capability limits, shared by the decoder's SPS
// validation and the encoder's automatic level selection.  Counterpart of
// libde265_tpu/models/profiles.py (kept in sync).
i64 annex_a_max_luma_ps(int level_idc);     // 0 if level unknown
i64 annex_a_max_luma_sr(int level_idc);     // samples/sec, 0 if unknown
int annex_a_min_level_idc(int width, int height, int fps);

}  // namespace tde265
