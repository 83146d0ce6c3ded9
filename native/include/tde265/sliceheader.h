// Slice segment header (spec 7.3.6) and per-slice derived state.
//
// Capability counterpart of slice_segment_header in
// /root/reference/libde265/slice.h:128-264.
#pragma once

#include <memory>
#include <vector>

#include "tde265/bits.h"
#include "tde265/params.h"

namespace tde265 {

struct Frame;

enum SliceType : int { SLICE_B = 0, SLICE_P = 1, SLICE_I = 2 };

struct WeightedPredParams {
  int luma_log2_weight_denom = 0;
  int chroma_log2_weight_denom = 0;
  // [list][ref_idx]
  bool luma_weight_flag[2][16] = {};
  bool chroma_weight_flag[2][16] = {};
  int luma_weight[2][16] = {};   // w
  int luma_offset[2][16] = {};   // o
  int chroma_weight[2][16][2] = {};
  int chroma_offset[2][16][2] = {};
};

struct SliceHeader {
  // --- raw syntax ---
  bool first_slice_in_pic = false;
  bool no_output_of_prior_pics = false;
  int pps_id = 0;
  bool dependent_slice = false;
  int slice_segment_address = 0;  // CTB raster address of this segment
  int slice_type = SLICE_I;
  bool pic_output_flag = true;
  int colour_plane_id = 0;
  int pic_order_cnt_lsb = 0;

  bool strps_from_sps = false;
  int strps_idx = 0;
  ShortTermRefPicSet strps;  // the active set (copied from SPS or parsed)

  int num_long_term_sps = 0;
  int num_long_term_pics = 0;
  struct LtEntry {
    int poc_lsb = 0;
    bool used_by_curr = false;
    bool has_msb = false;
    int delta_poc_msb_cycle = 0;  // cumulative (spec DeltaPocMsbCycleLt)
  };
  std::vector<LtEntry> lt;

  bool temporal_mvp_enabled = false;
  bool sao_luma = false;
  bool sao_chroma = false;

  int num_ref_idx[2] = {0, 0};
  bool ref_pic_list_modification[2] = {false, false};
  int list_entry[2][16] = {};

  bool mvd_l1_zero = false;
  bool cabac_init_flag = false;
  bool collocated_from_l0 = true;
  int collocated_ref_idx = 0;
  WeightedPredParams wp;
  int max_num_merge_cand = 5;

  int slice_qp_delta = 0;
  int slice_cb_qp_offset = 0;
  int slice_cr_qp_offset = 0;
  bool cu_chroma_qp_offset_enabled = false;
  bool deblocking_filter_override = false;
  bool deblocking_filter_disabled = false;
  int beta_offset = 0;
  int tc_offset = 0;
  bool loop_filter_across_slices = false;

  int num_entry_points = 0;
  std::vector<u32> entry_points;  // byte offsets (de-stuffed coordinates)

  // --- derived ---
  std::shared_ptr<const Pps> pps;
  int slice_addr_rs = 0;  // address of the first segment of the slice
  int slice_qp_y = 26;
  int init_type = 0;      // CABAC init type (0 I, 1..2 per type+flag)
  int slice_index = 0;    // index within picture

  // Reference picture lists (filled by decoder, 8.3.4).
  Frame* ref_list[2][16] = {};
  i32 ref_poc[2][16] = {};
  bool ref_longterm[2][16] = {};

  bool is_intra() const { return slice_type == SLICE_I; }

  // Parse; needs access to the pps/sps lookup.  Returns false on error.
  bool parse(BitReader& br, int nal_type, int nal_temporal_id,
             const std::shared_ptr<const Pps> pps_tab[64],
             bool* first_slice_flag_out);
};

}  // namespace tde265
