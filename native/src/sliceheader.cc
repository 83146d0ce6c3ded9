// Slice segment header parsing (spec 7.3.6.1-7.3.6.3).
#include "tde265/sliceheader.h"

#include "tde265/nalu.h"

namespace tde265 {

static bool parse_pred_weight_table(BitReader& br, const Sps& sps,
                                    const SliceHeader& sh, WeightedPredParams* wp) {
  wp->luma_log2_weight_denom = (int)br.ue();
  if (wp->luma_log2_weight_denom > 7) return false;
  bool chroma = sps.chroma_array_type != 0;
  if (chroma) {
    wp->chroma_log2_weight_denom = wp->luma_log2_weight_denom + br.se();
    if (wp->chroma_log2_weight_denom < 0 || wp->chroma_log2_weight_denom > 7)
      return false;
  }
  int n_lists = (sh.slice_type == SLICE_B) ? 2 : 1;
  for (int l = 0; l < n_lists; l++) {
    int n = sh.num_ref_idx[l];
    for (int i = 0; i < n; i++) wp->luma_weight_flag[l][i] = br.get_flag();
    if (chroma)
      for (int i = 0; i < n; i++) wp->chroma_weight_flag[l][i] = br.get_flag();
    for (int i = 0; i < n; i++) {
      if (wp->luma_weight_flag[l][i]) {
        int dw = br.se();
        if (dw < -128 || dw > 127) return false;
        wp->luma_weight[l][i] = (1 << wp->luma_log2_weight_denom) + dw;
        wp->luma_offset[l][i] = br.se();
        if (wp->luma_offset[l][i] < -128 || wp->luma_offset[l][i] > 127) return false;
      } else {
        wp->luma_weight[l][i] = 1 << wp->luma_log2_weight_denom;
        wp->luma_offset[l][i] = 0;
      }
      if (chroma && wp->chroma_weight_flag[l][i]) {
        for (int j = 0; j < 2; j++) {
          int dw = br.se();
          if (dw < -128 || dw > 127) return false;
          int w = (1 << wp->chroma_log2_weight_denom) + dw;
          wp->chroma_weight[l][i][j] = w;
          int d_off = br.se();
          if (d_off < -512 || d_off > 511) return false;
          wp->chroma_offset[l][i][j] =
              clip3(-128, 127, (d_off - ((128 * w) >> wp->chroma_log2_weight_denom) + 128));
        }
      } else {
        for (int j = 0; j < 2; j++) {
          wp->chroma_weight[l][i][j] = 1 << wp->chroma_log2_weight_denom;
          wp->chroma_offset[l][i][j] = 0;
        }
      }
    }
  }
  return br.ok();
}

bool SliceHeader::parse(BitReader& br, int nal_type, int nal_temporal_id,
                        const std::shared_ptr<const Pps> pps_tab[64],
                        bool* first_slice_flag_out) {
  first_slice_in_pic = br.get_flag();
  if (first_slice_flag_out) *first_slice_flag_out = first_slice_in_pic;
  if (nal_is_irap(nal_type)) no_output_of_prior_pics = br.get_flag();
  pps_id = (int)br.ue();
  if (pps_id >= 64 || !pps_tab[pps_id]) return false;
  pps = pps_tab[pps_id];
  const Sps& sps = *pps->sps;

  dependent_slice = false;
  slice_segment_address = 0;
  if (!first_slice_in_pic) {
    if (pps->dependent_slice_segments_enabled) dependent_slice = br.get_flag();
    int bits = ilog2_ceil((u32)sps.pic_size_in_ctbs);
    slice_segment_address = br.u(bits);
    if (slice_segment_address >= sps.pic_size_in_ctbs) return false;
  }
  slice_addr_rs = slice_segment_address;  // fixed up by caller for dependent

  if (!dependent_slice) {
    for (int i = 0; i < pps->num_extra_slice_header_bits; i++) br.skip(1);
    slice_type = (int)br.ue();
    if (slice_type > 2) return false;
    pic_output_flag = pps->output_flag_present ? br.get_flag() : true;
    if (sps.separate_colour_plane_flag) colour_plane_id = br.u(2);

    pic_order_cnt_lsb = 0;
    strps = ShortTermRefPicSet();
    lt.clear();
    if (!nal_is_idr(nal_type)) {
      pic_order_cnt_lsb = br.u(sps.log2_max_pic_order_cnt_lsb);
      strps_from_sps = br.get_flag();
      if (!strps_from_sps) {
        if (!parse_strps(br, sps.st_rps, (int)sps.st_rps.size(), true,
                         sps.max_dec_pic_buffering[sps.max_sub_layers - 1], &strps))
          return false;
      } else {
        strps_idx = 0;
        if (sps.st_rps.size() > 1)
          strps_idx = br.u(ilog2_ceil((u32)sps.st_rps.size()));
        if (strps_idx >= (int)sps.st_rps.size()) return false;
        strps = sps.st_rps[strps_idx];
      }
      num_long_term_sps = 0;
      num_long_term_pics = 0;
      if (sps.long_term_ref_pics_present) {
        if (sps.num_long_term_ref_pics_sps > 0) num_long_term_sps = (int)br.ue();
        num_long_term_pics = (int)br.ue();
        int total = num_long_term_sps + num_long_term_pics;
        if (total > 32) return false;
        lt.resize(total);
        int prev_delta_msb = 0;
        for (int i = 0; i < total; i++) {
          if (i < num_long_term_sps) {
            int idx = 0;
            if (sps.num_long_term_ref_pics_sps > 1)
              idx = br.u(ilog2_ceil((u32)sps.num_long_term_ref_pics_sps));
            if (idx >= sps.num_long_term_ref_pics_sps) return false;
            lt[i].poc_lsb = sps.lt_ref_pic_poc_lsb_sps[idx];
            lt[i].used_by_curr = sps.used_by_curr_pic_lt_sps[idx];
          } else {
            lt[i].poc_lsb = br.u(sps.log2_max_pic_order_cnt_lsb);
            lt[i].used_by_curr = br.get_flag();
          }
          lt[i].has_msb = br.get_flag();
          if (lt[i].has_msb) {
            int d = (int)br.ue();
            // DeltaPocMsbCycleLt accumulates except at i==0 and the first
            // slice-coded entry (spec 7-52).
            if (i == 0 || i == num_long_term_sps)
              lt[i].delta_poc_msb_cycle = d;
            else
              lt[i].delta_poc_msb_cycle = d + prev_delta_msb;
            prev_delta_msb = lt[i].delta_poc_msb_cycle;
          }
        }
      }
      temporal_mvp_enabled = sps.temporal_mvp_enabled ? br.get_flag() : false;
    } else {
      temporal_mvp_enabled = false;
    }

    if (sps.sao_enabled) {
      sao_luma = br.get_flag();
      if (sps.chroma_array_type != 0) sao_chroma = br.get_flag();
    }

    num_ref_idx[0] = num_ref_idx[1] = 0;
    mvd_l1_zero = false;
    cabac_init_flag = false;
    collocated_from_l0 = true;
    collocated_ref_idx = 0;
    max_num_merge_cand = 5;
    if (slice_type == SLICE_P || slice_type == SLICE_B) {
      bool override_flag = br.get_flag();
      if (override_flag) {
        num_ref_idx[0] = (int)br.ue() + 1;
        if (slice_type == SLICE_B) num_ref_idx[1] = (int)br.ue() + 1;
      } else {
        num_ref_idx[0] = pps->num_ref_idx_l0_default;
        if (slice_type == SLICE_B) num_ref_idx[1] = pps->num_ref_idx_l1_default;
      }
      if (num_ref_idx[0] > 16 || num_ref_idx[1] > 16) return false;

      // NumPocTotalCurr (spec 7-56)
      int num_poc_total_curr = 0;
      for (int i = 0; i < strps.num_negative; i++)
        if (strps.used_s0[i]) num_poc_total_curr++;
      for (int i = 0; i < strps.num_positive; i++)
        if (strps.used_s1[i]) num_poc_total_curr++;
      for (auto& e : lt)
        if (e.used_by_curr) num_poc_total_curr++;

      ref_pic_list_modification[0] = ref_pic_list_modification[1] = false;
      if (pps->lists_modification_present && num_poc_total_curr > 1) {
        int bits = ilog2_ceil((u32)num_poc_total_curr);
        ref_pic_list_modification[0] = br.get_flag();
        if (ref_pic_list_modification[0])
          for (int i = 0; i < num_ref_idx[0]; i++) list_entry[0][i] = br.u(bits);
        if (slice_type == SLICE_B) {
          ref_pic_list_modification[1] = br.get_flag();
          if (ref_pic_list_modification[1])
            for (int i = 0; i < num_ref_idx[1]; i++) list_entry[1][i] = br.u(bits);
        }
      }

      if (slice_type == SLICE_B) mvd_l1_zero = br.get_flag();
      if (pps->cabac_init_present) cabac_init_flag = br.get_flag();
      if (temporal_mvp_enabled) {
        if (slice_type == SLICE_B) collocated_from_l0 = br.get_flag();
        int coll_list = collocated_from_l0 ? 0 : 1;
        if (num_ref_idx[coll_list] > 1) collocated_ref_idx = (int)br.ue();
        if (collocated_ref_idx >= num_ref_idx[coll_list]) return false;
      }
      if ((pps->weighted_pred && slice_type == SLICE_P) ||
          (pps->weighted_bipred && slice_type == SLICE_B)) {
        if (!parse_pred_weight_table(br, sps, *this, &wp)) return false;
      } else {
        wp = WeightedPredParams();
      }
      max_num_merge_cand = 5 - (int)br.ue();
      if (max_num_merge_cand < 1 || max_num_merge_cand > 5) return false;
    }

    slice_qp_delta = br.se();
    slice_qp_y = pps->init_qp + slice_qp_delta;
    if (slice_qp_y < -sps.qp_bd_offset_luma || slice_qp_y > 51) return false;

    slice_cb_qp_offset = slice_cr_qp_offset = 0;
    if (pps->slice_chroma_qp_offsets_present) {
      slice_cb_qp_offset = br.se();
      slice_cr_qp_offset = br.se();
    }
    cu_chroma_qp_offset_enabled =
        pps->chroma_qp_offset_list_enabled ? br.get_flag() : false;

    deblocking_filter_override = false;
    deblocking_filter_disabled = pps->pps_deblocking_filter_disabled;
    beta_offset = pps->beta_offset;
    tc_offset = pps->tc_offset;
    if (pps->deblocking_filter_control_present) {
      if (pps->deblocking_filter_override_enabled)
        deblocking_filter_override = br.get_flag();
      if (deblocking_filter_override) {
        deblocking_filter_disabled = br.get_flag();
        if (!deblocking_filter_disabled) {
          beta_offset = br.se() * 2;
          tc_offset = br.se() * 2;
          if (beta_offset < -12 || beta_offset > 12) return false;
          if (tc_offset < -12 || tc_offset > 12) return false;
        }
      }
    }

    loop_filter_across_slices = pps->loop_filter_across_slices;
    if (pps->loop_filter_across_slices &&
        (sao_luma || sao_chroma || !deblocking_filter_disabled)) {
      loop_filter_across_slices = br.get_flag();
    }

    init_type = 0;
    if (slice_type == SLICE_P)
      init_type = cabac_init_flag ? 2 : 1;
    else if (slice_type == SLICE_B)
      init_type = cabac_init_flag ? 1 : 2;
  }

  num_entry_points = 0;
  entry_points.clear();
  if (pps->tiles_enabled || pps->entropy_coding_sync_enabled) {
    num_entry_points = (int)br.ue();
    if (num_entry_points > 10000) return false;
    if (num_entry_points > 0) {
      int len = (int)br.ue() + 1;
      if (len > 32) return false;
      entry_points.resize(num_entry_points);
      u32 cum = 0;
      for (int i = 0; i < num_entry_points; i++) {
        cum += br.u(len) + 1;
        entry_points[i] = cum;  // raw offsets; caller converts to de-stuffed
      }
    }
  }

  if (pps->slice_segment_header_extension_present) {
    int len = (int)br.ue();
    if (len > 256) return false;
    for (int i = 0; i < len; i++) br.skip(8);
  }

  // byte_alignment(): alignment_bit_equal_to_one + zero bits to byte boundary
  if (br.u(1) != 1) { /* tolerate */ }
  while (!br.byte_aligned()) br.skip(1);

  return br.ok();
}

}  // namespace tde265
