#include "tde265/frame.h"

#include <cstring>

namespace tde265 {

void Frame::alloc(std::shared_ptr<const Sps> s, std::shared_ptr<const Pps> p) {
  sps = s;
  pps = p;
  width = s->pic_width_in_luma_samples;
  height = s->pic_height_in_luma_samples;
  chroma_format = s->chroma_format_idc;
  chroma_width = s->width_chroma();
  chroma_height = s->height_chroma();
  bit_depth[0] = s->bit_depth_luma;
  bit_depth[1] = bit_depth[2] = s->bit_depth_chroma;
  bytes_pp = (max_i(bit_depth[0], bit_depth[1]) > 8) ? 2 : 1;

  stride[0] = width;
  stride[1] = stride[2] = chroma_width;
  // resize (not assign): every decoded pixel/PU is written during
  // reconstruction, so re-zeroing recycled DPB buffers is pure memset cost.
  // On a genuinely fresh/grown buffer resize() still zero-initializes.
  plane[0].resize((size_t)stride[0] * height * bytes_pp);
  if (chroma_format != 0) {
    plane[1].resize((size_t)stride[1] * chroma_height * bytes_pp);
    plane[2].resize((size_t)stride[2] * chroma_height * bytes_pp);
  }

  pb_w = ceil_div(width, 4);
  pb_h = ceil_div(height, 4);
  ctb_w = s->pic_width_in_ctbs;
  ctb_h = s->pic_height_in_ctbs;
  reset_parse_metadata();

  state = PicState::InProgress;
  needed_for_output = false;
  is_long_term = false;
  integrity_ok = true;
}

void Frame::reset_parse_metadata() {
  // motion keeps its default-constructed intra=true for CUs that never call
  // set_motion (intra CUs), so it must be re-initialized every picture
  motion.assign((size_t)pb_w * pb_h, PbMotion());
  qp_y.assign((size_t)pb_w * pb_h, 0);
  nonzero_coeff.assign((size_t)pb_w * pb_h, 0);
  deblock_flags.assign((size_t)pb_w * pb_h, 0);
  intra_pred_mode.assign((size_t)pb_w * pb_h, 1);
  intra_mode_c.assign((size_t)pb_w * pb_h, 1);
  cu_info.assign((size_t)pb_w * pb_h, 0);
  ct_depth.assign((size_t)pb_w * pb_h, 0);
  sao.assign((size_t)ctb_w * ctb_h, SaoParams());
  slice_addr_rs.assign((size_t)ctb_w * ctb_h, -1);
  slice_idx.assign((size_t)ctb_w * ctb_h, 0);
}

void Frame::release() {
  state = PicState::Unused;
  needed_for_output = false;
}

}  // namespace tde265
