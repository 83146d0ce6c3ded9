// Motion-vector derivation: merge candidate list (spec 8.5.3.2.2-8.5.3.2.5),
// AMVP predictors (8.5.3.2.6-8.5.3.2.8), and TMVP.
//
// Capability counterpart of the derivation half of
// /root/reference/libde265/motion.cc (get_merge_candidate_list,
// fill_luma_motion_vector_predictors, decode_prediction_unit).  The sample
// interpolation half lives in the backends (recon.cc scalar / ops/mc.py TPU).
#pragma once

#include "tde265/frame.h"
#include "tde265/sliceheader.h"

namespace tde265 {

struct PuMotionSyntax {
  bool merge_flag = false;
  int merge_idx = 0;
  int inter_pred_idc = 2;  // 0=L0 only, 1=L1 only, 2=BI
  int ref_idx[2] = {0, 0};
  i32 mvd[2][2] = {};      // [list][x/y]
  int mvp_flag[2] = {0, 0};
};

// Derive the final motion for one PU and store it into frame.motion over the
// PU area.  (xC,yC,log2_cb) is the CU; (xP,yP,nPbW,nPbH) the PU.
PbMotion derive_pu_motion(Frame& frame, const SliceHeader& sh, int xC, int yC,
                          int log2_cb, int xP, int yP, int nPbW, int nPbH,
                          int part_idx, int part_mode, const PuMotionSyntax& syn);

// Candidate-list derivation (spec 8.5.3.2.x), exposed for the encoder's
// mode decisions (the encoder enumerates the same lists the decoder will).
void derive_merge_list(Frame& frame, const SliceHeader& sh, int xC, int yC,
                       int log2_cb, int xP, int yP, int nPbW, int nPbH,
                       int part_idx, int part_mode, PbMotion list[5]);
void derive_mvp_list(Frame& frame, const SliceHeader& sh, int xC, int yC,
                     int log2_cb, int part_idx, int xP, int yP,
                     int nPbW, int nPbH, int l, int ref_idx,
                     MotionVector mvp[2]);

}  // namespace tde265
