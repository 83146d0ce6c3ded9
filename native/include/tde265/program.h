// FrameProgram: the flat, tensorizable per-picture reconstruction program.
//
// This is the central TPU seam of the framework (SURVEY.md section 7): the
// serial CABAC/syntax front-end *records* everything the pixel pipeline needs
// as flat arrays (SoA), and a backend — scalar C++ oracle or the JAX/Pallas
// pipeline — executes it.  Replaces the reference's immediate per-TU/PU calls
// through the acceleration_functions table
// (/root/reference/libde265/acceleration.h:29-231).
#pragma once

#include <memory>
#include <vector>

#include "tde265/common.h"
#include "tde265/frame.h"

namespace tde265 {

struct SliceHeader;  // sliceheader.h

// Transform-unit record (one channel).  Coefficients are stored sparsely in
// the shared coeff_val/coeff_pos arrays (sub-block scatter done by backend).
struct TuRec {
  u16 x = 0, y = 0;     // channel coordinates
  u8 log2_size = 2;
  u8 cidx = 0;          // 0=Y 1=Cb 2=Cr
  i8 qp = 0;            // channel QP (offsets and tables already applied)
  u8 flags = 0;
  u32 coeff_start = 0;  // into coeff_val/coeff_pos
  u16 ncoeff = 0;
  i8 cross_comp_scale = 0;  // RExt cross-component prediction alpha (0 = off)

  enum Flags : u8 {
    kTransformSkip = 1,
    kTransquantBypass = 2,
    kUseDst = 4,          // 4x4 intra luma
    kRdpcm = 8,
    kRdpcmVertical = 16,  // else horizontal (valid when kRdpcm)
    kIntra = 32,
  };
};

// Prediction-unit record for motion compensation.
struct PuRec {
  u16 x = 0, y = 0, w = 0, h = 0;  // luma coords
  MotionVector mv[2];
  i8 ref_idx[2] = {-1, -1};
  u8 pred_flags = 0;   // bit0 L0, bit1 L1
  u16 slice = 0;       // index into FrameProgram::slices (weighted pred)
  // DPB slot of each reference (resolved at parse time), -1 if unused.
  i8 ref_dpb[2] = {-1, -1};
};

// Intra-prediction record.
struct IntraRec {
  u16 x = 0, y = 0;   // channel coordinates
  u8 log2_size = 2;
  u8 cidx = 0;
  u8 mode = 0;        // 0=planar 1=DC 2..34 angular
};

// PCM block record (raw samples kept in pcm_data).
struct PcmRec {
  u16 x = 0, y = 0;
  u8 log2_size = 3;
  u32 data_start = 0;  // into pcm_data (samples in Y,Cb,Cr plane order)
};

// One step of the ordered reconstruction program.  The scalar oracle executes
// ops strictly in order; the TPU backend reorders using the dependence rules
// (inter ops are whole-picture parallel; intra/residual follow z-order
// wavefronts).
struct Op {
  enum Kind : u8 { kIntraPred, kAddResidual, kInterPred, kPcm } kind;
  u32 idx;  // into the per-kind array
};

struct FrameProgram {
  Frame* frame = nullptr;              // target picture
  std::vector<std::shared_ptr<SliceHeader>> slices;

  std::vector<Op> ops;
  std::vector<TuRec> tus;
  std::vector<PuRec> pus;
  std::vector<IntraRec> intras;
  std::vector<PcmRec> pcms;

  // Sparse coefficients: value + raster position (pos = xC + (yC << 6),
  // 6 bits each direction covers TU sizes up to 32 with headroom).
  std::vector<i16> coeff_val;
  std::vector<u16> coeff_pos;

  std::vector<u16> pcm_data;

  // References (DPB slots) used by this picture, for backend prefetch.
  std::vector<Frame*> ref_frames;  // indexed by PuRec::ref_dpb

  // Deep snapshot of the frame + reference state, filled at picture
  // completion when Decoder::keep_programs is set (DPB slots are recycled,
  // so retained programs cannot rely on the live Frame pointers).
  struct Snapshot {
    i32 poc = 0;
    int width = 0, height = 0, chroma_width = 0, chroma_height = 0;
    int bytes_pp = 1;
    int bit_depth[3] = {8, 8, 8};
    std::vector<u8> plane[3];
    int stride[3] = {0, 0, 0};
    int pb_w = 0, pb_h = 0, ctb_w = 0, ctb_h = 0;
    int ctb_size = 64;
    std::vector<i8> qp_y;
    std::vector<u8> nonzero_coeff, deblock_flags, cu_info;
    // per-4x4 cell index of the covering PU (-1 = no inter PU), painted at
    // parse time so the device backend gathers MC parameters per cell
    // without any host-side rectangle painting
    std::vector<i32> pu_idx;
    // device intra plan (intraplan.cc): per-IntraRec scheduling + border
    // gather plans for the fused backend's super-wave scan
    std::vector<i32> ip_step, ip_slot, ip_rrow;
    std::vector<u8> ip_flags;   // 1 unavail, 2 filt, 4 strong
    std::vector<u8> ip_edge;    // 0 none, 1 DC, 2 v26, 3 h10
    std::vector<i32> ip_border_pos, ip_border_sub;  // flat, ragged
    std::vector<u32> ip_border_off;                 // n_intras + 1 offsets
    std::vector<SaoParams> sao;
    std::vector<i32> ref_pocs;
    std::vector<std::vector<u8>> ref_planes;  // 3 per ref, flattened
    std::vector<u16> slice_idx;               // per CTB
    // per-slice records, kSliceRecordLen i32 each:
    // [0] slice_type [1] deblock_disabled [2] beta_offset [3] tc_offset
    // [4] sao_luma [5] sao_chroma [6] weighted_flag [7] luma_log2_denom
    // [8] chroma_log2_denom [9] loop_filter_across_slices
    // [10] pps_cb_qp_offset [11] pps_cr_qp_offset
    // [16..47]  luma_weight[2][16]   [48..79]  luma_offset[2][16]
    // [80..143] chroma_weight[2][16][2] [144..207] chroma_offset[2][16][2]
    static constexpr int kSliceRecordLen = 208;
    std::vector<i32> slice_records;
    // expanded full-resolution scaling factors when scaling lists are active:
    // 6x4x4 | 6x8x8 | 6x16x16 | 6x32x32 matrices concatenated (8160 bytes)
    bool scaling_enabled = false;
    std::vector<u8> scaling_factors;
    // loop-filter boundary info: per-CTB SliceAddrRs and tile id, plus the
    // PPS loop_filter_across_tiles flag (for the device filter passes)
    std::vector<i32> slice_addr;
    std::vector<i32> tile_id;
    bool across_tiles = true;
    // PCM sample depth + loop-filter disable (sps; for the device backend)
    int pcm_bit_depth[2] = {8, 8};
    bool pcm_loop_filter_disable = false;
  };
  std::shared_ptr<Snapshot> snapshot;

  void clear() {
    snapshot.reset();
    slices.clear();
    ops.clear();
    tus.clear();
    pus.clear();
    intras.clear();
    pcms.clear();
    coeff_val.clear();
    coeff_pos.clear();
    pcm_data.clear();
    ref_frames.clear();
  }
};

}  // namespace tde265
