// Slice-data syntax walk: CTB quadtree, CU/PU/TU syntax, residual coding.
//
// Capability counterpart of the read-side of /root/reference/libde265/
// slice.cc (read_slice_segment_data / read_coding_quadtree /
// residual_coding).  Independent design: instead of reconstructing pixels
// per-TU through a dispatch table, the walk emits a FrameProgram (see
// program.h) — ordered ops + sparse coefficient arrays — which a backend
// executes for the whole picture.
#pragma once

#include <memory>

#include "tde265/cabac.h"
#include "tde265/frame.h"
#include "tde265/nalu.h"
#include "tde265/program.h"
#include "tde265/sliceheader.h"

namespace tde265 {

class Decoder;

// Scan-order tables (spec 6.5.3-6.5.5), generated once at startup.
struct ScanPos {
  u8 x, y;
};
// scan_idx: 0 diag(up-right), 1 horizontal, 2 vertical; log2_size 0..5.
const ScanPos* scan_order(int log2_size, int scan_idx);
// inverse table: [(y << log2_size) + x] -> scan position index
const u16* scan_order_inv(int log2_size, int scan_idx);

// sig_coeff_flag context increment (spec 9.3.4.2.5); shared by the residual
// reader (residual.cc) and writer (encoder.cc).
int sig_ctx_inc(int log2_size, int cidx, int xc, int yc, int prev_csbf,
                int scan_idx);

// Per-slice-segment parser.  One instance decodes one slice segment
// (sequential across its substreams; WPP context hand-off included).
class SliceParser {
 public:
  SliceParser(Decoder* dec, FrameProgram* prog, Frame* frame,
              std::shared_ptr<SliceHeader> sh);

  // Decode the slice segment data.  `data` points at the first byte after
  // the slice header (byte-aligned); entry points are de-stuffed offsets
  // into it.  On success the parser state (for dependent slices / WPP) is
  // left in the decoder's picture-parse state.
  Err decode(const u8* data, size_t size);

  // one tile's substream, parsed standalone into this parser's program
  // (used by the parallel tile-parse path; tiles share no CABAC or
  // availability state)
  Err decode_tile_substream(const u8* data, size_t wstart, size_t wend,
                            int start_ts);

  // one WPP CTB row parsed wavefront-parallel: row N trails row N-1 by two
  // CTBs (spec availability) and inherits its CABAC context from the state
  // saved after CTB 1 of the row above (spec 9.3.1).  Counterpart of the
  // reference's thread_task_ctb_row (slice.cc:4732-4826), but the workers
  // emit program fragments instead of reconstructing pixels.
  struct WppSync;
  Err decode_wpp_row(const u8* data, size_t wstart, size_t wend, int row,
                     WppSync* sync);

  // Context tables carried across slice segments / CTB rows.
  struct ParseState {
    ContextTable ctx;
    u8 stat_coeff[4] = {};
    bool valid = false;
  };

 private:
  // --- CTB / CU level ---
  bool decode_ctb(int ctb_x, int ctb_y);
  void decode_sao(int ctb_x, int ctb_y);
  bool coding_quadtree(int x0, int y0, int log2_size, int depth);
  bool coding_unit(int x0, int y0, int log2_size);
  bool prediction_unit(int x0, int y0, int w, int h, int ct_depth,
                       int log2_cb_size, int part_idx, int n_parts);
  bool pcm_sample(int x0, int y0, int log2_size);

  // --- intra mode decode ---
  void intra_mode_luma(int x0, int y0, int log2_cb_size, bool nxn);
  int decode_chroma_mode_bins();

  // --- transform tree ---
  bool transform_tree(int x0, int y0, int x_base, int y_base, int log2_size,
                      int depth, int blk_idx, int log2_cb_size,
                      bool parent_cbf_cb[2], bool parent_cbf_cr[2]);
  bool transform_unit(int x0, int y0, int x_base, int y_base, int log2_size,
                      int depth, int blk_idx, bool cbf_luma, bool cbf_cb[2],
                      bool cbf_cr[2]);
  // Emit one channel's residual TU record + ops.
  bool residual_coding(int x0, int y0, int log2_size, int cidx);
  // Emit intra-pred op for a channel block.
  void emit_intra(int x0, int y0, int log2_size, int cidx, int mode);
  int chroma_mode_at(int x0, int y0) const;   // luma coords
  bool chroma_dm_at(int x0, int y0) const;    // luma coords
  int read_cross_comp_pred(int c_minus1);     // returns ResScaleVal
  void emit_zero_ccp_tu(int x0, int y0, int log2_size, int cidx, int scale);
  void emit_residual(int x0, int y0, int log2_size, int cidx, bool has_coeffs,
                     u32 coeff_start, int ncoeff, u8 extra_flags);

  // --- QP handling (spec 8.6.1) ---
  int derive_qp_pred(int x_qg, int y_qg);
  void set_qp_for_cu(int x0, int y0, int log2_size);
  int get_chroma_qp(int qp_y_raw, int cidx) const;

  // --- deblocking edge marking ---
  void mark_cu_edges(int x0, int y0, int log2_size);
  void mark_tu_edges(int x0, int y0, int log2_size);

  // --- neighbor availability (spec 6.4.1) ---
  bool available_zscan(int x_curr, int y_curr, int xn, int yn) const;

  // --- CABAC syntax helpers ---
  int decode_split_cu_flag(int x0, int y0, int depth);
  int decode_cu_skip_flag(int x0, int y0);
  int decode_part_mode(bool intra, int log2_cb_size);
  int decode_merge_idx();
  int decode_inter_pred_idc(int x0, int y0, int w, int h, int ct_depth);
  int decode_ref_idx(int num_active);
  void decode_mvd(i32* mvd_x, i32* mvd_y);
  int decode_cu_qp_delta();

  // current substream management
  void start_substream(int substream_idx);

  // append a worker-parsed program fragment (index/slot fixups) — shared by
  // the parallel tile and WPP paths
  void merge_fragment(FrameProgram& f);

  Decoder* dec_;
  FrameProgram* prog_;
  Frame* frame_;
  std::shared_ptr<SliceHeader> sh_;
  const Pps* pps_;
  const Sps* sps_;

  CabacDecoder cabac_;
  ContextTable ctx_;
  u8 stat_coeff_[4] = {};

  const u8* data_ = nullptr;
  size_t size_ = 0;

  // Per-CTB state
  int ctb_x_ = 0, ctb_y_ = 0;

  // QP state
  int qp_y_pred_ = 26;       // qPY_PREV
  int qp_y_ = 26;            // current CU QP
  bool cu_qp_delta_coded_ = false;
  int cu_qp_delta_val_ = 0;
  bool chroma_qp_offset_coded_ = false;
  int cu_chroma_qp_offset_[2] = {0, 0};  // cb, cr
  bool first_qg_ = true;     // first QG after slice/tile/WPP-row reset
  int qg_x_ = 0, qg_y_ = 0;  // current quantization-group position
  int qp_pred_cached_ = 26;  // qPY_PRED for the current QG
  bool qp_set_for_cu_ = false;

  // CU state during CU decode
  bool cu_transquant_bypass_ = false;
  bool cu_pcm_ = false;
  u8 intra_mode_y_[4] = {};   // per NxN part
  u8 intra_mode_c_ = 0;
  // 4:4:4 signals one chroma mode per luma PB (spec 7.3.8.5; reference
  // slice.cc:4514-4536); per-quadrant mode + derived-from-luma (mode 4) flag.
  u8 intra_mode_c4_[4] = {};
  bool chroma_dm_[4] = {};
  // RExt cross-component prediction: ResScaleVal for the chroma residual
  // currently being parsed (reference slice.cc:3565-3599).
  int cur_res_scale_ = 0;
  bool cu_is_intra_ = true;
  u8 cu_part_mode_ = 0;       // PartMode enum
  bool explicit_rdpcm_flag_ = false;
  bool explicit_rdpcm_dir_ = false;
  int cu_pred_mode_x0_ = 0, cu_pred_mode_y0_ = 0, cu_log2_size_ = 0;
  bool last_pu_was_merge_ = false;
  int max_trafo_depth_ = 0;
  bool intra_split_ = false;
  u8 transform_skip_flag_[3] = {};

  // WPP row-context storage (sequential wavefront hand-off)
  ParseState wpp_saved_;
  friend class Decoder;
};

// Part modes (spec 7.4.9.4)
enum PartMode : u8 {
  PART_2Nx2N = 0,
  PART_2NxN = 1,
  PART_Nx2N = 2,
  PART_NxN = 3,
  PART_2NxnU = 4,
  PART_2NxnD = 5,
  PART_nLx2N = 6,
  PART_nRx2N = 7,
};

}  // namespace tde265
