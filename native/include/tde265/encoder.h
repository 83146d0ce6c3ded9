// HEVC encoder: intra encoder producing conformant Main-profile bitstreams.
//
// Capability counterpart of /root/reference/libde265/encoder/ (encoder-core,
// encoder-syntax, encoder-context) and the en265 API surface.  Independent
// design: the encoder reuses the decoder's reconstruction machinery — each
// coded TU is appended to a FrameProgram and executed through the same scalar
// kernels the decoder uses, so encoder reconstruction is bit-identical to
// any conformant decoder's by construction.
#pragma once

#include <climits>
#include <memory>
#include <vector>

#include "tde265/bitwriter.h"
#include "tde265/frame.h"
#include "tde265/motion.h"
#include "tde265/program.h"
#include "tde265/sliceheader.h"

namespace tde265 {

struct EncoderConfig {
  int width = 0;
  int height = 0;
  int qp = 27;
  int ctb_log2 = 5;       // 32x32 CTBs
  int min_cb_log2 = 3;    // 8x8 minimum CUs
  int fps_num = 25, fps_den = 1;
  int bit_depth = 8;  // 8 = Main profile, 9/10 = Main10
  int chroma_format = 1;  // 1 = 4:2:0, 2 = 4:2:2, 3 = 4:4:4 (intra coding)
  // PCM: when enabled, intra CUs whose best-mode SAD exceeds the threshold
  // are coded as raw samples (lossless at pcm bit depth == bit depth)
  bool pcm = false;
  int pcm_sad_threshold = 0;
  // lossless coding: every CU is transquant-bypass (residual carried raw)
  bool lossless = false;
  // SAO: two-pass encode (estimate band/edge offsets on the deblocked
  // reconstruction, then re-encode the slice with per-CTB sao() syntax)
  bool sao = false;
  // adaptive QP: per-CTB QP from luma variance, signalled via cu_qp_delta
  bool adaptive_qp = false;
  int aq_range = 4;  // max +/- QP adjustment
  // emit a decoded-picture-hash suffix SEI (MD5) per picture
  bool sei_hash = false;
  // signal scaling_list_enabled with the spec default lists (no explicit
  // list data); reconstruction dequant then uses the default matrices
  bool scaling_lists = false;
  // CTBs per slice (0 = one slice per picture); exercises slice restarts,
  // slice_segment_address signalling and in-picture boundary rules
  int ctbs_per_slice = 0;
  // entropy-coding structure (one slice per picture when either is set):
  bool wpp = false;            // entropy_coding_sync (one substream per row)
  int tile_cols = 1, tile_rows = 1;  // uniform tiles
  bool rect_parts = true;            // 2NxN/Nx2N inter partitions
  bool amp = false;                  // asymmetric (nU/nD/nL/nR) partitions
  bool dependent_slices = false;     // ctbs-per-slice segments after the
                                     // first become dependent segments
  bool across_tiles = true;          // loop_filter_across_tiles
  // GOP structure: 0/1 = all-intra; N>1 = IDR every N pictures, P pictures
  // (one L0 reference, the previous picture) in between — the low-delay-P
  // counterpart of the reference's sop-structure
  int intra_period = 1;
  // signalled general_level_idc; 0 = auto (Annex-A minimum
  // for the picture size and frame rate, params.h)
  int level_idc = 0;
  // open GOP: recovery points after the first are CRA pictures (continuous
  // POC, no DPB reset) instead of IDR — exercises the decoder's non-IDR
  // IRAP paths (spec 8.1 NoRaslOutputFlag, POC derivation across CRA)
  bool open_gop = false;
  // open-GOP leading pictures are RADL instead of RASL: the leading B
  // references ONLY its CRA (forward, positive-delta RPS), so it stays
  // decodable when tuning in at the CRA (spec 7.4.2.2: RADL may not
  // reference any picture preceding the IRAP in decode order)
  bool radl = false;
  // rate-distortion optimized quantization (CABAC-state rate estimates)
  bool rdoq = true;
  // 2 = two-level pyramid (closed GOP): anchors every 4 pictures, a
  // mid B referencing both anchors, and level-2 b pictures referencing
  // their nearest anchor/mid pair (decode order A4 B2 b1 b3;
  // max_num_reorder_pics = 2). 1 = the flat IbP pyramid below.
  int pyramid_levels = 1;
  // hierarchical-B (IbP): odd display positions buffer and encode as B
  // pictures referencing the surrounding even (P/I) pictures; POC order
  // differs from decode order (max_num_reorder_pics = 1)
  bool b_pyramid = false;
  // --- algorithm registry: pluggable per-decision strategies, selected by
  // name through en265_set_parameter_choice (capability counterpart of the
  // reference's encoder/algo/ modules: Algo_TB_IntraPredMode,
  // Algo_PB_MV_Search, Algo_CB_Split) ---
  enum class IntraAlgo { kFastBrute, kBrute, kMinSad };
  enum class MeAlgo { kDiamond, kFull, kZero };
  // kRd: per-node trial encode of leaf-vs-split with full state rollback
  // (contexts + arithmetic engine + recon area + program ops), choosing by
  // SSD + lambda*rate — the counterpart of the reference's
  // Algo_CB_Split_BruteForce (encoder/algo/cb-split.cc)
  enum class SplitAlgo { kFixed16, kMin8, kRd };
  IntraAlgo intra_algo = IntraAlgo::kFastBrute;
  MeAlgo me_algo = MeAlgo::kDiamond;
  SplitAlgo split_algo = SplitAlgo::kFixed16;
  int me_range = 12;  // full-pel motion search range around the predictor
  // generalized-B (GPB) low-delay: inter pictures are B slices with both
  // reference lists pointing at the previous picture (bi-predictive merge
  // candidates become available)
  bool use_b_slices = false;
  bool tmvp = false;  // temporal merge/AMVP candidates (collocated MVs)
  // keep the last IDR reconstruction as a long-term reference (second L0
  // entry) — exercises LT marking/list construction and LT candidate rules
  bool lt_ref = false;
  // explicit weighted prediction: estimate a per-picture luma weight/offset
  // against each reference (fades) and signal a pred_weight_table
  bool weighted_pred = false;
  // sign-data hiding: skip the DC-most sign per qualifying sub-block and
  // carry it in the level-sum parity (spec 7.4.9.11). Default-on: with the
  // RDOQ-tier parity fix (rdoq_sign_fix) it measures -0.4..-0.6% BD-rate.
  bool sign_hiding = true;
  // transform-skip for 4x4 TBs (chosen per TB by SSD + level-cost proxy)
  bool transform_skip = false;
  // constrained intra prediction (intra borders exclude inter samples)
  bool constrained_intra = false;
  // RExt cross-component prediction (4:4:4 only): predict chroma residuals
  // from the reconstructed luma residual with a signalled per-TU scale
  bool ccp = false;
  // PPS-level chroma QP offsets (spec 7.4.3.3.1, -12..12); also used by the
  // deblocking chroma tc derivation (8.7.2.5.5)
  int cb_qp_offset = 0;
  int cr_qp_offset = 0;
  int num_refs = 1;  // reference pictures in L0 (1..15; >=2 exercises
                     // ref_idx signalling and cross-distance MV scaling;
                     // large values exercise deep-DPB ref-list builds)
  // RExt SPS flags for decoder-differential corpus streams.  The writer
  // mirrors every SYNTAX impact (persistent-Rice binarization state,
  // explicit_rdpcm_flag emission, sign-hiding interactions); the
  // reconstruction-only effects (coefficient rotation, RDPCM recon) are
  // intentionally NOT mirrored in the encoder recon — these streams exist
  // to diff OUR decoder against the reference decoder on identical bits,
  // so encode-side reference drift is harmless (and expected).
  bool rext_persistent_rice = false;
  bool rext_ts_rotation = false;
  bool rext_implicit_rdpcm = false;   // forces sign_hiding off (the
                                      // decoder-side SDH disable would
                                      // otherwise need mode-aware mirroring)
  bool rext_explicit_rdpcm = false;
  // intra mode candidate set searched per CU
  std::vector<int> intra_candidates = {0, 1, 10, 26, 2, 18, 34};
};

class Encoder {
 public:
  explicit Encoder(const EncoderConfig& cfg);

  // Encode one frame (I-frame; 4:2:0 planes).  Returns the Annex-B bytes
  // (headers are emitted before the first frame).
  std::vector<u8> encode_frame(const u8* y, int stride_y, const u8* cb,
                               const u8* cr, int stride_c);

  // 16-bit sample variant for bit_depth > 8 (strides in samples).
  std::vector<u8> encode_frame16(const u16* y, int stride_y, const u16* cb,
                                 const u16* cr, int stride_c);

  // Reconstruction of the last encoded frame (what a decoder will output).
  const Frame& recon() const { return *recon_; }
  // The reconstruction program built while encoding (tests/debugging).
  const FrameProgram& program() const { return prog_; }

 private:
  std::vector<u8> encode_frame_common(const void* y, int stride_y,
                                      const void* cb, const void* cr,
                                      int stride_c);
  void write_headers(std::vector<u8>* out);
  void write_slice_header(BitWriter* bw, int ctb_rs,
                          const std::vector<u32>* entry_sizes = nullptr,
                          bool dependent = false);
  void encode_slice_substreams(std::vector<u8>* out);
  void emit_substream_slice_nal(std::vector<u8>* out, const BitWriter& data_bw,
                                const std::vector<u32>& raw_bounds,
                                int slice_addr);
  void encode_ctb(int ctb_x, int ctb_y);
  void encode_cq(int x0, int y0, int log2_size, int depth);
  void encode_cq_leaf(int x0, int y0, int log2_size, int depth,
                      bool large_skip);
  void write_split_flag(int x0, int y0, int depth, bool split);
  // --- RD split search (SplitAlgo::kRd): trial-encode with rollback ---
  // Snapshot of every state an encode_cq subtree mutates.  `save_cu` records
  // the pre-trial state (area rectangles + sizes); `restore_cu` rolls back.
  // `capture_cu` additionally copies the DELTA (appended program ops +
  // bitstream tail) so a rolled-back trial can be re-applied with `apply_cu`.
  struct EncSave {
    ContextTable ctx;
    CabacEncoder::State cb;
    BitWriter::Pos bw;
    int cur_qp, qg_pred, qg_prev_qp, last_cu_qp;
    bool qg_first, qg_delta_written;
    size_t n_ops, n_intras, n_tus, n_pus, n_pcms, n_cval, n_cpos, n_pcmd;
    int x0, y0, n;  // snapshotted area (luma coords)
    std::vector<u8> px[3];
    std::vector<PbMotion> a_motion;
    std::vector<i8> a_qp;
    std::vector<u8> a_nz, a_dbf, a_ipm, a_ipmc, a_cui, a_ctd;
  };
  struct EncDelta {
    EncSave end;  // post-trial scalar state + area contents
    std::vector<Op> ops;
    std::vector<TuRec> tus;
    std::vector<PuRec> pus;
    std::vector<IntraRec> intras;
    std::vector<PcmRec> pcms;
    std::vector<i16> cval;
    std::vector<u16> cpos;
    std::vector<u16> pcmd;
    std::vector<u8> bw_tail;
    u8 bw_cur;
    int bw_nbits;
  };
  EncSave save_cu(int x0, int y0, int log2_size);
  void restore_cu(const EncSave& s);
  EncDelta capture_cu(const EncSave& base);
  void apply_cu(const EncSave& base, const EncDelta& d);
  // RD cost of the just-encoded area: SSD (all planes) + lambda * rate
  i64 ssd_rect(int cidx, int x0, int y0, int w, int h) const;
  i64 area_ssd(int x0, int y0, int n) const;
  double rd_encode_cq(int x0, int y0, int log2_size, int depth);
  void encode_cu(int x0, int y0, int log2_size);
  int choose_luma_mode(int x0, int y0, int log2_size);
  void encode_cu_intra(int x0, int y0, int log2_size);
  void encode_cu_inter(int x0, int y0, int log2_size);
  bool try_large_skip(int x0, int y0, int log2_size);
  void encode_large_skip(int x0, int y0, int log2_size);
  int large_skip_merge_idx_ = 0;
  void write_cu_skip_flag(int x0, int y0, int flag);
  void mark_cu_edges(int x0, int y0, int log2_size);
  void mark_nonzero(int x0, int y0, int log2_size);
  void write_merge_idx(int idx);
  void write_sao(int ctb_x, int ctb_y);
  void estimate_sao();
  void append_hash_sei(std::vector<u8>* out);
  void write_mvd(i32 mvd_x, i32 mvd_y);
  void write_ref_idx(int idx, int num_active);
  void apply_sign_hiding(i32* levels, int log2, int scan_idx,
                         const i32* coeffs = nullptr, int qpp = 0,
                         int bd = 8);
  int sad_luma(int x0, int y0, int n) const;
  i64 ssd_luma_rect(int x0, int y0, int w, int h) const;
  double rd_lambda() const;
  // per-picture QP with the pyramid-level offset applied
  int pic_qp() const { return clip3(1, 51, cfg_.qp + pic_qp_delta_); }
  int sad_luma_rect(int x0, int y0, int w, int h) const;
  PbMotion predict_inter(int x0, int y0, int n, const PbMotion& m,
                         bool emit_op);
  PbMotion predict_inter_pu(int x0, int y0, int w, int h, const PbMotion& m,
                            bool emit_op);
  struct PuChoice {
    PuMotionSyntax syn;
    int cost = INT32_MAX;
  };
  PuChoice choose_pu(int cb_x0, int cb_y0, int log2_cb, int xP, int yP,
                     int w, int h, int part_idx, int part_mode);
  void write_pu_syntax(const PuMotionSyntax& syn, int x0, int y0);
  void write_intra_luma_mode(int x0, int y0, int mode);
  void write_residual(int x0c, int y0c, int log2_size, int cidx,
                      const i32* levels, int scan_idx, bool tskip = false,
                      bool cu_intra = true);
  u8 stat_coeff_enc_[4] = {0, 0, 0, 0};  // persistent-Rice stats (RExt),
                                         // reset per slice like the decoder
  static int map_dm_chroma(int luma_mode);
  int chroma_qp(int qp_y, int cidx) const;

  EncoderConfig cfg_;
  std::shared_ptr<Sps> sps_;
  std::shared_ptr<Pps> pps_;
  std::unique_ptr<Frame> recon_;
  FrameProgram prog_;  // ops executed incrementally for reconstruction

  // source planes for the frame being encoded (u8 or u16 samples)
  const void* src_[3] = {};
  int src_stride_[3] = {};
  bool src16_ = false;

  int src_px(int cidx, int x, int y) const {
    return src16_ ? ((const u16*)src_[cidx])[(size_t)y * src_stride_[cidx] + x]
                  : ((const u8*)src_[cidx])[(size_t)y * src_stride_[cidx] + x];
  }
  int rec_px(int cidx, int x, int y) const {
    return recon_->bytes_pp == 1 ? *recon_->px8(cidx, x, y)
                                 : *recon_->px16(cidx, x, y);
  }

  // inter coding state
  std::unique_ptr<Frame> ref_frame_;       // previous reconstructed picture
  std::unique_ptr<Frame> ref_frame2_;      // picture before that (num_refs=2)
  std::vector<std::unique_ptr<Frame>> ref_hist_;  // refs [2..num_refs)
                                                  // (low-delay deep-DPB)
  std::unique_ptr<Frame> lt_frame_;        // last IDR recon (lt_ref mode)
  // --- per-picture coding state (filled by the GOP drivers; consumed by
  // the slice-header writer and the shared encode body) ---
  struct PicRefs {
    int n0 = 0, n1 = 0;
    Frame* l0[3] = {nullptr, nullptr, nullptr};
    Frame* l1[3] = {nullptr, nullptr, nullptr};
    int poc0[3] = {0, 0, 0};
    int poc1[3] = {0, 0, 0};
    bool lt0[3] = {false, false, false};
  };
  PicRefs cur_refs_;
  struct PicRps {
    int n_neg = 0;
    int neg_delta[3] = {0, 0, 0};  // positive values (poc distances)
    bool neg_used[3] = {true, true, true};  // used_by_curr (false = foll:
                                            // kept for a later RASL)
    int n_pos = 0;
    int pos_delta[2] = {0, 0};      // positive poc distances, ascending
    bool pos_used[2] = {true, true};
  };
  PicRps cur_rps_;
  bool cur_is_b_ = false;
  int l1_dpb_map_[3] = {0, 0, 0};  // L1 ref_idx -> prog_.ref_frames index
  // b-pyramid pending (odd display position) source frame
  struct PendingSrc {
    bool valid = false;
    bool is16 = false;
    int pos = 0;  // GOP-relative display position
    int abs = 0;  // absolute display index (continuous-POC open GOP)
    std::vector<u8> y8, cb8, cr8;
    std::vector<u16> y16, cb16, cr16;
    int sy = 0, sc = 0;
  };
  PendingSrc pending_;
  PendingSrc pend3_[3];  // 2-level pyramid: sources at anchor+1..+3
  int pic_qp_delta_ = 0;  // pyramid-level QP offset of the current picture
  u32 display_count_ = 0;
  std::unique_ptr<Frame> bref_prev_;  // previous even recon (b's L0)
  std::unique_ptr<Frame> bmid_;       // 2-level pyramid: the mid B recon
  bool pyr_override_ = false;
  std::vector<Frame*> picture_refs_;  // refs pushed for this picture
  void derive_luma_mpm(int x0, int y0, int cand[3]);
  void repush_refs_() {
    for (Frame* f : picture_refs_) prog_.ref_frames.push_back(f);
  }
  void encode_bpyramid_(std::vector<u8>* out, const void* y, int stride_y,
                        const void* cb, const void* cr, int stride_c);
  void encode_pending_(std::vector<u8>* out, bool as_b,
                       bool radl_only_cra = false);
  // 2-level pyramid driver (closed GOP)
  void encode_bpyramid2_(std::vector<u8>* out, const void* y, int stride_y,
                         const void* cb, const void* cr, int stride_c);
  void stash_src_(PendingSrc& ps, int pos, int abs, const void* y, int sy,
                  const void* cb, const void* cr, int sc);
  void encode_src_(std::vector<u8>* out, const PendingSrc& ps);
  void emit_chunk_bs_(std::vector<u8>* out, int pos);
  void flush_chunk2_(std::vector<u8>* out);

 public:
  // drain the reorder buffer (b-pyramid): encodes a buffered trailing
  // picture as P.  Returns its bytes (empty when nothing pending).
  std::vector<u8> flush_reorder();

 private:
  std::shared_ptr<SliceHeader> sh_;        // current picture's slice header
  bool cur_is_intra_pic_ = true;
  bool cur_is_idr_ = true;
  int poc_ = 0;
  // pictures since the last intra recovery point (bounds usable refs: a
  // trailing picture must not reference across a CRA)
  int since_irap_() const {
    return cfg_.intra_period > 1
               ? (int)(frame_count_ % (u32)cfg_.intra_period)
               : 0;
  }
  std::vector<SaoParams> sao_chosen_;  // per-CTB estimated SAO parameters

  // QP-group (cu_qp_delta) state mirroring SliceParser
  int cur_qp_ = 26;          // QP used for quantization in the current QG
  int qg_pred_ = 26;         // cached prediction for the current QG
  int qg_prev_qp_ = 26;      // decoder's qPY_PREV
  int last_cu_qp_ = 26;      // decoder's qp_y_ after the last CU
  bool qg_first_ = true;
  bool qg_delta_written_ = false;
  int derive_qp_pred_enc(int x_qg, int y_qg) const;
  void maybe_write_cu_qp_delta();
  void set_cu_qp_grid(int x0, int y0, int log2_size);
  int cu_grid_qp() const {
    return (!pps_->cu_qp_delta_enabled || qg_delta_written_) ? cur_qp_
                                                             : qg_pred_;
  }

  BitWriter slice_bw_;
  int nal_type_override_ = -1;  // RASL/RADL leading-picture emission
  std::unique_ptr<CabacEncoder> cabac_;
  ContextTable ctx_;
  bool headers_written_ = false;
  u32 frame_count_ = 0;
};

// Forward transform (spec-matched integer DCT, HM-convention shifts) and
// quantization helpers, exposed for tests and the TPU encode path.
void fwd_dct_2d(i32* coeffs, const i32* residual, int log2_size, int bit_depth);
// fractional bits (2^-15 units) for one context-coded bin at the model's
// current state (the CABAC_encoder_estim-tier rate model, rdoq.cc)
int cabac_ctx_bits(const ContextModel& m, int bin);

// RDOQ: per-coefficient level choice by D + lambda*R with CABAC-state
// fractional-bit rate estimation (rdoq.cc); falls back to quantize() for
// transform-skip / zero-check paths.
void rdoq_quantize(i32* levels, const i32* coeffs, int qp, int log2,
                   int cidx, int scan_idx, int bd, bool intra,
                   const ContextTable& ctx, double lambda);

// RDOQ-aware sign-data-hiding parity fix (rdoq.cc): picks the +-1 level
// adjustment minimizing D + lambda*R under the RDOQ error scale.
void rdoq_sign_fix(i32* levels, const i32* coeffs, int qp, int log2,
                   int scan_idx, int bd, double lambda);

void quantize(i32* levels, const i32* coeffs, int n, int qp, int log2_size,
              int bit_depth, bool intra);

}  // namespace tde265
