// Slice-data syntax walk (spec 7.3.8) emitting a FrameProgram.
// Behavior counterpart of /root/reference/libde265/slice.cc:2704-5100
// (read_coding_tree_unit / read_coding_quadtree / read_coding_unit /
// read_transform_tree / read_transform_unit), re-designed around program
// emission instead of immediate reconstruction.
#include "tde265/syntax.h"

#include <cstring>
#include <thread>

#include "tde265/decoder.h"
#include "tde265/motion.h"

namespace tde265 {

// ---------------------------------------------------------------------------
// Scan orders (spec 6.5.3-6.5.5), built once.
// ---------------------------------------------------------------------------
namespace {
struct ScanTables {
  // [log2size][scanIdx][pos]
  std::vector<ScanPos> tables[6][3];
  // inverse: [log2size][scanIdx][(y<<lg)+x] -> scan position index
  std::vector<u16> inv[6][3];

  void build_inverse() {
    for (int lg = 0; lg < 6; lg++) {
      int n = 1 << lg;
      for (int s = 0; s < 3; s++) {
        auto& iv = inv[lg][s];
        iv.resize(n * n);
        const auto& t = tables[lg][s];
        for (int i = 0; i < n * n; i++)
          iv[(t[i].y << lg) + t[i].x] = (u16)i;
      }
    }
  }

  ScanTables() {
    for (int lg = 0; lg < 6; lg++) {
      int n = 1 << lg;
      // diagonal (up-right)
      auto& diag = tables[lg][0];
      diag.resize(n * n);
      {
        int i = 0, x = 0, y = 0;
        while (i < n * n) {
          while (y >= 0) {
            if (x < n && y < n) {
              diag[i].x = (u8)x;
              diag[i].y = (u8)y;
              i++;
            }
            y--;
            x++;
          }
          y = x;
          x = 0;
        }
      }
      // horizontal
      auto& hor = tables[lg][1];
      hor.resize(n * n);
      for (int y = 0, i = 0; y < n; y++)
        for (int x = 0; x < n; x++, i++) {
          hor[i].x = (u8)x;
          hor[i].y = (u8)y;
        }
      // vertical
      auto& ver = tables[lg][2];
      ver.resize(n * n);
      for (int x = 0, i = 0; x < n; x++)
        for (int y = 0; y < n; y++, i++) {
          ver[i].x = (u8)x;
          ver[i].y = (u8)y;
        }
    }
    build_inverse();
  }
};
const ScanTables g_scans;
}  // namespace

const ScanPos* scan_order(int log2_size, int scan_idx) {
  return g_scans.tables[log2_size][scan_idx].data();
}

const u16* scan_order_inv(int log2_size, int scan_idx) {
  return g_scans.inv[log2_size][scan_idx].data();
}

// ---------------------------------------------------------------------------
// Availability (spec 6.4.1)
// ---------------------------------------------------------------------------
bool z_available(const Frame& f, int x_curr, int y_curr, int xn, int yn) {
  if (xn < 0 || yn < 0 || xn >= f.width || yn >= f.height) return false;
  const Sps& sps = *f.sps;
  if (f.fast_avail) {
    // Single tile, first slice: availability is pure z-scan order — CTB
    // raster position first, Morton order within the CTB.  Replaces two
    // lookups into the ~0.5 MB min_tb_addr_zs table (cache misses at 1080p+)
    // with a 16-byte LUT interleave.
    int ctb_c =
        (y_curr >> sps.log2_ctb_size) * f.ctb_w + (x_curr >> sps.log2_ctb_size);
    int ctb_n = (yn >> sps.log2_ctb_size) * f.ctb_w + (xn >> sps.log2_ctb_size);
    if (ctb_n != ctb_c) return ctb_n < ctb_c;
    static const u8 kSpread[16] = {0,  1,  4,  5,  16, 17, 20, 21,
                                   64, 65, 68, 69, 80, 81, 84, 85};
    int shmin = sps.log2_min_tb_size;
    u32 mask = (1u << (sps.log2_ctb_size - shmin)) - 1;
    u32 mc = kSpread[((u32)x_curr >> shmin) & mask] |
             (kSpread[((u32)y_curr >> shmin) & mask] << 1);
    u32 mn = kSpread[((u32)xn >> shmin) & mask] |
             (kSpread[((u32)yn >> shmin) & mask] << 1);
    return mn <= mc;
  }
  const Pps& pps = *f.pps;
  int ctb_c = (y_curr >> sps.log2_ctb_size) * f.ctb_w + (x_curr >> sps.log2_ctb_size);
  int ctb_n = (yn >> sps.log2_ctb_size) * f.ctb_w + (xn >> sps.log2_ctb_size);
  if (f.slice_addr_rs[ctb_n] < 0) return false;
  if (f.slice_addr_rs[ctb_n] != f.slice_addr_rs[ctb_c]) return false;
  if (pps.tile_id_ts[pps.ctb_rs_to_ts[ctb_n]] != pps.tile_id_ts[pps.ctb_rs_to_ts[ctb_c]])
    return false;
  int tb_w = sps.pic_width_in_tbs;
  int zs_c = pps.min_tb_addr_zs[(y_curr >> sps.log2_min_tb_size) * tb_w +
                                (x_curr >> sps.log2_min_tb_size)];
  int zs_n = pps.min_tb_addr_zs[(yn >> sps.log2_min_tb_size) * tb_w +
                                (xn >> sps.log2_min_tb_size)];
  return zs_n <= zs_c;
}

// ---------------------------------------------------------------------------
// SliceParser
// ---------------------------------------------------------------------------
SliceParser::SliceParser(Decoder* dec, FrameProgram* prog, Frame* frame,
                         std::shared_ptr<SliceHeader> sh)
    : dec_(dec), prog_(prog), frame_(frame), sh_(std::move(sh)) {
  pps_ = sh_->pps.get();
  sps_ = pps_->sps.get();
  // single-tile + slice starting at CTB 0: z_available() fast path holds
  // for every CTB this slice decodes; a later slice clears it.
  frame_->fast_avail = !pps_->tiles_enabled && sh_->slice_addr_rs == 0;
}

bool SliceParser::available_zscan(int x_curr, int y_curr, int xn, int yn) const {
  return z_available(*frame_, x_curr, y_curr, xn, yn);
}

// --- syntax-element decoders -----------------------------------------------

int SliceParser::decode_split_cu_flag(int x0, int y0, int depth) {
  int inc = 0;
  if (available_zscan(x0, y0, x0 - 1, y0) &&
      frame_->ct_depth[(y0 >> 2) * frame_->pb_w + ((x0 - 1) >> 2)] > depth)
    inc++;
  if (available_zscan(x0, y0, x0, y0 - 1) &&
      frame_->ct_depth[((y0 - 1) >> 2) * frame_->pb_w + (x0 >> 2)] > depth)
    inc++;
  return cabac_.decode_bin(&ctx_[CTX_SPLIT_CU_FLAG + inc]);
}

int SliceParser::decode_cu_skip_flag(int x0, int y0) {
  int inc = 0;
  if (available_zscan(x0, y0, x0 - 1, y0) &&
      (frame_->cu_info[(y0 >> 2) * frame_->pb_w + ((x0 - 1) >> 2)] & 8))
    inc++;
  if (available_zscan(x0, y0, x0, y0 - 1) &&
      (frame_->cu_info[((y0 - 1) >> 2) * frame_->pb_w + (x0 >> 2)] & 8))
    inc++;
  return cabac_.decode_bin(&ctx_[CTX_CU_SKIP_FLAG + inc]);
}

int SliceParser::decode_part_mode(bool intra, int log2_cb_size) {
  if (intra) {
    int bit = cabac_.decode_bin(&ctx_[CTX_PART_MODE]);
    return bit ? PART_2Nx2N : PART_NxN;
  }
  int bit0 = cabac_.decode_bin(&ctx_[CTX_PART_MODE + 0]);
  if (bit0) return PART_2Nx2N;
  int bit1 = cabac_.decode_bin(&ctx_[CTX_PART_MODE + 1]);
  if (log2_cb_size > sps_->log2_min_cb_size) {
    if (!sps_->amp_enabled) return bit1 ? PART_2NxN : PART_Nx2N;
    int bit3 = cabac_.decode_bin(&ctx_[CTX_PART_MODE + 3]);
    if (bit3) return bit1 ? PART_2NxN : PART_Nx2N;
    int bit4 = cabac_.decode_bypass();
    if (bit1) return bit4 ? PART_2NxnD : PART_2NxnU;
    return bit4 ? PART_nRx2N : PART_nLx2N;
  }
  if (bit1) return PART_2NxN;
  if (log2_cb_size == 3) return PART_Nx2N;
  int bit2 = cabac_.decode_bin(&ctx_[CTX_PART_MODE + 2]);
  return bit2 ? PART_Nx2N : PART_NxN;
}

int SliceParser::decode_merge_idx() {
  if (sh_->max_num_merge_cand <= 1) return 0;
  int idx = cabac_.decode_bin(&ctx_[CTX_MERGE_IDX]);
  if (idx) {
    while (idx < sh_->max_num_merge_cand - 1 && cabac_.decode_bypass()) idx++;
  }
  return idx;
}

int SliceParser::decode_inter_pred_idc(int x0, int y0, int w, int h, int ct_depth) {
  // returns 0=L0, 1=L1, 2=BI
  if (w + h == 12) {
    return cabac_.decode_bin(&ctx_[CTX_INTER_PRED_IDC + 4]);
  }
  int bit0 = cabac_.decode_bin(&ctx_[CTX_INTER_PRED_IDC + ct_depth]);
  if (bit0) return 2;
  return cabac_.decode_bin(&ctx_[CTX_INTER_PRED_IDC + 4]);
}

int SliceParser::decode_ref_idx(int num_active) {
  if (num_active <= 1) return 0;
  int cmax = num_active - 1;
  int bit = cabac_.decode_bin(&ctx_[CTX_REF_IDX_LX + 0]);
  int idx = 0;
  while (bit) {
    idx++;
    if (idx == cmax) break;
    if (idx == 1)
      bit = cabac_.decode_bin(&ctx_[CTX_REF_IDX_LX + 1]);
    else
      bit = cabac_.decode_bypass();
  }
  return idx;
}

void SliceParser::decode_mvd(i32* mvd_x, i32* mvd_y) {
  // spec 7.3.8.9 mvd_coding
  int gt0_x = cabac_.decode_bin(&ctx_[CTX_ABS_MVD_GREATER0]);
  int gt0_y = cabac_.decode_bin(&ctx_[CTX_ABS_MVD_GREATER0]);
  int gt1_x = 0, gt1_y = 0;
  if (gt0_x) gt1_x = cabac_.decode_bin(&ctx_[CTX_ABS_MVD_GREATER1]);
  if (gt0_y) gt1_y = cabac_.decode_bin(&ctx_[CTX_ABS_MVD_GREATER1]);
  i32 vx = 0, vy = 0;
  if (gt0_x) {
    vx = 1;
    if (gt1_x) vx = 2 + (i32)cabac_.decode_EGk_bypass(1);
    if (cabac_.decode_bypass()) vx = -vx;
  }
  if (gt0_y) {
    vy = 1;
    if (gt1_y) vy = 2 + (i32)cabac_.decode_EGk_bypass(1);
    if (cabac_.decode_bypass()) vy = -vy;
  }
  *mvd_x = vx;
  *mvd_y = vy;
}

int SliceParser::decode_cu_qp_delta() {
  int bit = cabac_.decode_bin(&ctx_[CTX_CU_QP_DELTA_ABS + 0]);
  if (!bit) return 0;
  int prefix = 1;
  for (int i = 0; i < 4; i++) {
    if (!cabac_.decode_bin(&ctx_[CTX_CU_QP_DELTA_ABS + 1])) break;
    prefix++;
  }
  int abs_val;
  if (prefix == 5)
    abs_val = 5 + (int)cabac_.decode_EGk_bypass(0);
  else
    abs_val = prefix;
  if (abs_val == 0) return 0;
  int sign = cabac_.decode_bypass();
  return abs_val * (1 - 2 * sign);
}

// --- QP derivation (spec 8.6.1) --------------------------------------------

int SliceParser::derive_qp_pred(int x_qg, int y_qg) {
  int qp_a, qp_b;
  int ctb_mask = ~(sps_->ctb_size - 1);
  // qPY_A from (xQg-1, yQg)
  if (!available_zscan(x_qg, y_qg, x_qg - 1, y_qg) ||
      ((x_qg - 1) & ctb_mask) != (x_qg & ctb_mask)) {
    qp_a = qp_y_pred_;
  } else {
    qp_a = frame_->qp_y[(y_qg >> 2) * frame_->pb_w + ((x_qg - 1) >> 2)];
  }
  // qPY_B from (xQg, yQg-1)
  if (!available_zscan(x_qg, y_qg, x_qg, y_qg - 1) ||
      ((y_qg - 1) & ctb_mask) != (y_qg & ctb_mask)) {
    qp_b = qp_y_pred_;
  } else {
    qp_b = frame_->qp_y[((y_qg - 1) >> 2) * frame_->pb_w + (x_qg >> 2)];
  }
  return (qp_a + qp_b + 1) >> 1;
}

void SliceParser::set_qp_for_cu(int x0, int y0, int log2_size) {
  // Finalize the CU QP (call after any cu_qp_delta for this CU was decoded).
  int qp_off = sps_->qp_bd_offset_luma;
  int qp = ((qp_pred_cached_ + cu_qp_delta_val_ + 52 + 2 * qp_off) % (52 + qp_off)) - qp_off;
  qp_y_ = qp;
  int n4 = 1 << (log2_size - 2);
  int x4 = x0 >> 2, y4 = y0 >> 2;
  for (int y = 0; y < n4; y++)
    for (int x = 0; x < n4; x++) {
      int px = x4 + x, py = y4 + y;
      if (px < frame_->pb_w && py < frame_->pb_h)
        frame_->qp_y[py * frame_->pb_w + px] = (i8)qp;
    }
}

int SliceParser::get_chroma_qp(int qp_y_raw, int cidx) const {
  int off = (cidx == 1)
                ? pps_->cb_qp_offset + sh_->slice_cb_qp_offset + cu_chroma_qp_offset_[0]
                : pps_->cr_qp_offset + sh_->slice_cr_qp_offset + cu_chroma_qp_offset_[1];
  int qpi = clip3(-sps_->qp_bd_offset_chroma, 57, qp_y_raw + off);
  int qpc;
  if (sps_->chroma_array_type == 1) {
    if (qpi < 30) {
      qpc = qpi;
    } else if (qpi > 43) {
      qpc = qpi - 6;
    } else {
      static const int tab[14] = {29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37};
      qpc = tab[qpi - 30];
    }
  } else {
    qpc = min_i(qpi, 51);
  }
  return qpc + sps_->qp_bd_offset_chroma;  // Qp'C
}

// --- SAO (spec 7.3.8.3) ----------------------------------------------------

void SliceParser::decode_sao(int ctb_x, int ctb_y) {
  SaoParams sao;
  bool merge_left = false, merge_up = false;
  int rs = ctb_y * frame_->ctb_w + ctb_x;

  if (ctb_x > 0) {
    bool left_in_slice = rs > sh_->slice_addr_rs;
    bool left_in_tile = pps_->same_tile(rs, rs - 1);
    if (left_in_slice && left_in_tile)
      merge_left = cabac_.decode_bin(&ctx_[CTX_SAO_MERGE_FLAG]);
  }
  if (ctb_y > 0 && !merge_left) {
    bool up_in_slice = (rs - frame_->ctb_w) >= sh_->slice_addr_rs;
    bool up_in_tile = pps_->same_tile(rs, rs - frame_->ctb_w);
    if (up_in_slice && up_in_tile)
      merge_up = cabac_.decode_bin(&ctx_[CTX_SAO_MERGE_FLAG]);
  }

  if (merge_left) {
    frame_->sao[rs] = frame_->sao[rs - 1];
    return;
  }
  if (merge_up) {
    frame_->sao[rs] = frame_->sao[rs - frame_->ctb_w];
    return;
  }

  int n_chan = (sps_->chroma_array_type == 0) ? 1 : 3;
  for (int c = 0; c < n_chan; c++) {
    if (c == 0 && !sh_->sao_luma) continue;
    if (c > 0 && !sh_->sao_chroma) continue;

    if (c <= 1) {
      // sao_type_idx_luma / chroma: bin0 ctx, bin1 bypass
      int t = 0;
      if (cabac_.decode_bin(&ctx_[CTX_SAO_TYPE_IDX])) {
        t = cabac_.decode_bypass() ? 2 : 1;
      }
      sao.type_idx[c] = (u8)t;
      if (c == 1) sao.type_idx[2] = (u8)t;
    }
    int t = sao.type_idx[c];
    if (t == 0) continue;

    int bd = frame_->bit_depth[c];
    int cmax = (1 << (min_i(bd, 10) - 5)) - 1;
    int abs_off[4];
    for (int i = 0; i < 4; i++) abs_off[i] = (int)cabac_.decode_TU_bypass(cmax);

    int sign[4] = {1, 1, -1, -1};
    if (t == 1) {  // band
      for (int i = 0; i < 4; i++)
        sign[i] = (abs_off[i] != 0 && cabac_.decode_bypass()) ? -1 : 1;
      sao.band_pos[c] = (u8)cabac_.decode_bypass_bits(5);
    } else {  // edge
      if (c <= 1) {
        int eo = (int)cabac_.decode_bypass_bits(2);
        sao.eo_class[c] = (u8)eo;
        if (c == 1) sao.eo_class[2] = (u8)eo;
      }
    }
    int scale = (c == 0) ? pps_->log2_sao_offset_scale_luma
                         : pps_->log2_sao_offset_scale_chroma;
    for (int i = 0; i < 4; i++)
      sao.offset[c][i] = (i16)(sign[i] * (abs_off[i] << scale));
  }
  frame_->sao[rs] = sao;
}

// --- intra mode decoding (spec 8.4.2) --------------------------------------

void SliceParser::intra_mode_luma(int x0, int y0, int log2_cb_size, bool nxn) {
  int n_parts = nxn ? 4 : 1;
  int pb_size = 1 << (log2_cb_size - (nxn ? 1 : 0));

  int prev_flag[4];
  for (int i = 0; i < n_parts; i++)
    prev_flag[i] = cabac_.decode_bin(&ctx_[CTX_PREV_INTRA_LUMA_PRED]);

  for (int i = 0; i < n_parts; i++) {
    int xp = x0 + (i & 1) * pb_size;
    int yp = y0 + (i >> 1) * pb_size;

    // candidate modes from neighbors
    int cand_a = 1, cand_b = 1;  // DC default
    if (available_zscan(xp, yp, xp - 1, yp)) {
      int i4 = (yp >> 2) * frame_->pb_w + ((xp - 1) >> 2);
      u8 info = frame_->cu_info[i4];
      if ((info & 1) && !(info & 2))  // intra, not PCM
        cand_a = frame_->intra_pred_mode[i4];
    }
    if (available_zscan(xp, yp, xp, yp - 1) &&
        ((yp - 1) >> sps_->log2_ctb_size) == (yp >> sps_->log2_ctb_size)) {
      int i4 = ((yp - 1) >> 2) * frame_->pb_w + (xp >> 2);
      u8 info = frame_->cu_info[i4];
      if ((info & 1) && !(info & 2)) cand_b = frame_->intra_pred_mode[i4];
    }

    int cand[3];
    if (cand_a == cand_b) {
      if (cand_a < 2) {
        cand[0] = 0;
        cand[1] = 1;
        cand[2] = 26;
      } else {
        cand[0] = cand_a;
        cand[1] = 2 + ((cand_a + 29) % 32);
        cand[2] = 2 + ((cand_a - 2 + 1) % 32);
      }
    } else {
      cand[0] = cand_a;
      cand[1] = cand_b;
      if (cand_a != 0 && cand_b != 0)
        cand[2] = 0;
      else if (cand_a != 1 && cand_b != 1)
        cand[2] = 1;
      else
        cand[2] = 26;
    }

    int mode;
    if (prev_flag[i]) {
      int mpm = (int)cabac_.decode_TU_bypass(2);
      mode = cand[mpm];
    } else {
      // sort candidates ascending
      if (cand[0] > cand[1]) std::swap(cand[0], cand[1]);
      if (cand[0] > cand[2]) std::swap(cand[0], cand[2]);
      if (cand[1] > cand[2]) std::swap(cand[1], cand[2]);
      mode = (int)cabac_.decode_bypass_bits(5);
      for (int k = 0; k < 3; k++)
        if (mode >= cand[k]) mode++;
    }
    intra_mode_y_[i] = (u8)mode;

    // store over PU area
    int n4 = pb_size >> 2;
    for (int y = 0; y < n4; y++)
      for (int x = 0; x < n4; x++) {
        int px = (xp >> 2) + x, py = (yp >> 2) + y;
        if (px < frame_->pb_w && py < frame_->pb_h)
          frame_->intra_pred_mode[py * frame_->pb_w + px] = (u8)mode;
      }
  }
}

int SliceParser::decode_chroma_mode_bins() {
  if (!cabac_.decode_bin(&ctx_[CTX_INTRA_CHROMA_PRED_MODE])) return 4;
  return (int)cabac_.decode_bypass_bits(2);
}

static int map_chroma_mode(int chroma_bin, int luma_mode) {
  // spec Table 8-3 (ChromaArrayType != 3 handled by caller for 4:2:2 remap)
  static const int modes[4] = {0, 26, 10, 1};
  if (chroma_bin == 4) return luma_mode;
  int m = modes[chroma_bin];
  if (m == luma_mode) return 34;
  return m;
}

// --- program emission helpers ----------------------------------------------

void SliceParser::emit_intra(int x0, int y0, int log2_size, int cidx, int mode) {
  IntraRec r;
  r.x = (u16)x0;
  r.y = (u16)y0;
  r.log2_size = (u8)log2_size;
  r.cidx = (u8)cidx;
  r.mode = (u8)mode;
  prog_->intras.push_back(r);
  prog_->ops.push_back({Op::kIntraPred, (u32)(prog_->intras.size() - 1)});
}

// Chroma intra mode / derived-from-luma flag at a luma position inside the
// current CU.  4:4:4 NxN CUs carry one chroma mode per quadrant.
int SliceParser::chroma_mode_at(int x0, int y0) const {
  if (sps_->chroma_array_type != 3 || !intra_split_) return intra_mode_c_;
  int half = 1 << (cu_log2_size_ - 1);
  int q = ((y0 - cu_pred_mode_y0_) >= half ? 2 : 0) +
          ((x0 - cu_pred_mode_x0_) >= half ? 1 : 0);
  return intra_mode_c4_[q];
}

bool SliceParser::chroma_dm_at(int x0, int y0) const {
  if (sps_->chroma_array_type != 3 || !intra_split_) return chroma_dm_[0];
  int half = 1 << (cu_log2_size_ - 1);
  int q = ((y0 - cu_pred_mode_y0_) >= half ? 2 : 0) +
          ((x0 - cu_pred_mode_x0_) >= half ? 1 : 0);
  return chroma_dm_[q];
}

// RExt cross-component prediction syntax (spec 7.3.8.12; reference
// slice.cc:3527-3581): TR-coded log2_res_scale_abs_plus1 (cMax=4, contexts
// 4*c+binIdx) then res_scale_sign_flag.  Returns ResScaleVal.
int SliceParser::read_cross_comp_pred(int c_minus1) {
  int value = 0;
  for (int bin_idx = 0; bin_idx < 4; bin_idx++) {
    if (!cabac_.decode_bin(
            &ctx_[CTX_LOG2_RES_SCALE_ABS + 4 * c_minus1 + bin_idx]))
      break;
    value++;
  }
  if (value == 0) return 0;
  int sign = cabac_.decode_bin(&ctx_[CTX_RES_SCALE_SIGN + c_minus1]);
  int res_scale = 1 << (value - 1);
  return sign ? -res_scale : res_scale;
}

// Chroma TB with cbf==0 but ResScaleVal!=0 still reconstructs a residual
// (the scaled luma residual); emit a coefficient-less TU record (reference
// decode_TU cbf==0 path, slice.cc:3516-3524).
void SliceParser::emit_zero_ccp_tu(int x0, int y0, int log2_size, int cidx,
                                   int scale) {
  TuRec tu;
  tu.x = (u16)(x0 / sps_->sub_width_c);
  tu.y = (u16)(y0 / sps_->sub_height_c);
  tu.qp = (i8)get_chroma_qp(qp_y_, cidx);
  tu.log2_size = (u8)log2_size;
  tu.cidx = (u8)cidx;
  tu.coeff_start = (u32)prog_->coeff_val.size();
  tu.ncoeff = 0;
  tu.cross_comp_scale = (i8)scale;
  u8 flags = 0;
  if (cu_transquant_bypass_) flags |= TuRec::kTransquantBypass;
  if (cu_is_intra_) flags |= TuRec::kIntra;
  tu.flags = flags;
  prog_->tus.push_back(tu);
  prog_->ops.push_back({Op::kAddResidual, (u32)(prog_->tus.size() - 1)});
}

// --- coding quadtree (spec 7.3.8.4) ----------------------------------------

bool SliceParser::coding_quadtree(int x0, int y0, int log2_size, int depth) {
  int split;
  if (x0 + (1 << log2_size) <= sps_->pic_width_in_luma_samples &&
      y0 + (1 << log2_size) <= sps_->pic_height_in_luma_samples &&
      log2_size > sps_->log2_min_cb_size) {
    split = decode_split_cu_flag(x0, y0, depth);
  } else {
    split = (log2_size > sps_->log2_min_cb_size) ? 1 : 0;
  }

  if (pps_->cu_qp_delta_enabled && log2_size >= pps_->log2_min_cu_qp_delta_size) {
    cu_qp_delta_coded_ = false;
    cu_qp_delta_val_ = 0;
    if (!first_qg_)
      qp_y_pred_ = qp_y_;
    first_qg_ = false;
    qg_x_ = x0;
    qg_y_ = y0;
    qp_pred_cached_ = derive_qp_pred(qg_x_, qg_y_);
  }
  if (sh_->cu_chroma_qp_offset_enabled &&
      log2_size >= pps_->log2_min_cu_chroma_qp_offset_size) {
    chroma_qp_offset_coded_ = false;
    cu_chroma_qp_offset_[0] = cu_chroma_qp_offset_[1] = 0;
  }

  if (split) {
    int half = 1 << (log2_size - 1);
    int x1 = x0 + half, y1 = y0 + half;
    if (!coding_quadtree(x0, y0, log2_size - 1, depth + 1)) return false;
    if (x1 < sps_->pic_width_in_luma_samples)
      if (!coding_quadtree(x1, y0, log2_size - 1, depth + 1)) return false;
    if (y1 < sps_->pic_height_in_luma_samples)
      if (!coding_quadtree(x0, y1, log2_size - 1, depth + 1)) return false;
    if (x1 < sps_->pic_width_in_luma_samples && y1 < sps_->pic_height_in_luma_samples)
      if (!coding_quadtree(x1, y1, log2_size - 1, depth + 1)) return false;
    return true;
  }

  // set ct_depth over CU area
  {
    int n4 = 1 << (log2_size - 2);
    for (int y = 0; y < n4; y++)
      for (int x = 0; x < n4; x++) {
        int px = (x0 >> 2) + x, py = (y0 >> 2) + y;
        if (px < frame_->pb_w && py < frame_->pb_h)
          frame_->ct_depth[py * frame_->pb_w + px] = (u8)depth;
      }
  }
  return coding_unit(x0, y0, log2_size);
}

// --- prediction unit (spec 7.3.8.6) ----------------------------------------

bool SliceParser::prediction_unit(int x0, int y0, int w, int h, int ct_depth,
                                  int log2_cb_size, int part_idx, int n_parts) {
  PuMotionSyntax syn;
  syn.merge_flag = cabac_.decode_bin(&ctx_[CTX_MERGE_FLAG]);
  last_pu_was_merge_ = syn.merge_flag;
  if (syn.merge_flag) {
    syn.merge_idx = decode_merge_idx();
  } else {
    syn.inter_pred_idc = (sh_->slice_type == SLICE_B)
                             ? decode_inter_pred_idc(x0, y0, w, h, ct_depth)
                             : 0;
    if (syn.inter_pred_idc != 1) {  // L0 or BI
      syn.ref_idx[0] = decode_ref_idx(sh_->num_ref_idx[0]);
      decode_mvd(&syn.mvd[0][0], &syn.mvd[0][1]);
      syn.mvp_flag[0] = cabac_.decode_bin(&ctx_[CTX_MVP_LX_FLAG]);
    }
    if (syn.inter_pred_idc != 0) {  // L1 or BI
      syn.ref_idx[1] = decode_ref_idx(sh_->num_ref_idx[1]);
      if (sh_->mvd_l1_zero && syn.inter_pred_idc == 2) {
        syn.mvd[1][0] = syn.mvd[1][1] = 0;
      } else {
        decode_mvd(&syn.mvd[1][0], &syn.mvd[1][1]);
      }
      syn.mvp_flag[1] = cabac_.decode_bin(&ctx_[CTX_MVP_LX_FLAG]);
    }
  }

  int x_cu = cu_pred_mode_x0_, y_cu = cu_pred_mode_y0_;
  PbMotion m = derive_pu_motion(*frame_, *sh_, x_cu, y_cu, cu_log2_size_, x0, y0,
                                w, h, part_idx, cu_part_mode_, syn);

  // emit MC op
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
  pu.slice = (u16)sh_->slice_index;
  for (int l = 0; l < 2; l++) {
    pu.ref_dpb[l] = -1;
    if ((m.pred_flags >> l) & 1) {
      Frame* rf = sh_->ref_list[l][m.ref_idx[l]];
      // register reference frame in the program
      int slot = -1;
      for (size_t i = 0; i < prog_->ref_frames.size(); i++)
        if (prog_->ref_frames[i] == rf) slot = (int)i;
      if (slot < 0) {
        prog_->ref_frames.push_back(rf);
        slot = (int)prog_->ref_frames.size() - 1;
      }
      pu.ref_dpb[l] = (i8)slot;
    }
  }
  prog_->pus.push_back(pu);
  prog_->ops.push_back({Op::kInterPred, (u32)(prog_->pus.size() - 1)});
  return true;
}

// --- PCM (spec 7.3.8.7) ----------------------------------------------------

bool SliceParser::pcm_sample(int x0, int y0, int log2_size) {
  // PCM samples are read from the (byte-aligned) bitstream inside CABAC:
  // spec 9.3.1: decoding engine is re-initialized after the samples.
  PcmRec rec;
  rec.x = (u16)x0;
  rec.y = (u16)y0;
  rec.log2_size = (u8)log2_size;
  rec.data_start = (u32)prog_->pcm_data.size();

  int size = 1 << log2_size;
  // The CABAC engine consumed bits; PCM data starts at the next un-consumed
  // byte position per spec (the arithmetic engine's state implies position).
  const u8* p = cabac_.pcm_ptr();
  size_t avail = (size_t)(data_ + size_ - p);
  int bd_y = sps_->pcm_bit_depth_luma;
  int bd_c = sps_->pcm_bit_depth_chroma;
  size_t need_bits = (size_t)size * size * bd_y;
  if (sps_->chroma_array_type != 0) {
    int cw = size / sps_->sub_width_c, ch = size / sps_->sub_height_c;
    need_bits += 2u * cw * ch * bd_c;
  }
  if ((need_bits + 7) / 8 > avail) return false;

  BitReader br(p, avail);
  for (int i = 0; i < size * size; i++)
    prog_->pcm_data.push_back((u16)br.u(bd_y));
  if (sps_->chroma_array_type != 0) {
    int cw = size / sps_->sub_width_c, ch = size / sps_->sub_height_c;
    for (int i = 0; i < 2 * cw * ch; i++)
      prog_->pcm_data.push_back((u16)br.u(bd_c));
  }
  prog_->pcms.push_back(rec);
  prog_->ops.push_back({Op::kPcm, (u32)(prog_->pcms.size() - 1)});

  // restart CABAC after the PCM samples
  const u8* next = p + (need_bits + 7) / 8;
  cabac_.init(next, (size_t)(data_ + size_ - next));
  return true;
}

// --- coding unit (spec 7.3.8.5) --------------------------------------------

bool SliceParser::coding_unit(int x0, int y0, int log2_size) {
  cu_transquant_bypass_ = false;
  cu_pcm_ = false;
  cu_is_intra_ = true;
  cu_part_mode_ = PART_2Nx2N;
  cu_pred_mode_x0_ = x0;
  cu_pred_mode_y0_ = y0;
  cu_log2_size_ = log2_size;
  explicit_rdpcm_flag_ = false;
  last_pu_was_merge_ = false;
  qp_set_for_cu_ = false;

  int depth = frame_->ct_depth[(y0 >> 2) * frame_->pb_w + (x0 >> 2)];

  if (pps_->transquant_bypass_enabled)
    cu_transquant_bypass_ = cabac_.decode_bin(&ctx_[CTX_CU_TRANSQUANT_BYPASS]);

  bool skip = false;
  if (!sh_->is_intra()) skip = decode_cu_skip_flag(x0, y0);

  int n4 = 1 << (log2_size - 2);
  auto set_cu_info = [&](u8 info) {
    for (int y = 0; y < n4; y++)
      for (int x = 0; x < n4; x++) {
        int px = (x0 >> 2) + x, py = (y0 >> 2) + y;
        if (px < frame_->pb_w && py < frame_->pb_h)
          frame_->cu_info[py * frame_->pb_w + px] = info;
      }
  };

  if (skip) {
    cu_is_intra_ = false;
    // skip, inter; bypass still excludes the CU from loop filters (8.7.2)
    set_cu_info((u8)(8 | (cu_transquant_bypass_ ? 4 : 0)));
    PuMotionSyntax syn;
    syn.merge_flag = true;
    syn.merge_idx = decode_merge_idx();

    PbMotion m = derive_pu_motion(*frame_, *sh_, x0, y0, log2_size, x0, y0,
                                  1 << log2_size, 1 << log2_size, 0, PART_2Nx2N,
                                  syn);
    PuRec pu;
    pu.x = (u16)x0;
    pu.y = (u16)y0;
    pu.w = pu.h = (u16)(1 << log2_size);
    pu.mv[0] = m.mv[0];
    pu.mv[1] = m.mv[1];
    pu.ref_idx[0] = m.ref_idx[0];
    pu.ref_idx[1] = m.ref_idx[1];
    pu.pred_flags = m.pred_flags;
    pu.slice = (u16)sh_->slice_index;
    for (int l = 0; l < 2; l++) {
      pu.ref_dpb[l] = -1;
      if ((m.pred_flags >> l) & 1) {
        Frame* rf = sh_->ref_list[l][m.ref_idx[l]];
        int slot = -1;
        for (size_t i = 0; i < prog_->ref_frames.size(); i++)
          if (prog_->ref_frames[i] == rf) slot = (int)i;
        if (slot < 0) {
          prog_->ref_frames.push_back(rf);
          slot = (int)prog_->ref_frames.size() - 1;
        }
        pu.ref_dpb[l] = (i8)slot;
      }
    }
    prog_->pus.push_back(pu);
    prog_->ops.push_back({Op::kInterPred, (u32)(prog_->pus.size() - 1)});

    set_qp_for_cu(x0, y0, log2_size);
    qp_set_for_cu_ = true;
    // mark deblock edges of the CU
    cu_part_mode_ = PART_2Nx2N;
    mark_cu_edges(x0, y0, log2_size);
    return true;
  }

  bool is_intra = true;
  if (!sh_->is_intra())
    is_intra = cabac_.decode_bin(&ctx_[CTX_PRED_MODE_FLAG]) != 0;
  cu_is_intra_ = is_intra;

  int part_mode = PART_2Nx2N;
  if (!is_intra || log2_size == sps_->log2_min_cb_size)
    part_mode = decode_part_mode(is_intra, log2_size);
  cu_part_mode_ = (u8)part_mode;

  u8 info = (u8)((is_intra ? 1 : 0) | (cu_transquant_bypass_ ? 4 : 0));

  bool intra_split = false;
  int max_trafo_depth;

  if (is_intra) {
    if (part_mode == PART_2Nx2N && sps_->pcm_enabled &&
        log2_size >= sps_->log2_min_pcm_cb_size &&
        log2_size <= sps_->log2_max_pcm_cb_size) {
      cu_pcm_ = cabac_.decode_terminate() != 0;
    }
    if (cu_pcm_) {
      set_cu_info((u8)(info | 2));
      set_qp_for_cu(x0, y0, log2_size);
      qp_set_for_cu_ = true;
      // intra mode grid default (DC) already; record edges
      mark_cu_edges(x0, y0, log2_size);
      if (!pcm_sample(x0, y0, log2_size)) return false;
      return true;
    }

    set_cu_info(info);
    intra_split = (part_mode == PART_NxN);
    intra_mode_luma(x0, y0, log2_size, intra_split);
    if (sps_->chroma_array_type == 3) {
      // 4:4:4: one intra_chroma_pred_mode per luma PB (spec 7.3.8.5;
      // reference slice.cc:4514-4536).
      int n_parts = intra_split ? 4 : 1;
      int pb4 = n4 >> (intra_split ? 1 : 0);
      for (int i = 0; i < n_parts; i++) {
        int bin = decode_chroma_mode_bins();
        u8 mc = (u8)map_chroma_mode(bin, intra_mode_y_[i]);
        intra_mode_c4_[i] = mc;
        chroma_dm_[i] = (bin == 4);
        int bx = (x0 >> 2) + (i & 1) * pb4, by = (y0 >> 2) + (i >> 1) * pb4;
        for (int y = 0; y < pb4; y++)
          for (int x = 0; x < pb4; x++) {
            int px = bx + x, py = by + y;
            if (px < frame_->pb_w && py < frame_->pb_h)
              frame_->intra_mode_c[py * frame_->pb_w + px] = mc;
          }
      }
      intra_mode_c_ = intra_mode_c4_[0];
    } else if (sps_->chroma_array_type != 0) {
      int bin = decode_chroma_mode_bins();
      intra_mode_c_ = (u8)map_chroma_mode(bin, intra_mode_y_[0]);
      chroma_dm_[0] = chroma_dm_[1] = chroma_dm_[2] = chroma_dm_[3] =
          (bin == 4);
      if (sps_->chroma_array_type == 2) {
        // spec 8.4.4.2.1 Table 8-3: 4:2:2 chroma mode conversion
        static const u8 kMode422[35] = {
            0,  1,  2,  2,  2,  2,  3,  5,  7,  8,  10, 12, 13, 15, 17, 18,
            19, 20, 21, 22, 23, 23, 24, 24, 25, 25, 26, 27, 27, 28, 28, 29,
            29, 30, 31};
        intra_mode_c_ = kMode422[intra_mode_c_];
      }
      // store chroma mode over CU area
      for (int y = 0; y < n4; y++)
        for (int x = 0; x < n4; x++) {
          int px = (x0 >> 2) + x, py = (y0 >> 2) + y;
          if (px < frame_->pb_w && py < frame_->pb_h)
            frame_->intra_mode_c[py * frame_->pb_w + px] = intra_mode_c_;
        }
    }
    max_trafo_depth = sps_->max_transform_hierarchy_depth_intra + (intra_split ? 1 : 0);
  } else {
    set_cu_info(info);
    int size = 1 << log2_size;
    int h2 = size / 2, q = size / 4;
    switch (part_mode) {
      case PART_2Nx2N:
        if (!prediction_unit(x0, y0, size, size, depth, log2_size, 0, 1)) return false;
        break;
      case PART_2NxN:
        if (!prediction_unit(x0, y0, size, h2, depth, log2_size, 0, 2)) return false;
        if (!prediction_unit(x0, y0 + h2, size, h2, depth, log2_size, 1, 2)) return false;
        break;
      case PART_Nx2N:
        if (!prediction_unit(x0, y0, h2, size, depth, log2_size, 0, 2)) return false;
        if (!prediction_unit(x0 + h2, y0, h2, size, depth, log2_size, 1, 2)) return false;
        break;
      case PART_NxN:
        if (!prediction_unit(x0, y0, h2, h2, depth, log2_size, 0, 4)) return false;
        if (!prediction_unit(x0 + h2, y0, h2, h2, depth, log2_size, 1, 4)) return false;
        if (!prediction_unit(x0, y0 + h2, h2, h2, depth, log2_size, 2, 4)) return false;
        if (!prediction_unit(x0 + h2, y0 + h2, h2, h2, depth, log2_size, 3, 4)) return false;
        break;
      case PART_2NxnU:
        if (!prediction_unit(x0, y0, size, q, depth, log2_size, 0, 2)) return false;
        if (!prediction_unit(x0, y0 + q, size, size - q, depth, log2_size, 1, 2)) return false;
        break;
      case PART_2NxnD:
        if (!prediction_unit(x0, y0, size, size - q, depth, log2_size, 0, 2)) return false;
        if (!prediction_unit(x0, y0 + size - q, size, q, depth, log2_size, 1, 2)) return false;
        break;
      case PART_nLx2N:
        if (!prediction_unit(x0, y0, q, size, depth, log2_size, 0, 2)) return false;
        if (!prediction_unit(x0 + q, y0, size - q, size, depth, log2_size, 1, 2)) return false;
        break;
      case PART_nRx2N:
        if (!prediction_unit(x0, y0, size - q, size, depth, log2_size, 0, 2)) return false;
        if (!prediction_unit(x0 + size - q, y0, q, size, depth, log2_size, 1, 2)) return false;
        break;
    }
    max_trafo_depth = sps_->max_transform_hierarchy_depth_inter;
  }

  // rqt_root_cbf
  bool rqt_root_cbf = true;
  if (!is_intra && !(part_mode == PART_2Nx2N && last_pu_was_merge_)) {
    rqt_root_cbf = cabac_.decode_bin(&ctx_[CTX_RQT_ROOT_CBF]) != 0;
  }

  mark_cu_edges(x0, y0, log2_size);

  if (rqt_root_cbf) {
    max_trafo_depth_ = max_trafo_depth;
    intra_split_ = intra_split;
    bool cbf_cb[2] = {true, true}, cbf_cr[2] = {true, true};
    if (!transform_tree(x0, y0, x0, y0, log2_size, 0, 0, log2_size, cbf_cb, cbf_cr))
      return false;
  }
  if (!qp_set_for_cu_) set_qp_for_cu(x0, y0, log2_size);
  return true;
}

// --- transform tree (spec 7.3.8.8) -----------------------------------------

bool SliceParser::transform_tree(int x0, int y0, int x_base, int y_base,
                                 int log2_size, int depth, int blk_idx,
                                 int log2_cb_size, bool parent_cbf_cb[2],
                                 bool parent_cbf_cr[2]) {
  bool split;
  bool inter_split = sps_->max_transform_hierarchy_depth_inter == 0 &&
                     !cu_is_intra_ && cu_part_mode_ != PART_2Nx2N && depth == 0;

  if (log2_size <= sps_->log2_max_tb_size && log2_size > sps_->log2_min_tb_size &&
      depth < max_trafo_depth_ && !(intra_split_ && depth == 0)) {
    split = cabac_.decode_bin(&ctx_[CTX_SPLIT_TRANSFORM_FLAG + 5 - log2_size]) != 0;
  } else {
    split = (log2_size > sps_->log2_max_tb_size) ||
            (intra_split_ && depth == 0) || inter_split;
  }

  bool cbf_cb[2] = {parent_cbf_cb[0], parent_cbf_cb[1]};
  bool cbf_cr[2] = {parent_cbf_cr[0], parent_cbf_cr[1]};

  // chroma cbf coding conditions mirror the spec (7.3.8.8): present when
  // chroma exists and the luma TB is > 4x4 (or always for 4:4:4), gated on
  // any parent chroma cbf; the 4:2:2 second TB flag is only coded at the
  // bottom of the split (or unsplit) level
  bool two_chroma = (sps_->chroma_array_type == 2);
  if ((log2_size > 2 && sps_->chroma_array_type != 0) ||
      sps_->chroma_array_type == 3) {
    if (depth == 0 || parent_cbf_cb[0] || parent_cbf_cb[1]) {
      cbf_cb[0] = cabac_.decode_bin(&ctx_[CTX_CBF_CHROMA + depth]) != 0;
      cbf_cb[1] = false;
      if (two_chroma && (!split || log2_size == 3))
        cbf_cb[1] = cabac_.decode_bin(&ctx_[CTX_CBF_CHROMA + depth]) != 0;
    }
    if (depth == 0 || parent_cbf_cr[0] || parent_cbf_cr[1]) {
      cbf_cr[0] = cabac_.decode_bin(&ctx_[CTX_CBF_CHROMA + depth]) != 0;
      cbf_cr[1] = false;
      if (two_chroma && (!split || log2_size == 3))
        cbf_cr[1] = cabac_.decode_bin(&ctx_[CTX_CBF_CHROMA + depth]) != 0;
    }
  } else if (depth == 0) {
    // inherit: at depth 0 with 4x4 luma there is no chroma cbf -> defaults
    cbf_cb[0] = cbf_cb[1] = false;
    cbf_cr[0] = cbf_cr[1] = false;
  }

  if (split) {
    int half = 1 << (log2_size - 1);
    if (!transform_tree(x0, y0, x0, y0, log2_size - 1, depth + 1, 0,
                        log2_cb_size, cbf_cb, cbf_cr))
      return false;
    if (!transform_tree(x0 + half, y0, x0, y0, log2_size - 1, depth + 1, 1,
                        log2_cb_size, cbf_cb, cbf_cr))
      return false;
    if (!transform_tree(x0, y0 + half, x0, y0, log2_size - 1, depth + 1, 2,
                        log2_cb_size, cbf_cb, cbf_cr))
      return false;
    if (!transform_tree(x0 + half, y0 + half, x0, y0, log2_size - 1, depth + 1,
                        3, log2_cb_size, cbf_cb, cbf_cr))
      return false;
    return true;
  }

  bool cbf_luma = true;
  if (cu_is_intra_ || depth != 0 || cbf_cb[0] || cbf_cb[1] || cbf_cr[0] ||
      cbf_cr[1]) {
    cbf_luma = cabac_.decode_bin(&ctx_[CTX_CBF_LUMA + (depth == 0 ? 1 : 0)]) != 0;
  }

  // mark TU edges for deblocking
  mark_tu_edges(x0, y0, log2_size);

  return transform_unit(x0, y0, x_base, y_base, log2_size, depth, blk_idx,
                        cbf_luma, cbf_cb, cbf_cr);
}

// --- transform unit (spec 7.3.8.10) ----------------------------------------

bool SliceParser::transform_unit(int x0, int y0, int x_base, int y_base,
                                 int log2_size, int depth, int blk_idx,
                                 bool cbf_luma, bool cbf_cb[2], bool cbf_cr[2]) {
  bool cbf_chroma = cbf_cb[0] || cbf_cb[1] || cbf_cr[0] || cbf_cr[1];

  int log2_size_c = (sps_->chroma_array_type == 3) ? log2_size : log2_size - 1;
  log2_size_c = max_i(2, log2_size_c);

  if (cbf_luma || cbf_chroma) {
    if (pps_->cu_qp_delta_enabled && !cu_qp_delta_coded_) {
      cu_qp_delta_val_ = decode_cu_qp_delta();
      cu_qp_delta_coded_ = true;
      // spec 7.4.9.10: CuQpDeltaVal in [-(26+QpBdOffsetY/2), 25+QpBdOffsetY/2]
      int lim = 26 + sps_->qp_bd_offset_luma / 2;
      if (cu_qp_delta_val_ < -lim || cu_qp_delta_val_ > lim)
        return false;
    }
    if (sh_->cu_chroma_qp_offset_enabled && cbf_chroma &&
        !cu_transquant_bypass_ && !chroma_qp_offset_coded_) {
      int flag = cabac_.decode_bin(&ctx_[CTX_CU_CHROMA_QP_OFFSET_FLAG]);
      int idx = 0;
      if (flag && pps_->chroma_qp_offset_list_len > 1)
        idx = cabac_.decode_bin(&ctx_[CTX_CU_CHROMA_QP_OFFSET_IDX]);
      chroma_qp_offset_coded_ = true;
      if (flag) {
        cu_chroma_qp_offset_[0] = pps_->cb_qp_offset_list[idx];
        cu_chroma_qp_offset_[1] = pps_->cr_qp_offset_list[idx];
      }
    }
  }

  // Finalize the CU QP once the first coded TU's cu_qp_delta is known.
  if ((cbf_luma || cbf_chroma) && !qp_set_for_cu_) {
    set_qp_for_cu(cu_pred_mode_x0_, cu_pred_mode_y0_, cu_log2_size_);
    qp_set_for_cu_ = true;
  }

  // Reconstruction order per reference decode_TU (slice.cc:3460): intra
  // prediction of a channel block precedes its residual add; luma first,
  // then Cb, then Cr.

  // ---- luma ----
  if (cu_is_intra_) {
    emit_intra(x0, y0, log2_size, 0,
               frame_->intra_pred_mode[(y0 >> 2) * frame_->pb_w + (x0 >> 2)]);
  }
  if (cbf_luma) {
    if (!residual_coding(x0, y0, log2_size, 0)) return false;
  }

  // ---- chroma ----
  if (sps_->chroma_array_type == 0) return true;

  int sw = sps_->sub_width_c, shc = sps_->sub_height_c;
  const bool c422 = sps_->chroma_array_type == 2;
  if (log2_size > 2 || sps_->chroma_array_type == 3) {
    int y_off = 1 << log2_size_c;  // 4:2:2 second TB (chroma rows)

    // RExt cross-component prediction (reference slice.cc:3719-3724): one
    // res_scale per chroma component, read before its residual, when the
    // luma TB is coded and chroma predicts from luma (inter or DM mode).
    const bool do_ccp = pps_->cross_component_prediction_enabled && cbf_luma &&
                        (!cu_is_intra_ || chroma_dm_at(x0, y0));

    if (cu_is_intra_)
      emit_intra(x0 / sw, y0 / shc, log2_size_c, 1, chroma_mode_at(x0, y0));
    cur_res_scale_ = do_ccp ? read_cross_comp_pred(0) : 0;
    if (cbf_cb[0]) {
      if (!residual_coding(x0, y0, log2_size_c, 1)) return false;
    } else if (cur_res_scale_ != 0) {
      emit_zero_ccp_tu(x0, y0, log2_size_c, 1, cur_res_scale_);
    }
    cur_res_scale_ = 0;
    if (c422) {
      if (cu_is_intra_)
        emit_intra(x0 / sw, y0 / shc + y_off, log2_size_c, 1,
                   chroma_mode_at(x0, y0));
      if (cbf_cb[1]) {
        if (!residual_coding(x0, y0 + y_off * shc, log2_size_c, 1)) return false;
      }
    }
    if (cu_is_intra_)
      emit_intra(x0 / sw, y0 / shc, log2_size_c, 2, chroma_mode_at(x0, y0));
    cur_res_scale_ = do_ccp ? read_cross_comp_pred(1) : 0;
    if (cbf_cr[0]) {
      if (!residual_coding(x0, y0, log2_size_c, 2)) return false;
    } else if (cur_res_scale_ != 0) {
      emit_zero_ccp_tu(x0, y0, log2_size_c, 2, cur_res_scale_);
    }
    cur_res_scale_ = 0;
    if (c422) {
      if (cu_is_intra_)
        emit_intra(x0 / sw, y0 / shc + y_off, log2_size_c, 2,
                   chroma_mode_at(x0, y0));
      if (cbf_cr[1]) {
        if (!residual_coding(x0, y0 + y_off * shc, log2_size_c, 2)) return false;
      }
    }
  } else if (blk_idx == 3) {
    int y_off = 1 << log2_size;
    if (cu_is_intra_) emit_intra(x_base / sw, y_base / shc, log2_size, 1, intra_mode_c_);
    if (cbf_cb[0]) {
      if (!residual_coding(x_base, y_base, log2_size, 1)) return false;
    }
    if (c422) {
      if (cu_is_intra_)
        emit_intra(x_base / sw, y_base / shc + y_off, log2_size, 1, intra_mode_c_);
      if (cbf_cb[1]) {
        if (!residual_coding(x_base, y_base + y_off * shc, log2_size, 1)) return false;
      }
    }
    if (cu_is_intra_) emit_intra(x_base / sw, y_base / shc, log2_size, 2, intra_mode_c_);
    if (cbf_cr[0]) {
      if (!residual_coding(x_base, y_base, log2_size, 2)) return false;
    }
    if (c422) {
      if (cu_is_intra_)
        emit_intra(x_base / sw, y_base / shc + y_off, log2_size, 2, intra_mode_c_);
      if (cbf_cr[1]) {
        if (!residual_coding(x_base, y_base + y_off * shc, log2_size, 2)) return false;
      }
    }
  }
  return true;
}

// --- deblocking edge marking -----------------------------------------------

void SliceParser::mark_cu_edges(int x0, int y0, int log2_size) {
  int n4 = 1 << (log2_size - 2);
  int x4 = x0 >> 2, y4 = y0 >> 2;
  // CU boundary: both a PU edge and (for bS purposes) a TU edge
  for (int i = 0; i < n4; i++) {
    int py = y4 + i, px = x4 + i;
    if (py < frame_->pb_h && x4 < frame_->pb_w)
      frame_->deblock_flags[py * frame_->pb_w + x4] |= 1 | 4;
    if (px < frame_->pb_w && y4 < frame_->pb_h)
      frame_->deblock_flags[y4 * frame_->pb_w + px] |= 2 | 8;
  }
  // PU internal edges (PU bits only)
  int size = 1 << log2_size;
  auto vline = [&](int x) {
    int xx4 = (x0 + x) >> 2;
    if (xx4 >= frame_->pb_w) return;
    for (int i = 0; i < n4 && y4 + i < frame_->pb_h; i++)
      frame_->deblock_flags[(y4 + i) * frame_->pb_w + xx4] |= 4;
  };
  auto hline = [&](int y) {
    int yy4 = (y0 + y) >> 2;
    if (yy4 >= frame_->pb_h) return;
    for (int i = 0; i < n4 && x4 + i < frame_->pb_w; i++)
      frame_->deblock_flags[yy4 * frame_->pb_w + (x4 + i)] |= 8;
  };
  if (!cu_is_intra_) {
    switch (cu_part_mode_) {
      case PART_2NxN: hline(size / 2); break;
      case PART_Nx2N: vline(size / 2); break;
      case PART_NxN: hline(size / 2); vline(size / 2); break;
      case PART_2NxnU: hline(size / 4); break;
      case PART_2NxnD: hline(size - size / 4); break;
      case PART_nLx2N: vline(size / 4); break;
      case PART_nRx2N: vline(size - size / 4); break;
      default: break;
    }
  }
}

void SliceParser::mark_tu_edges(int x0, int y0, int log2_size) {
  int n4 = 1 << (log2_size - 2);
  int x4 = x0 >> 2, y4 = y0 >> 2;
  for (int i = 0; i < n4; i++) {
    int py = y4 + i, px = x4 + i;
    if (py < frame_->pb_h && x4 < frame_->pb_w)
      frame_->deblock_flags[py * frame_->pb_w + x4] |= 1;
    if (px < frame_->pb_w && y4 < frame_->pb_h)
      frame_->deblock_flags[y4 * frame_->pb_w + px] |= 2;
  }
}

// --- CTB / slice-data loop (spec 7.3.8.1, 9.3.1) ---------------------------

bool SliceParser::decode_ctb(int ctb_x, int ctb_y) {
  ctb_x_ = ctb_x;
  ctb_y_ = ctb_y;
  int rs = ctb_y * frame_->ctb_w + ctb_x;
  frame_->slice_addr_rs[rs] = sh_->slice_addr_rs;
  frame_->slice_idx[rs] = (u16)sh_->slice_index;

  if (sh_->sao_luma || sh_->sao_chroma) decode_sao(ctb_x, ctb_y);

  return coding_quadtree(ctb_x << sps_->log2_ctb_size,
                         ctb_y << sps_->log2_ctb_size, sps_->log2_ctb_size, 0);
}

// Wavefront progress lattice for the parallel WPP parse: per-row completed
// CTB counters (release/acquire ordered so a row's metadata-grid writes are
// visible to the row below before its gate opens) plus the per-row CABAC
// snapshots taken after CTB 1.  The analogue of the reference's per-CTB
// de265_progress_lock (threads.h:49-68) without mutexes: parse rows are
// milliseconds long, so waiters spin-yield.
struct SliceParser::WppSync {
  explicit WppSync(int rows)
      : progress(new std::atomic<int>[rows]), state(rows) {
    for (int r = 0; r < rows; r++) progress[r].store(0);
  }
  void post(int row, int n) {
    progress[row].store(n, std::memory_order_release);
  }
  void wait(int row, int n) {
    while (progress[row].load(std::memory_order_acquire) < n)
      std::this_thread::yield();
  }
  std::unique_ptr<std::atomic<int>[]> progress;
  std::vector<ParseState> state;  // [row]: ctx after CTB 1 of that row
  std::atomic<bool> fail{false};
};

void SliceParser::merge_fragment(FrameProgram& f) {
  const u32 tu0 = (u32)prog_->tus.size();
  const u32 pu0 = (u32)prog_->pus.size();
  const u32 in0 = (u32)prog_->intras.size();
  const u32 pc0 = (u32)prog_->pcms.size();
  const u32 co0 = (u32)prog_->coeff_val.size();
  const u32 pd0 = (u32)prog_->pcm_data.size();
  for (auto& t : f.tus) t.coeff_start += co0;
  for (auto& pcm : f.pcms) pcm.data_start += pd0;
  // remap fragment-local DPB slots into the merged reference list
  std::vector<i8> remap(f.ref_frames.size());
  for (size_t r = 0; r < f.ref_frames.size(); r++) {
    int slot = -1;
    for (size_t j = 0; j < prog_->ref_frames.size(); j++)
      if (prog_->ref_frames[j] == f.ref_frames[r]) slot = (int)j;
    if (slot < 0) {
      prog_->ref_frames.push_back(f.ref_frames[r]);
      slot = (int)prog_->ref_frames.size() - 1;
    }
    remap[r] = (i8)slot;
  }
  for (auto& pu : f.pus)
    for (int l = 0; l < 2; l++)
      if (pu.ref_dpb[l] >= 0) pu.ref_dpb[l] = remap[pu.ref_dpb[l]];
  for (auto op : f.ops) {
    switch (op.kind) {
      case Op::kAddResidual: op.idx += tu0; break;
      case Op::kInterPred: op.idx += pu0; break;
      case Op::kIntraPred: op.idx += in0; break;
      case Op::kPcm: op.idx += pc0; break;
    }
    prog_->ops.push_back(op);
  }
  prog_->tus.insert(prog_->tus.end(), f.tus.begin(), f.tus.end());
  prog_->pus.insert(prog_->pus.end(), f.pus.begin(), f.pus.end());
  prog_->intras.insert(prog_->intras.end(), f.intras.begin(), f.intras.end());
  prog_->pcms.insert(prog_->pcms.end(), f.pcms.begin(), f.pcms.end());
  prog_->coeff_val.insert(prog_->coeff_val.end(), f.coeff_val.begin(),
                          f.coeff_val.end());
  prog_->coeff_pos.insert(prog_->coeff_pos.end(), f.coeff_pos.begin(),
                          f.coeff_pos.end());
  prog_->pcm_data.insert(prog_->pcm_data.end(), f.pcm_data.begin(),
                         f.pcm_data.end());
}

Err SliceParser::decode_wpp_row(const u8* data, size_t wstart, size_t wend,
                                int row, WppSync* sync) {
  data_ = data;
  size_ = wend;
  if (wstart > wend) {
    sync->post(row, frame_->ctb_w);
    return Err::InvalidSyntax;
  }
  cabac_.init(data + wstart, wend - wstart);
  const int w = frame_->ctb_w;
  const bool last_row = row == frame_->ctb_h - 1;

  // CABAC inheritance from CTB 1 of the row above (9.3.1); the single-slice
  // gate means the above-right CTB is always same-slice when it exists
  if (row > 0 && w >= 2) {
    sync->wait(row - 1, 2);
    ctx_ = sync->state[row - 1].ctx;
    memcpy(stat_coeff_, sync->state[row - 1].stat_coeff, 4);
  } else {
    ctx_.init(sh_->init_type, sh_->slice_qp_y);
    memset(stat_coeff_, 0, 4);
  }
  qp_y_pred_ = sh_->slice_qp_y;
  qp_y_ = sh_->slice_qp_y;
  qp_pred_cached_ = sh_->slice_qp_y;
  first_qg_ = true;

  Err err = Err::OK;
  for (int x = 0; x < w; x++) {
    // spec availability: (x, row) may consult up to (x+1, row-1)
    if (row > 0) sync->wait(row - 1, min_i(x + 2, w));
    if (sync->fail.load(std::memory_order_relaxed)) {
      err = Err::InvalidSyntax;  // sibling row failed: abandon quietly
      break;
    }
    if (!decode_ctb(x, row)) {
      err = Err::InvalidSyntax;
      break;
    }
    if (x == 1) {
      sync->state[row].ctx = ctx_;
      memcpy(sync->state[row].stat_coeff, stat_coeff_, 4);
    }
    int end_flag = cabac_.decode_terminate();
    // single-slice gate: end_of_slice_segment_flag is 1 exactly at the
    // picture's last CTB
    if (end_flag != (last_row && x == w - 1 ? 1 : 0)) {
      err = Err::InvalidSyntax;
      break;
    }
    sync->post(row, x + 1);
  }
  sync->post(row, w);  // unconditional: never leave a waiter hanging
  if (err == Err::OK && !last_row)
    cabac_.decode_terminate();  // end_of_subset_one_bit
  return err;
}

Err SliceParser::decode(const u8* data, size_t size) {
  data_ = data;
  size_ = size;

  // substream windows from entry points (already de-stuffed, cumulative)
  std::vector<std::pair<size_t, size_t>> windows;
  {
    size_t prev = 0;
    for (int i = 0; i < sh_->num_entry_points; i++) {
      size_t e = sh_->entry_points[i];
      if (e > size) return Err::InvalidSyntax;
      windows.push_back({prev, e});
      prev = e;
    }
    windows.push_back({prev, size});
  }

  int ctb_ts = pps_->ctb_rs_to_ts[sh_->slice_segment_address];
  int pic_w_ctbs = frame_->ctb_w;

  // --- parallel tile parse (counterpart of the reference's per-tile
  // worker threads, decctx.cc:963-1061): tiles share no CABAC state and
  // availability is cut at tile borders, so each substream parses on its
  // own thread into a program fragment, merged in tile-scan order ---
  const int n_tiles = pps_->num_tile_columns * pps_->num_tile_rows;
  if (pps_->tiles_enabled && !pps_->entropy_coding_sync_enabled &&
      dec_->requested_threads() >= 2 && !sh_->dependent_slice &&
      sh_->slice_segment_address == 0 && (int)windows.size() == n_tiles &&
      n_tiles > 1) {
    // first ts of each tile (tile-scan orders tiles consecutively)
    std::vector<int> tile_start(n_tiles, -1);
    for (int ts = 0; ts < sps_->pic_size_in_ctbs; ts++) {
      int id = pps_->tile_id_ts[ts];
      if (id >= 0 && id < n_tiles && tile_start[id] < 0) tile_start[id] = ts;
    }
    bool ok_geom = true;
    for (int i = 0; i < n_tiles; i++) ok_geom &= tile_start[i] >= 0;
    if (ok_geom) {
      std::vector<FrameProgram> frags(n_tiles);
      std::vector<std::unique_ptr<SliceParser>> workers;
      std::vector<Err> errs(n_tiles, Err::OK);
      for (int i = 0; i < n_tiles; i++) {
        frags[i].frame = frame_;
        workers.push_back(
            std::make_unique<SliceParser>(dec_, &frags[i], frame_, sh_));
      }
      std::vector<std::thread> threads;
      for (int i = 0; i < n_tiles; i++) {
        threads.emplace_back([&, i] {
          errs[i] = workers[i]->decode_tile_substream(
              data, windows[i].first, windows[i].second, tile_start[i]);
        });
      }
      for (auto& t : threads) t.join();
      bool any_err = false;
      for (int i = 0; i < n_tiles; i++) any_err |= errs[i] != Err::OK;
      if (!any_err) {
        for (int i = 0; i < n_tiles; i++) merge_fragment(frags[i]);
        // following-dependent-segment state: as the sequential path would
        // leave it (last tile's contexts)
        dec_->dependent_slice_state.ctx = workers.back()->ctx_;
        memcpy(dec_->dependent_slice_state.stat_coeff,
               workers.back()->stat_coeff_, 4);
        dec_->dependent_slice_state.valid = true;
        return Err::OK;
      }
      // A failed parallel attempt is not a verdict: the entry-point count
      // matching the tile count does not prove the slice covers every tile
      // to its end (end_of_slice_segment_flag may legally fire mid-tile).
      // Only the sequential loop below can distinguish that from genuine
      // corruption — wipe the partial metadata (deblock_flags is |=-
      // accumulated) and re-parse sequentially.
      frame_->reset_parse_metadata();
    }
  }

  // --- wavefront-parallel WPP parse (counterpart of the reference's
  // decode_slice_unit_WPP + thread_task_ctb_row, decctx.cc:840-961 /
  // slice.cc:4732-4826): row N trails row N-1 by two CTBs, inheriting the
  // CABAC context saved after CTB 1 of the row above.  Gated to the common
  // case — one independent slice segment covering the picture, no tiles;
  // anything else falls through to the sequential loop below. ---
  if (pps_->entropy_coding_sync_enabled && !pps_->tiles_enabled &&
      dec_->requested_threads() >= 2 && !sh_->dependent_slice &&
      sh_->slice_segment_address == 0 &&
      (int)windows.size() == frame_->ctb_h && frame_->ctb_h > 1) {
    const int rows = frame_->ctb_h;
    WppSync sync(rows);
    std::vector<FrameProgram> frags(rows);
    std::vector<std::unique_ptr<SliceParser>> workers;
    std::vector<Err> errs(rows, Err::OK);
    for (int r = 0; r < rows; r++) {
      frags[r].frame = frame_;
      workers.push_back(
          std::make_unique<SliceParser>(dec_, &frags[r], frame_, sh_));
    }
    // rows are claimed in strictly increasing order, so the oldest
    // in-flight row can always make progress: no deadlock with any pool
    // size (see the wait gates in decode_wpp_row)
    std::atomic<int> next_row{0};
    const int n_threads =
        std::min(dec_->requested_threads(), std::min(rows, 16));
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) {
      pool.emplace_back([&] {
        for (;;) {
          int r = next_row.fetch_add(1, std::memory_order_relaxed);
          if (r >= rows) return;
          errs[r] = workers[r]->decode_wpp_row(
              data, windows[r].first, windows[r].second, r, &sync);
          if (errs[r] != Err::OK)
            sync.fail.store(true, std::memory_order_relaxed);
        }
      });
    }
    for (auto& t : pool) t.join();
    bool any_err = false;
    for (int r = 0; r < rows; r++) any_err |= errs[r] != Err::OK;
    if (!any_err) {
      for (int r = 0; r < rows; r++) merge_fragment(frags[r]);
      dec_->dependent_slice_state.ctx = workers.back()->ctx_;
      memcpy(dec_->dependent_slice_state.stat_coeff,
             workers.back()->stat_coeff_, 4);
      dec_->dependent_slice_state.valid = true;
      return Err::OK;
    }
    // windows.size() == ctb_h also holds for a conformant multi-slice
    // picture whose first slice touches every CTB row but ends mid-row —
    // decode_wpp_row's single-slice end-flag gate then fires on a legal
    // stream.  The slice header cannot distinguish the two cases, so any
    // row failure falls back to the sequential substream loop, which is
    // the authority on genuine syntax errors.  Partial metadata from the
    // abandoned attempt must be wiped first (|=-accumulated edge flags).
    frame_->reset_parse_metadata();
  }

  qp_y_pred_ = sh_->slice_qp_y;
  qp_y_ = sh_->slice_qp_y;
  // without cu_qp_delta there is no QG derivation: QpY == SliceQpY
  qp_pred_cached_ = sh_->slice_qp_y;
  first_qg_ = true;

  size_t substream = 0;
  bool end_of_segment = false;

  while (!end_of_segment) {
    if (substream >= windows.size()) return Err::InvalidSyntax;
    auto [wstart, wend] = windows[substream];
    cabac_.init(data + wstart, wend - wstart);

    int rs = pps_->ctb_ts_to_rs[ctb_ts];
    int cx = rs % pic_w_ctbs, cy = rs / pic_w_ctbs;

    if (substream == 0) {
      if (sh_->dependent_slice && dec_->dependent_slice_state.valid) {
        ctx_ = dec_->dependent_slice_state.ctx;
        memcpy(stat_coeff_, dec_->dependent_slice_state.stat_coeff, 4);
      } else {
        ctx_.init(sh_->init_type, sh_->slice_qp_y);
        memset(stat_coeff_, 0, 4);
      }
    } else if (pps_->entropy_coding_sync_enabled && cx == 0) {
      // WPP row start: inherit from CTB 1 of the row above if available
      bool above_right_avail =
          cy > 0 && wpp_saved_.valid &&
          frame_->slice_addr_rs[(cy - 1) * pic_w_ctbs + min_i(1, pic_w_ctbs - 1)] >= 0;
      // also same slice & tile as per spec availability
      if (above_right_avail) {
        int above_rs = (cy - 1) * pic_w_ctbs + min_i(1, pic_w_ctbs - 1);
        above_right_avail =
            frame_->slice_addr_rs[above_rs] == sh_->slice_addr_rs &&
            pps_->same_tile(rs, above_rs);
      }
      if (above_right_avail) {
        ctx_ = wpp_saved_.ctx;
        memcpy(stat_coeff_, wpp_saved_.stat_coeff, 4);
      } else {
        ctx_.init(sh_->init_type, sh_->slice_qp_y);
        memset(stat_coeff_, 0, 4);
      }
      qp_y_pred_ = sh_->slice_qp_y;
      qp_y_ = sh_->slice_qp_y;
      qp_pred_cached_ = sh_->slice_qp_y;
      first_qg_ = true;
    } else {
      // tile start
      ctx_.init(sh_->init_type, sh_->slice_qp_y);
      memset(stat_coeff_, 0, 4);
      qp_y_pred_ = sh_->slice_qp_y;
      qp_y_ = sh_->slice_qp_y;
      qp_pred_cached_ = sh_->slice_qp_y;
      first_qg_ = true;
    }

    // decode CTBs within this substream
    while (true) {
      rs = pps_->ctb_ts_to_rs[ctb_ts];
      cx = rs % pic_w_ctbs;
      cy = rs / pic_w_ctbs;
      if (cy >= frame_->ctb_h) return Err::InvalidSyntax;

      if (!decode_ctb(cx, cy)) return Err::InvalidSyntax;

      if (pps_->entropy_coding_sync_enabled && cx == 1) {
        wpp_saved_.ctx = ctx_;
        memcpy(wpp_saved_.stat_coeff, stat_coeff_, 4);
        wpp_saved_.valid = true;
      }

      int end_flag = cabac_.decode_terminate();
      ctb_ts++;

      if (end_flag) {
        end_of_segment = true;
        break;
      }
      if (ctb_ts >= sps_->pic_size_in_ctbs) return Err::InvalidSyntax;

      // substream boundary?
      int next_rs = pps_->ctb_ts_to_rs[ctb_ts];
      int next_cx = next_rs % pic_w_ctbs;
      bool new_row = pps_->entropy_coding_sync_enabled && next_cx == 0;
      bool new_tile = pps_->tiles_enabled && !pps_->same_tile(rs, next_rs);
      if (new_row || new_tile) {
        cabac_.decode_terminate();  // end_of_subset_one_bit
        substream++;
        break;
      }
    }
  }

  // save state for following dependent slice segments
  dec_->dependent_slice_state.ctx = ctx_;
  memcpy(dec_->dependent_slice_state.stat_coeff, stat_coeff_, 4);
  dec_->dependent_slice_state.valid = true;
  return Err::OK;
}

Err SliceParser::decode_tile_substream(const u8* data, size_t wstart,
                                       size_t wend, int start_ts) {
  data_ = data;
  size_ = wend;
  cabac_.init(data + wstart, wend - wstart);
  ctx_.init(sh_->init_type, sh_->slice_qp_y);
  memset(stat_coeff_, 0, 4);
  qp_y_pred_ = sh_->slice_qp_y;
  qp_y_ = sh_->slice_qp_y;
  qp_pred_cached_ = sh_->slice_qp_y;
  first_qg_ = true;

  int ctb_ts = start_ts;
  const int pic_w = frame_->ctb_w;
  while (true) {
    int rs = pps_->ctb_ts_to_rs[ctb_ts];
    int cx = rs % pic_w, cy = rs / pic_w;
    if (cy >= frame_->ctb_h) return Err::InvalidSyntax;
    if (!decode_ctb(cx, cy)) return Err::InvalidSyntax;
    int end_flag = cabac_.decode_terminate();
    ctb_ts++;
    if (end_flag) return Err::OK;  // end of slice segment (last tile)
    if (ctb_ts >= sps_->pic_size_in_ctbs) return Err::InvalidSyntax;
    int next_rs = pps_->ctb_ts_to_rs[ctb_ts];
    if (!pps_->same_tile(rs, next_rs)) {
      cabac_.decode_terminate();  // end_of_subset_one_bit
      return Err::OK;             // tile boundary: this worker is done
    }
  }
}

}  // namespace tde265
