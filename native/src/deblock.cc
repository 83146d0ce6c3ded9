// Deblocking filter (spec 8.7.2): boundary-strength derivation on the 8x8
// edge grid and luma/chroma edge filtering, vertical pass then horizontal.
// Behavior counterpart of /root/reference/libde265/deblock.cc.
#include <cstring>

#include "tde265/decoder.h"

namespace tde265 {

// spec Table 8-12
static const u8 kBetaTable[52] = {
    0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  6,  7,
    8,  9,  10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32,
    34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64};
static const u8 kTcTable[54] = {
    0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,
    1,  1,  1,  1,  1,  1,  1,  1,  1,  2,  2,  2,  2,  3,  3,  3,  3,  4,
    4,  4,  5,  5,  6,  6,  7,  8,  9,  10, 11, 13, 14, 16, 18, 20, 22, 24};

namespace {

struct DeblockCtx {
  Frame* f;
  const FrameProgram* prog;
  int log2ctb;
  int ctb_w;
  // fast path: one slice, no tiles, no PCM/bypass CUs -> per-edge slice/
  // tile/sample checks collapse to constants
  bool simple = false;
  const SliceHeader* sh0 = nullptr;

  const SliceHeader* slice_at(int x, int y) const {
    if (simple) return sh0;
    int rs = (y >> log2ctb) * ctb_w + (x >> log2ctb);
    u16 idx = f->slice_idx[rs];
    if (idx >= prog->slices.size()) return nullptr;
    return prog->slices[idx].get();
  }

  // filterEdgeFlag for an edge between P (x-1 or y-1) and Q (x,y).
  bool edge_allowed(int xq, int yq, bool vertical) const {
    int xp = vertical ? xq - 1 : xq;
    int yp = vertical ? yq : yq - 1;
    if (xp < 0 || yp < 0) return false;  // picture boundary
    if (simple) return true;
    const Pps& pps = *f->pps;
    int rs_q = (yq >> log2ctb) * ctb_w + (xq >> log2ctb);
    int rs_p = (yp >> log2ctb) * ctb_w + (xp >> log2ctb);
    if (rs_q != rs_p) {
      if (f->slice_addr_rs[rs_q] != f->slice_addr_rs[rs_p]) {
        const SliceHeader* sh = slice_at(xq, yq);
        if (sh && !sh->loop_filter_across_slices) return false;
      }
      if (!pps.loop_filter_across_tiles && !pps.same_tile(rs_q, rs_p))
        return false;
    }
    return true;
  }

  // sample-side filtering disable (PCM + pcm_loop_filter_disable, tqbypass)
  bool side_unfiltered(int x, int y) const {
    if (simple) return false;
    u8 info = f->cu_info[(y >> 2) * f->pb_w + (x >> 2)];
    if ((info & 2) && f->sps->pcm_loop_filter_disable) return true;  // PCM
    if (info & 4) return true;  // transquant bypass
    return false;
  }
};

// spec 8.7.2.4 boundary strength for the 4-sample edge segment at (x,y).
int boundary_strength(const DeblockCtx& ctx, int x, int y, bool vertical,
                      u8 edge_flags) {
  Frame& f = *ctx.f;
  int xp = vertical ? x - 1 : x;
  int yp = vertical ? y : y - 1;

  u8 p_info = f.cu_info[(yp >> 2) * f.pb_w + (xp >> 2)];
  u8 q_info = f.cu_info[(y >> 2) * f.pb_w + (x >> 2)];
  if ((p_info & 1) || (q_info & 1)) return 2;  // intra on either side

  bool tu_edge = (edge_flags & (vertical ? 1 : 2)) != 0;
  if (tu_edge && (f.nonzero_coeff[(y >> 2) * f.pb_w + (x >> 2)] ||
                  f.nonzero_coeff[(yp >> 2) * f.pb_w + (xp >> 2)]))
    return 1;

  const PbMotion& p = f.pb_at(xp, yp);
  const PbMotion& q = f.pb_at(x, y);

  i64 ref_p0 = (p.pred_flags & 1) ? p.ref_poc[0] : -1000000;
  i64 ref_p1 = (p.pred_flags & 2) ? p.ref_poc[1] : -1000000;
  i64 ref_q0 = (q.pred_flags & 1) ? q.ref_poc[0] : -1000000;
  i64 ref_q1 = (q.pred_flags & 2) ? q.ref_poc[1] : -1000000;

  bool same_pics = (ref_p0 == ref_q0 && ref_p1 == ref_q1) ||
                   (ref_p0 == ref_q1 && ref_p1 == ref_q0);
  if (!same_pics) return 1;

  MotionVector mp0 = (p.pred_flags & 1) ? p.mv[0] : MotionVector();
  MotionVector mp1 = (p.pred_flags & 2) ? p.mv[1] : MotionVector();
  MotionVector mq0 = (q.pred_flags & 1) ? q.mv[0] : MotionVector();
  MotionVector mq1 = (q.pred_flags & 2) ? q.mv[1] : MotionVector();

  auto far_apart = [](MotionVector a, MotionVector b) {
    return abs_i(a.x - b.x) >= 4 || abs_i(a.y - b.y) >= 4;
  };

  if (ref_p0 != ref_p1) {
    if (ref_p0 == ref_q0) {
      if (far_apart(mp0, mq0) || far_apart(mp1, mq1)) return 1;
    } else {
      if (far_apart(mp0, mq1) || far_apart(mp1, mq0)) return 1;
    }
  } else {
    if ((far_apart(mp0, mq0) || far_apart(mp1, mq1)) &&
        (far_apart(mp0, mq1) || far_apart(mp1, mq0)))
      return 1;
  }
  return 0;
}

template <typename pixel_t, bool vertical>
void filter_luma_edge(const DeblockCtx& ctx, int x, int y, int bs) {
  Frame& f = *ctx.f;
  const SliceHeader* sh = ctx.slice_at(x, y);
  if (!sh || sh->deblocking_filter_disabled) return;

  int bd = f.bit_depth[0];
  int stride = f.stride[0];
  pixel_t* img = reinterpret_cast<pixel_t*>(f.plane[0].data());

  int xp = vertical ? x - 1 : x;
  int yp = vertical ? y : y - 1;
  int qp_p = f.qp_y[(yp >> 2) * f.pb_w + (xp >> 2)];
  int qp_q = f.qp_y[(y >> 2) * f.pb_w + (x >> 2)];
  int qp_l = (qp_p + qp_q + 1) >> 1;

  int beta = kBetaTable[clip3(0, 51, qp_l + sh->beta_offset)] << (bd - 8);
  int tc = kTcTable[clip3(0, 53, qp_l + 2 * (bs - 1) + sh->tc_offset)] << (bd - 8);
  if (beta == 0 && tc == 0) return;

  // access helpers: s(i, k) = sample i away from the edge on line k
  // (i<0: P side), with the edge between i=-1 and i=0.
  auto at = [&](int i, int k) -> pixel_t& {
    if constexpr (vertical) return img[(size_t)(y + k) * stride + (x + i)];
    else return img[(size_t)(y + i) * stride + (x + k)];
  };
  auto p = [&](int i, int k) -> pixel_t& { return at(-1 - i, k); };
  auto q = [&](int i, int k) -> pixel_t& { return at(i, k); };

  int dp0 = abs_i(p(2, 0) - 2 * p(1, 0) + p(0, 0));
  int dp3 = abs_i(p(2, 3) - 2 * p(1, 3) + p(0, 3));
  int dq0 = abs_i(q(2, 0) - 2 * q(1, 0) + q(0, 0));
  int dq3 = abs_i(q(2, 3) - 2 * q(1, 3) + q(0, 3));
  int dpq0 = dp0 + dq0;
  int dpq3 = dp3 + dq3;
  int d = dpq0 + dpq3;
  if (d >= beta) return;

  bool filter_p = !ctx.side_unfiltered(xp, yp);
  bool filter_q = !ctx.side_unfiltered(x, y);
  if (!filter_p && !filter_q) return;

  // strong/weak decision (spec 8.7.2.5.3, lines 0 and 3)
  bool strong = true;
  for (int k = 0; k <= 3; k += 3) {
    int dpq = (k == 0) ? dpq0 : dpq3;
    if (!(2 * dpq < (beta >> 2) &&
          abs_i(p(3, k) - p(0, k)) + abs_i(q(0, k) - q(3, k)) < (beta >> 3) &&
          abs_i(p(0, k) - q(0, k)) < ((5 * tc + 1) >> 1))) {
      strong = false;
      break;
    }
  }

  if (strong) {
    for (int k = 0; k < 4; k++) {
      int p0 = p(0, k), p1 = p(1, k), p2 = p(2, k), p3 = p(3, k);
      int q0 = q(0, k), q1 = q(1, k), q2 = q(2, k), q3 = q(3, k);
      if (filter_p) {
        p(0, k) = (pixel_t)clip3(p0 - 2 * tc, p0 + 2 * tc,
                                 (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
        p(1, k) = (pixel_t)clip3(p1 - 2 * tc, p1 + 2 * tc,
                                 (p2 + p1 + p0 + q0 + 2) >> 2);
        p(2, k) = (pixel_t)clip3(p2 - 2 * tc, p2 + 2 * tc,
                                 (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3);
      }
      if (filter_q) {
        q(0, k) = (pixel_t)clip3(q0 - 2 * tc, q0 + 2 * tc,
                                 (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3);
        q(1, k) = (pixel_t)clip3(q1 - 2 * tc, q1 + 2 * tc,
                                 (q2 + q1 + q0 + p0 + 2) >> 2);
        q(2, k) = (pixel_t)clip3(q2 - 2 * tc, q2 + 2 * tc,
                                 (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3);
      }
    }
  } else {
    bool dEp = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3);
    bool dEq = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3);
    for (int k = 0; k < 4; k++) {
      int p0 = p(0, k), p1 = p(1, k), p2 = p(2, k);
      int q0 = q(0, k), q1 = q(1, k), q2 = q(2, k);
      int delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4;
      if (abs_i(delta) >= tc * 10) continue;
      delta = clip3(-tc, tc, delta);
      if (filter_p) p(0, k) = (pixel_t)clip_bd(p0 + delta, bd);
      if (filter_q) q(0, k) = (pixel_t)clip_bd(q0 - delta, bd);
      if (dEp && filter_p) {
        int dp = clip3(-(tc >> 1), tc >> 1,
                       (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1);
        p(1, k) = (pixel_t)clip_bd(p1 + dp, bd);
      }
      if (dEq && filter_q) {
        int dq = clip3(-(tc >> 1), tc >> 1,
                       (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1);
        q(1, k) = (pixel_t)clip_bd(q1 + dq, bd);
      }
    }
  }
}

template <typename pixel_t, bool vertical>
void filter_chroma_edge(const DeblockCtx& ctx, int x, int y, int c) {
  // (x,y) luma position of the edge segment (4 luma lines)
  Frame& f = *ctx.f;
  const Sps& sps = *f.sps;
  const SliceHeader* sh = ctx.slice_at(x, y);
  if (!sh || sh->deblocking_filter_disabled) return;

  int bd = f.bit_depth[c];
  int stride = f.stride[c];
  pixel_t* img = reinterpret_cast<pixel_t*>(f.plane[c].data());

  int xp = vertical ? x - 1 : x;
  int yp = vertical ? y : y - 1;
  int qp_p = f.qp_y[(yp >> 2) * f.pb_w + (xp >> 2)];
  int qp_q = f.qp_y[(y >> 2) * f.pb_w + (x >> 2)];
  int c_off = (c == 1) ? f.pps->cb_qp_offset : f.pps->cr_qp_offset;
  int qpi = ((qp_p + qp_q + 1) >> 1) + c_off;
  int qpc;
  if (sps.chroma_array_type == 1) {
    if (qpi < 30) {
      qpc = qpi;
    } else if (qpi > 43) {
      qpc = qpi - 6;
    } else {
      static const int tab[14] = {29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37};
      qpc = tab[clip3(0, 13, qpi - 30)];
    }
  } else {
    qpc = min_i(max_i(qpi, 0), 51);
  }
  int tc = kTcTable[clip3(0, 53, qpc + 2 + sh->tc_offset)] << (bd - 8);
  if (tc == 0) return;

  bool filter_p = !ctx.side_unfiltered(xp, yp);
  bool filter_q = !ctx.side_unfiltered(x, y);
  if (!filter_p && !filter_q) return;

  int cx = x / sps.sub_width_c, cy = y / sps.sub_height_c;
  int n = vertical ? (4 / sps.sub_height_c) : (4 / sps.sub_width_c);

  auto at = [&](int i, int k) -> pixel_t& {
    if constexpr (vertical) return img[(size_t)(cy + k) * stride + (cx + i)];
    else return img[(size_t)(cy + i) * stride + (cx + k)];
  };
  for (int k = 0; k < n; k++) {
    int p0 = at(-1, k), p1 = at(-2, k);
    int q0 = at(0, k), q1 = at(1, k);
    int delta = clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3));
    if (filter_p) at(-1, k) = (pixel_t)clip_bd(p0 + delta, bd);
    if (filter_q) at(0, k) = (pixel_t)clip_bd(q0 - delta, bd);
  }
}

template <typename pixel_t, bool vertical>
void deblock_pass(DeblockCtx& ctx) {
  Frame& f = *ctx.f;
  const Sps& sps = *f.sps;
  int w4 = f.pb_w, h4 = f.pb_h;
  const bool bs_dump = getenv("TDE_BS_DUMP") != nullptr;
  int x_step = vertical ? 2 : 1;
  int y_step = vertical ? 1 : 2;
  // chroma edge spacing in 4x4 luma units
  int c_step = vertical ? 2 * sps.sub_width_c : 2 * sps.sub_height_c;

  for (int y4 = 0; y4 < h4; y4 += y_step) {
    for (int x4 = 0; x4 < w4; x4 += x_step) {
      u8 flags = f.deblock_flags[y4 * w4 + x4];
      bool edge = (flags & (vertical ? (1 | 4) : (2 | 8))) != 0;
      if (!edge) continue;
      int x = x4 << 2, y = y4 << 2;
      if (!ctx.edge_allowed(x, y, vertical)) continue;

      int bs = boundary_strength(ctx, x, y, vertical, flags);
      if (bs_dump)
        printf("BS %d %s %d %d %d\n", f.poc, vertical ? "V" : "H", x, y, bs);
      if (bs == 0) continue;

      filter_luma_edge<pixel_t, vertical>(ctx, x, y, bs);

      if (bs == 2 && sps.chroma_array_type != 0) {
        bool on_chroma_grid = vertical ? (x4 % c_step == 0) : (y4 % c_step == 0);
        if (on_chroma_grid) {
          filter_chroma_edge<pixel_t, vertical>(ctx, x, y, 1);
          filter_chroma_edge<pixel_t, vertical>(ctx, x, y, 2);
        }
      }
    }
  }
}

}  // namespace

void apply_deblocking(FrameProgram& prog) {
  Frame& f = *prog.frame;
  DeblockCtx ctx{&f, &prog, f.sps->log2_ctb_size, f.ctb_w};

  bool any_enabled = false;
  for (auto& sh : prog.slices)
    if (!sh->deblocking_filter_disabled) any_enabled = true;
  if (!any_enabled) return;

  // fast-path eligibility
  if (prog.slices.size() == 1 && !f.pps->tiles_enabled &&
      !prog.slices[0]->deblocking_filter_disabled) {
    bool any_skip = false;
    for (u8 v : f.cu_info)
      if ((v & 4) || ((v & 2) && f.sps->pcm_loop_filter_disable)) {
        any_skip = true;
        break;
      }
    if (!any_skip) {
      ctx.simple = true;
      ctx.sh0 = prog.slices[0].get();
    }
  }

  if (f.bytes_pp == 1) {
    deblock_pass<u8, true>(ctx);
    deblock_pass<u8, false>(ctx);
  } else {
    deblock_pass<u16, true>(ctx);
    deblock_pass<u16, false>(ctx);
  }
}

}  // namespace tde265
