// Motion vector derivation (spec 8.5.3): merge candidate list, AMVP, TMVP.
// Behavior counterpart of /root/reference/libde265/motion.cc:826-2213
// (derivation half only; interpolation lives in the pixel backends).
#include "tde265/motion.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "tde265/decoder.h"

// Debug hook: set TDE_MV_DEBUG="x,y,poc" to trace one PU's derivation.
static bool mv_debug_match(int xP, int yP, int poc) {
  static const char* env = getenv("TDE_MV_DEBUG");
  if (!env) return false;
  int dx, dy, dpoc;
  if (sscanf(env, "%d,%d,%d", &dx, &dy, &dpoc) != 3) return false;
  return dx == xP && dy == yP && dpoc == poc;
}

namespace tde265 {

namespace {

bool same_motion(const PbMotion& a, const PbMotion& b) {
  if (a.pred_flags != b.pred_flags) return false;
  for (int l = 0; l < 2; l++) {
    if ((a.pred_flags >> l) & 1) {
      if (!(a.mv[l] == b.mv[l])) return false;
      if (a.ref_idx[l] != b.ref_idx[l]) return false;
    }
  }
  return true;
}

// spec 8.5.3.2.8 MV scaling
MotionVector scale_mv(MotionVector mv, int col_dist, int curr_dist) {
  int td = clip3(-128, 127, col_dist);
  int tb = clip3(-128, 127, curr_dist);
  if (td == 0) return mv;
  int tx = (16384 + (abs_i(td) >> 1)) / td;
  int dsf = clip3(-4096, 4095, (tb * tx + 32) >> 6);
  MotionVector r;
  r.x = (i16)clip3(-32768, 32767,
                   sign3(dsf * mv.x) * ((abs_i(dsf * mv.x) + 127) >> 8));
  r.y = (i16)clip3(-32768, 32767,
                   sign3(dsf * mv.y) * ((abs_i(dsf * mv.y) + 127) >> 8));
  return r;
}

struct MergeCtx {
  Frame& frame;
  const SliceHeader& sh;
  i32 cur_poc;
};

// spec 8.5.3.2.9: collocated motion vector for list X / refIdxLX.
bool collocated_mv(Frame& frame, const SliceHeader& sh, int x_col, int y_col,
                   int ref_idx_lx, int X, MotionVector* out) {
  Frame* col = sh.ref_list[sh.collocated_from_l0 ? 0 : 1][sh.collocated_ref_idx];
  if (!col) return false;
  if (x_col >= col->width || y_col >= col->height) return false;

  const PbMotion& mvi = col->pb_at(x_col, y_col);
  if (mvi.intra) return false;

  MotionVector mv_col;
  i32 col_ref_poc;
  bool col_ref_lt;
  if (!(mvi.pred_flags & 1)) {
    mv_col = mvi.mv[1];
    col_ref_poc = mvi.ref_poc[1];
    col_ref_lt = (mvi.ref_longterm >> 1) & 1;
  } else if (!(mvi.pred_flags & 2)) {
    mv_col = mvi.mv[0];
    col_ref_poc = mvi.ref_poc[0];
    col_ref_lt = mvi.ref_longterm & 1;
  } else {
    // both lists: choose by backward-prediction structure
    bool all_refs_before = true;
    for (int l = 0; l < 2 && all_refs_before; l++) {
      for (int r = 0; r < sh.num_ref_idx[l]; r++) {
        if (sh.ref_poc[l][r] > frame.poc) {
          all_refs_before = false;
          break;
        }
      }
    }
    // spec 8.5.3.2.9: otherwise N = collocated_from_l0_flag (opposite
    // direction of the collocated picture's list).
    int list_col = all_refs_before ? X : (int)sh.collocated_from_l0;
    mv_col = mvi.mv[list_col];
    col_ref_poc = mvi.ref_poc[list_col];
    col_ref_lt = (mvi.ref_longterm >> list_col) & 1;
  }

  bool target_lt = sh.ref_longterm[X][ref_idx_lx];
  if (target_lt != col_ref_lt) return false;

  int col_dist = col->poc - col_ref_poc;
  int curr_dist = frame.poc - sh.ref_poc[X][ref_idx_lx];
  if (target_lt || col_dist == curr_dist) {
    *out = mv_col;
  } else {
    *out = scale_mv(mv_col, col_dist, curr_dist);
  }
  return true;
}

// spec 8.5.3.2.7: temporal candidate at C0 (bottom-right) then C1 (center).
bool temporal_mv(Frame& frame, const SliceHeader& sh, int xP, int yP, int nPbW,
                 int nPbH, int ref_idx, int X, MotionVector* out) {
  if (!sh.temporal_mvp_enabled) return false;
  const Sps& sps = *frame.sps;
  int x_br = xP + nPbW;
  int y_br = yP + nPbH;
  if ((yP >> sps.log2_ctb_size) == (y_br >> sps.log2_ctb_size) &&
      y_br < frame.height && x_br < frame.width) {
    int xc = (x_br >> 4) << 4, yc = (y_br >> 4) << 4;
    if (collocated_mv(frame, sh, xc, yc, ref_idx, X, out)) return true;
  }
  int x_ctr = xP + (nPbW >> 1);
  int y_ctr = yP + (nPbH >> 1);
  int xc = (x_ctr >> 4) << 4, yc = (y_ctr >> 4) << 4;
  return collocated_mv(frame, sh, xc, yc, ref_idx, X, out);
}

}  // namespace

// ---------------------------------------------------------------------------
// Merge list (spec 8.5.3.2.2-8.5.3.2.5)
// ---------------------------------------------------------------------------
void derive_merge_list(Frame& frame, const SliceHeader& sh, int xC,
                       int yC, int log2_cb, int xP, int yP, int nPbW,
                       int nPbH, int part_idx, int part_mode,
                       PbMotion list[5]) {
  const Pps& pps = *sh.pps;
  int mer = pps.log2_parallel_merge_level;
  int nCbS = 1 << log2_cb;

  // single merge candidate list for small CUs (spec 8.5.3.2.2)
  bool single_mcl = (mer > 2 && log2_cb == 3);
  if (single_mcl) {
    xP = xC;
    yP = yC;
    nPbW = nPbH = 1 << log2_cb;
    part_idx = 0;
    part_mode = 0;  // PART_2Nx2N
  }

  // spec 6.4.2 prediction-block availability
  auto spatial_avail = [&](int xN, int yN) -> const PbMotion* {
    if ((xP >> mer) == (xN >> mer) && (yP >> mer) == (yN >> mer)) return nullptr;
    bool same_cb = (xC <= xN && xN < xC + nCbS && yC <= yN && yN < yC + nCbS);
    bool avail;
    if (!same_cb) {
      avail = z_available(frame, xP, yP, xN, yN);
    } else {
      // inside the CU: unavailable only for NxN partIdx1 neighbors in part 2
      avail = !((nPbW << 1) == nCbS && (nPbH << 1) == nCbS && part_idx == 1 &&
                yN >= yC + nPbH && xN < xC + nPbW);
    }
    if (!avail) return nullptr;
    const PbMotion& m = frame.pb_at(xN, yN);
    if (m.intra) return nullptr;
    return &m;
  };

  // Spatial candidates.  Note (matching spec 8.5.3.2.3 / reference
  // motion.cc:826-1050): redundancy pruning compares against the *available*
  // neighbor's motion even when that neighbor was itself dropped from the
  // list as redundant.
  // A1
  const PbMotion* a1 = nullptr;
  {
    bool excluded = (part_idx == 1 && (part_mode == 2 /*Nx2N*/ ||
                                       part_mode == 6 /*nLx2N*/ ||
                                       part_mode == 7 /*nRx2N*/));
    if (!excluded) a1 = spatial_avail(xP - 1, yP + nPbH - 1);
  }
  // B1
  const PbMotion* b1 = nullptr;
  bool b1_in_list = false;
  {
    bool excluded = (part_idx == 1 && (part_mode == 1 /*2NxN*/ ||
                                       part_mode == 4 /*2NxnU*/ ||
                                       part_mode == 5 /*2NxnD*/));
    if (!excluded) b1 = spatial_avail(xP + nPbW - 1, yP - 1);
    b1_in_list = b1 && !(a1 && same_motion(*a1, *b1));
  }
  // B0
  const PbMotion* b0 = spatial_avail(xP + nPbW, yP - 1);
  bool b0_in_list = b0 && !(b1 && same_motion(*b1, *b0));
  // A0
  const PbMotion* a0 = spatial_avail(xP - 1, yP + nPbH);
  bool a0_in_list = a0 && !(a1 && same_motion(*a1, *a0));
  // B2 (only considered if fewer than 4 candidates so far)
  const PbMotion* b2 = nullptr;
  bool b2_in_list = false;
  if ((a1 != nullptr) + b1_in_list + b0_in_list + a0_in_list < 4) {
    b2 = spatial_avail(xP - 1, yP - 1);
    b2_in_list = b2 && !(a1 && same_motion(*a1, *b2)) &&
                 !(b1 && same_motion(*b1, *b2));
  }

  int n = 0;
  int max_cand = sh.max_num_merge_cand;
  auto push = [&](const PbMotion& m) {
    if (n < max_cand) list[n++] = m;
  };
  if (a1) push(*a1);
  if (b1_in_list) push(*b1);
  if (b0_in_list) push(*b0);
  if (a0_in_list) push(*a0);
  if (b2_in_list) push(*b2);

  // temporal candidate
  if (n < max_cand) {
    PbMotion t;
    t.intra = false;
    MotionVector mv;
    bool av0 = temporal_mv(frame, sh, xP, yP, nPbW, nPbH, 0, 0, &mv);
    if (av0) {
      t.mv[0] = mv;
      t.ref_idx[0] = 0;
      t.pred_flags |= 1;
      t.ref_poc[0] = sh.ref_poc[0][0];
      t.ref_longterm |= sh.ref_longterm[0][0] ? 1 : 0;
    }
    if (sh.slice_type == SLICE_B) {
      MotionVector mv1;
      if (temporal_mv(frame, sh, xP, yP, nPbW, nPbH, 0, 1, &mv1)) {
        t.mv[1] = mv1;
        t.ref_idx[1] = 0;
        t.pred_flags |= 2;
        t.ref_poc[1] = sh.ref_poc[1][0];
        t.ref_longterm |= sh.ref_longterm[1][0] ? 2 : 0;
      }
    }
    if (t.pred_flags) push(t);
  }

  // combined bi-predictive candidates (B slices, spec 8.5.3.2.4)
  if (sh.slice_type == SLICE_B && n > 1 && n < max_cand) {
    static const int l0_idx[12] = {0, 1, 0, 2, 1, 2, 0, 3, 1, 3, 2, 3};
    static const int l1_idx[12] = {1, 0, 2, 0, 2, 1, 3, 0, 3, 1, 3, 2};
    int n_orig = n;
    int max_combs = n_orig * (n_orig - 1);
    for (int k = 0; k < max_combs && k < 12 && n < max_cand; k++) {
      const PbMotion& c0 = list[l0_idx[k]];
      const PbMotion& c1 = list[l1_idx[k]];
      if (l0_idx[k] >= n_orig || l1_idx[k] >= n_orig) continue;
      if (!(c0.pred_flags & 1) || !(c1.pred_flags & 2)) continue;
      bool different = (c0.ref_poc[0] != c1.ref_poc[1]) ||
                       !(c0.mv[0] == c1.mv[1]);
      if (!different) continue;
      PbMotion comb;
      comb.intra = false;
      comb.pred_flags = 3;
      comb.mv[0] = c0.mv[0];
      comb.ref_idx[0] = c0.ref_idx[0];
      comb.ref_poc[0] = c0.ref_poc[0];
      comb.mv[1] = c1.mv[1];
      comb.ref_idx[1] = c1.ref_idx[1];
      comb.ref_poc[1] = c1.ref_poc[1];
      comb.ref_longterm =
          (u8)((c0.ref_longterm & 1) | (c1.ref_longterm & 2));
      push(comb);
    }
  }

  // zero-MV candidates (spec 8.5.3.2.5)
  int num_ref = (sh.slice_type == SLICE_B)
                    ? min_i(sh.num_ref_idx[0], sh.num_ref_idx[1])
                    : sh.num_ref_idx[0];
  if (num_ref < 1) num_ref = 1;
  int zero_idx = 0;
  while (n < max_cand) {
    PbMotion z;
    z.intra = false;
    int r = (zero_idx < num_ref) ? zero_idx : 0;
    z.pred_flags = (sh.slice_type == SLICE_B) ? 3 : 1;
    z.mv[0] = MotionVector();
    z.ref_idx[0] = (i8)r;
    z.ref_poc[0] = sh.ref_poc[0][r];
    z.ref_longterm = sh.ref_longterm[0][r] ? 1 : 0;
    if (sh.slice_type == SLICE_B) {
      z.mv[1] = MotionVector();
      z.ref_idx[1] = (i8)r;
      z.ref_poc[1] = sh.ref_poc[1][r];
      z.ref_longterm |= sh.ref_longterm[1][r] ? 2 : 0;
    }
    push(z);
    zero_idx++;
  }
}

// ---------------------------------------------------------------------------
// AMVP (spec 8.5.3.2.6)
// ---------------------------------------------------------------------------
void derive_mvp_list(Frame& frame, const SliceHeader& sh, int xC, int yC,
                            int log2_cb, int part_idx, int xP, int yP,
                            int nPbW, int nPbH, int X, int ref_idx,
                            MotionVector mvp[2]) {
  i32 target_poc = sh.ref_poc[X][ref_idx];
  bool target_lt = sh.ref_longterm[X][ref_idx];
  int Y = 1 - X;
  int nCbS = 1 << log2_cb;

  // spec 6.4.2 prediction-block availability: a neighbor inside the SAME
  // coding block is available (its PU precedes this one in decode order)
  // except for the NxN part-1 special case; outside, plain z-scan order
  auto neighbor = [&](int xN, int yN) -> const PbMotion* {
    bool same_cb = (xC <= xN && xN < xC + nCbS && yC <= yN && yN < yC + nCbS);
    bool avail;
    if (!same_cb) {
      avail = z_available(frame, xP, yP, xN, yN);
    } else {
      avail = !((nPbW << 1) == nCbS && (nPbH << 1) == nCbS && part_idx == 1 &&
                yN >= yC + nPbH && xN < xC + nPbW);
    }
    if (!avail) return nullptr;
    const PbMotion& m = frame.pb_at(xN, yN);
    if (m.intra) return nullptr;
    return &m;
  };

  const PbMotion* a0 = neighbor(xP - 1, yP + nPbH);
  const PbMotion* a1 = neighbor(xP - 1, yP + nPbH - 1);
  bool is_scaled = (a0 != nullptr) || (a1 != nullptr);

  bool dbg = mv_debug_match(xP, yP, frame.poc);
  if (dbg) {
    auto pr = [](const char* n, const PbMotion* m) {
      if (!m) { printf("  %s: unavail\n", n); return; }
      printf("  %s: f%d L0(%d,%d)r%d poc%d L1(%d,%d)r%d poc%d lt%d\n", n,
             m->pred_flags, m->mv[0].x, m->mv[0].y, m->ref_idx[0], m->ref_poc[0],
             m->mv[1].x, m->mv[1].y, m->ref_idx[1], m->ref_poc[1], m->ref_longterm);
    };
    printf("AMVP X=%d ref=%d target_poc=%d\n", X, ref_idx, target_poc);
    pr("A0", a0);
    pr("A1", a1);
  }

  bool avail_a = false;
  MotionVector mv_a;
  // pass 1: same reference picture, no scaling
  for (const PbMotion* cand : {a0, a1}) {
    if (!cand || avail_a) continue;
    if ((cand->pred_flags >> X & 1) && cand->ref_poc[X] == target_poc &&
        (((cand->ref_longterm >> X) & 1) == (target_lt ? 1 : 0))) {
      avail_a = true;
      mv_a = cand->mv[X];
    } else if ((cand->pred_flags >> Y & 1) && cand->ref_poc[Y] == target_poc &&
               (((cand->ref_longterm >> Y) & 1) == (target_lt ? 1 : 0))) {
      avail_a = true;
      mv_a = cand->mv[Y];
    }
  }
  // pass 2: different reference, scale (short-term only)
  if (!avail_a) {
    for (const PbMotion* cand : {a0, a1}) {
      if (!cand || avail_a) continue;
      for (int l : {X, Y}) {
        if (avail_a) break;
        if ((cand->pred_flags >> l) & 1) {
          bool cand_lt = (cand->ref_longterm >> l) & 1;
          if (cand_lt == target_lt) {
            avail_a = true;
            if (!target_lt && cand->ref_poc[l] != target_poc) {
              mv_a = scale_mv(cand->mv[l], frame.poc - cand->ref_poc[l],
                              frame.poc - target_poc);
            } else {
              mv_a = cand->mv[l];
            }
          }
        }
      }
    }
  }

  // B candidates
  const PbMotion* b0 = neighbor(xP + nPbW, yP - 1);
  const PbMotion* b1 = neighbor(xP + nPbW - 1, yP - 1);
  const PbMotion* b2 = neighbor(xP - 1, yP - 1);

  bool avail_b = false;
  MotionVector mv_b;
  for (const PbMotion* cand : {b0, b1, b2}) {
    if (!cand || avail_b) continue;
    if ((cand->pred_flags >> X & 1) && cand->ref_poc[X] == target_poc &&
        (((cand->ref_longterm >> X) & 1) == (target_lt ? 1 : 0))) {
      avail_b = true;
      mv_b = cand->mv[X];
    } else if ((cand->pred_flags >> Y & 1) && cand->ref_poc[Y] == target_poc &&
               (((cand->ref_longterm >> Y) & 1) == (target_lt ? 1 : 0))) {
      avail_b = true;
      mv_b = cand->mv[Y];
    }
  }

  if (!is_scaled) {
    // A takes over B's unscaled candidate; B re-derived with scaling
    if (avail_b) {
      avail_a = true;
      mv_a = mv_b;
    }
    avail_b = false;
    for (const PbMotion* cand : {b0, b1, b2}) {
      if (!cand || avail_b) continue;
      for (int l : {X, Y}) {
        if (avail_b) break;
        if ((cand->pred_flags >> l) & 1) {
          bool cand_lt = (cand->ref_longterm >> l) & 1;
          if (cand_lt == target_lt) {
            avail_b = true;
            if (!target_lt && cand->ref_poc[l] != target_poc) {
              mv_b = scale_mv(cand->mv[l], frame.poc - cand->ref_poc[l],
                              frame.poc - target_poc);
            } else {
              mv_b = cand->mv[l];
            }
          }
        }
      }
    }
  }

  if (dbg) {
    auto pr = [](const char* n, const PbMotion* m) {
      if (!m) { printf("  %s: unavail\n", n); return; }
      printf("  %s: f%d L0(%d,%d)r%d poc%d L1(%d,%d)r%d poc%d lt%d\n", n,
             m->pred_flags, m->mv[0].x, m->mv[0].y, m->ref_idx[0], m->ref_poc[0],
             m->mv[1].x, m->mv[1].y, m->ref_idx[1], m->ref_poc[1], m->ref_longterm);
    };
    pr("B0", b0);
    pr("B1", b1);
    pr("B2", b2);
    printf("  is_scaled=%d availA=%d mvA=(%d,%d) availB=%d mvB=(%d,%d)\n",
           (int)is_scaled, (int)avail_a, mv_a.x, mv_a.y, (int)avail_b, mv_b.x,
           mv_b.y);
  }

  int n = 0;
  if (avail_a) mvp[n++] = mv_a;
  if (avail_b && !(avail_a && mv_a == mv_b)) {
    if (n < 2) mvp[n++] = mv_b;
  }
  if (n < 2) {
    MotionVector t;
    if (temporal_mv(frame, sh, xP, yP, nPbW, nPbH, ref_idx, X, &t)) mvp[n++] = t;
  }
  while (n < 2) mvp[n++] = MotionVector();
  if (dbg)
    printf("  mvp[0]=(%d,%d) mvp[1]=(%d,%d)\n", mvp[0].x, mvp[0].y, mvp[1].x,
           mvp[1].y);
}

// ---------------------------------------------------------------------------
// Entry point
// ---------------------------------------------------------------------------
PbMotion derive_pu_motion(Frame& frame, const SliceHeader& sh, int xC, int yC,
                          int log2_cb, int xP, int yP, int nPbW, int nPbH,
                          int part_idx, int part_mode, const PuMotionSyntax& syn) {
  PbMotion m;
  m.intra = false;

  if (syn.merge_flag) {
    PbMotion cand[5];
    derive_merge_list(frame, sh, xC, yC, log2_cb, xP, yP, nPbW, nPbH, part_idx,
                      part_mode, cand);
    int idx = min_i(syn.merge_idx, sh.max_num_merge_cand - 1);
    if (mv_debug_match(xP, yP, frame.poc)) {
      printf("MERGE idx=%d of %d:\n", syn.merge_idx, sh.max_num_merge_cand);
      for (int k = 0; k < sh.max_num_merge_cand; k++)
        printf("  cand[%d]: f%d L0(%d,%d)r%d L1(%d,%d)r%d\n", k,
               cand[k].pred_flags, cand[k].mv[0].x, cand[k].mv[0].y,
               cand[k].ref_idx[0], cand[k].mv[1].x, cand[k].mv[1].y,
               cand[k].ref_idx[1]);
    }
    m = cand[idx];
    m.intra = false;
    // 8x4/4x8 PUs: no bi-prediction (spec 8.5.3.2.2)
    if (nPbW + nPbH == 12 && m.pred_flags == 3) {
      m.pred_flags = 1;
      m.ref_idx[1] = -1;
      m.mv[1] = MotionVector();
    }
  } else {
    m.pred_flags = (syn.inter_pred_idc == 0) ? 1
                   : (syn.inter_pred_idc == 1) ? 2 : 3;
    for (int l = 0; l < 2; l++) {
      if (!((m.pred_flags >> l) & 1)) {
        m.ref_idx[l] = -1;
        continue;
      }
      int ref = syn.ref_idx[l];
      m.ref_idx[l] = (i8)ref;
      m.ref_poc[l] = sh.ref_poc[l][ref];
      if (sh.ref_longterm[l][ref]) m.ref_longterm |= (u8)(1 << l);
      MotionVector mvp[2];
      derive_mvp_list(frame, sh, xC, yC, log2_cb, part_idx, xP, yP, nPbW,
                      nPbH, l, ref, mvp);
      MotionVector p = mvp[syn.mvp_flag[l]];
      m.mv[l].x = (i16)(u16)((u32)(p.x + syn.mvd[l][0]) & 0xFFFF);
      m.mv[l].y = (i16)(u16)((u32)(p.y + syn.mvd[l][1]) & 0xFFFF);
    }
  }

  // store over PU area
  frame.set_motion(xP, yP, nPbW, nPbH, m);
  return m;
}

}  // namespace tde265
