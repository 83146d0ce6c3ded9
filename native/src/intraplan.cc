// Device intra-prediction plan: everything about the intra wavefront except
// the pixel values, computed natively at parse time.
//
// The fused device backend (libde265_tpu/fused_decode.py) replays intra
// blocks as a lax.scan over capacity-limited "super-wave" steps.  For each
// IntraRec this planner emits:
//   - the border-sample gather positions + availability-substitution chain
//     (spec 8.4.4.2.2 reduced to two gathers; mirrors fill_border in
//     intra.cc, recording positions instead of pixels),
//   - the smoothing-filter / strong-smoothing / edge-compensation decisions
//     (8.4.4.2.3, using the real SPS flags),
//   - the residual-bin row of the block's transform unit,
//   - a scheduled step + slot: list scheduling where a block lands in the
//     earliest step after every step that writes one of its border samples,
//     spilling to the next step when the per-size capacity is full.
//
// Replaces the Python planner (ops/intra_wave.py border_plan + the fused
// decoder's _plan_intra), which dominated host time at ~1 ms/block.
// Counterpart of the reference's per-block immediate intra calls
// (/root/reference/libde265/intrapred.cc:255-365).
#include <algorithm>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "tde265/frame.h"
#include "tde265/params.h"
#include "tde265/program.h"

namespace tde265 {

bool z_available(const Frame& f, int x_curr, int y_curr, int xn, int yn);

// per-log2-size step capacities; MUST match fused_decode.WAVE_CAP
// (sized so capacity spills — which add *serial* scan steps — are rare)
static const int kWaveCap[6] = {0, 0, 256, 128, 64, 16};

void build_intra_plan(const FrameProgram& prog, const Frame& f,
                      FrameProgram::Snapshot& snap) {
  const size_t n = prog.intras.size();
  snap.ip_step.assign(n, 0);
  snap.ip_slot.assign(n, 0);
  snap.ip_flags.assign(n, 0);
  snap.ip_edge.assign(n, 0);
  snap.ip_rrow.assign(n, -1);
  snap.ip_border_off.assign(n + 1, 0);
  snap.ip_border_pos.clear();
  snap.ip_border_sub.clear();
  if (n == 0) return;

  const Sps& sps = *f.sps;
  const Pps& pps = *f.pps;
  const bool constrained = pps.constrained_intra_pred;
  const bool smoothing_disabled = sps.intra_smoothing_disabled;
  const bool strong_enabled = sps.strong_intra_smoothing_enabled;
  const bool chroma444 =
      f.chroma_width == f.width && f.chroma_width > 0;

  // residual-bin row of each TU (row within its size bin, in TU order —
  // must match fused_decode._bin_tus)
  std::vector<i32> tu_row(prog.tus.size());
  {
    int cnt[8] = {0};
    for (size_t t = 0; t < prog.tus.size(); t++)
      tu_row[t] = cnt[prog.tus[t].log2_size & 7]++;
  }

  // intra -> residual TU association (same x/y/cidx, ops order)
  std::vector<i32> resid_tu(n, -1);
  {
    std::unordered_map<u32, u32> pending;  // packed key -> intra index
    auto key = [](u16 x, u16 y, u8 c) {
      return ((u32)x << 18) | ((u32)y << 2) | c;
    };
    for (const Op& op : prog.ops) {
      if (op.kind == Op::kIntraPred) {
        const IntraRec& r = prog.intras[op.idx];
        pending[key(r.x, r.y, r.cidx)] = op.idx;
      } else if (op.kind == Op::kAddResidual) {
        const TuRec& tu = prog.tus[op.idx];
        if (!(tu.flags & TuRec::kIntra)) continue;
        auto it = pending.find(key(tu.x, tu.y, tu.cidx));
        if (it != pending.end()) resid_tu[it->second] = (i32)op.idx;
      }
    }
  }

  // wavefront step maps per channel (channel-coordinate 4-pel cells);
  // wmap value = 1 + the step of the last block that wrote the cell
  std::vector<i32> wmap[3];
  int wmw[3] = {0, 0, 0}, wmh[3] = {0, 0, 0};
  // per (cidx, lg) step occupancy
  std::vector<i32> counts[3][6];

  std::vector<i32> bpos;
  std::vector<i32> bsub;
  bpos.reserve(n * 17);
  bsub.reserve(n * 17);

  bool avail[4 * 64 + 1];
  i32 posb[4 * 64 + 1];

  for (const Op& op : prog.ops) {
    if (op.kind != Op::kIntraPred) continue;
    const u32 i = op.idx;
    const IntraRec& rec = prog.intras[i];
    const int c = rec.cidx;
    const int sub_x = (c == 0) ? 1 : sps.sub_width_c;
    const int sub_y = (c == 0) ? 1 : sps.sub_height_c;
    const int Hc = f.plane_height(c), Wc = f.plane_width(c);
    const int lg = rec.log2_size;
    const int nT = 1 << lg;
    const int n2 = 2 * nT;
    const int x0 = rec.x, y0 = rec.y;
    const int xL = x0 * sub_x, yL = y0 * sub_y;

    if (wmap[c].empty()) {
      wmh[c] = (Hc + 3) >> 2;
      wmw[c] = (Wc + 3) >> 2;
      wmap[c].assign((size_t)wmh[c] * wmw[c], 0);
    }
    i32* wm = wmap[c].data();
    const int wmw_c = wmw[c];

    auto sample_avail = [&](int xc, int yc) {
      if (!z_available(f, xL, yL, xc * sub_x, yc * sub_y)) return false;
      if (constrained) {
        u8 info = f.cu_info[((size_t)(yc * sub_y) >> 2) * f.pb_w +
                            ((xc * sub_x) >> 2)];
        if (!(info & 1)) return false;
      }
      return true;
    };

    // border availability + positions (availability constant per 4-luma-pel
    // group, evaluated once per group like intra.cc fill_border)
    bool any = false;
    {
      int group_of = -1;
      bool ga = false;
      for (int k = 0; k < n2; k++) {
        int yc = y0 + n2 - 1 - k;
        bool a = false;
        if (x0 > 0 && yc < Hc) {
          int g = (yc * sub_y) >> 2;
          if (g != group_of) {
            group_of = g;
            ga = sample_avail(x0 - 1, yc);
          }
          a = ga;
        }
        avail[k] = a;
        posb[k] = a ? yc * Wc + (x0 - 1) : 0;
        any |= a;
      }
    }
    {
      bool a = (x0 > 0 && y0 > 0) && sample_avail(x0 - 1, y0 - 1);
      avail[n2] = a;
      posb[n2] = a ? (y0 - 1) * Wc + (x0 - 1) : 0;
      any |= a;
    }
    {
      int group_of = -1;
      bool ga = false;
      for (int k = 0; k < n2; k++) {
        int xc = x0 + k;
        bool a = false;
        if (y0 > 0 && xc < Wc) {
          int g = (xc * sub_x) >> 2;
          if (g != group_of) {
            group_of = g;
            ga = sample_avail(xc, y0 - 1);
          }
          a = ga;
        }
        avail[n2 + 1 + k] = a;
        posb[n2 + 1 + k] = a ? (y0 - 1) * Wc + xc : 0;
        any |= a;
      }
    }

    // substitution chain + dependency step
    const int nb = 4 * nT + 1;
    i32 dep = 0;
    u32 off = (u32)bpos.size();
    snap.ip_border_off[i] = off;
    bpos.resize(off + nb);
    bsub.resize(off + nb);
    i32* bp = bpos.data() + off;
    i32* bs = bsub.data() + off;
    if (!any) {
      for (int k = 0; k < nb; k++) {
        bp[k] = 0;
        bs[k] = k;
      }
      snap.ip_flags[i] |= 1;  // all unavailable
    } else {
      int first = 0;
      while (!avail[first]) first++;
      int last = first;
      for (int k = 0; k < nb; k++) {
        bp[k] = posb[k];
        if (avail[k]) {
          bs[k] = k;
          last = k;
          int cell = (bp[k] / Wc) >> 2, cellx = (bp[k] % Wc) >> 2;
          i32 w = wm[(size_t)cell * wmw_c + cellx];
          if (w > dep) dep = w;
        } else {
          bs[k] = (k < first) ? first : last;
        }
      }
    }

    // capacity scheduling
    const int cap = kWaveCap[lg];
    auto& cnt = counts[c][lg];
    int step = dep;
    for (;;) {
      if ((int)cnt.size() <= step) cnt.resize(step + 1, 0);
      if (cnt[step] < cap) break;
      step++;
    }
    snap.ip_slot[i] = cnt[step]++;
    snap.ip_step[i] = step;
    // mark the block's cells as written at this step
    for (int yy = y0 >> 2; yy < ((y0 + nT + 3) >> 2) && yy < wmh[c]; yy++)
      for (int xx = x0 >> 2; xx < ((x0 + nT + 3) >> 2) && xx < wmw_c; xx++)
        wm[(size_t)yy * wmw_c + xx] = step + 1;

    // smoothing / edge decisions (8.4.4.2.3)
    const int mode = rec.mode;
    bool filt = false;
    if ((c == 0 || chroma444) && !smoothing_disabled && mode != 1 &&
        nT != 4) {
      int mind = std::min(std::abs(mode - 26), std::abs(mode - 10));
      int thresh = (nT == 8) ? 7 : ((nT == 16) ? 1 : 0);
      filt = (mode == 0) ? true : (mind > thresh);
    }
    if (filt) snap.ip_flags[i] |= 2;
    if (filt && strong_enabled && c == 0 && nT == 32) snap.ip_flags[i] |= 4;
    if (c == 0 && nT < 32) {
      if (mode == 1) snap.ip_edge[i] = 1;
      else if (mode == 26) snap.ip_edge[i] = 2;
      else if (mode == 10) snap.ip_edge[i] = 3;
    }
    if (resid_tu[i] >= 0) {
      const TuRec& tu = prog.tus[resid_tu[i]];
      if (tu.log2_size == lg) snap.ip_rrow[i] = tu_row[resid_tu[i]];
    }
  }
  snap.ip_border_off[n] = (u32)bpos.size();
  snap.ip_border_pos = std::move(bpos);
  snap.ip_border_sub = std::move(bsub);
}

}  // namespace tde265
