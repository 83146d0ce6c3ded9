// Native per-frame device-feed packer.
//
// The fused TPU decoder (libde265_tpu/fused_decode.py) feeds each picture to
// the device as ONE packed int32 buffer.  Building that buffer in numpy cost
// 30-180 ms/frame at 1080p (measured round 3) — more than the device program
// itself — so this file computes the identical bytes natively from the
// retained FrameProgram: TU size-binning with the ragged coefficient gather,
// per-cell-band MC segment planning, residual scatter segments, the intra
// super-wave records, PCM scatter lists and the metadata grids.
//
// Two entry points driven by the Python side (which keeps the watermark
// bookkeeping and the XLA layout):
//   tde265_pack_caps(ctx, idx, caps[64])   -> per-frame size requirements
//   tde265_pack_feed(ctx, idx, entries, n, aux, out, out_len)
//     entries: 8 int32 each = {key, p0, p1, offset, d0, d1, d2, d3}
//     aux:     [0..16] slot LUT (ref_dpb+1 -> DPB ring slot)
//              [17..24] ref-index -> ring-slot remap for MC segments
//
// Byte-identity with the numpy packer is enforced by
// tests/test_native_pack.py.  Reference counterpart: none (the reference
// calls kernels directly; this is the TPU-native feed seam, SURVEY.md §7).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "tde265/de265.h"
#include "tde265/program.h"

namespace tde265 {
FrameProgram* internal_program_at(de265_decoder_context* ctx, int idx);
}

using namespace tde265;

namespace {

// Entry keys; MUST match libde265_tpu/fused_decode._PACK_KEYS.
enum PackKey : int {
  kKeyBinQp = 0,
  kKeyBinFlags,
  kKeyBinMid,
  kKeyBinCv,    // two 16-bit val6|pos10 entries per word (even runs)
  kKeyBinCoff,  // per-bin-row ENTRY start offsets [tcap+1]
  kKeyBinCfx,   // escape corrections: row*S*S + pos (pad -1)
  kKeyResN,
  kKeyResSw,  // packed srow | (x0>>1)<<20
  kKeyBinCfv,   // escape corrections: value delta
  kKeySegN,
  kKeySegAUnused,  // was: packed window words (windows now re-derived
  kKeySegBUnused,  // in-kernel from the PU SoA + band)
  kKeySegIdx,  // two 16-bit PU indices per word, [n_bands, ceil(K/2)]
  kKeySegFyUnused,
  kKeySegFxUnused,
  kKeySegX0Unused,
  kKeySegWUnused,
  kKeyIrec,
  kKeyNsteps,
  kKeyPcm,
  kKeySliceRecs,
  kKeyPu,
  kKeyPuIdx,
  kKeyG4,  // qp | nzc<<8 | dbf<<16 | cu<<24
  kKeyNzc4Unused,
  kKeyDbf4Unused,
  kKeyCu4Unused,
  kKeySliceIdx,
  kKeySliceAddr,
  kKeySliceCtb,  // unused (reserved)
  kKeyTileId,
  kKeySaoT,
  kKeySaoEo,
  kKeySaoBand,
  kKeySaoOff,
};

constexpr int kPadL = 128;  // mc_pallas.PADL
constexpr int kPadT = 16;   // mc_pallas.PADT
constexpr int kIrecCols = 15;
constexpr int kAvailWords = 5;
constexpr int kCrowFill = 1 << 30;
constexpr int kPcmFill = 1 << 30;

struct TuBin {
  std::vector<int32_t> rows;          // TU indices (into prog.tus)
  std::vector<int32_t> qp, flags, mid;
  std::vector<int32_t> cv, coff;  // halfword-entry words + entry offsets
  std::vector<int32_t> cfx, cfv;  // |val|>31 escape corrections
  // inter residual scatter (row-in-bin, x, y) per channel
  std::vector<int32_t> sc[3];  // flattened triples
};

struct SegPlan {
  // per-list segment -> PU index map, band-major arrival order (= PU
  // emission order, so overlap resolution matches cell rasterization).
  // Window origins / filter phases / placement are re-derived in-kernel
  // from the PU SoA (mc_pallas._mc_kernel seg_params).
  std::vector<int32_t> counts;           // [n_bands]
  std::vector<int32_t> puidx;            // per segment: PU index
  std::vector<int32_t> band_of, k_of;    // per segment
  int maxk = 0;
};

struct PackState {
  const FrameProgram* prog;
  const FrameProgram::Snapshot* snap;
  int H, W, sub_x, sub_y, n_bands;
  bool has_chroma;
  TuBin bins[4];  // lg 2..5
  bool use_l1 = false;
};

void bin_tus(PackState& ps) {
  const auto& tus = ps.prog->tus;
  const auto& cval = ps.prog->coeff_val;
  const auto& cpos = ps.prog->coeff_pos;
  const bool scaling = ps.snap->scaling_enabled;
  for (size_t t = 0; t < tus.size(); t++) {
    const TuRec& tu = tus[t];
    int lg = tu.log2_size;
    if (lg < 2 || lg > 5) continue;
    TuBin& b = ps.bins[lg - 2];
    int row = (int)b.qp.size();
    b.rows.push_back((int32_t)t);
    b.qp.push_back((int32_t)tu.qp);
    b.flags.push_back((int32_t)tu.flags);
    bool intra = (tu.flags & TuRec::kIntra) != 0;
    int mid = 0;
    if (scaling) {
      mid = (lg == 5) ? (intra ? 0 : 1) : (tu.cidx + (intra ? 0 : 3));
    }
    b.mid.push_back(mid);
    if (b.coff.empty()) b.coff.push_back(0);
    // 8-bit delta entries, four per word (little-endian): a running
    // position P starts at -1; val!=0 (4-bit signed, clamped +-7)
    // advances P by dpos+1 and emits; a zero byte advances P by 15 and
    // emits nothing (gap bridges + pad-to-4 are plain zeros).  |val|>7
    // escapes ship as (cfx, cfv) corrections.  Mirrors
    // fused_decode._bin_tus; positions sorted ascending per TU.
    thread_local std::vector<std::pair<int32_t, int32_t>> pv;
    pv.clear();
    for (int j = 0; j < tu.ncoeff; j++) {
      int32_t v = (int32_t)cval[tu.coeff_start + j];
      int32_t p = (int32_t)cpos[tu.coeff_start + j];
      int32_t p10 = ((p >> 6) << lg) | (p & 63);
      pv.emplace_back(p10, v);
    }
    std::sort(pv.begin(), pv.end());
    int32_t nbytes = 0;
    int32_t P = -1;
    auto put = [&](int32_t byte) {
      if ((nbytes & 3) == 0) b.cv.push_back(0);
      b.cv.back() |= byte << (8 * (nbytes & 3));
      nbytes++;
    };
    for (auto& e : pv) {
      int32_t g = e.first - P - 1;
      for (int k = 0; k < g / 15; k++) put(0);
      int32_t cl = e.second < -7 ? -7 : (e.second > 7 ? 7 : e.second);
      if (cl != e.second) {
        b.cfx.push_back(row * (1 << (2 * lg)) + e.first);
        b.cfv.push_back(e.second - cl);
      }
      put((g % 15) | ((cl & 0xF) << 4));
      P = e.first;
    }
    while (nbytes & 3) nbytes++;  // zero pad rides in the pushed word
    b.coff.push_back(b.coff.back() + nbytes);
    if (!intra && tu.ncoeff > 0 && tu.cidx < 3) {
      auto& s = b.sc[tu.cidx];
      s.push_back(row);
      s.push_back((int32_t)tu.x);
      s.push_back((int32_t)tu.y);
    }
  }
}

// MC segments for one reference list: mirrors
// ops/mc_pallas.plan_segment_indices.
void plan_segments(const PackState& ps, int l, SegPlan& sp) {
  const auto& pus = ps.prog->pus;
  sp.counts.assign(ps.n_bands, 0);
  for (size_t i = 0; i < pus.size(); i++) {
    const PuRec& p = pus[i];
    if (!(p.pred_flags & (1 << l))) continue;
    int rows = p.h >> 2;
    for (int iw = 0; iw < rows; iw++) {
      int band = (p.y >> 2) + iw;
      int k = sp.counts[band]++;
      sp.maxk = std::max(sp.maxk, k + 1);
      sp.band_of.push_back(band);
      sp.k_of.push_back(k);
      sp.puidx.push_back((int32_t)i);
    }
  }
}

// Residual scatter segments for one (bin, channel): mirrors
// plan_residual_segments + pack_band_segments.
struct ResPlan {
  std::vector<int32_t> counts;        // [n_bands]
  std::vector<int32_t> band_of, srow, x0;
  int maxk = 0;
};

void plan_residual(const PackState& ps, int lg, int c, ResPlan& rp) {
  const TuBin& b = ps.bins[lg - 2];
  const auto& sc = b.sc[c];
  const int s = 1 << lg;
  const int OR = (c == 0) ? 4 : 4 / std::max(ps.sub_y, 1);
  const int per = s / OR;
  rp.counts.assign(ps.n_bands, 0);
  for (size_t i = 0; i < sc.size(); i += 3) {
    int row = sc[i], x = sc[i + 1], y = sc[i + 2];
    for (int j = 0; j < per; j++) {
      int band = y / OR + j;
      int k = rp.counts[band]++;
      rp.maxk = std::max(rp.maxk, k + 1);
      rp.band_of.push_back(band);
      rp.srow.push_back(row * per + j);
      rp.x0.push_back(x);
    }
  }
}

struct PcmPlan {
  std::vector<int32_t> idx[3], val[3];
};

void plan_pcm(const PackState& ps, PcmPlan& pp) {
  const auto& pcms = ps.prog->pcms;
  if (pcms.empty()) return;
  const auto& data = ps.prog->pcm_data;
  const auto* s = ps.snap;
  int sh_y = std::max(s->bit_depth[0] - s->pcm_bit_depth[0], 0);
  int bd_c = ps.has_chroma ? s->bit_depth[1] : 8;
  int sh_c = std::max(bd_c - s->pcm_bit_depth[1], 0);
  for (const PcmRec& rec : pcms) {
    int sz = 1 << rec.log2_size;
    size_t p = rec.data_start;
    for (int yy = 0; yy < sz; yy++)
      for (int xx = 0; xx < sz; xx++) {
        pp.idx[0].push_back((rec.y + yy) * ps.W + rec.x + xx);
        pp.val[0].push_back((int32_t)data[p++] << sh_y);
      }
    if (ps.has_chroma) {
      int cw = sz / ps.sub_x, chh = sz / ps.sub_y;
      int cx = rec.x / ps.sub_x, cy = rec.y / ps.sub_y;
      for (int c = 1; c <= 2; c++)
        for (int yy = 0; yy < chh; yy++)
          for (int xx = 0; xx < cw; xx++) {
            pp.idx[c].push_back((cy + yy) * s->chroma_width + cx + xx);
            pp.val[c].push_back((int32_t)data[p++] << sh_c);
          }
    }
  }
}

void init_state(PackState& ps, FrameProgram* prog) {
  ps.prog = prog;
  ps.snap = prog->snapshot.get();
  const auto* s = ps.snap;
  ps.H = s->height;
  ps.W = s->width;
  ps.has_chroma = s->chroma_width > 0;
  ps.sub_x = ps.has_chroma ? s->width / s->chroma_width : 1;
  ps.sub_y = ps.has_chroma ? s->height / s->chroma_height : 1;
  ps.n_bands = (ps.H + 3) / 4;
  for (const PuRec& p : prog->pus)
    if (p.pred_flags & 2) {
      ps.use_l1 = true;
      break;
    }
  bin_tus(ps);
}

// one-entry plan cache: tde265_pack_caps and tde265_pack_feed are called
// back-to-back for the same picture every frame; binning + segment planning
// is ~half the native pack cost, so reuse the state between the two calls
// (single-threaded per decoder context by construction)
struct CachedState {
  de265_decoder_context* ctx = nullptr;
  int idx = -1;
  const FrameProgram* prog = nullptr;
  PackState ps;
  SegPlan seg[2];
  bool seg_done[2] = {false, false};
};
CachedState g_cache;

PackState& cached_state(de265_decoder_context* ctx, int idx,
                        FrameProgram* prog) {
  if (g_cache.ctx == ctx && g_cache.idx == idx && g_cache.prog == prog)
    return g_cache.ps;
  g_cache = CachedState();
  g_cache.ctx = ctx;
  g_cache.idx = idx;
  g_cache.prog = prog;
  init_state(g_cache.ps, prog);
  return g_cache.ps;
}

}  // namespace

extern "C" {

// caps[64] layout (see fused_decode._native_caps):
//  [0..3]  TU count per lg       [4..7]  coeff count per lg
//  [8..19] sc count per (lg,ch)  [20..31] residual K per (lg,ch)
//  [32..33] MC segment K per list
//  [34] n_intras  [35] n_steps  [36..38] steps per plane
//  [39..41] pcm scatter count per plane
//  [42] use_l1  [43] has_inter  [44] n_slices
//  [45..48] max coefficient entries per TU per lg (Pallas densify CAP)
//  [49..52] escape-correction count per lg (|val| > 31)
LIBDE265_API int tde265_pack_caps(de265_decoder_context* ctx, int idx,
                                  int32_t* caps) {
  FrameProgram* prog = internal_program_at(ctx, idx);
  if (!prog || !prog->snapshot) return -1;
  PackState& ps = cached_state(ctx, idx, prog);
  memset(caps, 0, 64 * sizeof(int32_t));
  for (int lg = 2; lg <= 5; lg++) {
    const TuBin& b = ps.bins[lg - 2];
    caps[lg - 2] = (int32_t)b.qp.size();
    caps[4 + lg - 2] = (int32_t)b.cv.size();
    int32_t maxc = 0;
    for (size_t r = 0; r + 1 < b.coff.size(); r++)
      maxc = std::max(maxc, b.coff[r + 1] - b.coff[r]);
    caps[45 + lg - 2] = maxc;
    caps[49 + lg - 2] = (int32_t)b.cfx.size();
    for (int c = 0; c < 3; c++) {
      caps[8 + (lg - 2) * 3 + c] = (int32_t)(b.sc[c].size() / 3);
      ResPlan rp;
      plan_residual(ps, lg, c, rp);
      caps[20 + (lg - 2) * 3 + c] = std::max(rp.maxk, 1);
    }
  }
  for (int l = 0; l < 2; l++) {
    SegPlan& sp = g_cache.seg[l];
    sp = SegPlan();
    plan_segments(ps, l, sp);
    g_cache.seg_done[l] = true;
    caps[32 + l] = std::max(sp.maxk, 1);
  }
  caps[34] = (int32_t)prog->intras.size();
  int n_steps = 0, pc_steps[3] = {0, 0, 0};
  const auto* s = ps.snap;
  for (size_t i = 0; i < prog->intras.size(); i++) {
    int st = s->ip_step[i] + 1;
    n_steps = std::max(n_steps, st);
    int c = prog->intras[i].cidx;
    if (c < 3) pc_steps[c] = std::max(pc_steps[c], st);
  }
  caps[35] = n_steps;
  for (int c = 0; c < 3; c++) caps[36 + c] = pc_steps[c];
  PcmPlan pp;
  plan_pcm(ps, pp);
  for (int c = 0; c < 3; c++) caps[39 + c] = (int32_t)pp.idx[c].size();
  caps[42] = ps.use_l1 ? 1 : 0;
  caps[43] = prog->pus.empty() ? 0 : 1;
  caps[44] =
      (int32_t)(s->slice_records.size() / FrameProgram::Snapshot::kSliceRecordLen);
  return 0;
}

LIBDE265_API int tde265_pack_feed(de265_decoder_context* ctx, int idx,
                                  const int32_t* entries, int n_entries,
                                  const int32_t* aux, int32_t* out,
                                  int64_t out_len) {
  FrameProgram* prog = internal_program_at(ctx, idx);
  if (!prog || !prog->snapshot) return -1;
  PackState& ps = cached_state(ctx, idx, prog);
  const FrameProgram::Snapshot* s = ps.snap;
  const int32_t* slot_lut = aux;       // [17]: ref_dpb+1 -> ring slot
  // shared plans: reuse the caps call's (slots ride in the PU meta word)
  SegPlan* seg[2] = {&g_cache.seg[0], &g_cache.seg[1]};
  SegPlan local[2];
  for (int l = 0; l < 2; l++)
    if (!g_cache.seg_done[l]) {
      plan_segments(ps, l, local[l]);
      seg[l] = &local[l];
    }
  ResPlan res[4][3];
  bool res_done[4][3] = {};
  PcmPlan pcm;
  bool pcm_done = false;

  for (int e = 0; e < n_entries; e++) {
    const int32_t* en = entries + e * 8;
    int key = en[0], p0 = en[1], p1 = en[2];
    int64_t off = en[3];
    int d0 = en[4], d1 = en[5], d2 = en[6], d3 = en[7];
    int64_t total = (int64_t)std::max(d0, 1) * std::max(d1, 1) *
                    std::max(d2, 1) * std::max(d3, 1);
    if (d0 == 0) total = 0;
    if (off + total > out_len) return -2;
    int32_t* dst = out + off;
    switch (key) {
      case kKeyBinQp: {
        // TU meta, two per word: qp7 (signed) | flags6<<7 | mid3<<13
        const TuBin& b = ps.bins[p0 - 2];
        memset(dst, 0, total * 4);
        for (size_t i = 0; i < b.qp.size(); i++) {
          int32_t h = (b.qp[i] & 0x7F) | ((b.flags[i] & 0x3F) << 7) |
                      ((b.mid[i] & 7) << 13);
          dst[i >> 1] |= h << (16 * (i & 1));
        }
        break;
      }
      case kKeyBinCv: {
        const TuBin& b = ps.bins[p0 - 2];
        memset(dst, 0, total * 4);
        memcpy(dst, b.cv.data(), b.cv.size() * 4);
        break;
      }
      case kKeyBinCoff: {
        // [tcap + 1] row start offsets; rows beyond the bin's TU count
        // hold the total so the device-side searchsorted maps padding
        // past the last used coefficient
        const TuBin& b = ps.bins[p0 - 2];
        int32_t tot = b.coff.empty() ? 0 : b.coff.back();
        size_t n = b.coff.size();
        memcpy(dst, b.coff.data(), n * 4);
        if (b.coff.empty()) {
          dst[0] = 0;
          n = 1;
        }
        for (int64_t i = (int64_t)n; i < total; i++) dst[i] = tot;
        break;
      }
      case kKeyBinCfx: {
        const TuBin& b = ps.bins[p0 - 2];
        for (int64_t i = 0; i < total; i++) dst[i] = -1;
        memcpy(dst, b.cfx.data(), b.cfx.size() * 4);
        break;
      }
      case kKeyBinCfv: {
        const TuBin& b = ps.bins[p0 - 2];
        memset(dst, 0, total * 4);
        memcpy(dst, b.cfv.data(), b.cfv.size() * 4);
        break;
      }
      case kKeyResN:
      case kKeyResSw: {
        ResPlan& rp = res[p0 - 2][p1];
        if (!res_done[p0 - 2][p1]) {
          plan_residual(ps, p0, p1, rp);
          res_done[p0 - 2][p1] = true;
        }
        if (key == kKeyResN) {
          memcpy(dst, rp.counts.data(),
                 std::min<int64_t>(total, rp.counts.size()) * 4);
        } else {
          memset(dst, 0, total * 4);
          // dst is [n_bands, K]; scatter by (band, k) arrival order
          std::vector<int32_t> kc(ps.n_bands, 0);
          for (size_t i = 0; i < rp.srow.size(); i++) {
            int band = rp.band_of[i];
            dst[(int64_t)band * d1 + kc[band]++] =
                (rp.srow[i] & 0xFFFFF) | (((rp.x0[i] >> 1) & 0xFFF) << 20);
          }
        }
        break;
      }
      case kKeySegN:
      case kKeySegIdx: {
        const SegPlan& sp = *seg[p0];
        if (key == kKeySegN) {
          memcpy(dst, sp.counts.data(),
                 std::min<int64_t>(total, sp.counts.size()) * 4);
        } else {
          // two 16-bit PU indices per word (dst is [n_bands, ceil(K/2)])
          memset(dst, 0, total * 4);
          for (size_t i = 0; i < sp.puidx.size(); i++) {
            int k = sp.k_of[i];
            dst[(int64_t)sp.band_of[i] * d1 + (k >> 1)] |=
                sp.puidx[i] << (16 * (k & 1));
          }
        }
        break;
      }
      case kKeyIrec: {
        // wire-compact column-major records (fused_decode._pack_irec):
        // w0 = mode|edge<<6|flags<<10|cidx<<14|lg<<16|step<<19,
        // w1 = y|x<<16, w2 = rrow|slot<<22, w3..w7 = availability words
        memset(dst, 0, total * 4);
        const auto& intras = prog->intras;
        const int64_t nc = d1;  // column capacity
        for (size_t i = 0; i < intras.size(); i++) {
          const IntraRec& rec = intras[i];
          int fl = (int)s->ip_flags[i] | 8;
          dst[i] = rec.mode | (s->ip_edge[i] << 6) | (fl << 10) |
                   (rec.cidx << 14) | (rec.log2_size << 16) |
                   ((int32_t)s->ip_step[i] << 19);
          dst[nc + i] = rec.y | ((int32_t)rec.x << 16);
          dst[2 * nc + i] =
              (s->ip_rrow[i] + 1) | ((int32_t)s->ip_slot[i] << 22);
          // availability bitmask from the substitution chain
          int nb = 4 * (1 << rec.log2_size) + 1;
          const int32_t* bsub = s->ip_border_sub.data() + s->ip_border_off[i];
          if ((fl & 1) == 0) {
            for (int k = 0; k < nb; k++)
              if (bsub[k] == k)
                dst[(3 + (k >> 5)) * nc + i] |= 1 << (k & 31);
          }
        }
        break;
      }
      case kKeyNsteps: {
        int pc_steps[3] = {0, 0, 0};
        for (size_t i = 0; i < prog->intras.size(); i++) {
          int c = prog->intras[i].cidx;
          if (c < 3)
            pc_steps[c] = std::max(pc_steps[c], (int)s->ip_step[i] + 1);
        }
        for (int c = 0; c < 3; c++) dst[c] = pc_steps[c];
        break;
      }
      case kKeyPcm: {
        if (!pcm_done) {
          plan_pcm(ps, pcm);
          pcm_done = true;
        }
        int c = p0;
        for (int64_t i = 0; i < total; i++) dst[i] = kPcmFill;
        for (size_t i = 0; i < pcm.idx[c].size(); i++) {
          dst[i * 2] = pcm.idx[c][i];
          dst[i * 2 + 1] = pcm.val[c][i];
        }
        break;
      }
      case kKeySliceRecs: {
        memset(dst, 0, total * 4);
        memcpy(dst, s->slice_records.data(), s->slice_records.size() * 4);
        break;
      }
      case kKeyPu: {
        // 5 words per PU: mv0 (x|y<<16), mv1, meta, slice,
        // geo (x/4 | y/4<<11 | (w/4-1)<<22 | (h/4-1)<<27)
        memset(dst, 0, total * 4);
        const auto& pus = prog->pus;
        for (size_t i = 0; i < pus.size(); i++) {
          const PuRec& p = pus[i];
          int32_t* r = dst + i * 5;
          r[0] = ((int32_t)p.mv[0].x & 0xFFFF) | ((int32_t)p.mv[0].y << 16);
          r[1] = ((int32_t)p.mv[1].x & 0xFFFF) | ((int32_t)p.mv[1].y << 16);
          int32_t meta = p.pred_flags & 3;
          for (int l = 0; l < 2; l++) {
            int v = p.ref_dpb[l];
            int slot = slot_lut[std::min(std::max(v + 1, 0), 16)];
            meta |= (slot & 63) << (2 + 6 * l);
            meta |= (std::max((int)p.ref_idx[l], 0) & 15) << (14 + 4 * l);
          }
          r[2] = meta;
          r[3] = p.slice;
          r[4] = ((int32_t)p.x >> 2) | (((int32_t)p.y >> 2) << 11) |
                 ((((int32_t)p.w >> 2) - 1) << 22) |
                 ((((int32_t)p.h >> 2) - 1) << 27);
        }
        break;
      }
      case kKeyPuIdx:
        memcpy(dst, s->pu_idx.data(), s->pu_idx.size() * 4);
        break;
      case kKeyG4: {
        // p1=2: halfword pairs (qp8 | nzc1<<8 | dbf4<<9 | cu3<<13), two
        // horizontally adjacent cells per word; pu_idx is painted on
        // device from the segment index feed.  p1<2: legacy word grid
        // (qp8|nzc1|dbf4|cu4 [| pu_idx+1<<17 when p1=1]).
        auto cell = [&](size_t i, int cumask) {
          return ((int32_t)(u8)s->qp_y[i]) |
                 (((int32_t)s->nonzero_coeff[i] & 1) << 8) |
                 (((int32_t)s->deblock_flags[i] & 0xF) << 9) |
                 (((int32_t)s->cu_info[i] & cumask) << 13);
        };
        if (p1 == 2) {
          memset(dst, 0, total * 4);
          int pbw = (int)(s->qp_y.size() / std::max(d0, 1));
          for (int r = 0; r < d0; r++)
            for (int c = 0; c < pbw; c++) {
              size_t i = (size_t)r * pbw + c;
              dst[(int64_t)r * d1 + (c >> 1)] |= cell(i, 0x7)
                  << (16 * (c & 1));
            }
        } else {
          for (size_t i = 0; i < s->qp_y.size(); i++) {
            int32_t g = cell(i, 0xF);
            if (p1) g |= (s->pu_idx[i] + 1) << 17;
            dst[i] = g;
          }
        }
        break;
      }
      case kKeySliceIdx:
        for (size_t i = 0; i < s->slice_idx.size(); i++)
          dst[i] = s->slice_idx[i];
        break;
      case kKeySliceAddr:
        memcpy(dst, s->slice_addr.data(), s->slice_addr.size() * 4);
        break;
      case kKeyTileId:
        memcpy(dst, s->tile_id.data(), s->tile_id.size() * 4);
        break;
      case kKeySaoT:
      case kKeySaoEo:
      case kKeySaoBand: {
        size_t n = s->sao.size();
        if (n == 0) {
          memset(dst, 0, total * 4);
          break;
        }
        for (size_t i = 0; i < n; i++) {
          const SaoParams& sp = s->sao[i];
          const u8* v = (key == kKeySaoT)    ? sp.type_idx
                        : (key == kKeySaoEo) ? sp.eo_class
                                             : sp.band_pos;
          dst[i * 3] = v[0];
          dst[i * 3 + 1] = v[1];
          dst[i * 3 + 2] = v[2];
        }
        break;
      }
      case kKeySaoOff: {
        size_t n = s->sao.size();
        if (n == 0) {
          memset(dst, 0, total * 4);
          break;
        }
        for (size_t i = 0; i < n; i++) {
          const SaoParams& sp = s->sao[i];
          for (int c = 0; c < 3; c++)
            for (int j = 0; j < 4; j++)
              dst[(i * 3 + c) * 4 + j] = sp.offset[c][j];
        }
        break;
      }
      default:
        return -3;
    }
  }
  return 0;
}

// Sparse-upload block compaction: scan `buf` (total_words int32) in blocks
// of B words, copy the nonzero blocks contiguously into out_blocks and
// their block indices into out_idx, then zero-pad the block count up to a
// multiple of round_to (pad idx = 1<<30, matching the device expander's
// drop sentinel).  Returns the padded block count M, or -1 if M would
// exceed out_cap_blocks (caller falls back to a dense upload).  The OR
// reduction auto-vectorizes under -march=native; the scan+copy replaces a
// ~15 ms/frame numpy reduction at 1080p with <1 ms.
LIBDE265_API int64_t tde265_compact_blocks(const int32_t* buf,
                                           int64_t total_words, int32_t B,
                                           int32_t round_to,
                                           int32_t* out_blocks,
                                           int32_t* out_idx,
                                           int64_t out_cap_blocks) {
  if (B <= 0 || round_to <= 0) return -1;
  const int64_t nb = (total_words + B - 1) / B;
  int64_t m = 0;
  for (int64_t b = 0; b < nb; b++) {
    const int32_t* src = buf + b * B;
    const int64_t n = std::min<int64_t>(B, total_words - b * B);
    int32_t acc = 0;
    for (int64_t i = 0; i < n; i++) acc |= src[i];
    if (!acc) continue;
    if (m >= out_cap_blocks) return -1;
    memcpy(out_blocks + m * B, src, n * 4);
    if (n < B) memset(out_blocks + m * B + n, 0, (B - n) * 4);
    out_idx[m] = (int32_t)b;
    m++;
  }
  int64_t M = ((m + round_to - 1) / round_to) * round_to;
  if (M == 0) M = round_to;
  if (M > out_cap_blocks) return -1;
  if (M > m) {
    memset(out_blocks + m * B, 0, (M - m) * B * 4);
    for (int64_t i = m; i < M; i++) out_idx[i] = 1 << 30;
  }
  return M;
}

}  // extern "C"
