"""Device-resident end-to-end decode path.

The host does what is inherently serial — NAL/CABAC/syntax parsing in the
native C++ front end, producing a FrameProgram — and everything with pixel
shape runs on the device from a single packed upload per picture:

  1. inter MC gathers directly from a device-resident DPB (reference planes
     never leave HBM) on a uniform per-4x4-cell grid: one gather builds all
     interpolation windows, the 8-tap/4-tap separable filters and the
     weighted-prediction merge are fused elementwise programs over the grid
     (replaces the reference's per-PU acceleration calls,
     /root/reference/libde265/motion.cc:288, and round-1's host window loop);
  2. TU residuals: size-binned batched dequant+IDCT (ops.transform) with the
     inter residuals scatter-added into the prediction planes on device;
  3. intra blocks: wavefront-batched device kernels (ops.intra_wave) with the
     residual blocks gathered from the device bin outputs;
  4. deblock + SAO: whole-picture passes with the edge-parameter derivation
     traced into the same jit program (ports ops.deblock.derive_edge_params
     to jnp).

Per-stream geometry compiles once; per-frame work is one packed host->device
transfer plus kernel launches.  Output planes stay in HBM and serve as
references for later pictures; only pictures the caller asks for are copied
back.

Correctness oracle: bit-exact vs the scalar C++ backend (tests/test_tpu_decode.py).
Exotic RExt features that do not occur on the production path (cross-component
prediction, RDPCM) fall back to pipeline.reconstruct for that picture.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pipeline
from .decoder import (OP_INTRA, OP_RESIDUAL, TU_INTRA, TU_RDPCM,
                      TU_TQ_BYPASS, TU_TRANSFORM_SKIP, TU_USE_DST,
                      FrameProgramData)
from .ops import deblock as dbk
from .ops import intra_wave
from .ops import transform as tx
from .ops.intra import IntraContext
from .ops.mc import EPEL_FILTERS, QPEL_FILTERS
from .ops.sao import EO_D, EDGE_CAT

MAX_REFS = 8  # device DPB slots a single picture may read (stacked gather)


# ---------------------------------------------------------------------------
# host packing
# ---------------------------------------------------------------------------

def _paint_cell_grids(prog: FrameProgramData, slot_map):
    """Per-4x4-cell MC/deblock grids from the PU records.

    slot_map maps the program's ref_dpb slot -> index in the device ref
    stack.  Returns a dict of [H4, W4] int32 arrays.
    """
    pb_h = (prog.height + 3) // 4
    pb_w = (prog.width + 3) // 4
    g = {
        "pf": np.zeros((pb_h, pb_w), np.int32),
        "mv0x": np.zeros((pb_h, pb_w), np.int32),
        "mv0y": np.zeros((pb_h, pb_w), np.int32),
        "mv1x": np.zeros((pb_h, pb_w), np.int32),
        "mv1y": np.zeros((pb_h, pb_w), np.int32),
        "slot0": np.zeros((pb_h, pb_w), np.int32),
        "slot1": np.zeros((pb_h, pb_w), np.int32),
        "poc0": np.full((pb_h, pb_w), -(10 ** 6), np.int64),
        "poc1": np.full((pb_h, pb_w), -(10 ** 6), np.int64),
        "slice": np.zeros((pb_h, pb_w), np.int32),
    }
    for pu in prog.pus:
        x4, y4 = pu["x"] >> 2, pu["y"] >> 2
        w4, h4 = max(1, pu["w"] >> 2), max(1, pu["h"] >> 2)
        sl = (slice(y4, y4 + h4), slice(x4, x4 + w4))
        g["pf"][sl] = pu["pred_flags"]
        g["slice"][sl] = pu["slice"]
        for l in (0, 1):
            if not (pu["pred_flags"] >> l) & 1:
                continue
            g[f"mv{l}x"][sl] = pu[f"mv{l}x"]
            g[f"mv{l}y"][sl] = pu[f"mv{l}y"]
            g[f"slot{l}"][sl] = slot_map[int(pu[f"ref_dpb{l}"])]
            g[f"poc{l}"][sl] = prog.ref_pocs[int(pu[f"ref_dpb{l}"])]
    return g


def _weight_grids(prog: FrameProgramData, cells):
    """Per-cell weighted-prediction parameters (slice records gathered by the
    cell's slice + refIdx; program.h slice-record layout)."""
    recs = prog.slice_records
    sl = np.clip(cells["slice"], 0, len(recs) - 1)
    out = {"weighted": (recs[sl, 6] != 0).astype(np.int32),
           "denom_l": recs[sl, 7].astype(np.int32),
           "denom_c": recs[sl, 8].astype(np.int32)}
    # per-list refIdx grids
    pus = prog.pus
    pb_h, pb_w = cells["pf"].shape
    r = [np.zeros((pb_h, pb_w), np.int64), np.zeros((pb_h, pb_w), np.int64)]
    for pu in pus:
        x4, y4 = pu["x"] >> 2, pu["y"] >> 2
        w4, h4 = max(1, pu["w"] >> 2), max(1, pu["h"] >> 2)
        s = (slice(y4, y4 + h4), slice(x4, x4 + w4))
        r[0][s] = max(int(pu["ref_idx0"]), 0)
        r[1][s] = max(int(pu["ref_idx1"]), 0)
    for l in (0, 1):
        out[f"lw{l}"] = recs[sl, 16 + l * 16 + r[l]].astype(np.int32)
        out[f"lo{l}"] = recs[sl, 48 + l * 16 + r[l]].astype(np.int32)
        for c in (0, 1):
            out[f"cw{l}{c}"] = recs[sl, 80 + (l * 16 + r[l]) * 2 + c].astype(
                np.int32)
            out[f"co{l}{c}"] = recs[sl, 144 + (l * 16 + r[l]) * 2 + c].astype(
                np.int32)
    return out


def _pack_tu_bins(prog: FrameProgramData):
    """Size-binned TU batches (padded to powers of two for trace reuse).

    Returns (bins, tu_map) where bins[lg] holds the device inputs and
    tu_map[t] = (lg, row) locates TU t's residual in the bin output.
    """
    tus = prog.tus
    bins = {}
    tu_map = {}
    if len(tus) == 0:
        return bins, tu_map
    rdpcm_ts = ((tus["flags"] & TU_RDPCM) != 0)
    plain = ~rdpcm_ts  # bypass handled on device (residual = levels)
    for lg in (2, 3, 4, 5):
        sel = np.nonzero((tus["log2_size"] == lg) & plain)[0]
        if len(sel) == 0:
            continue
        n = len(sel)
        cap = 1 << max(0, int(n - 1).bit_length())
        levels = np.zeros((cap, 1 << lg, 1 << lg), np.int32)
        levels[:n] = tx.scatter_coeffs(tus, prog.coeff_val, prog.coeff_pos,
                                       lg, sel)
        qp = np.zeros(cap, np.int32)
        qp[:n] = tus["qp"][sel]
        flags = np.zeros(cap, np.uint8)
        flags[:n] = tus["flags"][sel]
        cidx = np.zeros(cap, np.int32)
        cidx[:n] = tus["cidx"][sel]
        b = {"levels": levels, "qp": qp,
             "tskip": (flags & TU_TRANSFORM_SKIP) != 0,
             "use_dst": (flags & TU_USE_DST) != 0,
             "bypass": (flags & TU_TQ_BYPASS) != 0,
             "intra": (flags & TU_INTRA) != 0,
             "cidx": cidx, "n": n}
        if prog.scaling_factors is not None:
            intra = b["intra"]
            if lg == 5:
                mid = np.where(intra, 0, 1)
            else:
                mid = cidx + np.where(intra, 0, 3)
            b["sf"] = prog.scaling_factors[lg][mid].astype(np.int32)
        # scatter targets for the *inter* TUs (intra handled by wavefront)
        inter = ~b["intra"][:n] & (tus["ncoeff"][sel] > 0)
        for key, m in (("y", inter & (cidx[:n] == 0)),
                       ("c", inter & (cidx[:n] != 0))):
            rows = np.nonzero(m)[0]
            b[f"sc_{key}_rows"] = rows.astype(np.int32)
            b[f"sc_{key}_x"] = tus["x"][sel[rows]].astype(np.int32)
            b[f"sc_{key}_y"] = tus["y"][sel[rows]].astype(np.int32)
            b[f"sc_{key}_c"] = cidx[rows].astype(np.int32)
        bins[lg] = b
        for row, t in enumerate(sel):
            tu_map[int(t)] = (lg, row)
    return bins, tu_map


def _residual_bin(b, lg, bd, scaling):
    """Device residuals for one size bin (dequant+IDCT / skip / bypass)."""
    if scaling:
        res = tx.residual_batch(jnp.asarray(b["levels"]),
                                tx.qp_to_fact(jnp.asarray(b["qp"])),
                                jnp.asarray(b["tskip"]),
                                jnp.asarray(b["use_dst"]), lg, bd,
                                sf=jnp.asarray(b["sf"]),
                                qp=jnp.asarray(b["qp"]))
    else:
        res = tx.residual_batch(jnp.asarray(b["levels"]),
                                tx.qp_to_fact(jnp.asarray(b["qp"])),
                                jnp.asarray(b["tskip"]),
                                jnp.asarray(b["use_dst"]), lg, bd)
    # transquant bypass: residual = raw levels
    return jnp.where(jnp.asarray(b["bypass"])[:, None, None],
                     jnp.asarray(b["levels"]), res)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _wrap16(v):
    return (v.astype(jnp.int32) << 16) >> 16


def _mc_plane(ref_stack, slot, xint, yint, frac_x, frac_y, filters, taps,
              bs: int, bd: int):
    """Interpolate a [H4*W4, bs, bs] block batch from the stacked refs.

    ref_stack: [R, Hp, Wp] int32; per-cell integer positions and fractions.
    Returns int16-scaled predictions [N, bs, bs] (int32 dtype).
    """
    R, Hp, Wp = ref_stack.shape
    N = slot.shape[0]
    wn = bs + taps - 1
    center = taps // 2 - 1
    iy = jnp.clip(yint[:, None] - center + jnp.arange(wn)[None, :], 0, Hp - 1)
    ix = jnp.clip(xint[:, None] - center + jnp.arange(wn)[None, :], 0, Wp - 1)
    flat = ref_stack.reshape(-1)
    idx = (slot[:, None, None] * (Hp * Wp) + iy[:, :, None] * Wp +
           ix[:, None, :])
    win = flat[idx]  # [N, wn, wn]

    f_h = filters[frac_x]  # [N, taps]
    f_v = filters[frac_y]
    shift1 = bd - 8
    shift3 = 14 - bd
    th = sum(f_h[:, k, None, None] * win[:, :, k:k + bs] for k in range(taps))
    th_s1 = _wrap16(th >> shift1)
    tv = sum(f_v[:, k, None, None] * win[:, k:k + bs, center:center + bs]
             for k in range(taps))
    tv_s1 = _wrap16(tv >> shift1)
    hv = sum(f_v[:, k, None, None] * th_s1[:, k:k + bs, :]
             for k in range(taps))
    hv = _wrap16(hv >> 6)
    full = _wrap16(win[:, center:center + bs, center:center + bs] << shift3)
    h_only = th_s1[:, center:center + bs, :]
    fx_b = (frac_x != 0)[:, None, None]
    fy_b = (frac_y != 0)[:, None, None]
    return jnp.where(fx_b & fy_b, hv,
                     jnp.where(fx_b, h_only, jnp.where(fy_b, tv_s1, full)))


def _merge(p0, p1, bi, weighted, w0, o0, w1, o1, denom, bd: int):
    """Weighted/default prediction merge on per-cell block batches."""
    maxv = (1 << bd) - 1
    shift1 = 14 - bd
    shift2 = 15 - bd
    uni_def = jnp.clip((p0 + (1 << (shift1 - 1))) >> shift1, 0, maxv)
    bi_def = jnp.clip((p0 + p1 + (1 << (shift2 - 1))) >> shift2, 0, maxv)
    lwd = (denom + shift1)[:, None, None]
    w0b, w1b = w0[:, None, None], w1[:, None, None]
    o0b, o1b = o0[:, None, None], o1[:, None, None]
    uni_w = jnp.clip(((p0 * w0b + (1 << (lwd - 1))) >> lwd) + o0b, 0, maxv)
    bi_w = jnp.clip((p0 * w0b + p1 * w1b + ((o0b + o1b + 1) << lwd)) >>
                    (lwd + 1), 0, maxv)
    bi_b = bi[:, None, None]
    wt_b = weighted[:, None, None].astype(bool)
    return jnp.where(wt_b, jnp.where(bi_b, bi_w, uni_w),
                     jnp.where(bi_b, bi_def, uni_def))


def _cells_to_plane(blocks, H4, W4, bs):
    return blocks.reshape(H4, W4, bs, bs).transpose(0, 2, 1, 3).reshape(
        H4 * bs, W4 * bs)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "sub_x", "sub_y", "bd", "bdc", "use_l1"))
def _mc_kernel(refs_y, refs_cb, refs_cr, cg, wg, H: int, W: int, sub_x: int,
               sub_y: int, bd: int, bdc: int, use_l1: bool):
    """Whole-picture inter prediction on the 4x4 cell grid.

    refs_*: [R, Hp, Wp] stacked device references.  cg/wg: cell/weight grid
    dicts (flattened [N] per-cell arrays).  Returns (y, cb, cr) planes with
    predictions at inter cells and zeros elsewhere, plus the inter mask.
    """
    H4, W4 = H // 4, W // 4
    N = H4 * W4
    qf = jnp.asarray(QPEL_FILTERS)
    ef = jnp.asarray(EPEL_FILTERS)
    cy = (jnp.arange(N) // W4) * 4
    cx = (jnp.arange(N) % W4) * 4
    shx = 3 if sub_x == 2 else 2
    shy = 3 if sub_y == 2 else 2
    cs = 4 // sub_x
    csv = 4 // sub_y

    preds_l = []
    preds_cb = []
    preds_cr = []
    for l in (0, 1) if use_l1 else (0,):
        mvx, mvy = cg[f"mv{l}x"], cg[f"mv{l}y"]
        slot = cg[f"slot{l}"]
        xint = cx + (mvx >> 2)
        yint = cy + (mvy >> 2)
        preds_l.append(_mc_plane(refs_y, slot, xint, yint, mvx & 3, mvy & 3,
                                 qf, 8, 4, bd))
        cxc = cx // sub_x + (mvx >> shx)
        cyc = cy // sub_y + (mvy >> shy)
        fcx = (mvx & 7) if sub_x == 2 else ((mvx & 3) << 1)
        fcy = (mvy & 7) if sub_y == 2 else ((mvy & 3) << 1)
        preds_cb.append(_mc_plane(refs_cb, slot, cxc, cyc, fcx, fcy, ef, 4,
                                  cs, bdc)[:, :csv, :cs])
        preds_cr.append(_mc_plane(refs_cr, slot, cxc, cyc, fcx, fcy, ef, 4,
                                  cs, bdc)[:, :csv, :cs])

    pf = cg["pf"]
    bi = pf == 3
    first = jnp.where((pf & 1) != 0, 0, 1)
    if use_l1:
        p0_l = jnp.where(first[:, None, None] == 0, preds_l[0], preds_l[1])
        p1_l = preds_l[1]
        pcb0 = jnp.where(first[:, None, None] == 0, preds_cb[0], preds_cb[1])
        pcr0 = jnp.where(first[:, None, None] == 0, preds_cr[0], preds_cr[1])
        pcb1, pcr1 = preds_cb[1], preds_cr[1]
        w0 = jnp.where(first == 0, wg["lw0"], wg["lw1"])
        o0 = jnp.where(first == 0, wg["lo0"], wg["lo1"])
        cbw0 = jnp.where(first == 0, wg["cw00"], wg["cw10"])
        cbo0 = jnp.where(first == 0, wg["co00"], wg["co10"])
        crw0 = jnp.where(first == 0, wg["cw01"], wg["cw11"])
        cro0 = jnp.where(first == 0, wg["co01"], wg["co11"])
    else:
        p0_l, p1_l = preds_l[0], preds_l[0]
        pcb0 = pcb1 = preds_cb[0]
        pcr0 = pcr1 = preds_cr[0]
        w0, o0 = wg["lw0"], wg["lo0"]
        cbw0, cbo0 = wg["cw00"], wg["co00"]
        crw0, cro0 = wg["cw01"], wg["co01"]

    y_blk = _merge(p0_l, p1_l, bi, wg["weighted"], w0, o0, wg["lw1"],
                   wg["lo1"], wg["denom_l"], bd)
    cb_blk = _merge(pcb0, pcb1, bi, wg["weighted"], cbw0, cbo0, wg["cw10"],
                    wg["co10"], wg["denom_c"], bdc)
    cr_blk = _merge(pcr0, pcr1, bi, wg["weighted"], crw0, cro0, wg["cw11"],
                    wg["co11"], wg["denom_c"], bdc)

    y_plane = _cells_to_plane(y_blk, H4, W4, 4)[:H, :W]
    cb_plane = cb_blk.reshape(H4, W4, csv, cs).transpose(
        0, 2, 1, 3).reshape(H4 * csv, W4 * cs)
    cr_plane = cr_blk.reshape(H4, W4, csv, cs).transpose(
        0, 2, 1, 3).reshape(H4 * csv, W4 * cs)
    mask = (pf != 0).reshape(H4, W4)
    return y_plane, cb_plane[:H // sub_y, :W // sub_x], \
        cr_plane[:H // sub_y, :W // sub_x], mask


@functools.partial(jax.jit, static_argnames=("s",))
def _scatter_add(plane, blocks, rows, xs, ys, s: int):
    """Scatter-add [K, s, s] residual blocks (rows select from the bin
    output) into the plane; TUs are disjoint so adds never collide.
    Padded entries carry ys < 0 and are dropped by the OOB mode."""
    blk = jnp.where((ys >= 0)[:, None, None], blocks[rows], 0)
    iy = jnp.where(ys < 0, -(s + 1), ys)[:, None, None] + \
        jnp.arange(s)[None, :, None]
    ix = xs[:, None, None] + jnp.arange(s)[None, None, :]
    return plane.at[iy, ix].add(blk, mode="drop", unique_indices=True)


def _pad_pow2(a, fill=0):
    """Pad a 1-D array to the next power-of-two length (trace reuse)."""
    n = len(a)
    cap = 1 << max(0, int(n - 1).bit_length())
    if cap == n:
        return a
    return np.concatenate([a, np.full(cap - n, fill, a.dtype)])


# --- deblock: jnp port of ops.deblock.derive_edge_params -------------------

def _edge_params_jnp(meta, vertical: bool):
    h4, w4 = meta["intra"].shape
    if vertical:
        ex = jnp.arange(2, w4, 2)
        q = (slice(None), ex)
        p = (slice(None), ex - 1)
        tu_edge = meta["tu_edge_v"][q]
        pu_edge = meta["pu_edge_v"][q]
    else:
        ey = jnp.arange(2, h4, 2)
        q = (ey, slice(None))
        p = (ey - 1, slice(None))
        tu_edge = meta["tu_edge_h"][q]
        pu_edge = meta["pu_edge_h"][q]

    intra_p = meta["intra"][p].astype(bool)
    intra_q = meta["intra"][q].astype(bool)
    nz_p = meta["nzc"][p].astype(bool)
    nz_q = meta["nzc"][q].astype(bool)
    pf_p = meta["pf"][p]
    pf_q = meta["pf"][q]
    NOREF = jnp.int64(-(10 ** 6))
    rp = [None, None]
    rq = [None, None]
    mvp = [[None, None], [None, None]]
    mvq = [[None, None], [None, None]]
    for l in range(2):
        has_p = ((pf_p >> l) & 1).astype(bool)
        has_q = ((pf_q >> l) & 1).astype(bool)
        rp[l] = jnp.where(has_p, meta["rp"][l][p], NOREF)
        rq[l] = jnp.where(has_q, meta["rp"][l][q], NOREF)
        for c in range(2):
            mvp[l][c] = jnp.where(has_p, meta["mv"][l][c][p], 0)
            mvq[l][c] = jnp.where(has_q, meta["mv"][l][c][q], 0)

    def far(mpx, mpy, mqx, mqy):
        return (jnp.abs(mpx - mqx) >= 4) | (jnp.abs(mpy - mqy) >= 4)

    same_pics = (((rp[0] == rq[0]) & (rp[1] == rq[1])) |
                 ((rp[0] == rq[1]) & (rp[1] == rq[0])))
    straight = far(mvp[0][0], mvp[0][1], mvq[0][0], mvq[0][1]) | \
        far(mvp[1][0], mvp[1][1], mvq[1][0], mvq[1][1])
    crossed = far(mvp[0][0], mvp[0][1], mvq[1][0], mvq[1][1]) | \
        far(mvp[1][0], mvp[1][1], mvq[0][0], mvq[0][1])
    p_two_diff = rp[0] != rp[1]
    p0_matches_q0 = rp[0] == rq[0]
    mv_differs = jnp.where(p_two_diff,
                           jnp.where(p0_matches_q0, straight, crossed),
                           straight & crossed)
    mv_bs = jnp.where(same_pics, mv_differs, True).astype(jnp.int32)
    bs = jnp.where(intra_p | intra_q, 2,
                   jnp.where(tu_edge.astype(bool) & (nz_p | nz_q), 1, mv_bs))
    edge = (tu_edge | pu_edge).astype(bool)
    allow = (meta["allow_v"][q] if vertical else meta["allow_h"][q])
    bs = jnp.where(edge & allow.astype(bool), bs, 0)

    qp_p = meta["qp"][p].astype(jnp.int32)
    qp_q = meta["qp"][q].astype(jnp.int32)
    qp_l = (qp_p + qp_q + 1) >> 1
    bd = meta["bit_depth"]
    boff = meta["beta_off"][q]
    toff = meta["tc_off"][q]
    beta = jnp.asarray(dbk.BETA_TABLE)[jnp.clip(qp_l + boff, 0, 51)] << (bd - 8)
    tc = jnp.asarray(dbk.TC_TABLE)[
        jnp.clip(qp_l + 2 * (bs - 1) + toff, 0, 53)] << (bd - 8)
    return {"bs": bs.astype(jnp.int32), "beta": beta.astype(jnp.int32),
            "tc": tc.astype(jnp.int32), "qp_l": qp_l.astype(jnp.int32),
            "no_p": meta["unfilt"][p].astype(jnp.int32),
            "no_q": meta["unfilt"][q].astype(jnp.int32),
            "cqo": [meta["cqo0"][q], meta["cqo1"][q]],
            "tco": toff}


def _pad_edge0_cols(a, E):
    return jnp.concatenate(
        [jnp.zeros((a.shape[0], 1), a.dtype), a], axis=1)[:, :E]


def _chroma_qp_map(qpi, is420):
    if is420:
        return jnp.where(
            qpi < 30, qpi,
            jnp.where(qpi > 43, qpi - 6,
                      jnp.asarray(dbk.CHROMA_QP_TAB)[
                          jnp.clip(qpi - 30, 0, 13)]))
    return jnp.clip(qpi, 0, 51)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "sub_x", "sub_y", "bd", "bdc", "ctb_size",
                     "run_deblock", "run_sao", "mono"))
def _filter_kernel(y, cb, cr, meta, sao_maps, H: int, W: int, sub_x: int,
                   sub_y: int, bd: int, bdc: int, ctb_size: int,
                   run_deblock: bool, run_sao: bool, mono: bool = False):
    """Deblock (V+H, luma+chroma) then SAO, entirely on device."""
    has_chroma = not mono
    is420 = sub_x == 2 and sub_y == 2

    if run_deblock:
        Ev, Eh = W // 8, H // 8

        pv = _edge_params_jnp(meta, vertical=True)
        params_v = {k: _pad_edge0_cols(v, Ev) for k, v in pv.items()
                    if k not in ("cqo", "tco")}
        pad = jnp.zeros((H, W + 8), jnp.int32).at[:, 4:4 + W].set(y)
        y = dbk._luma_pass(pad, params_v["bs"], params_v["beta"],
                           params_v["tc"], params_v["no_p"],
                           params_v["no_q"], bit_depth=bd)[:, 4:4 + W]
        if has_chroma:
            segs = jnp.arange(0, Ev, sub_x)
            cqo = [_pad_edge0_cols(c, Ev) for c in pv["cqo"]]
            tco = _pad_edge0_cols(
                jnp.broadcast_to(pv["tco"], pv["bs"].shape), Ev)
            Ec = (W // sub_x) // 8
            for ci, plane in enumerate((cb, cr)):
                qpi = params_v["qp_l"][:, segs] + cqo[ci][:, segs]
                qpc = _chroma_qp_map(qpi, is420)
                tc_c = jnp.asarray(dbk.TC_TABLE)[
                    jnp.clip(qpc + 2 + tco[:, segs], 0, 53)] << (bdc - 8)
                tc_c = jnp.where(params_v["bs"][:, segs] == 2, tc_c, 0)
                Hc = H // sub_y
                padc = jnp.zeros((Hc, W // sub_x + 8), jnp.int32)
                padc = padc.at[:, 2:2 + W // sub_x].set(plane)
                out = dbk._chroma_pass(padc, tc_c[:, :Ec],
                                       params_v["no_p"][:, segs][:, :Ec],
                                       params_v["no_q"][:, segs][:, :Ec],
                                       bit_depth=bdc,
                                       rows_per_seg=4 // sub_y)
                if ci == 0:
                    cb = out[:, 2:2 + W // sub_x]
                else:
                    cr = out[:, 2:2 + W // sub_x]

        ph = _edge_params_jnp(meta, vertical=False)

        def _pad0_rows(a):
            return jnp.concatenate(
                [jnp.zeros((1, a.shape[1]), a.dtype), a], axis=0)[:Eh]

        ph_t = {k: _pad0_rows(v).T for k, v in ph.items()
                if k not in ("cqo", "tco")}
        pad = jnp.zeros((W, H + 8), jnp.int32).at[:, 4:4 + H].set(y.T)
        y = dbk._luma_pass(pad, ph_t["bs"], ph_t["beta"], ph_t["tc"],
                           ph_t["no_p"], ph_t["no_q"],
                           bit_depth=bd)[:, 4:4 + H].T
        if has_chroma:
            segs_h = jnp.arange(0, Eh, sub_y)
            cqo_h = [_pad0_rows(jnp.broadcast_to(c, ph["bs"].shape)).T
                     for c in ph["cqo"]]
            tco_h = _pad0_rows(
                jnp.broadcast_to(ph["tco"], ph["bs"].shape)).T
            Ech = (H // sub_y) // 8
            for ci, plane in enumerate((cb, cr)):
                qpi = ph_t["qp_l"][:, segs_h] + cqo_h[ci][:, segs_h]
                qpc = _chroma_qp_map(qpi, is420)
                tc_c = jnp.asarray(dbk.TC_TABLE)[
                    jnp.clip(qpc + 2 + tco_h[:, segs_h], 0, 53)] << (bdc - 8)
                tc_c = jnp.where(ph_t["bs"][:, segs_h] == 2, tc_c, 0)
                Wc = W // sub_x
                padc = jnp.zeros((Wc, H // sub_y + 8), jnp.int32)
                padc = padc.at[:, 2:2 + H // sub_y].set(plane.T)
                out = dbk._chroma_pass(padc, tc_c[:, :Ech],
                                       ph_t["no_p"][:, segs_h][:, :Ech],
                                       ph_t["no_q"][:, segs_h][:, :Ech],
                                       bit_depth=bdc,
                                       rows_per_seg=4 // sub_x)
                if ci == 0:
                    cb = out[:, 2:2 + H // sub_y].T
                else:
                    cr = out[:, 2:2 + H // sub_y].T

    if run_sao:
        planes = [y, cb, cr] if has_chroma else [y]
        skip4 = meta["unfilt"]
        for c in range(len(planes)):
            Hc = H if c == 0 else H // sub_y
            Wc = W if c == 0 else W // sub_x
            cs_y = ctb_size if c == 0 else ctb_size // sub_y
            cs_x = ctb_size if c == 0 else ctb_size // sub_x
            m = sao_maps[c]

            def up(a, r_y, r_x, Hc=Hc, Wc=Wc):
                return jnp.repeat(jnp.repeat(a, r_y, 0), r_x, 1)[:Hc, :Wc]

            tmap = up(m["type"] * m["on"], cs_y, cs_x)
            emap = up(m["eo"], cs_y, cs_x)
            bmap = up(m["band"], cs_y, cs_x)
            omap = jnp.repeat(jnp.repeat(m["off"], cs_y, 0), cs_x, 1)[:Hc, :Wc]
            skip = up(skip4.astype(bool), 4 // (sub_y if c else 1),
                      4 // (sub_x if c else 1))
            from .ops.sao import sao_plane
            planes[c] = sao_plane(planes[c], tmap, emap, bmap, omap, skip,
                                  bit_depth=(bd if c == 0 else bdc),
                                  edge_ok=m["edge_ok"])
        y = planes[0]
        if has_chroma:
            cb, cr = planes[1], planes[2]

    return y, cb, cr


# ---------------------------------------------------------------------------
# the decoder
# ---------------------------------------------------------------------------

class DeviceDecoder:
    """Reconstructs FramePrograms with a device-resident DPB.

    Usage:
        dd = DeviceDecoder()
        planes = dd.decode(prog)          # device arrays; cached by POC
        np_planes = [np.asarray(p) for p in planes]   # only when needed
    """

    def __init__(self, run_deblock=True, run_sao=True):
        self.run_deblock = run_deblock
        self.run_sao = run_sao
        self.dpb = {}     # poc -> (y, cb, cr) device arrays
        self._order = []  # insertion order for eviction

    def _refs(self, prog):
        """Device ref stacks + slot map (program slot -> stack row)."""
        pocs = list(prog.ref_pocs)
        slot_map = {}
        stack = [[], [], []]
        for i, poc in enumerate(pocs[:MAX_REFS]):
            if poc in self.dpb:
                planes = self.dpb[poc]
            elif (i < len(prog.ref_planes) and prog.ref_planes[i] and
                  prog.ref_planes[i][0] is not None):
                # cold start (seek): upload the snapshot copy
                planes = [jnp.asarray(p.astype(np.int32))
                          for p in prog.ref_planes[i] if p is not None]
            else:
                # parse-only snapshot with a reference we never decoded
                # (stream starts mid-GOP): gray concealment
                planes = [jnp.full((prog.height, prog.width), 1 <<
                                   (prog.bit_depth[0] - 1), jnp.int32)]
                if prog.chroma_width:
                    for c in (1, 2):
                        planes.append(jnp.full(
                            (prog.chroma_height, prog.chroma_width),
                            1 << (prog.bit_depth[c] - 1), jnp.int32))
            slot_map[i] = len(stack[0])
            for c in range(3):
                stack[c].append(planes[c] if c < len(planes)
                                else jnp.zeros((1, 1), jnp.int32))
        if not stack[0]:
            z = jnp.zeros((max(prog.height, 1), max(prog.width, 1)),
                          jnp.int32)
            zc = jnp.zeros((max(prog.chroma_height, 1),
                            max(prog.chroma_width, 1)), jnp.int32)
            stack = [[z], [zc], [zc]]
            slot_map[0] = 0
        return ([jnp.stack(s) for s in stack], slot_map)

    def decode(self, prog: FrameProgramData):
        # exotic-feature fallback: host pipeline, then park on device
        if (len(prog.tus) and
                ((prog.tus["cross_comp_scale"] != 0).any() or
                 ((prog.tus["flags"] & TU_RDPCM) != 0).any())):
            planes = pipeline.reconstruct(prog, self.run_deblock,
                                          self.run_sao, device_intra=False)
            out = tuple(jnp.asarray(np.asarray(p)) for p in planes)
            self._store(prog.poc, out)
            return out

        H, W = prog.height, prog.width
        has_chroma = prog.chroma_width > 0
        sub_x = W // prog.chroma_width if has_chroma else 0
        sub_y = H // prog.chroma_height if has_chroma else 0
        bd = prog.bit_depth[0]
        bdc = prog.bit_depth[1] if has_chroma else bd

        # ---- host packing ----
        (refs, slot_map) = self._refs(prog)
        cells = _paint_cell_grids(prog, slot_map)
        wg = _weight_grids(prog, cells)
        bins, tu_map = _pack_tu_bins(prog)
        use_l1 = bool((cells["pf"] & 2).any())
        cg_flat = {k: jnp.asarray(v.reshape(-1))
                   for k, v in cells.items() if k.startswith(("mv", "slot",
                                                              "pf"))}
        wg_flat = {k: jnp.asarray(v.reshape(-1)) for k, v in wg.items()}

        # ---- device: residual bins ----
        scaling = prog.scaling_factors is not None
        bin_res = {lg: _residual_bin(b, lg, bd, scaling)
                   for lg, b in bins.items()}

        # ---- device: inter prediction ----
        if len(prog.pus):
            y, cbp, crp, mask = _mc_kernel(
                refs[0], refs[1] if has_chroma else refs[0],
                refs[2] if has_chroma else refs[0], cg_flat, wg_flat,
                H=H, W=W, sub_x=max(sub_x, 1), sub_y=max(sub_y, 1), bd=bd,
                bdc=bdc, use_l1=use_l1)
            m = jnp.repeat(jnp.repeat(mask, 4, 0), 4, 1)[:H, :W]
            y = jnp.where(m, y, 0)
            if has_chroma:
                mc_ = jnp.repeat(jnp.repeat(mask, 4 // sub_y, 0),
                                 4 // sub_x, 1)[:H // sub_y, :W // sub_x]
                cbp = jnp.where(mc_, cbp, 0)
                crp = jnp.where(mc_, crp, 0)
        else:
            y = jnp.zeros((H, W), jnp.int32)
            cbp = jnp.zeros((H // max(sub_y, 1), W // max(sub_x, 1)),
                            jnp.int32) if has_chroma else None
            crp = jnp.zeros_like(cbp) if has_chroma else None

        planes = [y, cbp, crp] if has_chroma else [y]

        # ---- device: inter residual scatter + clip ----
        for lg, b in bins.items():
            s = 1 << lg
            if len(b["sc_y_rows"]):
                planes[0] = _scatter_add(
                    planes[0], bin_res[lg],
                    jnp.asarray(_pad_pow2(b["sc_y_rows"])),
                    jnp.asarray(_pad_pow2(b["sc_y_x"])),
                    jnp.asarray(_pad_pow2(b["sc_y_y"], fill=-1)), s=s)
            if has_chroma and len(b["sc_c_rows"]):
                rows = b["sc_c_rows"]
                for c in (1, 2):
                    m = b["sc_c_c"] == c
                    if not m.any():
                        continue
                    planes[c] = _scatter_add(
                        planes[c], bin_res[lg],
                        jnp.asarray(_pad_pow2(rows[m])),
                        jnp.asarray(_pad_pow2(b["sc_c_x"][m])),
                        jnp.asarray(_pad_pow2(b["sc_c_y"][m], fill=-1)), s=s)
        planes[0] = jnp.clip(planes[0], 0, (1 << bd) - 1)
        if has_chroma:
            planes[1] = jnp.clip(planes[1], 0, (1 << bdc) - 1)
            planes[2] = jnp.clip(planes[2], 0, (1 << bdc) - 1)

        # ---- device: PCM scatter ----
        planes = self._pcm(prog, planes, sub_x, sub_y)

        # ---- device: intra wavefronts ----
        if len(prog.intras):
            ctx = IntraContext(W, H, prog.ctb_size, prog.cu_info,
                               slice_addr=prog.slice_addr,
                               tile_id=prog.tile_id)
            residual_handles = _DeviceResiduals(bin_res, tu_map)
            batches = intra_wave.plan_blocks(prog, ctx, residual_handles)
            for (wave, c, lgs), b in batches.items():
                s = 1 << lgs
                P0, P1, WT = intra_wave.build_mode_tables(s)
                if "resid_handles" in b:
                    resid = residual_handles.stack(b.pop("resid_handles"), s)
                else:  # batch of residual-less blocks (all-zero residuals)
                    resid = jnp.asarray(b["resid"])
                planes[c] = intra_wave.intra_wave_kernel(
                    planes[c], jnp.asarray(b["pos"]), jnp.asarray(b["subst"]),
                    jnp.asarray(b["unavail"]), jnp.asarray(b["filt"]),
                    jnp.asarray(b["strong"]), jnp.asarray(b["mode"]),
                    jnp.asarray(b["edge"]), resid, jnp.asarray(b["y0"]),
                    jnp.asarray(b["x0"]), jnp.asarray(b["valid"]),
                    jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(WT), s=s,
                    bit_depth=prog.bit_depth[c])

        # ---- device: loop filters ----
        if (self.run_deblock or self.run_sao) and len(prog.slice_records):
            meta, sao_maps = self._filter_meta(prog, cells, sub_x, sub_y, bd)
            y, cb, cr = _filter_kernel(
                planes[0], planes[1] if has_chroma else planes[0],
                planes[2] if has_chroma else planes[0], meta, sao_maps,
                H=H, W=W, sub_x=max(sub_x, 1), sub_y=max(sub_y, 1), bd=bd,
                bdc=bdc, ctb_size=prog.ctb_size,
                run_deblock=self.run_deblock and not bool(
                    np.all(prog.slice_records[:, 1])),
                run_sao=self.run_sao and bool(
                    np.any(prog.slice_records[:, 4] |
                           prog.slice_records[:, 5])),
                mono=not has_chroma)
            planes = [y, cb, cr] if has_chroma else [y]

        out = tuple(planes) if has_chroma else (planes[0],)
        self._store(prog.poc, out)
        return out

    # --- helpers ---

    def _pcm(self, prog, planes, sub_x, sub_y):
        if prog.pcms is None or len(prog.pcms) == 0:
            return planes
        # host-side index build (rare blocks), one scatter per channel
        sh_y = max(prog.bit_depth[0] - prog.pcm_bit_depth[0], 0)
        sh_c = max(prog.bit_depth[1] - prog.pcm_bit_depth[1], 0)
        data = prog.pcm_data.astype(np.int32)
        idx = [[], [], []]
        val = [[], [], []]
        for rec in prog.pcms:
            s = 1 << int(rec["log2_size"])
            p = int(rec["data_start"])
            x, y0 = int(rec["x"]), int(rec["y"])
            yy, xx = np.mgrid[y0:y0 + s, x:x + s]
            idx[0].append((yy * prog.width + xx).ravel())
            val[0].append(data[p:p + s * s] << sh_y)
            p += s * s
            if len(planes) > 1:
                cw, chh = s // sub_x, s // sub_y
                cx, cy = x // sub_x, y0 // sub_y
                for c in (1, 2):
                    yy, xx = np.mgrid[cy:cy + chh, cx:cx + cw]
                    idx[c].append((yy * prog.chroma_width + xx).ravel())
                    val[c].append(data[p:p + cw * chh] << sh_c)
                    p += cw * chh
        for c in range(len(planes)):
            if idx[c]:
                flat = planes[c].reshape(-1)
                flat = flat.at[jnp.asarray(np.concatenate(idx[c]))].set(
                    jnp.asarray(np.concatenate(val[c])))
                planes[c] = flat.reshape(planes[c].shape)
        return planes

    def _filter_meta(self, prog, cells, sub_x, sub_y, bd):
        recs = prog.slice_records
        pb_h, pb_w = prog.qp_y.shape
        cs4 = prog.ctb_size // 4
        cy = np.arange(pb_h) // cs4
        cx = np.arange(pb_w) // cs4
        sidx4 = np.clip(prog.slice_idx[cy[:, None], cx[None, :]].astype(
            np.int64), 0, len(recs) - 1)
        disabled4 = recs[sidx4, 1] != 0
        sa4 = prog.slice_addr[cy[:, None], cx[None, :]]
        ti4 = prog.tile_id[cy[:, None], cx[None, :]]
        across4 = recs[sidx4, 9] != 0

        def gate(axis):
            sp = np.roll(sa4, 1, axis=axis)
            tp = np.roll(ti4, 1, axis=axis)
            slice_ok = (sp == sa4) | across4
            tile_ok = prog.across_tiles | (tp == ti4)
            return slice_ok & tile_ok & ~disabled4

        flags = prog.deblock_flags
        meta = {
            "intra": jnp.asarray((prog.cu_info & 1).astype(np.int32)),
            "nzc": jnp.asarray((prog.nonzero_coeff & 1).astype(np.int32)),
            "tu_edge_v": jnp.asarray(((flags & 1) != 0).astype(np.int32)),
            "tu_edge_h": jnp.asarray(((flags & 2) != 0).astype(np.int32)),
            "pu_edge_v": jnp.asarray(((flags & 4) != 0).astype(np.int32)),
            "pu_edge_h": jnp.asarray(((flags & 8) != 0).astype(np.int32)),
            "qp": jnp.asarray(prog.qp_y.astype(np.int32)),
            "pf": jnp.asarray(cells["pf"][:pb_h, :pb_w]),
            "mv": [[jnp.asarray(cells[f"mv{l}x"][:pb_h, :pb_w]),
                    jnp.asarray(cells[f"mv{l}y"][:pb_h, :pb_w])]
                   for l in (0, 1)],
            "rp": [jnp.asarray(cells[f"poc{l}"][:pb_h, :pb_w])
                   for l in (0, 1)],
            "bit_depth": bd,
            "beta_off": jnp.asarray(recs[sidx4, 2].astype(np.int32)),
            "tc_off": jnp.asarray(recs[sidx4, 3].astype(np.int32)),
            "cqo0": jnp.asarray(recs[sidx4, 10].astype(np.int32)),
            "cqo1": jnp.asarray(recs[sidx4, 11].astype(np.int32)),
            "unfilt": jnp.asarray(
                pipeline._skip_filter_map4(prog).astype(np.int32)),
            "allow_v": jnp.asarray(gate(1).astype(np.int32)),
            "allow_h": jnp.asarray(gate(0).astype(np.int32)),
        }
        # fix mv grids: deblock expects per-component lists [l][c]
        meta["mv"] = [[meta["mv"][l][0], meta["mv"][l][1]] for l in (0, 1)]

        # SAO per-CTB maps (+ boundary mask when multi-slice/tile)
        sao_maps = []
        if prog.sao is not None and len(prog.sao):
            sao_on = [(recs[np.clip(prog.slice_idx, 0, len(recs) - 1), 4]
                       != 0),
                      (recs[np.clip(prog.slice_idx, 0, len(recs) - 1), 5]
                       != 0)]
            multi = (len(recs) > 1 and not np.all(recs[:, 9])) or \
                not prog.across_tiles
            for c in range(3 if sub_x else 1):
                types = prog.sao["type_idx"][:, c].reshape(prog.ctb_h,
                                                           prog.ctb_w)
                eocls = prog.sao["eo_class"][:, c].reshape(prog.ctb_h,
                                                           prog.ctb_w)
                bpos = prog.sao["band_pos"][:, c].reshape(prog.ctb_h,
                                                          prog.ctb_w)
                offs = prog.sao["offset"][:, c, :].reshape(prog.ctb_h,
                                                           prog.ctb_w, 4)
                on = sao_on[0 if c == 0 else 1].astype(np.int32)
                Hc = prog.height if c == 0 else prog.chroma_height
                Wc = prog.width if c == 0 else prog.chroma_width
                if multi:
                    from .ops.sao import edge_boundary_ok
                    cs = (prog.ctb_size if c == 0 else
                          (prog.ctb_size // sub_y, prog.ctb_size // sub_x))
                    cs_y, cs_x = ((cs, cs) if np.isscalar(cs) else cs)
                    emap = np.repeat(np.repeat(eocls, cs_y, 0), cs_x, 1)[
                        :Hc, :Wc]
                    eok = edge_boundary_ok(
                        emap, prog.slice_addr,
                        recs[np.clip(prog.slice_idx, 0, len(recs) - 1), 9]
                        != 0, prog.tile_id, prog.across_tiles, cs, Hc, Wc)
                else:
                    eok = np.ones((Hc, Wc), dtype=bool)
                sao_maps.append({
                    "type": jnp.asarray(types.astype(np.int32)),
                    "eo": jnp.asarray(eocls.astype(np.int32)),
                    "band": jnp.asarray(bpos.astype(np.int32)),
                    "off": jnp.asarray(offs.astype(np.int32)),
                    "on": jnp.asarray(on),
                    "edge_ok": jnp.asarray(eok),
                })
        else:
            for c in range(3 if sub_x else 1):
                Hc = prog.height if c == 0 else prog.chroma_height
                Wc = prog.width if c == 0 else prog.chroma_width
                sao_maps.append({
                    "type": jnp.zeros((prog.ctb_h, prog.ctb_w), jnp.int32),
                    "eo": jnp.zeros((prog.ctb_h, prog.ctb_w), jnp.int32),
                    "band": jnp.zeros((prog.ctb_h, prog.ctb_w), jnp.int32),
                    "off": jnp.zeros((prog.ctb_h, prog.ctb_w, 4), jnp.int32),
                    "on": jnp.zeros((prog.ctb_h, prog.ctb_w), jnp.int32),
                    "edge_ok": jnp.ones((Hc, Wc), dtype=bool),
                })
        return meta, sao_maps

    def _store(self, poc, planes):
        self.dpb[poc] = planes
        self._order.append(poc)
        while len(self._order) > 2 * MAX_REFS:
            old = self._order.pop(0)
            if old in self.dpb and old not in self._order:
                del self.dpb[old]


class _DeviceResiduals:
    """Residual source for intra_wave.plan_blocks backed by device bins.

    plan_blocks indexes `residuals[t]`; we hand back a lightweight handle and
    later stack the actual device rows per batch.
    """

    def __init__(self, bin_res, tu_map):
        self.bin_res = bin_res
        self.tu_map = tu_map

    def __getitem__(self, t):
        return _ResidualHandle(self.tu_map.get(int(t)))

    def get(self, t, default=None):
        return self[t]

    def stack(self, handles, s):
        """[N, s, s] device residual batch: one padded gather + scatter per
        source bin (fixed power-of-two shapes so traces are reused)."""
        N = len(handles)
        idxs = [(-1, -1) if (h is None or h.key is None) else h.key
                for h in handles]
        out = jnp.zeros((N, s, s), jnp.int32)
        for lg in sorted(set(lg for lg, _ in idxs if lg >= 0)):
            sel = np.array([i for i, (l, _) in enumerate(idxs) if l == lg],
                           np.int32)
            rows = np.array([r for (l, r) in idxs if l == lg], np.int32)
            # pad jointly; padded entries scatter out of bounds (dropped)
            sel_p = jnp.asarray(_pad_pow2(sel, fill=1 << 30))
            rows_p = jnp.asarray(_pad_pow2(rows))
            blk = self.bin_res[lg][rows_p]
            out = out.at[sel_p].set(blk, mode="drop")
        return out


class _ResidualHandle:
    def __init__(self, key):
        self.key = key
