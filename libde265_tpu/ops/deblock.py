"""Deblocking filter (spec 8.7.2) as whole-picture batched JAX passes.

Design: the boundary-strength / beta / tc per-edge-segment parameters are
derived on the host from the FrameProgram metadata grids (pure integer
vector math over small arrays); the pixel filtering runs on the device as
two full-picture passes (vertical then horizontal).  All edges within a pass
are independent (8 samples apart, each touching <=3 samples per side), so a
pass is one fused elementwise program over strided column views — no
dynamic control flow, TPU/VPU friendly.

Bit-exact counterpart of native/src/deblock.cc.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BETA_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7,
    8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32,
    34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64],
    dtype=np.int32)
TC_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
    4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24],
    dtype=np.int32)

CHROMA_QP_TAB = np.array([29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37,
                          37], dtype=np.int32)


def derive_edge_params(meta, vertical: bool):
    """Host derivation of per-4-sample-segment edge parameters.

    meta: dict with per-4x4 grids (intra, nzc, tu_edge_v/h, pu_edge_v/h,
    qp, pf, mv[2][2], rp[2]) plus slice params (beta_off, tc_off, disabled)
    and bit depth.  Returns dict of [n_seg_rows, n_edges] int32 arrays:
    bs, beta, tc, plus chroma tc for the chroma-grid edges.
    """
    h4, w4 = meta["intra"].shape
    if vertical:
        # edges at x4 = 2,4,... (x=8k, k>=1); segments: every y4
        ex = np.arange(2, w4, 2)
        q = (slice(None), ex)
        p = (slice(None), ex - 1)
        tu_edge = meta["tu_edge_v"][q]
        pu_edge = meta["pu_edge_v"][q]
    else:
        ey = np.arange(2, h4, 2)
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
    NOREF = np.int64(-(10 ** 6))
    rp = [None, None]
    rq = [None, None]
    mvp = [[None, None], [None, None]]
    mvq = [[None, None], [None, None]]
    for l in range(2):
        has_p = (pf_p >> l) & 1
        has_q = (pf_q >> l) & 1
        rp[l] = np.where(has_p.astype(bool), meta["rp"][l][p], NOREF)
        rq[l] = np.where(has_q.astype(bool), meta["rp"][l][q], NOREF)
        for c in range(2):
            mvp[l][c] = np.where(has_p.astype(bool), meta["mv"][l][c][p], 0)
            mvq[l][c] = np.where(has_q.astype(bool), meta["mv"][l][c][q], 0)

    def far(mpx, mpy, mqx, mqy):
        return (np.abs(mpx - mqx) >= 4) | (np.abs(mpy - mqy) >= 4)

    same_pics = (((rp[0] == rq[0]) & (rp[1] == rq[1])) |
                 ((rp[0] == rq[1]) & (rp[1] == rq[0])))
    straight = far(mvp[0][0], mvp[0][1], mvq[0][0], mvq[0][1]) | \
        far(mvp[1][0], mvp[1][1], mvq[1][0], mvq[1][1])
    crossed = far(mvp[0][0], mvp[0][1], mvq[1][0], mvq[1][1]) | \
        far(mvp[1][0], mvp[1][1], mvq[0][0], mvq[0][1])
    p_two_diff = rp[0] != rp[1]
    p0_matches_q0 = rp[0] == rq[0]
    mv_differs = np.where(p_two_diff,
                          np.where(p0_matches_q0, straight, crossed),
                          straight & crossed)
    # different reference pictures -> bS=1 regardless of the MVs
    mv_bs = np.where(same_pics, mv_differs, True).astype(np.int32)

    bs = np.where(intra_p | intra_q, 2,
                  np.where(tu_edge & (nz_p | nz_q), 1, mv_bs))
    edge = (tu_edge | pu_edge).astype(bool)
    # picture-boundary/slice/tile/slice-disable gating is folded into the
    # host-provided allow grids (per 4x4 position of the Q side).
    allow = (meta["allow_v"][q] if vertical else meta["allow_h"][q])
    bs = np.where(edge & allow.astype(bool), bs, 0)

    qp_p = meta["qp"][p].astype(np.int32)
    qp_q = meta["qp"][q].astype(np.int32)
    qp_l = (qp_p + qp_q + 1) >> 1
    bd = meta["bit_depth"]
    # offsets may be scalars (single slice) or per-4x4 grids, in which case
    # the Q-side cell's slice governs (spec 8.7.2, scalar slice_at(xq, yq))
    boff = meta["beta_off"]
    if getattr(boff, "ndim", 0) == 2:
        boff = boff[q]
    toff = meta["tc_off"]
    if getattr(toff, "ndim", 0) == 2:
        toff = toff[q]
    beta = BETA_TABLE[np.clip(qp_l + boff, 0, 51)] << (bd - 8)
    tc = TC_TABLE[np.clip(qp_l + 2 * (bs - 1) + toff, 0, 53)] << (bd - 8)

    return {"bs": bs.astype(np.int32), "beta": beta.astype(np.int32),
            "tc": tc.astype(np.int32), "qp_l": qp_l.astype(np.int32),
            "no_p": meta["unfilt"][p].astype(np.int32),
            "no_q": meta["unfilt"][q].astype(np.int32)}


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def _luma_pass(img, bs, beta, tc, no_p, no_q, bit_depth: int = 8):
    """One vertical deblocking pass over a [H, Wp] padded int32 plane.

    img: padded plane with the picture at columns [4, 4+W); edges at picture
    columns 8k map to padded columns 8k+4.  bs/beta/tc/no_p/no_q are
    [H/4, E] per-segment params (E = W//8 edges, edge 0 = picture x=0,
    gated off by bs=0).
    """
    H = img.shape[0]
    E = bs.shape[1]
    maxv = (1 << bit_depth) - 1

    # gather the 8 columns around every edge: c[k][:, e] = img[:, 8e + k].
    # ONE group-major relayout instead of 8 lane-strided slices (a stride-8
    # minor-dim slice is a full relayout on TPU; 14 of them dominated the
    # pass)
    g = img[:, :8 * E].reshape(H, E, 8).transpose(2, 0, 1)
    p3, p2, p1, p0, q0, q1, q2, q3 = [g[k] for k in range(8)]

    rep = lambda a: jnp.repeat(a, 4, axis=0)[:H]
    bs_r = rep(bs)
    beta_r = rep(beta)
    tc_r = rep(tc)
    no_p_r = rep(no_p).astype(bool)
    no_q_r = rep(no_q).astype(bool)

    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    # per-segment decision uses rows 0 and 3
    dp0, dp3 = dp[0::4], dp[3::4]
    dq0, dq3 = dq[0::4], dq[3::4]
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3
    filt_seg = (d < beta) & (bs > 0)

    def strong_cond(k_p3, k_p0, k_q0, k_q3, dpq):
        return ((2 * dpq < (beta >> 2)) &
                ((jnp.abs(k_p3 - k_p0) + jnp.abs(k_q0 - k_q3)) < (beta >> 3)) &
                (jnp.abs(k_p0 - k_q0) < ((5 * tc + 1) >> 1)))

    s0 = strong_cond(p3[0::4], p0[0::4], q0[0::4], q3[0::4], dpq0)
    s3 = strong_cond(p3[3::4], p0[3::4], q0[3::4], q3[3::4], dpq3)
    strong_seg = filt_seg & s0 & s3
    dep_seg = filt_seg & ((dp0 + dp3) < ((beta + (beta >> 1)) >> 3))
    deq_seg = filt_seg & ((dq0 + dq3) < ((beta + (beta >> 1)) >> 3))

    filt = rep(filt_seg.astype(jnp.int32)).astype(bool)
    strong = rep(strong_seg.astype(jnp.int32)).astype(bool)
    dep = rep(dep_seg.astype(jnp.int32)).astype(bool)
    deq = rep(deq_seg.astype(jnp.int32)).astype(bool)

    # --- strong filter ---
    c2 = lambda x, t: jnp.clip(x, -2 * t, 2 * t)
    sp0 = p0 + c2(((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0, tc_r)
    sp1 = p1 + c2(((p2 + p1 + p0 + q0 + 2) >> 2) - p1, tc_r)
    sp2 = p2 + c2(((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2, tc_r)
    sq0 = q0 + c2(((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3) - q0, tc_r)
    sq1 = q1 + c2(((q2 + q1 + q0 + p0 + 2) >> 2) - q1, tc_r)
    sq2 = q2 + c2(((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2, tc_r)

    # --- weak filter ---
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = jnp.abs(delta0) < (tc_r * 10)
    delta = jnp.clip(delta0, -tc_r, tc_r)
    wp0 = jnp.clip(p0 + delta, 0, maxv)
    wq0 = jnp.clip(q0 - delta, 0, maxv)
    tc2 = tc_r >> 1
    dpv = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -tc2, tc2)
    wp1 = jnp.clip(p1 + dpv, 0, maxv)
    dqv = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -tc2, tc2)
    wq1 = jnp.clip(q1 + dqv, 0, maxv)

    weak = filt & ~strong & weak_on
    strong_m = filt & strong

    do_p = ~no_p_r
    do_q = ~no_q_r
    np0 = jnp.where(strong_m & do_p, sp0, jnp.where(weak & do_p, wp0, p0))
    np1 = jnp.where(strong_m & do_p, sp1,
                    jnp.where(weak & dep & do_p, wp1, p1))
    np2 = jnp.where(strong_m & do_p, sp2, p2)
    nq0 = jnp.where(strong_m & do_q, sq0, jnp.where(weak & do_q, wq0, q0))
    nq1 = jnp.where(strong_m & do_q, sq1,
                    jnp.where(weak & deq & do_q, wq1, q1))
    nq2 = jnp.where(strong_m & do_q, sq2, q2)

    new_g = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3])
    out_cols = new_g.transpose(1, 2, 0).reshape(H, 8 * E)
    return jnp.concatenate([out_cols, img[:, 8 * E:]], axis=1)


@functools.partial(jax.jit, static_argnames=("bit_depth", "rows_per_seg"))
def _chroma_pass(img, tc, no_p, no_q, bit_depth: int = 8, rows_per_seg: int = 2):
    """Chroma vertical pass on a [Hc, pad] plane; edges every 8 chroma cols.

    tc/no_p/no_q: [S, E] per-segment params (tc=0 where bs!=2); one luma
    4-row segment covers `rows_per_seg` chroma rows (2 for 4:2:0 vertical,
    4 for full-resolution axes in 4:2:2/4:4:4).
    """
    H = img.shape[0]
    E = tc.shape[1]
    maxv = (1 << bit_depth) - 1
    g = img[:, :8 * E].reshape(H, E, 8).transpose(2, 0, 1)
    p1, p0, q0, q1 = [g[k] for k in range(4)]
    rep = lambda a: jnp.repeat(a, rows_per_seg, axis=0)[:H]
    tc_r = rep(tc)
    no_p_r = rep(no_p).astype(bool)
    no_q_r = rep(no_q).astype(bool)

    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc_r, tc_r)
    on = tc_r > 0
    np0 = jnp.where(on & ~no_p_r, jnp.clip(p0 + delta, 0, maxv), p0)
    nq0 = jnp.where(on & ~no_q_r, jnp.clip(q0 - delta, 0, maxv), q0)
    new_g = jnp.concatenate([g[0:1], np0[None], nq0[None], g[3:]])
    out_cols = new_g.transpose(1, 2, 0).reshape(H, 8 * E)
    return jnp.concatenate([out_cols, img[:, 8 * E:]], axis=1)


def luma_vertical(img_np, params, bit_depth=8):
    """Apply the vertical luma pass to a [H, W] uint plane (host wrapper)."""
    H, W = img_np.shape
    E = W // 8
    pad = np.zeros((H, W + 8), dtype=np.int32)
    pad[:, 4:4 + W] = img_np
    out = _luma_pass(jnp.asarray(pad), jnp.asarray(params["bs"]),
                     jnp.asarray(params["beta"]), jnp.asarray(params["tc"]),
                     jnp.asarray(params["no_p"]), jnp.asarray(params["no_q"]),
                     bit_depth=bit_depth)
    return np.asarray(out)[:, 4:4 + W]


def luma_horizontal(img_np, params, bit_depth=8):
    return luma_vertical(img_np.T, params, bit_depth).T


def chroma_vertical(img_np, tc, no_p, no_q, bit_depth=8, rows_per_seg=2):
    H, W = img_np.shape
    E = W // 8
    pad = np.zeros((H, W + 8), dtype=np.int32)
    pad[:, 2:2 + W] = img_np
    out = _chroma_pass(jnp.asarray(pad), jnp.asarray(tc), jnp.asarray(no_p),
                       jnp.asarray(no_q), bit_depth=bit_depth,
                       rows_per_seg=rows_per_seg)
    return np.asarray(out)[:, 2:2 + W]


def chroma_horizontal(img_np, tc, no_p, no_q, bit_depth=8, rows_per_seg=2):
    return chroma_vertical(img_np.T, tc, no_p, no_q, bit_depth,
                           rows_per_seg).T
