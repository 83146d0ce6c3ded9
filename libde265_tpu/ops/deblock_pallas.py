"""Pallas TPU kernels for the HEVC deblocking filter (spec 8.7.2).

The XLA implementation (ops/deblock.py `_luma_pass`/`_chroma_pass`) lowers to
a group-major relayout ([H, 8E] -> [8, H, E]) followed by ~100 separate
elementwise fusions plus the inverse relayout, and the horizontal passes run
on FULL-PLANE TRANSPOSES of the picture; at 1080p the whole deblock section
costs ~20 ms of the whole-picture store program — far off the ~0.1 ms HBM
roofline for its byte traffic.  These kernels evaluate a full pass in ONE
VMEM sweep over the plane in its NATURAL layout for BOTH edge orientations
(the group axis is a kernel parameter), so the H passes need no transposes:

* every deblocking edge sits at picture x (or y) = 8k and the filter touches
  at most 4 samples per side, so after the +4 padding each aligned 8-sample
  group [p3 p2 p1 p0 | q0 q1 q2 q3] is completely local;
* for a position j along the group axis with group offset m = j & 7, the
  group variable p_k lives at j - m + k, i.e. `pltpu.roll(block, m - k)` —
  15 precomputed rotations + offset-mask selects materialize all eight group
  variables at every element without any relayout;
* the per-segment decisions (spec uses rows 0 and 3 of each 4-sample
  segment) are produced the same way with rotations along the other axis;
* the per-segment parameters (bS, beta, tc, no_p, no_q) arrive packed into a
  single int32 word, pre-broadcast per pixel by XLA (a cheap broadcast
  fusion), so the kernel is branch-free elementwise math end to end.

Bit-exact drop-in for ops.deblock._luma_pass/_chroma_pass (same argument
layout); counterpart of native/src/deblock.cc and the reference filter
/root/reference/libde265/deblock.cc:413-776.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _group_vars(B, ks, gaxis):
    """Group variable k (0..7) at every element along gaxis:
    v_k[j] = B[j - (j&7) + k] (indexing along gaxis)."""
    T = B.shape[gaxis]
    m = jax.lax.broadcasted_iota(jnp.int32, B.shape, gaxis) & 7
    rolls = {}
    for k in ks:
        for mm in range(8):
            s = (mm - k) % T
            if s not in rolls:
                rolls[s] = pltpu.roll(B, s, axis=gaxis)
    out = []
    for k in ks:
        v = rolls[(0 - k) % T]
        for mm in range(1, 8):
            v = jnp.where(m == mm, rolls[(mm - k) % T], v)
        out.append(v)
    return out


def _seg_sel(X, k, saxis):
    """X's value at segment position 4*(r//4) + k, for every r along saxis
    (k in 0..3)."""
    T = X.shape[saxis]
    rp = jax.lax.broadcasted_iota(jnp.int32, X.shape, saxis) & 3
    v = pltpu.roll(X, (0 - k) % T, axis=saxis)
    for r in range(1, 4):
        v = jnp.where(rp == r, pltpu.roll(X, (r - k) % T, axis=saxis), v)
    return v


def _luma_kernel(img_ref, prm_ref, out_ref, *, bit_depth: int, gaxis: int):
    out_ref[:] = _luma_body(img_ref[:], prm_ref[:], bit_depth, gaxis)


def _luma_body(B, P, bit_depth: int, gaxis: int = 1):
    saxis = 1 - gaxis
    maxv = (1 << bit_depth) - 1

    bs = P & 3
    no_p = ((P >> 2) & 1) != 0
    no_q = ((P >> 3) & 1) != 0
    tc = (P >> 4) & 0x1FFF
    beta = (P >> 17) & 0x7FFF

    p3, p2, p1, p0, q0, q1, q2, q3 = _group_vars(B, range(8), gaxis)

    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp0 = _seg_sel(dp, 0, saxis)
    dp3 = _seg_sel(dp, 3, saxis)
    dq0 = _seg_sel(dq, 0, saxis)
    dq3 = _seg_sel(dq, 3, saxis)
    d = dp0 + dp3 + dq0 + dq3
    filt = (d < beta) & (bs > 0)

    # strong decision: segment rows 0 and 3 evaluate the condition with
    # their own samples and their own dp+dq (spec dpq0/dpq3)
    scrow = ((2 * (dp + dq) < (beta >> 2)) &
             ((jnp.abs(p3 - p0) + jnp.abs(q0 - q3)) < (beta >> 3)) &
             (jnp.abs(p0 - q0) < ((5 * tc + 1) >> 1)))
    strong = filt & (_seg_sel(scrow.astype(jnp.int32), 0, saxis) != 0) \
        & (_seg_sel(scrow.astype(jnp.int32), 3, saxis) != 0)
    side_th = (beta + (beta >> 1)) >> 3
    dep = filt & ((dp0 + dp3) < side_th)
    deq = filt & ((dq0 + dq3) < side_th)

    # --- strong filter ---
    c2 = lambda x: jnp.clip(x, -2 * tc, 2 * tc)
    sp0 = p0 + c2(((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0)
    sp1 = p1 + c2(((p2 + p1 + p0 + q0 + 2) >> 2) - p1)
    sp2 = p2 + c2(((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2)
    sq0 = q0 + c2(((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3) - q0)
    sq1 = q1 + c2(((q2 + q1 + q0 + p0 + 2) >> 2) - q1)
    sq2 = q2 + c2(((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2)

    # --- weak filter ---
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = jnp.abs(delta0) < (tc * 10)
    delta = jnp.clip(delta0, -tc, tc)
    wp0 = jnp.clip(p0 + delta, 0, maxv)
    wq0 = jnp.clip(q0 - delta, 0, maxv)
    tc2 = tc >> 1
    wp1 = jnp.clip(p1 + jnp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1,
                                 -tc2, tc2), 0, maxv)
    wq1 = jnp.clip(q1 + jnp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1,
                                 -tc2, tc2), 0, maxv)

    weak = filt & ~strong & weak_on
    strong_m = filt & strong
    do_p = ~no_p
    do_q = ~no_q
    np0 = jnp.where(strong_m & do_p, sp0, jnp.where(weak & do_p, wp0, p0))
    np1 = jnp.where(strong_m & do_p, sp1,
                    jnp.where(weak & dep & do_p, wp1, p1))
    np2 = jnp.where(strong_m & do_p, sp2, p2)
    nq0 = jnp.where(strong_m & do_q, sq0, jnp.where(weak & do_q, wq0, q0))
    nq1 = jnp.where(strong_m & do_q, sq1,
                    jnp.where(weak & deq & do_q, wq1, q1))
    nq2 = jnp.where(strong_m & do_q, sq2, q2)

    m = jax.lax.broadcasted_iota(jnp.int32, B.shape, gaxis) & 7
    out = B  # positions 0 (p3) and 7 (q3) pass through
    for pos, v in ((1, np2), (2, np1), (3, np0), (4, nq0), (5, nq1),
                   (6, nq2)):
        out = jnp.where(m == pos, v, out)
    return out


def _chroma_body(B, P, bit_depth: int, gaxis: int = 1):
    maxv = (1 << bit_depth) - 1

    no_p = (P & 1) != 0
    no_q = ((P >> 1) & 1) != 0
    tc = P >> 2

    p1, p0, q0, q1 = _group_vars(B, range(4), gaxis)
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    on = tc > 0
    np0 = jnp.where(on & ~no_p, jnp.clip(p0 + delta, 0, maxv), p0)
    nq0 = jnp.where(on & ~no_q, jnp.clip(q0 - delta, 0, maxv), q0)

    m = jax.lax.broadcasted_iota(jnp.int32, B.shape, gaxis) & 7
    return jnp.where(m == 1, np0, jnp.where(m == 2, nq0, B))


def _tiles(H, Wp):
    TH, TW = 64, 1024
    Hk = -(-H // TH) * TH
    Wk = -(-Wp // TW) * TW
    return TH, TW, Hk, Wk


def _run(kernel, img, prm_px, bit_depth, interpret):
    """Pad to tile multiples, sweep, crop.  prm_px is the per-pixel packed
    parameter plane aligned with img (zero = no filtering)."""
    H, Wp = img.shape
    TH, TW, Hk, Wk = _tiles(H, Wp)
    imgp = jnp.pad(img, ((0, Hk - H), (0, Wk - Wp)))
    prmp = jnp.pad(prm_px, ((0, Hk - H), (0, Wk - Wp)))
    spec = pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, bit_depth=bit_depth),
        out_shape=jax.ShapeDtypeStruct((Hk, Wk), jnp.int32),
        grid=(Hk // TH, Wk // TW),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(imgp, prmp)
    return out[:H, :Wp]


def _expand_params(packed, reps, shape):
    """Per-pixel broadcast of a per-(segment, edge) packed word, cropped /
    zero-extended to the image shape (zero = pass-through)."""
    pp = jnp.repeat(jnp.repeat(packed, reps[0], axis=0), reps[1], axis=1)
    pp = pp[:shape[0], :shape[1]]
    prm = jnp.zeros(shape, jnp.int32)
    return prm.at[:pp.shape[0], :pp.shape[1]].set(pp)


def _pack_luma(bs, tc, beta, no_p, no_q):
    return (bs | ((no_p != 0).astype(jnp.int32) << 2)
            | ((no_q != 0).astype(jnp.int32) << 3)
            | (tc << 4) | (beta << 17))


@functools.partial(jax.jit, static_argnames=("bit_depth", "interpret"))
def luma_pass(img, bs, beta, tc, no_p, no_q, bit_depth: int = 8,
              interpret: bool = False):
    """Vertical-edge pass; drop-in for ops.deblock._luma_pass (same layouts:
    img [H, Wp] with the picture at columns [4, 4+W); params [H/4, E])."""
    prm = _expand_params(_pack_luma(bs, tc, beta, no_p, no_q), (4, 8),
                         img.shape)
    return _run(functools.partial(_luma_kernel, gaxis=1), img, prm,
                bit_depth, interpret)


@functools.partial(jax.jit, static_argnames=("bit_depth", "interpret"))
def luma_pass_h(img, bs, beta, tc, no_p, no_q, bit_depth: int = 8,
                interpret: bool = False):
    """Horizontal-edge pass in NATURAL layout (no transpose): img [Hp, W]
    with the picture at rows [4, 4+H); params [E, W/4] with edge e at
    picture y = 8e (padded row 8e+4)."""
    prm = _expand_params(_pack_luma(bs, tc, beta, no_p, no_q), (8, 4),
                         img.shape)
    return _run(functools.partial(_luma_kernel, gaxis=0), img, prm,
                bit_depth, interpret)


def _pack_chroma(tcs, no_p, no_q):
    return ((no_p != 0).astype(jnp.int32)[None]
            | ((no_q != 0).astype(jnp.int32) << 1)[None] | (tcs << 2))


def _run_stacked(imgs, prm, bit_depth, gaxis, interpret):
    C, H, Wp = imgs.shape
    TH, TW, Hk, Wk = _tiles(H, Wp)
    imgp = jnp.pad(imgs, ((0, 0), (0, Hk - H), (0, Wk - Wp)))
    prmp = jnp.pad(prm, ((0, 0), (0, Hk - H), (0, Wk - Wp)))
    spec = pl.BlockSpec((1, TH, TW), lambda c, i, j: (c, i, j),
                        memory_space=pltpu.VMEM)

    def kern(i_ref, p_ref, o_ref):
        o_ref[0] = _chroma_body(i_ref[0], p_ref[0], bit_depth, gaxis)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, Hk, Wk), jnp.int32),
        grid=(C, Hk // TH, Wk // TW),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(imgp, prmp)
    return out[:, :H, :Wp]


@functools.partial(jax.jit,
                   static_argnames=("bit_depth", "rows_per_seg", "interpret"))
def chroma_pass_stacked(imgs, tcs, no_p, no_q, bit_depth: int = 8,
                        rows_per_seg: int = 2, interpret: bool = False):
    """Both chroma channels, vertical edges, in one sweep.

    imgs: [2, Hc, Wp] padded planes (picture at columns [2, 2+Wc));
    tcs:  [2, S, E] per-channel tc (0 = off); no_p/no_q: [S, E] shared.
    Equivalent to vmapping ops.deblock._chroma_pass over channels.
    """
    C, H, Wp = imgs.shape
    packed = _pack_chroma(tcs, no_p, no_q)
    pp = jnp.repeat(jnp.repeat(packed, rows_per_seg, axis=1), 8, axis=2)
    pp = pp[:, :H, :Wp]
    prm = jnp.zeros((C, H, Wp), jnp.int32)
    prm = prm.at[:, :pp.shape[1], :pp.shape[2]].set(pp)
    return _run_stacked(imgs, prm, bit_depth, 1, interpret)


@functools.partial(jax.jit,
                   static_argnames=("bit_depth", "cols_per_seg", "interpret"))
def chroma_pass_stacked_h(imgs, tcs, no_p, no_q, bit_depth: int = 8,
                          cols_per_seg: int = 2, interpret: bool = False):
    """Both chroma channels, horizontal edges, NATURAL layout.

    imgs: [2, Hp, Wc] padded planes (picture at rows [2, 2+Hc));
    tcs:  [2, E, S] per-channel tc (edge e at picture y = 8e, 0 = off);
    no_p/no_q: [E, S] shared; one luma 4-col segment covers cols_per_seg
    chroma columns.
    """
    C, H, Wp = imgs.shape
    packed = _pack_chroma(tcs, no_p, no_q)
    pp = jnp.repeat(jnp.repeat(packed, 8, axis=1), cols_per_seg, axis=2)
    pp = pp[:, :H, :Wp]
    prm = jnp.zeros((C, H, Wp), jnp.int32)
    prm = prm.at[:, :pp.shape[1], :pp.shape[2]].set(pp)
    return _run_stacked(imgs, prm, bit_depth, 0, interpret)
