"""Batched motion compensation: 8-tap qpel luma / 4-tap epel chroma
interpolation and weighted/default sample prediction.

Bit-exact integer counterpart of native/src/recon.cc (spec 8.5.4.2.2/8.5.4.2.3),
re-designed for TPU: PUs are binned by (w, h); reference windows (edge-
clamped, +7/+3 taps) are gathered host-side into dense [N, h+7, w+7] batches,
and the separable filters run as 8 static shifted multiply-adds (VPU-friendly,
fully fused by XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

QPEL_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], dtype=np.int32)

EPEL_FILTERS = np.array([
    [0, 64, 0, 0], [-2, 58, 10, -2], [-4, 54, 16, -2], [-6, 46, 28, -4],
    [-4, 36, 36, -4], [-4, 28, 46, -6], [-2, 16, 54, -4], [-2, 10, 58, -2]],
    dtype=np.int32)


def gather_windows(plane: np.ndarray, xs, ys, w, h, taps, center):
    """Host gather of [N, h+taps-1, w+taps-1] windows with edge clamping.

    xs/ys are the integer-pel top-left positions of each block.
    """
    ph, pw = plane.shape
    n = len(xs)
    out = np.empty((n, h + taps - 1, w + taps - 1), dtype=np.int32)
    for i in range(n):
        yy = np.clip(np.arange(ys[i] - center, ys[i] - center + h + taps - 1),
                     0, ph - 1)
        xx = np.clip(np.arange(xs[i] - center, xs[i] - center + w + taps - 1),
                     0, pw - 1)
        out[i] = plane[np.ix_(yy, xx)]
    return out


def _sep_filter(win, fx, fy, taps, w, h, shift1, shift3, filters):
    """Separable fractional-sample interpolation on a window batch.

    win: [N, h+taps-1, w+taps-1] int32; fx/fy: [N] fractional positions.
    Returns int16-scaled intermediate values [N, h, w] (int32 dtype).
    """
    f_h = filters[fx]  # [N, taps]
    f_v = filters[fy]

    center = taps // 2 - 1

    def wrap16(v):  # the native backend stores intermediates in i16 buffers
        return (v.astype(jnp.int32) << 16) >> 16

    # horizontal filter over all rows (needed rows depend on fy)
    th = sum(f_h[:, k, None, None] * win[:, :, k:k + w] for k in range(taps))
    th_s1 = wrap16(th >> shift1)               # one-pass H result + HV stage 1

    # vertical filter over the full-pel columns
    tv = sum(f_v[:, k, None, None] * win[:, k:k + h, center:center + w]
             for k in range(taps))
    tv_s1 = wrap16(tv >> shift1)

    # HV: vertical pass over the horizontal intermediate
    hv = sum(f_v[:, k, None, None] * th_s1[:, k:k + h, :] for k in range(taps))
    hv = wrap16(hv >> 6)

    full = wrap16(win[:, center:center + h, center:center + w] << shift3)
    h_only = th_s1[:, center:center + h, :]

    fx_b = (fx != 0)[:, None, None]
    fy_b = (fy != 0)[:, None, None]
    return jnp.where(fx_b & fy_b, hv,
                     jnp.where(fx_b, h_only, jnp.where(fy_b, tv_s1, full)))


@functools.partial(jax.jit, static_argnames=("w", "h", "bit_depth"))
def mc_luma_batch(win, fx, fy, w: int, h: int, bit_depth: int = 8):
    """Luma qpel interpolation: win [N, h+7, w+7] -> int16-scaled [N, h, w]."""
    return _sep_filter(win, fx, fy, 8, w, h, bit_depth - 8, 14 - bit_depth,
                       jnp.asarray(QPEL_FILTERS))


@functools.partial(jax.jit, static_argnames=("w", "h", "bit_depth"))
def mc_chroma_batch(win, fx, fy, w: int, h: int, bit_depth: int = 8):
    """Chroma epel interpolation: win [N, h+3, w+3] -> int16-scaled [N, h, w]."""
    return _sep_filter(win, fx, fy, 4, w, h, bit_depth - 8, 14 - bit_depth,
                       jnp.asarray(EPEL_FILTERS))


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def pred_merge_batch(p0, p1, bi, weighted, w0, o0, w1, o1, log2_denom,
                     bit_depth: int = 8):
    """Weighted/default sample prediction merge (spec 8.5.4.2.3).

    p0/p1: int32 [N, h, w] int16-scaled predictions (p1 ignored when not bi);
    per-PU params are [N] arrays.  Returns clipped pixels [N, h, w] int32.
    """
    maxval = (1 << bit_depth) - 1
    shift1 = 14 - bit_depth
    shift2 = 15 - bit_depth

    # default
    uni_def = jnp.clip((p0 + (1 << (shift1 - 1))) >> shift1, 0, maxval)
    bi_def = jnp.clip((p0 + p1 + (1 << (shift2 - 1))) >> shift2, 0, maxval)

    # explicit weighted
    log2_wd = log2_denom + shift1
    w0b = w0[:, None, None]
    w1b = w1[:, None, None]
    o0b = o0[:, None, None]
    o1b = o1[:, None, None]
    lwd = log2_wd[:, None, None]
    uni_w = jnp.clip(((p0 * w0b + (1 << (lwd - 1))) >> lwd) + o0b, 0, maxval)
    bi_w = jnp.clip((p0 * w0b + p1 * w1b + ((o0b + o1b + 1) << lwd)) >>
                    (lwd + 1), 0, maxval)

    bi_b = bi[:, None, None]
    wt_b = weighted[:, None, None]
    return jnp.where(wt_b, jnp.where(bi_b, bi_w, uni_w),
                     jnp.where(bi_b, bi_def, uni_def))
