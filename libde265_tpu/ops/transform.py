"""Batched inverse transform path: dequant -> IDCT/IDST/transform-skip.

Bit-exact integer counterpart of native/src/transform.cc (spec 8.6.3/8.6.4),
re-designed for TPU execution: TUs are binned by size into dense [N, s, s]
int32 batches; the two 1-D transform stages are integer matrix contractions
that XLA maps onto the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# spec 8.6.4.1 transMatrix (32x32); identical constants to
# native/src/transform.cc kDctMatrix.
DCT32 = np.array([
    [64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64,
     64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64],
    [90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4,
     -4, -13, -22, -31, -38, -46, -54, -61, -67, -73, -78, -82, -85, -88, -90, -90],
    [90, 87, 80, 70, 57, 43, 25, 9, -9, -25, -43, -57, -70, -80, -87, -90,
     -90, -87, -80, -70, -57, -43, -25, -9, 9, 25, 43, 57, 70, 80, 87, 90],
    [90, 82, 67, 46, 22, -4, -31, -54, -73, -85, -90, -88, -78, -61, -38, -13,
     13, 38, 61, 78, 88, 90, 85, 73, 54, 31, 4, -22, -46, -67, -82, -90],
    [89, 75, 50, 18, -18, -50, -75, -89, -89, -75, -50, -18, 18, 50, 75, 89,
     89, 75, 50, 18, -18, -50, -75, -89, -89, -75, -50, -18, 18, 50, 75, 89],
    [88, 67, 31, -13, -54, -82, -90, -78, -46, -4, 38, 73, 90, 85, 61, 22,
     -22, -61, -85, -90, -73, -38, 4, 46, 78, 90, 82, 54, 13, -31, -67, -88],
    [87, 57, 9, -43, -80, -90, -70, -25, 25, 70, 90, 80, 43, -9, -57, -87,
     -87, -57, -9, 43, 80, 90, 70, 25, -25, -70, -90, -80, -43, 9, 57, 87],
    [85, 46, -13, -67, -90, -73, -22, 38, 82, 88, 54, -4, -61, -90, -78, -31,
     31, 78, 90, 61, 4, -54, -88, -82, -38, 22, 73, 90, 67, 13, -46, -85],
    [83, 36, -36, -83, -83, -36, 36, 83, 83, 36, -36, -83, -83, -36, 36, 83,
     83, 36, -36, -83, -83, -36, 36, 83, 83, 36, -36, -83, -83, -36, 36, 83],
    [82, 22, -54, -90, -61, 13, 78, 85, 31, -46, -90, -67, 4, 73, 88, 38,
     -38, -88, -73, -4, 67, 90, 46, -31, -85, -78, -13, 61, 90, 54, -22, -82],
    [80, 9, -70, -87, -25, 57, 90, 43, -43, -90, -57, 25, 87, 70, -9, -80,
     -80, -9, 70, 87, 25, -57, -90, -43, 43, 90, 57, -25, -87, -70, 9, 80],
    [78, -4, -82, -73, 13, 85, 67, -22, -88, -61, 31, 90, 54, -38, -90, -46,
     46, 90, 38, -54, -90, -31, 61, 88, 22, -67, -85, -13, 73, 82, 4, -78],
    [75, -18, -89, -50, 50, 89, 18, -75, -75, 18, 89, 50, -50, -89, -18, 75,
     75, -18, -89, -50, 50, 89, 18, -75, -75, 18, 89, 50, -50, -89, -18, 75],
    [73, -31, -90, -22, 78, 67, -38, -90, -13, 82, 61, -46, -88, -4, 85, 54,
     -54, -85, 4, 88, 46, -61, -82, 13, 90, 38, -67, -78, 22, 90, 31, -73],
    [70, -43, -87, 9, 90, 25, -80, -57, 57, 80, -25, -90, -9, 87, 43, -70,
     -70, 43, 87, -9, -90, -25, 80, 57, -57, -80, 25, 90, 9, -87, -43, 70],
    [67, -54, -78, 38, 85, -22, -90, 4, 90, 13, -88, -31, 82, 46, -73, -61,
     61, 73, -46, -82, 31, 88, -13, -90, -4, 90, 22, -85, -38, 78, 54, -67],
    [64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64,
     64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64],
    [61, -73, -46, 82, 31, -88, -13, 90, -4, -90, 22, 85, -38, -78, 54, 67,
     -67, -54, 78, 38, -85, -22, 90, 4, -90, 13, 88, -31, -82, 46, 73, -61],
    [57, -80, -25, 90, -9, -87, 43, 70, -70, -43, 87, 9, -90, 25, 80, -57,
     -57, 80, 25, -90, 9, 87, -43, -70, 70, 43, -87, -9, 90, -25, -80, 57],
    [54, -85, -4, 88, -46, -61, 82, 13, -90, 38, 67, -78, -22, 90, -31, -73,
     73, 31, -90, 22, 78, -67, -38, 90, -13, -82, 61, 46, -88, 4, 85, -54],
    [50, -89, 18, 75, -75, -18, 89, -50, -50, 89, -18, -75, 75, 18, -89, 50,
     50, -89, 18, 75, -75, -18, 89, -50, -50, 89, -18, -75, 75, 18, -89, 50],
    [46, -90, 38, 54, -90, 31, 61, -88, 22, 67, -85, 13, 73, -82, 4, 78,
     -78, -4, 82, -73, -13, 85, -67, -22, 88, -61, -31, 90, -54, -38, 90, -46],
    [43, -90, 57, 25, -87, 70, 9, -80, 80, -9, -70, 87, -25, -57, 90, -43,
     -43, 90, -57, -25, 87, -70, -9, 80, -80, 9, 70, -87, 25, 57, -90, 43],
    [38, -88, 73, -4, -67, 90, -46, -31, 85, -78, 13, 61, -90, 54, 22, -82,
     82, -22, -54, 90, -61, -13, 78, -85, 31, 46, -90, 67, 4, -73, 88, -38],
    [36, -83, 83, -36, -36, 83, -83, 36, 36, -83, 83, -36, -36, 83, -83, 36,
     36, -83, 83, -36, -36, 83, -83, 36, 36, -83, 83, -36, -36, 83, -83, 36],
    [31, -78, 90, -61, 4, 54, -88, 82, -38, -22, 73, -90, 67, -13, -46, 85,
     -85, 46, 13, -67, 90, -73, 22, 38, -82, 88, -54, -4, 61, -90, 78, -31],
    [25, -70, 90, -80, 43, 9, -57, 87, -87, 57, -9, -43, 80, -90, 70, -25,
     -25, 70, -90, 80, -43, -9, 57, -87, 87, -57, 9, 43, -80, 90, -70, 25],
    [22, -61, 85, -90, 73, -38, -4, 46, -78, 90, -82, 54, -13, -31, 67, -88,
     88, -67, 31, 13, -54, 82, -90, 78, -46, 4, 38, -73, 90, -85, 61, -22],
    [18, -50, 75, -89, 89, -75, 50, -18, -18, 50, -75, 89, -89, 75, -50, 18,
     18, -50, 75, -89, 89, -75, 50, -18, -18, 50, -75, 89, -89, 75, -50, 18],
    [13, -38, 61, -78, 88, -90, 85, -73, 54, -31, 4, 22, -46, 67, -82, 90,
     -90, 82, -67, 46, -22, -4, 31, -54, 73, -85, 90, -88, 78, -61, 38, -13],
    [9, -25, 43, -57, 70, -80, 87, -90, 90, -87, 80, -70, 57, -43, 25, -9,
     -9, 25, -43, 57, -70, 80, -87, 90, -90, 87, -80, 70, -57, 43, -25, 9],
    [4, -13, 22, -31, 38, -46, 54, -61, 67, -73, 78, -82, 85, -88, 90, -90,
     90, -90, 88, -85, 82, -78, 73, -67, 61, -54, 46, -38, 31, -22, 13, -4]],
    dtype=np.int32)

DST4 = np.array([[29, 55, 74, 84],
                 [74, 74, 0, -74],
                 [84, -29, -74, 55],
                 [55, -84, 74, -29]], dtype=np.int32)

LEVEL_SCALE = np.array([40, 45, 51, 57, 64, 72], dtype=np.int32)


def dct_matrix(size: int) -> np.ndarray:
    """N-point inverse-DCT matrix: rows of DCT32 sampled at stride 32/N."""
    step = 32 // size
    return DCT32[::step, :size].copy()


def _itx_2d(coeff, mat, bd_shift):
    """Two-stage integer inverse transform of a [N, s, s] batch.

    Stage 1 (vertical):  g[n,i,c] = clip16((sum_j M[j,i]*coeff[n,j,c] + 64) >> 7)
    Stage 2 (horizontal): r[n,y,i] = (sum_j M[j,i]*g[n,y,j] + rnd) >> bd_shift
    """
    m = jnp.asarray(mat, dtype=jnp.int32)
    g = jnp.einsum("ji,njc->nic", m, coeff, preferred_element_type=jnp.int32)
    g = jnp.clip((g + 64) >> 7, -32768, 32767)
    r = jnp.einsum("ji,nyj->nyi", m, g, preferred_element_type=jnp.int32)
    return (r + (1 << (bd_shift - 1))) >> bd_shift


@functools.partial(jax.jit, static_argnames=("log2_size", "bit_depth"))
def residual_batch(levels, fact, tskip, use_dst, log2_size: int,
                   bit_depth: int = 8, sf=None, qp=None):
    """Dequant + inverse transform for one size bin.

    levels:  int32 [N, s, s] coded coefficient levels (dense)
    fact:    int32 [N] levelScale[qp%6] << (qp/6) (flat scaling list)
    tskip:   bool  [N] transform_skip_flag
    use_dst: bool  [N] 4x4 intra luma DST (only meaningful for s=4)
    sf:      optional int32 [N, s, s] scaling factors (spec 8.6.3 m[x][y]);
             requires `qp` int32 [N] (the per-TU QP') when given
    returns: int32 [N, s, s] residual
    """
    s = 1 << log2_size

    if sf is None:
        # --- dequant (spec 8.6.3, flat scaling = shift folded) ---
        bd_shift = bit_depth + log2_size - 5 - 4
        offset = 1 << (bd_shift - 1)
        coeff = jnp.clip((levels * fact[:, None, None] + offset) >> bd_shift,
                         -32768, 32767)
    else:
        # scaling-list dequant without int64: the spec value is
        #   (level * m * levelScale[qp%6] << (qp/6) + 2^(b-1)) >> b,
        # b = bd + log2 - 5.  level*m*levelScale fits int32 (<=2^31), and the
        # qp/6 left-shift folds into the right shift exactly:
        #   shift>0:  (t + 2^(shift-1)) >> shift,   shift = b - qp/6
        #   shift<=0: t << -shift  (the rounding term vanishes)
        b = bit_depth + log2_size - 5
        t = levels * (sf * jnp.asarray(LEVEL_SCALE)[qp % 6][:, None, None])
        d = (b - qp // 6)[:, None, None]
        dp = jnp.maximum(d, 0)
        rnd = jnp.where(d > 0, 1 << jnp.maximum(d - 1, 0), 0)
        coeff = jnp.where(d > 0, (t + rnd) >> dp, t << jnp.maximum(-d, 0))
        coeff = jnp.clip(coeff, -32768, 32767)

    # --- inverse transform ---
    bd_shift2 = 20 - bit_depth
    r_dct = _itx_2d(coeff, dct_matrix(s), bd_shift2)
    if s == 4:
        r_dst = _itx_2d(coeff, DST4, bd_shift2)
        r_tx = jnp.where(use_dst[:, None, None], r_dst, r_dct)
    else:
        r_tx = r_dct

    # --- transform skip ---
    ts_shift = 5 + log2_size
    rnd = 1 << (bd_shift2 - 1)
    r_skip = ((coeff << ts_shift) + rnd) >> bd_shift2

    return jnp.where(tskip[:, None, None], r_skip, r_tx)


def scatter_coeffs(tus: np.ndarray, coeff_val: np.ndarray,
                   coeff_pos: np.ndarray, log2_size: int,
                   idx: np.ndarray) -> np.ndarray:
    """Host-side dense scatter of the sparse coefficient lists for a size bin.

    Returns int32 [len(idx), s, s].
    """
    s = 1 << log2_size
    out = np.zeros((len(idx), s, s), dtype=np.int32)
    for k, t in enumerate(idx):
        tu = tus[t]
        start, n = int(tu["coeff_start"]), int(tu["ncoeff"])
        pos = coeff_pos[start:start + n]
        xc = pos & 63
        yc = pos >> 6
        out[k, yc, xc] = coeff_val[start:start + n]
    return out


def qp_to_fact(qp: np.ndarray) -> np.ndarray:
    return (LEVEL_SCALE[qp % 6] << (qp // 6)).astype(np.int32)


def qp_to_fact_jnp(qp):
    """Traceable qp_to_fact (for in-jit dequant of the fused decode path)."""
    return jnp.asarray(LEVEL_SCALE)[qp % 6] << (qp // 6)
