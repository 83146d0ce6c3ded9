"""Pallas window-DMA gather/scatter kernels vs the XLA wave body.

The fused decoder's TPU path fetches intra borders and writes blocks
back with tile-aligned window DMAs (ops/intra_window_pallas) instead of
XLA's generic gather/scatter; this checks bit-equality against the XLA
path on the same wave-step records (interpret mode on CPU).
"""
import numpy as np
import jax.numpy as jnp

from libde265_tpu.fused_decode import _wave_body, WAVE_CAP
from libde265_tpu.ops import intra_window_pallas as iwp
from libde265_tpu.ops.intra_wave import build_mode_tables


def _mk_step(s, K, H, W, seed=0, partial=False):
    rng = np.random.default_rng(seed)
    nb = 4 * s + 1
    meta = np.zeros((K, 5), np.int32)
    n_valid = K if not partial else K * 2 // 3
    # DISJOINT block origins on the s-grid (a wave step's blocks are
    # disjoint transform blocks), including picture corner/edge blocks
    gw, gh = W // s, H // s
    cells = rng.permutation(gw * gh)[:K]
    forced = [gw - 1, (gh - 1) * gw, gh * gw - 1]  # TR, BL, BR corners
    cells = np.concatenate(
        [forced, [c for c in cells if c not in forced]])[:K]
    ys = (cells // gw).astype(np.int64) * s
    xs = (cells % gw).astype(np.int64) * s
    meta[:, 0] = rng.integers(0, 35, K)
    meta[:, 2], meta[:, 3] = ys, xs
    meta[:n_valid, 4] = 8 | np.where(rng.random(n_valid) < 0.2, 2, 0)
    meta[n_valid:] = 0
    aw = np.zeros((K, 5), np.int32)
    n2 = 2 * s
    for k in range(n_valid):
        av = rng.random(nb) < 0.8
        # spec availability never covers out-of-picture samples
        # (8.4.4.2.2); border position j maps to the left column
        # (bottom->top), the corner, then the top row
        j = np.arange(nb)
        by = np.where(j < n2, ys[k] + n2 - 1 - j, ys[k] - 1)
        bx = np.where(j <= n2, xs[k] - 1, xs[k] + j - n2 - 1)
        av &= (by >= 0) & (by < H) & (bx >= 0) & (bx < W)
        if rng.random() < 0.1 or not av.any():
            av[:] = False
            meta[k, 4] |= 1  # unavailable
        words = np.packbits(np.pad(av, (0, 5 * 32 - nb)),
                            bitorder="little").view(np.int32)
        aw[k] = words
    resid = rng.integers(-40, 40, (K, s, s)).astype(np.int32)
    plane = rng.integers(0, 255, (H, W)).astype(np.int32)
    return plane, meta, aw, resid


def test_wave_body_pallas_matches_xla():
    H, W = 128, 192
    for s in (4, 8, 16, 32):
        K = min(WAVE_CAP[int(np.log2(s))], 32)
        plane, meta, aw, resid = _mk_step(s, K, H, W, seed=s, partial=True)
        tables = tuple(jnp.asarray(t) for t in build_mode_tables(s))
        ref = np.asarray(_wave_body(
            jnp.asarray(plane), jnp.asarray(meta), jnp.asarray(aw),
            jnp.asarray(resid), *tables, s=s, bit_depth=8))
        hp, wp = iwp.scan_pad_sizes(H, W)
        padded = iwp.pad_plane_for_scan(jnp.asarray(plane), hp=hp, wp=wp)
        got_p = _wave_body(
            padded, jnp.asarray(meta), jnp.asarray(aw),
            jnp.asarray(resid), *tables, s=s, bit_depth=8,
            pallas=True, interpret=True)
        got = np.asarray(iwp.unpad_plane(got_p, H, W))
        assert np.array_equal(got, ref), (s, np.argwhere(got != ref)[:4])


def test_border_gather_exact_samples():
    s, K, H, W = 8, 16, 64, 96
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 255, (H, W)).astype(np.int32)
    ys = rng.integers(1, (H - 2 * s) // s, K) * s
    xs = rng.integers(1, (W - 2 * s) // s, K) * s
    hp, wp = iwp.scan_pad_sizes(H, W)
    padded = iwp.pad_plane_for_scan(jnp.asarray(plane), hp=hp, wp=wp)
    tops, lefts = iwp.border_gather(
        padded, jnp.asarray((ys + iwp.PAD_T).astype(np.int32)),
        jnp.asarray((xs + iwp.PAD_L).astype(np.int32)),
        jnp.int32(K), s=s, interpret=True)
    tops, lefts = np.asarray(tops), np.asarray(lefts)
    for k in range(K):
        y, x = ys[k], xs[k]
        assert np.array_equal(tops[k], plane[y - 1, x - 1:x + 2 * s])
        assert np.array_equal(lefts[k], plane[y:y + 2 * s, x - 1])
