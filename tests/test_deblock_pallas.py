"""Pallas deblock kernels vs the XLA reference passes (bit-exact).

Randomized edge parameters cover all bS/beta/tc combinations, no_p/no_q
gating, strong/weak selection, and pass-through regions; geometry cases
cover tile-boundary alignment (W and H not multiples of the kernel tiles).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from libde265_tpu.ops import deblock as dbk
from libde265_tpu.ops import deblock_pallas as dbp


def _rand_luma_params(rng, H4, E, bd):
    bs = rng.integers(0, 3, (H4, E)).astype(np.int32)
    # realistic beta/tc magnitudes (table range << (bd-8))
    beta = (rng.integers(0, 65, (H4, E)) << (bd - 8)).astype(np.int32)
    tc = (rng.integers(0, 25, (H4, E)) << (bd - 8)).astype(np.int32)
    no_p = (rng.random((H4, E)) < 0.1).astype(np.int32)
    no_q = (rng.random((H4, E)) < 0.1).astype(np.int32)
    return bs, beta, tc, no_p, no_q


@pytest.mark.parametrize("H,W,bd", [(64, 128, 8), (72, 88, 8), (64, 128, 10)])
def test_luma_pass_matches_xla(H, W, bd):
    rng = np.random.default_rng(7 + H + W + bd)
    img = rng.integers(0, 1 << bd, (H, W + 8)).astype(np.int32)
    E = (W + 8) // 8
    bs, beta, tc, no_p, no_q = _rand_luma_params(rng, H // 4, E, bd)

    ref = dbk._luma_pass(jnp.asarray(img), jnp.asarray(bs), jnp.asarray(beta),
                         jnp.asarray(tc), jnp.asarray(no_p),
                         jnp.asarray(no_q), bit_depth=bd)
    got = dbp.luma_pass(jnp.asarray(img), jnp.asarray(bs), jnp.asarray(beta),
                        jnp.asarray(tc), jnp.asarray(no_p),
                        jnp.asarray(no_q), bit_depth=bd, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("H,W,bd", [(64, 128, 8), (72, 88, 8), (64, 128, 10)])
def test_luma_pass_h_matches_xla(H, W, bd):
    """Horizontal-edge kernel in natural layout vs the XLA pass on the
    transposed plane (the arrangement _deblock_section used before)."""
    rng = np.random.default_rng(19 + H + W + bd)
    img = rng.integers(0, 1 << bd, (H + 8, W)).astype(np.int32)
    E = (H + 8) // 8
    bs, beta, tc, no_p, no_q = _rand_luma_params(rng, E, W // 4, bd)
    # XLA reference works on the transpose with [W/4, E] params
    ref = dbk._luma_pass(jnp.asarray(img.T), jnp.asarray(bs.T),
                         jnp.asarray(beta.T), jnp.asarray(tc.T),
                         jnp.asarray(no_p.T), jnp.asarray(no_q.T),
                         bit_depth=bd).T
    got = dbp.luma_pass_h(jnp.asarray(img), jnp.asarray(bs),
                          jnp.asarray(beta), jnp.asarray(tc),
                          jnp.asarray(no_p), jnp.asarray(no_q),
                          bit_depth=bd, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("H,W,cps,bd", [(64, 32, 2, 8), (40, 36, 4, 8),
                                        (64, 32, 2, 10)])
def test_chroma_pass_h_matches_xla(H, W, cps, bd):
    rng = np.random.default_rng(23 + H + W + cps + bd)
    imgs = rng.integers(0, 1 << bd, (2, H + 8, W)).astype(np.int32)
    E = (H + 8) // 8
    S = -(-W // cps)
    tcs = (rng.integers(0, 25, (2, E, S)) << (bd - 8)).astype(np.int32)
    tcs[rng.random((2, E, S)) < 0.5] = 0
    no_p = (rng.random((E, S)) < 0.1).astype(np.int32)
    no_q = (rng.random((E, S)) < 0.1).astype(np.int32)

    refs = [np.asarray(dbk._chroma_pass(
        jnp.asarray(imgs[c].T), jnp.asarray(tcs[c].T), jnp.asarray(no_p.T),
        jnp.asarray(no_q.T), bit_depth=bd, rows_per_seg=cps)).T
        for c in range(2)]
    got = dbp.chroma_pass_stacked_h(jnp.asarray(imgs), jnp.asarray(tcs),
                                    jnp.asarray(no_p), jnp.asarray(no_q),
                                    bit_depth=bd, cols_per_seg=cps,
                                    interpret=True)
    for c in range(2):
        np.testing.assert_array_equal(refs[c], np.asarray(got)[c])


@pytest.mark.parametrize("H,W,rps,bd", [(32, 64, 2, 8), (36, 40, 4, 8),
                                        (32, 64, 2, 10)])
def test_chroma_pass_matches_xla(H, W, rps, bd):
    rng = np.random.default_rng(11 + H + W + rps + bd)
    imgs = rng.integers(0, 1 << bd, (2, H, W + 8)).astype(np.int32)
    E = (W + 8) // 8
    S = -(-H // rps)
    tcs = (rng.integers(0, 25, (2, S, E)) << (bd - 8)).astype(np.int32)
    tcs[rng.random((2, S, E)) < 0.5] = 0
    no_p = (rng.random((S, E)) < 0.1).astype(np.int32)
    no_q = (rng.random((S, E)) < 0.1).astype(np.int32)

    refs = [dbk._chroma_pass(jnp.asarray(imgs[c]), jnp.asarray(tcs[c]),
                             jnp.asarray(no_p), jnp.asarray(no_q),
                             bit_depth=bd, rows_per_seg=rps)
            for c in range(2)]
    got = dbp.chroma_pass_stacked(jnp.asarray(imgs), jnp.asarray(tcs),
                                  jnp.asarray(no_p), jnp.asarray(no_q),
                                  bit_depth=bd, rows_per_seg=rps,
                                  interpret=True)
    for c in range(2):
        np.testing.assert_array_equal(np.asarray(refs[c]),
                                      np.asarray(got)[c])
