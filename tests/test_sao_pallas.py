"""Pallas SAO kernel vs the jnp reference (interpret mode on CPU)."""
import numpy as np

from libde265_tpu.ops import sao as sao_ops
from libde265_tpu.ops.sao_pallas import sao_plane_fused, sao_plane_via_pallas


def test_pallas_sao_matches_jnp():
    rng = np.random.default_rng(0)
    for trial in range(3):
        H, W = (48, 80) if trial < 2 else (37, 61)  # non-tile-aligned too
        src = rng.integers(0, 1 << (8 + 2 * (trial == 1)),
                           (H, W)).astype(np.int32)
        bd = 8 if trial != 1 else 10
        tmap = rng.integers(0, 3, (H, W)).astype(np.int32)
        emap = rng.integers(0, 4, (H, W)).astype(np.int32)
        bmap = rng.integers(0, 32, (H, W)).astype(np.int32)
        omap = rng.integers(-7, 8, (H, W, 4)).astype(np.int32)
        skip = rng.random((H, W)) < 0.05
        eo = rng.random((H, W)) > 0.1
        want = np.asarray(sao_ops.sao_plane(src, tmap, emap, bmap, omap,
                                            skip, bd, edge_ok=eo))
        got = sao_plane_via_pallas(src, tmap, emap, bmap, omap, skip, bd,
                                   edge_ok=eo, interpret=True)
        assert np.array_equal(want, got), trial


def test_pallas_sao_fused_matches_jnp():
    """The in-graph variant (traced inputs, jnp neighbor resolve)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    for trial in range(2):
        H, W = (48, 80) if trial == 0 else (37, 61)
        src = rng.integers(0, 256, (H, W)).astype(np.int32)
        tmap = rng.integers(0, 3, (H, W)).astype(np.int32)
        emap = rng.integers(0, 4, (H, W)).astype(np.int32)
        bmap = rng.integers(0, 32, (H, W)).astype(np.int32)
        omap = rng.integers(-7, 8, (H, W, 4)).astype(np.int32)
        skip = rng.random((H, W)) < 0.05
        eo = rng.random((H, W)) > 0.1
        want = np.asarray(sao_ops.sao_plane(src, tmap, emap, bmap, omap,
                                            skip, 8, edge_ok=eo))
        got = np.asarray(sao_plane_fused(
            jnp.asarray(src), jnp.asarray(tmap), jnp.asarray(emap),
            jnp.asarray(bmap), jnp.asarray(omap), jnp.asarray(skip),
            bit_depth=8, edge_ok=jnp.asarray(eo), interpret=True))
        assert np.array_equal(want, got), trial
