"""SAO slice/tile boundary rules (spec 8.7.3) for the JAX pipeline.

Validates ops.sao.edge_boundary_ok against a direct per-pixel transcription
of the scalar rule (native/src/sao.cc neighbor_ok), on randomized slice/tile
layouts.  End-to-end multi-slice streams are exercised at the native level;
girlshy (single slice) regression runs in test_jax_pipeline.py.
"""
import numpy as np

from libde265_tpu.ops import sao as sao_ops


def _scalar_rule(emap, slice_addr, across, tile_id, across_tiles, cs, H, W):
    out = np.ones((H, W), dtype=bool)
    for y in range(H):
        for x in range(W):
            cls = emap[y, x]
            (dy0, dx0), (dy1, dx1) = sao_ops.EO_D[cls]

            def ok(yn, xn):
                yn = min(max(yn, 0), H - 1)
                xn = min(max(xn, 0), W - 1)
                rs = (y // cs, x // cs)
                rn = (yn // cs, xn // cs)
                if slice_addr[rn] != slice_addr[rs]:
                    if not across[rs] or not across[rn]:
                        return False
                if not across_tiles and tile_id[rn] != tile_id[rs]:
                    return False
                return True

            out[y, x] = ok(y + dy0, x + dx0) and ok(y + dy1, x + dx1)
    return out


def test_edge_boundary_ok_matches_scalar_rule():
    rng = np.random.default_rng(0)
    for trial in range(6):
        ctb_h, ctb_w, cs = 3, 4, 8
        H, W = ctb_h * cs - 3, ctb_w * cs - 5  # non-aligned picture
        emap = rng.integers(0, 4, (H, W))
        # random 2-3 slice split by raster address
        cuts = np.sort(rng.choice(np.arange(1, ctb_h * ctb_w), 2,
                                  replace=False))
        addr_flat = np.zeros(ctb_h * ctb_w, dtype=np.int32)
        addr_flat[cuts[0]:] = cuts[0]
        addr_flat[cuts[1]:] = cuts[1]
        slice_addr = addr_flat.reshape(ctb_h, ctb_w)
        across = rng.integers(0, 2, (ctb_h, ctb_w)).astype(bool)
        # keep across consistent per slice
        for a in np.unique(slice_addr):
            across[slice_addr == a] = across[slice_addr == a][0]
        # 2-column tile split
        tile_id = np.zeros((ctb_h, ctb_w), dtype=np.int32)
        tile_id[:, 2:] = 1
        across_tiles = bool(trial % 2)

        got = sao_ops.edge_boundary_ok(emap, slice_addr, across, tile_id,
                                       across_tiles, cs, H, W)
        want = _scalar_rule(emap, slice_addr, across, tile_id, across_tiles,
                            cs, H, W)
        assert np.array_equal(got, want), trial


def test_single_slice_all_ok():
    H = W = 32
    emap = np.zeros((H, W), dtype=np.int32)
    sa = np.zeros((1, 1), dtype=np.int32)
    ok = sao_ops.edge_boundary_ok(emap, sa, np.ones((1, 1), bool), sa, True,
                                  64, H, W)
    assert ok.all()
