"""Real tile-sharded decode on a CPU mesh: tiled streams produced by our
encoder are decoded with one tile per device and must be bit-exact with
the scalar oracle (native reconstruction).  Covers 1-row columns and 2-D
tile grids, with and without loop_filter_across_tiles."""
import numpy as np
import pytest

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder
from libde265_tpu.parallel import make_mesh
from libde265_tpu.parallel.sharded_decode import (ShardedTileDecoder,
                                                  tile_columns, tile_grid)


def _content(rng, W, H, t):
    yy, xx = np.mgrid[0:H, 0:W]
    y = ((xx * 3 + yy * 2 + t * 7) % 200 + 20).astype(np.uint8)
    y[(yy // 8 + xx // 8 + t) % 4 == 0] += 30
    cb = ((xx[::2, ::2] + t * 3) % 160 + 40).astype(np.uint8)
    cr = ((yy[::2, ::2] * 2 - t * 5) % 160 + 40).astype(np.uint8)
    return y, cb, cr


def _make_stream(across: bool, W=256, H=64, cols=4, rows=1, frames=6):
    rng = np.random.default_rng(7)
    enc = Encoder(qp=27, ctb_size=32)
    enc.set_parameter("tile-cols", cols)
    if rows > 1:
        enc.set_parameter("tile-rows", rows)
    enc.set_parameter("across-tiles", across)
    enc.set_parameter("intra-period", 8)
    enc.set_parameter("sao", True)
    data = b""
    for t in range(frames):
        y, cb, cr = _content(rng, W, H, t)
        data += enc.encode(y, cb, cr, pts=t)
    data += enc.finish()
    return data


@pytest.mark.parametrize("across", [False, True],
                         ids=["gated", "halo-exchange"])
def test_sharded_tile_decode(native_build, across):
    data = _make_stream(across)
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 6
    cols = tile_columns(progs[0])
    assert len(cols) == 4
    assert all(x1 - x0 == 64 for x0, x1 in cols)
    assert progs[0].across_tiles == across

    mesh = make_mesh(4)
    sd = ShardedTileDecoder(mesh)
    with mesh:
        for i, prog in enumerate(progs):
            planes = sd.decode(prog)
            for c in range(3):
                got = np.asarray(planes[c])
                want = prog.planes[c].astype(np.int32)
                assert np.array_equal(got, want), (
                    f"frame {i} plane {c}: "
                    f"{np.argwhere(got != want)[:4]}")


@pytest.mark.parametrize("across", [False, True],
                         ids=["gated", "halo-exchange"])
@pytest.mark.parametrize("grid", [(2, 2), (2, 4)], ids=["2x2", "2x4"])
def test_sharded_tile_grid_2d(native_build, across, grid):
    """2-D tile grids: one tile per device, halo exchange on both axes."""
    R, C = grid
    data = _make_stream(across, W=64 * C, H=64 * R, cols=C, rows=R,
                        frames=4)
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 4
    rows, cols = tile_grid(progs[0])
    assert (len(rows), len(cols)) == (R, C)
    assert progs[0].across_tiles == across

    mesh = make_mesh(R * C)
    sd = ShardedTileDecoder(mesh)
    with mesh:
        for i, prog in enumerate(progs):
            planes = sd.decode(prog)
            for c in range(3):
                got = np.asarray(planes[c])
                want = prog.planes[c].astype(np.int32)
                assert np.array_equal(got, want), (
                    f"frame {i} plane {c}: "
                    f"{np.argwhere(got != want)[:4]}")
