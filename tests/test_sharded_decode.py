"""Real tile-sharded decode on a CPU mesh: a 4-tile-column stream produced
by our encoder is decoded with one tile per device and must be bit-exact
with the scalar oracle (native reconstruction)."""
import numpy as np
import pytest

import jax

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder
from libde265_tpu.parallel import make_mesh
from libde265_tpu.parallel.sharded_decode import (ShardedTileDecoder,
                                                  tile_columns)


def _content(rng, W, H, t):
    yy, xx = np.mgrid[0:H, 0:W]
    y = ((xx * 3 + yy * 2 + t * 7) % 200 + 20).astype(np.uint8)
    y[(yy // 8 + xx // 8 + t) % 4 == 0] += 30
    cb = ((xx[::2, ::2] + t * 3) % 160 + 40).astype(np.uint8)
    cr = ((yy[::2, ::2] * 2 - t * 5) % 160 + 40).astype(np.uint8)
    return y, cb, cr


def _make_stream(across: bool):
    rng = np.random.default_rng(7)
    W, H, T = 256, 64, 4
    enc = Encoder(qp=27, ctb_size=32)
    enc.set_parameter("tile-cols", T)
    enc.set_parameter("across-tiles", across)
    enc.set_parameter("intra-period", 8)
    enc.set_parameter("sao", True)
    data = b""
    for t in range(6):
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
