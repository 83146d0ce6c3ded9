"""Segment-level parallel decode: IRAP-delimited segments fan out across
the virtual CPU mesh devices and the concatenated output is bit-exact
with the scalar oracle."""
import numpy as np

import jax

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder
from libde265_tpu.parallel.gop_parallel import (GopParallelDecoder,
                                                split_segments)


def _stream(n_frames=12, period=3):
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", period)
    yy, xx = np.mgrid[0:48, 0:64]
    data = b""
    for t in range(n_frames):
        y = ((xx * 3 + yy * 2 + 9 * t) % 215 + 12).astype(np.uint8)
        data += enc.encode(y, pts=t)
    return data + enc.finish()


def test_split_segments(native_build):
    data = _stream()
    segs = split_segments(data)
    assert len(segs) == 4  # 12 frames, IDR every 3
    # every segment decodes standalone
    for seg in segs:
        dec = Decoder()
        assert len(list(dec.decode_all(seg))) == 3


def test_gop_parallel_bit_exact(native_build):
    data = _stream()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]

    gp = GopParallelDecoder(jax.devices())
    outs = gp.decode_stream(data)
    assert len(outs) == len(progs) == 12
    devices_used = set()
    for i, (planes, prog) in enumerate(zip(outs, progs)):
        devices_used.add(next(iter(planes[0].devices())).id)
        for c in range(3):
            got = np.asarray(planes[c])
            want = prog.planes[c].astype(np.int32)
            assert np.array_equal(got, want), f"frame {i} plane {c}"
    assert len(devices_used) == 4  # four segments on four distinct devices
