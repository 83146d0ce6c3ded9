"""Pipelined (parse || pack || execute) stream decode: bit-exact vs the
scalar oracle, including the cross-thread program-list access."""
import numpy as np

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder


def _make_stream(n_frames=8, w=96, h=64):
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", 4)
    yy, xx = np.mgrid[0:h, 0:w]
    data = b""
    for t in range(n_frames):
        y = ((xx * 3 + yy * 2 + 7 * t) % 220 + 10).astype(np.uint8)
        cb = ((xx[::2, ::2] + 5 * t) % 200 + 20).astype(np.uint8)
        cr = ((yy[::2, ::2] * 2 - 3 * t) % 200 + 20).astype(np.uint8)
        data += enc.encode(y, cb, cr, pts=t)
    return data + enc.finish()


def test_pipelined_stream_bit_exact(native_build):
    from libde265_tpu.stream import PipelinedDecoder

    data = _make_stream()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 8

    pd = PipelinedDecoder()
    pd.warm(data)
    outs = pd.decode_stream(data)
    assert len(outs) == len(progs)
    for i, (planes, prog) in enumerate(zip(outs, progs)):
        for c in range(3):
            got = np.asarray(planes[c])
            want = prog.planes[c].astype(np.int32)
            assert np.array_equal(got, want), f"frame {i} plane {c}"


def test_pipelined_on_frame_callback(native_build):
    from libde265_tpu.stream import PipelinedDecoder

    data = _make_stream(n_frames=4)
    pd = PipelinedDecoder()
    seen = []
    outs = pd.decode_stream(data, on_frame=lambda i, p: seen.append(i))
    assert outs == []
    assert seen == [0, 1, 2, 3]
