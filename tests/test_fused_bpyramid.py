"""Fused device decoder on a reordered hierarchical-B stream: distinct
L0/L1 references and POC-vs-decode-order divergence must stay bit-exact
vs the scalar oracle."""
import numpy as np

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder
from libde265_tpu.fused_decode import FusedDecoder


def test_fused_decode_b_pyramid(native_build):
    yy, xx = np.mgrid[0:64, 0:96]
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", 4)
    enc.set_parameter("b-pyramid", True)
    data = b"".join(
        enc.encode(((xx * 3 + yy * 2 + 9 * t) % 215 + 12).astype(np.uint8),
                   pts=t) for t in range(9)) + enc.finish()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 9

    fd = FusedDecoder()
    fd.plan_stream(progs)
    for i, p in enumerate(progs):
        out = fd.decode(p)
        for c in range(3):
            got = np.asarray(out[c])
            want = p.planes[c].astype(np.int32)
            assert np.array_equal(got, want), f"frame {i} plane {c}"


def test_fused_decode_b_pyramid2(native_build):
    """Two-level pyramid (reorder depth 2, A4 B2 b1 b3 decode order)
    through the fused production path, bit-exact vs the scalar oracle."""
    yy, xx = np.mgrid[0:64, 0:96]
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", 8)
    enc.set_parameter("b-pyramid", True)
    enc.set_parameter("pyramid-levels", 2)
    enc.set_parameter("tmvp", True)
    data = b"".join(
        enc.encode(((xx * 3 + yy * 2 + 9 * t) % 215 + 12).astype(np.uint8),
                   pts=t) for t in range(13)) + enc.finish()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 13

    fd = FusedDecoder()
    fd.use_pallas_mc = True  # the production path (interpret on CPU)
    fd.plan_stream(progs)
    for i, p in enumerate(progs):
        out = fd.decode(p)
        for c in range(3):
            got = np.asarray(out[c])
            want = p.planes[c].astype(np.int32)
            assert np.array_equal(got, want), (i, c)
