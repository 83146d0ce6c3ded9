"""Fused device decode path (fused_decode.FusedDecoder): one jit dispatch
per picture, bit-exact vs the scalar C++ oracle.

Covers the same stream zoo as test_tpu_decode plus capacity-watermark
regrowth (decoding without plan_stream) and the parse-only front end.
"""
import numpy as np
import pytest

from libde265_tpu import Decoder, Encoder
from libde265_tpu.fused_decode import FusedDecoder


def _gop(w=96, h=96, n=5, **params):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        for k, v in params.items():
            enc.set_parameter(k, v)
        stream = b""
        for f in range(n):
            y = (128 + 60 * np.sin((xx + 3 * f) * 0.11)
                 * np.cos((yy + 2 * f) * 0.07)).clip(0, 255).astype(np.uint8)
            cb = (100 + 40 * np.sin((xx[::2, ::2] + f) * 0.07)).clip(
                0, 255).astype(np.uint8)
            cr = (150 - 40 * np.cos((yy[::2, ::2] + f) * 0.06)).clip(
                0, 255).astype(np.uint8)
            stream += enc.encode(y, cb, cr)
        return stream + enc.finish()


def _check_stream(stream, plan=True, n_frames=None):
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(stream))
    n = dec.num_programs()
    if n_frames is not None:
        assert n == n_frames
    progs = [dec.get_program(i) for i in range(n)]
    fd = FusedDecoder()
    if plan:
        fd.plan_stream(progs)
    for i, prog in enumerate(progs):
        planes = fd.decode(prog)
        for c in range(len(planes)):
            assert np.array_equal(np.asarray(planes[c]), prog.planes[c]), \
                (i, c)


@pytest.mark.parametrize("params", [
    {"intra-period": 8, "sao": True},
    {"intra-period": 4},
    {"intra-period": 8, "b-slices": True, "tmvp": True},
    {"intra-period": 8, "num-refs": 2},
    {"intra-period": 8, "weighted-pred": True},
], ids=["p-sao", "short-gop", "b-tmvp", "2refs", "weighted"])
def test_fused_decode_bit_exact(native_build, params):
    _check_stream(_gop(**params))


def test_fused_decode_watermark_growth(native_build):
    """Without plan_stream the capacities grow as watermarks mid-stream;
    results must stay bit-exact across the regrowth recompiles."""
    _check_stream(_gop(**{"intra-period": 4, "sao": True}), plan=False)


def test_fused_decode_girlshy_prefix(native_build):
    """Real-world stream through the fused path (parse-only front end)."""
    stream = open("/root/reference/testdata/girlshy.h265", "rb").read()
    oracle = Decoder(keep_programs=True)
    list(oracle.decode_all(stream))

    dec = Decoder(parse_only=True, keep_programs=True)
    list(dec.decode_all(stream))
    progs = [dec.get_program(i) for i in range(16)]
    fd = FusedDecoder()
    fd.plan_stream(progs)
    for i, prog in enumerate(progs):
        planes = fd.decode(prog)
        want = oracle.get_program(i).planes
        for c in range(3):
            assert np.array_equal(np.asarray(planes[c]), want[c]), (i, c)
