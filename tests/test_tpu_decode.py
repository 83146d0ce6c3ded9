"""Device decode path (tpu_decode.DeviceDecoder): bit-exactness vs the
scalar C++ oracle with a device-resident DPB, and the parse-only host mode.

These run on the CPU backend (conftest forces JAX_PLATFORMS=cpu); the same
code paths execute on the TPU in bench.py.
"""
import numpy as np
import pytest

from libde265_tpu import Decoder, Encoder
from libde265_tpu.tpu_decode import DeviceDecoder


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


def _check_stream(stream, n_frames=None):
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(stream))
    dd = DeviceDecoder()
    n = dec.num_programs()
    if n_frames is not None:
        assert n == n_frames
    for i in range(n):
        prog = dec.get_program(i)
        planes = dd.decode(prog)
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
def test_device_decode_bit_exact(native_build, params):
    _check_stream(_gop(**params))


def test_device_decode_girlshy_prefix(native_build):
    """Real-world stream: first 16 girlshy frames through the device path."""
    stream = open("/root/reference/testdata/girlshy.h265", "rb").read()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(stream))
    dd = DeviceDecoder()
    for i in range(16):
        prog = dec.get_program(i)
        planes = dd.decode(prog)
        for c in range(3):
            assert np.array_equal(np.asarray(planes[c]), prog.planes[c]), \
                (i, c)


def test_parse_only_device_decode(native_build):
    """Host parse-only (no pixel reconstruction, no snapshot plane copies) +
    device reconstruction == the full scalar decode."""
    stream = _gop(**{"intra-period": 8, "sao": True})
    d0 = Decoder(keep_programs=True)
    list(d0.decode_all(stream))
    oracle = [d0.get_program(i).planes for i in range(d0.num_programs())]

    dp = Decoder(parse_only=True)
    list(dp.decode_all(stream))
    assert dp.num_programs() == len(oracle)
    # parse-only snapshots carry no pixels
    assert dp.get_program(0).planes[0] is None
    dd = DeviceDecoder()
    for i in range(dp.num_programs()):
        planes = dd.decode(dp.get_program(i))
        for c in range(3):
            assert np.array_equal(np.asarray(planes[c]), oracle[i][c]), (i, c)
