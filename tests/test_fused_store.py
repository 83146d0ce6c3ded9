"""The production (pallas + fused-DPB-store) decode path, exercised on CPU
in interpret mode on a tiny stream: bit-exact vs the scalar oracle,
including the donated in-program ring-slot writes and P-frame references
read back from the ring."""
import numpy as np

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder
from libde265_tpu.fused_decode import FusedDecoder


def test_pallas_fused_store_bit_exact(native_build):
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("intra-period", 3)
    yy, xx = np.mgrid[0:48, 0:64]
    data = b""
    for t in range(5):
        y = ((xx * 3 + yy * 2 + 11 * t) % 220 + 10).astype(np.uint8)
        data += enc.encode(y, pts=t)
    data += enc.finish()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 5

    fd = FusedDecoder()
    fd.use_pallas_mc = True  # force the production path (interpret on CPU)
    fd.plan_stream(progs)
    for i, p in enumerate(progs):
        out = fd.decode(p)
        for c in range(3):
            got = np.asarray(out[c])
            want = p.planes[c].astype(np.int32)
            assert np.array_equal(got, want), (
                f"frame {i} plane {c}: {np.argwhere(got != want)[:3]}")
