"""Seconds-fast canary for the TPU-shaped FusedDecoder config path.

On CPU `use_pallas_mc` is False, so TPU-only code in decode() (the static
config dict, env-var gates, Pallas branches) short-circuits and a plain
Python error there ships silently — exactly what broke round 3 (a missing
`import os` raised NameError only on the real chip).  This test forces
`use_pallas_mc = True` on a tiny stream so any such breakage fails in CI
in seconds, not at bench time on hardware.
"""
import numpy as np

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder
from libde265_tpu.fused_decode import FusedDecoder


def test_fused_config_builds_with_pallas_mc(native_build, monkeypatch):
    # both values of the env gates must at least build the config dict
    monkeypatch.setenv("TDE_PALLAS_INTRA", "")
    yy, xx = np.mgrid[0:32, 0:32]
    enc = Encoder(qp=34, ctb_size=32)
    enc.set_parameter("intra-period", 4)
    frames = [((xx * 5 + yy * 3 + 17 * t) % 200 + 20).astype(np.uint8)
              for t in range(2)]
    data = b"".join(enc.encode(f, pts=t) for t, f in enumerate(frames))
    data += enc.finish()

    dec = Decoder(keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 2

    fd = FusedDecoder()
    fd.use_pallas_mc = True  # the production (TPU) path, interpreted on CPU
    fd.plan_stream(progs)
    for i, p in enumerate(progs):
        out = fd.decode(p)
        for c in range(3):
            assert np.array_equal(np.asarray(out[c]),
                                  p.planes[c].astype(np.int32)), (i, c)
