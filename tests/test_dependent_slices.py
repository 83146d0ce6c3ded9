"""Dependent slice segments: the encoder emits multi-segment pictures
(first independent, rest dependent with continued CABAC contexts), the
reference decoder must agree byte-exactly, and the fused JAX backend must
match the scalar oracle (exercising the decoder's dependent-slice state
restore, syntax.cc:1202)."""
import hashlib
import subprocess
from pathlib import Path

import numpy as np
import pytest

from libde265_tpu import Decoder
from libde265_tpu.encoder import Encoder

REF_DEC = Path("/tmp/refbuild/dec265/dec265")


@pytest.fixture(scope="module")
def dep_stream(native_build):
    rng = np.random.default_rng(9)
    W, H = 192, 96
    enc = Encoder(qp=30, ctb_size=32)
    enc.set_parameter("ctbs-per-slice", 5)
    enc.set_parameter("dependent-slices", True)
    enc.set_parameter("intra-period", 4)
    enc.set_parameter("sao", True)
    yy, xx = np.mgrid[0:H, 0:W]
    data = b""
    for t in range(6):
        y = ((xx + 2 * t) % 220 + rng.integers(0, 30, (H, W))).clip(
            0, 250).astype(np.uint8)
        cb = ((xx[::2, ::2] + t) % 200 + 20).astype(np.uint8)
        cr = ((yy[::2, ::2] * 2 - t) % 200 + 20).astype(np.uint8)
        data += enc.encode(y, cb, cr, pts=t)
    data += enc.finish()
    return data


def test_dependent_slices_reference_exact(native_build, dep_stream, tmp_path):
    s = tmp_path / "dep.h265"
    s.write_bytes(dep_stream)
    ours = tmp_path / "ours.yuv"
    r = subprocess.run([str(native_build / "tdec265"), "-q", "-c", "-o",
                        str(ours), str(s)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    if REF_DEC.exists():
        ref = tmp_path / "ref.yuv"
        r = subprocess.run([str(REF_DEC), "-q", "-o", str(ref), str(s)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert hashlib.md5(ours.read_bytes()).hexdigest() == \
            hashlib.md5(ref.read_bytes()).hexdigest()


def test_dependent_slices_fused_backend(native_build, dep_stream):
    from libde265_tpu.fused_decode import FusedDecoder
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(dep_stream))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    assert len(progs) == 6
    fd = FusedDecoder()
    fd.plan_stream(progs)
    for i, prog in enumerate(progs):
        planes = fd.decode(prog)
        for c in range(3):
            got = np.asarray(planes[c])
            want = prog.planes[c].astype(np.int32)
            assert np.array_equal(got, want), f"frame {i} plane {c}"
