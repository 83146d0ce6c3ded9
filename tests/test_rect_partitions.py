"""Rectangular inter partitions (2NxN / Nx2N): the encoder must emit them
on split-motion content, the streams must decode hash-identically in the
reference decoder, and the fused JAX backend must reproduce the scalar
oracle bit-exactly (exercising the decoder's non-square PU paths,
syntax.cc part_mode branches)."""
import subprocess
from collections import Counter
from pathlib import Path

import numpy as np
import pytest

from libde265_tpu import Decoder

REF_DEC = Path("/tmp/refbuild/dec265/dec265")


@pytest.fixture(scope="module", params=[False, True],
                ids=["sym", "amp"])
def rect_stream(request, native_build, tmp_path_factory):
    from libde265_tpu.encoder import Encoder
    W, H, N = 192, 96, 8
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W]
    base = rng.integers(0, 50, (H, W)).astype(np.int16)
    enc = Encoder(qp=30, ctb_size=32 if request.param else 64)
    enc.set_parameter("intra-period", N)
    if request.param:
        enc.set_parameter("amp", True)
    data = b""
    for t in range(N):
        # top/bottom halves move opposite ways: rect partitions pay off
        y = np.where(yy < H // 2, (xx + 3 * t) % 200,
                     (xx - 3 * t) % 200) + base
        y = np.clip(y, 0, 235).astype(np.uint8)
        cb = np.full((H // 2, W // 2), 120, np.uint8)
        cr = np.full((H // 2, W // 2), 124, np.uint8)
        data += enc.encode(y, cb, cr, pts=t)
    data += enc.finish()
    return data


def test_rect_pus_emitted_and_bitexact(native_build, rect_stream):
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(rect_stream))
    shapes = Counter()
    progs = []
    for i in range(dec.num_programs()):
        p = dec.get_program(i)
        progs.append(p)
        for pu in p.pus:
            shapes[(int(pu["w"]), int(pu["h"]))] += 1
    rect = {s: n for s, n in shapes.items() if s[0] != s[1]}
    assert rect, f"no rectangular PUs emitted: {dict(shapes)}"

    if REF_DEC.exists():
        import hashlib
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            s = Path(td) / "s.h265"
            s.write_bytes(rect_stream)
            o_ref = Path(td) / "ref.yuv"
            o_our = Path(td) / "our.yuv"
            r = subprocess.run([str(REF_DEC), "-q", "-o", str(o_ref),
                                str(s)], capture_output=True, text=True)
            assert r.returncode == 0, r.stderr
            r = subprocess.run([str(native_build / "tdec265"), "-q", "-c",
                                "-o", str(o_our), str(s)],
                               capture_output=True, text=True)
            assert r.returncode == 0, r.stderr
            assert hashlib.md5(o_our.read_bytes()).hexdigest() == \
                hashlib.md5(o_ref.read_bytes()).hexdigest()


def test_rect_stream_fused_backend(native_build, rect_stream):
    from libde265_tpu.fused_decode import FusedDecoder
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(rect_stream))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    fd = FusedDecoder()
    fd.plan_stream(progs)
    for i, prog in enumerate(progs):
        planes = fd.decode(prog)
        for c in range(3):
            got = np.asarray(planes[c])
            want = prog.planes[c].astype(np.int32)
            assert np.array_equal(got, want), (
                f"frame {i} plane {c}: {np.argwhere(got != want)[:4]}")
