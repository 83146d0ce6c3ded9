"""Encoder conformance: tenc265 output must decode identically in our
decoder and (when available) the reference libde265 decoder, with sane PSNR
against the source (the reference's rd-curves-style check)."""
import hashlib
import subprocess
from pathlib import Path

import numpy as np
import pytest

REF_DEC = Path("/tmp/refbuild/dec265/dec265")
SRC = Path("/tmp/girlshy.yuv")


def _make_source(tmp_path):
    w, h, frames = 316, 240, 2
    rng = np.random.default_rng(7)
    size = w * h * 3 // 2
    if SRC.exists():
        data = SRC.read_bytes()[: size * frames]
    else:
        data = (rng.integers(0, 255, size * frames, dtype=np.uint8)
                // 2 + 64).tobytes()
    p = tmp_path / "src.yuv"
    p.write_bytes(data)
    return p, w, h, frames


def test_encode_decode_psnr(native_build, tmp_path):
    src, w, h, frames = _make_source(tmp_path)
    out = tmp_path / "enc.h265"
    r = subprocess.run(
        [str(native_build / "tenc265"), "-w", str(w), "-h", str(h), "-q", "30",
         "-o", str(out), str(src)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert out.stat().st_size > 500

    dec = tmp_path / "dec.yuv"
    r = subprocess.run([str(native_build / "tdec265"), "-q", "-o", str(dec),
                        str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    size = w * h * 3 // 2
    assert dec.stat().st_size == size * frames

    a = np.frombuffer(src.read_bytes(), dtype=np.uint8)[: w * h].astype(float)
    b = np.frombuffer(dec.read_bytes(), dtype=np.uint8)[: w * h].astype(float)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 30.0, psnr

    if REF_DEC.exists():
        ref = tmp_path / "ref.yuv"
        r = subprocess.run([str(REF_DEC), "-q", "-o", str(ref), str(out)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert hashlib.md5(ref.read_bytes()).hexdigest() == \
            hashlib.md5(dec.read_bytes()).hexdigest()
