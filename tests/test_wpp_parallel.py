"""Wavefront-parallel WPP parse must be bit-exact with the sequential
substream loop.  Counterpart of the reference's WPP worker-thread decode
(/root/reference/libde265/decctx.cc:840-961, slice.cc:4732-4826), validated
the same way its CI does: same stream, 1 vs N threads, identical output.
"""
import pathlib
import subprocess

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _encode_wpp(native_build, tmp_path, w=416, h=240, frames=8):
    """Small WPP-encoded P-GOP stream (one entry point per CTB row)."""
    rng = np.random.default_rng(7)
    yuv = tmp_path / "wpp.yuv"
    base = rng.integers(0, 60, (h, w), np.int16)
    yy, xx = np.mgrid[0:h, 0:w]
    with open(yuv, "wb") as f:
        for t in range(frames):
            y = ((xx + 3 * t) % 220 + base) % 235
            f.write(y.astype(np.uint8).tobytes())
            f.write(((xx[::2, ::2] + t) % 200 + 20).astype(np.uint8).tobytes())
            f.write(((yy[::2, ::2] + t) % 200 + 20).astype(np.uint8).tobytes())
    out = tmp_path / "wpp.h265"
    subprocess.run([str(native_build / "tenc265"), "-w", str(w), "-h", str(h),
                    "-q", "30", "-g", "4", "--wpp", "-o", str(out), str(yuv)],
                   check=True, capture_output=True, timeout=300)
    return out


def test_wpp_parallel_parse_bit_exact(native_build, tmp_path):
    strm = _encode_wpp(native_build, tmp_path)
    outs = []
    for t in (0, 4):
        yuv = tmp_path / f"out_t{t}.yuv"
        opt = ["-t", str(t)] if t else []
        r = subprocess.run([str(native_build / "tdec265"), "-q", *opt,
                            "-o", str(yuv), str(strm)],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stderr
        outs.append(yuv.read_bytes())
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_wpp_parallel_parse_python_threads(native_build, tmp_path):
    """Decoder(threads=N) engages the parallel WPP parse through the Python
    binding (the ctypes prototype for de265_start_worker_threads must pass
    the 64-bit context); decoded pictures must match the sequential parse."""
    import sys
    sys.path.insert(0, str(REPO))
    from libde265_tpu import Decoder

    strm = _encode_wpp(native_build, tmp_path, w=192, h=128, frames=4)
    data = strm.read_bytes()
    runs = []
    for th in (0, 4):
        dec = Decoder(keep_programs=False, threads=th)
        runs.append([pic.planes[0].copy() for pic in dec.decode_all(data)])
    assert len(runs[0]) == len(runs[1]) == 4
    for a, b in zip(runs[0], runs[1]):
        np.testing.assert_array_equal(a, b)
