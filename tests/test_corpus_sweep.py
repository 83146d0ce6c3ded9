"""Differential conformance corpus: every generated feature-matrix /
IRAP-structure / error stream must decode identically in our tdec265 and
the reference libde265 dec265 ("exact" mode), or at minimum cleanly
("nocrash" error-resilience streams).  Counterpart of the reference CI's
decodestreams sweep (/root/reference/scripts/ci-run.sh:43-57)."""
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
CORPUS = pathlib.Path("/tmp/tde_corpus")
REF_BIN = pathlib.Path("/tmp/refbuild/dec265/dec265")


def _ensure_ref():
    if REF_BIN.exists():
        return str(REF_BIN)
    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        return None
    bd = REF_BIN.parent.parent
    bd.mkdir(exist_ok=True)
    try:
        subprocess.run(["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release",
                        str(ref)], cwd=bd, check=True, capture_output=True,
                       timeout=300)
        subprocess.run(["ninja"], cwd=bd, check=True, capture_output=True,
                       timeout=300)
    except Exception:
        return None
    return str(REF_BIN) if REF_BIN.exists() else None


def test_corpus_differential_sweep(native_build):
    sys.path.insert(0, str(REPO / "scripts"))
    import decodestreams
    import make_corpus

    if not (CORPUS / "manifest.json").exists():
        make_corpus.build(CORPUS)
    ref = _ensure_ref()
    n, failures = decodestreams.sweep(CORPUS, timeout=120, jobs=2,
                                      check_hash=True, ref_bin=ref,
                                      verbose=False)
    assert n >= 26
    assert not failures, failures
    if ref is None:
        pytest.skip("reference binary unavailable; self-check only")


def test_parallel_tile_parse_bit_exact(native_build):
    """tdec265 -t 2 engages the per-tile parse threads (the reference's
    decctx.cc:963 counterpart); output must equal the sequential decode."""
    import subprocess
    import tempfile

    sys.path.insert(0, str(REPO / "scripts"))
    import make_corpus
    if not (CORPUS / "manifest.json").exists():
        make_corpus.build(CORPUS)
    exe = str(native_build / "tdec265")
    for name in ("tiles_4x1", "tiles_2x2", "tiles_gated"):
        stream = CORPUS / f"{name}.h265"
        with tempfile.TemporaryDirectory() as td:
            a, b = f"{td}/a.yuv", f"{td}/b.yuv"
            assert subprocess.run([exe, "-q", "-o", a, str(stream)],
                                  capture_output=True).returncode == 0
            assert subprocess.run([exe, "-q", "-t", "2", "-o", b,
                                   str(stream)],
                                  capture_output=True).returncode == 0
            assert open(a, "rb").read() == open(b, "rb").read(), name
