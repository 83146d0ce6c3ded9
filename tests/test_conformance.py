"""Stream-level conformance: decode girlshy.h265 and check the golden MD5
(the reference CI oracle, /root/reference/scripts/ci-run.sh:96-102)."""
import hashlib
import subprocess

STREAM = "/root/reference/testdata/girlshy.h265"
GOLDEN_MD5 = "b81538fa33a67278e5263e231e43ca98"


def test_reference_dec265_dropin(native_build):
    """ABI parity: the reference's dec265.cc compiles UNMODIFIED against our
    headers + libtde265.so and passes the girlshy SEI-hash + YUV-md5 oracle
    (reference dec265/dec265.cc, en265.h/de265.h Appendix-A surface)."""
    import os
    import pathlib
    script = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "dropin_test.sh"
    if not os.path.exists("/root/reference/dec265/dec265.cc"):
        import pytest
        pytest.skip("no reference checkout")
    r = subprocess.run(["bash", str(script)], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_girlshy_bit_exact(native_build, tmp_path):
    out = tmp_path / "out.yuv"
    r = subprocess.run(
        [str(native_build / "tdec265"), "-q", "-o", str(out), STREAM],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    digest = hashlib.md5(out.read_bytes()).hexdigest()
    assert digest == GOLDEN_MD5
    assert out.stat().st_size == 316 * 240 * 3 // 2 * 75
