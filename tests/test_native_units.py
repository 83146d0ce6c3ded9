"""Runs the native self-registering unit-test binary (dev-tools pattern)."""
import subprocess


def test_native_unit_suite(native_build):
    r = subprocess.run([str(native_build / "tde265-tests")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
