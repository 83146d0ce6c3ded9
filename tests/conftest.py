"""Test configuration: JAX on a virtual 8-device CPU mesh, native lib built once.

The TPU kernels are validated on CPU here (bit-exact integer math is
platform-independent); the real-chip path is exercised by bench.py.
"""
import os
import subprocess
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon/TPU is present
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO = Path(__file__).resolve().parent.parent

import pytest


@pytest.fixture(scope="session")
def native_build():
    """Build the native library + tools once per test session."""
    build = REPO / "build"
    build.mkdir(exist_ok=True)
    if not (build / "build.ninja").exists():
        subprocess.run(
            ["cmake", "-G", "Ninja", str(REPO / "native")],
            cwd=build, check=True, capture_output=True)
    r = subprocess.run(["ninja"], cwd=build, check=False, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.fail(f"native build failed:\n{r.stdout}\n{r.stderr}")
    return build
