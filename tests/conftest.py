"""Test configuration: JAX on a virtual 8-device CPU mesh, native lib built once.

The TPU kernels are validated on CPU here (bit-exact integer math is
platform-independent); the real-chip path is exercised by bench.py.
"""
import os
import subprocess
from pathlib import Path

# Force the CPU backend even when an axon/TPU plugin is present.  In this
# venv jax is pre-imported at interpreter start, so env vars set here are too
# late for jax's config snapshot — JAX_PLATFORMS/JAX_PLATFORM_NAME in
# os.environ are ignored.  jax.config.update IS honored as long as it runs
# before backend initialization (measured round 2/3).  Env vars are still set
# for any subprocesses the tests spawn.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Make the CPU suite hermetic against accelerator-service outages: jax is
# pre-imported in this venv with the axon plugin factory registered, and
# backend initialization blocks forever while the service is unreachable
# (observed round 3) even for CPU queries.  Deregister the non-CPU
# factories before anything initializes backends, and strip the plugin
# path for subprocesses the tests spawn.
import sys

os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and "axon" not in p)

import jax

try:
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

jax.config.update("jax_platform_name", "cpu")
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


def pytest_sessionstart(session):
    import jax
    assert jax.default_backend() == "cpu", (
        f"test suite must run on the CPU backend, got {jax.default_backend()!r}"
        " — JAX_PLATFORM_NAME=cpu was not honored")
    assert len(jax.devices()) == 8, (
        f"expected a virtual 8-device CPU platform, got {len(jax.devices())}")

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
