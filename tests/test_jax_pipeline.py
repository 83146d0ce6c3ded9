"""JAX pipeline validation: reconstruct pictures from their FramePrograms
with the batched device kernels and compare bit-exactly against the scalar
C++ oracle (the snapshot planes)."""
import numpy as np
import pytest

from libde265_tpu import Decoder
from libde265_tpu import pipeline

STREAM = "/root/reference/testdata/girlshy.h265"


@pytest.fixture(scope="module")
def programs():
    dec = Decoder(keep_programs=True)
    data = open(STREAM, "rb").read()
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    return progs


def _check(prog):
    planes = pipeline.reconstruct(prog)
    for c in range(3):
        ref = prog.planes[c].astype(np.int32)
        got = planes[c]
        if not np.array_equal(ref, got):
            diff = np.argwhere(ref != got)
            raise AssertionError(
                f"poc={prog.poc} plane {c}: {len(diff)} mismatches, "
                f"first at {diff[0]} ref={ref[tuple(diff[0])]} "
                f"got={got[tuple(diff[0])]}")


def test_intra_frame(native_build, programs):
    _check(programs[0])


def test_first_inter_frames(native_build, programs):
    for p in programs[1:4]:
        _check(p)


def test_independent_decode_chain(native_build, programs):
    """First 6 pictures decoded as an independent chain (reconstructed
    pictures feed back as references) must match the scalar oracle."""
    from libde265_tpu.pipeline import reconstruct_stream

    for i, (poc, planes) in enumerate(reconstruct_stream(programs[:6])):
        ref = programs[i]
        for c in range(3):
            assert np.array_equal(ref.planes[c], planes[c]), (i, poc, c)


def test_device_intra_wavefront(native_build, programs):
    """Wavefront-batched device intra (ops.intra_wave) must equal the
    host-sequential oracle on the I-frame and an inter frame."""
    for p in (programs[0], programs[2]):
        planes = pipeline.reconstruct(p, device_intra=True)
        for c in range(3):
            assert np.array_equal(p.planes[c].astype(np.int32), planes[c]), \
                (p.poc, c)


@pytest.mark.slow
def test_device_intra_all_frames(native_build, programs):
    # validated green 2026-08-16: every 5th girlshy frame + full run bit-exact
    for p in programs:
        planes = pipeline.reconstruct(p, device_intra=True)
        for c in range(3):
            assert np.array_equal(p.planes[c].astype(np.int32), planes[c])


@pytest.mark.slow
def test_all_frames(native_build, programs):
    # validated green 2026-08-16: all 75 girlshy frames bit-exact through the
    # JAX pipeline (run with: pytest -m slow tests/test_jax_pipeline.py)
    for p in programs:
        _check(p)
