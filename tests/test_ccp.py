"""RExt cross-component prediction (CCP), end to end.

The encoder signals pps_range_extension cross_component_prediction (4:4:4),
estimates per-TU ResScaleVal against the decoded luma residual, and codes the
adjusted chroma residuals (reference syntax: slice.cc:3565-3599 there).  The
decoder parses res_scale and applies the luma term with the reference
decoder's exact integer behavior (logical shifts + int32 wrap; see
native/src/transform.cc CCP hook).  Oracles: bit-exactness against the
REFERENCE decoder binary, lossless source equality, and JAX-pipeline parity
with the scalar backend.
"""
import os
import subprocess

import numpy as np
import pytest

from libde265_tpu import Decoder, Encoder, pipeline

REF_DEC = "/tmp/refbuild/dec265/dec265"


def _monotone_444(w=64, h=64):
    """Per-8x8-block brightness staircase: luma residuals stay non-negative
    (intra predicts from darker already-decoded neighbors), which is the
    regime where reference-semantics CCP engages."""
    y = np.zeros((h, w), int)
    cb = np.zeros((h, w), int)
    cr = np.zeros((h, w), int)
    lvl = 20
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            lvl += 2
            y[by:by + 8, bx:bx + 8] = lvl
            cb[by:by + 8, bx:bx + 8] = 16 + lvl * 7 // 8
            cr[by:by + 8, bx:bx + 8] = 16 + lvl * 3 // 4
    return tuple(a.clip(0, 255).astype(np.uint8) for a in (y, cb, cr))


def _encode(y, cb, cr, ccp, lossless, qp=27):
    with Encoder(qp=qp, chroma_format="444") as enc:
        if lossless:
            enc.set_parameter("lossless", True)
        if ccp:
            enc.set_parameter("ccp", True)
        return enc.encode(y, cb, cr) + enc.finish()


def _ref_decode(stream, tmp_path, w, h):
    sp = tmp_path / "ccp.h265"
    sp.write_bytes(stream)
    out = tmp_path / "ccp.yuv"
    subprocess.run([REF_DEC, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    raw = np.fromfile(out, dtype=np.uint8)
    assert raw.size == w * h * 3
    return [a.reshape(h, w) for a in np.split(raw, 3)]


def test_ccp_lossless_nonzero_scales(native_build, tmp_path):
    y, cb, cr = _monotone_444()
    stream = _encode(y, cb, cr, ccp=True, lossless=True)
    baseline = _encode(y, cb, cr, ccp=False, lossless=True)
    # CCP must pay for itself on luma-correlated chroma
    assert len(stream) < len(baseline)

    dec = Decoder(keep_programs=True)
    (pic,) = list(dec.decode_all(stream))
    tus = dec.programs()[0].tus
    scales = tus["cross_comp_scale"][tus["cidx"] != 0]
    assert (scales != 0).sum() > 10, "CCP never engaged"

    # lossless: decode == source
    for plane, src in zip(pic.planes, (y, cb, cr)):
        assert np.array_equal(plane, src)

    if os.path.exists(REF_DEC):
        ref = _ref_decode(stream, tmp_path, 64, 64)
        for c in range(3):
            assert np.array_equal(ref[c], pic.planes[c]), f"plane {c}"


def test_ccp_lossy_reference_decoder(native_build, tmp_path):
    """Lossy 4:4:4 with CCP signalled; the estimator backs off to scale 0
    where the wrap semantics would hurt, and the stream still decodes
    bit-exactly in the reference decoder (res_scale syntax present)."""
    w = h = 64
    rng = np.random.RandomState(3)
    y = rng.randint(0, 256, (h, w)).astype(np.uint8)
    cb = (y.astype(int) * 7 // 8 + 16).clip(0, 255).astype(np.uint8)
    cr = (224 - y.astype(int) * 3 // 4).clip(0, 255).astype(np.uint8)
    stream = _encode(y, cb, cr, ccp=True, lossless=False, qp=30)
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    if os.path.exists(REF_DEC):
        ref = _ref_decode(stream, tmp_path, w, h)
        for c in range(3):
            assert np.array_equal(ref[c], pic.planes[c]), f"plane {c}"


@pytest.mark.parametrize("device_intra", [False, True],
                         ids=["host-intra", "device-intra"])
def test_ccp_jax_pipeline_parity(native_build, device_intra):
    y, cb, cr = _monotone_444()
    stream = _encode(y, cb, cr, ccp=True, lossless=True)
    dec = Decoder(keep_programs=True)
    (pic,) = list(dec.decode_all(stream))
    prog = dec.get_program(0)
    scales = prog.tus["cross_comp_scale"][prog.tus["cidx"] != 0]
    assert (scales != 0).any()
    planes = pipeline.reconstruct(prog, device_intra=device_intra)
    for c in range(3):
        assert np.array_equal(np.asarray(planes[c], dtype=np.uint8),
                              pic.planes[c]), f"plane {c}"


def test_ccp_fused_decoder_parity(native_build):
    """CCP decodes inside the fused device program (bin-level partner add,
    fused_decode._bin_tus / the has_ccp residual section) — no per-picture
    host fallback."""
    from libde265_tpu.fused_decode import FusedDecoder

    y, cb, cr = _monotone_444()
    for lossless, qp in ((True, 27), (False, 30)):
        stream = _encode(y, cb, cr, ccp=True, lossless=lossless, qp=qp)
        dec = Decoder(keep_programs=True)
        (pic,) = list(dec.decode_all(stream))
        prog = dec.get_program(0)
        if lossless:
            assert (prog.tus["cross_comp_scale"]
                    [prog.tus["cidx"] != 0] != 0).any()
        fd = FusedDecoder()
        assert not fd._exotic(prog)
        fd.plan_stream([prog])
        assert fd._has_ccp == bool((prog.tus["cross_comp_scale"] != 0).any())
        planes = fd.decode(prog)
        for c in range(3):
            assert np.array_equal(np.asarray(planes[c], dtype=np.uint8),
                                  pic.planes[c]), (lossless, c)
