"""JAX pipeline on non-4:2:0 chroma geometries (4:0:0 / 4:2:2 / 4:4:4).

Encodes synthetic P-GOPs (with SAO) in each chroma format with the native
encoder, decodes with program export, and reconstructs every picture through
the batched JAX pipeline — bit-exact against the scalar C++ oracle planes.
Exercises per-axis chroma MV precision (spec 8.5.3.2.2), anisotropic intra
border subsampling, the 4:4:4 chroma smoothing rule (8.4.4.2.3), the
non-4:2:0 chroma-QP deblock mapping (8.7.2.5.5), and per-axis SAO CTB
geometry (reference geometry handling: libde265 sps.cc SubWidthC/SubHeightC,
motion.cc chroma MC, deblock.cc chroma passes).
"""
import numpy as np
import pytest

from libde265_tpu import Decoder, Encoder, pipeline

FORMATS = (("mono", 1, 1), ("422", 2, 1), ("444", 1, 1))


def _gop_stream(fmt, sx, sy, w=96, h=96, n=4):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32, chroma_format=fmt) as enc:
        enc.set_parameter("intra-period", 8)
        enc.set_parameter("sao", True)
        stream = b""
        for f in range(n):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            cb = (100 + 40 * np.sin((xx[::sy, ::sx] + f) * 0.07)).clip(
                0, 255).astype(np.uint8)
            cr = (150 - 40 * np.cos((yy[::sy, ::sx] + f) * 0.06)).clip(
                0, 255).astype(np.uint8)
            stream += enc.encode(y, None if fmt == "mono" else cb,
                                 None if fmt == "mono" else cr)
        return stream + enc.finish()


@pytest.mark.parametrize("fmt,sx,sy", FORMATS)
@pytest.mark.parametrize("device_intra", [False, True],
                         ids=["host-intra", "device-intra"])
def test_pipeline_chroma_format(native_build, fmt, sx, sy, device_intra):
    stream = _gop_stream(fmt, sx, sy)
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 4
    nplanes = 1 if fmt == "mono" else 3
    for i in range(dec.num_programs()):
        prog = dec.get_program(i)
        planes = pipeline.reconstruct(prog, device_intra=device_intra)
        for c in range(nplanes):
            ref = prog.planes[c].astype(np.int32)
            if not np.array_equal(ref, planes[c]):
                d = np.argwhere(ref != planes[c])
                raise AssertionError(
                    f"{fmt} poc={prog.poc} plane {c}: {len(d)} mismatches, "
                    f"first at {d[0]} ref={ref[tuple(d[0])]} "
                    f"got={planes[c][tuple(d[0])]}")


@pytest.mark.parametrize("fmt,sx,sy", FORMATS)
def test_pipeline_chroma_format_chain(native_build, fmt, sx, sy):
    """Independent decode chain: JAX recon feeds back as references."""
    stream = _gop_stream(fmt, sx, sy)
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(stream))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    nplanes = 1 if fmt == "mono" else 3
    for prog, (poc, planes) in zip(progs,
                                   pipeline.reconstruct_stream(progs)):
        for c in range(nplanes):
            assert np.array_equal(prog.planes[c], planes[c]), (fmt, poc, c)


@pytest.mark.parametrize("device_intra", [False, True],
                         ids=["host-intra", "device-intra"])
def test_pipeline_pcm_blocks(native_build, device_intra):
    """PCM CUs through the JAX pipeline: raw samples placed before the
    intra pass, SAO/deblock skipping PCM pixels (pcm_loop_filter_disable;
    spec 8.4.1 + 8.7; reference behavior: libde265 pcm handling in
    slice.cc/deblock.cc). Mixed PCM + transform content, P-GOP, SAO on."""
    w, h = 96, 96
    rng = np.random.default_rng(11)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("intra-period", 8)
        enc.set_parameter("sao", True)
        enc.set_parameter("pcm", True)
        enc.set_parameter("pcm-threshold", 3000)
        stream = b""
        for f in range(3):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            y[:32, :32] = rng.integers(0, 256, (32, 32))  # forces PCM
            cb = (100 + 40 * np.sin((xx[::2, ::2] + f) * 0.07)).clip(
                0, 255).astype(np.uint8)
            cr = (150 - 40 * np.cos((yy[::2, ::2] + f) * 0.06)).clip(
                0, 255).astype(np.uint8)
            stream += enc.encode(y, cb, cr)
        stream += enc.finish()
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 3
    saw_pcm = False
    for i in range(dec.num_programs()):
        prog = dec.get_program(i)
        saw_pcm = saw_pcm or len(prog.pcms) > 0
        planes = pipeline.reconstruct(prog, device_intra=device_intra)
        for c in range(3):
            ref = prog.planes[c].astype(np.int32)
            if not np.array_equal(ref, planes[c]):
                d = np.argwhere(ref != planes[c])
                raise AssertionError(
                    f"poc={prog.poc} plane {c}: {len(d)} mismatches, "
                    f"first at {d[0]}")
    assert saw_pcm, "stream encoded no PCM blocks; test is vacuous"


def test_pipeline_main10_scaling_lists(native_build):
    """Main10 + default scaling lists through the JAX pipeline: the
    int32 shift-split dequant (ops/transform.py residual_batch sf path)
    must stay exact at 10-bit coefficient ranges (spec 8.6.3)."""
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=27, ctb_size=32, bit_depth=10) as enc:
        enc.set_parameter("scaling-lists", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(3):
            y = (512 + 240 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 1023).astype(np.uint16)
            cb = (400 + 160 * np.sin((xx[::2, ::2] + f) * 0.07)).clip(
                0, 1023).astype(np.uint16)
            cr = (600 - 160 * np.cos((yy[::2, ::2] + f) * 0.06)).clip(
                0, 1023).astype(np.uint16)
            stream += enc.encode(y, cb, cr)
        stream += enc.finish()
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 3
    for i in range(dec.num_programs()):
        prog = dec.get_program(i)
        assert prog.scaling_factors is not None
        planes = pipeline.reconstruct(prog)
        for c in range(3):
            assert np.array_equal(prog.planes[c].astype(np.int32),
                                  planes[c]), (prog.poc, c)


@pytest.mark.parametrize("device_intra", [False, True],
                         ids=["host-intra", "device-intra"])
def test_pipeline_lossless_bypass(native_build, device_intra):
    """Lossless transquant-bypass P-GOP through the JAX pipeline: raw
    residual levels pass through the host fallback, bypass CUs excluded
    from deblock/SAO (cu_info bit 2 -> skip maps)."""
    w, h = 64, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("lossless", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        frames = []
        for f in range(3):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            cb = (100 + 40 * np.sin((xx[::2, ::2] + f) * 0.07)).clip(
                0, 255).astype(np.uint8)
            cr = (150 - 40 * np.cos((yy[::2, ::2] + f) * 0.06)).clip(
                0, 255).astype(np.uint8)
            frames.append((y, cb, cr))
            stream += enc.encode(y, cb, cr)
        stream += enc.finish()
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 3
    for i in range(dec.num_programs()):
        prog = dec.get_program(i)
        planes = pipeline.reconstruct(prog, device_intra=device_intra)
        for c in range(3):
            # lossless: pipeline == oracle == original input
            assert np.array_equal(prog.planes[c].astype(np.int32),
                                  planes[c]), (prog.poc, c)
            assert np.array_equal(frames[i][c].astype(np.int32),
                                  planes[c]), (prog.poc, c)


def test_lossless_inter_gop_reference_decoder(native_build, tmp_path):
    """Lossless P-GOP conformance: cu_transquant_bypass_flag emitted on
    inter/skip CUs (spec 7.3.8.5 CU syntax order), skip decisions require
    exact prediction, inter residual coded raw — the reference decoder
    must reproduce the original frames exactly."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 64, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("lossless", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(3):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            cb = (100 + 40 * np.sin((xx[::2, ::2] + f) * 0.07)).clip(
                0, 255).astype(np.uint8)
            cr = (150 - 40 * np.cos((yy[::2, ::2] + f) * 0.06)).clip(
                0, 255).astype(np.uint8)
            frames.append((y, cb, cr))
            stream += enc.encode(y, cb, cr)
        stream += enc.finish()
    sp = tmp_path / "llgop.h265"
    sp.write_bytes(stream)
    out = tmp_path / "llgop.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    data = np.fromfile(out, dtype=np.uint8)
    fs = w * h + 2 * (w // 2) * (h // 2)
    assert data.size == 3 * fs
    for i, (y, cb, cr) in enumerate(frames):
        fr = data[i * fs:(i + 1) * fs]
        assert np.array_equal(fr[:w * h].reshape(h, w), y), i
        assert np.array_equal(
            fr[w * h:w * h + (w // 2) * (h // 2)].reshape(h // 2, w // 2),
            cb), i


def test_pipeline_chroma_qp_offsets(native_build, tmp_path):
    """Nonzero pps cb/cr QP offsets flow into the chroma deblock tc lookup
    (spec 8.7.2.5.5; scalar deblock.cc:237, snapshot slots 10/11) — pipeline
    must stay bit-exact, and the stream must match the reference decoder."""
    import os
    import subprocess
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=32, ctb_size=32) as enc:
        enc.set_parameter("cb-qp-offset", 6)
        enc.set_parameter("cr-qp-offset", -6)
        enc.set_parameter("intra-period", 4)
        stream = b""
        for f in range(3):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            cb = (100 + 50 * np.sin((xx[::2, ::2] + f) * 0.09)).clip(
                0, 255).astype(np.uint8)
            cr = (150 - 50 * np.cos((yy[::2, ::2] + f) * 0.08)).clip(
                0, 255).astype(np.uint8)
            stream += enc.encode(y, cb, cr)
        stream += enc.finish()
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    for i in range(dec.num_programs()):
        planes = pipeline.reconstruct(dec.get_program(i))
        for c in range(3):
            assert np.array_equal(np.asarray(planes[c], dtype=np.uint8),
                                  pics[i].planes[c]), (i, c)
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "cqo.h265"
        sp.write_bytes(stream)
        out = tmp_path / "cqo.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        raw = np.fromfile(out, dtype=np.uint8)
        fs = w * h * 3 // 2
        for i, pic in enumerate(pics):
            fr = raw[i * fs:(i + 1) * fs]
            planes = [fr[:w * h].reshape(h, w),
                      fr[w * h:w * h * 5 // 4].reshape(h // 2, w // 2),
                      fr[w * h * 5 // 4:].reshape(h // 2, w // 2)]
            for c in range(3):
                assert np.array_equal(planes[c], pic.planes[c]), (i, c)
