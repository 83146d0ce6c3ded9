"""Python Encoder (en265 bindings) round-trip tests."""
import numpy as np
import pytest

from libde265_tpu import Decoder, Encoder


def _test_frame(w, h, seed=0):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.11) * np.cos(yy * 0.07)
         + rng.integers(-4, 5, (h, w))).clip(0, 255).astype(np.uint8)
    cb = (100 + (xx[::2, ::2] // 8) % 32).astype(np.uint8)
    cr = (150 - (yy[::2, ::2] // 8) % 32).astype(np.uint8)
    return y, cb, cr


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_encode_decode_roundtrip(native_build):
    w, h = 96, 64
    y, cb, cr = _test_frame(w, h)
    with Encoder(qp=24) as enc:
        stream = enc.encode(y, cb, cr) + enc.finish()
    assert len(stream) > 100
    assert stream.startswith(b"\x00\x00\x01") or stream.startswith(
        b"\x00\x00\x00\x01")

    dec = Decoder()
    pics = list(dec.decode_all(stream))
    assert len(pics) == 1
    pic = pics[0]
    assert pic.planes[0].shape == (h, w)
    assert _psnr(y, pic.planes[0]) > 38.0
    assert _psnr(cb, pic.planes[1]) > 38.0
    assert _psnr(cr, pic.planes[2]) > 38.0


def test_multi_frame_and_params(native_build):
    w, h = 64, 64
    with Encoder(qp=35, ctb_size=32) as enc:
        stream = b""
        for i in range(3):
            y, cb, cr = _test_frame(w, h, seed=i)
            stream += enc.encode(y, cb, cr, pts=i * 40)
        stream += enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    assert len(pics) == 3


def test_bad_parameter_rejected(native_build):
    with Encoder() as enc:
        with pytest.raises(ValueError):
            enc.set_parameter("ctb-size", 13)
        with pytest.raises(ValueError):
            enc.set_parameter("no-such-knob", 1)


def test_main10_roundtrip(native_build):
    """10-bit encode -> decode through our own 16-bit pixel path."""
    w, h = 64, 64
    rng = np.random.default_rng(3)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (512 + 240 * np.sin(xx * 0.13) * np.cos(yy * 0.09)
         + rng.integers(-8, 9, (h, w))).clip(0, 1023).astype(np.uint16)
    cb = np.full((h // 2, w // 2), 400, np.uint16)
    cr = np.full((h // 2, w // 2), 620, np.uint16)
    with Encoder(qp=24, bit_depth=10) as enc:
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    assert pic.planes[0].dtype == np.uint16
    assert pic.planes[0].max() > 255  # genuinely 10-bit content
    assert _psnr(y / 4.0, pic.planes[0] / 4.0) > 40.0


def test_main10_reference_decoder(native_build, tmp_path):
    """Reference libde265 must decode our Main10 stream identically."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 64, 48
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (512 + 250 * np.sin(xx * 0.13) * np.cos(yy * 0.09)).clip(
        0, 1023).astype(np.uint16)
    with Encoder(qp=27, bit_depth=10) as enc:
        stream = enc.encode(y) + enc.finish()
    sp = tmp_path / "s10.h265"
    sp.write_bytes(stream)
    out = tmp_path / "ref10.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype="<u2")
    assert ref_yuv.size == w * h * 3 // 2
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    assert np.array_equal(ref_yuv[:w * h].reshape(h, w), pic.planes[0])
    assert np.array_equal(
        ref_yuv[w * h:w * h * 5 // 4].reshape(h // 2, w // 2), pic.planes[1])
    assert np.array_equal(
        ref_yuv[w * h * 5 // 4:].reshape(h // 2, w // 2), pic.planes[2])


def _ref_decode(stream, tmp_path, name, w, h):
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    sp = tmp_path / f"{name}.h265"
    sp.write_bytes(stream)
    out = tmp_path / f"{name}.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype=np.uint8)
    assert ref_yuv.size == w * h * 3 // 2
    return ref_yuv[:w * h].reshape(h, w)


def test_main10_jax_pipeline(native_build):
    """10-bit stream through the JAX pipeline (host + device intra)."""
    from libde265_tpu import pipeline
    w, h = 64, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (512 + 240 * np.sin(xx * 0.13) * np.cos(yy * 0.09)).clip(
        0, 1023).astype(np.uint16)
    with Encoder(qp=24, bit_depth=10) as enc:
        stream = enc.encode(y) + enc.finish()
    dec = Decoder(keep_programs=True)
    list(dec.decode_all(stream))
    prog = dec.get_program(0)
    for di in (False, True):
        planes = pipeline.reconstruct(prog, device_intra=di)
        for c in range(3):
            assert np.array_equal(prog.planes[c].astype(np.int32),
                                  planes[c]), (di, c)


def test_wpp_plus_gop_reference(native_build, tmp_path):
    """WPP substreams on P frames (contexts + entry points + inter)."""
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("wpp", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(4):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            stream += enc.encode(y)
        stream += enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    assert len(pics) == 4
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "wg.h265"
        sp.write_bytes(stream)
        out = tmp_path / "wg.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(4, h * 3 // 2, w)
        for i in range(4):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_inter_gop_reference_and_jax(native_build, tmp_path):
    """Low-delay P GOP: every frame must decode identically in the reference
    libde265, and the JAX pipeline (MC + merge/AMVP motion, residuals) must
    reproduce the scalar oracle for the P frames."""
    import os
    import subprocess
    w, h = 96, 80
    frames = []
    with Encoder(qp=30) as enc:
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(6):
            xx, yy = np.meshgrid(np.arange(w), np.arange(h))
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            frames.append(y)
            stream += enc.encode(y)
        stream += enc.finish()

    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 6
    # P frames actually use inter prediction
    prog1 = dec.get_program(1)
    assert len(prog1.pus) > 0
    # coding efficiency sanity: P frames much smaller than the IDR
    assert _psnr(frames[3], pics[3].planes[0]) > 34.0

    # JAX pipeline on the full chain (recon feedback references)
    from libde265_tpu.pipeline import reconstruct_stream
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    for i, (poc, planes) in enumerate(reconstruct_stream(progs)):
        for c in range(3):
            assert np.array_equal(
                progs[i].planes[c].astype(np.int32), planes[c]), (i, c)

    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "gop.h265"
        sp.write_bytes(stream)
        out = tmp_path / "gop.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(6, h * 3 // 2, w)
        for i in range(6):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_wpp_reference_decoder(native_build, tmp_path):
    """WPP stream (entry points + per-row context inheritance) must decode
    identically in the reference libde265 (which runs WPP threaded)."""
    w, h = 128, 96
    y, cb, cr = _test_frame(w, h, seed=31)
    with Encoder(qp=28, ctb_size=32) as enc:
        enc.set_parameter("wpp", True)
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    ry = _ref_decode(stream, tmp_path, "wpp", w, h)
    assert np.array_equal(ry, pic.planes[0])


def test_tiles_reference_decoder(native_build, tmp_path):
    w, h = 128, 96
    y, cb, cr = _test_frame(w, h, seed=32)
    with Encoder(qp=28, ctb_size=32) as enc:
        enc.set_parameter("tile-cols", 2)
        enc.set_parameter("tile-rows", 2)
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder(keep_programs=True)
    (pic,) = list(dec.decode_all(stream))
    ry = _ref_decode(stream, tmp_path, "tiles", w, h)
    assert np.array_equal(ry, pic.planes[0])
    # tile ids exported for the JAX pipeline boundary rules
    prog = dec.get_program(0)
    assert len(np.unique(prog.tile_id)) == 4
    from libde265_tpu import pipeline
    planes = pipeline.reconstruct(prog)
    for c in range(3):
        assert np.array_equal(prog.planes[c].astype(np.int32), planes[c]), c


def test_multi_slice_roundtrip_and_jax(native_build, tmp_path):
    """Multi-slice picture: reference decoder must match ours, and the JAX
    pipeline must handle n_slices > 1 (per-slice records, deblock across
    slice boundaries)."""
    import os
    import subprocess
    w, h = 96, 96
    y, cb, cr = _test_frame(w, h, seed=21)
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("ctbs-per-slice", 4)
        stream = enc.encode(y, cb, cr) + enc.finish()

    from libde265_tpu import pipeline
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 1
    prog = dec.get_program(0)
    assert prog.slice_records.shape[0] == 3  # 9 CTBs / 4 per slice
    assert len(np.unique(prog.slice_addr)) == 3
    planes = pipeline.reconstruct(prog)
    for c in range(3):
        assert np.array_equal(prog.planes[c].astype(np.int32), planes[c]), c

    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "ms.h265"
        sp.write_bytes(stream)
        out = tmp_path / "ms.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert np.array_equal(ref_yuv[:w * h].reshape(h, w), pics[0].planes[0])


def test_scaling_lists_roundtrip_and_jax(native_build, tmp_path):
    """Default scaling lists: reference decoder must match our decoder, and
    the JAX pipeline's scaling-list dequant must match the scalar oracle."""
    import os
    import subprocess
    w, h = 96, 64
    y, cb, cr = _test_frame(w, h, seed=11)
    with Encoder(qp=30) as enc:
        enc.set_parameter("scaling-lists", True)
        stream = enc.encode(y, cb, cr) + enc.finish()

    from libde265_tpu import pipeline
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 1
    prog = dec.get_program(0)
    assert prog.scaling_factors is not None
    assert set(prog.scaling_factors) == {2, 3, 4, 5}
    planes = pipeline.reconstruct(prog)
    for c in range(3):
        assert np.array_equal(prog.planes[c].astype(np.int32), planes[c]), c

    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "sl.h265"
        sp.write_bytes(stream)
        out = tmp_path / "sl.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert np.array_equal(ref_yuv[:w * h].reshape(h, w), pics[0].planes[0])


def test_reference_decoder_accepts(native_build, tmp_path):
    """The reference libde265 must decode our Python-encoded stream to the
    same pixels as our own decoder (strongest conformance check)."""
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    import os
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 64
    y, cb, cr = _test_frame(w, h, seed=7)
    with Encoder(qp=28) as enc:
        stream = enc.encode(y, cb, cr) + enc.finish()
    sp = tmp_path / "s.h265"
    sp.write_bytes(stream)
    out = tmp_path / "ref.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype=np.uint8)
    assert ref_yuv.size == w * h * 3 // 2
    ry = ref_yuv[:w * h].reshape(h, w)
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    assert np.array_equal(ry, pic.planes[0])
    rcb = ref_yuv[w * h:w * h * 5 // 4].reshape(h // 2, w // 2)
    rcr = ref_yuv[w * h * 5 // 4:].reshape(h // 2, w // 2)
    assert np.array_equal(rcb, pic.planes[1])
    assert np.array_equal(rcr, pic.planes[2])


def test_chroma_444_reference_decoder(native_build, tmp_path):
    """4:4:4 intra encode: full-size chroma TUs, luma-rule chroma smoothing,
    non-4:2:0 chroma QP mapping — reference decoder must match bit-exactly."""
    import os
    import subprocess
    w, h = 64, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.13) * np.cos(yy * 0.09)).clip(
        0, 255).astype(np.uint8)
    cb = (100 + 40 * np.sin(xx * 0.07)).clip(0, 255).astype(np.uint8)
    cr = (150 - 40 * np.cos(yy * 0.06)).clip(0, 255).astype(np.uint8)
    with Encoder(qp=26, chroma_format="444") as enc:
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    assert pic.planes[1].shape == (h, w)
    assert _psnr(cb, pic.planes[1]) > 38.0
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "c444.h265"
        sp.write_bytes(stream)
        out = tmp_path / "c444.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert ref_yuv.size == w * h * 3
        for c, arr in enumerate(np.split(ref_yuv, 3)):
            assert np.array_equal(arr.reshape(h, w), pic.planes[c]), c


def test_chroma_422_reference_decoder(native_build, tmp_path):
    """4:2:2 intra: two chroma TBs per TU (cbf pairs, mode-422 mapping) —
    reference decoder must match bit-exactly."""
    import os
    import subprocess
    w, h = 64, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.13) * np.cos(yy * 0.09)).clip(
        0, 255).astype(np.uint8)
    cb = (100 + 40 * np.sin(xx[:, ::2] * 0.07)).clip(0, 255).astype(np.uint8)
    cr = (150 - 40 * np.cos(yy[:, ::2] * 0.06)).clip(0, 255).astype(np.uint8)
    with Encoder(qp=26, chroma_format="422") as enc:
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    assert pic.planes[1].shape == (h, w // 2)
    assert _psnr(cb, pic.planes[1]) > 38.0
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "c422.h265"
        sp.write_bytes(stream)
        out = tmp_path / "c422.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert ref_yuv.size == w * h * 2
        ry = ref_yuv[:w * h].reshape(h, w)
        rcb = ref_yuv[w * h:w * h * 3 // 2].reshape(h, w // 2)
        rcr = ref_yuv[w * h * 3 // 2:].reshape(h, w // 2)
        for c, arr in enumerate((ry, rcb, rcr)):
            assert np.array_equal(arr, pic.planes[c]), c


def test_pcm_reference_decoder(native_build, tmp_path):
    """PCM blocks (raw samples, CABAC restart, pcm_loop_filter_disable):
    all-PCM streams are lossless and the reference decoder matches."""
    import os
    import subprocess
    w, h = 64, 64
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    with Encoder(qp=30) as enc:
        enc.set_parameter("pcm", True)
        enc.set_parameter("pcm-threshold", 0)
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    for a, b in zip((y, cb, cr), pic.planes):
        assert np.array_equal(a, b)
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "pcm.h265"
        sp.write_bytes(stream)
        out = tmp_path / "pcm.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert np.array_equal(ref_yuv[:w * h].reshape(h, w), pic.planes[0])

    # mixed PCM + transform CUs (threshold splits by content)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y2 = (128 + 60 * np.sin(xx * 0.13) * np.cos(yy * 0.09)).clip(
        0, 255).astype(np.uint8)
    y2[:32, :32] = rng.integers(0, 256, (32, 32))
    with Encoder(qp=30) as enc:
        enc.set_parameter("pcm", True)
        enc.set_parameter("pcm-threshold", 3000)
        stream2 = enc.encode(y2) + enc.finish()
    dec2 = Decoder()
    (p2,) = list(dec2.decode_all(stream2))
    assert np.array_equal(y2[:32, :32], p2.planes[0][:32, :32])  # PCM corner


def test_lossless_transquant_bypass(native_build, tmp_path):
    """Lossless mode: every CU transquant-bypass, residual carried raw,
    bypass CUs excluded from in-loop filtering."""
    import os
    import subprocess
    w, h = 64, 64
    rng = np.random.default_rng(4)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.13) * np.cos(yy * 0.09)
         + rng.integers(-20, 21, (h, w))).clip(0, 255).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    with Encoder(qp=30) as enc:
        enc.set_parameter("lossless", True)
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    for a, b in zip((y, cb, cr), pic.planes):
        assert np.array_equal(a, b)
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "ll.h265"
        sp.write_bytes(stream)
        out = tmp_path / "ll.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert np.array_equal(ref_yuv[:w * h].reshape(h, w), pic.planes[0])


def test_monochrome_reference_decoder(native_build, tmp_path):
    """4:0:0 (monochrome): luma-only coding, no chroma syntax."""
    import os
    import subprocess
    w, h = 64, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.13) * np.cos(yy * 0.09)).clip(
        0, 255).astype(np.uint8)
    with Encoder(qp=26, chroma_format="mono") as enc:
        stream = enc.encode(y) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    assert _psnr(y, pic.planes[0]) > 38.0
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "mono.h265"
        sp.write_bytes(stream)
        out = tmp_path / "mono.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert ref_yuv.size == w * h
        assert np.array_equal(ref_yuv.reshape(h, w), pic.planes[0])


def test_sao_encoding_reference_decoder(native_build, tmp_path):
    """SAO emission (two-pass estimation + per-CTB sao() syntax), intra and
    P-GOP with SAO'd reference pictures — reference decoder matches."""
    import os
    import subprocess
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=34, ctb_size=32) as enc:
        enc.set_parameter("sao", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        srcs = []
        for f in range(4):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            srcs.append(y)
            stream += enc.encode(y)
        stream += enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    assert len(pics) == 4
    assert _psnr(srcs[3], pics[3].planes[0]) > 38.0
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "sao.h265"
        sp.write_bytes(stream)
        out = tmp_path / "sao.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(4, h * 3 // 2, w)
        for i in range(4):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_adaptive_qp_reference_decoder(native_build, tmp_path):
    """cu_qp_delta emission (variance-adaptive per-CTB QP, QG prediction
    mirrored from the decoder) — reference decoder matches, intra and GOP."""
    import os
    import subprocess
    w, h = 96, 96
    rng = np.random.default_rng(7)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 50 * np.sin(xx * 0.05) * np.cos(yy * 0.04)).clip(
        0, 255).astype(np.uint8)
    y[:48, :48] = rng.integers(60, 200, (48, 48))
    with Encoder(qp=32, ctb_size=32) as enc:
        enc.set_parameter("adaptive-qp", True)
        enc.set_parameter("intra-period", 8)
        stream = b"".join(enc.encode(np.roll(y, f, axis=1))
                          for f in range(3)) + enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    assert len(pics) == 3
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "aq.h265"
        sp.write_bytes(stream)
        out = tmp_path / "aq.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(3, h * 3 // 2, w)
        for i in range(3):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_feature_combinations_reference_decoder(native_build, tmp_path):
    """Feature cross-products (WPP/tiles/slices x SAO/adaptive-QP) must all
    decode identically in the reference libde265."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 128, 96
    rng = np.random.default_rng(11)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.11) * np.cos(yy * 0.07)
         + rng.integers(-6, 7, (h, w))).clip(0, 255).astype(np.uint8)
    combos = [
        [("wpp", True), ("sao", True), ("adaptive-qp", True)],
        [("tile-cols", 2), ("tile-rows", 2), ("sao", True)],
        [("ctbs-per-slice", 5), ("sao", True)],
        [("ctbs-per-slice", 5), ("adaptive-qp", True)],
        [("wpp", True), ("adaptive-qp", True), ("intra-period", 4)],
    ]
    for ci, params in enumerate(combos):
        with Encoder(qp=32, ctb_size=32) as enc:
            for k, v in params:
                enc.set_parameter(k, v)
            stream = enc.encode(y) + enc.finish()
        dec = Decoder()
        (pic,) = list(dec.decode_all(stream))
        sp = tmp_path / f"combo{ci}.h265"
        sp.write_bytes(stream)
        out = tmp_path / f"combo{ci}.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        assert np.array_equal(ref_yuv[:w * h].reshape(h, w),
                              pic.planes[0]), params


def test_chroma_formats_inter_gop(native_build, tmp_path):
    """P-GOPs in every chroma format (exercises the decoder's 4:4:4/4:2:2/
    mono inter MC incl. chroma MV precision) vs the reference decoder."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    for fmt, sx, sy in (("444", 1, 1), ("422", 2, 1), ("mono", 1, 1)):
        with Encoder(qp=30, ctb_size=32, chroma_format=fmt) as enc:
            enc.set_parameter("intra-period", 8)
            stream = b""
            for f in range(4):
                y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                     * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
                cb = (100 + 40 * np.sin((xx[::sy, ::sx] + f) * 0.07)).clip(
                    0, 255).astype(np.uint8)
                cr = (150 - 40 * np.cos((yy[::sy, ::sx] + f) * 0.06)).clip(
                    0, 255).astype(np.uint8)
                stream += enc.encode(y, None if fmt == "mono" else cb,
                                     None if fmt == "mono" else cr)
            stream += enc.finish()
        dec = Decoder()
        pics = list(dec.decode_all(stream))
        assert len(pics) == 4, fmt
        sp = tmp_path / f"g{fmt}.h265"
        sp.write_bytes(stream)
        out = tmp_path / f"g{fmt}.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8)
        fs = w * h + (0 if fmt == "mono" else 2 * (w // sx) * (h // sy))
        for i in range(4):
            assert np.array_equal(
                ref_yuv[i * fs:i * fs + w * h].reshape(h, w),
                pics[i].planes[0]), (fmt, i)


def test_sei_hash_emission(native_build, tmp_path):
    """Decoded-picture-hash suffix SEI: both decoders verify our streams,
    and corruption is detected."""
    import subprocess
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("sei-hash", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(3):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            stream += enc.encode(y)
        stream += enc.finish()
    sp = tmp_path / "sei.h265"
    sp.write_bytes(stream)
    r = subprocess.run(["./build/tdec265", "-c", str(sp)],
                       capture_output=True)
    assert r.returncode == 0
    bad = bytearray(stream)
    bad[len(bad) // 2] ^= 0x40
    spb = tmp_path / "sei_bad.h265"
    spb.write_bytes(bytes(bad))
    r = subprocess.run(["./build/tdec265", "-c", str(spb)],
                       capture_output=True)
    assert r.returncode != 0


def test_b_slices_gpb_reference_and_jax(native_build, tmp_path):
    """Generalized-B low-delay (B slices, both lists = previous picture):
    bi-predictive merge candidates, inter_pred_idc coding — reference
    decoder and JAX pipeline both bit-exact."""
    import os
    import subprocess
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("b-slices", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(5):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            stream += enc.encode(y)
        stream += enc.finish()
    dec = Decoder(keep_programs=True)
    pics = list(dec.decode_all(stream))
    assert len(pics) == 5
    # slice type B recorded
    assert dec.get_program(1).slice_records[0, 0] == 0
    from libde265_tpu import pipeline
    for i in (1, 3):
        prog = dec.get_program(i)
        planes = pipeline.reconstruct(prog)
        for c in range(3):
            assert np.array_equal(prog.planes[c].astype(np.int32),
                                  planes[c]), (i, c)
    ref = "/tmp/refbuild/dec265/dec265"
    if os.path.exists(ref):
        sp = tmp_path / "b.h265"
        sp.write_bytes(stream)
        out = tmp_path / "b.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(5, h * 3 // 2, w)
        for i in range(5):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_two_reference_frames(native_build, tmp_path):
    """num-refs=2: ref_idx signalling, per-reference AMVP search, RPS with
    two negative pictures — P and B variants vs the reference decoder,
    plus the JAX pipeline on a multi-reference frame."""
    import os
    import subprocess
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    for bs in (False, True):
        with Encoder(qp=30, ctb_size=32) as enc:
            enc.set_parameter("num-refs", 2)
            enc.set_parameter("intra-period", 16)
            if bs:
                enc.set_parameter("b-slices", True)
            stream = b""
            for f in range(6):
                y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                     * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
                if f % 2:
                    y[30:60, 30:60] = 40  # alternating occluder
                stream += enc.encode(y)
            stream += enc.finish()
        dec = Decoder(keep_programs=True)
        pics = list(dec.decode_all(stream))
        assert len(pics) == 6
        prog = dec.get_program(3)
        assert len(prog.ref_pocs) >= 2  # actually multi-reference
        from libde265_tpu import pipeline
        planes = pipeline.reconstruct(prog)
        for c in range(3):
            assert np.array_equal(prog.planes[c].astype(np.int32),
                                  planes[c]), (bs, c)
        ref = "/tmp/refbuild/dec265/dec265"
        if os.path.exists(ref):
            sp = tmp_path / f"r2{bs}.h265"
            sp.write_bytes(stream)
            out = tmp_path / f"r2{bs}.yuv"
            subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                           capture_output=True)
            ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(6, h * 3 // 2,
                                                               w)
            for i in range(6):
                assert np.array_equal(ref_yuv[i, :h, :],
                                      pics[i].planes[0]), (bs, i)


def test_tmvp_reference_decoder(native_build, tmp_path):
    """Temporal MVP (collocated merge/AMVP candidates), alone and combined
    with B slices + two references — reference decoder bit-exact."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    for combo in ([("tmvp", True), ("intra-period", 16)],
                  [("tmvp", True), ("b-slices", True), ("num-refs", 2),
                   ("intra-period", 16)]):
        with Encoder(qp=30, ctb_size=32) as enc:
            for k, v in combo:
                enc.set_parameter(k, v)
            stream = b""
            for f in range(6):
                y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                     * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
                stream += enc.encode(y)
            stream += enc.finish()
        dec = Decoder()
        pics = list(dec.decode_all(stream))
        sp = tmp_path / "t.h265"
        sp.write_bytes(stream)
        out = tmp_path / "t.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(6, h * 3 // 2, w)
        for i in range(6):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), \
                (combo, i)


def test_long_term_reference(native_build, tmp_path):
    """Long-term reference pictures: slice-header LT entries, DPB LT
    marking, LT list construction and LT candidate rules (no MV scaling) —
    reference decoder bit-exact."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("lt-ref", True)
        enc.set_parameter("intra-period", 16)
        stream = b""
        for f in range(6):
            shift = 0 if f in (0, 5) else 3 * f
            y = (128 + 60 * np.sin((xx + shift) * 0.11)
                 * np.cos(yy * 0.07)).clip(0, 255).astype(np.uint8)
            stream += enc.encode(y)
        stream += enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    assert len(pics) == 6
    sp = tmp_path / "lt.h265"
    sp.write_bytes(stream)
    out = tmp_path / "lt.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(6, h * 3 // 2, w)
    for i in range(6):
        assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_weighted_prediction_fade(native_build, tmp_path):
    """Explicit weighted prediction: per-reference luma weight estimation on
    a fade (3x rate reduction), weighted uni- and bi-pred decode paths
    validated against the reference decoder."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = 128 + 60 * np.sin(xx * 0.11) * np.cos(yy * 0.07)
    frames = [np.clip(base * (1.0 - 0.12 * f), 0, 255).astype(np.uint8)
              for f in range(6)]
    for bs in (False, True):
        with Encoder(qp=30, ctb_size=32) as enc:
            enc.set_parameter("intra-period", 16)
            enc.set_parameter("weighted-pred", True)
            if bs:
                enc.set_parameter("b-slices", True)
            stream = b"".join(enc.encode(f) for f in frames) + enc.finish()
        dec = Decoder()
        pics = list(dec.decode_all(stream))
        sp = tmp_path / f"wp{bs}.h265"
        sp.write_bytes(stream)
        out = tmp_path / f"wp{bs}.yuv"
        subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                       capture_output=True)
        ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(6, h * 3 // 2, w)
        for i in range(6):
            assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), \
                (bs, i)


def test_sign_data_hiding(native_build, tmp_path):
    """Sign-data hiding: parity-carried DC-most signs per sub-block; the
    reference decoder matches bit-exactly (validates the SDH decode path)."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 96
    rng = np.random.default_rng(13)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx * 0.11) * np.cos(yy * 0.07)
         + rng.integers(-10, 11, (h, w))).clip(0, 255).astype(np.uint8)
    with Encoder(qp=27, ctb_size=32) as enc:
        enc.set_parameter("sign-hiding", True)
        enc.set_parameter("intra-period", 8)
        stream = b"".join(enc.encode(np.roll(y, f, 1))
                          for f in range(3)) + enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    sp = tmp_path / "sdh.h265"
    sp.write_bytes(stream)
    out = tmp_path / "sdh.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(3, h * 3 // 2, w)
    for i in range(3):
        assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i


def test_transform_skip(native_build, tmp_path):
    """Transform-skip 4x4 TBs (chosen per TB on screen content): the
    reference decoder matches bit-exactly (validates the ts decode path)."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 88, 72
    y = np.full((h, w), 60, np.uint8)
    y[::4, :] = 210
    y[:, ::6] = 20
    cb = np.full((h // 2, w // 2), 90, np.uint8)
    cb[::3, :] = 200
    cr = np.full((h // 2, w // 2), 160, np.uint8)
    cr[:, ::3] = 50
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("transform-skip", True)
        stream = enc.encode(y, cb, cr) + enc.finish()
    dec = Decoder()
    (pic,) = list(dec.decode_all(stream))
    sp = tmp_path / "ts.h265"
    sp.write_bytes(stream)
    out = tmp_path / "ts.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype=np.uint8)
    assert np.array_equal(ref_yuv[:w * h].reshape(h, w), pic.planes[0])
    assert np.array_equal(ref_yuv[w * h:w * h * 5 // 4].reshape(h // 2, w // 2),
                          pic.planes[1])


def test_constrained_intra_pred(native_build, tmp_path):
    """Constrained intra prediction in P GOPs (intra borders exclude
    inter-coded samples) — reference decoder bit-exact."""
    import os
    import subprocess
    ref = "/tmp/refbuild/dec265/dec265"
    if not os.path.exists(ref):
        pytest.skip("reference build unavailable")
    w, h = 96, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with Encoder(qp=30, ctb_size=32) as enc:
        enc.set_parameter("constrained-intra", True)
        enc.set_parameter("intra-period", 8)
        stream = b""
        for f in range(4):
            y = (128 + 60 * np.sin((xx + 2 * f) * 0.11)
                 * np.cos((yy + f) * 0.07)).clip(0, 255).astype(np.uint8)
            stream += enc.encode(y)
        stream += enc.finish()
    dec = Decoder()
    pics = list(dec.decode_all(stream))
    sp = tmp_path / "cip.h265"
    sp.write_bytes(stream)
    out = tmp_path / "cip.yuv"
    subprocess.run([ref, "-q", "-o", str(out), str(sp)], check=True,
                   capture_output=True)
    ref_yuv = np.fromfile(out, dtype=np.uint8).reshape(4, h * 3 // 2, w)
    for i in range(4):
        assert np.array_equal(ref_yuv[i, :h, :], pics[i].planes[0]), i
