"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: HONEST end-to-end decode throughput of the TPU path on a real
stream — host CABAC parse + program export + per-frame feed packing +
host->device upload + the fused whole-picture device program (Pallas
segment MC, super-wave intra, batched dequant/IDCT, deblock, SAO), with
the DPB resident in HBM.  No synthetic tensors, no pre-gathered windows,
no excluded stages; the only thing not counted is display readback (the
decoded picture stays in the device DPB, as in production serving).

vs_baseline compares against the reference libde265 SSE build decoding the
SAME stream on THIS machine (single thread, back-to-back), which is the
only apples-to-apples baseline available here.  The published 36 fps 4K
figure (4-core i7) is reported as context in the extras.

Environment note: this host drives one shared TPU chip through the axon
relay; throughput swings several-fold with neighbour load, so each pass
reports best-of-N.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BUDGET_S = float(os.environ.get("TDE_BENCH_BUDGET", "1500"))
_T0 = time.perf_counter()


def _left():
    return BUDGET_S - (time.perf_counter() - _T0)


def _build():
    build = REPO / "build"
    build.mkdir(exist_ok=True)
    if not (build / "build.ninja").exists():
        subprocess.run(["cmake", "-G", "Ninja", str(REPO / "native")],
                       cwd=build, check=True, capture_output=True)
    subprocess.run(["ninja"], cwd=build, check=True, capture_output=True)
    return build


def bench_host_decode(build, stream, n_frames, binary=None):
    """End-to-end host decode fps (best of 3 back-to-back runs)."""
    exe = binary or str(build / "tdec265")
    if not Path(exe).exists() or not Path(stream).exists():
        return None
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        r = subprocess.run([exe, "-q", stream], capture_output=True)
        dt = time.perf_counter() - t0
        if r.returncode == 0:
            best = max(best, n_frames / dt)
    return best or None


def _ref_sse_decoder():
    """Reference libde265 (SSE) dec265 binary, built once under /tmp."""
    exe = Path("/tmp/refbuild/dec265/dec265")
    if exe.exists():
        return str(exe)
    ref = Path("/root/reference")
    if not ref.exists():
        return None
    try:
        bd = Path("/tmp/refbuild")
        bd.mkdir(exist_ok=True)
        subprocess.run(["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release",
                        str(ref)], cwd=bd, check=True, capture_output=True,
                       timeout=300)
        subprocess.run(["ninja"], cwd=bd, check=True, capture_output=True,
                       timeout=300)
    except Exception:
        return None
    return str(exe) if exe.exists() else None


def bench_device_decode(stream_bytes, n_passes=4):
    """Honest end-to-end TPU decode of a real stream.

    Returns (e2e_fps, parse_fps, device_fps, n_frames): parse is the host
    CABAC front end; device is feed packing + upload + the fused program;
    e2e charges both sequentially (no parse/execute overlap claimed).
    """
    import jax
    import jax.numpy as jnp
    from libde265_tpu import Decoder
    from libde265_tpu.fused_decode import FusedDecoder

    t0 = time.perf_counter()
    dec = Decoder(parse_only=True, keep_programs=True)
    list(dec.decode_all(stream_bytes))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    t_parse = time.perf_counter() - t0
    n = len(progs)
    if not n:
        return None

    fd = FusedDecoder()
    fd.plan_stream(progs)
    csum = jax.jit(lambda ps: sum(jnp.sum(p) for p in ps))

    # warm pass (compiles the one stream program)
    outs = [fd.decode(p) for p in progs]
    float(csum(outs[-1]))

    best = None
    for _ in range(n_passes):
        if _left() < 60:
            break
        fd.dpb.clear()
        fd._order.clear()
        t0 = time.perf_counter()
        outs = [fd.decode(p) for p in progs]
        float(csum(outs[-1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    if best is None:
        return None
    e2e = n / (t_parse + best)
    return e2e, n / t_parse, n / best, n


def _synth_yuv(path, w, h, frames):
    """Moving-gradient + texture synthetic content (compressible, non-flat)."""
    import numpy as np
    rng = np.random.default_rng(42)
    base = rng.integers(0, 40, (h, w), np.int16)
    yy, xx = np.mgrid[0:h, 0:w]
    with open(path, "wb") as f:
        for t in range(frames):
            y = ((xx + 4 * t) % 255 // 2 + (yy + 2 * t) % 128 + base) % 235
            cb = ((xx[::2, ::2] // 2 + 3 * t) % 200 + 20)
            cr = ((yy[::2, ::2] // 2 + 2 * t) % 200 + 20)
            f.write(y.astype(np.uint8).tobytes())
            f.write(cb.astype(np.uint8).tobytes())
            f.write(cr.astype(np.uint8).tobytes())


def _encode_1080p(build):
    """Self-encoded 1080p P-GOP stream for the large-frame benchmark."""
    yuv = "/tmp/bench1080.yuv"
    out = "/tmp/bench1080.h265"
    if Path(out).exists():
        return out
    _synth_yuv(yuv, 1920, 1088, 12)
    r = subprocess.run([str(build / "tenc265"), "-w", "1920", "-h", "1088",
                       "-q", "32", "-o", out, yuv],
                       capture_output=True, timeout=600)
    return out if r.returncode == 0 and Path(out).exists() else None


def main():
    extras = {}
    build = _build()
    girl = "/root/reference/testdata/girlshy.h265"
    girl10 = "/tmp/girlshy10x.h265"
    if not Path(girl10).exists() and Path(girl).exists():
        with open(girl10, "wb") as f:
            f.write(open(girl, "rb").read() * 10)

    host_fps = bench_host_decode(build, girl10, 750)
    if host_fps:
        extras["host_fps_girlshy"] = round(host_fps, 1)
    ref_bin = _ref_sse_decoder()
    ref_fps = bench_host_decode(build, girl10, 750, binary=ref_bin) \
        if ref_bin else None
    if ref_fps:
        extras["ref_sse_fps_girlshy"] = round(ref_fps, 1)

    # --- TPU end-to-end on girlshy ---
    value, unit, metric, vs = None, "fps", "tpu_e2e_decode_fps_girlshy", None
    try:
        r = bench_device_decode(open(girl, "rb").read())
        if r:
            e2e, pfps, dfps, n = r
            extras["tpu_parse_fps"] = round(pfps, 1)
            extras["tpu_device_fps"] = round(dfps, 2)
            value = round(e2e, 2)
    except Exception as e:  # noqa: BLE001
        extras["tpu_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- TPU end-to-end on self-encoded 1080p (budget permitting) ---
    if _left() > 600:
        try:
            s1080 = _encode_1080p(build)
            if s1080:
                r = bench_device_decode(open(s1080, "rb").read(), n_passes=3)
                if r:
                    e2e, pfps, dfps, n = r
                    extras["tpu_e2e_fps_1080p"] = round(e2e, 2)
                    extras["tpu_device_fps_1080p"] = round(dfps, 2)
                    extras["host_fps_1080p"] = bench_host_decode(
                        build, s1080, n) or 0
                    if ref_bin:
                        rf = bench_host_decode(build, s1080, n,
                                               binary=ref_bin)
                        if rf:
                            extras["ref_sse_fps_1080p"] = round(rf, 1)
        except Exception as e:  # noqa: BLE001
            extras["tpu_1080p_error"] = f"{type(e).__name__}: {e}"[:200]

    if value is None and host_fps:
        metric, value = "host_decode_fps_girlshy", round(host_fps, 1)
    if value is not None and ref_fps:
        vs = round(value / ref_fps, 4)
    extras["published_ref_4k_fps_4core"] = 36

    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs, **extras}))


if __name__ == "__main__":
    main()
