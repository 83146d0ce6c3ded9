"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: frames/sec of the 4K TPU pixel pipeline (batched dequant+IDCT
residuals + MC interpolation + full-frame deblock V/H + SAO) on one TPU
core, against the reference's published 4K figure (36 fps on a 4-core
i7-2700K, BASELINE.md).  Extras report the host front-end (CABAC+syntax+
scalar pixels) end-to-end fps on the girlshy conformance stream.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent


def bench_host_decode():
    """End-to-end host decode fps on girlshy (75 frames, 316x240)."""
    build = REPO / "build"
    build.mkdir(exist_ok=True)
    if not (build / "build.ninja").exists():
        subprocess.run(["cmake", "-G", "Ninja", str(REPO / "native")],
                       cwd=build, check=True, capture_output=True)
    subprocess.run(["ninja"], cwd=build, check=True, capture_output=True)
    stream = "/root/reference/testdata/girlshy.h265"
    if not Path(stream).exists():
        return None
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        r = subprocess.run([str(build / "tdec265"), "-q", stream],
                           capture_output=True)
        dt = time.perf_counter() - t0
        if r.returncode == 0:
            best = max(best, 75 / dt)
    return best


def bench_tpu_pipeline(width, height, reps=20):
    """Device pixel-pipeline fps for one frame size (luma + 4:2:0 chroma)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libde265_tpu.ops import transform as tx
    from libde265_tpu.ops import mc as mc_ops
    from libde265_tpu.ops.deblock import _luma_pass, _chroma_pass
    from libde265_tpu.ops.sao_pallas import sao_neighbors_jnp, sao_plane_pallas

    rng = np.random.default_rng(0)
    H, W = height, width
    E = W // 8

    # Representative workload: ~40% of the frame area carries coded 8x8 TUs,
    # ~10% 16x16; half the frame is inter-predicted with 16x16 PUs.
    n8 = int(0.4 * W * H / 64)
    n16 = int(0.1 * W * H / 256)
    n_pu = int(0.5 * W * H / 256)

    img = jnp.asarray(rng.integers(0, 255, (H, W + 8), dtype=np.int32))
    img_c = jnp.asarray(rng.integers(0, 255, (H // 2, W // 2 + 8), dtype=np.int32))
    seg = (H // 4, E)
    bs = jnp.asarray(rng.integers(0, 3, seg, dtype=np.int32))
    beta = jnp.full(seg, 48, jnp.int32)
    tc = jnp.full(seg, 6, jnp.int32)
    zero_seg = jnp.zeros(seg, jnp.int32)
    segc = (H // 4, W // 16)
    tcc = jnp.asarray(rng.integers(0, 6, segc, dtype=np.int32))
    zc = jnp.zeros(segc, jnp.int32)

    lv8 = jnp.asarray(rng.integers(-64, 64, (n8, 8, 8), dtype=np.int32))
    f8 = jnp.full((n8,), 57 << 4, jnp.int32)
    lv16 = jnp.asarray(rng.integers(-64, 64, (n16, 16, 16), dtype=np.int32))
    f16 = jnp.full((n16,), 57 << 4, jnp.int32)
    no8 = jnp.zeros((n8,), bool)
    no16 = jnp.zeros((n16,), bool)

    win = jnp.asarray(rng.integers(0, 255, (n_pu, 16 + 7, 16 + 7), dtype=np.int32))
    fx = jnp.asarray(rng.integers(0, 4, (n_pu,), dtype=np.int32))
    fy = jnp.asarray(rng.integers(0, 4, (n_pu,), dtype=np.int32))

    tmap = jnp.asarray(rng.integers(0, 3, (H, W), dtype=np.int32))
    emap = jnp.asarray(rng.integers(0, 4, (H, W), dtype=np.int32))
    bmap = jnp.asarray(rng.integers(0, 28, (H, W), dtype=np.int32))
    omap = jnp.asarray(rng.integers(-4, 5, (H, W, 4), dtype=np.int32))
    skip = jnp.zeros((H, W), bool)

    seg_h = ((W + 8) // 4, H // 8)
    bs_h = jnp.asarray(rng.integers(0, 3, seg_h, dtype=np.int32))
    beta_h = jnp.full(seg_h, 48, jnp.int32)
    tc_h = jnp.full(seg_h, 6, jnp.int32)
    zero_h = jnp.zeros(seg_h, jnp.int32)

    # all tensors passed as arguments (closure captures would be baked into
    # the HLO as literals and blow up the program size)
    args = dict(img=img, img_c=img_c, lv8=lv8, f8=f8, no8=no8, lv16=lv16,
                f16=f16, no16=no16, win=win, fx=fx, fy=fy, bs=bs, beta=beta,
                tc=tc, zero_seg=zero_seg, bs_h=bs_h, beta_h=beta_h, tc_h=tc_h,
                zero_h=zero_h, tcc=tcc, zc=zc, tmap=tmap, emap=emap, bmap=bmap,
                omap=omap, skip=skip)

    @jax.jit
    def frame_step(img, img_c, lv8, f8, no8, lv16, f16, no16, win, fx, fy,
                   bs, beta, tc, zero_seg, bs_h, beta_h, tc_h, zero_h, tcc,
                   zc, tmap, emap, bmap, omap, skip):
        r8 = tx.residual_batch(lv8, f8, no8, no8, 3, 8)
        r16 = tx.residual_batch(lv16, f16, no16, no16, 4, 8)
        mc = mc_ops.mc_luma_batch(win, fx, fy, 16, 16, 8)
        v = _luma_pass(img, bs, beta, tc, zero_seg, zero_seg, bit_depth=8)
        h = _luma_pass(v.T, bs_h, beta_h, tc_h, zero_h, zero_h, bit_depth=8)
        cv = _chroma_pass(img_c, tcc, zc, zc, bit_depth=8)
        simg = h.T[:, 4:4 + W].astype(jnp.int32)
        na, nb, valid = sao_neighbors_jnp(simg, emap)
        offs4 = jnp.transpose(omap, (2, 0, 1))
        s = sao_plane_pallas(simg, na, nb, tmap, bmap, offs4,
                             skip.astype(jnp.int32), valid, bit_depth=8)
        return r8.sum() + r16.sum() + mc.sum() + cv.sum() + s.sum()

    # warm up (compile)
    frame_step(**args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = frame_step(**args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return 1.0 / dt


def main():
    host_fps = bench_host_decode()

    try:
        fps_4k = bench_tpu_pipeline(3840, 2160)
        fps_1080 = bench_tpu_pipeline(1920, 1080)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": "girlshy host decode frames/sec (TPU bench failed)",
            "value": round(host_fps or 0.0, 2),
            "unit": "fps",
            "vs_baseline": round((host_fps or 0.0) / 284.0, 3),
            "error": str(e)[:200],
        }))
        return

    baseline_4k = 36.0  # reference 4K fps (BASELINE.md, i7-2700K 4 cores)
    print(json.dumps({
        "metric": "4K pixel-pipeline (residual+MC+deblock+SAO) frames/sec, 1 TPU core",
        "value": round(fps_4k, 2),
        "unit": "fps",
        "vs_baseline": round(fps_4k / baseline_4k, 3),
        "fps_1080p_pipeline": round(fps_1080, 2),
        "girlshy_host_decode_fps": round(host_fps or 0.0, 2),
    }))


if __name__ == "__main__":
    main()
