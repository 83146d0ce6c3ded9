"""Microbench: per-super-wave-step cost attribution on the real chip.

Runs a 438-step lax.fori_loop over _wave_body-shaped work on a 1080p
plane, in variants that elide the plane gather / the plane scatter /
the block compute, so the ~0.9 ms/step observed in the full program can
be attributed.  Small programs compile in ~1-2 min each.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/intra_step_micro.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from libde265_tpu.fused_decode import _wave_body
from libde265_tpu.ops.intra_wave import build_mode_tables

H, W = 1088, 1920
S = 8          # block size (the common 1080p intra TU)
K = 128        # blocks per step (WAVE_CAP[3])
STEPS = 438    # the measured 1080p I-frame scan depth
NB = 4 * S + 1

rng = np.random.default_rng(0)
plane0 = jnp.asarray(rng.integers(0, 255, (H, W), np.int32))
tables = tuple(jnp.asarray(t) for t in build_mode_tables(S))

# one step's worth of records, reused every iteration (geometry spread over
# the frame so gather/scatter addresses are realistic)
meta = np.zeros((K, 5), np.int32)
meta[:, 0] = rng.integers(0, 35, K)            # mode
meta[:, 2] = (rng.integers(0, H // S, K)) * S  # y0
meta[:, 3] = (rng.integers(0, W // S, K)) * S  # x0
meta[:, 4] = 8                                 # valid
aw = np.full((K, (NB + 31) // 32), -1, np.int32)
meta_j = jnp.asarray(meta)
aw_j = jnp.asarray(aw)
resid = jnp.asarray(rng.integers(-5, 5, (K, S, S), np.int32))


def full_step(i, pl):
    return _wave_body(pl, meta_j, aw_j, resid, *tables, s=S, bit_depth=8)


def no_gather(i, pl):
    # borders fixed (VMEM constant) — isolates the [K, NB] plane gather
    fake = jnp.broadcast_to(jnp.arange(NB, dtype=jnp.int32)[None], (K, NB))
    mode = meta_j[:, 0]
    P0, P1, WT = tables
    p0, p1, w = P0[mode], P1[mode], WT[mode]
    g0 = jnp.take_along_axis(fake, p0, axis=1)
    g1 = jnp.take_along_axis(fake, p1, axis=1)
    ang = (((32 - w) * g0 + w * g1 + 16) >> 5).reshape(K, S, S)
    out = jnp.clip(ang + resid, 0, 255)
    rows = meta_j[:, 2][:, None, None] + jnp.arange(S)[None, :, None]
    cols = meta_j[:, 3][:, None, None] + jnp.arange(S)[None, None, :]
    return pl.at[rows, cols].set(out, mode="drop", unique_indices=True)


def no_scatter(i, pl):
    out = _wave_body(pl, meta_j, aw_j, resid, *tables, s=S, bit_depth=8)
    # fold the blocks back without the scatter: one dense row add
    return pl + jnp.sum(out[:1, :1] * 0)


def scatter_only(i, pl):
    out = resid  # no compute, no gather
    rows = meta_j[:, 2][:, None, None] + jnp.arange(S)[None, :, None]
    cols = meta_j[:, 3][:, None, None] + jnp.arange(S)[None, None, :]
    return pl.at[rows, cols].set(out, mode="drop", unique_indices=True)


def gather_only(i, pl):
    k = jnp.arange(NB)
    y0, x0 = meta_j[:, 2], meta_j[:, 3]
    n2 = 2 * S
    yy = jnp.where(k[None, :] < n2, y0[:, None] + (n2 - 1) - k[None, :],
                   y0[:, None] - 1)
    xx = jnp.where(k[None, :] <= n2, x0[:, None] - 1,
                   x0[:, None] + k[None, :] - n2 - 1)
    pos = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
    b = pl.reshape(-1)[pos]
    return pl + jnp.sum(b[:1, :1] * 0)


def bench(name, body):
    @jax.jit
    def run(pl):
        return lax.fori_loop(0, STEPS, body, pl)

    t0 = time.perf_counter()
    float(jnp.sum(run(plane0)))
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(plane0)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>14}: {best * 1e3 / STEPS:7.3f} ms/step "
          f"(total {best * 1e3:6.0f} ms, warm {warm:.0f}s)", flush=True)


for name, body in [("full", full_step), ("no-gather", no_gather),
                   ("scatter-only", scatter_only),
                   ("gather-only", gather_only)]:
    bench(name, body)
