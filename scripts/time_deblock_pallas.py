"""Time the Pallas deblock kernels on the real TPU vs the XLA passes.

Dependent readback (scalar sum fetch) forces completion through the axon
tunnel; block_until_ready acks at enqueue.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from libde265_tpu.ops import deblock as dbk
from libde265_tpu.ops import deblock_pallas as dbp


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    _ = float(jnp.sum(out if out.ndim else out))  # warm + force
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    H, W = 1080, 1920
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (H, W + 8)).astype(np.int32))
    E = (W + 8) // 8
    bs = jnp.asarray(rng.integers(0, 3, (H // 4, E)).astype(np.int32))
    beta = jnp.asarray(rng.integers(0, 65, (H // 4, E)).astype(np.int32))
    tc = jnp.asarray(rng.integers(0, 25, (H // 4, E)).astype(np.int32))
    no_p = jnp.zeros((H // 4, E), jnp.int32)
    no_q = jnp.zeros((H // 4, E), jnp.int32)

    ref = dbk._luma_pass(img, bs, beta, tc, no_p, no_q, bit_depth=8)
    got = dbp.luma_pass(img, bs, beta, tc, no_p, no_q, bit_depth=8)
    ok = bool(jnp.all(ref == got))
    print("luma bit-exact on TPU:", ok)
    t_ref = timeit(dbk._luma_pass, img, bs, beta, tc, no_p, no_q, bit_depth=8)
    t_pl = timeit(dbp.luma_pass, img, bs, beta, tc, no_p, no_q, bit_depth=8)
    print(f"luma 1080p: xla {t_ref:.2f} ms  pallas {t_pl:.2f} ms")

    Hc, Wc = H // 2, W // 2
    imgs = jnp.asarray(rng.integers(0, 256, (2, Hc, Wc + 8)).astype(np.int32))
    Ec = (Wc + 8) // 8
    S = Hc // 2
    tcs = jnp.asarray(rng.integers(0, 25, (2, S, Ec)).astype(np.int32))
    np_ = jnp.zeros((S, Ec), jnp.int32)
    nq_ = jnp.zeros((S, Ec), jnp.int32)
    refs = [dbk._chroma_pass(imgs[c], tcs[c], np_, nq_, bit_depth=8,
                             rows_per_seg=2) for c in range(2)]
    gotc = dbp.chroma_pass_stacked(imgs, tcs, np_, nq_, bit_depth=8,
                                   rows_per_seg=2)
    okc = all(bool(jnp.all(refs[c] == gotc[c])) for c in range(2))
    print("chroma bit-exact on TPU:", okc)

    def xla_chroma(imgs, tcs, np_, nq_):
        return jnp.stack([dbk._chroma_pass(imgs[c], tcs[c], np_, nq_,
                                           bit_depth=8, rows_per_seg=2)
                          for c in range(2)])
    t_refc = timeit(jax.jit(xla_chroma), imgs, tcs, np_, nq_)
    t_plc = timeit(dbp.chroma_pass_stacked, imgs, tcs, np_, nq_,
                   bit_depth=8, rows_per_seg=2)
    print(f"chroma 1080p: xla {t_refc:.2f} ms  pallas {t_plc:.2f} ms")


if __name__ == "__main__":
    main()
