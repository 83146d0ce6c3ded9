"""Can the axon relay overlap host->device transfers with device compute?

Measures three schedules of the same work (K uploads of a ~3 MB buffer +
K compute-heavy jitted programs with dependent readbacks at the end):
  serial   : upload_i -> exec_i(upload_i) -> readback_i   (forced RTTs)
  enqueued : all uploads+execs enqueued, one final readback
  prefetch : upload_{i+1} enqueued BEFORE exec_i (double-buffer order)

If enqueued/prefetch ~= max(sum_wire, sum_exec) the relay overlaps the
tunnel with compute and LEVER #3 (double-buffered feed) is real; if it is
~= sum_wire + sum_exec the relay is a strict FIFO and only byte cuts help.

block_until_ready acks at ENQUEUE on axon, so every timing below ends with
a dependent scalar readback (float(...)), never block_until_ready.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 8
MB = 3.0
N = int(MB * 1e6 / 4)


@jax.jit
def burn(x, seed):
    # ~40 ms of device work independent of most of x's bytes
    a = jnp.zeros((2048, 2048), jnp.float32) + x[0] + seed
    for _ in range(40):
        a = a @ a * 1e-6 + 0.1
    return a[0, 0] + x[-1]


def fresh_bufs(tag):
    # novel content every time (the tunnel does not dedup, zeros are cheap)
    rng = np.random.default_rng(hash(tag) % 2**31)
    return [rng.integers(1, 2**30, N, np.int32) for _ in range(K)]


def main():
    print("backend:", jax.default_backend())
    # warm compile + tunnel
    x = jnp.asarray(fresh_bufs("warm")[0])
    print("warm:", float(burn(x, 0.0)))

    bufs = fresh_bufs("serial")
    t0 = time.perf_counter()
    for i, b in enumerate(bufs):
        x = jnp.asarray(b)
        v = float(burn(x, float(i)))
    t_serial = time.perf_counter() - t0

    bufs = fresh_bufs("enq")
    t0 = time.perf_counter()
    outs = []
    for i, b in enumerate(bufs):
        x = jnp.asarray(b)
        outs.append(burn(x, float(i)))
    v = sum(float(o) for o in outs)
    t_enq = time.perf_counter() - t0

    bufs = fresh_bufs("pre")
    t0 = time.perf_counter()
    xs = [jnp.asarray(bufs[0])]
    outs = []
    for i in range(K):
        if i + 1 < K:
            xs.append(jnp.asarray(bufs[i + 1]))  # next wire under this exec
        outs.append(burn(xs[i], float(i)))
    v = sum(float(o) for o in outs)
    t_pre = time.perf_counter() - t0

    # isolated costs
    bufs = fresh_bufs("wire")
    t0 = time.perf_counter()
    acc = 0.0
    for b in bufs:
        x = jnp.asarray(b)
        acc += float(x[-1])     # dependent readback forces the wire
    t_wire = time.perf_counter() - t0

    x = jnp.asarray(bufs[0])
    t0 = time.perf_counter()
    for i in range(K):
        v = float(burn(x, 100.0 + i))
    t_exec = time.perf_counter() - t0

    print(f"K={K} x {MB:.1f} MB")
    print(f"wire-only : {t_wire*1e3:7.1f} ms ({t_wire/K*1e3:6.1f} /frame)")
    print(f"exec-only : {t_exec*1e3:7.1f} ms ({t_exec/K*1e3:6.1f} /frame)")
    print(f"serial    : {t_serial*1e3:7.1f} ms")
    print(f"enqueued  : {t_enq*1e3:7.1f} ms")
    print(f"prefetch  : {t_pre*1e3:7.1f} ms")
    print(f"sum model : {(t_wire+t_exec)*1e3:7.1f} ms   "
          f"max model : {max(t_wire, t_exec)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
