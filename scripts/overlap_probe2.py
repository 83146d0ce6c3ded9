"""Where does the wire time go: host-side enqueue blocking, or server FIFO?

Times the jnp.asarray() call itself (host blocking), the gap to a
dependent readback, and repeats the enqueued-vs-serial comparison 3x to
bound the neighbor noise.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 6
N = int(3e6 / 4)


@jax.jit
def burn(x, seed):
    a = jnp.zeros((2048, 2048), jnp.float32) + x[0] * 1e-9 + seed
    for _ in range(40):
        a = jnp.tanh(a @ a * 1e-6 + 0.1)
    return a[0, 0] + x[-1]


def fresh(tag, k=K):
    rng = np.random.default_rng(hash(tag) % 2**31)
    return [rng.integers(1, 2**30, N, np.int32) for _ in range(k)]


def main():
    print("backend:", jax.default_backend())
    x = jnp.asarray(fresh("warm", 1)[0])
    print("warm:", float(burn(x, 0.0)))

    # host-side blocking of the enqueue itself
    for r in range(3):
        bufs = fresh(f"enqcost{r}")
        ts = []
        for b in bufs:
            t0 = time.perf_counter()
            x = jnp.asarray(b)
            ts.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        v = float(x[-1])
        t_rb = (time.perf_counter() - t0) * 1e3
        print(f"asarray host-block ms: {[round(t,1) for t in ts]} "
              f"last readback {t_rb:.1f}")

    for r in range(3):
        bufs = fresh(f"ser{r}")
        t0 = time.perf_counter()
        for i, b in enumerate(bufs):
            v = float(burn(jnp.asarray(b), float(i)))
        t_serial = time.perf_counter() - t0

        bufs = fresh(f"enq{r}")
        t0 = time.perf_counter()
        outs = [burn(jnp.asarray(b), float(i)) for i, b in enumerate(bufs)]
        v = sum(float(o) for o in outs)
        t_enq = time.perf_counter() - t0
        print(f"round {r}: serial {t_serial*1e3:7.1f} ms   "
              f"enqueued {t_enq*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
