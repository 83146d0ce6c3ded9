"""How content-sensitive is the axon tunnel's host->device transfer?

Uploads 4 MB buffers of varying entropy and measures drain time (enqueue
all, one dependent readback).  If low-entropy patterned data drains much
faster than random data, the tunnel compresses and the feed's ENTROPY —
not its byte count — is the real wire lever.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

N = int(4e6 / 4)
R = 3


def drain(mk, tag):
    ts = []
    for r in range(R):
        b = mk(np.random.default_rng(hash((tag, r)) % 2**31))
        t0 = time.perf_counter()
        x = jnp.asarray(b)
        v = float(x[-1])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{tag:>28}: best {best*1e3:7.1f} ms  "
          f"({N*4/best/1e6:6.1f} MB/s)")


def main():
    print("backend:", jax.default_backend())
    x = jnp.asarray(np.arange(N, dtype=np.int32))
    float(x[0])

    drain(lambda g: g.integers(-2**31, 2**31, N, np.int32), "random32")
    drain(lambda g: g.integers(0, 256, N, np.int32), "random-low-byte")
    drain(lambda g: (g.integers(0, 256, N).astype(np.int32) << 8),
          "random-byte-shifted")
    drain(lambda g: np.zeros(N, np.int32), "zeros")
    drain(lambda g: np.full(N, 0x12345678, np.int32), "constant")
    drain(lambda g: np.tile(g.integers(-2**31, 2**31, 1024, np.int32),
                            N // 1024), "repeat-4KB-block")
    # half random, half zero (interleaved 2KB runs)
    def half(g):
        a = g.integers(-2**31, 2**31, N, np.int32)
        a.reshape(-1, 1024)[::2] = 0
        return a
    drain(half, "half-zero-runs")
    # a real 1080p packed feed if present
    try:
        import os, sys
        sys.path.insert(0, "/root/repo")
        from libde265_tpu import Decoder
        from libde265_tpu.fused_decode import FusedDecoder
        dec = Decoder(parse_only=True, keep_programs=True)
        list(dec.decode_all(open("/tmp/bench1080.h265", "rb").read()))
        progs = [dec.get_program(i) for i in range(dec.num_programs())]
        fd = FusedDecoder()
        fd.use_pallas_mc = True
        fd.plan_stream(progs)
        p = progs[len(progs) // 2]
        slot = fd._alloc_slot(p.poc)
        refs, slot_map = fd._refs(p)
        dims = fd._stack_dims
        sr = np.array([slot * dims[c][0] for c in range(3)], np.int32)
        layout, buf, lgs, ns = fd._pack_native(p, slot_map, sr) or \
            fd._pack_numpy(p, slot_map, sr)
        buf = np.ascontiguousarray(buf[:((buf.size) // 1024) * 1024])
        bufN = buf.size
        ts = []
        for r in range(R):
            t0 = time.perf_counter()
            x = jnp.asarray(buf + r)  # +r: defeat any dedup
            v = float(x[-1])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{'real 1080p feed':>28}: best {best*1e3:7.1f} ms  "
              f"({bufN*4/best/1e6:6.1f} MB/s, {bufN*4/1e6:.1f} MB)")
    except Exception as e:
        print("real feed probe failed:", e)


if __name__ == "__main__":
    main()
