"""Deblock sub-pass attribution by trace-time elision (TDE_DEBLOCK_SKIP).

One subprocess per variant (the in-process jit cache must not be reused
across env changes).  Timing deltas vs 'full' attribute the deblock
section's device cost to V/H luma and chroma passes.

Usage: python scripts/deblock_profile_tpu.py [stream]
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import subprocess
import sys
import time

VARIANTS = [
    ("full", ""),
    ("no-v-luma", "v"),
    ("no-h-luma", "h"),
    ("no-chroma", "cv,ch"),
    ("none", "v,h,cv,ch"),
]

STREAM = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
    "--") else "/tmp/bench1080.h265"

if "--child" in sys.argv:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from libde265_tpu import Decoder
    from libde265_tpu.fused_decode import FusedDecoder

    data = open(STREAM, "rb").read()
    dec = Decoder(parse_only=True, keep_programs=True)
    list(dec.decode_all(data))
    progs = [dec.get_program(i) for i in range(dec.num_programs())]
    fd = FusedDecoder()
    fd.plan_stream(progs)
    csum = jax.jit(lambda ps: sum(jnp.sum(p) for p in ps))
    outs = [fd.decode(p) for p in progs]
    float(csum(outs[-1]))
    best = None
    for _ in range(3):
        fd.dpb.clear()
        fd._order.clear()
        t0 = time.perf_counter()
        outs = [fd.decode(p) for p in progs]
        float(csum(outs[-1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"RESULT {len(progs) / best:.2f} fps "
          f"{best / len(progs) * 1e3:.2f} ms/frame", flush=True)
    sys.exit(0)

for name, skip in VARIANTS:
    env = dict(os.environ)
    env["TDE_DEBLOCK_SKIP"] = skip
    env["TDE_DEBUG_KNOBS"] = "1"  # opt in: outputs are intentionally wrong
    r = subprocess.run([sys.executable, __file__, STREAM, "--child"],
                       env=env, capture_output=True, text=True, timeout=2400)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    print(f"{name:>12}: {line[0][7:] if line else 'FAILED'}", flush=True)
    if not line:
        print(r.stderr[-500:], flush=True)
