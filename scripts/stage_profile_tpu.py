"""Per-stage device timing by section elision (TDE_FUSED_SKIP variants).

Runs the fused decoder with sections progressively removed; the timing
deltas attribute steady-state frame time to MC / residual / intra /
deblock / SAO.  Uses the persistent compile cache, so each variant costs
one compile the first time only.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/stage_profile_tpu.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import subprocess
import sys
import time

VARIANTS = [
    ("full", ""),
    ("no-sao", "sao"),
    ("no-filters", "deblock,sao"),
    ("no-filters-intra", "intra,deblock,sao"),
    ("mc-only", "intra,residual,deblock,sao"),
    ("feed-only", "mc,intra,residual,deblock,sao"),
]

STREAM = os.environ.get("TDE_STAGE_STREAM",
                        "/root/reference/testdata/girlshy.h265")

if len(sys.argv) > 1 and sys.argv[1] == "--child":
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
    t0 = time.perf_counter()
    outs = [fd.decode(p) for p in progs]
    float(csum(outs[-1]))
    warm = time.perf_counter() - t0
    best = None
    for _ in range(3):
        fd.dpb.clear()
        fd._order.clear()
        t0 = time.perf_counter()
        outs = [fd.decode(p) for p in progs]
        float(csum(outs[-1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"RESULT {len(progs) / best:.2f} fps {best / len(progs) * 1e3:.2f} "
          f"ms/frame (warm {warm:.0f}s)", flush=True)
    sys.exit(0)

for name, skip in VARIANTS:
    env = dict(os.environ)
    env["TDE_FUSED_SKIP"] = skip
    r = subprocess.run([sys.executable, __file__, "--child"], env=env,
                       capture_output=True, text=True, timeout=2400)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    print(f"{name:>18}: {line[0][7:] if line else 'FAILED'}", flush=True)
    if not line:
        print(r.stderr[-500:], flush=True)
