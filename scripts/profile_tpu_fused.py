"""Profile the fused TPU decode steady state: host-vs-device split,
per-frame wall time, and a cProfile of the host side.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_tpu_fused.py [stream]
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import cProfile
import io
import pstats
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from libde265_tpu import Decoder
from libde265_tpu.fused_decode import FusedDecoder

stream = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/testdata/girlshy.h265"
data = open(stream, "rb").read()

t0 = time.perf_counter()
dec = Decoder(parse_only=True, keep_programs=True)
list(dec.decode_all(data))
progs = [dec.get_program(i) for i in range(dec.num_programs())]
print(f"parse: {time.perf_counter() - t0:.2f}s for {len(progs)} frames",
      flush=True)

fd = FusedDecoder()
fd.plan_stream(progs)
csum = jax.jit(lambda ps: sum(jnp.sum(p) for p in ps))

t0 = time.perf_counter()
outs = [fd.decode(p) for p in progs]
float(csum(outs[-1]))
print(f"warm pass (incl compile): {time.perf_counter() - t0:.1f}s",
      flush=True)

# --- steady pass: per-frame dispatch time (host) vs total ---
for tag in ("async", "synced"):
    fd.dpb.clear()
    fd._order.clear()
    dts = []
    t0 = time.perf_counter()
    for p in progs:
        f0 = time.perf_counter()
        out = fd.decode(p)
        if tag == "synced":
            jax.block_until_ready(out)
        dts.append(time.perf_counter() - f0)
    float(csum(out))
    total = time.perf_counter() - t0
    dts = np.array(dts) * 1000
    print(f"{tag}: total {total:.2f}s = {len(progs)/total:.1f} fps | "
          f"per-frame ms p50={np.percentile(dts,50):.1f} "
          f"p90={np.percentile(dts,90):.1f} max={dts.max():.1f}",
          flush=True)

# --- cProfile of the host side (async pass) ---
fd.dpb.clear()
fd._order.clear()
pr = cProfile.Profile()
pr.enable()
outs = [fd.decode(p) for p in progs]
pr.disable()
float(csum(outs[-1]))
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
print(s.getvalue(), flush=True)
