"""Bit-exactness + steady-state timing of the fused device decoder on the
real chip.  Stream selectable: TDE_VAL_STREAM=/tmp/bench1080.h265 etc.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/validate_tpu_fused.py
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import sys
import time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from libde265_tpu import Decoder
from libde265_tpu.fused_decode import FusedDecoder

STREAM = os.environ.get("TDE_VAL_STREAM",
                        "/root/reference/testdata/girlshy.h265")
stream = open(STREAM, "rb").read()
dec = Decoder(keep_programs=True)
list(dec.decode_all(stream))
progs = [dec.get_program(i) for i in range(dec.num_programs())]
print(f"{STREAM}: {len(progs)} frames "
      f"{progs[0].planes[0].shape[1]}x{progs[0].planes[0].shape[0]}",
      flush=True)
fd = FusedDecoder()
print("pallas_mc:", fd.use_pallas_mc, flush=True)
fd.plan_stream(progs)
t0 = time.perf_counter()
ok = True
for i, prog in enumerate(progs):
    planes = fd.decode(prog)
    outs = [np.asarray(p) for p in planes]
    for c in range(3):
        if not np.array_equal(outs[c], prog.planes[c].astype(np.int32)):
            d = np.argwhere(outs[c] != prog.planes[c].astype(np.int32))
            print(f"frame {i} plane {c}: {len(d)} mismatches first {d[:3]}",
                  flush=True)
            ok = False
    if not ok:
        break
    if i == 0:
        print(f"frame0 (incl compile): {time.perf_counter()-t0:.1f}s",
              flush=True)
print("ALL OK" if ok else "FAILED", flush=True)
if ok:
    csum = jax.jit(lambda ps: sum(jnp.sum(p) for p in ps))
    for r in range(3):
        fd.dpb.clear(); fd._order.clear()
        t0=time.perf_counter()
        outs=[fd.decode(p) for p in progs]
        float(csum(outs[-1]))
        dt=time.perf_counter()-t0
        print(f"pass {r}: {dt:.2f}s = {len(progs)/dt:.1f} fps", flush=True)
