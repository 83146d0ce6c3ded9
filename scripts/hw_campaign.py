"""Round-5 hardware campaign: bit-exactness + steady-state timing of the
fused decoder on the real chip across girlshy / 1080p / 4K, one process
per stream (fresh jit caches; axon compiles are server-side cached).

Usage: python scripts/hw_campaign.py [girlshy|1080|4k ...]
"""
import os
import subprocess
import sys
import time

STREAMS = {
    "girlshy": "/root/reference/testdata/girlshy.h265",
    "1080": "/tmp/bench1080_48f.h265",
    "4k": "/tmp/bench4k_16f.h265",
}


def main():
    names = sys.argv[1:] or ["girlshy", "1080", "4k"]
    for name in names:
        path = STREAMS[name]
        env = dict(os.environ, TDE_VAL_STREAM=path)
        t0 = time.perf_counter()
        print(f"=== {name}: {path} ===", flush=True)
        r = subprocess.run(
            [sys.executable, "scripts/validate_tpu_fused.py"],
            env=env, text=True, capture_output=True, timeout=3600)
        print(r.stdout, flush=True)
        if r.returncode != 0:
            print("STDERR:", r.stderr[-2000:], flush=True)
        print(f"({name}: {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
