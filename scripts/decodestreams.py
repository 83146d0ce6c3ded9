#!/usr/bin/env python3
"""Fan a directory of HEVC conformance streams across a process pool and
check each decodes cleanly (counterpart of
/root/reference/scripts/decodestreams.py: crash/timeout/nonzero-exit fails).

Usage: decodestreams.py [stream-dir] [--timeout 300] [--jobs N] [--check-hash]
"""
import argparse
import concurrent.futures as cf
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
DECODER = REPO / "build" / "tdec265"


def decode_one(path: pathlib.Path, timeout: float, check_hash: bool):
    cmd = [str(DECODER), "-q"]
    if check_hash:
        cmd.append("-c")
    cmd.append(str(path))
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=timeout)
        return path.name, r.returncode, r.stderr.decode(errors="replace")[-200:]
    except subprocess.TimeoutExpired:
        return path.name, -99, "TIMEOUT"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", nargs="?", default="/var/lib/libde265-teststreams")
    ap.add_argument("--timeout", type=float, default=300)
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--check-hash", action="store_true")
    args = ap.parse_args()

    d = pathlib.Path(args.dir)
    streams = sorted(list(d.glob("*.bin")) + list(d.glob("*.bit")) +
                     list(d.glob("*.h265")) + list(d.glob("*.hevc")))
    if not streams:
        print(f"no streams found in {d}")
        return 0

    failures = []
    with cf.ThreadPoolExecutor(args.jobs) as pool:
        futs = {pool.submit(decode_one, s, args.timeout, args.check_hash): s
                for s in streams}
        for fut in cf.as_completed(futs):
            name, rc, err = fut.result()
            status = "ok" if rc == 0 else f"FAIL({rc})"
            print(f"{status:>10}  {name}")
            if rc != 0:
                failures.append((name, rc, err))

    print(f"\n{len(streams) - len(failures)}/{len(streams)} streams passed")
    for name, rc, err in failures:
        print(f"  {name}: rc={rc} {err}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
