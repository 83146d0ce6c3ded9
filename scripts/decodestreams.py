#!/usr/bin/env python3
"""Fan a directory of HEVC streams across a process pool and check each
decodes cleanly (counterpart of /root/reference/scripts/decodestreams.py:
crash/timeout/nonzero-exit fails).

With --ref, runs DIFFERENTIAL conformance: each stream is decoded by our
tdec265 AND the reference libde265 dec265 binary, and the raw YUV outputs
must be byte-identical.  A manifest.json in the stream directory (written
by scripts/make_corpus.py) may mark streams "nocrash" — error-resilience
streams where concealment output may legitimately differ and only a clean
exit is required.

Usage: decodestreams.py [stream-dir] [--timeout 300] [--jobs N]
                        [--check-hash] [--ref [BINARY]]
"""
import argparse
import concurrent.futures as cf
import hashlib
import json
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
DECODER = REPO / "build" / "tdec265"
REF_DEFAULT = "/tmp/refbuild/dec265/dec265"


def _run(cmd, timeout):
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=timeout)
        return r.returncode, r.stderr.decode(errors="replace")[-200:]
    except subprocess.TimeoutExpired:
        return -99, "TIMEOUT"


def _md5(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def decode_one(path, timeout, check_hash, ref_bin=None, mode="exact"):
    """Returns (name, rc, detail).  rc 0 = pass."""
    with tempfile.TemporaryDirectory() as td:
        ours = pathlib.Path(td) / "ours.yuv"
        cmd = [str(DECODER), "-q"]
        if check_hash and mode == "exact":
            cmd.append("-c")
        if ref_bin and mode == "exact":
            cmd += ["-o", str(ours)]
        rc, err = _run(cmd + [str(path)], timeout)
        if rc != 0:
            return path.name, rc, f"ours: {err}"
        if not ref_bin:
            return path.name, 0, ""
        theirs = pathlib.Path(td) / "ref.yuv"
        rcmd = [ref_bin, "-q"]
        if check_hash and mode == "exact":
            rcmd.append("-c")
        if mode == "exact":
            rcmd += ["-o", str(theirs)]
        rrc, rerr = _run(rcmd + [str(path)], timeout)
        if rrc != 0:
            return path.name, rrc, f"reference: {rerr}"
        if mode == "exact":
            if not ours.exists() or not theirs.exists():
                return path.name, -98, "missing YUV output"
            if _md5(ours) != _md5(theirs):
                return path.name, -97, "YUV outputs differ"
    return path.name, 0, ""


def sweep(stream_dir, timeout=300, jobs=4, check_hash=False, ref_bin=None,
          verbose=True):
    """Run the sweep; returns (n_total, failures list)."""
    d = pathlib.Path(stream_dir)
    streams = sorted(list(d.glob("*.bin")) + list(d.glob("*.bit")) +
                     list(d.glob("*.h265")) + list(d.glob("*.hevc")))
    manifest = {}
    mf = d / "manifest.json"
    if mf.exists():
        manifest = json.loads(mf.read_text())
    failures = []
    with cf.ThreadPoolExecutor(jobs) as pool:
        futs = {pool.submit(decode_one, s, timeout, check_hash, ref_bin,
                            manifest.get(s.stem, "exact")): s
                for s in streams}
        for fut in cf.as_completed(futs):
            name, rc, err = fut.result()
            if verbose:
                status = "ok" if rc == 0 else f"FAIL({rc})"
                print(f"{status:>10}  {name}", flush=True)
            if rc != 0:
                failures.append((name, rc, err))
    return len(streams), failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", nargs="?", default="/var/lib/libde265-teststreams")
    ap.add_argument("--timeout", type=float, default=300)
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--check-hash", action="store_true")
    ap.add_argument("--ref", nargs="?", const=REF_DEFAULT, default=None,
                    help="differential mode vs the reference dec265 binary")
    args = ap.parse_args()

    n, failures = sweep(args.dir, args.timeout, args.jobs, args.check_hash,
                        args.ref)
    if n == 0:
        print(f"no streams found in {args.dir}")
        return 0
    print(f"\n{n - len(failures)}/{n} streams passed")
    for name, rc, err in failures:
        print(f"  {name}: rc={rc} {err}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
