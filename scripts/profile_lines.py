#!/usr/bin/env python3
"""Aggregate a TDE_PROF sample dump into per-line / per-function counts.

Usage:
    TDE_PROF=/tmp/prof.txt ./build/tdec265 -q stream.h265
    python scripts/profile_lines.py /tmp/prof.txt [--top 30]
"""
import argparse
import collections
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    per_mod = collections.defaultdict(list)  # mod -> [(offset, count)]
    total = 0
    with open(args.dump) as f:
        for line in f:
            if line.startswith("#"):
                continue
            loc, cnt = line.rsplit(" ", 1)
            mod, off = loc.rsplit("+", 1)
            per_mod[mod].append((off, int(cnt)))
            total += int(cnt)

    by_line = collections.Counter()
    by_func = collections.Counter()
    for mod, offs in per_mod.items():
        addrs = [o for o, _ in offs]
        try:
            out = subprocess.run(
                ["addr2line", "-e", mod, "-f", "-C", "-i"] + addrs,
                capture_output=True, text=True, check=True).stdout
        except Exception as e:  # noqa: BLE001
            print(f"addr2line failed for {mod}: {e}", file=sys.stderr)
            continue
        lines = out.splitlines()
        # -i emits pairs (func, file:line) repeated per inline frame;
        # attribute the sample to the innermost frame (first pair)
        k = 0
        groups = []
        # addr2line with -i gives variable-length output; re-run without -i
        # for deterministic pairing instead
        out = subprocess.run(
            ["addr2line", "-e", mod, "-f", "-C"] + addrs,
            capture_output=True, text=True, check=True).stdout
        lines = out.splitlines()
        for i, (off, cnt) in enumerate(offs):
            func = lines[2 * i]
            fileline = lines[2 * i + 1].split("/")[-1]
            by_line[f"{fileline:30s} {func[:60]}"] += cnt
            by_func[func[:80]] += cnt

    print(f"total samples: {total}\n")
    print("== by function ==")
    for name, cnt in by_func.most_common(args.top):
        print(f"{100*cnt/total:6.2f}%  {cnt:7d}  {name}")
    print("\n== by line ==")
    for name, cnt in by_line.most_common(args.top):
        print(f"{100*cnt/total:6.2f}%  {cnt:7d}  {name}")


if __name__ == "__main__":
    main()
