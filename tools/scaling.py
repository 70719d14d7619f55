#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. sf0.1 vs sf1.0) and print
per-query scaling factors, flagging super-linear growth.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> [data_ratio]

data_ratio defaults to 10 (sf0.1 -> sf1.0). A query is flagged when its
time ratio exceeds the data ratio by more than 30% AND its big-SF time is
non-trivial (>1s) — sub-second queries are dominated by fixed planning
cost, where ratios are noise.
"""
import sys, json

def main(small_path, big_path, ratio=10.0):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    rows = []
    for name in common:
        s, b = sq[name], bq[name]
        r = b / s if s > 0 else float("inf")
        flag = "SUPER-LINEAR" if (r > ratio * 1.3 and b > 1.0) else ""
        rows.append((name, s, b, r, flag))
    rows.sort(key=lambda t: -t[3])
    print(f"{'query':30s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for name, s, b, r, flag in rows:
        print(f"{name:30s} {s:8.2f} {b:8.2f} {r:7.1f} {flag}")
    ts, tb = sum(sq[n] for n in common), sum(bq[n] for n in common)
    print(f"\ntotal {ts:.1f}s -> {tb:.1f}s  ratio {tb/ts:.1f}x for {ratio}x data "
          f"({len(common)} queries)")
    flagged = [r for r in rows if r[4]]
    print(f"flagged super-linear: {[r[0] for r in flagged]}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
