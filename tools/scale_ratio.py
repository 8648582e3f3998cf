#!/usr/bin/env python3
"""Scale-proof ratio report (harness tooling): compare per-query
medians from two Bench detail lines (e.g. sf0.1 vs sf1 = 10x data)
and flag superlinear queries (ratio > threshold).

Usage: scale_ratio.py <small_bench_log> <big_bench_log> [threshold]
Reads the LAST {"metric":"detail",...} line of each log.
"""
import json
import sys


def detail(path):
    last = None
    for line in open(path):
        line = line.strip()
        if line.startswith('{"metric":"detail"'):
            last = line
    if last is None:
        raise SystemExit(f"no detail line in {path}")
    return json.loads(last)["median"]


def main(small, big, threshold=15.0):
    s, b = detail(small), detail(big)
    rows = []
    for q in sorted(b):
        if q in s and s[q] and b[q]:
            rows.append((b[q] / s[q], s[q], b[q], q))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > threshold]
    print(f"{'ratio':>7} {'small':>8} {'big':>8}  query")
    for ratio, sv, bv, q in rows[:15]:
        mark = " <-- SUPERLINEAR" if ratio > threshold else ""
        print(f"{ratio:7.1f} {sv:8.3f} {bv:8.3f}  {q}{mark}")
    print(f"\nqueries={len(rows)} flagged(>{threshold}x)={len(flagged)} "
          f"total_small={sum(r[1] for r in rows):.1f}s "
          f"total_big={sum(r[2] for r in rows):.1f}s")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 15.0))
