#!/usr/bin/env python3
"""Scale-trend table: join two Bench sidecar JSONs (e.g. sf0.1 vs sf1)
and print per-query times + the scaling ratio, sorted by ratio.

Usage: scale_trend.py <bench_small.json> <bench_big.json> [data_ratio=10]

Flags queries whose time ratio exceeds data_ratio (superlinear) — at a
10x data step, linear work should scale <=10x; sublinear (bounded
output, broadcast probe) queries scale far less. Uses the `aged` map
when present (second timed pass — free of first-run JIT effects) and
falls back to `queries` (cold).
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    return d.get("aged") or d["queries"], d["queries"]


def main(small_path, big_path, data_ratio=10.0):
    s_aged, s_cold = load(small_path)
    b_aged, b_cold = load(big_path)
    rows = []
    for q in sorted(s_aged):
        if q not in b_aged:
            continue
        s, b = s_aged[q], b_aged[q]
        ratio = b / s if s > 0 else float("inf")
        rows.append((ratio, q, s, b, s_cold.get(q), b_cold.get(q)))
    rows.sort(reverse=True)
    total_s = sum(r[2] for r in rows)
    total_b = sum(r[3] for r in rows)
    print(f"{'query':32s} {'aged_s':>8s} {'aged_b':>8s} {'ratio':>7s}  flag")
    for ratio, q, s, b, cs, cb in rows:
        flag = "SUPERLINEAR" if ratio > data_ratio else ""
        print(f"{q:32s} {s:8.2f} {b:8.2f} {ratio:7.2f}  {flag}")
    print(f"{'TOTAL (aged)':32s} {total_s:8.2f} {total_b:8.2f} "
          f"{total_b / total_s:7.2f}")
    n_super = sum(1 for r in rows if r[0] > data_ratio)
    print(f"== {len(rows)} queries, {n_super} superlinear at {data_ratio}x data ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
