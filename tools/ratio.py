#!/usr/bin/env python3
"""Dev-only: compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print
per-query ratios, worst offenders first. Usage:
  python3 tools/ratio.py bench_small.json bench_big.json [flag_ratio]
"""
import json, sys

def load(p):
    for line in open(p):
        line = line.strip()
        if line.startswith('{') and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {p}")

small, big = load(sys.argv[1]), load(sys.argv[2])
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
qs, qb = small["queries"], big["queries"]
common = sorted(set(qs) & set(qb))
rows = [(k, qs[k]["sec"], qb[k]["sec"], qb[k]["sec"] / max(qs[k]["sec"], 1e-9))
        for k in common]
rows.sort(key=lambda r: -r[3])
import statistics
print(f"n={len(rows)} total {sum(r[1] for r in rows):.1f}s -> "
      f"{sum(r[2] for r in rows):.1f}s "
      f"(x{sum(r[2] for r in rows)/sum(r[1] for r in rows):.2f}); "
      f"median per-query ratio {statistics.median(r[3] for r in rows):.2f}")
print(f"\nqueries with ratio > {flag} (flag list):")
for k, a, b, r in rows:
    if r > flag:
        print(f"  {k:32s} {a:7.3f}s -> {b:7.3f}s  x{r:.1f}")
print("\ntop 15 by big-side absolute time:")
for k, a, b, r in sorted(rows, key=lambda r: -r[2])[:15]:
    print(f"  {k:32s} {a:7.3f}s -> {b:7.3f}s  x{r:.1f}")
failed = [k for k in common if not qb[k]["ok"]]
if failed:
    print("\nFAILED at big scale:", failed)
