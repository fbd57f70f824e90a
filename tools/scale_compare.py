#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. sf0.1 vs a ScaleUp'd sf1) and
print the scaling table for BASELINE.md: per-query ratio, sorted worst
first, with the sub/super-linear verdict against the data factor.

Usage: scale_compare.py small.json big.json [factor]
"""
import json, statistics, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qa, qb = small["queries"], big["queries"]
common = sorted(set(qa) & set(qb), key=lambda k: -(qb[k] / qa[k]))
ratios = [qb[k] / qa[k] for k in common]
print(f"common queries: {len(common)}  data factor: {factor:g}x")
print(f"total: {small['value']:.1f}s -> {big['value']:.1f}s "
      f"(x{big['value'] / small['value']:.2f})")
print(f"per-query ratio: median x{statistics.median(ratios):.2f}, "
      f"p90 x{sorted(ratios)[int(0.9 * len(ratios))]:.2f}, "
      f"max x{max(ratios):.1f}")
sup = [k for k in common if qb[k] / qa[k] > factor]
print(f"super-linear (> x{factor:g}): {len(sup)}")
print(f"\n{'query':30s}{'small':>8s}{'big':>9s}{'ratio':>8s}")
for k in common[:20]:
    print(f"{k:30s}{qa[k]:8.2f}{qb[k]:9.2f}  x{qb[k] / qa[k]:5.1f}")
