#!/usr/bin/env python3
"""Per-query scaling exponents from full Bench dumps (SPARK_GRAFT_BENCH_OUT).

Usage: scaling.py base.json scaled16.json scaled32.json
Emits a markdown table sorted by exponent (worst first) plus a summary.
Exponent = log(t_32 / t_1) / log(32): 0 = flat (constants dominate),
1 = linear in data volume, >1 = super-linear (a scale bug unless waived).
Sub-second base times are noise-prone; queries with t_1 < 0.15 s are
reported but exponent-capped by the 0.05 s timing floor note.
"""
import json
import math
import sys


def load(p):
    with open(p) as f:
        return json.load(f)["queries"]


def main():
    base, s16, s32 = (load(p) for p in sys.argv[1:4])
    rows = []
    for q in sorted(base):
        t1, t16, t32 = base[q], s16.get(q), s32.get(q)
        if t16 is None or t32 is None:
            continue
        exp = math.log(max(t32, 1e-3) / max(t1, 1e-3)) / math.log(32)
        rows.append((exp, q, t1, t16, t32))
    rows.sort(reverse=True)
    print("| query | 1x s | 16x s | 32x s | growth 32x | exponent |")
    print("|---|---|---|---|---|---|")
    for exp, q, t1, t16, t32 in rows:
        print(f"| {q} | {t1:.2f} | {t16:.2f} | {t32:.2f} "
              f"| {t32 / max(t1, 1e-3):.1f}x | {exp:.2f} |")
    tot1 = sum(r[2] for r in rows)
    tot32 = sum(r[4] for r in rows)
    n_super = sum(1 for r in rows if r[0] > 1.05)
    print(f"\ntotal: {tot1:.1f}s -> {tot32:.1f}s on 32x "
          f"({tot32 / tot1:.2f}x, exponent "
          f"{math.log(tot32 / tot1) / math.log(32):.2f}); "
          f"{n_super} queries with exponent > 1.05")


if __name__ == "__main__":
    main()
