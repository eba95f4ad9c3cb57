#!/usr/bin/env python3
"""Per-query scaling exponents from graft.SuiteScale dumps (full-hash mode).

Usage: suite_scaling.py base.json scaled.json factor [axis]

  axis = facts  -> only queries that touch NO corpus table (documents/
                   embeddings); a facts fixture leaves the corpus tables at
                   base size, so a corpus query's "exponent" there measures
                   nothing and is dropped.
  axis = corpus -> only queries that touch documents or embeddings.
  axis = all    -> everything present in both dumps (default).

Exponent = log(t_k / t_1) / log(k). Queries with t_1 < 0.15 s sit at the
timing floor; their exponents are printed but flagged '~'. Failures
("failed": true — or negative sec in pre-round-11 dumps) are reported
and excluded from totals.
"""
import json
import math
import sys

CORPUS_TABLES = {"documents", "embeddings"}


def load(p):
    with open(p) as f:
        return json.load(f)["queries"]


def main():
    base, scaled = load(sys.argv[1]), load(sys.argv[2])
    k = float(sys.argv[3])
    axis = sys.argv[4] if len(sys.argv) > 4 else "all"
    rows, failures = [], []
    for q in sorted(set(base) & set(scaled)):
        tables = set(base[q].get("tables", []))
        is_corpus = bool(tables & CORPUS_TABLES)
        if axis == "facts" and is_corpus:
            continue
        if axis == "corpus" and not is_corpus:
            continue
        t1, tk = base[q]["sec"], scaled[q]["sec"]
        if (base[q].get("failed") or scaled[q].get("failed")
                or t1 < 0 or tk < 0):  # negative sec = pre-r11 sentinel
            failures.append(q)
            continue
        exp = math.log(max(tk, 1e-3) / max(t1, 1e-3)) / math.log(k)
        rows.append((exp, q, t1, tk, t1 < 0.15))
    rows.sort(reverse=True)
    print(f"| query | 1x s | {int(k)}x s | growth | exponent |")
    print("|---|---|---|---|---|")
    for exp, q, t1, tk, floor in rows:
        flag = "~" if floor else ""
        print(f"| {q} | {t1:.2f} | {tk:.2f} | {tk / max(t1, 1e-3):.1f}x "
              f"| {exp:.2f}{flag} |")
    tot1 = sum(r[2] for r in rows)
    totk = sum(r[3] for r in rows)
    n_super = sum(1 for r in rows if r[0] > 1.05 and not r[4])
    agg_exp = math.log(totk / tot1) / math.log(k) if tot1 > 0 else float("nan")
    print(f"\ntotal ({axis}, {len(rows)} queries): {tot1:.1f}s -> {totk:.1f}s "
          f"at {int(k)}x ({totk / tot1:.2f}x, aggregate exponent {agg_exp:.2f}); "
          f"{n_super} super-linear (>1.05, above timing floor)")
    if failures:
        print(f"FAILURES: {failures}")


if __name__ == "__main__":
    main()
