#!/usr/bin/env python3
"""Fold N bench runs per scale into a per-query scaling table.

Usage: scaling_fold.py <small.json>... -- <big.json>...
Prints a markdown table of per-query MIN seconds at each scale and
the big/small ratio, sorted by ratio descending, plus summary stats.
The per-query minimum across runs is the same fold the committed
BENCH artifacts use (interference only ever adds time).
"""
import json
import statistics
import sys


def fold(paths):
    per = {}
    totals = []
    for p in paths:
        d = json.load(open(p))
        totals.append(d["value"])
        for k, v in d["queries"].items():
            if v is None:
                continue
            per[k] = min(per.get(k, float("inf")), v)
    return per, totals


def main():
    ix = sys.argv.index("--")
    small, stot = fold(sys.argv[1:ix])
    big, btot = fold(sys.argv[ix + 1:])
    keys = sorted(set(small) & set(big))
    rows = [(k, small[k], big[k], big[k] / small[k]) for k in keys]
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | sf1 s | 10x ratio |")
    print("|---|---|---|---|")
    for k, a, b, r in rows:
        print(f"| {k} | {a:.2f} | {b:.2f} | {r:.2f}x |")
    ratios = [r[3] for r in rows]
    # base-cost filter: sub-0.15s queries are fixed-cost dominated
    sig = [r[3] for r in rows if r[1] >= 0.15]
    print()
    print(f"queries: {len(rows)}; median ratio {statistics.median(ratios):.2f}x"
          f" (all), {statistics.median(sig):.2f}x (base >= 0.15s, n={len(sig)})")
    print(f"run totals small: {[round(t,1) for t in stot]}")
    print(f"run totals big:   {[round(t,1) for t in btot]}")
    tsmall = sum(small[k] for k in keys)
    tbig = sum(big[k] for k in keys)
    print(f"min-fold totals: {tsmall:.1f}s -> {tbig:.1f}s "
          f"({tbig/tsmall:.2f}x at 10x data)")


if __name__ == "__main__":
    main()
