#!/usr/bin/env python3
"""Fold fresh full-bench runs into the committed per-round artifact.

Usage: bench_fold.py <prev_full.json> <out.json> <fresh1.json>...
         --fresh-only q63_bpe_merges,t23_bpe_encode,...

Per-query MIN across the fresh runs; queries NOT in --fresh-only
additionally fold in the previous round's committed minimum
(byte-identical code since that fold — interference only ever adds
time). Queries in --fresh-only (code changed this round, or new)
take minima from the fresh runs alone. The method string records
the fold; fill in control ratios by hand after reading q01/q17.
"""
import json
import sys


def main():
    args = sys.argv[1:]
    fo = []
    if "--fresh-only" in args:
        i = args.index("--fresh-only")
        fo = args[i + 1].split(",")
        del args[i:i + 2]
    prev_path, out_path, fresh_paths = args[0], args[1], args[2:]
    prev = json.load(open(prev_path))
    fresh = [json.load(open(p)) for p in fresh_paths]
    # union across ALL fresh runs (round-12 advice: a query present
    # only in later runs must not be silently dropped)
    names = sorted({n for r in fresh for n in r["queries"]})
    folded = {}
    for n in names:
        vals = [r["queries"][n] for r in fresh
                if r["queries"].get(n) is not None]
        if not vals:
            # null in every fresh run: fail loudly with the name —
            # the artifact must not claim a timing that never ran
            sys.exit(f"bench_fold: query {n!r} has no non-null "
                     f"timing in any fresh run — rerun or drop it "
                     f"explicitly")
        m = min(vals)
        if n not in fo and prev["queries"].get(n) is not None:
            m = min(m, prev["queries"][n])
        folded[n] = round(m, 3)
    # merge the fresh runs' error maps — a clean artifact must mean
    # clean runs, not a hardcoded {}
    errors = {}
    for r in fresh:
        for q, e in (r.get("errors") or {}).items():
            errors.setdefault(q, e)
    raw_totals = [round(r["value"], 1) for r in fresh]
    out = {
        "metric": "total",
        "value": round(sum(folded.values()), 3),
        "unit": "sec",
        "queries": folded,
        "errors": errors,
        "sf": fresh[0]["sf"],
        "n_queries": len(folded),
        "method": (
            f"per-query MIN folded over {len(fresh)} fresh full runs "
            f"(raw run totals {raw_totals}) and, for queries "
            f"byte-identical since the previous fold, the committed "
            f"{prev_path} minima; fresh-only minima for the "
            f"{len(fo)} code-changed/new queries: {', '.join(sorted(fo))}. "
            "CONTROL_RATIOS_TBD"),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: total {out['value']}s over "
          f"{len(folded)} queries")
    for n in sorted(fo):
        if n in folded:
            print(f"  fresh-only {n}: {folded[n]}")


if __name__ == "__main__":
    main()
