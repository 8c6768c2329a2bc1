#!/usr/bin/env python3
"""Merge per-query Bench driver lines (one JSON object per line, each a
single-query run in its own JVM) into one BENCH_sfN.json record.

Why per-query JVMs: one JVM running the whole x100 core back-to-back
contaminates later queries with the earlier ones' JVM state (block
manager residue the async ContextCleaner hasn't drained, JIT deopt,
page-cache churn from the one-time corpus builds) — measured in round
13 as q_ngram_jaccard 259 s in-gate vs 101 s solo and
q_neardup_incremental 126 s vs 22.5 s, with ZERO code change between
the two readings. A fresh JVM per query, with the query itself as the
untimed warm-up pass, makes the committed number the warm solo quiet
number — the round-12 verdict's requirement.

The merged record keeps the same top-level keys the judge diffs
(value/queries/sf/status/n_failed/n_queries) and adds
isolation/warmup/calib_range/load_before_range so the protocol is
self-describing.
"""
import json
import sys


def main() -> None:
    runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
    if not runs:
        print(json.dumps({"status": "failed", "error": "no bench lines"}))
        sys.exit(1)
    queries = {}
    spreads = {}
    calibs = []
    loads = []
    failed = 0
    ok = True
    for r in runs:
        queries.update(r.get("queries", {}))
        # driver lines carry no per-query spread map, but a one-query
        # run's spread_total IS that query's spread
        if "spread" in r:
            spreads.update(r["spread"])
        elif len(r.get("queries", {})) == 1 and r.get("spread_total") is not None:
            spreads[next(iter(r["queries"]))] = r["spread_total"]
        if r.get("calib_before") is not None:
            calibs.append(r["calib_before"])
        calibs.extend(r.get("calib_passes", []))
        if r.get("load_before") is not None:
            loads.append(r["load_before"])
        failed += r.get("n_failed", 0)
        ok = ok and r.get("status") == "ok"
    ordered = {k: queries[k] for k in sorted(queries, key=lambda k: -queries[k])}
    out = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": ordered,
        "stat": runs[0].get("stat", "median_of_1"),
        "spread": {k: spreads[k] for k in ordered if k in spreads},
        "spread_total": round(sum(spreads.values()), 3) if spreads else None,
        "isolation": "jvm_per_query",
        "warmup": "same_query_untimed",
        "calib_range": [min(calibs), max(calibs)] if calibs else None,
        "load_before_range": [min(loads), max(loads)] if loads else None,
        "cores": runs[0].get("cores"),
        "sf": runs[0].get("sf"),
        "status": "ok" if ok and failed == 0 else "failed",
        "n_failed": failed,
        "n_queries": len(queries),
        "queries_omitted": 0,
    }
    # compact separators: the gate (and the driver) grep for
    # '"status":"ok"' — json.dumps' default ", " / ": " spacing broke
    # that exact-string check on the first merged record
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
