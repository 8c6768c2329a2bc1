#!/usr/bin/env python3
"""Last-wins patch of an existing BENCH_sfN.json with fresh solo Bench
lines — the adjudication merge the protocol has so far done by hand.

    python3 tools/patch_bench.py BENCH_sf10.json /tmp/solo_lines.jsonl

Each input line is one Bench driver record (usually a single-query solo
run). For every query the lines carry, the record's median / spread /
calib are replaced wholesale and the query's `batched` flag is cleared
(a solo re-record is, by definition, not batched). `value`,
`spread_total`, `calib_range`, and `hot_queries` are recomputed from the
patched maps so the committed totals always match their own rows.

The patched record keeps the original's protocol stamps (`stat`,
`isolation`, `warmup`, `io_settle_range` widened by the new lines) —
the merge only ever narrows measurement provenance, never relabels it.
Writes the patched record in-place (same compact separators the gate's
'"status":"ok"' grep needs) and prints a per-query before/after table
to stderr for the SCALING.md ledger.
"""
import json
import os
import sys


def main() -> None:
    rec_path, lines_path = sys.argv[1], sys.argv[2]
    rec = json.load(open(rec_path))
    calib_ref = rec.get("calib_ref") or float(
        os.environ.get("GRAFT_CALIB_REF", "0") or 0)
    calib_tol = float(os.environ.get("GRAFT_CALIB_TOL", "1.15"))
    batched = set(rec.get("batched_queries", []))
    changed = []
    for line in open(lines_path):
        if not line.strip():
            continue
        r = json.loads(line)
        if r.get("status") != "ok":
            print(f"SKIP failed line: {line.strip()[:120]}", file=sys.stderr)
            continue
        calibs = [c for c in [r.get("calib_before")] + r.get("calib_passes", [])
                  if c is not None]
        for q, v in r["queries"].items():
            if q not in rec["queries"]:
                print(f"REFUSING unknown query {q} (not in record)",
                      file=sys.stderr)
                sys.exit(1)
            old = rec["queries"][q]
            rec["queries"][q] = v
            if len(r["queries"]) == 1 and r.get("spread_total") is not None:
                rec["spread"][q] = r["spread_total"]
            if calibs:
                rec["calib"][q] = min(calibs)
            batched.discard(q)
            changed.append((q, old, v))
        if r.get("io_settle_sec") is not None and rec.get("io_settle_range"):
            lo, hi = rec["io_settle_range"]
            s = r["io_settle_sec"]
            rec["io_settle_range"] = [min(lo, s), max(hi, s)]
    if not changed:
        print("no ok lines to patch", file=sys.stderr)
        sys.exit(1)
    rec["queries"] = {k: v for k, v in
                      sorted(rec["queries"].items(), key=lambda kv: -kv[1])}
    rec["value"] = round(sum(v for v in rec["queries"].values() if v >= 0), 3)
    rec["spread_total"] = round(
        sum(v for q, v in rec["spread"].items()
            if v >= 0 and rec["queries"].get(q, -1) >= 0), 3)
    rec["batched_queries"] = sorted(batched)
    rec["isolation"] = ("jvm_per_query" if not batched
                        else "jvm_per_query; tail batched (see batched_queries)")
    calibs_all = sorted(rec["calib"].values())
    rec["calib_range"] = [calibs_all[0], calibs_all[-1]] if calibs_all else None
    rec["hot_queries"] = sorted(
        q for q, c in rec["calib"].items()
        if calib_ref and c > calib_ref * calib_tol)
    with open(rec_path, "w") as f:
        f.write(json.dumps(rec, separators=(",", ":")))
    for q, old, new in changed:
        print(f"{q:28s} {old:9.3f} -> {new:9.3f} s "
              f"(spread {rec['spread'].get(q, float('nan')):.3f}, "
              f"calib {rec['calib'].get(q, float('nan')):.3f})",
              file=sys.stderr)
    print(f"total {rec['value']} s, spread_total {rec['spread_total']}, "
          f"hot={rec['hot_queries']}", file=sys.stderr)


if __name__ == "__main__":
    main()
