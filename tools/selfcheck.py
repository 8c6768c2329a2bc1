#!/usr/bin/env python3
"""Dev-side emulation of the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB over the sf parquet tables, and compare with
the Spark-written parquet in outDir/<name>/. Usage:
    python3 tools/selfcheck.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Byte-level float compare, matching the driver's bitwise hash: Python's
    # round()/== treat -0.0 == 0.0, which hid the round-1 -0.0 mismatch.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack(">d", round(v, 9)).hex()
    return v


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    n_skip = 0
    for name in sorted(oracles):
        if name in skip:
            print(f"SKIP {name} (oracle excluded by caller)")
            n_skip += 1
            continue
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # driver compare: sort columns by name, then compare value rows
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: schema mismatch oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        orows = sorted((tuple(norm(v) for v in r) for r in
                        odf[ocols].itertuples(index=False)), key=str)
        srows = sorted((tuple(norm(v) for v in r) for r in
                        sdf[scols].itertuples(index=False)), key=str)
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(orows, srows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    tail = f", {n_skip} skipped" if n_skip else ""
    print(f"\n{n_pass} passed, {n_fail} failed{tail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 3rd arg: comma-separated oracle names to skip (used for
    # synthetic scale corpora where an oracle's DuckDB emulation is
    # definitionally super-linear — the Spark side still runs)
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
