#!/usr/bin/env bash
# Post-gate spot-check (round-14 verdict #3 "Done" criterion): re-run
# the N largest x100 rows SOLO on a quiet host, median-of-3 with the
# same IO-settle protocol the gate used, so SCALING.md can table
# in-gate vs solo medians and show the residue. Usage:
#   bash tools/solo_spotcheck.sh q_a q_b q_c
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
: > /tmp/solo_spotcheck_lines.jsonl
for q in "$@"; do
  SPARK_GRAFT_SF_DIR=target/sf10-synth SPARK_GRAFT_BENCH_SAMPLES=3 SPARK_GRAFT_IO_SETTLE=1 \
    sbt -batch "runMain graft.Bench $q" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' >> /tmp/solo_spotcheck_lines.jsonl
done
python3 - <<'EOF'
import json
for l in open("/tmp/solo_spotcheck_lines.jsonl"):
    r = json.loads(l)
    (q, v), = r["queries"].items()
    calibs = [r["calib_before"]] + r["calib_passes"]
    print(f"{q:24s} solo {v:8.3f} s  spread {r['spread_total']:6.3f}  calib {min(calibs):.3f}")
EOF
