#!/usr/bin/env bash
# Cross-JVM-residue isolation A/B (round-15 verdict #2): q_embed_neardup
# reads ~68 s solo but +11% after ONE predecessor Bench JVM (and +47%
# after 60) at flat calib with nothing dirty at settle — so the residue
# is neither steal nor writeback. This script runs the controlled repro
# under four interludes that each flip ONE candidate mechanism, with
# kernel-counter brackets (GateInterlude vmstat) around every Bench fork:
#
#   E0  solo                      — the reference number
#   E1  pred -> succ              — the repro (expect ~+11%)
#   E2  pred -> sleep 120 -> succ — does the residue DECAY (async
#                                   FS/journal drain)?
#   E3  pred -> dropcaches -> succ— is it page-cache/reclaim state?
#   E4  pred -> compact   -> succ — is it free-memory FRAGMENTATION
#                                   (compaction stalls on the successor's
#                                   large allocations)?
#
# Each phase is ONE sbt invocation (runMain forks run sequentially
# inside it — same shape as the x100 gate). Results land in
# /tmp/residue_ab/<E>.log; the summary table prints at the end.
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
PRED=${PRED:-q_dedup_clusters}
SUCC=${SUCC:-q_embed_neardup}
OUT=/tmp/residue_ab
mkdir -p "$OUT"

run_phase() { # name, extra runMain args...
  local name="$1"; shift
  echo "== $name =="
  SPARK_GRAFT_SF_DIR=target/sf10-synth SPARK_GRAFT_BENCH_SAMPLES=3 SPARK_GRAFT_IO_SETTLE=1 \
    sbt -batch "$@" 2>/dev/null \
    | grep -E '"metric"|\[vmstat|\[interlude' > "$OUT/$name.log" || true
  grep -E '"metric"|vmstat' "$OUT/$name.log" | tail -4
}

run_phase E0_solo \
  "runMain graft.tools.GateInterlude vmstat pre_succ" \
  "runMain graft.Bench $SUCC" \
  "runMain graft.tools.GateInterlude vmstat post_succ"

run_phase E1_pred \
  "runMain graft.Bench $PRED" \
  "runMain graft.tools.GateInterlude vmstat pre_succ" \
  "runMain graft.Bench $SUCC" \
  "runMain graft.tools.GateInterlude vmstat post_succ"

run_phase E2_sleep \
  "runMain graft.Bench $PRED" \
  "runMain graft.tools.GateInterlude sleep 120" \
  "runMain graft.tools.GateInterlude vmstat pre_succ" \
  "runMain graft.Bench $SUCC" \
  "runMain graft.tools.GateInterlude vmstat post_succ"

run_phase E3_dropcaches \
  "runMain graft.Bench $PRED" \
  "runMain graft.tools.GateInterlude dropcaches" \
  "runMain graft.tools.GateInterlude vmstat pre_succ" \
  "runMain graft.Bench $SUCC" \
  "runMain graft.tools.GateInterlude vmstat post_succ"

run_phase E4_compact \
  "runMain graft.Bench $PRED" \
  "runMain graft.tools.GateInterlude compact" \
  "runMain graft.tools.GateInterlude vmstat pre_succ" \
  "runMain graft.Bench $SUCC" \
  "runMain graft.tools.GateInterlude vmstat post_succ"

echo "== summary ($SUCC median / spread / calib-min per phase) =="
python3 - "$OUT" "$SUCC" <<'EOF'
import json, os, sys
out, succ = sys.argv[1], sys.argv[2]
for f in sorted(os.listdir(out)):
    if not f.endswith(".log"):
        continue
    last = None
    for l in open(os.path.join(out, f)):
        if '"metric"' in l:
            r = json.loads(l)
            if succ in r.get("queries", {}):
                last = r
    if last:
        calibs = [last["calib_before"]] + last.get("calib_passes", [])
        print(f"{f:18s} {last['queries'][succ]:8.2f} s  "
              f"spread {last['spread_total']:6.2f}  calib_min {min(calibs):.3f}  "
              f"io_settle {last.get('io_settle_sec')}")
EOF
