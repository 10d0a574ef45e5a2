#!/usr/bin/env bash
# Round-11 baseline re-peg (VERDICT r10 #1): same-session A/B of the r9
# tip (c4f416f, worktree .worktrees/r9ab) vs HEAD, BOTH measured under
# the round-10 interleaved-sweeps Bench (the r9 worktree has HEAD's
# Bench.scala/BenchCore.scala overlaid — measurement harness only, no
# operator code). Invocations alternate HEAD → r9 → HEAD → r9 so a
# contention window cannot poison one side only; each artifact carries
# its own sentinel verdict. Compile both sides BEFORE running this.
#
# Usage: tools/ab_repeg.sh [n_rounds]   (default 2; ~6 min per invocation)
set -u
cd "$(dirname "$0")/.."
N=${1:-2}
OUTDIR=/tmp/graft_ab
mkdir -p "$OUTDIR"
SPARK_JARS=/opt/spark/jars
run_one() { # run_one <classesdir> <out.json> <log>
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_SF1=0 \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java -Xmx48g -cp "$1:$SPARK_JARS/*" graft.Bench >"$3" 2>&1
}
for i in $(seq 1 "$N"); do
  # abort on ANY nonzero exit: a crashed/erred invocation must not leave
  # ab_analyze.py min-folding asymmetric sample counts without warning
  echo "[$(date -u +%H:%M:%S)] head pass $i"
  run_one target/scala-2.13/classes "$OUTDIR/head_$i.json" "$OUTDIR/head_$i.log" \
    || { echo "FAIL: head pass $i rc=$? (see $OUTDIR/head_$i.log)" >&2; exit 1; }
  echo "[$(date -u +%H:%M:%S)] r9 pass $i"
  run_one .worktrees/r9ab/target/scala-2.13/classes "$OUTDIR/r9_$i.json" "$OUTDIR/r9_$i.log" \
    || { echo "FAIL: r9 pass $i rc=$? (see $OUTDIR/r9_$i.log)" >&2; exit 1; }
done
echo "[$(date -u +%H:%M:%S)] done; artifacts in $OUTDIR"
