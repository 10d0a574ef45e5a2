#!/usr/bin/env bash
# End-to-end check that graft.Bench's bidirectional contention sentinel
# actually trips and self-labels the artifact (VERDICT r9 #1 "done"
# criterion). Instead of hoping a real noisy neighbor shows up on cue,
# SPARK_GRAFT_BENCH_SELFTEST_SWEEP_DELAY_MS injects a fixed delay into
# every SWEEP pass's timed window while the post-sweep rechecks run
# clean — reproducing deterministically the r9 failure shape (recorded
# samples contended, recheck fast). The run must print contended=true
# and, because SPARK_GRAFT_BENCH_STRICT is set, exit 3.
#
# Usage: tools/contention_selftest.sh   (from the repo root; ~2 min)
set -u
cd "$(dirname "$0")/.."
OUT=$(mktemp /tmp/graft_selftest_bench.XXXX.json)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001} \
SPARK_GRAFT_BENCH_ONLY=${SPARK_GRAFT_BENCH_ONLY:-q1_agg,q3_topk_revenue,f1_filter} \
SPARK_GRAFT_BENCH_SELFTEST_SWEEP_DELAY_MS=2000 \
SPARK_GRAFT_BENCH_STRICT=1 \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt --error "runMain graft.Bench" >/tmp/graft_selftest_bench.log 2>&1
rc=$?
# sbt wraps the forked main's exit code: it reports "Nonzero exit code
# returned from runner: 3" and itself exits 1 — check both layers.
if [ "$rc" -eq 0 ] || ! grep -q 'runner: 3' /tmp/graft_selftest_bench.log; then
  echo "FAIL: expected strict-mode exit 3 on a contended run (sbt rc=$rc)" >&2
  tail -5 /tmp/graft_selftest_bench.log >&2
  exit 1
fi
if ! grep -q '"contended":true' "$OUT"; then
  echo "FAIL: artifact did not self-label contended=true: $OUT" >&2
  exit 1
fi
echo "OK: sentinel tripped (contended=true, exit 3) — artifact at $OUT"
