#!/usr/bin/env bash
# End-to-end check that graft.Bench's bidirectional contention sentinel
# actually trips and self-labels the artifact (VERDICT r9 #1 "done"
# criterion; in-process twin: BenchSelftestSpec). Instead of hoping a
# real noisy neighbor shows up on cue,
# SPARK_GRAFT_BENCH_SELFTEST_SWEEP_DELAY_MS injects a fixed delay into
# every SWEEP pass's timed window while the post-sweep rechecks run
# clean — reproducing deterministically the r9 failure shape (recorded
# samples contended, recheck fast). The run must print contended=true
# and, because SPARK_GRAFT_BENCH_STRICT is set, exit 3.
#
# Bench runs as a PLAIN JVM (java -cp classes:/opt/spark/jars/*), not
# through sbt: sbt wraps the forked main's exit code in log text whose
# wording varies across sbt versions ("Nonzero exit code returned from
# runner: 3"), and the round-10 version of this script grepping for
# that string was flagged as brittle (ADVICE r10). Asserting on the real
# process exit code needs the real process.
#
# Usage: tools/contention_selftest.sh   (repo root; sbt compile first; ~1 min)
set -u
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES/graft" ]; then
  echo "FAIL: $CLASSES missing — run 'sbt compile' first" >&2
  exit 1
fi
OUT=$(mktemp /tmp/graft_selftest_bench.XXXX.json)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001} \
SPARK_GRAFT_BENCH_ONLY=${SPARK_GRAFT_BENCH_ONLY:-q1_pricing_summary,q3_topk_revenue,f1_filter} \
SPARK_GRAFT_BENCH_SELFTEST_SWEEP_DELAY_MS=2000 \
SPARK_GRAFT_BENCH_STRICT=1 \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  java -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  >/tmp/graft_selftest_bench.log 2>&1
rc=$?
if [ "$rc" -ne 3 ]; then
  echo "FAIL: expected strict-mode exit 3 on a contended run (rc=$rc)" >&2
  tail -5 /tmp/graft_selftest_bench.log >&2
  exit 1
fi
if ! grep -q '"contended":true' "$OUT"; then
  echo "FAIL: artifact did not self-label contended=true: $OUT" >&2
  exit 1
fi
echo "OK: sentinel tripped (contended=true, exit 3) — artifact at $OUT"

# ---- phase 2: sf1-lane forced contention RECOVERS (VERDICT r11 #2) ----
# The sf1 lane's sentinel escalates instead of merely labeling: sweeps
# run with the injected delay, rechecks run clean, and up to two
# escalation rounds must produce two agreeing lows — the artifact ends
# sf1_contended=false with sf1_recovery_rounds >= 1. Needs the sf0.1
# bench dir (the lane's gate) and the sf1 fixture (first build takes
# minutes; cached under /tmp/graft_sf1 afterwards).
# SPARK_GRAFT_SF1_SELFTEST additionally restricts the lane cohort to
# BENCH_ONLY, so this phase costs ~1 min, not a full lane.
OUT2=$(mktemp /tmp/graft_selftest_sf1.XXXX.json)
# 5s delay, not phase 1's 2s: these queries cost ~1-4s at sf1, and the
# sentinel ratio is (delay + t)/t — 2s against a 1.7s query is ~2.2x,
# UNDER the 3x threshold, so the forcing was marginal (one observed run
# tripped at 3.06, the next sat at 2.80 and never escalated). 5s makes
# the cheapest sentinel ~6x — decisively contended every run.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_ONLY=dedup_lines,dedup_exact,text_tfidf \
SPARK_GRAFT_SF1_SELFTEST=1 \
SPARK_GRAFT_BENCH_SELFTEST_SWEEP_DELAY_MS=5000 \
SPARK_GRAFT_BENCH_OUT="$OUT2" \
  java -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
  >/tmp/graft_selftest_sf1.log 2>&1
rc2=$?
if [ "$rc2" -ne 0 ]; then
  echo "FAIL: sf1 recovery phase exited $rc2 (no STRICT set — a query crashed?)" >&2
  tail -5 /tmp/graft_selftest_sf1.log >&2
  exit 1
fi
python3 - "$OUT2" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert d.get("sf1_total") not in (None, "null"), "sf1 lane did not run"
assert d.get("sf1_contended") is False, \
    f"sf1 lane did not recover: contended={d.get('sf1_contended')} ratio={d.get('sf1_contention_max_ratio')}"
assert d.get("sf1_recovery_rounds", 0) >= 1, \
    f"recovery path never engaged (rounds={d.get('sf1_recovery_rounds')}) — delay too small to trip the sentinel?"
print(f"OK: sf1 lane tripped and recovered (rounds={d['sf1_recovery_rounds']}, "
      f"final ratio={d['sf1_contention_max_ratio']})")
EOF
[ $? -eq 0 ] || exit 1
echo "OK: both phases passed"
