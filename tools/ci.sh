#!/usr/bin/env bash
# Full local gate: compile, tests, oracle correctness, bench.
# Usage: tools/ci.sh [sf_dir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=$(mktemp -d /tmp/graft-ci.XXXX)

echo "== compile + test"
# stale reports from scratch/mid-round runs otherwise linger and make
# the report directory disagree with the recorded run (r10 verdict #3)
rm -rf target/test-reports
sbt -batch test 2>&1 | grep -E "Tests:|Passed:" | tail -2

# Archive the FULL-RUN suite XMLs before any later targeted rerun can
# clobber them (r14 verdict item 2: a post-close `testOnly` overwrote
# one suite's XML with a 1-test partial run, making the recorded
# 569/569 unreproducible from the artifacts — third round of drift).
rm -rf target/test-reports-full
cp -a target/test-reports target/test-reports-full
XMLSUM=$(python3 - <<'EOF'
import glob, xml.etree.ElementTree as ET
print(sum(int(ET.parse(f).getroot().get("tests", 0))
          for f in glob.glob("target/test-reports-full/*.xml")))
EOF
)
echo "== suite XML test sum: $XMLSUM (archived in target/test-reports-full)"
# The README's recorded state must equal the artifacts it cites: fail
# the gate when the numbers drift instead of recording them anyway.
if ! grep -q "${XMLSUM}/${XMLSUM} tests" README.md; then
  echo "FAIL: README.md does not record ${XMLSUM}/${XMLSUM} tests — update the"
  echo "      recorded-state paragraph from this run before closing the round."
  exit 1
fi

echo "== oracle-checker selftest (ns-range guard)"
python3 tools/check_oracle.py --selftest

echo "== verify vs DuckDB oracle @ $SF"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $SF $OUT/verify" 2>&1 | tail -1
python3 tools/check_oracle.py "$OUT/verify" "$SF"

echo "== bench @ sf0.1 (steady-state; keep the box otherwise idle)"
run_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1
}
LINE=$(run_bench)
echo "$LINE"
# Contended runs are noise, not signal (r14: 20 queries flipped >4x
# while the old run-average detector read quiet) — re-take the numbers
# once; if the box is STILL loud, fail rather than record noise.
if echo "$LINE" | grep -q '"contended":true'; then
  echo "== bench flagged contended — re-running once on a quieter window"
  sleep 30
  LINE=$(run_bench)
  echo "$LINE"
  if echo "$LINE" | grep -q '"contended":true'; then
    echo "FAIL: bench contended on both attempts; numbers untrustworthy."
    exit 1
  fi
fi

# Refresh the clean-gate baseline from this non-contended full run:
# Bench's r16 cross-check re-measures any query that records >2x its
# entry here (the r15 rec_item_cosine incident — disk-pressure
# inflation invisible to the CPU windows). Committed with the round.
python3 - <<'EOF'
import json
d = json.load(open("BENCH_DETAIL.json"))
with open("BENCH_CLEAN.json", "w") as f:
    json.dump({"sf": d.get("sf"), "queries": d["queries"]}, f, sort_keys=True)
    f.write("\n")
print(f"== BENCH_CLEAN.json refreshed ({len(d['queries'])} queries)")
EOF
