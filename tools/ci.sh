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

echo "== oracle-checker selftest (ns-range guard)"
python3 tools/check_oracle.py --selftest

echo "== verify vs DuckDB oracle @ $SF"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $SF $OUT/verify" 2>&1 | tail -1
python3 tools/check_oracle.py "$OUT/verify" "$SF"

echo "== bench @ sf0.1 (steady-state; keep the box otherwise idle)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1
