#!/bin/bash
# Standing ANSI gate leg (round 13): run the FULL Verify suite with
# spark.sql.ansi.enabled=true — the Spark 4 adopter default — and compare
# against the DuckDB oracle. Unit totality specs (AnsiTotalitySpec,
# AnsiOperatorTotalitySpec) cover public functions in isolation; this leg
# executes the composed query bodies + pipeline layer end to end, which is
# where throwing casts / element_at / size(null) divergences actually bite
# (round 12 found a 6-function size(null) family no oracle run could see).
#
# Usage: dev/ansi_verify.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_ansi}"
rm -rf "$OUT"
SPARK_GRAFT_EXTRA_CONF="spark.sql.ansi.enabled=true" \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\].*failed" \
  && { echo "ANSI VERIFY: query failures above"; exit 1; } || true
python3 dev/compare.py "$SF" "$OUT"
