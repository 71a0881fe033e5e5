#!/usr/bin/env bash
# Executable MIGRATION.md (round-11 stretch): run one smoke call per table
# row of the migration guide against the repo's own fixtures, through the
# packaged PUBLIC jar and a genuinely separate user application — the
# dryrun leg-3 pattern — so the adopter-facing doc cannot rot. Green from
# a fresh clone; exit non-zero if any row's graft call breaks.
#
# usage: dev/migration_smoke.sh
set -eu
REPO=$(cd "$(dirname "$0")/.." && pwd)
RUN=$(mktemp -d /tmp/graft_migrate_XXXX)
trap 'rm -rf "$RUN"' EXIT
fail() { # keep the run dir (stderr logs) for diagnosis on failure
  trap - EXIT
  echo "[migrate] FAIL: $* (logs kept at $RUN)" >&2
  exit 1
}
SUBMIT=$(command -v "${SPARK_SUBMIT:-/opt/spark/bin/spark-submit}") \
  || fail "spark-submit not found (set SPARK_SUBMIT)"
export SPARK_JARS_DIR=${SPARK_JARS_DIR:-$(dirname "$(dirname "$SUBMIT")")/jars}
[ -d "$SPARK_JARS_DIR" ] \
  || fail "SPARK_JARS_DIR=$SPARK_JARS_DIR does not exist (set it explicitly)"

echo "[migrate] 1/3 sbt package (library jar)" >&2
(cd "$REPO" && sbt -batch package >/dev/null 2>&1) || fail "sbt package"
JAR=$(ls "$REPO"/target/scala-2.13/etlscriptspark_*.jar | head -1)
[ -f "$JAR" ] || fail "library jar missing"

echo "[migrate] 2/3 build the user app (own sbt project, jar in lib/)" >&2
cp -r "$REPO/dev/dryrun/userapp" "$RUN/userapp"
mkdir -p "$RUN/userapp/lib" && cp "$JAR" "$RUN/userapp/lib/"
(cd "$RUN/userapp" && sbt -batch package >/dev/null 2>&1) || fail "user app build"
APP=$(ls "$RUN/userapp"/target/scala-2.13/*.jar | head -1)

echo "[migrate] 3/3 MigrationSmoke over src/test/resources/fixtures" >&2
OUT=$("$SUBMIT" --class MigrationSmoke --master 'local[8]' --driver-memory 8g \
  --jars "$RUN/userapp/lib/$(basename "$JAR")" --conf spark.ui.enabled=false \
  "$APP" "$REPO/src/test/resources/fixtures" "$RUN/out" \
  2>"$RUN/migrate.err" | grep '\[migrate\]') || fail "MigrationSmoke (see migrate.err)"
echo "$OUT"
echo "$OUT" | grep -q '\[migrate\] PASS' || fail "rows failed: $OUT"
echo "[migrate] PASS ($(echo "$OUT" | grep -c ' ') rows green)" >&2
