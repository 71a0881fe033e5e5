#!/bin/bash
# Alternating-JVM A/B subset bench — the protocol that settles
# code-vs-box disputes (round-10 verdict: artifact-vs-artifact wall
# comparisons drift +-50% on this box; 2x3-query alternating JVMs in the
# same hour resolved the gram-explode regression the within-artifact
# read missed). Each round launches ONE fresh JVM per side, order
# rotated per round, so box weather lands symmetrically on both sides;
# within each JVM graft.Bench does its own untimed warmup +
# median-of-RUNS per query. Medians across rounds are computed
# downstream (dev/altjvm_summary.py).
#
# usage: dev/altjvm_bench.sh <repoA> <repoB> "<q1,q2,...>" <sfDir> <rounds> <out.jsonl>
#   repoA/repoB: repo roots with compiled target/scala-2.13/classes
#                (this script runs `sbt -batch compile` in each first)
set -u
A=$1; B=$2; QUERIES=$3; SFDIR=$4; ROUNDS=$5; OUT=$6
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for R in "$A" "$B"; do
  echo "[altjvm] compile $R" >&2
  (cd "$R" && sbt -batch compile >/dev/null 2>&1) || { echo "[altjvm] compile failed: $R" >&2; exit 1; }
done
cp_of() { echo "$1/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"; }
run_side() { # run_side <side> <repo> <round>
  local side=$1 repo=$2 round=$3
  local line
  line=$(SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-3} SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$(cp_of "$repo")" graft.Bench 2>/dev/null \
    | grep '"metric"')
  if [ -z "$line" ]; then
    echo "{\"side\":\"$side\",\"repo\":\"$repo\",\"round\":$round,\"bench\":null,\"error\":\"no metric line\"}" >> "$OUT"
    echo "[altjvm] round $round side $side FAILED" >&2
  else
    echo "{\"side\":\"$side\",\"repo\":\"$repo\",\"round\":$round,\"bench\":$line}" >> "$OUT"
    echo "[altjvm] round $round side $side done" >&2
  fi
}
: > "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  if [ $((r % 2)) = 1 ]; then
    run_side A "$A" "$r"; run_side B "$B" "$r"
  else
    run_side B "$B" "$r"; run_side A "$A" "$r"
  fi
done
echo DONE >> "$OUT"
