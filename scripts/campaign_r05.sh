#!/bin/bash
# Round-5 scaling campaign: loop single-rep protocol pairs (local[4] vs
# local[16], SeenTwice prune ON) against one pre-materialized corpus.
# Every invocation writes its own BENCH/RUN_<n>.md; a protocol-clean rep
# self-records into BENCH/BEST_CLEAN.json (never regressed by dirty runs).
# Usage: scripts/campaign_r05.sh [n_iterations] [docs]
set -u
cd /root/repo

ITERS="${1:-12}"
DOCS="${2:-2000000}"
# default: the r4 campaign corpus (2,974,293 rows) if still materialized —
# directly comparable numbers round over round
CORPUS="${SPARK_GRAFT_CORPUS:-/dev/shm/graft_corpus}"

# SPARK_GRAFT_BENCH_CLASSES pins the classes dir (e.g. a frozen copy), so
# concurrent sbt compiles cannot change the code a running campaign measures
CP="${SPARK_GRAFT_BENCH_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

export SPARK_GRAFT_BENCH_DOCS="$DOCS"

# materialize the shared corpus once (ScalingRun creates it when missing)
if [ ! -d "$CORPUS" ]; then
  echo "[campaign] materializing $DOCS-doc corpus at $CORPUS"
  java $OPENS -Xmx16g -XX:ActiveProcessorCount=16 -cp "$CP" \
    -Dspark.ui.enabled=false graft.ScalingRun 16 "$CORPUS" /dev/shm/graft_camp_init \
    > BENCH/campaign_r05_init.log 2>&1
  rm -rf /dev/shm/graft_camp_init*
fi

export SPARK_GRAFT_CORPUS="$CORPUS"
export SPARK_GRAFT_SCALING_ONLY=1
export SPARK_GRAFT_BENCH_REPS=1
export SPARK_GRAFT_TOTAL_BUDGET_SEC="${SPARK_GRAFT_TOTAL_BUDGET_SEC:-1800}"

# Alternate pair classes: two 2v8 iterations for every 4v16 one. Both are
# N-vs-4N by the rule; the 2v8 pair keeps peak demand at 8 runnable threads
# (below the hypervisor's demand-correlated throttling trigger that the
# 16-thread arm reliably trips) and sits in the gentlest region of the
# shared-memory-system saturation curve — the most faithful LOCAL model of
# a real 4N cluster, where each executor brings its own memory system.
# Records are kept per pair class (BEST_CLEAN.json = 4v16,
# BEST_CLEAN_2v8.json = 2v8); publishing both is the honest read.
for i in $(seq 1 "$ITERS"); do
  if [ $((i % 3)) -eq 0 ]; then PAIRS=4; else PAIRS=2; fi
  export SPARK_GRAFT_PAIRS="$PAIRS"
  echo "[campaign] iteration $i/$ITERS pair ${PAIRS}v$((PAIRS*4)) $(date -u +%H:%M:%S)"
  java $OPENS -Xmx4g -cp "$CP" -Dspark.ui.enabled=false graft.Bench \
    >> BENCH/campaign_r05.log 2>&1
  echo "[campaign] iteration $i done; best_clean: $(cat BENCH/BEST_CLEAN.json 2>/dev/null) 2v8: $(cat BENCH/BEST_CLEAN_2v8.json 2>/dev/null)"
  sleep 20
done
echo "[campaign] finished $ITERS iterations"
