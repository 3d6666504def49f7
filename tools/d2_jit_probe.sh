#!/usr/bin/env bash
# r16 verdict item 5: attribute the d2_ngram_jaccard 50/50 per-JVM speed
# bimodality (five of ten marathon JVMs ~50 s, five ~95 s on identical
# code/data). Runs K fresh JVMs, each timing d2 twice (SPARK_GRAFT_RUNS=2)
# with JIT compilation logging on, and prints per-JVM times plus compile-
# log summaries (C2 compile count/time, deopts, and the compile state of
# the biggest generated WholeStageCodegen methods) so a slow-mode JVM can
# be diffed against a fast-mode one. Diagnosis tooling only.
#
# Usage: tools/d2_jit_probe.sh OUT_DIR K [HEAP]
set -euo pipefail
OUT_DIR=$1; K=${2:-6}; HEAP=${3:-48g}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
mkdir -p "$OUT_DIR"
for i in $(seq 1 "$K"); do
  d="$OUT_DIR/jvm$i"; mkdir -p "$d"
  echo "[d2probe] JVM $i/$K" >&2
  env SPARK_GRAFT_RUNS=2 SPARK_GRAFT_SF_DIR=bench_data/sf10 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$d" \
      SPARK_GRAFT_ONLY=d2_ngram_jaccard \
    java -Xms"$HEAP" -Xmx"$HEAP" $ADD_OPENS \
      -XX:+UnlockDiagnosticVMOptions -XX:+LogCompilation \
      -XX:LogFile="$d/hotspot.log" \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench > "$d/stdout.log" 2> "$d/stderr.log" \
    || { echo "[d2probe] JVM $i FAILED" >&2; exit 1; }
  t=$(python3 -c "import json;d=json.load(open('$d/sf10_subset.json'));print(d['runs'])")
  echo "[d2probe] jvm$i runs=$t" >&2
done
