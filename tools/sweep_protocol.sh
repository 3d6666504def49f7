#!/usr/bin/env bash
# Cross-JVM sweep protocol driver (SCALE.md r16): run graft.Bench
# K times, each in a FRESH JVM with SPARK_GRAFT_RUNS=1 (one timed run per
# row after the shared warmup + block-drop + GC settle), writing each
# JVM's artifact to OUT_DIR/jvm<i>/<sf>.json. Aggregate with
# tools/merge_sweeps.py — default statistic fast2 (mean of the two
# fastest JVMs; --stat=median is the comparison mode). Measurement
# tooling only — not part of the shipped library.
#
# Before the first JVM the input parquet is read once to /dev/null: the
# r16 marathon measured the first ~5 serial JVMs on a cold box paying
# 2-4x on IO-adjacent rows while the page cache fills — a machine-
# lifetime bias fast2 absorbs but a pre-read removes at the source.
#
# The JVM flags replicate build.sbt's forked-run options exactly
# (JDK17 add-opens, Xms=Xmx pinned heap) so a java-launched sweep is
# code- and flag-identical to an `sbt runMain graft.Bench` sweep; only
# sbt's resident parent JVM is absent, which the serial-box rule wants
# gone anyway.
#
# Usage: tools/sweep_protocol.sh SF_DIR OUT_DIR K [HEAP]
set -euo pipefail
SF_DIR=$1; OUT_DIR=$2; K=$3; HEAP=${4:-48g}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "[sweep] page-cache pre-read of $SF_DIR" >&2
cat "$SF_DIR"/*.parquet > /dev/null 2>&1 || true
for i in $(seq 1 "$K"); do
  d="$OUT_DIR/jvm$i"
  mkdir -p "$d"
  echo "[sweep] JVM $i/$K -> $d" >&2
  # env(1), not a bare VAR=val word: an assignment produced by ${:+}
  # expansion is NOT recognized as an assignment by the shell (assignment
  # detection precedes parameter expansion), so the previous form made
  # subset sweeps die with "SPARK_GRAFT_ONLY=...: command not found"
  SPARK_GRAFT_RUNS=1 SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_OUT="$d" \
    env ${SPARK_GRAFT_ONLY:+SPARK_GRAFT_ONLY="$SPARK_GRAFT_ONLY"} \
    java -Xms"$HEAP" -Xmx"$HEAP" $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      ${SPARK_GRAFT_JAVA_OPTS:-} \
      -cp "$CP" graft.Bench > "$d/stdout.log" 2> "$d/stderr.log" \
    || { echo "[sweep] JVM $i FAILED — see $d/stderr.log" >&2; exit 1; }
  tail -1 "$d/stdout.log" >&2
done
