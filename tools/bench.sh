#!/bin/bash
# Subset/full bench runner (dev loop for the optimization rounds).
#   tools/bench.sh q1,q2,...      # subset at sf0.1
#   tools/bench.sh all            # full sweep
#   tools/bench.sh                # full headline
# Env passthrough: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_PASSES,
# SPARK_GRAFT_BENCH_SF1_DIR, SPARK_GRAFT_BENCH_OUT.
set -e
cd "$(dirname "$0")/.."
OPENS=$(for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do echo --add-opens=$p=ALL-UNNAMED; done)
if [ -n "$1" ]; then export SPARK_GRAFT_BENCH_QUERIES="$1"; fi
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $OPENS -Xms12g -Xmx88g -XX:MaxNewSize=4g -XX:G1HeapRegionSize=4m \
  -XX:MinHeapFreeRatio=0 -XX:MaxHeapFreeRatio=100 -XX:+AlwaysPreTouch \
  -XX:MetaspaceSize=512m \
  -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/etllensspark_2.13-0.1.0.jar" \
  graft.Bench
