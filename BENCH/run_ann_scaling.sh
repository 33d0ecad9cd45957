#!/bin/bash
# ANN scale rehearsal (lshTopK + ivfTopK) with measured recall@5 at two
# per-JVM cluster sizes over a planted-neighbor corpus. Same protocol as
# run_scaling.sh / run_dedup_scaling.sh (see those for JVM-flag rationale).
set -euo pipefail
N="${1:-2000000}"
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

mkdir -p /dev/shm/graft-shuffle
$SUBMIT --master "local[32]" --driver-memory 12g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.ops.AnnScalingBench "$JAR" gen "$N"
$SUBMIT --master "local[8]" --driver-memory 12g \
  --driver-java-options "-Xms12g -XX:ActiveProcessorCount=8 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.AnnScalingBench "$JAR" level 8 "$N" /tmp/ann8.json
$SUBMIT --master "local[32]" --driver-memory 12g \
  --driver-java-options "-Xms12g -XX:ActiveProcessorCount=32 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.AnnScalingBench "$JAR" level 32 "$N" /tmp/ann32.json
$SUBMIT --master "local[32]" --driver-memory 12g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.ops.AnnScalingBench "$JAR" combine "$N" /tmp/ann8.json /tmp/ann32.json BENCH/ANN.md
