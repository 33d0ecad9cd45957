#!/bin/bash
# Two-cluster-size scaling evidence for the STREAMING path (routeStream:
# readStream → foreachBatch route → checkpointed fan-out + audit). Same
# per-level-JVM protocol as run_scaling.sh / run_dedup_scaling.sh:
# ActiveProcessorCount matched per level, corpus/shuffle/checkpoint/sink
# on tmpfs, corpora generated in their own JVM. See those scripts for the
# rationale behind every JVM flag.
set -euo pipefail
ROWS="${1:-24000000}"
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

mkdir -p /dev/shm/graft-shuffle
$SUBMIT --master "local[32]" --driver-memory 12g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.hotdog.StreamingScalingBench "$JAR" gen "$ROWS"
$SUBMIT --master "local[8]" --driver-memory 12g \
  --driver-java-options "-Xms12g -XX:ActiveProcessorCount=8 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.hotdog.StreamingScalingBench "$JAR" level 8 "$ROWS" /tmp/ssb8.json
$SUBMIT --master "local[32]" --driver-memory 12g \
  --driver-java-options "-Xms12g -XX:ActiveProcessorCount=32 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.hotdog.StreamingScalingBench "$JAR" level 32 "$ROWS" /tmp/ssb32.json
$SUBMIT --master "local[32]" --driver-memory 12g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.hotdog.StreamingScalingBench "$JAR" combine "$ROWS" /tmp/ssb8.json /tmp/ssb32.json BENCH/STREAMING.md
