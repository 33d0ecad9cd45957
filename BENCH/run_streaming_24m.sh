#!/bin/bash
# Sweep point: streaming protocol at 6M-row micro-batches (24M-row corpus,
# 256 files, mfpt 64 -> 4 batches) — the per-trial data volume where the
# BATCH flagship passes 0.906. Same per-level-JVM tmpfs protocol as
# BENCH/run_streaming_scaling.sh; writes /tmp/STREAMING_24M.md (a sweep
# fragment folded into BENCH/STREAMING.md, not a standalone artifact).
set -euo pipefail
ROWS=24000000
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
  --class graft.hotdog.StreamingScalingBench "$JAR" level 8 "$ROWS" /tmp/ssb8_24.json
$SUBMIT --master "local[32]" --driver-memory 12g \
  --driver-java-options "-Xms12g -XX:ActiveProcessorCount=32 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.hotdog.StreamingScalingBench "$JAR" level 32 "$ROWS" /tmp/ssb32_24.json
$SUBMIT --master "local[32]" --driver-memory 12g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.hotdog.StreamingScalingBench "$JAR" combine "$ROWS" /tmp/ssb8_24.json /tmp/ssb32_24.json /tmp/STREAMING_24M.md
