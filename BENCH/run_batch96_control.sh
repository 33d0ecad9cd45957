#!/bin/bash
# Volume control for BENCH/STREAMING.md: the BATCH flagship protocol at
# 96M rows — the exact per-trial data volume the streaming campaign moves
# at 24M-row micro-batches — on the same tmpfs + shuffle=256 protocol.
# If batch eff at 96M lands where streaming eff at 96M lands, the
# streaming machinery (WAL, listing, per-batch commits, checkpoint)
# contributes no scaling loss; the loss is per-trial data volume
# (single-socket memory bandwidth), which a real 4x cluster's 4x sockets
# would lift. Writes /tmp/BASELINE_96M.md (folded into BENCH/STREAMING.md).
set -euo pipefail
ROWS="${1:-96000000}"
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit
export SPARK_GRAFT_BENCH_DIR=/dev/shm
export SPARK_GRAFT_BENCH_SHUFFLE=256

mkdir -p /dev/shm/graft-shuffle
$SUBMIT --master "local[32]" --driver-memory 24g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.hotdog.ScalingBench "$JAR" gen "$ROWS"
$SUBMIT --master "local[8]" --driver-memory 24g \
  --driver-java-options "-Xms24g -XX:ActiveProcessorCount=8 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.hotdog.ScalingBench "$JAR" level 8 "$ROWS" /tmp/sb8_96.json
$SUBMIT --master "local[32]" --driver-memory 24g \
  --driver-java-options "-Xms24g -XX:ActiveProcessorCount=32 -XX:ReservedCodeCacheSize=1g" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.hotdog.ScalingBench "$JAR" level 32 "$ROWS" /tmp/sb32_96.json
$SUBMIT --master "local[32]" --driver-memory 24g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --class graft.hotdog.ScalingBench "$JAR" combine "$ROWS" /tmp/sb8_96.json /tmp/sb32_96.json /tmp/BASELINE_96M.md
