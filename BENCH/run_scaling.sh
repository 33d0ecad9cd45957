#!/bin/bash
# Two-cluster-size scaling evidence (BASELINE.md sandbox protocol):
# each parallelism level runs in its OWN JVM with ActiveProcessorCount
# matched to the level, emulating a real N-core cluster node (GC/JIT
# threads sized for N, not for the 32-CPU host).
set -euo pipefail
ROWS="${1:-24000000}"
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

$SUBMIT --master "local[8]" --driver-memory 8g \
  --driver-java-options "-XX:ActiveProcessorCount=8" \
  --class graft.hotdog.ScalingBench "$JAR" level 8 "$ROWS" /tmp/sb8.json
$SUBMIT --master "local[32]" --driver-memory 8g \
  --driver-java-options "-XX:ActiveProcessorCount=32" \
  --class graft.hotdog.ScalingBench "$JAR" level 32 "$ROWS" /tmp/sb32.json
$SUBMIT --master "local[32]" --driver-memory 8g \
  --class graft.hotdog.ScalingBench "$JAR" combine "$ROWS" /tmp/sb8.json /tmp/sb32.json BENCH/BASELINE.md
