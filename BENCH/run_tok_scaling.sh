#!/bin/bash
# Two-cluster-size scaling evidence for the TOKEN-AXIS path (duplicated-
# span scrub over planted-span token sequences). Same per-level-JVM
# protocol as run_dedup_scaling.sh: each parallelism level gets its own
# JVM with ActiveProcessorCount matched; shuffle + corpus on tmpfs (the
# single virtio disk's erratic throughput would dominate trial variance);
# heap right-sized at 16g with the heartbeat/code-cache survival flags
# (see run_dedup_scaling.sh comments for the full rationale of each).
set -euo pipefail
DOCS="${1:-20000000}"
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

mkdir -p /dev/shm/graft-shuffle
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.TokScalingBench "$JAR" gen "$DOCS"
$SUBMIT --master "local[8]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=8 -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.TokScalingBench "$JAR" level 8 "$DOCS" /tmp/tsb8.json
$SUBMIT --master "local[32]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=32 -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.TokScalingBench "$JAR" level 32 "$DOCS" /tmp/tsb32.json
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.TokScalingBench "$JAR" combine "$DOCS" /tmp/tsb8.json /tmp/tsb32.json BENCH/TOK.md
