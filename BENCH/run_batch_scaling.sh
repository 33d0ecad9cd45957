#!/bin/bash
# Two-cluster-size scaling evidence for the BATCH-ASSEMBLY path
# (Packing.lengthBucketBatches over a hot-bucket doc manifest: 80% of
# docs pad to ONE bucket). Same per-level-JVM protocol as
# run_ev_scaling.sh: own JVM per level with ActiveProcessorCount
# matched; corpus + shuffle on tmpfs; 16g heap with the
# heartbeat/code-cache survival flags (rationale in
# run_dedup_scaling.sh).
set -euo pipefail
DOCS="${1:-200000000}"
OUT="${2:-BENCH/BATCH.md}"
N_CORES="${3:-4}"
BIG_CORES=$((N_CORES * 4))
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

mkdir -p /dev/shm/graft-shuffle
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.BatchScalingBench "$JAR" gen "$DOCS"
$SUBMIT --master "local[$N_CORES]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=$N_CORES -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.BatchScalingBench "$JAR" level "$N_CORES" "$DOCS" /tmp/batchA.json
$SUBMIT --master "local[$BIG_CORES]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=$BIG_CORES -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.BatchScalingBench "$JAR" level "$BIG_CORES" "$DOCS" /tmp/batchB.json
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.BatchScalingBench "$JAR" combine "$DOCS" /tmp/batchA.json /tmp/batchB.json "$OUT"
