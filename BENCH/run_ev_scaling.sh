#!/bin/bash
# Two-cluster-size scaling evidence for the LOG-ANALYTICS path (gap
# sessionization over a synthetic events corpus). Same per-level-JVM
# protocol as run_tok_scaling.sh / run_dedup_scaling.sh: each level gets
# its own JVM with ActiveProcessorCount matched; shuffle + corpus on
# tmpfs; 16g heap with the heartbeat/code-cache survival flags (see
# run_dedup_scaling.sh for the rationale of each flag).
set -euo pipefail
EVENTS="${1:-100000000}"
OUT="${2:-BENCH/SESSIONS.md}"
N_CORES="${3:-8}"
BIG_CORES=$((N_CORES * 4))
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

mkdir -p /dev/shm/graft-shuffle
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.EvScalingBench "$JAR" gen "$EVENTS"
$SUBMIT --master "local[$N_CORES]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=$N_CORES -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.EvScalingBench "$JAR" level "$N_CORES" "$EVENTS" /tmp/evs8.json
$SUBMIT --master "local[$BIG_CORES]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=$BIG_CORES -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.EvScalingBench "$JAR" level "$BIG_CORES" "$EVENTS" /tmp/evs32.json
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.EvScalingBench "$JAR" combine "$EVENTS" /tmp/evs8.json /tmp/evs32.json "$OUT"
