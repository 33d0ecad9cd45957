#!/bin/bash
# Two-cluster-size scaling evidence for the DEDUP path (minhash-LSH
# near-dup over a planted-cluster corpus). Same per-level-JVM protocol as
# run_scaling.sh: each parallelism level gets its own JVM with
# ActiveProcessorCount matched, so GC/JIT threads are sized like a real
# N-core cluster node. Generous driver memory: the 32-band shuffle of a
# 50M-doc corpus sorts ~1.6B rows (spills are disk/page-cache bound).
set -euo pipefail
DOCS="${1:-50000000}"
JAR="target/scala-2.13/hotdogspark_2.13-0.1.0.jar"
SUBMIT=/opt/spark/bin/spark-submit

$SUBMIT --master "local[8]" --driver-memory 48g \
  --driver-java-options "-XX:ActiveProcessorCount=8" \
  --class graft.ops.DedupScalingBench "$JAR" level 8 "$DOCS" /tmp/dsb8.json
$SUBMIT --master "local[32]" --driver-memory 48g \
  --driver-java-options "-XX:ActiveProcessorCount=32" \
  --class graft.ops.DedupScalingBench "$JAR" level 32 "$DOCS" /tmp/dsb32.json
$SUBMIT --master "local[32]" --driver-memory 48g \
  --class graft.ops.DedupScalingBench "$JAR" combine "$DOCS" /tmp/dsb8.json /tmp/dsb32.json BENCH/DEDUP.md
