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

# Shuffle goes to tmpfs at BOTH levels: on a real cluster shuffle lands on
# executor-local NVMe whose aggregate bandwidth scales with the executor
# count, but this sandbox has ONE shared virtio disk whose erratic
# throughput would dominate trial variance and bottleneck both "clusters"
# identically (see the 48M router note in BENCH/BASELINE.md). RAM-backed
# shuffle restores the scales-with-cores property the metric assumes.
# Heap is right-sized at 16g, NOT maximal: the job spills through binary
# external sorters, and a 40g heap at ActiveProcessorCount=8 (8 GC
# threads) produced multi-minute full-GC storms during the between-trial
# System.gc() that starved executor heartbeats until the executor
# self-terminated at 60 consecutive misses. heartbeatInterval=30s +
# network.timeout=600s give the remaining pauses headroom.
# -Xms pre-sizes the heap: the first full-size run otherwise pays the
# growth full-GCs inside its measurement. ReservedCodeCacheSize=1g +
# -DontCompileHugeMethods keep the JIT compiling across repeated trials:
# each re-execution generates fresh codegen classes, and once the default
# 240 MB code cache fills the compiler silently disables — stages then run
# as interpreted bytecode 10-40x slower, which showed up as bimodal trial
# times.
mkdir -p /dev/shm/graft-shuffle
# corpora in their own JVM (a stopped corpus-writer session's executor
# heartbeat thread would System.exit the level JVM ~10 min in)
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.DedupScalingBench "$JAR" gen "$DOCS"
$SUBMIT --master "local[8]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=8 -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.DedupScalingBench "$JAR" level 8 "$DOCS" /tmp/dsb8.json
$SUBMIT --master "local[32]" --driver-memory 16g \
  --driver-java-options "-Xms16g -XX:ActiveProcessorCount=32 -XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods" \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.DedupScalingBench "$JAR" level 32 "$DOCS" /tmp/dsb32.json
$SUBMIT --master "local[32]" --driver-memory 16g \
  --conf spark.local.dir=/dev/shm/graft-shuffle \
  --conf spark.executor.heartbeatInterval=30s --conf spark.network.timeout=600s \
  --class graft.ops.DedupScalingBench "$JAR" combine "$DOCS" /tmp/dsb8.json /tmp/dsb32.json BENCH/DEDUP.md
