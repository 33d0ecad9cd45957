package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches for log-pipeline monitoring.
  *
  * The canonical post-router question — "how many distinct users per
  * event type / topic / day?" — is the one aggregate a 100 TB pipeline
  * cannot afford to answer exactly: exact distinct shuffles every
  * (group, key) pair. The KMV (k-minimum-values / bottom-k) sketch
  * answers it with a bounded aggregation state instead: keep the k
  * SMALLEST distinct values of a uniform 60-bit key hash per group; if
  * fewer than k hashes exist the answer is exact, otherwise the k-th
  * smallest estimates the density (E[kth] ≈ k/n of the hash space) and
  * `(k-1) · 2^60 / kth` estimates n with relative error ~1/√(k−2)
  * (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * Scale shape: [[KmvAgg]] is a `functions.udaf` Aggregator, so Spark
  * plans it with map-side partial aggregation — each input partition
  * reduces to ≤ k longs PER GROUP before the exchange; the corpus never
  * shuffles and the reduce state is k·8 bytes however large the group.
  * Unlike HLL the sketch is also mergeable across snapshots by plain
  * array union (the merge IS `merge`), so per-day sketches roll up to
  * per-month without touching the corpus again.
  *
  * Determinism contract (the Mixing/Packing rule): the hashed value is
  * the first 15 hex chars of md5(key) — a pure function of the VALUE,
  * not of partitioning — so the sketch, the estimate, and the DuckDB
  * oracle replay are identical on any cluster size, and the estimate
  * arithmetic below is IEEE-double exact-rounded (both engines compute
  * the same two flops on the same integers).
  */
object Sketches {

  /** Uniform 60-bit key hash shared by the sketch and the oracle: first
    * 15 hex chars of md5(key) — the Mixing.hashPct idiom widened to 60
    * bits (fits a signed long with headroom; always non-negative). */
  def keyHash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Cheap deterministic scramble of a NON-NEGATIVE integer key: the
    * murmur3 fmix32 finalizer over the xor-folded 64-bit value, ~12
    * integer ops fully inside whole-stage codegen. Exists because
    * [[keyHash60]]'s md5 costs real CPU on hot paths — measured 5.3 s
    * per pass over 100M longs at 16 threads (vs 0.2 s for the scan
    * itself), so an operator hashing every row in two consumer branches
    * pays ~10 s/100M in hashing alone; this form is ~100× cheaper with
    * the same uniformity for salting/sharding (NOT for sketch
    * estimates — keyHash60's 60-bit space stays the KMV/sample hash).
    *
    * Every intermediate is ≤ 2^48: the 32×32-bit multiplies are split
    * into 16-bit limbs, so the arithmetic is exact in ANSI-mode Spark
    * (no silent long wrap) AND in DuckDB BIGINT — the oracle replays
    * the identical expressions (see SparkEntry's pipe_batch SQL).
    * Callers must pass a non-negative integer column (shiftright is
    * arithmetic; negative keys would diverge from the oracle). */
  def scramble32(key: Column): Column = {
    val mask32 = lit(4294967295L)
    // (x * c) mod 2^32 without exceeding 2^48: low/high 16-bit limbs
    def mul32(x: Column, c: Long): Column =
      (((shiftright(x, 16) * lit(c)) % lit(65536L)) * lit(65536L) +
        (x % lit(65536L)) * lit(c)) % lit(4294967296L)
    val x0 = key.cast("long").bitwiseXOR(shiftright(key.cast("long"), 32))
      .bitwiseAND(mask32)
    val x1 = x0.bitwiseXOR(shiftright(x0, 16))
    val x2 = mul32(x1, 2246822507L) // 0x85EBCA6B
    val x3 = x2.bitwiseXOR(shiftright(x2, 13))
    val x4 = mul32(x3, 3266489909L) // 0xC2B2AE35
    x4.bitwiseXOR(shiftright(x4, 16))
  }

  /** The KMV estimate from a sorted min-k hash array: exact size when
    * the group had fewer than k distinct hashes, else
    * floor((k−1) · 2^60 / kth). (k−1)·2^60 is exactly representable in
    * a double for k ≤ 2^12, so the whole estimate is two IEEE ops —
    * bit-identical on any engine. */
  def kmvEstimate(mins: Column, k: Int): Column = {
    require(k >= 2 && k <= 4096, "k must be in [2, 4096]")
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(floor(
        lit((k - 1).toDouble * 1152921504606846976.0d) /
          element_at(mins, k).cast("double")).cast("long"))
  }

  /** Count-Min bucket ids for one key: row j's bucket is
    * keyHash60("j:" + key) mod width — d independent uniform hashes by
    * salting the shared md5 idiom with the row index, replayed verbatim
    * by the oracle. */
  private def cmsBuckets(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(j =>
      pmod(keyHash60(concat_ws(":", lit(j), key)), lit(width))): _*)

  /** The Count-Min counter table over `keyCol`: `depth` × `width` LONG
    * counters, counter(j, b) = #rows whose row-j hash lands in bucket b
    * (Cormode & Muthukrishnan 2005). This is the frequency sibling of
    * the KMV sketch — the per-key count a 100 TB pipeline cannot take
    * exactly when the key space is unbounded (a per-key aggregate's
    * state grows with the vocabulary; the CMS state is d·w longs,
    * PERIOD).
    *
    * Scale shape: ONE corpus pass through a map-side-combinable hash
    * aggregate onto the d·w key space — every task emits ≤ d·w partial
    * rows whatever its size, and a hot key floods a combinable counter,
    * never a sort. The table is mergeable across days/snapshots by
    * elementwise ADDITION (counters are sums), so rollups never rescan
    * the corpus — the same persistable-index property as the bloom and
    * LSH-bucket artifacts. No udaf: the counter table is a plain
    * bounded groupBy, fully codegen'd. */
  def cmsCounters(df: DataFrame, keyCol: Column, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    df.select(posexplode(cmsBuckets(keyCol, depth, width))
        .as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Probe a candidate-key frame against the counter table: each
    * candidate's estimate is min over rows j of counter(j, bucket_j(key))
    * — an overestimate by construction (est ≥ exact ALWAYS; collisions
    * only add). Candidates explode to d rows each, the counter table
    * rides a BROADCAST (d·w rows), and the min folds back on the
    * candidate frame's own columns — nothing here touches the corpus.
    * A bucket no candidate ever incremented reads 0 (left join). */
  def cmsProbe(candidates: DataFrame, keyCol: String, counters: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val keep = candidates.columns
    candidates
      .select(col("*"), posexplode(
        cmsBuckets(col(keyCol), depth, width)).as(Seq("_j", "_bucket")))
      .join(broadcast(counters),
        col("_j") === counters("j") && col("_bucket") === counters("bucket"),
        "left")
      .groupBy(keep.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** Per-group distinct-count estimation over `keyCol`: one corpus pass,
    * output (groupCol, n_events, uniques_exact, uniques_est). The exact
    * column is the AUDIT column (it demonstrates the sketch's error in
    * data and is what the production pipeline drops); the sketch path
    * is the one whose aggregation state stays k longs per group. */
  def kmvUniques(df: DataFrame, groupCol: String, keyCol: Column,
      k: Int): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    df.select(col(groupCol), keyCol.as("_key"), keyHash60(keyCol).as("_h"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("_key")).as("uniques_exact"),
        kmv(col("_h")).as("_mins"))
      .withColumn("uniques_est", kmvEstimate(col("_mins"), k))
      .drop("_mins")
  }
}

/** Bottom-k distinct aggregation state: a sorted ascending array of at
  * most k DISTINCT hash values. `reduce` and `merge` are the same
  * sorted-insert (duplicates skipped, largest evicted once full), so
  * the result is a pure function of the input SET — associative,
  * commutative, partitioning-independent. State is ≤ k·8 bytes. */
class KmvAgg(val k: Int) extends Aggregator[Long, Array[Long], Array[Long]]
    with Serializable {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(b: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, v)
    if (i >= 0) return b // already present: a SET sketch
    val ip = -i - 1
    if (b.length < k) {
      val out = new Array[Long](b.length + 1)
      System.arraycopy(b, 0, out, 0, ip)
      out(ip) = v
      System.arraycopy(b, ip, out, ip + 1, b.length - ip)
      out
    } else if (ip < k) { // v beats the current k-th smallest
      val out = new Array[Long](k)
      System.arraycopy(b, 0, out, 0, ip)
      out(ip) = v
      System.arraycopy(b, ip, out, ip + 1, k - ip - 1)
      out
    } else b
  }

  override def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i)); i += 1 }
    out
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
