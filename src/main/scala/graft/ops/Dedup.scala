package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: one hash-shuffle on a 32-byte key (md5), map-side combine.
  *  - minhash LSH: per-row signature (narrow) → explode to `bands` rows →
  *    shuffle on band-hash buckets → candidate pairs only within buckets →
  *    verified jaccard. Never a cross join.
  *  - simhash: per-row 64-bit sketch (narrow) → band on 4×16-bit chunks →
  *    bucket join → hamming verify.
  *  - n-gram jaccard (exact pairwise): only for bounded groups (here:
  *    per-source) — the verification primitive the LSH paths reuse.
  *  - embedding near-dup: see Similarity.lshCandidates / bruteForceTopK.
  */
object Dedup {

  /** word n-gram shingle set of the normalized text — one codegen'd pass
    * (see [[OpsKernels.wordShingles]]; the equivalent transform/slice
    * Column chain is interpreted and O(words²)·regexp per doc). */
  def shingles(text: Column, n: Int = 3): Column = opscol.wordShingles(text, n)

  /** Exact dedup: group identical normalized texts, keep the smallest id.
    * Returns (text_hash, keep_id, n_dupes). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** drop duplicates, keeping one row per normalized text (scale path:
    * shuffle on the 128-bit hash, not the full text). */
  def dropExactDupes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** exact jaccard over shingle sets between two docs (verification). */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** floor(100·|a∩b| / |a∪b|) as long — multiply-before-divide so the
    * double math is bit-identical to the DuckDB oracle's
    * floor(100.0 * len(intersect) / len(union)). One codegen'd pass
    * ([[OpsKernels.jaccardPct]]); requires DISTINCT inputs, which every
    * caller satisfies (shingles() output is a distinct set). The
    * equivalent Column form — floor(100.0 * size(array_intersect) /
    * size(array_union)) — builds two hash sets AND two result arrays per
    * row; it was the dominant per-pair cost of the verify stage. */
  def jaccardPct(a: Column, b: Column): Column = opscol.jaccardPct(a, b)

  /** Pairwise n-gram-jaccard near-dups WITHIN a bounded group (groupCol) —
    * O(g²) per group, only safe when groups are small; the LSH variants
    * below are the unbounded-scale path. Returns (id_a, id_b, jaccard_pct)
    * with integer percent so cross-engine compares are float-free. */
  def jaccardPairsWithin(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minJaccardPct: Int): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      shingles(col(textCol)).as("sh"))
    val a = base.select(col("g"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("g"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard_pct", jaccardPct(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_pct") >= minJaccardPct)
      .select("id_a", "id_b", "jaccard_pct")
  }

  /** MinHash + LSH banding: returns VERIFIED near-dup pairs
    * (id_a, id_b, jaccard_pct). numHashes=k, bands×rowsPerBand=k.
    * Scale shape: narrow signature → explode(bands) → shuffle on
    * (band, band_sig) → within-bucket pairs (skew-bounded by bucket
    * size) → exact-jaccard verify on the candidate set only.
    *
    * `shingleN`=1 dedups on word SETS (the scale-safe replacement for an
    * all-pairs jaccard self-join). `groupCol` scopes pairs to a group
    * (e.g. same source) by adding the group to the bucket join key — the
    * group column is never the ONLY key, so a hot group cannot force an
    * all-pairs join. Recall tuning: P(candidate) = 1-(1-j^rowsPer)^bands;
    * more bands / fewer rowsPer raises recall near the threshold (the
    * wordset query uses 32×2 → miss ≈ (1-0.6²)^32 < 1e-6 at j=0.6). */
  /** The banded (group?, id, band, bucket) rows of the minhash-LSH path —
    * exposed so benches can audit the bucket-size distribution with the
    * exact production banding. */
  def bandedBuckets(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleN: Int,
      groupCol: Option[String]): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val gCols = groupCol.toSeq.map(col)
    // banding needs only (group?, id, band, bucket) — signatures never
    // shuffle; bucket hashes are integer-native (MinHashBands, no string
    // round-trip per band)
    df.select(gCols :+ col(idCol).as("id") :+
        opscol.minhashBands(
          opscol.minhashSig(shingles(col(textCol), shingleN), numHashes),
          bands).as("bb"): _*)
      .select(gCols :+ col("id") :+ posexplode(col("bb")): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 3, groupCol: Option[String] = None): DataFrame = {
    // shingle sets for verification joins (no signature attached)
    val sig = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val banded = bandedBuckets(df, idCol, textCol, numHashes, bands, shingleN, groupCol)
    val bucketKeys = groupCol.toSeq ++ Seq("band", "bucket")
    // Join-free candidate generation: ONE shuffle of the banded rows into
    // per-bucket id lists, pairs exploded in place, then the global pair
    // distinct (its partial aggregation dedups map-side). The former
    // bucket self-join shuffled the banded rows TWICE and paid hash-probe
    // per emitted pair — measured 3× slower end-to-end at sf0.1 for the
    // identical candidate set. Memory per aggregation buffer is one
    // bucket's ids — the same bucket-size bound the join's hash relation
    // had, and the LSH design already bounds bucket populations.
    val candidates = banded
      .groupBy(bucketKeys.map(col): _*)
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), explode(col("ids")).as("id_a"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(sig.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard_pct", jaccardPct(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_pct") >= minJaccardPct)
      .select("id_a", "id_b", "jaccard_pct")
  }

  /** SimHash near-dups: 64-bit sketch, banded into 4×16-bit chunks.
    * Pigeonhole: a pair with hamming ≤ 3 differs in at most 3 of the 4
    * chunks, so it always shares ≥1 chunk — recall is EXACTLY 100% for
    * maxHamming ≤ 3 (the driver query and its exact all-pairs oracle rely
    * on this). Larger maxHamming would silently lose recall; pass it only
    * with banding widened accordingly (k differing bits need ≥ k+1
    * chunks — but narrower chunks shrink bucket cardinality, 2^bits per
    * band, which at large scale concentrates candidates; 16-bit chunks =
    * 65536 buckets/band is the balance chosen here).
    * Returns (id_a, id_b, hamming). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x16-bit banding guarantees recall only for hamming <= 3")
    val sk = df.select(col(idCol).as("id"),
      opscol.simhash64(TextAnalysis.words(col(textCol))).as("sh"))
    val banded = sk.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    // join-free within-bucket pairs (see minhashNearDups): the sketch
    // rides along in the struct so the hamming verify needs no re-join
    banded
      .groupBy("band", "chunk")
      .agg(collect_list(struct(col("id"), col("sh"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(col("ms"), explode(col("ms")).as("a"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b")).distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
