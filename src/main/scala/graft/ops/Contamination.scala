package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram overlap operators for training-corpus hygiene:
  *
  *  - [[contaminated]]: benchmark DECONTAMINATION — which training docs
  *    share any word n-gram with a (small) eval/benchmark set. The
  *    standard "n-gram overlap" test-set-leakage check every serious
  *    training pipeline runs before training.
  *  - [[spanDupStats]]: per-document duplicate-TEXT fraction — how much of
  *    a doc's n-gram surface also appears in other documents (the
  *    span-level signal behind exact-substring dedup à la "Deduplicating
  *    Training Data Makes Language Models Better"; doc-level MinHash
  *    can't see a boilerplate paragraph pasted into otherwise-distinct
  *    pages, this can).
  *
  * Both ride [[Dedup.shingles]] (codegen'd normalize→split→n-gram kernel,
  * distinct shingles per doc).
  */
object Contamination {

  /** Training docs sharing ≥1 word n-gram with the eval set, with the
    * count of distinct shared n-grams. Output: (idCol, n_shared).
    *
    * 100 TB shape: benchmark suites are tiny (≤ millions of n-grams) —
    * the distinct eval-gram set is BROADCAST, so the train side is one
    * narrow explode + hash-probe with map-side partial aggregation; the
    * only shuffle carries (id, partial count) for docs that hit, which
    * contamination makes rare by construction. No shuffle ever carries
    * the corpus n-grams.
    */
  def contaminated(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    contaminatedGrams(
      train.select(col(idCol), Dedup.shingles(col(textCol), n).as("_sh")),
      evalSet.select(Dedup.shingles(col(textCol), n).as("_sh")), idCol, "_sh")

  /** Gram-level core of [[contaminated]]: `gramsCol` must hold the
    * DISTINCT grams of each document (so count(*) after the probe equals
    * the distinct shared grams). Output: (idCol, n_shared), hits only. */
  private[ops] def contaminatedGrams(train: DataFrame, evalSet: DataFrame,
      idCol: String, gramsCol: String): DataFrame = {
    val evalGrams = guardGrams(evalSet, gramsCol)
      .select(explode(col(gramsCol)).as("_g"))
      .distinct()
    guardGrams(train, gramsCol, idCol)
      .select(col(idCol), explode(col(gramsCol)).as("_g"))
      .join(broadcast(evalGrams), "_g")
      // grams are distinct per doc ⇒ count(*) = distinct shared grams
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Pushdown barrier around a computed grams column. explode() makes the
    * optimizer infer `size(g) > 0 AND isnotnull(g)` below the Generate
    * (InferFiltersFromGenerate) and push it through the defining Project
    * into the scan — re-evaluating the WHOLE gram-render chain two extra
    * times per row (measured 3× wall on tok_contam's train side). Marking
    * the projected column non-deterministic blocks the substitution, so
    * the inferred filter tests the already-materialized array instead
    * (see NoPushdown's scaladoc: the barrier must wrap the projected
    * column, not the predicate). */
  private[ops] def guardGrams(df: DataFrame, gramsCol: String,
      keep: String*): DataFrame =
    df.select(keep.map(col) :+
      graft.hotdog.exprs.noPushdown(col(gramsCol)).as(gramsCol): _*)

  /** Per-document span-duplication stats: n_sh = distinct word n-grams in
    * the doc, n_dup_sh = how many of those appear in ≥1 OTHER doc.
    * Output: (idCol, n_sh, n_dup_sh) — total (one row per input doc;
    * docs sharing nothing report n_dup_sh = 0).
    *
    * 100 TB shape: the gram-frequency pass groups on md5(gram) — a fixed
    * 128-bit key, so the big shuffle never carries raw n-gram text, and
    * cross-doc detection is min(id)≠max(id) (two longs per gram, map-side
    * combined) rather than a count-distinct. The per-doc dup count then
    * semi-joins the exploded grams against the duplicated-gram keys —
    * both sides shuffle-partitioned by the same 128-bit key. A Bloom/
    * broadcast short-circuit is deliberately NOT used: the duplicated-gram
    * set is corpus-sized, not benchmark-sized.
    */
  def spanDupStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame =
    spanDupStatsGrams(
      df.select(col(idCol), Dedup.shingles(col(textCol), n).as("_sh")),
      idCol, "_sh")

  /** Gram-level core of [[spanDupStats]]: `gramsCol` must hold the
    * DISTINCT grams of each document (any renderable gram domain — word
    * shingles, token n-grams). Output: (idCol, n_sh, n_dup_sh), total.
    */
  private[ops] def spanDupStatsGrams(base0: DataFrame, idCol: String,
      gramsCol: String): DataFrame =
    // 16-byte BINARY key (unhex), not the 32-char hex string: the gram
    // shuffle is the big one, and the key is pure routing — halving its
    // bytes halves the dominant shuffle traffic
    spanDupStatsCore(base0, idCol, gramsCol, g => unhex(md5(g)))

  /** [[spanDupStatsGrams]] for a column that ALREADY holds 16-byte binary
    * routing keys (tokenGramKeys) — skips the md5-over-rendered-string. */
  private[ops] def spanDupStatsKeys(base0: DataFrame, idCol: String,
      keysCol: String): DataFrame =
    spanDupStatsCore(base0, idCol, keysCol, identity)

  private def spanDupStatsCore(base0: DataFrame, idCol: String,
      gramsCol: String, key: Column => Column): DataFrame = {
    val base = guardGrams(base0, gramsCol, idCol)
    val grams = base
      .select(col(idCol), explode(col(gramsCol)).as("_g"))
      .select(col(idCol), key(col("_g")).as("_gh"))
    val dupGrams = grams
      .groupBy("_gh")
      .agg(min(col(idCol)).as("_mn"), max(col(idCol)).as("_mx"))
      .filter(col("_mn") =!= col("_mx"))
      .select("_gh")
    val perDocDup = grams
      .join(dupGrams, Seq("_gh"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_sh"))
    base
      .select(col(idCol), size(col(gramsCol)).cast("long").as("n_sh"))
      .join(perDocDup, Seq(idCol), "left")
      .withColumn("n_dup_sh", coalesce(col("n_dup_sh"), lit(0L)))
  }
}
