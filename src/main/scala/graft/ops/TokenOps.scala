package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operators over the tokens axis itself — the `tokens: array<int32>`
  * column of the pre-tokenized sequences table (BASELINE input_hint), as
  * opposed to the text-column operators in [[TextAnalysis]]:
  *
  *  - [[ngramTopK]]: global top-k token n-grams with counts — the
  *    frequency table behind tokenizer/vocab audits and repeated-template
  *    detection on already-tokenized corpora.
  *  - [[tokenSpanDupStats]]: per-sequence duplicated-token-span stats —
  *    the span-level exact-substring dedup signal ("Deduplicating Training
  *    Data Makes Language Models Better"), computed directly on token ids
  *    (the paper's suffix-array dedup operates on tokens for exactly this
  *    reason: no normalization ambiguity).
  *
  * Gram rendering is a custom codegen Expression (SQL: `token_ngrams`);
  * everything downstream is builtin aggregates — no UDFs.
  */
object TokenOps {

  /** Order-preserving n-gram render: each window of `n` consecutive
    * tokens as a canonical comma-joined string (engine-portable group
    * key). Sequences shorter than n contribute no grams.
    *
    * A custom codegen kernel ([[OpsKernels.tokenNgrams]]), not the
    * transform(sequence)/slice/array_join Column composition: the
    * higher-order functions fall out of whole-stage codegen and allocate
    * ~5 intermediate arrays per window — the kernel renders each token to
    * decimal once and builds each gram in a reused StringBuilder
    * (measured 7.5s → 1.1s on the sf0.1 trigram count). Still a narrow
    * per-row expansion, nothing shuffles here.
    */
  def tokenNgrams(tokens: Column, n: Int): Column =
    opscol.tokenNgrams(tokens, n)

  /** Global top-k token n-grams by corpus occurrence count (every window
    * counts, not distinct-per-doc), with the number of distinct sequences
    * containing the gram. Deterministic total order (n desc, gram asc) so
    * the top-k boundary is unambiguous in a cross-engine compare.
    *
    * 100 TB shape: the explode is narrow (no shuffle before the
    * aggregate); the groupBy ships (gram, partial count, partial
    * doc-count) with map-side combine — token n-grams are extremely
    * skewed (Zipf), which map-side combine absorbs because hot grams
    * collapse to one row per map task; the top-k is TakeOrdered (per-
    * partition heap + driver merge of k rows), never a global sort.
    */
  def ngramTopK(df: DataFrame, idCol: String, tokensCol: String, n: Int,
      k: Int): DataFrame =
    Contamination.guardGrams(
        df.select(col(idCol), tokenNgrams(col(tokensCol), n).as("_sh")),
        "_sh", idCol)
      .select(col(idCol), explode(col("_sh")).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"), count_distinct(col(idCol)).as("n_docs"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)

  /** Per-sequence token-span duplication stats: n_sp = distinct token
    * n-grams in the sequence, n_dup_sp = how many of those appear in ≥1
    * OTHER sequence. Total output — every input sequence reports, 0 for
    * sequences sharing nothing. Same shuffle discipline as
    * [[Contamination.spanDupStats]] (md5 gram keys, min≠max cross-doc
    * test), reused via the gram-level core.
    */
  def tokenSpanDupStats(df: DataFrame, idCol: String, tokensCol: String,
      n: Int): DataFrame =
    Contamination.spanDupStatsGrams(
      df.select(col(idCol),
        opscol.tokenNgrams(col(tokensCol), n, distinct = true).as("_sh")),
      idCol, "_sh")

  /** Benchmark decontamination on RAW TOKEN IDS: training sequences
    * sharing ≥1 token n-gram with the (tokenized) eval set, with the
    * distinct-shared-gram count — how production pipelines actually
    * decontaminate against tokenized benchmarks (no retokenization /
    * normalization ambiguity between the check and the training input).
    * Same broadcast shape as [[Contamination.contaminated]]: eval grams
    * broadcast, train side a narrow explode + hash probe with map-side
    * partials — corpus token grams never shuffle.
    */
  def tokenContaminated(train: DataFrame, evalSet: DataFrame, idCol: String,
      tokensCol: String, n: Int): DataFrame =
    Contamination.contaminatedGrams(
      train.select(col(idCol),
        opscol.tokenNgrams(col(tokensCol), n, distinct = true).as("_sh")),
      evalSet.select(
        opscol.tokenNgrams(col(tokensCol), n, distinct = true).as("_sh")),
      idCol, "_sh")
}
