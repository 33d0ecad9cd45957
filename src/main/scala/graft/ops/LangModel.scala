package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): train a smoothed bigram LM on a reference slice, score every
  * document by its average per-bigram negative log-likelihood /
  * perplexity, and let a downstream filter keep the head of the
  * distribution. CCNet uses a KenLM 5-gram; the distributed SHAPE is the
  * same for any order — model tables broadcast, corpus never shuffles on
  * gram keys — so a bigram with add-one smoothing keeps the arithmetic
  * exactly replicable by the DuckDB oracle.
  *
  * 100 TB shape: the LM is MODEL-sized, not corpus-sized (CCNet ships a
  * fixed per-language model), so both count tables ride broadcast hash
  * joins and the scoring pass is a narrow per-row explode + probe. The
  * per-document aggregate keys on the doc id, and explode preserves
  * locality, so map-side partial aggregation collapses each document's
  * bigrams to one (sum, count) row before the only shuffle. Training is
  * one wordcount-shaped shuffle over the (small) reference slice.
  */
object LangModel {

  /** Ordered word bigrams WITH multiplicity — order and repetition carry
    * probability mass, unlike the distinct shingles the dedup family
    * uses. Each element is struct(g = "w1 w2", w1 = history word); a
    * document with < 2 words yields an empty array (slice length 0).
    */
  private def bigramsWithHistory(text: Column): Column = {
    val ws = TextAnalysis.words(text)
    zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => struct(concat(a, lit(" "), b).as("g"), a.as("w1")))
  }

  /** Train the add-one bigram LM over `ref`: returns
    * (bi: [g, cb] bigram counts, uni: [w1, cu] history counts,
    * vocab: single-row [v] distinct-word count). cu(w1) = Σ_w2 cb(w1,w2)
    * by construction, so p(w2|w1) = (cb+1)/(cu+V) is a proper
    * conditional distribution.
    */
  def trainBigramLm(ref: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val bg = ref
      .select(explode(bigramsWithHistory(col(textCol))).as("u"))
      .select(col("u.g").as("g"), col("u.w1").as("w1"))
    val bi = bg.groupBy("g").agg(count(lit(1)).as("cb"))
    val uni = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = ref
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    (bi, uni, vocab)
  }

  /** Score every document in `docs` under the trained LM: output is TOTAL
    * (one row per input row) with
    *   n_big   — bigram count (0 for docs with < 2 words),
    *   avg_nll — average -ln p(w_i | w_{i-1})  (null when n_big = 0),
    *   ppl     — exp(avg_nll), the per-token perplexity (null likewise).
    * Unseen bigrams/histories fall back to the smoothed floor
    * (0+1)/(0+V) — no special-casing, the add-one arithmetic covers them.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      bi: DataFrame, uni: DataFrame, vocab: DataFrame): DataFrame = {
    val bg = docs
      .select(col(idCol), explode(bigramsWithHistory(col(textCol))).as("u"))
      .select(col(idCol), col("u.g").as("g"), col("u.w1").as("w1"))
    val scored = bg
      .join(broadcast(bi), Seq("g"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
            (coalesce(col("cu"), lit(0L)).cast("double") + col("v"))).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_big"), sum("lp").as("slp"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        (-col("slp") / col("n_big")).as("avg_nll"),
        exp(-col("slp") / col("n_big")).as("ppl"))
  }
}
