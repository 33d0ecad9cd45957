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

  /** fastText/DCLM-style supervised quality classifier (Joulin et al.
    * 2016; the model-based filter step of DCLM / FineWeb-Edu): a
    * multinomial Naive Bayes over unigram occurrences with add-one
    * smoothing — the closed-form member of the linear-classifier family
    * fastText trains by SGD, so the arithmetic is exactly replicable by
    * the DuckDB oracle while the distributed SHAPE (model broadcast,
    * corpus never shuffles on words) is identical to the trained case.
    *
    * Train on `ref` labeled by `posCol`; score EVERY doc in `docs` with
    *   score(d) = ln(dp/dn) + Σ_w∈d [ln((cp(w)+1)/(Np+V)) −
    *                                 ln((cn(w)+1)/(Nn+V))]
    * (occurrences with multiplicity; unseen words fall back to the
    * smoothed floor via the left join's coalesce-to-0 — no special
    * case). Output is TOTAL: (id, n_words, score, keep = score > 0); a
    * null text scores the prior alone at n_words = 0.
    *
    * 100 TB shape: the model is VOCAB-sized, so it rides a broadcast
    * hash join probed by a narrow per-row explode; explode preserves
    * locality, so the per-doc aggregate map-side-combines each document
    * to one (count, sum) row before the only shuffle. Training is one
    * wordcount shuffle over the (small, labeled) reference slice.
    */
  def nbClassifierScores(docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, posCol: Column): DataFrame = {
    val refw = ref.select(posCol.as("_pos"),
      explode(TextAnalysis.words(col(refTextCol))).as("w"))
    val model = refw.groupBy("w").agg(
      sum(when(col("_pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(col("_pos"), 0L).otherwise(1L)).as("cn"))
    // scalar training constants: total occurrences / docs per class +
    // vocab size — one row, broadcast-crossed into the scoring pass
    val consts = ref
      .select(posCol.as("_pos"),
        size(TextAnalysis.words(col(refTextCol))).cast("long").as("_nw"))
      .agg(
        sum(when(col("_pos"), col("_nw")).otherwise(0L)).as("np"),
        sum(when(col("_pos"), 0L).otherwise(col("_nw"))).as("nn"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("dp"),
        sum(when(col("_pos"), 0L).otherwise(1L)).as("dn"))
      .crossJoin(refw.agg(count_distinct(col("w")).as("v")))
    // explode_outer keeps null-text docs as a single null-word row, so
    // the per-doc aggregate is already TOTAL — no corpus-wide join-back
    // on the id (count(w) ignores the null row; its lo is null too)
    val occ = docs.select(col(idCol),
      explode_outer(TextAnalysis.words(col(textCol))).as("w"))
    occ
      .join(broadcast(model), Seq("w"), "left")
      .crossJoin(broadcast(consts))
      .select(col(idCol), col("w"),
        when(col("w").isNotNull,
          log(coalesce(col("cp"), lit(0L)).cast("double") + 1.0) -
          log((col("np") + col("v")).cast("double")) -
          log(coalesce(col("cn"), lit(0L)).cast("double") + 1.0) +
          log((col("nn") + col("v")).cast("double"))).as("lo"))
      .groupBy(idCol)
      .agg(count(col("w")).as("n_words"), sum("lo").as("slo"))
      .crossJoin(broadcast(consts.select(col("dp"), col("dn"))))
      .select(col(idCol), col("n_words"),
        (log(col("dp").cast("double")) - log(col("dn").cast("double")) +
          coalesce(col("slo"), lit(0.0))).as("score"))
      .withColumn("keep", col("score") > 0)
  }
}
