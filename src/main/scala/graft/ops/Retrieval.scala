package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: BM25 scoring + top-k (the public
  * Okapi BM25 formulation Lucene/Elasticsearch/Trino use). Complements
  * the embedding-space ANN operators in [[Similarity]] — a training-data
  * pipeline uses exactly this shape for "find documents about X" audits,
  * targeted decontamination and retrieval-based data selection.
  *
  * 100 TB shape, stage by stage:
  *  - the query-term vocabulary is a PLAN-TIME literal set (queries are
  *    human-sized); the corpus is touched in ONE narrow pass producing
  *    (doc_id, dl, term) match rows filtered to query terms BEFORE any
  *    shuffle — every downstream frame is bounded by
  *    (docs containing ≥1 query term) × (query terms), not the corpus.
  *  - corpus statistics (N, Σdl) are ONE map-side-combinable aggregate
  *    whose single row rides a broadcast cross-join (no driver collect,
  *    pure plan).
  *  - tf rows are localCheckpoint'd once: df(term), the per-(query,doc)
  *    score sum and the final ranking all read the materialized narrow
  *    frame instead of re-deriving the corpus scan per consumer (the
  *    dsirSelect lesson, measured there as scans 4 → 3).
  *  - ranking: a salted two-phase top-k — phase 1 ranks inside
  *    (query_id, salt) partitions and keeps k per salt, phase 2 ranks
  *    the ≤ salts·k survivors per query. A plain row_number over
  *    (query_id) would sort EVERY doc matching a query in ONE
  *    partition — the same single-partition flood class as the exact-
  *    dedup window the round-4 rework removed; a common query term at
  *    corpus scale wedges it. Both phases sort bounded sets.
  *
  * Determinism across engines: tf/dl/df/N are exact integers; the float
  * math (idf's ln, the length norm) happens once per (query,doc) with a
  * fixed operand order the DuckDB oracle mirrors token-for-token, and the
  * emitted score is floor(score·1e6) (the sim_topk idiom; ln precedent:
  * LangModel's perplexity oracle). Ties break on ascending doc id.
  */
object Retrieval {

  /** (query_id, doc_id, rank, score_e6, n_terms_hit) — top `k` docs per
    * query under BM25(k1, b). `queries` are (query_id, whitespace query
    * text); query text is normalized with the same [[TextAnalysis.words]]
    * tokenization as the corpus. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k > 0, "need queries and k > 0")
    val spark = docs.sparkSession
    val qTermPairs: Seq[(Int, String)] = queries.flatMap { case (qid, qt) =>
      qt.trim.toLowerCase.split("\\s+").toSeq.distinct.map(t => (qid, t))
    }
    val allTerms: Seq[String] = qTermPairs.map(_._2).distinct

    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
      .select(col("doc_id"), coalesce(size(col("ws")), lit(0)).as("dl"),
        col("ws"))
    // one corpus-sized aggregate: N and Σdl (avgdl = sumdl / n, computed
    // as a double ONCE with fixed operand order)
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    // the only corpus-sized shuffle: (doc_id, term) pre-filtered to the
    // literal query vocabulary, aggregated to tf with map-side combine
    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("ws"), w => w.isin(allTerms: _*))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qdf = spark.createDataFrame(qTermPairs).toDF("query_id", "term")

    val perTerm = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("score_t",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / (col("sum_dl") / col("n_docs")))))
    // fold the per-term scores in ASCENDING TERM ORDER on both sides
    // (oracle: list_reduce(list(score_t ORDER BY term))) — double
    // addition is not associative, and an engine-chosen sum order could
    // flip floor(score·1e6) at a ulp boundary. ≤ a handful of terms per
    // (query, doc), so the collect_list group state is query-sized.
    val scored = perTerm.groupBy("query_id", "doc_id")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("term"), col("score_t")))),
          lit(0.0), (acc, x) => acc + x.getField("score_t")).as("score"),
        count(lit(1)).as("n_terms_hit"))
    topKPerGroup(scored, k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        floor(col("score") * 1e6).cast("long").as("score_e6"),
        col("n_terms_hit"))
  }

  /** Sharded inverted-index build — the searchable artifact behind
    * [[bm25TopK]]'s ad-hoc scan, materialized: per (term, doc-range
    * shard), the doc-frequency, total occurrences, and the posting
    * arrays (doc ids + tfs, doc-id-sorted — the Lucene postings-list
    * shape).
    *
    * Sharding IS the skew story: a stopword's postings list is
    * corpus-sized, and a single `collect_list` group holding it wedges
    * one reduce task (the groupBy+collect_list fallback the bench rules
    * warn about). Keying by (term, doc_id DIV shardDocs) bounds EVERY
    * group at `shardDocs` entries however hot the term — the hot term's
    * postings split across ceil(maxDoc/shardDocs) independent tasks,
    * and a reader re-assembles by concatenating shards in shard order
    * (doc-id order is preserved across shard boundaries by
    * construction). tf is one map-side-combinable aggregate on the
    * uniform (term, doc) key before any list is built. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      shardDocs: Long): DataFrame = {
    require(shardDocs > 0, s"shardDocs must be positive, got $shardDocs")
    val tf = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.words(col(textCol))).as("term"))
      .filter(col("term") =!= "") // blank text splits to [""]
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf.withColumn("shard", expr(s"doc_id DIV ${shardDocs}L"))
      .groupBy("term", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("tf").as("n_occ"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("_p"))
      .withColumn("doc_ids", transform(col("_p"), x => x.getField("doc_id")))
      .withColumn("tfs", transform(col("_p"), x => x.getField("tf")))
      .drop("_p")
  }

  /** Exact top-`k` rows per query_id under (score desc, doc_id asc) via
    * the shared salted two-phase rank ([[Ranks.topKPerGroup]]) — never a
    * single-partition sort of a query's full candidate set. */
  private[ops] def topKPerGroup(scored: DataFrame, k: Int): DataFrame =
    Ranks.topKPerGroup(scored, col("query_id"), col("doc_id"),
      Seq(col("score").desc, col("doc_id").asc), k, "rank")

  /** Per-document top-`k` keyword extraction by smoothed tf-idf
    * (idf = ln((N+1)/(df+1)) + 1, the scikit-learn smoothing — never
    * negative, never divides by zero): the per-doc summary a corpus
    * audit/labeling pipeline materializes. Output (doc_id, rank, term,
    * tf, df, score_e6).
    *
    * 100 TB shape: ONE corpus pass to (doc, term, tf) with map-side
    * combine (localCheckpoint'd — df and scoring both consume it, the
    * dsirSelect lesson); df(term) is a second map-side-combined
    * aggregate of the CHECKPOINTED frame, so the corpus is scanned
    * once. The tf⋈df term-key join is 1-row-per-key on the df side —
    * the stock-Spark AQE skew-join split handles a hot term (the join,
    * unlike a window, is splittable); ranking per doc is a plain
    * per-doc window (group size bounded by the document's own length —
    * see the inline note). The
    * RANKING key is the already-floored integer score (ties broken on
    * ascending term), so rank is deterministic across engines — a raw
    * float rank could flip on a last-ulp ln() difference exactly where
    * two scores tie. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val stats = base.agg(count(lit(1)).as("n_docs"))
    val tf = base
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_e6",
        floor(col("tf") *
          (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) +
            lit(1.0)) * lit(1e6)).cast("long"))
    // ranking group = ONE document's distinct terms — bounded by the
    // document's own length (the same per-doc bound scrubTokens and the
    // scrub lead() window rely on), so the plain per-doc window is
    // skew-safe at any corpus size and the salted two-phase rank (built
    // for UNBOUNDED groups like "all docs matching a query term" in
    // bm25TopK) would pay an extra exchange + sort of the tf frame for
    // nothing. WindowGroupLimit pushes the k-filter into the sort.
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_e6").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score_e6"))
  }
}
