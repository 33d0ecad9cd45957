package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-mixing operators: deterministic weighted sampling (the "data
  * mixture" step that up/down-weights sources before training) and global
  * vocabulary/token-frequency building (tokenizer training, frequency
  * filters).
  */
object Mixing {

  /** Deterministic per-row sampling hash in [0, 100): the first 32 bits of
    * md5(id) — stable across engines, runs, partitionings and cluster
    * sizes (re-running the job keeps EXACTLY the same rows, the property
    * that makes sampled corpora reproducible; `rand()` has none of that).
    */
  def hashPct(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Weighted corpus mixing: keep each row iff hashPct(id) < its source's
    * sampling rate (percent, 0..100). `rates` is a (srcCol, rate_pct)
    * dimension — broadcast, since real mixtures have a handful-to-
    * thousands of sources. Narrow per-row filter after the broadcast
    * probe: no shuffle at all, filters push to the scan's batch reader.
    */
  def sampleBySource(df: DataFrame, idCol: String, srcCol: String,
      rates: DataFrame): DataFrame =
    df.join(broadcast(rates), srcCol)
      .filter(hashPct(col(idCol)) < col("rate_pct"))

  /** Global word-frequency vocabulary: top-k words by corpus count with
    * per-word document frequency. Deterministic total order (count desc,
    * word asc) so the top-k boundary is unambiguous.
    *
    * 100 TB shape: wordcount with map-side combine on the word; the
    * document frequency is a two-level aggregate (distinct (word, doc)
    * first — same shuffle key), and the top-k is TakeOrdered (limit k
    * heap per partition + driver merge), never a full global sort.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"), count_distinct(col(idCol)).as("n_docs"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)
}
