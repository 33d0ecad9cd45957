package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-cleaning composition every production
  * training-data pipeline runs (ccnet/Gopher/RefinedWeb shape): cheap
  * per-row filters FIRST (quality counters, language ID — pure codegen'd
  * projections that prune the corpus before anything shuffles), then
  * exact dedup (one hash-shuffle on a 128-bit fingerprint), then
  * MinHash-LSH near-dup detection + connected components over the
  * verified pair graph, keeping each component's min-id representative.
  *
  * Returns a TOTAL verdict: every input document gets exactly one status —
  *   kept | drop_quality | drop_lang | drop_exact | drop_neardup
  * where status is the FIRST stage that rejected the document. Total-ness
  * is what makes the operator oracle-checkable end to end (the driver's
  * DuckDB compare sees all N rows, not just survivors) and what a real
  * pipeline wants anyway: drop REASONS are the observability signal that
  * tells you which filter is eating your corpus.
  *
  * 100 TB shape, stage by stage:
  *  - quality/lang: narrow per-row projections, no shuffle; they run
  *    FIRST precisely so the expensive stages see the smallest corpus.
  *  - exact: one shuffle on md5(normalized) — never on the full text.
  *  - near-dup: the [[Dedup.minhashNearDups]] banded-LSH path (no
  *    cartesian, bucket-bounded candidate work) over exact-dedup
  *    SURVIVORS only — the composition order that keeps byte-identical
  *    boilerplate floods from wedging the within-bucket pair stream
  *    (see [[Dedup.nearDupsDeduped]]).
  *  - components: [[Components.dedupVerdict]] — label table holds only
  *    docs that near-matched something, O(log n) pointer-jumping rounds.
  *  - verdict assembly: id-keyed joins carrying only (id, flag) columns;
  *    the text never shuffles after the exact stage.
  *
  * At production scale the `flagged` frame (quality+lang survivors with
  * their exact-dedup representative flag) is worth persisting — it feeds
  * both the near-dup input and the verdict join; Catalyst will otherwise
  * recompute the filter+aggregate+join for each consumer. Left
  * un-persisted here so the operator stays a pure plan (the driver's
  * Verify/Bench contract).
  */
object CorpusClean {

  /** (id, status) for every input row. Thresholds are the knobs a real
    * pipeline sweeps; defaults match the driver query / oracle. */
  def cleanVerdict(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 20, lang: String = "en", minJaccardPct: Int = 60,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3): DataFrame = {
    val t = col(textCol)
    // stage flags: one narrow codegen'd pass over the corpus
    val staged = df.select(col(idCol).as("id"), t.as("text"),
      (TextAnalysis.tokenCountWs(t) >= minWords).as("q_ok"),
      (TextAnalysis.langId(t) === lang).as("l_ok"))
    // exact dedup among filter survivors — the flood-proof dd_lines idiom
    // (same as Dedup.dropExactDupes): keeper ids via a map-side-combinable
    // min(id) aggregate on the fingerprint, rep flag re-joined on the
    // UNIFORM id key; a row_number window here sorted every copy of a
    // flooded boilerplate text inside one partition
    val survivors = staged.filter(col("q_ok") && col("l_ok"))
    val keepers = survivors
      .groupBy(TextAnalysis.fingerprint(col("text")).as("_fp"))
      .agg(min(col("id")).as("_keep_id"))
      .select(col("_keep_id"), lit(true).as("_is_rep"))
    val flagged = survivors
      .join(keepers, survivors("id") === keepers("_keep_id"), "left")
      .select(col("id"), col("text"),
        coalesce(col("_is_rep"), lit(false)).as("_is_rep"))
    // near-dup pairs among exact representatives; components → keep flag
    val reps = flagged.filter(col("_is_rep")).select("id", "text")
    val pairs = Dedup.minhashNearDups(reps, "id", "text", minJaccardPct,
      numHashes, bands, shingleN)
    val verdict = Components.dedupVerdict(pairs, "id_a", "id_b")
      .select(col("id"), col("keep").as("_nd_keep"))
    staged.select("id", "q_ok", "l_ok")
      .join(flagged.select("id", "_is_rep"), Seq("id"), "left")
      .join(verdict, Seq("id"), "left")
      .select(col("id"),
        when(!col("q_ok"), lit("drop_quality"))
          .when(!col("l_ok"), lit("drop_lang"))
          .when(!col("_is_rep"), lit("drop_exact"))
          .when(col("_nd_keep") === false, lit("drop_neardup"))
          .otherwise(lit("kept")).as("status"))
  }
}
