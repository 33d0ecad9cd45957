package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.hotdog.SparkSpec

/** Gopher quality-rule verdict, exact histogram quantiles, BM25 top-k. */
class QualityRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  // thresholds scaled down (minWords=3, maxWords=50) so each rule is
  // exercised by a hand-sized doc; stop rule: ≥1 of {the, of}
  private def verdict(docs: Seq[(Long, String)]): Map[Long, String] = {
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.gopherVerdict(df, "doc_id", "text",
      minWords = 3, maxWords = 50, stopList = Seq("the", "of"),
      minStopHits = 1)
    out.collect().map(r => r.getLong(0) -> r.getString(9)).toMap
  }

  test("gopherVerdict: every rule fires on its construction, first failure wins") {
    val m = verdict(Seq(
      1L -> "the quick brown foxes jump",                         // clean
      2L -> "hi",                                                 // 1 word
      3L -> "- the aaaa bbbb\n- cccc dddd eeee",                  // all lines bullets
      4L -> "the aaaa bbbb...\nthe cccc dddd...\nthe missing one", // 2/3 lines end ...
      5L -> "the #### big #### words ####",                       // 12 hashes vs 6 words
      6L -> "the 123 456 789 000",                                // 1/5 words alphabetic
      7L -> "the aaaaaaaaaaaaaaa bbbbbbbbbbbbbbb ccccccccccccccc", // mean len 12
      8L -> "nothing here matches stoplist"))                     // no the/of
    assert(m(1L) == "pass")
    assert(m(2L) == "word_count")
    assert(m(3L) == "bullet_lines")
    assert(m(4L) == "ellipsis_lines")
    assert(m(5L) == "symbol_ratio")
    assert(m(6L) == "alpha_words")
    assert(m(7L) == "mean_word_len")
    assert(m(8L) == "stop_words")
  }

  test("gopherVerdict counters: symbols count hashes + non-overlapping ellipses") {
    val df = Seq((1L, "a# b...... c")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherVerdict(df, "doc_id", "text").collect().head
    // 1 '#', '......' = two non-overlapping '...'
    assert(r.getAs[Int]("n_symbols") == 3)
    assert(r.getAs[Int]("n_lines") == 1)
  }

  test("gopherVerdict is a pure projection: zero exchanges") {
    val df = Seq((1L, "some text")).toDF("doc_id", "text")
    val phys = TextAnalysis.gopherVerdict(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"gopherVerdict shuffles:\n$phys")
  }

  test("exactQuantiles: percentile_disc order statistics, duplicates included") {
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 1L), ("b", 1L), ("b", 1L), ("b", 2L))).toDF("src", "len")
    val out = TextAnalysis.exactQuantiles(df, "src", "len",
      Seq(25, 50, 75, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // group a: 10 distinct values, rank = ceil(q/10)
    assert(out(("a", 25)) == 3L && out(("a", 50)) == 5L)
    assert(out(("a", 75)) == 8L && out(("a", 90)) == 9L)
    assert(out(("a", 99)) == 10L)
    // group b: [1,1,1,2] — p75 still inside the run of 1s, p99 hits 2
    assert(out(("b", 75)) == 1L && out(("b", 99)) == 2L)
  }

  test("exactQuantiles windows run over the HISTOGRAM, not the corpus") {
    val df = (1 to 1000).map(v => ("s", (v % 7).toLong)).toDF("src", "len")
    val out = TextAnalysis.exactQuantiles(df, "src", "len", Seq(50))
    val plan = out.queryExecution.executedPlan
    // the aggregate that collapses rows to the histogram must sit BELOW
    // every window in the plan tree
    val winSubtrees = plan.toString.split("\n").filter(_.contains("Window"))
    assert(winSubtrees.nonEmpty)
    val optim = out.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    optim.foreach {
      case w: LWindow =>
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"Window has no Aggregate beneath it:\n$optim")
      case _ => ()
    }
  }

  test("bm25TopK: scores match the Okapi formula, ties break on doc id") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana banana"), (4L, "durian fruit"),
      (5L, "durian fruit")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries = Seq((1, "apple banana"), (2, "durian")), k = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(2)) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap

    // replicate the exact double math (N=5, sumdl=12)
    val n = 5L; val sumdl = 12L
    def idf(df: Long) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tscore(tf: Long, dl: Int, df: Long) =
      idf(df) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (sumdl.toDouble / n)))
    val d1 = (0.0 + tscore(2, 3, 2)) + tscore(1, 3, 2) // apple then banana
    val d3 = 0.0 + tscore(3, 3, 2)
    assert(out((1, 1)) == ((1L, math.floor(d1 * 1e6).toLong, 2L)))
    assert(out((1, 2)) == ((3L, math.floor(d3 * 1e6).toLong, 1L)))
    // identical docs 4 and 5 tie on score — ascending id breaks it
    assert(out((2, 1))._1 == 4L && out((2, 2))._1 == 5L)
    assert(out((2, 1))._2 == out((2, 2))._2)
  }

  test("invertedIndex: postings sorted, tf exact, hot term splits at the shard bound") {
    // "the" appears in docs on both sides of the shard boundary (shard
    // size 4: docs 0-3 / 4-7); "rare" once; doc 2 repeats "the" 3 times
    val docs = Seq(
      (0L, "the cat"), (1L, "a dog"), (2L, "the the the end"),
      (3L, "rare word"), (4L, "the moon"), (6L, "sun the"),
      (7L, "")).toDF("doc_id", "text")
    val out = graft.ops.Retrieval.invertedIndex(docs, "doc_id", "text", 4L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Long](4), r.getSeq[Long](5)))
      .toMap
    assert(out(("the", 0L)) == (2L, 4L, Seq(0L, 2L), Seq(1L, 3L)))
    assert(out(("the", 1L)) == (2L, 2L, Seq(4L, 6L), Seq(1L, 1L)))
    assert(out(("rare", 0L)) == (1L, 1L, Seq(3L), Seq(1L)))
    // blank doc contributes no postings, empty terms filtered
    assert(!out.keys.exists(_._1 == ""))
    // shard-bound invariant + reassembly: concatenating a term's shards
    // in shard order yields one globally doc-id-sorted postings list
    out.foreach { case ((_, _), (nDocs, _, ids, tfs)) =>
      assert(nDocs <= 4L && ids.length == nDocs && tfs.length == nDocs)
      assert(ids == ids.sorted)
    }
    val theAll = out.toSeq.filter(_._1._1 == "the").sortBy(_._1._2)
      .flatMap(_._2._3)
    assert(theAll == theAll.sorted && theAll == Seq(0L, 2L, 4L, 6L))
  }

  test("oovStats: exact per-source counts, vocab broadcast, no corpus shuffle-join") {
    val docs = Seq(
      (1L, "a", "the cat sat"), (2L, "a", "the dog"),
      (3L, "b", "zzz yyy the")).toDF("doc_id", "source", "text")
    val vocab = Seq(("the", 3L), ("cat", 1L)).toDF("word", "n")
    val out = Mixing.oovStats(docs, "source", "text", vocab)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") == ((5L, 2L)))   // sat, dog OOV
    assert(out("b") == ((3L, 2L)))   // zzz, yyy OOV
    val phys = Mixing.oovStats(docs, "source", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$phys")
    assert(!phys.contains("SortMergeJoin"), s"corpus shuffled for a join:\n$phys")
  }

  test("splitByHash: total, disjoint, seed-stable, growth-stable") {
    val df = (1L to 2000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = Mixing.splitByHash(df, "doc_id", "s1",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 2000)                      // total
    assert(out("train") > 1500 && out("val") > 120 && out("test") > 120)
    // membership is a pure function of (id, seed): a smaller corpus
    // assigns the shared ids identically (no doc migrates on growth)
    val small = Mixing.splitByHash(df.filter(col("doc_id") <= 100),
      "doc_id", "s1", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = Mixing.splitByHash(df, "doc_id", "s1",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .filter(col("doc_id") <= 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(small == full)
    // a different seed reshuffles membership
    val other = Mixing.splitByHash(df, "doc_id", "s2",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(full.exists { case (id, s) => other(id) != s })
    intercept[IllegalArgumentException] {
      Mixing.splitByHash(df, "doc_id", "s1", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("stratifiedSample: exactly min(n, |group|) per stratum, rank contiguous") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      Seq((200L, "tiny"), (201L, "tiny"))).toDF("doc_id", "source")
    val out = Mixing.stratifiedSample(df, "doc_id", "source", 10, "s1")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc("big").length == 10)
    assert(bySrc("tiny").length == 2)                 // below-n stratum kept whole
    assert(bySrc("big").map(_._3).sorted.toSeq == (1 to 10))
    // matches the naive single-window reservoir stand-in
    import org.apache.spark.sql.expressions.Window
    val naive = df.withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy(
          md5(concat(col("doc_id").cast("string"), lit("s1"))).asc,
          col("doc_id").asc)))
      .filter(col("r") <= 10)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    assert(out.toSet == naive)
  }

  test("chunkWords: stride grid, tail chunk, short/empty docs, overlap coverage") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 words: starts 0,8,16
      (2L, "a b c"),                                  // 3 words < window: 1 chunk
      (3L, ""),                                       // split("") = [""]: 1 chunk
      (4L, (1 to 8).map(i => s"x$i").mkString(" ")),  // len == stride: start 0 only
      (5L, (1 to 9).map(i => s"x$i").mkString(" ")))  // len = stride+1: starts 0,8
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkWords(docs, "doc_id", "text", 12, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out((1L, 0)) == ((0, 12, (1 to 12).map(i => s"w$i").mkString(" "))))
    assert(out((1L, 1))._1 == 8 && out((1L, 1))._2 == 12)
    assert(out((1L, 2)) == ((16, 4, (17 to 20).map(i => s"w$i").mkString(" "))))
    assert(out((2L, 0)) == ((0, 3, "a b c")))
    assert(out((3L, 0))._2 == 1 && out((3L, 0))._3 == "")
    assert(!out.contains((4L, 1)) && out((4L, 0))._2 == 8)
    assert(out((5L, 1)) == ((8, 1, "x9")))
    // every token covered: union of [start, start+n_tok) tiles each doc
    val cov1 = out.collect { case ((1L, _), (s, n, _)) => (s, s + n) }
    assert(cov1.flatMap(r => r._1 until r._2).toSet == (0 until 20).toSet)
  }

  test("chunkWords is explode-only: zero exchanges") {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    val phys = TextAnalysis.chunkWords(df, "doc_id", "text", 12, 8)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"chunkWords shuffles:\n$phys")
  }

  test("salted topKPerGroup ≡ single-window top-k (ties, sparse salts, k > matches)") {
    import org.apache.spark.sql.expressions.Window
    // 500 candidates over 3 queries with heavy score ties (score = id%7)
    // so the doc_id tie-break crosses salt-cell boundaries
    val scored = (1L to 500L).flatMap(id => Seq(
      (1, id, (id % 7).toDouble, 1L),
      (2, id * 3, (id % 5).toDouble, 2L))) ++ Seq((3, 42L, 9.9, 1L))
    val df = scored.toDF("query_id", "doc_id", "score", "n_terms_hit")
    val naive = df.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rank") <= 10)
      .select("query_id", "doc_id", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val salted = Retrieval.topKPerGroup(df, 10)
      .select("query_id", "doc_id", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted == naive)
    // query 3 has ONE match < k: still emitted, rank 1
    assert(salted.contains((3, 42L, 1)))
  }

  test("bm25TopK plan: corpus joins only broadcast frames, tf is checkpointed") {
    val docs = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries = Seq((1, "apple")), k = 1)
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("SortMergeJoin"), s"bm25 shuffles a join:\n$phys")
    // the scoring chain reads the materialized tf checkpoint, not the scan
    assert(phys.contains("Scan ExistingRDD") || phys.contains("LogicalRDD")
      || phys.contains("ExistingRDD"), s"tf not checkpointed:\n$phys")
  }

  test("tfidfTopTerms: rare terms outrank common ones; floored-score ties break on term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha common common"),
      (2L, "beta common"),
      (3L, "gamma delta common")).toDF("doc_id", "text")
    val out = Retrieval.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 1: alpha (tf 3, df 1) far above common (tf 2, df 3)
    assert(out.take(2).toSeq == Seq((1L, 1, "alpha"), (1L, 2, "common")))
    // doc 3: gamma and delta have IDENTICAL (tf, df) → identical floored
    // score → term ASC breaks the tie deterministically
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 1, "delta"), (3L, 2, "gamma")))
    // k=2 < the 3 distinct terms of doc 3 — the boundary dropped 'common'
    assert(!out.exists(t => t._1 == 3L && t._3 == "common"))
  }
}
