package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.hotdog.SparkSpec

/** Incremental-dedup (sharded bloom index + broadcast verification) and
  * NB-classifier behavior. The bloom contract under test: NO false
  * negatives ever (correctness), false positives only cost verification
  * (the verdict stays exact even with a deliberately saturated bloom). */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(0xb100f17eL)

  test("kernel: no false negatives over 5000 random keys") {
    val bits = new Array[Long](256) // 16384 bits
    val keys = Array.fill(5000)(rnd.nextLong())
    keys.foreach(BloomKernel.setBits(bits, _, 8))
    val wrapped = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bits)
    assert(keys.forall(BloomKernel.mightContain(wrapped, _, 8)))
  }

  test("kernel: fpp is small when sized at ~26 bits/key") {
    val bits = new Array[Long](2048) // 131072 bits, 5000 keys -> fpp ~ 1e-4
    val inserted = Array.fill(5000)(rnd.nextLong()).toSet
    inserted.foreach(BloomKernel.setBits(bits, _, 8))
    val wrapped = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bits)
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(inserted).take(20000).toArray
    val fp = probes.count(BloomKernel.mightContain(wrapped, _, 8))
    assert(fp <= 40, s"false positives $fp of 20000 — fpp far above theory")
  }

  private def naiveVerdict(nb: org.apache.spark.sql.DataFrame,
      prior: org.apache.spark.sql.DataFrame) = {
    val pk = prior.select(TextAnalysis.fingerprint(col("text")).as("k"))
      .filter(col("k").isNotNull).distinct()
    nb.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("k"))
      .join(pk.withColumn("hit", lit(1)), Seq("k"), "left")
      .select(col("doc_id"),
        when(col("hit").isNotNull, "drop_prior").otherwise("kept").as("status"))
  }

  private val newBatch = ((0L until 200L).map(i => (i, s"doc number ${i % 120} body")) :+
    (900L, null.asInstanceOf[String])).toDF("doc_id", "text")
  private val prior = (0L until 300L)
    .map(i => (5000L + i, s"doc number ${i * 3} body")).toDF("doc_id", "text")

  test("incremental verdict == naive set membership (incl. null text kept)") {
    val got = Bloom.incrementalDedupVerdict(newBatch, prior, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = naiveVerdict(newBatch, prior)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._2 == "kept") && got.exists(_._2 == "drop_prior"))
    assert(got.find(_._1 == 900L).get._2 == "kept")
  }

  test("a deliberately saturated bloom (64 bits/shard) stays exact") {
    // every probe is (near-)positive -> verification does all the work;
    // the verdict must not change
    val got = Bloom.incrementalDedupVerdict(newBatch, prior, "doc_id", "text",
        shards = 2, wordsPerShard = 1, numHashes = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = naiveVerdict(newBatch, prior)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("empty prior keeps everything; empty new batch yields no rows") {
    val emptyPrior = prior.filter(lit(false))
    val all = Bloom.incrementalDedupVerdict(newBatch, emptyPrior, "doc_id", "text")
      .collect()
    assert(all.length == newBatch.count() && all.forall(_.getString(1) == "kept"))
    assert(Bloom.incrementalDedupVerdict(newBatch.filter(lit(false)), prior,
      "doc_id", "text").count() == 0)
  }

  test("plan: no shuffle join anywhere — index and candidate sets broadcast") {
    val phys = Bloom.incrementalDedupVerdict(newBatch, prior, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys)
    assert(!phys.contains("SortMergeJoin") && !phys.contains("ShuffledHashJoin"),
      phys)
  }

  test("nb classifier: hand-checked log-odds on a tiny labeled set") {
    // pos: {"good text", "good stuff"}; neg: {"bad text"}
    // Np=4, Nn=2, V=4 (good, text, stuff, bad), dp=2, dn=1
    val ref = Seq(("good text", true), ("good stuff", true), ("bad text", false))
      .toDF("text", "pos")
    val docs = Seq((1L, "good good"), (2L, "bad"), (3L, "unseen words here"))
      .toDF("doc_id", "text")
    val out = LangModel.nbClassifierScores(docs, "doc_id", "text",
        ref, "text", col("pos"))
      .orderBy("doc_id").collect()
    def lo(cp: Long, cn: Long) =
      math.log(cp + 1.0) - math.log(4 + 4.0) - math.log(cn + 1.0) + math.log(2 + 4.0)
    val prior = math.log(2.0) - math.log(1.0)
    val expected = Seq(
      (1L, 2L, prior + 2 * lo(2, 0)),         // "good" cp=2 cn=0
      (2L, 1L, prior + lo(0, 1)),             // "bad" cp=0 cn=1
      (3L, 3L, prior + 3 * lo(0, 0)))         // unseen -> smoothed floor
    for (((id, nw, sc), r) <- expected.zip(out)) {
      assert(r.getLong(0) == id && r.getLong(1) == nw)
      assert(math.abs(r.getDouble(2) - sc) < 1e-12, s"doc $id")
      assert(r.getBoolean(3) == (sc > 0))
    }
  }

  test("nb classifier scoring plan: model probes are broadcast joins") {
    val ref = (0L until 50L).map(i => (s"word$i common tokens", i % 2 == 0))
      .toDF("text", "pos")
    val docs = (0L until 50L).map(i => (i, s"word$i common body")).toDF("doc_id", "text")
    val phys = LangModel.nbClassifierScores(docs, "doc_id", "text",
        ref, "text", col("pos"))
      .queryExecution.executedPlan.toString
    assert(!phys.contains("SortMergeJoin"), phys)
  }
}
