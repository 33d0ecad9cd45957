package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler for the pipe_clean composition: which stage of
  * CorpusClean.cleanVerdict carries the wall time at a given sf dir
  * (round-5 regression hunt: the exact-stage rework moved the driver
  * number 4.6 → 7.7 s; this pins the stage before fixing it). */
object ProfileClean {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-clean")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Queries.table(spark, dir, "documents")
      .select("doc_id", "text")
    val doubled = docs.union(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val t = col("text")
      val staged = doubled.select(col("doc_id").as("id"), t.as("text"),
        (TextAnalysis.tokenCountWs(t) >= 20).as("q_ok"),
        (TextAnalysis.langId(t) === "en").as("l_ok"))
      time("staged count")(staged.count())
      val survivors = staged.filter(col("q_ok") && col("l_ok"))
      val keepers = survivors
        .groupBy(TextAnalysis.fingerprint(col("text")).as("_fp"))
        .agg(min(col("id")).as("_keep_id"))
        .select(col("_keep_id"))
      time("keepers agg")(keepers.count())
      val reps = survivors.select("id", "text")
        .join(keepers, col("id") === col("_keep_id"), "left_semi")
      time("reps semi-join")(reps.count())
      val pairs = Dedup.minhashNearDups(reps, "id", "text", 60, 64, 16, 3)
      time("minhash pairs")(pairs.count())
      val verdict = Components.dedupVerdict(pairs, "id_a", "id_b")
      time("components verdict")(verdict.count())
      time("FULL cleanVerdict")(
        CorpusClean.cleanVerdict(doubled, "doc_id", "text").count())
      time("FULL again")(
        CorpusClean.cleanVerdict(doubled, "doc_id", "text").count())
      // variant A: keepers checkpointed (narrow, 2 consumers)
      time("variant A: ckpt keepers") {
        val k = keepers.localCheckpoint(true)
        val r = survivors.select("id", "text")
          .join(k, col("id") === col("_keep_id"), "left_semi")
        val p = Dedup.minhashNearDups(r, "id", "text", 60, 64, 16, 3)
        val v = Components.dedupVerdict(p, "id_a", "id_b")
          .select(col("id"), col("keep").as("_nd_keep"))
        staged.select("id", "q_ok", "l_ok")
          .join(k.select(col("_keep_id").as("id"),
            lit(true).as("_is_rep")), Seq("id"), "left")
          .join(v, Seq("id"), "left").count()
      }
      // variant B: keepers + reps checkpointed
      time("variant B: ckpt keepers+reps") {
        val k = keepers.localCheckpoint(true)
        val r = survivors.select("id", "text")
          .join(k, col("id") === col("_keep_id"), "left_semi")
          .localCheckpoint(true)
        val p = Dedup.minhashNearDups(r, "id", "text", 60, 64, 16, 3)
        val v = Components.dedupVerdict(p, "id_a", "id_b")
          .select(col("id"), col("keep").as("_nd_keep"))
        staged.select("id", "q_ok", "l_ok")
          .join(k.select(col("_keep_id").as("id"),
            lit(true).as("_is_rep")), Seq("id"), "left")
          .join(v, Seq("id"), "left").count()
      }
    }
    spark.stop()
  }
}
