package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler for the session-7 operators (dd_incremental /
  * txt_classify / pipe_dsir): stage-level wall times at a given sf dir.
  */
object ProfileNew {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-new")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Queries.table(spark, dir, "documents")
    println(s"docs: ${docs.count()}")

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("md5 keys only") {
        docs.select(TextAnalysis.fingerprint(col("text")).as("_k")).count()
      }
      val prior = docs.filter(col("doc_id") % 3 =!= 1)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val idx = time("bloom buildIndex (collect)") {
        val i = Bloom.buildIndex(
          prior.select(TextAnalysis.fingerprint(col("text")).as("_k")), "_k",
          64, 1 << 10, 8)
        i.count()
        i
      }
      time("dd_incremental full") {
        Bloom.incrementalDedupVerdict(docs, prior, "doc_id", "text").count()
      }
      time("txt_classify full") {
        graft.Queries.txtClassify(spark, dir).count()
      }
      time("pipe_dsir full") {
        graft.Queries.pipeDsir(spark, dir).count()
      }
      time("txt_lm_ppl full (reference shape)") {
        graft.Queries.txtLmPpl(spark, dir).count()
      }
    }
    // dsir internals
    {
      import TextAnalysis.words
      def bigrams(text: org.apache.spark.sql.Column) = {
        val ws = words(text)
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b))
      }
      def bucketOf(g: org.apache.spark.sql.Column) =
        conv(substring(md5(g), 1, 8), 16, 10).cast("long") % 4096
      for (r <- 1 to 2) {
        time(s"dsir: explode bigrams only (r$r)") {
          docs.select(explode(bigrams(col("text"))).as("g")).count()
        }
        time(s"dsir: + bucket (r$r)") {
          docs.select(explode(bigrams(col("text"))).as("g"))
            .select(bucketOf(col("g")).as("b")).count()
        }
        time(s"dsir: bucket counts agg+collect (r$r)") {
          docs.select(explode(bigrams(col("text"))).as("g"))
            .select(bucketOf(col("g")).as("b"))
            .groupBy("b").agg(count(lit(1))).collect().length
        }
      }
    }
    val q = graft.Queries.pipeDsir(spark, "/root/testdata/sf0.1")
    val plan = q.queryExecution.executedPlan.toString
    println("[profile] dsir plan ReusedExchange count: " +
      plan.linesIterator.count(_.contains("ReusedExchange")))
    println("[profile] dsir plan Scan parquet count: " +
      plan.linesIterator.count(_.contains("Scan parquet")))
    spark.stop()
  }
}
