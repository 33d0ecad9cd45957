package graft.hotdog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage throughput profile of the pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val corpus = args.lift(0).getOrElse("/tmp/graft-bench-corpus-1000000")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Configs.flagship

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-28s $s%8.2f s  ${n / s}%12.0f rows/s")
    }

    val seqs = spark.read.parquet(corpus)
    time("scan only")(seqs.count())
    time("scan only (again)")(seqs.count())
    time("decode")(Router.decoded(seqs).select(sum(length(col("line")))).count())
    time("decode+force")(
      Router.decoded(seqs).agg(sum(length(col("line")))).collect().length.toLong * seqs.count())
    time("parse")(
      Router.parsed(Router.decoded(seqs))
        .agg(sum(when(col("p").isNotNull, 1L).otherwise(0L))).collect()(0).getLong(0))
    time("parse+fields")(
      Router.parsed(Router.decoded(seqs))
        .agg(sum(length(col("p.msg")))).collect()(0).getLong(0))
    val routed = Router.route(seqs, cfg)
    time("route (agg count by topic)")(
      routed.groupBy("topic").count().collect().map(_.getLong(1)).sum)
    time("route+output len")(
      routed.agg(sum(length(col("output")))).collect()(0).getLong(0))
    time("route+write")( {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/profile-out"))
      Pipeline.writeFanOut(routed, "/tmp/profile-out", 0L, saltBuckets = 8)
      spark.read.parquet("/tmp/profile-out").count()
    })
    routed.explain("formatted")
    spark.stop()
  }
}
