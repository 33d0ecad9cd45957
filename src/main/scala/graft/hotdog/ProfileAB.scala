package graft.hotdog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileAB {
  def main(args: Array[String]): Unit = {
    val corpus = args.lift(0).getOrElse("/tmp/graft-bench-corpus-8000000")
    val cores = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Configs.flagship
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ab] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def cleanWrite(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      df.withColumn("batch_id", lit(0L))
        .repartition(col("batch_id"), col("topic"), pmod(xxhash64(col("doc_id")), lit(8)))
        .write.partitionBy("batch_id", "topic").mode("overwrite").parquet(out)
    }
    val routed = Router.route(spark.read.parquet(corpus), cfg)
    val slim = Seq("doc_id", "source", "output", "topic")
    // warmup
    cleanWrite(Pipeline.emittedOnly(Router.route(spark.read.parquet(corpus).limit(50000), cfg)).select(slim.map(col): _*), "/tmp/ab-warm")
    time("write with barrier filter")(
      cleanWrite(Pipeline.emittedOnly(routed).select(slim.map(col): _*), "/tmp/ab-bar"))
    time("write with plain filter")(
      cleanWrite(routed.filter(col("topic").isNotNull).select(slim.map(col): _*), "/tmp/ab-plain"))
    time("write with barrier filter (2)")(
      cleanWrite(Pipeline.emittedOnly(routed).select(slim.map(col): _*), "/tmp/ab-bar2"))
    time("write with plain filter (2)")(
      cleanWrite(routed.filter(col("topic").isNotNull).select(slim.map(col): _*), "/tmp/ab-plain2"))
    spark.stop()
  }
}
