package graft.hotdog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** E1 daemon-path equivalent as a spark-submit main: synthesize (or read)
  * the sequences table, route it with a hotdog-YAML config, fan out to
  * per-topic parquet sinks, write the audit table, print the /stats JSON.
  *
  * Usage: Main [--config path.yml] [--rows N] [--input dir] [--out dir]
  *             [--batch id]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val cfg = opts.get("config") match {
      case Some(p) => config.load(p)
      case None    => Configs.flagship
    }
    val rows = opts.getOrElse("rows", "100000").toLong
    val out = opts.getOrElse("out", "/tmp/graft-hotdog-out")
    val batchId = opts.getOrElse("batch", "0").toLong

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-hotdog")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sequences = opts.get("input") match {
      case Some(dir) => spark.read.parquet(dir)
      case None      => Corpus.sequences(spark, rows)
    }
    val dim = Corpus.sourceDim(spark)
    val result = Pipeline.run(sequences, cfg, dim = Some(dim))

    val sentMicros =
      Pipeline.writeBatch(result.routed, s"$out/routed", s"$out/audit", batchId)

    println(Stats.formatJson(Stats.withSentTimer(result.stats, sentMicros)))
    println(s"[graft-hotdog] batch $batchId written to $out/routed")
    spark.stop()
  }
}
