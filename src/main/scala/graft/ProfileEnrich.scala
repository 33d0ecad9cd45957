package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile of hd_enrich (dev tool). */
object ProfileEnrich {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { t =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[enrich-profile] $name%-36s trial$t ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
      }
    time("events scan")(Queries.table(spark, dir, "events").count())
    time("eventSequences count")(Queries.eventSequences(spark, dir).count())
    time("eventSequences force tokens")(Queries.eventSequences(spark, dir)
      .select(sum(size(col("tokens")))).collect()(0).getLong(0))
    val seqs = Queries.eventSequences(spark, dir)
      .select("doc_id", "tokens", "n_tok", "source")
    time("route->groupBy(topic)")(graft.hotdog.Router
      .route(seqs, graft.hotdog.Configs.flagship, lit(Queries.FixedIso))
      .groupBy("topic").count().count())
    time("emittedOnly->groupBy(topic,nkey)")(graft.hotdog.Pipeline.emittedOnly(
      graft.hotdog.Router.route(seqs, graft.hotdog.Configs.flagship, lit(Queries.FixedIso)))
      .withColumn("nkey", col("doc_id").cast("long") % 25)
      .groupBy("topic", "nkey").count().count())
    time("hd_enrich full")(Queries.hdEnrich(spark, dir).count())
    Queries.hdEnrich(spark, dir).explain("formatted")
    spark.stop()
  }
}
