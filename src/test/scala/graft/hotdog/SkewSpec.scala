package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The 100 TB skew story, demonstrated: the flagship enrich is a broadcast
  * join (skew-immune), but when a dimension is too big to broadcast the
  * fallback is a shuffled join over `source` — exactly the hot-key column
  * (the corpus has ~50% hot-source skew). This spec proves AQE's skew-join
  * splitting actually engages on that shape, so one hot source cannot pin
  * a single reducer at scale. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("AQE splits the hot-source partition in a shuffled enrich join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceApply" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // too big to broadcast
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot-source routed rows (Corpus gives ~50% of rows one source) with
      // a payload column so the hot partition crosses the skew threshold
      val routed = Pipeline.emittedOnly(
        Router.route(Corpus.sequences(spark, 60000, seed = 7L), Configs.flagship))
        .select(col("source"), col("topic"), col("output"))
      val dim = Corpus.sourceDim(spark)
      val joined = routed.join(dim, "source") // NO broadcast hint
      // execute THIS DataFrame's own adaptive plan (df.count() would spin
      // up a separate QueryExecution and leave this one un-executed)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      assert(n > 0)
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
