package graft.hotdog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Running-aggregate statistics mirroring hotdog's /stats surface
  * (reference src/status.rs:184-213 for metric names, src/status.rs:170-181
  * for the snapshot shape). ONE shuffle over the routed data (groupBy topic
  * with map-side partial aggregation); all reshaping happens on the tiny
  * (≤ #topics) aggregate.
  */
object Stats {

  /** Metric slots that exist in hotdog's /stats but are structurally zero
    * for the batch rebuild (no lossy queue, no producer): SURVEY §2.5. */
  val ZeroSlots: Seq[String] = Seq(
    "connections",
    "error.full_internal_queue",
    "error.internal_push_failed",
    "error.topic_parse_failed",
    "kafka.producer.sent")

  /** (metric string, value long) from a Router.route output frame. */
  def statsOf(routed: DataFrame): DataFrame = {
    val spark = routed.sparkSession
    import spark.implicits._

    val per = routed.groupBy("topic").agg(
      count(lit(1)).as("n"),
      sum(when(col("parse_ok"), 1L).otherwise(0L)).as("parsed"),
      sum(col("err_merge_invalid_json")).as("mi"),
      sum(col("err_merge_target_not_json")).as("mt"))
    per.cache()

    val perTopic = per.filter(col("topic").isNotNull)
      .select(concat(lit("kafka.submitted."), col("topic")).as("metric"),
        col("n").as("value"))
    val totals = per.agg(
      sum(when(col("topic").isNotNull, col("n")).otherwise(0L)).as("kafka.submitted"),
      sum(col("parsed")).as("lines"),
      sum(col("n") - col("parsed")).as("error.log_parse"),
      sum(col("mi")).as("error.merge_of_invalid_json"),
      sum(col("mt")).as("error.merge_target_not_json"))
    val totalRows = totals.columns.toSeq.map { c =>
      totals.select(lit(c).as("metric"), coalesce(col(s"`$c`"), lit(0L)).as("value"))
    }.reduce(_ union _)
    val zeros = ZeroSlots.map(m => (m, 0L)).toDF("metric", "value")

    perTopic.union(totalRows).union(zeros)
  }

  /** Set the kafka.producer.sent timer slot (µs of the last sink write —
    * the reference keeps the last value, src/status.rs:155-164). */
  def withSentTimer(statsDf: DataFrame, micros: Long): DataFrame =
    statsDf.withColumn("value",
      when(col("metric") === "kafka.producer.sent", lit(micros))
        .otherwise(col("value")))

  /** The `GET /stats` JSON snapshot (src/status.rs:22-25,170-181), with
    * the canonical greeting. Driver-side collect of the tiny stats frame. */
  def statsJson(routed: DataFrame): String = formatJson(statsOf(routed))

  /** Format an already-computed (metric, value) frame as the snapshot. */
  def formatJson(statsDf: DataFrame): String = {
    val kv = statsDf.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val stats = kv.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"message":"You should smile more","stats":$stats}"""
  }
}
