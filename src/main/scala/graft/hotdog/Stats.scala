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
    * for the batch rebuild (no lossy queue, no producer): SURVEY §2.5.
    * error.topic_parse_failed graduated to a REAL counter in round 4 (a
    * forward topic whose handlebars render fails counts per row —
    * src/connection.rs:204-206). */
  val ZeroSlots: Seq[String] = Seq(
    "connections",
    "error.full_internal_queue",
    "error.internal_push_failed",
    "kafka.producer.sent")

  /** (metric string, value long) from a Router.route output frame.
    *
    * ONE distributed job: groupBy(topic) with map-side partial agg, then the
    * ≤(#topics+1)-row result is collected and reshaped driver-side — the
    * exact analog of the reference's in-memory counter map (src/status.rs),
    * and it avoids caching the aggregate just to scan it twice. */
  def statsOf(routed: DataFrame): DataFrame = {
    val spark = routed.sparkSession
    import spark.implicits._

    val per = perTopicAgg(routed).collect()

    val perTopic = per.toSeq.filter(!_.isNullAt(0))
      .map(r => ("kafka.submitted." + r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val totals = Seq(
      "kafka.submitted" -> per.filter(!_.isNullAt(0)).map(_.getLong(1)).sum,
      "lines" -> per.map(_.getLong(2)).sum,
      "error.log_parse" -> per.map(r => r.getLong(1) - r.getLong(2)).sum,
      "error.merge_of_invalid_json" -> per.map(_.getLong(3)).sum,
      "error.merge_target_not_json" -> per.map(_.getLong(4)).sum,
      "error.topic_parse_failed" -> per.map(_.getLong(5)).sum)
    (perTopic ++ totals ++ ZeroSlots.map(_ -> 0L)).toDF("metric", "value")
  }

  /** The ONE distributed aggregation behind [[statsOf]] (its ≤(#topics+1)-row
    * result is collected and reshaped driver-side). Exposed for plan tests. */
  def perTopicAgg(routed: DataFrame): DataFrame =
    routed.groupBy("topic").agg(
      count(lit(1)).as("n"),
      sum(when(col("parse_ok"), 1L).otherwise(0L)).as("parsed"),
      coalesce(sum(col("err_merge_invalid_json")), lit(0L)).as("mi"),
      coalesce(sum(col("err_merge_target_not_json")), lit(0L)).as("mt"),
      coalesce(sum(col("err_topic_parse_failed")), lit(0L)).as("tpf"))

  /** Kafka producer-error string → statsd-suitable metric token, porting
    * the reference's `metric_name_for` (src/kafka.rs:226-231, tests
    * src/kafka.rs:256-273): lowercase the error's Display form, take the
    * first space-separated token. */
  def kafkaErrorMetricName(errString: String): String =
    errString.toLowerCase.split(' ').headOption.getOrElse("unknown")

  /** Full metric key for a producer error, mirroring
    * `Stats::KafkaMsgErrored{errcode}` → "kafka.producer.error.<errcode>"
    * (src/status.rs:141-146,196). Used when a real Kafka sink is swapped in
    * via [[Pipeline.kafkaFrame]]. */
  def kafkaErrorMetric(errString: String): String =
    "kafka.producer.error." + kafkaErrorMetricName(errString)

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
