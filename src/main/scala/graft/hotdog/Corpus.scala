package graft.hotdog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.hotdog.exprs.stringToCodepoints

/** Deterministic, seeded, fully-distributed corpus synthesis — no driver
  * loops, no rand(): every row derives from `id` via xxhash64, so the same
  * (n, seed) always produces the same table at any parallelism.
  *
  * Line mix drawn from the reference's own fixtures (SURVEY §5, FIXTURES.md):
  * RFC5424 w/ structured data (src/parse.rs:84), RFC5424+JSON w/ meta.topic
  * (tsung.xml:21, scripts/generate-stdout.rb:18), RFC3164 (src/parse.rs:99),
  * msg payloads from example.log, and unparseable garbage (src/parse.rs:74).
  * ~50% of rows share one hot `source` (skew-handling target).
  */
object Corpus {

  private def h(seed: Long, salt: String): Column =
    abs(xxhash64(col("id"), lit(seed), lit(salt)))

  /** sequences(doc_id, tokens, n_tok, source) — BASELINE.json input_hint. */
  def sequences(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val cat = h(seed, "cat") % 100
    val topicN = h(seed, "topic") % 5
    val hostN = h(seed, "host") % 50
    val appN = h(seed, "app") % 20
    val kN = h(seed, "k") % 1000
    val nameN = h(seed, "name") % 8
    val pri = h(seed, "pri") % 192

    // varied RFC3339 timestamp (2024, second granularity + fixed micros)
    val ts5424 = concat(
      date_format(timestamp_seconds(lit(1704067200L) + h(seed, "ts") % 31536000L),
        "yyyy-MM-dd'T'HH:mm:ss"),
      lit("."), lpad((h(seed, "us") % 1000000L).cast("string"), 6, "0"),
      lit("+00:00"))
    val ts3164 = date_format(
      timestamp_seconds(lit(1704067200L) + h(seed, "ts") % 31536000L),
      "MMM d HH:mm:ss")

    val host = concat(lit("host-"), hostN.cast("string"))
    val app = concat(lit("app-"), appN.cast("string"))
    val name = element_at(
      typedLit(Seq("there", "world", "hotdog", "spark", "tyler", "ferris", "scala", "kafka")),
      (nameN + 1).cast("int"))

    // message payloads (the msg part of a syslog line)
    val helloMsg = concat(lit("hello "), name)
    val jsonMsg = concat(
      lit("{\"k\":"), kN.cast("string"),
      lit(",\"meta\":{\"topic\":\"topic-"), topicN.cast("string"),
      lit("\"},\"v\":\"x"), (h(seed, "v") % 100).cast("string"), lit("\"}"))
    val jsonNoTopicMsg = concat(
      lit("{\"k\":"), kN.cast("string"), lit(",\"tags\":[\"a\",\"a\",\"b\"]}"))
    val plainMsg = concat(
      lit("This is a somewhat longer line of logs "), kN.cast("string"))

    val head5424 = concat(lit("<"), pri.cast("string"), lit(">1 "), ts5424,
      lit(" "), host, lit(" "), app, lit(" - - "))
    val sd = lit("[timeQuality tzKnown=\"1\" isSynced=\"1\" syncAccuracy=\"505061\"]")

    val line = when(cat < 20, concat(head5424, lit("- "), helloMsg))
      .when(cat < 45, concat(head5424, lit("- "), jsonMsg))
      .when(cat < 55, concat(head5424, sd, lit(" "), plainMsg))
      .when(cat < 65, concat(head5424, lit("- "), jsonNoTopicMsg))
      .when(cat < 80, concat(lit("<"), pri.cast("string"), lit(">"), ts3164,
        lit(" "), host, lit(" "), app, lit(": "), plainMsg))
      .when(cat < 96, concat(head5424, lit("- "), plainMsg))
      .otherwise(concat(lit("blah "), kN.cast("string"))) // unparseable

    // skew: ~half of all rows land on one hot source
    val source = when(h(seed, "srcskew") % 2 === 0, lit("src-hot"))
      .otherwise(concat(lit("src-"), (h(seed, "src") % 1000).cast("string")))

    spark.range(n)
      .select(
        concat(lit("doc-"), lpad(col("id").cast("string"), 12, "0")).as("doc_id"),
        stringToCodepoints(line).as("tokens"),
        source.as("source"))
      .withColumn("n_tok", size(col("tokens")))
      .select("doc_id", "tokens", "n_tok", "source")
  }

  /** Broadcast-enrich dimension (A9 / FIXTURES.md §4):
    * source_dim(source, default_topic, team). */
  def sourceDim(spark: SparkSession, seed: Long = 42L): DataFrame = {
    val teams = typedLit(Seq("infra", "apps", "data", "sec"))
    spark.range(1001)
      .select(
        when(col("id") === 1000L, lit("src-hot"))
          .otherwise(concat(lit("src-"), col("id").cast("string"))).as("source"),
        concat(lit("team-topic-"), (abs(xxhash64(col("id"), lit(seed))) % 4).cast("string"))
          .as("default_topic"),
        element_at(teams, ((abs(xxhash64(col("id"), lit(seed), lit("t"))) % 4) + 1).cast("int"))
          .as("team"))
  }
}
