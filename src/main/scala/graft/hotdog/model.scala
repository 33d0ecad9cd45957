package graft.hotdog

import org.apache.spark.sql.types._

/** Core data model for the hotdog-semantics pipeline.
  *
  * Reference abstractions (reiseburo/hotdog, Rust):
  *  - SyslogMessage: src/parse.rs:16-22 — msg + 4 optional string fields.
  *  - KafkaMessage:  src/kafka.rs:23-26 — (topic, msg).
  *
  * Our input table shape is fixed by BASELINE.json input_hint:
  * (doc_id string, tokens array<int>, n_tok int, source string) where
  * `tokens` are the Unicode codepoints of the raw syslog line.
  */
object model {

  /** One pre-tokenized sequence row (the ingested "line"). */
  final case class SyslogSequence(
      doc_id: String,
      tokens: Array[Int],
      n_tok: Int,
      source: String)

  /** Parsed syslog message — mirrors reference src/parse.rs:16-22. */
  final case class Parsed(
      msg: String,
      severity: Option[String],
      facility: Option[String],
      hostname: Option[String],
      appname: Option[String])

  /** A routed record: reference src/kafka.rs:23-26 plus carried lineage
    * columns for the token-array-equality invariant. */
  final case class RoutedRow(
      doc_id: String,
      tokens: Array[Int],
      source: String,
      topic: String,
      output: String)

  val sequencesSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("source", StringType, nullable = false)))

  val parsedSchema: StructType = StructType(Seq(
    StructField("msg", StringType, nullable = false),
    StructField("severity", StringType, nullable = true),
    StructField("facility", StringType, nullable = true),
    StructField("hostname", StringType, nullable = true),
    StructField("appname", StringType, nullable = true)))

  /** Severity keywords 0-7 — pinned by reference src/parse.rs:90-91
    * (pri 13 → severity "notice") and the syslog_rfc5424 crate's
    * SyslogSeverity::as_str. */
  val SeverityNames: IndexedSeq[String] =
    IndexedSeq("emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")

  /** Facility keywords 0-23 — pinned by reference src/parse.rs:90,105-107
    * (pri 13 → "user", pri 190 → "local7"). Names 12-15 follow the
    * syslog_rfc5424 crate (ntp/audit/alert/clockd); the reference's 3164
    * path goes through a different crate (syslog_loose) whose 12-15 names
    * are not pinned by any reference test — we use one table for both. */
  val FacilityNames: IndexedSeq[String] = IndexedSeq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6", "local7")

  /** Version string exposed as the `{{version}}` builtin variable
    * (reference: CARGO_PKG_VERSION at src/connection.rs:121;
    * Cargo.toml version = "0.5.1"). */
  val Version = "0.5.1"
}
