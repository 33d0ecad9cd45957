package graft.hotdog

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.hotdog.config.HotdogConfig

/** End-to-end wiring: scan(sequences) → decode → parse → route →
  * [broadcast enrich] → fan-out sink + stats/audit (SURVEY §3 E1).
  *
  * Scale notes (the 100 TB design, tested at local scale):
  *  - decode→parse→route is ONE narrow whole-stage-codegen stage: no
  *    shuffle at all before the sink.
  *  - enrich is a broadcast hash join (dim is small by construction);
  *    no shuffle, skew-immune.
  *  - the fan-out write repartitions by (topic, salt) so one hot topic
  *    (or hot source) cannot pin a single writer task — salting spreads
  *    each topic over up to `writeSaltBuckets` files/tasks while keeping
  *    dynamic-partition writes to one topic-dir per task.
  *  - idempotent resume: dynamic partition overwrite per topic + an audit
  *    table recording per-partition lineage; a re-run of the same batch_id
  *    overwrites, never duplicates.
  */
object Pipeline {

  /** `stats` is LAZY: statsOf runs a (small) job at evaluation time, and a
    * caller consuming only `routed` must not pay for — or trigger — a
    * second pass over the data at construction. */
  final class Result(val routed: DataFrame, statsThunk: => DataFrame) {
    lazy val stats: DataFrame = statsThunk
  }

  /** Routed rows that actually emitted, filtered WITHOUT letting the
    * optimizer push the predicate beneath the router projection (see
    * NoPushdown — pushing would re-inline the whole cascade). */
  def emittedOnly(routed: DataFrame): DataFrame =
    routed.filter(exprs.noPushdown(col("topic").isNotNull))

  /** Logical pipeline without sinks. */
  def run(sequences: DataFrame, cfg: HotdogConfig,
      dim: Option[DataFrame] = None,
      clock: Column = Router.DefaultClock): Result = {
    val routed0 = Router.route(sequences, cfg, clock)
    val routed = dim match {
      case Some(d) => routed0.join(broadcast(d), Seq("source"), "left")
      case None    => routed0
    }
    new Result(routed, Stats.statsOf(routed0))
  }

  /** Fan-out sink (S5): routed rows partitioned by topic, parquet.
    * `saltBuckets` bounds the number of write tasks per topic so a hot
    * topic parallelizes; AQE coalesces small ones. Returns per-topic counts
    * as observed by the write (for count-parity checks). */
  /** @return wall time of the sink write in microseconds (feeds the
    *         kafka.producer.sent timer slot — reference src/kafka.rs:176-183
    *         keeps the LAST send duration; we keep the last batch's). */
  def writeFanOut(routed: DataFrame, outDir: String, batchId: Long,
      saltBuckets: Int = 0,
      columns: Seq[String] = Seq("doc_id", "source", "output")): Long = {
    // saltBuckets <= 0 ⇒ track spark.sql.shuffle.partitions: the write
    // stage's task count IS the repartition's partition count, and a salt
    // space smaller than it leaves reducers empty while a fixed 32 pins
    // the stage to ONE wave at 32 cores (straggler-bound, measured
    // util 0.53 in the streaming bench; (topic, salt) cells are atomic,
    // so more+finer cells = the balance)
    val salts =
      if (saltBuckets > 0) saltBuckets
      else routed.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Kafka-parity payload is (topic, output); doc_id/source are lineage.
    // `tokens` is intentionally NOT shipped by default — the equality
    // invariant is checked on the routed frame (cheap, pre-shuffle), and
    // shipping the token arrays through the sink shuffle would triple the
    // written bytes for no consumer benefit. Pass columns=... to override.
    val emitted = emittedOnly(routed)
      .select((columns :+ "topic").distinct.map(col): _*)
      .withColumn("batch_id", lit(batchId))
    val spark = routed.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val t0 = System.nanoTime()
    try {
      emitted
        .repartition(col("batch_id"), col("topic"),
          pmod(xxhash64(col("doc_id")), lit(salts)))
        .write
        .partitionBy("batch_id", "topic")
        .mode(SaveMode.Overwrite)
        .parquet(outDir)
      (System.nanoTime() - t0) / 1000L
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Typed-API variant: routed rows as Dataset[RoutedRow] (only emitted
    * rows; the untyped frame keeps the error-flag columns for stats). */
  def routeTyped(ds: org.apache.spark.sql.Dataset[model.SyslogSequence],
      cfg: HotdogConfig,
      clock: Column = Router.DefaultClock): org.apache.spark.sql.Dataset[model.RoutedRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    emittedOnly(Router.route(ds.toDF(), cfg, clock))
      .select(col("doc_id"), col("tokens"), col("source"), col("topic"), col("output"))
      .as[model.RoutedRow]
  }

  /** Kafka-sink drop-in: the reference produces KafkaMessage(topic, msg)
    * (src/kafka.rs:23-26). With a kafka connector jar on the classpath this
    * frame writes directly:
    * `kafkaFrame(routed).write.format("kafka").option("kafka.bootstrap.servers", ...)`.
    * No connector ships in this sandbox, so the fan-out parquet sink above
    * is the default; this keeps the migration one line. */
  def kafkaFrame(routed: DataFrame): DataFrame =
    emittedOnly(routed).select(col("topic"), col("output").as("value"))

  /** Fan-out sink + audit table in ONE evaluation of the cascade: the two
    * writes each consume the routed frame, and letting them both recompute
    * decode→parse→route doubles the pipeline's CPU (measured ~1.7× wall on
    * the streaming path). Persist a SLIM projection instead — no token
    * arrays, no line; just sink payload + audit counters + input_file
    * lineage (captured here, pre-cache, because input_file_name() is ""
    * once rows come from a cached RDD) — and feed both writes from it.
    * DISK_ONLY, deliberately: the slim cache is written once and streamed
    * exactly twice, sequentially — production-sized micro-batches would
    * blow the storage-memory pool anyway, and holding gigabytes of
    * columnar cache IN HEAP amplifies GC against the concurrently-running
    * shuffle (measured as 30-50% utilization valleys and ±30% trial noise
    * at 24M-row batches). Executor-local disk (NVMe on a real cluster) is
    * the right home for a pass-through intermediate of this shape.
    *
    * The cache is ON by default (spark.graft.writeBatch.cache=false to
    * opt out): the instrumented 192M-row streaming bench showed the
    * audit pass otherwise re-running the full cascade per batch —
    * 171 CPU-seconds per 48M-row batch at 32 cores, ~60% of the route
    * stage itself — exactly the double evaluation this method exists to
    * prevent.
    * @return sink write micros (the kafka.producer.sent timer slot). */
  def writeBatch(routed: DataFrame, outDir: String, auditDir: String,
      batchId: Long, saltBuckets: Int = 0): Long = {
    if (routed.sparkSession.conf.get("spark.graft.writeBatch.cache", "true").toBoolean) {
      val slim = routed.select(col("doc_id"), col("source"), col("topic"),
          col("output"), col("parse_ok"), col("err_merge_invalid_json"),
          col("err_merge_target_not_json"),
          input_file_name().as("input_file"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try {
        val micros = writeFanOut(slim, outDir, batchId, saltBuckets)
        writeAudit(slim, auditDir, batchId)
        micros
      } finally {
        slim.unpersist()
        ()
      }
    } else {
      val micros = writeFanOut(routed, outDir, batchId, saltBuckets)
      writeAudit(routed, auditDir, batchId)
      micros
    }
  }

  /** Per-partition lineage + metrics audit rows (north_rule: resumable
    * with per-partition lineage). One row per (batch, topic, input_file):
    * which INPUT FILES contributed how many rows to which sink partition,
    * plus the error counters — file-level provenance for replay/debugging.
    * input_file_name() is captured on the pre-shuffle routed frame (narrow),
    * and is "" for non-file sources (synthesized frames). Written
    * idempotently per batch_id. */
  def writeAudit(routed: DataFrame, auditDir: String, batchId: Long): Unit = {
    // input_file may already be captured (writeBatch caches a slim
    // projection; input_file_name() evaluates to "" on cached rows)
    val withFile =
      if (routed.columns.contains("input_file")) routed
      else routed.withColumn("input_file", input_file_name())
    val audit = withFile
      .groupBy(col("topic"), col("input_file")).agg(
        count(lit(1)).as("rows"),
        sum(when(col("parse_ok"), 1L).otherwise(0L)).as("parsed_rows"),
        sum(col("err_merge_invalid_json")).as("merge_invalid_json"),
        sum(col("err_merge_target_not_json")).as("merge_target_not_json"))
      .withColumn("batch_id", lit(batchId))
      .withColumn("completed_at", current_timestamp())
    val spark = routed.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try audit.repartition(1).write.partitionBy("batch_id")
      .mode(SaveMode.Overwrite).parquet(auditDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Which batch_ids already completed (resume-from-checkpoint: a batch is
    * skipped iff its audit rows exist — audit is written AFTER the fan-out,
    * so a crash between the two re-runs the batch idempotently). */
  def completedBatches(spark: SparkSession, auditDir: String): Set[Long] =
    // partition-column type inference yields IntegerType for small ids —
    // cast explicitly; only swallow "path does not exist"
    try spark.read.parquet(auditDir)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => Set.empty
    }

  /** Full batch job with resume: process only batches not yet in the audit
    * table. `batches` maps batch_id → its sequences slice. */
  def runResumable(spark: SparkSession, cfg: HotdogConfig,
      batches: Map[Long, DataFrame], outDir: String, auditDir: String,
      dim: Option[DataFrame] = None): Seq[Long] = {
    val done = completedBatches(spark, auditDir)
    val todo = batches.keys.toSeq.sorted.filterNot(done)
    todo.foreach { b =>
      val r = run(batches(b), cfg, dim)
      writeBatch(r.routed, outDir, auditDir, b)
    }
    todo
  }
}
