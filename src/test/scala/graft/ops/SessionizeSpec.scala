package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.hotdog.SparkSpec
import java.nio.file.Files

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val US = 1000000L

  /** (user, t_sec, value) → events frame with micros timestamps */
  private def ev(rows: (Long, Long, Double)*) =
    rows.zipWithIndex.map { case ((u, t, v), i) =>
      (i.toLong, u, new java.sql.Timestamp(t * 1000L), v)
    }.toDF("event_id", "user_id", "ts", "value")

  test("gap boundary is STRICT: delta == gap stays in one session") {
    // gaps: 100 (merge), exactly 3600 (merge — not >), 3601 (split)
    val e = ev((1L, 0L, 1.0), (1L, 100L, 2.0), (1L, 3700L, 4.0),
      (1L, 7301L, 8.0))
    val out = Sessionize.sessionStats(e, "user_id", "ts",
      gapSec = 3600L, valueCol = "value")
      .orderBy("session_seq").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 3L)
    assert(out(0).getAs[Long]("value_c") == 700L)
    assert(out(0).getAs[Long]("dur_us") == 3700L * US)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(1).getAs[Long]("t_start_us") == 7301L * US)
  }

  test("single-event users produce singleton sessions; seq is per-user") {
    val e = ev((1L, 0L, 1.0), (2L, 5L, 2.0), (1L, 90000L, 3.0))
    val out = Sessionize.sessionStats(e, "user_id", "ts",
      gapSec = 3600L, valueCol = "value")
      .orderBy("user_id", "session_seq").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events")))
    assert(out.toSeq == Seq((1L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming sessions == batch sessions (closed set), across many micro-batches") {
    val tmp = Files.createTempDirectory("graft-sess").toString
    // 3 users × 40 events, ~17 min apart per user with every 5th gap > 1 h
    // → several multi-event sessions per user; final watermark withholds
    // only sessions ending in the last (lateness + gap) horizon
    val rows = for {
      u <- 1L to 3L
      i <- 0L until 40L
    } yield (u, i * 1000L + u * 7L + (i / 5L) * 4000L, (u + i).toDouble)
    val e = ev(rows: _*)
    val staged = e.select(col("user_id"), unix_micros(col("ts")).as("t_us"),
      round(col("value") * 100).cast("long").as("value_c"))
    // 5 sequential ts-sliced writes — in-order replay across micro-batches
    val maxT = rows.map(_._2).max * US
    (0 until 5).foreach { i =>
      staged.filter(col("t_us") >= i * (maxT / 5 + 1) &&
          col("t_us") < (i + 1) * (maxT / 5 + 1))
        .repartition(1).write.mode("append").parquet(s"$tmp/in")
    }
    val gap = 3600L
    val lateness = "600 seconds"
    val streamed = Sessionize.runStreamSessions(spark, s"$tmp/in", gap,
      lateness, s"$tmp/ckpt", maxFilesPerTrigger = 1)
      .orderBy("user_id", "t_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    val batch = Sessionize.sessionStats(e, "user_id", "ts",
      gap, "value")
    val wMs = rows.map(_._2).max * 1000L - 600L * 1000L // final watermark (ms)
    val lastSeq = batch.groupBy("user_id")
      .agg(max("session_seq").as("last_seq"))
    val expected = batch.join(lastSeq, "user_id")
      .filter((col("session_seq") < col("last_seq"))
        .or((col("t_end_us") / 1000L).cast("long") + gap * 1000L < wMs))
      .select("user_id", "t_start_us", "t_end_us", "n_events", "value_c")
      .orderBy("user_id", "t_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    assert(streamed.nonEmpty, "stream emitted nothing")
    assert(streamed.toSeq == expected.toSeq)
    // and the withheld tail is real: batch has MORE sessions than emitted
    assert(batch.count() > streamed.length)
  }

  test("streaming sessions under the RocksDB state store: identical closed set") {
    // the state backend a production deployment runs (bounded JVM heap,
    // state spills to native storage); semantics must not depend on the
    // default HDFSBackedStateStore
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tmp = Files.createTempDirectory("graft-sess-rocks").toString
      val rows = for { u <- 1L to 2L; i <- 0L until 30L }
        yield (u, i * 1000L + u + (i / 6L) * 4000L, i.toDouble)
      val e = ev(rows: _*)
      val staged = e.select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        round(col("value") * 100).cast("long").as("value_c"))
      val maxT = rows.map(_._2).max * US
      (0 until 3).foreach { i =>
        staged.filter(col("t_us") >= i * (maxT / 3 + 1) &&
            col("t_us") < (i + 1) * (maxT / 3 + 1))
          .repartition(1).write.mode("append").parquet(s"$tmp/in")
      }
      val streamed = Sessionize.runStreamSessions(spark, s"$tmp/in", 3600L,
        "600 seconds", s"$tmp/ckpt", maxFilesPerTrigger = 1)
        .orderBy("user_id", "t_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val batch = Sessionize.sessionStats(e, "user_id", "ts",
        3600L, "value")
      val wMs = rows.map(_._2).max * 1000L - 600L * 1000L
      val lastSeq = batch.groupBy("user_id")
        .agg(max("session_seq").as("last_seq"))
      val expected = batch.join(lastSeq, "user_id")
        .filter((col("session_seq") < col("last_seq"))
          .or((col("t_end_us") / 1000L).cast("long") + 3600L * 1000L < wMs))
        .select("user_id", "t_start_us", "t_end_us", "n_events", "value_c")
        .orderBy("user_id", "t_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(streamed.nonEmpty && streamed.toSeq == expected.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("batch sessionize plan: one exchange on the user key, no extra shuffles") {
    val e = ev((1L, 0L, 1.0), (1L, 100L, 2.0), (2L, 50L, 3.0))
    val plan = Sessionize.sessionStats(e, "user_id", "ts",
      3600L, "value").queryExecution.executedPlan.toString
    // lag + running sum + groupBy(user, seq) all ride ONE hash exchange
    // on user_id (the groupBy's (user, seq) key is a superset partition —
    // Spark reuses the window's user_id partitioning for the partial agg)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("native session_window vs sessionStats: IDENTICAL boundary rule — " +
      "an exact-gap pair merges in both, gap+1 splits in both") {
    import org.apache.spark.sql.functions.{session_window => sw}
    // gaps: 3599 (merge), exactly 3600 (merge — session_window windows
    // are end-INCLUSIVE: an event AT last+gap extends the session, the
    // same > gap split rule sessionStats uses), 3601 (split)
    val e = ev((1L, 0L, 1.0), (1L, 3599L, 1.0), (1L, 7199L, 1.0),
      (1L, 10800L, 1.0))
    val native = e
      .groupBy(col("user_id"), sw(col("ts").cast("timestamp"), "1 hour"))
      .count()
      .select(col("session_window.start").cast("long").as("w_start"),
        col("session_window.end").cast("long").as("w_end"), col("count"))
      .orderBy("w_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ours = Sessionize.sessionStats(e, "user_id", "ts",
      gapSec = 3600L, valueCol = "value")
      .orderBy("session_seq")
      .collect().map(r => (r.getAs[Long]("t_start_us") / 1000000L,
        r.getAs[Long]("t_end_us") / 1000000L, r.getAs[Long]("n_events")))
    assert(native.toSeq == Seq((0L, 7199L + 3600L, 3L),
      (10800L, 10800L + 3600L, 1L)),
      s"native windows: ${native.toSeq}")
    // same memberships; ours reports [first, last], native [first, last+gap]
    assert(ours.toSeq == Seq((0L, 7199L, 3L), (10800L, 10800L, 1L)),
      s"our sessions: ${ours.toSeq}")
  }

  test("sessionStats prunes the id column: stats are tie-order free, so " +
      "the exchange + window sort move 3 narrow columns, never the full row") {
    // a parquet-backed input so the scan's ReadSchema is real
    val tmp = Files.createTempDirectory("graft-sess-prune").toString
    ev((1L, 0L, 1.0), (1L, 100L, 2.0), (2L, 50L, 3.0))
      .write.parquet(s"$tmp/events")
    val df = Sessionize.sessionStats(spark.read.parquet(s"$tmp/events"),
      "user_id", "ts", 3600L, "value")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(scan.nonEmpty, "no FileScan in plan")
    assert(!scan.contains("event_id"),
      s"id column not pruned from the scan:\n$scan")
    // and equal-timestamp events across the dropped tie-break: stats equal
    val tied = ev((1L, 10L, 1.0), (1L, 10L, 2.0), (1L, 10L, 3.0))
    val out = Sessionize.sessionStats(tied, "user_id", "ts", 3600L, "value")
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_events") == 3L &&
      out(0).getAs[Long]("value_c") == 600L)
  }
}
