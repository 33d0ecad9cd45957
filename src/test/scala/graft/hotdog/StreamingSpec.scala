package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming route == batch route; restart is exactly-once") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val seqs = Corpus.sequences(spark, 5000, seed = 13L)
    seqs.repartition(4).write.parquet(in)

    val q = Streaming.routeStream(spark, in, Configs.flagship, out, ckpt,
      maxFilesPerTrigger = 2)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Router.route(seqs, Configs.flagship)
      .filter(col("topic").isNotNull)
      .groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(spark.read.parquet(out).count() ==
      Router.route(seqs, Configs.flagship).filter(col("topic").isNotNull).count())

    // restart with the same checkpoint: nothing reprocessed, no duplicates
    val q2 = Streaming.routeStream(spark, in, Configs.flagship, out, ckpt)
    q2.awaitTermination()
    val after = spark.read.parquet(out)
      .groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == batch)
  }

  test("kill MID-stream, restart from checkpoint: no duplicate, no missing row") {
    val tmp = Files.createTempDirectory("graft-stream-kill").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val seqs = Corpus.sequences(spark, 8000, seed = 41L)
    seqs.repartition(24).write.parquet(in) // 24 files → 24 micro-batches

    // run 1: one file per trigger; kill as soon as the FIRST batch commits
    // (poll the sink for a committed batch dir), leaving the rest pending
    val q = Streaming.routeStream(spark, in, Configs.flagship, out, ckpt,
      maxFilesPerTrigger = 1)
    val deadline = System.currentTimeMillis() + 120000
    def committedBatches(): Seq[String] = {
      val d = new java.io.File(out)
      if (!d.exists()) Seq.empty
      else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("batch_id="))
    }
    while (committedBatches().isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    q.stop() // mid-stream kill: later batches never ran
    q.awaitTermination()
    val afterKill = committedBatches().size
    assert(afterKill >= 1, "kill fired before any batch committed")
    assert(afterKill < 24, "query finished before the kill — not a mid-stream test")

    // run 2: same checkpoint — must resume from the next pending file,
    // reprocess nothing, and idempotently finish any half-written batch
    val q2 = Streaming.routeStream(spark, in, Configs.flagship, out, ckpt,
      maxFilesPerTrigger = 4)
    q2.awaitTermination()

    val batchAnswer = Router.route(seqs, Configs.flagship)
      .filter(col("topic").isNotNull)
      .select("doc_id", "topic")
    // exact ROWSET equality (doc_id, topic) — stronger than count parity:
    // any duplicate or dropped row across the kill/restart breaks this
    val streamed = spark.read.parquet(out).select("doc_id", "topic")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val expected = batchAnswer.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamed.length == expected.length,
      s"streamed ${streamed.length} rows vs batch ${expected.length}")
    assert(streamed.toSeq == expected.toSeq)
  }

  test("windowed per-topic counts with watermark (memory sink)") {
    val tmp = Files.createTempDirectory("graft-stream-w").toString
    val in = s"$tmp/in"
    // sequences + event_time spread over 3 minutes
    Corpus.sequences(spark, 3000, seed = 17L)
      .withColumn("event_time",
        timestamp_seconds(lit(1700000000L) +
          pmod(xxhash64(col("doc_id")), lit(180L))))
      .write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val counts = Streaming.windowedTopicCounts(stream, Configs.flagship)
    val q = counts.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT topic, sum(n) AS n FROM win_counts GROUP BY topic")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Router.route(spark.read.parquet(in), Configs.flagship)
      .filter(col("topic").isNotNull)
      .groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // windows are minute-aligned
    val starts = spark.sql("SELECT DISTINCT window_start FROM win_counts")
      .collect().map(_.getTimestamp(0))
    assert(starts.forall(t => t.getTime % 60000 == 0))
    assert(starts.length >= 3)
  }

  test("mapGroupsWithState running totals accumulate ACROSS micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-state").toString
    // 3 files × maxFilesPerTrigger=1 → exactly 3 micro-batches
    Corpus.sequences(spark, 3000, seed = 31L).repartition(3)
      .write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val totals = Streaming.runningTopicTotals(stream, Configs.flagship)
      .toDF("topic", "n")
    val q = totals.writeStream.format("memory").queryName("state_totals")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val updates = spark.table("state_totals").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // the biggest topic must have emitted MULTIPLE increasing cumulative
    // totals (one per micro-batch it appeared in) — cross-batch state
    val byTopic = updates.groupBy(_._1)
      .map { case (t, vs) => t -> vs.map(_._2).toSeq.sorted }
    assert(byTopic.values.exists(_.length >= 2), byTopic.toString)
    byTopic.values.foreach(vs => assert(vs.distinct == vs, s"non-increasing: $vs"))
    // final cumulative == batch-mode per-topic counts
    val finals = byTopic.map { case (t, vs) => t -> vs.max }
    val want = Pipeline.emittedOnly(
      Router.route(spark.read.parquet(tmp), Configs.flagship))
      .groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(finals == want)
  }

  test("intervalJoin: equals the batch interval join; matches ACROSS micro-batches; boundaries strict/inclusive") {
    import spark.implicits._
    val lDir = Files.createTempDirectory("graft-ij-l").toString
    val rDir = Files.createTempDirectory("graft-ij-r").toString
    val t0 = 1700000000L
    def file(dir: String, rows: Seq[(Long, Long, Long)], cols: (String, String, String)): Unit =
      rows.toDF("u", "id", "sec")
        .select(col("u").as(cols._1), col("id").as(cols._2),
          timestamp_seconds(col("sec")).as(cols._3))
        .repartition(1).write.mode("append").parquet(dir)
    // touches (right): u1 has one OUTSIDE the horizon (t0 = pt−100) and
    // one exactly AT the inclusive lower bound (t0+40 = pt−60), u2's is
    // AT the purchase time (strict upper bound → excluded), u3's arrives
    // in a LATER micro-batch than its purchase (cross-batch state match)
    file(rDir, Seq((1L, 10L, t0), (1L, 11L, t0 + 40L), (2L, 20L, t0 + 100L)),
      ("t_user", "touch_id", "tt"))
    file(lDir, Seq((1L, 100L, t0 + 100L), (2L, 200L, t0 + 100L),
      (3L, 300L, t0 + 100L)), ("p_user", "purchase_id", "pt"))
    file(rDir, Seq((3L, 30L, t0 + 90L)), ("t_user", "touch_id", "tt"))
    val lStream = spark.readStream.schema(spark.read.parquet(lDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(lDir)
    val rStream = spark.readStream.schema(spark.read.parquet(rDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(rDir)
    val joined = Streaming.intervalJoin(lStream, "pt", rStream, "tt",
      col("p_user") === col("t_user"), horizon = "60 seconds",
      lateness = "1 hour")
    val q = joined.select("purchase_id", "touch_id")
      .writeStream.format("memory").queryName("ij").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ij").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // u1: pt−100 outside the horizon, pt−60 exactly inclusive;
    // u2: tt == pt excluded (strict <); u3: matched across batches
    assert(got == Set((100L, 11L), (300L, 30L)), got.toString)
  }

  test("streamingDedupKeys: cross-batch dedup; state expiry re-emits past the horizon") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    val t0 = 1700000000L
    // the file source orders micro-batches by modification time — stamp
    // each appended part file explicitly so batch order is deterministic
    var stamp = 1000000L
    val stamped = scala.collection.mutable.Set.empty[String]
    def file(rows: Seq[(String, Long)]): Unit = {
      rows.toDF("k", "sec")
        .select(col("k"), timestamp_seconds(col("sec")).as("event_time"))
        .repartition(1).write.mode("append").parquet(tmp)
      stamp += 60000L
      new java.io.File(tmp).listFiles().foreach { f =>
        if (f.getName.startsWith("part-") && stamped.add(f.getName))
          f.setLastModified(stamp)
      }
    }
    // batch 1: a,b (plus an in-batch duplicate of a); batch 2: c two hours
    // later (its max event time advances the watermark for LATER batches);
    // batch 3: d — processed under the advanced watermark, so a/b's state
    // (expiry t0+10min) is evicted here; batch 4: a again → re-emitted.
    // Eviction takes effect one batch after the watermark passes the
    // expiry (the watermark a batch runs under is the one committed by
    // the previous batch) — hence the spacer batch.
    file(Seq("a" -> t0, "a" -> t0, "b" -> t0))
    file(Seq("c" -> (t0 + 7200L)))
    file(Seq("d" -> (t0 + 7200L)))
    file(Seq("a" -> (t0 + 7260L), "c" -> (t0 + 7260L)))

    val schema = spark.read.parquet(tmp).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val dedup = Streaming.streamingDedupKeys(
      stream, Seq("k"), "event_time", lateness = "10 minutes")
    val q = dedup.select("k").writeStream.format("memory").queryName("sdedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sdedup").collect().map(_.getString(0)).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.length }
    // in-batch and live-state duplicates dropped (b, c); `a` re-emitted
    // ONCE because its first state expired when the watermark moved 2h —
    // the documented horizon trade of dropDuplicatesWithinWatermark
    assert(got == Map("a" -> 2, "b" -> 1, "c" -> 1, "d" -> 1), got.toString)
  }
}
