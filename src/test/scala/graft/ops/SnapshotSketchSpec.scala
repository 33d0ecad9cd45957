package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.hotdog.SparkSpec

class SnapshotSketchSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  // ---- KmvAgg ----

  private def bruteKmv(vs: Seq[Long], k: Int): Seq[Long] =
    vs.distinct.sorted.take(k)

  test("KmvAgg: insert/merge equal the brute-force bottom-k distinct set") {
    val agg = new KmvAgg(8)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val vs = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong)
      // reduce-only
      val red = vs.foldLeft(agg.zero)(agg.reduce)
      assert(red.toSeq == bruteKmv(vs, 8), s"trial $trial reduce")
      // arbitrary split + merge (associativity/commutativity over sets)
      if (vs.nonEmpty) {
        val cut = rnd.nextInt(vs.length)
        val (l, r) = vs.splitAt(cut)
        val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        assert(m.toSeq == bruteKmv(vs, 8), s"trial $trial merge")
      }
    }
  }

  test("KmvAgg in a groupBy: result independent of partitioning") {
    val vs = (0L until 500L).map(v => ("g", v % 123))
    val kmv = udaf(new KmvAgg(16))
    val a = vs.toDF("g", "v").repartition(1)
      .groupBy("g").agg(kmv(col("v")).as("m"))
      .collect()(0).getSeq[Long](1)
    val b = vs.toDF("g", "v").repartition(7, col("v"))
      .groupBy("g").agg(kmv(col("v")).as("m"))
      .collect()(0).getSeq[Long](1)
    assert(a == bruteKmv(vs.map(_._2), 16) && b == a)
  }

  test("kmvEstimate: exact below k; the documented two-flop formula at k") {
    val df = Seq(
      ("small", (1L to 10L).toArray),              // size 10 < k=16 → exact
      ("big", (1L to 16L).map(_ * 1000L).toArray)  // kth = 16000
    ).toDF("g", "mins")
    val out = Sketches.kmvEstimate(col("mins"), 16)
    val m = df.select(col("g"), out.as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("small") == 10L)
    assert(m("big") ==
      math.floor(15.0 * 1152921504606846976.0 / 16000.0).toLong)
  }

  test("kmvUniques: est equals exact when distinct < k; error bounded when above") {
    val df = (0L until 2000L).map(i => ("t" + (i % 2), i % (if (i % 2 == 0) 20 else 500)))
      .toDF("event_type", "user_id")
    val out = Sketches.kmvUniques(df, "event_type", col("user_id"), k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (_, ex0, est0) = out("t0") // even i mod 20 → 10 distinct < 64 → exact
    assert(ex0 == 10L && est0 == 10L)
    val (_, ex1, est1) = out("t1") // odd i mod 500 → 250 distinct ≥ 64 → estimator
    assert(ex1 == 250L)
    assert(math.abs(est1 - ex1) <= (ex1 * 0.5).toLong, s"est $est1 vs $ex1")
  }

  test("kmvUniques plan: the sketch aggregate has a map-side partial phase") {
    val df = Seq(("a", 1L)).toDF("event_type", "user_id")
    val plan = Sketches.kmvUniques(df, "event_type", col("user_id"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmvagg"), plan)
  }

  // ---- Count-Min sketch ----

  private def md5Bucket(j: Int, key: String, width: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$key".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % width
  }

  test("cms: differential vs a brute-force md5 replay; est >= exact; collisions load-bearing") {
    val keys = (0 until 40).map(i => s"u$i")
    val rows = keys.zipWithIndex.flatMap { case (k, i) => Seq.fill(i + 1)(k) }
    val df = rows.toDF("user_id")
    val (depth, width) = (4, 4)
    val counters = Sketches.cmsCounters(df, col("user_id"), depth, width)
    val exact = df.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    val got = Sketches.cmsProbe(exact, "user_id", counters, depth, width)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute-force CMS with the same hash
    val cnt = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (k <- rows; j <- 0 until depth)
      cnt((j, md5Bucket(j, k, width))) = cnt.getOrElse((j, md5Bucket(j, k, width)), 0L) + 1
    var over = 0
    for (k <- keys) {
      val ex = keys.indexOf(k) + 1L
      val bf = (0 until depth).map(j => cnt.getOrElse((j, md5Bucket(j, k, width)), 0L)).min
      val (gex, gest) = got(k)
      assert(gex == ex && gest == bf, s"$k: got $gest want $bf")
      assert(gest >= gex)
      if (gest > gex) over += 1
    }
    assert(over > 0, "width 4 over 40 keys must produce collisions")
  }

  test("cms: width 1 estimates every key at the corpus total; wide sketch is exact") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("user_id")
    val exact = df.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    val narrow = Sketches.cmsProbe(exact,
        "user_id", Sketches.cmsCounters(df, col("user_id"), 3, 1), 3, 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(narrow.values.toSet == Set(6L), narrow.toString)
    val wide = Sketches.cmsProbe(exact,
        "user_id", Sketches.cmsCounters(df, col("user_id"), 4, 4096), 4, 4096)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(wide.forall { case (ex, est) => est == ex }, wide.toString)
  }

  test("cms plan: counters aggregate map-side combinable; probe joins broadcast") {
    val df = Seq("a").toDF("user_id")
    val counters = Sketches.cmsCounters(df, col("user_id"), 4, 8)
    val cplan = counters.queryExecution.executedPlan.toString
    assert(cplan.contains("partial_count"), cplan)
    val exact = df.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    val pplan = Sketches.cmsProbe(exact, "user_id", counters, 4, 8)
      .queryExecution.executedPlan.toString
    assert(pplan.contains("BroadcastHashJoin"), pplan)
  }

  // ---- Snapshot.applyChanges ----

  private def snap(rows: (Long, Long, String, String, String)*) =
    rows.toSeq.toDF("doc_id", "version", "op", "text", "source")

  test("applyChanges: update, delete, insert, update-then-delete, resurrect") {
    val base = snap((1L, 0L, "upsert", "one", "s"), (2L, 0L, "upsert", "two", "s"),
      (3L, 0L, "upsert", "three", "s"), (4L, 0L, "upsert", "four", "s"),
      (5L, 0L, "upsert", "five", "s"))
    val changes = snap(
      (1L, 1L, "upsert", "one'", "s"),                       // plain update
      (2L, 1L, "delete", null, null),                        // delete
      (6L, 1L, "upsert", "six", "cdc"),                      // insert
      (3L, 1L, "upsert", "three'", "s"), (3L, 2L, "delete", null, null), // upd→del
      (4L, 1L, "delete", null, null), (4L, 2L, "upsert", "four'", "s"))  // del→upd
    val out = Snapshot.applyChanges(base, changes, "doc_id", "version",
        "op", Seq("text", "source"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out == Map(
      1L -> ((1L, "one'")), 4L -> ((2L, "four'")),
      5L -> ((0L, "five")), 6L -> ((1L, "six"))))
  }

  test("applyChanges plan: exactly one exchange (union → one hash aggregate)") {
    val base = snap((1L, 0L, "upsert", "one", "s"))
    val changes = snap((1L, 1L, "upsert", "one'", "s"))
    val plan = Snapshot.applyChanges(base, changes, "doc_id", "version",
        "op", Seq("text", "source"))
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 shuffle, got $n:\n$plan")
  }

  // ---- Snapshot.diff ----

  test("diff: all four statuses; join-free single aggregate") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "text")
    val d = Snapshot.diff(before, after, "doc_id", md5(col("text")))
    val out = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // count only the executed (final) plan — the AQE string repeats the
    // tree under "== Initial Plan ==" and would double-count
    val plan = d.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), plan)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 shuffle, got $n:\n$plan")
  }

  // ---- Snapshot.history ----

  test("history: intervals chain per key; latest row is current; single-version keys") {
    val changes = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "a"), // 3-version chain
      (2L, 5L, "x"), // single version
      (3L, 7L, "p"), (3L, 9L, "q")).toDF("doc_id", "version", "state")
    val out = Snapshot.history(changes, "doc_id", "version", Seq("state"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 10L, "a", 20L, false), (1L, 20L, "b", 30L, false),
      (1L, 30L, "a", -1L, true),
      (2L, 5L, "x", -1L, true),
      (3L, 7L, "p", 9L, false), (3L, 9L, "q", -1L, true)))
    // chain property: per key, valid_to == next valid_from; exactly one
    // current row per key
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).toSeq
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 == b._2)
        case _ =>
      }
      assert(sorted.count(_._5) == 1 && sorted.last._5)
    }
    // partitioning independence
    val p7 = Snapshot.history(changes.repartition(7), "doc_id", "version",
      Seq("state")).collect().map(_.toSeq).toSet
    val p1 = Snapshot.history(changes.coalesce(1), "doc_id", "version",
      Seq("state")).collect().map(_.toSeq).toSet
    assert(p7 == p1)
  }

  test("history: randomized differential vs a sequential replay") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 8) {
      val rows = (0 until 120).map { i =>
        (rnd.nextInt(12).toLong, i.toLong, s"v${rnd.nextInt(4)}")
      }.distinct // (key, version) unique by construction (version = i)
      val df = rows.toDF("doc_id", "version", "state")
      val got = Snapshot.history(df, "doc_id", "version", Seq("state"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
      val expected = rows.groupBy(_._1).flatMap { case (k, vs) =>
        val sorted = vs.sortBy(_._2)
        sorted.zipWithIndex.map { case ((_, ver, st), i) =>
          val next = if (i + 1 < sorted.size) sorted(i + 1)._2 else -1L
          (k, ver, st, next, i + 1 == sorted.size)
        }
      }.toSet
      assert(got == expected, s"trial $trial")
    }
  }

  // ---- scramble32 ----

  test("scramble32: matches the independent Int-arithmetic fmix32; spreads sequential ids") {
    val n = 100000L
    val out = spark.range(0, n).select(col("id"),
        pmod(Sketches.scramble32(col("id")), lit(256L)).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every cell hit; occupancy within 3x of uniform in both directions —
    // the property the hot-bucket plans rely on (a salt that collapsed
    // to few cells would re-create the single-partition flood)
    assert(out.size == 256)
    val ideal = n / 256.0
    assert(out.values.max < ideal * 3 && out.values.min > ideal / 3,
      s"max ${out.values.max} min ${out.values.min} ideal $ideal")
    // spot values against plain Int fmix32 (independent arithmetic)
    def fmix(id: Long): Long = {
      var h = (id ^ (id >>> 32)).toInt
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13
      h *= 0xC2B2AE35; h ^= h >>> 16
      h.toLong & 0xFFFFFFFFL
    }
    val vals = spark.range(0, 64).select(Sketches.scramble32(col("id")))
      .collect().map(_.getLong(0))
    assert(vals.toSeq == (0L until 64L).map(fmix))
  }

  // ---- rateLimit ----

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.map { case (id, u, sec, ty) =>
      (id, u, new java.sql.Timestamp(sec * 1000L), ty)
    }.toDF("event_id", "user_id", "ts", "event_type")

  test("rateLimit equals the naive per-key window, including ts ties") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, (rnd.nextInt(4) * 3600 + rnd.nextInt(3)).toLong,
        "t" + rnd.nextInt(3))
    }
    val e = ev(rows: _*)
    val kept = EventAnalytics.rateLimit(e, "user_id", "ts", "event_id",
        quota = 2, windowUs = 3600000000L)
      .select("event_id").as[Long].collect().toSet
    val w = Window
      .partitionBy(col("user_id"), expr("unix_micros(ts) div 3600000000L"))
      .orderBy(col("ts"), col("event_id"))
    val naive = e.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2).select("event_id").as[Long].collect().toSet
    assert(kept == naive)
  }

  test("rateLimitSummary: totals partition into kept + dropped per type") {
    val e = ev((1L, 1L, 10L, "a"), (2L, 1L, 20L, "a"), (3L, 1L, 30L, "b"),
      (4L, 2L, 10L, "b"), (5L, 1L, 7200L, "a"))
    val out = EventAnalytics.rateLimitSummary(e, "user_id", "ts", "event_id",
        "event_type", quota = 1, windowUs = 3600000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // user 1 hour 0 holds events 1,2,3 → keeps id 1 (a); drops 2 (a), 3 (b)
    assert(out == Map("a" -> ((3L, 2L, 1L)), "b" -> ((2L, 1L, 1L))))
  }
}
