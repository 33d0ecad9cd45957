package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.hotdog.SparkSpec

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.zipWithIndex.map { case ((u, sec, ty, v), i) =>
      (i.toLong, u, new java.sql.Timestamp(sec * 1000L), ty, v)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")

  // ---- collapseRuns ----

  test("collapseRuns: maximal equal runs, ties by id, total accounting") {
    // user 1: a a a | b | a a (same-second tie between ids 1 and 2)
    // user 2: x (singleton)
    val e = ev(
      (1L, 0L, "a", 0), (1L, 1L, "a", 0), (1L, 1L, "a", 0),
      (1L, 2L, "b", 0), (1L, 3L, "a", 0), (1L, 4L, "a", 0),
      (2L, 7L, "x", 0))
    val out = EventAnalytics
      .collapseRuns(e, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out == Map(
      (1L, 0L) -> (("a", 3L, 0L, 1000000L)),
      (1L, 1L) -> (("b", 1L, 2000000L, 2000000L)),
      (1L, 2L) -> (("a", 2L, 3000000L, 4000000L)),
      (2L, 0L) -> (("x", 1L, 7000000L, 7000000L))))
    assert(out.values.map(_._2).sum == 7L, "sum n_events must equal input")
    // partitioning independence
    val base = ev((1L, 0L, "a", 0), (1L, 1L, "a", 0), (1L, 2L, "b", 0),
      (2L, 0L, "a", 0), (2L, 1L, "b", 0), (2L, 2L, "b", 0))
    def run(d: org.apache.spark.sql.DataFrame) = EventAnalytics
      .collapseRuns(d, "user_id", "ts", "event_id", "event_type")
      .collect().map(_.toSeq).toSet
    assert(run(base.repartition(5)) == run(base.coalesce(1)))
    // NULL values collapse like any repeated value (the rn=1 + null-safe
    // equality contract): a | null null | a, including a LEADING null run
    val withNulls = Seq(
      (0L, 9L, 0L, Option("a")), (1L, 9L, 1L, None), (2L, 9L, 2L, None),
      (3L, 9L, 3L, Option("a")),
      (4L, 8L, 0L, None), (5L, 8L, 1L, None)) // user 8: leading null run
      .map { case (id, u, sec, ty) =>
        (id, u, new java.sql.Timestamp(sec * 1000L), ty.orNull)
      }.toDF("event_id", "user_id", "ts", "event_type")
    val nOut = EventAnalytics
      .collapseRuns(withNulls, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.getString(2)), r.getLong(3))).toMap
    assert(nOut == Map(
      (9L, 0L) -> ((Some("a"), 1L)), (9L, 1L) -> ((None, 2L)),
      (9L, 2L) -> ((Some("a"), 1L)), (8L, 0L) -> ((None, 2L))))
  }

  test("collapseRuns: randomized differential incl. ts ties and null values") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 10) {
      val rows = (0 until 300).map { i =>
        val u = rnd.nextInt(5).toLong
        val sec = rnd.nextInt(40).toLong // dense → frequent ts ties
        val ty = if (rnd.nextInt(10) == 0) null
          else s"t${rnd.nextInt(3)}"
        (i.toLong, u, sec, ty)
      }
      val df = rows.map { case (id, u, sec, ty) =>
        (id, u, new java.sql.Timestamp(sec * 1000L), ty)
      }.toDF("event_id", "user_id", "ts", "event_type")
      val got = EventAnalytics
        .collapseRuns(df, "user_id", "ts", "event_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (Option(r.getString(2)), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      // replay: per user sort by (ts, id), split on value change
      // (null-safe), number runs, aggregate
      val expected = rows.groupBy(_._2).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._1))
        var runSeq = -1L
        var prev: Option[Option[String]] = None
        sorted.map { case (id, _, sec, ty) =>
          val v = Option(ty)
          if (!prev.contains(v)) { runSeq += 1; prev = Some(v) }
          (u, runSeq, v, sec * 1000000L)
        }.groupBy(t => (t._1, t._2)).map { case (k, g) =>
          k -> ((g.head._3, g.size.toLong, g.map(_._4).min, g.map(_._4).max))
        }
      }.toMap
      assert(got == expected, s"trial $trial")
      assert(got.values.map(_._2).sum == 300L)
    }
  }

  test("collapseRuns plan: one user-key exchange; both frames ride the same sort") {
    val e = ev((1L, 0L, "a", 0), (1L, 1L, "b", 0), (2L, 0L, "a", 0))
    val plan = EventAnalytics
      .collapseRuns(e, "user_id", "ts", "event_id", "event_type")
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    // ONE exchange total: hash(user) clusters (user, run_seq) too, so
    // the per-run aggregate rides the windows' partitioning
    assert(n == 1, s"expected 1 shuffle, got $n:\n$plan")
    // exactly one sort under the windows (lag + running sum share it);
    // the second is the sort-based aggregate's own (user, run_seq) sort
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts <= 2, s"window frames must share one sort:\n$plan")
    val windowSorts = "Sort \\[user_id#\\d+L ASC NULLS FIRST, _t_us".r
      .findAllIn(plan).length
    assert(windowSorts == 1, s"both frames must ride ONE (user,ts,id) sort:\n$plan")
  }

  // ---- hysteresisAlerts ----

  test("hysteresisAlerts: trigger, dead-band carry, quiet-hour clear, edges") {
    // type "a", hours (n): h0=3 h1=2 h2=0 h3=2 h4=3 h5=2 h6=1
    //   states:            on   on  off  off  on   on   off
    //   (h1 carries on; the EMPTY densified h2 clears; h3 carries off)
    // type "b": single hour n=1 → off, no edges
    def at(hour: Long, i: Int) =
      new java.sql.Timestamp(hour * 3600000L + i * 1000L)
    val rows =
      (0 until 3).map(i => (at(0, i), "a")) ++
      (0 until 2).map(i => (at(1, i), "a")) ++
      // hour 2 empty
      (0 until 2).map(i => (at(3, i), "a")) ++
      (0 until 3).map(i => (at(4, i), "a")) ++
      (0 until 2).map(i => (at(5, i), "a")) ++
      Seq((at(6, 0), "a"), (at(0, 0), "b"))
    val df = rows.zipWithIndex.map { case ((ts, ty), i) =>
      (i.toLong, 1L, ts, ty, 0.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics.hysteresisAlerts(df, "event_type", "ts", 3L, 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getBoolean(4))).toMap
    assert(out == Map(
      ("a", 0L) -> ((3L, "on", true)), ("a", 1L) -> ((2L, "on", false)),
      ("a", 2L) -> ((0L, "off", false)), ("a", 3L) -> ((2L, "off", false)),
      ("a", 4L) -> ((3L, "on", true)), ("a", 5L) -> ((2L, "on", false)),
      ("a", 6L) -> ((1L, "off", false)),
      ("b", 0L) -> ((1L, "off", false))))
    // partitioning independence
    def run(d: org.apache.spark.sql.DataFrame) = EventAnalytics
      .hysteresisAlerts(d, "event_type", "ts", 3L, 2L)
      .collect().map(_.toSeq).toSet
    assert(run(df.repartition(5)) == run(df.coalesce(1)))
  }

  // ---- transitions ----

  test("transitions: per-user (ts,id)-ordered adjacency, ppm floored") {
    val e = ev(
      (1L, 0L, "a", 0), (1L, 10L, "b", 0), (1L, 20L, "a", 0), // a→b, b→a
      (2L, 5L, "a", 0), (2L, 6L, "b", 0),                     // a→b
      (3L, 9L, "c", 0))                                       // singleton: none
    val out = EventAnalytics
      .transitions(e, "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 2L, 1000000L)),
      ("b", "a") -> ((1L, 1L, 1000000L))))
  }

  test("transitions: same-timestamp adjacency breaks ties by the id column") {
    val e = ev((1L, 7L, "x", 0), (1L, 7L, "y", 0), (1L, 7L, "z", 0))
    val out = EventAnalytics
      .transitions(e, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("x", "y"), ("y", "z")))
  }

  test("transitions plan: one data-sized exchange (user key); the rest ride the <=|types|^2 frame") {
    val e = ev((1L, 0L, "a", 0), (1L, 1L, "b", 0))
    val plan = EventAnalytics
      .transitions(e, "user_id", "ts", "event_id", "event_type")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <=3 shuffles, got $exchanges:\n$plan")
  }

  // ---- rateAnomaly ----

  test("rateAnomaly: integer spike verdict over the trailing range frame; warmup excluded") {
    // type "a": hours 0..25 at 1/hour, then hour 26 with 9 events.
    // trailing-24h sum at h26 = 24 (hours 2..25, h26 excluded) →
    // 9*24=216 > 3*24=72 → spike; h25 (n=1): 24 < 3*24 → calm.
    val rows = (0L to 25L).map(h => (1L, h * 3600L, "a", 0.0)) ++
      (0 until 9).map(i => (1L, 26L * 3600L + i, "a", 0.0))
    val out = EventAnalytics.rateAnomaly(ev(rows: _*), "event_type", "ts",
      windowHours = 24, factor = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(!out.contains(23L), "warmup hours must be excluded")
    assert(out(24L) == ((1L, 24L, 0L)))
    assert(out(25L) == ((1L, 24L, 0L)))
    assert(out(26L) == ((9L, 24L, 1L)))
  }

  test("rateAnomaly: absent (zero) hours weigh into the trailing sum exactly") {
    // events only at hours 0 and 30: at h30 the trailing 24h window
    // (hours 6..29) is empty → trail 0 → any n spikes
    val out = EventAnalytics.rateAnomaly(
      ev((1L, 0L, "a", 0.0), (1L, 30L * 3600L, "a", 0.0)),
      "event_type", "ts", windowHours = 24, factor = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(30L -> ((0L, 1L))))
  }

  // ---- lastTouch ----

  test("lastTouch: latest preceding touch wins; horizon excludes; none bucket") {
    val e = ev(
      // u1: view@0, click@100 → purchase@200 (credit click, lag 100s)
      (1L, 0L, "view", 0), (1L, 100L, "click", 0), (1L, 200L, "purchase", 5.0),
      // u2: view@0 → purchase@4000 (horizon 3600 → none)
      (2L, 0L, "view", 0), (2L, 4000L, "purchase", 7.0),
      // u3: purchase with no touches at all → none
      (3L, 50L, "purchase", 1.5),
      // u1 second purchase@250: latest preceding touch still click@100
      (1L, 250L, "purchase", 2.0))
    val out = EventAnalytics.lastTouch(e, "user_id", "ts", "event_id",
      "event_type", "value", "purchase", Seq("view", "click"), 3600L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "click" -> ((2L, 700L, (100L + 150L) * 1000000L)),
      "none" -> ((2L, 850L, 0L))))
  }

  test("lastTouch: a same-timestamp touch with a smaller id strictly precedes") {
    val e = Seq(
      (10L, 1L, new java.sql.Timestamp(5000L), "click", 0.0),
      (11L, 1L, new java.sql.Timestamp(5000L), "purchase", 3.0),
      (12L, 1L, new java.sql.Timestamp(5000L), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics.lastTouch(e, "user_id", "ts", "event_id",
      "event_type", "value", "purchase", Seq("view", "click"), 3600L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only the id-10 click precedes the id-11 purchase; the id-12 view
    // is AFTER in (ts, id) order and must not be credited
    assert(out == Map("click" -> 1L))
  }

  test("lastTouch plan: one user-key exchange + the bounded rollup") {
    val e = ev((1L, 0L, "view", 0), (1L, 1L, "purchase", 1.0))
    val plan = EventAnalytics.lastTouch(e, "user_id", "ts", "event_id",
      "event_type", "value", "purchase", Seq("view", "click"), 3600L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 shuffles, got $exchanges:\n$plan")
  }

  // ---- sessionPaths ----

  test("sessionPaths: first-depth types per gap session, '>'-joined, counted") {
    val e = ev(
      // u1 session 1: a,b,c,d (depth 3 → "a>b>c"); session 2: b alone
      (1L, 0L, "a", 0), (1L, 10L, "b", 0), (1L, 20L, "c", 0),
      (1L, 30L, "d", 0), (1L, 10000L, "b", 0),
      // u2: one session a,b → "a>b"
      (2L, 5L, "a", 0), (2L, 6L, "b", 0))
    val out = EventAnalytics.sessionPaths(e, "user_id", "ts", "event_id",
      "event_type", gapSec = 3600L, depth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 1L, "b" -> 1L, "a>b" -> 1L))
  }

  test("sessionPaths: equal-timestamp entries order by the id tie-break") {
    val e = Seq(
      (7L, 1L, new java.sql.Timestamp(1000L), "y", 0.0),
      (5L, 1L, new java.sql.Timestamp(1000L), "x", 0.0),
      (9L, 1L, new java.sql.Timestamp(1000L), "z", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics.sessionPaths(e, "user_id", "ts", "event_id",
      "event_type", gapSec = 3600L, depth = 3)
      .collect().map(r => r.getString(0)).toSeq
    assert(out == Seq("x>y>z"))
  }

  // ---- dauStickiness ----

  test("dauStickiness: distinct users per day, calendar-month MAU, floored ppm") {
    def at(day: String, u: Long) =
      (u, day) // (user, date string)
    val rows = Seq(
      at("2024-01-01", 1L), at("2024-01-01", 1L), // same-day repeat: once
      at("2024-01-01", 2L), at("2024-01-02", 1L),
      at("2024-02-01", 3L))
      .zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(s"$d 12:00:00"), "view", 0.0)
      }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics.dauStickiness(rows, "user_id", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // Jan MAU = {1,2} = 2; Feb MAU = {3} = 1
    assert(out == Map(
      "2024-01-01" -> ((2L, 2L, 1000000L)),
      "2024-01-02" -> ((1L, 2L, 500000L)),
      "2024-02-01" -> ((1L, 1L, 1000000L))))
  }

  // ---- percentilesByKey ----

  test("percentilesByKey: discrete rank-ceil percentiles in integer cents") {
    // key "a": values 1..10 (cents 100..1000): p50 → rank 5 → 500;
    // p90 → rank 9 → 900; p99 → rank ceil(9.9)=10 → 1000
    val rows = (1 to 10).map(i => (1L, i.toLong, "a", i.toDouble)) :+
      (2L, 1L, "b", 2.5)
    val out = EventAnalytics.percentilesByKey(ev(rows: _*),
      "event_type", "value", Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      "a" -> ((10L, 500L, 900L, 1000L)),
      "b" -> ((1L, 250L, 250L, 250L))))
  }

  test("percentilesByKey: duplicate values collapse into the vocabulary counts") {
    // 97×100 + 2×200 + 1×300: p50 → 100, p99 → rank 99 → 200 (not 300)
    val rows = (1 to 97).map(_ => (1L, 1L, "a", 1.0)) ++
      Seq((1L, 2L, "a", 2.0), (1L, 3L, "a", 2.0), (1L, 4L, "a", 3.0))
    val out = EventAnalytics.percentilesByKey(ev(rows: _*),
      "event_type", "value", Seq(50, 99))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(out == ((100L, 100L, 200L)))
  }

  test("percentilesByKey plan: corpus touched ONLY by the partial-agg scan — no corpus-size sort, no window before the first aggregate") {
    val e = ev((1L, 0L, "a", 1.0), (1L, 1L, "a", 2.0))
    val qe = EventAnalytics.percentilesByKey(e, "event_type", "value",
      Seq(50, 90)).queryExecution
    val plan = qe.executedPlan.toString
    // the window (cum/total) runs strictly AFTER the (key, cents)
    // aggregate: in the plan tree the Window must not contain a scan
    // without an intervening HashAggregate — pin via ordering: the
    // first aggregate appears below (after, in print order) the window
    val lines = plan.linesIterator.toSeq
    val firstWindow = lines.indexWhere(_.contains("Window"))
    val aggs = lines.zipWithIndex.filter(_._1.contains("HashAggregate")).map(_._2)
    assert(firstWindow >= 0 && aggs.exists(_ > firstWindow),
      s"expected a HashAggregate below the Window (vocabulary-sized window input):\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 shuffles, got $exchanges:\n$plan")
  }

  // ---- jsonProfile ----

  test("jsonProfile: every JSON value type, type drift, malformed/non-object/null/empty — TOTAL accounting") {
    val rows = Seq(
      ("a", """{"k":1,"s":"x","n":null,"b":true,"arr":[1],"o":{"x":1}}"""),
      ("a", """{"k":2,"n":"now a string"}"""), // type drift on n
      ("a", "oops not json"),
      ("a", "[1,2]"),  // valid JSON, non-object root → malformed bucket
      ("a", null),     // null payload → malformed bucket
      ("b", "{}"))     // empty object: zero field rows, nothing malformed
      .toDF("event_type", "pj")
    val out = EventAnalytics.jsonProfile(rows, "event_type", col("pj"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(out == Map(
      ("a", "k", "number") -> 2L, ("a", "s", "string") -> 1L,
      ("a", "n", "null") -> 1L, ("a", "n", "string") -> 1L,
      ("a", "b", "boolean") -> 1L, ("a", "arr", "array") -> 1L,
      ("a", "o", "object") -> 1L, ("a", "_malformed", "-") -> 3L))
  }

  // ---- logTemplates ----

  test("logTemplates: wildcard iff position varies; (len, first-token) clustering; counts") {
    val msgs = Seq(
      "Failed to connect to host-3 port 80",
      "Failed to connect to host-9 port 443",
      "Failed to connect to host-3 port 80",   // exact repeat — count 3
      "Failed to connect now",                  // same tok0, different length → own cluster
      "New session started",                    // fully constant template
      "GET /item/1 200",
      "GET /item/2 200")
      .toDF("msg")
    val out = EventAnalytics.logTemplates(msgs, col("msg"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "Failed to connect to <*> port <*>" -> 3L,
      "Failed to connect now" -> 1L,
      "New session started" -> 1L,
      "GET <*> 200" -> 2L))
  }

  test("logTemplates: partitioning-independent (pure function of the multiset)") {
    val msgs = Seq("a x c", "a y c", "a x c", "b z").toDF("msg")
    val one = EventAnalytics.logTemplates(msgs.coalesce(1), col("msg"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val many = EventAnalytics.logTemplates(msgs.repartition(7), col("msg"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(one == many && one == Set(("a <*> c", 3L), ("b z", 1L)))
  }

  test("logTemplates plan: corpus touched only by the partial aggregate — no corpus shuffle, no window") {
    val msgs = Seq("a x c").toDF("msg")
    val plan = EventAnalytics.logTemplates(msgs, col("msg"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
    // exchanges carry only (n, tok0, pos)-keyed partials and the
    // vocabulary-sized reassembly — 2 total, neither corpus-sized
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 2, s"expected 2 bounded-key shuffles, got $n:\n$plan")
  }

  test("jsonProfile plan: zero-shuffle explode + one bounded-key aggregate") {
    val rows = Seq(("a", """{"k":1}""")).toDF("event_type", "pj")
    val plan = EventAnalytics.jsonProfile(rows, "event_type", col("pj"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 shuffle, got $n:\n$plan")
  }
}
