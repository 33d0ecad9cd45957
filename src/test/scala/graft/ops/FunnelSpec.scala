package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.hotdog.SparkSpec

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.zipWithIndex.map { case ((u, t, ty), i) =>
      (i.toLong, u, new java.sql.Timestamp(t * 1000L), ty)
    }.toDF("event_id", "user_id", "ts", "event_type")

  private def run(e: org.apache.spark.sql.DataFrame) =
    Funnel.funnelStages(e, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase"))
      .select("user_id", "stage", "t1_us", "t2_us", "t3_us")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap

  test("order matters: steps only count strictly AFTER the previous step") {
    val out = run(ev(
      // user 1: full funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE click → stage 2 only
      (2L, 10L, "view"), (2L, 15L, "purchase"), (2L, 20L, "click"),
      // user 3: click before any view → stage 1 only
      (3L, 5L, "click"), (3L, 10L, "view"),
      // user 4: never viewed → stage 0
      (4L, 10L, "purchase"), (4L, 20L, "click")))
    assert(out(1L)._1 == 3L)
    assert(out(2L)._1 == 2L)
    assert(out(3L)._1 == 1L)
    assert(out(4L)._1 == (0L))
    assert(out(4L)._2.isEmpty && out(4L)._3.isEmpty && out(4L)._4.isEmpty)
  }

  test("earliest-completion semantics: step times are the earliest qualifying") {
    val US = 1000000L
    val out = run(ev(
      (1L, 100L, "view"), (1L, 50L, "view"),      // earliest view = 50
      (1L, 60L, "click"), (1L, 40L, "click"),     // click@40 is too early
      (1L, 55L, "purchase"),                      // before click@60 → no
      (1L, 70L, "purchase")))
    val (stage, t1, t2, t3) = out(1L)
    assert(stage == 3L)
    assert(t1.contains(50L * US))
    assert(t2.contains(60L * US))
    assert(t3.contains(70L * US))
  }

  test("same-timestamp step does NOT qualify (strictly after)") {
    val out = run(ev((1L, 10L, "view"), (1L, 10L, "click")))
    assert(out(1L)._1 == 1L)
  }

  test("plan: all step frames + the per-user aggregate ride ONE exchange") {
    val e = ev((1L, 10L, "view"), (2L, 20L, "click"))
    val plan = Funnel.funnelStages(e, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
