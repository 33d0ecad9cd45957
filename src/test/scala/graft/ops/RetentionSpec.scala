package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.hotdog.SparkSpec

class RetentionSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, u, java.sql.Timestamp.valueOf(d))
    }.toDF("event_id", "user_id", "ts")

  test("cohorts by first-seen day; same-day repeats count once") {
    val e = ev(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"), // day 0 ×2
      (1L, "2024-01-03 10:00:00"),                              // day 2
      (2L, "2024-01-01 23:59:59"), (2L, "2024-01-02 00:00:01"), // day 0, 1
      (3L, "2024-01-02 12:00:00"))                              // own cohort
    val out = Retention.cohortRetention(e, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 1L, ("2024-01-02", 0L) -> 1L))
  }

  test("plan: the per-(cohort,k,user) distinct rides the user-key join partitioning") {
    val e = ev((1L, "2024-01-01 08:00:00"), (2L, "2024-01-02 09:00:00"))
    val plan = Retention.cohortRetention(e, "user_id", "ts")
      .queryExecution.executedPlan.toString
    // 3 exchanges: first-seen agg, events join side, final (cohort,k)
    // agg — the distinct adds NONE (user partitioning co-locates it)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <=3 shuffles, got $exchanges:\n$plan")
  }
}
