package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — with [[Sessionize]] and [[Funnel]] the third
  * canonical log-analytics operator over a routed event stream: users
  * cohorted by their first-seen day, then for each (cohort day, day
  * offset k) the number of DISTINCT users active k days after their
  * cohort day.
  *
  * Scale shape: three shuffles, all on uniform or bounded keys —
  * (1) the first-seen aggregate on the user key (map-side combinable
  * min), (2) the events-side exchange for the user-key join (the
  * cohort frame reuses its aggregate partitioning; both sides uniform —
  * one row per user on the build side), (3) the final
  * (cohort, k) count. The intermediate per-(cohort, k, user) distinct
  * needs NO exchange of its own: user-key partitioning already
  * co-locates its keys, which Catalyst detects (pinned in tests). No
  * window functions, no per-user ordering — this is the operator's
  * advantage over sessionization at 100 TB: pure hash aggregation.
  */
object Retention {

  /** (cohort_day string yyyy-MM-dd, day_k, n_users) — distinct `userCol`
    * active `day_k` days after their first-seen day. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val e = events.select(col(userCol),
      to_date(col(tsCol).cast("timestamp")).as("_d"))
    val first = e.groupBy(col(userCol)).agg(min(col("_d")).as("_cohort"))
    e.join(first, userCol)
      .select(col("_cohort"),
        datediff(col("_d"), col("_cohort")).cast("long").as("day_k"),
        col(userCol))
      .distinct()
      .groupBy(col("_cohort"), col("day_k"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("_cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_k"), col("n_users"))
  }
}
