package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion — with [[Sessionize]], the other canonical
  * log-analytics operator a router's consumers run: for each user, how
  * far through an ordered step sequence (e.g. view → click → purchase)
  * did they get, with each step STRICTLY after the previous one
  * (earliest-completion semantics: step k's time is the earliest
  * qualifying event after the earliest completion of step k−1).
  *
  * Scale shape: one hash-shuffle on the user key. Every step's
  * qualification is a running-`min` window frame (streaming, O(1)
  * buffer) over the SAME (user, ts, id) sort — Spark plans all k frames
  * plus the final per-user aggregate on one exchange and one sort, so
  * adding funnel steps adds no shuffles. Per-user data in one task is
  * inherent to the semantics (same bounded-key contract as
  * [[Sessionize]]).
  */
object Funnel {

  /** Per-user funnel verdict: `stage` = number of steps completed, and
    * `t<k>_us` = micros time of step k's earliest qualifying completion
    * (null once a step is unreached). */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tUs = unix_micros(col(tsCol).cast("timestamp"))

    // step 1 qualifies unconditionally; step k qualifies iff it is
    // strictly after the running-earliest completion of step k-1
    val qualified = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val isStep = col(typeCol) === lit(step)
        val q: Column =
          if (i == 0) when(isStep, tUs)
          else {
            val prevCum = min(col(s"_q${i - 1}")).over(w)
            when(isStep.and(prevCum.isNotNull).and(tUs > prevCum), tUs)
          }
        df.withColumn(s"_q$i", q)
    }

    val stepMins = steps.indices.map(i =>
      min(col(s"_q$i")).as(s"t${i + 1}_us"))
    val stage = steps.indices.foldLeft(lit(0L)) {
      case (acc, i) => when(col(s"t${i + 1}_us").isNotNull,
        lit((i + 1).toLong)).otherwise(acc)
    }
    qualified.groupBy(col(userCol))
      .agg(stepMins.head, stepMins.tail: _*)
      .withColumn("stage", stage)
  }
}
