package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the payload of the LATEST right row
  * with the same key and rightTime <= leftTime (left-outer: null payload
  * when no prior right row exists).
  *
  * Spark has no native asof join, and the naive range-join formulation
  * (`l JOIN r ON key AND r.t <= l.t` + max-per-left) explodes to O(L×R)
  * per key. This is the scale-safe composition: tag + union both sides,
  * ONE shuffle on the key, per-key time-ordered window carrying the last
  * right payload forward — O((L+R)·log) work, no pair blowup, and the
  * window sort is exactly the shuffle's sort at 1000-executor scale.
  *
  * Ties: a right row at exactly leftTime IS visible (inclusive), ordered
  * before the left row at equal time. Right rows must be unique per
  * (key, rightTime) for deterministic results — pre-aggregate otherwise.
  *
  * Skew note: the per-key window is the one place in this library where
  * a hot KEY still serializes (a carry chain is inherently sequential in
  * event time — the salting that fixes top-k rankings cannot apply). At
  * 100 TB the mitigation is domain-side: split a pathological key by a
  * coarse time bucket and stitch the per-bucket boundary carries — the
  * two-pass form of the same window. Every engine with as-of semantics
  * (kdb, Flink temporal join, DuckDB ASOF) shares this per-key order
  * dependency.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // a null right time can never satisfy rightTime <= leftTime — without
    // this filter the asc sort puts nulls FIRST and their payload would be
    // carried into left rows that have no real match. Null KEYS likewise
    // never match in SQL asof semantics (DuckDB ASOF joins on equality),
    // but Window.partitionBy groups nulls together — so null-key right
    // rows must be dropped too, or a null-key left row would inherit them.
    val r = keyCols.foldLeft(right.filter(col(rightTime).isNotNull)) {
      (df, k) => df.filter(col(k).isNotNull)
    }
      .select(
        keyCols.map(col) :+ col(rightTime).as("_asof_t") :+
          struct(payloadCols.map(col): _*).as("_asof_payload"): _*)
      .withColumn("_asof_src", lit(0))
    val l = left
      .withColumn("_asof_t", col(leftTime))
      .withColumn("_asof_src", lit(1))
    // unionByName fills the schema gap with nulls on both sides
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_t").asc, col("_asof_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof_carried", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_src") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"_asof_carried.$c").as(c)): _*)
  }
}
