package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the two per-query top-k ranking idioms over the
  * IDENTICAL ivfTopK candidate frame — the controlled experiment that
  * separates "the round-5 salted rank regressed IVF" from "the box was
  * noisy when the campaign re-ran".
  *
  *  arm `salted`: Ranks.topKPerGroup (phase-1 rank within (query, salt),
  *                phase-2 rank of the ≤ salts·k survivors) — current
  *                Similarity.ivfTopK.
  *  arm `window`: the single row_number window the salted form replaced
  *                (round-4 ivfTopK).
  *
  * Protocol: one JVM, alternating trials (salted, window, salted, ...)
  * so host drift hits both arms symmetrically; per-arm best and median
  * reported plus the salted/window wall ratio; both arms' counts must
  * agree. Uses the AnnScalingBench corpus layout
  * (/dev/shm/graft-ann-{corpus,queries}-N, planted-neighbor geometry,
  * nlist=256, nprobe=4, k=5 — the campaign's IVF configuration).
  */
object RankAbBench {

  private val K = 5

  private def salted(scored: DataFrame): DataFrame =
    Ranks.topKPerGroup(scored, col("query_id"), col("neighbor_id"),
      Seq(col("sim").desc, col("neighbor_id").asc), K, "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_e6"))

  private def window(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_e6"))
  }

  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cores = args(1).toInt
    val pairs = if (args.length > 2) args(2).toInt else 3
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-rank-ab-$cores")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def scored(): DataFrame = Similarity.ivfScored(
      s.read.parquet(s"/dev/shm/graft-ann-corpus-$n"),
      s.read.parquet(s"/dev/shm/graft-ann-queries-$n"),
      "vec_id", "embedding", nlist = 256, nprobe = 4, centroids = None)

    def trial(rank: DataFrame => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = rank(scored()).count()
      ((System.nanoTime() - t0) / 1e9, c)
    }

    // one untimed warmup per arm (codegen/JIT), then alternate
    val (wS, _) = trial(salted); val (wW, _) = trial(window)
    val results = (1 to pairs).map { _ =>
      val (ts, cs) = trial(salted)
      val (tw, cw) = trial(window)
      require(cs == cw, s"arm row counts diverge: salted=$cs window=$cw")
      (ts, tw)
    }
    val sArm = results.map(_._1).sorted
    val wArm = results.map(_._2).sorted
    def med(xs: Seq[Double]) = xs(xs.length / 2)
    println(f"""{"metric":"rank_ab_ivf","n":$n,"cores":$cores,"warmup_salted":$wS%.3f,"warmup_window":$wW%.3f,"salted":${sArm.map(t => f"$t%.3f").mkString("[", ",", "]")},"window":${wArm.map(t => f"$t%.3f").mkString("[", ",", "]")},"ratio_best":${sArm.head / wArm.head}%.4f,"ratio_median":${med(sArm) / med(wArm)}%.4f}""")
    s.stop()
  }
}
