package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the connected-components path: how much of
  * dd_components is pair generation vs label-propagation rounds.
  * Usage: runMain graft.ops.ProfileCc /root/testdata/sf0.1
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // pass 1: pair pipeline alone (count), warmup + timed
    val mkPairs = () => Dedup.minhashNearDups(docs, "doc_id", "text",
      minJaccardPct = 60, numHashes = 64, bands = 32, shingleN = 1,
      groupCol = Some("source"))
    time("pairs warmup")(mkPairs().count())
    time("pairs timed")(mkPairs().count())
    // pass 2: CC over a MATERIALIZED pair list (isolates round cost)
    val mat = mkPairs().localCheckpoint()
    time("cc over materialized pairs (warm run 1)")(
      Components.dedupVerdict(mat, "id_a", "id_b").count())
    time("cc over materialized pairs (warm run 2)")(
      Components.dedupVerdict(mat, "id_a", "id_b").count())
    // pass 3: the full dd_components query shape
    time("full dedupVerdict incl pair pipeline")(
      Components.dedupVerdict(mkPairs(), "id_a", "id_b").count())
    spark.stop()
  }
}
