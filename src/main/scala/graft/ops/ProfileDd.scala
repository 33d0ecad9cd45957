package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profile of the dedup hot path (dev tool). */
object ProfileDd {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { trial =>
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[dd-profile] $name%-32s trial$trial $s%8.2f s   ($n)")
      }
    }

    time("scan")(docs.count())
    time("normalize+words")(
      docs.select(sum(size(TextAnalysis.words(col("text"))))).collect()(0).getLong(0))
    time("shingles n=3")(
      docs.select(sum(size(Dedup.shingles(col("text"))))).collect()(0).getLong(0))
    time("shingles n=1")(
      docs.select(sum(size(Dedup.shingles(col("text"), 1)))).collect()(0).getLong(0))
    time("minhashSig(shingles3)")(
      docs.select(max(element_at(
        opscol.minhashSig(Dedup.shingles(col("text")), 64), 1))).count())
    time("bands(sig3)")(
      docs.select(max(element_at(opscol.minhashBands(
        opscol.minhashSig(Dedup.shingles(col("text")), 64), 16), 1))).count())
    val mh = Dedup.minhashNearDups(docs, "doc_id", "text", 60)
    time("dd_minhash full")(mh.count())
    val ws = Dedup.minhashNearDups(docs, "doc_id", "text", 60,
      numHashes = 64, bands = 32, shingleN = 1, groupCol = Some("source"))
    time("dd_wordset full")(ws.count())
    mh.explain("formatted")
    spark.stop()
  }
}
