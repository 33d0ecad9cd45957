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
    // stage splits of the wordset variant
    val banded = docs
      .select(col("source"), col("doc_id").as("id"),
        opscol.minhashBands(
          opscol.minhashSig(Dedup.shingles(col("text"), 1), 64), 32).as("bb"))
      .select(col("source"), col("id"), posexplode(col("bb")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("ws banded rows")(banded.count())
    val l = banded.select(col("source"), col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("source"), col("band"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r, Seq("source", "band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    time("ws band-join rows")(cand.count())
    val candD = cand.distinct()
    time("ws candidates distinct")(candD.count())
    val sig = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 1).as("sh"))
    val verified = candD
      .join(sig.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("j", Dedup.jaccardPct(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 60)
    time("ws verify join+jaccard")(verified.count())
    // production path stages (withinBucketPairs form)
    val prodBanded = Dedup.bandedBuckets(docs, "doc_id", "text", 64, 32, 1,
      Some("source"))
    val prodPairs = Dedup.withinBucketPairs(prodBanded.drop("band"),
      Seq("bucket", "source"), Seq("id"))
    time("ws wbp pair stream")(prodPairs.count())
    time("ws wbp pairs distinct")(prodPairs.distinct().count())
    time("ws wbp exchange only")(
      prodPairs.repartition(col("id_a"), col("id_b")).count())
    time("ws wbp exchange+sort")(
      prodPairs.repartition(col("id_a"), col("id_b"))
        .sortWithinPartitions(col("id_a"), col("id_b")).count())
    val sig1 = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 1).as("sh"))
    val ver1 = prodPairs.distinct()
      .join(sig1.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sig1.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("j", Dedup.jaccardPct(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 60)
    time("ws wbp verify precomp")(ver1.count())
    // experiment: join-free candidate generation (one banded scan,
    // collect_list per bucket, explode² pairs)
    val bucketed = banded.groupBy("source", "band", "bucket")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val cand2 = bucketed
      .select(col("ids"), explode(col("ids")).as("id_a"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    time("ws cand via collect_list")(cand2.count())
    time("ws cand collect_list distinct")(cand2.distinct().count())
    mh.explain("formatted")
    spark.stop()
  }
}
