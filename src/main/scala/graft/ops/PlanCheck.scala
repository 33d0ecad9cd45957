package graft.ops
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def check(tag: String, df: org.apache.spark.sql.DataFrame, needle: String): Unit = {
      val p = df.queryExecution.optimizedPlan.toString()
      val inFilter = p.linesIterator.filter(_.contains("Filter")).count(_.contains(needle))
      println(s"$tag: '$needle' appears in $inFilter Filter lines; total occurrences=${needle.r.findAllIn(p).length}")
    }
    val docs = graft.Queries.table(spark, dir, "documents")
    check("bandedBuckets", Dedup.bandedBuckets(docs, "doc_id", "text", 64, 32, 3, None), "minhash_sig")
    check("simhashNearDups", Dedup.simhashNearDups(docs, "doc_id", "text"), "simhash64")
    check("vocabulary", Mixing.vocabulary(docs, "doc_id", "text", 10), "regexp_replace")
    val emb = graft.Queries.table(spark, dir, "embeddings")
    check("lshCosine-banding", Similarity.embeddingNearDups(emb, "vec_id", "embedding", 999000L, 8, 4), "hyperplane_sig")
    spark.stop()
  }
}
