package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileTok {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
      }
    }
    val seqs = graft.Queries.eventSequences(spark, dir).select("doc_id", "tokens", "event_id")
    time("grams-render-train") {
      seqs.filter(col("event_id") % 23 =!= 0)
        .select(col("doc_id"), explode(opscol.tokenGramKeys(col("tokens"), 12, distinct = true)).as("_g"))
        .count()
    }
    time("eval-distinct") {
      seqs.filter(col("event_id") % 23 === 0)
        .select(explode(opscol.tokenGramKeys(col("tokens"), 12, distinct = true)).as("_g"))
        .distinct().count()
    }
    time("full tok_contam") { graft.Queries.tokContam(spark, dir).count() }
    spark.stop()
  }
}
