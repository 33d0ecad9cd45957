package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-batch duration breakdown of the streaming driver queries (dev
  * tool): attaches a StreamingQueryListener and prints each progress
  * event's durationMs map (triggerExecution, queryPlanning, getBatch,
  * addBatch, walCommit, commitOffsets, latestOffset) so the streaming
  * floor can be attributed to machinery vs data. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("ev_stream_join")
    // extra args: k=v pairs applied as session confs before the query runs
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    confs.foreach { case (k, v) =>
      println(s"[stream-profile] conf $k=$v"); spark.conf.set(k, v)
    }
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream-profile] started ${e.name} at ${System.nanoTime() / 1000000}ms")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[stream-profile] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"rows=${s.numRowsTotal},commit=${s.commitTimeMs}ms").mkString(";")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream-profile] terminated at ${System.nanoTime() / 1000000}ms")
    })
    val fn = graft.SparkEntry.queries(which)
    (1 to 2).foreach { trial =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[stream-profile] $which trial$trial ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
