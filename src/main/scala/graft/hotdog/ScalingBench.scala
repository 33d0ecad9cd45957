package graft.hotdog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Sandbox stand-in for the north rule's two-cluster-size criterion
  * (BASELINE.md): run the SAME end-to-end job (scan → decode → parse →
  * route → fan-out sink) on the SAME materialized corpus at local[8] and
  * local[32], report routed rows/sec at both plus
  * eff = (rows/s @32) / (4 × rows/s @8), and verify 100% token-array
  * equality + per-sink count parity on the routed output.
  *
  * Faithful cluster-size emulation needs each level in its OWN JVM with
  * `-XX:ActiveProcessorCount=<cores>`: in a shared 32-CPU JVM the
  * "8-core cluster" borrows the idle 24 cores for GC/JIT/fork-join
  * threads, overstating the small cluster and understating the measured
  * scaling efficiency. Orchestration (BENCH/run_scaling.sh):
  *
  *   spark-submit --master local[8]  --driver-java-options
  *     -XX:ActiveProcessorCount=8  ... ScalingBench level 8  ROWS /tmp/sb8.json
  *   spark-submit --master local[32] --driver-java-options
  *     -XX:ActiveProcessorCount=32 ... ScalingBench level 32 ROWS /tmp/sb32.json
  *   spark-submit ... ScalingBench combine ROWS /tmp/sb8.json /tmp/sb32.json BENCH/BASELINE.md
  *
  * Legacy single-JVM mode (`ScalingBench [rows] [outMd]`) is kept for
  * convenience but inherits the shared-GC caveat above.
  */
object ScalingBench {

  /** Shuffle partitioning is sized to the DATA, constant across cluster
    * sizes (as in production — tasks ≫ cores is the normal regime). Tying
    * it to the core count would make the two levels run different plans:
    * the bigger cluster would write 4× the sink files and pay 4× the
    * commit overhead, which is a benchmarking artifact, not scaling. */
  private val ShufflePartitions =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "32").toInt

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", ShufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class RunResult(cores: Int, wallSec: Double, medianSec: Double,
      inputRows: Long, routedRows: Long, trialsSec: Seq[Double],
      warmupsSec: Seq[Double], spreadPct: Double) {
    def routedPerSec: Double = routedRows / wallSec
    def inputPerSec: Double = inputRows / wallSec
  }

  /** Base dir for corpus + sink. Default /tmp (virtio disk); campaigns
    * that must not be disk-confounded (the 96M volume-series control vs
    * BENCH/STREAMING.md, which runs entirely on tmpfs) set
    * SPARK_GRAFT_BENCH_DIR=/dev/shm — a shared single-box disk otherwise
    * bills its sporadic ~1MB/s degradations to random trials. */
  private val BaseDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp")
  private def corpusDirOf(rows: Long) = s"$BaseDir/graft-bench-corpus-$rows"
  private val WarmDir = s"$BaseDir/graft-bench-corpus-warm"

  /** a corpus dir is valid only when its write COMMITTED (_SUCCESS marker)
    * — a killed generation leaves a partial dir that must be rebuilt */
  private def committed(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_SUCCESS"))

  /** materialize the timed corpus + the warm corpus once (not timed) */
  private def ensureCorpora(rows: Long): Unit = {
    if (!committed(corpusDirOf(rows))) {
      val s = session(32)
      Corpus.sequences(s, rows).write.mode("overwrite").parquet(corpusDirOf(rows))
      s.stop()
    }
    // small warm corpus with the SAME schema/layout: warming with the
    // identical plan shape hits the JVM-global codegen cache, so the timed
    // trials run fully C2-JIT-compiled code (a cold generated class runs
    // tiered for tens of seconds and skews results 3-10x on this box)
    if (!committed(WarmDir)) {
      val s = session(32)
      Corpus.sequences(s, 2000000).write.mode("overwrite").parquet(WarmDir)
      s.stop()
    }
  }

  private def run(cores: Int, rows: Long): RunResult = {
    val cfg = Configs.flagship
    val minTrials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt
    val maxTrials = math.max(minTrials, 8)
    val s = session(cores)
    val outDir = s"$BaseDir/graft-bench-out-$cores"
    def job(in: String, out: String): Double = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val t0 = System.nanoTime()
      Pipeline.writeFanOut(Router.route(s.read.parquet(in), cfg), out,
        batchId = 0L, saltBuckets = ShufflePartitions)
      (System.nanoTime() - t0) / 1e9
    }
    // adaptive warmup on the identical-plan-shape warm corpus: repeat
    // until two consecutive warm runs agree within 15% (codegen cached,
    // C2-JIT steady) so the FIRST timed trial is already representative
    val warmups = scala.collection.mutable.ArrayBuffer.empty[Double]
    var steady = false
    while (!steady && warmups.length < 6) {
      val t = job(WarmDir, s"$outDir-warm")
      if (warmups.nonEmpty) {
        val prev = warmups.last
        steady = math.abs(t - prev) / math.min(t, prev) < 0.15
      }
      warmups += t
    }
    // one untimed FULL-SIZE job: the small warm corpus gets codegen+JIT
    // steady but not the full-size shuffle/GC regime — without this the
    // early timed trials still trend downward and drag the median
    warmups += job(corpusDirOf(rows), outDir)
    // timed trials, extended until the trial spread (max/min - 1) of the
    // best `minTrials` window is under 15% or the cap is hit
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    def spread(ts: collection.Seq[Double]): Double = ts.max / ts.min - 1.0
    while (walls.length < minTrials ||
        (walls.length < maxTrials &&
          spread(walls.sorted.take(minTrials)) >= 0.15)) {
      walls += job(corpusDirOf(rows), outDir)
    }
    val routedRows = s.read.parquet(outDir).count()
    s.stop()
    val sorted = walls.sorted
    val median = sorted(sorted.length / 2)
    // min of trials = the machine's actual capability (shared-box noise
    // and stray JIT recompiles only ever ADD time); median reported
    // alongside so the reader can judge stability
    RunResult(cores, walls.min, median, rows, routedRows, walls.toSeq,
      warmups.toSeq, spread(sorted.take(minTrials)) * 100.0)
  }

  private def arr(ts: Seq[Double]) = ts.map(t => f"$t%.4f").mkString("[", ",", "]")

  private def fragmentJson(r: RunResult): String =
    s"""{"cores":${r.cores},"wallSec":${r.wallSec},"medianSec":${r.medianSec},"inputRows":${r.inputRows},"routedRows":${r.routedRows},"trials":${arr(r.trialsSec)},"warmups":${arr(r.warmupsSec)},"spreadPct":${r.spreadPct}}"""

  private def parseFragment(path: String): RunResult = {
    val n = HotdogJson.parseOrNull(Files.readString(Paths.get(path)))
    require(n != null, s"bad fragment: $path")
    def darr(field: String): Seq[Double] = {
      val a = n.get(field)
      (0 until a.size()).map(a.get(_).doubleValue())
    }
    RunResult(n.get("cores").intValue(), n.get("wallSec").doubleValue(),
      n.get("medianSec").doubleValue(), n.get("inputRows").longValue(),
      n.get("routedRows").longValue(), darr("trials"), darr("warmups"),
      n.get("spreadPct").doubleValue())
  }

  private def combine(rows: Long, r8: RunResult, r32: RunResult,
      outMd: String, perLevelJvm: Boolean): Unit = {
    require(r8.inputRows == rows && r32.inputRows == rows,
      s"fragments were run with different rows (${r8.inputRows}/${r32.inputRows}) than combine ($rows)")
    require(r8.routedRows == r32.routedRows,
      s"levels routed different row counts: ${r8.routedRows} vs ${r32.routedRows}")
    ensureCorpora(rows) // the verification pass re-reads the corpus
    val cfg = Configs.flagship
    val eff = r32.routedPerSec / (4.0 * r8.routedPerSec)
    // medians are robust to the slow tail on a shared box; report both
    val effMedian = r8.medianSec / (4.0 * r32.medianSec)

    // ---- verification pass (not timed): equality + count parity ----
    // single aggregation over the recomputed routed frame (no cache: the
    // wide rows incl token arrays would not fit a small heap at 8M+ rows)
    val s = session(32)
    val perTopic = Pipeline.emittedOnly(Router.route(s.read.parquet(corpusDirOf(rows)), cfg))
      .groupBy("topic").agg(
        count(lit(1)).as("n"),
        sum(when(exprs.stringToCodepoints(col("line")) === col("tokens"), 0L)
          .otherwise(1L)).as("bad"))
      .collect()
    val nRouted = perTopic.map(_.getLong(1)).sum
    val nBad = perTopic.map(_.getLong(2)).sum
    val sparkCounts = perTopic.map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent per-sink counts from the written sink files of the 32-core run
    val sinkCounts = s.read.parquet(s"$BaseDir/graft-bench-out-32")
      .groupBy("topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val parity = sparkCounts == sinkCounts
    s.stop()

    val isolation =
      if (perLevelJvm)
        """Each level ran in its OWN JVM via spark-submit with
          |`-XX:ActiveProcessorCount=<cores>`, so the 8-core run's GC/JIT/
          |fork-join threads are sized for 8 CPUs like a real 8-core
          |cluster node (a shared 32-CPU JVM lets the small "cluster"
          |borrow idle cores and understates scaling).""".stripMargin
      else
        """CAVEAT: both levels shared one 32-CPU JVM (legacy mode) — the
          |8-core run borrows idle cores for GC/JIT, which can understate
          |the measured efficiency.""".stripMargin

    val md =
      f"""# BENCH/BASELINE — scaling evidence (sandbox protocol per BASELINE.md)
         |
         |End-to-end job: scan(parquet sequences) → decode(tokens) →
         |syslog parse → rule-cascade route (hotdog.yml semantics) →
         |fan-out parquet sink partitioned by topic. Same job, same input,
         |two parallelism levels ("cluster sizes" N=8, 4N=32 cores).
         |
         || run | master | shuffle.partitions | wall min (s) | wall median (s) | input rows/s | routed rows/s | best-3 spread |
         ||---|---|---|---|---|---|---|---|
         || N  | local[8]  | $ShufflePartitions%d | ${r8.wallSec}%.1f | ${r8.medianSec}%.1f | ${r8.inputPerSec}%.0f | ${r8.routedPerSec}%.0f | ${r8.spreadPct}%.1f%% |
         || 4N | local[32] | $ShufflePartitions%d | ${r32.wallSec}%.1f | ${r32.medianSec}%.1f | ${r32.inputPerSec}%.0f | ${r32.routedPerSec}%.0f | ${r32.spreadPct}%.1f%% |
         |
         |Shuffle partitioning (and sink salt buckets) are sized to the data
         |and held CONSTANT across the two cluster sizes, as in production —
         |tying them to the core count would make the levels run different
         |plans (4× the sink files and commit overhead on the big cluster).
         |
         |$isolation
         |
         |Per-level protocol: UNTIMED warmups with the identical plan shape
         |repeated until two consecutive agree within 15%% (codegen cache +
         |C2-JIT steady state), then timed trials extended until the best-3
         |spread is <15%% (cap 8). Min reported as capability, median for
         |stability.
         |warmups (s) — local[8]: ${r8.warmupsSec.map(w => f"$w%.1f").mkString(", ")};
         |local[32]: ${r32.warmupsSec.map(w => f"$w%.1f").mkString(", ")}.
         |timed trials (s) — local[8]: ${r8.trialsSec.map(w => f"$w%.1f").mkString(", ")};
         |local[32]: ${r32.trialsSec.map(w => f"$w%.1f").mkString(", ")}.
         |
         |**Scaling efficiency** = (routed/s @32) / (4 × routed/s @8) =
         |**$eff%.3f** from min-of-trials, **$effMedian%.3f** from medians
         |(target ≥ 0.8).
         |
         |Input: ${rows}%d deterministically synthesized sequences
         |(seed 42, ~50%% hot-source skew), materialized to parquet once and
         |read by both runs.
         |
         |Verification on the routed output (not timed):
         |- routed rows: $nRouted%d; token-array equality failures: $nBad%d
         |  (pass rate ${(100.0 * (nRouted - nBad) / math.max(nRouted, 1))}%.2f%%)
         |- per-sink count parity (router counts == written sink counts): $parity
         |""".stripMargin

    Files.createDirectories(Paths.get(outMd).getParent)
    Files.writeString(Paths.get(outMd), md)
    println(md)
    println(s"""{"metric":"routed_rows_per_sec_local32","value":${r32.routedPerSec},"unit":"rows/sec","local8":${r8.routedPerSec},"scaling_efficiency":$eff,"rows":$rows,"token_equality_failures":$nBad,"count_parity":$parity,"per_level_jvm":$perLevelJvm,"trials8":${arr(r8.trialsSec)},"trials32":${arr(r32.trialsSec)},"warmups8":${arr(r8.warmupsSec)},"warmups32":${arr(r32.warmupsSec)},"median8":${r8.medianSec},"median32":${r32.medianSec},"spread8_pct":${r8.spreadPct},"spread32_pct":${r32.spreadPct},"scaling_efficiency_median":$effMedian}""")
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") =>
      // corpora in their OWN JVM: ensureCorpora inside a `level` JVM
      // stops the writer session before the bench session starts, and a
      // stopped context's executor heartbeat thread System.exits the JVM
      // ~10 min later (BENCH/run_dedup_scaling.sh notes)
      ensureCorpora(args(1).toLong)
    case Some("level") =>
      val Array(_, cores, rows, outJson) = args
      ensureCorpora(rows.toLong)
      val r = run(cores.toInt, rows.toLong)
      Files.writeString(Paths.get(outJson), fragmentJson(r))
      println(fragmentJson(r))
    case Some("combine") =>
      val Array(_, rows, json8, json32, outMd) = args
      combine(rows.toLong, parseFragment(json8), parseFragment(json32),
        outMd, perLevelJvm = true)
    case _ => // legacy single-JVM mode
      val rows = args.lift(0).map(_.toLong).getOrElse(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "8000000").toLong)
      val outMd = args.lift(1).getOrElse("BENCH/BASELINE.md")
      ensureCorpora(rows)
      combine(rows, run(8, rows), run(32, rows), outMd, perLevelJvm = false)
  }
}
