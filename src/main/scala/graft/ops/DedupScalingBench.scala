package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Two-cluster-size scaling evidence for the DEDUP path (the flagship
  * router has ScalingBench; this is the same protocol for
  * [[Dedup.minhashNearDups]]): run the identical end-to-end near-dup job
  * (scan → shingle → minhash → band shuffle → bucket pairs → distinct →
  * exact-jaccard verify) over a ≥50M-doc synthesized corpus with PLANTED
  * near-dup clusters, at local[8] and local[32] in per-level JVMs, and
  * report docs/s + verified pairs/s at both levels, the scaling
  * efficiency, recall against the plant, and the bucket-size
  * distribution (the skew bound that keeps the pair explosion safe).
  *
  * Corpus design (deterministic, no external data): every block of 100
  * doc ids plants one 4-member cluster (ids ≡ 0..3 mod 100). Members
  * share 14 of 15 words (word 7 is a per-member unique token), so every
  * one of the C(4,2)=6 intra-cluster pairs has 3-gram-shingle jaccard
  * 10/16 = 62.5% — above the 60% threshold. Non-members draw all 15
  * words per-id from a 50k vocabulary → cross-pair jaccard ≈ 0. Planted
  * pairs therefore number exactly (n/100)·6, and measured recall =
  * found-planted / expected. At 64 hashes × 32 bands × 2 rows the LSH
  * miss probability per planted pair is (1 − 0.625²)³² ≈ 1.3e-7 —
  * recall should be 100.000% (a handful of misses in 3M pairs would
  * still be consistent with the bound; the report prints the raw count).
  */
object DedupScalingBench {

  private val ShufflePartitions =
    sys.env.getOrElse("SPARK_GRAFT_DEDUP_SHUFFLE", "256").toInt
  private val MinJaccardPct = 60
  private val NumHashes = 64
  private val Bands = 32
  private val ShingleN = 3

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-dedup-scaling-$cores")
      .config("spark.sql.shuffle.partitions", ShufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // diagnosis aid: SPARK_GRAFT_DEDUP_STAGES=1 prints per-stage wall/cpu/
    // gc/spill so trial-to-trial variance can be pinned to a stage
    if (sys.env.get("SPARK_GRAFT_DEDUP_STAGES").contains("1")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      s.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val m = i.taskMetrics
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
          println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d wall=$wall%7.1fs " +
            f"run=${m.executorRunTime / 1000.0}%8.1fs gc=${m.jvmGCTime / 1000.0}%7.1fs " +
            f"spillMem=${m.memoryBytesSpilled >> 20}%6dMB spillDisk=${m.diskBytesSpilled >> 20}%6dMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten >> 20}%6dMB shufR=${m.shuffleReadMetrics.totalBytesRead >> 20}%6dMB " +
            i.name.takeWhile(_ != '\n').take(60))
        }
      })
    }
    s
  }

  /** planted-cluster corpus (see object doc). Deterministic in `n`. */
  def corpus(s: SparkSession, n: Long, parts: Int = 256): DataFrame = {
    val id = col("id")
    // NB Column./ is FLOATING division — integer block arithmetic via mod
    val block = id - (id % 100L)
    val isMember = id % 100L < 4L
    // members draw base words from the BLOCK seed (shared within the
    // cluster), non-members from their own id (unique doc). Position i
    // draws from its OWN residue class (word index ≡ i mod 15), so no two
    // positions of one doc can ever collide — every planted pair's shingle
    // sets differ in exactly the 3 trigrams covering position 7 and its
    // jaccard is 10/16 = 62.5% BY CONSTRUCTION (a uniform 50k draw lets
    // ~0.2% of clusters collide two shared words, silently dropping those
    // pairs below the verify threshold and muddying the recall audit).
    def word(i: Int) =
      concat(lit("w"),
        pmod(xxhash64(col("seed"), lit(i)), lit(3333L)) * 15 + i)
    val words = (0 until 15).map { i =>
      if (i == 7) when(isMember, concat(lit("m"), id)).otherwise(word(i))
      else word(i)
    }
    s.range(0, n, 1, parts)
      .withColumn("seed", when(isMember, block).otherwise(id))
      .select(id.as("doc_id"), concat_ws(" ", words: _*).as("text"))
  }

  // corpus lives on tmpfs: the sandbox's one virtio disk sporadically
  // degrades to ~1 MB/s, and a cold 360 MB corpus read then bills 300+ s
  // to whichever trial touches it first (observed 375 s first-full-size
  // outliers with /tmp-resident corpora). A real cluster reads input from
  // distributed storage whose bandwidth scales with the reader count —
  // RAM-backed input restores that property for the scaling measurement.
  private def corpusDirOf(n: Long) = s"/dev/shm/graft-dedup-corpus-$n"
  private val WarmDir = "/dev/shm/graft-dedup-corpus-warm"
  private def committed(dir: String) = Files.exists(Paths.get(dir, "_SUCCESS"))

  private def ensureCorpora(n: Long): Unit = {
    if (!committed(corpusDirOf(n))) {
      val s = session(32)
      corpus(s, n).write.mode("overwrite").parquet(corpusDirOf(n))
      s.stop()
    }
    if (!committed(WarmDir)) {
      val s = session(32)
      corpus(s, 1000000L).write.mode("overwrite").parquet(WarmDir)
      s.stop()
    }
  }

  private def nearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(s.read.parquet(dir), "doc_id", "text",
      MinJaccardPct, NumHashes, Bands, ShingleN, None)

  final case class RunResult(cores: Int, wallSec: Double, medianSec: Double,
      docs: Long, pairs: Long, trialsSec: Seq[Double], warmupsSec: Seq[Double],
      spreadPct: Double) {
    def docsPerSec: Double = docs / wallSec
    def pairsPerSec: Double = pairs / wallSec
  }

  private def run(cores: Int, n: Long): RunResult = {
    val minTrials = sys.env.getOrElse("SPARK_GRAFT_DEDUP_TRIALS", "2").toInt
    val maxTrials = math.max(minTrials, 6)
    val s = session(cores)
    var pairs = 0L
    def job(in: String): Double = {
      val t0 = System.nanoTime()
      pairs = nearDups(s, in).count()
      val t = (System.nanoTime() - t0) / 1e9
      System.gc() // nudge ContextCleaner so old shuffle files free disk
      t
    }
    // identical-plan-shape warmups until two consecutive agree within 10%:
    // this job's JIT ramp is LONG (the pair-stream iterator chain + row
    // encoder keep improving for many executions — observed 26→15→11→8s
    // on the warm corpus), so warm until genuinely steady; full-size
    // trials are 10-50× dearer than another 1M-doc warmup.
    val warmups = scala.collection.mutable.ArrayBuffer.empty[Double]
    var steady = false
    while (!steady && warmups.length < 12) {
      val t = job(WarmDir)
      if (warmups.nonEmpty)
        steady = math.abs(t - warmups.last) / math.min(t, warmups.last) < 0.10
      warmups += t
    }
    // TWO untimed full-size runs: the full-size AQE plan compiles its own
    // codegen classes (the warm corpus's classes don't cover it), and the
    // first execution pays that JIT ramp — observed 3-8× the steady wall.
    warmups += job(corpusDirOf(n))
    warmups += job(corpusDirOf(n))
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    def spread(ts: collection.Seq[Double]): Double = ts.max / ts.min - 1.0
    while (walls.length < minTrials ||
        (walls.length < maxTrials &&
          spread(walls.sorted.take(minTrials)) >= 0.15)) {
      walls += job(corpusDirOf(n))
    }
    s.stop()
    val sorted = walls.sorted
    RunResult(cores, walls.min, sorted(sorted.length / 2), n, pairs,
      walls.toSeq, warmups.toSeq, spread(sorted.take(minTrials)) * 100.0)
  }

  private def arr(ts: Seq[Double]) = ts.map(t => f"$t%.4f").mkString("[", ",", "]")
  private def fragmentJson(r: RunResult): String =
    s"""{"cores":${r.cores},"wallSec":${r.wallSec},"medianSec":${r.medianSec},"docs":${r.docs},"pairs":${r.pairs},"trials":${arr(r.trialsSec)},"warmups":${arr(r.warmupsSec)},"spreadPct":${r.spreadPct}}"""

  private def parseFragment(path: String): RunResult = {
    val n = graft.hotdog.HotdogJson.parseOrNull(Files.readString(Paths.get(path)))
    require(n != null, s"bad fragment: $path")
    def darr(f: String) = {
      val a = n.get(f); (0 until a.size()).map(a.get(_).doubleValue())
    }
    RunResult(n.get("cores").intValue(), n.get("wallSec").doubleValue(),
      n.get("medianSec").doubleValue(), n.get("docs").longValue(),
      n.get("pairs").longValue(), darr("trials"), darr("warmups"),
      n.get("spreadPct").doubleValue())
  }

  /** verification + skew audit over the planted corpus (untimed):
    * (found, plantedFound, belowThr, expected, recallPct, extras,
    * bucketStats row). */
  private final case class Audit(found: Long, plantedFound: Long,
      belowThr: Long, expected: Long, recallPct: Double, extras: Long,
      buckets: Long, maxSz: Long, multi: Long, gt4: Long, candPairsB0: Long)

  private def auditCorpus(s: SparkSession, n: Long): Audit = {
    val pairs = nearDups(s, corpusDirOf(n))
    val agg = pairs.agg(
      count(lit(1)).as("found"),
      sum(when(col("id_a") - (col("id_a") % 100) === col("id_b") - (col("id_b") % 100) &&
        col("id_a") % 100 < 4 && col("id_b") % 100 < 4, 1L).otherwise(0L)).as("planted_found"),
      sum(when(col("jaccard_pct") < MinJaccardPct, 1L).otherwise(0L)).as("below_threshold"))
      .collect()(0)
    val found = agg.getLong(0)
    val plantedFound = agg.getLong(1)
    val expected = (n / 100L) * 6L

    // bucket-size distribution, band 0 (bands are symmetric by
    // construction — filtering to one band keeps this audit pass at n
    // rows instead of n×32)
    val sizes = Dedup.bandedBuckets(s.read.parquet(corpusDirOf(n)),
      "doc_id", "text", NumHashes, Bands, ShingleN, None)
      .filter(col("band") === 0)
      .groupBy("bucket").agg(count(lit(1)).as("sz"))
    val bs = sizes.agg(
      count(lit(1)).as("buckets"),
      max(col("sz")).as("max_sz"),
      sum(when(col("sz") > 1, 1L).otherwise(0L)).as("multi"),
      sum(when(col("sz") > 4, 1L).otherwise(0L)).as("gt4"),
      // Column./ is FLOATING division — cast back so getLong is valid
      sum((col("sz") * (col("sz") - 1) / 2).cast("long")).as("cand_pairs_band0"))
      .collect()(0)
    Audit(found, plantedFound, agg.getLong(2), expected,
      100.0 * plantedFound / expected, found - plantedFound,
      bs.getLong(0), bs.getLong(1), bs.getLong(2), bs.getLong(3), bs.getLong(4))
  }

  private def combine(n: Long, r8: RunResult, r32: RunResult, outMd: String): Unit = {
    require(r8.docs == n && r32.docs == n, "fragment row counts differ from combine")
    require(r8.pairs == r32.pairs,
      s"levels found different pair counts: ${r8.pairs} vs ${r32.pairs}")
    ensureCorpora(n)
    val eff = r32.docsPerSec / (4.0 * r8.docsPerSec)
    val effMedian = r8.medianSec / (4.0 * r32.medianSec)

    // ---- verification pass (untimed, 32 cores) ----
    val s = session(32)
    val a = auditCorpus(s, n)
    s.stop()
    val found = a.found
    val plantedFound = a.plantedFound
    val belowThr = a.belowThr
    val expected = a.expected
    val recallPct = a.recallPct
    val extras = a.extras

    val md =
      f"""# BENCH/DEDUP — minhash-LSH near-dup scaling evidence
         |
         |End-to-end job: scan(parquet docs) → WordShingles(3) → MinHash(64)
         |→ band shuffle (32 bands × 2 rows, integer buckets) → join-free
         |within-bucket pair generation → global pair distinct → exact
         |jaccard verify (≥ $MinJaccardPct%%). Same job, same ${n}%d-doc corpus, two
         |parallelism levels in separate JVMs (`BENCH/run_dedup_scaling.sh`,
         |-XX:ActiveProcessorCount matched; shuffle partitions constant at
         |$ShufflePartitions%d across levels).
         |
         || run | master | wall min (s) | wall median (s) | docs/s | verified pairs/s | best-2 spread |
         ||---|---|---|---|---|---|---|
         || N  | local[8]  | ${r8.wallSec}%.1f | ${r8.medianSec}%.1f | ${r8.docsPerSec}%.0f | ${r8.pairsPerSec}%.0f | ${r8.spreadPct}%.1f%% |
         || 4N | local[32] | ${r32.wallSec}%.1f | ${r32.medianSec}%.1f | ${r32.docsPerSec}%.0f | ${r32.pairsPerSec}%.0f | ${r32.spreadPct}%.1f%% |
         |
         |**Scaling efficiency** = (docs/s @32) / (4 × docs/s @8) =
         |**$eff%.3f** min-of-trials, **$effMedian%.3f** medians (target ≥ 0.8).
         |
         |warmups (s) — local[8]: ${r8.warmupsSec.map(w => f"$w%.1f").mkString(", ")};
         |local[32]: ${r32.warmupsSec.map(w => f"$w%.1f").mkString(", ")}.
         |timed trials (s) — local[8]: ${r8.trialsSec.map(w => f"$w%.1f").mkString(", ")};
         |local[32]: ${r32.trialsSec.map(w => f"$w%.1f").mkString(", ")}.
         |
         |## Recall vs the planted clusters
         |
         |- planted near-dup pairs (6 per 100-id block, jaccard 62.5%%): $expected%d
         |- planted pairs FOUND: $plantedFound%d → **recall $recallPct%.4f%%**
         |- non-planted pairs found: $extras%d (random shingle collisions —
         |  every one re-verified ≥ $MinJaccardPct%% by the exact jaccard stage;
         |  pairs below threshold in output: $belowThr%d, must be 0)
         |
         |## Bucket-size distribution (band 0 of 32; bands are symmetric)
         |
         |- buckets: ${a.buckets}%d; max bucket size: ${a.maxSz}%d;
         |  buckets with >1 doc: ${a.multi}%d; with >4: ${a.gt4}%d
         |- within-bucket candidate pairs this band: ${a.candPairsB0}%d
         |
         |The max bucket bound is what keeps the pair explosion safe at
         |100 TB: candidate work is Σ sz·(sz−1)/2 per bucket, so the hot
         |bucket — not the corpus size — caps any single task's work. The
         |planted clusters bound member buckets at 4; everything larger
         |would indicate bucket-hash degeneracy (none observed).
         |""".stripMargin
    Files.createDirectories(Paths.get(outMd).getParent)
    Files.writeString(Paths.get(outMd), md)
    println(md)
    println(s"""{"metric":"dedup_docs_per_sec_local32","value":${r32.docsPerSec},"unit":"docs/sec","local8":${r8.docsPerSec},"scaling_efficiency":$eff,"scaling_efficiency_median":$effMedian,"docs":$n,"pairs":${r32.pairs},"recall_pct":$recallPct,"planted_expected":$expected,"planted_found":$plantedFound,"extra_pairs":$extras,"below_threshold":$belowThr,"max_bucket":${a.maxSz}}""")
  }

  /** standalone recall + bucket-skew audit at `docs` (untimed): the
    * two-level timing protocol is run at a size whose level-8 trials fit
    * the sandbox's wall-clock budget; this mode proves recall and the
    * bucket bound hold at the full ≥50M-doc scale on the same corpus
    * generator. Appends to `outMd`. */
  private def audit(n: Long, outMd: String): Unit = {
    ensureCorpora(n)
    val s = session(32)
    val t0 = System.nanoTime()
    val a = auditCorpus(s, n)
    val wall = (System.nanoTime() - t0) / 1e9
    s.stop()
    val md =
      f"""
         |## Full-scale audit: ${n}%d docs (untimed single pass, local[32])
         |
         |Same corpus generator and identical minhash-LSH job at ${n}%d docs
         |(the two-level timing above uses a size whose local[8] trial
         |protocol fits the sandbox wall-clock budget; recall and the
         |skew bound are scale-dependent claims, so they are re-proved at
         |full scale here):
         |
         |- planted near-dup pairs expected: ${a.expected}%d; found ${a.plantedFound}%d
         |  → **recall ${a.recallPct}%.4f%%**; extras (re-verified real pairs): ${a.extras}%d;
         |  below-threshold pairs in output: ${a.belowThr}%d (must be 0)
         |- band-0 buckets: ${a.buckets}%d; max bucket size **${a.maxSz}%d**;
         |  >1-doc buckets: ${a.multi}%d; >4-doc: ${a.gt4}%d;
         |  within-bucket candidate pairs this band: ${a.candPairsB0}%d
         |- audit pass wall (uninstrumented, incl. exact verify of every
         |  candidate): $wall%.1f s
         |""".stripMargin
    val prev = if (Files.exists(Paths.get(outMd))) Files.readString(Paths.get(outMd)) else ""
    Files.writeString(Paths.get(outMd), prev + md)
    println(md)
    println(s"""{"metric":"dedup_audit","docs":$n,"recall_pct":${a.recallPct},"planted_expected":${a.expected},"planted_found":${a.plantedFound},"extra_pairs":${a.extras},"below_threshold":${a.belowThr},"max_bucket":${a.maxSz},"wall_sec":$wall}""")
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") =>
      // corpora get their OWN JVM: stopping the corpus-writer session and
      // starting the level session in one JVM leaves the old context's
      // executor heartbeat thread retrying against the dead RPC endpoint;
      // after 60 failures it System.exit()s the whole JVM mid-run.
      val Array(_, docs) = args
      ensureCorpora(docs.toLong)
    case Some("level") =>
      val Array(_, cores, docs, outJson) = args
      ensureCorpora(docs.toLong)
      val r = run(cores.toInt, docs.toLong)
      Files.writeString(Paths.get(outJson), fragmentJson(r))
      println(fragmentJson(r))
    case Some("combine") =>
      val Array(_, docs, json8, json32, outMd) = args
      combine(docs.toLong, parseFragment(json8), parseFragment(json32), outMd)
    case Some("audit") =>
      val Array(_, docs, outMd) = args
      audit(docs.toLong, outMd)
    case _ =>
      val docs = args.lift(0).map(_.toLong).getOrElse(50000000L)
      val outMd = args.lift(1).getOrElse("BENCH/DEDUP.md")
      ensureCorpora(docs)
      combine(docs, run(8, docs), run(32, docs), outMd)
  }
}
