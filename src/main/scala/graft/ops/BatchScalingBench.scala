package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Two-cluster-size scaling evidence for the BATCH-ASSEMBLY path:
  * [[Packing.lengthBucketBatches]] end-to-end over an N-doc manifest at
  * two parallelism levels in per-level JVMs, reporting docs/s at both
  * plus the scaling efficiency — the same protocol as
  * [[EvScalingBench]] (256-constant shuffle partitions, AQE coalescing
  * off, ActiveProcessorCount matched, tmpfs corpus + shuffle).
  *
  * Corpus design (deterministic, no external data): 80% of docs draw
  * lengths 481..512 — ALL of them pad to the SAME 512 bucket at grain
  * 64. That is the operator's claimed worst case ("every web doc pads
  * to 512"): a naive per-bucket `row_number` window would sort 0.8·N
  * rows in ONE partition; the two-level scan must instead spread the
  * hot bucket across range partitions and still produce the identical
  * batch table. The other 20% spread over lengths 32..2047 (~31 cold
  * buckets), so multi-bucket bookkeeping runs alongside the flood.
  *
  * Correctness across levels: batch count, Σ n_seqs = N, Σ n_tok_real =
  * the corpus token total, and an order-insensitive checksum over EVERY
  * output column must be equal at both levels; an untimed audit asserts
  * per-bucket batch indices are exactly 0..ceil(count/capacity)-1 and
  * every batch fills to capacity except each bucket's last.
  */
object BatchScalingBench {

  private val ShufflePartitions =
    sys.env.getOrElse("SPARK_GRAFT_BATCH_SHUFFLE", "256").toInt
  private val Budget = 8192L
  private val Grain = 64L

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-batch-scaling-$cores")
      .config("spark.sql.shuffle.partitions", ShufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // constant reduce-task count is load-bearing (see EvScalingBench:
      // coalescing re-derives tasks from bytes and collapses the 256
      // constant to one wave); skew split stays on — it is the feature
      // under test on the hot bucket's range partitions
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** deterministic doc manifest: (doc_id, n_tok), 80% in the 512 bucket */
  def corpus(s: SparkSession, n: Long, parts: Int = 256): DataFrame = {
    val id = col("id")
    s.range(0, n, 1, parts)
      .select(id.as("doc_id"),
        when(pmod(xxhash64(id, lit(19L)), lit(10L)) < 8,
          lit(481L) + pmod(xxhash64(id, lit(23L)), lit(32L)))
          .otherwise(lit(32L) + pmod(xxhash64(id, lit(29L)), lit(2016L)))
          .as("n_tok"))
  }

  private def corpusDirOf(n: Long) = s"/dev/shm/graft-batch-corpus-$n"
  private val WarmDir = "/dev/shm/graft-batch-corpus-warm"
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

  /** One full job: the batch table forced through a totals aggregate
    * reading EVERY output column. Returns (batches, sumSeqs, sumTok,
    * checksum). */
  private def totals(s: SparkSession, dir: String): (Long, Long, Long, Long) = {
    val out = Packing.lengthBucketBatches(s.read.parquet(dir),
      "doc_id", "n_tok", Budget, Grain)
    val r = out.agg(
      count(lit(1)).as("batches"),
      sum(col("n_seqs")).as("sum_seqs"),
      sum(col("n_tok_real")).as("sum_tok"),
      sum(pmod(hash(col("padded_len"), col("batch_idx"), col("n_seqs"),
        col("n_tok_real"), col("first_doc"), col("last_doc"),
        col("n_tok_padded"), col("waste")),
        lit(1000000007L))).as("checksum"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  final case class RunResult(cores: Int, wallSec: Double, medianSec: Double,
      docs: Long, batches: Long, sumTok: Long, checksum: Long,
      trialsSec: Seq[Double], warmupsSec: Seq[Double], spreadPct: Double) {
    def docsPerSec: Double = docs / wallSec
  }

  private def run(cores: Int, n: Long): RunResult = {
    val minTrials = sys.env.getOrElse("SPARK_GRAFT_BATCH_TRIALS", "2").toInt
    val maxTrials = math.max(minTrials, 6)
    val s = session(cores)
    var batches = 0L; var sumSeqs = 0L; var sumTok = 0L; var checksum = 0L
    def job(in: String): Double = {
      val t0 = System.nanoTime()
      val (b, ss, st, ck) = totals(s, in)
      batches = b; sumSeqs = ss; sumTok = st; checksum = ck
      val t = (System.nanoTime() - t0) / 1e9
      System.gc()
      t
    }
    val warmups = scala.collection.mutable.ArrayBuffer.empty[Double]
    var steady = false
    while (!steady && warmups.length < 12) {
      val t = job(WarmDir)
      if (warmups.nonEmpty)
        steady = math.abs(t - warmups.last) / math.min(t, warmups.last) < 0.10
      warmups += t
    }
    warmups += job(corpusDirOf(n))
    warmups += job(corpusDirOf(n))
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    def spread(ts: collection.Seq[Double]): Double = ts.max / ts.min - 1.0
    while (walls.length < minTrials ||
        (walls.length < maxTrials &&
          spread(walls.sorted.take(minTrials)) >= 0.15)) {
      walls += job(corpusDirOf(n))
    }
    require(sumSeqs == n, s"batch tiling lost rows: $sumSeqs != $n")
    s.stop()
    val sorted = walls.sorted
    RunResult(cores, walls.min, sorted(sorted.length / 2), n, batches,
      sumTok, checksum, walls.toSeq, warmups.toSeq,
      spread(sorted.take(minTrials)) * 100.0)
  }

  private def arr(ts: Seq[Double]) = ts.map(t => f"$t%.4f").mkString("[", ",", "]")
  private def fragmentJson(r: RunResult): String =
    s"""{"cores":${r.cores},"wallSec":${r.wallSec},"medianSec":${r.medianSec},"docs":${r.docs},"batches":${r.batches},"sumTok":${r.sumTok},"checksum":${r.checksum},"trials":${arr(r.trialsSec)},"warmups":${arr(r.warmupsSec)},"spreadPct":${r.spreadPct}}"""

  private def parseFragment(path: String): RunResult = {
    val n = graft.hotdog.HotdogJson.parseOrNull(Files.readString(Paths.get(path)))
    require(n != null, s"bad fragment: $path")
    def darr(f: String) = {
      val a = n.get(f); (0 until a.size()).map(a.get(_).doubleValue())
    }
    RunResult(n.get("cores").intValue(), n.get("wallSec").doubleValue(),
      n.get("medianSec").doubleValue(), n.get("docs").longValue(),
      n.get("batches").longValue(), n.get("sumTok").longValue(),
      n.get("checksum").longValue(), darr("trials"), darr("warmups"),
      n.get("spreadPct").doubleValue())
  }

  private def combine(n: Long, rA: RunResult, rB: RunResult,
      outMd: String): Unit = {
    require(rA.docs == n && rB.docs == n, "fragment sizes differ")
    require(rB.cores == 4 * rA.cores,
      s"levels must be N and 4N cores, got ${rA.cores}/${rB.cores}")
    require(rA.batches == rB.batches && rA.checksum == rB.checksum &&
      rA.sumTok == rB.sumTok,
      s"levels disagree: batches ${rA.batches}/${rB.batches} " +
        s"checksum ${rA.checksum}/${rB.checksum}")
    ensureCorpora(n)
    val eff = rB.docsPerSec / (4.0 * rA.docsPerSec)
    val effMedian = rA.medianSec / (4.0 * rB.medianSec)

    // untimed audit: per bucket, batch indices tile 0..ceil(cnt/cap)-1
    // and every batch is full except the bucket's last
    val s = session(32)
    val out = Packing.lengthBucketBatches(s.read.parquet(corpusDirOf(n)),
      "doc_id", "n_tok", Budget, Grain)
      .withColumn("_cap", expr(s"greatest(1L, ${Budget}L DIV padded_len)"))
    val audit = out.groupBy("padded_len", "_cap")
      .agg(count(lit(1)).as("n_batches"), max("batch_idx").as("max_idx"),
        sum("n_seqs").as("bucket_docs"),
        sum(when(col("n_seqs") =!= col("_cap"), 1L).otherwise(0L))
          .as("n_partial"))
    val bad = audit.filter(
      col("max_idx") =!= col("n_batches") - 1 ||
        col("n_batches") =!= ceil(col("bucket_docs") / col("_cap")
          .cast("double")).cast("long") ||
        col("n_partial") > 1).count()
    val hotDocs = s.read.parquet(corpusDirOf(n))
      .filter(expr(s"((greatest(n_tok, 1L) + ${Grain - 1}L) DIV ${Grain}L) * ${Grain}L = 512"))
      .count()
    s.stop()

    val md =
      f"""# BENCH/BATCH — length-bucketed batch-assembly scaling evidence
         |
         |End-to-end job over a doc manifest `(doc_id, n_tok)`:
         |scan(parquet) → value-salt projection (fmix32 scramble mod
         |256) → per-(bucket, salt) counts (map-side combinable) →
         |broadcast offsets → ONE data exchange keyed (bucket, salt) →
         |parallel per-cell rank windows → integer batch assignment →
         |batch aggregate → totals checksum. $n%d docs, **$hotDocs%d of them
         |(${hotDocs * 100.0 / n}%.0f%%) in the single hot 512 bucket** —
         |the flood a naive per-bucket row_number window would sort in ONE
         |partition. Two parallelism levels in separate JVMs
         |(`BENCH/run_batch_scaling.sh`, -XX:ActiveProcessorCount matched;
         |shuffle partitions constant at $ShufflePartitions%d).
         |
         || run | master | wall min (s) | wall median (s) | docs/s | best-2 spread |
         ||---|---|---|---|---|---|
         || N  | local[${rA.cores}%d]  | ${rA.wallSec}%.1f | ${rA.medianSec}%.1f | ${rA.docsPerSec}%.0f | ${rA.spreadPct}%.1f%% |
         || 4N | local[${rB.cores}%d] | ${rB.wallSec}%.1f | ${rB.medianSec}%.1f | ${rB.docsPerSec}%.0f | ${rB.spreadPct}%.1f%% |
         |
         |**Scaling efficiency** = (docs/s @${rB.cores}%d) / (4 × docs/s @${rA.cores}%d) =
         |**$eff%.3f** min-of-trials, **$effMedian%.3f** medians (target ≥ 0.8).
         |
         |warmups (s) — local[${rA.cores}%d]: ${rA.warmupsSec.map(x => f"$x%.1f").mkString(", ")};
         |local[${rB.cores}%d]: ${rB.warmupsSec.map(x => f"$x%.1f").mkString(", ")}.
         |timed trials (s) — local[${rA.cores}%d]: ${rA.trialsSec.map(x => f"$x%.1f").mkString(", ")};
         |local[${rB.cores}%d]: ${rB.trialsSec.map(x => f"$x%.1f").mkString(", ")}.
         |
         |## Cross-level correctness
         |
         |- batches: ${rA.batches}%d (equal at both levels)
         |- order-insensitive checksum over EVERY output column: equal
         |  (${rA.checksum}%d)
         |- Σ n_seqs = $n%d and Σ n_tok_real = ${rA.sumTok}%d at both
         |  levels (no doc lost or doubled by the rank/assignment)
         |- untimed audit: buckets whose batch indices fail to tile
         |  0..ceil(count/capacity)−1, or with >1 non-full batch: $bad%d
         |  (must be 0)
         |
         |The hot bucket never forms a single sort: composition order is
         |(salt, id) with salt = fmix32-scramble(id) mod 256 — a pure
         |VALUE hash both consumer branches recompute identically, so the
         |hot bucket spreads over 256 window cells with no range sampler,
         |no checkpoint barrier; the only single-partition step is the
         |≤ salts·buckets offsets frame. The batch aggregate lands on the
         |(padded_len, batch_idx) key — data-sized but uniform (capacity
         |bounds each group).
         |""".stripMargin
    Files.createDirectories(Paths.get(outMd).getParent)
    Files.writeString(Paths.get(outMd), md)
    println(md)
    println(s"""{"metric":"pipe_batch_docs_per_sec_local${rB.cores}","value":${rB.docsPerSec},"unit":"docs/sec","local${rA.cores}":${rA.docsPerSec},"scaling_efficiency":$eff,"scaling_efficiency_median":$effMedian,"docs":$n,"batches":${rA.batches},"checksum_equal":true,"audit_violations":$bad}""")
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") =>
      val Array(_, docs) = args
      ensureCorpora(docs.toLong)
    case Some("level") =>
      val Array(_, cores, docs, outJson) = args
      ensureCorpora(docs.toLong)
      val r = run(cores.toInt, docs.toLong)
      Files.writeString(Paths.get(outJson), fragmentJson(r))
      println(fragmentJson(r))
    case Some("combine") =>
      val Array(_, docs, jsonA, jsonB, outMd) = args
      combine(docs.toLong, parseFragment(jsonA), parseFragment(jsonB), outMd)
    case _ =>
      sys.error("usage: gen N | level <cores> N <out.json> | combine N <jA> <jB> <out.md>")
  }
}
