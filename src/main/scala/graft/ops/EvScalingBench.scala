package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Two-cluster-size scaling evidence for the LOG-ANALYTICS path: run the
  * identical end-to-end gap sessionization ([[Sessionize.sessionStats]] —
  * user-key shuffle → streaming lag/running-sum window frames →
  * per-session aggregate, all on ONE exchange) over an N-event corpus at
  * local[8] and local[32] in per-level JVMs, and report events/s at both
  * levels plus the scaling efficiency.
  *
  * Corpus design (deterministic, no external data, no Date.now): event i
  * belongs to user xxhash64(i,11) mod (N/100) — ~100 events/user — at
  * event time base + xxhash64(i,13) mod 30 days. Per-user times are
  * i.i.d. uniform over the span, so inter-event gaps are ~exponential
  * with mean ≈ 7.2 h: a 6 h session gap yields a real mixture of multi-
  * event sessions and singletons (~56/44), exercising both the merge and
  * the boundary.
  *
  * Correctness across levels: an order-insensitive checksum over every
  * output column (user, seq, n, start, end, dur, value) must be EQUAL at
  * both levels, plus the tiling invariants Σ n_events = N and, in the
  * untimed audit, zero adjacent-session pairs violating the > gap
  * separation contract.
  */
object EvScalingBench {

  private val ShufflePartitions =
    sys.env.getOrElse("SPARK_GRAFT_EV_SHUFFLE", "256").toInt
  private val GapSec = 21600L // 6 h
  private val SpanUs = 30L * 86400L * 1000000L
  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-ev-scaling-$cores")
      .config("spark.sql.shuffle.partitions", ShufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // The protocol's whole point is a CONSTANT 256 reduce tasks at
      // both levels — but AQE's partition coalescing re-derives the
      // task count from shuffle BYTES (bytes/advisory), so the constant
      // silently degrades to one task wave whenever the corpus shrinks:
      // 64m advisory → 34 window tasks at 100M events (util 0.75,
      // 2.08x CPU inflation from ~72 MB L3-spilling sorts); 16m fixed
      // 100M but re-collapsed to 34 tasks = ONE wave at 25M (util
      // 0.61). Coalescing is therefore OFF here — the 256 constant is
      // load-bearing; AQE's skew split stays on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Scan splits follow the same rule: maxSplitBytes must stay well
      // under corpusBytes/(2·cores) at the SMALLEST corpus this bench
      // runs (25M events ≈ 0.5 GB → 4m ⇒ ~128 splits ≥ 4 waves @32);
      // the default 128m (and 16m at 25M) produced exactly-one-wave
      // scans whose wall was the slowest task.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** deterministic events corpus: (event_id, user_id, ts, value) */
  def corpus(s: SparkSession, n: Long, parts: Int = 256): DataFrame = {
    val id = col("id")
    val users = math.max(n / 100L, 1L)
    s.range(0, n, 1, parts)
      .select(id.as("event_id"),
        pmod(xxhash64(id, lit(11L)), lit(users)).as("user_id"),
        timestamp_micros(lit(BaseUs) +
          pmod(xxhash64(id, lit(13L)), lit(SpanUs))).as("ts"),
        (pmod(xxhash64(id, lit(17L)), lit(10000L)) / lit(100.0)).as("value"))
  }

  private def corpusDirOf(n: Long) = s"/dev/shm/graft-ev-corpus-$n"
  private val WarmDir = "/dev/shm/graft-ev-corpus-warm"
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

  /** One full job: the session table forced through a totals aggregate
    * that reads EVERY output column (count, Σ n_events, and an order-
    * insensitive checksum — sum of pmod'd hashes, the ANSI-overflow-safe
    * idiom). Returns (sessions, sumEvents, checksum). */
  private def totals(s: SparkSession, dir: String): (Long, Long, Long) = {
    val out = Sessionize.sessionStats(s.read.parquet(dir),
      "user_id", "ts", GapSec, "value")
    val r = out.agg(
      count(lit(1)).as("sessions"),
      sum(col("n_events")).as("sum_events"),
      // modulus sized so the ANSI sum cannot overflow: ≤ ~N sessions ×
      // 1e9 ≈ 1e17 at N=1e8 — 1e12 overflowed at 100M (44M × 5e11 > 2^63)
      sum(pmod(hash(col("user_id"), col("session_seq"), col("n_events"),
        col("t_start_us"), col("t_end_us"), col("dur_us"), col("value_c")),
        lit(1000000007L))).as("checksum"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  final case class RunResult(cores: Int, wallSec: Double, medianSec: Double,
      events: Long, sessions: Long, checksum: Long, trialsSec: Seq[Double],
      warmupsSec: Seq[Double], spreadPct: Double) {
    def eventsPerSec: Double = events / wallSec
  }

  private def run(cores: Int, n: Long): RunResult = {
    val minTrials = sys.env.getOrElse("SPARK_GRAFT_EV_TRIALS", "2").toInt
    val maxTrials = math.max(minTrials, 6)
    val s = session(cores)
    var sessions = 0L; var checksum = 0L; var sumEvents = 0L
    def job(in: String): Double = {
      val t0 = System.nanoTime()
      val (se, su, ck) = totals(s, in)
      sessions = se; sumEvents = su; checksum = ck
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
    require(sumEvents == n, s"session tiling lost rows: $sumEvents != $n")
    s.stop()
    val sorted = walls.sorted
    RunResult(cores, walls.min, sorted(sorted.length / 2), n, sessions,
      checksum, walls.toSeq, warmups.toSeq, spread(sorted.take(minTrials)) * 100.0)
  }

  private def arr(ts: Seq[Double]) = ts.map(t => f"$t%.4f").mkString("[", ",", "]")
  private def fragmentJson(r: RunResult): String =
    s"""{"cores":${r.cores},"wallSec":${r.wallSec},"medianSec":${r.medianSec},"events":${r.events},"sessions":${r.sessions},"checksum":${r.checksum},"trials":${arr(r.trialsSec)},"warmups":${arr(r.warmupsSec)},"spreadPct":${r.spreadPct}}"""

  private def parseFragment(path: String): RunResult = {
    val n = graft.hotdog.HotdogJson.parseOrNull(Files.readString(Paths.get(path)))
    require(n != null, s"bad fragment: $path")
    def darr(f: String) = {
      val a = n.get(f); (0 until a.size()).map(a.get(_).doubleValue())
    }
    RunResult(n.get("cores").intValue(), n.get("wallSec").doubleValue(),
      n.get("medianSec").doubleValue(), n.get("events").longValue(),
      n.get("sessions").longValue(), n.get("checksum").longValue(),
      darr("trials"), darr("warmups"), n.get("spreadPct").doubleValue())
  }

  private def combine(n: Long, r8: RunResult, r32: RunResult,
      outMd: String): Unit = {
    require(r8.events == n && r32.events == n, "fragment sizes differ")
    require(r32.cores == 4 * r8.cores,
      s"levels must be N and 4N cores, got ${r8.cores}/${r32.cores}")
    require(r8.sessions == r32.sessions && r8.checksum == r32.checksum,
      s"levels disagree: sessions ${r8.sessions}/${r32.sessions} " +
        s"checksum ${r8.checksum}/${r32.checksum}")
    ensureCorpora(n)
    val eff = r32.eventsPerSec / (4.0 * r8.eventsPerSec)
    val effMedian = r8.medianSec / (4.0 * r32.medianSec)

    // untimed audit: adjacent sessions of a user must be > gap apart
    val s = session(32)
    val sess = Sessionize.sessionStats(s.read.parquet(corpusDirOf(n)),
      "user_id", "ts", GapSec, "value")
    val w = Window.partitionBy("user_id").orderBy("t_start_us")
    val viol = sess
      .withColumn("_prev_end", lag(col("t_end_us"), 1).over(w))
      .agg(sum(when(col("_prev_end").isNotNull &&
        col("t_start_us") - col("_prev_end") <= GapSec * 1000000L, 1L)
        .otherwise(0L)).as("v")).collect()(0).getLong(0)
    s.stop()

    val md =
      f"""# BENCH/SESSIONS — gap-sessionization scaling evidence
         |
         |End-to-end job over an events table
         |`(event_id, user_id, ts timestamp, value)`: scan(parquet) →
         |ONE user-key exchange → streaming lag + running-sum window
         |frames (session numbering) → per-session aggregate (reuses the
         |exchange) → totals checksum. Same job, same $n%d-event corpus
         |(~${n / 100L}%d users, ~100 events each, 6 h gap over a 30-day
         |span), two parallelism levels in separate JVMs
         |(`BENCH/run_ev_scaling.sh`, -XX:ActiveProcessorCount matched;
         |shuffle partitions constant at $ShufflePartitions%d).
         |
         || run | master | wall min (s) | wall median (s) | events/s | best-2 spread |
         ||---|---|---|---|---|---|
         || N  | local[${r8.cores}%d]  | ${r8.wallSec}%.1f | ${r8.medianSec}%.1f | ${r8.eventsPerSec}%.0f | ${r8.spreadPct}%.1f%% |
         || 4N | local[${r32.cores}%d] | ${r32.wallSec}%.1f | ${r32.medianSec}%.1f | ${r32.eventsPerSec}%.0f | ${r32.spreadPct}%.1f%% |
         |
         |**Scaling efficiency** = (events/s @${r32.cores}%d) / (4 × events/s @${r8.cores}%d) =
         |**$eff%.3f** min-of-trials, **$effMedian%.3f** medians (target ≥ 0.8).
         |
         |warmups (s) — local[${r8.cores}%d]: ${r8.warmupsSec.map(x => f"$x%.1f").mkString(", ")};
         |local[${r32.cores}%d]: ${r32.warmupsSec.map(x => f"$x%.1f").mkString(", ")}.
         |timed trials (s) — local[${r8.cores}%d]: ${r8.trialsSec.map(x => f"$x%.1f").mkString(", ")};
         |local[${r32.cores}%d]: ${r32.trialsSec.map(x => f"$x%.1f").mkString(", ")}.
         |
         |## Cross-level correctness
         |
         |- sessions: ${r8.sessions}%d (equal at both levels)
         |- order-insensitive checksum over EVERY output column: equal
         |  (${r8.checksum}%d)
         |- Σ n_events = $n%d at both levels (no event lost or doubled by
         |  the session tiling — asserted inside each level run)
         |- untimed audit: adjacent-session pairs violating the > gap
         |  separation contract: $viol%d (must be 0)
         |
         |The only data-sized shuffle carries (user, t_us, value_c) rows;
         |the window frames are streaming (lag / running sum — O(1) buffer
         |per row) and the per-session aggregate reuses the window's
         |partitioning, so the shape scales by adding partitions, not
         |memory. Per-user data in one task is inherent to the semantics;
         |the key's fan-in is bounded by per-user retention, not corpus
         |size.
         |""".stripMargin
    Files.createDirectories(Paths.get(outMd).getParent)
    Files.writeString(Paths.get(outMd), md)
    println(md)
    println(s"""{"metric":"ev_sessions_events_per_sec_local${r32.cores}","value":${r32.eventsPerSec},"unit":"events/sec","local${r8.cores}":${r8.eventsPerSec},"scaling_efficiency":$eff,"scaling_efficiency_median":$effMedian,"events":$n,"sessions":${r8.sessions},"checksum_equal":true,"gap_violations":$viol}""")
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") =>
      val Array(_, events) = args
      ensureCorpora(events.toLong)
    case Some("level") =>
      val Array(_, cores, events, outJson) = args
      ensureCorpora(events.toLong)
      val r = run(cores.toInt, events.toLong)
      Files.writeString(Paths.get(outJson), fragmentJson(r))
      println(fragmentJson(r))
    case Some("combine") =>
      val Array(_, events, json8, json32, outMd) = args
      combine(events.toLong, parseFragment(json8), parseFragment(json32), outMd)
    case _ =>
      sys.error("usage: gen N | level <cores> N <out.json> | combine N <j8> <j32> <out.md>")
  }
}
