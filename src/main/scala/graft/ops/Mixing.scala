package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixing operators: deterministic weighted sampling (the "data
  * mixture" step that up/down-weights sources before training) and global
  * vocabulary/token-frequency building (tokenizer training, frequency
  * filters).
  */
object Mixing {

  /** Deterministic per-row sampling hash in [0, 100): the first 32 bits of
    * md5(id) — stable across engines, runs, partitionings and cluster
    * sizes (re-running the job keeps EXACTLY the same rows, the property
    * that makes sampled corpora reproducible; `rand()` has none of that).
    */
  def hashPct(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Weighted corpus mixing: keep each row iff hashPct(id) < its source's
    * sampling rate (percent, 0..100). `rates` is a (srcCol, rate_pct)
    * dimension — broadcast, since real mixtures have a handful-to-
    * thousands of sources. Narrow per-row filter after the broadcast
    * probe: no shuffle at all, filters push to the scan's batch reader.
    */
  def sampleBySource(df: DataFrame, idCol: String, srcCol: String,
      rates: DataFrame): DataFrame =
    df.join(broadcast(rates), srcCol)
      .filter(hashPct(col(idCol)) < col("rate_pct"))

  /** Deterministic train/val/test split: every row labeled by which
    * cumulative hashPct band its md5(id ‖ seed) falls in. `splits` maps
    * label → percent and must sum to 100, so the split is TOTAL and the
    * three corpora are disjoint by construction. Membership is a pure
    * function of (id, seed) — the property that keeps a held-out set
    * held out across reruns, repartitionings, cluster sizes and
    * incremental corpus growth (a doc never migrates between splits
    * when OTHER docs are added, which a rank/ntile split cannot
    * promise). Zero shuffle: a narrow projection the scan pipelines. */
  def splitByHash(df: DataFrame, idCol: String, seed: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 100, "split percents must be > 0 and sum to 100")
    val h = hashPct(concat(col(idCol).cast("string"), lit(seed)))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cum).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), els) => when(h < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", label)
  }

  /** Fixed-size deterministic sample per stratum: exactly min(n, |group|)
    * rows per `srcCol` value, chosen by the smallest md5(id ‖ seed) —
    * an exact, rerun-stable stand-in for per-stratum reservoir sampling
    * (eval-set carving, per-source inspection samples). Ranking uses the
    * salted two-phase top-k ([[Ranks.topKPerGroup]]), so a billion-doc
    * stratum never sorts in one partition. */
  def stratifiedSample(df: DataFrame, idCol: String, srcCol: String,
      n: Int, seed: String): DataFrame =
    Ranks.topKPerGroup(
      df.withColumn("_skey", md5(concat(col(idCol).cast("string"), lit(seed)))),
      col(srcCol), col(idCol),
      Seq(col("_skey").asc, col(idCol).asc), n, "sample_rank")
      .drop("_skey")

  /** Word bigrams WITH multiplicity ("w1 w2" strings) — the hashed
    * feature space DSIR estimates its distributions over. < 2 words ⇒
    * empty array; null text ⇒ null. One-pass codegen kernel (the
    * zip_with/slice Column form runs interpreted — see
    * [[OpsKernels.wordNgramsMulti]]). */
  private def bigrams(text: Column): Column = opscol.wordNgramsMulti(text, 2)

  /** Engine-stable feature-hash bucket of a gram: first 32 bits of
    * md5(gram) mod `buckets` (same idiom as [[hashPct]]). */
  private def bucketOf(g: Column, buckets: Int): Column =
    conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * select the k raw documents whose hashed-bigram distribution most
    * resembles a TARGET corpus, by Gumbel-top-k over importance weights.
    *
    *   log w(x) = Σ_g [ln p̂_target(b(g)) − ln p̂_raw(b(g))]
    *
    * with add-one-smoothed multinomials over `buckets` hashed-bigram
    * buckets (raw estimated from `docs` itself, target from `target`),
    * and selection key = log w(x) + Gumbel(md5(id ‖ seed)) — sampling
    * without replacement from the importance distribution, derandomized:
    * the Gumbel variate is a pure function of (id, seed), so reruns,
    * repartitionings and other cluster sizes select EXACTLY the same
    * corpus, and a new seed is an independent draw.
    *
    * Output is TOTAL: (idCol, n_feat, logw, sel_key, selected), exactly
    * k rows selected (keys are almost-surely distinct); a doc with < 2
    * words carries logw = 0 (no features) and competes on its Gumbel
    * alone — DSIR's behavior for feature-less inputs.
    *
    * 100 TB shape: both count tables are `buckets`-sized (broadcast; the
    * two estimation passes are wordcount shuffles whose map-side combine
    * bounds each partition's output by `buckets` rows); scoring is one
    * narrow explode + broadcast probes, per-doc aggregate map-side-
    * combined. The top-k is TakeOrderedAndProject (per-partition heap +
    * driver merge — never a global sort); for corpus-sized k, swap the
    * exact threshold for approx_percentile on sel_key (same plan
    * otherwise).
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096, k: Int = 200, seed: String = "dsir"): DataFrame = {
    // the scoring chain (explode → broadcast probe → per-doc aggregate)
    // has TWO consumers — the threshold TakeOrdered and the returned
    // verdict frame — and Catalyst re-derives it per consumer (measured:
    // 4 corpus scans per dsir run before this; 3 after — the two
    // estimation wordcounts + this one materialization: the threshold
    // collect and the verdict frame both read the checkpointed blocks,
    // plan-pinned in PipelineOpsSpec). localCheckpoint is eager and
    // narrow — 4 columns, ~40 B/row, MEMORY_AND_DISK — the projection a
    // production run would persist anyway before sweeping thresholds.
    val scored = dsirScored(docs, idCol, textCol, target, targetTextCol,
      buckets, seed).localCheckpoint()
    // exact k-th-largest key via a TakeOrdered pass over the narrow
    // (pruned) key column — for corpus-sized k swap in approx_percentile;
    // ≥ against -inf when fewer than k rows exist selects everything
    val topK = scored.orderBy(col("sel_key").desc).limit(k)
      .select(col("sel_key")).collect()
    // n ≤ k ⇒ the k-th is the minimum key ⇒ everything selects
    val th = topK.lastOption.map(_.getDouble(0))
      .getOrElse(Double.NegativeInfinity)
    scored.withColumn("selected", col("sel_key") >= lit(th))
  }

  /** The per-doc scoring frame of [[dsirSelect]] as a pure plan
    * (idCol, n_feat, logw, sel_key) — exposed un-checkpointed so the plan
    * spec can pin the scoring chain's shape. */
  private[ops] def dsirScored(docs: DataFrame, idCol: String,
      textCol: String, target: DataFrame, targetTextCol: String,
      buckets: Int, seed: String): DataFrame = {
    // The two multinomials are MODEL-sized (≤`buckets` rows each, by
    // construction) — estimate each with one map-side-combined wordcount
    // pass and collect, like the ≤#topics stats collects: leaving them as
    // DataFrames re-plans the whole estimation pipeline under every
    // broadcast/subquery consumer (measured: 10 parquet scans of the
    // corpus in one dsir plan, zero exchange reuse).
    def bucketCounts(df: DataFrame, tc: String): Map[Long, Long] = df
      .select(explode(bigrams(col(tc))).as("g"))
      .select(bucketOf(col("g"), buckets).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ctm = bucketCounts(target, targetTextCol)
    val crm = bucketCounts(docs, textCol)
    val nt = ctm.values.sum.toDouble
    val nr = crm.values.sum.toDouble
    // per-bucket log-ratio of the smoothed multinomials (java.lang.Math
    // .log — the same libm call Spark's log codegen makes); a bucket
    // absent from BOTH maps (unreachable for docs' own grams, which
    // define crm) falls back to the both-unseen constant
    def lrOf(ct: Long, cr: Long): Double =
      math.log(ct + 1.0) - math.log(nt + buckets) -
        (math.log(cr + 1.0) - math.log(nr + buckets))
    val lrRows = (ctm.keySet ++ crm.keySet).toSeq.sorted
      .map(b => (b, lrOf(ctm.getOrElse(b, 0L), crm.getOrElse(b, 0L))))
    val unseenLr = lrOf(0L, 0L)
    val spark = docs.sparkSession
    import spark.implicits._
    val lrDf = lrRows.toDF("b", "lr")
    // explode_outer keeps empty/null-text docs (null gram row) → TOTAL
    // per-doc aggregate with no corpus-wide join-back on the id
    docs
      .select(col(idCol), explode_outer(bigrams(col(textCol))).as("g"))
      .withColumn("b", bucketOf(col("g"), buckets))
      .join(broadcast(lrDf), Seq("b"), "left")
      .select(col(idCol), col("g"),
        when(col("g").isNotNull,
          coalesce(col("lr"), lit(unseenLr))).as("lr"))
      .groupBy(idCol)
      .agg(count(col("g")).as("n_feat"), sum("lr").as("slr"))
      .withColumn("logw", coalesce(col("slr"), lit(0.0)))
      // inverse-CDF Gumbel from the 32-bit md5 uniform, centered off 0/1
      .withColumn("_u",
        (conv(substring(md5(concat(col(idCol).cast("string"), lit(seed))),
          1, 8), 16, 10).cast("long").cast("double") + 0.5) / 4294967296.0)
      .withColumn("sel_key", col("logw") - log(-log(col("_u"))))
      .select(col(idCol), col("n_feat"), col("logw"), col("sel_key"))
  }

  /** Per-source distribution-drift monitor: KL divergence (nats) of each
    * source's hashed-unigram word distribution from the whole-corpus
    * distribution — the standing "which source changed / which mixture
    * component is off" check a multi-source training pipeline runs per
    * crawl. Both multinomials are add-one-smoothed over `buckets` hashed
    * word buckets (the [[dsirSelect]] feature space), so KL is finite and
    * a source identical to the corpus scores exactly 0.
    *
    * Output: one row per source — (source, n_words, n_buckets, kl) where
    * n_buckets counts the buckets the source itself hits.
    *
    * 100 TB shape: ONE corpus pass — a map-side-combined wordcount on the
    * (source, bucket) key, bounded at #sources×buckets rows per partition
    * regardless of corpus size. That model-sized table is collected once
    * (the ≤#topics stats-collect class; leaving it as a DataFrame would
    * re-plan the corpus scan under each of the three downstream
    * aggregates — the measured DSIR re-planning trap) and the KL
    * arithmetic folds locally in deterministic ascending-bucket order.
    * The global distribution is derived from the same counts (q(b) =
    * Σ_s c_sb), not a second scan. */
  def sourceDivergence(df: DataFrame, textCol: String, srcCol: String,
      buckets: Int = 512): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val counts: Array[(String, Long, Long)] = df
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.words(col(textCol))).as("word"))
      .select(col("source"), bucketOf(col("word"), buckets).as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // global bucket counts q(b) = Σ_s c_sb — no second corpus pass
    val gb: Seq[(Long, Long)] = counts.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    val n = gb.map(_._2).sum.toDouble
    val g = gb.size // buckets with nonzero global count
    val out = counts.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val ns = rows.map(_._3).sum.toDouble
        val cByB = rows.map(r => r._2 -> r._3).toMap
        var kl = 0.0
        // buckets the corpus hits (c_sb may be 0 there — smoothing covers)
        gb.foreach { case (b, cb) =>
          val p = (cByB.getOrElse(b, 0L) + 1.0) / (ns + buckets)
          val q = (cb + 1.0) / (n + buckets)
          kl += p * math.log(p / q)
        }
        // the (buckets − g) buckets no source hits: constant contribution
        val p0 = 1.0 / (ns + buckets)
        val q0 = 1.0 / (n + buckets)
        kl += (buckets - g) * p0 * math.log(p0 / q0)
        (src, ns.toLong, cByB.size.toLong, kl)
    }
    out.toDF(srcCol, "n_words", "n_buckets", "kl")
  }

  /** Global word-frequency vocabulary: top-k words by corpus count with
    * per-word document frequency. Deterministic total order (count desc,
    * word asc) so the top-k boundary is unambiguous.
    *
    * 100 TB shape: wordcount with map-side combine on the word; the
    * document frequency is a two-level aggregate (distinct (word, doc)
    * first — same shuffle key), and the top-k is TakeOrdered (limit k
    * heap per partition + driver merge), never a full global sort.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"), count_distinct(col(idCol)).as("n_docs"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)

  /** Tokenizer-coverage health per source: total word occurrences and the
    * share OUTSIDE a vocabulary (the OOV rate every tokenizer-prep
    * pipeline sweeps before committing a vocab size — a source whose OOV
    * spikes is the one the tokenizer will shred into bytes). `vocab` is
    * any frame whose FIRST column is the word (e.g. [[vocabulary]]'s
    * top-k). Counts are exact integers so the cross-engine compare is
    * bit-stable; the rate is n_oov / n_tokens downstream.
    *
    * 100 TB shape: the vocab rides BROADCAST (tokenizer vocabularies are
    * model-sized by definition); the corpus pass is one explode whose
    * per-source aggregate combines map-side — a hot source never floods
    * a reducer, and nothing corpus-sized shuffles. */
  def oovStats(df: DataFrame, srcCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val v = broadcast(vocab
      .select(col(vocab.columns(0)).as("_w"), lit(true).as("_in"))
      .distinct())
    df.select(col(srcCol).as("source"),
        explode(TextAnalysis.words(col(textCol))).as("_w"))
      .join(v, Seq("_w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** Deterministic stride-scheduled source interleave — the BLENDED
    * training order for a weighted multi-source mixture: every prefix of
    * the schedule holds the source ratios (Waldspurger-style stride
    * scheduling), which is what keeps a run that stops — or resumes — at
    * step t trained on the INTENDED mixture, not on whichever source the
    * file order put first. [[sampleBySource]] decides WHAT is in the
    * mixture; this decides in WHICH ORDER it is consumed.
    *
    * Semantics: docs of source s are ordered by the seeded hash scramble
    * (md5(id ‖ seed), id) — the [[graft.ops.Packing.globalShuffleOrder]]
    * epoch contract, per source — giving each doc its within-source
    * round `src_round` r = 0,1,2…; its schedule key is then
    * `sched_pos = ((2r+1)·W div (2·w_s)) · nSrc + srcIdx` with W = Σ
    * weights — source s occupies every (W/w_s)-th slot of a virtual
    * timeline, with ties broken by the (sorted-source-name) index, so
    * sched_pos is COLLISION-FREE and `ORDER BY sched_pos` IS the
    * schedule. Everything is integer arithmetic on non-negative values
    * (identical under Spark ANSI and DuckDB BIGINT); the whole schedule
    * is a pure function of (id, source, weights, seed) — identical on
    * any partitioning, rerun, or cluster size. Sources absent from
    * `weights` are EXCLUDED (weight 0), like a 0-rate in
    * [[sampleBySource]]; a source that exhausts its docs simply stops
    * occupying its slots (prefixes hold the ratios among the sources
    * still live — stride deviation ≤ 1 doc per source until exhaustion).
    *
    * 100 TB shape: ONE data-sized exchange — the per-(source, cell) rank
    * window's, where cell is the first-2-hex-chars value of the md5 sort
    * key itself (a monotone bucketing of the key: ordering (cell, key,
    * id) IS ordering (key, id)), so a dominant source spreads over 256
    * parallel cells, never one sort, and because the cell is a VALUE
    * hash both consumers of the keyed frame agree with no range sampler
    * and no checkpoint barrier (the [[Packing.lengthBucketBatches]]
    * discipline); offsets are a ≤ 256·|sources| broadcast frame; weights
    * ride a broadcast join; sched_pos is a zero-shuffle projection.
    * Overflow bound (documented contract): N_s · W · nSrc must fit a
    * long — weights are ppm-scale (Σ ≤ 1e6), so fine past 10^12 docs. */
  def interleaveBySource(df: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Long], seed: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val w = weights.values.sum
    require(w <= 1000000L, s"weights must sum to <= 1e6 (ppm scale), got $w")
    val srcs = weights.keys.toSeq.sorted
    val nSrc = srcs.size
    val spark = df.sparkSession
    import spark.implicits._
    val dim = broadcast(
      srcs.zipWithIndex.map { case (s, i) => (s, weights(s), i.toLong) }
        .toDF(srcCol, "_w", "_sidx"))
    val keyed = df
      .select(col(idCol), col(srcCol))
      .join(dim, srcCol) // inner: unlisted sources are excluded
      .withColumn("_skey",
        md5(concat(col(idCol).cast("string"), lit(seed))))
      .withColumn("_cell",
        conv(substring(col("_skey"), 1, 2), 16, 10).cast("long"))
    val offsets = keyed.groupBy(srcCol, "_cell")
      .agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(
        Window.partitionBy(srcCol).orderBy("_cell")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(srcCol), col("_cell"), col("_off"))
    val intraW = Window.partitionBy(srcCol, "_cell")
      .orderBy(col("_skey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(offsets), Seq(srcCol, "_cell"))
      .withColumn("src_round", col("_off") + count(lit(1)).over(intraW))
      .withColumn("sched_pos",
        expr(s"((2L * src_round + 1L) * ${w}L DIV (2L * _w)) * ${nSrc}L") +
          col("_sidx"))
      .select(col(idCol), col(srcCol), col("src_round"), col("sched_pos"))
  }

  /** Fixed-budget MULTI-EPOCH mixture schedule — [[interleaveBySource]]
    * extended with the repetition semantics real mixtures use (a small
    * high-quality source weighted above its natural share repeats for
    * several epochs — the "wikipedia × 4" configuration): source s is
    * allocated `n_slots = budgetDocs·w_s div W` schedule slots; its docs
    * fill them epoch by epoch, each epoch an INDEPENDENT scramble
    * (md5(id ‖ seed ‖ epoch)), the last epoch partial if w_s·budget
    * isn't a doc multiple. Every doc of s therefore appears exactly
    * floor- or ceil(n_slots/N_s) times, and every schedule prefix holds
    * the weight ratios for the WHOLE run (stride slots as in
    * interleaveBySource, with the same collision-free encoding) — the
    * curriculum a trainer resumes anywhere inside and still sees the
    * intended mixture at the intended repetition rate.
    *
    * Output: (id, source, epoch, src_round, sched_pos) — one row per
    * SCHEDULED OCCURRENCE (Σ_s n_slots rows ≈ budgetDocs); materialize
    * the epoch corpus by joining payloads back on the id, ordered by
    * sched_pos.
    *
    * 100 TB shape: the per-source doc counts and epoch fan-outs are a
    * sources-sized aggregate exploded in-plan and BROADCAST; the corpus
    * explodes to one row per (doc, epoch) — the schedule's inherent
    * size, narrow (id, source) rows only — and ranks ride the same
    * per-(source, epoch, hash-prefix-cell) windows as interleaveBySource
    * (≤ 256·Σ epochs offsets frame, no range sampler, no checkpoint
    * barrier); the slot arithmetic is a zero-shuffle projection. */
  def epochBudgetSchedule(df: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Long], budgetDocs: Long,
      seed: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    require(budgetDocs > 0, s"budgetDocs must be positive, got $budgetDocs")
    val w = weights.values.sum
    require(w <= 1000000L, s"weights must sum to <= 1e6 (ppm scale), got $w")
    val srcs = weights.keys.toSeq.sorted
    val nSrc = srcs.size
    val spark = df.sparkSession
    import spark.implicits._
    val wDim = broadcast(
      srcs.zipWithIndex.map { case (s, i) => (s, weights(s), i.toLong) }
        .toDF(srcCol, "_w", "_sidx"))
    // sources-sized: per-source doc count, slot allocation, epoch fan-out
    // exploded to one row per (source, epoch) — all broadcast
    val epDim = broadcast(df
      .join(wDim, srcCol)
      .groupBy(col(srcCol), col("_w"), col("_sidx"))
      .agg(count(lit(1)).as("_ndocs"))
      .withColumn("_nslots", expr(s"(${budgetDocs}L * _w) DIV ${w}L"))
      .filter(col("_nslots") > 0)
      .withColumn("_k", explode(expr(
        "sequence(0L, (_nslots + _ndocs - 1L) DIV _ndocs - 1L)")))
      .select(col(srcCol), col("_w"), col("_sidx"), col("_ndocs"),
        col("_nslots"), col("_k")))
    val keyed = df
      .select(col(idCol), col(srcCol))
      .join(epDim, srcCol) // corpus × its epochs: the schedule's own size
      .withColumn("_skey", md5(concat(
        col(idCol).cast("string"), lit(seed), col("_k").cast("string"))))
      .withColumn("_cell",
        conv(substring(col("_skey"), 1, 2), 16, 10).cast("long"))
    val offsets = keyed.groupBy(srcCol, "_k", "_cell")
      .agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(
        Window.partitionBy(srcCol, "_k").orderBy("_cell")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(srcCol), col("_k"), col("_cell"), col("_off"))
    val intraW = Window.partitionBy(srcCol, "_k", "_cell")
      .orderBy(col("_skey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(offsets), Seq(srcCol, "_k", "_cell"))
      .withColumn("_erank", col("_off") + count(lit(1)).over(intraW))
      .withColumn("src_round", col("_k") * col("_ndocs") + col("_erank"))
      .filter(col("src_round") < col("_nslots")) // partial last epoch
      .withColumn("sched_pos",
        expr(s"((2L * src_round + 1L) * ${w}L DIV (2L * _w)) * ${nSrc}L") +
          col("_sidx"))
      .select(col(idCol), col(srcCol), col("_k").as("epoch"),
        col("src_round"), col("sched_pos"))
  }

  /** TOKEN-budget mixture materialization — budgets are allocated in
    * tokens, the unit trainers actually spend, not docs: source s gets
    * `budgetTokens·w_s div W` tokens, and contributes the docs whose
    * cumulative token START (in the seeded scramble order, exclusive
    * prefix sum) falls below that allocation — i.e. "take scrambled
    * docs until the budget line, include the doc that crosses it".
    * Membership is a pure function of (id, source, n_tok values,
    * weights, budget, seed): identical on any partitioning or cluster
    * size, and stable under corpus growth ONLY of later-hashing docs
    * (unlike a doc-count quota, adding tokens to ANY kept doc shifts
    * the line — that is inherent to token budgeting, not an artifact).
    *
    * Output: kept occurrences only — (id, source, tok_start, n_tok)
    * with tok_start the exclusive within-source token offset; Σ n_tok
    * per source first crosses its allocation exactly at the last kept
    * doc.
    *
    * 100 TB shape: the same hash-prefix-cell two-level SCAN as
    * [[interleaveBySource]] but summing tokens instead of counting rows
    * (the [[graft.ops.Packing.packChunks]] prefix-sum made barrier-free
    * by the value-derived cells): per-(source, cell) token sums — a
    * ≤ 256·|sources| broadcast frame — cumulate into exclusive cell
    * offsets, parallel per-cell running sums finish the prefix, and the
    * budget filter is a zero-shuffle projection. ONE data-sized
    * exchange; only (id, source, n_tok) rows move. */
  def tokenBudgetMixture(df: DataFrame, idCol: String, srcCol: String,
      nTokCol: String, weights: Map[String, Long], budgetTokens: Long,
      seed: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    require(budgetTokens > 0, s"budgetTokens must be positive")
    val w = weights.values.sum
    require(w <= 1000000L, s"weights must sum to <= 1e6 (ppm scale), got $w")
    val srcs = weights.keys.toSeq.sorted
    val spark = df.sparkSession
    import spark.implicits._
    val dim = broadcast(
      srcs.map(s => (s, weights(s))).toDF(srcCol, "_w"))
    val keyed = df
      .select(col(idCol), col(srcCol), col(nTokCol).cast("long").as("_nt"))
      .join(dim, srcCol)
      .withColumn("_skey",
        md5(concat(col(idCol).cast("string"), lit(seed))))
      .withColumn("_cell",
        conv(substring(col("_skey"), 1, 2), 16, 10).cast("long"))
    val offsets = keyed.groupBy(srcCol, "_cell")
      .agg(sum("_nt").as("_pt"))
      .withColumn("_off", coalesce(sum("_pt").over(
        Window.partitionBy(srcCol).orderBy("_cell")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(srcCol), col("_cell"), col("_off"))
    val intraW = Window.partitionBy(srcCol, "_cell")
      .orderBy(col("_skey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(offsets), Seq(srcCol, "_cell"))
      .withColumn("tok_start",
        col("_off") + coalesce(sum("_nt").over(intraW), lit(0L)))
      .filter(col("tok_start") < expr(s"(${budgetTokens}L * _w) DIV ${w}L"))
      .select(col(idCol), col(srcCol), col("tok_start"),
        col("_nt").as("n_tok"))
  }
}
