package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for LLM training corpora: concatenate every document's
  * token stream in a global deterministic order (the id) and cut the stream
  * into fixed-size training chunks ("concat-and-chunk" — the standard
  * packing used to build fixed-length training batches). The answer per
  * document is its absolute token offset and the chunk range it spans.
  *
  * 100 TB shape: the global running sum is a classic two-level scan, NOT a
  * single-partition window (the naive `Window.orderBy(id)` plans ONE
  * partition holding the whole corpus — a driver-killer at scale):
  *
  *   1. range-shuffle on the id (narrow (id, n_tok) rows only — never the
  *      text/tokens payload),
  *   2. per-partition token sums — #partitions rows — cumulated into
  *      exclusive partition OFFSETS on a single tiny partition,
  *   3. offsets broadcast back; each partition computes its local running
  *      sum independently (window partitioned BY partition id, so every
  *      partition scans in parallel).
  *
  * All arithmetic is integer (`DIV`), exact at any corpus size — a double
  * division would lose token-offset precision past 2^53 (a ~9e15-token,
  * i.e. >10 PB, corpus — but exactness is free here).
  */
object Packing {

  /** Assign each document its exclusive token start offset (order = idCol
    * ascending) and the [bin_first, bin_last] chunk range it occupies when
    * the concatenated stream is cut every `budget` tokens.
    *
    * Output: idCol, nTokCol, start_off, bin_first, bin_last — one row per
    * input row (total operator: no document is dropped).
    *
    * @param numParts range-partition count; <=0 ⇒ the session's shuffle
    *                 partitions (at real scale: size so a partition's
    *                 (id, n_tok) pairs fit an executor — 64-byte rows,
    *                 so even 128 MiB partitions hold ~2M docs).
    */
  def packChunks(df: DataFrame, idCol: String, nTokCol: String,
      budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    // narrow projection BEFORE the shuffle: only (id, n_tok) moves.
    // _pid is MATERIALIZED (localCheckpoint) because both consumers —
    // the offsets aggregate and the rank join — must see the SAME
    // row→partition assignment: two physically separate evaluations of
    // a range exchange sample boundaries with different rdd.id-derived
    // seeds, and relying on runtime exchange reuse to prevent that is
    // exactly the silent-correctness dependence the BatchScalingBench
    // smoke run caught (0.3% of rows lost when reuse didn't happen)
    val ranged = df
      .select(col(idCol), col(nTokCol).cast("long").as(nTokCol))
      .repartitionByRange(parts, col(idCol))
      .withColumn("_pid", spark_partition_id())
      // serialized storage: the narrow long rows shrink ~3x vs
      // deserialized block caching, cutting the materialization's
      // memory-bandwidth cost (the two-level benches' binding resource)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // per-partition sums: #partitions rows — the only single-partition
    // step runs over THIS tiny frame, never the data
    val offW = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("_pid")
      .agg(sum(nTokCol).as("_psum"))
      .withColumn("_off", coalesce(sum("_psum").over(offW), lit(0L)))
      .select("_pid", "_off")
    // local exclusive running sum, one window scan per partition in
    // parallel (partitionBy _pid ⇒ no global-order single partition)
    val intraW = Window.partitionBy("_pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(offsets), "_pid")
      .withColumn("start_off",
        col("_off") + coalesce(sum(col(nTokCol)).over(intraW), lit(0L)))
      .withColumn("bin_first", expr(s"start_off DIV ${budget}L"))
      .withColumn("bin_last",
        expr(s"(start_off + `$nTokCol` - 1) DIV ${budget}L"))
      .drop("_pid", "_off")
  }

  /** Chunk→doc composition manifest — the resume-at-token-granularity
    * lineage a trainer needs next to the packed chunks: one row per
    * (chunk, doc) fragment, saying which slice of which document lands
    * where in which training chunk.
    *
    * Output: (chunk_id, idCol, chunk_off, doc_off, tok_len) —
    * chunk `chunk_id`'s tokens [chunk_off, chunk_off+tok_len) are document
    * `idCol`'s tokens [doc_off, doc_off+tok_len). Σ tok_len over a chunk =
    * `budget` (except the final chunk); fragments within a chunk are
    * contiguous and non-overlapping by construction.
    *
    * 100 TB shape: [[packChunks]]'s two-level scan plus one narrow
    * per-row explode of each doc's [bin_first, bin_last] range — total
    * output rows = chunks + docs - 1 ≤ 2·docs for budget ≥ max doc
    * length, and the fragment arithmetic is integer-exact per row with
    * no further shuffle. Zero-token docs occupy no chunk and emit no
    * manifest row (they'd also flip `sequence` into descending order —
    * filtered before the explode). */
  def packChunkManifest(df: DataFrame, idCol: String, nTokCol: String,
      budget: Long, numParts: Int = 0): DataFrame =
    packChunks(df, idCol, nTokCol, budget, numParts)
      .filter(col(nTokCol) > 0)
      .select(col(idCol), col(nTokCol), col("start_off"),
        explode(sequence(col("bin_first"), col("bin_last"))).as("chunk_id"))
      .withColumn("doc_off",
        greatest(lit(0L), col("chunk_id") * budget - col("start_off")))
      .withColumn("tok_len",
        least(col(nTokCol), (col("chunk_id") + 1L) * budget - col("start_off"))
          - col("doc_off"))
      .withColumn("chunk_off",
        col("start_off") + col("doc_off") - col("chunk_id") * budget)
      .select(col("chunk_id"), col(idCol), col("chunk_off"), col("doc_off"),
        col("tok_len"))

  /** Materialized packed training chunks — the rows a trainer actually
    * reads: cut the concatenated corpus token stream (order = idCol) every
    * `budget` tokens and emit `(chunk_id, n_tok, tokens)`, with documents
    * crossing a chunk boundary split by the [[packChunkManifest]]
    * arithmetic. Every chunk holds exactly `budget` tokens except the
    * last (= total mod budget, when nonzero).
    *
    * 100 TB shape: the offsets ride the narrow manifest; token arrays
    * join the manifest once on the UNIFORM doc id key (fan-out = chunks
    * the doc spans, ≤ 2 for budget ≥ max doc length), are sliced to
    * fragments map-side, and assemble with ONE shuffle keyed by chunk_id.
    * Per-group state is bounded by the budget itself (≤ budget fragments
    * totalling ≤ budget tokens — ~4·budget bytes), so the sort-based
    * aggregation fallback on the ~all-unique chunk keys spills safely. */
  def packedSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, numParts: Int = 0): DataFrame = {
    val counted = df.select(col(idCol), col(tokensCol),
      size(col(tokensCol)).cast("long").as("_n_tok"))
    val manifest = packChunkManifest(
      counted.select(col(idCol), col("_n_tok")), idCol, "_n_tok", budget,
      numParts)
    counted.join(manifest, idCol)
      .select(col("chunk_id"), col("chunk_off"),
        slice(col(tokensCol), col("doc_off").cast("int") + 1,
          col("tok_len").cast("int")).as("_frag"))
      .groupBy("chunk_id")
      .agg(collect_list(struct(col("chunk_off"), col("_frag"))).as("_fr"))
      // one codegen pass: sort-by-offset + concatenate (chunk_off is
      // unique per fragment, so this equals the struct array_sort). The
      // previous array_sort + transform + flatten chain ran INTERPRETED
      // per chunk (higher-order Columns fall out of codegen — the
      // WordShingles lesson) and was the query's JIT-bimodality hot spot
      // (r5 driver samples: 2.1 s vs 11.1 s).
      .select(col("chunk_id"),
        opscol.assembleFragments(col("_fr")).as("tokens"))
      .select(col("chunk_id"), size(col("tokens")).cast("long").as("n_tok"),
        col("tokens"))
  }

  /** Serpentine length-balanced packing ("folded" length-aware batching):
    * rank every document under the total order (n_tok DESC, id ASC) and
    * deal ranks to `nbins` bins boustrophedon — block b = rnk DIV nbins;
    * even blocks assign left→right, odd blocks right→left — so every bin
    * receives exactly one document per block and consecutive blocks pair
    * each bin's longer pick with a shorter one. This is the deterministic,
    * fully-parallel alternative to greedy first-fit-decreasing packing
    * (whose running bin state is inherently sequential): bin token totals
    * differ by at most one block's spread, which shrinks as lengths sort.
    *
    * Output per document (TOTAL): idCol, nTokCol, rnk, bin, bin_tokens
    * (the assigned bin's total tokens — the padding/imbalance diagnostic).
    *
    * 100 TB shape: the rank is the [[packChunks]]-style two-level
    * distributed scan (narrow (id, n_tok) rows range-shuffled on the
    * DATA-DEPENDENT sort key — which is why this path keeps the
    * localCheckpoint the hash-keyed family dropped; the only
    * single-partition window runs over #partitions rows) — never a
    * global window over data rows. The ranked frame is re-evaluated
    * once more for the nbins-row bin-totals aggregate — cheap parallel
    * windows over the checkpointed rows, deterministic because ranks
    * are a pure function of those rows.
    */
  def foldPackBins(df: DataFrame, idCol: String, nTokCol: String,
      nbins: Int, numParts: Int = 0): DataFrame = {
    require(nbins > 0, s"nbins must be positive, got $nbins")
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val keyed = df
      .select(col(idCol), col(nTokCol).cast("long").as(nTokCol))
      .repartitionByRange(parts, col(nTokCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      // _pid materialized: the offsets aggregate and the rank join must
      // see ONE row→partition assignment (see packChunks — the range
      // sampler is per-evaluation; this was the site the session-14
      // sweep missed). The downstream ranked→binTotals double
      // consumption is safe GIVEN this: ranks are a pure function of
      // the checkpointed rows, so both evaluations agree.
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val offW = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("_pid")
      .agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(offW), lit(0L)))
      .select("_pid", "_off")
    val intraW = Window.partitionBy("_pid")
      .orderBy(col(nTokCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = keyed
      .join(broadcast(offsets), "_pid")
      .withColumn("rnk", col("_off") + count(lit(1)).over(intraW))
      .withColumn("bin",
        when(expr(s"(rnk DIV ${nbins}L) % 2") === 0, col("rnk") % nbins)
          .otherwise(lit(nbins.toLong - 1L) - col("rnk") % nbins))
      .drop("_pid", "_off")
    val binTotals = ranked.groupBy("bin")
      .agg(sum(col(nTokCol)).as("bin_tokens"))
    ranked.join(broadcast(binTotals), "bin")
      .select(col(idCol), col(nTokCol), col("rnk"), col("bin"),
        col("bin_tokens"))
  }

  /** Deterministic global shuffle for training order: every row's position
    * 0..N-1 under the pseudo-random total order (md5(id || seed), id).
    * Changing `seed` gives an independent permutation per epoch; keeping
    * it gives EXACTLY the same order on any rerun, partitioning, or
    * cluster size (position is a rank under a total order that mentions
    * no partition boundary — `rand()`- or `zipWithIndex`-based shuffles
    * guarantee neither).
    *
    * Two-level scan with HASH-PREFIX cells, no range exchange, no
    * materialization barrier: because the sort key IS a hash, its first
    * two hex chars are a monotone bucketing of the key itself — ordering
    * (cell, key, id) with cell = value(key[0..2)) is EXACTLY ordering
    * (key, id). So unlike [[packChunks]] (id-order contract ⇒ sampled
    * range partitioning ⇒ per-evaluation boundaries ⇒ localCheckpoint),
    * both consumers of the keyed frame recompute the cell from the VALUE
    * and necessarily agree: per-cell counts (≤256 rows) cumulate into
    * exclusive offsets, offsets broadcast back, and parallel per-cell
    * windows rank within each cell — the naive
    * `row_number().over(Window.orderBy(key))` would pull the corpus into
    * ONE partition, and the previous range-exchange form paid a
    * serialized checkpoint write (measured as the batch-assembly path's
    * CPU inflator at 16 threads — see [[lengthBucketBatches]]). */
  def globalShuffleOrder(df: DataFrame, idCol: String, seed: String = "",
      numParts: Int = 0): DataFrame = {
    // numParts kept for source compatibility; the cell fan-out is the
    // fixed 256 hash-prefix space (cells are value-derived, so the
    // parameter no longer influences the result — it never did)
    val _ = numParts
    val keyed = df
      .select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(seed))).as("_skey"))
      .withColumn("_cell", conv(substring(col("_skey"), 1, 2), 16, 10)
        .cast("long"))
    val offW = Window.orderBy("_cell")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("_cell")
      .agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(offW), lit(0L)))
      .select("_cell", "_off")
    // count of preceding rows = 0-based rank, one parallel scan per cell
    val intraW = Window.partitionBy("_cell").orderBy(col("_skey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(offsets), "_cell")
      .select(col(idCol),
        (col("_off") + count(lit(1)).over(intraW)).as("pos"))
  }

  /** Length-bucketed training-batch assembly with padding-waste
    * accounting — the dynamic-batching prep a trainer runs when it pads
    * (rather than packs) sequences: round each length up to the next
    * `bucketGrain` multiple, and fill fixed-token-budget batches from
    * each bucket in a deterministic scrambled order. Because every
    * sequence in a bucket pads to the SAME length, a bucket's batch
    * capacity is the constant `max(1, batchTokens div padded_len)` — so
    * batch assignment is pure integer rank arithmetic, no greedy scan,
    * no bin-packing heuristic. Sequences longer than the budget get
    * singleton batches (capacity clamps to 1).
    *
    * Composition order within a bucket is `(salt, id)` with
    * `salt = fmix32-scramble(id) mod saltParts` ([[Sketches.scramble32]])
    * — a PURE FUNCTION of the row values, bit-identical on any cluster
    * size or partitioning, and exactly replayable by the oracle in
    * plain integer SQL. The scramble is a feature for training (id
    * order correlates with crawl order; hash order mixes sources within
    * a batch — the [[globalShuffleOrder]] philosophy), and it is also
    * the scale story: because BOTH consumers of the keyed frame
    * (bucket-offset aggregate, rank window) recompute the salt
    * identically from values, nothing needs a sampled range exchange or
    * a materialization barrier. (Contrast [[packChunks]], whose
    * id-order CONTRACT forces the range partitioning and therefore the
    * checkpoint; measured on BatchScalingBench, the checkpoint write
    * was the path's 2.4× CPU inflator at 16 threads. An md5 salt was
    * measured too: 5.3 s per 100M-row pass at 16 threads, ×2 consumer
    * branches ≈ a third of the whole job — hence the integer scramble.)
    *
    * Output: one row per (padded_len, batch_idx) batch — n_seqs,
    * n_tok_real, n_tok_padded = n_seqs·padded_len, waste = padded −
    * real, plus min/max member ids so the doc→batch assignment itself
    * is pinned by the compare, not just batch shapes.
    *
    * 100 TB shape: ONE data-sized exchange — the rank window's, keyed
    * (padded_len, salt), so a hot bucket (every web doc pads to 512)
    * spreads over `saltParts` window partitions, never one sort; bucket
    * offsets are a ≤ saltParts·|buckets| frame aggregated map-side
    * combinably and broadcast; the batch fold is one combinable
    * aggregate on the (padded_len, batch_idx) key. Narrow (id, n_tok)
    * rows only — the token payload never moves. */
  def lengthBucketBatches(df: DataFrame, idCol: String, nTokCol: String,
      batchTokens: Long, bucketGrain: Long, saltParts: Int = 256): DataFrame = {
    require(batchTokens > 0 && bucketGrain > 0,
      s"batchTokens and bucketGrain must be positive")
    require(saltParts > 0, s"saltParts must be positive, got $saltParts")
    // scramble32's shift/fold arithmetic is defined on non-negative
    // integers (the Similarity.requireNumericId precedent)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)
        .contains(df.schema(idCol).dataType),
      s"lengthBucketBatches id column '$idCol' must be integral " +
        s"(got ${df.schema(idCol).dataType.simpleString}): the salt " +
        "scramble is defined on non-negative integer ids")
    // the salt is a value hash, NOT spark_partition_id(): both consumers
    // recompute it identically, so no materialization is needed for the
    // two branches to agree (the range-sampler hazard cannot exist here)
    val keyed = df
      .select(col(idCol), col(nTokCol).cast("long").as("_nt"))
      .withColumn("_plen", expr(
        s"((greatest(_nt, 1L) + ${bucketGrain - 1}L) DIV ${bucketGrain}L) * ${bucketGrain}L"))
      .withColumn("_salt",
        pmod(Sketches.scramble32(col(idCol)), lit(saltParts.toLong)))
    // per-(bucket, salt) counts — ≤ saltParts·|buckets| rows — cumulated
    // into each salt cell's exclusive within-bucket offset; the window
    // partitions by bucket, so no single partition of this tiny frame
    // ever holds more than `saltParts` rows
    val offsets = keyed.groupBy("_plen", "_salt")
      .agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum("_pn").over(
        Window.partitionBy("_plen").orderBy("_salt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_plen", "_salt", "_off")
    val intraW = Window.partitionBy("_plen", "_salt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(offsets), Seq("_plen", "_salt"))
      .withColumn("_rk", col("_off") + count(lit(1)).over(intraW))
      .withColumn("batch_idx", expr(
        s"_rk DIV greatest(1L, ${batchTokens}L DIV _plen)"))
      .groupBy(col("_plen").as("padded_len"), col("batch_idx"))
      .agg(count(lit(1)).as("n_seqs"), sum("_nt").as("n_tok_real"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
      .withColumn("n_tok_padded", col("n_seqs") * col("padded_len"))
      .withColumn("waste", col("n_tok_padded") - col("n_tok_real"))
  }
}
