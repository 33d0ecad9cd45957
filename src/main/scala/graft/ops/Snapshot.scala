package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a keyed corpus table — the MERGE-INTO /
  * change-data-capture surface an Iceberg-backed training-data pipeline
  * runs between ingestion batches, re-expressed as plain aggregates so
  * no table-format runtime is required.
  *
  * Shared 100 TB contract: neither operator joins the corpus against
  * the corpus. Both tag rows with their side and collapse with ONE
  * map-side-combinable hash aggregate on the uniform key column — a
  * single exchange whose per-key state is one struct, which is also the
  * shape that survives a skewless 1000-executor shuffle unchanged. A
  * changed/deleted fraction of f re-reads the base but shuffles only
  * keys; with the base bucketed on the key the exchange disappears
  * entirely (Exchange reuse / Storage-Partitioned Join).
  */
object Snapshot {

  /** Latest-wins CDC merge: apply a change batch (upserts + deletes) to
    * a base snapshot and return the new snapshot.
    *
    * Contract: `opCol` ∈ {"upsert", "delete"}; `versionCol` is numeric
    * and (key, version) is UNIQUE across base ∪ changes (the CDC
    * sequence number / commit timestamp), so the per-key winner —
    * max(struct(version, …)) — is decided by the version field alone
    * and is deterministic under any partitioning. Base rows carry their
    * snapshot version; a key whose winning row is a delete leaves the
    * snapshot. A key updated AND THEN deleted in the same batch is
    * deleted (the higher version wins); the inverse order resurrects it
    * — exactly the latest-wins semantics of an Iceberg MERGE with a
    * monotonically increasing sequence number.
    *
    * Scale shape: union → one hash aggregate on the key. Map-side
    * combine collapses each partition's candidates before the exchange,
    * so the shuffle carries ≤ one row per (partition, key). */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val ordered = Seq(versionCol, opCol) ++ payloadCols
    val cols = (keyCol +: ordered).map(col)
    val winner = base.select(cols: _*)
      .unionByName(changes.select(cols: _*))
      .groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("_w"))
    winner
      .where(col(s"_w.$opCol") =!= lit("delete"))
      .select(col(keyCol) +: ordered.map(c => col(s"_w.$c")): _*)
  }

  /** Snapshot diff: per-key verdict between two snapshot versions —
    * `added` (only in `after`), `removed` (only in `before`),
    * `changed` (both sides, fingerprints differ), `unchanged`.
    * The audit table a pipeline writes alongside every commit, and the
    * exactness check for an incremental run (diff(expected, actual)
    * must be all-unchanged).
    *
    * Contract: the key is unique within each side and `fp` (a content
    * fingerprint, e.g. md5 of the payload) is non-null. Implementation
    * is join-free: both sides union with their fingerprint in a
    * side-tagged slot, and one hash aggregate per key recovers each
    * side's fingerprint (max over {fp, null} = the fp); the status is a
    * projection over the two slots. */
  /** SCD2 history intervals — the other classic CDC materialization
    * (complementing [[applyChanges]]' latest-wins snapshot): each
    * change row becomes a validity interval `[valid_from, valid_to)`
    * with `valid_to` = the key's NEXT version and null (+`is_current` =
    * true) on the key's latest row — the table a pipeline keeps when it
    * must answer "what was this key's state at version v" (training-data
    * provenance, as-of reproducibility) rather than only "what is it
    * now".
    *
    * Contract: (key, version) is UNIQUE (the CDC sequence number /
    * commit timestamp — the [[applyChanges]] contract), so the interval
    * chain is total and deterministic under any partitioning.
    *
    * Scale shape: ONE exchange on the uniform key; `lead` is a
    * streaming O(1) frame over each key's version chain (never a
    * buffered list). Per-key version counts are bounded by ingest
    * cadence × retention in any real CDC table — the ev_sessions
    * per-user-window precedent; a pathological key with corpus-sized
    * history would need the two-level-scan treatment, which the chain's
    * sequential next-version dependency does not admit join-free. */
  def history(changes: DataFrame, keyCol: String, versionCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(versionCol))
    changes
      .select((keyCol +: versionCol +: payloadCols).map(col): _*)
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(versionCol, "valid_from")
  }

  def diff(before: DataFrame, after: DataFrame, keyCol: String,
      fp: Column): DataFrame = {
    val nullFp = lit(null).cast("string")
    val a = before.select(col(keyCol), fp.cast("string").as("_fp_before"),
      nullFp.as("_fp_after"))
    val b = after.select(col(keyCol), nullFp.as("_fp_before"),
      fp.cast("string").as("_fp_after"))
    a.unionByName(b)
      .groupBy(col(keyCol))
      .agg(max(col("_fp_before")).as("_fb"), max(col("_fp_after")).as("_fa"))
      .select(col(keyCol),
        when(col("_fb").isNull, lit("added"))
          .when(col("_fa").isNull, lit("removed"))
          .when(col("_fb") === col("_fa"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
