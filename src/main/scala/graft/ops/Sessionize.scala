package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** One event inside a user's stream (micros event time, value pre-scaled
  * to exact integer cents so cross-engine sums are order-independent). */
case class SessionEvent(user_id: Long, t_us: Long, value_c: Long)

/** A closed session: emitted exactly once, either when a later event for
  * the same user proves the gap, or when the watermark passes
  * `t_end_us + gap` (event-time timeout). */
case class ClosedSession(user_id: Long, t_start_us: Long, t_end_us: Long,
    n_events: Long, value_c: Long)

/** Gap-based sessionization — the canonical log-analytics operator the
  * reference's consumers run downstream of a router (a "session" is a
  * maximal run of one user's events where consecutive gaps are ≤ `gap`;
  * a strictly-greater gap starts a new session).
  *
  * Batch shape (`sessionStats`): one hash-shuffle on the user key, then
  * `lag` + running-`sum` window frames — both are STREAMING frames (O(1)
  * buffer per row, no per-group materialization), so the per-partition
  * cost is the external (spillable) sort Spark's window requires anyway.
  * Per-user data lives in one task — inherent to the semantics (session
  * boundaries are a per-user total order); the key's fan-in is bounded by
  * per-user retention, not corpus size, which is the same bounded-key
  * contract DedupPlanSpec whitelists for (doc,pos) joins. An adversarial
  * mega-user (bot traffic) is a data-quality kill upstream, not a plan
  * problem here.
  *
  * Streaming shape (`streamSessions`): `flatMapGroupsWithState` keyed by
  * user with EVENT-TIME timeout. State is the user's OPEN sessions only —
  * O(1) per user (an open session is 4 longs; there is at most one open
  * session once in-order data drains) — never buffered events, which is
  * what makes it a 100 TB operator: an unbounded stream holds state
  * proportional to ACTIVE users, and the timeout expires idle users'
  * state at `t_end + gap` so the store tracks the active set, not the
  * ever-seen set (the same horizon contract as
  * [[graft.hotdog.Streaming.streamingDedupKeys]]).
  */
object Sessionize {

  /** Per-event session sequence number (1-based per user): `lag` marks
    * session starts, a running sum numbers them. Deterministic total
    * order within a user: (`tsCol`, `idCol`). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    // cast: the testdata parquet carries TIMESTAMP_NTZ; under the UTC
    // session this is the same instant DuckDB's epoch_us sees
    val tUs = unix_micros(col(tsCol).cast("timestamp"))
    events
      .withColumn("_prev_us", lag(tUs, 1).over(w))
      .withColumn("_is_start",
        when(col("_prev_us").isNull
          .or(tUs - col("_prev_us") > gapSec * 1000000L), 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_is_start")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_us", "_is_start")
  }

  /** Per-session aggregate row: (user, session_seq, n_events, t_start_us,
    * t_end_us, dur_us, value_c). `valueCol` is summed as exact integer
    * cents (`round(v*100)` per event BEFORE the sum — order-independent,
    * so the hash compare can't be flipped by float addition order).
    *
    * Unlike [[sessionize]] there is NO tie-break column: the per-SESSION
    * stats are provably tie-order independent (a boundary needs a gap
    * strictly > 0, so equal-timestamp events always share a session;
    * `session_seq` counts starts, which depend only on the per-user
    * timestamp MULTISET; count/min/max/sum are order-free). Dropping it
    * lets the scan prune the id column entirely and the exchange + window
    * sort move three narrow longs instead of the full input row — at
    * 100 TB the window sort is the job's memory-bandwidth wall, so bytes
    * per row through it is the number that matters. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      gapSec: Long, valueCol: String): DataFrame = {
    val slim = events.select(
      col(userCol),
      unix_micros(col(tsCol).cast("timestamp")).as("_t_us"),
      round(col(valueCol) * 100).cast("long").as("_v_c"))
    val w = Window.partitionBy(userCol).orderBy(col("_t_us"))
    slim
      .withColumn("_prev_us", lag(col("_t_us"), 1).over(w))
      .withColumn("_is_start",
        when(col("_prev_us").isNull
          .or(col("_t_us") - col("_prev_us") > gapSec * 1000000L), 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("_is_start")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("_t_us")).as("t_start_us"),
        max(col("_t_us")).as("t_end_us"),
        (max(col("_t_us")) - min(col("_t_us"))).as("dur_us"),
        sum(col("_v_c")).as("value_c"))
  }

  /** Streaming gap sessionization over `SessionEvent`s: emits each session
    * exactly once, when it is PROVABLY closed — by a later event of the
    * same user at gap > `gapSec` (data proof), or by the event-time
    * watermark passing `t_end + gap` (timeout proof: no event can extend
    * it any more). A user's final session before end-of-stream is emitted
    * iff the final watermark (max event time − `lateness`) passes its
    * close horizon — the same deliberately-withheld-tail contract as the
    * windowed-count path, and exactly replayable by a batch oracle.
    *
    * In-order contract: events for one user must not arrive across
    * micro-batches out of event-time order by more than `lateness`
    * (within a batch any order is fine — the group iterator is sorted
    * here). State per user: the OPEN session list (merged in start
    * order), in practice length 1. */
  def streamSessions(events: Dataset[SessionEvent], gapSec: Long,
      lateness: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    events
      .withColumn("_et", timestamp_micros(col("t_us")))
      .withWatermark("_et", lateness)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[ClosedSession], ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed every open session's close horizon
            val out = state.getOption.getOrElse(Nil)
            state.remove()
            out.iterator
          } else {
            // merge new events into the open-session list: sort by start,
            // fold adjacent sessions whose gap is ≤ gapUs into one
            val incoming = rows.map(r =>
              ClosedSession(user, r._2, r._2, 1L, r._3)).toList
            val all = (state.getOption.getOrElse(Nil) ++ incoming)
              .sortBy(s => (s.t_start_us, s.t_end_us))
            val merged = all.foldLeft(List.empty[ClosedSession]) {
              case (acc, s) => acc match {
                case h :: t if s.t_start_us - h.t_end_us <= gapUs =>
                  ClosedSession(user, h.t_start_us,
                    math.max(h.t_end_us, s.t_end_us),
                    h.n_events + s.n_events, h.value_c + s.value_c) :: t
                case _ => s :: acc
              }
            }.reverse
            // every session but the last is data-closed (the next session
            // starts > gap after it); the last stays open on its horizon
            val (closed, open) = (merged.init, List(merged.last))
            val horizonMs = open.head.t_end_us / 1000L + gapSec * 1000L
            if (horizonMs <= state.getCurrentWatermarkMs()) {
              // the open session's close horizon already passed (straggler
              // user in a batch whose watermark outran it) — close now
              state.remove()
              (closed ++ open).iterator
            } else {
              state.update(open)
              state.setTimeoutTimestamp(horizonMs)
              closed.iterator
            }
          }
      }
  }

  /** Drive [[streamSessions]] over a staged events directory to
    * completion (AvailableNow), returning the closed-session table. */
  def runStreamSessions(spark: SparkSession, stagedDir: String,
      gapSec: Long, lateness: String, checkpoint: String,
      maxFilesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(spark.read.parquet(stagedDir).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagedDir)
      .as[SessionEvent]
    val sessions = streamSessions(stream, gapSec, lateness)
    val sink = s"ev_sessions_sink_${System.nanoTime()}"
    val q = sessions.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }
}
