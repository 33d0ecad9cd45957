package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared top-k-per-group ranking that never sorts a group's full
  * candidate set in one partition.
  *
  * `row_number().over(Window.partitionBy(group).orderBy(...))` puts
  * EVERY row of a group into one task and sorts it there — for ANN/
  * retrieval rankings the group is "all candidates for a query", which
  * at corpus scale is the same single-partition flood the round-4/5
  * exact-dedup rework removed (a brute-force baseline's group IS the
  * corpus). The salted two-phase form bounds both sorts:
  *
  *  phase 1: rank within (group, salt) — `salts` parallel cells, each
  *           sorting |group|/salts rows — keep k per cell;
  *  phase 2: rank the ≤ salts·k survivors per group.
  *
  * Output is IDENTICAL to the single window whenever the order is total
  * (every global top-k row is top-k within its own cell); callers order
  * by (score desc, id asc) with per-group-unique ids, which is total.
  * The salt is hash-derived from the id COLUMN VALUE (murmur3 via
  * `hash()` — cheap; it never reaches the output, so unlike Packing's
  * oracle-replayed scramble it needs no SQL replay), not from the
  * partition — results are deterministic under any partitioning/cluster
  * size, the same derandomization contract as Mixing/Packing. */
object Ranks {

  /** Append `rankAs` = 1..k per `groupCol` under `order` (which must be
    * a TOTAL order within each group — include a unique id tiebreak) and
    * drop rows beyond k. `saltFrom` is the per-row unique column the
    * phase-1 salt derives from. */
  def topKPerGroup(df: DataFrame, groupCol: Column, saltFrom: Column,
      order: Seq[Column], k: Int, rankAs: String,
      salts: Int = 64): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    val salt = pmod(hash(saltFrom), lit(salts))
    val local = Window.partitionBy(groupCol, salt).orderBy(order: _*)
    val global = Window.partitionBy(groupCol).orderBy(order: _*)
    df.withColumn("_lrank", row_number().over(local))
      .filter(col("_lrank") <= k)
      .withColumn(rankAs, row_number().over(global))
      .filter(col(rankAs) <= k)
      .drop("_lrank")
  }
}
