package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration weighted PageRank — the graph-centrality sibling of
  * [[Components]]: where connected components answers "which rows are
  * the same thing", PageRank answers "which nodes matter" over the
  * interaction graph a router's output induces (users ↔ event types,
  * hosts ↔ topics, docs ↔ links).
  *
  * Determinism contract (the suite-wide rule): all arithmetic is exact
  * integer — ranks live in micro-units, each edge contributes
  * `(rank · w) div outw`, and the damping fold is
  * `teleport + (dampPct · inflow) div 100`. Integer sums are
  * commutative-exact, so the result is bit-identical on any
  * partitioning / cluster size and the DuckDB oracle replays it
  * hash-for-hash (a float PageRank could flip a ulp on shuffle order).
  * The classic "dangling mass redistribution" is deliberately omitted
  * (mass may shrink, ranks stay comparable) — redistribution needs a
  * per-round global scalar, which is an extra action; the variant here
  * is the standard power-iteration-with-teleport on out-edge nodes.
  *
  * 100 TB shape: the edge table is enriched with its iteration-invariant
  * source out-weight ONCE, pre-partitioned by `src` (the per-round join
  * key) and checkpointed — per round only the node-sized rank table
  * shuffles (the [[Components]] discipline exactly); inflow is one
  * map-side-combinable sum onto the node key space; each round ends in
  * `localCheckpoint` so round r+1 scans r instead of re-deriving the
  * whole chain, and no driver-side graph state ever materializes.
  */
object Graphs {

  /** (node, pr) after exactly `iters` rounds from a uniform
    * `baseMicro` start. Edges are directed; weights must be positive
    * longs. pr(v) = teleport + dampPct% of Σ over in-edges (u,v) of
    * (pr(u) · w(u,v)) div outw(u), with teleport =
    * (baseMicro · (100 − dampPct)) div 100. */
  def pageRank(edgesIn: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int, baseMicro: Long = 1000000L,
      dampPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct in [0,100]: $dampPct")
    val e0 = edgesIn.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val outw = e0.groupBy("src").agg(sum("w").as("outw"))
    val edges = e0.join(outw, "src")
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = edges
      .select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .repartition(col("node"))
      .localCheckpoint()
    val teleport = baseMicro * (100 - dampPct) / 100
    var ranks = nodes.select(col("node"), lit(baseMicro).as("pr"))
    var prevCkpt: Option[DataFrame] = None
    var it = 0
    while (it < iters) {
      val inflow = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("(pr * w) div outw").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      val next = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(nodes("node"),
          (lit(teleport) +
            expr(s"($dampPct * coalesce(inflow, 0L)) div 100")).as("pr"))
        .localCheckpoint()
      prevCkpt.foreach(org.apache.spark.sql.graftshim.unpersistCheckpoint)
      prevCkpt = Some(next)
      ranks = next
      it += 1
    }
    org.apache.spark.sql.graftshim.unpersistCheckpoint(edges)
    org.apache.spark.sql.graftshim.unpersistCheckpoint(nodes)
    ranks
  }
}
