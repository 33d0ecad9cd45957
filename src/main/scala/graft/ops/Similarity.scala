package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  *  - bruteForceTopK: the exactness baseline. Query set is broadcast
  *    (must be small); corpus side streams — one narrow pass + a top-k
  *    window per query. At 100 TB this is the "score everything against
  *    K probes" shape: no corpus shuffle, only the final per-query top-k.
  *  - lshTopK: random-hyperplane LSH — per-row signature (narrow),
  *    shuffle only on (band, bucket); exact cosine re-rank within the
  *    candidate set. The scale path when the query set is large.
  *  - embeddingNearDups: all-pairs near-duplicate detection via the same
  *    LSH buckets (cosine ≥ threshold), never a cross join.
  */
object Similarity {

  /** exact cosine top-k of `queries` (small, broadcast) against `corpus`.
    * Returns (query_id, neighbor_id, rank, sim_e6) — similarity as an
    * integer in 1e-6 units so cross-engine comparison is float-safe. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", opscol.cosineSimF(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("sim") * 1e6).cast("long").as("sim_e6"))
  }

  /** `planes`-bit random-hyperplane signature of an embedding. */
  def lshSignature(vec: Column, planes: Int): Column =
    transform(sequence(lit(0), lit(planes - 1)),
      p => org.apache.spark.sql.graftshim.column(
        HyperplaneBit(org.apache.spark.sql.graftshim.expression(vec),
          org.apache.spark.sql.graftshim.expression(p))))

  /** Candidate pairs sharing ≥1 LSH band, re-ranked by exact cosine.
    * Returns near-dup pairs (id_a, id_b, sim_e6) with cosine ≥ minSimE6. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      minSimE6: Long, planes: Int = 16, bands: Int = 4): DataFrame = {
    val per = planes / bands
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("s", lshSignature(col("v"), planes))
    val banded = sig.select(col("id"), col("v"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_", b.cast("string"),
          array_join(transform(sequence(b * per, (b + 1) * per - 1),
            i => element_at(col("s"), i + 1).cast("string")), "_"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // id-pairs-only distinct, then re-join the vectors (see Dedup notes)
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("sim_e6",
        floor(opscol.cosineSimF(col("v_a"), col("v_b")) * 1e6).cast("long"))
      .filter(col("sim_e6") >= minSimE6)
      .select("id_a", "id_b", "sim_e6")
  }
}

/** `HyperplaneBit(vec array<float>, plane int) -> boolean` — sign of the
  * dot product against a deterministic pseudo-random ±1 hyperplane. */
case class HyperplaneBit(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, p: Any): Any =
    OpsKernels.hyperplaneBit(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      p.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p) => s"graft.ops.OpsKernels.hyperplaneBit($v, $p)")
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): HyperplaneBit =
    copy(left = l, right = r)
  override def prettyName: String = "hyperplane_bit"
}
