package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers + custom codegen expressions for the dedup / similarity
  * operators. All hashing is self-contained (FNV-1a 64) so signatures are
  * stable across Spark versions and partitionings.
  */
object OpsKernels {

  /** FNV-1a 64-bit over UTF-8 bytes, with a seed mixed in. */
  def fnv1a64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over string tokens (sign of per-bit vote). */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** MinHash signature: k minima over the shingle set. Each shingle is
    * string-hashed exactly twice; the k hash functions are derived via
    * Kirsch-Mitzenmacher g_j(x) = h1(x) + j·h2(x) (standard for Bloom/
    * MinHash families) — 32× less string hashing than k seeded passes. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = fnv1a64(s, 1L)
        val h2 = fnv1a64(s, 2L) | 1L // odd → full-period linear family
        var j = 0
        var g = h1
        while (j < k) {
          if (g < sig(j)) sig(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Cosine similarity between two float arrays, accumulated in double. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product of a float array against one deterministic pseudo-random
    * hyperplane (unit-free): plane weights derived from fnv of (plane, dim).
    * Used for LSH signatures over embeddings. */
  def hyperplaneBit(v: ArrayData, plane: Int): Boolean = {
    val n = v.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      val h = fnv1a64(UTF8String.fromString(plane + ":" + i), 7L)
      // map hash to {-1, +1}
      val w = if ((h & 1L) == 1L) 1.0 else -1.0
      dot += v.getFloat(i).toDouble * w
      i += 1
    }
    dot >= 0.0
  }
}

/** `SimHash64(tokens array<string>) -> long` */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.OpsKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** `MinHashSig(shingles array<string>, k) -> array<long>` (k literal) */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.OpsKernels.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** `CosineSimF(a array<float>, b array<float>) -> double` */
case class CosineSimF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    OpsKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.OpsKernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimF =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim_f"
}

object opscol {
  def simhash64(c: Column): Column =
    graftshim.column(SimHash64(graftshim.expression(c)))
  def minhashSig(c: Column, k: Int): Column =
    graftshim.column(MinHashSig(graftshim.expression(c), k))
  def cosineSimF(a: Column, b: Column): Column =
    graftshim.column(CosineSimF(graftshim.expression(a), graftshim.expression(b)))
}
