package graft.hotdog

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from both interpreted eval and generated code.
  * (A top-level Scala object gets a mirror class with static forwarders,
  * so `graft.hotdog.Codepoints.decode(...)` is valid in generated Java.)
  */
object Codepoints {
  /** tokens (Unicode codepoints) -> string. Inverse of [[encode]]. */
  def decode(arr: ArrayData): UTF8String = {
    val ints = arr.toIntArray()
    UTF8String.fromString(new String(ints, 0, ints.length))
  }

  /** string -> Unicode codepoints. This is the seeded "tokenization" of the
    * corpus (SURVEY.md §1.3): one token per codepoint. */
  def encode(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new Array[Int](n)
    var i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Handlebars-style HTML escape applied to every `{{var}}` substitution.
    * Mirrors handlebars' default escape_fn (the reference renders all
    * templates through handlebars 3.5.5 — src/connection.rs:188,231,318):
    * & < > " ' ` = are escaped. Single pass.
    */
  def htmlEscape(s: UTF8String): UTF8String = {
    val str = s.toString
    var needs = false
    var i = 0
    while (i < str.length && !needs) {
      (str.charAt(i): @annotation.switch) match {
        case '&' | '<' | '>' | '"' | '\'' | '`' | '=' => needs = true
        case _ => ()
      }
      i += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(str.length + 16)
    i = 0
    while (i < str.length) {
      (str.charAt(i): @annotation.switch) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&#x27;")
        case '`'  => sb.append("&#x60;")
        case '='  => sb.append("&#x3D;")
        case c    => sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `CodepointsToString(tokens array<int>) -> string` — P6 decode
  * (SURVEY.md §2.2). Codegen-friendly: stays inside whole-stage codegen. */
case class CodepointsToString(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Codepoints.decode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hotdog.Codepoints.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): CodepointsToString =
    copy(child = newChild)
  override def prettyName: String = "codepoints_to_string"
}

/** `StringToCodepoints(line string) -> array<int>` — the corpus
  * tokenizer; exact inverse of [[CodepointsToString]]. */
case class StringToCodepoints(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Codepoints.encode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hotdog.Codepoints.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): StringToCodepoints =
    copy(child = newChild)
  override def prettyName: String = "string_to_codepoints"
}

/** `HandlebarsEscape(s string) -> string` — the HTML escape handlebars
  * applies to `{{var}}` (not `{{{var}}}`) substitutions (A2 in SURVEY §2.4). */
case class HandlebarsEscape(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Codepoints.htmlEscape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hotdog.Codepoints.htmlEscape($c)")
  override protected def withNewChildInternal(newChild: Expression): HandlebarsEscape =
    copy(child = newChild)
  override def prettyName: String = "handlebars_escape"
}

/** Identity wrapper marked non-deterministic: an optimizer barrier.
  *
  * Spark's PushDownPredicate substitutes Project aliases into pushed
  * predicates with no cost model — `routed.filter($"topic".isNotNull)`
  * would re-inline the ENTIRE cascade (parse, jmespath, merges, renders)
  * into a Filter beneath the router, duplicating the per-row work and
  * blowing the whole-stage-codegen method past the JVM 64KB limit once a
  * join/sink fuses into the stage. Wrapping the predicate in this barrier
  * keeps it above the projection. Evaluation is the child's, unchanged. */
case class NoPushdown(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): NoPushdown =
    copy(child = newChild)
  override def prettyName: String = "no_pushdown"
}

/** Column-level wrappers. */
object exprs {
  import org.apache.spark.sql.graftshim
  def codepointsToString(c: Column): Column = graftshim.column(CodepointsToString(expr(c)))
  def stringToCodepoints(c: Column): Column = graftshim.column(StringToCodepoints(expr(c)))
  def handlebarsEscape(c: Column): Column = graftshim.column(HandlebarsEscape(expr(c)))
  def noPushdown(c: Column): Column = graftshim.column(NoPushdown(expr(c)))
  def expr(c: Column): Expression = graftshim.expression(c)
  def col(e: Expression): Column = graftshim.column(e)
}
