package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.hotdog.config._

/** Differential fuzz of the handlebars engine's two algebra instances:
  * the same generic `Hb.render` drives both the driver-side String
  * renderer and the router's Column renderer (`ColumnHbOps`), and
  * "semantics shared by construction" is only as true as the two `Ops`
  * instances agree — escaping, truthiness, failure propagation, and
  * branch selection are all reimplemented per algebra. This spec
  * generates templates over the full supported surface (vars in all
  * three escape modes, dotted/this paths, #if/#unless/#each/#with with
  * else chains, lookup, comments, unknown helpers/partials = render
  * failures) × flat string contexts (html-escapable values, empties,
  * missing keys), renders both ways — the Column side through a real
  * Spark projection — and requires byte-equal output INCLUDING the
  * failure channel (None ⇔ failure-column true).
  *
  * Plus one Column-only law: a var bound to a NULL column must behave
  * exactly like the same key bound to "" (render "", falsy, iterated by
  * {{#each this}} with the same @-vars) — null never occurs in the
  * reference's HashMap<String,String> context, so "" is the semantics
  * the router's null-tolerant coalescing must collapse to.
  */
class HbFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // deterministic sampling (PropertySpec/JmesFuzzSpec style)
  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val seed = org.scalacheck.rng.Seed(24601L)
    val out = Seq.newBuilder[A]
    (1 to n).foldLeft(seed) { (s, _) =>
      val s2 = s.next
      g.apply(Gen.Parameters.default, s2).foreach(out += _)
      s2
    }
    out.result()
  }

  // ---------------- template-source generator (supported surface) ----------------

  private val varNames = Seq("msg", "name", "x", "y", "val")

  private val litG: Gen[String] = Gen.oneOf(
    "", " ", "a b ", "<p>&amp;", "x:", "q'\"", "..", "0", "-", "t\te")

  // paths: plain vars, this-forms, a multi-seg name (non-strict miss),
  // a parent step past the root (miss), a [seg] literal (miss on flat ctx)
  private val pathG: Gen[String] = Gen.oneOf(
    "msg", "name", "x", "y", "val", "miss", "this.msg", "this",
    "a.b", "../x", "[a b]", "@index")

  private val argG: Gen[String] = Gen.oneOf(
    "msg", "x", "y", "miss", "this", "\"lit\"", "''", "\"\"", "'s p'", "name")

  private val varTagG: Gen[String] = for {
    p <- pathG
    form <- Gen.oneOf(0, 1, 2)
  } yield form match {
    case 0 => s"{{$p}}"
    case 1 => s"{{{$p}}}"
    case _ => s"{{&$p}}"
  }

  private val leafTagG: Gen[String] = Gen.frequency(
    6 -> varTagG,
    1 -> Gen.oneOf("{{! a comment }}", "{{!-- has }} inside --}}", "{{log x}}"),
    2 -> (for { o <- Gen.oneOf("this", "msg"); k <- argG }
      yield s"{{lookup $o $k}}"),
    1 -> Gen.oneOf("{{fnord x}}", "{{> somePartial}}", "{{upper msg y}}"))

  private def blockG(depth: Int): Gen[String] = {
    val body = partsG(depth - 1)
    Gen.frequency(
      3 -> (for { a <- argG; b <- body; e <- body; hasElse <- Gen.oneOf(true, false) }
        yield if (hasElse) s"{{#if $a}}$b{{else}}$e{{/if}}"
        else s"{{#if $a}}$b{{/if}}"),
      2 -> (for { a <- argG; b <- body; e <- body }
        yield s"{{#unless $a}}$b{{else}}$e{{/unless}}"),
      2 -> (for { a <- argG; a2 <- argG; b <- body; e <- body; f <- body }
        yield s"{{#if $a}}$b{{else if $a2}}$e{{else}}$f{{/if}}"),
      2 -> (for { b <- body; e <- body }
        yield s"{{#each this}}{{@index}}{{@key}}={{this}};$b{{else}}$e{{/each}}"),
      1 -> (for { a <- Gen.oneOf("msg", "x", "miss"); b <- body; e <- body }
        yield s"{{#each $a}}$b{{else}}$e{{/each}}"),
      2 -> (for { a <- argG; b <- body; e <- body }
        yield s"{{#with $a}}[{{this}}]$b{{else}}$e{{/with}}"),
      1 -> (for { a <- Gen.oneOf("msg", "x", "miss"); b <- body }
        yield s"{{^$a}}$b{{/$a}}"))
  }

  private def partsG(depth: Int): Gen[String] = {
    val leaf = Gen.frequency(3 -> litG, 4 -> leafTagG)
    val item = if (depth <= 0) leaf else Gen.frequency(5 -> leaf, 3 -> blockG(depth))
    for { n <- Gen.choose(0, 4); ps <- Gen.listOfN(n, item) } yield ps.mkString
  }

  private val templateG: Gen[String] = partsG(2)

  // ---------------- contexts ----------------

  private val values = Seq("", "hello", "a<b>&\"c'`=", "0", "false", " x ", "wide text here")
  private val scenarios: Seq[Map[String, String]] = Seq(
    Map.empty,
    Map("msg" -> "hello"),
    Map("msg" -> "a<b>&\"c'`=", "x" -> ""),
    Map("msg" -> "m", "name" -> "n", "x" -> "0", "y" -> "false", "val" -> " x "),
    Map("x" -> "only", "val" -> "a&b"),
    Map("msg" -> "", "name" -> "a<b>&\"c'`=", "y" -> "wide text here"))

  /** render all templates under one scenario through a REAL Spark
    * projection (vars bound to columns of a one-row frame), in chunks so
    * no select exceeds ~400 columns. */
  private def renderColumns(tpls: Seq[Template],
      scenario: Map[String, String]): Seq[Option[String]] = {
    val base =
      if (scenario.isEmpty) spark.range(1).select(lit(0).as("_dummy"))
      else spark.range(1).select(scenario.toSeq.map { case (k, v) =>
        lit(v).as(k) }: _*)
    tpls.grouped(200).flatMap { chunk =>
      val vars = scenario.keys.map(k => k -> col(k)).toMap
      val cols = chunk.zipWithIndex.flatMap { case (t, j) =>
        val (v, f) = Hb.render(t, vars, ColumnHbOps)
        Seq(v.as(s"v$j"), f.as(s"f$j"))
      }
      val row = base.select(cols: _*).collect()(0)
      chunk.indices.map { j =>
        if (row.getBoolean(row.fieldIndex(s"f$j"))) None
        else Some(row.getString(row.fieldIndex(s"v$j")))
      }
    }.toSeq
  }

  test("Column renderer == String renderer over generated templates × contexts") {
    val sources = sample(templateG, 400).distinct
    val tpls = sources.map(Hb.parse)
    var checked = 0
    scenarios.foreach { sc =>
      val colRes = renderColumns(tpls, sc)
      tpls.zip(colRes).zip(sources).foreach { case ((t, c), src) =>
        val s = t.renderStringOpt(sc)
        assert(s == c, s"template <$src> context $sc: string=$s column=$c")
        checked += 1
      }
    }
    assert(checked >= 1500, s"only $checked comparisons ran")
  }

  test("null Column var == empty-string var (render, truthiness, each/with)") {
    val sources = sample(templateG, 150).distinct
    val tpls = sources.map(Hb.parse)
    val keys = Seq("msg", "x")
    // scenario A: msg/x bound to NULL columns; scenario B: bound to ""
    val baseNull = spark.range(1).select(
      keys.map(k => lit(null).cast("string").as(k)): _*)
    val baseEmpty = spark.range(1).select(keys.map(k => lit("").as(k)): _*)
    def render(base: org.apache.spark.sql.DataFrame): Seq[Option[String]] =
      tpls.grouped(200).flatMap { chunk =>
        val vars = keys.map(k => k -> col(k)).toMap
        val cols = chunk.zipWithIndex.flatMap { case (t, j) =>
          val (v, f) = Hb.render(t, vars, ColumnHbOps)
          Seq(v.as(s"v$j"), f.as(s"f$j"))
        }
        val row = base.select(cols: _*).collect()(0)
        chunk.indices.map { j =>
          if (row.getBoolean(row.fieldIndex(s"f$j"))) None
          else Some(row.getString(row.fieldIndex(s"v$j")))
        }
      }.toSeq
    val a = render(baseNull)
    val b = render(baseEmpty)
    // and both must equal the String renderer with the keys present as ""
    val strCtx = keys.map(_ -> "").toMap
    tpls.indices.foreach { i =>
      assert(a(i) == b(i), s"template <${sources(i)}>: null=${a(i)} empty=${b(i)}")
      val s = tpls(i).renderStringOpt(strCtx)
      assert(a(i) == s, s"template <${sources(i)}>: null=${a(i)} string=$s")
    }
  }
}
