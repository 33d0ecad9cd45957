package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests (SURVEY §5.4): pure-JVM differential properties against
  * the Scala oracle + structural invariants. */
class PropertySpec extends AnyFunSuite {

  /** plain-ScalaCheck forAll: sample N cases from the generator (the
    * scalatestplus bridge is not on the offline classpath) */
  def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate((g.sample, seed)) { case (_, s) =>
      val s2 = s.next
      (g.apply(Gen.Parameters.default, s2), s2)
    }.take(n).foreach { case (v, _) => v.foreach(f) }
  }
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  val FixedIso = "2020-04-18T22:16:09.956153+00:00"

  // generators -------------------------------------------------------------
  val word: Gen[String] = Gen.oneOf("hello", "there", "spark", "log", "x1",
    "the", "quick", "topic", "blah", "err", "a")
  val jsonScalar: Gen[String] = Gen.oneOf(
    "1", "2.5", "true", "false", "null", "\"s\"", "\"t0\"")
  def jsonValue(depth: Int): Gen[String] =
    if (depth <= 0) jsonScalar
    else Gen.frequency(
      3 -> jsonScalar,
      2 -> Gen.listOfN(2, jsonValue(depth - 1)).map(_.mkString("[", ",", "]")),
      2 -> (for {
        ks <- Gen.listOfN(2, Gen.oneOf("a", "b", "meta", "topic", "k"))
        vs <- Gen.listOfN(2, jsonValue(depth - 1))
      } yield ks.distinct.zip(vs).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")))

  val msgGen: Gen[String] = Gen.frequency(
    3 -> Gen.listOfN(4, word).map(_.mkString(" ")),
    2 -> jsonValue(2),
    1 -> (for (t <- Gen.oneOf("t0", "t1", "x")) yield s"""{"meta":{"topic":"$t"},"k":1}"""),
    1 -> Gen.const(""))

  val lineGen: Gen[String] = for {
    pri <- Gen.choose(0, 191)
    kind <- Gen.choose(0, 3)
    host <- Gen.oneOf("coconut", "h1", "-")
    msg <- msgGen
  } yield kind match {
    case 0 => s"<$pri>1 2020-04-18T15:16:09.956153-07:00 $host app - - - $msg"
    case 1 => s"<$pri>May 13 21:45:18 $host hotdog: $msg"
    case 2 => s"<$pri>1 2020-04-18T15:16:09Z $host app - - [x y=\"1\"] $msg"
    case 3 => s"garbage $msg"
  }

  // properties -------------------------------------------------------------
  test("parse never throws; 5424/3164 fields are consistent") {
    forAll(lineGen) { line =>
      val p = SyslogParser.parseToOption(line) // must not throw
      p.foreach { m =>
        assert(m.msg != null)
        m.severity.foreach(s => assert(model.SeverityNames.contains(s)))
        m.facility.foreach(f => assert(model.FacilityNames.contains(f)))
      }
    }
  }

  test("merge is total on arbitrary JSON pairs and serializes sorted-compact") {
    forAll(jsonValue(3), jsonValue(3)) { (a, b) =>
      val na = HotdogJson.parseOrNull(a)
      val nb = HotdogJson.parseOrNull(b)
      whenever(na != null && nb != null) {
        val out = HotdogJson.serialize(HotdogJson.merge(na, nb))
        val re = HotdogJson.parseOrNull(out)
        assert(re != null, s"merge output not valid JSON: $out")
        // idempotent serialization (already sorted + compact)
        assert(HotdogJson.serialize(re) == out)
        assert(!out.contains(": ") && !out.contains(", "))
      }
    }
  }

  test("merge with {} is identity up to key-sorting") {
    forAll(jsonValue(3)) { a =>
      val na = HotdogJson.parseOrNull(a)
      whenever(na != null && na.isObject) {
        val sortedA = HotdogJson.serialize(na)
        assert(HotdogJson.performMerge(a, "{}") == sortedA)
      }
    }
  }

  test("oracle: at most one routed emit per line; parse errors never route") {
    forAll(lineGen) { line =>
      val o = Oracle.route(line, Configs.flagship, FixedIso)
      if (!o.parseOk) assert(o.topic.isEmpty && o.output.isEmpty)
      assert(o.topic.isDefined == o.output.isDefined)
    }
  }

  test("oracle: catch-all means every parsed line routes (flagship config)") {
    forAll(lineGen) { line =>
      val o = Oracle.route(line, Configs.flagship, FixedIso)
      // flagship rule 3 is `.*` forward; only a merge-kill can stop routing,
      // and flagship's merge rule only matches valid-JSON msgs (jmespath),
      // so every parsed line must route
      if (o.parseOk) assert(o.topic.isDefined, s"parsed but unrouted: $line")
    }
  }

  test("differential: Spark router == oracle on random generated lines") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = Gen.listOfN(300, lineGen).sample.get
    val df = lines.zipWithIndex.map { case (l, i) =>
      (f"doc-$i%05d", l.codePoints().toArray, l.codePointCount(0, l.length), "s")
    }.toDF("doc_id", "tokens", "n_tok", "source")
    val got = Router.route(df, Configs.flagship, clock = lit(FixedIso))
      .orderBy("doc_id")
      .select("parse_ok", "topic", "output").collect()
    got.zip(lines).foreach { case (r, line) =>
      val o = Oracle.route(line, Configs.flagship, FixedIso)
      assert(r.getBoolean(0) == o.parseOk, s"parse_ok: $line")
      assert(Option(r.getString(1)) == o.topic, s"topic: $line")
      assert(Option(r.getString(2)) == o.output, s"output: $line")
    }
  }

  test("differential: full-jmespath showcase rules (filter/slice/max_by) on random docs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // telemetry docs around the showcase shape + adversarial junk: ties,
    // empty/missing arrays, wrong types, scalar roots, non-JSON
    val itemsGen = for {
      pa <- Gen.choose(0, 30)
      pb <- Gen.choose(0, 30)
      tags <- Gen.oneOf("""["x"]""", """["x","t1"]""", "[]",
        """["a","b","c"]""", "\"notags\"", "null")
      items <- Gen.oneOf(
        s"""[{"n":"a","p":$pa},{"n":"b","p":$pb}]""",
        s"""[{"n":"a","p":$pa}]""", "[]", s"""[{"p":$pa}]""", "{}", "3")
    } yield s"""{"items":$items,"tags":$tags}"""
    val showMsg: Gen[String] = Gen.frequency(
      5 -> itemsGen,
      2 -> jsonValue(2),
      2 -> Gen.listOfN(3, word).map(_.mkString(" ")),
      1 -> Gen.const("42"))
    val showLine = showMsg.map(m => s"<13>1 2020-04-18T15:16:09Z h app - - - $m")
    val lines = Gen.listOfN(400, showLine).sample.get
    val df = lines.zipWithIndex.map { case (l, i) =>
      (f"doc-$i%05d", l.codePoints().toArray, l.codePointCount(0, l.length), "s")
    }.toDF("doc_id", "tokens", "n_tok", "source")
    val got = Router.route(df, Configs.jmesShowcase, clock = lit(FixedIso))
      .orderBy("doc_id")
      .select("parse_ok", "topic", "output").collect()
    got.zip(lines).foreach { case (r, line) =>
      val o = Oracle.route(line, Configs.jmesShowcase, FixedIso)
      assert(r.getBoolean(0) == o.parseOk, s"parse_ok: $line")
      assert(Option(r.getString(1)) == o.topic, s"topic: $line")
      assert(Option(r.getString(2)) == o.output, s"output: $line")
    }
  }

  test("differential holds across rule-config shapes (field routing, merge-only, stop-less)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val configs = Seq(
      // severity-field routing (P5 on a PRI-derived field)
      """rules:
        |  - regex: '^(err|crit|alert|emerg)$'
        |    field: severity
        |    actions:
        |      - type: replace
        |        template: 'ALERT[{{iso8601}}]: {{msg}}'
        |      - type: forward
        |        topic: alerts
        |  - regex: '.*'
        |    field: facility
        |    actions:
        |      - type: forward
        |        topic: 'by-facility'
        |""".stripMargin,
      // merge-only rule then catch-all (merge kill semantics on random JSON)
      """rules:
        |  - regex: '\{'
        |    field: msg
        |    actions:
        |      - type: merge
        |        json:
        |          tag: '{{version}}'
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: rest
        |""".stripMargin,
      // forward without stop + rule after it (forward implies stop anyway)
      """rules:
        |  - jmespath: 'meta.topic'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: '{{value}}'
        |  - regex: 'hello'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: 'H:{{msg}}'
        |      - type: forward
        |        topic: hello
        |""".stripMargin)
    configs.foreach { yml =>
      val cfg = config.fromYamlString(yml)
      val lines = Gen.listOfN(250, lineGen).sample.get
      val df = lines.zipWithIndex.map { case (l, i) =>
        (f"doc-$i%05d", l.codePoints().toArray, l.codePointCount(0, l.length), "s")
      }.toDF("doc_id", "tokens", "n_tok", "source")
      val got = Router.route(df, cfg, clock = lit(FixedIso))
        .orderBy("doc_id")
        .select("parse_ok", "topic", "output",
          "err_merge_invalid_json", "err_merge_target_not_json").collect()
      got.zip(lines).foreach { case (r, line) =>
        val o = Oracle.route(line, cfg, FixedIso)
        assert(r.getBoolean(0) == o.parseOk, s"parse_ok: $line")
        assert(Option(r.getString(1)) == o.topic, s"topic: $line\ncfg: $yml")
        assert(Option(r.getString(2)) == o.output, s"output: $line\ncfg: $yml")
        assert(r.getLong(3) == o.mergeInvalidJson, s"mi: $line")
        assert(r.getLong(4) == o.mergeTargetNotJson, s"mt: $line")
      }
    }
  }

  test("encode/decode round-trips arbitrary unicode strings") {
    val piece: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf("日", "本", "🌭", "é", " "))
    forAll(Gen.listOf(piece).map(_.mkString)) { s =>
      val enc = Codepoints.encode(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(Codepoints.decode(enc).toString == s)
    }
  }
}
