package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

class RouterSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  val FixedIso = "2020-04-18T22:16:09.956153+00:00"

  def seqDF(lines: Seq[String]): DataFrame =
    lines.zipWithIndex.map { case (l, i) =>
      (f"doc-$i%06d", l.codePoints().toArray, l.codePointCount(0, l.length), s"src-${i % 3}")
    }.toDF("doc_id", "tokens", "n_tok", "source")

  def route(lines: Seq[String], cfg: config.HotdogConfig = Configs.flagship): Array[Oracle.OracleOut] = {
    val out = Router.route(seqDF(lines), cfg, clock = lit(FixedIso))
      .orderBy("doc_id")
      .select("parse_ok", "topic", "output", "err_merge_invalid_json", "err_merge_target_not_json")
      .collect()
    out.map(r => Oracle.OracleOut(
      r.getBoolean(0), Option(r.getString(1)), Option(r.getString(2)),
      r.getLong(3), r.getLong(4)))
  }

  test("flagship: hello rule → replace + forward to `test`") {
    val line = "<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - hello world"
    val Array(r) = route(Seq(line))
    assert(r.parseOk)
    assert(r.topic.contains("test"))
    assert(r.output.contains(
      "This is the total message: hello world\n\nAnd the name is: world\n"))
  }

  test("flagship: optional named group that did not participate") {
    // msg "hello " + nothing capturable: group doesn't participate → {{name}} renders ""
    val line = "<13>1 2020-04-18T15:16:09Z coconut tyler - - - hello "
    val Array(r) = route(Seq(line))
    assert(r.topic.contains("test"))
    assert(r.output.contains("This is the total message: hello \n\nAnd the name is: \n"))
  }

  test("flagship: JSON meta.topic → merge + dynamic topic") {
    val line = """<13>1 2020-04-15T21:16:43.268478-07:00 coconut tyler - - - {"meta":{"topic":"test"},"i":7}"""
    val Array(r) = route(Seq(line))
    assert(r.topic.contains("test"))
    assert(r.output.contains(
      s"""{"i":7,"meta":{"hotdog":{"timestamp":"$FixedIso","version":"0.5.1"},"topic":"test"}}"""))
  }

  test("replace template with {{&var}} raw form and dotted paths (Spark render path)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '^hello\s+(?P<name>\w+)'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: 'esc={{msg}} amp={{&msg}} miss={{name.x}}|'
        |      - type: forward
        |        topic: test
        |""".stripMargin)
    val line = "<13>1 2020-04-18T15:16:09Z h app - - - hello a<b>"
    val Array(r) = route(Seq(line), cfg)
    assert(r.topic.contains("test"))
    // {{msg}} escapes, {{&msg}} raw, {{name.x}} dotted → "" (flat context)
    assert(r.output.contains("esc=hello a&lt;b&gt; amp=hello a<b> miss=|"))
    assert(Oracle.route(line, cfg, FixedIso).output == r.output)
  }

  test("block helpers render through the Spark Column path (incl. a block over a jmespath value)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - jmespath: 'meta.topic'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: '{{#if value}}topic={{value}}{{else}}no-topic{{/if}} n={{#each this}}{{@key}},{{/each}}'
        |      - type: forward
        |        topic: '{{#if value}}{{value}}{{else}}fallback{{/if}}'
        |  - regex: '^plain (?P<rest>.*)'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: '{{#with rest}}[{{this}}|{{../msg}}]{{/with}}{{^nope}}!inv{{/nope}}'
        |      - type: forward
        |        topic: blocky
        |""".stripMargin)
    val jsonLine = """<13>1 2020-04-18T15:16:09Z h app - - - {"meta":{"topic":"t9"}}"""
    val plainLine = "<13>1 2020-04-18T15:16:09Z h app - - - plain tail"
    val Array(rj, rp) = route(Seq(jsonLine, plainLine), cfg)
    // jmespath value bound → #if truthy; #each this iterates the var map
    // (iso8601, msg, value, version sorted by serde's BTreeMap)
    assert(rj.topic.contains("t9"))
    assert(rj.output.contains("topic=t9 n=iso8601,msg,value,version,"))
    // #with re-roots to the capture; ../msg climbs back; ^nope inverted
    assert(rp.topic.contains("blocky"))
    assert(rp.output.contains("[tail|plain tail]!inv"))
    // driver-side oracle renders identically (same engine, String algebra)
    for (l <- Seq(jsonLine, plainLine)) {
      val o = Oracle.route(l, cfg, FixedIso)
      val s = route(Seq(l), cfg)(0)
      assert(o.topic == s.topic && o.output == s.output, l)
    }
  }

  test("render failures: replace no-op, merge kills, forward counts topic_parse_failed") {
    // rule 1 replace+forward both carry an unknown helper (render Err);
    // rule 2 must still fire because a FAILED forward leaves
    // continue_rules true (src/connection.rs:204-207)
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '^hello (?P<name>\w+)'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: 'pre-{{name}}'
        |      - type: replace
        |        template: '{{bogus name}}'
        |      - type: forward
        |        topic: '{{bogus name}}'
        |  - regex: 'hello'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: second
        |""".stripMargin)
    val line = "<13>1 2020-04-18T15:16:09Z h app - - - hello bob"
    val routed = Router.route(seqDF(Seq(line)), cfg, clock = lit(FixedIso))
      .select("topic", "output", "err_topic_parse_failed").collect()(0)
    // failed replace leaves the buffer at 'pre-bob'; failed forward emits
    // nothing from rule 1; rule 2 forwards the buffer-reset raw msg
    assert(routed.getString(0) == "second")
    assert(routed.getString(1) == "hello bob")
    assert(routed.getLong(2) == 1L)
    val o = Oracle.route(line, cfg, FixedIso)
    assert(o.topic.contains("second") && o.topicParseFailed == 1L)
    // merge with an always-failing template: continue_rules=false but the
    // ACTION LIST continues (no break — connection.rs:211-222), so the
    // same rule's forward still emits the untouched buffer; and NO
    // merge_of_invalid_json count (render Err ≠ invalid msg)
    val mcfg = config.fromYamlString(
      """rules:
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: merge
        |        json:
        |          k: '{{bogus x}}'
        |      - type: forward
        |        topic: after-merge
        |""".stripMargin)
    val jline = """<13>1 2020-04-18T15:16:09Z h app - - - {"a":1}"""
    val m = Router.route(seqDF(Seq(jline)), mcfg, clock = lit(FixedIso))
      .select("topic", "output", "err_merge_invalid_json").collect()(0)
    assert(m.getString(0) == "after-merge")
    assert(m.getString(1) == """{"a":1}""") // buffer untouched by failed merge
    assert(m.getLong(2) == 0L)
    val om = Oracle.route(jline, mcfg, FixedIso)
    assert(om.topic.contains("after-merge") && om.output.contains("""{"a":1}""") &&
      om.mergeInvalidJson == 0L)
  }

  test("flagship: catch-all → logs-unknown with raw msg") {
    val line = "<190>May 13 21:45:18 coconut hotdog: some plain text"
    val Array(r) = route(Seq(line))
    assert(r.topic.contains("logs-unknown"))
    assert(r.output.contains("some plain text"))
  }

  test("flagship: parse error is not routed") {
    val Array(r) = route(Seq("blah"))
    assert(!r.parseOk && r.topic.isEmpty)
  }

  test("non-string meta.topic: jmespath matches, `value` missing → empty topic") {
    val line = """<13>1 2020-04-18T15:16:09Z h a - - - {"meta":{"topic":7}}"""
    val Array(r) = route(Seq(line))
    assert(r.topic.contains("")) // handlebars renders missing {{value}} as ""
    assert(r.output.exists(_.contains("\"topic\":7")))
  }

  test("merge rule on non-JSON msg via regex matcher: kill + raw forward still happens") {
    // rule: regex .* → merge → forward; non-JSON msg: merge fails (invalid json),
    // action list continues, forward emits the raw msg (connection.rs:211-222 has no break)
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: merge
        |        json:
        |          a: 1
        |      - type: forward
        |        topic: t
        |""".stripMargin)
    val line = "<190>May 13 21:45:18 coconut hotdog: not json"
    val Array(r) = route(Seq(line), cfg)
    assert(r.topic.contains("t"))
    assert(r.output.contains("not json"))
    assert(r.mergeInvalidJson == 1L)
  }

  test("merge-only rule failure kills the cascade (later rules never run)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: merge
        |        json:
        |          a: 1
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: later
        |""".stripMargin)
    // non-JSON msg: merge fails → continue_rules=false → rule 2 skipped
    val Array(bad) = route(Seq("<190>May 13 21:45:18 h a: not json"), cfg)
    assert(bad.topic.isEmpty && bad.mergeInvalidJson == 1L)
    // JSON msg: merge succeeds, rule 1 doesn't kill → rule 2 forwards raw msg
    val Array(ok) = route(Seq("""<13>1 2020-04-18T15:16:09Z h a - - - {"x":1}"""), cfg)
    assert(ok.topic.contains("later"))
    assert(ok.output.contains("""{"x":1}""")) // output buffer resets per rule (A7)
    assert(ok.mergeInvalidJson == 0L)
  }

  test("merge target not an object: buffer passes through + stat (connection.rs:325-329)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: merge
        |        json:
        |          - 1
        |      - type: forward
        |        topic: t
        |""".stripMargin)
    val Array(r) = route(Seq("""<13>1 2020-04-18T15:16:09Z h a - - - {"x":1}"""), cfg)
    assert(r.topic.contains("t"))
    assert(r.output.contains("""{"x":1}"""))
    assert(r.mergeTargetNotJson == 1L)
  }

  test("hostname-field routing (single-rule-with-hostname-field.yml)") {
    val cfg = config.fromYamlString(Configs.singleRuleWithHostnameField)
    val lines = Seq(
      "<13>1 2020-04-18T15:16:09Z coconut tyler - - - m1",
      "<13>1 2020-04-18T15:16:09Z otherhost tyler - - - m2",
      "<13>1 2020-04-18T15:16:09Z - tyler - - - m3") // nil hostname: no rule can match
    val rs = route(lines, cfg)
    assert(rs(0).topic.contains("test"))
    assert(rs(0).output.contains("This messages was received by my workstation\n\nm1\n"))
    assert(rs(1).topic.contains("test"))
    assert(rs(1).output.contains("This message NOT received properly\n\nm2\n"))
    assert(rs(2).topic.isEmpty) // null field never matches (connection.rs:129-147)
  }

  test("test-mode golden output (README.adoc:79-91, example.log + hotdog.yml)") {
    val exampleLog = Seq(
      "hello there",
      "This is a somewhat longer line of logs?",
      "This is a MUCH longer log line and it should not be truncated, hopefully",
      """{"this": "is some JSON data", "which": "should also be transmitted properly", "meta" : {"topic" : "test"}}""")
    val df = exampleLog.zipWithIndex.map { case (l, i) => (i + 1, l) }.toDF("line_no", "line")
    val got = Router.testMode(df, Configs.flagship)
      .orderBy("line_no").collect()
      .map(r => (r.getInt(0), r.getSeq[String](1).toList))
    assert(got(0) == (1, List("Regex: ^hello\\s+(?P<name>\\w+)?", "Regex: .*")))
    assert(got(1) == (2, List("Regex: .*")))
    assert(got(2) == (3, List("Regex: .*")))
    assert(got(3) == (4, List("JMESPath: meta.topic", "Regex: .*")))
    // and the driver-side oracle agrees
    exampleLog.zip(got).foreach { case (l, (_, m)) =>
      assert(Oracle.testMode(l, Configs.flagship) == m)
    }
  }

  test("differential: Spark plan == Scala oracle on the synthesized corpus") {
    val n = 4000
    val seqs = Corpus.sequences(spark, n, seed = 7L)
    val lines = seqs.select(exprs.codepointsToString(col("tokens")).as("line"),
        col("doc_id"))
      .orderBy("doc_id").collect().map(_.getString(0))
    val got = Router.route(seqs, Configs.flagship, clock = lit(FixedIso))
      .orderBy("doc_id")
      .select("parse_ok", "topic", "output", "err_merge_invalid_json",
        "err_merge_target_not_json", "line")
      .collect()
    assert(got.length == n)
    var routedCount = 0
    got.zip(lines).zipWithIndex.foreach { case ((r, line), i) =>
      assert(r.getString(5) == line, s"decode mismatch at $i")
      val o = Oracle.route(line, Configs.flagship, FixedIso)
      assert(r.getBoolean(0) == o.parseOk, s"parse_ok mismatch at $i: $line")
      assert(Option(r.getString(1)) == o.topic, s"topic mismatch at $i: $line got=${r.getString(1)} want=${o.topic}")
      assert(Option(r.getString(2)) == o.output, s"output mismatch at $i: $line")
      assert(r.getLong(3) == o.mergeInvalidJson, s"mi mismatch at $i")
      assert(r.getLong(4) == o.mergeTargetNotJson, s"mt mismatch at $i")
      if (o.topic.isDefined) routedCount += 1
    }
    assert(routedCount > n / 2, "corpus should route most rows")
  }

  test("token-array equality invariant on every routed row") {
    val seqs = Corpus.sequences(spark, 2000, seed = 11L)
    val routed = Router.route(seqs, Configs.flagship)
      .filter(col("topic").isNotNull)
    val bad = routed
      .withColumn("rt", exprs.stringToCodepoints(col("line")))
      .filter(not(col("rt") === col("tokens")))
      .count()
    assert(bad == 0)
    // and joined back to the input by doc_id, token arrays are identical
    val joined = routed.select("doc_id", "tokens")
      .join(seqs.select(col("doc_id"), col("tokens").as("orig")), "doc_id")
      .filter(not(col("tokens") === col("orig"))).count()
    assert(joined == 0)
  }

  test("≤1 routed row per input (forward implies stop) — structural") {
    val seqs = Corpus.sequences(spark, 1000, seed = 3L)
    val routed = Router.route(seqs, Configs.flagship)
    assert(routed.count() == 1000) // 1 output row per input row, exactly
  }

  test("single-pass plan: no shuffle before the routed projection") {
    val seqs = Corpus.sequences(spark, 10, seed = 1L)
    val plan = Router.route(seqs, Configs.flagship).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"router introduced a shuffle:\n$plan")
  }

  test("jmespath index chain a[0].b routes (extended access-chain subset)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - jmespath: 'routing[0].topic'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: '{{value}}'
        |""".stripMargin)
    def msgLine(m: String) = s"<13>1 2020-04-18T15:16:09Z coconut tyler - - - $m"
    val lines = Seq(
      msgLine("""{"routing":[{"topic":"alpha"},{"topic":"beta"}]}"""),
      msgLine("""{"routing":[]}"""),          // index OOB → no match
      msgLine("""{"routing":{"topic":"x"}}""")) // not an array → no match
    val rs = route(lines, cfg)
    assert(rs(0).topic.contains("alpha"))
    assert(rs(1).topic.isEmpty)
    assert(rs(2).topic.isEmpty)
    lines.zip(rs).foreach { case (l, r) =>
      assert(Oracle.route(l, cfg, FixedIso).topic == r.topic, l)
    }
  }

  test("{{{msg}}} raw template emits unescaped (handlebars 3.5.5 triple-stache)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: 'esc:{{msg}} raw:{{{msg}}}'
        |      - type: forward
        |        topic: t
        |""".stripMargin)
    val line = "<13>1 2020-04-18T15:16:09Z coconut tyler - - - a<b>&c"
    val Array(r) = route(Seq(line), cfg)
    assert(r.output.contains("esc:a&lt;b&gt;&amp;c raw:a<b>&c"))
    assert(Oracle.route(line, cfg, FixedIso).output == r.output)
  }

  test("empty-string capture overrides a colliding builtin (rules.rs:90-96 Some(\"\") semantics)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '(?P<msg>x*)y'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: '[{{msg}}]'
        |      - type: forward
        |        topic: t
        |""".stripMargin)
    def msgLine(m: String) = s"<13>1 2020-04-18T15:16:09Z coconut tyler - - - $m"
    // "y": the group participates, captures "" → overrides builtin msg → "[]"
    // "xxy": captures "xx" → "[xx]"
    val Array(r1, r2) = route(Seq(msgLine("y"), msgLine("xxy")), cfg)
    assert(r1.output.contains("[]"))
    assert(r2.output.contains("[xx]"))
    // and the differential oracle agrees
    assert(Oracle.route(msgLine("y"), cfg, FixedIso).output.contains("[]"))
    assert(Oracle.route(msgLine("xxy"), cfg, FixedIso).output.contains("[xx]"))
  }

  test("non-participating group does NOT override a builtin") {
    val cfg = config.fromYamlString(
      """rules:
        |  - regex: '(?:(?P<msg>zz))?hello'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: '[{{msg}}]'
        |      - type: forward
        |        topic: t
        |""".stripMargin)
    val line = "<13>1 2020-04-18T15:16:09Z coconut tyler - - - hello there"
    val Array(r) = route(Seq(line), cfg)
    // group never participates → builtin msg survives
    assert(r.output.contains("[hello there]"))
    assert(Oracle.route(line, cfg, FixedIso).output == r.output)
  }

  test("differential across round-2 feature configs (index/quoted jmespath, raw templates, empty captures)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - jmespath: 'routing[0].topic'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: 'raw:{{{msg}}} esc:{{msg}} v:{{value}}'
        |      - type: forward
        |        topic: 'idx-{{value}}'
        |  - jmespath: '"meta info".topic'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: '{{value}}'
        |  - regex: '(?P<msg>q*)z'
        |    field: msg
        |    actions:
        |      - type: replace
        |        template: '[{{msg}}]{{{msg}}}'
        |      - type: forward
        |        topic: cap
        |""".stripMargin)
    val msgs = Seq(
      """{"routing":[{"topic":"t1"},{"topic":"t2"}]}""",
      """{"routing":[]}""",
      """{"routing":"x"}""",
      """{"routing":[{"topic":5}]}""", // non-string → matched, value=null
      """{"routing":[{"topic":""}]}""",
      """{"meta info":{"topic":"m1"}}""",
      """[[1,2],{"a":1}]""",
      "z", "qz", "qqqz", "no match at all", "", "a<b>&\"c z")
    val lines = for {
      (m, i) <- msgs.zipWithIndex
      kind <- 0 to 2
    } yield kind match {
      case 0 => s"<13>1 2020-04-18T15:16:09Z coconut app - - - $m"
      case 1 => s"<190>May 13 21:45:18 h$i hotdog: $m"
      case 2 => s"garbage $m"
    }
    val got = route(lines, cfg)
    lines.zip(got).foreach { case (line, r) =>
      val o = Oracle.route(line, cfg, FixedIso)
      assert(r.parseOk == o.parseOk, line)
      assert(r.topic == o.topic, s"topic mismatch for: $line")
      assert(r.output == o.output, s"output mismatch for: $line")
    }
    // each rule actually fired somewhere
    val topics = got.flatMap(_.topic).toSet
    assert(topics.contains("idx-t1"))
    assert(topics.contains("m1"))
    assert(topics.contains("cap"))
    assert(topics.contains("idx-")) // non-string / empty value renders ""
  }

  test("matcher-less rule is a loadable no-op (reference settings.rs defaults both matchers to None)") {
    val cfg = config.fromYamlString(
      """rules:
        |  - field: msg
        |    actions:
        |      - type: forward
        |        topic: never
        |  - regex: '.*'
        |    field: msg
        |    actions:
        |      - type: forward
        |        topic: always
        |""".stripMargin)
    val line = "<13>1 2020-04-18T15:16:09Z coconut tyler - - - anything"
    val Array(r) = route(Seq(line), cfg)
    assert(r.parseOk)
    assert(r.topic.contains("always")) // rule 0 never matches, rule 1 catches
    assert(Oracle.route(line, cfg, FixedIso).topic.contains("always"))
    // test-mode with a matcher-less rule must not throw either
    val tm = Router.testMode(Seq((1L, "anything")).toDF("line_no", "line"), cfg)
      .collect()
    assert(tm.head.getSeq[String](1) == Seq("Regex: .*"))
  }
}
