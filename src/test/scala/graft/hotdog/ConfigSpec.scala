package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import graft.hotdog.config._

class ConfigSpec extends AnyFunSuite {

  test("hotdog.yml flagship config loads: 3 rules, right shapes") {
    val cfg = Configs.flagship
    assert(cfg.rules.size == 3)
    val r0 = cfg.rules(0)
    assert(r0.field == "msg" && r0.regex.isDefined && r0.jmespath.isEmpty)
    assert(r0.regex.get.namedGroups == Seq("name"))
    assert(r0.actions.size == 3)
    val r1 = cfg.rules(1)
    assert(r1.jmespathRaw.contains("meta.topic"))
    assert(r1.actions.head.isInstanceOf[AMerge])
    val r2 = cfg.rules(2)
    assert(r2.regex.get.original == ".*")
  }

  test("merge json_str cache: compact, sorted keys, vars intact (settings.rs:223-235)") {
    val cfg = config.fromYamlString(Configs.singleRuleWithMerge)
    val AMerge(t, nonObj) = cfg.rules(0).actions(0)
    assert(!nonObj)
    val raw = t.parts.map {
      case TLit(s) => s
      case TVar(n) => s"{{$n}}"
    }.mkString
    assert(raw == """{"meta":{"hotdog":{"timestamp":"{{iso8601}}","version":"{{version}}"}}}""")
  }

  test("invalid jmespath is a load-time failure (connection.rs:485-490)") {
    assertThrows[IllegalArgumentException] {
      config.fromYamlString(Configs.singleRuleWithInvalidJmespath)
    }
  }

  test("regex dialect translation (?P<n>) → (?<n>) with group indexes") {
    val rx = compileRegex("""^hello\s+(?P<name>\w+)?""")
    assert(rx.javaPattern == """^hello\s+(?<name>\w+)?""")
    assert(rx.groupIndexOf("name") == 1)
    val rx2 = compileRegex("""(a)(?:b)(?P<x>c)(?P<y>d)""")
    assert(rx2.groupIndexOf("x") == 2 && rx2.groupIndexOf("y") == 3)
    // char class with parens + lookbehind are not capturing
    val rx3 = compileRegex("""[()](?<=x)(?P<z>\w)""")
    assert(rx3.groupIndexOf("z") == 1)
  }

  test("template parse + render + html escape (handlebars default escape_fn)") {
    val t = parseTemplate("msg: {{msg}} name={{name}}!")
    assert(t.renderString(Map("msg" -> """a<b>&"c'`=""", "name" -> "x"))
      == "msg: a&lt;b&gt;&amp;&quot;c&#x27;&#x60;&#x3D; name=x!")
    // unknown var renders empty (non-strict handlebars)
    assert(t.renderString(Map("msg" -> "m")) == "msg: m name=!")
  }

  test("unsupported handlebars constructs rejected at load") {
    assertThrows[IllegalArgumentException](parseTemplate("{{#if x}}y{{/if}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{> partial}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{fn x}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{../x}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{[a b]}}"))
  }

  test("handlebars dotted paths + {{&var}} (3.5.5 semantics, flat string context)") {
    // {{&x}} is handlebars' second raw form — identical to {{{x}}}
    val amp = parseTemplate("esc={{msg}} amp={{&msg}}")
    assert(amp.renderString(Map("msg" -> "a<b>&")) == "esc=a&lt;b&gt;&amp; amp=a<b>&")
    assert(amp.varNames == Seq("msg", "msg"))
    // dotted paths LOAD (the reference renders them through full
    // handlebars) but navigate a flat HashMap<String,String> context —
    // a 2+-segment path can never resolve → non-strict renders ""
    val dotted = parseTemplate("v={{value.x}}|w={{{a.b.c}}}|y={{&a.b}}|z={{msg}}")
    assert(dotted.renderString(Map("value" -> "s", "msg" -> "m")) == "v=|w=|y=|z=m")
    assert(dotted.varNames == Seq("msg")) // paths are not simple vars
    assert(dotted.parts.contains(TPathMiss("value.x")))
  }

  test("jmespath access chains compile: index subscripts + quoted identifiers") {
    import Jmes._
    assert(compileJmesPath("meta.topic") == SubExpr(Field("meta"), Field("topic")))
    assert(compileJmesPath("a[0].b") ==
      SubExpr(SubExpr(Field("a"), Index(0)), Field("b")))
    assert(compileJmesPath("items[-1].id") ==
      SubExpr(SubExpr(Field("items"), Index(-1)), Field("id")))
    assert(compileJmesPath("[2]") == SubExpr(Current, Index(2)))
    assert(compileJmesPath("\"a b\".c") == SubExpr(Field("a b"), Field("c")))
    assert(compileJmesPath("\"x\\\"y\"") == Field("x\"y"))
    // JSON-string escapes decode (JMESPath spec), unknown escapes fail
    assert(compileJmesPath("\"a\\nb\"") == Field("a\nb"))
    assert(compileJmesPath("\"a\\u0041b\"") == Field("aAb"))
    assert(compileJmesPath("\"a\\tb\\\\c\"") == Field("a\tb\\c"))
    assertThrows[IllegalArgumentException](compileJmesPath("\"a\\qb\""))
    assertThrows[IllegalArgumentException](compileJmesPath("\"a\\u00g1\""))
  }

  test("full jmespath compiles; true syntax errors still fail the load") {
    // the reference's own invalid fixture must STILL fail
    assertThrows[IllegalArgumentException](compileJmesPath(". 0 meta.topic"))
    for (e <- Seq("", "a..b", "a[", "a[1", "0abc", "a =b", "a[b]", "{a}",
        "&", "a.", "foo[:0:0]", "@@"))
      assertThrows[IllegalArgumentException](compileJmesPath(e))
    // round 2's load-rejected feature set now compiles (full language)
    for (e <- Seq("a[?b=='x']", "a[*].b", "a[0:2]", "length(a)", "a.*",
        "a | b", "a[]", "a && b || !c", "sort_by(x, &y)[-1].z",
        "{k: a.b, j: c}", "[a, b[0]]", "`{\"x\": 1}`.x", "'raw'"))
      compileJmesPath(e)
  }

  test("triple-stache {{{var}}} loads and renders WITHOUT html escape") {
    val t = parseTemplate("esc={{msg}} raw={{{msg}}}")
    assert(t.renderString(Map("msg" -> "a<b>&")) == "esc=a&lt;b&gt;&amp; raw=a<b>&")
    assert(t.varNames == Seq("msg", "msg"))
    // unknown raw var renders empty; helpers inside {{{ }}} still rejected
    assert(parseTemplate("{{{nope}}}").renderString(Map.empty) == "")
    assert(parseTemplate("{{{a.b}}}").renderString(Map.empty) == "") // dotted → ""
    assertThrows[IllegalArgumentException](parseTemplate("{{{f x}}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{{x}} y"))
  }

  test("HOTDOG_* env overlay: flat lowercased top-level keys (settings.rs:30-42 config-rs layering)") {
    val yaml =
      """global:
        |  kafka:
        |    topic: 'test'
        |  metrics:
        |    statsd: 'localhost:8125'
        |rules: []
        |""".stripMargin
    val cfg = config.fromYamlString(yaml,
      env = Map("HOTDOG_THREADS" -> "8", "HOTDOG_REGION" -> "eu", "PATH" -> "/ignored"))
    // yaml tree reachable via dotted paths
    assert(cfg.setting("global.kafka.topic").contains("test"))
    assert(cfg.setting("global.metrics.statsd").contains("localhost:8125"))
    // env vars land as flat top-level keys, as RAW STRINGS (config-rs
    // stores env values as strings; coercion happens on typed get — so
    // YAML-1.1 booleany words like "no"/"on" are NOT retyped)
    assert(cfg.setting("threads").contains("8"))
    assert(cfg.setting("region").contains("eu"))
    assert(config.fromYamlString(yaml, env = Map("HOTDOG_FLAG" -> "no"))
      .setting("flag").contains("no"))
    assert(cfg.setting("global.listen.port").isEmpty)
    // env does NOT address nested keys (config-rs has no separator configured)
    val cfg2 = config.fromYamlString(yaml,
      env = Map("HOTDOG_GLOBAL_KAFKA_TOPIC" -> "other"))
    assert(cfg2.setting("global.kafka.topic").contains("test"))
    assert(cfg2.setting("global_kafka_topic").contains("other"))
  }

  test("kafka producer errcode → metric name (kafka.rs:256-273 ports)") {
    assert(Stats.kafkaErrorMetricName("MessageTimedOut") == "messagetimedout")
    assert(Stats.kafkaErrorMetricName("UnknownTopic") == "unknowntopic")
    assert(Stats.kafkaErrorMetricName("ReadOnly") == "readonly")
    assert(Stats.kafkaErrorMetric("ReadOnly") == "kafka.producer.error.readonly")
  }

  test("kafka buffer default is 1024 (settings.rs:243-246 port)") {
    assert(config.fromYamlString("rules: []\n", Map.empty).kafkaBufferSize == 1024)
    val withBuffer = config.fromYamlString(
      "global:\n  kafka:\n    buffer: 2048\nrules: []\n", Map.empty)
    assert(withBuffer.kafkaBufferSize == 2048)
    // the reference's own hotdog.yml sets 1024 explicitly
    assert(Configs.flagship.kafkaBufferSize == 1024)
  }

  test("every rule has a unique uuid (settings.rs:248-252 port; ours deterministic)") {
    val ids = Configs.flagship.rules.map(_.uuid)
    assert(ids.distinct.size == ids.size)
    assert(ids.forall(_.nonEmpty))
  }

  test("field values validated") {
    assertThrows[IllegalArgumentException] {
      config.fromYamlString(
        "rules:\n  - regex: 'x'\n    field: bogus\n    actions: []\n")
    }
  }
}
