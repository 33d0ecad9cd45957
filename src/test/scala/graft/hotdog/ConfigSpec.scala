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

  test("handlebars SYNTAX errors are load-fatal (register_template_string parity)") {
    // register_template_string rejects malformed syntax; everything that
    // PARSES registers fine and fails (or not) at render — round 4 moved
    // this boundary to match (blocks/helpers/partials now load)
    assertThrows[IllegalArgumentException](parseTemplate("{{#if x}}y{{/each}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{#if x}}unclosed"))
    assertThrows[IllegalArgumentException](parseTemplate("{{/if}}"))
    assertThrows[IllegalArgumentException](parseTemplate("{{else}}"))
    assertThrows[IllegalArgumentException](parseTemplate("open {{x"))
    assertThrows[IllegalArgumentException](parseTemplate("{{!-- unclosed"))
  }

  test("handlebars block helpers: #if/#unless/#each/#with, else chains, inverted") {
    val vars = Map("msg" -> "hello", "empty" -> "", "value" -> "t3")
    def r(t: String) = parseTemplate(t).renderString(vars)
    // truthiness: non-empty string truthy, "" and missing falsy
    assert(r("{{#if msg}}Y{{else}}N{{/if}}") == "Y")
    assert(r("{{#if empty}}Y{{else}}N{{/if}}") == "N")
    assert(r("{{#if nope}}Y{{else}}N{{/if}}") == "N")
    assert(r("{{#unless empty}}Y{{/unless}}") == "Y")
    assert(r("{{^empty}}INV{{/empty}}") == "INV")
    assert(r("{{^msg}}INV{{else}}T{{/msg}}") == "T")
    // else-if chains
    assert(r("{{#if empty}}A{{else if msg}}B{{else}}C{{/if}}") == "B")
    assert(r("{{#if empty}}A{{else if nope}}B{{else}}C{{/if}}") == "C")
    // literals as params (handlebars is_truthy: 0 falsy, "x" truthy)
    assert(r("{{#if 0}}A{{else}}B{{/if}}") == "B")
    assert(r("{{#if \"x\"}}A{{else}}B{{/if}}") == "A")
    // #with re-roots the context: this = the string; idents miss; ../ climbs
    assert(r("{{#with msg}}<{{this}}|{{msg}}|{{../value}}>{{/with}}") ==
      "<hello||t3>")
    assert(r("{{#with nope}}A{{else}}B{{/with}}") == "B")
    // #each over a STRING var is non-iterable → else block
    assert(r("{{#each msg}}x{{else}}none{{/each}}") == "none")
    // #each this iterates the flat map in sorted-key order with @vars
    assert(r("{{#each this}}{{@key}}={{this}};{{/each}}") ==
      "empty=;msg=hello;value=t3;")
    assert(r("{{#each this}}{{@index}}{{#if @first}}F{{/if}}{{#if @last}}L{{/if}}{{/each}}")
      == "0F12L")
    // nesting
    assert(r("{{#if msg}}{{#if value}}both{{/if}}{{/if}}") == "both")
    // lookup over the flat map; comments; whitespace control; \{{ escape
    assert(r("""{{lookup this "msg"}}""") == "hello")
    assert(r("{{! a comment }}x{{!-- with }} inside --}}y") == "xy")
    assert(r("a  {{~msg~}}  b") == "ahellob")
    assert(r("\\{{msg}}") == "{{msg}}")
  }

  test("unknown helpers/partials LOAD but fail at render, per-branch (hb.render Err parity)") {
    // unconditional: every render fails
    for (t <- Seq("{{> partial}}", "{{fn x}}", "{{#custom}}z{{/custom}}")) {
      val tpl = parseTemplate(t)
      assert(tpl.mayRenderFail && tpl.staticRenderFail.isDefined, t)
      assert(tpl.renderStringOpt(Map("x" -> "1")).isEmpty, t)
    }
    // conditional: fails ONLY when the failing branch is reached
    val cond = parseTemplate("{{#if flag}}{{fn x}}{{else}}ok{{/if}}")
    assert(cond.mayRenderFail && cond.staticRenderFail.isEmpty)
    assert(cond.renderStringOpt(Map("flag" -> "")) == Some("ok"))
    assert(cond.renderStringOpt(Map("flag" -> "y")).isEmpty)
    // paths that navigate beyond the flat context render "" (non-strict)
    assert(parseTemplate("{{../x}}").renderString(Map.empty) == "")
    assert(parseTemplate("{{[a b]}}").renderString(Map.empty) == "")
    assert(parseTemplate("{{this.msg}}").renderString(Map("msg" -> "m")) == "m")
    assert(parseTemplate("{{this}}").renderString(Map("msg" -> "m")) == "[object]")
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
    // unknown raw var renders empty; an unknown helper in {{{ }}} loads
    // but fails at render (register-vs-render boundary, round 4)
    assert(parseTemplate("{{{nope}}}").renderString(Map.empty) == "")
    assert(parseTemplate("{{{a.b}}}").renderString(Map.empty) == "") // dotted → ""
    assert(parseTemplate("{{{f x}}}").renderStringOpt(Map.empty).isEmpty)
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
