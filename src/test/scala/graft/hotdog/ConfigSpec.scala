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
    assertThrows[IllegalArgumentException](parseTemplate("{{a.b}}"))
  }

  test("field values validated") {
    assertThrows[IllegalArgumentException] {
      config.fromYamlString(
        "rules:\n  - regex: 'x'\n    field: bogus\n    actions: []\n")
    }
  }
}
