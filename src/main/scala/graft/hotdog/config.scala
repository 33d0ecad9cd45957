package graft.hotdog

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** hotdog rule-file model. Mirrors the reference settings
  * (src/settings.rs:55-101): an ordered rule list, each rule a matcher
  * (regex OR jmespath; jmespath takes precedence — src/rules.rs:70,86)
  * over one field, plus an ordered action list.
  *
  * All templates/regexes/jmespaths are validated & compiled at LOAD time
  * (the reference treats compile failures as fatal —
  * src/connection.rs:262-311); rules become *plan*, not data.
  */
object config {

  /** A handlebars-lite template: literal chunks, `{{var}}` placeholders
    * (HTML-escaped) and `{{{var}}}` placeholders (raw, no escaping).
    * The reference renders through handlebars 3.5.5 in non-strict mode:
    * unknown variables render as "". */
  final case class Template(parts: Seq[TPart]) {
    def varNames: Seq[String] = parts.collect {
      case TVar(n) => n
      case TVarRaw(n) => n
    }
    /** Render driver-side with plain strings (oracle path). */
    def renderString(vars: collection.Map[String, String]): String = {
      val sb = new StringBuilder
      parts.foreach {
        case TLit(s)      => sb.append(s)
        case TVar(n)      => sb.append(htmlEscapeStr(vars.getOrElse(n, "")))
        case TVarRaw(n)   => sb.append(vars.getOrElse(n, ""))
        case TPathMiss(_) => // flat string context: dotted paths render ""
      }
      sb.toString
    }
  }
  sealed trait TPart
  final case class TLit(s: String) extends TPart
  final case class TVar(name: String) extends TPart
  /** `{{{name}}}` / `{{&name}}` — substituted without the HTML escape. */
  final case class TVarRaw(name: String) extends TPart
  /** A dotted path (`{{a.b}}`): handlebars navigates the render context,
    * but the reference's context is a flat HashMap<String,String>
    * (src/rules.rs:62-67 — every value is a string), so a 2+-segment path
    * can never resolve and non-strict handlebars 3.5.5 renders it as "".
    * Kept as its own part (not dropped) so varNames/display stay honest. */
  final case class TPathMiss(path: String) extends TPart

  def htmlEscapeStr(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .pipe(Codepoints.htmlEscape).toString
  private implicit class PipeOps[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }

  /** Parse handlebars placeholders: `{{name}}` (HTML-escaped), `{{{name}}}`
    * and `{{&name}}` (raw — handlebars 3.5.5's two no-escape forms), and
    * dotted paths `{{a.b.c}}` (navigate the context; always "" against the
    * reference's flat string map — see [[TPathMiss]]). The rest of the
    * handlebars language (helpers `{{fn x}}`, blocks `{{#if}}`, partials
    * `{{>p}}`, segment literals `{{[a b]}}`, `../` parents) is outside the
    * reference configs' usage and rejected at load time. */
  def parseTemplate(t: String): Template = {
    val parts = ArrayBuffer.empty[TPart]
    val lit = new StringBuilder
    val ident = "[A-Za-z_][A-Za-z0-9_]*"
    val path = s"$ident(\\.$ident)+"
    def flushLit(): Unit =
      if (lit.nonEmpty) { parts += TLit(lit.toString); lit.clear() }
    def varPart(raw0: String, noEscape: Boolean, display: String): TPart = {
      var name = raw0.trim
      var raw = noEscape
      if (name.startsWith("&")) { raw = true; name = name.substring(1).trim }
      if (name.matches(ident)) {
        if (raw) TVarRaw(name) else TVar(name)
      } else if (name.matches(path)) {
        TPathMiss(name) // dotted path into a flat string context → ""
      } else
        throw new IllegalArgumentException(
          s"unsupported handlebars expression: $display")
    }
    var i = 0
    while (i < t.length) {
      if (i + 2 < t.length && t.charAt(i) == '{' && t.charAt(i + 1) == '{' &&
          t.charAt(i + 2) == '{') {
        val close = t.indexOf("}}}", i + 3)
        if (close < 0) throw new IllegalArgumentException(s"unclosed {{{ in template: $t")
        val name = t.substring(i + 3, close)
        flushLit()
        parts += varPart(name, noEscape = true, s"{{{${name.trim}}}}")
        i = close + 3
      } else if (i + 1 < t.length && t.charAt(i) == '{' && t.charAt(i + 1) == '{') {
        val close = t.indexOf("}}", i + 2)
        if (close < 0) throw new IllegalArgumentException(s"unclosed {{ in template: $t")
        val name = t.substring(i + 2, close)
        flushLit()
        parts += varPart(name, noEscape = false, s"{{${name.trim}}}")
        i = close + 2
      } else {
        lit.append(t.charAt(i)); i += 1
      }
    }
    flushLit()
    Template(parts.toSeq)
  }

  /** Rust-regex → Java-regex dialect translation for the subset appearing
    * in hotdog configs: named groups `(?P<n>...)` → `(?<n>...)`. Returns
    * (javaPattern, namedGroups-in-order, totalGroupIndexOf(name)). */
  final case class CompiledRegex(
      original: String,
      javaPattern: String,
      pattern: Pattern,
      namedGroups: Seq[String],
      groupIndexOf: Map[String, Int])

  def compileRegex(rust: String): CompiledRegex = {
    val java = rust.replace("(?P<", "(?<")
    val p = Pattern.compile(java)
    // collect named groups in appearance order + their 1-based group index
    // (index counts ALL capturing groups, named and unnamed)
    val names = ArrayBuffer.empty[String]
    val idxOf = scala.collection.mutable.Map.empty[String, Int]
    var i = 0
    var groupNo = 0
    while (i < java.length) {
      val c = java.charAt(i)
      if (c == '\\') i += 2
      else if (c == '[') { // char class: skip to unescaped ]
        i += 1
        if (i < java.length && java.charAt(i) == ']') i += 1
        while (i < java.length && java.charAt(i) != ']') {
          if (java.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (c == '(') {
        if (i + 1 < java.length && java.charAt(i + 1) == '?') {
          if (i + 2 < java.length && java.charAt(i + 2) == '<' &&
              i + 3 < java.length && java.charAt(i + 3) != '=' && java.charAt(i + 3) != '!') {
            groupNo += 1
            val close = java.indexOf('>', i + 3)
            val name = java.substring(i + 3, close)
            names += name
            idxOf(name) = groupNo
            i = close + 1
          } else i += 1 // non-capturing / lookaround
        } else {
          groupNo += 1
          i += 1
        }
      } else i += 1
    }
    CompiledRegex(rust, java, p, names.toSeq, idxOf.toMap)
  }

  /** Compile a JMESPath matcher expression — the FULL language (filters,
    * projections, slices, functions, pipes; see [[Jmes]]), mirroring the
    * reference's arbitrary jmespath-crate precompile at connection start
    * (src/connection.rs:297-311). Syntax errors are load-fatal, matching
    * the fixture single-rule-with-invalid-jmespath ('. 0 meta.topic'). */
  def compileJmesPath(expr: String): Jmes.JExpr = Jmes.compile(expr)

  sealed trait HAction
  final case class AForward(topic: Template) extends HAction
  /** jsonStr = compact serialization of the YAML `json:` value with keys
    * sorted (the reference pre-serializes via serde_json into the json_str
    * cache — src/settings.rs:82-89); it is itself a template (contains
    * `{{version}}`/`{{iso8601}}`-style vars in string positions). */
  final case class AMerge(jsonStr: Template, staticallyNonObject: Boolean) extends HAction
  final case class AReplace(template: Template) extends HAction
  case object AStop extends HAction

  final case class HRule(
      uuid: String,
      field: String, // msg | appname | hostname | severity | facility
      jmespath: Option[Jmes.JExpr],
      jmespathRaw: Option[String],
      regex: Option[CompiledRegex],
      actions: Seq[HAction]) {
    /** Display form matching the reference's `impl Display for Rule`
      * (src/settings.rs:110-118) used by test-mode output. Note the
      * reference shows the REGEX when both matchers are present (the
      * inverse of the match precedence) and panics on a matcher-less rule
      * — which test-mode never displays, since it cannot match. */
    def display: String =
      if (regex.isDefined) s"Regex: ${regex.get.original}"
      else if (jmespathRaw.isDefined) s"JMESPath: ${jmespathRaw.get}"
      else "Regex: <none>" // unreachable from test-mode (never matches)
  }

  final case class HotdogConfig(rules: Seq[HRule],
      settings: Map[String, Any] = Map.empty) {
    /** Internal Kafka buffer size with the reference default 1024
      * (settings.rs:198-200, test settings.rs:243-246). Drives nothing in
      * the table-sink rebuild (no lossy queue) but keeps config parity. */
    def kafkaBufferSize: Int =
      setting("global.kafka.buffer").map(_.toString.toInt).getOrElse(1024)

    /** Dotted lookup into the loaded settings tree, mirroring the
      * reference's `conf.get("global.listen.port")` (settings.rs:43-46).
      * Env-overlaid keys are flat top-level entries (see [[fromYamlString]]). */
    def setting(path: String): Option[Any] = {
      // a flat key (possibly env-overlaid) wins over a dotted walk
      settings.get(path).orElse {
        path.split('.').foldLeft(Option[Any](settings)) {
          case (Some(m: Map[_, _]), k) => m.asInstanceOf[Map[String, Any]].get(k)
          case _ => None
        }
      }
    }
  }

  private val ValidFields = Set("msg", "appname", "hostname", "severity", "facility")

  /** Load a hotdog-shaped YAML config. The transport parts of the `global`
    * block are parsed into `settings` but drive nothing (sources/sinks are
    * tables here); rules are compiled to plan. */
  def load(path: String, env: collection.Map[String, String] = sys.env): HotdogConfig =
    fromYamlString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8), env)

  private def toScalaTree(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScalaTree(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScalaTree).toSeq
    case other => other
  }

  /** Parse the YAML, then overlay `HOTDOG_*` environment variables exactly
    * like the reference's config-rs layering (settings.rs:30-42:
    * `Environment::with_prefix("HOTDOG")`): each `HOTDOG_FOO` becomes the
    * flat top-level key `foo` (lowercased; no nesting separator is
    * configured in the reference either, so `HOTDOG_GLOBAL_LISTEN_PORT`
    * yields the flat key `global_listen_port`, NOT `global.listen.port`). */
  def fromYamlString(yaml: String,
      env: collection.Map[String, String] = sys.env): HotdogConfig = {
    val root = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Object]](yaml)
    val rulesRaw = root.get("rules") match {
      case l: java.util.List[_] => l.asScala.toSeq
      case _ => throw new IllegalArgumentException("config missing `rules` list")
    }
    val rules = rulesRaw.zipWithIndex.map { case (r0, idx) =>
      val r = r0.asInstanceOf[java.util.Map[String, Object]].asScala
      val field = r.getOrElse("field",
        throw new IllegalArgumentException(s"rule $idx missing field")).toString
      require(ValidFields.contains(field), s"rule $idx: invalid field `$field`")
      val jp = r.get("jmespath").map(_.toString)
      val rx = r.get("regex").map(_.toString)
      val actions = r.get("actions") match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map(parseAction)
        case _ => Seq.empty[HAction]
      }
      HRule(
        uuid = f"rule-$idx%04d",
        field = field,
        jmespath = jp.map(compileJmesPath),
        jmespathRaw = jp,
        regex = rx.map(compileRegex),
        actions = actions)
    }
    val fromYaml = toScalaTree(root).asInstanceOf[Map[String, Any]] - "rules"
    val fromEnv = env.collect {
      case (k, v) if k.startsWith("HOTDOG_") =>
        // config-rs stores Environment values as STRINGS and coerces only
        // on typed get (settings.rs:30-42) — so `HOTDOG_FOO=no` must stay
        // "no", not snakeyaml's YAML-1.1 boolean false. Keep the raw
        // string; callers coerce at the access site (kafkaBufferSize).
        k.stripPrefix("HOTDOG_").toLowerCase -> (v: Any)
    }
    HotdogConfig(rules, fromYaml ++ fromEnv)
  }

  private val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseAction(a0: Any): HAction = {
    val a = a0.asInstanceOf[java.util.Map[String, Object]].asScala
    a.getOrElse("type", throw new IllegalArgumentException("action missing type")).toString match {
      case "forward" => AForward(parseTemplate(a("topic").toString))
      case "replace" => AReplace(parseTemplate(a("template").toString))
      case "stop"    => AStop
      case "merge" =>
        val node = jackson.valueToTree[com.fasterxml.jackson.databind.JsonNode](a("json"))
        val jsonStr = HotdogJson.serialize(node)
        AMerge(parseTemplate(jsonStr), staticallyNonObject = !node.isObject)
      case other => throw new IllegalArgumentException(s"unknown action type: $other")
    }
  }
}
