package graft.hotdog

import scala.collection.mutable
import graft.hotdog.config._

/** Differential oracle: a direct, row-at-a-time Scala transliteration of
  * the reference per-line cascade (src/connection.rs:85-241). Used ONLY in
  * tests: `∀ line: oracle(line) == pipeline row`. This is the
  * "reference rule-matching test suite" parity hook named in BASELINE.json.
  * Deliberately imperative — it mirrors the Rust control flow statement by
  * statement, NOT the Spark plan.
  */
object Oracle {

  final case class OracleOut(
      parseOk: Boolean,
      topic: Option[String],
      output: Option[String],
      mergeInvalidJson: Long,
      mergeTargetNotJson: Long,
      topicParseFailed: Long = 0L)

  def route(line: String, cfg: HotdogConfig,
      iso8601: String, version: String = model.Version): OracleOut = {
    val parsed = SyslogParser.parseToOption(line)
    if (parsed.isEmpty)
      return OracleOut(parseOk = false, None, None, 0L, 0L)
    val msg = parsed.get

    var continueRules = true
    var emittedTopic: Option[String] = None
    var emittedOutput: Option[String] = None
    var mergeInvalid = 0L
    var mergeTarget = 0L
    var topicFailed = 0L

    val it = cfg.rules.iterator
    while (it.hasNext && continueRules) {
      val rule = it.next()
      var output = ""
      val hash = mutable.Map[String, String](
        "msg" -> msg.msg, "version" -> version, "iso8601" -> iso8601)

      val fieldValue: Option[String] = rule.field match {
        case "msg"      => Some(msg.msg)
        case "appname"  => msg.appname
        case "hostname" => msg.hostname
        case "severity" => msg.severity
        case "facility" => msg.facility
      }

      val ruleMatches = fieldValue.exists(v => applyRule(rule, v, hash))

      if (ruleMatches) {
        var broke = false
        val actions = rule.actions.iterator
        while (actions.hasNext && !broke) {
          actions.next() match {
            case AForward(topicT) =>
              if (output.isEmpty) output = msg.msg
              topicT.renderStringOpt(hash) match {
                case Some(actualTopic) =>
                  if (emittedTopic.isEmpty) { // forward implies stop; ≤1 emit
                    emittedTopic = Some(actualTopic)
                    emittedOutput = Some(output)
                  }
                  continueRules = false
                case None =>
                  // failed topic render: stat, no send, continue_rules
                  // stays TRUE (src/connection.rs:204-206)
                  topicFailed += 1
              }
              broke = true // break on both paths (src/connection.rs:208)
            case AMerge(jsonT, staticallyNonObject) =>
              // perform_merge order: msg parse FIRST (stat+kill on invalid),
              // template render second (kill, NO stat — connection.rs:316-343)
              if (HotdogJson.parseOrNull(msg.msg) == null) {
                mergeInvalid += 1
                continueRules = false // kill, keep buffer, NO break
              } else jsonT.renderStringOpt(hash) match {
                case None => continueRules = false // render Err: kill, no stat
                case Some(rendered) =>
                  val res = HotdogJson.performMerge(msg.msg, rendered)
                  if (staticallyNonObject) mergeTarget += 1
                  output = res
              }
            case AReplace(t) =>
              // failed render: output simply not assigned (connection.rs:233-239)
              t.renderStringOpt(hash).foreach(output = _)
            case AStop =>
              continueRules = false
          }
        }
      }
    }
    OracleOut(parseOk = true, emittedTopic, emittedOutput, mergeInvalid,
      mergeTarget, topicFailed)
  }

  /** rules::apply_rule (src/rules.rs:59-100). */
  def applyRule(rule: HRule, value: String,
      hash: mutable.Map[String, String]): Boolean = {
    rule.jmespath match {
      case Some(ast) =>
        val root = HotdogJson.parseOrNull(value)
        if (root == null) return false
        val result = Jmes.search(ast, root)
        if (result.isNull) false
        else {
          if (result.isTextual) hash("value") = result.textValue()
          true
        }
      case None =>
        rule.regex match {
          case Some(rx) =>
            val m = rx.pattern.matcher(value)
            if (!m.find()) false
            else {
              rx.namedGroups.foreach { name =>
                val g = m.group(name)
                if (g != null) hash(name) = g
              }
              true
            }
          case None => false
        }
    }
  }

  /** test_rules (src/rules.rs:11-52): matcher display names per line. */
  def testMode(line: String, cfg: HotdogConfig): Seq[String] = {
    val unused = mutable.Map.empty[String, String]
    cfg.rules.filter(_.field == "msg")
      .filter(r => applyRule(r, line, unused))
      .map(_.display)
  }
}
