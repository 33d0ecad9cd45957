package graft.hotdog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.hotdog.config._
import graft.hotdog.exprs.{codepointsToString, handlebarsEscape}

/** The rule cascade (reference src/connection.rs:85-241) compiled into ONE
  * Catalyst projection — the structural property replacing hotdog's
  * per-line while-loop: no per-rule scans, no explode, no union; the whole
  * decode→parse→route path is a single narrow whole-stage-codegen stage.
  *
  * Exact semantics carried over (per-line, per-rule, per-action):
  *  - rules run in config order; a rule on a NULL optional field never
  *    matches (src/connection.rs:124-148)
  *  - jmespath matcher wins over regex when both present (src/rules.rs:70,86)
  *  - variables per (line, rule): builtins msg/version/iso8601
  *    (src/connection.rs:119-122), regex named groups override builtins
  *    only when they captured (src/rules.rs:90-96), jmespath string result
  *    becomes `value` (src/rules.rs:78-82)
  *  - actions: replace sets the output buffer; merge rewrites it from the
  *    pristine msg (invalid-JSON msg → continue_rules=false but the action
  *    list CONTINUES — src/connection.rs:211-222 has no break); forward
  *    emits (empty buffer → raw msg, src/connection.rs:184-186) then breaks
  *    with continue_rules=false; stop sets continue_rules=false
  *  - the output buffer resets per rule (src/connection.rs:117); transforms
  *    never mutate the msg later rules see (A7)
  *  - ≤1 routed row per input line (forward implies stop)
  */
object Router {

  /** chrono's Utc::now().to_rfc3339(): 2020-04-18T22:16:09.956153+00:00 */
  val DefaultClock: Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")

  /** tokens array<int> → line string (P6). */
  def decoded(df: DataFrame): DataFrame =
    df.withColumn("line", codepointsToString(col("tokens")))

  /** line → 5-field parsed struct `p` (null = parse error). */
  def parsed(df: DataFrame): DataFrame =
    df.withColumn("p", exprs.col(SyslogParse(exprs.expr(col("line")))))

  /** Full pipeline projection: decode → parse → route. Input must have the
    * `sequences` shape; output adds line, parsed fields, topic, output and
    * error-flag columns. `clock` is injectable so equality tests can pin
    * the `{{iso8601}}` builtin. */
  def route(sequences: DataFrame, cfg: HotdogConfig,
      clock: Column = DefaultClock): DataFrame = {
    val withParsed = parsed(decoded(sequences))
    routeParsed(withParsed, cfg, clock)
  }

  /** Route a DataFrame that already has `line` and `p`. */
  def routeParsed(df: DataFrame, cfg: HotdogConfig, clock: Column): DataFrame = {
    val p = col("p")
    val parseOk = p.isNotNull
    val msgCol = p.getField("msg")

    // Per-rule compiled pieces
    final case class CompiledRule(
        fires: Column,              // rule matched AND cascade still alive
        kill: Column,               // continue_rules=false by end of this rule (given fires)
        emit: Option[(Column, Column)], // (topic, output) when rule forwards
        mergeInvalid: Column,       // count of merge-of-invalid-json errors (given fires)
        mergeTargetNotJson: Column) // count of merge-target-not-json errors (given fires)

    var alive: Column = parseOk
    val compiled = cfg.rules.map { rule =>
      val fieldCol: Column = rule.field match {
        case "msg" => msgCol
        case f     => p.getField(f)
      }

      // ---- matcher + variables (F1-F5) ----
      val (matchedRaw, jmesValue): (Column, Option[Column]) = rule.jmespath match {
        case Some(_) =>
          val jm = exprs.col(JmesPathDotted(
            exprs.expr(fieldCol), exprs.expr(lit(rule.jmespathRaw.get))))
          (jm.getField("matched"), Some(jm.getField("value")))
        case None =>
          val rx = rule.regex.getOrElse(
            throw new IllegalArgumentException(s"rule ${rule.uuid} has no matcher"))
          (fieldCol.rlike(rx.javaPattern), None)
      }
      // a rule on a None field never matches
      val matched = coalesce(fieldCol.isNotNull && matchedRaw, lit(false))

      val builtins = Map[String, Column](
        "msg" -> msgCol,
        "version" -> lit(model.Version),
        "iso8601" -> clock)
      val groupVars: Map[String, Column] = rule.regex match {
        case Some(rx) if rule.jmespath.isEmpty =>
          rx.namedGroups.map { name =>
            val ext = regexp_extract(fieldCol, rx.javaPattern, rx.groupIndexOf(name))
            // captured-only override: '' (did not participate) keeps builtin
            val v = builtins.get(name) match {
              case Some(b) => when(ext =!= "", ext).otherwise(b)
              case None    => ext
            }
            name -> v
          }.toMap
        case _ => Map.empty
      }
      val valueVar: Map[String, Column] = jmesValue match {
        case Some(v) => Map("value" -> coalesce(v, builtins.getOrElse("value", lit(""))))
        case None    => Map.empty
      }
      val vars = builtins ++ groupVars ++ valueVar

      def render(t: Template): Column = {
        val pieces = t.parts.map {
          case TLit(s)  => lit(s)
          case TVar(n)  => handlebarsEscape(coalesce(vars.getOrElse(n, lit("")), lit("")))
        }
        if (pieces.isEmpty) lit("") else concat(pieces: _*)
      }

      // ---- symbolic action execution (A1-A8) ----
      var output: Column = lit("")
      var outputIsInitial = true // statically known still-empty buffer
      var kill: Column = lit(false)
      var emit: Option[(Column, Column)] = None
      var mergeInvalid: Column = lit(0L)
      var mergeTarget: Column = lit(0L)
      var broke = false
      rule.actions.foreach { action =>
        if (!broke) action match {
          case AForward(topicT) =>
            val topic = render(topicT)
            val out =
              if (outputIsInitial) msgCol
              else when(output === "", msgCol).otherwise(output)
            emit = Some((topic, out))
            kill = lit(true)
            broke = true // forward breaks the action loop
          case AMerge(jsonT, staticallyNonObject) =>
            if (staticallyNonObject) {
              // perform_merge returns the buffer (the msg) unchanged + stat
              // — but only when the msg itself IS valid json
              val msgValid = exprs.col(JsonHotdogMerge(
                exprs.expr(msgCol), exprs.expr(lit("{}"))))
              output = when(msgValid.isNotNull, msgCol).otherwise(output)
              outputIsInitial = false
              mergeTarget = mergeTarget + when(msgValid.isNotNull, 1L).otherwise(0L)
              kill = kill || msgValid.isNull
              mergeInvalid = mergeInvalid + when(msgValid.isNull, 1L).otherwise(0L)
            } else {
              val merged = exprs.col(JsonHotdogMerge(
                exprs.expr(msgCol), exprs.expr(render(jsonT))))
              // null → msg wasn't JSON: continue_rules=false, buffer unchanged,
              // and the action list continues (NO break)
              kill = kill || merged.isNull
              mergeInvalid = mergeInvalid + when(merged.isNull, 1L).otherwise(0L)
              output = if (outputIsInitial) coalesce(merged, lit("")) else coalesce(merged, output)
              outputIsInitial = false
            }
          case AReplace(t) =>
            output = render(t)
            outputIsInitial = false
          case AStop =>
            kill = lit(true)
        }
      }

      val fires = alive && matched
      alive = alive && !(matched && kill)
      CompiledRule(fires, kill, emit, mergeInvalid, mergeTarget)
    }

    val emitting = compiled.filter(_.emit.isDefined)
    val topicCol =
      if (emitting.isEmpty) lit(null).cast("string")
      else coalesce(emitting.map(r => when(r.fires, r.emit.get._1)): _*)
    val outputCol =
      if (emitting.isEmpty) lit(null).cast("string")
      else coalesce(emitting.map(r => when(r.fires, r.emit.get._2)): _*)
    val mergeInvalidCol = compiled.map(r =>
      when(r.fires, r.mergeInvalid).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val mergeTargetCol = compiled.map(r =>
      when(r.fires, r.mergeTargetNotJson).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))

    df.select(
      col("doc_id"), col("tokens"), col("n_tok"), col("source"), col("line"),
      parseOk.as("parse_ok"),
      msgCol.as("msg"),
      p.getField("severity").as("severity"),
      p.getField("facility").as("facility"),
      p.getField("hostname").as("hostname"),
      p.getField("appname").as("appname"),
      topicCol.as("topic"),
      outputCol.as("output"),
      mergeInvalidCol.as("err_merge_invalid_json"),
      mergeTargetCol.as("err_merge_target_not_json"))
  }

  /** E2 test-mode (reference src/rules.rs:11-52): per line, which rules'
    * MATCHERS fire (no actions run; only `field: msg` rules participate).
    * Returns (line_no, matches array<string>) where each match is the
    * rule's Display form. The raw line (not the parsed msg) is matched —
    * test-mode skips syslog parsing entirely. */
  def testMode(lines: DataFrame, cfg: HotdogConfig): DataFrame = {
    val lineCol = col("line")
    val matchCols = cfg.rules.filter(_.field == "msg").map { rule =>
      val matched = rule.jmespath match {
        case Some(_) =>
          exprs.col(JmesPathDotted(
            exprs.expr(lineCol), exprs.expr(lit(rule.jmespathRaw.get))))
            .getField("matched")
        case None => coalesce(lineCol.rlike(rule.regex.get.javaPattern), lit(false))
      }
      when(matched, lit(rule.display)).otherwise(lit(null))
    }
    lines.select(
      col("line_no"),
      filter(array(matchCols: _*), c => c.isNotNull).as("matches"))
  }
}
