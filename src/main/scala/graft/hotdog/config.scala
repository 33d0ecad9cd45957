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

  /** A handlebars template compiled against the reference's render setup:
    * handlebars 3.5.5 (the RUST crate), non-strict mode, a FLAT
    * HashMap<String,String> context (src/rules.rs:62-67 — every value is a
    * string), no custom helpers/partials registered.
    *
    * Supported (= meaningful over that flat context): `{{var}}` (escaped),
    * `{{{var}}}`/`{{&var}}` (raw), dotted paths, `this`/`.`, `../` parents,
    * `[seg literal]` segments, `@index/@key/@first/@last`, comments,
    * `\{{` escapes, `~` whitespace control, block helpers
    * `{{#if}}/{{#unless}}/{{#each}}/{{#with}}` with `{{else}}` and
    * `{{else if}}` chains, inverted sections `{{^var}}`, and inline
    * `lookup`/`log`. Anything else that is VALID handlebars syntax but
    * cannot render against this engine (unknown helpers `{{fn x}}`,
    * partials `{{>p}}`, subexpressions, block params) compiles to a
    * RENDER-failure part — exactly the reference, where
    * register_template_string succeeds and hb.render returns Err, which
    * each action handles its own way (src/connection.rs:178-241). Only
    * SYNTAX errors (unclosed/mismatched tags) are load-fatal, like
    * register_template_string's Err (src/connection.rs:270). */
  final case class Template(parts: Seq[TPart]) {
    def varNames: Seq[String] = {
      def walk(ps: Seq[TPart]): Seq[String] = ps.flatMap {
        case TVar(n) => Seq(n)
        case TVarRaw(n) => Seq(n)
        case TBlock(_, _, b, e) => walk(b) ++ walk(e)
        case _ => Seq.empty
      }
      walk(parts)
    }
    /** Some(reason) if EVERY render of this template fails (an
      * unconditionally-reached unknown helper/partial). A failure inside a
      * conditional branch is per-row, not static — see Hb render. */
    lazy val staticRenderFail: Option[String] =
      parts.collectFirst { case TRenderFail(w) => w }
    /** whether ANY row could hit a render failure (a TRenderFail in some
      * branch) — false for almost every real template, letting the Router
      * keep the simple fail-free plan. */
    lazy val mayRenderFail: Boolean = {
      def walk(ps: Seq[TPart]): Boolean = ps.exists {
        case TRenderFail(_) => true
        case TBlock(_, _, b, e) => walk(b) || walk(e)
        case _ => false
      }
      walk(parts)
    }
    /** Render driver-side with plain strings (oracle path). Throws
      * IllegalStateException on templates that hit a render failure —
      * use [[renderStringOpt]] to observe reference Err semantics. */
    def renderString(vars: collection.Map[String, String]): String =
      renderStringOpt(vars).getOrElse(
        throw new IllegalStateException(s"template render failed: $this"))
    /** None ⇔ handlebars 3.5.5 render would return Err for this row. */
    def renderStringOpt(vars: collection.Map[String, String]): Option[String] =
      Hb.renderString(this, vars)
  }

  sealed trait TPart
  final case class TLit(s: String) extends TPart
  /** `{{name}}` — simple root identifier, HTML-escaped. */
  final case class TVar(name: String) extends TPart
  /** `{{{name}}}` / `{{&name}}` — substituted without the HTML escape. */
  final case class TVarRaw(name: String) extends TPart
  /** A plain dotted path (`{{a.b}}`): navigates the context, but the flat
    * string map has no nested values, so it can never resolve and
    * non-strict handlebars renders "". Kept distinct so varNames stays
    * honest. */
  final case class TPathMiss(path: String) extends TPart
  /** `{{! ...}}` / `{{!-- ... --}}` — renders "". (`{{log ...}}` too.) */
  case object TComment extends TPart
  /** A structured path expression (`this`, `.`, `../x`, `@index`,
    * `[seg]`...). */
  final case class TExprPath(path: HbPath, raw: Boolean) extends TPart
  /** `{{#kind arg}}body{{else}}els{{/kind}}`; kind ∈ if|unless|each|with. */
  final case class TBlock(kind: String, arg: HbArg,
      body: Seq[TPart], els: Seq[TPart]) extends TPart
  /** `{{lookup obj key}}`. */
  final case class TLookup(obj: HbArg, key: HbArg, raw: Boolean) extends TPart
  /** Valid handlebars that ALWAYS fails to render here: unknown helper,
    * partial, subexpression, block params. */
  final case class TRenderFail(what: String) extends TPart

  /** `ups` = number of leading `../` steps; then segments. */
  final case class HbPath(ups: Int, segs: Seq[HbSeg]) {
    def isThisRef: Boolean = ups == 0 &&
      (segs.isEmpty || segs == Seq(SegThis))
  }
  sealed trait HbSeg
  final case class SegName(n: String) extends HbSeg
  case object SegThis extends HbSeg
  final case class SegAt(n: String) extends HbSeg

  sealed trait HbArg
  final case class APath(p: HbPath) extends HbArg
  /** string/number/boolean literal param with its handlebars truthiness
    * (is_truthy with include_zero=false: "" falsy, 0 falsy, false falsy). */
  final case class AStrLit(render: String, truthy: Boolean) extends HbArg

  def htmlEscapeStr(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .pipe(Codepoints.htmlEscape).toString
  private implicit class PipeOps[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }

  def parseTemplate(t: String): Template = Hb.parse(t)

  /** The handlebars engine: tokenizer + block-structure parser + a generic
    * renderer instantiated twice — over Spark Columns (Router plan build)
    * and over plain Strings (driver-side Oracle / config display). Both
    * thread a FAILURE channel alongside the rendered value, because a
    * render failure inside `{{#if}}...{{/if}}` happens only on rows where
    * the branch is taken — the reference's hb.render(...) Err is per-call,
    * not per-template. */
  object Hb {

    // ---------------- parsing ----------------

    private def fail(t: String, why: String): Nothing =
      throw new IllegalArgumentException(s"handlebars template error: $why in: $t")

    /** one mustache tag, pre-split from the literal stream */
    private final case class Tag(content: String, raw: Boolean,
        trimBefore: Boolean, trimAfter: Boolean)

    private val BuiltinBlocks = Set("if", "unless", "each", "with")

    def parse(t: String): Template = {
      // ---- pass 1: literals + tags ----
      val items = ArrayBuffer.empty[Either[String, Tag]] // Left = literal
      val lit = new StringBuilder
      def flushLit(): Unit =
        if (lit.nonEmpty) { items += Left(lit.toString); lit.clear() }
      var i = 0
      while (i < t.length) {
        if (t.charAt(i) == '\\' && t.startsWith("{{", i + 1)) {
          lit.append("{{"); i += 3 // \{{ escape → literal {{
        } else if (t.startsWith("{{{", i) && !t.startsWith("{{{{", i)) {
          val close = t.indexOf("}}}", i + 3)
          if (close < 0) fail(t, "unclosed {{{")
          flushLit()
          items += Right(Tag(t.substring(i + 3, close).trim, raw = true,
            trimBefore = false, trimAfter = false))
          i = close + 3
        } else if (t.startsWith("{{", i)) {
          var start = i + 2
          val trimB = start < t.length && t.charAt(start) == '~'
          if (trimB) start += 1
          // comments may contain }} when written {{!-- --}}
          val close =
            if (t.startsWith("!--", start)) {
              val c = t.indexOf("--}}", start + 3)
              if (c < 0) fail(t, "unclosed {{!--")
              c + 2 // point at the final "}}"
            } else {
              val c = t.indexOf("}}", start)
              if (c < 0) fail(t, "unclosed {{")
              c
            }
          var end = close
          val trimA = end - 1 >= start && t.charAt(end - 1) == '~'
          if (trimA) end -= 1
          flushLit()
          items += Right(Tag(t.substring(start, end).trim, raw = false,
            trimB, trimA))
          i = close + 2
        } else {
          lit.append(t.charAt(i)); i += 1
        }
      }
      flushLit()
      // ---- whitespace control ----
      val trimmed = items.toSeq.zipWithIndex.map {
        case (Left(s), idx) =>
          var v = s
          items.lift(idx - 1).foreach {
            case Right(tag) if tag.trimAfter => v = v.replaceAll("^\\s+", "")
            case _ => ()
          }
          items.lift(idx + 1).foreach {
            case Right(tag) if tag.trimBefore => v = v.replaceAll("\\s+$", "")
            case _ => ()
          }
          Left(v)
        case (other, _) => other
      }

      // ---- pass 2: block structure ----
      // an open block = closeName + branches; each branch is
      // (Some((kind, arg)) for #kind/else-if, None for plain else, parts)
      final case class Frame(closeName: String, renderFailWhat: Option[String],
          branches: ArrayBuffer[(Option[(String, HbArg)], ArrayBuffer[TPart])]) {
        def cur: ArrayBuffer[TPart] = branches.last._2
      }
      val rootParts = ArrayBuffer.empty[TPart]
      val stack = ArrayBuffer.empty[Frame]
      def sink: ArrayBuffer[TPart] =
        if (stack.isEmpty) rootParts else stack.last.cur

      def closeFrame(f: Frame): TPart = f.renderFailWhat match {
        case Some(w) => TRenderFail(w)
        case None =>
          // fold else-if chains right-to-left into nested blocks
          var els: Seq[TPart] = Seq.empty
          f.branches.reverse.foreach {
            case (Some((k, a)), ps) => els = Seq(TBlock(k, a, ps.toSeq, els))
            case (None, ps) => els = ps.toSeq
          }
          els.head
      }

      trimmed.foreach {
        case Left(s) => if (s.nonEmpty) sink += TLit(s)
        case Right(tag) =>
          val c = tag.content
          if (c.startsWith("!")) sink += TComment
          else if (c.startsWith("#")) {
            val words = splitWords(t, c.substring(1))
            if (words.isEmpty) fail(t, "empty block tag")
            val name = words.head
            val frame =
              if (!BuiltinBlocks.contains(name))
                Frame(name, Some(s"unknown block helper `$name`"),
                  ArrayBuffer((None, ArrayBuffer.empty[TPart])))
              else if (words.exists(w => w.contains("=") || w.startsWith("|")) ||
                  words.length != 2)
                // block params / hash params / wrong arity: valid syntax,
                // but this engine (like the bare reference registry) cannot
                // render it — per-reach failure
                Frame(name, Some(s"unsupported params for #$name"),
                  ArrayBuffer((None, ArrayBuffer.empty[TPart])))
              else parseArg(t, words(1)) match {
                case Some(arg) => Frame(name, None,
                  ArrayBuffer((Some((name, arg)), ArrayBuffer.empty[TPart])))
                case None => Frame(name, Some(s"unsupported param `${words(1)}`"),
                  ArrayBuffer((None, ArrayBuffer.empty[TPart])))
              }
            stack += frame
          } else if (c.startsWith("/")) {
            val name = c.substring(1).trim
            if (stack.isEmpty) fail(t, s"{{/$name}} with no open block")
            val f = stack.remove(stack.length - 1)
            if (f.closeName != name)
              fail(t, s"{{/$name}} closes {{#${f.closeName}}}")
            sink += closeFrame(f)
          } else if (c == "else" || c == "^") {
            if (stack.isEmpty) fail(t, "{{else}} outside a block")
            stack.last.branches += ((None, ArrayBuffer.empty[TPart]))
          } else if (c.startsWith("else if ") || c.startsWith("else if\t")) {
            if (stack.isEmpty) fail(t, "{{else if}} outside a block")
            val rest = splitWords(t, c.substring(7).trim)
            val arg = if (rest.length == 1) parseArg(t, rest.head) else None
            arg match {
              case Some(a) =>
                stack.last.branches += ((Some(("if", a)), ArrayBuffer.empty[TPart]))
              case None =>
                // can't evaluate the chained condition → the WHOLE block
                // fails whenever rendered (param eval precedes branching)
                val f = stack.remove(stack.length - 1)
                stack += f.copy(renderFailWhat =
                  Some("unsupported else-if condition"))
            }
          } else if (c.startsWith("^")) {
            // inverted section {{^var}} — body renders when falsy
            val words = splitWords(t, c.substring(1))
            if (words.length != 1) fail(t, "malformed inverted section")
            val frame = parseArg(t, words.head) match {
              case Some(arg) => Frame(words.head, None,
                ArrayBuffer((Some(("unless", arg)), ArrayBuffer.empty[TPart])))
              case None => Frame(words.head, Some("unsupported inverted arg"),
                ArrayBuffer((None, ArrayBuffer.empty[TPart])))
            }
            stack += frame
          } else if (c.startsWith(">")) {
            sink += TRenderFail(s"partial `${c.substring(1).trim}` not registered")
          } else {
            // expression or inline helper
            var raw = tag.raw
            var body = c
            if (body.startsWith("&")) { raw = true; body = body.substring(1).trim }
            val words = splitWords(t, body)
            if (words.isEmpty) fail(t, "empty tag")
            else if (words.length == 1) sink += exprPart(t, words.head, raw)
            else words.head match {
              case "lookup" if words.length == 3 =>
                (parseArg(t, words(1)), parseArg(t, words(2))) match {
                  case (Some(o), Some(k)) => sink += TLookup(o, k, raw)
                  case _ => sink += TRenderFail("unsupported lookup params")
                }
              case "log" => sink += TComment // renders "", logging elided
              case h => sink += TRenderFail(s"unknown helper `$h`")
            }
          }
      }
      if (stack.nonEmpty) fail(t, s"unclosed {{#${stack.last.closeName}}}")
      Template(rootParts.toSeq)
    }

    /** split tag content on whitespace, keeping "..."/'...'/[...] units. */
    private def splitWords(t: String, s: String): Seq[String] = {
      val out = ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var i = 0
      var inQ: Char = 0
      var inBr = false
      while (i < s.length) {
        val ch = s.charAt(i)
        if (inQ != 0) { cur.append(ch); if (ch == inQ) inQ = 0 }
        else if (inBr) { cur.append(ch); if (ch == ']') inBr = false }
        else if (ch == '"' || ch == '\'') { cur.append(ch); inQ = ch }
        else if (ch == '[') { cur.append(ch); inBr = true }
        else if (ch.isWhitespace) {
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        } else cur.append(ch)
        i += 1
      }
      if (inQ != 0) fail(t, "unterminated string literal")
      if (inBr) fail(t, "unterminated [segment]")
      if (cur.nonEmpty) out += cur.toString
      out.toSeq
    }

    private val Ident = "[A-Za-z_][A-Za-z0-9_]*"
    private val NumLit = "-?[0-9]+(\\.[0-9]+)?"

    /** a block/helper parameter: literal or path; None = unsupported form
      * (subexpressions...) → render failure at the call site. */
    private def parseArg(t: String, w: String): Option[HbArg] = {
      if ((w.startsWith("\"") && w.endsWith("\"") && w.length >= 2) ||
          (w.startsWith("'") && w.endsWith("'") && w.length >= 2)) {
        val s = w.substring(1, w.length - 1)
        Some(AStrLit(s, s.nonEmpty))
      } else if (w.matches(NumLit)) {
        Some(AStrLit(w, w.toDouble != 0.0))
      } else if (w == "true" || w == "false") {
        Some(AStrLit(w, w == "true"))
      } else if (w.startsWith("(")) None // subexpression: no helpers exist
      else parsePath(t, w).map(APath)
    }

    /** `../../a.[b c].@d` etc → HbPath; None for non-path forms. */
    private def parsePath(t: String, w0: String): Option[HbPath] = {
      var w = w0
      var ups = 0
      while (w.startsWith("../")) { ups += 1; w = w.substring(3) }
      if (w == "..") { ups += 1; w = "" }
      if (w == "" ) return Some(HbPath(ups, Seq.empty))
      if (w == ".") return Some(HbPath(ups, Seq(SegThis)))
      // split on '.' outside [brackets]
      val segs = ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inBr = false
      var i = 0
      while (i < w.length) {
        val ch = w.charAt(i)
        if (inBr) { cur.append(ch); if (ch == ']') inBr = false }
        else if (ch == '[') { cur.append(ch); inBr = true }
        else if (ch == '.') { segs += cur.toString; cur.clear() }
        else cur.append(ch)
        i += 1
      }
      segs += cur.toString
      val parsed = segs.zipWithIndex.map { case (s, idx) =>
        if (s == "this") { if (idx != 0) return None; SegThis }
        else if (s.startsWith("@")) {
          if (idx != 0) return None
          SegAt(s.substring(1))
        }
        else if (s.startsWith("[") && s.endsWith("]") && s.length >= 2)
          SegName(s.substring(1, s.length - 1))
        else if (s.matches(Ident)) SegName(s)
        else return None
      }
      Some(HbPath(ups, parsed.toSeq))
    }

    /** classify a single-word expression into the (compat) part kinds. */
    private def exprPart(t: String, w: String, raw: Boolean): TPart =
      parsePath(t, w) match {
        case None => fail(t, s"unsupported handlebars expression: {{$w}}")
        case Some(HbPath(0, Seq(SegName(n)))) =>
          if (raw) TVarRaw(n) else TVar(n)
        case Some(p @ HbPath(0, segs))
            if segs.length > 1 && segs.forall(_.isInstanceOf[SegName]) =>
          TPathMiss(segs.map(_.asInstanceOf[SegName].n).mkString("."))
        case Some(p) => TExprPath(p, raw)
      }

    // ---------------- rendering ----------------

    /** rendered-value algebra; F is the failure channel. Branch arguments
      * are by-name so the String instance only evaluates the taken branch
      * (a render failure in the untaken branch must not fire). */
    trait Ops[V, F] {
      def lit(s: String): V
      def concat(vs: Seq[V]): V
      def escape(v: V): V
      def raw(v: V): V
      /** handlebars is_truthy for a flat-context STRING: non-null and
        * non-empty. */
      def ifTruthy(c: V, t: => (V, F), f: => (V, F)): (V, F)
      def chooseByKey(key: V, table: Seq[(String, V)]): V
      def noFail: F
      def failNow: F
      def orF(a: F, b: F): F
    }

    /** resolution result: the root context object, a string value, a
      * statically-known literal (@index/@first/... — these carry their own
      * handlebars type's truthiness, e.g. @first=false is FALSY even though
      * it renders "false"), or a non-strict miss. */
    private sealed trait Res[+V]
    private case object RRoot extends Res[Nothing]
    private final case class RVal[V](v: V) extends Res[V]
    private final case class RLit(l: AStrLit) extends Res[Nothing]
    private case object RMiss extends Res[Nothing]

    /** context frame: None value = the root (the variable map itself);
      * at-values are statically-known literals (each expands statically). */
    private final case class Ctx[V](value: Option[V], at: Map[String, AStrLit],
        parent: Option[Ctx[V]])

    def render[V, F](tpl: Template, vars: collection.Map[String, V],
        ops: Ops[V, F]): (V, F) = {
      val sortedVars = vars.toSeq.sortBy(_._1) // serde_json BTreeMap order

      def resolve(p: HbPath, ctx: Ctx[V]): Res[V] = {
        var c = ctx
        var k = 0
        while (k < p.ups) {
          c.parent match {
            case Some(par) => c = par
            case None => return RMiss // stepped past the root
          }
          k += 1
        }
        var cur: Res[V] = c.value.map(RVal(_)).getOrElse(RRoot)
        p.segs.foreach {
          case SegThis => () // first segment only (parser-enforced)
          case SegAt(n) =>
            cur = c.at.get(n).map(RLit(_)).getOrElse(RMiss)
          case SegName(n) => cur match {
            case RRoot => cur = vars.get(n).map(RVal(_)).getOrElse(RMiss)
            case _ => cur = RMiss // property of a scalar: non-strict miss
          }
        }
        cur
      }

      def resolveArg(a: HbArg, ctx: Ctx[V]): Either[AStrLit, Res[V]] = a match {
        case l: AStrLit => Left(l)
        case APath(p) => Right(resolve(p, ctx))
      }

      def renderParts(ps: Seq[TPart], ctx: Ctx[V]): (V, F) = {
        val vs = ArrayBuffer.empty[V]
        var f = ops.noFail
        ps.foreach { part =>
          val (v, pf) = renderPart(part, ctx)
          vs += v
          f = ops.orF(f, pf)
        }
        (ops.concat(vs.toSeq), f)
      }

      def renderPart(part: TPart, ctx: Ctx[V]): (V, F) = part match {
        case TLit(s) => (ops.lit(s), ops.noFail)
        case TComment => (ops.lit(""), ops.noFail)
        case TRenderFail(_) => (ops.lit(""), ops.failNow)
        case TVar(n) => (renderRes(resolve(HbPath(0, Seq(SegName(n))), ctx),
          raw = false), ops.noFail)
        case TVarRaw(n) => (renderRes(resolve(HbPath(0, Seq(SegName(n))), ctx),
          raw = true), ops.noFail)
        case TPathMiss(_) => (ops.lit(""), ops.noFail)
        case TExprPath(p, raw) => (renderRes(resolve(p, ctx), raw), ops.noFail)
        case TLookup(obj, key, raw) =>
          val v = resolveArg(obj, ctx) match {
            case Right(RRoot) => resolveArg(key, ctx) match {
              case Left(AStrLit(s, _)) =>
                vars.get(s).map(x => if (raw) ops.raw(x) else ops.escape(x))
                  .getOrElse(ops.lit(""))
              case Right(RLit(l)) => // e.g. {{lookup ../this @key}}
                vars.get(l.render).map(x => if (raw) ops.raw(x) else ops.escape(x))
                  .getOrElse(ops.lit(""))
              case Right(RVal(kv)) =>
                val chosen = ops.chooseByKey(kv, sortedVars)
                if (raw) ops.raw(chosen) else ops.escape(chosen)
              case _ => ops.lit("")
            }
            case _ => ops.lit("") // lookup into a string/miss: non-strict ""
          }
          (v, ops.noFail)
        case TBlock(kind, arg, body, els) => kind match {
          case "if" => branchTruthy(arg, ctx,
            t = renderParts(body, ctx), f = renderParts(els, ctx))
          case "unless" => branchTruthy(arg, ctx,
            t = renderParts(els, ctx), f = renderParts(body, ctx))
          case "with" => resolveArg(arg, ctx) match {
            case Right(RVal(v)) => ops.ifTruthy(v,
              renderParts(body, Ctx(Some(v), Map.empty, Some(ctx))),
              renderParts(els, ctx))
            case Right(RRoot) => renderParts(body, ctx) // {{#with this}}
            case Left(l) =>
              if (l.truthy)
                renderParts(body, Ctx(Some(ops.lit(l.render)), Map.empty, Some(ctx)))
              else renderParts(els, ctx)
            case Right(RMiss) => renderParts(els, ctx)
          }
          case "each" => resolveArg(arg, ctx) match {
            case Right(RRoot) if sortedVars.nonEmpty =>
              // iterate the flat map in serde_json's sorted-key order
              val n = sortedVars.length
              val vs = ArrayBuffer.empty[V]
              var f = ops.noFail
              sortedVars.zipWithIndex.foreach { case ((k, v), i) =>
                val at = Map(
                  "key" -> AStrLit(k, k.nonEmpty),
                  "index" -> AStrLit(i.toString, i != 0), // number 0 is falsy
                  "first" -> AStrLit((i == 0).toString, i == 0),
                  "last" -> AStrLit((i == n - 1).toString, i == n - 1))
                val (bv, bf) = renderParts(body, Ctx(Some(v), at, Some(ctx)))
                vs += bv
                f = ops.orF(f, bf)
              }
              (ops.concat(vs.toSeq), f)
            case _ =>
              // a string (or miss, or literal) is not iterable: else-block
              renderParts(els, ctx)
          }
          case other =>
            throw new IllegalStateException(s"unknown block kind $other")
        }
      }

      def branchTruthy(arg: HbArg, ctx: Ctx[V],
          t: => (V, F), f: => (V, F)): (V, F) = resolveArg(arg, ctx) match {
        case Left(l) => if (l.truthy) t else f
        case Right(RRoot) => t // the non-empty var map object is truthy
        case Right(RVal(v)) => ops.ifTruthy(v, t, f)
        case Right(RLit(l)) => if (l.truthy) t else f // typed @-var truthiness
        case Right(RMiss) => f // Null is falsy
      }

      def renderRes(r: Res[V], raw: Boolean): V = r match {
        case RVal(v) => if (raw) ops.raw(v) else ops.escape(v)
        case RLit(l) => ops.lit(l.render) // @-vars: render form, no escaping needed
        // handlebars' JsonRender for an object value
        case RRoot => ops.lit("[object]")
        case RMiss => ops.lit("")
      }

      renderParts(tpl.parts, Ctx(None, Map.empty, None))
    }

    /** String-algebra instance (driver-side oracle / tests): failures are
      * per-taken-branch thanks to the by-name ifTruthy. */
    def renderString(tpl: Template,
        vars: collection.Map[String, String]): Option[String] = {
      object StrOps extends Ops[String, Boolean] {
        def lit(s: String): String = s
        def concat(vs: Seq[String]): String = vs.mkString
        def escape(v: String): String = htmlEscapeStr(v)
        def raw(v: String): String = v
        def ifTruthy(c: String, t: => (String, Boolean),
            f: => (String, Boolean)): (String, Boolean) =
          if (c != null && c.nonEmpty) t else f
        def chooseByKey(key: String,
            table: Seq[(String, String)]): String =
          table.collectFirst { case (k, v) if k == key => v }.getOrElse("")
        def noFail: Boolean = false
        def failNow: Boolean = true
        def orF(a: Boolean, b: Boolean): Boolean = a || b
      }
      val (v, failed) = render(tpl, vars, StrOps)
      if (failed) None else Some(v)
    }
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
