package graft.hotdog

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, NullNode, ObjectNode}
import scala.collection.mutable.ArrayBuffer

/** Full JMESPath (jmespath.org spec) compiled to an AST and interpreted
  * over Jackson `JsonNode`s — replacing round 2's access-chain subset.
  *
  * The reference precompiles arbitrary jmespath-crate expressions at
  * connection start (/root/reference/src/connection.rs:297-311) and treats
  * compile failures as fatal; at match time (src/rules.rs:70-85) a rule
  * matches iff `search` returns Ok(non-null) — so `false`, `0`, `""`, `[]`
  * and `{}` all MATCH (only null, parse failure, or a runtime evaluation
  * error do not), and the `value` variable is bound only for string
  * results.
  *
  * Grammar and operator precedence follow the public JMESPath
  * specification (pipe < or < and < comparators < flatten < star <
  * filter < dot < not < lbrace < lbracket < lparen); runtime function
  * type/arity errors surface as [[JmesError]], which the matcher treats
  * as no-match (the jmespath crate's `search` returns Err there), while
  * SYNTAX errors throw IllegalArgumentException at load time — the
  * reference's invalid-expression fixture ('. 0 meta.topic',
  * test/configs/single-rule-with-invalid-jmespath.yml) must fail the load.
  */
object Jmes {

  final class JmesError(msg: String) extends RuntimeException(msg, null, false, false)

  // ============================ AST ============================
  sealed trait JExpr
  case object Current extends JExpr // `@` and the implicit projection identity
  final case class Field(name: String) extends JExpr
  final case class Index(idx: Int) extends JExpr
  final case class Literal(node: JsonNode) extends JExpr
  /** `l.r` / `l[0]` — evaluate r against l's result */
  final case class SubExpr(l: JExpr, r: JExpr) extends JExpr
  /** `l[a:b:c]` — the sliced array (always wrapped in a Projection) */
  final case class Slice(l: JExpr, start: Option[Int], stop: Option[Int], step: Int) extends JExpr
  /** `l[*].r` — array projection (r per element, nulls dropped) */
  final case class Projection(l: JExpr, r: JExpr) extends JExpr
  /** `l.*.r` — object-value projection */
  final case class ValueProjection(l: JExpr, r: JExpr) extends JExpr
  /** `l[?cond].r` */
  final case class FilterProjection(l: JExpr, cond: JExpr, r: JExpr) extends JExpr
  /** `l[]` — flatten one level (wrapped in a Projection) */
  final case class Flatten(l: JExpr) extends JExpr
  final case class Comparison(op: String, l: JExpr, r: JExpr) extends JExpr
  final case class And(l: JExpr, r: JExpr) extends JExpr
  final case class Or(l: JExpr, r: JExpr) extends JExpr
  final case class Not(e: JExpr) extends JExpr
  final case class Pipe(l: JExpr, r: JExpr) extends JExpr
  final case class MultiList(items: Seq[JExpr]) extends JExpr
  final case class MultiHash(pairs: Seq[(String, JExpr)]) extends JExpr
  final case class FuncCall(name: String, args: Seq[JExpr]) extends JExpr
  final case class ExpRef(e: JExpr) extends JExpr

  // ============================ Lexer ============================
  private sealed trait Tok
  private case class TId(name: String) extends Tok
  private case class TQId(name: String) extends Tok
  private case class TNum(n: Int) extends Tok
  private case class TLit(node: JsonNode) extends Tok // `json` and 'raw string'
  private case class TCmp(op: String) extends Tok
  private case object TDot extends Tok
  private case object TStar extends Tok
  private case object TFlatten extends Tok // []
  private case object TFilter extends Tok // [?
  private case object TLBracket extends Tok
  private case object TRBracket extends Tok
  private case object TLBrace extends Tok
  private case object TRBrace extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok
  private case object TComma extends Tok
  private case object TColon extends Tok
  private case object TPipe extends Tok
  private case object TOr extends Tok
  private case object TAnd extends Tok
  private case object TNot extends Tok
  private case object TCurrent extends Tok
  private case object TExpref extends Tok // &
  private case object TEof extends Tok

  /** led binding power (JMESPath spec precedence table). */
  private def bp(t: Tok): Int = t match {
    case TPipe => 1
    case TOr => 2
    case TAnd => 3
    case TCmp(_) => 5
    case TFlatten => 9
    case TStar => 20
    case TFilter => 21
    case TDot => 40
    case TNot => 45
    case TLBrace => 50
    case TLBracket => 55
    case TLParen => 60
    case _ => 0
  }

  private def fail(expr: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"unsupported jmespath: $expr ($msg)")

  private val F = JsonNodeFactory.instance
  private val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  private def lex(s: String): IndexedSeq[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    val n = s.length
    var i = 0
    def identStart(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
    def identChar(c: Char) = identStart(c) || (c >= '0' && c <= '9')
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '.' => out += TDot; i += 1
        case '*' => out += TStar; i += 1
        case ',' => out += TComma; i += 1
        case ':' => out += TColon; i += 1
        case '{' => out += TLBrace; i += 1
        case '}' => out += TRBrace; i += 1
        case '(' => out += TLParen; i += 1
        case ')' => out += TRParen; i += 1
        case ']' => out += TRBracket; i += 1
        case '@' => out += TCurrent; i += 1
        case '[' =>
          if (i + 1 < n && s.charAt(i + 1) == ']') { out += TFlatten; i += 2 }
          else if (i + 1 < n && s.charAt(i + 1) == '?') { out += TFilter; i += 2 }
          else { out += TLBracket; i += 1 }
        case '|' =>
          if (i + 1 < n && s.charAt(i + 1) == '|') { out += TOr; i += 2 }
          else { out += TPipe; i += 1 }
        case '&' =>
          if (i + 1 < n && s.charAt(i + 1) == '&') { out += TAnd; i += 2 }
          else { out += TExpref; i += 1 }
        case '!' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += TCmp("!="); i += 2 }
          else { out += TNot; i += 1 }
        case '=' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += TCmp("=="); i += 2 }
          else fail(s, "'=' is not a valid token (did you mean '==')")
        case '<' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += TCmp("<="); i += 2 }
          else { out += TCmp("<"); i += 1 }
        case '>' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += TCmp(">="); i += 2 }
          else { out += TCmp(">"); i += 1 }
        case '-' =>
          val st = i; i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
          if (i == st + 1) fail(s, "expected digits after '-'")
          out += TNum(s.substring(st, i).toInt)
        case d if d.isDigit =>
          val st = i
          while (i < n && s.charAt(i).isDigit) i += 1
          out += TNum(s.substring(st, i).toInt)
        case '"' =>
          val (name, ni) = lexJsonString(s, i)
          out += TQId(name); i = ni
        case '\'' =>
          // raw string: only \' and \\ are escapes; everything else literal
          val sb = new StringBuilder; i += 1
          var closed = false
          while (i < n && !closed) {
            s.charAt(i) match {
              case '\\' if i + 1 < n && (s.charAt(i + 1) == '\'' || s.charAt(i + 1) == '\\') =>
                sb.append(s.charAt(i + 1)); i += 2
              case '\'' => closed = true; i += 1
              case ch => sb.append(ch); i += 1
            }
          }
          if (!closed) fail(s, "unterminated raw string")
          out += TLit(F.textNode(sb.toString))
        case '`' =>
          val sb = new StringBuilder; i += 1
          var closed = false
          while (i < n && !closed) {
            s.charAt(i) match {
              case '\\' if i + 1 < n && s.charAt(i + 1) == '`' => sb.append('`'); i += 2
              case '`' => closed = true; i += 1
              case ch => sb.append(ch); i += 1
            }
          }
          if (!closed) fail(s, "unterminated literal")
          val raw = sb.toString
          // JSON literal; like jmespath.py, a non-JSON body falls back to
          // the elided-quotes string form (`foo` == `"foo"`)
          val node =
            try jackson.readTree(raw)
            catch {
              case _: Exception =>
                try jackson.readTree("\"" + raw.trim + "\"")
                catch { case _: Exception => fail(s, s"bad literal `$raw`") }
            }
          if (node == null || node.isMissingNode) fail(s, s"bad literal `$raw`")
          out += TLit(node)
        case ch if identStart(ch) =>
          val st = i
          while (i < n && identChar(s.charAt(i))) i += 1
          out += TId(s.substring(st, i))
        case other => fail(s, s"unexpected character '$other'")
      }
    }
    out += TEof
    out.toIndexedSeq
  }

  /** JSON-string lexing for quoted identifiers (JMESPath spec: full JSON
    * escapes; unknown escapes are a load error, not a silent wrong key). */
  private def lexJsonString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    val n = s.length
    var i = start + 1
    var closed = false
    while (i < n && !closed) {
      s.charAt(i) match {
        case '\\' =>
          if (i + 1 >= n) fail(s, "bad escape")
          s.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' =>
              if (i + 5 >= n) fail(s, "bad \\u escape")
              val hex = s.substring(i + 2, i + 6)
              if (!hex.forall(ch => Character.digit(ch, 16) >= 0))
                fail(s, s"bad \\u escape \\u$hex")
              sb.append(Integer.parseInt(hex, 16).toChar); i += 6
            case other => fail(s, s"unsupported escape \\$other")
          }
        case '"' => closed = true; i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    if (!closed) fail(s, "unterminated quoted identifier")
    if (sb.isEmpty) fail(s, "empty quoted identifier")
    (sb.toString, i)
  }

  // ============================ Parser ============================
  private final class Parser(expr: String, toks: IndexedSeq[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def peek(k: Int): Tok = if (pos + k < toks.length) toks(pos + k) else TEof
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def expect(t: Tok): Unit =
      if (cur == t) pos += 1 else fail(expr, s"expected $t, got $cur")

    def parse(): JExpr = {
      val e = expression(0)
      if (cur != TEof) fail(expr, s"trailing token $cur")
      e
    }

    def expression(rbp: Int): JExpr = {
      var left = nud(advance())
      while (bp(cur) > rbp) left = led(advance(), left)
      left
    }

    private def nud(t: Tok): JExpr = t match {
      case TId(name) => Field(name)
      case TQId(name) =>
        if (cur == TLParen) fail(expr, "quoted identifier cannot be a function name")
        Field(name)
      case TLit(node) => Literal(node)
      case TCurrent => Current
      case TStar => ValueProjection(Current, projectionRhs(bp(TStar)))
      case TFilter => ledFilter(Current)
      case TFlatten => Projection(Flatten(Current), projectionRhs(bp(TFlatten)))
      case TNot => Not(expression(bp(TNot)))
      case TExpref => ExpRef(expression(0))
      case TLBrace => multiSelectHash()
      case TLParen =>
        val e = expression(0); expect(TRParen); e
      case TLBracket =>
        cur match {
          case TNum(_) | TColon => indexOrSlice(Current)
          case TStar =>
            // '[*' must be '[*]' — the reference's jmespath crate rejects
            // e.g. 'foo[*.b]' at compile time (advisory r3: falling through
            // to a multi-select list made an invalid rule config load here
            // where it is load-fatal in the reference)
            if (peek(1) != TRBracket) fail(expr, "expected ']' after '[*'")
            advance(); advance()
            Projection(Current, projectionRhs(bp(TStar)))
          case _ => multiSelectList()
        }
      case other => fail(expr, s"unexpected token $other")
    }

    private def led(t: Tok, left: JExpr): JExpr = t match {
      case TDot =>
        if (cur == TStar) { advance(); ValueProjection(left, projectionRhs(bp(TDot))) }
        else SubExpr(left, dotRhs(bp(TDot)))
      case TPipe => Pipe(left, expression(bp(TPipe)))
      case TOr => Or(left, expression(bp(TOr)))
      case TAnd => And(left, expression(bp(TAnd)))
      case TCmp(op) => Comparison(op, left, expression(bp(TCmp(op))))
      case TFlatten => Projection(Flatten(left), projectionRhs(bp(TFlatten)))
      case TFilter => ledFilter(left)
      case TLBracket =>
        cur match {
          case TNum(_) | TColon => indexOrSlice(left)
          case TStar if peek(1) == TRBracket =>
            advance(); advance()
            Projection(left, projectionRhs(bp(TStar)))
          case other => fail(expr, s"expected number, ':' or '*' after '[', got $other")
        }
      case TLParen =>
        left match {
          case Field(name) =>
            val args = ArrayBuffer.empty[JExpr]
            while (cur != TRParen) {
              args += expression(0)
              if (cur == TComma) advance()
              else if (cur != TRParen) fail(expr, s"expected ',' or ')', got $cur")
            }
            advance() // rparen
            FuncCall(name, args.toSeq)
          case _ => fail(expr, "function call on a non-identifier")
        }
      case other => fail(expr, s"unexpected infix token $other")
    }

    private def ledFilter(left: JExpr): JExpr = {
      val cond = expression(0)
      expect(TRBracket)
      FilterProjection(left, cond, projectionRhs(bp(TFilter)))
    }

    /** `[n]` or `[a:b:c]` after `left` (slices become projections). */
    private def indexOrSlice(left: JExpr): JExpr = {
      // collect up to 3 colon-separated optional numbers
      val parts = Array[Option[Int]](None, None, None)
      var slot = 0
      var sawColon = false
      var done = false
      while (!done) {
        cur match {
          case TNum(v) =>
            if (slot > 2 || parts(slot).isDefined) fail(expr, "bad slice")
            parts(slot) = Some(v); advance()
          case TColon =>
            sawColon = true; slot += 1
            if (slot > 2) fail(expr, "too many ':' in slice")
            advance()
          case TRBracket => advance(); done = true
          case other => fail(expr, s"unexpected $other in index/slice")
        }
      }
      if (!sawColon) {
        parts(0) match {
          case Some(ix) => SubExpr(left, Index(ix))
          case None => fail(expr, "empty brackets")
        }
      } else {
        val step = parts(2).getOrElse(1)
        if (step == 0) fail(expr, "slice step cannot be 0")
        Projection(Slice(left, parts(0), parts(1), step), projectionRhs(bp(TLBracket)))
      }
    }

    /** RHS of a projection: stops when the next token binds looser than 10. */
    private def projectionRhs(rbp: Int): JExpr =
      cur match {
        case t if bp(t) < 10 => Current
        case TLBracket | TFilter => expression(rbp)
        case TDot => advance(); dotRhs(rbp)
        case other => fail(expr, s"unexpected $other after projection")
      }

    private def dotRhs(rbp: Int): JExpr =
      cur match {
        case TId(_) | TQId(_) | TStar => expression(rbp)
        case TLBracket => advance(); multiSelectList()
        case TLBrace => advance(); multiSelectHash()
        case other => fail(expr, s"unexpected $other after '.'")
      }

    private def multiSelectList(): JExpr = {
      val items = ArrayBuffer.empty[JExpr]
      var done = false
      while (!done) {
        items += expression(0)
        cur match {
          case TComma => advance()
          case TRBracket => advance(); done = true
          case other => fail(expr, s"expected ',' or ']', got $other")
        }
      }
      MultiList(items.toSeq)
    }

    private def multiSelectHash(): JExpr = {
      val pairs = ArrayBuffer.empty[(String, JExpr)]
      var done = false
      while (!done) {
        val key = advance() match {
          case TId(n) => n
          case TQId(n) => n
          case other => fail(expr, s"expected identifier key, got $other")
        }
        expect(TColon)
        pairs += (key -> expression(0))
        cur match {
          case TComma => advance()
          case TRBrace => advance(); done = true
          case other => fail(expr, s"expected ',' or '}', got $other")
        }
      }
      MultiHash(pairs.toSeq)
    }
  }

  /** Compile; syntax errors throw IllegalArgumentException (load-fatal). */
  def compile(expr: String): JExpr = {
    if (expr.trim.isEmpty) fail(expr, "empty expression")
    new Parser(expr, lex(expr)).parse()
  }

  // ======================= Root-shape analysis =======================

  /** True ⇒ `eval(e, null) == null` for every such e (used to prove
    * rootGuard compositions safe). */
  private def nullPropagates(e: JExpr): Boolean = e match {
    case Current | Field(_) | Index(_) => true
    case MultiList(_) | MultiHash(_) => true // defined null → null
    case SubExpr(l, r) => nullPropagates(l) && nullPropagates(r)
    case Pipe(l, r) => nullPropagates(l) && nullPropagates(r)
    case Projection(l, _) => nullPropagates(l)
    case ValueProjection(l, _) => nullPropagates(l)
    case FilterProjection(l, _, _) => nullPropagates(l)
    case Flatten(l) => nullPropagates(l)
    case Slice(l, _, _, _) => nullPropagates(l)
    case And(l, _) => nullPropagates(l) // null is falsy → And returns it
    case Or(l, r) => nullPropagates(l) && nullPropagates(r)
    case _ => false // Literal, FuncCall, Not, Comparison, ExpRef
  }

  /** True ⇒ the expression CANNOT match (evaluates null/error) when the
    * root document is a scalar — lets the evaluator skip the JSON parse
    * for non-container lines (the overwhelmingly common case in a log
    * stream). Conservative: false whenever unsure. */
  def needsContainerRoot(e: JExpr): Boolean = e match {
    case Field(_) | Index(_) => true
    case SubExpr(l, r) =>
      (needsContainerRoot(l) && nullPropagates(r)) ||
        (l == Current && needsContainerRoot(r))
    case Pipe(l, r) =>
      (needsContainerRoot(l) && nullPropagates(r)) ||
        (l == Current && needsContainerRoot(r))
    case Projection(l, _) => l == Current || needsContainerRoot(l)
    case ValueProjection(l, _) => l == Current || needsContainerRoot(l)
    case FilterProjection(l, _, _) => l == Current || needsContainerRoot(l)
    case Flatten(l) => l == Current || needsContainerRoot(l)
    case Slice(l, _, _, _) => l == Current || needsContainerRoot(l)
    case And(l, _) => needsContainerRoot(l)
    case Or(l, r) => needsContainerRoot(l) && needsContainerRoot(r)
    case _ => false
  }

  // ============================ Evaluator ============================

  private val Null: JsonNode = NullNode.getInstance()

  /** JMESPath truthiness: null / false / "" / [] / {} are false. */
  def truthy(n: JsonNode): Boolean =
    !(n.isNull ||
      (n.isBoolean && !n.booleanValue()) ||
      (n.isTextual && n.textValue().isEmpty) ||
      (n.isArray && n.size() == 0) ||
      (n.isObject && n.size() == 0))

  /** numeric-aware deep equality (1 == 1.0, per JSON value semantics) */
  def deepEq(a: JsonNode, b: JsonNode): Boolean = {
    if (a.isNumber && b.isNumber) {
      if (a.isIntegralNumber && b.isIntegralNumber) a.longValue() == b.longValue()
      else a.doubleValue() == b.doubleValue()
    } else if (a.isArray && b.isArray) {
      if (a.size() != b.size()) return false
      var i = 0
      while (i < a.size()) {
        if (!deepEq(a.get(i), b.get(i))) return false
        i += 1
      }
      true
    } else if (a.isObject && b.isObject) {
      if (a.size() != b.size()) return false
      val it = a.fields()
      while (it.hasNext) {
        val e = it.next()
        val o = b.get(e.getKey)
        if (o == null || !deepEq(e.getValue, o)) return false
      }
      true
    } else a == b
  }

  def eval(e: JExpr, v: JsonNode): JsonNode = e match {
    case Current => v
    case Field(name) =>
      if (v.isObject) { val r = v.get(name); if (r == null) Null else r } else Null
    case Index(ix) =>
      if (!v.isArray) Null
      else {
        val k = if (ix < 0) v.size() + ix else ix
        if (k < 0 || k >= v.size()) Null else v.get(k)
      }
    case Literal(n) => n
    case SubExpr(l, r) => eval(r, eval(l, v))
    case Slice(l, s0, s1, step) =>
      val lv = eval(l, v)
      if (!lv.isArray) Null
      else {
        val len = lv.size()
        // python slice semantics (what the spec defines)
        def clamp(x: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, x))
        val start =
          s0.map(x => if (x < 0) clamp(x + len, if (step < 0) -1 else 0, len - (if (step < 0) 1 else 0)) else clamp(x, 0, if (step < 0) len - 1 else len))
            .getOrElse(if (step < 0) len - 1 else 0)
        val stop =
          s1.map(x => if (x < 0) clamp(x + len, if (step < 0) -1 else 0, len) else clamp(x, if (step < 0) -1 else 0, len))
            .getOrElse(if (step < 0) -1 else len)
        val out = F.arrayNode()
        var i = start
        if (step > 0) while (i < stop) { out.add(lv.get(i)); i += step }
        else while (i > stop) { out.add(lv.get(i)); i += step }
        out
      }
    case Projection(l, r) =>
      val lv = eval(l, v)
      if (!lv.isArray) Null
      else {
        val out = F.arrayNode()
        val it = lv.elements()
        while (it.hasNext) {
          val rv = eval(r, it.next())
          if (!rv.isNull) out.add(rv)
        }
        out
      }
    case ValueProjection(l, r) =>
      val lv = eval(l, v)
      if (!lv.isObject) Null
      else {
        val out = F.arrayNode()
        val it = lv.elements()
        while (it.hasNext) {
          val rv = eval(r, it.next())
          if (!rv.isNull) out.add(rv)
        }
        out
      }
    case FilterProjection(l, cond, r) =>
      val lv = eval(l, v)
      if (!lv.isArray) Null
      else {
        val out = F.arrayNode()
        val it = lv.elements()
        while (it.hasNext) {
          val el = it.next()
          if (truthy(eval(cond, el))) {
            val rv = eval(r, el)
            if (!rv.isNull) out.add(rv)
          }
        }
        out
      }
    case Flatten(l) =>
      val lv = eval(l, v)
      if (!lv.isArray) Null
      else {
        val out = F.arrayNode()
        val it = lv.elements()
        while (it.hasNext) {
          val el = it.next()
          if (el.isArray) out.addAll(el.asInstanceOf[ArrayNode])
          else out.add(el)
        }
        out
      }
    case Comparison(op, l, r) =>
      val a = eval(l, v)
      val b = eval(r, v)
      op match {
        case "==" => F.booleanNode(deepEq(a, b))
        case "!=" => F.booleanNode(!deepEq(a, b))
        case _ =>
          // ordering is defined for numbers only; anything else → null
          if (!a.isNumber || !b.isNumber) Null
          else {
            val x = a.doubleValue(); val y = b.doubleValue()
            F.booleanNode(op match {
              case "<" => x < y
              case "<=" => x <= y
              case ">" => x > y
              case ">=" => x >= y
            })
          }
      }
    case And(l, r) =>
      val a = eval(l, v)
      if (truthy(a)) eval(r, v) else a
    case Or(l, r) =>
      val a = eval(l, v)
      if (truthy(a)) a else eval(r, v)
    case Not(x) => F.booleanNode(!truthy(eval(x, v)))
    case Pipe(l, r) => eval(r, eval(l, v))
    case MultiList(items) =>
      if (v.isNull) Null
      else {
        val out = F.arrayNode()
        items.foreach(it => out.add(eval(it, v)))
        out
      }
    case MultiHash(pairs) =>
      if (v.isNull) Null
      else {
        val out = F.objectNode()
        pairs.foreach { case (k, pe) => out.set[JsonNode](k, eval(pe, v)) }
        out
      }
    case ExpRef(_) =>
      throw new JmesError("expression reference used outside a function argument")
    case FuncCall(name, args) => JmesFunctions.call(name, args, v)
  }

  /** Search with the jmespath crate's error behavior: a runtime error
    * (function type/arity misuse) yields Err → the caller's no-match. */
  def search(e: JExpr, root: JsonNode): JsonNode =
    try eval(e, root)
    catch { case _: JmesError => Null }
}

/** The JMESPath standard function library (spec §functions), evaluated
  * over Jackson nodes. Type and arity violations throw [[Jmes.JmesError]]
  * — the matcher treats those as no-match, mirroring the jmespath crate's
  * runtime `search` errors (the crate resolves functions at runtime, so
  * even an unknown function name loads fine and silently never matches). */
private object JmesFunctions {
  import Jmes.{JExpr, JmesError, ExpRef}

  private val F = JsonNodeFactory.instance
  private val Null: JsonNode = NullNode.getInstance()

  private def err(msg: String): Nothing = throw new JmesError(msg)

  /** evaluated argument or expression-reference */
  private type Arg = Either[JsonNode, JExpr]
  private def value(a: Arg, fn: String): JsonNode = a match {
    case Left(n) => n
    case Right(_) => err(s"$fn: unexpected expression reference")
  }
  private def expref(a: Arg, fn: String): JExpr = a match {
    case Right(e) => e
    case Left(_) => err(s"$fn: expected an &expression argument")
  }
  private def num(n: JsonNode, fn: String): Double =
    if (n.isNumber) n.doubleValue() else err(s"$fn: expected a number")
  private def str(n: JsonNode, fn: String): String =
    if (n.isTextual) n.textValue() else err(s"$fn: expected a string")
  private def arr(n: JsonNode, fn: String): ArrayNode =
    if (n.isArray) n.asInstanceOf[ArrayNode] else err(s"$fn: expected an array")

  private def numberNode(d: Double): JsonNode =
    if (d.isWhole && math.abs(d) < 9.007199254740992e15) F.numberNode(d.toLong)
    else F.numberNode(d)

  /** sort/compare key: all-numbers or all-strings. */
  private def sortKeys(a: ArrayNode, fn: String): Either[Array[Double], Array[String]] = {
    if (a.size() == 0) return Left(Array.empty)
    val first = a.get(0)
    if (first.isNumber) {
      val out = new Array[Double](a.size())
      var i = 0
      while (i < a.size()) {
        out(i) = num(a.get(i), fn); i += 1
      }
      Left(out)
    } else if (first.isTextual) {
      val out = new Array[String](a.size())
      var i = 0
      while (i < a.size()) {
        out(i) = str(a.get(i), fn); i += 1
      }
      Right(out)
    } else err(s"$fn: array elements must be all numbers or all strings")
  }

  private def arity(args: Seq[Arg], n: Int, fn: String): Unit =
    if (args.length != n) err(s"$fn: expected $n argument(s), got ${args.length}")

  def call(name: String, rawArgs: Seq[JExpr], v: JsonNode): JsonNode = {
    val args: Seq[Arg] = rawArgs.map {
      case ExpRef(e) => Right(e)
      case a => Left(Jmes.eval(a, v))
    }
    name match {
      case "abs" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        if (!n.isNumber) err("abs: expected a number")
        if (n.isIntegralNumber) F.numberNode(math.abs(n.longValue()))
        else F.numberNode(math.abs(n.doubleValue()))
      case "avg" =>
        arity(args, 1, name)
        val a = arr(value(args.head, name), name)
        if (a.size() == 0) Null
        else {
          var s = 0.0
          var i = 0
          while (i < a.size()) { s += num(a.get(i), name); i += 1 }
          F.numberNode(s / a.size())
        }
      case "ceil" =>
        arity(args, 1, name)
        F.numberNode(math.ceil(num(value(args.head, name), name)).toLong)
      case "floor" =>
        arity(args, 1, name)
        F.numberNode(math.floor(num(value(args.head, name), name)).toLong)
      case "contains" =>
        arity(args, 2, name)
        val subject = value(args(0), name)
        val search = value(args(1), name)
        if (subject.isTextual) {
          // spec: non-string search in a string subject → false
          F.booleanNode(search.isTextual && subject.textValue().contains(search.textValue()))
        } else if (subject.isArray) {
          val it = subject.elements()
          var found = false
          while (it.hasNext && !found) found = Jmes.deepEq(it.next(), search)
          F.booleanNode(found)
        } else err("contains: expected a string or array subject")
      case "ends_with" =>
        arity(args, 2, name)
        F.booleanNode(str(value(args(0), name), name).endsWith(str(value(args(1), name), name)))
      case "starts_with" =>
        arity(args, 2, name)
        F.booleanNode(str(value(args(0), name), name).startsWith(str(value(args(1), name), name)))
      case "join" =>
        arity(args, 2, name)
        val glue = str(value(args(0), name), name)
        val a = arr(value(args(1), name), name)
        val sb = new StringBuilder
        var i = 0
        while (i < a.size()) {
          if (i > 0) sb.append(glue)
          sb.append(str(a.get(i), name)); i += 1
        }
        F.textNode(sb.toString)
      case "keys" =>
        arity(args, 1, name)
        val o = value(args.head, name)
        if (!o.isObject) err("keys: expected an object")
        val out = F.arrayNode()
        val it = o.fieldNames()
        while (it.hasNext) out.add(F.textNode(it.next()))
        out
      case "values" =>
        arity(args, 1, name)
        val o = value(args.head, name)
        if (!o.isObject) err("values: expected an object")
        val out = F.arrayNode()
        val it = o.elements()
        while (it.hasNext) out.add(it.next())
        out
      case "length" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        if (n.isTextual) F.numberNode(n.textValue().codePointCount(0, n.textValue().length).toLong)
        else if (n.isArray || n.isObject) F.numberNode(n.size().toLong)
        else err("length: expected a string, array or object")
      case "map" =>
        arity(args, 2, name)
        val e = expref(args(0), name)
        val a = arr(value(args(1), name), name)
        val out = F.arrayNode()
        val it = a.elements()
        while (it.hasNext) out.add(Jmes.eval(e, it.next())) // nulls KEPT (spec)
        out
      case "max" | "min" =>
        arity(args, 1, name)
        val a = arr(value(args.head, name), name)
        if (a.size() == 0) Null
        else sortKeys(a, name) match {
          case Left(ds) =>
            var best = 0
            var i = 1
            while (i < ds.length) {
              if (if (name == "max") ds(i) > ds(best) else ds(i) < ds(best)) best = i
              i += 1
            }
            a.get(best)
          case Right(ss) =>
            var best = 0
            var i = 1
            while (i < ss.length) {
              val c = ss(i).compareTo(ss(best))
              if (if (name == "max") c > 0 else c < 0) best = i
              i += 1
            }
            a.get(best)
        }
      case "max_by" | "min_by" =>
        arity(args, 2, name)
        val a = arr(value(args(0), name), name)
        val e = expref(args(1), name)
        if (a.size() == 0) return Null
        val keys = F.arrayNode()
        var i = 0
        while (i < a.size()) { keys.add(Jmes.eval(e, a.get(i))); i += 1 }
        sortKeys(keys, name) match {
          case Left(ds) =>
            var best = 0
            i = 1
            while (i < ds.length) {
              if (if (name == "max_by") ds(i) > ds(best) else ds(i) < ds(best)) best = i
              i += 1
            }
            a.get(best)
          case Right(ss) =>
            var best = 0
            i = 1
            while (i < ss.length) {
              val c = ss(i).compareTo(ss(best))
              if (if (name == "max_by") c > 0 else c < 0) best = i
              i += 1
            }
            a.get(best)
        }
      case "merge" =>
        if (args.isEmpty) err("merge: expected at least 1 argument")
        val out = F.objectNode()
        args.foreach { a =>
          val o = value(a, name)
          if (!o.isObject) err("merge: expected objects")
          out.setAll[JsonNode](o.asInstanceOf[ObjectNode])
        }
        out
      case "not_null" =>
        if (args.isEmpty) err("not_null: expected at least 1 argument")
        args.iterator.map(value(_, name)).find(!_.isNull).getOrElse(Null)
      case "reverse" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        if (n.isTextual) F.textNode(new StringBuilder(n.textValue()).reverse.toString)
        else if (n.isArray) {
          val out = F.arrayNode()
          var i = n.size() - 1
          while (i >= 0) { out.add(n.get(i)); i -= 1 }
          out
        } else err("reverse: expected a string or array")
      case "sort" =>
        arity(args, 1, name)
        val a = arr(value(args.head, name), name)
        val idx = (0 until a.size()).toArray
        val sorted = sortKeys(a, name) match {
          case Left(ds) => idx.sortBy(i => ds(i)) // stable (TimSort)
          case Right(ss) => idx.sortBy(i => ss(i))
        }
        val out = F.arrayNode()
        sorted.foreach(i => out.add(a.get(i)))
        out
      case "sort_by" =>
        arity(args, 2, name)
        val a = arr(value(args(0), name), name)
        val e = expref(args(1), name)
        val keys = F.arrayNode()
        var i = 0
        while (i < a.size()) { keys.add(Jmes.eval(e, a.get(i))); i += 1 }
        val idx = (0 until a.size()).toArray
        val sorted = sortKeys(keys, name) match {
          case Left(ds) => idx.sortBy(j => ds(j)) // stable
          case Right(ss) => idx.sortBy(j => ss(j))
        }
        val out = F.arrayNode()
        sorted.foreach(j => out.add(a.get(j)))
        out
      case "sum" =>
        arity(args, 1, name)
        val a = arr(value(args.head, name), name)
        var s = 0.0
        var allInt = true
        var i = 0
        while (i < a.size()) {
          val n = a.get(i)
          if (!n.isIntegralNumber) allInt = false
          s += num(n, name); i += 1
        }
        if (allInt) F.numberNode(s.toLong) else F.numberNode(s)
      case "to_array" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        if (n.isArray) n
        else { val out = F.arrayNode(); out.add(n); out }
      case "to_number" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        if (n.isNumber) n
        else if (n.isTextual) {
          val t = n.textValue().trim
          if (t.matches("-?\\d+")) {
            try F.numberNode(t.toLong)
            catch { case _: NumberFormatException => F.numberNode(t.toDouble) }
          } else if (t.matches("-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?")) F.numberNode(t.toDouble)
          else Null
        } else Null
      case "to_string" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        if (n.isTextual) n else F.textNode(HotdogJson.serialize(n))
      case "type" =>
        arity(args, 1, name)
        val n = value(args.head, name)
        F.textNode(
          if (n.isNull) "null"
          else if (n.isBoolean) "boolean"
          else if (n.isNumber) "number"
          else if (n.isTextual) "string"
          else if (n.isArray) "array"
          else "object")
      case other => err(s"unknown function: $other")
    }
  }
}
