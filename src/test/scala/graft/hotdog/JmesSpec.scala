package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Full-JMESPath engine tests. Expected values follow the public JMESPath
  * specification (jmespath.org/specification.html) and its published
  * examples; match semantics (non-null ⇒ match, string ⇒ `value`) follow
  * the reference's rules.rs:70-85. */
class JmesSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** run expr against a JSON doc, result re-serialized compact (sorted
    * keys, serde-style) or "null" */
  private def s(expr: String, json: String): String =
    HotdogJson.serialize(Jmes.search(Jmes.compile(expr), mapper.readTree(json)))

  private val doc =
    """{"a": {"b": {"c": "d"}}, "arr": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
      |"people": [{"name": "bob", "age": 30, "state": {"v": "on"}},
      |           {"name": "amy", "age": 25},
      |           {"name": "zed", "age": 35, "tags": ["x"]}],
      |"objs": {"x": {"n": 1}, "y": {"n": 2}},
      |"nested": [[1, 2], [3], 4, [5, [6, 7]]],
      |"empty_a": [], "empty_o": {}, "str": "hello", "t": true, "zero": 0}
      |""".stripMargin

  test("basic field / index access chains") {
    assert(s("a.b.c", doc) == "\"d\"")
    assert(s("a.b", doc) == "{\"c\":\"d\"}")
    assert(s("arr[0]", doc) == "0")
    assert(s("arr[-1]", doc) == "9")
    assert(s("arr[100]", doc) == "null")
    assert(s("nope", doc) == "null")
    assert(s("a.nope.c", doc) == "null")
    assert(s("str[0]", doc) == "null") // index on non-array
    assert(s("arr.b", doc) == "null") // field on non-object
    assert(s("\"a\".b.c", doc) == "\"d\"")
    assert(s("@", "5") == "5")
    assert(s("@.a.b.c", doc) == "{\"c\":\"d\"}".pipe(_ => "\"d\""))
  }

  test("wildcard projections: [*] and .*") {
    assert(s("people[*].name", doc) == "[\"bob\",\"amy\",\"zed\"]")
    // nulls are DROPPED from projections
    assert(s("people[*].tags", doc) == "[[\"x\"]]")
    assert(s("people[*].state.v", doc) == "[\"on\"]")
    assert(s("a[*].b", doc) == "null") // [*] on an object → null
    assert(s("objs.*.n", doc) == "[1,2]")
    assert(s("people[*].name[0]", doc) == "[]") // index into strings → dropped
    // projections stop at pipes
    assert(s("people[*].name | [0]", doc) == "\"bob\"")
    // without pipe, [0] applies per-element (spec example)
    assert(s("people[*].tags[0]", doc) == "[\"x\"]")
    assert(s("empty_a[*].x", doc) == "[]") // empty array projects to []
  }

  test("flatten []") {
    assert(s("nested[]", doc) == "[1,2,3,4,5,[6,7]]") // one level only
    assert(s("nested[][]", doc) == "[1,2,3,4,5,6,7]")
    assert(s("a[]", doc) == "null") // flatten of non-array
    assert(s("people[].name", doc) == "[\"bob\",\"amy\",\"zed\"]")
  }

  test("slices (python semantics, projections)") {
    assert(s("arr[0:5]", doc) == "[0,1,2,3,4]")
    assert(s("arr[5:]", doc) == "[5,6,7,8,9]")
    assert(s("arr[:3]", doc) == "[0,1,2]")
    assert(s("arr[::2]", doc) == "[0,2,4,6,8]")
    assert(s("arr[::-1]", doc) == "[9,8,7,6,5,4,3,2,1,0]")
    assert(s("arr[8:1:-2]", doc) == "[8,6,4,2]")
    assert(s("arr[-3:]", doc) == "[7,8,9]")
    assert(s("arr[:-7]", doc) == "[0,1,2]")
    assert(s("arr[100:200]", doc) == "[]")
    assert(s("str[0:2]", doc) == "null") // slice of non-array → null
    // slices are projections: rhs applies per element
    assert(s("people[1:].name", doc) == "[\"amy\",\"zed\"]")
  }

  test("filter projections [?...]") {
    assert(s("people[?age > `28`].name", doc) == "[\"bob\",\"zed\"]")
    assert(s("people[?age >= `25` && age <= `30`].name", doc) == "[\"bob\",\"amy\"]")
    assert(s("people[?name == 'amy'].age", doc) == "[25]")
    assert(s("people[?name != 'amy'] | [0].name", doc) == "\"bob\"")
    // a filter on a non-array → null; empty result is [] (non-null!)
    assert(s("a[?b]", doc) == "null")
    assert(s("people[?age > `99`]", doc) == "[]")
    // truthiness of non-comparator conditions: missing key → null → false
    assert(s("people[?tags].name", doc) == "[\"zed\"]")
    // ordering comparators on non-numbers → null → falsy
    assert(s("people[?name > `5`].name", doc) == "[]")
  }

  test("or / and / not + truthiness") {
    assert(s("nope || str", doc) == "\"hello\"")
    assert(s("str || nope", doc) == "\"hello\"")
    assert(s("empty_a || str", doc) == "\"hello\"") // [] is falsy
    assert(s("empty_o || empty_a", doc) == "[]") // both falsy → last
    assert(s("str && t", doc) == "true")
    assert(s("nope && str", doc) == "null")
    assert(s("!str", doc) == "false")
    assert(s("!nope", doc) == "true")
    assert(s("!empty_a", doc) == "true")
    // numbers are ALWAYS truthy, even 0 (spec)
    assert(s("zero && str", doc) == "\"hello\"")
    assert(s("!zero", doc) == "false")
  }

  test("equality is deep and numeric-aware") {
    assert(s("a.b == `{\"c\": \"d\"}`", doc) == "true")
    assert(s("arr[1] == `1.0`", doc) == "true")
    assert(s("arr[1] == `\"1\"`", doc) == "false")
    assert(s("nope == `null`", doc) == "true")
  }

  test("multi-select lists and hashes") {
    assert(s("people[0].[name, age]", doc) == "[\"bob\",30]")
    // multiselect keeps nulls (unlike projections)
    assert(s("people[1].[name, tags]", doc) == "[\"amy\",null]")
    assert(s("people[0].{n: name, a: age}", doc) == "{\"a\":30,\"n\":\"bob\"}")
    // on null input → null
    assert(s("nope.[a, b]", doc) == "null")
    assert(s("nope.{a: b}", doc) == "null")
  }

  test("literals and raw strings") {
    assert(s("`1.5`", doc) == "1.5")
    assert(s("`[1, 2]`[0]", doc) == "1")
    assert(s("'foo'", doc) == "\"foo\"")
    assert(s("`foo`", doc) == "\"foo\"") // elided-quotes legacy form
    assert(s("`{\"x\": 1}`.x", doc) == "1")
  }

  test("pipes stop projections") {
    assert(s("people[*] | [0] | name", doc) == "\"bob\"")
    assert(s("people[*].name | [-1]", doc) == "\"zed\"")
  }

  test("functions: numeric") {
    assert(s("abs(`-5`)", doc) == "5")
    assert(s("abs(`-1.5`)", doc) == "1.5")
    assert(s("ceil(`1.2`)", doc) == "2")
    assert(s("floor(`1.8`)", doc) == "1")
    assert(s("avg(`[2, 4, 6]`)", doc) == "4.0") // avg is float division
    assert(s("avg(`[]`)", doc) == "null")
    assert(s("sum(arr)", doc) == "45")
    assert(s("sum(`[]`)", doc) == "0")
    assert(s("max(arr)", doc) == "9")
    assert(s("min(arr)", doc) == "0")
    assert(s("max(`[]`)", doc) == "null")
    assert(s("max(`[\"a\", \"c\", \"b\"]`)", doc) == "\"c\"")
  }

  test("functions: string/array") {
    assert(s("length(str)", doc) == "5")
    assert(s("length(arr)", doc) == "10")
    assert(s("length(objs)", doc) == "2")
    assert(s("length(`5`)", doc) == "null") // type error → no match
    assert(s("contains(str, 'ell')", doc) == "true")
    assert(s("contains(arr, `3`)", doc) == "true")
    assert(s("contains(arr, `99`)", doc) == "false")
    assert(s("contains(str, `2`)", doc) == "false") // non-string search in string
    assert(s("starts_with(str, 'he')", doc) == "true")
    assert(s("ends_with(str, 'lo')", doc) == "true")
    assert(s("join(', ', people[*].name)", doc) == "\"bob, amy, zed\"")
    assert(s("reverse(str)", doc) == "\"olleh\"")
    assert(s("reverse(arr[:3])", doc) == "[2,1,0]")
    assert(s("sort(`[3, 1, 2]`)", doc) == "[1,2,3]")
    assert(s("sort(`[1, \"a\"]`)", doc) == "null") // mixed types → error
    assert(s("keys(objs)", doc) == "[\"x\",\"y\"]")
    assert(s("values(objs)[*].n", doc) == "[1,2]")
    assert(s("merge(`{\"a\":1,\"b\":1}`, `{\"b\":2}`)", doc) == "{\"a\":1,\"b\":2}")
    assert(s("not_null(nope, also_nope, str)", doc) == "\"hello\"")
    assert(s("not_null(nope)", doc) == "null")
    assert(s("to_array(str)", doc) == "[\"hello\"]")
    assert(s("to_array(arr)", doc) == "[0,1,2,3,4,5,6,7,8,9]")
    assert(s("to_number('42')", doc) == "42")
    assert(s("to_number('4.5')", doc) == "4.5")
    assert(s("to_number(str)", doc) == "null")
    assert(s("to_string(`{\"b\":2,\"a\":1}`)", doc) == "\"{\\\"a\\\":1,\\\"b\\\":2}\"")
    assert(s("type(str)", doc) == "\"string\"")
    assert(s("type(arr)", doc) == "\"array\"")
    assert(s("type(nope)", doc) == "\"null\"")
  }

  test("functions: expression references (&)") {
    assert(s("map(&age, people)", doc) == "[30,25,35]")
    assert(s("map(&nope, people)", doc) == "[null,null,null]") // map keeps nulls
    assert(s("sort_by(people, &age)[*].name", doc) == "[\"amy\",\"bob\",\"zed\"]")
    assert(s("sort_by(people, &name)[0].age", doc) == "25")
    assert(s("max_by(people, &age).name", doc) == "\"zed\"")
    assert(s("min_by(people, &age).name", doc) == "\"amy\"")
    // unknown function → runtime error → null (no match), NOT a load error
    assert(s("definitely_not_a_function(str)", doc) == "null")
    // arity error → runtime error → null
    assert(s("length(str, arr)", doc) == "null")
  }

  test("match semantics (rules.rs:70-85): non-null matches, string binds value") {
    def evalRow(expr: String, json: String): (Boolean, String) = {
      val row = HotdogJson.jmesEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(json),
        org.apache.spark.unsafe.types.UTF8String.fromString(expr))
      (row.getBoolean(0), if (row.isNullAt(1)) null else row.getString(1))
    }
    assert(evalRow("meta.topic", """{"meta":{"topic":"t9"}}""") == (true, "t9"))
    // false / 0 / "" / [] / {} are all NON-NULL → they MATCH, value null
    assert(evalRow("a", """{"a": false}""") == (true, null))
    assert(evalRow("a", """{"a": 0}""") == (true, null))
    assert(evalRow("a", """{"a": ""}""") == (true, ""))
    assert(evalRow("a[?x]", """{"a": []}""") == (true, null))
    // null result / invalid JSON / scalar root on a guarded chain → no match
    assert(evalRow("a.b", """{"a": 1}""") == (false, null))
    assert(evalRow("a.b", "not json") == (false, null))
    assert(evalRow("a.b", "42") == (false, null))
    // non-container-guarded expressions DO match scalar roots
    assert(evalRow("@", "42") == (true, null))
    assert(evalRow("to_string(@)", "42") == (true, "42"))
    assert(evalRow("length(@)", "\"abcd\"") == (true, null))
  }

  test("needsContainerRoot analysis is sound and usefully tight") {
    import Jmes._
    def g(e: String) = needsContainerRoot(compile(e))
    assert(g("a.b.c")); assert(g("[0].x")); assert(g("a[*].b"))
    assert(g("a[?x > `1`]")); assert(g("a[0:3]")); assert(g("a[]"))
    assert(g("a || b")); assert(g("a && b")); assert(g("a.b | c"))
    assert(!g("@")); assert(!g("`1`")); assert(!g("length(@)"))
    assert(!g("!a")) // !scalar-null → true → would match
    assert(!g("a || `1`")) // literal fallback matches scalars
    // a.not_null(@, `1`): rhs does not null-propagate → must not be guarded
    assert(!g("a.not_null(@, `1`)"))
    // verify that claim concretely: on a scalar root it MATCHES
    assert(s("a.not_null(@, `1`)", "5") == "1")
  }

  test("syntax errors are load-fatal (reference fixture parity)") {
    for (e <- Seq(". 0 meta.topic", "=x", "a ^ b", "people[?]", "a[*",
        "f(", "{a: }", "[1:2:0]", "'unterminated", "`{bad json", "a.\"unterminated",
        // '[*' must be '[*]' — the crate rejects these at compile time
        // (advisory r3: '[*.b]' used to parse as a multi-select list)
        "foo[*.b]", "[*.b]", "[*, a]"))
      assertThrows[IllegalArgumentException](Jmes.compile(e))
    // ...while the well-formed star projections still parse
    for (e <- Seq("[*]", "foo[*]", "foo[*].b")) Jmes.compile(e)
  }

  private implicit class PipeOps[A](private val a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
