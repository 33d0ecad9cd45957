package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference merge tests (src/merge.rs:140-237) and the
  * perform_merge behavior tests (src/connection.rs:365-448). */
class HotdogJsonSpec extends AnyFunSuite {
  import HotdogJson._

  private def mergeStr(a: String, b: String): String =
    serialize(merge(parseOrNull(a), parseOrNull(b)))

  test("it_should_merge_array_string (merge.rs:144-149)") {
    assert(mergeStr("""["a","b"]""", """["b","c"]""") == """["a","b","c"]""")
  }

  test("it_should_merge_array_object (merge.rs:151-161)") {
    assert(mergeStr("""[{"value":"a"},{"value":"b"}]""", """[{"value":"b"},{"value":"c"}]""")
      == """[{"value":"a"},{"value":"b"},{"value":"c"}]""")
  }

  test("it_should_merge_object (merge.rs:163-173)") {
    assert(mergeStr("""{"value1":"a","value2":"b"}""", """{"value1":"a","value2":"c","value3":"d"}""")
      == """{"value1":"a","value2":"c","value3":"d"}""")
  }

  test("it_should_merge_string (merge.rs:175-180)") {
    assert(mergeStr("\"a\"", "\"b\"") == "\"b\"")
  }

  test("dedup removes only CONSECUTIVE duplicates (Vec::dedup)") {
    assert(mergeStr("""["a","b"]""", """["a","c"]""") == """["a","b","a","c"]""")
    assert(mergeStr("""["a"]""", """["a","a","b","a"]""") == """["a","b","a"]""")
  }

  test("array ⊕ object pushes then dedups") {
    assert(mergeStr("""[{"a":1}]""", """{"a":1}""") == """[{"a":1}]""")
    assert(mergeStr("""[{"a":1}]""", """{"b":2}""") == """[{"a":1},{"b":2}]""")
  }

  test("scalar ⊕ object / object ⊕ scalar: RHS overwrites") {
    assert(mergeStr("1", """{"a":1}""") == """{"a":1}""")
    assert(mergeStr("""{"a":1}""", "1") == "1")
  }

  test("nested object recursive merge + key sorting") {
    assert(mergeStr("""{"z":1,"meta":{"topic":"t"}}""", """{"meta":{"hotdog":{"v":"1"}}}""")
      == """{"meta":{"hotdog":{"v":"1"},"topic":"t"},"z":1}""")
  }

  test("merge_with_empty (connection.rs:365-377)") {
    assert(performMerge("{}", "{}") == "{}")
  }

  test("merge_with_non_object returns original buffer (connection.rs:383-395)") {
    assert(performMerge("{}", "[1]") == "{}")
  }

  test("merge_without_json_buffer errors → null (connection.rs:400-413)") {
    assert(performMerge("invalid", "{}") == null)
  }

  test("merge_with_json_buffer (connection.rs:418-430)") {
    assert(performMerge("{}", """{"hello":1}""") == """{"hello":1}""")
  }

  test("merge_with_json_buffer_and_vars (connection.rs:435-448)") {
    val t = config.parseTemplate("""{"hello":"{{name}}"}""")
    val rendered = t.renderString(Map("name" -> "world"))
    assert(performMerge("{}", rendered) == """{"hello":"world"}""")
  }

  test("serialization: compact, keys sorted, serde-style escapes") {
    assert(serialize(parseOrNull("""{ "b" : [1, 2],  "a": "x\ny" }"""))
      == "{\"a\":\"x\\ny\",\"b\":[1,2]}")
    assert(serialize(parseOrNull("""{"k":"césar"}""")) == """{"k":"césar"}""")
  }

  test("JmesPathEval over a DataFrame") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      """{"meta":{"topic":"test"}}""",
      """{"meta":{"topic":7}}""",
      """{"meta":{}}""",
      """not json""",
      """{"meta":null}""").toDF("j")
    val jm = exprs.col(JmesPathEval(
      exprs.expr(col("j")), exprs.expr(lit("meta.topic"))))
    val out = df.select(jm.getField("matched").as("m"), jm.getField("value").as("v")).collect()
    assert(out(0).getBoolean(0) && out(0).getString(1) == "test")
    assert(out(1).getBoolean(0) && out(1).isNullAt(1)) // non-string result: matched, no value
    assert(!out(2).getBoolean(0))
    assert(!out(3).getBoolean(0))
    assert(!out(4).getBoolean(0))
  }
}
