package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite

/** serde_json parity edges beyond the merge semantics: trailing-content
  * rejection, non-finite number rejection, and ryu-compatible f64
  * formatting (the reference serializes via serde_json 1.0.96 → ryu). */
class JsonParitySpec extends AnyFunSuite {
  import HotdogJson._

  test("trailing content after the document is a parse error (serde_json::from_str)") {
    assert(parseOrNull("""{"a":1} extra""") == null)
    assert(parseOrNull("""{"meta":{"topic":"x"}} tail""") == null)
    assert(parseOrNull("""[1,2] 3""") == null)
    assert(parseOrNull("1 2") == null)
    // trailing whitespace is fine
    assert(parseOrNull("""{"a":1}  """ + "\n") != null)
  }

  test("non-finite numbers are a parse error (1e999 overflows f64 in serde_json)") {
    assert(parseOrNull("1e999") == null)
    assert(parseOrNull("""{"a":1e999}""") == null)
    assert(parseOrNull("""{"a":[1,-1e999]}""") == null)
    assert(parseOrNull("""{"a":1e308}""") != null)
  }

  test("merge of a msg with trailing garbage counts as invalid json") {
    assert(performMerge("""{"a":1} tail""", "{}") == null)
  }

  test("ryu f64 formatting: plain-notation range (kk in (-5,16])") {
    assert(formatDoubleRyu(0.0) == "0.0")
    assert(formatDoubleRyu(-0.0) == "-0.0")
    assert(formatDoubleRyu(123.0) == "123.0")
    assert(formatDoubleRyu(-123.456) == "-123.456")
    assert(formatDoubleRyu(0.1) == "0.1")
    assert(formatDoubleRyu(0.0001) == "0.0001")
    assert(formatDoubleRyu(0.00001) == "0.00001") // kk=-4: still plain
    assert(formatDoubleRyu(1e15) == "1000000000000000.0") // kk=16: still plain
  }

  test("ryu f64 formatting: scientific range") {
    assert(formatDoubleRyu(1e16) == "1e16")
    assert(formatDoubleRyu(1e23) == "1e23") // NOT Java's 9.999999999999999E22
    assert(formatDoubleRyu(1e-6) == "1e-6")
    assert(formatDoubleRyu(2.5e-7) == "2.5e-7")
    assert(formatDoubleRyu(-1.2345678901234568e20) == "-1.2345678901234568e20")
  }

  test("ryu f64 formatting round-trips") {
    val vals = Seq(1.1, 3.141592653589793, 2.2250738585072014e-308,
      1.7976931348623157e308, 123456.789, 1.0 / 3.0, 6.02e23, -42.0)
    vals.foreach { v =>
      assert(java.lang.Double.parseDouble(formatDoubleRyu(v)) == v, s"roundtrip $v")
    }
  }

  test("serialized floats inside merged output use ryu form") {
    assert(serialize(parseOrNull("""{"x":1e23}""")) == """{"x":1e23}""")
    assert(serialize(parseOrNull("""{"x":0.5,"y":7}""")) == """{"x":0.5,"y":7}""")
  }
}
