package graft.hotdog

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Load the reference's OWN config files (read-only fixtures) through our
  * loader — proves a reference user's YAML works unmodified. */
class ReferenceConfigSpec extends AnyFunSuite {
  private val refDir = "/root/reference"
  private def available = Files.exists(Paths.get(refDir))

  test("reference hotdog.yml loads and matches the embedded fixture") {
    assume(available)
    val cfg = config.load(s"$refDir/hotdog.yml")
    assert(cfg.rules.size == 3)
    assert(cfg.rules(0).regex.get.original == """^hello\s+(?P<name>\w+)?""")
    assert(cfg.rules(1).jmespathRaw.contains("meta.topic"))
    assert(cfg.rules(2).regex.get.original == ".*")
    // identical compiled form to our embedded copy
    val embedded = Configs.flagship
    assert(cfg.rules.map(_.display) == embedded.rules.map(_.display))
    assert(cfg.rules.map(_.actions.size) == embedded.rules.map(_.actions.size))
  }

  test("all reference test/configs fixtures load (or fail) as the reference does") {
    assume(available)
    config.load(s"$refDir/test/configs/single-rule-with-merge.yml")
    config.load(s"$refDir/test/configs/single-rule-with-replace.yml")
    config.load(s"$refDir/test/configs/single-rule-with-hostname-field.yml")
    assertThrows[IllegalArgumentException] {
      config.load(s"$refDir/test/configs/single-rule-with-invalid-jmespath.yml")
    }
    config.load(s"$refDir/examples/simple-plaintext/hotdog.yml")
    config.load(s"$refDir/hotdog-loadtest.yml")
  }

  test("reference example.log through test-mode matches README golden output") {
    assume(available)
    val spark = SparkSpec.spark
    val cfg = config.load(s"$refDir/hotdog.yml")
    val got = Router.testModeFile(spark, s"$refDir/example.log", cfg)
      .orderBy("line_no").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    assert(got.toList == List(
      (1L, List("Regex: ^hello\\s+(?P<name>\\w+)?", "Regex: .*")),
      (2L, List("Regex: .*")),
      (3L, List("Regex: .*")),
      (4L, List("JMESPath: meta.topic", "Regex: .*"))))
  }
}
