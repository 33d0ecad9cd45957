package graft.hotdog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-callable registration of every custom expression, so `spark.sql`
  * users get the full operator surface:
  *
  * {{{
  *   graft.hotdog.Functions.registerAll(spark)
  *   spark.sql("SELECT syslog_parse(codepoints_to_string(tokens)).msg FROM seq")
  * }}}
  */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    def reg(name: String)(b: Seq[Expression] => Expression): Unit =
      graftshim.registerFunction(spark, name, b)
    reg("codepoints_to_string")(a => CodepointsToString(a.head))
    reg("string_to_codepoints")(a => StringToCodepoints(a.head))
    reg("handlebars_escape")(a => HandlebarsEscape(a.head))
    reg("syslog_parse")(a => SyslogParse(a.head))
    reg("jmespath_eval")(a => JmesPathEval(a(0), a(1)))
    reg("json_hotdog_merge")(a => JsonHotdogMerge(a(0), a(1)))
    reg("json_valid")(a => JsonValid(a.head))
    reg("json_field_profile")(a => JsonFieldProfile(a.head))
    reg("json_hotdog_merge_in")(a => JsonHotdogMergeIn(a(0), a(1), a(2)))
    reg("simhash64")(a => graft.ops.SimHash64(a.head))
    reg("minhash_sig")(a => graft.ops.MinHashSig(a(0), a(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => other.eval(null).asInstanceOf[Number].intValue()
    }))
    reg("cosine_sim_f")(a => graft.ops.CosineSimF(a(0), a(1)))
    reg("jaccard_pct")(a => graft.ops.JaccardPct(a(0), a(1)))
    def intLit(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => other.eval(null).asInstanceOf[Number].intValue()
    }
    reg("hyperplane_sig")(a => graft.ops.HyperplaneSig(a(0), intLit(a(1))))
    reg("minhash_bands")(a => graft.ops.MinHashBands(a(0), intLit(a(1))))
    reg("word_shingles")(a => graft.ops.WordShingles(a(0), intLit(a(1))))
    // token_ngrams(tokens, n [, distinct]) — comma-joined sliding windows
    reg("token_ngrams")(a => graft.ops.TokenNgrams(a(0), intLit(a(1)),
      a.length > 2 && a(2).eval(null).asInstanceOf[Boolean]))
    // regex_captures(str, pattern, groupIdx...) — groups default to (1)
    reg("regex_captures")(a => RegexCaptures(a(0), a(1),
      if (a.length > 2) a.drop(2).map(intLit) else Seq(1)))
    // bloom_might_contain(bits array<bigint>, key_hash bigint, k)
    reg("bloom_might_contain")(a =>
      graft.ops.BloomMightContain(a(0), a(1), intLit(a(2))))
    // word_ngrams_multi(text, n) — in-order word n-grams with multiplicity
    reg("word_ngrams_multi")(a =>
      graft.ops.WordNgramsMulti(a(0), intLit(a(1))))
    // char_entropy(text) — Shannon entropy (nats) of the codepoint histogram
    reg("char_entropy")(a => graft.ops.CharEntropy(a.head))
    // token_entropy(tokens) — Shannon entropy (nats) of the token-id histogram
    reg("token_entropy")(a => graft.ops.TokenEntropy(a.head))
  }
}
