package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: all
  * pure Column compositions (codegen'd, no UDFs) so they scale to 100 TB
  * as narrow per-row projections — and every one has an exact DuckDB-SQL
  * oracle equivalent (see graft.SparkEntry.oracleSql).
  */
object TextAnalysis {

  /** lowercase + collapse whitespace — normalization used by fingerprint
    * and shingling so trivial formatting differences don't defeat dedup. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** whitespace word tokens of the normalized text */
  def words(text: Column): Column = split(normalized(text), " ")

  /** whitespace token count */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish subword-ish token count: word pieces + punctuation runs.
    * The regex subset is shared Java/RE2 so the oracle matches. */
  def tokenCountRe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** stable document fingerprint: md5 of the normalized text */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** polynomial rolling hash (Rabin-Karp style) over the normalized text's
    * codepoints: left fold acc = (acc*31 + cp) mod 1e9+7. Kept inside a
    * 31-bit modulus so the arithmetic is exactly reproducible in any
    * engine (the DuckDB oracle recomputes it with list_reduce). */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      graft.hotdog.exprs.stringToCodepoints(normalized(text)),
      lit(0L),
      (acc, c) => (acc * 31L + c.cast("long")) % 1000000007L)

  private val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "en", "que"))

  /** count of language-L stopwords among the word tokens */
  def stopwordScore(text: Column, lang: String): Column = {
    val set = Stopwords(lang)
    size(filter(words(text), w => w.isin(set: _*)))
  }

  /** n-gram-heuristic language ID: argmax of stopword scores with a
    * deterministic en>es>de>fr tie-break; 'und' (unknown) when all zero.
    *
    * One codegen kernel pass (r6): the previous when-chain over four
    * `stopwordScore` Columns re-evaluated the normalize+split+filter
    * chain up to ~10 times per row (ArrayFilter is CodegenFallback —
    * interpreted, no subexpression elimination; each score appears in
    * several branch conditions). The coalesce pins the chain's null
    * behavior exactly: a null text fell through every null-valued
    * condition to the otherwise('fr') branch. */
  def langId(text: Column): Column =
    coalesce(
      opscol.langId4(text, Array(
        Stopwords("en").toArray, Stopwords("es").toArray,
        Stopwords("de").toArray, Stopwords("fr").toArray)),
      lit("fr"))

  /** Gopher-style repetition counters: how many word trigrams are
    * duplicates of an earlier one (high ratio ⇒ boilerplate/spam; the
    * standard "repetition filter" signal in training-data pipelines).
    * Integer-valued so the cross-engine compare is float-free; consumers
    * derive dup_ratio = n_tri_dup / n_tri_total. */
  def repetitionCounters(df: DataFrame, text: Column): DataFrame = {
    val nWords = tokenCountWs(text)
    val total = when(nWords < 3, lit(1)).otherwise(nWords - 2)
    val distinctTri = size(Dedup.shingles(text, 3))
    df.withColumn("n_words", nWords)
      .withColumn("n_tri_total", total)
      .withColumn("n_tri_distinct", distinctTri)
      .withColumn("n_tri_dup", total - distinctTri)
  }

  /** Gopher-style quality-rule VERDICT (Rae et al. 2021 "Scaling Language
    * Models", table A1's document-quality heuristics — the filter set
    * RefinedWeb/Dolma/FineWeb all re-use), re-expressed as ONE narrow
    * codegen'd projection that emits every rule counter plus the
    * FIRST-failing-rule reason. Total like [[CorpusClean.cleanVerdict]]:
    * every row gets exactly one `fail_reason` ('pass' when clean) — drop
    * reasons are the observability signal a production pipeline sweeps
    * thresholds against.
    *
    * All threshold comparisons are integer cross-multiplications (never a
    * float ratio), so the DuckDB oracle is bit-exact. Word rules use the
    * normalized whitespace tokens ([[words]]); line rules use the RAW
    * text split on '\n' (normalization collapses newlines).
    *
    * Rule order (first failure wins — cheap cardinality rules first, the
    * published thresholds as defaults):
    *  1. word_count:    minWords ≤ n_words ≤ maxWords          [50, 100000]
    *  2. bullet_lines:  lines starting '- '/'* '/'•' ≤ 10%   (10n ≤ lines)
    *  3. ellipsis_lines: lines ending '...'/'…' ≤ 30%     (10n ≤ 3·lines)
    *  4. symbol_ratio:  ('#' + '...') occurrences ≤ 10% of words
    *  5. alpha_words:   words containing a letter ≥ 80%   (5n ≥ 4·words)
    *  6. mean_word_len: 3 ≤ Σ|w|/n_words ≤ 10        (3w ≤ Σ ≤ 10w)
    *  7. stop_words:    ≥ minStopHits DISTINCT words from stopList
    *
    * 100 TB shape: zero shuffle — a pure per-row projection the scan's
    * batch reader pipelines; every counter is one pass over the row's
    * own words/lines arrays. */
  def gopherVerdict(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      stopList: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Int = 2): DataFrame = {
    val text = col(textCol)
    val ws = words(text)
    val lines = split(text, "\n")
    val nWords = coalesce(size(ws), lit(0))
    val nLines = coalesce(size(lines), lit(0))
    val nBullet = coalesce(size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))),
      lit(0))
    val nEllipsis = coalesce(size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))), lit(0))
    // literal (non-regex) occurrence counts, greedy left-to-right — the
    // same non-overlapping semantics replace() has in every engine. The
    // ellipsis length-delta is always a multiple of 3, so the /3 double
    // is integer-valued and the int cast is exact in both engines.
    val nSymbols = coalesce(
      (length(text) - length(replace(text, lit("#"), lit("")))) +
        ((length(text) - length(replace(text, lit("..."), lit("")))) / 3)
          .cast("int"),
      lit(0))
    val nAlphaWords = coalesce(size(filter(ws, w => w.rlike("[a-z]"))), lit(0))
    val sumWordChars = coalesce(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)), lit(0L))
    val nStopDistinct = coalesce(
      size(array_distinct(filter(ws, w => w.isin(stopList: _*)))), lit(0))
    df.select(col(idCol),
        nWords.as("n_words"), nLines.as("n_lines"),
        nBullet.as("n_bullet_lines"), nEllipsis.as("n_ellipsis_lines"),
        nSymbols.as("n_symbols"), nAlphaWords.as("n_alpha_words"),
        sumWordChars.as("sum_word_chars"), nStopDistinct.as("n_stop_distinct"))
      .withColumn("fail_reason",
        when(col("n_words") < minWords || col("n_words") > maxWords,
          lit("word_count"))
          .when(col("n_bullet_lines") * 10 > col("n_lines"),
            lit("bullet_lines"))
          .when(col("n_ellipsis_lines") * 10 > col("n_lines") * 3,
            lit("ellipsis_lines"))
          .when(col("n_symbols") * 10 > col("n_words"), lit("symbol_ratio"))
          .when(col("n_alpha_words") * 5 < col("n_words") * 4,
            lit("alpha_words"))
          .when(col("sum_word_chars") < col("n_words") * 3L ||
            col("sum_word_chars") > col("n_words") * 10L,
            lit("mean_word_len"))
          .when(col("n_stop_distinct") < minStopHits, lit("stop_words"))
          .otherwise(lit("pass")))
  }

  /** EXACT per-group quantiles at 100 TB scale: shuffle the HISTOGRAM,
    * not the rows. groupBy(group, value).count (map-side combinable — the
    * only row-count-sized operation) → cumulative sum over the per-group
    * histogram → the q-th percentile is the least value whose cumulative
    * count reaches ceil(q·n/100), i.e. SQL's ordered-set
    * percentile_disc. The Windows here run over |group|×|distinct value|
    * histogram rows, never the corpus — for doc-length profiles that is
    * thousands of rows from 10^12 inputs. Integer order statistics, no
    * interpolation: the DuckDB oracle replays the identical cumsum
    * selection, float-free. The ceil comparison is the integer
    * cross-multiplication 100·cum ≥ q·n. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qPcts: Seq[Int]): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q > 0 && q <= 100),
      "quantile percents must be in (0, 100]")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol).as("grp"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum",
        sum("c").over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
    cum.select(col("grp"), col("v"), col("cum"), col("n"),
        explode(array(qPcts.map(lit): _*)).as("q_pct"))
      .filter(col("cum") * 100 >= col("q_pct") * col("n"))
      .groupBy(col("grp").as(groupCol), col("q_pct"))
      .agg(min(col("v")).as("value"), min(col("n")).as("n_rows"))
  }

  /** Sliding-window document chunking — the embedding/RAG preprocessing
    * shape: each doc becomes overlapping word-window chunks of `window`
    * tokens every `stride` tokens (overlap = window − stride). Emits
    * (id, chunk_ix, tok_start, n_tok, chunk_text).
    *
    * Chunk starts are every stride-aligned offset below the word count
    * (one empty chunk for an empty doc, so the operator is TOTAL per
    * doc — no document silently vanishes between pipeline stages). The
    * tail chunk is shorter than `window`; emitting it (rather than
    * padding or dropping) is the lossless contract an embedding pipeline
    * wants — every token is covered by ≥1 chunk.
    *
    * 100 TB shape: a pure per-row explode — zero shuffle, output
    * bounded by len/stride rows per doc, pipelined by the scan. */
  def chunkWords(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    df.select(col(idCol), words(col(textCol)).as("_ws"))
      .select(col(idCol), col("_ws"),
        explode(sequence(lit(0), greatest(size(col("_ws")) - 1, lit(0)),
          lit(stride))).as("tok_start"))
      .select(col(idCol),
        (col("tok_start") / stride).cast("int").as("chunk_ix"),
        col("tok_start"),
        slice(col("_ws"), col("tok_start") + 1, lit(window)).as("_chunk"))
      .select(col(idCol), col("chunk_ix"), col("tok_start"),
        size(col("_chunk")).as("n_tok"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }

  // PII patterns: the regex subset shared by Java and RE2 (no
  // backreferences/lookaround), so the DuckDB oracle replays them
  // verbatim. Ordered: emails first (an email must not first lose its
  // digits to the number pattern), then IPv4, then long digit runs
  // (card/account-like). \b is ASCII word boundary in both dialects.
  private[graft] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("idnum", "\\b\\d{13,19}\\b", "<IDNUM>"))

  /** PII scrubbing (Dolma/FineWeb-style anonymization): replace emails,
    * IPv4 addresses and long account-like digit runs with typed
    * placeholders, and report the per-type match counts (the counts feed
    * the usual "drop documents with extreme PII density" filter).
    * Narrow per-row projection — regexp_replace/regexp_count are
    * codegen'd builtins; patterns apply in a fixed order so the output
    * is deterministic when classes overlap. Output adds: text_redacted,
    * n_email, n_ipv4, n_idnum.
    */
  def redactPii(df: DataFrame, text: Column): DataFrame = {
    val redacted = PiiPatterns.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, re, tag)
    }
    PiiPatterns.foldLeft(df.withColumn("text_redacted", redacted)) {
      case (d, (name, re, _)) =>
        // count on the ORIGINAL text, sequentially masked like the
        // replace chain, so each char participates in at most one class
        d.withColumn(s"n_$name", regexp_count(maskedUpTo(text, name), lit(re)))
    }
  }

  /** `text` with every PII class BEFORE `name` (in PiiPatterns order)
    * already replaced — the counting view that matches the replace
    * chain's left-to-right precedence. */
  private def maskedUpTo(text: Column, name: String): Column =
    PiiPatterns.takeWhile(_._1 != name).foldLeft(text) {
      case (c, (_, re, tag)) => regexp_replace(c, re, tag)
    }

  /** CCNet-style line/paragraph dedup (Wenzek et al. 2020 §3.1: drop every
    * repeated paragraph, keeping the first occurrence corpus-wide): split
    * each document into lines, key each line by its normalized form, keep
    * an occurrence iff it is the globally FIRST (min (id, pos)) occurrence
    * of that key, and reassemble the surviving lines in original order.
    * Output is TOTAL — one row per input document with
    * (n_lines, n_kept, n_removed, text_clean), text_clean = "" when every
    * line was seen earlier.
    *
    * 100 TB shape: boilerplate lines ("subscribe to our newsletter")
    * appear in a large fraction of ALL documents, so anything that
    * partitions occurrences by line key is skewed by construction. The
    * first-occurrence set is therefore computed as min(struct(id, pos))
    * — a map-side-combinable aggregate that reduces a billion-copy hot
    * line to one row per input partition before its shuffle — and the
    * keep decision rejoins on the uniformly distributed (id, pos) key,
    * never on the line key; the per-document reassembly groups on id
    * (bounded by document size). No window function over the corpus.
    */
  def lineDedup(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(text, "\n")).as(Seq("pos", "line")))
    val keyed = lines.withColumn("lkey", unhex(md5(normalized(col("line")))))
    val firsts = keyed
      .groupBy("lkey")
      .agg(min(struct(col(idCol), col("pos"))).as("first"))
      .select(col(s"first.$idCol").as(idCol), col("first.pos").as("pos"))
    val kept = lines.join(firsts, Seq(idCol, "pos"), "left_semi")
    val rebuilt = kept
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("text_clean"))
    df.select(col(idCol), size(split(text, "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Character-diversity quality signal: per-document Shannon entropy
    * (nats) of the normalized text's codepoint distribution, plus total
    * and distinct codepoint counts. Near-zero entropy flags repeated-char
    * padding/spam; entropy far above a language's typical band flags
    * binary-garbage "text" — the cheap, codec-free stand-in for the
    * compression-ratio filter used by quality pipelines. One narrow
    * zero-shuffle projection: the entropy is a single codegen'd kernel
    * call per row ([[OpsKernels.charEntropy]] — the builtin route would
    * explode every character of the corpus through two shuffles).
    * Output adds: n_cp, n_distinct_cp, h_char. */
  def charEntropyStats(df: DataFrame, text: Column): DataFrame = {
    val norm = normalized(text)
    val cps = graft.hotdog.exprs.stringToCodepoints(norm)
    df.withColumn("n_cp", size(cps).cast("long"))
      .withColumn("n_distinct_cp", size(array_distinct(cps)).cast("long"))
      .withColumn("h_char", opscol.charEntropy(norm))
  }

  /** Integer-valued quality counters (ratios are left to the consumer so
    * the oracle comparison stays float-free). */
  def qualityCounters(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_chars_norm", length(normalized(text)))
      .withColumn("n_words", tokenCountWs(text))
      .withColumn("n_tokens_re", tokenCountRe(text))
      .withColumn("n_punct", size(regexp_extract_all(text, lit("[^A-Za-z0-9_\\s]"), lit(0))))
      .withColumn("n_stopwords_en", stopwordScore(text, "en"))
      .withColumn("n_upper", size(regexp_extract_all(text, lit("[A-Z]"), lit(0))))
      .withColumn("max_word_len",
        coalesce(array_max(transform(words(text), w => length(w))), lit(0)))
}
