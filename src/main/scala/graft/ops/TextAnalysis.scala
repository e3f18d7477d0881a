package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis operators for training-data curation (north star surface):
  * language ID (marker-word heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting.
  *
  * All pure per-row projections — map-side, codegen'd, no shuffle; at
  * 100 TB these run at scan speed and feed groupBy rollups (per-source
  * token budgets etc.) that shuffle only the tiny aggregate state.
  */
object TextAnalysis {

  /** Marker-word sets for the language-ID heuristic. A real deployment
    * would use char-n-gram profiles; the operator shape (per-row score
    * columns + argmax) is identical. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"))

  /** Count of tokens contained in a fixed marker set. */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(array_intersect_count(toks, markers))

  // array_intersect would dedup; we want multiplicity, so filter instead.
  private def array_intersect_count(toks: Column, markers: Seq[String]): Column =
    filter(toks, t => markers.map(m => t === m).reduce(_ || _))

  /** Language scores + argmax prediction with fixed priority order
    * (earlier language wins ties). */
  def langScores(toks: Column): Seq[Column] =
    langMarkers.map { case (l, ms) => markerScore(toks, ms).as(s"score_$l") }

  def predictLang(en: Column, de: Column, es: Column, fr: Column): Column =
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")

  /** Stopword ratio over a fixed stopword list. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "is", "in", "it", "on", "for")

  /** Per-document quality statistics; every ratio is a single division of
    * exact integer counts, so the doubles are bit-reproducible.
    *
    * Zero-denominator guard: empty / punctuation-only docs would divide by
    * zero — and since Spark sorts NaN above every double, an unguarded NaN
    * quality would silently PASS `>=` threshold gates (round-3 ADVICE).
    * Every ratio is therefore pinned to 0.0 when its denominator is 0. */
  private def safeRatio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast(DoubleType) / den)

  def nTokens(toks: Column): Column = size(toks)

  def avgTokenLen(toks: Column): Column =
    safeRatio(aggregate(toks, lit(0L), (acc, t) => acc + length(t)), size(toks))

  def stopwordRatio(toks: Column): Column =
    safeRatio(size(filter(toks, t => stopwords.map(s => t === s).reduce(_ || _))),
      size(toks))

  def digitTokenRatio(toks: Column): Column =
    safeRatio(size(filter(toks, t => t.rlike("^[0-9]+$"))), size(toks))

  /** Non-alphanumeric, non-space character count over the raw text:
    * stripping [a-zA-Z0-9 ] leaves exactly the punctuation. (Round 4 fix:
    * the previous `length(text) - length(stripped)` counted the ALNUM
    * chars — inverted — so "low punctuation" rewarded punctuation.) */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))

  def punctRatio(text: Column): Column =
    safeRatio(punctCount(text), length(text))

  /** Composite quality score in [0,1]: favors long, stopword-bearing,
    * low-punctuation text. Fixed arithmetic shape for oracle parity. */
  def qualityScore(toks: Column, text: Column): Column =
    lit(0.4) * least(lit(1.0), size(toks).cast(DoubleType) / 200) +
      lit(0.4) * stopwordRatio(toks) +
      lit(0.2) * (lit(1.0) - punctRatio(text))

  // Gopher-style document quality rules (Rae et al. 2021, "Scaling
  // Language Models: ... Gopher", §A1.1 — public). Each rule is a
  // bit-reproducible flag over the lowercased-token list + raw text; the
  // composite gate is the AND every web-scale curation pipeline applies
  // before training. Thresholds are the paper's. -----------------------

  /** The paper's stopword list for the "contains ≥2 stopwords" rule
    * (distinct from [[stopwords]], which backs the ratio heuristic). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** `#` symbols per word — one half of the paper's symbol-to-word
    * screen (the paper thresholds EACH symbol's ratio at 0.1
    * separately, so the two ratios stay separate columns). */
  def gopherHashRatio(text: Column, toks: Column): Column =
    safeRatio((length(text) - length(translate(text, "#", "")))
      .cast(DoubleType), size(toks))

  /** Literal `...` runs per word — the other half. Runs count by length
    * delta over a non-overlapping leftmost regex erase, identical under
    * Java regex and RE2, and the /3 is exact (the delta is a multiple
    * of 3). */
  def gopherEllipsisRatio(text: Column, toks: Column): Column =
    safeRatio((length(text) - length(regexp_replace(text, "\\.\\.\\.", "")))
      .cast(DoubleType) / lit(3.0), size(toks))

  /** Fraction of lines starting with a bullet (-, *, •). */
  def gopherBulletLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    safeRatio(size(filter(lines, l => l.rlike("^\\s*[-*•]"))), size(lines))
  }

  /** Fraction of lines ending with a literal ellipsis. */
  def gopherEllipsisLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    safeRatio(size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))), size(lines))
  }

  /** Fraction of words containing at least one (lowercased) letter. */
  def gopherAlphaWordRatio(toks: Column): Column =
    safeRatio(size(filter(toks, t => t.rlike("[a-z]"))), size(toks))

  /** How many of the paper's 8 stopwords appear in the document. */
  def gopherStopwordHits(toks: Column): Column =
    gopherStopwords.map(s => when(array_contains(toks, s), 1).otherwise(0))
      .reduce(_ + _)

  /** The composite Gopher gate: word count in [50, 100k], mean word
    * length in [3, 10], hash-to-word AND ellipsis-to-word each < 0.1
    * (the paper thresholds them separately), bulleted lines < 90%,
    * ellipsis lines < 30%, alphabetic words > 80%, ≥2 stopwords. */
  def gopherPass(text: Column, toks: Column): Column =
    gopherPassAt(text, toks, minWords = 50, minStopHits = 2)

  /** The same gate with tunable floor thresholds — short-document
    * corpora (chat turns, titles) screen with lower floors; the other
    * rules keep the paper's values. */
  def gopherPassAt(text: Column, toks: Column,
                   minWords: Int, minStopHits: Int): Column =
    size(toks).between(minWords, 100000) &&
      avgTokenLen(toks).between(3.0, 10.0) &&
      (gopherHashRatio(text, toks) < 0.1) &&
      (gopherEllipsisRatio(text, toks) < 0.1) &&
      (gopherBulletLineRatio(text) < 0.9) &&
      (gopherEllipsisLineRatio(text) < 0.3) &&
      (gopherAlphaWordRatio(toks) > 0.8) &&
      (gopherStopwordHits(toks) >= minStopHits)

  /** Whitespace token count (split on runs of whitespace). */
  def whitespaceTokenCount(text: Column): Column =
    size(array_remove(split(text, "\\s+"), ""))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alnum-non-space symbols each count as one token. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Order-sensitive rolling-hash fingerprint over token hashes. */
  def fingerprint(toks: Column): Column =
    when(size(toks) === 0, lit(0L))
      .otherwise(rollingFingerprint(transform(toks, hash32 _)))

  // Curation cleaners (RE2-safe patterns: no lookahead/backrefs, so the
  // same regex runs identically under Java regex and DuckDB's RE2) -----

  /** Drop markup tags. */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]+>", " ")

  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** PII masking: emails and phone-shaped numbers replaced by tokens. */
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Count of URL-shaped substrings. */
  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0)))

  /** Full HTML-to-text: script/style blocks go first (their CONTENT is
    * not prose), then every tag, then the common entities, then
    * whitespace collapse + trim. RE2-safe — `(?is)` inline flags and
    * non-greedy spans only, no lookaround/backrefs — so DuckDB's RE2
    * `regexp_replace(..., 'g')` computes character-identical output.
    * `&amp;` decodes LAST (decoding it first would double-decode
    * `&amp;lt;` into `<`). */
  def htmlToText(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The common UTF-8-decoded-as-Latin-1 mojibake pairs, longest first
    * (`â€™` must not be half-eaten by a shorter rule). Literal
    * `replace`, no regex — identical in any engine. */
  val mojibakePairs: Seq[(String, String)] = Seq(
    "â€™" -> "'", "â€œ" -> "\"", "â€“" -> "-",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¤" -> "ä", "Ã¶" -> "ö", "Ã¼" -> "ü",
    "Ã±" -> "ñ", "Ã§" -> "ç", "Â " -> " ")

  /** Repair the classic double-encoding artifacts (UTF-8 bytes read back
    * as Latin-1): a deterministic literal-replace chain. */
  def fixMojibake(text: Column): Column =
    mojibakePairs.foldLeft(text) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }

  /** C4/RefinedWeb-style corpus-frequency boilerplate removal: a LINE
    * that appears (trimmed) in more than `maxDocFrac` of all documents is
    * boilerplate ("subscribe to our newsletter", cookie banners) and is
    * dropped from every document; surviving lines reassemble in their
    * original order. Distributed shape: one explode, one line-key
    * aggregate (countDistinct doc), one anti-join back, one grouped
    * reassembly via sort_array over (idx, line) structs — no window, no
    * driver-side text. The doc count is the only driver scalar. */
  def removeBoilerplateLines(docs: org.apache.spark.sql.DataFrame,
                             idCol: String, textCol: String,
                             maxDocFrac: Double): org.apache.spark.sql.DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac < 1, s"maxDocFrac in (0,1), got $maxDocFrac")
    val total = docs.count()
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
    val boiler = lines.groupBy(trim(col("line")).as("key"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") > lit(total * maxDocFrac))
      .select(col("key"))
    val kept = lines.join(boiler, trim(lines("line")) === boiler("key"), "left_anti")
    kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines"),
      array_join(transform(
        sort_array(collect_list(struct(col("idx"), col("line")))),
        x => x.getField("line")), "\n").as(textCol))
  }
}
