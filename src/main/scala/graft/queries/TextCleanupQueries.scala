package graft.queries

import graft.Tables
import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked twins for the corpus-cleanup kernels (north star
  * surface): the documents fixture carries plain prose, so each query
  * DETERMINISTICALLY synthesizes the dirty input from it (HTML wrapping,
  * mojibake injection, boilerplate lines keyed on doc_id) — the same
  * trick the media queries play with synthesized PNG/WAV payloads — and
  * DuckDB reproduces both the synthesis and the cleanup with the same
  * RE2-safe regexes / literal replaces, proving the kernels
  * engine-equivalent end to end.
  */
object TextCleanupQueries {

  /** Wrap each document in deliberately messy HTML (style + script
    * blocks, entities, tags), then strip it back to text. The cleaned
    * output must round-trip the original words plus the decoded entity
    * fragment. */
  def htmlStrip(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val html = concat(
      lit("<html><head><title>t</title><style>p { color: red; }</style></head>"),
      lit("<body onload=\"init()\"><h1>Doc &#39;"), col("doc_id"), lit("&#39;</h1><p>"),
      col("text"),
      lit("</p><div class=\"x\">3 &lt; 4 &amp;&amp; 5 &gt; 2</div>"),
      lit("<script type=\"text/javascript\">var x = \"<p>not text</p>\";</script>"),
      lit("</body></html>"))
    docs.select(col("doc_id"),
      TextAnalysis.htmlToText(html).as("clean"))
      .withColumn("n_chars", length(col("clean")).cast("long"))
  }

  val htmlStripOracle: String =
    """WITH built AS (
      |  SELECT doc_id,
      |         '<html><head><title>t</title><style>p { color: red; }</style></head>'
      |         || '<body onload="init()"><h1>Doc &#39;' || doc_id || '&#39;</h1><p>'
      |         || text
      |         || '</p><div class="x">3 &lt; 4 &amp;&amp; 5 &gt; 2</div>'
      |         || '<script type="text/javascript">var x = "<p>not text</p>";</script>'
      |         || '</body></html>' AS h
      |  FROM documents
      |), stripped AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(h, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |          '<[^>]+>', ' ', 'g'),
      |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |        '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
      |      '\s+', ' ', 'g')) AS clean
      |  FROM built
      |)
      |SELECT doc_id, clean, CAST(len(clean) AS BIGINT) AS n_chars
      |FROM stripped""".stripMargin

  /** Inject the classic double-encoding artifacts around each document,
    * then repair them: the fixed text must equal the plain injection. */
  def mojibakeFix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val dirty = concat(lit("CafÃ© â€œquotedâ€“dash Ã¼ber "), col("text"),
      lit(" naÃ¯ve?"), lit(" seÃ±or Ã§a"))
    docs.select(col("doc_id"),
      TextAnalysis.fixMojibake(dirty).as("fixed"))
      .withColumn("n_chars", length(col("fixed")).cast("long"))
  }

  val mojibakeFixOracle: String = {
    val chain = TextAnalysis.mojibakePairs.foldLeft("dirty") {
      case (acc, (from, to)) =>
        val f = from.replace("'", "''")
        val t = to.replace("'", "''")
        s"replace($acc, '$f', '$t')"
    }
    s"""WITH built AS (
       |  SELECT doc_id,
       |         'CafÃ© â€œquotedâ€“dash Ã¼ber ' || text || ' naÃ¯ve?' || ' seÃ±or Ã§a' AS dirty
       |  FROM documents
       |), fixed AS (
       |  SELECT doc_id, $chain AS fixed FROM built
       |)
       |SELECT doc_id, fixed, CAST(len(fixed) AS BIGINT) AS n_chars
       |FROM fixed""".stripMargin
  }

  /** Append shared boilerplate lines (newsletter plea for even ids,
    * cookie banner for ids % 3) and one unique line per document, then
    * remove every line appearing in > 5% of documents corpus-wide. The
    * boilerplate must go, the prose and unique lines must survive in
    * order. */
  def boilerplateRemoval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val built = docs.select(col("doc_id"), concat(
      col("text"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        lit("\nsubscribe to our newsletter")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("\naccept all cookies")).otherwise(lit("")),
      lit("\nuid "), col("doc_id")).as("text"))
    TextAnalysis.removeBoilerplateLines(built, "doc_id", "text", 0.05)
      .select(col("doc_id"), col("n_lines"), col("text").as("text_out"))
  }

  val boilerplateRemovalOracle: String =
    """WITH built AS (
      |  SELECT doc_id,
      |         text
      |         || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'subscribe to our newsletter' ELSE '' END
      |         || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'accept all cookies' ELSE '' END
      |         || chr(10) || 'uid ' || doc_id AS text
      |  FROM documents
      |), lines AS (
      |  -- 10000 comfortably exceeds any fixture doc's line count (the
      |  -- engine side has no cap; a low bound here would silently
      |  -- truncate long documents out of the oracle)
      |  SELECT doc_id, i AS idx,
      |         string_split(text, chr(10))[i] AS line
      |  FROM built, range(1, 10000) t(i)
      |  WHERE i <= len(string_split(text, chr(10)))
      |), boiler AS (
      |  SELECT trim(line) AS key
      |  FROM lines GROUP BY 1
      |  HAVING COUNT(DISTINCT doc_id) > (SELECT COUNT(*) FROM documents) * 0.05
      |), kept AS (
      |  SELECT l.doc_id, l.idx, l.line
      |  FROM lines l LEFT JOIN boiler b ON trim(l.line) = b.key
      |  WHERE b.key IS NULL
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |       string_agg(line, chr(10) ORDER BY idx) AS text_out
      |FROM kept GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "html_strip" -> (htmlStrip _),
    "mojibake_fix" -> (mojibakeFix _),
    "boilerplate_removal" -> (boilerplateRemoval _),
  )

  val oracles: Map[String, String] = Map(
    "html_strip" -> htmlStripOracle,
    "mojibake_fix" -> mojibakeFixOracle,
    "boilerplate_removal" -> boilerplateRemovalOracle,
  )
}
