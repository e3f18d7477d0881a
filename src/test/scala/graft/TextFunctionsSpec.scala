package graft

import graft.functions.TextFunctions._
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("tokens lowercases and strips non-alnum") {
    assert(one(tokens(lit("Hello, big WORLD 42!"))) ==
      Seq("hello", "big", "world", "42"))
    assert(one(tokens(lit("!!!"))) == Seq())
  }

  test("shingles produce overlapping n-grams; short input yields empty") {
    assert(one(shingles(lit(Array("a", "b", "c", "d")), 3)) == Seq("a b c", "b c d"))
    assert(one(shingles(lit(Array("a", "b")), 3)) == Seq())
  }

  test("hash32 is a positive 32-bit value and matches the md5-prefix spec") {
    // first 8 hex chars of md5("hello world") = 5eb63bbb -> 1589001147
    assert(one(hash32(lit("hello world"))) == 1589001147L)
    val h = one(hash32(lit("anything"))).asInstanceOf[Long]
    assert(h >= 0L && h < (1L << 32))
  }

  test("minhash signature has k components, all below the prime modulus") {
    val sig = one(minhashSignature(transform(tokens(lit("a b c d e f")), hash32 _), 16))
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(sig.length == 16)
    assert(sig.forall(c => c >= 0 && c < MinhashP))
  }

  test("identical texts share signatures; disjoint texts differ") {
    val df = Seq(("x y z w", "x y z w", "q r s t")).toDF("a", "b", "c")
    def sig(name: String) =
      minhashSignature(transform(shingles(tokens(col(name)), 2), hash32 _), 8)
    val r = df.select(sig("a").as("sa"), sig("b").as("sb"), sig("c").as("sc")).head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0) != r.getSeq[Long](2))
  }

  test("simhash of a single token equals that token's hash; empty is 0") {
    val h = one(hash32(lit("tok"))).asInstanceOf[Long]
    assert(one(simhash32(array(hash32(lit("tok"))))) == h)
    assert(one(simhash32(array().cast("array<bigint>"))) == 0L)
  }

  test("rollingFingerprint is order-sensitive") {
    val ab = one(rollingFingerprint(transform(tokens(lit("a b")), hash32 _)))
    val ba = one(rollingFingerprint(transform(tokens(lit("b a")), hash32 _)))
    assert(ab != ba)
  }

  test("cosine of a vector with itself is 1.0") {
    val v = typedLit(Array(0.5f, -1.5f, 2.0f))
    val c = one(cosine(dotD(v, v), normSqD(v), normSqD(v))).asInstanceOf[Double]
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("quality ratios are 0.0 (not NaN/null) for empty and punctuation-only docs") {
    import graft.ops.TextAnalysis
    val docs = Seq("", "!!! ??? ...", "the cat sat on the mat")
      .toDF("text").withColumn("t", tokens(col("text")))
    val rows = docs.select(
      TextAnalysis.avgTokenLen(col("t")).as("atl"),
      TextAnalysis.stopwordRatio(col("t")).as("swr"),
      TextAnalysis.digitTokenRatio(col("t")).as("dr"),
      TextAnalysis.punctRatio(col("text")).as("pr"),
      TextAnalysis.qualityScore(col("t"), col("text")).as("q")).collect()
    // degenerate docs: every ratio defined and finite
    rows.take(2).foreach { r =>
      (0 until 5).foreach { i =>
        val v = r.getDouble(i)
        assert(!v.isNaN && !v.isInfinite, s"col $i was $v")
      }
    }
    // a NaN would sort above any threshold; 0-pinned ratios must NOT pass
    val passed = docs.filter(
      TextAnalysis.qualityScore(col("t"), col("text")) >= 0.3).count()
    assert(passed == 1) // only the real sentence
  }

  test("jaccard and estJaccard agree on identical and disjoint sets") {
    assert(one(Dedup.jaccard(typedLit(Array("a", "b")), typedLit(Array("a", "b")))) == 1.0)
    assert(one(Dedup.jaccard(typedLit(Array("a")), typedLit(Array("b")))) == 0.0)
    assert(one(Dedup.estJaccard(typedLit(Array(1L, 2L)), typedLit(Array(1L, 3L)), 2)) == 0.5)
  }

  test("htmlToText drops script/style content, tags, and decodes entities in order") {
    def strip(s: String): String =
      spark.range(1).select(TextAnalysis.htmlToText(lit(s))).head.getString(0)
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    // script/style CONTENT goes, including tags inside strings
    assert(strip("a<script>var x = \"<p>no</p>\";</script>b") == "a b")
    assert(strip("a<STYLE>p { }</STYLE>b") == "a b") // case-insensitive
    // entity order: &amp;lt; must become the literal text "&lt;", not "<"
    assert(strip("x &amp;lt; y") == "x &lt; y")
    assert(strip("3 &lt; 4 &amp;&amp; 5 &gt; 2") == "3 < 4 && 5 > 2")
    assert(strip("a&nbsp;&quot;b&quot;&#39;c&#39;") == "a \"b\"'c'")
    // whitespace collapse + trim
    assert(strip("  <div>\n a \t b </div> ") == "a b")
  }

  test("fixMojibake repairs the classic double-encoding pairs") {
    def fix(s: String): String =
      spark.range(1).select(TextAnalysis.fixMojibake(lit(s))).head.getString(0)
    assert(fix("CafÃ© â€œquotedâ€“x") == "Café \"quoted-x")
    assert(fix("Ã¼ber seÃ±or Ã§a") == "über señor ça")
    assert(fix("plain ascii") == "plain ascii") // untouched
  }

  test("removeBoilerplateLines drops corpus-frequent lines, keeps order") {
    import spark.implicits._
    val docs = (0 until 20).map { i =>
      (i.toLong, s"prose $i\nsubscribe now\nunique tail $i")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", 0.5)
      .orderBy("doc_id").as[(Long, Long, String)].collect()
    assert(out.length == 20)
    out.foreach { case (id, n, text) =>
      assert(n == 2)
      assert(text == s"prose $id\nunique tail $id") // order preserved, boilerplate gone
    }
  }
}
