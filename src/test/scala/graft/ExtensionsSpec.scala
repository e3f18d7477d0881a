package graft

import graft.functions.TextFunctions._
import graft.ops.Relational
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("GraftExtensions registers SQL functions matching the Column API") {
    // getOrCreate would reuse the shared session and skip builder
    // extensions, so register on an isolated session directly
    val s3 = spark.newSession()
    GraftExtensions.register(s3)
    val row = s3.sql(
        """SELECT graft_hash32('hello world') AS h,
          |       graft_simhash32(array(graft_hash32('tok'))) AS sh,
          |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       graft_minhash(array(CAST(7 AS BIGINT)), 4) AS mh,
          |       graft_shingles(array('a','b','c'), 2) AS sg
          |""".stripMargin).head
    assert(row.getLong(0) == 1589001147L)
    assert(row.getLong(1) == 1622020974L) // simhash(single hash) == hash32('tok')
    assert(row.getDouble(2) == 11.0)
    assert(row.getSeq[Long](3).length == 4)
    assert(row.getSeq[String](4) == Seq("a b", "b c"))
  }

  test("wrong arity / argument types raise AnalysisException, not internal errors") {
    val s4 = spark.newSession()
    GraftExtensions.register(s4)
    import org.apache.spark.sql.AnalysisException

    // arity: graft_shingles needs (array, n)
    val e1 = intercept[AnalysisException](s4.sql("SELECT graft_shingles(array('a'))").collect())
    assert(e1.getCondition != null && e1.getCondition.startsWith("WRONG_NUM_ARGS"))
    val e2 = intercept[AnalysisException](s4.sql("SELECT graft_hash32('a', 'b')").collect())
    assert(e2.getCondition.startsWith("WRONG_NUM_ARGS"))

    // non-literal int parameter
    val e3 = intercept[AnalysisException](
      s4.sql("SELECT graft_minhash(array(CAST(1 AS BIGINT)), CAST(rand()*4 AS INT))").collect())
    assert(e3.getCondition == "NON_FOLDABLE_ARGUMENT")

    // type mismatch: int where a string is expected
    val e4 = intercept[AnalysisException](s4.sql("SELECT graft_hash32(42)").collect())
    assert(e4.getCondition.startsWith("DATATYPE_MISMATCH"))
    // array<int> where array<bigint> is expected
    val e5 = intercept[AnalysisException](s4.sql("SELECT graft_simhash32(array(1, 2))").collect())
    assert(e5.getCondition.startsWith("DATATYPE_MISMATCH"))
  }

  test("pure-SQL minhash LSH pipeline matches the DataFrame path") {
    // the "SQL-only user" story: the whole candidate-pair pipeline written
    // in spark.sql with graft_* functions must produce the same pairs as
    // the Column-API composition over the real corpus
    val s5 = spark.newSession()
    GraftExtensions.register(s5)
    s5.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val viaSql = s5.sql(
      """WITH sig AS (
        |  SELECT doc_id,
        |         graft_minhash(graft_shingle_hashes(
        |           filter(split(lower(text), '[^a-z0-9]+'), x -> x != ''), 3), 16) AS sig
        |  FROM docs),
        |banded AS (
        |  SELECT doc_id, b.band,
        |         array_join(slice(sig, b.band * 4 + 1, 4), ',') AS bkey
        |  FROM sig LATERAL VIEW explode(transform(sequence(0, 3),
        |    i -> named_struct('band', i))) AS b)
        |SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
        |FROM banded a JOIN banded c
        |  ON a.band = c.band AND a.bkey = c.bkey AND a.doc_id < c.doc_id
        |""".stripMargin)
      .as[(Long, Long)].collect().toSet

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sig = docs.select(col("doc_id"),
      minhashSignature(shingleHashes(tokens(col("text")), 3), 16).as("sig"))
    val banded = sig.select(col("doc_id"),
        graft.ops.Dedup.lshBands(col("sig"), 4, 4).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val viaDf = graft.ops.Dedup.candidatePairs(banded, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(viaSql == viaDf)
    assert(viaSql.nonEmpty)
  }

  test("GraftSession.create yields a session with the SQL surface ready") {
    // an existing session means builder extensions are skipped (Spark
    // semantics) — create() must still end with the functions registered
    val s = GraftSession.create("graft-test")
    try {
      assert(s.sql("SELECT graft_hash32('x') AS h").head().getLong(0) != 0L)
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true") // Spark 4 default kept
      // live-session path also arms the optimizer rules
      assert(s.experimental.extraOptimizations.contains(graft.plans.RewriteKeepFirst))
    } finally {
      // the shared spec session must not keep the rewrite rule: other
      // suites compute window-form expectations that the rule would
      // silently turn into the aggregate plan (vacuous comparisons)
      s.experimental.extraOptimizations = s.experimental.extraOptimizations
        .filterNot(_ == graft.plans.RewriteKeepFirst)
    }
  }

  test("GraftSession.create with a warehouse arms the graft catalog end-to-end") {
    spark.version // materialize the shared session so create() joins it
    val wh = java.nio.file.Files.createTempDirectory("graft_session_wh").toFile
    wh.deleteOnExit()
    val s = GraftSession.create("graft-test", warehouse = Some(wh.getAbsolutePath))
    try {
      s.sql("CREATE TABLE graft.ns.t (id BIGINT, k STRING)")
      s.sql("INSERT INTO graft.ns.t VALUES (1, 'a'), (2, 'b')")
      assert(s.sql("SELECT count(*) FROM graft.ns.t").head().getLong(0) == 2L)
      assert(s.sql("SELECT count(*) FROM graft.ns.t VERSION AS OF 1")
        .head().getLong(0) == 0L) // the empty CREATE commit
      s.sql("DROP TABLE graft.ns.t")
      // re-wiring a live session to a DIFFERENT warehouse cannot take
      // effect (Spark caches catalog instances) and must refuse loudly
      val err = intercept[IllegalStateException] {
        GraftSession.create("graft-test", warehouse = Some("/other/wh"))
      }
      assert(err.getMessage.contains("already wired"))
    } finally {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations
        .filterNot(_ == graft.plans.RewriteKeepFirst)
      s.conf.unset("spark.sql.catalog.graft")
      s.conf.unset("spark.sql.catalog.graft.warehouse")
    }
  }

  test("saltedSum equals plain groupBy sum") {
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .as[(Int, Long)].collect().toSet
    val salted = Relational.saltedSum(Seq("k"), Seq("v" -> "s"), 8)(df)
      .as[(Int, Long)].collect().toSet
    assert(salted == plain)
  }

  test("table-valued functions: graft_table_changes and graft_history in pure SQL") {
    import graft.io.Versioned
    val root = java.nio.file.Files.createTempDirectory("graft_tvf").toFile
    root.deleteOnExit()
    val p = root.getAbsolutePath
    Versioned.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), p)
    Versioned.commit(spark, Seq((3L, "c")).toDF("id", "v"), p)
    Versioned.deleteWhere(spark, p, col("id") === 1L)
    val s = spark.newSession()
    GraftExtensions.register(s)
    val changes = s.sql(s"SELECT id, _change FROM graft_table_changes('$p', 1)")
      .as[(Long, String)].collect().toSet
    assert(changes == Set((3L, "insert"), (1L, "delete")), s"got $changes")
    val windowed = s.sql(s"SELECT id, _change FROM graft_table_changes('$p', 1, 2)")
      .as[(Long, String)].collect().toSet
    assert(windowed == Set((3L, "insert")))
    val hist = s.sql(s"SELECT version, operation FROM graft_history('$p') ORDER BY version")
      .as[(Long, String)].collect().toSeq
    assert(hist == Seq((1L, "append"), (2L, "append"), (3L, "delete")), s"got $hist")
    // keyed form classifies the window by key
    val keyed = s.sql(
      s"SELECT id, _change_type FROM graft_table_changes_keyed('$p', 1, 3, 'id')")
      .as[(Long, String)].collect().toSet
    assert(keyed == Set((3L, "insert"), (1L, "delete")), s"got $keyed")
    // non-literal args refuse with the standard error class, exactly
    val e = intercept[org.apache.spark.sql.AnalysisException](
      s.sql(s"SELECT * FROM graft_table_changes('$p', 1 + CAST(rand() AS INT))").collect())
    assert(e.getCondition.startsWith("NON_FOLDABLE_ARGUMENT"), e.getCondition)
  }

  test("saltedJoin equals plain join") {
    val left = (1 to 500).map(i => (i % 5, i)).toDF("k", "v")
    val right = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .as[(Int, Int, String)].collect().toSet
    val salted = Relational.saltedJoin(right, Seq("k"), 4)(left)
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }
}
