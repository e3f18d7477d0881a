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

  test("saltedSum equals plain groupBy sum") {
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .as[(Int, Long)].collect().toSet
    val salted = Relational.saltedSum(Seq("k"), Seq("v" -> "s"), 8)(df)
      .as[(Int, Long)].collect().toSet
    assert(salted == plain)
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
