package graft

import graft.functions.GraftExpressions.topKBy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `graft_topk` (bounded-heap top-k-per-group) must return exactly the
  * rows and order of the window row_number pattern it replaces — including
  * score ties, groups smaller than k, null inputs, and merges across many
  * partitions (the map-side-partial path the scale argument rests on).
  */
class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  // Deterministic synthetic data with deliberate score ties: score depends
  // on id mod 7 so each group has ~3 ids per score value.
  private def longData: DataFrame =
    spark.range(0, 2000).select(
      (col("id") % 8).as("g"),
      col("id").as("id"),
      ((col("id") % 7).cast("double") / 7.0).as("s"))

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "s", "rank")
  }

  private def aggTopK(df: DataFrame, k: Int): DataFrame =
    df.groupBy(col("g")).agg(topKBy(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("id"), col("col.score").as("s"),
        (col("pos") + 1).cast("int").as("rank"))

  test("long ids: agg == window, ties broken by id asc") {
    val a = aggTopK(longData, 5).collect().toSet
    val w = windowTopK(longData, 5).collect().toSet
    assert(a == w)
    assert(a.nonEmpty)
  }

  test("merge across many partitions is exact") {
    val scattered = longData.repartition(37)
    val a = aggTopK(scattered, 5).collect().toSet
    val w = windowTopK(longData, 5).collect().toSet
    assert(a == w)
  }

  test("k larger than group size returns whole group, best-first") {
    val df = Seq((1L, 10L, 0.3), (1L, 11L, 0.9), (1L, 12L, 0.9))
      .toDF("g", "id", "s")
    val rows = aggTopK(df, 100).orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(11L, 12L, 10L))
    assert(rows.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("null score or id rows are ignored") {
    val df = Seq((1L, Some(10L), Some(0.5)), (1L, None, Some(9.9)),
      (1L, Some(11L), None), (1L, Some(12L), Some(0.7)))
      .toDF("g", "id", "s")
    val rows = aggTopK(df, 2).orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(12L, 10L))
  }

  test("string ids: binary tie-break matches window ORDER BY token") {
    val df = Seq((1L, "beta", 1.0), (1L, "alpha", 1.0), (1L, "gamma", 1.0),
      (1L, "delta", 2.0), (2L, "zz", 0.5), (2L, "aa", 0.5))
      .toDF("g", "tok", "s")
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("tok"))
    val win = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("g", "tok", "s", "rank").collect().toSet
    val agg = df.groupBy(col("g")).agg(topKBy(col("s"), col("tok"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("tok"), col("col.score").as("s"),
        (col("pos") + 1).cast("int").as("rank")).collect().toSet
    assert(agg == win)
  }

  test("duplicate (score, id) pairs are distinct contenders, like row_number") {
    val df = Seq((1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 11L, 0.5), (1L, 12L, 0.4))
      .toDF("g", "id", "s")
    val rows = aggTopK(df, 3).orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 10L, 11L))
  }

  test("SQL registration: graft_topk works and validates arity") {
    GraftExtensions.register(spark)
    longData.createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      "SELECT g, graft_topk(s, id, 3) AS top FROM topk_in GROUP BY g")
      .collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getSeq[Any](1).size == 3))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_topk(s) FROM topk_in")
    }
    assert(err.getMessage.toLowerCase.contains("graft_topk"))
  }

  test("type validation: non-double score rejected at analysis") {
    GraftExtensions.register(spark)
    longData.createOrReplaceTempView("topk_in2")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT g, graft_topk(id, id, 3) FROM topk_in2 GROUP BY g").collect()
    }
    assert(err.getMessage.contains("DOUBLE") || err.getMessage.contains("graft_topk"))
  }

  // ----- graft_topk_rows_sorted: the MIXED-direction heap the similarity
  // rankers use (score DESC, id ASC carrying extra payload columns) -----

  import graft.functions.GraftExpressions.topKRowsSorted

  private def sortedAgg(df: DataFrame, k: Int): DataFrame =
    df.groupBy(col("g"))
      .agg(topKRowsSorted(struct(col("s"), col("id")),
        struct(col("id"), col("s"), col("extra")), k,
        ascending = Seq(false, true)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("id"), col("col.s").as("s"),
        col("col.extra").as("extra"),
        (col("pos") + 1).cast("int").as("rank"))

  private def sortedWindow(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "s", "extra", "rank")
  }

  test("topKRowsSorted == window on mixed (desc, asc) order with ties, " +
    "payload columns carried") {
    val df = longData.withColumn("extra", (col("id") * 31).cast("string"))
    for (k <- Seq(1, 3, 5, 300)) { // 300 > every group size: keep-all case
      val a = sortedAgg(df, k).collect().toSet
      val w = sortedWindow(df, k).collect().toSet
      assert(a == w && a.nonEmpty, s"diverged at k=$k")
    }
  }

  test("topKRowsSorted: NaN ranks above all reals on a desc field; " +
    "null scores sort last — both exactly as the window") {
    val rows = Seq(
      (0L, 1L, Some(Double.NaN), "nan"),
      (0L, 2L, Some(0.9), "real-hi"),
      (0L, 3L, Some(0.1), "real-lo"),
      (0L, 4L, Some(Double.NaN), "nan2"),
      (0L, 5L, Option.empty[Double], "null-s"),
      (1L, 6L, Option.empty[Double], "only-null"))
      .toDF("g", "id", "s", "extra")
    val a = sortedAgg(rows, 3).collect().toSet
    val w = sortedWindow(rows, 3).collect().toSet
    assert(a == w)
    // NaNs first (id asc between them), then reals desc, nulls last
    val g0 = sortedAgg(rows, 3).filter(col("g") === 0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(g0 == Seq(1L, 4L, 2L))
  }

  test("topKRowsSorted merges across many partitions like the window " +
    "(the map-side partial path)") {
    val df = longData.withColumn("extra", lit("x")).repartition(16)
    assert(sortedAgg(df, 4).collect().toSet ==
      sortedWindow(longData.withColumn("extra", lit("x")), 4).collect().toSet)
  }

  test("topKRowsSorted refuses direction/field mismatch and non-struct ord") {
    val df = longData.withColumn("extra", lit("x"))
    val e = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(topKRowsSorted(struct(col("s"), col("id")), struct(col("id")), 3,
          ascending = Seq(false)).as("t")).collect()
    }
    assert(e.getMessage.contains("directions") ||
      e.getMessage.toLowerCase.contains("mismatch"))
  }
}
