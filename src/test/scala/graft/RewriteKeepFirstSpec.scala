package graft

import graft.plans.RewriteKeepFirst
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The keep-first rewrite rule must (a) fire on exactly the
  * `row_number() = 1` idiom, replacing the Window with a hash aggregate,
  * (b) preserve the result rows bit-for-bit, and (c) bail out on every
  * shape whose semantics it cannot guarantee. Expected row sets are
  * collected BEFORE the rule is added to the session, so the comparison
  * is against genuine window execution.
  */
class RewriteKeepFirstSpec extends SparkSpecBase {
  import spark.implicits._

  private def data: DataFrame =
    spark.range(0, 500).select(
      (col("id") % 7).as("k"),
      col("id").as("id"),
      (col("id") * 13 % 31).as("o"),
      concat(lit("p"), col("id") % 31).as("s"))

  private def keepFirst(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def keepLast(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc, col("id").desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def withRule[T](f: => T): T = {
    GraftExtensions.injectOptimizerRules(spark)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteKeepFirst)
  }

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("rn = 1 asc: Window replaced by hash aggregate, same rows") {
    val expected = keepFirst(data).collect().toSet
    withRule {
      val df = keepFirst(data)
      assert(planOf(df).contains("ObjectHashAggregate"), planOf(df))
      assert(!planOf(df).contains("Window"), planOf(df))
      assert(df.collect().toSet == expected)
    }
  }

  test("rn = 1 desc (keep-last): rewritten and identical") {
    val expected = keepLast(data).collect().toSet
    withRule {
      val df = keepLast(data)
      assert(!planOf(df).contains("Window"))
      assert(df.collect().toSet == expected)
    }
  }

  test("rn <= 1 and reversed literal forms also fire") {
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    withRule {
      val le = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      assert(!planOf(le).contains("Window"))
      val eq = data.withColumn("rn", row_number().over(w)).filter(lit(1) === col("rn"))
      assert(!planOf(eq).contains("Window"))
    }
  }

  test("retained rn column evaluates to 1 after rewrite") {
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    withRule {
      val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("k", "rn")
      assert(!planOf(df).contains("Window"))
      val rows = df.collect()
      assert(rows.length == 7 && rows.forall(_.getInt(1) == 1))
    }
  }

  test("SQL-surface subquery form is rewritten too") {
    GraftExtensions.register(spark)
    data.createOrReplaceTempView("rkf_in")
    val sql =
      """SELECT k, id, o FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY o, id) AS rn
        |  FROM rkf_in) WHERE rn = 1""".stripMargin
    val expected = spark.sql(sql).collect().toSet
    withRule {
      val df = spark.sql(sql)
      assert(!planOf(df).contains("Window"))
      assert(df.collect().toSet == expected)
    }
  }

  test("rn <= k rewrites to the k-heap aggregate with identical rows and ranks") {
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    def topk(n: Int) = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
    val expected5 = topk(5).collect().toSet
    withRule {
      val df = topk(5)
      assert(!planOf(df).contains("Window"), planOf(df))
      assert(planOf(df).contains("ObjectHashAggregate"))
      assert(df.collect().toSet == expected5)
    }
  }

  test("rn <= k desc keeps the k largest") {
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc, col("id").desc)
    def topk(n: Int) = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
    val expected = topk(3).collect().toSet
    withRule {
      val df = topk(3)
      assert(!planOf(df).contains("Window"))
      assert(df.collect().toSet == expected)
    }
  }

  test("groups smaller than k emit all their rows, ranks dense from 1") {
    val small = Seq((1L, 10L, 3L), (1L, 11L, 1L), (2L, 20L, 9L)).toDF("k", "id", "o")
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    withRule {
      val df = small.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      assert(!planOf(df).contains("Window"))
      val rows = df.select("k", "id", "rn").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(rows == Set((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
    }
  }

  test("null ordering values place exactly as the window defaults " +
    "(asc nulls first, desc nulls last) in both rewritten directions") {
    // ids 0/7/14/... get a NULL ord — every group holds nulls and reals
    val nullish = data.withColumn("o",
      when(col("id") % 7 === 0, lit(null).cast("long")).otherwise(col("o")))
    val wAsc = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    val wDesc = Window.partitionBy(col("k")).orderBy(col("o").desc, col("id").desc)
    def topAsc(n: Int) =
      nullish.withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= n)
    def topDesc(n: Int) =
      nullish.withColumn("rn", row_number().over(wDesc)).filter(col("rn") <= n)
    val expAsc = topAsc(3).collect().toSet
    val expDesc = topDesc(3).collect().toSet
    // sanity on the fixture itself: asc ranks nulls first, desc reals first
    assert(expAsc.exists(r => r.isNullAt(2) && r.getInt(4) == 1))
    assert(expDesc.exists(r => !r.isNullAt(2) && r.getInt(4) == 1))
    withRule {
      val a = topAsc(3)
      val d = topDesc(3)
      assert(!planOf(a).contains("Window"), planOf(a))
      assert(!planOf(d).contains("Window"), planOf(d))
      assert(a.collect().toSet == expAsc)
      assert(d.collect().toSet == expDesc)
    }
  }

  test("bails out: k > 100, mixed directions, global, NULLS override, rank()") {
    withRule {
      val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
      val big = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 101)
      assert(planOf(big).contains("Window"))

      val wm = Window.partitionBy(col("k")).orderBy(col("o").asc, col("id").desc)
      val mixed = data.withColumn("rn", row_number().over(wm)).filter(col("rn") === 1)
      assert(planOf(mixed).contains("Window"))

      val wg = Window.orderBy(col("o"), col("id"))
      val global = data.withColumn("rn", row_number().over(wg)).filter(col("rn") === 1)
      assert(planOf(global).contains("Window"))

      val wn = Window.partitionBy(col("k")).orderBy(col("o").asc_nulls_last, col("id"))
      val nulls = data.withColumn("rn", row_number().over(wn)).filter(col("rn") === 1)
      assert(planOf(nulls).contains("Window"))

      val rk = data.withColumn("rn", rank().over(w)).filter(col("rn") === 1)
      assert(planOf(rk).contains("Window"))
    }
  }

  test("rewrite handles date ordering keys and map payload columns") {
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-01-02"), Map("a" -> 1)),
      (1L, java.sql.Date.valueOf("2024-03-01"), Map("b" -> 2)),
      (2L, java.sql.Date.valueOf("2023-12-31"), Map("c" -> 3)))
      .toDF("k", "d", "m")
    val w = Window.partitionBy(col("k")).orderBy(col("d").desc)
    val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("k"), col("d"), map_keys(col("m")).getItem(0).as("mk"))
      .collect().toSet
    withRule {
      val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("k"), col("d"), map_keys(col("m")).getItem(0).as("mk"))
      assert(!planOf(got).contains("Window"))
      assert(got.collect().toSet == expected)
    }
    // and through the k>1 heap path
    withRule {
      val got2 = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .select(col("k"), col("d"), map_keys(col("m")).getItem(0).as("mk"), col("rn"))
      assert(!planOf(got2).contains("Window"))
      assert(got2.count() == 3)
    }
  }

  test("ties keep exactly one arbitrary contender, like row_number") {
    // every row in a group has the same ordering value
    val df = Seq((1L, 10L, 5L), (1L, 11L, 5L), (1L, 12L, 5L), (2L, 20L, 3L))
      .toDF("k", "id", "o")
    withRule {
      val w = Window.partitionBy(col("k")).orderBy(col("o"))
      val r = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      assert(r.groupBy("k").count().collect().forall(_.getLong(1) == 1L))
    }
  }
}
