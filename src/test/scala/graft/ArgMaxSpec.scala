package graft

import graft.functions.GraftExpressions.{argMaxRow, argMinRow}
import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `graft_argmax`/`graft_argmin` must pick the same winner row as the
  * window row_number pattern they replace in dedupKeepLast/KeepFirst —
  * across partitioned merges, with null ordering values, and with
  * unorderable payloads (maps) that a max(struct(...)) formulation could
  * not carry.
  */
class ArgMaxSpec extends SparkSpecBase {
  import spark.implicits._

  private def data: DataFrame =
    spark.range(0, 1000).select(
      (col("id") % 11).as("k"),
      col("id").as("id"),
      (col("id") * 37 % 101).as("o"),
      concat(lit("v"), col("id")).as("v"))

  test("argmax over struct order == window keep-last") {
    val w = Window.partitionBy(col("k")).orderBy(col("o").desc, col("id").desc)
    val win = data.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select("k", "id").collect().toSet
    val agg = data.repartition(23).groupBy(col("k"))
      .agg(argMaxRow(struct(col("o"), col("id")), col("id")).as("id"))
      .select("k", "id").collect().toSet
    assert(agg == win && agg.size == 11)
  }

  test("argmin over struct order == window keep-first") {
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("id"))
    val win = data.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select("k", "id").collect().toSet
    val agg = data.repartition(23).groupBy(col("k"))
      .agg(argMinRow(struct(col("o"), col("id")), col("id")).as("id"))
      .select("k", "id").collect().toSet
    assert(agg == win)
  }

  test("null ord sorts smallest: loses argmax, wins argmin") {
    val df = Seq((1L, Some(5L), "a"), (1L, None, "b"), (1L, Some(3L), "c"))
      .toDF("k", "o", "v")
    val mx = df.groupBy("k").agg(argMaxRow(col("o"), col("v")).as("v")).collect()
    assert(mx.head.getString(1) == "a")
    val mn = df.groupBy("k").agg(argMinRow(col("o"), col("v")).as("v")).collect()
    assert(mn.head.getString(1) == "b")
  }

  test("all-null ord still yields a row (not an empty group)") {
    val df = Seq((1L, Option.empty[Long], "only")).toDF("k", "o", "v")
    val r = df.groupBy("k").agg(argMaxRow(col("o"), col("v")).as("v")).collect()
    assert(r.head.getString(1) == "only")
  }

  test("unorderable payload (map) is carried fine") {
    val df = Seq((1L, 2L, Map("x" -> 1)), (1L, 9L, Map("y" -> 2)))
      .toDF("k", "o", "m")
    val r = df.groupBy("k").agg(argMaxRow(col("o"), col("m")).as("m"))
      .select(map_keys(col("m")).getItem(0)).collect()
    assert(r.head.getString(0) == "y")
  }

  test("struct payload round-trips every column") {
    val r = data.groupBy(col("k"))
      .agg(argMaxRow(struct(col("o"), col("id")),
        struct(col("id"), col("o"), col("v"))).as("w"))
      .select(col("k"), col("w.id"), col("w.v"))
      .collect()
    assert(r.length == 11 && r.forall(row => row.getString(2) == "v" + row.getLong(1)))
  }

  test("SQL registration + unorderable ord rejected") {
    GraftExtensions.register(spark)
    data.createOrReplaceTempView("am_in")
    val rows = spark.sql(
      "SELECT k, graft_argmax(o, v) AS v FROM am_in GROUP BY k").collect()
    assert(rows.length == 11)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT k, graft_argmax(map('a', 1), v) FROM am_in GROUP BY k").collect()
    }
    assert(err.getMessage.contains("orderable") || err.getMessage.contains("graft_argmax"))
  }

  test("dedupKeepLast tolerates duplicate column names") {
    val dup = data.select(col("k"), col("id"), col("o"), col("id"))
    val r = Relational.dedupKeepLast(Seq("k"), Seq(col("o"), col("id")))(dup)
    assert(r.columns.toSeq == Seq("k", "id", "o", "id"))
    assert(r.count() == 11)
    // both duplicate columns restore the same (winning) value
    val rows = r.collect()
    assert(rows.forall(row => row.getLong(1) == row.getLong(3)))
  }

  test("plan is a hash aggregate, not window-sort") {
    val plan = Relational
      .dedupKeepLast(Seq("k"), Seq(col("o"), col("id")))(data)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }
}
