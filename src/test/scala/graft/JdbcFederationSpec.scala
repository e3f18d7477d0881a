package graft

import graft.io.Jdbc
import org.apache.spark.sql.functions._

/** JDBC federation (SURVEY S5) against embedded Derby: seeding round-trips
  * values and identifier case, the partitioned read actually produces one
  * task per range slice with complete coverage (rows OUTSIDE the bounds
  * land in the edge slices), filters/column pruning reach the remote
  * engine, and the query-pushdown shape evaluates remotely.
  */
class JdbcFederationSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_fedspec;create=true"

  private def seedDim(): Unit =
    Jdbc.seed(url, "dim",
      Seq("id" -> "BIGINT", "seg" -> "VARCHAR(8)", "bal" -> "DOUBLE"),
      (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 1.5))
        .toDF("id", "seg", "bal"))

  test("seed + readQuery round-trips rows, types, and lowercase identifiers") {
    seedDim()
    val back = Jdbc.readQuery(spark, url,
      """SELECT "id", "seg", "bal" FROM dim WHERE "id" <= 3""")
    assert(back.columns.toSeq == Seq("id", "seg", "bal"))
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "odd", 1.5), (2L, "even", 3.0), (3L, "odd", 4.5)))
  }

  test("partitioned read: one task per slice, complete even outside bounds") {
    seedDim()
    // bounds cover only [20, 80] — rows 1..19 and 81..100 must still
    // arrive via the unbounded edge slices
    val part = Jdbc.readPartitioned(spark, url, "dim", "id", 20L, 80L, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    assert(part.agg(sum($"id")).as[Long].head() == (1L to 100L).sum)
  }

  test("filter and column pruning reach the remote engine") {
    seedDim()
    val q = Jdbc.readPartitioned(spark, url, "dim", "id", 1L, 100L, 2)
      .filter($"bal" > 75.0).select("id", "seg")
    val plan = q.queryExecution.executedPlan.toString
    // "bal" must appear INSIDE the PushedFilters list — the scan always
    // prints the key (even empty), and a residual Spark-side FilterExec
    // would also mention bal, so a bare contains() check proves nothing
    assert("""PushedFilters: \[[^\]]*bal""".r.findFirstIn(plan).isDefined,
      s"expected the bal filter inside PushedFilters of the JDBC scan:\n$plan")
    assert(q.count() == 50) // bal = 1.5 * id > 75 <=> id > 50
  }
}
