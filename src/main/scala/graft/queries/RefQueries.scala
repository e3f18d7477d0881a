package graft.queries

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's relational surface (SURVEY.md §2-3) instantiated on the
  * driver testdata star schema (FIXTURES.md §9 mapping):
  * Article ≙ l_partkey, Site ≙ l_suppkey, Date ≙ l_shipdate,
  * Qty ≙ l_quantity, Cost ≙ l_extendedprice*(1-l_discount).
  *
  * Numeric discipline for oracle parity: sums of doubles are computed over
  * DECIMAL(18,6)-cast inputs (exact, order-independent) and cast back to
  * DOUBLE, so Spark and DuckDB produce bit-identical values regardless of
  * aggregation order. This costs nothing at scale (decimal sums are still
  * partial+final hash aggs) and removes fp nondeterminism from a
  * 1000-executor plan.
  */
object RefQueries {

  private val D = DecimalType(18, 6)

  /** Exact, order-independent sum of a double column. */
  private def dsum(c: org.apache.spark.sql.Column) = c.cast(D) match {
    case dec => sum(dec).cast(DoubleType)
  }

  /** acct week ≙ dim_Calendar AcctWk: ISO week start date
    * (J1 calendar join collapsed to its derivation; both engines'
    * date_trunc('week') is Monday-start). */
  private def acctWk(c: org.apache.spark.sql.Column) =
    date_trunc("week", c).cast(DateType)

  // ---------------------------------------------------------------------
  // §3.2 flagship: weekly sales — two pre-aggregated streams, full-outer
  // merged on (week, article, site) with COALESCE keys and zero-filled
  // measures, then a numeric site-range filter.
  // (pipelines/etl_weekly_sales.py:19-51)
  // ---------------------------------------------------------------------
  def weeklySales(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val lo = to_date(lit("1996-01-01"))
    val hi = to_date(lit("1997-12-31"))

    // ZMB51-shaped stream: qty/cost movements
    val m = li.filter(col("l_linestatus") === "F")
      .withColumn("acct_wk", acctWk(col("l_shipdate")))
      .filter(col("acct_wk").between(lo, hi))
      .groupBy(col("acct_wk"), col("l_partkey").as("article"), col("l_suppkey").as("site"))
      .agg(
        dsum(col("l_quantity")).as("qty"),
        dsum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D)).as("cost"))

    // ZSTPROMO-shaped stream: billing amounts
    val z = li.filter(col("l_returnflag") === "R")
      .withColumn("acct_wk", acctWk(col("l_shipdate")))
      .filter(col("acct_wk").between(lo, hi))
      .groupBy(col("acct_wk"), col("l_partkey").as("article"), col("l_suppkey").as("site"))
      .agg(dsum(col("l_extendedprice")).as("amt"))

    Relational.coalescedFullOuterMerge(
      Seq("acct_wk", "article", "site"), Seq("qty", "cost", "amt"))(m, z)
      .filter(col("site") % 10 < 8) // CAST(site AS INT) < 5999 analog
  }

  val weeklySalesOracle: String =
    """WITH m AS (
      |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS acct_wk,
      |         l_partkey AS article, l_suppkey AS site,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
      |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS cost
      |  FROM lineitem
      |  WHERE l_linestatus = 'F'
      |    AND CAST(date_trunc('week', l_shipdate) AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      |  GROUP BY 1, 2, 3
      |), z AS (
      |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS acct_wk,
      |         l_partkey AS article, l_suppkey AS site,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS amt
      |  FROM lineitem
      |  WHERE l_returnflag = 'R'
      |    AND CAST(date_trunc('week', l_shipdate) AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      |  GROUP BY 1, 2, 3
      |)
      |SELECT COALESCE(m.acct_wk, z.acct_wk) AS acct_wk,
      |       COALESCE(m.article, z.article) AS article,
      |       COALESCE(m.site, z.site) AS site,
      |       COALESCE(m.qty, 0) AS qty,
      |       COALESCE(m.cost, 0) AS cost,
      |       COALESCE(z.amt, 0) AS amt
      |FROM m FULL OUTER JOIN z
      |  ON m.acct_wk = z.acct_wk AND m.article = z.article AND m.site = z.site
      |WHERE COALESCE(m.site, z.site) % 10 < 8
      |""".stripMargin

  // ---------------------------------------------------------------------
  // A1: movement aggregation — groupBy(Article,Site,Date) sum qty/cost,
  // deterministic min() in place of pandas first() for the unit column
  // (pipelines/etl_zmb51.py:76-80; first() is order-dependent, min() is the
  // deterministic equivalent the oracle can reproduce).
  // ---------------------------------------------------------------------
  def movementAgg(spark: SparkSession, sfDir: String): DataFrame = {
    // Day-grain movement groups are ~1:1 with input rows (group count ≈
    // row count at any SF), so the partial aggregate reduces nothing —
    // it builds a row-count-sized hash map in the SCAN stage, which on a
    // task-starved single-row-group input runs as ONE task (2.5 s of the
    // query's 2.7 at sf0.1). Pre-pinning the grouping keys at the priced
    // width moves the whole aggregate into one explicit W-wide exchange
    // the groupBy reuses (no second shuffle; guide §2.4), and the
    // shuffled bytes are the same either way since partial states ≈
    // rows. Production-scale inputs keep the stock partial+final plan.
    val li = graft.ops.Widen.byKeys(Tables.lineitem(spark, sfDir),
      expansion = 4,
      col("l_partkey"), col("l_suppkey"), to_date(col("l_shipdate")))
    li.groupBy(
        col("l_partkey").as("article"),
        col("l_suppkey").as("site"),
        to_date(col("l_shipdate")).as("date"))
      .agg(
        dsum(-col("l_quantity")).as("quantity"),
        dsum((-col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D)).as("cost"),
        min(col("l_returnflag")).as("bun"))
  }

  val movementAggOracle: String =
    """SELECT l_partkey AS article, l_suppkey AS site,
      |       CAST(l_shipdate AS DATE) AS date,
      |       CAST(SUM(CAST(-l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS quantity,
      |       CAST(SUM(CAST(-l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS cost,
      |       MIN(l_returnflag) AS bun
      |FROM lineitem
      |GROUP BY 1, 2, 3
      |""".stripMargin

  // ---------------------------------------------------------------------
  // A1 order-faithful twin: pandas first() keeps the value from the FIRST
  // row in concat (file) order (pipelines/etl_zmb51.py:76-80). The
  // distributed restatement makes the order explicit — on real exports it
  // is (_source_file, per-file row index), as dedup_keep_last carries; on
  // the parquet testdata the generation order (l_orderkey, l_linenumber)
  // is the same total order. min_by over that single composite rank is a
  // commutative aggregate: one partial+final hash agg, deterministic at
  // any parallelism — true first() semantics without a window or sort.
  // ---------------------------------------------------------------------
  def movementAggFirst(spark: SparkSession, sfDir: String): DataFrame = {
    // same pre-pinned grouping exchange as movementAgg (see there)
    val li = graft.ops.Widen.byKeys(Tables.lineitem(spark, sfDir),
      expansion = 4,
      col("l_partkey"), col("l_suppkey"), to_date(col("l_shipdate")))
    val ord = col("l_orderkey") * lit(100L) + col("l_linenumber") // linenumber < 100
    li.groupBy(
        col("l_partkey").as("article"),
        col("l_suppkey").as("site"),
        to_date(col("l_shipdate")).as("date"))
      .agg(
        dsum(-col("l_quantity")).as("quantity"),
        dsum((-col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D)).as("cost"),
        min_by(col("l_returnflag"), ord).as("bun"))
  }

  val movementAggFirstOracle: String =
    """SELECT l_partkey AS article, l_suppkey AS site,
      |       CAST(l_shipdate AS DATE) AS date,
      |       CAST(SUM(CAST(-l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS quantity,
      |       CAST(SUM(CAST(-l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS cost,
      |       ARG_MIN(l_returnflag, l_orderkey * 100 + l_linenumber) AS bun
      |FROM lineitem
      |GROUP BY 1, 2, 3
      |""".stripMargin
}
