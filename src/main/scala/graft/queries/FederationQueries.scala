package graft.queries

import graft.Tables
import graft.io.Jdbc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked JDBC federation (SURVEY S5): the reference's external-
  * RDBMS dimension (pipelines/etl_weekly_sales.py:54 pulls SQL Server
  * query results into the dataflow) re-expressed as a `spark.read.jdbc`
  * join against lake facts. Embedded Derby stands in for the server; the
  * DuckDB oracle restates the same dataflow over the original parquet, so
  * the whole seed → partitioned read → pushdown → join round trip sits
  * under the rows+schema+hash gate.
  */
object FederationQueries {

  private val D = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Customer dim through an external RDBMS: seeded into Derby once per
    * call, read back range-partitioned on the key (4 slices — each task
    * its own connection, the 1000-executor shape), the account-balance
    * filter pushed to the remote engine, then broadcast-joined to the
    * parquet fact. The JDBC side stays dimension-sized by construction;
    * the fact never crosses the wire. */
  def jdbcFederation(spark: SparkSession, sfDir: String): DataFrame = {
    val url = "jdbc:derby:memory:graft_fed;create=true"
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    Jdbc.seed(url, "customer_dim",
      Seq("c_custkey" -> "BIGINT", "c_mktsegment" -> "VARCHAR(16)",
        "c_acctbal" -> "DOUBLE"), cust)
    // split bounds from a remote dimension-sized agg — no second parquet
    // scan, and exactly what a real deployment asks its DB for (null on
    // an empty dim -> degenerate single-slice bounds, still complete)
    val hiRow = Jdbc.readQuery(spark, url,
      """SELECT MAX("c_custkey") AS hi FROM customer_dim""").head()
    val hi = if (hiRow.isNullAt(0)) 2L else math.max(hiRow.getLong(0), 2L)
    val dim = Jdbc.readPartitioned(spark, url, "customer_dim",
      "c_custkey", 1L, hi, 4)
      .filter(col("c_acctbal") > 0)
    val orders = Tables.orders(spark, sfDir)
    orders.join(broadcast(dim), orders("o_custkey") === dim("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
  }

  val jdbcFederationOracle: String =
    """SELECT c_mktsegment AS segment, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_acctbal > 0
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jdbc_federation" -> (jdbcFederation _),
  )

  def oracles: Map[String, String] = Map(
    "jdbc_federation" -> jdbcFederationOracle,
  )
}
