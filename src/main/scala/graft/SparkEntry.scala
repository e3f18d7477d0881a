package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoverageQueries, EventQueries, FederationQueries, LayoutQueries, LlmQueries, MediaQueries, RefQueries, RelationalQueries, TextCleanupQueries, VersionedQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * (spark, sfDir) => DataFrame; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query (weekly sales merge, SURVEY.md §3.2) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.weeklySales(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "weekly_sales" -> (RefQueries.weeklySales _),
    "movement_agg" -> (RefQueries.movementAgg _),
    "movement_agg_first" -> (RefQueries.movementAggFirst _),
  ) ++ RelationalQueries.queries ++ LlmQueries.queries ++
    EventQueries.queries ++ MediaQueries.queries ++ CoverageQueries.queries ++
    VersionedQueries.queries ++ LayoutQueries.queries ++
    FederationQueries.queries ++ TextCleanupQueries.queries

  def oracleSql: Map[String, String] = Map(
    "weekly_sales" -> RefQueries.weeklySalesOracle,
    "movement_agg" -> RefQueries.movementAggOracle,
    "movement_agg_first" -> RefQueries.movementAggFirstOracle,
  ) ++ RelationalQueries.oracles ++ LlmQueries.oracles ++
    EventQueries.oracles ++ MediaQueries.oracles ++ CoverageQueries.oracles ++
    VersionedQueries.oracles ++ LayoutQueries.oracles ++
    FederationQueries.oracles ++ TextCleanupQueries.oracles
}
