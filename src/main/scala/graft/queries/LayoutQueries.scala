package graft.queries

import graft.Tables
import graft.ops.Bucketed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for physical-layout operators: results must be
  * layout-invariant (a bucketed table holds exactly the same rows), so each
  * query materializes the layout for real and the DuckDB oracle checks the
  * dataflow over the original parquet. The layout's *plan* effect — zero
  * Exchange on co-located joins/aggs — is asserted in BucketedSpec, where
  * session confs can be toggled safely.
  */
object LayoutQueries {

  private val D = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Write orders and customer bucketed on the join key, then join and
    * aggregate from the bucketed tables. At the design point both sides are
    * fact-scale and the bucket layout replaces the nightly re-shuffle; here
    * the oracle pins that bucketing never changes results. */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    Bucketed.writeBucketed(
      Tables.orders(spark, sfDir).withColumnRenamed("o_custkey", "custkey"),
      "graft_bq_orders", Seq("custkey"), 8)
    Bucketed.writeBucketed(
      Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "custkey"),
      "graft_bq_customer", Seq("custkey"), 8)
    spark.table("graft_bq_orders")
      .join(spark.table("graft_bq_customer"), "custkey")
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
  }

  val bucketedJoinOracle: String =
    """SELECT c_mktsegment AS segment, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2""".stripMargin

  /** Commit lineitem range-clustered on ship date with footer stats, then
    * range-scan half of 1997 through Versioned.readPruned: the manifest
    * sidecar skips the non-overlapping file OPENS (proven by file count in
    * FileStatsSpec); the oracle pins that pruning never changes rows. */
  def prunedScan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.io.Versioned
    val root = QueryScratch.freshRoot("graft_pruned_src", sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("ship_date", to_date(col("l_shipdate")))
    Versioned.commit(spark,
      li.repartitionByRange(8, col("ship_date")).sortWithinPartitions("ship_date"),
      root, statsCols = Seq("ship_date"))
    Versioned.readPruned(spark, root, "ship_date",
      Some(java.time.LocalDate.parse("1997-01-01")),
      Some(java.time.LocalDate.parse("1997-06-30")))
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
  }

  val prunedScanOracle: String =
    """SELECT l_returnflag AS flag, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-06-30'
      |GROUP BY 1""".stripMargin

  /** Z-order lineitem on (l_partkey, l_suppkey) and range-scan a band of
    * the SECOND dimension — the slice a single-column sort layout could
    * never prune (ZOrderSpec measures the file opens on both dimensions;
    * the oracle pins that the curve layout never changes rows). */
  def zorderScan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.io.Versioned
    val root = QueryScratch.freshRoot("graft_zorder_src", sfDir)
    Versioned.commitZOrdered(spark, Tables.lineitem(spark, sfDir), root,
      "l_partkey", "l_suppkey", nFiles = 8)
    // band chosen inside every scale factor's suppkey range (max is
    // 9/99/999 at sf0.001/0.01/0.1) so the check is never vacuous
    Versioned.readPruned(spark, root, "l_suppkey", Some(2L), Some(6L))
      .groupBy(col("l_linestatus").as("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(D)).cast("double").as("sum_price"))
  }

  val zorderScanOracle: String =
    """SELECT l_linestatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM lineitem WHERE l_suppkey BETWEEN 2 AND 6
      |GROUP BY 1""".stripMargin

  /** Commit orders range-clustered on o_custkey with footer stats, then
    * broadcast-join a file-backed dim filtered on a MATERIALIZED band
    * column (`grp` — correlated with the key range but opaque to constraint
    * inference, so no static pushdown can pre-prune): dynamic partition
    * pruning hands the scan the surviving custkeys at runtime and the
    * sidecar stats skip the non-matching file opens (plan + file-count
    * asserted in VersionedFormatSpec; the oracle pins the rows). */
  def dppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.io.Versioned
    val root = QueryScratch.freshRoot("graft_dpp_orders", sfDir)
    val orders = Tables.orders(spark, sfDir)
    Versioned.commit(spark,
      orders.repartitionByRange(8, col("o_custkey")).sortWithinPartitions("o_custkey"),
      root, statsCols = Seq("o_custkey"))
    val cust = Tables.customer(spark, sfDir)
    val w = math.ceil((cust.agg(max("c_custkey")).head.getLong(0) + 1) / 8.0).toLong
    val dimPath = QueryScratch.freshRoot("graft_dpp_dim", sfDir)
    cust.select(col("c_custkey"), floor(col("c_custkey") / w).cast("long").as("grp"))
      .write.parquet(dimPath)
    val fact = spark.read.format("graft-versioned").load(root)
    val dim = spark.read.parquet(dimPath).filter(col("grp") === 2L)
    fact.join(broadcast(dim), fact("o_custkey") === dim("c_custkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
  }

  val dppJoinOracle: String =
    """WITH w AS (SELECT CAST(CEIL((MAX(c_custkey)+1)/8.0) AS BIGINT) AS w FROM customer),
      |dim AS (SELECT c_custkey,
      |               CAST(FLOOR(c_custkey / (SELECT w FROM w)) AS BIGINT) AS grp
      |        FROM customer)
      |SELECT o_orderpriority AS priority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders JOIN dim ON o_custkey = c_custkey
      |WHERE grp = 2
      |GROUP BY 1""".stripMargin

  /** Bloom-sidecar point lookup: orders hash-spread across 8 files (every
    * file's o_orderkey [min,max] spans ~the whole domain, so range stats
    * prune NOTHING — the unclustered high-cardinality key shape), committed
    * with bloomCols; an IN point-lookup then opens only the files whose
    * bloom can contain a candidate (file-count asserted in BloomPruneSpec;
    * the oracle pins the rows). */
  def bloomScan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.io.Versioned
    val root = QueryScratch.freshRoot("graft_bloom_src", sfDir)
    Versioned.commit(spark,
      Tables.orders(spark, sfDir).repartition(8, col("o_orderkey")),
      root, statsCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
    spark.read.format("graft-versioned").load(root)
      .filter(col("o_orderkey").isin(1L, 2L, 3L, 5L, 7L))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
  }

  val bloomScanOracle: String =
    """SELECT o_orderstatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey IN (1, 2, 3, 5, 7)
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_join" -> (bucketedJoin _),
    "pruned_scan" -> (prunedScan _),
    "zorder_scan" -> (zorderScan _),
    "zorder_scan3" -> (zorderScan3 _),
    "dpp_join" -> (dppJoin _),
    "bloom_scan" -> (bloomScan _),
  )

  /** 3-dimensional Z-order layout: lineitem clustered on the Morton curve
    * of (l_partkey, l_suppkey, l_orderkey), then a band read on the
    * MIDDLE dimension — the multi-predicate workload shape the N-dim
    * generalization exists for (file-open pruning on each single
    * dimension is asserted in ZOrderSpec; the oracle pins the rows). */
  def zorderScan3(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.io.Versioned
    val root = QueryScratch.freshRoot("graft_zorder3_src", sfDir)
    Versioned.commitZOrderedN(spark, Tables.lineitem(spark, sfDir), root,
      Seq("l_partkey", "l_suppkey", "l_orderkey"), nFiles = 8)
    Versioned.readPruned(spark, root, "l_suppkey", Some(2L), Some(6L))
      .groupBy(col("l_linestatus").as("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(D)).cast("double").as("sum_price"))
  }

  val zorderScan3Oracle: String = zorderScanOracle

  def oracles: Map[String, String] = Map(
    "bucketed_join" -> bucketedJoinOracle,
    "pruned_scan" -> prunedScanOracle,
    "zorder_scan" -> zorderScanOracle,
    "zorder_scan3" -> zorderScan3Oracle,
    "dpp_join" -> dppJoinOracle,
    "bloom_scan" -> bloomScanOracle,
  )
}
