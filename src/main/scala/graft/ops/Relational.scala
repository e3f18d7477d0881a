package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators mirroring the reference's dataflow surface
  * (SURVEY.md §2), written shuffle-aware for the 100 TB design point:
  * every op is a pure DataFrame => DataFrame transform composable via
  * Dataset.transform, aggregations are partial+final hash aggs, small sides
  * of joins are broadcast by the caller.
  */
object Relational {

  /** D2 keep-last dedup (pipelines/etl_zmmidr_oun.py:72-76). The reference
    * relies on file/row order; distributed execution needs an explicit order,
    * so callers pass the ordering columns that define "last".
    * One shuffle on `keys`; window + filter stays in a single stage.
    */
  def dedupKeepLast(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** D1 keep-first dedup with deterministic ordering. */
  def dedupKeepFirst(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** D3 duplicate detection: keys occurring more than once, with counts
    * (pipelines/etl_zmmidr_oun.py:72-75). */
  def duplicateKeys(keys: Seq[String])(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** J4 anti-join new-key detection (pipelines/etl_zmachk.py:113-117).
    * `existing` is expected to be small relative to batch -> broadcast it. */
  def antiJoinNewKeys(existing: DataFrame, keys: Seq[String])(batch: DataFrame): DataFrame =
    batch.join(broadcast(existing.select(keys.map(col): _*).distinct()), keys, "left_anti")

  /** J2 full-outer merge of two keyed measure streams with COALESCE'd keys
    * and zero-filled measures (pipelines/etl_weekly_sales.py:38-49).
    * Using-columns join coalesces the keys; measures are zero-filled here.
    * Both sides shuffle on the same keys -> single exchange each, and AQE
    * turns this into a broadcast join when one side is small.
    */
  def coalescedFullOuterMerge(keys: Seq[String], zeroFill: Seq[String])(
      left: DataFrame, right: DataFrame): DataFrame = {
    val joined = left.join(right, keys, "full_outer")
    zeroFill.foldLeft(joined)((d, m) =>
      d.withColumn(m, coalesce(col(m), lit(0).cast(d.schema(m).dataType))))
  }

  /** A2 regional rollup (pipelines/etl_zmmidr_oun.py:142-170): per region,
    * filter member sites, aggregate per article, stamp the region label,
    * union regions. Single pass: membership map joined in, then one
    * groupBy(region, article) — avoids one shuffle per region at scale. */
  def regionRollup(
      siteCol: String,
      regions: Map[String, Seq[String]],
      groupKey: String,
      aggs: Seq[Column])(df: DataFrame): DataFrame = {
    val membership = regions.toSeq.flatMap { case (label, sites) =>
      sites.map(s => (s, label))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val memDf = membership.toDF(siteCol, "region")
    df.join(broadcast(memDf), Seq(siteCol), "inner")
      .groupBy(col("region"), col(groupKey))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** A5 conditional aggregates (pipelines/etl_StoreRP.py:126-134):
    * COUNT(CASE WHEN pred THEN 1 END), AVG(CASE WHEN pred THEN x END). */
  def countWhere(pred: Column): Column = count(when(pred, 1))
  def avgWhere(pred: Column, value: Column): Column = avg(when(pred, value))

  /** 2.7 bag union by name over any number of inputs. */
  def unionAllByName(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** 2.6 "latest snapshot" selection, date-agnostic variant
    * (pipelines/etl_StoreRP.py:137-149). */
  def latestSnapshot(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame =
    dedupKeepLast(keys, order)(df)
}
