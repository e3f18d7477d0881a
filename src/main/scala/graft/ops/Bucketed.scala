package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout: the shuffle you pay once at write time instead of
  * on every join/aggregate (SURVEY §2.5 J1/J3 star joins; the reference
  * re-joins the same Article/Site keys in every nightly load).
  *
  * A table written with `bucketBy(n, keys)` is hash-partitioned on disk;
  * Spark's scan then reports that partitioning, so an equi-join of two
  * tables bucketed on the join keys with the SAME bucket count — or a
  * groupBy on the bucket keys — plans with NO Exchange at all (proven in
  * BucketedSpec by plan inspection). At 100 TB that is the difference
  * between re-shuffling the fact table nightly and never shuffling it:
  * bucket count is chosen once for the key cardinality (one bucket ≈ one
  * task's worth of data), and `sortBy` additionally pre-sorts each bucket
  * file so sort-merge joins skip their sort when buckets are single-file.
  *
  * Managed-table note: bucketed layouts need catalog metadata (the bucket
  * spec lives in the table definition, not the files), hence saveAsTable
  * rather than path writes — at the design point this is the
  * metastore/catalog entry every warehouse table has anyway.
  */
object Bucketed {

  /** Write `df` as a managed bucketed table (overwriting any previous
    * definition). `buckets` should be sized so one bucket is roughly one
    * task's worth of data at the target scale; `sortCols` defaults to the
    * bucket keys so merge joins read pre-sorted runs. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    // scope: an unqualified name in the CURRENT database — a qualified
    // name would make the managed-location derivation below wrong
    require(!table.contains("."),
      s"pass an unqualified table name (got '$table'); the table is " +
        "created in the current database")
    val sorts = if (sortCols.isEmpty) bucketCols else sortCols
    val spark = df.sparkSession
    // Clearing the managed location before saveAsTable, without ever
    // deleting a directory that isn't the table's: resolve the REAL
    // location from the catalog while the table is still registered
    // (against a Hive metastore or a custom LOCATION the warehouse-derived
    // path could be an unrelated directory), and fall back to the derived
    // conventional path only when the catalog doesn't know the table —
    // the leftover-dir case, where the default in-memory catalog forgot
    // the table across JVMs while its warehouse dir persisted and would
    // block saveAsTable. Convention mirrored: <warehouse>/<t> for
    // default, <warehouse>/<db>.db/<t> otherwise, lowercased as the
    // catalog normalizes identifiers. DROP alone is not enough even for a
    // KNOWN table: an external table's files survive their DROP.
    val catalogLoc: Option[org.apache.hadoop.fs.Path] =
      if (spark.catalog.tableExists(table))
        Some(new org.apache.hadoop.fs.Path(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location))
      else None
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = catalogLoc.getOrElse {
      val db = spark.catalog.currentDatabase
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val dbDir = if (db == "default") wh
                  else new org.apache.hadoop.fs.Path(wh, s"${db.toLowerCase}.db")
      new org.apache.hadoop.fs.Path(dbDir, table.toLowerCase)
    }
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** One file per bucket: coalesce task-parallel writers first, so each
    * bucket is a single pre-sorted run and downstream sort-merge joins can
    * skip their Sort too (Spark only trusts bucket sortedness when a bucket
    * is one file). Use for dimension-scale tables; fact-scale tables keep
    * parallel writers and accept the merge-sort. */
  def writeBucketedSingleFile(df: DataFrame, table: String, bucketCols: Seq[String],
                              buckets: Int, sortCols: Seq[String] = Nil): Unit =
    writeBucketed(df.coalesce(1), table, bucketCols, buckets, sortCols)
}
