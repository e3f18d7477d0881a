package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: a builder pre-loaded with the graft
  * SQL functions and the engine's recommended scale settings, so
  * `GraftSession.create()` is all a new user needs before running any
  * query from the README.
  *
  * The confs are deliberately few — Spark 4's defaults (AQE on, skew-join
  * splitting on) are already the right call at the 100 TB design point —
  * and none override a value the caller sets afterwards on the returned
  * builder.
  */
object GraftSession {

  /** Builder with graft extensions + scale-sane settings applied.
    * `warehouse` additionally registers the versioned-table catalog as
    * `graft`, so `SELECT * FROM graft.ns.tbl [VERSION AS OF n]`, INSERT,
    * DELETE, CREATE/DROP TABLE work out of the box against
    * `<warehouse>/ns/tbl` roots. */
  def builder(appName: String = "graft",
              warehouse: Option[String] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      // partial aggregation pushdown through distinct-like plans
      .config("spark.sql.optimizer.distinctBeforeIntersect.enabled", "true")
      // parquet files split at 128 MiB — the compaction target Compact
      // uses, so post-compaction scans get one task per file
      .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      // graft_argmax/graft_topk buffers are one compact row each; the
      // 128-group default would push high-cardinality keep-last dedup
      // into sort-based aggregation, resurrecting the sort the operator
      // exists to avoid
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    warehouse.fold(b)(w => b
      .config("spark.sql.catalog.graft", classOf[graft.io.VersionedCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", w))
  }

  /** Create (or get) the session. NOTE: if a session already exists,
    * builder extensions are silently skipped by Spark — so the graft
    * functions are registered explicitly afterwards either way. The
    * catalog conf is also set on the live session, which works as long as
    * the `graft` catalog has not been RESOLVED yet (Spark caches catalog
    * instances on first use and conf changes cannot re-root them) — a
    * re-wire to a DIFFERENT warehouse after use is refused loudly rather
    * than silently serving tables from the old root. */
  def create(appName: String = "graft",
             warehouse: Option[String] = None): SparkSession = {
    val key = "spark.sql.catalog.graft.warehouse"
    // the mismatch must be checked against the LIVE session BEFORE
    // getOrCreate, which would silently copy the builder's conf over it
    warehouse.foreach { w =>
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .flatMap(_.conf.getOption(key)).filter(_ != w).foreach { existing =>
          throw new IllegalStateException(
            s"the graft catalog is already wired to warehouse $existing; " +
              "Spark caches catalog instances, so re-wiring to a different " +
              s"warehouse ($w) on a live session cannot take effect — " +
              "register a second catalog name instead")
        }
    }
    val spark = builder(appName, warehouse).getOrCreate()
    GraftExtensions.register(spark)
    GraftExtensions.injectOptimizerRules(spark)
    warehouse.foreach { w =>
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.io.VersionedCatalog].getName)
      spark.conf.set(key, w)
    }
    spark
  }
}
