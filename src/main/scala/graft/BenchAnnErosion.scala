package graft

import org.apache.spark.sql.functions.col

/** Quantifies the prepared handle's stated ROW-GROUP trade on an eroded
  * layout — the review finding that the keep-set (file-granularity)
  * pruning cannot skip row groups inside accreted multi-cell files where
  * the direct path's pushed IN literal could. Protocol: clone the saved
  * 10⁶ codes table, append `waves` maintenance batches whose single
  * files span every cell (the sink's erosion shape), measure the narrow
  * probe through the direct search and a freshly-prepared handle at
  * each stage (pristine → eroded → recell-repaired; the FULL recell:
  * recellSmall's small-file cut would pack this fixture's ~350 KB
  * build files into one file — the layoutStats blind-spot trap), with
  * kept-files-per-probe from layoutStats alongside. The hypothesis the
  * measurement tests: at realistic maintenance-batch sizes an appended
  * file is ONE parquet row group (and unsorted big appends have
  * all-cells min/max per row group anyway), so the literal cannot
  * row-group-skip either and the trade is ~nil until a cluster-sorted
  * file exceeds the row-group size — which recellSmall converts to
  * cell-ranged files regardless.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ANN_MODEL,
  * SPARK_GRAFT_ANN_CODES (pristine pair — cloned, never mutated),
  * SPARK_GRAFT_ITERS (default 3), SPARK_GRAFT_EROSION_WAVES (default 3),
  * SPARK_GRAFT_EROSION_ROWS (vectors per wave, default 50000). */
object BenchAnnErosion {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaledata/sf50e")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_EROSION_WAVES", "3").toInt
    val waveRows = sys.env.getOrElse("SPARK_GRAFT_EROSION_ROWS", "50000").toInt
    val modelRoot = sys.env.getOrElse("SPARK_GRAFT_ANN_MODEL",
      sys.error("SPARK_GRAFT_ANN_MODEL required"))
    val pristine = sys.env.getOrElse("SPARK_GRAFT_ANN_CODES",
      sys.error("SPARK_GRAFT_ANN_CODES required"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{AnnIndex, Similarity}

    // zero-copy clone of the pristine codes table (the engine's own
    // clone primitive: manifest entries reference the source files in
    // place, appends/recell land under the clone root, the source is
    // never written) — the saved fixture pair must survive for later
    // rounds, and an O(manifest) clone beats a byte copy of 10⁶ rows
    val codesRoot = java.nio.file.Files.createTempDirectory("anncodes_erosion").toString
    new java.io.File(codesRoot).delete() // cloneTable wants a fresh root
    graft.io.Versioned.cloneTable(spark, pristine, codesRoot)

    val emb = Tables.table(spark, sfDir, "embeddings")
    val q1Sel = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("embedding"))
    val q1 = spark.createDataFrame(
      java.util.Arrays.asList(q1Sel.collect(): _*), q1Sel.schema)

    def measure(stage: String): Unit = {
      val kept = AnnIndex.layoutPoint(spark, codesRoot)
        .select("files", "kept_per_probe", "kept_bytes_per_probe",
          "total_bytes", "cells")
        .collect().head
      // volume amplification vs the ideal layout's total/nlist bytes
      // per probe — the r17 companion that reads the truth where the
      // open count reads a "perfect" 1.0 on a packed table
      val volAmp = kept.getDouble(2) * kept.getLong(4) / kept.getLong(3)
      val handle = AnnIndex.prepare(spark, modelRoot, codesRoot)
      def t(f: => Unit): Double =
        (1 to iters).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      // warm both paths (codegen, sidecar/footer caches, JIT) so the
      // mins compare layouts, not cache states — the first cut of this
      // bench warmed once and read pristine SLOWER than eroded
      (1 to 3).foreach { _ =>
        AnnIndex.search(spark, q1, modelRoot, codesRoot, k = 3, nprobe = 1)
          .queryExecution.toRdd.count()
        handle.search(q1, k = 3, nprobe = 1).queryExecution.toRdd.count()
      }
      val direct = t(AnnIndex.search(spark, q1, modelRoot, codesRoot,
        k = 3, nprobe = 1).queryExecution.toRdd.count())
      val prepped = t(handle.search(q1, k = 3, nprobe = 1)
        .queryExecution.toRdd.count())
      // the r17 local dial at a fixed right-sized cap: eligible on the
      // pristine/repaired layouts (tiny kept volume), DECLINES on the
      // eroded one (the accreted all-cells waves blow the kept bytes)
      // — the dial composes with the layout loop, whose remedy restores
      // eligibility. Timed via executeCollect (the local path
      // materializes eagerly inside search()).
      val cap = sys.env.getOrElse("SPARK_GRAFT_LOCAL_CAP",
        (2L * 1024 * 1024).toString).toLong
      val localDf = handle.search(q1, k = 3, nprobe = 1, localBytesCap = cap)
      val tookLocal = localDf.queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
      }.isEmpty
      val local = t {
        handle.search(q1, k = 3, nprobe = 1, localBytesCap = cap)
          .queryExecution.executedPlan.executeCollect()
        ()
      }
      // the r18 AUTO dial: the cap re-prices itself from THIS stage's
      // prepare-time listing (the handle above is freshly prepared per
      // stage), so erode→decline→recell→re-qualify needs no constant
      import graft.ops.PreparedAnnSearch
      val autoDf = handle.search(q1, k = 3, nprobe = 1,
        localBytesCap = PreparedAnnSearch.LocalBytesAuto)
      val autoLocal = autoDf.queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
      }.isEmpty
      val auto = t {
        handle.search(q1, k = 3, nprobe = 1,
          localBytesCap = PreparedAnnSearch.LocalBytesAuto)
          .queryExecution.executedPlan.executeCollect()
        ()
      }
      println(f"[ann-erosion] $stage%-9s files=${kept.getLong(0)}%-4d " +
        f"kept/probe=${kept.getDouble(1)}%5.2f volAmp=$volAmp%5.2f " +
        f"direct=$direct%.3f s handle=$prepped%.3f s " +
        f"local=$local%.3f s (${if (tookLocal) "local" else "fell back"}) " +
        f"auto=$auto%.3f s (cap=${handle.autoLocalBytesCap / 1024.0 / 1024}%.2f MB, " +
        f"${if (autoLocal) "local" else "fell back"})")
    }

    measure("pristine")

    // erosion: each wave appends ONE file of freshly-encoded vectors
    // spanning every cell (the maintenance sink's accretion shape),
    // ids far above the corpus
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    (0 until waves).foreach { w =>
      val late = emb.filter(col("vec_id") < waveRows)
        .select((col("vec_id") + 10000000L + w * 1000000L).as("vec_id"),
          col("embedding"))
      graft.io.Versioned.commit(spark,
        AnnIndex.encodeCodes(late, cent, book, m, dsub).coalesce(1),
        codesRoot, statsCols = Seq("vec_id", "cluster"))
      ()
    }
    measure("eroded")

    // full recell, not recellSmall: this fixture's BUILD files (~350 KB)
    // sit under any realistic small-file cut, so recellSmall would pack
    // the whole table into one file — a layout whose kept-files-per-probe
    // reads a "perfect" 1.0 while every probe reads the entire table
    // (since r17 the volAmp column above reads the truth there, and the
    // trigger/alerts fire on it — this bench prints both)
    AnnIndex.recell(spark, codesRoot)
    measure("repaired")
    spark.stop()
  }
}
