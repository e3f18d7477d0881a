package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** SQL `CALL` maintenance procedures on the versioned catalog
  * ([[graft.io.VersionedProcedures]]): history/restore/vacuum/
  * vacuum_older_than/compact/compact_small/zorder, each delegating to the
  * library core through one atomic manifest publish. Asserts results
  * (procedure output rows), effects (versions, file counts, row content),
  * named-argument + default-filling binding, and the refusal matrix
  * (unknown procedure, missing table, bad namespace).
  */
class VersionedProcedureSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_procspec_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft_proc",
      classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_proc.warehouse", d.getAbsolutePath)
    d.getAbsolutePath
  }

  /** Three single-file commits (tags a,b,c) at <wh>/ns/<name>. */
  private def build(name: String): String = {
    val root = rootOf(name)
    Seq("a", "b", "c").zipWithIndex.foreach { case (tag, i) =>
      Versioned.commit(spark,
        ((i * 100 + 1).toLong to (i * 100 + 100).toLong).map(j => (j, j * 1.0))
          .toDF("id", "x").coalesce(1),
        root, tag = Some(tag), statsCols = Seq("id"))
    }
    s"ns.$name"
  }

  private def rootOf(name: String): String =
    new java.io.File(new java.io.File(wh, "ns"), name).getAbsolutePath

  test("CALL history returns one metadata row per version") {
    val t = build("hist")
    val h = spark.sql(s"CALL graft_proc.system.history('$t')")
    assert(h.columns.toSeq == Seq("version", "committed_at", "tag",
      "num_files", "total_bytes", "files_added", "operation"))
    val rows = h.orderBy("version")
      .select("version", "tag", "num_files", "files_added", "operation")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a", 1L, 1L, "append"), (2L, "b", 2L, 1L, "append"),
      (3L, "c", 3L, 1L, "append")))
  }

  test("CALL restore rolls back as a new version; data matches the old snapshot") {
    val t = build("rest")
    val out = spark.sql(s"CALL graft_proc.system.restore('$t', 2)")
    assert(out.as[Long].collect().toSeq == Seq(4L))
    assert(spark.table(s"graft_proc.$t").count() == 200)
    // metadata-only: v3 stays time-travelable after the rollback
    assert(spark.sql(
      s"SELECT count(*) FROM graft_proc.$t VERSION AS OF 3").as[Long].head() == 300)
  }

  test("CALL vacuum with named default keeps newest only and reports removals") {
    val t = build("vac")
    val out = spark.sql(s"CALL graft_proc.system.vacuum('$t')")
    assert(out.as[Int].collect().toSeq == Seq(2))
    assert(Versioned.versions(spark, rootOf("vac")) == Seq(3L))
    assert(spark.table(s"graft_proc.$t").count() == 300)
  }

  test("CALL vacuum_older_than a future cutoff keeps only the newest version") {
    val t = build("vact")
    val out = spark.sql(
      s"CALL graft_proc.system.vacuum_older_than('$t', TIMESTAMP'2999-01-01 00:00:00')")
    assert(out.as[Int].collect().toSeq == Seq(2))
    assert(Versioned.versions(spark, rootOf("vact")) == Seq(3L))
  }

  test("CALL compact rewrites into n_files; rows and stats survive") {
    val t = build("comp")
    val out = spark.sql(
      s"CALL graft_proc.system.compact('$t', 2, sort_cols => 'id')")
    assert(out.as[Long].collect().toSeq == Seq(4L))
    assert(Versioned.snapshotFiles(spark, rootOf("comp")).size == 2)
    assert(spark.table(s"graft_proc.$t").agg(sum($"id")).as[Long].head() ==
      (1L to 300L).sum)
  }

  test("CALL compact_small bin-packs the small tail with defaults filled") {
    val t = build("csml")
    val out = spark.sql(s"CALL graft_proc.system.compact_small('$t')")
    assert(out.as[Long].collect().toSeq == Seq(4L))
    // three tiny files pack into one target-size output
    assert(Versioned.snapshotFiles(spark, rootOf("csml")).size == 1)
    assert(spark.table(s"graft_proc.$t").count() == 300)
  }

  test("CALL zorder relays out the table and keeps rows identical") {
    val t = build("zord")
    val out = spark.sql(s"CALL graft_proc.system.zorder('$t', 'id,x', 2)")
    assert(out.as[Long].collect().toSeq == Seq(4L))
    assert(Versioned.snapshotFiles(spark, rootOf("zord")).size == 2)
    assert(spark.table(s"graft_proc.$t").agg(sum($"id")).as[Long].head() ==
      (1L to 300L).sum)
  }

  // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE; our
  // named-piece message is the cause
  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("CALL detail reports snapshot metadata incl. sidecar coverage and checks") {
    val t = build("detailed") // 3 versions, statsCols = id
    val root = rootOf("detailed")
    Versioned.addConstraint(spark, root, "id_pos", "id > 0")
    Versioned.buildBlooms(spark, root, Seq("id"))
    val d = spark.sql(s"CALL graft_proc.system.detail('$t')")
    assert(d.columns.toSeq == Seq("version", "num_files", "total_bytes",
      "num_columns", "stats_columns", "bloom_columns", "num_constraints",
      "num_deletion_vectors", "dv_deleted_rows", "column_mapping",
      "max_field_id", "dropped_names", "stats_dead_names"))
    val r = d.collect()(0)
    assert(r.getLong(0) == 4L)       // 3 commits + constraint commit
    assert(r.getLong(1) == 3L)       // three single-file batches
    assert(r.getLong(2) > 0L)
    assert(r.getInt(3) == 2)         // id, x
    assert(r.getString(4) == "id")   // stats-tracked
    assert(r.getString(5) == "id")   // bloom-tracked (retrofit)
    assert(r.getInt(6) == 1)         // one constraint
    assert(r.getBoolean(9))          // catalog tables are mapped
    assert(r.getLong(10) == 2L)      // ids 1..2 (id, x)
    assert(r.getString(11) == "" && r.getString(12) == "")
    // a drop on the mapped table surfaces in the guard columns
    Versioned.dropConstraint(spark, root, "id_pos")
    Versioned.dropColumns(spark, root, Seq("x"))
    val r2 = spark.sql(s"CALL graft_proc.system.detail('$t')").collect()(0)
    assert(r2.getString(11) == "")     // mapped: no tombstones
    assert(r2.getString(12) == "x")    // but the name's stats are dead
    assert(r2.getLong(10) == 2L)       // high-water keeps the retired id
  }

  test("CALL bloom retrofits point-lookup pruning onto an existing table") {
    val t = build("bloomed") // committed WITHOUT bloomCols
    val root = rootOf("bloomed")
    val before = spark.read.format("graft-versioned").load(root)
      .filter(org.apache.spark.sql.functions.col("id") === 150L)
    assert(before.count() == 1)
    val out = spark.sql(s"CALL graft_proc.system.bloom('$t', 'id')")
    assert(out.columns.toSeq == Seq("files_bloomed"))
    assert(out.as[Long].head() == 3L)
    // a fresh load consults the new blooms; results unchanged, and the
    // sidecars exist in every batch dir
    val after = spark.read.format("graft-versioned").load(root)
      .filter(org.apache.spark.sql.functions.col("id") === 150L)
    assert(after.count() == 1)
    (1 to 3).foreach { b =>
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val side = graft.io.FileStats.readBloomSidecar(f,
        new org.apache.hadoop.fs.Path(root, s"data/b$b"))
      assert(side.nonEmpty && side.values.forall(_.contains("id")))
    }
    // float columns stay refused through the procedure too
    val e = intercept[Exception](spark.sql(s"CALL graft_proc.system.bloom('$t', 'x')"))
    assert(e.getMessage.contains("float/double"))
  }

  test("CALL stats retrofits footer min/max pruning onto an existing table") {
    // build WITHOUT statsCols: nothing prunes until the retrofit
    val root = rootOf("stated")
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { r =>
      Versioned.commit(spark, r.toDF("id").coalesce(1), root)
    }
    assert(Versioned.readPruned(spark, root, "id", Some(150L), Some(160L))
      .inputFiles.length == 3) // no stats yet: every file kept
    val out = spark.sql(s"CALL graft_proc.system.stats('ns.stated', 'id')")
    assert(out.columns.toSeq == Seq("files_processed"))
    assert(out.as[Long].head() == 3L)
    val pruned = Versioned.readPruned(spark, root, "id", Some(150L), Some(160L))
    assert(pruned.inputFiles.length == 1, "retrofitted stats must prune file opens")
    assert(pruned.as[Long].collect().toSet == (150L to 160L).toSet)
    // absent column refused
    val e = intercept[Exception](
      spark.sql(s"CALL graft_proc.system.stats('ns.stated', 'nope')"))
    assert(e.getMessage.contains("statsCols not in"))
  }

  test("CALL dv_delete + dv_materialize run the merge-on-read delete lifecycle") {
    val t = build("dvproc")
    val root = rootOf("dvproc")
    // vector the table by statement: no data file rewritten
    val filesBefore = manifestOf(root, 3L)
    val v = spark.sql(s"CALL graft_proc.system.dv_delete('$t', 'id % 10 = 0')")
      .as[Long].head()
    assert(v == 4L)
    assert(manifestOf(root, 4L) == filesBefore)
    assert(Versioned.read(spark, root).count() == 270)
    // detail reports the vectors; the SQL scan is gated until materialize
    val d = spark.sql(s"CALL graft_proc.system.detail('$t')").collect()(0)
    assert(d.getLong(7) == 3L && d.getLong(8) == 30L)
    val e = intercept[Exception](spark.table(s"graft_proc.$t").count())
    assert(chain(e).contains("deletion vectors"))
    // thresholded pass first: every band is exactly 10% dead, so a 0.5
    // threshold rewrites nothing (same version back, vectors intact)
    assert(spark.sql(s"CALL graft_proc.system.dv_materialize('$t', 0.5)")
      .as[Long].head() == 4L)
    assert(Versioned.dvEntries(spark, root).size == 3)
    // a threshold at/below the dead fraction folds them all
    val v2 = spark.sql(s"CALL graft_proc.system.dv_materialize('$t', 0.05)")
      .as[Long].head()
    assert(v2 == 5L)
    assert(Versioned.dvEntries(spark, root).isEmpty)
    assert(spark.table(s"graft_proc.$t").count() == 270)
    // metadata-only count, current and time-travel
    assert(spark.sql(s"CALL graft_proc.system.row_count('$t')")
      .as[Long].head() == 270L)
    assert(spark.sql(s"CALL graft_proc.system.row_count('$t', 3)")
      .as[Long].head() == 300L)
  }

  test("namespace and procedure names are case-insensitive like all SQL identifiers") {
    val t = build("case")
    val h = spark.sql(s"CALL graft_proc.SYSTEM.HISTORY('$t')")
    assert(h.count() == 3)
  }

  test("unknown procedure, missing table, and bad namespace are refused") {
    build("ref")
    val e1 = intercept[Exception](
      spark.sql("CALL graft_proc.system.frobnicate('ns.ref')"))
    assert(chain(e1).contains("undefined procedure"))
    val e2 = intercept[Exception](
      spark.sql("CALL graft_proc.system.history('ns.nope')"))
    assert(chain(e2).toLowerCase.contains("table"))
    val e3 = intercept[Exception](
      spark.sql("CALL graft_proc.other.history('ns.ref')"))
    assert(chain(e3).contains("undefined procedure"))
  }

  test("CALL ann_drift and ann_rebuild run the ANN maintenance loop over catalog tables") {
    import graft.ops.AnnIndex
    // a versioned corpus table in this catalog's warehouse
    val dim = 16
    def vec(i: Int): Seq[Float] = (0 until dim).map { j =>
      val base = if (j / 4 == i % 4) 1.0f else 0.1f
      base + 0.01f * ((i * 31 + j * 7) % 5)
    }
    val emb = (0 until 200).map(i => (i.toLong, (i % 4).toLong, vec(i)))
      .toDF("vec_id", "label", "embedding")
    Versioned.commit(spark, emb, rootOf("anncorpus"))
    AnnIndex.train(spark, emb, m = 4, dsub = 4, rootOf("annmodel"))

    // fresh corpus: drift exactly 0 at every probe, through SQL
    val drift = spark.sql(
      "CALL graft_proc.system.ann_drift('ns.anncorpus', 'ns.annmodel')")
    assert(drift.columns.toSeq ==
      Seq("pct", "baseline_q", "current_q", "drift_q"))
    assert(drift.select("pct", "drift_q").as[(Int, Long)].collect().toSet ==
      Set((50, 0L), (90, 0L), (99, 0L)))

    // rebuild bootstraps the codes table and reports its version
    val v = spark.sql("CALL graft_proc.system.ann_rebuild(" +
      "'ns.anncorpus', 'ns.annmodel', 'ns.anncodes')")
    assert(v.as[Long].collect().toSeq == Seq(1L))
    // the persisted pair searches end to end
    assert(AnnIndex.search(spark, emb.filter(col("vec_id") < 5),
      rootOf("annmodel"), rootOf("anncodes"), k = 3).count() > 0)

    // the BALANCE half through SQL: the freshly rebuilt codes table IS
    // the training corpus, so baseline == current cell by cell and the
    // shares sum to 1
    val cells = spark.sql(
      "CALL graft_proc.system.ann_cells('ns.anncodes', 'ns.annmodel')")
    assert(cells.columns.toSeq == Seq("cluster", "baseline_cnt",
      "current_cnt", "baseline_share", "current_share"))
    val cellRows = cells
      .select("baseline_cnt", "current_cnt", "current_share")
      .as[(Long, Long, Double)].collect()
    assert(cellRows.length == 4)
    assert(cellRows.forall(r => r._1 == r._2))
    assert(math.abs(cellRows.map(_._3).sum - 1.0) < 1e-12)

    // layout-only recell through SQL: a new codes version, identical
    // search results, model untouched
    val preSearch = AnnIndex.search(spark, emb.filter(col("vec_id") < 5),
      rootOf("annmodel"), rootOf("anncodes"), k = 3).collect().toSet
    val modelV = Versioned.versions(spark, rootOf("annmodel")).last
    val rc = spark.sql("CALL graft_proc.system.ann_recell('ns.anncodes')")
    assert(rc.as[Long].collect().toSeq == Seq(2L))
    assert(Versioned.versions(spark, rootOf("annmodel")).last == modelV)
    assert(AnnIndex.search(spark, emb.filter(col("vec_id") < 5),
      rootOf("annmodel"), rootOf("anncodes"), k = 3).collect().toSet
      == preSearch)

    // a cluster-less table has no cell layout to restore
    val flat = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_recell('ns.anncorpus')"))
    assert(chain(flat).contains("no cluster column"))

    // layout health through SQL: freshly recelled, every cell lives in
    // exactly one file, so total coverage == nlist (kept-per-probe 1.0)
    val lay = spark.sql("CALL graft_proc.system.ann_layout('ns.anncodes')")
    assert(lay.columns.toSeq == Seq("file", "cells_covered", "cells", "bytes"))
    val lr = lay.as[(String, Int, Int, Long)].collect()
    assert(lr.forall(_._3 == 4))
    assert(lr.map(_._2).sum == 4, lr.toSeq)
    assert(lr.forall(_._4 > 0L), lr.toSeq)

    // the scalar point on demand — exactly the row the monitor sink
    // accretes; freshly recelled, every file is read only by its own
    // cells' probes, so kept_bytes_per_probe * cells == total_bytes
    val pt = spark.sql(
      "CALL graft_proc.system.ann_layout_point('ns.anncodes')")
    assert(pt.columns.toSeq == Seq("files", "cells", "kept_per_probe",
      "kept_bytes_per_probe", "total_bytes"))
    val pr = pt.as[(Long, Long, Double, Double, Long)].collect()
    assert(pr.length == 1)
    val (ptF, ptC, ptK, ptKb, ptTot) = pr.head
    assert(ptF == lr.length.toLong && ptC == 4L && ptK == 1.0, pr.toSeq)
    assert(ptTot == lr.map(_._4).sum, pr.toSeq)
    assert(ptKb * ptC == ptTot.toDouble, pr.toSeq)

    // measured recall@3 through SQL at nprobe = every cell: one row per
    // query (qid rides as string), hits bounded by k, recall = hits/k;
    // on this near-pure-block corpus the index finds true neighbors
    val rec = spark.sql("CALL graft_proc.system.ann_recall(" +
      "'ns.anncorpus', 'ns.annmodel', 'ns.anncodes', 'ns.anncorpus', 3, 4)")
    assert(rec.columns.toSeq == Seq("qid", "hits", "recall"))
    val rr = rec.as[(String, Long, Double)].collect()
    assert(rr.length == 200)
    assert(rr.forall(r => r._2 >= 0L && r._2 <= 3L && r._3 == r._2 / 3.0))
    assert(rr.map(_._2).sum > 0, "full-probe recall found no true neighbor")

    // a missing model table refuses like every procedure
    val e = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_drift('ns.anncorpus', 'ns.nomodel')"))
    assert(chain(e).toLowerCase.contains("table"))
  }

  test("CALL ann_alerts reduces a monitor table to breach runs — the SQL twin " +
    "of AnnIndex.driftAlerts") {
    // the monitor sink's accreted shape, hand-built: breaches at
    // positions 0,1 | 3,4,5 | 8 at the p90 probe (gappy batch ids —
    // adjacency is positional), plus p50 rows that must never leak in
    val series = Seq(
      (10L, 90, 5L), (20L, 90, 7L), (30L, 90, 0L), (40L, 90, 9L),
      (50L, 90, 1L), (60L, 90, 2L), (70L, 90, -3L), (80L, 90, 0L),
      (90L, 90, 4L),
      (10L, 50, 99L), (30L, 50, 99L))
      .toDF("batch_id", "pct", "drift_q")
    Versioned.commit(spark, series, rootOf("annmonitor"))

    val runs = spark.sql(
      "CALL graft_proc.system.ann_alerts('ns.annmonitor', 90, 0, 3)")
    assert(runs.columns.toSeq == Seq("run_start", "run_end", "run_len", "alert"))
    assert(runs.select("run_start", "run_end", "run_len", "alert")
      .as[(Long, Long, Int, Boolean)].collect().toSet ==
      Set((10L, 20L, 2, false), (40L, 60L, 3, true), (90L, 90L, 1, false)))

    // defaults bind (pct=90, tol_q=10486, min_run=3): every drift here
    // sits under the canonical tolerance, so no breaches and no runs
    assert(spark.sql(
      "CALL graft_proc.system.ann_alerts('ns.annmonitor')").count() == 0)

    // a missing monitor table refuses like every procedure
    val e = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_alerts('ns.nomonitor')"))
    assert(chain(e).toLowerCase.contains("table"))
  }

  test("CALL ann_layout_alerts reduces a layout-monitor table to breach " +
    "runs — the third erosion axis's SQL run rule") {
    // the layout monitor sink's accreted shape, hand-built: kept rises
    // past tol in two interior runs (gappy batch ids — adjacency stays
    // positional, like ann_alerts)
    val series = Seq(
      (10L, 1.0), (20L, 2.5), (30L, 3.0), (40L, 1.5),
      (50L, 4.0), (60L, 4.5), (70L, 2.0))
      .toDF("batch_id", "kept_per_probe")
    Versioned.commit(spark, series, rootOf("annlayoutmon"))

    val runs = spark.sql(
      "CALL graft_proc.system.ann_layout_alerts('ns.annlayoutmon', 2.0, 2)")
    assert(runs.columns.toSeq == Seq("run_start", "run_end", "run_len", "alert"))
    assert(runs.as[(Long, Long, Int, Boolean)].collect().toSet ==
      Set((20L, 30L, 2, true), (50L, 60L, 2, true)))

    // defaults bind (tol_kept=2.0, min_run=3): same breaches, no run
    // long enough to alert
    val dflt = spark.sql(
      "CALL graft_proc.system.ann_layout_alerts('ns.annlayoutmon')")
    assert(dflt.as[(Long, Long, Int, Boolean)].collect().forall(!_._4))
  }

  test("CALL ann_prepare caches a session handle ann_search_prepared " +
    "consumes; stale version pairs refuse with the remedy named") {
    import graft.ops.AnnIndex
    val dim = 16
    def vec(i: Int): Seq[Float] = (0 until dim).map { j =>
      val base = if (j / 4 == i % 4) 1.0f else 0.1f
      base + 0.01f * ((i * 31 + j * 7) % 5)
    }
    val emb = (0 until 200).map(i => (i.toLong, (i % 4).toLong, vec(i)))
      .toDF("vec_id", "label", "embedding")
    Versioned.commit(spark, emb, rootOf("annp_corpus"))
    AnnIndex.trainAndRebuild(spark, emb, m = 4, dsub = 4,
      rootOf("annp_model"), rootOf("annp_codes"))
    Versioned.commit(spark,
      emb.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding")),
      rootOf("annp_q"))

    // search before prepare refuses, naming the missing step
    val e0 = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_search_prepared(" +
        "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2)"))
    assert(chain(e0).contains("ann_prepare"))

    // prepare returns the version pair it pinned
    val prep = spark.sql("CALL graft_proc.system.ann_prepare(" +
      "'ns.annp_model', 'ns.annp_codes')")
    assert(prep.columns.toSeq == Seq("model_version", "codes_version"))
    assert(prep.as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))

    // the SQL search equals the direct Scala search row for row (modulo
    // the fixed string schema), numerically ordered by qid
    val got = spark.sql("CALL graft_proc.system.ann_search_prepared(" +
      "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2)")
    assert(got.columns.toSeq == Seq("qid", "nid", "cluster", "cos_pq", "rank"))
    val gotRows = got.as[(String, String, String, Double, Int)].collect()
    val direct = AnnIndex.search(spark,
      emb.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding")),
      rootOf("annp_model"), rootOf("annp_codes"), k = 3, nprobe = 2)
      .select(col("qid").cast("string"), col("nid").cast("string"),
        col("cluster").cast("string"), col("cos_pq"), col("rank"))
      .as[(String, String, String, Double, Int)].collect()
    assert(gotRows.toSet == direct.toSet && direct.nonEmpty)
    assert(gotRows.map(_._1.toLong).toSeq ==
      gotRows.map(_._1.toLong).sorted.toSeq)

    // the driver-local serve dial through SQL (local_bytes_cap): rows
    // identical to the distributed form
    val viaLocal = spark.sql("CALL graft_proc.system.ann_search_prepared(" +
      s"'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2, ${Long.MaxValue / 8}L)")
      .as[(String, String, String, Double, Int)].collect()
    assert(viaLocal.toSet == gotRows.toSet)

    // AUTO (-1) prices the cap from the prepare-time listing — on this
    // tiny table the floor admits the local path; rows identical
    val viaAuto = spark.sql("CALL graft_proc.system.ann_search_prepared(" +
      "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2, -1L)")
      .as[(String, String, String, Double, Int)].collect()
    assert(viaAuto.toSet == gotRows.toSet)

    // other negatives refuse loudly (ambiguous): the Scala refusal
    // surfaces through the CALL
    val eAmb = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_search_prepared(" +
        "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2, -2L)"))
    assert(chain(eAmb).contains("LocalBytesAuto"))

    // ann_serve_probe prices the probe without running it: the auto cap
    // (floor on this tiny snapshot), the exact kept bytes (non-null,
    // positive, at most the snapshot total), and the AUTO verdict —
    // which on this table is the local path the -1 search above took
    val probe = spark.sql("CALL graft_proc.system.ann_serve_probe(" +
      "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 2)")
    assert(probe.columns.toSeq ==
      Seq("auto_cap_bytes", "kept_bytes", "serves_local"))
    val (capB, keptB, servesLocal) =
      probe.as[(Long, Option[Long], Boolean)].collect().head
    assert(capB == 512L * 1024) // tiny snapshot -> the floor
    assert(keptB.exists(b => b > 0L && b <= capB))
    assert(servesLocal)

    // a codes commit staled the handle: refusal names both pairs and
    // the remedy
    spark.sql("CALL graft_proc.system.ann_recell('ns.annp_codes')")
    val e1 = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_search_prepared(" +
        "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2)"))
    assert(chain(e1).contains("STALE") && chain(e1).contains("v2") &&
      chain(e1).contains("ann_prepare"))
    // the probe refuses the same staleness: a stale handle's pricing
    // would describe a snapshot no longer served
    val e1p = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_serve_probe(" +
        "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes')"))
    assert(chain(e1p).contains("STALE"))

    // re-prepare adopts the new snapshot; results identical (recell is
    // layout-only)
    assert(spark.sql("CALL graft_proc.system.ann_prepare(" +
      "'ns.annp_model', 'ns.annp_codes')")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    val again = spark.sql("CALL graft_proc.system.ann_search_prepared(" +
      "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2)")
      .as[(String, String, String, Double, Int)].collect()
    assert(again.toSet == gotRows.toSet)

    // explicit lifecycle end: release drops the handle (1), a second
    // release is a no-op (0), and the searched pair then refuses again
    assert(spark.sql("CALL graft_proc.system.ann_prepare_release(" +
      "'ns.annp_model', 'ns.annp_codes')").as[Int].collect().toSeq == Seq(1))
    assert(spark.sql("CALL graft_proc.system.ann_prepare_release(" +
      "'ns.annp_model', 'ns.annp_codes')").as[Int].collect().toSeq == Seq(0))
    val e2 = intercept[Exception](spark.sql(
      "CALL graft_proc.system.ann_search_prepared(" +
        "'ns.annp_q', 'ns.annp_model', 'ns.annp_codes', 3, 2)"))
    assert(chain(e2).contains("ann_prepare"))

    // the Scala-side session sweep drops whatever this session still
    // holds (the retire-a-session path); idempotent
    spark.sql("CALL graft_proc.system.ann_prepare(" +
      "'ns.annp_model', 'ns.annp_codes')")
    assert(graft.ops.AnnPreparedRegistry.releaseSession(spark) >= 1)
    assert(graft.ops.AnnPreparedRegistry.releaseSession(spark) == 0)
  }

  test("CALL ann_prepared_list shows this session's cache without touching " +
    "recency; the registry cap evicts by LRU so a hot handle survives") {
    import graft.ops.{AnnIndex, AnnPreparedRegistry}
    val dim = 16
    def vec(i: Int): Seq[Float] = (0 until dim).map { j =>
      val base = if (j / 4 == i % 4) 1.0f else 0.1f
      base + 0.01f * ((i * 31 + j * 7) % 5)
    }
    val emb = (0 until 120).map(i => (i.toLong, (i % 4).toLong, vec(i)))
      .toDF("vec_id", "label", "embedding")
    AnnIndex.trainAndRebuild(spark, emb, m = 4, dsub = 4,
      rootOf("annpl_model"), rootOf("annpl_codes"))

    AnnPreparedRegistry.releaseSession(spark) // isolate from earlier tests
    assert(spark.sql("CALL graft_proc.system.ann_prepared_list()")
      .collect().isEmpty)

    spark.sql(
      "CALL graft_proc.system.ann_prepare('ns.annpl_model', 'ns.annpl_codes')")
    val listed = spark.sql("CALL graft_proc.system.ann_prepared_list()")
    assert(listed.columns.toSeq ==
      Seq("model_root", "codes_root", "model_version", "codes_version"))
    // the registry keys on catalog-resolved roots and the version pair
    // the handle serves — exactly what the listing returns
    assert(listed.as[(String, String, Long, Long)].collect().toSeq ==
      Seq((rootOf("annpl_model"), rootOf("annpl_codes"), 1L, 1L)))

    // --- LRU semantics at the 256-entry cap, on the REAL registry.
    // Synthetic pairs reuse the same handle object (never dereferenced;
    // eviction is what's under test). First flush: 256 inserts of OURS
    // evict any other session's idle entries from the JVM-wide cap,
    // then the sweep leaves the registry EMPTY — a known baseline.
    val (handle, mv, cv) = AnnPreparedRegistry
      .get(spark, rootOf("annpl_model"), rootOf("annpl_codes")).get
    def fill(): Unit = (0 until 255).foreach { i =>
      AnnPreparedRegistry.put(spark, s"/syn/m$i", s"/syn/c$i", handle, mv, cv)
    }
    (0 until 256).foreach { i =>
      AnnPreparedRegistry.put(spark, s"/flush/m$i", s"/flush/c$i",
        handle, mv, cv)
    }
    AnnPreparedRegistry.releaseSession(spark)

    // hot handle survives the cap: real inserted FIRST (the eviction
    // victim under the old insertion-order cap), 255 synthetics fill to
    // 256, a get refreshes the real pair (every served search does),
    // and the overflow victim is the never-reused synthetic #0
    AnnPreparedRegistry.put(spark, rootOf("annpl_model"), rootOf("annpl_codes"),
      handle, mv, cv)
    fill()
    assert(AnnPreparedRegistry.listFor(spark).size == 256)
    assert(AnnPreparedRegistry
      .get(spark, rootOf("annpl_model"), rootOf("annpl_codes")).isDefined)
    AnnPreparedRegistry.put(spark, "/syn/m255", "/syn/c255", handle, mv, cv)
    assert(AnnPreparedRegistry
      .get(spark, rootOf("annpl_model"), rootOf("annpl_codes")).isDefined)
    assert(AnnPreparedRegistry.get(spark, "/syn/m0", "/syn/c0").isEmpty)
    assert(AnnPreparedRegistry.get(spark, "/syn/m1", "/syn/c1").isDefined)

    // listing is NOT an access: rebuild the same shape but list instead
    // of get — the real pair stays least-recently-used through the CALL
    // and the overflow still evicts it
    AnnPreparedRegistry.releaseSession(spark)
    AnnPreparedRegistry.put(spark, rootOf("annpl_model"), rootOf("annpl_codes"),
      handle, mv, cv)
    fill()
    assert(spark.sql("CALL graft_proc.system.ann_prepared_list()")
      .collect().length == 256) // the real pair is LRU, and LISTED
    AnnPreparedRegistry.put(spark, "/syn/m255", "/syn/c255", handle, mv, cv)
    assert(AnnPreparedRegistry
      .get(spark, rootOf("annpl_model"), rootOf("annpl_codes")).isEmpty,
      "listing refreshed recency — the observability CALL perturbed eviction")

    assert(AnnPreparedRegistry.releaseSession(spark) == 256)
  }
}
