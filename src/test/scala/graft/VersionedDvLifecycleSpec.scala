package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Lifecycle composition for the round-9 lake surfaces: ONE table driven
  * through OCC appends + merge-on-read deletes/updates/merge + keyed CDF
  * + compaction (vector materialization) + vacuum (crash-debris reclaim
  * included) + restore, asserting the cross-feature invariants the
  * individual specs can't see — metadata row counts agreeing with data
  * reads at EVERY historical version, vectors surviving restore, debris
  * reclaim never touching live state. The DV-era sibling of
  * [[VersionedLifecycleSpec]].
  */
class VersionedDvLifecycleSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("OCC + DV + CDF + compaction + vacuum + restore compose on one table") {
    val root = tmpDir("graft_dvlife")

    // 1. ingest via the CONCURRENT-writer surface (unique batch dirs):
    //    three banded OCC appends with id stats -> v1..v3
    Versioned.commitOcc(spark, (1L to 100L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    Versioned.commitOcc(spark, (101L to 200L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    Versioned.commitOcc(spark, (201L to 300L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    assert(Versioned.countRows(spark, root) == 300L)

    // 2. scattered merge-on-read delete (every 10th row) -> v4: vectors,
    //    zero data files rewritten
    val filesBefore = manifestOf(root, 3L)
    assert(Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0) == 4L)
    assert(manifestOf(root, 4L) == filesBefore, "DV delete must not rewrite files")
    assert(Versioned.dvEntries(spark, root).size == 3)

    // 3. merge-on-read MERGE -> v5: 150/160 are vector-dead so they
    //    re-insert; 151..159 update via fresh vectors; 1000 inserts
    Versioned.mergeIntoDv(spark, root,
      ((150L to 160L).map(i => (i, "UPD")) ++ Seq((1000L, "new"))).toDF("id", "k"),
      keys = Seq("id"))
    assert(Versioned.read(spark, root).filter(col("k") === "UPD").count() == 11)

    // 4. keyed CDF across the merge window classifies exactly
    val cdf = Versioned.diffVersionsKeyed(spark, root, 4L, Some(5L), keys = Seq("id"))
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(cdf.getOrElse("update_postimage", 0L) == 9L, s"cdf=$cdf")
    assert(cdf.getOrElse("update_preimage", 0L) == 9L, s"cdf=$cdf")
    assert(cdf.getOrElse("insert", 0L) == 3L, s"cdf=$cdf") // 150, 160, 1000

    // 5. merge-on-read UPDATE -> v6 (vectors + appended copies)
    Versioned.updateWhereDv(spark, root, col("id").between(201L, 205L),
      Map("k" -> lit("X")))
    assert(Versioned.read(spark, root).filter(col("k") === "X").count() == 5)

    // 6. another OCC append lands on the heavily-vectored table -> v7
    Versioned.commitOcc(spark, (2000L to 2010L).map(i => (i, s"n$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))

    // the composed expected row counts, version by version
    val expect = Map(1L -> 100L, 2L -> 200L, 3L -> 300L, 4L -> 270L,
      5L -> 273L, 6L -> 273L, 7L -> 284L)

    // 7. OCC compaction materializes every vector; rows exact, no vectors left
    val v8 = Versioned.compactSmallOcc(spark, root)
    assert(v8 == 8L)
    assert(Versioned.dvEntries(spark, root).isEmpty,
      "compaction must fold vectors into rewritten files")
    assert(Versioned.countRows(spark, root) == 284L)
    assert(Versioned.read(spark, root).filter(col("k") === "UPD").count() == 11)
    assert(Versioned.read(spark, root).filter(col("k") === "X").count() == 5)

    // 8. plant crash debris — an orphaned staging dir and an unpublished
    //    single-writer batch dir — then vacuum with EVERY version kept:
    //    debris goes, all live state stays
    val stage = new java.io.File(root, "data/bstage_9_deadbeef")
    val orphan = new java.io.File(root, "data/b99")
    assert(stage.mkdirs() && orphan.mkdirs())
    java.nio.file.Files.write(new java.io.File(stage, "part-0.parquet").toPath,
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(new java.io.File(orphan, "part-0.parquet").toPath,
      Array[Byte](4, 5, 6))
    Versioned.vacuum(spark, root, keepVersions = 100)
    assert(!stage.exists() && !orphan.exists(), "debris must be reclaimed")
    assert(Versioned.versions(spark, root) == (1L to 8L),
      "vacuum with keepVersions=100 must drop no version")

    // 9. metadata row counts agree with data reads at EVERY version the
    //    table ever had — OCC batches, vectored snapshots, post-compaction
    (1L to 8L).foreach { v =>
      val meta = Versioned.countRows(spark, root, asOf = Some(v))
      val data = Versioned.read(spark, root, asOf = Some(v)).count()
      assert(meta == data, s"v$v: countRows=$meta read=$data")
      expect.get(v).foreach(e => assert(data == e, s"v$v: expected $e got $data"))
    }

    // 10. restore to the vectored pre-update snapshot (v5): manifest-only,
    //     vectors ride along and still hide their rows
    val v9 = Versioned.restore(spark, root, 5L)
    assert(v9 == 9L)
    assert(Versioned.dvEntries(spark, root).nonEmpty,
      "restore to a vectored version must carry its vectors")
    assert(Versioned.countRows(spark, root) == 273L)
    val ids = Versioned.read(spark, root).select("id").as[Long].collect().toSet
    assert(!ids.contains(170L) && ids.contains(150L) && ids.contains(1000L))
    assert(Versioned.read(spark, root).filter(col("k") === "X").count() == 0,
      "restore must undo the merge-on-read update")

    // 11. real retention now: drop to the last 2 versions; old batches and
    //     their vectors GC; the survivors still read exactly
    Versioned.vacuum(spark, root, keepVersions = 2)
    assert(Versioned.versions(spark, root) == Seq(8L, 9L))
    assert(Versioned.read(spark, root, asOf = Some(8L)).count() == 284)
    assert(Versioned.read(spark, root).count() == 273)
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root, asOf = Some(4L)).count()
    }
  }

  test("history labels every commit with its operation") {
    val root = tmpDir("graft_dvlife_ops")
    Versioned.commit(spark, (1L to 50L).map(i => (i, s"r$i")).toDF("id", "k"), root)
    Versioned.deleteWhereDv(spark, root, col("id") === 5L)
    Versioned.mergeInto(spark, root,
      Seq((7L, "UPD"), (999L, "new")).toDF("id", "k"), Seq("id"))
    Versioned.compactSmall(spark, root)
    Versioned.restore(spark, root, 2L)
    Versioned.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType)))
    Versioned.commitOcc(spark,
      Seq((100L, "x", "e")).toDF("id", "k", "extra"), root)
    val ops = Versioned.history(spark, root).orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(ops == Seq("append", "dv_delete", "merge", "compact", "restore",
      "add_columns", "append_occ"), s"got $ops")
    // the SQL procedure surfaces the same column
    // (covered structurally by VersionedProcedureSpec's history test)
  }

  test("vacuumDryRun lists exactly what vacuum then reclaims, deleting nothing") {
    val root = tmpDir("graft_dvlife_dry")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k").coalesce(1), root)
    Versioned.commit(spark, Seq((2L, "b")).toDF("id", "k").coalesce(1), root)
    Versioned.commit(spark, Seq((9L, "z")).toDF("id", "k").coalesce(1),
      root, replace = true)
    val debris = new java.io.File(root, "data/bstage_9_dead")
    assert(debris.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(debris, "part-0.parquet").toPath, Array[Byte](1))
    val planned = Versioned.vacuumDryRun(spark, root, keepVersions = 1)
    // nothing deleted by the dry run
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(debris.exists())
    assert(Versioned.read(spark, root, asOf = Some(1L)).count() == 1)
    // the plan names the v1/v2 data, the debris, and the expiring manifests
    assert(planned.exists(_.contains("bstage_9_dead")))
    assert(planned.exists(_.endsWith("v1.txt")) && planned.exists(_.endsWith("v2.txt")))
    // the real vacuum reclaims everything the plan named (files inside
    // dirs the plan reclaims as a unit are covered by the dir entry)
    Versioned.vacuum(spark, root, keepVersions = 1)
    planned.foreach { p =>
      assert(!new java.io.File(new java.net.URI(
        if (p.startsWith("file:")) p else s"file:$p")).exists(), s"survived: $p")
    }
    assert(Versioned.read(spark, root).count() == 1)
  }

  test("vacuum's grace window protects an in-flight writer's fresh batch") {
    val root = tmpDir("graft_dvlife_grace")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    // simulate an OCC writer mid-prepare: a freshly-written, not-yet-
    // published unique batch dir (referenced by no manifest)
    val inflight = new java.io.File(root, "data/bu1700000000000_abcd1234")
    assert(inflight.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(inflight, "part-0.parquet").toPath, Array[Byte](1))
    // grace window covers it: vacuum must NOT reclaim the fresh batch
    Versioned.vacuum(spark, root, keepVersions = 100, graceMillis = 3600000L)
    assert(inflight.exists(), "a batch younger than the grace window survived")
    // maintenance-window semantics (grace 0): reclaimed
    Versioned.vacuum(spark, root, keepVersions = 100)
    assert(!inflight.exists())
    assert(Versioned.read(spark, root).count() == 1)
  }
}
