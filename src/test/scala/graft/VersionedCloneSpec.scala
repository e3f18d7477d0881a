package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Shallow clone ([[Versioned.cloneTable]]): a metadata-only copy that is
  * a full table from then on. Asserts zero-data-copy (the clone root holds
  * no parquet until a write), read equality at the cloned version,
  * pruning through the SOURCE's sidecars, copy-on-write independence
  * (clone writes never touch the source; untouched source files stay
  * carried by absolute reference), vacuum containment (a clone's GC can
  * only delete its own files), clone-of-clone, and the SQL CALL surface
  * incl. refusing an existing target.
  */
class VersionedCloneSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  /** 3 commits x 1 file of 100 rows each, id-banded, stats on id. */
  private def buildSrc(): String = {
    val root = tmpRoot("graft_clone_src")
    (0 to 2).foreach { i =>
      Versioned.commit(spark,
        ((i * 100 + 1).toLong to (i * 100 + 100).toLong).map(j => (j, j * 2.0))
          .toDF("id", "x").coalesce(1), root, statsCols = Seq("id"))
    }
    root
  }

  /** Scheme-stripped path — clone entries are FULL URIs (`file:/…`)
    * while a local table's own resolved files are bare paths. */
  private def pathOf(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  private def parquetCount(root: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val d = new java.io.File(root)
    if (!d.exists()) 0
    else walk(d).count(_.getName.endsWith(".parquet"))
  }

  test("clone is metadata-only, reads the pinned snapshot, prunes via source sidecars") {
    val src = buildSrc()
    val dst = tmpRoot("graft_clone_dst")
    assert(Versioned.cloneTable(spark, src, dst, asOf = Some(2L)) == 1L)
    assert(parquetCount(dst) == 0, "a shallow clone must copy no data")
    assert(Versioned.read(spark, dst).count() == 200)
    assert(Versioned.read(spark, dst).agg(sum($"id")).as[Long].head() ==
      (1L to 200L).sum)
    // file skipping flows through the source's sidecars: a one-band slice
    // opens one of the two referenced files
    assert(Versioned.readPruned(spark, dst, "id", Some(150L), Some(160L))
      .inputFiles.length == 1)
  }

  test("copy-on-write on the clone never touches the source") {
    val src = buildSrc()
    val dst = tmpRoot("graft_clone_cow")
    Versioned.cloneTable(spark, src, dst)
    val srcFilesBefore = Versioned.snapshotFiles(spark, src).map(pathOf).sorted
    Versioned.deleteWhere(spark, dst, $"id".between(201, 300))
    // source: same files, same rows
    assert(Versioned.snapshotFiles(spark, src).map(pathOf).sorted == srcFilesBefore)
    assert(Versioned.read(spark, src).count() == 300)
    // clone: band 3 dropped by rewriting ONLY that band — the two
    // untouched source files stay carried by absolute reference
    assert(Versioned.read(spark, dst).count() == 200)
    val entries = Versioned.snapshotFiles(spark, dst).map(pathOf)
    assert(entries.count(srcFilesBefore.contains) == 2,
      s"expected 2 carried source files, got: $entries")
  }

  test("sidecar retrofits refuse a clone: they would write into the source's dirs") {
    val src = buildSrc()
    val dst = tmpRoot("graft_clone_retrofit")
    Versioned.cloneTable(spark, src, dst)
    val e = intercept[IllegalArgumentException] {
      Versioned.buildStats(spark, dst, Seq("id"))
    }
    assert(e.getMessage.contains("source table"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.buildBlooms(spark, dst, Seq("id"))
    }
    assert(e2.getMessage.contains("source table"))
    // the SOURCE itself retrofits fine
    assert(Versioned.buildStats(spark, src, Seq("id")) == 3L)
  }

  test("vacuum on the clone deletes only clone-local files") {
    val src = buildSrc()
    val dst = tmpRoot("graft_clone_vac")
    Versioned.cloneTable(spark, src, dst)
    // rewrite everything locally (materializes the clone), then vacuum
    Versioned.compactLatest(spark, dst, nFiles = 1)
    Versioned.vacuum(spark, dst, keepVersions = 1)
    assert(Versioned.read(spark, src).count() == 300, "source must survive")
    assert(parquetCount(src) == 3, "source files must survive clone vacuum")
    assert(Versioned.read(spark, dst).count() == 300)
  }

  test("clone of a clone passes absolute entries through unchanged") {
    val src = buildSrc()
    val mid = tmpRoot("graft_clone_mid")
    val end = tmpRoot("graft_clone_end")
    Versioned.cloneTable(spark, src, mid)
    Versioned.cloneTable(spark, mid, end)
    assert(parquetCount(mid) == 0 && parquetCount(end) == 0)
    assert(Versioned.read(spark, end).count() == 300)
    assert(Versioned.snapshotFiles(spark, end).map(pathOf).sorted ==
      Versioned.snapshotFiles(spark, src).map(pathOf).sorted)
  }

  test("history on a clone sizes the referenced source files") {
    val src = buildSrc()
    val dst = tmpRoot("graft_clone_hist")
    Versioned.cloneTable(spark, src, dst)
    val h = Versioned.history(spark, dst)
      .select("version", "num_files", "total_bytes")
      .as[(Long, Long, Long)].collect().toSeq
    assert(h.map(r => (r._1, r._2)) == Seq((1L, 3L)))
    assert(h.head._3 > 0L, "bytes must come from the referenced files")
  }

  test("CALL clone works through SQL and refuses an existing target") {
    val wh = java.nio.file.Files.createTempDirectory("graft_clonewh").toFile
    wh.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft_cl",
      classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cl.warehouse", wh.getAbsolutePath)
    val srcRoot = new java.io.File(new java.io.File(wh, "ns"), "src").getAbsolutePath
    (0 to 2).foreach { i =>
      Versioned.commit(spark,
        ((i * 10 + 1).toLong to (i * 10 + 10).toLong).toDF("id").coalesce(1), srcRoot)
    }
    val out = spark.sql(
      "CALL graft_cl.system.clone('ns.src', 'ns.dst', version => 2)")
    assert(out.as[Long].collect().toSeq == Seq(1L))
    assert(spark.table("graft_cl.ns.dst").count() == 20)
    val e = intercept[Exception](
      spark.sql("CALL graft_cl.system.clone('ns.src', 'ns.dst')"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("already has committed versions"))
    // a path-traversing target must never resolve outside the warehouse
    // (clone is the one procedure that CREATES at the resolved root)
    val esc = intercept[Exception](
      spark.sql("CALL graft_cl.system.clone('ns.src', 'x./tmp/graft_evil')"))
    val escMsgs = Iterator.iterate(esc: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(escMsgs.contains("must not traverse paths"))
    assert(!new java.io.File("/tmp/graft_evil").exists())
  }

  test("a clone never reassigns field ids the SOURCE retired by DROP") {
    import spark.implicits._
    // mapped source: drop retires the column's field id; the clone
    // carries the source's files, which still hold values under that id
    // — its #colmaxid must carry the SOURCE's high-water so a re-added
    // name on the CLONE gets a fresh id and reads null, never 'secret'
    val src = tmpRoot("graft_clone_ids_src")
    Versioned.commit(spark, Seq((1L, "k1", "secret")).toDF("id", "k", "sec"), src)
    Versioned.dropColumns(spark, src, Seq("sec"))
    val dst = tmpRoot("graft_clone_ids_dst")
    Versioned.cloneTable(spark, src, dst)
    Versioned.addColumns(spark, dst, Seq(
      org.apache.spark.sql.types.StructField("sec",
        org.apache.spark.sql.types.StringType)))
    val got = Versioned.read(spark, dst).select("id", "sec")
      .as[(Long, Option[String])].collect().toSeq
    assert(got == Seq((1L, None)), s"retired id reassigned on the clone: $got")
  }

  test("a relative source root clones to the same files as its absolute form") {
    val src = buildSrc()
    val rel = new java.io.File(System.getProperty("user.dir")).toPath
      .relativize(java.nio.file.Paths.get(src)).toString
    val dst = tmpRoot("graft_clone_rel")
    Versioned.cloneTable(spark, rel, dst)
    // entries must be absolute (qualified against the source FS), never
    // clone-root-relative — the read proves none dangle
    assert(Versioned.read(spark, dst).count() == 300)
    assert(Versioned.snapshotFiles(spark, dst).map(pathOf).sorted ==
      Versioned.snapshotFiles(spark, src).map(pathOf).sorted)
  }
}
