package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** The versioned table must give atomic commits (readers see whole
  * snapshots), append vs replace semantics, time travel, crash safety
  * (a half-finished commit is invisible), and a vacuum that never
  * breaks retained versions.
  */
class VersionedSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_versioned").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("append commits accumulate; replace starts a new snapshot") {
    val root = tmpRoot()
    val v1 = Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val v2 = Versioned.commit(spark, Seq((2L, "b")).toDF("id", "v"), root)
    assert((v1, v2) == (1L, 2L))
    assert(Versioned.read(spark, root).count() == 2)
    val v3 = Versioned.commit(spark, Seq((9L, "z")).toDF("id", "v"), root,
      replace = true)
    assert(v3 == 3L)
    assert(Versioned.read(spark, root).select("id").as[Long].collect().toSeq == Seq(9L))
  }

  test("time travel reads exactly the asked-for snapshot") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    Versioned.commit(spark, Seq((2L, "b")).toDF("id", "v"), root)
    Versioned.commit(spark, Seq((9L, "z")).toDF("id", "v"), root, replace = true)
    assert(Versioned.read(spark, root, asOf = Some(1L)).count() == 1)
    assert(Versioned.read(spark, root, asOf = Some(2L)).count() == 2)
    assert(Versioned.read(spark, root, asOf = Some(3L)).count() == 1)
    val err = intercept[IllegalArgumentException] {
      Versioned.read(spark, root, asOf = Some(7L))
    }
    assert(err.getMessage.contains("not found"))
  }

  test("a crash before the manifest rename is invisible to readers") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    // simulate a writer that died after writing data + temp manifest but
    // before the rename commit point
    Seq((666L, "junk")).toDF("id", "v").write
      .parquet(new java.io.File(root, "data/b2").getAbsolutePath)
    java.nio.file.Files.write(
      new java.io.File(root, "_manifests/.v2.txt.tmp").toPath,
      "data/b2/whatever.parquet\n".getBytes)
    assert(Versioned.versions(spark, root) == Seq(1L))
    assert(Versioned.read(spark, root).select("id").as[Long].collect().toSeq == Seq(1L))
    // a restarted writer reclaims the unpublished debris and commits v2
    // cleanly — the junk rows never appear
    val v2 = Versioned.commit(spark, Seq((2L, "b")).toDF("id", "v"), root)
    assert(v2 == 2L)
    assert(Versioned.read(spark, root).select("id").as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("vacuum drops unreachable files but keeps retained snapshots readable") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    Versioned.commit(spark, Seq((2L, "b")).toDF("id", "v"), root)
    Versioned.commit(spark, Seq((9L, "z")).toDF("id", "v"), root, replace = true)
    Versioned.vacuum(spark, root, keepVersions = 2)
    assert(Versioned.versions(spark, root) == Seq(2L, 3L))
    // both retained versions still read fine
    assert(Versioned.read(spark, root, asOf = Some(2L)).count() == 2)
    assert(Versioned.read(spark, root, asOf = Some(3L)).count() == 1)
    // after keeping only the replace-snapshot, v1/v2's files are gone
    Versioned.vacuum(spark, root, keepVersions = 1)
    assert(Versioned.versions(spark, root) == Seq(3L))
    assert(Versioned.read(spark, root).count() == 1)
    val b1 = new java.io.File(root, "data/b1")
    assert(!b1.exists || b1.listFiles().forall(!_.getName.endsWith(".parquet")))
  }

  test("versioned streaming sink: one version per batch, replayed batch skipped") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpRoot()
    val ckpt = tmpRoot()
    val src = MemoryStream[(Long, Double)]
    val q = graft.streaming.Streams.versionedSink(
      src.toDF().toDF("id", "value"), root, ckpt)
    try {
      src.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      src.addData((3L, 3.0))
      q.processAllAvailable()
      assert(Versioned.versions(spark, root).size == 2)
      assert(Versioned.read(spark, root).count() == 3)
      // simulate an at-least-once replay of the last batch: the tag check
      // must skip the duplicate commit
      val replay = Seq((3L, 3.0)).toDF("id", "value")
      val tag = Versioned.committedTag(spark, root)
      // checkpoint-scoped tag: kind + checkpoint hash + batch id
      assert(tag.exists(t => t.startsWith("append-") && t.endsWith("-batch-1")))
      if (!Versioned.committedTag(spark, root).contains(tag.get)) {
        Versioned.commit(spark, replay, root, tag = tag)
      }
      assert(Versioned.versions(spark, root).size == 2)
      assert(Versioned.read(spark, root).count() == 3)
    } finally q.stop()
  }

  test("readChanges yields exactly the rows appended between two versions") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L, 2L).toDF("id"), root)
    Versioned.commit(spark, Seq(3L).toDF("id"), root)
    Versioned.commit(spark, Seq(4L, 5L).toDF("id"), root)
    assert(Versioned.readChanges(spark, root, 1L).select("id")
      .as[Long].collect().toSet == Set(3L, 4L, 5L))
    assert(Versioned.readChanges(spark, root, 1L, Some(2L)).select("id")
      .as[Long].collect().toSet == Set(3L))
    assert(Versioned.readChanges(spark, root, 3L).count() == 0)
  }

  test("compactLatest collapses many small appends into one snapshot safely") {
    val root = tmpRoot()
    (1 to 5).foreach(i => Versioned.commit(spark, Seq(i.toLong).toDF("id"), root))
    val before = Versioned.read(spark, root)
    val v = Versioned.compactLatest(spark, root, nFiles = 1, sortCols = Seq("id"))
    assert(v == 6L)
    val after = Versioned.read(spark, root)
    assert(after.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
    assert(after.inputFiles.length == 1)
    // pre-compaction snapshot still readable until vacuum
    assert(Versioned.read(spark, root, asOf = Some(5L)).count() == 5)
    assert(before.count() == 5)
    Versioned.vacuum(spark, root, keepVersions = 1)
    assert(Versioned.versions(spark, root) == Seq(6L))
    assert(Versioned.read(spark, root).count() == 5)
  }

  test("a manifest published by another writer becomes committed history") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L).toDF("id"), root)
    // a manifest that appeared outside this writer (name is the contract)
    Seq(7L).toDF("id").write
      .parquet(new java.io.File(root, "data/b2").getAbsolutePath)
    val files = new java.io.File(root, "data/b2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => s"data/b2/${f.getName}")
    java.nio.file.Files.write(
      new java.io.File(root, "_manifests/v2.txt").toPath,
      files.mkString("", "\n", "\n").getBytes)
    // the next commit builds on v2, not over it
    val v = Versioned.commit(spark, Seq(2L).toDF("id"), root)
    assert(v == 3L)
    assert(Versioned.read(spark, root).select("id").as[Long].collect().toSet == Set(7L, 2L))
  }

  test("snapshot isolation: a reader resolved to vN is unaffected by later commits") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).toDF("id"), root)
    val snapshot = Versioned.read(spark, root) // resolves v1's file list now
    Versioned.commit(spark, (101L to 200L).toDF("id"), root)
    Versioned.commit(spark, Seq(999L).toDF("id"), root, replace = true)
    // the in-flight frame still reads exactly v1 even though the table
    // has since been replaced (files live until vacuum)
    assert(snapshot.count() == 100)
    assert(Versioned.read(spark, root).count() == 1)
  }

  test("history reports one metadata-only row per version") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).toDF("id").coalesce(1), root,
      tag = Some("load-1"))
    Versioned.commit(spark, (101L to 200L).toDF("id").coalesce(1), root)
    Versioned.compactLatest(spark, root, nFiles = 1)
    val h = Versioned.history(spark, root).orderBy("version")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(5)))
    assert(h.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(h(0)._2 == "load-1" && h(1)._2 == null)
    // v1: 1 file (all added); v2: 2 files (1 added); v3 compaction: 1 file, 1 added
    assert(h.map(x => (x._3, x._4)).toSeq == Seq((1L, 1L), (2L, 1L), (1L, 1L)))
    val bytes = Versioned.history(spark, root).select("total_bytes")
      .as[Long].collect()
    assert(bytes.forall(_ > 0))
    // after a vacuum the oldest survivor's predecessor is gone: its
    // files_added is unknowable and must surface as null, not a lie
    Versioned.vacuum(spark, root, keepVersions = 2)
    val h2 = Versioned.history(spark, root).orderBy("version")
      .collect().map(r => (r.getLong(0), r.isNullAt(5)))
    assert(h2.toSeq == Seq((2L, true), (3L, false)))
  }

  test("vacuumOlderThan keeps the newest version at-or-before the cutoff") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L).toDF("id"), root)
    Versioned.commit(spark, Seq(2L).toDF("id"), root)
    Versioned.commit(spark, Seq(3L).toDF("id"), root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pin publish times: v1 at T, v2 at T+10s, v3 at T+20s
    val t0 = 1767225600000L
    Seq(1L, 2L, 3L).foreach { v =>
      fs.setTimes(new org.apache.hadoop.fs.Path(root, s"_manifests/v$v.txt"),
        t0 + (v - 1) * 10000L, -1)
    }
    // cutoff between v2 and v3: v2 is the as-of state, so v2 and v3 survive
    Versioned.vacuumOlderThan(spark, root, t0 + 15000L)
    assert(Versioned.versions(spark, root) == Seq(2L, 3L))
    assert(Versioned.read(spark, root, asOf = Some(2L)).count() == 2)
    // cutoff before everything: nothing is dropped
    Versioned.vacuumOlderThan(spark, root, t0 - 99999L)
    assert(Versioned.versions(spark, root) == Seq(2L, 3L))
  }

  test("compactSmall packs only the small files and carries large ones") {
    val root = tmpRoot()
    // one "large" batch (many rows, one file) + three tiny ones
    Versioned.commit(spark, (1L to 200000L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Seq(300001L, 300002L, 300003L).foreach { i =>
      Versioned.commit(spark, Seq(i).toDF("id").coalesce(1), root,
        statsCols = Seq("id"))
    }
    val before = manifestOf(root, 4L)
    assert(before.size == 4)
    val v5 = Versioned.compactSmall(spark, root, smallBytes = 100000L)
    assert(v5 == 5L)
    val after = manifestOf(root, 5L)
    // the large file is carried by reference; 3 tiny files became 1
    assert(after.count(before.contains) == 1)
    assert(after.size == 2)
    assert(Versioned.read(spark, root).count() == 200003L)
    // stats were re-harvested on the packed batch: pruning still exact
    assert(Versioned.readPruned(spark, root, "id", Some(300001L), None)
      .as[Long].collect().sorted.toSeq == Seq(300001L, 300002L, 300003L))
    // too few small files -> no-op
    assert(Versioned.compactSmall(spark, root, smallBytes = 100000L) == 5L)
  }

  test("manifest memo never serves stale content after a same-tick recreate") {
    // coarse-mtime hazard: a manifest replaced in place with same-length
    // content inside one mtime tick must NOT be served from the memo —
    // the memo refuses to cache files whose mtime is within the settle
    // window of now, and a freshly (re)created file is always fresh
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L).toDF("id"), root, tag = Some("aa"))
    assert(Versioned.committedTag(spark, root).contains("aa"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root, "_manifests/v1.txt")
    val st = fs.getFileStatus(p)
    val nio = new java.io.File(root, "_manifests/v1.txt").toPath
    val rewritten = new String(java.nio.file.Files.readAllBytes(nio), "UTF-8")
      .replace("#tag=aa", "#tag=bb")
    // write through the Hadoop fs so the checksum sidecar follows
    val out = fs.create(p, true)
    try out.write(rewritten.getBytes("UTF-8")) finally out.close()
    // pin (mtime, length) to EXACTLY the old key — a worst-case tick
    fs.setTimes(p, st.getModificationTime, -1)
    assert(fs.getFileStatus(p).getLen == st.getLen, "test needs equal length")
    assert(Versioned.committedTag(spark, root).contains("bb"),
      "memo served the pre-recreate manifest")
  }

  test("explicit asOf of an unknown version stays loud on metadata surfaces") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L).toDF("id"), root, tag = Some("t1"))
    assert(Versioned.committedTag(spark, root, asOf = Some(1L)).contains("t1"))
    assert(Versioned.constraints(spark, root, asOf = Some(1L)).isEmpty)
    assert(Versioned.droppedColumns(spark, root, asOf = Some(1L)).isEmpty)
    Seq(
      () => Versioned.committedTag(spark, root, asOf = Some(7L)),
      () => Versioned.constraints(spark, root, asOf = Some(7L)),
      () => Versioned.droppedColumns(spark, root, asOf = Some(7L))
    ).foreach { probe =>
      val e = intercept[IllegalArgumentException](probe())
      assert(e.getMessage.contains("not found"), e.getMessage)
    }
  }

  test("vacuum reclaims orphaned manifest-dir staging debris, grace-respecting") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L).toDF("id"), root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a writer that died before its rename: a stale publish body and a
    // committer copy temp, plus a FRESH one a live writer just staged
    def stageTmp(name: String, old: Boolean): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root, s"_manifests/$name")
      val out = fs.create(p, true)
      try out.write("junk\n".getBytes("UTF-8")) finally out.close()
      if (old) fs.setTimes(p, System.currentTimeMillis() - 60000L, -1)
      p
    }
    val dead1 = stageTmp(".v9.deadbeef.txt.tmp", old = true)
    val dead2 = stageTmp(".claimpub-deadbeef.tmp", old = true)
    val fresh = stageTmp(".v9.fresh123.txt.tmp", old = false)
    // dry run names exactly the old debris; the real sweep removes it
    // and spares the in-flight writer's fresh staging
    val planned = Versioned.vacuumDryRun(spark, root, keepVersions = 1,
      graceMillis = 30000L)
    assert(planned.exists(_.endsWith(".v9.deadbeef.txt.tmp")))
    assert(!planned.exists(_.endsWith(".v9.fresh123.txt.tmp")))
    Versioned.vacuum(spark, root, keepVersions = 1, graceMillis = 30000L)
    assert(!fs.exists(dead1) && !fs.exists(dead2))
    assert(fs.exists(fresh), "a live writer's staging must survive grace")
    assert(Versioned.read(spark, root).count() == 1)
  }

  test("vacuum with a grace window reclaims a dead dir in the SAME pass") {
    // the dir-age gate must use the PRE-sweep dir mtime: this run's own
    // file deletes bump the dir's mtime, and a post-sweep stat would
    // defer the empty dir's reclaim a full vacuum cycle
    val root = tmpRoot()
    Versioned.commit(spark, Seq(1L).toDF("id"), root)
    Versioned.commit(spark, Seq(9L).toDF("id"), root, replace = true)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b1 = new org.apache.hadoop.fs.Path(root, "data/b1")
    val old = System.currentTimeMillis() - 60000L
    fs.listStatus(b1).foreach(s => fs.setTimes(s.getPath, old, -1))
    fs.setTimes(b1, old, -1)
    Versioned.vacuum(spark, root, keepVersions = 1, graceMillis = 30000L)
    assert(!fs.exists(b1), "dead dir survived its own sweep pass")
    assert(Versioned.read(spark, root).count() == 1)
  }
}
