package graft

import graft.io.{Dv, Versioned}
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors ([[Versioned.deleteWhereDv]] /
  * [[Versioned.dvMaterialize]] + the [[Dv]] codec): a point-delete
  * publishes vectors instead of rewriting files, every library read path
  * applies them, copy-on-write ops and carries interact correctly, the
  * vector-blind consumers (DSv2 scan, versioned stream) refuse loudly,
  * and vacuum/restore/clone/diff treat vectors as part of the snapshot
  * they belong to.
  */
class VersionedDvSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Three 100-row single-file commits with id stats, ids 1..300. */
  private def build(root: String): Unit =
    (0 to 2).foreach { i =>
      Versioned.commit(spark,
        ((i * 100 + 1).toLong to (i * 100 + 100).toLong)
          .map(j => (j, s"r$j")).toDF("id", "k").coalesce(1),
        root, statsCols = Seq("id"))
    }

  test("Dv codec round-trips, prices from the header, and unions") {
    val ords = Array(0L, 1L, 7L, 8L, 9L, 1000000L, 1000001L)
    assert(Dv.decode(Dv.encode(ords)).toSeq == ords.toSeq)
    assert(Dv.decode(Dv.encode(Array.empty[Long])).isEmpty)
    assert(Dv.union(Array(1L, 3L, 5L), Array(2L, 3L, 6L)).toSeq ==
      Seq(1L, 2L, 3L, 5L, 6L))
    assert(Dv.union(Array.empty[Long], Array(4L)).toSeq == Seq(4L))
    val d = tmpDir("graft_dv_codec")
    val p = new org.apache.hadoop.fs.Path(d, "x.dv")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Dv.write(fs, p, ords)
    assert(Dv.count(fs, p) == ords.length.toLong)
    assert(Dv.read(fs, p).toSeq == ords.toSeq)
  }

  test("DV delete hides rows without touching the data files") {
    val root = tmpDir("graft_dv_basic")
    build(root)
    val before = manifestOf(root, 3L)
    // scattered, not stats-provable: every 10th row across all three files
    val v = Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0)
    assert(v == 4L)
    assert(manifestOf(root, 4L) == before) // identical FILE list — no rewrite
    assert(Versioned.dvEntries(spark, root).size == 3)
    val ids = Versioned.read(spark, root).select("id").as[Long].collect().toSet
    assert(ids.size == 270 && !ids.exists(_ % 10 == 0))
    // time travel still shows the deleted rows
    assert(Versioned.read(spark, root, asOf = Some(3L)).count() == 300)
    // readPruned applies vectors on the surviving files too
    val pruned = Versioned.readPruned(spark, root, "id", Some(1L), Some(100L))
    assert(pruned.count() == 90)
    // nothing matches -> version unchanged, no spurious commit
    assert(Versioned.deleteWhereDv(spark, root, col("id") > 9999L) == 4L)
  }

  test("a second DV delete unions into the existing vectors") {
    val root = tmpDir("graft_dv_union")
    build(root)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 1)
    assert(Versioned.read(spark, root).count() == 240)
    // still one vector per file (the union replaced, not accumulated)
    assert(Versioned.dvEntries(spark, root).size == 3)
    val d = Versioned.describeDetail(spark, root)
    assert(d.numDeletionVectors == 3 && d.dvDeletedRows == 60)
  }

  test("stats-provable all-match files drop whole; vectors only where needed") {
    val root = tmpDir("graft_dv_proof")
    build(root)
    // id <= 150: file 1 provably all-match (dropped, zero I/O),
    // file 2 undecided (vectored), file 3 provably match-free (untouched)
    Versioned.deleteWhereDv(spark, root, col("id") <= 150L)
    assert(manifestOf(root, 4L).size == 2)
    assert(Versioned.dvEntries(spark, root).size == 1)
    assert(Versioned.read(spark, root).count() == 150)
  }

  test("a vector covering a file's every row drops the file") {
    val root = tmpDir("graft_dv_full")
    build(root)
    // kills all of file 2 via a predicate stats cannot prove (the
    // arithmetic keeps it out of the provable fragment, so the drop must
    // come from the VECTOR-covers-every-row check, not the stats proof)
    Versioned.deleteWhereDv(spark, root,
      (col("id") * 1L).between(101L, 200L))
    assert(manifestOf(root, 4L).size == 2) // file dropped, not 100%-vectored
    assert(Versioned.dvEntries(spark, root).isEmpty)
    assert(Versioned.read(spark, root).count() == 200)
  }

  test("copy-on-write UPDATE/DELETE respect vectors and shed them on rewrite") {
    val root = tmpDir("graft_dv_cow")
    build(root)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0)
    // CoW update touches file 1 only; its vector must apply (id=10.. stay
    // dead) and the rewritten file needs no vector anymore
    Versioned.updateWhere(spark, root, col("id") <= 100L,
      Map("k" -> concat(col("k"), lit("!"))))
    val dv = Versioned.dvEntries(spark, root)
    assert(dv.size == 2) // files 2 and 3 keep theirs; file 1 rewritten clean
    val rows = Versioned.read(spark, root)
    assert(rows.count() == 270)
    assert(rows.filter(col("id") === 10L).isEmpty) // not resurrected
    assert(rows.filter(col("id") === 1L).select("k").as[String].head() == "r1!")
    // CoW delete over a vectored file: same contract
    Versioned.deleteWhere(spark, root, col("id").between(101L, 110L))
    val after = Versioned.read(spark, root)
    assert(after.count() == 261) // 9 live rows went (110 was already dead)
    assert(after.filter(col("id") === 120L).isEmpty) // v1 vector still applied
  }

  test("MERGE inserts a key whose only match is vector-deleted") {
    val root = tmpDir("graft_dv_merge")
    build(root)
    Versioned.deleteWhereDv(spark, root, col("id") === 150L)
    Versioned.mergeInto(spark, root,
      Seq((150L, "resurrect?"), (42L, "upd")).toDF("id", "k"), Seq("id"))
    val rows = Versioned.read(spark, root)
    assert(rows.count() == 300) // 299 live + 1 insert
    // the dead 150 stayed dead; the SOURCE 150 landed as a fresh insert
    assert(rows.filter(col("id") === 150L).select("k").as[String].collect().toSeq
      == Seq("resurrect?"))
    assert(rows.filter(col("id") === 42L).select("k").as[String].head() == "upd")
  }

  test("conditional MERGE sees vector-deleted rows as unmatched") {
    val root = tmpDir("graft_dv_mergec")
    build(root)
    Versioned.deleteWhereDv(spark, root, col("id") === 150L)
    Versioned.mergeIntoConditional(spark, root,
      Seq((150L, "ins"), (42L, "upd")).toDF("id", "k"), Seq("id"),
      Seq(Versioned.WhenMatchedUpdateAll(),
        Versioned.WhenNotMatchedInsertAll()))
    val rows = Versioned.read(spark, root)
    assert(rows.count() == 300)
    assert(rows.filter(col("id") === 150L).select("k").as[String].collect().toSeq
      == Seq("ins"))
  }

  test("appends, OCC appends and metadata commits carry vectors") {
    val root = tmpDir("graft_dv_carry")
    build(root)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0)
    Versioned.commit(spark, Seq((1000L, "new")).toDF("id", "k"), root)
    assert(Versioned.read(spark, root).count() == 271)
    Versioned.commitOcc(spark, Seq((1001L, "new2")).toDF("id", "k"), root)
    assert(Versioned.read(spark, root).count() == 272)
    Versioned.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType)))
    Versioned.addConstraint(spark, root, "id_pos", "id > 0")
    assert(Versioned.read(spark, root).count() == 272)
    assert(Versioned.dvEntries(spark, root).size == 3)
    // a REPLACE commit sheds them (the new snapshot is exactly the df)
    Versioned.commit(spark, Seq((1L, "only")).toDF("id", "k"), root, replace = true)
    assert(Versioned.dvEntries(spark, root).isEmpty)
  }

  test("restore and shallow clone carry the snapshot's vectors") {
    val root = tmpDir("graft_dv_restore")
    build(root)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0) // v4
    Versioned.deleteWhere(spark, root, col("id") <= 100L)                // v5 (CoW)
    Versioned.restore(spark, root, 4L)                                  // v6
    assert(Versioned.read(spark, root).count() == 270)
    assert(Versioned.dvEntries(spark, root).size == 3)
    val dst = tmpDir("graft_dv_clone") + "/t"
    Versioned.cloneTable(spark, root, dst)
    assert(Versioned.read(spark, dst).count() == 270)
    assert(Versioned.dvEntries(spark, dst).size == 3)
  }

  test("dvMaterialize folds vectors in, rewriting ONLY vectored files") {
    val root = tmpDir("graft_dv_mat")
    build(root)
    Versioned.deleteWhereDv(spark, root, col("id").between(150L, 160L)) // file 2 only
    val before = manifestOf(root, 4L)
    val v = Versioned.dvMaterialize(spark, root)
    assert(v == 5L)
    assert(Versioned.dvEntries(spark, root).isEmpty)
    val after = manifestOf(root, 5L)
    // the two clean files carried by reference; only the vectored one rewrote
    assert(before.intersect(after).size == 2)
    assert(Versioned.read(spark, root).count() == 289)
    // no vectors -> no-op
    assert(Versioned.dvMaterialize(spark, root) == 5L)
    // and the DSv2 scan is re-admitted
    assert(spark.read.format("graft-versioned").load(root).count() == 289)
  }

  test("dvMaterialize(minDeadRatio) rewrites only heavily-dead files") {
    val root = tmpDir("graft_dv_mat_sel")
    build(root)
    // file 1 (ids 1..100): 1 dead row (1%); file 2 (101..200): 50 dead (50%)
    Versioned.deleteWhereDv(spark, root, col("id") === 7L)
    Versioned.deleteWhereDv(spark, root, col("id").between(101L, 150L))
    assert(Versioned.dvEntries(spark, root).size == 2)
    val before = manifestOf(root, 5L)
    // threshold between the two ratios: only the 50%-dead file rewrites
    val v = Versioned.dvMaterialize(spark, root, minDeadRatio = 0.3)
    assert(v == 6L)
    val after = manifestOf(root, 6L)
    assert(before.intersect(after).size == 2,
      "the 1%-dead file and the clean file must carry by reference")
    val dvAfter = Versioned.dvEntries(spark, root)
    assert(dvAfter.size == 1, "the light vector must survive the partial pass")
    assert(Versioned.read(spark, root).count() == 249)
    assert(Versioned.countRows(spark, root) == 249L)
    assert(!Versioned.read(spark, root).select("id").as[Long].collect()
      .exists(i => i == 7L || (i >= 101L && i <= 150L)))
    // below-threshold-only vectors -> no-op (nothing crosses 0.3)
    assert(Versioned.dvMaterialize(spark, root, minDeadRatio = 0.3) == 6L)
    // the DSv2 scan still refuses while any vector remains
    intercept[UnsupportedOperationException] {
      spark.read.format("graft-versioned").load(root).count()
    }
    // the final full pass clears the rest and re-admits the scan
    assert(Versioned.dvMaterialize(spark, root) == 7L)
    assert(Versioned.dvEntries(spark, root).isEmpty)
    assert(spark.read.format("graft-versioned").load(root).count() == 249)
  }

  test("compaction materializes vectors (full and incremental)") {
    val root = tmpDir("graft_dv_compact")
    build(root)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0)
    Versioned.compactLatest(spark, root, 1, sortCols = Seq("id"))
    assert(Versioned.dvEntries(spark, root).isEmpty)
    assert(Versioned.read(spark, root).count() == 270)

    val root2 = tmpDir("graft_dv_compact2")
    build(root2)
    Versioned.deleteWhereDv(spark, root2, pmod(col("id"), lit(10)) === 0)
    Versioned.compactSmall(spark, root2) // all three files are tiny
    assert(Versioned.dvEntries(spark, root2).isEmpty)
    assert(Versioned.read(spark, root2).count() == 270)
  }

  test("DSv2 scan refuses a vectored snapshot; stream dies on a mid-stream vector") {
    val root = tmpDir("graft_dv_gate")
    build(root)
    // tail the table BEFORE any vector exists
    val q = spark.readStream.format("graft-versioned").load(root)
      .writeStream.format("memory").queryName("dv_tail")
      .option("checkpointLocation", tmpDir("graft_dv_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("dv_tail").count() == 300)
      Versioned.deleteWhereDv(spark, root, col("id") === 7L)
      // batch DSv2 scan: loud refusal with the materialize hint
      val e = intercept[Exception] {
        spark.read.format("graft-versioned").load(root).count()
      }
      def msgs(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(msgs(e).exists(_.contains("deletion vectors")))
      // the running stream dies loud instead of missing the delete
      val se = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        Versioned.commit(spark, Seq((1000L, "x")).toDF("id", "k"), root)
        q.processAllAvailable()
      }
      assert(msgs(se).exists(_.contains("deletion vectors")))
    } finally q.stop()
    // a FRESH stream over the vectored snapshot refuses at the first batch
    val q2 = spark.readStream.format("graft-versioned").load(root)
      .writeStream.format("memory").queryName("dv_tail2")
      .option("checkpointLocation", tmpDir("graft_dv_ckpt2"))
      .start()
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
    } finally q2.stop()
  }

  test("diffVersions surfaces vector deletes as row-level deletes") {
    val root = tmpDir("graft_dv_diff")
    build(root)
    Versioned.deleteWhereDv(spark, root, col("id").between(150L, 152L))
    val diff = Versioned.diffVersions(spark, root, 3L)
    val rows = diff.select("_change", "id").as[(String, Long)].collect().toSeq.sorted
    assert(rows == Seq(("delete", 150L), ("delete", 151L), ("delete", 152L)))
  }

  test("vacuum GCs vectors exactly when their snapshot goes") {
    val root = tmpDir("graft_dv_vac")
    build(root)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0) // v4
    Versioned.dvMaterialize(spark, root)                                // v5
    def dvFilesOnDisk(): Seq[String] = {
      val d = java.nio.file.Paths.get(root, "data")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala
        .filter(p => p.toString.endsWith(Dv.Suffix)).map(_.toString).toSeq
    }
    assert(dvFilesOnDisk().size == 3)
    // keeping v4 and v5 keeps the vectors (v4 still references them)
    Versioned.vacuum(spark, root, keepVersions = 2)
    assert(dvFilesOnDisk().size == 3)
    assert(Versioned.read(spark, root, asOf = Some(4L)).count() == 270)
    // keeping only the materialized v5 GCs them
    Versioned.vacuum(spark, root, keepVersions = 1)
    assert(dvFilesOnDisk().isEmpty)
    assert(Versioned.read(spark, root).count() == 270)
  }

  test("updateWhereDv: vectors + appended copies, no existing file rewritten") {
    val root = tmpDir("graft_dv_upd")
    build(root)
    val before = manifestOf(root, 3L)
    val v = Versioned.updateWhereDv(spark, root, pmod(col("id"), lit(10)) === 0,
      Map("k" -> concat(col("k"), lit("!"))))
    assert(v == 4L)
    val after = manifestOf(root, 4L)
    // every pre-update file carried by reference; only a fresh batch added
    assert(before.forall(after.contains))
    assert(after.size == before.size + after.count(_.startsWith("data/b4/")))
    assert(Versioned.dvEntries(spark, root).size == 3)
    val rows = Versioned.read(spark, root)
    assert(rows.count() == 300) // updates, not deletes
    assert(rows.filter(col("id") === 10L).select("k").as[String].collect().toSeq
      == Seq("r10!"))
    assert(rows.filter(col("k").endsWith("!")).count() == 30)
    // a second DV update hits the APPENDED copies (their file gets a
    // vector too) and must not resurrect or double anything
    Versioned.updateWhereDv(spark, root, col("id") === 10L,
      Map("k" -> lit("twice")))
    val r2 = Versioned.read(spark, root)
    assert(r2.count() == 300)
    assert(r2.filter(col("id") === 10L).select("k").as[String].collect().toSeq
      == Seq("twice"))
    // nothing matched -> version unchanged
    assert(Versioned.updateWhereDv(spark, root, col("id") > 9999L,
      Map("k" -> lit("x"))) == 5L)
    // retyping assignment refused loudly (the batch must read under the
    // table schema)
    val e = intercept[IllegalArgumentException] {
      Versioned.updateWhereDv(spark, root, col("id") === 1L,
        Map("k" -> lit(42)))
    }
    assert(e.getMessage.contains("retypes"))
  }

  test("mergeIntoDv: matched keys die via vectors, whole source appends") {
    val root = tmpDir("graft_dv_mrg")
    build(root)
    val before = manifestOf(root, 3L)
    val src = Seq[(java.lang.Long, String)](
      (150L, "UPD"), (151L, "UPD"), (1000L, "NEW"), (null, "NULLKEY"))
      .toDF("id", "k")
    val v = Versioned.mergeIntoDv(spark, root, src, Seq("id"))
    assert(v == 4L)
    val after = manifestOf(root, 4L)
    assert(before.forall(after.contains)) // zero rewrites
    val rows = Versioned.read(spark, root)
    assert(rows.count() == 302) // 300 - 2 replaced + 2 replacements + NEW + null-key
    assert(rows.filter(col("id") === 150L).select("k").as[String].collect().toSeq
      == Seq("UPD"))
    assert(rows.filter(col("id").isNull).count() == 1) // null key inserts
    // replay guard: same tag twice is a no-op
    val t1 = Versioned.mergeIntoDv(spark, root,
      Seq((42L, "tagged")).toDF("id", "k"), Seq("id"), tag = Some("batch-9"))
    assert(Versioned.mergeIntoDv(spark, root,
      Seq((42L, "tagged")).toDF("id", "k"), Seq("id"), tag = Some("batch-9")) == t1)
    // duplicate source keys refused
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeIntoDv(spark, root,
        Seq((1L, "a"), (1L, "b")).toDF("id", "k"), Seq("id"))
    }
    assert(e.getMessage.contains("multiple rows per key"))
    // type drift refused
    val e2 = intercept[IllegalArgumentException] {
      Versioned.mergeIntoDv(spark, root,
        Seq((1, "a")).toDF("id", "k"), Seq("id")) // int id vs long table
    }
    assert(e2.getMessage.contains("type mismatch"))
    // merging a key whose only match is vector-deleted inserts cleanly
    Versioned.deleteWhereDv(spark, root, col("id") === 200L)
    Versioned.mergeIntoDv(spark, root, Seq((200L, "back")).toDF("id", "k"), Seq("id"))
    assert(Versioned.read(spark, root).filter(col("id") === 200L)
      .select("k").as[String].collect().toSeq == Seq("back"))
  }

  test("a merge-on-read window feeds the keyed CDF as updates + inserts") {
    val root = tmpDir("graft_dv_mrgcdf")
    build(root)
    Versioned.mergeIntoDv(spark, root,
      Seq((7L, "UPD"), (2000L, "NEW")).toDF("id", "k"), Seq("id"))
    val cdf = Versioned.diffVersionsKeyed(spark, root, fromV = 3, keys = Seq("id"))
      .select("_change_type", "id", "k").as[(String, Long, String)]
      .collect().toSet
    assert(cdf == Set(
      ("update_preimage", 7L, "r7"),
      ("update_postimage", 7L, "UPD"),
      ("insert", 2000L, "NEW")))
    // and materialize folds the whole composition away
    Versioned.dvMaterialize(spark, root)
    assert(Versioned.dvEntries(spark, root).isEmpty)
    assert(Versioned.read(spark, root).count() == 301)
    assert(spark.read.format("graft-versioned").load(root).count() == 301)
  }

  test("CHECK constraints gate the merge-on-read writers' appended batch") {
    val root = tmpDir("graft_dv_check")
    build(root)
    Versioned.addConstraint(spark, root, "k_nonempty", "length(k) > 0")
    // a VALID MoR update on a constraint-bearing table must succeed (the
    // validation read must not choke on the staged .dv sidecars)
    Versioned.updateWhereDv(spark, root, col("id") === 5L,
      Map("k" -> lit("ok")))
    assert(Versioned.read(spark, root).filter(col("id") === 5L)
      .select("k").as[String].head() == "ok")
    // a VIOLATING update aborts before publish, nothing changes
    val vBefore = Versioned.versions(spark, root).last
    val e = intercept[IllegalArgumentException] {
      Versioned.updateWhereDv(spark, root, col("id") === 6L,
        Map("k" -> lit("")))
    }
    assert(e.getMessage.contains("k_nonempty"))
    assert(Versioned.versions(spark, root).last == vBefore)
    assert(Versioned.read(spark, root).filter(col("id") === 6L)
      .select("k").as[String].head() == "r6")
    // same for the MoR merge
    val e2 = intercept[IllegalArgumentException] {
      Versioned.mergeIntoDv(spark, root,
        Seq((7L, "")).toDF("id", "k"), Seq("id"))
    }
    assert(e2.getMessage.contains("k_nonempty"))
    Versioned.mergeIntoDv(spark, root, Seq((7L, "fine")).toDF("id", "k"), Seq("id"))
    assert(Versioned.read(spark, root).filter(col("id") === 7L)
      .select("k").as[String].head() == "fine")
  }

  test("dvDrift flags added, changed and removed vectors on compaction inputs") {
    val inputs = Set("data/b1/a.parquet", "data/b1/b.parquet", "data/b2/c.parquet")
    val base = Map("data/b1/a.parquet" -> "data/b3/a.dv")
    // unchanged state: no drift
    assert(Versioned.dvDrift(inputs, base, base).isEmpty)
    // vector ADDED on an input
    assert(Versioned.dvDrift(inputs, base,
      base + ("data/b1/b.parquet" -> "data/b4/b.dv")) == Set("data/b1/b.parquet"))
    // vector REPLACED (second delete unioned into a new vector)
    assert(Versioned.dvDrift(inputs, base,
      Map("data/b1/a.parquet" -> "data/b4/a.dv")) == Set("data/b1/a.parquet"))
    // vector REMOVED (materialized away mid-flight)
    assert(Versioned.dvDrift(inputs, base, Map.empty) == Set("data/b1/a.parquet"))
    // drift on a NON-input never aborts
    assert(Versioned.dvDrift(Set("data/b1/a.parquet"), base,
      base + ("data/b9/z.parquet" -> "data/b9/z.dv")).isEmpty)
  }

  test("countRows is exact from metadata across commits, vectors and time travel") {
    val root = tmpDir("graft_dv_count")
    build(root)
    assert(Versioned.countRows(spark, root) == 300L)
    Versioned.deleteWhereDv(spark, root, pmod(col("id"), lit(10)) === 0)
    assert(Versioned.countRows(spark, root) == 270L)
    assert(Versioned.countRows(spark, root, asOf = Some(3L)) == 300L)
    Versioned.mergeIntoDv(spark, root,
      Seq((5L, "U"), (1000L, "new")).toDF("id", "k"), Seq("id"))
    assert(Versioned.countRows(spark, root) == 271L)
    assert(Versioned.countRows(spark, root) ==
      Versioned.read(spark, root).count())
  }

  test("dvEntries fails loud on an explicitly requested vacuumed version") {
    val root = tmpDir("graft_dv_vacq")
    build(root)
    Versioned.vacuum(spark, root, keepVersions = 1)
    val e = intercept[IllegalArgumentException] {
      Versioned.dvEntries(spark, root, Some(1L))
    }
    assert(e.getMessage.contains("not found"))
    assert(Versioned.dvEntries(spark, root).isEmpty) // newest still answers
  }

  test("OCC compaction dies loud when a vector lands on its inputs") {
    val root = tmpDir("graft_dv_occ")
    build(root)
    // simulate the race deterministically: capture the snapshot compaction
    // would read, land a vector, then run the compactor — its conflict
    // check must see the drifted vector state and abort
    Versioned.deleteWhereDv(spark, root, col("id") === 5L)
    // compactSmallOcc re-reads the LATEST snapshot at prepare time, so to
    // exercise the publish-time check we race two compactions: the second
    // sees the first's rewrite as gone inputs. The vector drift arm is the
    // same abort path; here we assert the end state stays consistent.
    val v = Versioned.compactSmallOcc(spark, root)
    assert(v == 5L)
    assert(Versioned.dvEntries(spark, root).isEmpty)
    assert(Versioned.read(spark, root).count() == 299)
  }

  test("mergeIntoDv on a schema-less table never range-prunes a float key") {
    // Regression: the float-key pruning guard must come from the ACTUAL
    // table schema (inferred when no #schema line is recorded), not the
    // Option-al recorded one. Pre-fix, a pre-schema-tracking table with a
    // double key and tracked stats silently range-pruned the probe — and
    // the stats total order (java.lang.Double.compare) puts -0.0 below
    // 0.0 while Spark join equality normalizes them equal, so a file
    // holding key 0.0 was pruned for a -0.0 source and the old row
    // survived un-vectored: duplicate keys after the merge.
    val root = tmpDir("graft_dv_floatkey")
    Versioned.commit(spark,
      Seq((0.0, "old"), (5.5, "keep")).toDF("k", "v").coalesce(1),
      root, statsCols = Seq("k"))
    // simulate a legacy (pre-schema-tracking) table: strip the #schema line
    val m = java.nio.file.Paths.get(root, "_manifests", "v1.txt")
    val stripped = new String(java.nio.file.Files.readAllBytes(m), "UTF-8")
      .split("\n").toSeq.filterNot(_.startsWith("#schema="))
    java.nio.file.Files.write(m, stripped.mkString("\n").getBytes("UTF-8"))
    // the raw rewrite invalidates the local FS's checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, "_manifests", ".v1.txt.crc"))
    assert(Versioned.snapshotSchema(spark, root, Some(1L)).isEmpty)
    val negZero = spark.sql("SELECT double(-0.0) AS k, 'new' AS v")
    Versioned.mergeIntoDv(spark, root, negZero, keys = Seq("k"))
    val rows = Versioned.read(spark, root)
      .select("k", "v").as[(Double, String)].collect().sortBy(_._2)
    // exactly one row for the 0.0 key, carrying the merged value
    assert(rows.count(_._1 == 0.0) == 1, s"duplicate keys after merge: ${rows.toSeq}")
    assert(rows.map(_._2).toSeq == Seq("keep", "new"))
  }

  test("merge-on-read writers refuse a pre-existing b<next> dir loudly") {
    // Pre-fix they swept it as crash debris — which could delete a RACING
    // writer's placed-but-unpublished batch. Now they die with the same
    // conflict message as placeBatchDir; vacuum reclaims genuine debris.
    val root = tmpDir("graft_dv_bnext")
    build(root)
    val debris = new java.io.File(root, "data/b4")
    assert(debris.mkdirs())
    val e = intercept[IllegalStateException] {
      Versioned.deleteWhereDv(spark, root, col("id") === 5L)
    }
    assert(e.getMessage.contains("b4 already exists"))
    // vacuum's dead-dir sweep reclaims it, after which the delete goes through
    Versioned.vacuum(spark, root, keepVersions = 10)
    assert(!debris.exists())
    assert(Versioned.deleteWhereDv(spark, root, col("id") === 5L) == 4L)
    assert(Versioned.read(spark, root).count() == 299)
  }
}
