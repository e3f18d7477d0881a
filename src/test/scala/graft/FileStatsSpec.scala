package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** readPruned must open only the files whose footer min/max can overlap
  * the range — and return exactly what a full-scan filter returns, with or
  * without stats coverage (stats are advisory, never load-bearing).
  */
class FileStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stats").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("long-column range prune opens only overlapping files") {
    val root = tmpRoot()
    // three commits with disjoint id ranges -> one file each
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { r =>
      Versioned.commit(spark, r.toDF("id").coalesce(1), root,
        statsCols = Seq("id"))
    }
    val pruned = Versioned.readPruned(spark, root, "id", Some(120L), Some(180L))
    assert(pruned.inputFiles.length == 1, s"files: ${pruned.inputFiles.toSeq}")
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == (120L to 180L))
    // open upper bound
    val ge = Versioned.readPruned(spark, root, "id", Some(250L), None)
    assert(ge.inputFiles.length == 1)
    assert(ge.count() == 51)
  }

  test("string-column prune works and survives delimiter-hostile values") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq("alpha", "beta\tgamma", "b|pipe").toDF("s").coalesce(1), root,
      statsCols = Seq("s"))
    Versioned.commit(spark,
      Seq("delta", "epsilon\nzeta").toDF("s").coalesce(1), root,
      statsCols = Seq("s"))
    val pruned = Versioned.readPruned(spark, root, "s", Some("d"), Some("f"))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("s").as[String].collect().toSet ==
      Set("delta", "epsilon\nzeta"))
  }

  test("timestamp-column prune compares in the column's own unit") {
    val root = tmpRoot()
    // Spark's default INT96 timestamps carry no usable parquet stats; the
    // shared TestSpark session pins TIMESTAMP_MICROS (INT64) globally for
    // the same reason the lake formats default to it — relied on here and
    // by RetentionProofSpec, so it must NOT be unset per-test
    val jan = Seq(java.sql.Timestamp.from(java.time.Instant.parse("1997-01-15T00:00:00Z")))
    val jul = Seq(java.sql.Timestamp.from(java.time.Instant.parse("1997-07-15T00:00:00Z")))
    Versioned.commit(spark, jan.toDF("ts").coalesce(1), root, statsCols = Seq("ts"))
    Versioned.commit(spark, jul.toDF("ts").coalesce(1), root, statsCols = Seq("ts"))
    val pruned = Versioned.readPruned(spark, root, "ts",
      Some(java.time.Instant.parse("1997-06-01T00:00:00Z")), None)
    assert(pruned.inputFiles.length == 1)
    assert(pruned.count() == 1)
  }

  test("date-column prune uses epoch-day stats with LocalDate bounds") {
    val root = tmpRoot()
    val d1 = Seq(java.sql.Date.valueOf("1997-01-15"), java.sql.Date.valueOf("1997-02-15"))
    val d2 = Seq(java.sql.Date.valueOf("1997-07-15"), java.sql.Date.valueOf("1997-08-15"))
    Versioned.commit(spark, d1.toDF("d").coalesce(1), root, statsCols = Seq("d"))
    Versioned.commit(spark, d2.toDF("d").coalesce(1), root, statsCols = Seq("d"))
    val pruned = Versioned.readPruned(spark, root, "d",
      Some(java.time.LocalDate.parse("1997-06-01")),
      Some(java.time.LocalDate.parse("1997-07-31")))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("d").as[java.sql.Date].collect().toSeq ==
      Seq(java.sql.Date.valueOf("1997-07-15")))
  }

  test("string prune orders by UTF-8 bytes, not UTF-16 code units") {
    val root = tmpRoot()
    // U+FFFF sorts ABOVE U+1F600 in UTF-16 code units but BELOW it in
    // UTF-8 bytes (parquet's and Spark's order); code-unit comparison
    // would prune this file for lo = "￿" and lose a matching row
    Versioned.commit(spark,
      Seq("￿", "😀").toDF("s").coalesce(1), root,
      statsCols = Seq("s"))
    val pruned = Versioned.readPruned(spark, root, "s", Some("￿"), None)
    assert(pruned.inputFiles.length == 1)
    assert(pruned.count() == 2) // both values are >= "￿" in UTF-8 order
    val expect = Versioned.read(spark, root)
      .filter(col("s") >= "￿").count()
    assert(pruned.count() == expect)
  }

  test("compactLatest refreshes stats so pruning survives compaction") {
    val root = tmpRoot()
    (0 until 10).foreach { i =>
      Versioned.commit(spark,
        (i * 100L until (i + 1) * 100L).toDF("id").coalesce(1), root,
        statsCols = Seq("id"))
    }
    Versioned.compactLatest(spark, root, nFiles = 5, sortCols = Seq("id"))
    Versioned.vacuum(spark, root, keepVersions = 1)
    val pruned = Versioned.readPruned(spark, root, "id", Some(250L), Some(350L))
    assert(pruned.inputFiles.length < 5,
      s"compaction should refresh stats; opened ${pruned.inputFiles.length} of 5")
    assert(pruned.count() == 101)
  }

  test("a misspelled stats column fails the commit loudly") {
    val root = tmpRoot()
    val err = intercept[IllegalArgumentException] {
      Versioned.commit(spark, (1L to 10L).toDF("id"), root,
        statsCols = Seq("idd"))
    }
    assert(err.getMessage.contains("idd"))
  }

  test("files without stats are kept; result equals full-scan filter") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    // a commit WITHOUT stats: must always be read
    Versioned.commit(spark, (500L to 600L).toDF("id").coalesce(1), root)
    val pruned = Versioned.readPruned(spark, root, "id", Some(50L), Some(60L))
    assert(pruned.inputFiles.length == 2) // stats-less file cannot be skipped
    val expect = Versioned.read(spark, root)
      .filter(col("id").between(50L, 60L)).as[Long].collect().sorted.toSeq
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == expect)
  }

  test("nulls in the stats column never break pruning") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq(Some(1L), None, Some(10L)).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.commit(spark,
      Seq(Some(100L), Some(200L)).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    val pruned = Versioned.readPruned(spark, root, "id", Some(5L), Some(20L))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(10L))
    assert(pruned.inputFiles.length == 1)
  }

  test("range-clustered commit prunes within one batch's files") {
    val root = tmpRoot()
    val df = (1L to 10000L).toDF("id")
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
    Versioned.commit(spark, df, root, statsCols = Seq("id"))
    val all = Versioned.read(spark, root)
    assert(all.inputFiles.length == 8)
    val pruned = Versioned.readPruned(spark, root, "id", Some(4000L), Some(4200L))
    assert(pruned.inputFiles.length <= 2,
      s"expected <=2 of 8 files, got ${pruned.inputFiles.length}")
    assert(pruned.count() == 201)
  }

  test("vacuum after a stats-bearing replace drops the old sidecar cleanly") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 10L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.commit(spark, (11L to 20L).toDF("id").coalesce(1), root,
      replace = true, statsCols = Seq("id"))
    Versioned.vacuum(spark, root, keepVersions = 1)
    val b1 = new java.io.File(root, "data/b1")
    assert(!b1.exists(), "vacuum should remove the emptied batch dir and its sidecar")
    val pruned = Versioned.readPruned(spark, root, "id", Some(15L), None)
    assert(pruned.count() == 6)
  }

  test("containsProbe (decode-once point containment) matches mayContain " +
    "verdict for verdict across every tag domain") {
    import graft.io.FileStats
    val b64 = (s: String) =>
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val cases: Seq[(FileStats.ColStats, Seq[Any])] = Seq(
      // inside / boundary / outside / wrong-domain / null per tag
      FileStats.ColStats("long", "10", "20") ->
        Seq(5L, 10L, 15.toShort, 20, 21L, "x", null),
      FileStats.ColStats("double", "1.5", "2.5") ->
        Seq(1.0, 1.5f, 2.0, 2.5, 3.0, 2L, "x", null),
      FileStats.ColStats("string", b64("bb"), b64("dd")) ->
        Seq("a", "bb", "cc", "dd", "ee", 7, null),
      FileStats.ColStats("date", "100", "200") ->
        Seq(java.time.LocalDate.ofEpochDay(50),
          java.time.LocalDate.ofEpochDay(150),
          java.time.LocalDate.ofEpochDay(250), 150L, null),
      FileStats.ColStats("ts-micros", "1000000", "2000000") ->
        Seq(java.time.Instant.ofEpochSecond(0),
          java.time.Instant.ofEpochSecond(1),
          java.time.Instant.ofEpochSecond(3), "x", null))
    for ((cs, vs) <- cases; st <- Seq(Some(cs), None)) {
      val probe = FileStats.containsProbe(st)
      for (v <- vs)
        assert(probe(v) == FileStats.mayContain(st, Some(v), Some(v)),
          s"diverged on stats=$st value=$v")
    }
  }
}
