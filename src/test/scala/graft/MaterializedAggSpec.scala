package graft

import graft.io.Versioned
import graft.ops.MaterializedAgg
import org.apache.spark.sql.functions._

/** The incrementally-maintained aggregate must equal the full recompute
  * after every refresh, skip already-covered versions (replay safety),
  * fold multi-commit gaps in one delta read, and refuse a source vacuumed
  * past its high-water mark instead of silently double-counting.
  */
class MaterializedAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_magg").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def batch(rows: (String, Double)*) = rows.toSeq.toDF("k", "x")

  private def asMap(root: String): Map[String, (Long, BigDecimal)] =
    Versioned.read(spark, root)
      .select("k", "cnt", "sum_x").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  test("state equals full recompute after every refresh") {
    val src = tmpRoot(); val state = tmpRoot()
    val batches = Seq(
      batch("a" -> 1.5, "b" -> 2.0),
      batch("a" -> 3.25, "c" -> 4.0),
      batch("b" -> -2.0, "c" -> 0.125, "a" -> 10.0))
    batches.foreach { b =>
      Versioned.commit(spark, b, src)
      val covered = MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
      assert(covered == Versioned.versions(spark, src).last)
      val expect = MaterializedAgg.aggregate(
        Versioned.read(spark, src), Seq("k"), Seq("x"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
      assert(asMap(state) == expect)
    }
    assert(asMap(state) == Map(
      "a" -> ((3L, BigDecimal("14.750000"))),
      "b" -> ((2L, BigDecimal("0.000000"))),
      "c" -> ((2L, BigDecimal("4.125000")))))
  }

  test("replayed refresh is a no-op; a multi-commit gap folds in one delta") {
    val src = tmpRoot(); val state = tmpRoot()
    Versioned.commit(spark, batch("a" -> 1.0), src)
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    val v1 = Versioned.versions(spark, state)
    // replay: no new source commits -> no new state version
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    assert(Versioned.versions(spark, state) == v1)
    // two source commits, one refresh: delta covers both
    Versioned.commit(spark, batch("a" -> 2.0), src)
    Versioned.commit(spark, batch("b" -> 5.0), src)
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    assert(asMap(state) == Map(
      "a" -> ((2L, BigDecimal("3.000000"))),
      "b" -> ((1L, BigDecimal("5.000000")))))
  }

  test("source vacuumed past the covered version fails loudly") {
    val src = tmpRoot(); val state = tmpRoot()
    Versioned.commit(spark, batch("a" -> 1.0), src)
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    Versioned.commit(spark, batch("b" -> 2.0), src)
    Versioned.commit(spark, batch("c" -> 3.0), src, replace = true)
    Versioned.vacuum(spark, src, keepVersions = 1) // drops v1, the covered version
    val err = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    }
    assert(err.getMessage.contains("no longer exists"))
  }

  test("a replace/compaction between refreshes is refused, not double-counted") {
    val src = tmpRoot(); val state = tmpRoot()
    Versioned.commit(spark, batch("a" -> 1.0), src)
    Versioned.commit(spark, batch("a" -> 2.0), src)
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    // compaction rewrites rows the state already folded; folding the
    // "delta" (= the whole compacted table) would double-count silently
    Versioned.compactLatest(spark, src, nFiles = 1)
    val err = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    }
    assert(err.getMessage.contains("not append-only"))
    // prior state remains intact and correct
    assert(asMap(state) == Map("a" -> ((2L, BigDecimal("3.000000")))))
  }

  test("a crashed refresh leaves the prior state readable and re-runnable") {
    val src = tmpRoot(); val state = tmpRoot()
    Versioned.commit(spark, batch("a" -> 1.0), src)
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    Versioned.commit(spark, batch("a" -> 2.0), src)
    // simulate a refresh that died before its manifest rename: data debris
    // plus a temp manifest, no published v2
    new java.io.File(state, "data/b2").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(state, "_manifests/.v2.txt.tmp").toPath,
      "data/b2/junk.parquet\n".getBytes)
    assert(asMap(state) == Map("a" -> ((1L, BigDecimal("1.000000")))))
    MaterializedAgg.refresh(spark, src, state, Seq("k"), Seq("x"))
    assert(asMap(state) == Map("a" -> ((2L, BigDecimal("3.000000")))))
  }
}
