package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Copy-on-write DELETE/UPDATE on [[Versioned]] tables: only files that
  * contain matching rows are rewritten (untouched files are carried into
  * the new manifest by reference — the property that makes a one-day
  * delete on a 100 TB table rewrite one day's files), SQL semantics hold
  * (NULL predicate rows survive a delete), readers time-travel to the
  * pre-delete snapshot, and stats sidecars survive the rewrite so file
  * skipping keeps working afterwards.
  */
class DeleteUpdateSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cow").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("deleteWhere rewrites only the touched files and keeps SQL null semantics") {
    val root = tmpRoot()
    // three single-file batches banded by id; nulls land in the middle band
    Versioned.commit(spark, (1L to 100L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark,
      ((101L to 199L).map(i => (i, s"r$i")) :+ ((200L, null: String)))
        .toDF("id", "k").coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (201L to 300L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    val before = manifestOf(root, 3L)
    assert(before.size == 3)

    // predicate true only inside the middle band; NULL for the null-k row
    val v4 = Versioned.deleteWhere(spark, root,
      col("id").between(150L, 180L) && col("k").isNotNull)
    assert(v4 == 4L)
    val after = manifestOf(root, 4L)
    // the two untouched band files are carried by reference, byte-identical
    assert(after.filter(before.contains).size == 2,
      s"expected 2 carried files, manifest: $after")
    val now = Versioned.read(spark, root)
    assert(now.count() == 300 - 31)
    assert(now.filter(col("id").between(150L, 180L)).count() == 0)
    // NULL-predicate row survives (k IS NULL makes the conjunction NULL)
    assert(now.filter(col("id") === 200L).count() == 1)
    // time travel still sees the deleted rows
    assert(Versioned.read(spark, root, asOf = Some(3L)).count() == 300)
  }

  test("deleteWhere with no matches is a no-op; stats survive a real delete") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.commit(spark, (101L to 200L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    assert(Versioned.deleteWhere(spark, root, col("id") > 1000L) == 2L)
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))
    // delete inside band 1, then range-scan band 1: pruning still works
    Versioned.deleteWhere(spark, root, col("id").between(10L, 20L))
    val pruned = Versioned.readPruned(spark, root, "id", Some(150L), Some(160L))
    assert(pruned.as[Long].collect().sorted.toSeq == (150L to 160L))
    assert(Versioned.readPruned(spark, root, "id", Some(1L), Some(30L))
      .as[Long].collect().sorted.toSeq == ((1L to 9L) ++ (21L to 30L)))
  }

  test("updateWhere rewrites matching rows in place, assignments see old values") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "x", "k").coalesce(1), root)
    Versioned.commit(spark,
      Seq((3L, 30.0, "c"), (4L, 40.0, "d")).toDF("id", "x", "k").coalesce(1), root)
    val before = manifestOf(root, 2L)
    Versioned.updateWhere(spark, root, col("k") === "c",
      Map("x" -> (col("x") * 2), "k" -> upper(col("k"))))
    val after = manifestOf(root, 3L)
    assert(after.filter(before.contains).size == 1, "batch 1 must be carried untouched")
    val rows = Versioned.read(spark, root).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(rows(3L) == ((60.0, "C")))
    assert(rows(4L) == ((40.0, "d")), "non-matching row in the touched file unchanged")
    assert(rows(1L) == ((10.0, "a")))
    // assigning to a column that does not exist fails loudly
    intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, root, col("id") === 1L, Map("nope" -> lit(1)))
    }
  }

  test("a delete trips the materialized view's append-only guard") {
    val root = tmpRoot()
    val state = tmpRoot()
    Versioned.commit(spark, Seq(("a", 1.0), ("b", 2.0)).toDF("k", "x"), root)
    graft.ops.MaterializedAgg.refresh(spark, root, state, Seq("k"), Seq("x"))
    Versioned.deleteWhere(spark, root, col("k") === "a")
    val err = intercept[IllegalArgumentException] {
      graft.ops.MaterializedAgg.refresh(spark, root, state, Seq("k"), Seq("x"))
    }
    assert(err.getMessage.contains("append-only"))
  }
}
