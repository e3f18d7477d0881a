package graft

import graft.io.Versioned
import graft.io.Versioned._
import org.apache.spark.sql.functions._

/** Generalized (conditional / multi-clause) copy-on-write MERGE on
  * [[Versioned]] tables: conditional WHEN MATCHED UPDATE-ALL/DELETE with
  * first-match-wins clause order, conditional inserts, NOT MATCHED BY
  * SOURCE update/delete, null-key semantics, the duplicate-source-key
  * rule, and the file-level scale contract (untouched files carried by
  * reference; matched-clause probe range-pruned by sidecar stats).
  */
class ConditionalMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cmerge").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Three single-file banded batches, ids 1..300, value = id, src = "old". */
  private def bandedTable(): String = {
    val root = tmpRoot()
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { band =>
      Versioned.commit(spark, band.map(i => (i, i * 1.0, "old"))
        .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    }
    root
  }

  test("conditional matched update fires only where the condition holds") {
    val root = bandedTable()
    // all of 150..160 match; only even ids may update; no insert clause,
    // so the unmatched source rows (1000..) silently drop
    val source = ((150L to 160L) ++ Seq(1000L)).map(i => (i, -1.0, "new"))
      .toDF("id", "x", "src")
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenMatchedUpdateAll(Some(col("__s.id") % 2 === 0))))
    val now = Versioned.read(spark, root)
    assert(now.count() == 300) // nothing inserted, nothing deleted
    assert(now.filter($"src" === "new").select("id").as[Long].collect().toSet
      == (150L to 160L).filter(_ % 2 == 0).toSet)
    // odd matched rows kept their OLD values (condition false => no-op)
    assert(now.filter($"id" === 151L && $"src" === "old" && $"x" === 151.0).count() == 1)
  }

  test("clause order is first-match-wins: update before delete") {
    val root = bandedTable()
    val source = (150L to 160L).map(i => (i, -1.0, "new")).toDF("id", "x", "src")
    // update wins for even ids, delete catches the rest
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenMatchedUpdateAll(Some(col("__s.id") % 2 === 0)),
      WhenMatchedDelete(None)))
    val now = Versioned.read(spark, root)
    assert(now.filter($"src" === "new").count() == 6)  // 150,152,...,160
    assert(now.filter($"id".between(150L, 160L)).count() == 6) // odds deleted
    assert(now.count() == 300 - 5)
  }

  test("delete-only merge accepts a key-only source and prunes by key range") {
    val root = bandedTable()
    // key-only source: no whole-row clause, so x/src need not be supplied
    val source = (150L to 155L).toDF("id")
    val before = manifestOf(root, 3L)
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenMatchedDelete(None)))
    val after = manifestOf(root, 4L)
    // bands 1 and 3 carried by reference (range-pruned probe + untouched)
    assert(after.count(before.contains) == 2, s"manifest: $after")
    val now = Versioned.read(spark, root)
    assert(now.count() == 294)
    assert(now.filter($"id".between(150L, 155L)).count() == 0)
  }

  test("conditional insert admits only passing source rows") {
    val root = bandedTable()
    val source = (1000L to 1009L).map(i => (i, i * 1.0, "new")).toDF("id", "x", "src")
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenNotMatchedInsertAll(Some(col("__s.id") % 2 === 0))))
    val now = Versioned.read(spark, root)
    assert(now.count() == 305)
    assert(now.filter($"id" >= 1000L).select("id").as[Long].collect().toSet
      == (1000L to 1009L).filter(_ % 2 == 0).toSet)
  }

  test("matched source rows never insert, even when no matched clause fires") {
    val root = bandedTable()
    // id 150 matches; the update condition is false for it; it must NOT
    // fall through to the insert clause (SQL: matched rows are matched)
    val source = Seq((150L, -1.0, "new"), (1000L, -1.0, "new")).toDF("id", "x", "src")
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenMatchedUpdateAll(Some(lit(false))),
      WhenNotMatchedInsertAll(None)))
    val now = Versioned.read(spark, root)
    assert(now.count() == 301)
    assert(now.filter($"id" === 150L && $"src" === "old").count() == 1)
    assert(now.filter($"id" === 1000L).count() == 1)
  }

  test("NOT MATCHED BY SOURCE delete and update, carrying unaffected files") {
    val root = bandedTable()
    // source covers band 2 entirely + band 1 entirely; band 3 is unmatched
    val source = (1L to 200L).toDF("id")
    val before = manifestOf(root, 3L)
    // delete unmatched rows above 250, flag unmatched rows 201..250
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenNotMatchedBySourceDelete(Some(col("__t.id") > 250)),
      WhenNotMatchedBySourceUpdate(None, Map("src" -> lit("orphan")))))
    val after = manifestOf(root, 4L)
    // bands 1 and 2 contain no firing rows: carried by reference
    assert(after.count(before.contains) == 2, s"manifest: $after")
    val now = Versioned.read(spark, root)
    assert(now.count() == 250)
    assert(now.filter($"src" === "orphan").select("id").as[Long].collect().toSet
      == (201L to 250L).toSet)
    assert(now.filter($"src" === "old").count() == 200)
  }

  test("null-key source rows insert; null-key target rows are NMBS candidates") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "tnull")).toDF("id", "k").coalesce(1), root)
    val source = Seq((java.lang.Long.valueOf(1L), "A"),
      (null.asInstanceOf[java.lang.Long], "snull")).toDF("id", "k")
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenMatchedUpdateAll(None),
      WhenNotMatchedInsertAll(None),
      WhenNotMatchedBySourceUpdate(None, Map("k" -> lit("unmatched")))))
    val now = Versioned.read(spark, root).as[(Option[Long], String)].collect().toSet
    assert(now == Set(
      (Some(1L), "A"),          // matched, replaced
      (None, "unmatched"),      // null-keyed target row: NMBS fired
      (None, "snull")))         // null-keyed source row: inserted
  }

  test("duplicate source keys without matched clauses never fan out target rows") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "t1"), (2L, "t2")).toDF("id", "k")
      .coalesce(1), root)
    // duplicate key 1 is LEGAL here (no matched clause -> no dup check);
    // the rewrite join must use the distinct key set, or target row id=1
    // would appear twice in the rewritten file
    val dup = Seq((1L, "s1a"), (1L, "s1b"), (9L, "s9")).toDF("id", "k")
    Versioned.mergeIntoConditional(spark, root, dup, Seq("id"), Seq(
      WhenNotMatchedInsertAll(None),
      WhenNotMatchedBySourceUpdate(None, Map("k" -> lit("orphan")))))
    val now = Versioned.read(spark, root).as[(Long, String)].collect().toSeq
    assert(now.count(_._1 == 1L) == 1, s"row id=1 duplicated: $now")
    assert(now.toSet == Set(
      (1L, "t1"),       // matched (no matched clause): unchanged, ONCE
      (2L, "orphan"),   // unmatched target: NMBS update
      (9L, "s9")))      // unmatched source: inserted
  }

  test("duplicate source keys rejected with matched clauses, allowed insert-only") {
    val root = bandedTable()
    val dup = Seq((150L, 1.0, "d"), (150L, 2.0, "d")).toDF("id", "x", "src")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeIntoConditional(spark, root, dup, Seq("id"), Seq(
        WhenMatchedDelete(None)))
    }
    assert(e.getMessage.contains("multiple rows per key"))
    // insert-only: SQL inserts every unmatched source row, duplicates too
    val dupNew = Seq((1000L, 1.0, "d"), (1000L, 2.0, "d")).toDF("id", "x", "src")
    Versioned.mergeIntoConditional(spark, root, dupNew, Seq("id"), Seq(
      WhenNotMatchedInsertAll(None)))
    assert(Versioned.read(spark, root).filter($"id" === 1000L).count() == 2)
  }

  test("unconditional upsert via conditional path equals mergeInto") {
    val rootA = bandedTable()
    val rootB = bandedTable()
    val source = ((150L to 160L) ++ (1000L to 1005L))
      .map(i => (i, -1.0, "new")).toDF("id", "x", "src")
    Versioned.mergeInto(spark, rootA, source, Seq("id"))
    Versioned.mergeIntoConditional(spark, rootB, source, Seq("id"), Seq(
      WhenMatchedUpdateAll(None), WhenNotMatchedInsertAll(None)))
    val a = Versioned.read(spark, rootA).as[(Long, Double, String)].collect().toSet
    val b = Versioned.read(spark, rootB).as[(Long, Double, String)].collect().toSet
    assert(a == b && a.size == 306)
  }

  test("merge into an empty (CREATE TABLE) table inserts through the schema") {
    val root = tmpRoot()
    // empty v1 carrying the declared schema, as the catalog's CREATE TABLE does
    Versioned.commit(spark, Seq.empty[(Long, String)].toDF("id", "k"), root)
    Versioned.mergeIntoConditional(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "k"), Seq("id"), Seq(
        WhenMatchedUpdateAll(None), WhenNotMatchedInsertAll(None)))
    assert(Versioned.read(spark, root).count() == 2)
  }

  test("conditions crossing both sides see old target and source values") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "x").coalesce(1), root)
    // replace only where the source beats the target value
    val source = Seq((1L, 15.0), (2L, 5.0), (3L, 35.0)).toDF("id", "x")
    Versioned.mergeIntoConditional(spark, root, source, Seq("id"), Seq(
      WhenMatchedUpdateAll(Some(col("__s.x") > col("__t.x")))))
    val now = Versioned.read(spark, root).as[(Long, Double)].collect().toSet
    assert(now == Set((1L, 15.0), (2L, 20.0), (3L, 35.0)))
  }

  test("mergeInto schemaEvolution adds source columns and widens types") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1, "a"), (2, "b")).toDF("id", "k")
      .selectExpr("CAST(id AS INT) AS id", "k").coalesce(1), root)
    // source: wider key (long) + a brand-new column
    val source = Seq((2L, "B", 0.5), (3L, "C", 0.7)).toDF("id", "k", "score")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root, source, Seq("id"))
    }
    assert(e.getMessage.contains("absent from the table"))
    Versioned.mergeInto(spark, root, source, Seq("id"), schemaEvolution = true)
    val now = Versioned.read(spark, root)
    assert(now.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(now.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(now.as[(Long, String, Option[Double])].collect().toSet == Set(
      (1L, "a", None),        // untouched row: new column reads null
      (2L, "B", Some(0.5)),   // matched row replaced whole
      (3L, "C", Some(0.7))))  // inserted
    // a NARROWER source against the now-long key upcasts instead of failing
    val narrow = Seq((4, "d", 1.0)).toDF("id", "k", "score")
      .selectExpr("CAST(id AS INT) AS id", "k", "score")
    Versioned.mergeInto(spark, root, narrow, Seq("id"), schemaEvolution = true)
    assert(Versioned.read(spark, root).count() == 4)
    // off the lattice stays refused even with the flag
    val bad = Seq((5L, 9L, 1.0)).toDF("id", "k", "score")
    val e2 = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root, bad, Seq("id"), schemaEvolution = true)
    }
    assert(e2.getMessage.contains("not a value-preserving widening"))
  }

  test("no-op merge leaves the version unchanged") {
    val root = bandedTable()
    val v = Versioned.mergeIntoConditional(spark, root,
      Seq((1000L, 1.0, "n")).toDF("id", "x", "src"), Seq("id"), Seq(
        WhenMatchedDelete(None))) // nothing matches, no insert clause
    assert(v == 3L && Versioned.versions(spark, root) == Seq(1L, 2L, 3L))
  }
}
