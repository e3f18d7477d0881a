package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** End-to-end lifecycle of one versioned table through every surface the
  * engine offers — the integration test that proves the pieces compose:
  * batch commits, streaming tail, copy-on-write MERGE and DELETE,
  * history, incremental compaction, restore, and time/count retention,
  * with the cross-feature interactions (a rewrite breaking an active
  * stream, compaction preserving pruning, restore after a bad delete)
  * behaving as the individual specs promise.
  */
class VersionedLifecycleSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("one table through ingest, merge, compaction, restore, and retention") {
    val root = tmpDir("graft_life")

    // 1. three banded ingest commits with stats (the ingest phase)
    Versioned.commit(spark, (1L to 100L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (101L to 200L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (201L to 300L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))

    // 2. a streaming consumer tails the append-only history
    val q = spark.readStream.format("graft-versioned").load(root)
      .writeStream.format("memory").queryName("life_tail")
      .option("checkpointLocation", tmpDir("graft_life_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("life_tail").count() == 300)

      // 3. MERGE upserts: one band rewritten, inserts appended (v4)
      Versioned.mergeInto(spark, root,
        ((150L to 160L).map(i => (i, "UPD")) ++ Seq((1000L, "new")))
          .toDF("id", "k"), Seq("id"))
      assert(Versioned.read(spark, root).count() == 301)

      // 4. the rewrite correctly kills the tailing stream (no silent dupes)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()

    // 5. DELETE a band slice (v5), then history tells the whole story
    Versioned.deleteWhere(spark, root, col("id").between(50L, 59L))
    val hist = Versioned.history(spark, root).orderBy("version").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(hist.forall(_.getLong(4) > 0)) // total_bytes

    // 6. pruning still exact across merge+delete rewrites
    assert(Versioned.readPruned(spark, root, "id", Some(150L), Some(160L))
      .select("k").as[String].collect().forall(_ == "UPD"))
    assert(Versioned.readPruned(spark, root, "id", Some(45L), Some(65L))
      .select("id").as[Long].collect().sorted.toSeq ==
      ((45L to 49L) ++ (60L to 65L)))

    // 7. oops — the delete was wrong: restore to v4 (manifest-only)
    val v6 = Versioned.restore(spark, root, 4L)
    assert(v6 == 6L)
    assert(Versioned.read(spark, root).count() == 301)
    assert(Versioned.diffVersions(spark, root, 5L, Some(6L))
      .filter(col("_change") === "insert").count() == 10) // the un-deleted rows

    // 8. incremental compaction packs the merge/insert debris, carries bands
    val before = manifestOf(root, 6L).size
    Versioned.compactSmall(spark, root, smallBytes = 4096L, sortCols = Seq("id"))
    assert(manifestOf(root, 7L).size <= before)
    assert(Versioned.read(spark, root).count() == 301)
    assert(Versioned.readPruned(spark, root, "id", Some(150L), Some(160L))
      .select("k").as[String].collect().forall(_ == "UPD"))

    // 9. retention: keep the newest two versions, GC the rest; the
    // surviving snapshots read intact and old versions are gone
    Versioned.vacuum(spark, root, keepVersions = 2)
    assert(Versioned.versions(spark, root) == Seq(6L, 7L))
    assert(Versioned.read(spark, root, asOf = Some(6L)).count() == 301)
    assert(Versioned.read(spark, root).count() == 301)
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root, asOf = Some(3L))
    }
  }

  test("round-8 surfaces compose: constraints, widening, blooms, conditional merge, ALTER") {
    import graft.io.Versioned._
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    val root = tmpDir("graft_life8")

    // 1. INT-keyed ingest with stats, then a write-time data contract
    Versioned.commit(spark, (1 to 100).map(i => (i, i * 1.0, "src0"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    Versioned.addConstraint(spark, root, "x_pos", "x > 0")     // v2 (metadata)

    // 2. a violating batch is discarded atomically
    intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((101, -1.0, "bad")).toDF("id", "x", "src"), root)
    }
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))

    // 3. a LONG-keyed valid batch widens the schema mid-life; the
    // constraint validated it through the evolved (widened) read-back
    Versioned.commit(spark, (101L to 200L).map(i => (i, i * 1.0, "src1"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))   // v3
    assert(Versioned.read(spark, root).schema("id").dataType == LongType)

    // 4. bloom retrofit arms point lookups over the mixed-physical files
    // (INT batch + LONG batch — the long-normalized hash makes them one)
    assert(Versioned.buildBlooms(spark, root, Seq("id")) == 2L)
    assert(spark.read.format("graft-versioned").load(root)
      .filter(col("id") === 150L).count() == 1)

    // 5. a CDC-shaped conditional merge: tombstone deletes, update
    // replaces, insert appends — one atomic commit, constraint-checked
    Versioned.mergeIntoConditional(spark, root,
      Seq((150L, 5.0, "upd"), (50L, 99.0, "del"), (999L, 9.9, "new"))
        .toDF("id", "x", "src"),
      Seq("id"), Seq(
        WhenMatchedDelete(Some(col("__s.src") === "del")),
        WhenMatchedUpdateAll(None),
        WhenNotMatchedInsertAll(None)))                                   // v4
    val after = Versioned.read(spark, root)
    assert(after.count() == 200)                       // 200 = 200 - 1 + 1
    assert(after.filter(col("id") === 50L).count() == 0)
    assert(after.filter(col("id") === 150L && col("src") === "upd").count() == 1)
    assert(after.filter(col("id") === 999L).count() == 1)

    // 6. a violating conditional merge aborts atomically — the UPDATE
    // value breaks the contract, so nothing publishes
    val vBefore = Versioned.versions(spark, root).last
    intercept[IllegalArgumentException] {
      Versioned.mergeIntoConditional(spark, root,
        Seq((160L, -3.0, "bad")).toDF("id", "x", "src"), Seq("id"), Seq(
          WhenMatchedUpdateAll(None)))
    }
    assert(Versioned.versions(spark, root).last == vBefore)
    assert(Versioned.read(spark, root)
      .filter(col("id") === 160L && col("src") === "src1").count() == 1)

    // 7. ALTER ADD COLUMNS (metadata-only) then a merge WITH schema
    // evolution fills the new column for one row
    Versioned.addColumns(spark, root, Seq(StructField("score", DoubleType))) // v5
    Versioned.mergeInto(spark, root,
      Seq((150L, 5.0, "upd", 0.9)).toDF("id", "x", "src", "score"),
      Seq("id"), schemaEvolution = true)                                  // v6
    val scored = Versioned.read(spark, root)
    assert(scored.filter(col("score").isNotNull).count() == 1)
    assert(scored.filter(col("id") === 150L).select("score")
      .as[Double].head() == 0.9)

    // 8. detail sees the whole composition; time travel is intact
    val d = Versioned.describeDetail(spark, root)
    assert(d.numConstraints == 1 && d.numColumns == 4)
    assert(d.statsColumns == "id" && d.bloomColumns == "id")
    assert(Versioned.read(spark, root, asOf = Some(3L)).count() == 200)
    assert(Versioned.read(spark, root, asOf = Some(3L))
      .schema.fieldNames.toSeq == Seq("id", "x", "src")) // pre-ALTER shape
  }
}
