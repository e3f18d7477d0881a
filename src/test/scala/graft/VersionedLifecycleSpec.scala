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
}
