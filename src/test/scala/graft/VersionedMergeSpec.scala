package graft

import graft.io.Versioned
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE, restore, and row-level version diff on
  * [[Versioned]] tables: a merge rewrites only the files holding matched
  * keys (everything else carried by reference), matched rows are replaced
  * whole and unmatched source rows insert, duplicate source keys are
  * rejected, null source keys insert; restore republishes an old manifest
  * without copying data; diffVersions yields exact row-level
  * insert/delete sets across rewrites; the streaming merge sink is
  * replay-safe by batch tag.
  */
class VersionedMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_merge").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("mergeInto replaces matched rows, inserts unmatched, carries untouched files") {
    val root = tmpRoot()
    // three single-file batches banded by id
    Versioned.commit(spark, (1L to 100L).map(i => (i, i * 1.0, "old"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (101L to 200L).map(i => (i, i * 1.0, "old"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (201L to 300L).map(i => (i, i * 1.0, "old"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    val before = manifestOf(root, 3L)

    // keys 150..160 update (middle band only); 1000..1005 insert
    val source = ((150L to 160L) ++ (1000L to 1005L))
      .map(i => (i, -1.0, "new")).toDF("id", "x", "src")
    val v4 = Versioned.mergeInto(spark, root, source, Seq("id"))
    assert(v4 == 4L)
    // bands 1 and 3 are carried byte-identical, band 2 was rewritten
    val after = manifestOf(root, 4L)
    assert(after.count(before.contains) == 2,
      s"expected 2 carried files, manifest: $after")

    val now = Versioned.read(spark, root)
    assert(now.count() == 306)
    // matched rows replaced WHOLE (every column from the source)
    assert(now.filter($"id".between(150L, 160L) && $"src" === "new" && $"x" === -1.0)
      .count() == 11)
    // unmatched target rows untouched, inserts present
    assert(now.filter($"src" === "old").count() == 289)
    assert(now.filter($"id" >= 1000L).count() == 6)
    // time travel still sees the pre-merge rows
    assert(Versioned.read(spark, root, asOf = Some(3L))
      .filter($"src" === "new").count() == 0)
  }

  test("mergeInto: pure insert appends without touching any file; empty source no-ops") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 50L).map(i => (i, "a")).toDF("id", "k")
      .coalesce(1), root)
    val before = manifestOf(root, 1L)
    val v2 = Versioned.mergeInto(spark, root,
      (100L to 110L).map(i => (i, "b")).toDF("id", "k"), Seq("id"))
    assert(v2 == 2L)
    assert(manifestOf(root, 2L).containsSlice(before)) // all carried
    assert(Versioned.read(spark, root).count() == 61)
    // empty source: version unchanged
    val v = Versioned.mergeInto(spark, root,
      Seq.empty[(Long, String)].toDF("id", "k"), Seq("id"))
    assert(v == 2L && Versioned.versions(spark, root) == Seq(1L, 2L))
  }

  test("mergeInto into an absent table inserts everything") {
    val root = tmpRoot() + "/fresh"
    Versioned.mergeInto(spark, root, Seq((1L, "a")).toDF("id", "k"), Seq("id"))
    assert(Versioned.read(spark, root).count() == 1)
  }

  test("mergeInto rejects duplicate source keys and schema drift") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    val dup = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root,
        Seq((2L, "x"), (2L, "y")).toDF("id", "k"), Seq("id"))
    }
    assert(dup.getMessage.contains("multiple rows per key"))
    val missing = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root, Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    }
    assert(missing.getMessage.contains("missing table column"))
    val extra = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root,
        Seq((2L, "x", 1.0)).toDF("id", "k", "zz"), Seq("id"))
    }
    assert(extra.getMessage.contains("absent from the table"))
    val badType = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root,
        Seq((2L, 7)).toDF("id", "k"), Seq("id"))
    }
    assert(badType.getMessage.contains("type mismatch"))
  }

  test("mergeInto: null source keys never match — they insert (SQL join semantics)") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq((Some(1L), "a"), (None, "target-null")).toDF("id", "k"), root)
    // several null-key rows are NOT duplicate keys — none can match any
    // target row, so all insert (the dup check must ignore them)
    Versioned.mergeInto(spark, root,
      Seq((Option.empty[Long], "src-null"), (Option.empty[Long], "src-null2"))
        .toDF("id", "k"), Seq("id"))
    val ks = Versioned.read(spark, root).select("k").as[String].collect().toSet
    assert(ks == Set("a", "target-null", "src-null", "src-null2"))
  }

  test("mergeInto is idempotent: replaying the same source changes nothing") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 50L).map(i => (i, s"v$i")).toDF("id", "k"), root)
    val source = Seq((10L, "X"), (999L, "new")).toDF("id", "k")
    Versioned.mergeInto(spark, root, source, Seq("id"))
    val once = Versioned.read(spark, root)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    Versioned.mergeInto(spark, root, source, Seq("id"))
    val twice = Versioned.read(spark, root)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(once == twice)
  }

  test("mergeInto keeps stats pruning alive on the rewritten batch") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.commit(spark, (101L to 200L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.mergeInto(spark, root, Seq(150L).toDF("id"), Seq("id"))
    assert(Versioned.readPruned(spark, root, "id", Some(150L), Some(155L))
      .as[Long].collect().sorted.toSeq == (150L to 155L))
    assert(Versioned.readPruned(spark, root, "id", Some(10L), Some(12L))
      .as[Long].collect().sorted.toSeq == (10L to 12L))
    // out-of-range keys on a stats-tracked table: the probe prunes every
    // file (no scan can match), so the merge is a pure append
    val before = manifestOf(root, 3L)
    Versioned.mergeInto(spark, root, Seq(9999L).toDF("id"), Seq("id"))
    assert(manifestOf(root, 4L).containsSlice(before))
    assert(Versioned.read(spark, root).count() == 201)
    // an all-null-key source on a stats-tracked table likewise inserts
    Versioned.mergeInto(spark, root,
      Seq(Option.empty[Long]).toDF("id"), Seq("id"))
    assert(Versioned.read(spark, root).count() == 202)
  }

  test("restore republishes an old snapshot without copying data") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((2L, "b")).toDF("id", "k"), root)
    Versioned.deleteWhere(spark, root, $"id" === 1L)
    assert(Versioned.read(spark, root).count() == 1)
    val v4 = Versioned.restore(spark, root, 2L)
    assert(v4 == 4L)
    // same file list as v2 — nothing copied, flip is manifest-only
    assert(manifestOf(root, 4L) == manifestOf(root, 2L))
    assert(Versioned.read(spark, root).count() == 2)
    // the rolled-back version stays time-travelable
    assert(Versioned.read(spark, root, asOf = Some(3L)).count() == 1)
    intercept[IllegalArgumentException] {
      Versioned.restore(spark, root, 9L)
    }
  }

  test("diffVersions: exact row-level insert/delete across rewrites") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root)
    Versioned.commit(spark, (101L to 200L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root)
    // delete rewrites band 1; the surviving rows must cancel in the diff
    Versioned.deleteWhere(spark, root, $"id".between(10L, 20L))
    val d = Versioned.diffVersions(spark, root, 2L)
    val del = d.filter($"_change" === "delete").select("id").as[Long].collect().sorted
    assert(del.toSeq == (10L to 20L))
    assert(d.filter($"_change" === "insert").count() == 0)
    // an update is delete(old) + insert(new)
    Versioned.updateWhere(spark, root, $"id" === 50L, Map("k" -> lit("UPD")))
    val d2 = Versioned.diffVersions(spark, root, 3L)
    assert(d2.filter($"_change" === "delete").select("k").as[String].collect().toSeq
      == Seq("r50"))
    assert(d2.filter($"_change" === "insert").select("k").as[String].collect().toSeq
      == Seq("UPD"))
    // append-only range still works and degenerate from==to is empty
    Versioned.commit(spark, Seq((500L, "new")).toDF("id", "k"), root)
    val d3 = Versioned.diffVersions(spark, root, 4L, Some(5L))
    assert(d3.filter($"_change" === "insert").select("id").as[Long].collect().toSeq
      == Seq(500L))
    assert(Versioned.diffVersions(spark, root, 5L, Some(5L)).count() == 0)
  }

  test("diffVersions refuses a range crossing a retyping replace") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq(("one", "a")).toDF("id", "k"), root,
      replace = true) // id: bigint -> string, legal for replace commits
    val err = intercept[IllegalArgumentException] {
      Versioned.diffVersions(spark, root, 1L)
    }
    assert(err.getMessage.contains("changed type"))
  }

  test("conditional merge sink applies a CDC op stream: tombstones delete, rest upserts") {
    import graft.io.Versioned._
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq((1L, "a", "I"), (2L, "b", "I")).toDF("id", "v", "op"), root)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String, String)]
    val q = Streams.versionedConditionalMergeSink(
      src.toDF().toDF("id", "v", "op"), root, Seq("id"),
      Seq(
        WhenMatchedDelete(Some(col("__s.op") === "D")),
        WhenMatchedUpdateAll(None),
        WhenNotMatchedInsertAll(Some(col("__s.op") =!= "D"))),
      tmpRoot())
    try {
      src.addData((1L, "a2", "U"), (3L, "c", "I"))
      q.processAllAvailable()
      // tombstone for live key 2 deletes; tombstone for absent key 9 is a no-op
      src.addData((2L, "", "D"), (9L, "", "D"))
      q.processAllAvailable()
      val now = Versioned.read(spark, root)
        .as[(Long, String, String)].collect().toSet
      assert(now == Set((1L, "a2", "U"), (3L, "c", "I")))
    } finally q.stop()
  }

  test("merge sink tags are checkpoint-scoped: a fresh checkpoint's batch 0 is not a replay") {
    val root = tmpRoot()
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // first query, checkpoint A
    val srcA = MemoryStream[(Long, String)]
    val qA = Streams.versionedMergeSink(
      srcA.toDF().toDF("id", "k"), root, Seq("id"), tmpRoot())
    try {
      srcA.addData((1L, "a"))
      qA.processAllAvailable()
    } finally qA.stop()
    // second query, DIFFERENT checkpoint: its batch 0 must still commit
    val srcB = MemoryStream[(Long, String)]
    val qB = Streams.versionedMergeSink(
      srcB.toDF().toDF("id", "k"), root, Seq("id"), tmpRoot())
    try {
      srcB.addData((2L, "b"))
      qB.processAllAvailable()
    } finally qB.stop()
    assert(Versioned.read(spark, root).select("k").as[String].collect().toSet
      == Set("a", "b"))
  }

  test("versionedMergeSink: streaming upsert, replayed batch tag is a no-op") {
    val root = tmpRoot()
    val chk = tmpRoot()
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = Streams.versionedMergeSink(
      src.toDF().toDF("id", "k"), root, Seq("id"), chk)
    try {
      src.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      src.addData((2L, "B2"), (3L, "c"))
      q.processAllAvailable()
      val rows = Versioned.read(spark, root)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(rows == Seq((1L, "a"), (2L, "B2"), (3L, "c")))
      // a replay of the last batch (same tag) must not commit again
      val vBefore = Versioned.versions(spark, root).last
      Versioned.mergeInto(spark, root,
        Seq((2L, "XX")).toDF("id", "k"), Seq("id"),
        tag = Versioned.committedTag(spark, root))
      assert(Versioned.versions(spark, root).last == vBefore)
      assert(Versioned.read(spark, root).filter($"k" === "XX").count() == 0)
    } finally q.stop()
  }

  test("versionedMergeSinkDv: merge-on-read streaming upsert rewrites nothing") {
    val root = tmpRoot()
    Versioned.commit(spark,
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "k").coalesce(1), root)
    val v1Files = Versioned.snapshotFiles(spark, root, Some(1L)).toSet
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = Streams.versionedMergeSinkDv(
      src.toDF().toDF("id", "k"), root, Seq("id"), tmpRoot())
    try {
      src.addData((5L, "U5"), (200L, "new"))
      q.processAllAvailable()
      src.addData((5L, "U5b"), (6L, "U6"))
      q.processAllAvailable()
      val rows = Versioned.read(spark, root).as[(Long, String)].collect().toMap
      assert(rows.size == 101)
      assert(rows(5L) == "U5b" && rows(6L) == "U6" && rows(200L) == "new")
      // merge-on-read contract: every original file still referenced —
      // the two triggers appended batches + vectors, rewrote NOTHING
      val nowFiles = Versioned.snapshotFiles(spark, root).toSet
      assert(v1Files.subsetOf(nowFiles))
      assert(Versioned.dvEntries(spark, root).nonEmpty)
      // metadata-only count agrees with the vector-applied read
      assert(Versioned.countRows(spark, root) == 101L)
      // materialize folds the accreted vectors and re-admits the scan
      Versioned.dvMaterialize(spark, root)
      assert(spark.read.format("graft-versioned").load(root).count() == 101)
    } finally q.stop()
  }

  test("replay detection survives an interleaved foreign commit") {
    val root = tmpRoot()
    val chk = tmpRoot()
    // batch 0 from our checkpoint commits, then a FOREIGN writer (manual
    // commit, different checkpoint's sink) lands on top — our tag is no
    // longer newest, but the replay must still be recognized
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root,
      tag = Some(Streams.batchTag(chk, "append", 0L)))
    Versioned.commit(spark, Seq((2L, "manual")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((3L, "other")).toDF("id", "k"), root,
      tag = Some(Streams.batchTag(tmpRoot(), "append", 7L)))
    assert(Streams.alreadyCommitted(spark, root, chk, "append", 0L),
      "replayed batch 0 must be detected behind interleaved foreign commits")
    // the NEXT batch from our checkpoint is not a replay
    assert(!Streams.alreadyCommitted(spark, root, chk, "append", 1L))
    // same checkpoint, different sink kind: independent tag namespace
    assert(!Streams.alreadyCommitted(spark, root, chk, "merge", 0L))
    // wiped-and-recreated checkpoint at the SAME path: batch ids restart,
    // and only the NEWEST same-checkpoint tag decides — after batch 1
    // commits, a fresh incarnation's batch 0 must NOT look like a replay
    // (an id-range check would silently drop every restarted batch)
    Versioned.commit(spark, Seq((4L, "d")).toDF("id", "k"), root,
      tag = Some(Streams.batchTag(chk, "append", 1L)))
    assert(!Streams.alreadyCommitted(spark, root, chk, "append", 0L))
  }

  test("touched-file probe past spark.graft.maxTouchedFiles fails loudly") {
    val root = tmpRoot()
    // two single-file batches, both touched by the merge below
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k").coalesce(1), root)
    Versioned.commit(spark, Seq((2L, "b")).toDF("id", "k").coalesce(1), root)
    spark.conf.set("spark.graft.maxTouchedFiles", "1")
    try {
      val err = intercept[IllegalArgumentException] {
        Versioned.mergeInto(spark, root,
          Seq((1L, "A"), (2L, "B")).toDF("id", "k"), Seq("id"))
      }
      assert(err.getMessage.contains("maxTouchedFiles"))
      assert(err.getMessage.contains("ranges"))
      // the delete/update path shares the same bound
      val err2 = intercept[IllegalArgumentException] {
        Versioned.deleteWhere(spark, root, $"id".isNotNull)
      }
      assert(err2.getMessage.contains("maxTouchedFiles"))
      // table unchanged by either refused rewrite
      assert(Versioned.read(spark, root).count() == 2)
    } finally spark.conf.unset("spark.graft.maxTouchedFiles")
  }
}
