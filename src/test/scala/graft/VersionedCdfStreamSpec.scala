package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Streaming change feed (`graft-versioned-cdf`): row-level changes per
  * micro-batch, surviving the rewrites and deletion vectors that kill
  * the append-only stream; base version pinned across restarts; keyed
  * update classification; loud retention failure. Sinks are foreachBatch
  * (the memory sink does not support checkpoint recovery, which the
  * restart legs here exercise on purpose). */
class VersionedCdfStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def build(root: String): Unit =
    (0 to 2).foreach { i =>
      Versioned.commit(spark,
        ((i * 100 + 1).toLong to (i * 100 + 100).toLong)
          .map(j => (j, s"r$j")).toDF("id", "k").coalesce(1),
        root, statsCols = Seq("id"))
    }

  /** Tail the keyed/unkeyed feed into a buffer via foreachBatch. */
  private def tail(root: String, ckpt: String, keys: Option[String],
                   into: scala.collection.mutable.Buffer[(Long, String)]) = {
    val changeCol = if (keys.isDefined) "_change_type" else "_change"
    val reader = spark.readStream.format("graft-versioned-cdf")
    keys.foreach(k => reader.option("keys", k))
    reader.load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select(col("id"), col(changeCol))
          .as[(Long, String)].collect()
        into.synchronized { into ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
  }

  test("keyed change feed tails copy-on-write and merge-on-read changes") {
    val root = tmpDir("graft_cdfs")
    build(root)
    val ckpt = tmpDir("graft_cdfs_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = tail(root, ckpt, Some("id"), buf)
    try {
      // default base = newest at first start: tail-only, empty first batch
      q.processAllAvailable()
      assert(buf.isEmpty)

      // copy-on-write MERGE: updates + an insert — the append-only stream
      // dies here; the change feed classifies
      Versioned.mergeInto(spark, root,
        ((150L to 152L).map(i => (i, "UPD")) ++ Seq((1000L, "new"))).toDF("id", "k"),
        Seq("id"))
      q.processAllAvailable()
      val after1 = buf.synchronized(buf.groupBy(_._2).view.mapValues(_.size).toMap)
      assert(after1 == Map("update_preimage" -> 3, "update_postimage" -> 3,
        "insert" -> 1), s"got $after1")

      // merge-on-read DELETE (vectors, no file rewritten): row-level deletes
      Versioned.deleteWhereDv(spark, root, col("id").between(10L, 12L))
      q.processAllAvailable()
      val dels = buf.synchronized(buf.filter(_._2 == "delete").map(_._1).sorted.toSeq)
      assert(dels == Seq(10L, 11L, 12L))
      // the merge rows were NOT re-emitted by the later batch
      assert(buf.size == 7 + 3)
    } finally q.stop()

    // restart AFTER more commits: only the missed window arrives, from the
    // checkpointed offset — the pinned base must not swallow it
    Versioned.updateWhere(spark, root, col("id") === 200L, Map("k" -> lit("X")))
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q2 = tail(root, ckpt, Some("id"), buf2)
    try {
      q2.processAllAvailable()
      assert(buf2.toSet == Set((200L, "update_preimage"), (200L, "update_postimage")),
        s"got ${buf2.toSet}")
    } finally q2.stop()
  }

  test("a stopped window nets; live compaction emits nothing") {
    val root = tmpDir("graft_cdfs_net")
    build(root)
    val ckpt = tmpDir("graft_cdfs_net_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = tail(root, ckpt, None, buf)
    try {
      q.processAllAvailable()
      assert(buf.isEmpty)
    } finally q.stop()
    // three versions land while the stream is DOWN: insert two rows,
    // delete one again, compact — the missed window nets to the one
    // real survivor (the transient 500 and the compaction rewrite cancel)
    Versioned.commit(spark, Seq((500L, "tmp"), (501L, "keep")).toDF("id", "k"), root)
    Versioned.deleteWhere(spark, root, col("id") === 500L)
    Versioned.compactSmall(spark, root)
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q2 = tail(root, ckpt, None, buf2)
    try {
      q2.processAllAvailable()
      assert(buf2.toSet == Set((501L, "insert")), s"got ${buf2.toSet}")
      // live compaction alone: rewritten-but-unchanged rows cancel
      Versioned.compactLatest(spark, root, nFiles = 2)
      q2.processAllAvailable()
      assert(buf2.toSet == Set((501L, "insert")), s"got ${buf2.toSet}")
    } finally q2.stop()
  }

  test("startingVersion replays history; a GC'd version refuses loudly") {
    val root = tmpDir("graft_cdfs_sv")
    build(root)
    // explicit startingVersion=1 on a fresh checkpoint — v1 -> v3: the
    // 200 appended rows, all inserts
    val bufSv = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val qSv = spark.readStream.format("graft-versioned-cdf")
      .option("startingVersion", "1").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select(col("id"), col("_change"))
          .as[(Long, String)].collect()
        bufSv.synchronized { bufSv ++= rows }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_cdfs_sv2_ckpt"))
      .start()
    try {
      qSv.processAllAvailable()
      assert(bufSv.size == 200)
      assert(bufSv.forall(_._2 == "insert"))
      assert(bufSv.map(_._1).min == 101L && bufSv.map(_._1).max == 300L)
    } finally qSv.stop()
    // a GC'd startingVersion refuses loudly
    Versioned.vacuum(spark, root, keepVersions = 1)
    val q2 = spark.readStream.format("graft-versioned-cdf")
      .option("startingVersion", "1").load(root)
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .option("checkpointLocation", tmpDir("graft_cdfs_sv3_ckpt"))
      .start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(chain(e).contains("not found"))
    } finally q2.stop()
  }

  test("a column ADDED mid-stream stops the stream loudly, never silently drops") {
    // a removed column dies on its own (missing-column analysis error);
    // an added one would survive a naive select of the pinned names — the
    // source must detect the widened diff and refuse until a restart
    val root = tmpDir("graft_cdfs_evo")
    build(root)
    val ckpt = tmpDir("graft_cdfs_evo_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = tail(root, ckpt, None, buf)
    try {
      q.processAllAvailable()
      Versioned.commit(spark,
        Seq((900L, "w", 1.5)).toDF("id", "k", "extra"), root)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(chain(e).contains("changed shape mid-stream"), chain(e))
      assert(chain(e).contains("extra"), chain(e))
    } finally q.stop()
    // a RESTART picks up the evolved schema and delivers the missed window
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q2 = tail(root, ckpt, None, buf2)
    try {
      q2.processAllAvailable()
      assert(buf2.toSet == Set((900L, "insert")), s"got ${buf2.toSet}")
    } finally q2.stop()
  }

  test("auto-adopt opt-in: typed evolution stop, restart loop adopts exactly-once") {
    // The Delta-style shape: a running query CANNOT change schema (the
    // V1 contract pins it at analysis), so evolution stops LOUDLY with
    // a TYPED exception — an orchestrator auto-restarts on exactly that
    // type, and the next start adopts the evolved schema from the
    // schema-tracking checkpoint asset with the committed offset
    // untouched. This leg drives that loop through TWO evolution
    // boundaries and asserts exactly-once delivery across both.
    val root = tmpDir("graft_cdfs_auto")
    build(root)
    val ckpt = tmpDir("graft_cdfs_auto_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def evolvedStop(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[graft.io.SchemaEvolvedException])
    // one query GENERATION: drain, run the mid-stream action, drain
    // again; either it survives (no evolution) or it stops with exactly
    // the typed exception — the signal the auto-restart loop keys on
    def generation(expectEvolvedStop: Boolean)(mid: => Unit): Unit = {
      val q = tail(root, ckpt, None, buf)
      try {
        q.processAllAvailable()
        mid
        q.processAllAvailable()
        assert(!expectEvolvedStop, "expected a typed evolution stop")
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(evolvedStop(e),
            s"only SchemaEvolvedException may restart the loop: ${chain(e)}")
          assert(expectEvolvedStop, s"unexpected evolution stop: ${chain(e)}")
      } finally q.stop()
    }
    // boundary 1: ADD lands while generation 1 runs -> typed stop;
    // generation 2 auto-adopts `extra`, replays the missed window, and
    // then hits boundary 2 (a second ADD) -> typed stop again;
    // generation 3 adopts `flag` and drains clean
    generation(expectEvolvedStop = true) {
      Versioned.commit(spark,
        Seq((900L, "w", 1.5)).toDF("id", "k", "extra"), root)
    }
    generation(expectEvolvedStop = true) {
      Versioned.commit(spark,
        Seq((901L, "x", 2.5, true)).toDF("id", "k", "extra", "flag"), root)
    }
    generation(expectEvolvedStop = false)(())
    assert(buf.toSet == Set((900L, "insert"), (901L, "insert")),
      s"exactly-once across both boundaries, got ${buf.toSet}")
    assert(buf.size == 2, s"duplicate delivery: $buf")
    // the schema-tracking asset records the ADOPTED (newest) shape
    val asset = java.nio.file.Paths.get(ckpt, "sources", "0", "graft-cdf-schema")
    assert(java.nio.file.Files.exists(asset), "schema-tracking asset missing")
    val recorded = new String(java.nio.file.Files.readAllBytes(asset), "UTF-8")
    assert(recorded.contains("flag") && recorded.contains("extra"),
      s"asset must record the adopted schema, got $recorded")
  }

  test("type widening mid-stream is evolution too: typed stop, restart adopts") {
    // name sets stay identical across a widening append (int -> long),
    // so the column-set compare alone would serve the widened batch
    // under the pinned narrower schema — wrong-typed attributes
    // downstream. The type compare must raise the SAME typed signal the
    // auto-restart loop keys on.
    val root = tmpDir("graft_cdfs_widen")
    Versioned.commit(spark, Seq((1L, 10)).toDF("id", "v"), root)
    val ckpt = tmpDir("graft_cdfs_widen_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def tailWide() = spark.readStream.format("graft-versioned-cdf")
      .load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select(col("id"), col("v").cast("long"), col("_change"))
          .as[(Long, Long, String)].collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    val q = tailWide()
    try {
      q.processAllAvailable()
      Versioned.commit(spark, Seq((2L, 20L)).toDF("id", "v"), root) // widens v
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[graft.io.SchemaEvolvedException]),
        s"widening must stop with the typed signal: ${chain(e)}")
      assert(chain(e).contains("TYPE"), chain(e))
    } finally q.stop()
    val q2 = tailWide()
    try {
      q2.processAllAvailable()
      assert(buf.toSet == Set((2L, 20L, "insert")), s"got ${buf.toSet}")
      assert(buf.size == 1, s"duplicate delivery: $buf")
    } finally q2.stop()
  }

  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
}
