package graft

import graft.io.Versioned
import org.apache.spark.sql.streaming.StreamingQuery

/** `spark.readStream.format("graft-versioned")` must tail commits with
  * version-number offsets: the first batch is the whole table as of stream
  * start, each later batch is exactly the files appended between two
  * versions, and a checkpointed restart resumes from the committed version
  * (no re-delivery, no skipped commits).
  */
class VersionedStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def tail(root: String, ckpt: String, name: String): StreamingQuery =
    spark.readStream.format("graft-versioned").load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()

  private def ids(name: String): Seq[Long] =
    spark.table(name).select("id").as[Long].collect().toSeq.sorted

  test("tails commits exactly once with version offsets") {
    val root = tmpDir("graft_vstream")
    val ckpt = tmpDir("graft_vstream_ckpt")
    Versioned.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((3L, "c")).toDF("id", "k"), root)
    val q = tail(root, ckpt, "vtail")
    try {
      q.processAllAvailable()
      // first batch: the whole table as of stream start
      assert(ids("vtail") == Seq(1L, 2L, 3L))
      Versioned.commit(spark, Seq((4L, "d")).toDF("id", "k"), root)
      q.processAllAvailable()
      assert(ids("vtail") == Seq(1L, 2L, 3L, 4L))
      // two commits between triggers collapse into one batch, no duplicates
      Versioned.commit(spark, Seq((5L, "e")).toDF("id", "k"), root)
      Versioned.commit(spark, Seq((6L, "f"), (7L, "g")).toDF("id", "k"), root)
      q.processAllAvailable()
      assert(ids("vtail") == (1L to 7L))
    } finally q.stop()
  }

  test("a mid-stream RENAME keeps emitting correct values under the pinned names") {
    // the scan schema is pinned at stream start (old logical names +
    // field ids); post-rename files carry the NEW name but the SAME id,
    // so id matching serves them under the pinned name — values stay
    // correct, the stream just keeps the old column name until a
    // restart re-pins (the Delta-like schema-change posture). A rename
    // adds no files, so the append-only guard is untouched.
    val root = tmpDir("graft_vstream_rn")
    val ckpt = tmpDir("graft_vstream_rn_ckpt")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    val q = tail(root, ckpt, "vtail_rn")
    try {
      q.processAllAvailable()
      Versioned.renameColumn(spark, root, "k", "label")
      Versioned.commit(spark, Seq((2L, "b")).toDF("id", "label"), root)
      q.processAllAvailable()
      assert(spark.table("vtail_rn").columns.toSeq == Seq("id", "k"))
      assert(spark.table("vtail_rn").select("id", "k")
        .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
        "post-rename file served wrong values under the pinned schema")
    } finally q.stop()
    // a fresh stream sees the evolved name
    val q2 = tail(root, tmpDir("graft_vstream_rn_ckpt2"), "vtail_rn2")
    try {
      q2.processAllAvailable()
      assert(spark.table("vtail_rn2").columns.toSeq == Seq("id", "label"))
    } finally q2.stop()
  }

  test("a mid-stream ADD or type widening stops the append-only stream with the typed signal") {
    // new files carry the added column's VALUES; the pinned scan would
    // silently drop them from every emitted row — permanent loss, the
    // rows are never re-emitted. Same typed stop as the CDF source, so
    // one auto-restart loop covers both stream shapes; a restart
    // re-pins and delivers the missed window under the evolved schema.
    val root = tmpDir("graft_vstream_evo")
    val ckpt = tmpDir("graft_vstream_evo_ckpt")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    def evolvedStop(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[graft.io.SchemaEvolvedException])
    // foreachBatch sink: the memory sink cannot recover from a
    // checkpoint, which the restart leg needs
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Double])]
    def tailEvo() = spark.readStream.format("graft-versioned").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cols = batch.columns.toSet
        val rows = batch.collect().map(r => r.getLong(r.fieldIndex("id")) ->
          (if (cols("extra")) Option(r.get(r.fieldIndex("extra")))
            .map(_.asInstanceOf[Double]) else None))
        buf.synchronized { buf ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    val q = tailEvo()
    try {
      q.processAllAvailable()
      Versioned.commit(spark, Seq((2L, "b", 1.5)).toDF("id", "k", "extra"), root)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(evolvedStop(e), s"ADD must stop with the typed signal: $e")
    } finally q.stop()
    // restart adopts and delivers the missed window WITH the new column
    val q2 = tailEvo()
    try {
      q2.processAllAvailable()
      assert(buf.toSet == Set((1L, None), (2L, Some(1.5))),
        s"the missed window must arrive under the evolved schema: ${buf.toSet}")
    } finally q2.stop()
    // widening mid-stream: same typed stop instead of a raw reader error
    val root2 = tmpDir("graft_vstream_widen")
    Versioned.commit(spark, Seq((1L, 10)).toDF("id", "v"), root2)
    val q3 = spark.readStream.format("graft-versioned").load(root2)
      .writeStream.format("memory").queryName("vtail_widen")
      .option("checkpointLocation", tmpDir("graft_vstream_widen_ckpt")).start()
    try {
      q3.processAllAvailable()
      Versioned.commit(spark, Seq((2L, 20L)).toDF("id", "v"), root2)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      assert(evolvedStop(e), s"widening must stop with the typed signal: $e")
    } finally q3.stop()
  }

  test("restart resumes from the checkpointed version") {
    // memory sink forbids checkpoint recovery, so collect via foreachBatch
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(root: String, ckpt: String): StreamingQuery =
      spark.readStream.format("graft-versioned").load(root)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
            .collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .start()

    val root = tmpDir("graft_vstream2")
    val ckpt = tmpDir("graft_vstream2_ckpt")
    Versioned.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "k"), root)
    val q1 = run(root, ckpt)
    try {
      q1.processAllAvailable()
      assert(seen.toArray(Array.empty[java.lang.Long]).map(Long.unbox).sorted.toSeq == Seq(1L, 2L))
    } finally q1.stop()
    // commits landing while the stream is down...
    Versioned.commit(spark, Seq((3L, "c")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((4L, "d")).toDF("id", "k"), root)
    // ...arrive on restart exactly once (offset came from the checkpoint)
    val q2 = run(root, ckpt)
    try {
      q2.processAllAvailable()
      assert(seen.toArray(Array.empty[java.lang.Long]).map(Long.unbox).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
    } finally q2.stop()
  }

  test("maintainViewSink keeps the materialized aggregate equal to a full recompute") {
    val src = tmpDir("graft_mview_src")
    val state = tmpDir("graft_mview_state")
    val ckpt = tmpDir("graft_mview_ckpt")
    def fullRecompute(): Map[String, (Long, BigDecimal)] =
      Versioned.read(spark, src).groupBy("k")
        .agg(org.apache.spark.sql.functions.count("*").as("cnt"),
          org.apache.spark.sql.functions.sum("x").cast("decimal(38,6)").as("sum_x"))
        .collect().map(r => (r.getString(0), (r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
    def stateNow(): Map[String, (Long, BigDecimal)] =
      Versioned.read(spark, state)
        .collect().map(r => (r.getString(r.fieldIndex("k")),
          (r.getLong(r.fieldIndex("cnt")), BigDecimal(r.getDecimal(r.fieldIndex("sum_x")))))).toMap

    Versioned.commit(spark, Seq(("a", 10.5), ("b", 20.0), ("a", 1.0)).toDF("k", "x"), src)
    val q = graft.streaming.Streams.maintainViewSink(
      spark, src, state, keys = Seq("k"), sumCols = Seq("x"), checkpointDir = ckpt)
    try {
      q.processAllAvailable()
      assert(stateNow() == fullRecompute())
      Versioned.commit(spark, Seq(("b", 5.0), ("c", 7.25)).toDF("k", "x"), src)
      q.processAllAvailable()
      assert(stateNow() == fullRecompute())
      assert(stateNow().keySet == Set("a", "b", "c"))
    } finally q.stop()
  }

  test("a mid-stream copy-on-write rewrite fails loudly instead of re-emitting rows") {
    val root = tmpDir("graft_vstream4")
    val ckpt = tmpDir("graft_vstream4_ckpt")
    Versioned.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "k"), root)
    val q = tail(root, ckpt, "vtail_rw")
    try {
      q.processAllAvailable()
      assert(ids("vtail_rw") == Seq(1L, 2L))
      // a rewrite lands mid-stream: the added-file diff would replay the
      // surviving row (2) as if it were new — the source must refuse
      Versioned.deleteWhere(spark, root, org.apache.spark.sql.functions.col("id") === 1L)
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("append-only"),
        s"unexpected error: ${err.getMessage}")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger bounds each micro-batch's version range") {
    val root = tmpDir("graft_vstream5")
    val ckpt = tmpDir("graft_vstream5_ckpt")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((2L, "b")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((3L, "c")).toDF("id", "k"), root)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches.add(batch.select("id")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // one commit per trigger: catch-up happens in bounded batches
      import scala.jdk.CollectionConverters._
      assert(batches.asScala.toSeq == Seq(Seq(1L), Seq(2L), Seq(3L)))
    } finally q.stop()
    // after a vacuum the surviving versions don't start at 1: the cap must
    // advance along the committed list, not start+1 arithmetic
    Versioned.vacuum(spark, root, keepVersions = 2)
    assert(Versioned.versions(spark, root) == Seq(2L, 3L))
    val batches2 = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q2 = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches2.add(batch.select("id")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq)
        ()
      }
      .option("checkpointLocation", tmpDir("graft_vstream5_ckpt2"))
      .start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // first batch = snapshot as of v2 (ids 1,2), second = v3's delta
      assert(batches2.asScala.toSeq == Seq(Seq(1L, 2L), Seq(3L)))
    } finally q2.stop()
    // a non-positive cap is refused when the scan is built (query start)
    val qBad = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "0").load(root)
      .writeStream.format("memory").queryName("vtail_badcap")
      .option("checkpointLocation", tmpDir("graft_vstream5_ckpt3"))
      .start()
    try {
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qBad.processAllAvailable()
      }
      assert(err.getMessage.contains("must be positive"),
        s"unexpected error: ${err.getMessage}")
    } finally qBad.stop()
  }

  test("a pinned asOf snapshot is not streamable") {
    val root = tmpDir("graft_vstream3")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    val err = intercept[Exception] {
      spark.readStream.format("graft-versioned").option("asOf", "1").load(root)
        .writeStream.format("memory").queryName("vtail_pin")
        .option("checkpointLocation", tmpDir("graft_vstream3_ckpt"))
        .start()
    }
    assert(err.getMessage.toLowerCase.contains("does not support"),
      s"unexpected error: ${err.getMessage}")
  }

  test("versionedSubstringDedupSink: cross-batch scrub, clean index, later query continues") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val cleanRoot = tmpDir("graft_subclean")
    val idxRoot = tmpDir("graft_subidx")

    def cleanMap(): Map[Long, (String, Long, Long)] =
      Versioned.read(spark, cleanRoot)
        .select("doc_id", "clean_text", "total_tokens", "removed_tokens")
        .as[(Long, String, Long, Long)].collect()
        .map { case (d, c, t, r) => d -> ((c, t, r)) }.toMap

    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.versionedSubstringDedupSink(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", w = 3,
      cleanRoot, idxRoot, tmpDir("graft_subckpt1"))
    try {
      // batch 0: within-batch dedup — doc 2 repeats doc 1's "a b c d"
      src.addData((1L, "a b c d e"), (2L, "x a b c d y"))
      q.processAllAvailable()
      assert(cleanMap() == Map(
        1L -> (("a b c d e", 5L, 0L)), 2L -> (("x y", 6L, 4L))))
      // batch 1: doc 3 repeats BATCH-0 text via the index (the corpus is
      // never re-read); doc 4 is new
      src.addData((3L, "q c d e r"), (4L, "m n o p"))
      q.processAllAvailable()
      assert(cleanMap()(3L) == (("q r", 5L, 3L)))
      assert(cleanMap()(4L) == (("m n o p", 4L, 0L)))
    } finally q.stop()

    // the index holds exactly the published text's distinct windows, no
    // duplicate hash rows across batch appends
    val idx = Versioned.read(spark, idxRoot).select("gh").as[String].collect()
    assert(idx.length == 5 && idx.distinct.length == 5,
      s"expected the 3 windows of 'a b c d e' + 2 of 'm n o p', got ${idx.length}")

    // a later deployment (fresh checkpoint, same roots) keeps scrubbing
    // against everything published before it
    val src2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.Streams.versionedSubstringDedupSink(
      src2.toDF().toDF("doc_id", "text"), "text", "doc_id", w = 3,
      cleanRoot, idxRoot, tmpDir("graft_subckpt2"))
    try {
      src2.addData((5L, "z m n o p w"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(cleanMap()(5L) == (("z w", 6L, 4L)))
    // earlier rows intact — appends, never rewrites
    assert(cleanMap()(1L) == (("a b c d e", 5L, 0L)))
  }

  test("substring dedup pair: compaction bounds file counts, scrub unchanged") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val cleanRoot = tmpDir("graft_subclean_c")
    val idxRoot = tmpDir("graft_subidx_c")

    // three sink batches -> a multi-commit pair (the accretion pattern)
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.versionedSubstringDedupSink(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", w = 3,
      cleanRoot, idxRoot, tmpDir("graft_subckpt_c1"))
    try {
      src.addData((1L, "a b c d e")); q.processAllAvailable()
      src.addData((2L, "f g h i j")); q.processAllAvailable()
      src.addData((3L, "k l m n o")); q.processAllAvailable()
    } finally q.stop()

    val ghBefore = Versioned.read(spark, idxRoot)
      .select("gh").as[String].collect().toSet
    val cleanBefore = Versioned.read(spark, cleanRoot)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toSet
    val idxFilesBefore = Versioned.read(spark, idxRoot).inputFiles.length
    assert(idxFilesBefore >= 3, "fixture must accrete multiple index files")
    // the scrub a future batch would compute, against the PRE-compaction pair
    val probe = Seq((9L, "p c d e q"), (10L, "r s t u")).toDF("doc_id", "text")
    val scrubBefore = graft.ops.Dedup.removeDuplicateSpansAgainstIndex(
      probe, Versioned.read(spark, idxRoot), col("text"), col("doc_id"), w = 3)
      .collect().toSet

    // compact BOTH roots while the sink is stopped (single writer)
    Versioned.compactSmall(spark, idxRoot)
    Versioned.compactSmall(spark, cleanRoot)
    assert(Versioned.read(spark, idxRoot).inputFiles.length < idxFilesBefore,
      "compaction must reduce the index file count")
    // pure re-layout: the distinct window set and the clean rows are intact
    assert(Versioned.read(spark, idxRoot)
      .select("gh").as[String].collect().toSet == ghBefore)
    assert(Versioned.read(spark, cleanRoot)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toSet
      == cleanBefore)
    // scrubbing against the compacted index is byte-identical
    assert(graft.ops.Dedup.removeDuplicateSpansAgainstIndex(
      probe, Versioned.read(spark, idxRoot), col("text"), col("doc_id"), w = 3)
      .collect().toSet == scrubBefore)

    // and the NEXT deployment keeps the exactly-once loop over the
    // compacted pair: old windows still cut, new ones still indexed
    val src2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.Streams.versionedSubstringDedupSink(
      src2.toDF().toDF("doc_id", "text"), "text", "doc_id", w = 3,
      cleanRoot, idxRoot, tmpDir("graft_subckpt_c2"))
    try {
      src2.addData((11L, "z f g h i w"))
      q2.processAllAvailable()
    } finally q2.stop()
    val after = Versioned.read(spark, cleanRoot)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(after(11L) == "z w", s"post-compaction scrub broke: ${after(11L)}")
  }
}
