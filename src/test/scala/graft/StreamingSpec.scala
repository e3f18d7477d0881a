package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowed counts emit a window once the watermark passes it") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = src.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedEventCounts(events, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("win_test").outputMode("append").start()
    try {
      src.addData(
        (t("2024-01-01 00:10:00"), "click", 1.5),
        (t("2024-01-01 00:20:00"), "click", 2.5))
      q.processAllAvailable()
      // advance the watermark far beyond the first window
      src.addData((t("2024-01-01 05:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .select("event_type", "n", "total").as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = src.toDF().toDF("event_id", "ts", "value")
    val q = Streams.dedupEvents(events, "1 hour")
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      src.addData(
        (1L, t("2024-01-01 00:10:00"), 1.0),
        (1L, t("2024-01-01 00:10:00"), 1.0), // replay
        (2L, t("2024-01-01 00:11:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Long, Double)]
    val stream = src.toDF().toDF("event_id", "user_id", "value")
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val q = Streams.enrichWithDim(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("dim_test").outputMode("append").start()
    try {
      src.addData((1L, 7L, 1.0), (2L, 9L, 2.0)) // 9 has no dim row -> null tier
      q.processAllAvailable()
      val rows = spark.table("dim_test").select("event_id", "tier")
        .as[(Long, Option[String])].collect().toSet
      assert(rows == Set((1L, Some("gold")), (2L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join matches right rows inside the left window") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val left = ls.toDF().toDF("event_id", "ts", "user_id")
    val right = rs.toDF().toDF("event_id", "ts", "user_id")
    val q = Streams.streamIntervalJoin(left, right, windowMinutes = 60, watermark = "1 hour")
      .writeStream.format("memory").queryName("sj_test").outputMode("append").start()
    try {
      ls.addData((100L, t("2024-01-01 00:00:00"), 7L))
      rs.addData(
        (200L, t("2024-01-01 00:30:00"), 7L), // inside window, same user -> match
        (201L, t("2024-01-01 01:30:00"), 7L), // past window end -> no match
        (202L, t("2024-01-01 00:30:00"), 8L)) // other user -> no match
      q.processAllAvailable()
      val rows = spark.table("sj_test").select("l_id", "r_id")
        .as[(Long, Long)].collect().toSet
      assert(rows == Set((100L, 200L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched lefts after the watermark passes") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val left = ls.toDF().toDF("event_id", "ts", "user_id")
    val right = rs.toDF().toDF("event_id", "ts", "user_id")
    val q = Streams.streamIntervalJoinLeftOuter(left, right,
        windowMinutes = 60, watermark = "1 hour")
      .writeStream.format("memory").queryName("sjlo_test").outputMode("append").start()
    try {
      ls.addData(
        (100L, t("2024-01-01 00:00:00"), 7L), // will match
        (101L, t("2024-01-01 00:00:00"), 9L)) // never matches
      rs.addData((200L, t("2024-01-01 00:30:00"), 7L))
      q.processAllAvailable()
      // advance both watermarks far past 101's match window so the
      // unmatched left can be proven final and emitted with nulls
      ls.addData((110L, t("2024-01-01 06:00:00"), 7L))
      rs.addData((210L, t("2024-01-01 06:00:00"), 8L))
      q.processAllAvailable()
      val rows = spark.table("sjlo_test").select("l_id", "r_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((100L, Some(200L))))
      assert(rows.contains((101L, None)))
    } finally q.stop()
  }

  test("stateful sessionization closes a session when the gap passes") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Streams.Event]
    val q = Streams.sessionizeStream(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_test").outputMode("append").start()
    try {
      src.addData(
        Streams.Event(1, t("2024-01-01 00:00:00"), 7L, "click", 1.0),
        Streams.Event(2, t("2024-01-01 00:10:00"), 7L, "click", 2.0),
        Streams.Event(3, t("2024-01-01 02:00:00"), 7L, "view", 4.0)) // gap > 30 min
      q.processAllAvailable()
      val sessions = spark.table("sess_test")
        .select("user_id", "session_id", "n_events", "total_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      // first session closed by the third event; second still open in state
      assert(sessions == Set((7L, 1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("event-time sessionization flushes idle sessions when the watermark passes") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Streams.Event]
    val withWm = src.toDS().withWatermark("ts", "10 minutes").as[Streams.Event]
    val q = Streams.sessionizeStreamEventTime(withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_et").outputMode("append").start()
    try {
      src.addData(
        Streams.Event(1, t("2024-01-01 00:00:00"), 7L, "click", 1.0),
        Streams.Event(2, t("2024-01-01 00:10:00"), 7L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_et").count() == 0) // session still open
      // another USER's event advances the watermark past 00:10 + 30min gap
      src.addData(Streams.Event(9, t("2024-01-01 02:00:00"), 8L, "view", 1.0))
      q.processAllAvailable()
      src.addData(Streams.Event(10, t("2024-01-01 03:00:00"), 8L, "view", 1.0))
      q.processAllAvailable() // timeout evaluated on the next data batch
      val sessions = spark.table("sess_et")
        .select("user_id", "session_id", "n_events", "total_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(sessions.contains((7L, 1L, 2L, 3.0))) // flushed by watermark, not wall clock
    } finally q.stop()
  }

  test("file-source ingest: schema'd json drops, exactly-once, archived") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toFile.getAbsolutePath + "/in"
    new java.io.File(dir).mkdirs()
    def drop(name: String, rows: String*): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        rows.mkString("\n").getBytes("UTF-8"))
    drop("batch1.json",
      """{"event_id":1,"ts":"2024-01-01T00:10:00.000Z","user_id":7,"event_type":"click","value":1.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T00:20:00.000Z","user_id":7,"event_type":"view","value":2.0,"props":"{}"}""")

    val q = Streams.dedupEvents(Streams.readEventFileStream(spark, dir), "1 hour")
      .writeStream.format("memory").queryName("file_ingest")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.table("file_ingest").count() == 2)

    // replayed drop with a duplicate id + one new event -> only the new row adds
    drop("batch2.json",
      """{"event_id":2,"ts":"2024-01-01T00:20:00.000Z","user_id":7,"event_type":"view","value":2.0,"props":"{}"}""",
      """{"event_id":3,"ts":"2024-01-01T00:25:00.000Z","user_id":8,"event_type":"click","value":3.0,"props":"{}"}""")
    val q2 = Streams.dedupEvents(Streams.readEventFileStream(spark, dir), "1 hour")
      .writeStream.format("memory").queryName("file_ingest2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q2.awaitTermination(60000) finally q2.stop()
    // batch1.json was ARCHIVED by the first query (consumed-input move,
    // the reference's processed/ dir), so only batch2's 2 events remain
    assert(spark.table("file_ingest2").count() == 2)
    val archived = new java.io.File(dir + "_archive")
    assert(archived.exists, "consumed inputs should be moved to the archive dir")
  }

  test("xlsx drop-folder stream: two workbooks picked up exactly-once, archived") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxstream").toFile.getAbsolutePath + "/in"
    new java.io.File(dir).mkdirs()
    val header = Seq("Site", "Article", "Qty")
    graft.io.XlsxWriter.writeFile(new java.io.File(dir, "drop1.xlsx").getAbsolutePath,
      header, Iterator(Seq("S01", "A1", "10"), Seq("S01", "A2", "20")))
    graft.io.XlsxWriter.writeFile(new java.io.File(dir, "drop2.xlsx").getAbsolutePath,
      header, Iterator(Seq("S02", "A1", "30")))

    // the realistic operation: a nightly AvailableNow run over a STABLE
    // checkpoint into a parquet sink — the source log is the exactly-once
    // mechanism, the archive move is its (async, next-commit) cleanup
    // side-effect. (The memory sink can't recover a checkpoint.)
    val ckpt = java.nio.file.Files.createTempDirectory("xlsxck").toFile.getAbsolutePath
    val outDir = java.nio.file.Files.createTempDirectory("xlsxout").toFile.getAbsolutePath + "/t"
    def runOnce(): Unit = {
      val q = Streams.xlsxStream(spark, dir, header)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(60000) finally q.stop()
    }
    runOnce()
    def rows(): Set[(String, String, String)] =
      spark.read.parquet(outDir).as[(String, String, String)].collect().toSet
    assert(rows() == Set(("S01", "A1", "10"), ("S01", "A2", "20"), ("S02", "A1", "30")),
      "both dropped workbooks ingested, header rows excluded")

    // a third drop arrives; the next scheduled run (same checkpoint) must
    // ingest ONLY it — consumed workbooks are never re-read
    graft.io.XlsxWriter.writeFile(new java.io.File(dir, "drop3.xlsx").getAbsolutePath,
      header, Iterator(Seq("S03", "A9", "40")))
    runOnce()
    assert(rows() == Set(("S01", "A1", "10"), ("S01", "A2", "20"),
      ("S02", "A1", "30"), ("S03", "A9", "40")),
      "the new workbook adds exactly once; consumed ones are not re-ingested")
    // committing batch 1 archived batch 0's inputs (the reference's
    // processed/ move); archival is async-on-commit, so poll briefly
    val archived = new java.io.File(dir + "_archive")
    val deadline = System.nanoTime() + 30e9.toLong
    while (!archived.exists && System.nanoTime() < deadline) Thread.sleep(100)
    assert(archived.exists,
      "consumed workbooks moved to the archive dir (the reference's processed/)")

    // a workbook whose header drifted from the declared template fails loudly
    graft.io.XlsxWriter.writeFile(new java.io.File(dir, "bad.xlsx").getAbsolutePath,
      Seq("Site", "SKU", "Qty"), Iterator(Seq("S04", "A1", "50")))
    val q3 = Streams.xlsxStream(spark, dir, header)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.awaitTermination(60000)
    }
    q3.stop()
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(err).exists(m => m.contains("bad.xlsx") && m.contains("SKU")),
      "header mismatch must name the offending workbook")
  }

  test("streaming upsert sink: replayed batches leave exactly-once table state") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsink").toFile.getAbsolutePath
    val src = MemoryStream[(Long, String, Double)]
    val events = src.toDF().toDF("k", "day", "v")
    val q = Streams.upsertSink(events, s"$base/target", Seq("k"), s"$base/ckpt")
    try {
      src.addData((1L, "d1", 1.0), (2L, "d1", 2.0))
      q.processAllAvailable()
      src.addData((2L, "d1", 20.0), (3L, "d2", 3.0)) // update k=2, insert k=3
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/target")
        .as[(Long, String, Double)].collect().toSet
      assert(out == Set((1L, "d1", 1.0), (2L, "d1", 20.0), (3L, "d2", 3.0)))
    } finally q.stop()
  }

  test("streaming partitioned upsert sink rewrites only the touched partitions") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsinkpart").toFile.getAbsolutePath
    val target = s"$base/target"
    val src = MemoryStream[(Long, String, Double)]
    val events = src.toDF().toDF("k", "day", "v")
    // multi-day stream, one day per micro-batch: each batch must touch
    // only its day's partition dir
    val q = Streams.upsertPartitionedSink(events, target, Seq("k", "day"), "day", s"$base/ckpt")
    try {
      src.addData((1L, "d1", 1.0), (2L, "d2", 2.0))
      q.processAllAvailable()
      val d1Before = new java.io.File(target, "day=d1").lastModified()
      Thread.sleep(1100) // FS mtime granularity
      src.addData((3L, "d2", 30.0), (2L, "d2", 20.0)) // update + insert, d2 ONLY
      q.processAllAvailable()
      val out = spark.read.parquet(target)
        .select("k", "day", "v").as[(Long, String, Double)].collect().toSet
      assert(out == Set((1L, "d1", 1.0), (2L, "d2", 20.0), (3L, "d2", 30.0)))
      // the untouched d1 partition dir was not rewritten by batch 2
      assert(new java.io.File(target, "day=d1").lastModified() == d1Before,
        "partition day=d1 was rewritten by a batch that only touched day=d2")
    } finally q.stop()
  }

  test("streaming as-of enrichment joins each fact to the latest prior update") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"1996-03-01 10:$m%02d:00")
    val ls = MemoryStream[Streams.AsofLeft]
    val rs = MemoryStream[Streams.AsofRight]
    val out = Streams.asofEnrichStream(ls.toDS(), rs.toDS())
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // batch 1: rate update at 10:00, facts at 10:05 (match) and 09:55 (no prior)
      rs.addData(Streams.AsofRight(1L, ts(0), 1.5))
      ls.addData(Streams.AsofLeft(1L, ts(5), 100.0),
        Streams.AsofLeft(1L, java.sql.Timestamp.valueOf("1996-03-01 09:55:00"), 50.0))
      q.processAllAvailable()
      // batch 2: new rate at 10:20; facts at 10:30 (new rate) and 10:10
      // (STILL the old rate — history survives across batches)
      rs.addData(Streams.AsofRight(1L, ts(20), 2.5))
      ls.addData(Streams.AsofLeft(1L, ts(30), 200.0), Streams.AsofLeft(1L, ts(10), 300.0))
      q.processAllAvailable()
      // batch 3: a SECOND rate at the same 10:20 instant with a smaller
      // payload — equal-ts updates resolve deterministically to the max
      rs.addData(Streams.AsofRight(1L, ts(20), 2.0))
      ls.addData(Streams.AsofLeft(1L, ts(40), 400.0))
      q.processAllAvailable()
      val got = spark.table("asof_stream")
        .as[Streams.AsofOut].collect().map(o => (o.value, o.asof_payload)).toSet
      assert(got == Set((100.0, Some(1.5)), (50.0, None),
        (200.0, Some(2.5)), (300.0, Some(1.5)), (400.0, Some(2.5))))
    } finally q.stop()
  }

  test("single-batch streaming as-of equals the oracle-checked batch asofJoin") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(42)
    def ts(m: Int) = new java.sql.Timestamp(826621200000L + m * 60000L)
    val lefts = (1 to 60).map(i =>
      Streams.AsofLeft(rnd.nextInt(5).toLong, ts(rnd.nextInt(500)), i.toDouble))
    // distinct right timestamps per key: equal-ts right updates have no
    // defined winner in the unordered stream input, so exclude that tie
    val rights = (0 until 5).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(20).map(m =>
        Streams.AsofRight(k.toLong, ts(m), k * 1000.0 + m))
    }
    val ls = MemoryStream[Streams.AsofLeft]
    val rs = MemoryStream[Streams.AsofRight]
    val q = Streams.asofEnrichStream(ls.toDS(), rs.toDS())
      .writeStream.format("memory").queryName("asof_equiv").outputMode("append").start()
    try {
      // rights first, in their own micro-batch: with both adds in one
      // batch window the engine may process the left source's batch
      // before the right rows are visible (asofEnrichStream is
      // processing-order dependent by design — the event-time variant
      // covers late arrivals), which intermittently yielded all-None
      // enrichments here
      rs.addData(rights)
      q.processAllAvailable()
      ls.addData(lefts)
      q.processAllAvailable()
      val streamed = spark.table("asof_equiv").as[Streams.AsofOut].collect()
        .map(o => (o.key, o.ts.getTime, o.value, o.asof_payload)).toSet
      val batch = graft.ops.Relational.asofJoin(
        lefts.toDF("key", "ts", "value"), rights.toDF("key", "ts", "payload"),
        Seq("key"), col("ts"), col("ts"), lit(0L), Seq("payload"))
        .select(col("key"), col("ts"), col("value"), col("asof_payload"))
        .as[(Long, java.sql.Timestamp, Double, Option[Double])].collect()
        .map(r => (r._1, r._2.getTime, r._3, r._4)).toSet
      assert(streamed == batch)
      assert(streamed.size == 60)
    } finally q.stop()
  }

  test("event-time as-of retro-matches a late right update before the watermark") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ls = MemoryStream[Streams.AsofLeft]
    val rs = MemoryStream[Streams.AsofRight]
    val q = Streams.asofEnrichStreamEventTime(ls.toDS(), rs.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("asof_et").outputMode("append").start()
    try {
      // fact at 10:05 and an old rate; watermark hasn't passed the fact
      ls.addData(Streams.AsofLeft(1L, t("2024-01-01 10:05:00"), 100.0))
      rs.addData(Streams.AsofRight(1L, t("2024-01-01 09:00:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("asof_et").count() == 0) // buffered, not emitted
      // the LATE rate update at 10:00 arrives after the fact did
      rs.addData(Streams.AsofRight(1L, t("2024-01-01 10:00:00"), 2.0))
      q.processAllAvailable()
      // another key's event advances the watermark past 10:05, then one
      // more batch lets the event-time timeout fire
      rs.addData(Streams.AsofRight(9L, t("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      rs.addData(Streams.AsofRight(9L, t("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_et").as[Streams.AsofOut].collect()
        .map(o => (o.key, o.value, o.asof_payload)).toSet
      // the fact matched the LATE 10:00 update, not the 09:00 one
      assert(got == Set((1L, 100.0, Some(2.0))))
      // the right history was trimmed to the latest entry at-or-before
      // the watermark — a later (non-late) fact must still find that
      // survivor once its own timestamp ripens
      ls.addData(Streams.AsofLeft(1L, t("2024-01-01 13:30:00"), 500.0))
      q.processAllAvailable()
      rs.addData(Streams.AsofRight(9L, t("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      rs.addData(Streams.AsofRight(9L, t("2024-01-01 16:00:00"), 0.0))
      q.processAllAvailable()
      val got2 = spark.table("asof_et").as[Streams.AsofOut].collect()
        .map(o => (o.key, o.value, o.asof_payload)).toSet
      assert(got2.contains((1L, 500.0, Some(2.0))))
    } finally q.stop()
  }

  test("streaming funnel stage counts equal the oracle-checked batch funnel") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val src = MemoryStream[Streams.Event]
    val q = Streams.funnelStream(src.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      val events = Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event].collect()
      src.addData(events.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("funnel_stream")
        .groupBy("stage").count()
        .as[(String, Long)].collect().toMap
      val batch = graft.queries.EventQueries.eventFunnel(spark, sfDir)
        .as[(String, Long)].collect().toMap.filter(_._2 > 0)
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("streaming KMV estimate converges to the batch sketch across batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 8
    val src = MemoryStream[(String, Long)]
    val q = Streams.kmvDistinctStream(src.toDS(), k)
      .writeStream.format("memory").queryName("kmv_stream").outputMode("update").start()
    val batch1 = (1 to 50).map(i => ("a", (i * 7919L) % 100000))
    val batch2 = (30 to 90).map(i => ("a", (i * 7919L) % 100000)) // overlap: replays dedupe
    try {
      src.addData(batch1); q.processAllAvailable()
      src.addData(batch2); q.processAllAvailable()
      val last = spark.table("kmv_stream").as[Streams.KmvOut].collect().last
      // expected: same formula over the k smallest distinct hashes of the union
      val hs = (batch1 ++ batch2).map(_._2).distinct.sorted.take(k)
      val expected = (k - 1).toDouble * 4294967296.0 / hs.last
      assert(last.n_kept == k)
      assert(last.est_distinct == expected)
    } finally q.stop()
  }

  test("streaming windowed counts match the oracle-checked batch twin") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = graft.queries.EventQueries.eventWindowAgg(spark, sfDir)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    // same expressions applied through the streaming entry point on a
    // bounded DF (no watermark purging in batch mode)
    val viaStreams = Streams.windowedEventCounts(Tables.events(spark, sfDir))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(viaStreams == batch)
  }
}
