package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Change feed × optimistic concurrency — the composition the two specs
  * cover separately: a LIVE keyed CDF stream tails a table while racing
  * [[Versioned.commitOcc]] writers publish through rebases. The contract
  * under test: every appended row surfaces as EXACTLY ONE insert change —
  * none missed (a rebase must not make a version invisible to the offset
  * walk), none duplicated (a carried-through file must not re-emit) — and
  * merge-on-read deletes landing mid-stream surface exactly once too. */
class VersionedCdfOccSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def tail(root: String, ckpt: String,
                   into: scala.collection.mutable.Buffer[(Long, String)]) =
    spark.readStream.format("graft-versioned-cdf").option("keys", "id").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select(col("id"), col("_change_type"))
          .as[(Long, String)].collect()
        into.synchronized { into ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()

  /** 3 writers × 3 rounds of commitOcc appends with globally unique ids;
    * returns the full id set appended. */
  private def occStorm(root: String): Set[Long] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futs = (0 until 3).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          gate.await()
          (0 until 3).foreach { r =>
            val base = 1000L * (w + 1) + 100L * r
            Versioned.commitOcc(spark,
              (base until base + 20L).map(i => (i, s"w$w-r$r")).toDF("id", "k"),
              root)
          }
        }
      })
    }
    gate.countDown()
    try futs.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    finally pool.shutdownNow()
    (0 until 3).flatMap(w => (0 until 3).flatMap(r =>
      (1000L * (w + 1) + 100L * r) until (1000L * (w + 1) + 100L * r + 20L)))
      .toSet
  }

  test("live keyed feed under racing OCC appenders: every insert exactly once") {
    val root = tmpDir("graft_cdfocc")
    Versioned.commit(spark,
      (1L to 50L).map(i => (i, "base")).toDF("id", "k").coalesce(1), root)
    val ckpt = tmpDir("graft_cdfocc_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = tail(root, ckpt, buf)
    try {
      q.processAllAvailable()
      assert(buf.isEmpty) // tail-only start
      // drain WHILE the storm runs: micro-batch windows land at arbitrary
      // rebase boundaries — drains mid-storm are the point of the test
      val storming = new java.util.concurrent.atomic.AtomicBoolean(true)
      val drainer = new Thread(() => {
        while (storming.get()) { q.processAllAvailable(); Thread.sleep(20) }
      })
      drainer.start()
      val appended =
        try occStorm(root)
        finally { storming.set(false); drainer.join() }
      q.processAllAvailable()
      val byId = buf.synchronized(buf.groupBy(_._1))
      val dupes = byId.filter(_._2.size > 1)
      assert(dupes.isEmpty, s"duplicated change rows: ${dupes.keys.toSeq.sorted.take(5)}")
      val missing = appended.diff(byId.keySet)
      assert(missing.isEmpty, s"missed change rows: ${missing.toSeq.sorted.take(5)}")
      assert(byId.keySet == appended)
      assert(buf.synchronized(buf.forall(_._2 == "insert")))
      // merge-on-read deletes while the stream lives: exactly once each
      Versioned.deleteWhereDv(spark, root, col("id").between(1001L, 1003L))
      q.processAllAvailable()
      val dels = buf.synchronized(buf.filter(_._2 == "delete").map(_._1).sorted.toSeq)
      assert(dels == Seq(1001L, 1002L, 1003L))
      assert(buf.size == appended.size + 3)
    } finally q.stop()
  }

  test("a DOWN stream misses an OCC storm; restart delivers the window once") {
    val root = tmpDir("graft_cdfocc_dn")
    Versioned.commit(spark,
      (1L to 50L).map(i => (i, "base")).toDF("id", "k").coalesce(1), root)
    val ckpt = tmpDir("graft_cdfocc_dn_ckpt")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = tail(root, ckpt, buf)
    try { q.processAllAvailable(); assert(buf.isEmpty) } finally q.stop()
    // the whole storm lands while the stream is down — the restart reads
    // one catch-up window spanning every rebase
    val appended = occStorm(root)
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q2 = tail(root, ckpt, buf2)
    try {
      q2.processAllAvailable()
      val ids = buf2.synchronized(buf2.map(_._1))
      assert(ids.distinct.size == ids.size, "duplicated rows in catch-up window")
      assert(ids.toSet == appended, s"catch-up window wrong: ${ids.size} vs ${appended.size}")
      assert(buf2.synchronized(buf2.forall(_._2 == "insert")))
    } finally q2.stop()
  }
}
