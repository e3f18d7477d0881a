package graft

import graft.io.Versioned
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.{Failure, Success, Try}

/** Optimistic-concurrency writers on the versioned table: racing OCC
  * appends all land (no lost updates, no duplicated rows), an appender
  * racing a compactor interleaves safely (the append-vs-compact pair
  * every real deployment eventually runs), compact-vs-compact dies loud
  * rather than resurrecting rewritten rows, and the single-writer
  * `commit` path's second-writer detection is race-free within a JVM
  * (the publish lock closes the local-FS exists+rename window).
  */
class VersionedOccSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_occ").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Run `fns` concurrently after a common start latch; returns each
    * outcome. Threads, not Spark jobs — the race under test is the
    * driver-side commit protocol. */
  private def race[A](fns: Seq[() => A]): Seq[Try[A]] = {
    val pool = Executors.newFixedThreadPool(fns.size)
    val start = new CountDownLatch(1)
    try {
      val futs = fns.map { fn =>
        pool.submit(new java.util.concurrent.Callable[Try[A]] {
          def call(): Try[A] = { start.await(); Try(fn()) }
        })
      }
      start.countDown()
      futs.map(_.get(300, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("commitOcc sequentially: schema merge, tag, stats sidecar, pruning work") {
    val root = tmpRoot()
    Versioned.commitOcc(spark, Seq((1L, "a")).toDF("id", "v"), root,
      tag = Some("first"), statsCols = Seq("id"))
    Versioned.commitOcc(spark, Seq((2L, "b", 9.5)).toDF("id", "v", "x"), root,
      statsCols = Seq("id"))
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))
    val snap = Versioned.read(spark, root)
    assert(snap.columns.toSeq == Seq("id", "v", "x"), "additive schema merge")
    assert(snap.count() == 2)
    // sidecar stats landed in the uniquely-named batch dirs and pruning
    // still resolves them (dir names are opaque to the sidecar machinery)
    val dataDir = new java.io.File(root, "data")
    val buDirs = dataDir.listFiles().filter(_.getName.startsWith("bu"))
    assert(buDirs.length == 2, "OCC batches write uniquely-named dirs")
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    buDirs.foreach { d =>
      assert(graft.io.FileStats.readSidecar(hfs,
        new org.apache.hadoop.fs.Path(d.getAbsolutePath)).nonEmpty,
        s"stats sidecar missing in ${d.getName}")
    }
    val pruned = Versioned.readPruned(spark, root, "id", Some(2L), Some(2L))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("racing OCC appends: every writer lands exactly once") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((0L, "seed")).toDF("id", "v"), root)
    val writers = (1 to 6).map { i => () =>
      Versioned.commitOcc(spark, Seq((i.toLong, s"w$i")).toDF("id", "v"), root)
    }
    val outcomes = race(writers)
    assert(outcomes.forall(_.isSuccess), s"all appends must land: $outcomes")
    assert(outcomes.map(_.get).sorted == (2L to 7L), "contiguous versions, one per writer")
    val rows = Versioned.read(spark, root).as[(Long, String)].collect().toSet
    assert(rows == (Set(0L -> "seed") ++ (1 to 6).map(i => i.toLong -> s"w$i")),
      "no lost updates, no duplicates")
  }

  test("appender racing a compactor: both effects land, rows exact") {
    val root = tmpRoot()
    // seed with 6 tiny files (one per commit) so the compactor has inputs
    (1 to 6).foreach { i =>
      Versioned.commit(spark,
        Seq((i.toLong, "seed")).toDF("id", "v").coalesce(1), root)
    }
    val appends = (10 to 13).map { i => () =>
      Versioned.commitOcc(spark,
        Seq((i.toLong, s"app$i")).toDF("id", "v").coalesce(1), root): Any
    }
    val compact = () =>
      Versioned.compactSmallOcc(spark, root,
        smallBytes = Long.MaxValue, targetBytes = Long.MaxValue): Any
    val outcomes = race(compact +: appends)
    assert(outcomes.tail.forall(_.isSuccess), s"appends must all land: $outcomes")
    outcomes.head match {
      case Success(_) => // compaction won some interleaving
      case Failure(e: IllegalStateException) =>
        // legal only as the documented loud conflict, never silent
        assert(e.getMessage.contains("compaction"), e.getMessage)
      case Failure(e) => fail(s"unexpected compactor failure: $e")
    }
    val rows = Versioned.read(spark, root).as[(Long, String)].collect().toSet
    assert(rows == ((1 to 6).map(i => i.toLong -> "seed").toSet
      ++ (10 to 13).map(i => i.toLong -> s"app$i")),
      "compaction re-layout + concurrent appends must preserve exact rows")
  }

  test("compact-vs-compact: rows never change; a loser dies loud or no-ops") {
    val root = tmpRoot()
    (1 to 8).foreach { i =>
      Versioned.commit(spark,
        Seq((i.toLong, i * 1.5)).toDF("id", "x").coalesce(1), root)
    }
    val compactor = () =>
      Versioned.compactSmallOcc(spark, root,
        smallBytes = Long.MaxValue, targetBytes = Long.MaxValue)
    val outcomes = race(Seq(compactor, compactor))
    assert(outcomes.exists(_.isSuccess), "at least one compaction lands")
    outcomes.foreach {
      case Success(_) => ()
      case Failure(e: IllegalStateException) =>
        assert(e.getMessage.contains("compaction conflict"),
          s"a losing compactor must die LOUD, naming the conflict: ${e.getMessage}")
      case Failure(e) => fail(s"unexpected failure: $e")
    }
    val rows = Versioned.read(spark, root).as[(Long, Double)].collect().toSet
    assert(rows == (1 to 8).map(i => i.toLong -> i * 1.5).toSet)
    // no stale-input resurrection: row count stable, content identical
  }

  test("single-writer commit: a same-version race dies loud in-JVM, state consistent") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val w = (tag: String) => () =>
      Versioned.commit(spark, Seq((2L, tag)).toDF("id", "v"), root, tag = Some(tag))
    val outcomes = race(Seq(w("left"), w("right")))
    val oks = outcomes.count(_.isSuccess)
    // the two non-OCC writers target the SAME version: at most one may
    // win, the loser must die loud — never both "succeed"
    assert(oks <= 1, s"both single-writer commits claimed success: $outcomes")
    outcomes.filter(_.isFailure).foreach {
      case Failure(e) =>
        assert(e.getMessage != null, s"silent failure: $e")
      case _ => ()
    }
    // whatever happened, the table must still read consistently: every
    // manifest-listed file exists and rows come only from winners
    val rows = Versioned.read(spark, root).as[(Long, String)].collect().toSeq
    assert(rows.count(_._1 == 1L) == 1)
    assert(rows.count(_._1 == 2L) <= 1, "a lost commit must not leave rows behind")
  }

  test("OCC append revalidates against a constraint added mid-flight era") {
    // sequential shape of the matrix row: constraints present at publish
    // time gate the batch even though prepare-time had none
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 5.0)).toDF("id", "x"), root)
    Versioned.addConstraint(spark, root, "x_pos", "x > 0")
    val e = intercept[IllegalArgumentException] {
      Versioned.commitOcc(spark, Seq((2L, -3.0)).toDF("id", "x"), root)
    }
    assert(e.getMessage.contains("x_pos"))
    assert(Versioned.read(spark, root).count() == 1)
    Versioned.commitOcc(spark, Seq((2L, 3.0)).toDF("id", "x"), root)
    assert(Versioned.read(spark, root).count() == 2)
  }
}
