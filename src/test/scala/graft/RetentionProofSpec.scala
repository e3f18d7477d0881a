package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Metadata-only DELETE via strict stats proofs (StatsProofs through
  * Versioned.deleteWhere/updateWhere): files proven all-match are dropped
  * from the manifest with zero I/O, files proven match-free are carried
  * unprobed, only undecided files are scanned and rewritten. Asserted at
  * the FILE level (data-dir contents, manifest entries, history
  * files_added), plus the soundness edges: strict-vs-inclusive bounds on
  * exact file min/max, null rows blocking the all-match proof, the
  * -0.0/0.0 float hazard, and a property test against plain filter
  * semantics.
  */
class RetentionProofSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  /** All parquet file names currently on disk under the table root. */
  private def diskFiles(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val d = new java.io.File(root)
    if (!d.exists()) Set.empty
    else walk(d).map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  /** Manifest entries (relative paths) of the newest version. */
  private def entries(root: String): Set[String] =
    Versioned.snapshotFiles(spark, root).map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet

  /** 3 commits x 1 file of 100 rows each, id-banded, stats on id. */
  private def buildBanded(): String = {
    val root = tmpRoot("graft_ret")
    (0 to 2).foreach { i =>
      Versioned.commit(spark,
        ((i * 100 + 1).toLong to (i * 100 + 100).toLong).map(j => (j, j * 2.0))
          .toDF("id", "x").coalesce(1), root, statsCols = Seq("id"))
    }
    root
  }

  test("all-match band is dropped metadata-only; no-match bands carried unprobed") {
    val root = buildBanded()
    val before = diskFiles(root)
    val entriesBefore = entries(root)
    assert(Versioned.deleteWhere(spark, root, $"id" <= 100) == 4L)
    // zero I/O: nothing written (and nothing deleted until vacuum)
    assert(diskFiles(root) == before, "a proven delete must write no files")
    // manifest: band-1 file gone, bands 2+3 carried under their old names
    assert(entries(root).subsetOf(entriesBefore) && entries(root).size == 2)
    assert(Versioned.read(spark, root).count() == 200)
    assert(Versioned.read(spark, root).agg(min($"id")).as[Long].head() == 101L)
    // history confirms the commit added no files
    val added = Versioned.history(spark, root)
      .filter($"version" === 4).select("files_added").as[Option[Long]].head()
    assert(added.contains(0L))
  }

  test("strict bound on the exact file max is NOT dropped") {
    val root = buildBanded()
    val before = diskFiles(root)
    // band 1 max is exactly 100: `id < 100` must keep row 100 → rewrite
    Versioned.deleteWhere(spark, root, $"id" < 100)
    assert(diskFiles(root) != before, "boundary file must be rewritten, not dropped")
    assert(Versioned.read(spark, root).count() == 201)
    assert(Versioned.read(spark, root).filter($"id" === 100).count() == 1)
  }

  test("straddling cutoff: drop + rewrite + carry in one commit") {
    val root = buildBanded()
    val entriesBefore = entries(root).toSeq.sorted
    Versioned.deleteWhere(spark, root, $"id" <= 150)
    val after = entries(root)
    // band 3 carried by its original name; bands 1+2 names gone
    assert(after.intersect(entriesBefore.toSet).size == 1)
    assert(Versioned.read(spark, root).count() == 150)
    assert(Versioned.read(spark, root).agg(min($"id")).as[Long].head() == 151L)
  }

  test("null rows block the all-match proof and survive the delete") {
    val root = tmpRoot("graft_ret_null")
    val ids: Seq[Option[Long]] = (1L to 100L).map(Option(_)) ++ Seq(None, None)
    Versioned.commit(spark, ids.toDF("id").coalesce(1), root, statsCols = Seq("id"))
    val before = diskFiles(root)
    Versioned.deleteWhere(spark, root, $"id" <= 100)
    // the file contains nulls → not provable → rewritten, nulls kept
    assert(diskFiles(root) != before)
    val left = Versioned.read(spark, root)
    assert(left.count() == 2 && left.filter($"id".isNull).count() == 2)
  }

  test("IS NOT NULL: clean file dropped, mixed file rewritten to its nulls") {
    val root = tmpRoot("graft_ret_nn")
    Versioned.commit(spark, (1L to 50L).map(Option(_)).toDF("id").coalesce(1),
      root, statsCols = Seq("id"))
    Versioned.commit(spark,
      ((51L to 60L).map(Option(_)) ++ Seq(None, None)).toDF("id").coalesce(1),
      root, statsCols = Seq("id"))
    val entriesBefore = entries(root)
    Versioned.deleteWhere(spark, root, $"id".isNotNull)
    // commit-1's file (no nulls) proven all-match → dropped; commit-2's
    // file rewritten down to its two null rows
    assert(entries(root).intersect(entriesBefore).isEmpty)
    val left = Versioned.read(spark, root)
    assert(left.count() == 2 && left.filter($"id".isNull).count() == 2)
  }

  test("float stats never prove: SQL -0.0 == 0.0 vs the stats total order") {
    val root = tmpRoot("graft_ret_f")
    Versioned.commit(spark, Seq(0.0, 1.0).toDF("x").coalesce(1),
      root, statsCols = Seq("x"))
    // SQL: 0.0 <= -0.0 is TRUE (equal); the stats total order says
    // min 0.0 > -0.0 and would wrongly prove "no row matches"
    Versioned.deleteWhere(spark, root, $"x" <= -0.0)
    assert(Versioned.read(spark, root).as[Double].collect().toSeq == Seq(1.0))
    // and the all-match direction: max -0.0 "< 0.0" in the total order,
    // but SQL keeps -0.0 rows under `x < 0.0` — file must not be dropped
    val root2 = tmpRoot("graft_ret_f2")
    Versioned.commit(spark, Seq(-1.0, -0.0).toDF("x").coalesce(1),
      root2, statsCols = Seq("x"))
    Versioned.deleteWhere(spark, root2, $"x" < 0.0)
    assert(Versioned.read(spark, root2).as[Double].collect().toSeq == Seq(-0.0))
  }

  test("fractional bound against a long column never proves (coerce truncates)") {
    // coerce() truncates a Double bound via longValue; the proofs must
    // reject the lossy coercion and fall back to scanning. Both hazard
    // directions:
    //  - all-match: ids -5..0, `id <= -0.5` truncated to `id <= 0` would
    //    drop the file; SQL keeps id=0 (0 <= -0.5 is FALSE)
    val root = tmpRoot("graft_ret_frac")
    Versioned.commit(spark, (-5L to 0L).toDF("id").coalesce(1),
      root, statsCols = Seq("id"))
    Versioned.deleteWhere(spark, root, $"id" <= -0.5)
    assert(Versioned.read(spark, root).as[Long].collect().toSeq == Seq(0L))
    //  - no-match: ids 100..200, `id < 100.5` truncated to `id < 100`
    //    would carry the file unprobed; SQL deletes id=100
    val root2 = tmpRoot("graft_ret_frac2")
    Versioned.commit(spark, (100L to 200L).toDF("id").coalesce(1),
      root2, statsCols = Seq("id"))
    Versioned.deleteWhere(spark, root2, $"id" < 100.5)
    assert(Versioned.read(spark, root2).agg(min($"id")).as[Long].head() == 101L)
    assert(Versioned.read(spark, root2).count() == 100)
    // an integral Double bound IS lossless and still proves: whole band
    // dropped metadata-only
    val root3 = tmpRoot("graft_ret_frac3")
    Versioned.commit(spark, (1L to 50L).toDF("id").coalesce(1),
      root3, statsCols = Seq("id"))
    Versioned.commit(spark, (51L to 100L).toDF("id").coalesce(1),
      root3, statsCols = Seq("id"))
    val before = diskFiles(root3)
    Versioned.deleteWhere(spark, root3, $"id" <= 50.0)
    assert(diskFiles(root3) == before, "integral double bound must still prove")
    assert(Versioned.read(spark, root3).count() == 50)
  }

  test("timestamp retention: date-banded table drops the old band metadata-only") {
    val root = tmpRoot("graft_ret_ts")
    def day(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    val rows = Seq("2024-01-01", "2024-01-02", "2024-02-01", "2024-02-02")
      .map(day)
    Versioned.commit(spark, rows.take(2).toDF("ts").coalesce(1),
      root, statsCols = Seq("ts"))
    Versioned.commit(spark, rows.drop(2).toDF("ts").coalesce(1),
      root, statsCols = Seq("ts"))
    val before = diskFiles(root)
    Versioned.deleteWhere(spark, root, $"ts" < day("2024-02-01"))
    assert(diskFiles(root) == before, "old month must be dropped without I/O")
    assert(Versioned.read(spark, root).count() == 2)
  }

  test("update uses the proofs to skip probing but never drops files") {
    val root = buildBanded()
    Versioned.updateWhere(spark, root, $"id" <= 100, Map("x" -> lit(0.0)))
    val t = Versioned.read(spark, root)
    assert(t.count() == 300)
    assert(t.filter($"x" === 0.0).count() == 100)
    assert(t.filter($"id" > 100 && $"x" === $"id" * 2.0).count() == 200)
  }

  test("property: proven deletes equal plain filter semantics") {
    val rnd = new scala.util.Random(7)
    // op -> (Column predicate, reference semantics on a non-null value)
    val ops: Seq[(Long => org.apache.spark.sql.Column, (Long, Long) => Boolean)] = Seq(
      (c => $"id" < c, (v, c) => v < c),
      (c => $"id" <= c, (v, c) => v <= c),
      (c => $"id" > c, (v, c) => v > c),
      (c => $"id" >= c, (v, c) => v >= c),
      (c => $"id" === c, (v, c) => v == c))
    (1 to 12).foreach { _ =>
      val root = tmpRoot("graft_ret_prop")
      val bands = (0 until 3).map { b =>
        val lo = rnd.nextInt(50) + b * 100
        (lo.toLong to (lo + 30 + rnd.nextInt(40)).toLong)
          .map(v => if (rnd.nextInt(10) == 0) None else Some(v))
      }
      bands.foreach(vs => Versioned.commit(spark, vs.toDF("id").coalesce(1),
        root, statsCols = Seq("id")))
      val cut = rnd.nextInt(300).toLong
      val (mkPred, matches) = ops(rnd.nextInt(ops.size))
      // SQL three-valued logic: a null id never matches, so it survives
      val keep = bands.flatten.filterNot(_.exists(matches(_, cut)))
      Versioned.deleteWhere(spark, root, mkPred(cut))
      val got = Versioned.read(spark, root).as[Option[Long]].collect()
      assert(got.sorted.toSeq == keep.sorted,
        s"pred=${mkPred(cut)}: got ${got.length}, want ${keep.length}")
    }
  }
}
