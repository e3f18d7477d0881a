package graft

import graft.functions.Kernels
import graft.io.Versioned
import org.apache.spark.sql.functions._

/** The Z-order layout must interleave correctly (bit-level reference
  * check) and actually deliver its point: file pruning on EITHER
  * dimension, where a single-column sort layout prunes only its own.
  */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("zorder2 interleaves bits exactly (reference implementation)") {
    def reference(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 16) {
        out |= ((a >> i) & 1L) << (2 * i)
        out |= ((b >> i) & 1L) << (2 * i + 1)
      }
      out
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val a = rnd.nextInt(65536).toLong
      val b = rnd.nextInt(65536).toLong
      assert(Kernels.zorder2(a, b) == reference(a, b), s"a=$a b=$b")
    }
    // inputs beyond 16 bits are masked, not wrapped
    assert(Kernels.zorder2(0x1FFFFL, 0L) == Kernels.zorder2(0xFFFFL, 0L))
  }

  test("expression and kernel agree through the codegen path") {
    val df = (0 until 256).map(i => (i.toLong * 257, (255 - i).toLong * 13))
      .toDF("a", "b")
    val got = df.select(
      graft.functions.GraftExpressions.zorder2(col("a"), col("b")).as("z"),
      col("a"), col("b")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == Kernels.zorder2(r.getLong(1), r.getLong(2)))
    }
  }

  test("z-ordered layout prunes file opens on EITHER dimension") {
    val grid = for { x <- 0 until 100; y <- 0 until 100 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")

    val zRoot = tmpRoot()
    Versioned.commitZOrdered(spark, df, zRoot, "x", "y", nFiles = 16)
    assert(Versioned.read(spark, zRoot).inputFiles.length == 16)

    // single-column sort layout on x, stats on both columns, for contrast
    val xRoot = tmpRoot()
    Versioned.commit(spark,
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x"),
      xRoot, statsCols = Seq("x", "y"))

    def opened(root: String, c: String, lo: Long, hi: Long): Int =
      Versioned.readPruned(spark, root, c, Some(lo), Some(hi)).inputFiles.length

    // a 10%-wide slice in x: both layouts prune
    assert(opened(zRoot, "x", 10L, 19L) <= 8)
    assert(opened(xRoot, "x", 10L, 19L) <= 4)
    // a 10%-wide slice in y: the z-layout still prunes, x-sort cannot
    assert(opened(zRoot, "y", 10L, 19L) <= 8,
      s"z-layout should prune on y, opened ${opened(zRoot, "y", 10L, 19L)}")
    assert(opened(xRoot, "y", 10L, 19L) == 16,
      "x-sorted layout has full-range y stats in every file")

    // and rows are exactly the filter's, both dimensions, both layouts
    for (root <- Seq(zRoot, xRoot); c <- Seq("x", "y")) {
      val got = Versioned.readPruned(spark, root, c, Some(10L), Some(19L))
        .select("x", "y").collect().toSet
      val expect = Versioned.read(spark, root)
        .filter(col(c).between(10L, 19L)).select("x", "y").collect().toSet
      assert(got == expect)
    }
  }

  test("zorderN generalizes zorder2 and matches its own reference at any arity") {
    def reference(ranks: Seq[Long], bits: Int): Long = {
      var out = 0L
      for (i <- 0 until bits; r <- ranks.indices)
        out |= ((ranks(r) >> i) & 1L) << (i * ranks.length + r)
      out
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rnd.nextInt(65536).toLong
      val b = rnd.nextInt(65536).toLong
      assert(Kernels.zorderN(Array(a, b), 16) == Kernels.zorder2(a, b))
    }
    for (d <- 2 to 8; _ <- 1 to 100) {
      val bits = graft.functions.GraftExpressions.ZOrderNExpr.bitsFor(d)
      assert(d * bits <= 63)
      val ranks = Array.fill(d)(rnd.nextLong().abs & ((1L << bits) - 1))
      val z = Kernels.zorderN(ranks, bits)
      assert(z == reference(ranks.toSeq, bits), s"d=$d")
      assert(z >= 0, "sign bit must stay clear")
    }
  }

  test("zorderN expression: codegen path agrees with the kernel, nulls propagate") {
    val df = (0 until 128).map(i =>
      (i.toLong * 31, (127 - i).toLong * 17, i.toLong * 7)).toDF("a", "b", "c")
    val bits = graft.functions.GraftExpressions.ZOrderNExpr.bitsFor(3)
    val got = df.select(
      graft.functions.GraftExpressions.zorderN(Seq(col("a"), col("b"), col("c"))).as("z"),
      col("a"), col("b"), col("c")).collect()
    got.foreach { r =>
      assert(r.getLong(0) ==
        Kernels.zorderN(Array(r.getLong(1), r.getLong(2), r.getLong(3)), bits))
    }
    val withNull = Seq((Some(1L), Option.empty[Long], Some(2L)))
      .toDF("a", "b", "c")
      .select(graft.functions.GraftExpressions.zorderN(
        Seq(col("a"), col("b"), col("c"))).as("z")).collect()
    assert(withNull(0).isNullAt(0), "a null rank must null the curve")
  }

  test("3-D z-order layout prunes file opens on EACH dimension") {
    // 32x32x4 grid: every dimension gets a genuine value range
    val grid = for { x <- 0 until 32; y <- 0 until 32; z <- 0 until 4 }
      yield (x.toLong, y.toLong, z.toLong)
    val df = grid.toDF("x", "y", "z")
    val root = tmpRoot()
    Versioned.commitZOrderedN(spark, df, root, Seq("x", "y", "z"), nFiles = 16)
    assert(Versioned.read(spark, root).inputFiles.length == 16)

    def opened(c: String, lo: Long, hi: Long): Int =
      Versioned.readPruned(spark, root, c, Some(lo), Some(hi)).inputFiles.length

    // a 25%-wide slice in x or y must skip file opens; z has only 4
    // distinct values so a single-value slice still prunes
    assert(opened("x", 0L, 7L) < 16, s"x slice opened ${opened("x", 0L, 7L)}")
    assert(opened("y", 0L, 7L) < 16, s"y slice opened ${opened("y", 0L, 7L)}")
    assert(opened("z", 0L, 0L) < 16, s"z slice opened ${opened("z", 0L, 0L)}")

    // correctness: pruned reads return exactly the filter's rows
    for (c <- Seq("x", "y", "z")) {
      val got = Versioned.readPruned(spark, root, c, Some(0L), Some(3L))
        .select("x", "y", "z").collect().toSet
      val expect = Versioned.read(spark, root)
        .filter(col(c).between(0L, 3L)).select("x", "y", "z").collect().toSet
      assert(got == expect)
    }
  }
}
