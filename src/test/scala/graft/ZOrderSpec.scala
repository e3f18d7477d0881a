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
}
