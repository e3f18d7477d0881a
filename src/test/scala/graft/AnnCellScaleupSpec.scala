package graft

import graft.ops.AnnIndex
import org.apache.spark.sql.functions._

/** The scale-the-cells recipe ([[graft.ops.AnnIndex.trainAndRebuild]]'s
  * scaladoc): retraining the SAME corpus at 2× the cells via
  * `cellLabelCol` — the production response to a grown index — must (a)
  * leave the PQ geometry untouched (decoupled coarse quantizer), (b)
  * search layout-INVARIANTLY at nprobe = every cell (each candidate still
  * meets each query exactly once, in its home cell, so only the `cluster`
  * column changes), and (c) surface the finer layout through cellStats,
  * which is how the operator decides the retrain worked.
  */
class AnnCellScaleupSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("a 2x-cell retrain searches identically at full probe width; " +
    "only the cluster layout changes") {
    val emb0 = Tables.table(spark, sfDir, "embeddings")
    val emb = emb0.withColumn("cell", pmod(col("vec_id"), lit(20)).cast("int"))
    val queries = emb.filter(col("vec_id") < 20)

    // 1x: the fixture's own labels (10 cells)
    val m1 = tmp("annm_1x"); val c1 = tmp("annc_1x")
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, m1, c1)
    val cells1 = AnnIndex.model(spark, m1)._1.count().toInt

    // 2x: 20 cells via cellLabelCol — the PQ book keeps its 10 seed
    // labels, so the encode geometry (and every code) is unchanged
    val m2 = tmp("annm_2x"); val c2 = tmp("annc_2x")
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, m2, c2,
      cellLabelCol = "cell")
    val cells2 = AnnIndex.model(spark, m2)._1.count().toInt
    assert(cells1 == 10 && cells2 == 20)
    assert(AnnIndex.model(spark, m2)._2.count() == 10L) // book: 10 codewords

    // at nprobe = every cell the scored pair set is the whole corpus per
    // query under EITHER layout — results must agree row for row once
    // the (layout-dependent) home-cell column is dropped
    def full(mr: String, cr: String, cells: Int) =
      AnnIndex.search(spark, queries, mr, cr, k = 3, nprobe = cells)
        .drop("cluster").collect().toSet
    val r1 = full(m1, c1, cells1)
    val r2 = full(m2, c2, cells2)
    assert(r1 == r2 && r1.nonEmpty)

    // the finer layout is visible where the operator looks: 20 occupancy
    // rows, shares summing to 1, and a narrow search prunes against 20
    // cell files instead of 10
    val occ = AnnIndex.cellStats(spark, c2, m2)
    assert(occ.count() == 20L)
    import scala.jdk.CollectionConverters._
    val total2 = java.nio.file.Files.walk(java.nio.file.Paths.get(c2))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    // the range partitioner SAMPLES its boundaries, so two adjacent
    // cells can occasionally share a file — assert the finer layout
    // (strictly more, disjointly-ranged files than the 10-cell build),
    // not an exact one-per-cell count
    assert(total2 > 10 && total2 <= 20,
      s"2x codes table has $total2 files (want a finer layout than 10, at most 20)")

    // the prepared handle rides the 2x pair unchanged (same search
    // surface at any cell count)
    val handle = AnnIndex.prepare(spark, m2, c2)
    assert(handle.search(queries, k = 3, nprobe = cells2)
      .drop("cluster").collect().toSet == r2)
  }
}
