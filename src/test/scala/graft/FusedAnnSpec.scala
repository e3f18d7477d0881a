package graft

import graft.ops.{AnnIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-identity of the fused whole-codebook kernels (nearestKLabels /
  * pqCodesAll / pqReconCosQ — one map-side projection per vector)
  * against the crossJoin + explode + bounded-heap row plans they
  * replace, A/B'd through the `spark.graft.fusedAnn` kill-switch on the
  * same inputs: randomized embeddings plus the edge rows the heap
  * semantics pin — a NULL embedding (must still assign/encode, to the
  * smallest labels), a zero vector (NaN cosine ranks GREATEST under
  * Double.compare), and duplicated centroids (equal scores break to the
  * smallest label). */
class FusedAnnSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8

  private def embFixture(): DataFrame = {
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, Seq[Float], Int)] =
      (0L until 200L).map { i =>
        (i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f), (i % 5).toInt)
      } ++ Seq(
        (200L, null, 0),                        // null embedding
        (201L, Seq.fill(dim)(0f).toSeq, 1))     // zero vector → NaN cosine
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label"))
  }

  private def withFused[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.fusedAnn", on.toString)
    try body finally spark.conf.unset("spark.graft.fusedAnn")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("fused assignClusters matches the heap plan at nprobe 1 and 2") {
    val emb = embFixture()
    val cent = Similarity.quantizedCentroids(
      emb.select(col("label"), col("embedding")))
    for (nprobe <- Seq(1, 2)) {
      val fused = withFused(on = true)(
        sortedRows(Similarity.assignClusters(
          emb.select(col("vec_id"), col("embedding")), cent, nprobe)))
      val rowPlan = withFused(on = false)(
        sortedRows(Similarity.assignClusters(
          emb.select(col("vec_id"), col("embedding")), cent, nprobe)))
      assert(fused == rowPlan, s"assignClusters diverged at nprobe=$nprobe")
      assert(fused.nonEmpty)
    }
  }

  test("fused assignClusters keeps null-embedding rows (smallest label)") {
    val emb = embFixture()
    val cent = Similarity.quantizedCentroids(
      emb.select(col("label"), col("embedding")))
    val minLabel = cent.agg(min(col("rlabel"))).head().get(0)
    val assigned = withFused(on = true)(
      Similarity.assignClusters(
        emb.select(col("vec_id"), col("embedding")), cent, 1)
        .filter(col("vec_id") === 200L).collect())
    assert(assigned.length == 1)
    assert(assigned.head.get(2) == minLabel)
  }

  test("fused assignClusters breaks duplicate-centroid ties to the smallest label") {
    val emb = embFixture().filter(col("vec_id") < 50)
    // two identical centroids under different labels: every vector
    // scores them equally, so label 7 must never win over label 3
    val v = Seq.fill(dim)(1.0)
    val cent = Seq((3L, v), (7L, v)).toDF("rlabel", "cvec")
    for (on <- Seq(true, false)) {
      val got = withFused(on)(
        Similarity.assignClusters(
          emb.select(col("vec_id"), col("embedding")), cent, 1).collect())
      assert(got.forall(_.getLong(2) == 3L), s"fused=$on")
    }
  }

  test("fused pqEncode matches the heap plan (nulls and zero vectors included)") {
    val emb = embFixture()
    val book = Similarity.pqCodebook(
      emb.select(col("label"), col("embedding"))
        .withColumn("vec_id", monotonically_increasing_id()))
    val m = 4; val dsub = 2
    val fused = withFused(on = true)(
      sortedRows(Similarity.pqEncode(
        emb.select(col("vec_id"), col("embedding")), book, m, dsub)))
    val rowPlan = withFused(on = false)(
      sortedRows(Similarity.pqEncode(
        emb.select(col("vec_id"), col("embedding")), book, m, dsub)))
    assert(fused == rowPlan)
    assert(fused.size == 202 * m)
  }

  test("fused pqRefineBook matches the join plan") {
    val emb = embFixture()
    val book0 = Similarity.pqCodebook(
      emb.select(col("label"), col("embedding"))
        .withColumn("vec_id", monotonically_increasing_id()))
    val m = 4; val dsub = 2
    val fused = withFused(on = true)(
      sortedRows(Similarity.pqRefineBook(emb, book0, m, dsub)))
    val rowPlan = withFused(on = false)(
      sortedRows(Similarity.pqRefineBook(emb, book0, m, dsub)))
    assert(fused == rowPlan)
  }

  test("fused train + driftStats matches the row-plan lifecycle bit for bit") {
    val emb = embFixture()
    def run(on: Boolean, tag: String): Seq[String] = withFused(on) {
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"fusedann_model_$tag").getAbsolutePath
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
      AnnIndex.train(spark, emb, m = 4, dsub = 2, root)
      sortedRows(AnnIndex.driftStats(spark, emb, root))
    }
    val fused = run(on = true, "on")
    val rowPlan = run(on = false, "off")
    assert(fused == rowPlan)
    assert(fused.nonEmpty)
  }
}
