package graft

import graft.ops.{AnnIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-identity of the PACKED codes shape (one (vec_id, cluster, codes)
  * row per vector — the persisted index layout since r19) against the
  * exploded (vec_id, sub, code) row shape it replaced, A/B'd across
  * every seam that packs, explodes or consumes the array:
  *   - pqEncodePacked vs pqEncode (fused kernel vs heap plan via the
  *     kill-switch, nulls and zero vectors included);
  *   - ivfPqTopKIndexed over the packed frame vs over the exploded
  *     frame (map-side pqReconstructK vs the codes⋈book groupBy), both
  *     kill-switch positions;
  *   - encodeCodes (the shared writer) fused vs fallback;
  *   - the inner-join edge: a code label ABSENT from the book drops
  *     that subspace's piece — and a vector with no surviving piece
  *     disappears — identically in both shapes. */
class PackedCodesSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8

  private def embFixture(): DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Seq[Float], Int)] =
      (0L until 120L).map { i =>
        (i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f), (i % 4).toInt)
      } ++ Seq(
        (120L, null, 0),                    // null embedding
        (121L, Seq.fill(dim)(0f).toSeq, 1)) // zero vector -> NaN cosine
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

  test("pqEncodePacked equals pqEncode exploded, both kill-switch positions") {
    val emb = embFixture()
    val book = Similarity.pqCodebook(
      emb.select(col("label"), col("embedding"))
        .withColumn("vec_id", monotonically_increasing_id()))
    val m = 4; val dsub = 2
    for (on <- Seq(true, false)) {
      val packed = withFused(on)(
        Similarity.pqEncodePacked(
          emb.select(col("vec_id"), col("embedding")), book, m, dsub))
      val exploded = packed.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      val rows = withFused(on)(
        Similarity.pqEncode(
          emb.select(col("vec_id"), col("embedding")), book, m, dsub))
      assert(sortedRows(exploded) == sortedRows(rows), s"fused=$on")
      assert(packed.count() == 122L)
    }
  }

  test("ivfPqTopKIndexed: packed equals exploded, both kill-switch positions") {
    val emb = embFixture()
    val cent = Similarity.quantizedCentroids(
      emb.select(col("label"), col("embedding")))
    val book = Similarity.pqCodebook(
      emb.select(col("label"), col("embedding"))
        .withColumn("vec_id", monotonically_increasing_id()))
    val m = 4; val dsub = 2
    val packed = AnnIndex.encodeCodes(emb, cent, book, m, dsub)
    val exploded = packed.select(col("vec_id"), col("cluster"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val queries = Similarity.assignClusters(
      emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
      cent, 2)
    for (on <- Seq(true, false)) {
      val fromPacked = withFused(on)(sortedRows(
        Similarity.ivfPqTopKIndexed(packed, queries, book, dsub, k = 3)))
      val fromRows = withFused(on)(sortedRows(
        Similarity.ivfPqTopKIndexed(exploded, queries, book, dsub, k = 3)))
      assert(fromPacked == fromRows, s"fused=$on")
      assert(fromPacked.nonEmpty)
    }
  }

  test("encodeCodes: fused projection equals the heap-join fallback") {
    val emb = embFixture()
    val cent = Similarity.quantizedCentroids(
      emb.select(col("label"), col("embedding")))
    val book = Similarity.pqCodebook(
      emb.select(col("label"), col("embedding"))
        .withColumn("vec_id", monotonically_increasing_id()))
    val m = 4; val dsub = 2
    val fused = withFused(on = true)(
      sortedRows(AnnIndex.encodeCodes(emb, cent, book, m, dsub)))
    val fallback = withFused(on = false)(
      sortedRows(AnnIndex.encodeCodes(emb, cent, book, m, dsub)))
    assert(fused == fallback)
    assert(fused.size == 122)
  }

  test("a code absent from the book drops its piece — and a pieceless vector — like the inner join") {
    // hand-built frames: vector 1 has one unknown code (one piece
    // drops — the reconstruction shortens, matching the inner join's
    // dropped row; scoring a short xhat is out of contract in BOTH
    // shapes, so the comparison here is the reconstruction itself),
    // vector 2 has ONLY unknown codes (vanishes), vector 3 is fully
    // known. Book: labels 0 and 1 over dim 4, dsub 2.
    val book = Seq(
      (0L, Seq(1.0, 0.0, 0.5, 0.25)),
      (1L, Seq(0.0, 1.0, 0.25, 0.5))).toDF("rlabel", "cvec")
    val packed = Seq(
      (1L, 0L, Seq(0L, 9L)),   // sub1's code 9 unknown
      (2L, 0L, Seq(8L, 9L)),   // no known code at all
      (3L, 0L, Seq(1L, 0L))
    ).toDF("vec_id", "cluster", "codes")
    val (labels, books) = Similarity.collectCodebook(book).get
    val viaKernel = packed.select(col("vec_id"),
      graft.functions.GraftExpressions.pqReconstructK(
        col("codes").cast("array<long>"), books, labels, 2).as("xhat"))
      .filter(col("xhat").isNotNull)
      .as[(Long, Seq[Double])].collect().toMap
    val viaJoin = Similarity.pqReconstruct(
      packed.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code"))), book, dsub = 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(viaKernel == viaJoin)
    assert(viaKernel.keySet == Set(1L, 3L)) // vector 2 vanished in both
    assert(viaKernel(1L) == Seq(1.0, 0.0))  // sub1's piece dropped
    assert(viaKernel(3L) == Seq(0.0, 1.0, 0.5, 0.25))
  }

  test("a fused-path shape decline is logged (and recorded), the kill-switch is not") {
    // > 4096 rows: past the fused-path layout cap — must decline loudly
    val big = spark.range(0, 4100).selectExpr(
      "id as rlabel", "array(cast(id as double)) as cvec")
    Similarity.lastFusedDecline.set(null)
    assert(Similarity.collectCodebook(big).isEmpty)
    val reason = Similarity.lastFusedDecline.get
    assert(reason != null && reason.contains("4096"), s"got: $reason")
    // the DELIBERATE kill-switch decline stays silent
    val small = spark.range(0, 4).selectExpr(
      "id as rlabel", "array(cast(id as double)) as cvec")
    Similarity.lastFusedDecline.set(null)
    withFused(on = false)(assert(Similarity.collectCodebook(small).isEmpty))
    assert(Similarity.lastFusedDecline.get == null)
    // and an in-shape codebook collects without a decline
    assert(Similarity.collectCodebook(small).isDefined)
    assert(Similarity.lastFusedDecline.get == null)
  }

  test("breachRuns warns on a series estimated past the monitor bound") {
    import graft.ops.AnnIndex
    val series = (0L until 64L).flatMap(b => Seq((b, 90, 20000L)))
      .toDF("batch_id", "pct", "drift_q")
    AnnIndex.lastSeriesWarn.set(null)
    spark.conf.set("spark.graft.monitorSeriesWarnBytes", "1")
    try {
      val runs = AnnIndex.driftAlerts(series, pct = 90, tolQ = 10486L,
        minRun = 2).collect()
      assert(runs.nonEmpty)
      val warn = AnnIndex.lastSeriesWarn.get
      assert(warn != null && warn.contains("monitor series"), s"got: $warn")
    } finally spark.conf.unset("spark.graft.monitorSeriesWarnBytes")
    // at the default bound a series-sized frame stays quiet
    AnnIndex.lastSeriesWarn.set(null)
    AnnIndex.driftAlerts(series, pct = 90, tolQ = 10486L, minRun = 2).collect()
    assert(AnnIndex.lastSeriesWarn.get == null)
  }
}
