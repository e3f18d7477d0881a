package graft

import graft.ops.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** The round-14 ANN maintenance surface: the BALANCE half of the rebuild
  * contract (occupancy baseline, cellStats, the skew trigger), the
  * sampled drift check, the per-batch drift series + alert-on-runs
  * helper, and the cell-pruned binary fingerprint search. The oracle
  * gate proves each query computes what it claims; these specs prove the
  * CONTRACTS — a concentrated arrival wave must flip the skew trigger
  * while quality stays quiet, a pre-baseline model must fail loudly
  * before paying an encode, pruned search must equal exhaustive when
  * every cell is probed.
  */
class AnnMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** The clustered fixture of the driftStats specs: four strong blocks,
    * so every trained codeword is meaningful and assignment is by real
    * geometry, not noise. */
  private def blockVec(i: Int, dim: Int = 16): Seq[Float] =
    (0 until dim).map { j =>
      val base = if (j / 4 == i % 4) 1.0f else 0.1f
      base + 0.01f * ((i * 31 + j * 7) % 5)
    }

  /** Ripple-free block vector: 50 exact copies per label, so every
    * codeword reconstructs its members EXACTLY (cos = 1 for all) and
    * quality drift is 0 by construction however the mixture shifts —
    * the cleanest demonstration that the quality probe CANNOT see a
    * pile-up, which is exactly why the balance trigger exists. */
  private def pureBlockVec(i: Int, dim: Int = 16): Seq[Float] =
    (0 until dim).map(j => if (j / 4 == i % 4) 1.0f else 0.1f)

  test("occupancy baseline: cellStats is exact on the training corpus; " +
    "a concentrated arrival wave flips the skew trigger while drift_q stays quiet") {
    val rows = (0 until 200).map(i => (i.toLong, (i % 4).toLong, pureBlockVec(i)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_occ").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_occ").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 4, dsub = 4, modelRoot, codesRoot)

    // training corpus == codes table: baseline and current agree cell by
    // cell, shares sum to 1, and the four blocks land ~50 vectors each
    val fresh = AnnIndex.cellStats(spark, codesRoot, modelRoot)
      .select("cluster", "baseline_cnt", "current_cnt", "current_share")
      .as[(Long, Long, Long, Double)].collect()
    assert(fresh.length == 4)
    assert(fresh.forall(r => r._2 == r._3), s"baseline != current: ${fresh.toSeq}")
    assert(fresh.map(_._2).sum == 200L)
    assert(math.abs(fresh.map(_._4).sum - 1.0) < 1e-12)
    assert(!AnnIndex.needsRebuild(spark, emb, modelRoot, codesRoot,
      pct = 90, tolQ = 10486L, tolShare = 0.4))

    // a wave of NEW vectors all shaped like block 0 arrives through the
    // maintenance sink (frozen centroids — exactly how skew accrues in
    // production); training-distribution duplicates, so reconstruction
    // QUALITY stays exactly flat while cell 0 triples
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    val wave = (0 until 100).map(i => (10000L + i, pureBlockVec(0)))
    val src = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.versionedAnnIndexSink(
      src.toDF().toDF("vec_id", "embedding"), cent, book, m, dsub, codesRoot,
      java.nio.file.Files.createTempDirectory("annckpt_occ").toString)
    try { src.addData(wave); q.processAllAvailable() } finally q.stop()

    val after = AnnIndex.cellStats(spark, codesRoot, modelRoot)
      .select("cluster", "baseline_cnt", "current_cnt", "current_share")
      .as[(Long, Long, Long, Double)].collect()
    assert(after.map(_._3).sum == 300L)
    val hot = after.maxBy(_._4)
    assert(hot._3 == hot._2 + 100,
      s"the whole wave must land in one cell: ${after.toSeq}")
    assert(hot._4 > 0.45 && hot._4 < 0.55, s"hot share: ${hot._4}")

    // the QUALITY trigger alone stays EXACTLY quiet (the wave is
    // training-distribution duplicates: cos(v, reconstruction) = 1 for
    // every vector before and after, so every quantile is unmoved) ...
    val corpusNow = emb.select(col("vec_id"), col("embedding"))
      .unionByName(wave.toDF("vec_id", "embedding"))
    assert(AnnIndex.driftStats(spark, corpusNow, modelRoot)
      .select("drift_q").as[Long].collect().toSeq == Seq(0L, 0L, 0L))
    assert(!AnnIndex.needsRebuild(spark, corpusNow, modelRoot))
    // ... but the combined contract flips on BALANCE
    assert(AnnIndex.needsRebuild(spark, corpusNow, modelRoot, codesRoot,
      pct = 90, tolQ = 10486L, tolShare = 0.4))
    // and stays quiet when the skew tolerance admits the new shape
    assert(!AnnIndex.needsRebuild(spark, corpusNow, modelRoot, codesRoot,
      pct = 90, tolQ = 10486L, tolShare = 0.6))
  }

  test("a model without baselines fails loudly BEFORE any corpus-scale work") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_nobl").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_nobl").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 8, dsub = 8, modelRoot, codesRoot)
    // hand-strip the baselines — the shape of a pre-baseline or
    // hand-built model table
    val stripped = java.nio.file.Files.createTempDirectory("annm_strip").toString
    graft.io.Versioned.commit(spark,
      graft.io.Versioned.read(spark, modelRoot)
        .filter(!col("part").isin("drift", "occ")),
      stripped, replace = true)
    val e1 = intercept[IllegalStateException] {
      AnnIndex.driftStats(spark, emb, stripped)
    }
    assert(e1.getMessage.contains("no drift baseline"))
    val e2 = intercept[IllegalStateException] {
      AnnIndex.driftSeries(spark,
        emb.withColumn("batch_id", lit(0L)), stripped)
    }
    assert(e2.getMessage.contains("no drift baseline"))
    val e3 = intercept[IllegalStateException] {
      AnnIndex.cellStats(spark, codesRoot, stripped)
    }
    assert(e3.getMessage.contains("no occupancy baseline"))
  }

  test("sampled driftStats: a 100% sample is exact; a half sample sits within " +
    "the rebuild tolerance on the training corpus") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_smp").toString
    AnnIndex.train(spark, emb, m = 8, dsub = 8, modelRoot)
    // f = 1.0 keeps every row: bit-identical to the exact form (drift 0)
    assert(AnnIndex.driftStats(spark, emb, modelRoot, 1.0)
      .select("drift_q").as[Long].collect().toSeq == Seq(0L, 0L, 0L))
    // f = 0.5 on a 500-row fixture (≈250-row sample): the estimator's
    // rank noise is O(√(p(1−p)/s)) — ≈±3 percentile points at p50,
    // ≈±0.6 at p99 — so the mid quantiles must sit inside the
    // 0.01-cosine rebuild tolerance while the p99 TAIL of a 250-row
    // sample is allowed 3× (measured −15334 here; at any real corpus
    // size the sample is orders of magnitude larger and the noise
    // proportionally tighter — the scaladoc states the bound)
    val half = AnnIndex.driftStats(spark, emb, modelRoot, 0.5)
      .select("pct", "drift_q").as[(Int, Long)].collect().toMap
    assert(half.keySet == Set(50, 90, 99))
    assert(math.abs(half(50)) < 10486L && math.abs(half(90)) < 10486L,
      s"half-sample mid-quantile noise must stay under the rebuild tolerance: $half")
    assert(math.abs(half(99)) < 3 * 10486L,
      s"half-sample p99 noise must stay within 3x the rebuild tolerance: $half")
    // determinism: the hash-mod sample is a FIXED subset — two calls agree
    assert(AnnIndex.driftStats(spark, emb, modelRoot, 0.5)
      .select("pct", "drift_q").as[(Int, Long)].collect().toMap == half)
    intercept[IllegalArgumentException] {
      AnnIndex.driftStats(spark, emb, modelRoot, 0.0)
    }
  }

  test("driftSeries equals per-batch driftStats; driftAlerts finds exactly the runs") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_ser").toString
    AnnIndex.train(spark, emb, m = 8, dsub = 8, modelRoot)
    val batched = emb.withColumn("batch_id",
      pmod(col("vec_id"), lit(3)).cast("long"))
    val series = AnnIndex.driftSeries(spark, batched, modelRoot)
      .select("batch_id", "pct", "baseline_q", "current_q", "drift_q")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val oneByOne = (0L until 3L).flatMap { b =>
      AnnIndex.driftStats(spark, batched.filter(col("batch_id") === b), modelRoot)
        .select("pct", "baseline_q", "current_q", "drift_q")
        .as[(Int, Long, Long, Long)].collect()
        .map(r => (b, r._1, r._2, r._3, r._4))
    }.toSet
    assert(series == oneByOne && series.size == 9)

    // alert semantics on a hand-built series: breaches at positions
    // 0,1 | 3,4,5 | 8 (batch ids deliberately gappy — adjacency is
    // positional, not arithmetic); only the length-3 run alerts at
    // minRun = 3, and rows of other pcts never leak in
    val s = Seq(
      (10L, 90, 5L), (20L, 90, 7L), (30L, 90, 0L), (40L, 90, 9L),
      (50L, 90, 1L), (60L, 90, 2L), (70L, 90, -3L), (80L, 90, 0L),
      (90L, 90, 4L),
      (10L, 50, 99L), (30L, 50, 99L)) // other probe: must be ignored
      .toDF("batch_id", "pct", "drift_q")
    val runs = AnnIndex.driftAlerts(s, pct = 90, tolQ = 0L, minRun = 3)
      .select("run_start", "run_end", "run_len", "alert")
      .as[(Long, Long, Int, Boolean)].collect().toSet
    assert(runs == Set((10L, 20L, 2, false), (40L, 60L, 3, true),
      (90L, 90L, 1, false)), s"got $runs")
  }

  test("decoupled coarse quantizer: cells from cellLabelCol, codebook from label") {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .withColumn("cell", pmod(col("vec_id"), lit(7)).cast("int"))
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_dec").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_dec").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 8, dsub = 8, modelRoot, codesRoot,
      cellLabelCol = "cell")
    // the FAISS-style geometry: 7 IVF cells, 10-codeword book — the
    // cell count no longer drags the n·k·m encode with it
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    assert(m == 8 && dsub == 8)
    assert(cent.count() == 7L && book.count() == 10L)
    // persisted search equals the in-memory path composed from the same
    // decoupled frames
    val got = AnnIndex.search(spark, emb.filter(col("vec_id") < 20),
      modelRoot, codesRoot, k = 3).collect().toSet
    val cent2 = Similarity.quantizedCentroids(
      emb.select(col("cell").as("label"), col("embedding")))
    val corpus = Similarity.assignClusters(
      emb.select(col("vec_id"), col("embedding")), cent2, 1)
    val book2 = Similarity.pqRefineBook(emb, Similarity.pqCodebook(emb), 8, 8)
    val want = Similarity.ivfPqTopK(corpus, corpus.filter(col("vec_id") < 20),
      book2, m = 8, dsub = 8, k = 3).collect().toSet
    assert(got == want && got.nonEmpty)
    // both baselines ride the decoupled geometry: occupancy covers the
    // 7 CELLS, and quality drift is exact zero on the training corpus
    assert(AnnIndex.cellStats(spark, codesRoot, modelRoot).count() == 7L)
    assert(AnnIndex.driftStats(spark, emb, modelRoot)
      .select("drift_q").as[Long].collect().toSeq == Seq(0L, 0L, 0L))

    // the codes table's cell-range layout + cluster stats make a
    // two-cell probe (the nprobe=2 search's pushed IN) skip files
    import scala.jdk.CollectionConverters._
    val probe = spark.read.format("graft-versioned").load(codesRoot)
      .filter(col("cluster").isin(0, 1))
    probe.queryExecution.toRdd.count()
    val kept = probe.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table
    }.collectFirst {
      case t: graft.io.VersionedReadTable => t.prunedIndex.lastKeptFiles
    }.getOrElse(fail("no VersionedReadTable in the probe plan"))
    val total = java.nio.file.Files.walk(java.nio.file.Paths.get(codesRoot))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(kept < total,
      s"two-cell codes probe kept $kept of $total files — no pruning")
  }

  test("cell-pruned binary search equals exhaustive when every cell is probed; " +
    "the probed-cell filter prunes index files") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val cent = Similarity.quantizedCentroids(emb)
    val cells = cent.count().toInt

    val flatRoot = java.nio.file.Files.createTempDirectory("annfp_flat").toString
    val cellRoot = java.nio.file.Files.createTempDirectory("annfp_cell").toString
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, flatRoot)
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, cellRoot, cent)

    val exhaustive = AnnIndex.binarySearch(spark, queries, flatRoot, corpus,
      dim = 64, k = 5, shortlist = 50).collect().toSet
    // nprobe = every cell: identical result, not just equal recall
    val prunedAll = AnnIndex.binarySearch(spark, queries, cellRoot, corpus,
      dim = 64, k = 5, shortlist = 50, cent, nprobe = cells).collect().toSet
    assert(prunedAll == exhaustive && exhaustive.nonEmpty)

    // nprobe = 1 still returns k-bounded per-query results with decent
    // recall against the exhaustive set (the recall/cost dial, not a
    // different contract)
    val pruned1 = AnnIndex.binarySearch(spark, queries, cellRoot, corpus,
      dim = 64, k = 5, shortlist = 50, cent, nprobe = 1)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(pruned1.nonEmpty)
    assert(pruned1.groupBy(_._1).values.forall(_.length <= 5))

    // the IN filter the pruned search pushes must skip files: the celled
    // build range-partitions by cluster, so a TWO-cell probe's per-value
    // min/max check keeps a strict subset of the index files. Two values,
    // deliberately: a one-element isin folds to EqualTo and would pass
    // through the bounds path — multi-value IN is the shape the static
    // prune was missing (extractInSets), and the shape every nprobe ≥ 2
    // search pushes.
    import scala.jdk.CollectionConverters._
    val cellIds = cent.select(col("rlabel").cast("int")).as[Int].collect().sorted
    val probe = spark.read.format("graft-versioned").load(cellRoot)
      .filter(col("cluster").isin(cellIds(0), cellIds(1)))
    probe.queryExecution.toRdd.count()
    val kept = probe.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table
    }.collectFirst {
      case t: graft.io.VersionedReadTable => t.prunedIndex.lastKeptFiles
    }.getOrElse(fail("no VersionedReadTable in the probe plan"))
    val total = java.nio.file.Files.walk(java.nio.file.Paths.get(cellRoot))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(kept < total,
      s"two-cell probe kept $kept of $total files — cluster stats pruned nothing")

    // a flat index refuses the pruned form loudly
    val e = intercept[IllegalArgumentException] {
      AnnIndex.binarySearch(spark, queries, flatRoot, corpus,
        dim = 64, k = 5, shortlist = 50, cent, nprobe = 1)
    }
    assert(e.getMessage.contains("no cluster column"))

    // the flat maintenance sink must REFUSE a celled index: schema
    // evolution would null-fill cluster for streamed vectors and the
    // pruned search would silently miss every one of them
    {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val src = MemoryStream[(Long, Seq[Float])]
      val q = graft.streaming.Streams.versionedBinaryIndexSink(
        src.toDF().toDF("vec_id", "embedding"), dim = 64, cellRoot,
        java.nio.file.Files.createTempDirectory("fpckpt_celled").toString)
      try {
        src.addData(Seq((999999L, Seq.fill(64)(0.5f))))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
          .take(8).exists(t => Option(t.getMessage)
            .exists(_.contains("exact index row shape"))))
      } finally q.stop()
      // and nothing was appended past the build commit
      assert(graft.io.Versioned.versions(spark, cellRoot) == Seq(1L))
    }

    // the modelRoot wrappers ride the same cells: build+search via a
    // trained model equals the cent path at full probe width
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_fp").toString
    AnnIndex.train(spark, emb, m = 8, dsub = 8, modelRoot)
    val cellRoot2 = java.nio.file.Files.createTempDirectory("annfp_cell2").toString
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, cellRoot2, modelRoot)
    val viaModel = AnnIndex.binarySearch(spark, queries, cellRoot2, corpus,
      dim = 64, k = 5, shortlist = 50, modelRoot, nprobe = cells)
      .collect().toSet
    assert(viaModel == exhaustive)
  }

  test("recell restores one-file-per-cell layout and file pruning after " +
    "maintenance appends — layout-only: results identical, model untouched") {
    val rows = (0 until 200).map(i => (i.toLong, (i % 4).toLong, pureBlockVec(i)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_rc").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_rc").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 4, dsub = 4, modelRoot, codesRoot)

    // THREE maintenance triggers, each spanning ALL four blocks: every
    // appended file's cluster min/max covers every cell, so the
    // probed-cell IN can skip none of them — the layout erosion recell
    // exists for, accreting without either rebuild trigger moving
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    val src = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.versionedAnnIndexSink(
      src.toDF().toDF("vec_id", "embedding"), cent, book, m, dsub, codesRoot,
      java.nio.file.Files.createTempDirectory("annckpt_rc").toString)
    try {
      for (b <- 0 until 3) {
        src.addData((0 until 40).map(i => (10000L + b * 100 + i, pureBlockVec(i))))
        q.processAllAvailable()
      }
    } finally q.stop()

    // kept files of a cluster-IN probe over the CURRENT snapshot — the
    // all-cells probe counts every live file (each file holds some cell)
    def keptFor(cells: Seq[Int]): Int = {
      val probe = spark.read.format("graft-versioned").load(codesRoot)
        .filter(col("cluster").isin(cells: _*))
      probe.queryExecution.toRdd.count()
      probe.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          r.table
      }.collectFirst {
        case t: graft.io.VersionedReadTable => t.prunedIndex.lastKeptFiles
      }.getOrElse(fail("no VersionedReadTable in the probe plan"))
    }
    val totalBefore = keptFor(Seq(0, 1, 2, 3))
    val keptBefore = keptFor(Seq(0, 1))
    // degradation witnessed: the two-cell probe keeps the 3+ appended
    // wide-range files on top of the probed cells' own build files
    assert(keptBefore > 2, s"expected eroded layout, kept $keptBefore")
    // ... and the metadata-only trigger reads the same erosion from the
    // sidecars alone: each of the 3 batches contributed files covering
    // all 4 cells between them, so kept-files-per-probe ≥ 4 > tol 2.0
    assert(AnnIndex.needsRecell(spark, codesRoot))
    val lsBefore = AnnIndex.layoutStats(spark, codesRoot)
      .as[(String, Int, Int, Long)].collect()
    assert(lsBefore.forall(_._3 == 4))
    assert(lsBefore.map(_._2).sum >= 16,
      s"expected ≥16 total cell coverage, got ${lsBefore.toSeq}")
    // every live file's byte length rides along (the volume leg's input)
    assert(lsBefore.forall(_._4 > 0L), lsBefore.toSeq)

    val queries = emb.filter(col("vec_id") < 20)
    val before = AnnIndex.search(spark, queries, modelRoot, codesRoot,
      k = 3, nprobe = 2).collect().toSet
    val modelV = graft.io.Versioned.versions(spark, modelRoot).last

    // the combined check-and-repair entry: one cellCoverage derivation
    // drives both the trigger and the remedy (a needsRecell-then-recell
    // loop would run the bounded distinct-cells scan twice)
    val newV = AnnIndex.recellIfNeeded(spark, codesRoot).getOrElse(
      fail("recellIfNeeded saw an eroded layout but did not repair"))
    assert(newV == graft.io.Versioned.versions(spark, codesRoot).last)
    // layout-only: the model was never touched, the results are identical
    assert(graft.io.Versioned.versions(spark, modelRoot).last == modelV)
    val after = AnnIndex.search(spark, queries, modelRoot, codesRoot,
      k = 3, nprobe = 2).collect().toSet
    assert(after == before && after.nonEmpty)

    // layout restored: bounded files (≤ one per cell — the range
    // partitioner may merge adjacent cells, never split one), and a
    // two-cell probe keeps at most its two cells' files again
    val totalAfter = keptFor(Seq(0, 1, 2, 3))
    val keptAfter = keptFor(Seq(0, 1))
    assert(totalAfter <= 4, s"recell left $totalAfter files for 4 cells")
    assert(keptAfter <= 2, s"two-cell probe kept $keptAfter files post-recell")
    assert(keptAfter < keptBefore)
    // trigger quiet again: each cell lives in exactly ONE file however
    // the range boundaries fell, so total coverage == nlist exactly and
    // kept-files-per-probe == 1.0
    val lsAfter = AnnIndex.layoutStats(spark, codesRoot)
      .as[(String, Int, Int, Long)].collect()
    assert(lsAfter.map(_._2).sum == 4, lsAfter.toSeq)
    assert(lsAfter.length == totalAfter)
    assert(!AnnIndex.needsRecell(spark, codesRoot))
    // ... and the combined entry is a no-op on the healthy layout: no
    // repair, no new commit
    assert(AnnIndex.recellIfNeeded(spark, codesRoot).isEmpty)
    assert(graft.io.Versioned.versions(spark, codesRoot).last == newV)

    // a flat (cluster-less) index has no cell layout to restore
    val flatRoot = java.nio.file.Files.createTempDirectory("annfp_rc").toString
    AnnIndex.buildBinaryIndex(spark, emb, dim = 16, flatRoot)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.recell(spark, flatRoot)
    }
    assert(e.getMessage.contains("no cluster column"))
  }

  test("layout monitor sink accretes (files, cells, kept_per_probe, " +
    "kept_bytes_per_probe, total_bytes) per trigger and layoutAlerts " +
    "reduces the series to breach runs — incl. the one-packed-file " +
    "pathology the volume leg exists for — through the REAL sinks") {
    val rows = (0 until 200).map(i => (i.toLong, (i % 4).toLong, pureBlockVec(i)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_lm").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_lm").toString
    val monRoot = java.nio.file.Files.createTempDirectory("annmon_lm").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 4, dsub = 4, modelRoot, codesRoot)

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    val src = MemoryStream[(Long, Seq[Float])]
    // the layout sink rides its OWN tick stream (its batch content is
    // only a trigger), ticked after each index append completes — two
    // sinks tailing ONE stream would race the measurement against the
    // append inside a wave
    val tick = MemoryStream[Long]
    val indexQ = graft.streaming.Streams.versionedAnnIndexSink(
      src.toDF().toDF("vec_id", "embedding"), cent, book, m, dsub, codesRoot,
      java.nio.file.Files.createTempDirectory("annckpt_lmi").toString)
    val layoutQ = graft.streaming.Streams.versionedAnnLayoutMonitorSink(
      tick.toDF(), codesRoot, monRoot,
      java.nio.file.Files.createTempDirectory("annckpt_lmm").toString)
    val lastKept = try {
      for (b <- 0 until 3) {
        src.addData((0 until 40).map(i => (10000L + b * 100 + i, pureBlockVec(i))))
        indexQ.processAllAvailable()
        tick.addData(b.toLong)
        layoutQ.processAllAvailable()
      }
      // the trigger agrees with the sink's measurement at this point:
      // the same number needsRecell reads is the last accreted point
      val lk = AnnIndex.layoutPoint(spark, codesRoot)
        .select("kept_per_probe").as[Double].head()
      assert(AnnIndex.needsRecell(spark, codesRoot, tolKept = lk - 0.01))
      assert(!AnnIndex.needsRecell(spark, codesRoot, tolKept = lk + 0.01))
      // the ONE-PACKED-FILE pathology, measured by the SAME running
      // sink as batch 3 (see the volume assertions below): a compaction
      // WITHOUT the cell sort packs the whole table into one all-cells
      // file — the r16 bench's blind-spot trap
      graft.io.Versioned.compactLatest(spark, codesRoot, nFiles = 1)
      tick.addData(3L)
      layoutQ.processAllAvailable()
      lk
    } finally { indexQ.stop(); layoutQ.stop() }

    val accreted = graft.io.Versioned.read(spark, monRoot)
    val series = accreted.filter(col("batch_id") <= 2L)
      .select("batch_id", "files", "cells", "kept_per_probe")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(series.map(_._1).toSeq == Seq(0L, 1L, 2L), series.toSeq)
    // the volume companion accretes alongside: kept bytes per probe and
    // the snapshot total, both strictly rising as all-cells waves land
    val vol = accreted.filter(col("batch_id") <= 2L)
      .select("batch_id", "kept_bytes_per_probe", "total_bytes")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(vol.forall(v => v._2 > 0.0 && v._3 > 0L), vol.toSeq)
    assert(vol.sliding(2).forall(w => w(0)._2 < w(1)._2), vol.toSeq)
    assert(vol.sliding(2).forall(w => w(0)._3 < w(1)._3), vol.toSeq)
    // every wave spans all 4 cells, so each appended wave's files add
    // full-coverage rows: kept-per-probe strictly rises wave over wave,
    // starting ≥ 2.0 (the ideal 1.0 plus at least one full-coverage
    // file), while nlist stays 4 and the file count accretes
    assert(series.forall(_._3 == 4L), series.toSeq)
    assert(series.map(_._4).toSeq == series.map(_._4).sorted.toSeq &&
      series.sliding(2).forall(w => w(0)._4 < w(1)._4), series.toSeq)
    assert(series.head._4 >= 2.0, series.toSeq)
    assert(series.sliding(2).forall(w => w(0)._2 < w(1)._2), series.toSeq)
    // the trigger-agreement number read mid-stream IS the last accreted
    // pre-repack point
    assert(series.last._4 == lastKept, s"${series.toSeq} vs $lastKept")

    // the run rule over the REAL pre-repack series: with tol at the
    // first wave's value, waves 1..2 breach consecutively -> one
    // alerting run
    val runs = AnnIndex.layoutAlerts(
      accreted.filter(col("batch_id") <= 2L), tolKept = series.head._4,
      minRun = 2)
      .select("run_start", "run_end", "run_len", "alert")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(runs == Seq((1L, 2L, 2, true)), runs)
    // (exactly-once replay of a committed trigger is the shared
    // alreadyCommitted/batchTag discipline, spec-pinned on the drift
    // monitor sink; this sink rides the same helpers verbatim)

    // --- the packed regime's accreted point: the open count reads a
    // "perfect" 1.0 while every probe reads everything — the volume
    // companion must breach while kept_per_probe stays green
    val packed = accreted
      .filter(col("batch_id") === 3L)
      .select("files", "cells", "kept_per_probe", "kept_bytes_per_probe",
        "total_bytes")
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(packed.length == 1, packed)
    val (pf, pc, pKept, pKeptB, pTotal) = packed.head
    assert(pf == 1L && pc == 4L, packed)
    assert(pKept == 1.0, s"open-count metric should read 'perfect' here: $pKept")
    // ...and the volume metric reads the truth: every probe reads the
    // whole table, amplification == nlist
    assert(pKeptB == pTotal.toDouble, packed)
    assert(pKeptB * pc > 2.0 * pTotal, packed)
    // the run rule breaches on the volume leg even though the file leg
    // is green: waves 1..2 (file leg) and the packed batch 3 (volume
    // leg) form ONE maximal run
    val runs2 = AnnIndex.layoutAlerts(
      graft.io.Versioned.read(spark, monRoot), tolKept = 2.0, minRun = 2)
      .select("run_start", "run_end", "run_len", "alert")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(runs2 == Seq((1L, 3L, 3, true)), runs2)
    // ALERT LOUDLY, ACT CONSERVATIVELY: on a table this small the
    // packed one-file layout is what compactSmall deliberately
    // produces, so the AUTOMATIC trigger's volume leg is gated by
    // minCellBytes and the default trigger stays quiet — splitting
    // would mint per-cell tiny files the next compactSmall re-packs,
    // an infinite rewrite oscillation
    assert(!AnnIndex.needsRecell(spark, codesRoot))
    // with the gate lifted the trigger fires on the volume leg, and
    // the standard remedy (the cell-ranged rewrite) restores both
    // metrics: opens to exactly 1.0; volume to ≥1.0 but back under
    // tolerance and far from the packed regime's nlist (the range
    // partitioner may merge adjacent cells into one file — never split
    // one — and a merged file is read by each of its cells' probes, so
    // the healed amp can sit above 1.0)
    assert(AnnIndex.needsRecell(spark, codesRoot, minCellBytes = 0L))
    assert(AnnIndex.recellIfNeeded(spark, codesRoot, minCellBytes = 0L)
      .isDefined)
    val healed = AnnIndex.layoutPoint(spark, codesRoot)
      .select("cells", "kept_per_probe", "kept_bytes_per_probe", "total_bytes")
      .as[(Long, Double, Double, Long)].collect().head
    assert(healed._2 == 1.0, healed)
    val healedAmp = healed._3 * healed._1 / healed._4
    assert(healedAmp >= 1.0 && healedAmp < pc, healed.toString)
    assert(!AnnIndex.needsRecell(spark, codesRoot))
  }

  test("recellSmall repairs only the accreted tail: build files carry by " +
    "reference, batch files pack cell-ranged, results identical") {
    // big enough that the build's per-cell files dwarf a maintenance
    // batch — the size separation recellSmall's small-file cut rides on
    val rows = (0 until 24000).map(i => (i.toLong, (i % 4).toLong, pureBlockVec(i)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_rs").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_rs").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 4, dsub = 4, modelRoot, codesRoot)

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    val src = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.versionedAnnIndexSink(
      src.toDF().toDF("vec_id", "embedding"), cent, book, m, dsub, codesRoot,
      java.nio.file.Files.createTempDirectory("annckpt_rs").toString)
    try {
      for (b <- 0 until 3) {
        src.addData((0 until 40).map(i => (100000L + b * 100 + i, pureBlockVec(i))))
        q.processAllAvailable()
      }
    } finally q.stop()

    def size(p: String): Long =
      java.nio.file.Files.size(java.nio.file.Paths.get(p.stripPrefix("file:")))
    val before = graft.io.Versioned.snapshotFiles(spark, codesRoot)
    val sized = before.map(p => p -> size(p))
    // the build files hold ~24k code rows each (≤ 4 of them — the range
    // partitioner may merge adjacent cells, never split one), a batch
    // file ~160 rows — assert the separation the cut relies on, then
    // cut between them
    val (big, small) = sized.partition(_._2 > sized.map(_._2).max / 8)
    assert(big.size >= 2 && big.size <= 4 && small.size >= 3,
      s"unexpected size profile: ${sized.map(_._2).sorted.mkString(",")}")
    assert(small.map(_._2).max < big.map(_._2).min)
    val cut = (small.map(_._2).max + big.map(_._2).min) / 2

    val queries = emb.filter(col("vec_id") < 20)
    val resBefore = AnnIndex.search(spark, queries, modelRoot, codesRoot,
      k = 3, nprobe = 2).collect().toSet
    val modelV = graft.io.Versioned.versions(spark, modelRoot).last

    AnnIndex.recellSmall(spark, codesRoot, smallBytes = cut)

    val after = graft.io.Versioned.snapshotFiles(spark, codesRoot).toSet
    // the build files carried by REFERENCE — identical paths, untouched;
    // every batch file left the snapshot, packed into cell-ranged output
    assert(big.map(_._1).forall(after.contains), "build files were rewritten")
    assert(small.map(_._1).forall(p => !after.contains(p)),
      "a batch file survived the repair")
    // repaired tail is range-partitioned: each cell in exactly one
    // packed file, so total coverage == build 4 + tail 4 == 8 and the
    // 2.0-kept-per-probe trigger goes quiet (2.0 is not > 2.0)
    val ls = AnnIndex.layoutStats(spark, codesRoot)
      .as[(String, Int, Int, Long)].collect()
    assert(ls.map(_._2).sum == 8, ls.toSeq)
    assert(!AnnIndex.needsRecell(spark, codesRoot))
    // layout-only: identical results, model untouched
    assert(AnnIndex.search(spark, queries, modelRoot, codesRoot,
      k = 3, nprobe = 2).collect().toSet == resBefore && resBefore.nonEmpty)
    assert(graft.io.Versioned.versions(spark, modelRoot).last == modelV)
  }

  test("recallAt measures the index's loss against exact ground truth: " +
    "1.0 where the index holds the true neighbors, 0.0 where it cannot, " +
    "and zero-hit queries report instead of vanishing") {
    // two pure blocks of 50 IDENTICAL vectors each: the exact-cosine
    // truth for any member is its 3 lowest-id same-block peers (cos = 1
    // beats every cross-block pair), and PQ reconstruction is EXACT on
    // a pure block — so recall is fully determined, no geometry luck
    val all = (0 until 100)
      .map(i => (i.toLong, (i / 50).toLong, pureBlockVec(i / 50)))
      .toDF("vec_id", "label", "embedding")
    val blockB = all.filter(col("vec_id") >= 50)
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_rec").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_rec").toString
    // index holds ONLY block B: a block-A query's true neighbors are
    // simply not in the index — its recall must be exactly 0, reported
    // through the left-join path (no hits row exists for it)
    AnnIndex.trainAndRebuild(spark, blockB, m = 4, dsub = 4,
      modelRoot, codesRoot)

    val queries = all.filter(col("vec_id").isin(0L, 1L, 2L, 50L, 51L, 52L))
    val got = AnnIndex.recallAt(spark, queries, modelRoot, codesRoot,
      all, k = 3, nprobe = 1)
      .select("qid", "hits", "recall").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 50L, 51L, 52L),
      s"every query must report: ${got.toSeq}")
    // block A: true neighbors absent from the index -> 0 hits, 0.0
    assert(got.take(3).forall(r => r._2 == 0L && r._3 == 0.0), got.toSeq)
    // block B: exact reconstruction + id tie-breaks -> the index's top-3
    // IS the truth's top-3 -> 3 hits, 1.0
    assert(got.drop(3).forall(r => r._2 == 3L && r._3 == 1.0), got.toSeq)
  }

  test("recallAt(sampleFraction) measures a deterministic hash-mod query " +
    "subset: sampled rows equal the full form's rows for the sampled qids") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding"))
    val modelRoot = java.nio.file.Files.createTempDirectory("annm_recs").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annc_recs").toString
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)

    val full = AnnIndex.recallAt(spark, queries, modelRoot, codesRoot,
      emb, k = 3, nprobe = 2)
      .select("qid", "hits", "recall").as[(Long, Long, Double)]
      .collect().toSet
    val sampled = AnnIndex.recallAt(spark, queries, modelRoot, codesRoot,
      emb, k = 3, nprobe = 2, sampleFraction = 0.25)
      .select("qid", "hits", "recall").as[(Long, Long, Double)]
      .collect().toSet

    // a real strict subset (sampling selected SOME queries, not all/none)
    assert(sampled.nonEmpty && sampled.size < full.size,
      s"expected a strict nonempty subset; sampled=${sampled.size} " +
        s"full=${full.size}")
    // sampling selects queries, never perturbs a selected query's row:
    // every sampled row IS the full form's row for that qid
    assert(sampled.subsetOf(full),
      s"sampled rows diverged from full rows: ${sampled -- full}")
    // deterministic: the same call yields the same subset (fixed md5
    // membership, no sampling churn)
    val again = AnnIndex.recallAt(spark, queries, modelRoot, codesRoot,
      emb, k = 3, nprobe = 2, sampleFraction = 0.25)
      .select("qid", "hits", "recall").as[(Long, Long, Double)]
      .collect().toSet
    assert(again == sampled)
    // out-of-range fractions refuse loudly
    val e = intercept[IllegalArgumentException] {
      AnnIndex.recallAt(spark, queries, modelRoot, codesRoot, emb,
        k = 3, nprobe = 2, sampleFraction = 0.0)
    }
    assert(e.getMessage.contains("sampleFraction"))
  }

  test("binaryRecallAt: a full shortlist scores exactly 1.0 per query " +
    "(the re-rank is exact cosine, so only the Hamming prefilter loses); " +
    "a tiny shortlist reports bounded partial recall for every query") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val fpRoot = java.nio.file.Files.createTempDirectory("annfp_rcl").toString
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, fpRoot)

    val full = AnnIndex.binaryRecallAt(spark, queries, fpRoot, corpus,
      dim = 64, k = 5, shortlist = n - 1)
      .select("qid", "hits", "recall").as[(Long, Long, Double)].collect()
    assert(full.length == 10)
    assert(full.forall(r => r._2 == 5L && r._3 == 1.0), full.toSeq)

    val tiny = AnnIndex.binaryRecallAt(spark, queries, fpRoot, corpus,
      dim = 64, k = 5, shortlist = 6)
      .select("qid", "hits", "recall").as[(Long, Long, Double)].collect()
    assert(tiny.length == 10)
    assert(tiny.forall(r => r._2 >= 0L && r._2 <= 5L && r._3 == r._2 / 5.0),
      tiny.toSeq)
  }

  test("volume-metric degradation: an unpriced live file reads None from " +
    "fileStatsCoverage, NULLs both volume columns of the layout point, " +
    "and disables ONLY the volume leg of the breach rule — never a " +
    "silent under-count") {
    // --- production of the None at the filesystem seam: a manifest-live
    // data file deleted behind the manifest vanishes from its directory
    // listing; coverage still counts it conservatively (its sidecar
    // stats are intact) but its length must read None — folding 0 into
    // the volume sums would under-count amplification toward
    // not-alerting, the inversion of the count-every-value rule
    val root = java.nio.file.Files.createTempDirectory("annvol_unl").toString
    val df = (0 until 100).map(i => (i.toLong, (i % 4).toLong))
      .toDF("vec_id", "cluster")
    graft.io.Versioned.commit(spark,
      df.repartitionByRange(4, col("cluster")), root,
      statsCols = Seq("cluster"))
    val cellVals: Seq[Any] = Seq(0L, 1L, 2L, 3L)
    val before = graft.io.Versioned.fileStatsCoverage(
      spark, root, "cluster", cellVals)
    assert(before.nonEmpty && before.forall(_._3.nonEmpty), before)
    import scala.jdk.CollectionConverters._
    val victim = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_manifests")).toSeq.head
    java.nio.file.Files.delete(victim)
    val after = graft.io.Versioned.fileStatsCoverage(
      spark, root, "cluster", cellVals)
    assert(after.length == before.length) // still manifest-live
    assert(after.count(_._3.isEmpty) == 1, after.toString)
    // the unlisted file still COUNTS toward the open-count coverage
    assert(after.map(_._2).sum == before.map(_._2).sum)

    // --- propagation through the REAL aggregation (synthetic coverage;
    // the filesystem cannot stage an unpriced file without also breaking
    // the bounded distinct-cells scan that precedes coverage): one None
    // nulls BOTH volume columns while the open-count metric stays exact
    val covUnpriced = Seq(
      ("b1/f1", 1, Option(100L)),
      ("b1/f2", 4, Option.empty[Long]),
      ("b2/f3", 1, Option(200L)))
    val stats = AnnIndex.layoutStatsOf(spark, 4, covUnpriced)
    val bytesByFile = stats.select("file", "bytes")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(bytesByFile("b1/f2").isEmpty && bytesByFile("b1/f1").contains(100L))
    val pt = AnnIndex.layoutPointOf(stats).collect().head
    assert(pt.getAs[Long]("files") == 3L)
    assert(pt.getAs[Double]("kept_per_probe") == 1.5)
    assert(pt.isNullAt(pt.fieldIndex("kept_bytes_per_probe")), pt.toString)
    assert(pt.isNullAt(pt.fieldIndex("total_bytes")), pt.toString)
    // fully-priced control: the same shape with the length known reads
    // non-null volume (the degradation is the None, not the shape)
    val covPriced = covUnpriced.map { case (f, c, b) =>
      (f, c, b.orElse(Option(400L))) }
    val ptOk = AnnIndex.layoutPointOf(
      AnnIndex.layoutStatsOf(spark, 4, covPriced)).collect().head
    assert(!ptOk.isNullAt(ptOk.fieldIndex("kept_bytes_per_probe")))
    assert(ptOk.getAs[Long]("total_bytes") == 700L)

    // --- the breach rule: a packed-file coverage that WOULD breach on
    // the volume leg stops breaching when its length is unpriced (the
    // leg is skipped as a WHOLE — no partial sums)...
    val cells = cellVals.toIndexedSeq
    val packed = Seq(("b/f", 4, Option(4096L))) // volAmp = 4 > tol 2
    assert(AnnIndex.erodedBeyond(cells, packed, tolKept = 2.0,
      minCellBytes = 0L))
    assert(!AnnIndex.erodedBeyond(cells,
      Seq(("b/f", 4, Option.empty[Long])), tolKept = 2.0, minCellBytes = 0L))
    // ...while the OPEN-COUNT leg still fires on an unpriced eroded
    // layout — degradation never blinds the rule entirely
    val erodedUnpriced = (1 to 12).map(i => (s"b/f$i", 4, Option.empty[Long]))
    assert(AnnIndex.erodedBeyond(cells, erodedUnpriced, tolKept = 2.0,
      minCellBytes = 0L))
  }

  test("the oscillation gate's product is exact: an absurd minCellBytes " +
    "engages the gate instead of wrapping int64 and re-arming the " +
    "volume leg") {
    val cells: IndexedSeq[Any] = IndexedSeq(0L, 1L, 2L, 3L)
    // a 1 TB table packed into one all-cells file: volAmp = nlist = 4
    val packed = Seq(("b/f", 4, Option(1L << 40)))
    assert(AnnIndex.erodedBeyond(cells, packed, tolKept = 2.0,
      minCellBytes = 1L))
    // a gate larger than the table disables the volume leg (deliberate)
    assert(!AnnIndex.erodedBeyond(cells, packed, tolKept = 2.0,
      minCellBytes = 1L << 60))
    // 4 × (Long.MaxValue/2) wraps to -4 in int64: pre-guard, total < -4
    // read false and the leg RE-ARMED against the caller's explicit
    // gate; with multiplyExact the true (astronomical) gate engages
    assert(!AnnIndex.erodedBeyond(cells, packed, tolKept = 2.0,
      minCellBytes = Long.MaxValue / 2))
  }
}
