package graft.ops

import graft.io.Versioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lifecycle management for the persisted IVF-PQ index: TRAIN a frozen
  * model (IVF centroids + PQ codebook + a reconstruction-quality
  * baseline), MAINTAIN the codes table incrementally
  * (`Streams.versionedAnnIndexSink`), MEASURE drift against the baseline
  * ([[driftStats]] / [[needsRebuild]] — the mechanical form of "the
  * corpus has drifted past what the frozen model represents"), REBUILD
  * when it has, and SEARCH the persisted pair end to end with the
  * standard IVF recall dial (`nprobe`).
  *
  * The model is ONE versioned table holding four row kinds under a
  * `part` discriminator — `cent` (IVF centroids), `book` (PQ codebook),
  * `meta` (the m/dsub geometry the book was trained with), `drift` (the
  * training-time reconstruction-cosine quantiles) — so train and
  * retrain are a single atomic replace commit: readers can never observe
  * a new-centroids/old-book mix, the geometry can never drift from the
  * book it describes, and the drift baseline always belongs to exactly
  * the book it was measured under (rebuild and search read m/dsub FROM
  * the model, never from caller arguments). Old models stay readable by
  * version for audit/rollback, like every versioned table.
  */
object AnnIndex {

  /** Baseline/current quantile probes: median, tail, far tail. */
  private val driftPcts = Seq(50, 90, 99)

  /** Quantized reconstruction cosine per corpus vector under `book`:
    * floor(cosine(raw, PQ reconstruction) · 2^20) as LONG — the same
    * integer-quantization discipline as [[Similarity.quantizedCentroids]]
    * (scaling by a power of two is exact in IEEE, so the quantized value
    * is engine-identical wherever the cosine is). One column out; the
    * raw vectors are read once and never shuffled (encode is map-side
    * under the broadcast book; the reconstruct groupBy and the vec_id
    * join are the only exchanges, both on the narrow id). */
  private def reconCosQ(emb: DataFrame, book: DataFrame,
                        m: Int, dsub: Int): DataFrame =
    reconCosQFromCodes(emb,
      Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        book, m, dsub), book, dsub)

  /** [[reconCosQ]] with the encode already done — the shared-pass form
    * [[trainAndRebuild]] uses so the codes computed for the index also
    * price the baseline. */
  private def reconCosQFromCodes(emb: DataFrame, codes: DataFrame,
                                 book: DataFrame, dsub: Int): DataFrame =
    Similarity.pqReconstruct(
      codes.select(col("vec_id"), col("sub"), col("code")), book, dsub)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(floor(graft.functions.GraftExpressions.cosineFD(
        col("embedding"), col("xhat")) * lit(1048576d))
        .cast("long").as("qcos"))

  /** Deterministic position quantiles of the quantized cosine column:
    * the value at ascending position ceil(p·n/100) — an exact order
    * statistic (no interpolation, so bit-identical across engines),
    * computed as min(value) with cumulative count ≥ the target position.
    * Scale posture: the windows run over the HISTOGRAM of distinct
    * quantized values, whose domain is bounded by the quantization
    * (≤ 2^21+1 entries however large the corpus), so the partition-less
    * window frames are bounded by construction. Returns (pct, q). */
  private def positionQuantiles(qcos: DataFrame): DataFrame = {
    val spark = qcos.sparkSession
    import spark.implicits._
    // nulls out (degenerate vectors: zero norm, null embedding) — they
    // carry no reconstruction-quality signal, and the oracle's histogram
    // excludes them identically (WHERE qcos IS NOT NULL); without the
    // filter a null group would sort FIRST in Spark and shift every
    // cumulative position
    val hist = qcos.filter(col("qcos").isNotNull)
      .groupBy(col("qcos")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col("qcos"))))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(lit(1))))
    hist.crossJoin(broadcast(driftPcts.toDF("pct")))
      .filter(col("__cum") >=
        floor((col("pct") * col("__n") + lit(99)) / lit(100)))
      .groupBy(col("pct")).agg(min(col("qcos")).as("q"))
  }

  /** Train the frozen model from the current corpus and persist it as
    * one atomic replace commit — centroids, refined codebook, geometry,
    * and the training-time reconstruction-cosine quantiles that
    * [[driftStats]] later compares against. The baseline costs one extra
    * encode pass under the FINAL book (linear, map-side — the same n·k·m
    * shape as the refinement step itself); it is paid once per (re)train,
    * which is exactly when the distribution snapshot must be taken — a
    * baseline measured under any other book would compare apples to
    * oranges forever after. Returns the committed model version. */
  def train(spark: SparkSession, emb: DataFrame, m: Int, dsub: Int,
            modelRoot: String): Long = {
    // pin the trained artifacts (k rows each): the codebook's refinement
    // step contains a full corpus encode, and both the model's book rows
    // and the drift baseline consume it — without the pin each branch
    // would recompute that encode
    val centDf = Similarity.quantizedCentroids(emb).localCheckpoint()
    val cent = centDf
      .select(lit("cent").as("part"), col("rlabel"), col("cvec").as("vec"))
    val bookDf = Similarity.pqRefineBook(emb, Similarity.pqCodebook(emb), m, dsub)
      .localCheckpoint()
    val book = bookDf
      .select(lit("book").as("part"), col("rlabel"), col("cvec").as("vec"))
    val rlabelType = cent.schema("rlabel").dataType
    val meta = spark.range(1).select(lit("meta").as("part"),
      lit(m).cast(rlabelType).as("rlabel"),
      array(lit(dsub.toDouble)).as("vec"))
    val drift = positionQuantiles(reconCosQ(emb, bookDf, m, dsub))
      .select(lit("drift").as("part"),
        col("pct").cast(rlabelType).as("rlabel"),
        array(col("q").cast("double")).as("vec"))
    Versioned.commit(spark,
      cent.unionByName(book).unionByName(meta).unionByName(drift),
      modelRoot, replace = true, tag = Some(s"ann-train-m$m-dsub$dsub"))
  }

  /** [[train]] + [[rebuild]] fused into ONE encode pass — the common
    * "(re)train and re-index now" flow. Separately, train encodes the
    * corpus for the drift baseline and rebuild encodes it again for the
    * codes table; here the SAME codes frame (pinned with a local
    * checkpoint so the two consumers cannot recompute it) feeds both,
    * saving a full n·k·m pass. The pin trades executor block storage —
    * m small ints per vector, the index's own size — for that pass;
    * at train-scale corpora that is the cheap side. Commit order is
    * model first, then codes: a crash between the two leaves the same
    * new-model/stale-codes state a crash between separate train and
    * rebuild calls leaves, remedied the same way (re-run; both commits
    * are replace commits). Returns (modelVersion, codesVersion);
    * byte-identical tables to calling train then rebuild. */
  def trainAndRebuild(spark: SparkSession, emb: DataFrame, m: Int, dsub: Int,
                      modelRoot: String, codesRoot: String): (Long, Long) = {
    // pin the k-row trained artifacts for the same reason as in [[train]]
    // — every consumer branch would otherwise re-pay the refinement's
    // embedded corpus encode
    val centDf = Similarity.quantizedCentroids(emb).localCheckpoint()
    val bookDf = Similarity.pqRefineBook(emb, Similarity.pqCodebook(emb), m, dsub)
      .localCheckpoint()
    val codes = Similarity.assignClusters(emb, centDf, nprobe = 1)
      .select(col("vec_id"), col("cluster"))
      .join(Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        bookDf, m, dsub), Seq("vec_id"))
      .localCheckpoint()
    val cent = centDf
      .select(lit("cent").as("part"), col("rlabel"), col("cvec").as("vec"))
    val book = bookDf
      .select(lit("book").as("part"), col("rlabel"), col("cvec").as("vec"))
    val rlabelType = cent.schema("rlabel").dataType
    val meta = spark.range(1).select(lit("meta").as("part"),
      lit(m).cast(rlabelType).as("rlabel"),
      array(lit(dsub.toDouble)).as("vec"))
    val drift = positionQuantiles(reconCosQFromCodes(emb, codes, bookDf, dsub))
      .select(lit("drift").as("part"),
        col("pct").cast(rlabelType).as("rlabel"),
        array(col("q").cast("double")).as("vec"))
    val mv = Versioned.commit(spark,
      cent.unionByName(book).unionByName(meta).unionByName(drift),
      modelRoot, replace = true, tag = Some(s"ann-train-m$m-dsub$dsub"))
    val cv = Versioned.commit(spark, codes, codesRoot, replace = true,
      tag = Some("ann-rebuild"),
      statsCols = Seq("vec_id"),
      bloomCols = Seq("vec_id").filter(c => graft.io.FileStats
        .bloomSupported(emb.schema(c).dataType)))
    (mv, cv)
  }

  /** Read the persisted model: (centroids, codebook, m, dsub). */
  def model(spark: SparkSession, modelRoot: String)
      : (DataFrame, DataFrame, Int, Int) = {
    val t = Versioned.read(spark, modelRoot)
    val metaRow = t.filter(col("part") === "meta")
      .select(col("rlabel").cast("int"), element_at(col("vec"), 1).cast("int"))
      .head()
    (t.filter(col("part") === "cent").select(col("rlabel"), col("vec").as("cvec")),
      t.filter(col("part") === "book").select(col("rlabel"), col("vec").as("cvec")),
      metaRow.getInt(0), metaRow.getInt(1))
  }

  /** Drift of the CURRENT corpus against the model's training-time
    * baseline: (pct, baseline_q, current_q, drift_q) — reconstruction
    * cosine quantiles at train time vs now, both on the quantized 2^20
    * scale, drift_q = baseline_q − current_q (positive = today's
    * vectors reconstruct WORSE than the training distribution; ~10486
    * ≈ 0.01 of cosine). A corpus matching the training distribution
    * measures drift_q = 0 exactly at every probe (same book ⇒ same
    * codes ⇒ same quantized cosines ⇒ same order statistics). This is
    * the metric behind the rebuild contract: the sink maintains under a
    * frozen book; when driftStats says the frozen book no longer
    * represents the corpus, [[train]] + [[rebuild]]. */
  def driftStats(spark: SparkSession, emb: DataFrame,
                 modelRoot: String): DataFrame = {
    // ONE snapshot read serves the book, the geometry AND the baseline:
    // a second Versioned.read could land after a concurrent retrain's
    // replace commit and pair the old book's current_q with the new
    // book's baseline_q — exactly the mixed-version read the
    // single-table model design exists to forbid (the monitor sink
    // calls this per trigger while a retrain may be running).
    val t = Versioned.read(spark, modelRoot)
    val metaRow = t.filter(col("part") === "meta")
      .select(col("rlabel").cast("int"), element_at(col("vec"), 1).cast("int"))
      .head()
    val (m, dsub) = (metaRow.getInt(0), metaRow.getInt(1))
    val book = t.filter(col("part") === "book")
      .select(col("rlabel"), col("vec").as("cvec"))
    val baseline = t.filter(col("part") === "drift")
      .select(col("rlabel").cast("int").as("pct"),
        element_at(col("vec"), 1).cast("long").as("baseline_q"))
    val current = positionQuantiles(reconCosQ(emb, book, m, dsub))
      .select(col("pct"), col("q").as("current_q"))
    baseline.join(broadcast(current), Seq("pct"))
      .select(col("pct"), col("baseline_q"), col("current_q"),
        (col("baseline_q") - col("current_q")).as("drift_q"))
  }

  /** The mechanical rebuild decision: true when reconstruction quality
    * at the `pct` probe has degraded by more than `tolQ` quantized
    * units (2^20 ≈ one unit of cosine; tolQ = 10486 ≈ 0.01 cosine).
    * One small scalar read off [[driftStats]] — a guard, not a data
    * path. */
  def needsRebuild(spark: SparkSession, emb: DataFrame, modelRoot: String,
                   pct: Int = 90, tolQ: Long = 10486L): Boolean = {
    // fail BEFORE the corpus-scale encode: the baseline only carries the
    // driftPcts probes, so any other pct would die as an opaque
    // empty-head after paying the whole measurement
    require(driftPcts.contains(pct),
      s"needsRebuild: pct=$pct is not a persisted probe " +
        s"(baselines exist at ${driftPcts.mkString("/")})")
    driftStats(spark, emb, modelRoot).filter(col("pct") === pct)
      .select(col("drift_q") > tolQ).head().getBoolean(0)
  }

  /** Re-encode the whole corpus under the CURRENT persisted model and
    * replace the codes table in one commit — the drift remedy
    * ([[needsRebuild]] is the trigger; retrain first if the book itself
    * is stale). Readers see the old complete index until the commit
    * publishes, then the new complete one; the maintenance sink must be
    * stopped first (single writer per root, as for every versioned
    * table). Returns the new codes version. */
  def rebuild(spark: SparkSession, emb: DataFrame, modelRoot: String,
              codesRoot: String): Long = {
    val (cent, book, m, dsub) = model(spark, modelRoot)
    // harvest the same vec_id stats/bloom sidecars the maintenance sink
    // writes, so its bounded re-delivery guard keeps pruning after a
    // rebuild replaces every file
    Versioned.commit(spark,
      Similarity.assignClusters(emb, cent, nprobe = 1)
        .select(col("vec_id"), col("cluster"))
        .join(Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
          book, m, dsub), Seq("vec_id")),
      codesRoot, replace = true, tag = Some("ann-rebuild"),
      statsCols = Seq("vec_id"),
      bloomCols = Seq("vec_id").filter(c => graft.io.FileStats
        .bloomSupported(emb.schema(c).dataType)))
  }

  /** Persist the binary (1-bit/dim) sign-fingerprint index for
    * [[binarySearch]]: one (vec_id, fp) row per corpus vector, dim/8
    * bytes of fingerprint each — the RAM-prefilter table that stands in
    * for 4-byte-per-dim raw floats in the shortlist stage. vec_id
    * stats + blooms harvest like the codes table, so point-lookup joins
    * into the index prune files. One replace commit; rebuild by calling
    * again (fingerprints have no trained state, so unlike IVF-PQ there
    * is no drift story — a fingerprint is a pure function of its
    * vector). Returns the committed version. */
  def buildBinaryIndex(spark: SparkSession, emb: DataFrame, dim: Int,
                       fpRoot: String): Long =
    Versioned.commit(spark,
      emb.select(col("vec_id"),
        Similarity.signWords(col("embedding"), dim).as("fp")),
      fpRoot, replace = true, tag = Some(s"binary-fp-dim$dim"),
      statsCols = Seq("vec_id"),
      bloomCols = Seq("vec_id").filter(c => graft.io.FileStats
        .bloomSupported(emb.schema(c).dataType)))

  /** Search the persisted fingerprint index: Hamming-shortlist against
    * the index table, exact cosine re-rank against `corpus`'s raw
    * vectors (only the shortlist's rows are fetched). `dim` must be the
    * index's build dim — checked loudly against the stored word count
    * before any work runs. */
  def binarySearch(spark: SparkSession, queries: DataFrame, fpRoot: String,
                   corpus: DataFrame, dim: Int, k: Int,
                   shortlist: Int): DataFrame = {
    val fp = Versioned.read(spark, fpRoot)
    val words = fp.select(size(col("fp"))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"binarySearch: the fingerprint index at $fpRoot is empty — " +
          "build it from a non-empty corpus first"))
    require(words == (dim + 31) / 32,
      s"binarySearch: dim=$dim expects ${(dim + 31) / 32} fingerprint " +
        s"words, but the index at $fpRoot stores $words — search with the " +
        "dim the index was built with")
    Similarity.binaryTopKIndexed(fp.select(col("vec_id").as("nid"), col("fp")),
      queries, corpus, dim, k, shortlist)
  }

  /** End-to-end search over the PERSISTED pair: raw query vectors in,
    * (qid, nid, cluster, cos_pq, rank) out — queries are IVF-assigned
    * against the model's centroids, candidates come from the codes
    * table. The corpus's raw embeddings are not involved anywhere.
    * `nprobe` is the standard IVF recall dial: a query probes its
    * `nprobe` nearest cells (the stored side always keeps one home cell
    * per vector — multiprobe belongs on the query side, see
    * [[Similarity.ivfPqTopKIndexed]]), so recall rises at the cost of
    * scoring proportionally more candidate cells. */
  def search(spark: SparkSession, queries: DataFrame, modelRoot: String,
             codesRoot: String, k: Int, nprobe: Int = 1): DataFrame = {
    val (cent, book, _, dsub) = model(spark, modelRoot)
    Similarity.ivfPqTopKIndexed(Versioned.read(spark, codesRoot),
      Similarity.assignClusters(queries, cent, nprobe = nprobe), book, dsub, k)
  }
}
