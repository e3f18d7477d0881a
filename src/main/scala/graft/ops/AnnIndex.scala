package graft.ops

import graft.io.Versioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle management for the persisted IVF-PQ index: TRAIN a frozen
  * model (IVF centroids + PQ codebook), MAINTAIN the codes table
  * incrementally (`Streams.versionedAnnIndexSink`), REBUILD it when the
  * corpus has drifted past what the frozen model represents, and SEARCH
  * the persisted pair end to end — the drift story the sink's contract
  * references ("the sink maintains, it doesn't train").
  *
  * The model is ONE versioned table holding three row kinds under a
  * `part` discriminator — `cent` (IVF centroids), `book` (PQ codebook),
  * `meta` (the m/dsub geometry the book was trained with) — so train and
  * retrain are a single atomic replace commit: readers can never observe
  * a new-centroids/old-book mix, and the geometry can never drift from
  * the book it describes (rebuild and search read m/dsub FROM the model,
  * never from caller arguments). Old models stay readable by version for
  * audit/rollback, like every versioned table.
  */
object AnnIndex {

  /** Train the frozen model from the current corpus and persist it as
    * one atomic replace commit. Returns the committed model version. */
  def train(spark: SparkSession, emb: DataFrame, m: Int, dsub: Int,
            modelRoot: String): Long = {
    val cent = Similarity.quantizedCentroids(emb)
      .select(lit("cent").as("part"), col("rlabel"), col("cvec").as("vec"))
    val book = Similarity.pqRefineBook(emb, Similarity.pqCodebook(emb), m, dsub)
      .select(lit("book").as("part"), col("rlabel"), col("cvec").as("vec"))
    val rlabelType = cent.schema("rlabel").dataType
    val meta = spark.range(1).select(lit("meta").as("part"),
      lit(m).cast(rlabelType).as("rlabel"),
      array(lit(dsub.toDouble)).as("vec"))
    Versioned.commit(spark, cent.unionByName(book).unionByName(meta),
      modelRoot, replace = true, tag = Some(s"ann-train-m$m-dsub$dsub"))
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

  /** Re-encode the whole corpus under the CURRENT persisted model and
    * replace the codes table in one commit — the drift remedy. Readers
    * see the old complete index until the commit publishes, then the new
    * complete one; the maintenance sink must be stopped first (single
    * writer per root, as for every versioned table). Returns the new
    * codes version. */
  def rebuild(spark: SparkSession, emb: DataFrame, modelRoot: String,
              codesRoot: String): Long = {
    val (cent, book, m, dsub) = model(spark, modelRoot)
    Versioned.commit(spark,
      Similarity.assignClusters(emb, cent, nprobe = 1)
        .select(col("vec_id"), col("cluster"))
        .join(Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
          book, m, dsub), Seq("vec_id")),
      codesRoot, replace = true, tag = Some("ann-rebuild"))
  }

  /** End-to-end search over the PERSISTED pair: raw query vectors in,
    * (qid, nid, cluster, cos_pq, rank) out — queries are IVF-assigned
    * against the model's centroids, candidates come from the codes
    * table. The corpus's raw embeddings are not involved anywhere. */
  def search(spark: SparkSession, queries: DataFrame, modelRoot: String,
             codesRoot: String, k: Int): DataFrame = {
    val (cent, book, _, dsub) = model(spark, modelRoot)
    Similarity.ivfPqTopKIndexed(Versioned.read(spark, codesRoot),
      Similarity.assignClusters(queries, cent, nprobe = 1), book, dsub, k)
  }
}
