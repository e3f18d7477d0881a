package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`) — the
  * beyond-reference ANN surface (BASELINE.json north star).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k of a (small, broadcast) query
  *     set against the full corpus. O(|Q|·N·dim) map work + one shuffle on
  *     query id for the per-query top-k. The baseline and the verifier for
  *     any approximate path.
  *   - `signLshTopK`: the scale path — candidates are restricted to the
  *     query's sign-LSH bucket (random-hyperplane LSH degenerates to
  *     coordinate signs for already-random embedding bases; a production
  *     deployment would rotate by a fixed seed matrix first). Bucket join is
  *     an equi-join -> hash-partitioned both sides, prunes N down by
  *     ~2^bits per query.
  *
  * Numeric discipline: dot/norm are sequential left folds in double
  * precision (aggregate over zip_with), bit-reproducible across engines —
  * DuckDB's list_reduce does the same left fold, so the oracle matches
  * without rounding tricks.
  */
object Similarity {

  /** Sign-LSH bucket from the first `bits` coordinate signs. */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) > 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Attach cosine similarity between two embedding columns. */
  def cosineSim(a: Column, b: Column): Column =
    cosine(dotD(a, b), normSqD(a), normSqD(b))

  /** Exact top-k: each row of `queries` (columns qid, qvec) against each
    * row of `corpus` (columns nid, nvec), excluding self-pairs.
    * `queries` must be small: it is broadcast, so the corpus is scanned
    * exactly once with no shuffle before the top-k. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosineSim(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cos", "rank")
  }

  /** Multi-probe sign-LSH top-k — the recall/fan-out dial the plain
    * bucket join lacks. More bits shrink buckets (candidate set ~N/2^bits
    * per probe, the 100 TB lever); probing the exact bucket PLUS every
    * 1-bit-flip neighbor recovers the recall the extra bits cost. The
    * query side explodes to bits+1 probe buckets (queries are the small
    * side), the corpus keeps one bucket per vector, and the probe join
    * stays a plain equi-join. A (query, candidate) pair matches at most
    * one probe (probe buckets are distinct), so no dedup is needed. */
  def signLshMultiProbeTopK(queries: DataFrame, corpus: DataFrame,
                            bits: Int, k: Int): DataFrame = {
    val c = corpus.withColumn("bucket", signBucket(col("nvec"), bits))
    val flips = array((lit(0) +: (0 until bits).map(i => lit(1 << i))): _*)
    val q = queries
      .withColumn("__b0", signBucket(col("qvec"), bits))
      .withColumn("__flip", explode(flips))
      .withColumn("bucket", col("__b0").bitwiseXOR(col("__flip")))
      .drop("__b0", "__flip")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosineSim(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cos", "rank")
  }

  /** Approximate top-k: same contract, but candidates must share the
    * query's sign-LSH bucket. One equi-join on bucket instead of a cross
    * join. With few bits the per-bucket candidate set is ~N/2^bits and
    * grows linearly with the corpus — at 100 TB use
    * [[signLshMultiProbeTopK]] (more bits for the bound, probes for the
    * recall) rather than raising k here. */
  def signLshTopK(queries: DataFrame, corpus: DataFrame, bits: Int, k: Int): DataFrame = {
    val q = queries.withColumn("bucket", signBucket(col("qvec"), bits))
    val c = corpus.withColumn("bucket", signBucket(col("nvec"), bits))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosineSim(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "cos", "rank")
  }
}
