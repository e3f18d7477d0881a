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

  /** Attach cosine similarity between two embedding columns — the fused
    * single-pass kernel (dot + both norms in one array walk; the composed
    * form traverses each pair three times). Bit-identical to
    * cosine(dotD, normSqD, normSqD) and the oracle (KernelSpec). */
  def cosineSim(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.cosineD(a, b)

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

  /** Exact top-k via the bounded-heap `graft_topk` aggregate — same result
    * set and ordering as [[bruteForceTopK]] but the scale-path plan: the
    * window form exchanges EVERY scored candidate row and sorts whole
    * partitions to keep k; here partial aggregation keeps k pairs per
    * (query, task) map-side, so the single exchange carries at most
    * k×|queries|×tasks structs and there is no sort at all. */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineSim(col("qvec"), col("nvec")).as("cos"))
    topkPerQuery(scored, k)
  }

  /** Per-query bounded-heap top-k over a scored (qid, nid, cos) frame —
    * the shared final stage of the aggregate-path rankers: one
    * partial+final hash agg, k pairs per (query, task) on the wire,
    * rank = heap position. Tie-break (cos desc, nid asc) matches the
    * window form it replaces. */
  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import graft.functions.GraftExpressions.topKBy
    scored.groupBy(col("qid"))
      .agg(topKBy(col("cos"), col("nid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("nid"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF centroid table from seed labels — one Lloyd step with integer-
    * quantized component sums (floor(v * 2^20)): exact, order-independent
    * and engine-identical, and since cosine is scale-invariant the
    * un-normalized sum vector IS the centroid direction (no mean
    * division, whose decimal rounding differs across engines).
    * Input columns (label, embedding) -> output (rlabel, cvec). */
  def quantizedCentroids(emb: DataFrame): DataFrame = {
    val Q = 1048576L
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * Q).cast("long")).as("s"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast("double")).as("cvec"))
      .select(col("label").as("rlabel"), col("cvec"))
  }

  /** Cosine via the generic interpreted fold — for mixed-width vectors
    * (float embeddings vs double centroids) where the float-array kernel
    * doesn't apply. Assignment-sized work only; probes use the kernel. */
  def cosineGeneric(a: Column, b: Column): Column =
    cosine(dotDComposed(a, b), dotDComposed(a, a), dotDComposed(b, b))

  /** Run `iters` full Lloyd iterations from the seed `label` column:
    * recompute quantized centroids from the current assignment, reassign
    * each vector to its nearest centroid (spherical k-means — the sum
    * direction maximizes within-cluster cosine, so mean cosine to the
    * assigned centroid is non-decreasing per iteration up to quantization
    * noise). Each iteration costs one centroid aggregation (two shuffles
    * over exploded components) plus a broadcast assignment scan;
    * per-iteration lineage is truncated (reliable `checkpoint()` when the
    * session has a checkpoint dir — survives executor loss mid-iteration
    * at cluster scale — else eager `localCheckpoint`) so iteration
    * i+1 doesn't re-derive iterations 1..i. Input (vec_id, embedding,
    * label) -> same shape with refined labels. */
  def lloydIterate(emb: DataFrame, iters: Int): DataFrame = {
    var labeled = emb.select(col("vec_id"), col("embedding"), col("label"))
    for (_ <- 1 to iters) {
      val cent = quantizedCentroids(labeled.select(col("label"), col("embedding")))
      labeled = Iterate.pin(assignClusters(labeled.select(col("vec_id"), col("embedding")), cent, 1)
        .select(col("vec_id"), col("embedding"), col("cluster").as("label")))
    }
    labeled
  }

  /** Assign each (vec_id, embedding) row to its `nprobe` nearest
    * centroids by cosine (deterministic tie-break on rlabel). nprobe=1
    * indexes the corpus; nprobe>1 widens a query's candidate lists —
    * the standard IVF recall dial. */
  def assignClusters(emb: DataFrame, cent: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("rcos").desc, col("rlabel"))
    emb.crossJoin(broadcast(cent))
      .withColumn("rcos", cosineGeneric(col("embedding"), col("cvec")))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= nprobe)
      .select(col("vec_id"), col("embedding"), col("rlabel").as("cluster"))
  }

  /** SemDeDup — semantic deduplication by cluster blocking (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication" — public): embeddings are k-means-clustered
    * ([[quantizedCentroids]]/[[lloydIterate]] + [[assignClusters]]), and
    * near-duplicate detection runs only WITHIN each cluster — the
    * clustering is the blocking step that makes semantic dedup tractable
    * at corpus scale (all-pairs cosine over 100 TB of embeddings is
    * impossible; per-cluster pairs are bounded).
    *
    * Keep rule (deterministic, engine-reproducible): a row is DROPPED iff
    * some cluster-mate with a smaller `vec_id` lies within the similarity
    * threshold (`cos >= tau`) — i.e. each near-dup group keeps its
    * lowest-id member that has no smaller near neighbor. Returns the kept
    * (vec_id, cluster) rows.
    *
    * Scale posture: the intra-cluster join is O(size²) per cluster, which
    * is SemDeDup's own cost model — at scale you raise the CLUSTER COUNT
    * so sizes stay bounded, you don't pay bigger quadratic blocks. A
    * cluster above `maxClusterSize` fails loudly (add centroids /
    * re-cluster) instead of detonating a task. */
  def semDedupKeep(assigned: DataFrame, tau: Double,
                   maxClusterSize: Int = 100000): DataFrame = {
    val over = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxClusterSize).limit(1).collect()
    require(over.isEmpty,
      s"semDedupKeep: cluster ${over.head.get(0)} has ${over.head.getLong(1)} " +
        s"members (> maxClusterSize=$maxClusterSize); increase the centroid " +
        "count (smaller clusters) — do not pay quadratic blocks this large")
    val b = assigned.select(col("vec_id").as("__bid"),
      col("embedding").as("__bvec"), col("cluster"))
    val dropped = assigned.join(b, Seq("cluster"))
      .filter(col("__bid") < col("vec_id"))
      .filter(cosineSim(col("embedding"), col("__bvec")) >= lit(tau))
      .select(col("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** IVF probe: exact top-k of each query against the candidates in its
    * probed cluster lists. The corpus side carries ONE cluster per
    * vector, so a (query, candidate) pair meets at most once even with
    * nprobe > 1 — no dedup needed. */
  def ivfTopK(corpusAssigned: DataFrame, queryAssigned: DataFrame, k: Int): DataFrame = {
    val q = queryAssigned.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), col("cluster"))
    val c = corpusAssigned.select(col("vec_id").as("nid"),
      col("embedding").as("nvec"), col("cluster"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    c.join(broadcast(q), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosineSim(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "nid", "cluster", "cos", "rank")
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
                            bits: Int, k: Int,
                            capPerBucket: Int = 4096): DataFrame = {
    // same deterministic per-bucket corpus cap as signLshTopK: bounds the
    // candidate set per probe even under a degenerate sign distribution
    val cRaw = corpus.withColumn("bucket", signBucket(col("nvec"), bits))
    val wcap = Window.partitionBy(col("bucket")).orderBy(col("nid"))
    val c = cRaw.withColumn("__rn", row_number().over(wcap))
      .filter(col("__rn") <= capPerBucket).drop("__rn")
    val flips = array((lit(0) +: (0 until bits).map(i => lit(1 << i))): _*)
    val q = queries
      .withColumn("__b0", signBucket(col("qvec"), bits))
      .withColumn("__flip", explode(flips))
      .withColumn("bucket", col("__b0").bitwiseXOR(col("__flip")))
      .drop("__b0", "__flip")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineSim(col("qvec"), col("nvec")).as("cos"))
    topkPerQuery(scored, k)
  }

  /** Approximate top-k: same contract, but candidates must share the
    * query's sign-LSH bucket. One equi-join on bucket instead of a cross
    * join. With few bits the per-bucket candidate set is ~N/2^bits and
    * grows linearly with the corpus, so the corpus side is capped at
    * `capPerBucket` members per bucket (deterministic keeper order by
    * nid; compiles to WindowGroupLimit with pre-shuffle partial limit) —
    * no candidate set is unbounded even when one sign pattern dominates.
    * The default cap is far above any test-scale bucket, so capped and
    * uncapped results coincide there. At 100 TB prefer
    * [[signLshMultiProbeTopK]] (more bits for the bound, probes for the
    * recall) rather than raising k or the cap here. */
  def signLshTopK(queries: DataFrame, corpus: DataFrame, bits: Int, k: Int,
                  capPerBucket: Int = 4096): DataFrame = {
    val q = queries.withColumn("bucket", signBucket(col("qvec"), bits))
    val cRaw = corpus.withColumn("bucket", signBucket(col("nvec"), bits))
    val wcap = Window.partitionBy(col("bucket")).orderBy(col("nid"))
    val c = cRaw.withColumn("__rn", row_number().over(wcap))
      .filter(col("__rn") <= capPerBucket).drop("__rn")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineSim(col("qvec"), col("nvec")).as("cos"))
    topkPerQuery(scored, k)
  }
}
