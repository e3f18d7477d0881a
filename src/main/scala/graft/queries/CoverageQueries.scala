package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining SURVEY §2 inventory + OLAP breadth: the disabled J7
  * update-join, P12 range-with-exclusion extraction predicates, rollup
  * aggregation, corpus term frequency (heavy-hitter shape), and
  * threshold-based embedding near-dup pairs.
  */
object CoverageQueries {

  private val D = DecimalType(18, 6)
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(D)).cast(DoubleType)

  // -------------------------------------------------------------------
  // J7 update-join enrichment (pipelines/etl_weekly_sales.py:98-106,
  // commented UPDATE..FROM..JOIN): left-join the master and COALESCE the
  // enriched column, keeping rows without a match.
  // -------------------------------------------------------------------
  def updateJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("article"))
      .agg(dsum(col("l_quantity")).as("qty"))
    val master = Tables.part(spark, sfDir)
      .filter(col("p_partkey") % 3 === 0) // sparse master: some articles unmatched
      .select(col("p_partkey").as("article"), col("p_brand"))
    agg.join(broadcast(master), Seq("article"), "left")
      .withColumn("brand", coalesce(col("p_brand"), lit("UNKNOWN")))
      .drop("p_brand")
  }

  val updateJoinOracle: String =
    """SELECT l.article, l.qty, COALESCE(p.p_brand, 'UNKNOWN') AS brand
      |FROM (SELECT l_partkey AS article,
      |             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |      FROM lineitem GROUP BY 1) l
      |LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_partkey % 3 = 0) p
      |  ON l.article = p.p_partkey
      |""".stripMargin

  // -------------------------------------------------------------------
  // P12 extraction-range predicates: include-range minus exclusion
  // interval on sites, movement-type set, posting-date window
  // (sap_scripts/downloader_zmb51.py:20-61) — the selection-screen
  // semantics as pushdown-able filters.
  // -------------------------------------------------------------------
  def rangeExclusion(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey").between(0, 79) && !col("l_suppkey").between(40, 59))
      .filter(col("l_returnflag").isin("A", "R"))
      .filter(to_date(col("l_shipdate")).between(
        to_date(lit("1995-01-01")), to_date(lit("1996-12-31"))))
      .groupBy(col("l_suppkey").as("site"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))

  val rangeExclusionOracle: String =
    """SELECT l_suppkey AS site, COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |FROM lineitem
      |WHERE l_suppkey BETWEEN 0 AND 79
      |  AND NOT (l_suppkey BETWEEN 40 AND 59)
      |  AND l_returnflag IN ('A', 'R')
      |  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
      |GROUP BY 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // Rollup aggregation (OLAP breadth beyond the reference): brand x month
  // with subtotal and grand-total rows.
  // -------------------------------------------------------------------
  def salesRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .withColumn("month", date_trunc("month", col("l_shipdate")).cast(DateType))
      .filter(col("month").between(to_date(lit("1996-01-01")), to_date(lit("1996-06-30"))))
      .rollup(col("p_brand").as("brand"), col("month"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
  }

  val salesRollupOracle: String =
    """SELECT p_brand AS brand, CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE CAST(date_trunc('month', l_shipdate) AS DATE)
      |      BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
      |GROUP BY ROLLUP(1, 2)
      |""".stripMargin

  // -------------------------------------------------------------------
  // Corpus term frequency: explode -> two-level aggregate -> global
  // top-100 (TakeOrdered, not a full sort). The token-budget /
  // vocabulary primitive of a training-data pipeline.
  // -------------------------------------------------------------------
  def termFrequency(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(100)

  val termFrequencyOracle: String =
    """SELECT t AS token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id,
      |             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                                x -> x <> '')) AS t
      |      FROM documents)
      |GROUP BY 1 ORDER BY tf DESC, token LIMIT 100
      |""".stripMargin

  // -------------------------------------------------------------------
  // S2 schema-align coercion (pipelines/etl_utils.py:86-142) as an
  // oracle-checked query: declared-schema projection with null->"" string
  // fill, null-on-failure numeric coercion (a text column forced to
  // decimal), and a missing column materialized empty.
  // -------------------------------------------------------------------
  def schemaAlignQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val declared = StructType(Seq(
      StructField("name", StringType), StructField("cust_id", IntegerType),
      StructField("nation_id", IntegerType),
      StructField("segment_num", DecimalType(10, 2)), // text forced to decimal -> null
      StructField("missing", StringType)))
    val renamed = Tables.customer(spark, sfDir).withColumnsRenamed(Map(
      "c_name" -> "name", "c_custkey" -> "cust_id",
      "c_nationkey" -> "nation_id", "c_mktsegment" -> "segment_num"))
    graft.clean.Clean.schemaAlign(renamed, declared)
  }

  val schemaAlignOracle: String =
    """SELECT COALESCE(CAST(c_name AS VARCHAR), '') AS name,
      |       TRY_CAST(CAST(c_custkey AS VARCHAR) AS INTEGER) AS cust_id,
      |       TRY_CAST(CAST(c_nationkey AS VARCHAR) AS INTEGER) AS nation_id,
      |       TRY_CAST(CAST(c_mktsegment AS VARCHAR) AS DECIMAL(10,2)) AS segment_num,
      |       '' AS missing
      |FROM customer
      |""".stripMargin

  // -------------------------------------------------------------------
  // Embedding near-dup pairs: sign-LSH blocked (6 bits), cosine >= 0.3.
  // -------------------------------------------------------------------
  def embeddingNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val raw = emb.select(col("vec_id"), col("embedding"),
      Similarity.signBucket(col("embedding"), 6).as("bucket"))
    // bucket-member cap (same guard as Dedup.capBuckets): bounds the
    // within-bucket self-join at web scale where one sign pattern can
    // dominate; 4096 is far above any test-scale bucket (~80 members at
    // sf0.1), so capped and uncapped plans are oracle-identical here.
    // Compiles to WindowGroupLimit with partial limiting pre-shuffle.
    val wcap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("vec_id"))
    val b = raw.withColumn("__rn", row_number().over(wcap))
      .filter(col("__rn") <= 4096).drop("__rn")
    val a = b.select(col("vec_id").as("d1"), col("embedding").as("e1"), col("bucket"))
    val c = b.select(col("vec_id").as("d2"), col("embedding").as("e2"), col("bucket"))
    a.join(c, Seq("bucket")).filter(col("d1") < col("d2"))
      .withColumn("cos", Similarity.cosineSim(col("e1"), col("e2")))
      .filter(col("cos") >= 0.3)
      .select("d1", "d2", "cos")
  }

  /** Shared CTE body for the sign-bucketed near-dup pair graph (also the
    * edge set of `dedup_clusters`). */
  private val embNeardupCtes: String =
    """b AS (
      |  SELECT vec_id, embedding,
      |         list_sum(list_transform(range(0,6),
      |           i -> CASE WHEN embedding[i+1] > 0 THEN (1 << i) ELSE 0 END)) AS bucket
      |  FROM embeddings),
      |pairs AS (
      |  SELECT q.vec_id AS d1, c.vec_id AS d2,
      |         list_reduce(list_transform(range(0,64),
      |           i -> CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE)),
      |           (acc, x) -> acc + x)
      |         / (sqrt(list_reduce(list_transform(range(0,64),
      |              i -> CAST(q.embedding[i+1] AS DOUBLE) * CAST(q.embedding[i+1] AS DOUBLE)),
      |              (acc, x) -> acc + x))
      |          * sqrt(list_reduce(list_transform(range(0,64),
      |              i -> CAST(c.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE)),
      |              (acc, x) -> acc + x))) AS cos
      |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id)""".stripMargin

  val embeddingNeardupOracle: String =
    s"""WITH $embNeardupCtes
       |SELECT d1, d2, cos FROM pairs WHERE cos >= 0.3
       |""".stripMargin

  // -------------------------------------------------------------------
  // Near-dup CLUSTERS: connected components over the near-dup pair graph
  // — pairs alone under-delete (near-dup similarity is transitive in
  // practice but a pair list is not), so cluster-level dedup labels each
  // doc with the smallest id in its component as the canonical keeper.
  // Spark side: iterative min-label propagation (Dedup.connectedComponents);
  // oracle side: recursive reachability closure — different algorithms,
  // identical fixpoint, which is exactly what makes it oracle-checkable.
  // -------------------------------------------------------------------
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = embeddingNeardup(spark, sfDir).select("d1", "d2")
    graft.ops.Dedup.connectedComponents(edges, "d1", "d2")
  }

  val dedupClustersOracle: String =
    s"""WITH RECURSIVE $embNeardupCtes,
       |p AS (SELECT d1, d2 FROM pairs WHERE cos >= 0.3),
       |edges AS (SELECT d1 AS a, d2 AS dst FROM p UNION ALL SELECT d2, d1 FROM p),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |r AS (SELECT node, node AS m FROM nodes
       |      UNION
       |      SELECT r.node, e.dst FROM r JOIN edges e ON e.a = r.m)
       |SELECT node, MIN(m) AS cluster FROM r GROUP BY 1
       |""".stripMargin

  /** Fuzzy key matching: all customer-name pairs within edit distance 1,
    * found by SymSpell deletion-neighborhood blocking (Dedup.
    * editDistance1Pairs — O(n·L) block keys + exact levenshtein verify)
    * while the oracle brute-forces the O(n^2) all-pairs comparison: two
    * different algorithms, identical pair set, which is the point. */
  def fuzzyPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Dedup.editDistance1Pairs(Tables.customer(spark, sfDir), "c_name")

  val fuzzyPairsOracle: String =
    """WITH n AS (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL)
      |SELECT a.c_name AS d1, b.c_name AS d2
      |FROM n a JOIN n b
      |  ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
      |""".stripMargin

  /** The d = 2 generalization (Dedup.editDistancePairs): two-deletion
    * SymSpell blocks, exact levenshtein <= 2 verify. Run on a FIXED
    * 1000-key slice — customer names differ only in trailing digits, so
    * full-table d = 2 output grows quadratically with SF and would
    * benchmark the result SIZE, not the operator (the d = 1 query keeps
    * the full-table scale demonstration). */
  def fuzzyPairs2(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Dedup.editDistancePairs(
      Tables.customer(spark, sfDir).filter(col("c_custkey") <= 1000L),
      "c_name", 2)

  val fuzzyPairs2Oracle: String =
    """WITH n AS (SELECT DISTINCT c_name FROM customer
      |           WHERE c_custkey <= 1000 AND c_name IS NOT NULL)
      |SELECT a.c_name AS d1, b.c_name AS d2
      |FROM n a JOIN n b
      |  ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 2
      |""".stripMargin

  /** Fuzzy lookup JOIN (entity resolution): every customer enriched with
    * its best edit-distance-≤1 match from the "clean dimension" (every
    * 10th customer's name) — deletion-neighborhood blocking on both
    * sides, best = (smallest distance, then smallest value), unmatched
    * rows keep nulls. The oracle brute-forces all dirty × clean
    * levenshtein pairs and picks the same deterministic best. */
  def fuzzyJoinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val clean = cust.filter(pmod(col("c_custkey"), lit(10)) === 0)
      .select(col("c_name"))
    graft.ops.Dedup.fuzzyJoin(
        cust.select(col("c_custkey"), col("c_name")), clean, "c_name")
      .select(col("c_custkey"), col("c_name"),
        col("c_name_matched"), col("c_name_dist"))
  }

  /** S2 closed for real: customers split into two xlsx WORKBOOKS (written
    * by the JDK-only XlsxWriter, streamed via toLocalIterator — an xlsx
    * is inherently a single driver-side unit, like the S9 single-file CSV
    * export), read back DISTRIBUTED by XlsxReader.readDir (one workbook
    * per executor task), typed by cast, and aggregated. The oracle runs
    * the same aggregate over the original parquet — numbers round-trip
    * exactly through their Java lexical form. */
  def xlsxRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = QueryScratch.freshRoot("graft_xlsx_rt", sfDir)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val header = Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    // ONE pass over the table routes each row to its parity bucket; the
    // buffers are dimension-sized by construction (this is the xlsx
    // export shape — a workbook is a driver-side unit either way)
    val buckets = Array.fill(2)(Vector.newBuilder[Seq[Any]])
    val it = cust.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      buckets((r.getLong(0) % 2).toInt) +=
        Seq(r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))
    }
    graft.io.XlsxWriter.writeFile(s"$dir/even.xlsx", header, buckets(0).result().iterator)
    graft.io.XlsxWriter.writeFile(s"$dir/odd.xlsx", header, buckets(1).result().iterator)
    graft.io.XlsxReader.readDir(spark, dir)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("c_custkey").cast("long")).as("key_sum"),
        dsum(col("c_acctbal")).as("sum_bal"))
  }

  val xlsxRoundtripOracle: String =
    """SELECT c_mktsegment AS segment, COUNT(*) AS cnt,
      |       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
      |FROM customer GROUP BY 1
      |""".stripMargin

  val fuzzyJoinOracle: String =
    """WITH cl AS (
      |  SELECT DISTINCT c_name AS cv FROM customer
      |  WHERE c_custkey % 10 = 0 AND c_name IS NOT NULL
      |), dv AS (
      |  SELECT DISTINCT c_name AS dv FROM customer WHERE c_name IS NOT NULL
      |), cand AS (
      |  SELECT dv, cv, levenshtein(dv, cv) AS dist FROM dv, cl
      |  WHERE levenshtein(dv, cv) <= 1
      |), best AS (
      |  SELECT dv, cv, dist FROM (
      |    SELECT dv, cv, dist,
      |           row_number() OVER (PARTITION BY dv ORDER BY dist, cv) AS rn
      |    FROM cand) WHERE rn = 1
      |)
      |SELECT c.c_custkey, c.c_name, b.cv AS c_name_matched,
      |       CAST(b.dist AS INTEGER) AS c_name_dist
      |FROM customer c LEFT JOIN best b ON c.c_name = b.dv
      |""".stripMargin

  /** APPLY the cluster dedup — the deliverable the cluster labels exist
    * for: drop every non-canonical member (node != its cluster min-id),
    * keep canonicals and never-clustered vectors, and report the surviving
    * corpus per label. One left_anti join of the corpus against the small
    * dropped set; the CC fixpoint is inherited from dedup_clusters. */
  def dedupApply(spark: SparkSession, sfDir: String): DataFrame = {
    val dropped = dedupClusters(spark, sfDir)
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as("vec_id"))
    Tables.embeddings(spark, sfDir)
      .join(dropped, Seq("vec_id"), "left_anti")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("kept"), sum(col("vec_id")).as("id_sum"))
  }

  val dedupApplyOracle: String =
    s"""WITH RECURSIVE $embNeardupCtes,
       |p AS (SELECT d1, d2 FROM pairs WHERE cos >= 0.3),
       |edges AS (SELECT d1 AS a, d2 AS dst FROM p UNION ALL SELECT d2, d1 FROM p),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |r AS (SELECT node, node AS m FROM nodes
       |      UNION
       |      SELECT r.node, e.dst FROM r JOIN edges e ON e.a = r.m),
       |cc AS (SELECT node, MIN(m) AS cluster FROM r GROUP BY 1),
       |dropped AS (SELECT node FROM cc WHERE node <> cluster)
       |SELECT label, COUNT(*) AS kept, CAST(SUM(vec_id) AS BIGINT) AS id_sum
       |FROM embeddings
       |WHERE vec_id NOT IN (SELECT node FROM dropped)
       |GROUP BY 1
       |""".stripMargin

  // -------------------------------------------------------------------
  // IVF-style ANN: coarse quantize to the nearest cluster representative
  // (deterministic medoid stand-in: the min-vec_id member per label),
  // then exact top-3 within the assigned cluster only. Two broadcast
  // joins + windowed top-k — the inverted-file pruning shape: each query
  // scans corpus/|clusters| instead of the full corpus.
  // -------------------------------------------------------------------
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions.{cosine, dotD, normSqD}
    import graft.ops.Relational
    import org.apache.spark.sql.expressions.Window

    val emb = Tables.embeddings(spark, sfDir)
    val reps = Relational.dedupKeepFirst(Seq("label"), Seq(col("vec_id")))(emb)
      .select(col("label").as("rlabel"), col("embedding").as("rvec"))

    val w = Window.partitionBy(col("vec_id")).orderBy(col("rcos").desc, col("rlabel"))
    val assigned = emb.crossJoin(broadcast(reps))
      .withColumn("rcos", cosine(dotD(col("embedding"), col("rvec")),
        normSqD(col("embedding")), normSqD(col("rvec"))))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vec_id"), col("embedding"), col("rlabel").as("cluster"))

    val q = assigned.filter(col("vec_id") < 30)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("cluster"))
    val c = assigned
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cluster"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    c.join(broadcast(q), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(dotD(col("qvec"), col("nvec")),
        normSqD(col("qvec")), normSqD(col("nvec"))))
      .withColumn("rank", row_number().over(wq)).filter(col("rank") <= 3)
      .select("qid", "nid", "cluster", "cos", "rank")
  }

  /** Sequential-fold cosine between `$a.embedding`-style SQL fragments. */
  private def cosSql(a: String, b: String): String = {
    def nsq(x: String) =
      s"""sqrt(list_reduce(list_transform(range(0,64),
         |  i -> CAST($x[i+1] AS DOUBLE) * CAST($x[i+1] AS DOUBLE)), (acc, x) -> acc + x))""".stripMargin
    s"""list_reduce(list_transform(range(0,64),
       |  i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)), (acc, x) -> acc + x)
       | / (${nsq(a)} * ${nsq(b)})""".stripMargin
  }

  val annIvfOracle: String =
    s"""WITH reps AS (
       |  SELECT label AS rlabel, embedding AS rvec FROM embeddings
       |  QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id) = 1),
       |assigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.rvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN reps r)
       |  WHERE rn = 1),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.cluster,
       |         ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM assigned q JOIN assigned c
       |    ON q.cluster = c.cluster AND q.vec_id < 30 AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cluster, cos, rank FROM (
       |  SELECT qid, nid, cluster, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |""".stripMargin

  // -------------------------------------------------------------------
  // IVF with a REAL centroid step (one Lloyd iteration from the seed
  // labels): centroid direction = component-wise sum of members — exact
  // because components are quantized to integers (floor(v * 2^20)), so
  // the sums are order-independent and engine-identical, and cosine's
  // scale invariance means no mean division (whose decimal rounding
  // differs across engines) is ever needed. Vectors then REASSIGN to the
  // nearest centroid and probe within the assigned cluster only.
  // -------------------------------------------------------------------
  def annIvfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cent = Similarity.quantizedCentroids(emb)
    val assigned = Similarity.assignClusters(emb, cent, nprobe = 1)
    Similarity.ivfTopK(assigned, assigned.filter(col("vec_id") < 30), k = 3)
  }

  // -------------------------------------------------------------------
  // IVF with nprobe=2: queries probe their TWO nearest refined centroids
  // (the standard IVF recall dial) while the corpus stays indexed under
  // one cluster each — candidate lists double, pairs stay unique.
  // -------------------------------------------------------------------
  def annIvfProbe2(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cent = Similarity.quantizedCentroids(emb)
    val corpus = Similarity.assignClusters(emb, cent, nprobe = 1)
    val queries = Similarity.assignClusters(
      emb.filter(col("vec_id") < 30), cent, nprobe = 2)
    Similarity.ivfTopK(corpus, queries, k = 3)
  }

  // -------------------------------------------------------------------
  // IVF-PQ: same IVF routing as ann_ivf_kmeans, but candidates are
  // scored against their PRODUCT-QUANTIZED reconstruction (Jégou et al.
  // 2011) — m=16 subspaces of 4 components, mean-scale codebooks seeded
  // from the label centroids and refined by ONE per-subspace Lloyd step
  // (PQ's actual training: k-means per subspace), argmax-subspace-cosine
  // encoding with smallest-label ties, ADC scoring as cosine(raw query,
  // reconstruction). See ops/Similarity.scala for the memory story
  // (dim floats -> m codes).
  // -------------------------------------------------------------------
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cent = Similarity.quantizedCentroids(emb)
    val corpus = Similarity.assignClusters(emb, cent, nprobe = 1)
    val queries = corpus.filter(col("vec_id") < 30)
    val book = Similarity.pqRefineBook(emb,
      Similarity.pqCodebook(emb), m = 16, dsub = 4)
    Similarity.ivfPqTopK(corpus, queries, book, m = 16, dsub = 4, k = 3)
  }

  /** The PERSISTED-index path under the same oracle as [[annIvfPq]]:
    * train the model into a versioned table (atomic cent/book/meta
    * commit), rebuild the codes table from the corpus under it, then
    * search raw queries against ONLY the persisted pair
    * (`ops/AnnIndex.scala`). Same m=16/dsub=4 geometry and query set as
    * `ann_ivf_pq`, so the DuckDB oracle is shared verbatim — the
    * lifecycle plumbing must be hash-invisible. */
  def annIndexLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_q", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_q", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.search(spark, emb.filter(col("vec_id") < 30),
      modelRoot, codesRoot, k = 3)
  }

  /** Persisted-path search with the IVF recall dial turned to nprobe=2:
    * the same lifecycle as [[annIndexLifecycle]] but each query probes
    * its TWO nearest cells — the PQ-scored mirror of `ann_ivf_probe2`,
    * checked against [[annIvfPqProbe2Oracle]] (the shared oracle with
    * the query side at rn <= 2). */
  def annLifecycleProbe2(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_p2", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_p2", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.search(spark, emb.filter(col("vec_id") < 30),
      modelRoot, codesRoot, k = 3, nprobe = 2)
  }

  /** Drift measurement on a fresh model: train on the corpus, then ask
    * [[graft.ops.AnnIndex.driftStats]] how far TODAY's corpus sits from
    * the training-time reconstruction-quality baseline. Trained and
    * measured on the same table, so drift_q must be exactly 0 at every
    * probe — the engine's persisted baseline and its recomputed current
    * quantiles must both match DuckDB's independent computation. */
  def annDriftStatsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_dr", sfDir)
    AnnIndex.train(spark, emb, m = 16, dsub = 4, modelRoot)
    AnnIndex.driftStats(spark, emb, modelRoot)
  }

  /** The IVF-PQ oracle parameterized by the QUERY side's probe count:
    * corpus vectors keep one home cell (rn = 1), queries probe their
    * `qprobe` nearest cells — at qprobe = 1 this is exactly the original
    * `ann_ivf_pq` oracle; at 2 it mirrors `ann_ivf_probe2`'s recall dial
    * on the PQ-scored path. */
  /** Shared oracle CTE chain for the m=16/dsub=4 PQ pipeline — centroid
    * sums, seed + one-Lloyd-step refined codebook, final codes, and the
    * per-vector reconstruction `xhat` — used by the search oracles
    * ([[annIvfPqOracleAt]]) and the drift oracle ([[annDriftOracle]]). */
  private val pqBookCtes: String = {
    def subdot(e: String, c: String) =
      s"""list_reduce(list_transform(range(0,4),
         |  j -> CAST($e[sub*4+j+1] AS DOUBLE) * CAST($c[sub*4+j+1] AS DOUBLE)),
         |  (acc, x) -> acc + x)""".stripMargin
    def subcos(e: String, c: String) =
      s"""(${subdot(e, c)}) / (sqrt(${subdot(e, e)}) * sqrt(${subdot(c, c)}))"""
    def encode(book: String) =
      s"""SELECT vec_id, sub, rlabel AS code FROM (
         |    SELECT e.vec_id, s.sub, c.rlabel,
         |           row_number() OVER (PARTITION BY e.vec_id, s.sub
         |             ORDER BY ${subcos("e.embedding", "c.bvec")} DESC, c.rlabel) AS rn
         |    FROM embeddings e, range(0,16) s(sub), $book c)
         |  WHERE rn = 1""".stripMargin
    s"""comp AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
       |         COUNT(*) AS c
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp GROUP BY 1),
       |book0 AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) / c ORDER BY i) AS bvec
       |  FROM comp GROUP BY 1),
       |codes0 AS (
       |  ${encode("book0")}),
       |rcomp AS (
       |  SELECT k.code, k.sub, j,
       |         SUM(CAST(floor(CAST(e.embedding[k.sub*4+j+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
       |         COUNT(*) AS c
       |  FROM codes0 k JOIN embeddings e ON e.vec_id = k.vec_id, range(0,4) u(j)
       |  GROUP BY 1, 2, 3),
       |book AS (
       |  SELECT b.rlabel,
       |         list(coalesce(CAST(r.s AS DOUBLE) / r.c, b.bvec[g.i+1]) ORDER BY g.i) AS bvec
       |  FROM book0 b CROSS JOIN range(0,64) g(i)
       |  LEFT JOIN rcomp r ON r.code = b.rlabel AND r.sub = g.i // 4 AND r.j = g.i % 4
       |  GROUP BY b.rlabel),
       |codes AS (
       |  ${encode("book")}),
       |xhat AS (
       |  SELECT k.vec_id,
       |         flatten(list(c.bvec[k.sub*4+1:k.sub*4+4] ORDER BY k.sub)) AS xv
       |  FROM codes k JOIN book c ON k.code = c.rlabel GROUP BY k.vec_id)""".stripMargin
  }

  private def annIvfPqOracleAt(qprobe: Int): String = {
    s"""WITH $pqBookCtes,
       |ranked AS (
       |  SELECT e.vec_id, e.embedding, r.rlabel,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |  FROM embeddings e CROSS JOIN cent r),
       |assigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM ranked WHERE rn = 1),
       |qassigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM ranked
       |  WHERE rn <= $qprobe AND vec_id < 30),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.cluster,
       |         ${cosSql("q.embedding", "x.xv")} AS cos_pq
       |  FROM qassigned q
       |  JOIN assigned c ON q.cluster = c.cluster
       |    AND q.vec_id <> c.vec_id
       |  JOIN xhat x ON x.vec_id = c.vec_id)
       |SELECT qid, nid, cluster, cos_pq, rank FROM (
       |  SELECT qid, nid, cluster, cos_pq,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos_pq DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |""".stripMargin
  }

  val annIvfPqOracle: String = annIvfPqOracleAt(1)
  val annIvfPqProbe2Oracle: String = annIvfPqOracleAt(2)

  /** Binary-quantization ANN with exact re-rank
    * ([[Similarity.binaryTopK]]): 1-bit/dim sign fingerprints shortlist
    * each query's 50 nearest by Hamming distance, then ONLY the
    * shortlist is re-ranked by exact cosine — the RAM-prefilter pattern
    * (8 B/vector where raw floats are 256 B). Deterministic end to end:
    * sign bits, integer Hamming, nid tie-breaks, and the sequential-fold
    * cosine are all engine-identical. */
  def annBinaryRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.binaryTopK(
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")),
      dim = 64, k = 5, shortlist = 50)
  }

  /** The PERSISTED-index form of [[annBinaryRerank]] under the SAME
    * oracle verbatim: build the fingerprint table into a versioned root,
    * then search it — the persistence must be hash-invisible, exactly
    * like `ann_index_lifecycle` vs `ann_ivf_pq`. */
  def annBinaryLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val fpRoot = QueryScratch.freshRoot("graft_annfp_q", sfDir)
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, fpRoot)
    AnnIndex.binarySearch(spark,
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      fpRoot,
      emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")),
      dim = 64, k = 5, shortlist = 50)
  }

  val annBinaryRerankOracle: String =
    s"""WITH fp AS (
       |  SELECT vec_id, embedding,
       |         list_transform(range(0,2), w ->
       |           CAST(list_sum(list_transform(range(0,32), i ->
       |             CASE WHEN CAST(embedding[w*32+i+1] AS DOUBLE) > 0
       |                  THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
       |             AS BIGINT)) AS f
       |  FROM embeddings),
       |short AS (
       |  SELECT qid, nid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS nid,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_sum(list_transform(range(0,2), w ->
       |               bit_count(xor(q.f[w+1], c.f[w+1])))), c.vec_id) AS rn
       |    FROM fp q JOIN fp c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
       |  WHERE rn <= 50),
       |scored AS (
       |  SELECT s.qid, s.nid, ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.qid
       |  JOIN embeddings c ON c.vec_id = s.nid)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT qid, nid, cos,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
       |           AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |""".stripMargin

  /** Oracle for [[annDriftStatsQuery]]: the model is trained on the same
    * corpus driftStats is later pointed at, so every probe must measure
    * current == baseline and drift_q = 0 — the position quantiles of the
    * quantized reconstruction cosine (value at ascending position
    * ceil(p·n/100), an exact order statistic) computed independently by
    * DuckDB over the shared PQ pipeline. */
  val annDriftOracle: String =
    s"""WITH $pqBookCtes,
       |qcs AS (
       |  SELECT CAST(floor((${cosSql("e.embedding", "x.xv")}) * 1048576) AS BIGINT) AS qcos
       |  FROM embeddings e JOIN xhat x ON x.vec_id = e.vec_id),
       |hist AS (SELECT qcos, count(*) AS c FROM qcs WHERE qcos IS NOT NULL GROUP BY 1),
       |cum AS (SELECT qcos, sum(c) OVER (ORDER BY qcos) AS cum, sum(c) OVER () AS n FROM hist),
       |q AS (SELECT p.pct, min(h.qcos) AS qv
       |      FROM cum h, (VALUES (50),(90),(99)) p(pct)
       |      WHERE h.cum >= (p.pct * h.n + 99) // 100
       |      GROUP BY 1)
       |SELECT CAST(pct AS INTEGER) AS pct, qv AS baseline_q, qv AS current_q,
       |       CAST(0 AS BIGINT) AS drift_q
       |FROM q
       |""".stripMargin

  /** Cell-occupancy health of the persisted pair
    * ([[graft.ops.AnnIndex.cellStats]]): trainAndRebuild persists the
    * training-time per-cell counts inside the atomic model commit, and
    * cellStats compares the CURRENT codes table against them — the
    * BALANCE half of the rebuild contract (the maintenance sink appends
    * under frozen centroids, so a drifted arrival distribution piles
    * vectors into few cells and degrades probed-cell search toward O(n)
    * on the hot cell while reconstruction-quality drift stays quiet).
    * Here the codes table IS the training corpus, so baseline == current
    * at every cell and both must equal DuckDB's independent assignment
    * count; the shares are exact-IEEE divisions of those counts. */
  def annCellStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_cell", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_cell", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.cellStats(spark, codesRoot, modelRoot)
  }

  val annCellStatsOracle: String =
    s"""WITH comp AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp GROUP BY 1),
       |assigned AS (
       |  SELECT vec_id, rlabel AS cluster FROM (
       |    SELECT e.vec_id, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN cent r)
       |  WHERE rn = 1),
       |cnt AS (SELECT cluster, count(*) AS c FROM assigned GROUP BY 1)
       |SELECT CAST(cluster AS INTEGER) AS cluster,
       |       c AS baseline_cnt, c AS current_cnt,
       |       CAST(c AS DOUBLE) / CAST(SUM(c) OVER () AS DOUBLE) AS baseline_share,
       |       CAST(c AS DOUBLE) / CAST(SUM(c) OVER () AS DOUBLE) AS current_share
       |FROM cnt
       |""".stripMargin

  /** Sampled drift measurement ([[graft.ops.AnnIndex.driftStats]] with
    * `sampleFraction`): current quantiles come from the deterministic
    * 25% hash-mod sample (md5 discipline — a FIXED subset, reproducible
    * across engines), the baseline from the full training corpus, so
    * drift_q here is exactly the sampling noise of the estimator at this
    * corpus size — the oracle recomputes both sides independently and
    * must agree bit for bit. This is the periodic corpus-level health
    * check for scales where the exact form's full encode is too much to
    * pay per check. */
  def annDriftSampled(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_smp", sfDir)
    AnnIndex.train(spark, emb, m = 16, dsub = 4, modelRoot)
    AnnIndex.driftStats(spark, emb, modelRoot, sampleFraction = 0.25)
  }

  val annDriftSampledOracle: String =
    s"""WITH $pqBookCtes,
       |qcs AS (
       |  SELECT e.vec_id,
       |         CAST(floor((${cosSql("e.embedding", "x.xv")}) * 1048576) AS BIGINT) AS qcos
       |  FROM embeddings e JOIN xhat x ON x.vec_id = e.vec_id),
       |histb AS (SELECT qcos, count(*) AS c FROM qcs WHERE qcos IS NOT NULL GROUP BY 1),
       |cumb AS (SELECT qcos, sum(c) OVER (ORDER BY qcos) AS cum, sum(c) OVER () AS n FROM histb),
       |qb AS (SELECT p.pct, min(h.qcos) AS bq
       |       FROM cumb h, (VALUES (50),(90),(99)) p(pct)
       |       WHERE h.cum >= (p.pct * h.n + 99) // 100
       |       GROUP BY 1),
       |hists AS (SELECT qcos, count(*) AS c FROM qcs
       |          WHERE qcos IS NOT NULL
       |            AND CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)),1,8)) AS BIGINT) % 10000 < 2500
       |          GROUP BY 1),
       |cums AS (SELECT qcos, sum(c) OVER (ORDER BY qcos) AS cum, sum(c) OVER () AS n FROM hists),
       |qs AS (SELECT p.pct, min(h.qcos) AS cq
       |       FROM cums h, (VALUES (50),(90),(99)) p(pct)
       |       WHERE h.cum >= (p.pct * h.n + 99) // 100
       |       GROUP BY 1)
       |SELECT CAST(b.pct AS INTEGER) AS pct, b.bq AS baseline_q, s.cq AS current_q,
       |       b.bq - s.cq AS drift_q
       |FROM qb b JOIN qs s ON b.pct = s.pct
       |""".stripMargin

  /** Cell-PRUNED binary-fingerprint search
    * ([[graft.ops.AnnIndex.binarySearch]] with `nprobe`): the celled
    * index build carries each fingerprint's IVF home cell, queries probe
    * their 2 nearest cells, and the Hamming shortlist scans ONLY
    * fingerprints homed where the query probes — the probed-cell IN
    * filter pushes into the versioned scan and the per-file cluster
    * stats skip whole files, the binary-index mirror of the codes-table
    * candidate pruning. Exhaustive scanning remains the default
    * (`ann_binary_rerank` / `ann_binary_lifecycle`); this is the opt-in
    * for fingerprint tables too large to scan per query batch. */
  def annBinaryPruned(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val cent = graft.ops.Similarity.quantizedCentroids(emb)
    val fpRoot = QueryScratch.freshRoot("graft_annfp_cell", sfDir)
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, fpRoot, cent)
    AnnIndex.binarySearch(spark,
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      fpRoot,
      emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")),
      dim = 64, k = 5, shortlist = 50, cent, nprobe = 2)
  }

  val annBinaryPrunedOracle: String =
    s"""WITH comp AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp GROUP BY 1),
       |ranked AS (
       |  SELECT e.vec_id, r.rlabel,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |  FROM embeddings e CROSS JOIN cent r),
       |assigned AS (SELECT vec_id, rlabel AS cluster FROM ranked WHERE rn = 1),
       |qprobe AS (SELECT vec_id, rlabel AS cluster FROM ranked
       |           WHERE rn <= 2 AND vec_id < 20),
       |fp AS (
       |  SELECT vec_id,
       |         list_transform(range(0,2), w ->
       |           CAST(list_sum(list_transform(range(0,32), i ->
       |             CASE WHEN CAST(embedding[w*32+i+1] AS DOUBLE) > 0
       |                  THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
       |             AS BIGINT)) AS f
       |  FROM embeddings),
       |short AS (
       |  SELECT qid, nid FROM (
       |    SELECT qp.vec_id AS qid, a.vec_id AS nid,
       |           row_number() OVER (PARTITION BY qp.vec_id
       |             ORDER BY list_sum(list_transform(range(0,2), w ->
       |               bit_count(xor(q.f[w+1], c.f[w+1])))), a.vec_id) AS rn
       |    FROM qprobe qp
       |    JOIN assigned a ON a.cluster = qp.cluster AND a.vec_id <> qp.vec_id
       |    JOIN fp q ON q.vec_id = qp.vec_id
       |    JOIN fp c ON c.vec_id = a.vec_id)
       |  WHERE rn <= 50),
       |scored AS (
       |  SELECT s.qid, s.nid, ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.qid
       |  JOIN embeddings c ON c.vec_id = s.nid)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT qid, nid, cos,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
       |           AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |""".stripMargin

  /** PREPARED-handle search ([[graft.ops.AnnIndex.prepare]]): the same
    * persisted lifecycle as `ann_lifecycle_probe2`, but the search runs
    * through the reusable handle — model collected ONCE to the driver,
    * query assignment computed driver-side against the in-memory
    * centroids (kernel-exact cosine, heap-exact tie-breaks), per-call
    * work only the probed-cell candidate join. Shares
    * [[annIvfPqProbe2Oracle]] verbatim with the direct nprobe=2 search:
    * the handle must be hash-invisible — same rows, same schema, same
    * bits — or the fixed-cost optimization isn't an optimization. */
  def annPrepared(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_ph", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_ph", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.prepare(spark, modelRoot, codesRoot)
      .search(emb.filter(col("vec_id") < 30), k = 3, nprobe = 2)
  }

  /** The prepared handle's AUTO serve dial
    * ([[graft.ops.PreparedAnnSearch.LocalBytesAuto]]): the same
    * lifecycle as `ann_prepared`, searched with `localBytesCap = -1` —
    * the cap prices itself from the snapshot listing resolved at
    * prepare (safety × ideal per-probe bytes, clamped to the dial's
    * measured win region), and on this corpus the floor admits the
    * ONE-job driver-local path. Shares [[annIvfPqProbe2Oracle]]
    * verbatim: the local path's reconstruction, the shared cosine
    * kernel and the replicated (cos DESC, nid ASC) ranking must be
    * hash-invisible against DuckDB's independent re-derivation — the
    * strongest row-identity pin the dial has, because the oracle never
    * saw Spark's plan at all. */
  def annPreparedAuto(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_pa", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_pa", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.prepare(spark, modelRoot, codesRoot)
      .search(emb.filter(col("vec_id") < 30), k = 3, nprobe = 2,
        localBytesCap = graft.ops.PreparedAnnSearch.LocalBytesAuto)
  }

  /** Layout-only RECELL maintenance ([[graft.ops.AnnIndex.recell]]):
    * train the model on the FULL corpus, build the celled codes table
    * from only the even-id half, append the odd-id half in the
    * maintenance sink's exact row shape (frozen-model assignment +
    * encode — byte-identical rows to what a rebuild would write, landing
    * as wide-cluster-range files the probed-cell IN cannot skip), then
    * `recell` and search. The recelled table must hold exactly the
    * full-corpus codes in a restored one-file-per-cell layout, so the
    * nprobe=2 search shares [[annIvfPqProbe2Oracle]] VERBATIM — recell
    * must be hash-invisible or it isn't layout-only. */
  def annRecell(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_rc", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_rc", sfDir)
    AnnIndex.train(spark, emb, m = 16, dsub = 4, modelRoot)
    AnnIndex.rebuild(spark, emb.filter(col("vec_id") % 2 === 0),
      modelRoot, codesRoot)
    val late = emb.filter(col("vec_id") % 2 =!= 0)
    val (cent, book, m, dsub) = AnnIndex.model(spark, modelRoot)
    graft.io.Versioned.commit(spark,
      AnnIndex.encodeCodes(late, cent, book, m, dsub),
      codesRoot, statsCols = Seq("vec_id", "cluster"),
      bloomCols = Seq("vec_id"))
    AnnIndex.recell(spark, codesRoot)
    AnnIndex.search(spark, emb.filter(col("vec_id") < 30),
      modelRoot, codesRoot, k = 3, nprobe = 2)
  }

  /** Measured recall@k ([[graft.ops.AnnIndex.recallAt]]): the nprobe=2
    * persisted search's top-3 intersected per query with the EXACT
    * brute-force cosine top-3 over the same corpus — (qid, hits,
    * recall) rows, the number that makes the IVF recall dial tunable
    * instead of folklore. The oracle recomputes BOTH sides
    * independently (the full PQ chain at rn <= 2 and the exact-cosine
    * window) and intersects in SQL; hit counts are genuinely partial
    * on this corpus, so the join, the zero-coalesce and the /k are all
    * load-bearing. */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_rec", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_rec", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.recallAt(spark, emb.filter(col("vec_id") < 30),
      modelRoot, codesRoot, emb, k = 3, nprobe = 2)
  }

  /** The recall oracle parameterized over the query-id predicate — ONE
    * independent DuckDB re-derivation (full PQ chain, exact-cosine
    * ground truth, SQL intersection) serving the full form
    * (`vec_id < 30`) and the sampled form (the same ids through the md5
    * hash-mod subset rule recomputed in SQL). */
  private def annRecallOracleWhere(qidPred: String): String =
    s"""WITH $pqBookCtes,
       |ranked AS (
       |  SELECT e.vec_id, e.embedding, r.rlabel,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |  FROM embeddings e CROSS JOIN cent r),
       |assigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM ranked WHERE rn = 1),
       |qassigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM ranked
       |  WHERE rn <= 2 AND $qidPred),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         ${cosSql("q.embedding", "x.xv")} AS cos_pq
       |  FROM qassigned q
       |  JOIN assigned c ON q.cluster = c.cluster AND q.vec_id <> c.vec_id
       |  JOIN xhat x ON x.vec_id = c.vec_id),
       |approx AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos_pq DESC, nid) AS rank
       |    FROM scored)
       |  WHERE rank <= 3),
       |tpairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM (SELECT vec_id, embedding FROM embeddings WHERE $qidPred) q
       |  JOIN embeddings c ON q.vec_id <> c.vec_id),
       |truth AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |    FROM tpairs)
       |  WHERE rank <= 3),
       |hits AS (
       |  SELECT a.qid, COUNT(*) AS hits
       |  FROM approx a JOIN truth t ON a.qid = t.qid AND a.nid = t.nid
       |  GROUP BY 1)
       |SELECT q.qid, coalesce(h.hits, 0) AS hits,
       |       coalesce(h.hits, 0) / 3.0 AS recall
       |FROM (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE $qidPred) q
       |LEFT JOIN hits h ON h.qid = q.qid
       |""".stripMargin

  val annRecallOracle: String = annRecallOracleWhere("vec_id < 30")

  /** [[annRecall]]'s SAMPLED form ([[graft.ops.AnnIndex.recallAt]] with
    * `sampleFraction = 0.25`): the same measurement over the
    * deterministic 25% md5 hash-mod subset of the queries — the built-in
    * sampling the 100 TB posture calls for (the ground truth costs a
    * corpus scan per query batch; recall converges at O(1/√q)). The
    * oracle recomputes the subset RULE in SQL (the same
    * '0x'||md5-prefix cast the sampled-drift oracle pins) and then both
    * sides independently; rows are exactly the full form's rows for the
    * sampled qids, which the spec pins as sampled ⊆ full per-qid
    * equality. */
  def annRecallSampled(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_recs", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_recs", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4, modelRoot, codesRoot)
    AnnIndex.recallAt(spark, emb.filter(col("vec_id") < 30),
      modelRoot, codesRoot, emb, k = 3, nprobe = 2, sampleFraction = 0.25)
  }

  val annRecallSampledOracle: String = annRecallOracleWhere(
    "vec_id < 30 AND CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)),1,8)) AS BIGINT) % 10000 < 2500")

  /** Bloom-pruned re-rank FETCH ([[graft.ops.AnnIndex.binarySearch]]
    * against a versioned corpus root): the Hamming shortlist's vec_ids
    * push into the corpus scan as an IN, so the per-file vec_id blooms
    * the corpus commit harvested skip every file holding none of them —
    * the re-rank stage's mirror of the codes table's probed-cell file
    * pruning (rows were already pruned by the broadcast shortlist join;
    * FILES are what an exhaustive fetch still paid). Shares
    * [[annBinaryRerankOracle]] verbatim with the ad-hoc-corpus form: the
    * pruned fetch must be hash-invisible. */
  def annBinaryFetch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val fpRoot = QueryScratch.freshRoot("graft_annfp_f", sfDir)
    val corpusRoot = QueryScratch.freshRoot("graft_anncorp_f", sfDir)
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, fpRoot)
    graft.io.Versioned.commit(spark,
      emb.select(col("vec_id"), col("embedding")), corpusRoot,
      replace = true, statsCols = Seq("vec_id"), bloomCols = Seq("vec_id"))
    AnnIndex.binarySearch(spark,
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      fpRoot, corpusRoot, dim = 64, k = 5, shortlist = 50)
  }

  /** Measured recall@k for the BINARY index
    * ([[graft.ops.AnnIndex.binaryRecallAt]]): the Hamming-shortlist +
    * exact-re-rank search's top-5 intersected per query with the exact
    * brute-force cosine top-5 — pure SHORTLIST loss (the re-rank is
    * exact), the number that sizes the `shortlist` dial. The oracle
    * recomputes both sides independently (sign-fingerprint Hamming
    * shortlist chain + exact-cosine window) and intersects in SQL; at
    * shortlist=50 over this corpus the hit counts are genuinely
    * partial. */
  def annBinaryRecall(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val fpRoot = QueryScratch.freshRoot("graft_annfp_rcl", sfDir)
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, fpRoot)
    AnnIndex.binaryRecallAt(spark,
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      fpRoot, emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")),
      dim = 64, k = 5, shortlist = 50)
  }

  val annBinaryRecallOracle: String =
    s"""WITH fp AS (
       |  SELECT vec_id, embedding,
       |         list_transform(range(0,2), w ->
       |           CAST(list_sum(list_transform(range(0,32), i ->
       |             CASE WHEN CAST(embedding[w*32+i+1] AS DOUBLE) > 0
       |                  THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
       |             AS BIGINT)) AS f
       |  FROM embeddings),
       |short AS (
       |  SELECT qid, nid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS nid,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY list_sum(list_transform(range(0,2), w ->
       |               bit_count(xor(q.f[w+1], c.f[w+1])))), c.vec_id) AS rn
       |    FROM fp q JOIN fp c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
       |  WHERE rn <= 50),
       |scored AS (
       |  SELECT s.qid, s.nid, ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.qid
       |  JOIN embeddings c ON c.vec_id = s.nid),
       |approx AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |    FROM scored)
       |  WHERE rank <= 5),
       |tpairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
       |truth AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |    FROM tpairs)
       |  WHERE rank <= 5),
       |hits AS (
       |  SELECT a.qid, COUNT(*) AS hits
       |  FROM approx a JOIN truth t ON a.qid = t.qid AND a.nid = t.nid
       |  GROUP BY 1)
       |SELECT q.qid, coalesce(h.hits, 0) AS hits,
       |       coalesce(h.hits, 0) / 5.0 AS recall
       |FROM (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE vec_id < 20) q
       |LEFT JOIN hits h ON h.qid = q.qid
       |""".stripMargin

  /** PREPARED binary handle ([[graft.ops.AnnIndex.prepareBinary]]):
    * the binary-index twin of `ann_prepared` — fingerprint/corpus scans
    * resolved and width checked ONCE, centroids driver-held, per-call
    * work only the cell-pruned Hamming shortlist + the bloom-pruned
    * re-rank fetch. The model is trained from the fixture's labels, so
    * its centroids equal `ann_binary_pruned`'s ad-hoc quantized
    * centroids and the oracle is shared VERBATIM — the handle must be
    * hash-invisible against the direct celled search. */
  def annBinaryPrepared(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_bp", sfDir)
    val fpRoot = QueryScratch.freshRoot("graft_annfp_bp", sfDir)
    val corpusRoot = QueryScratch.freshRoot("graft_anncorp_bp", sfDir)
    AnnIndex.train(spark, emb, m = 16, dsub = 4, modelRoot)
    AnnIndex.buildBinaryIndex(spark, emb, dim = 64, fpRoot, modelRoot)
    graft.io.Versioned.commit(spark,
      emb.select(col("vec_id"), col("embedding")), corpusRoot,
      replace = true, statsCols = Seq("vec_id"), bloomCols = Seq("vec_id"))
    AnnIndex.prepareBinary(spark, fpRoot, corpusRoot, dim = 64, modelRoot)
      .search(emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        k = 5, shortlist = 50, nprobe = 2)
  }

  /** The SCALE-THE-CELLS recipe in oracle-checkable form
    * ([[graft.ops.AnnIndex.trainAndRebuild]]'s scaladoc): retrain the
    * same corpus at 2× the cells (20 via `cellLabelCol` = vec_id mod 20
    * vs the fixture's 10 labels — the move a growing index makes when
    * [[graft.ops.AnnIndex.cellStats]] shows uniformly fat cells) while
    * the PQ codebook keeps its 10 seed labels (the decoupled geometry:
    * the n·k·m encode cost doesn't move), then search at nprobe = every
    * cell — where results are layout-INVARIANT (each candidate still
    * meets each query exactly once, in its home cell), so the oracle
    * pins both that the 2×-cell index searches correctly AND that only
    * the `cluster` column (the home-cell layout) changed shape. */
  def annCellScaleup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("cell", pmod(col("vec_id"), lit(20)).cast("int"))
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_c2x", sfDir)
    val codesRoot = QueryScratch.freshRoot("graft_anncodes_c2x", sfDir)
    AnnIndex.trainAndRebuild(spark, emb, m = 16, dsub = 4,
      modelRoot, codesRoot, cellLabelCol = "cell")
    AnnIndex.search(spark, emb.filter(col("vec_id") < 30),
      modelRoot, codesRoot, k = 3, nprobe = 20)
  }

  val annCellScaleupOracle: String =
    s"""WITH $pqBookCtes,
       |comp2 AS (
       |  SELECT CAST(vec_id % 20 AS INTEGER) AS label2, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent2 AS (
       |  SELECT label2 AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp2 GROUP BY 1),
       |assigned AS (
       |  SELECT vec_id, rlabel AS cluster FROM (
       |    SELECT e.vec_id, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN cent2 r)
       |  WHERE rn = 1),
       |scored AS (
       |  SELECT q.vec_id AS qid, a.vec_id AS nid, a.cluster,
       |         ${cosSql("q.embedding", "x.xv")} AS cos_pq
       |  FROM embeddings q
       |  JOIN assigned a ON q.vec_id < 30 AND a.vec_id <> q.vec_id
       |  JOIN xhat x ON x.vec_id = a.vec_id)
       |SELECT qid, nid, cluster, cos_pq, rank FROM (
       |  SELECT qid, nid, cluster, cos_pq,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos_pq DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |""".stripMargin

  /** Alert-on-runs over a drift time series
    * ([[graft.ops.AnnIndex.driftSeries]] + [[graft.ops.AnnIndex
    * .driftAlerts]]): the corpus is sharded into 8 deterministic batches
    * (vec_id mod 8), every batch's reconstruction-cosine quantiles come
    * out of ONE encode pass measured against the model's training-time
    * baseline, and the alert helper reduces the p90 series to maximal
    * runs of consecutive breaches (drift_q > 0 — i.e. the batch
    * reconstructs worse than the training distribution at p90) with
    * alert = run ≥ 2. This is the monitor sink's "alert on a run of bad
    * batches, not one" contract in mechanical, oracle-checkable form —
    * per-batch quantiles of random shards scatter around the corpus
    * baseline, so breaches and runs here are pure (deterministic)
    * sampling noise, exactly what the run-length rule exists to absorb. */
  def annDriftAlerts(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val emb = Tables.embeddings(spark, sfDir)
    val modelRoot = QueryScratch.freshRoot("graft_annmodel_alrt", sfDir)
    AnnIndex.train(spark, emb, m = 16, dsub = 4, modelRoot)
    AnnIndex.driftAlerts(
      AnnIndex.driftSeries(spark,
        emb.withColumn("batch_id", pmod(col("vec_id"), lit(8)).cast("long")),
        modelRoot),
      pct = 90, tolQ = 0L, minRun = 2)
  }

  val annDriftAlertsOracle: String =
    s"""WITH $pqBookCtes,
       |qcs AS (
       |  SELECT e.vec_id % 8 AS batch_id,
       |         CAST(floor((${cosSql("e.embedding", "x.xv")}) * 1048576) AS BIGINT) AS qcos
       |  FROM embeddings e JOIN xhat x ON x.vec_id = e.vec_id),
       |histb AS (SELECT qcos, count(*) AS c FROM qcs WHERE qcos IS NOT NULL GROUP BY 1),
       |cumb AS (SELECT qcos, sum(c) OVER (ORDER BY qcos) AS cum, sum(c) OVER () AS n FROM histb),
       |qb AS (SELECT p.pct, min(h.qcos) AS bq
       |       FROM cumb h, (VALUES (50),(90),(99)) p(pct)
       |       WHERE h.cum >= (p.pct * h.n + 99) // 100
       |       GROUP BY 1),
       |hist AS (SELECT batch_id, qcos, count(*) AS c FROM qcs
       |         WHERE qcos IS NOT NULL GROUP BY 1, 2),
       |cum AS (SELECT batch_id, qcos,
       |               sum(c) OVER (PARTITION BY batch_id ORDER BY qcos) AS cum,
       |               sum(c) OVER (PARTITION BY batch_id) AS n
       |        FROM hist),
       |cq AS (SELECT h.batch_id, p.pct, min(h.qcos) AS cqv
       |       FROM cum h, (VALUES (50),(90),(99)) p(pct)
       |       WHERE h.cum >= (p.pct * h.n + 99) // 100
       |       GROUP BY 1, 2),
       |ser AS (SELECT c.batch_id, b.bq - c.cqv AS drift_q
       |        FROM cq c JOIN qb b ON b.pct = c.pct WHERE c.pct = 90),
       |breach AS (
       |  SELECT batch_id, rn, row_number() OVER (ORDER BY batch_id) AS rb FROM (
       |    SELECT batch_id, drift_q,
       |           row_number() OVER (ORDER BY batch_id) AS rn
       |    FROM ser)
       |  WHERE drift_q > 0)
       |SELECT min(batch_id) AS run_start, max(batch_id) AS run_end,
       |       CAST(count(*) AS INTEGER) AS run_len,
       |       count(*) >= 2 AS alert
       |FROM breach GROUP BY rn - rb
       |""".stripMargin

  /** The LAYOUT run rule ([[graft.ops.AnnIndex.layoutAlerts]]) over a
    * deterministic kept-per-probe series — the third erosion axis's
    * alerts, sharing [[annDriftAlerts]]' gaps-and-islands shape with the
    * breach condition on kept_per_probe > tol_kept (the recell
    * trigger's own threshold). The series derives from the lineitem
    * line numbers (batch ids 1..7, kept = batch_id%4 + 1), giving two
    * interior breach runs the oracle recomputes positionally; the REAL
    * sink-accreted series is pinned by the streaming spec (a sidecar
    * measurement DuckDB cannot see). */
  def annLayoutAlerts(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val series = Tables.lineitem(spark, sfDir)
      .select(col("l_linenumber").cast("long").as("batch_id")).distinct()
      .withColumn("kept_per_probe",
        (pmod(col("batch_id"), lit(4L)) + lit(1L)).cast("double"))
    AnnIndex.layoutAlerts(series, tolKept = 2.0, minRun = 2)
  }

  val annLayoutAlertsOracle: String =
    """WITH ser AS (
      |  SELECT DISTINCT CAST(l_linenumber AS BIGINT) AS batch_id,
      |         CAST((l_linenumber % 4) + 1 AS DOUBLE) AS kept
      |  FROM lineitem),
      |breach AS (
      |  SELECT batch_id, rn, row_number() OVER (ORDER BY batch_id) AS rb FROM (
      |    SELECT batch_id, kept,
      |           row_number() OVER (ORDER BY batch_id) AS rn
      |    FROM ser)
      |  WHERE kept > 2.0)
      |SELECT min(batch_id) AS run_start, max(batch_id) AS run_end,
      |       CAST(count(*) AS INTEGER) AS run_len,
      |       count(*) >= 2 AS alert
      |FROM breach GROUP BY rn - rb
      |""".stripMargin

  /** The VOLUME-aware layout run rule (r17: [[graft.ops.AnnIndex
    * .layoutAlerts]]' second leg) over a deterministic series carrying
    * the monitor sink's full row shape — kept_per_probe (file opens)
    * AND kept_bytes_per_probe/cells/total_bytes (read volume). The
    * series derives from the lineitem line numbers so DuckDB can
    * recompute BOTH breach legs and the OR between them positionally:
    * batch 5 breaches only by open count, batches 3/6/7 only by
    * volume amplification (keptB·cells > tol·total — the
    * one-packed-file pathology's signature, where opens read a
    * "perfect" 1.0), batch 2 by both. The REAL sink-accreted packed
    * regime is pinned by the streaming spec (file sizes DuckDB cannot
    * see); this query pins the reduction RULE itself. */
  def annLayoutVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AnnIndex
    val series = Tables.lineitem(spark, sfDir)
      .select(col("l_linenumber").cast("long").as("batch_id")).distinct()
      .withColumn("kept_per_probe",
        (pmod(col("batch_id"), lit(3L)) + lit(1L)).cast("double"))
      .withColumn("kept_bytes_per_probe",
        ((pmod(col("batch_id"), lit(4L)) + lit(1L)) * lit(100L))
          .cast("double"))
      .withColumn("cells", lit(8L))
      .withColumn("total_bytes", lit(800L))
    AnnIndex.layoutAlerts(series, tolKept = 2.0, minRun = 2)
  }

  val annLayoutVolumeOracle: String =
    """WITH ser AS (
      |  SELECT DISTINCT CAST(l_linenumber AS BIGINT) AS batch_id,
      |         CAST((l_linenumber % 3) + 1 AS DOUBLE) AS kept,
      |         CAST(((l_linenumber % 4) + 1) * 100 AS DOUBLE) AS keptb
      |  FROM lineitem),
      |breach AS (
      |  SELECT batch_id, rn, row_number() OVER (ORDER BY batch_id) AS rb FROM (
      |    SELECT batch_id, kept, keptb,
      |           row_number() OVER (ORDER BY batch_id) AS rn
      |    FROM ser)
      |  WHERE kept > 2.0 OR keptb * 8 > 2.0 * 800)
      |SELECT min(batch_id) AS run_start, max(batch_id) AS run_end,
      |       CAST(count(*) AS INTEGER) AS run_len,
      |       count(*) >= 2 AS alert
      |FROM breach GROUP BY rn - rb
      |""".stripMargin

  val annIvfKmeansOracle: String =
    s"""WITH comp AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp GROUP BY 1),
       |assigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN cent r)
       |  WHERE rn = 1),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.cluster,
       |         ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM assigned q JOIN assigned c
       |    ON q.cluster = c.cluster AND q.vec_id < 30 AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cluster, cos, rank FROM (
       |  SELECT qid, nid, cluster, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |""".stripMargin

  /** SemDeDup over the embeddings table: k-means cluster blocking
    * (quantized centroid step, same as ann_ivf_kmeans) + intra-cluster
    * near-dup keep rule at cos >= 0.2 — the canonical semantic-dedup
    * operator for training corpora, oracle-exact because every float in
    * the pipeline (quantized centroid sums, sequential-fold cosine) is
    * engine-identical, so even the THRESHOLD comparisons agree bitwise. */
  def semDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cent = Similarity.quantizedCentroids(emb)
    val assigned = Similarity.assignClusters(emb, cent, nprobe = 1)
    Similarity.semDedupKeep(assigned, tau = 0.2)
  }

  val semDedupOracle: String =
    s"""WITH comp AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp GROUP BY 1),
       |assigned AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN cent r)
       |  WHERE rn = 1),
       |dropped AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.2)
       |SELECT a.vec_id, a.cluster FROM assigned a
       |LEFT JOIN dropped d ON a.vec_id = d.vec_id
       |WHERE d.vec_id IS NULL
       |""".stripMargin

  /** SemDeDup under the AUTO-SCALING centroid default
    * (Similarity.semDedupAuto): k = max(16, ceil(n/200)) corpus-derived
    * fine seeds from deterministic stride selection, routed through the
    * TWO-LEVEL coarse(√k)-then-fine assignment, then the intra-cluster
    * keep rule — the form whose assignment AND pair work both stay
    * near-linear as the corpus grows, oracle-exact end to end including
    * the seed/stride arithmetic and both assignment tie-breaks. */
  def semDedupAuto(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    Similarity.semDedupAuto(emb, tau = 0.2)
  }

  val semDedupAutoOracle: String =
    s"""WITH p AS (
       |  SELECT n, stride, cstride, m % stride AS rf, m % cstride AS rc
       |  FROM (
       |    SELECT n, m, stride, stride * GREATEST(1,
       |             CAST(floor(sqrt(k) + 0.5) AS BIGINT)) AS cstride
       |    FROM (
       |      SELECT n, m, k,
       |             GREATEST(1, CAST(floor(n * 1.0 / k) AS BIGINT)) AS stride
       |      FROM (SELECT n, m, GREATEST(16, CAST(ceil(n / 200.0) AS BIGINT)) AS k
       |            FROM (SELECT COUNT(*) AS n, MIN(vec_id) AS m FROM embeddings))))),
       |fine AS (
       |  SELECT vec_id AS rlabel, embedding AS cvec FROM embeddings, p
       |  WHERE vec_id % p.stride = p.rf),
       |coarse AS (
       |  SELECT vec_id AS rlabel, embedding AS cvec FROM embeddings, p
       |  WHERE vec_id % p.cstride = p.rc),
       |f2c AS (
       |  SELECT rlabel AS fid, cvec AS fvec, crl AS cell FROM (
       |    SELECT f.rlabel, f.cvec, c.rlabel AS crl,
       |           row_number() OVER (PARTITION BY f.rlabel
       |             ORDER BY ${cosSql("f.cvec", "c.cvec")} DESC, c.rlabel) AS rn
       |    FROM fine f CROSS JOIN coarse c)
       |  WHERE rn = 1),
       |v2c AS (
       |  SELECT vec_id, embedding, crl AS cell FROM (
       |    SELECT e.vec_id, e.embedding, c.rlabel AS crl,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN coarse c)
       |  WHERE rn = 1),
       |assigned AS (
       |  SELECT vec_id, embedding, fid AS cluster FROM (
       |    SELECT v.vec_id, v.embedding, f.fid,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${cosSql("v.embedding", "f.fvec")} DESC, f.fid) AS rn
       |    FROM v2c v JOIN f2c f ON v.cell = f.cell)
       |  WHERE rn = 1),
       |dropped AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.2)
       |SELECT a.vec_id, a.cluster FROM assigned a
       |LEFT JOIN dropped d ON a.vec_id = d.vec_id
       |WHERE d.vec_id IS NULL
       |""".stripMargin

  /** IVF after TWO full Lloyd iterations (Similarity.lloydIterate) —
    * proves the iterative refinement loop is oracle-exact end to end,
    * not just spec-monotone: integer-quantized centroid sums keep every
    * iteration engine-identical, so even the second-round assignment
    * (centroids of centroids' clusters) hash-matches DuckDB. */
  def annIvfLloyd2(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val refined = Similarity.lloydIterate(emb, 2)
    val assigned = refined.select(col("vec_id"), col("embedding"),
      col("label").as("cluster"))
    Similarity.ivfTopK(assigned, assigned.filter(col("vec_id") < 30), k = 3)
  }

  val annIvfLloyd2Oracle: String =
    s"""WITH comp1 AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent1 AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp1 GROUP BY 1),
       |a1 AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN cent1 r)
       |  WHERE rn = 1),
       |comp2 AS (
       |  SELECT cluster AS label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM a1, range(0,64) t(i) GROUP BY 1, 2),
       |cent2 AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp2 GROUP BY 1),
       |a2 AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, r.rlabel,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |    FROM embeddings e CROSS JOIN cent2 r)
       |  WHERE rn = 1),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.cluster,
       |         ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM a2 q JOIN a2 c
       |    ON q.cluster = c.cluster AND q.vec_id < 30 AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cluster, cos, rank FROM (
       |  SELECT qid, nid, cluster, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |""".stripMargin

  val annIvfProbe2Oracle: String =
    s"""WITH comp AS (
       |  SELECT label, i,
       |         SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1048576) AS BIGINT)) AS s
       |  FROM embeddings, range(0,64) t(i) GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS rlabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cvec
       |  FROM comp GROUP BY 1),
       |ranked AS (
       |  SELECT e.vec_id, e.embedding, r.rlabel,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosSql("e.embedding", "r.cvec")} DESC, r.rlabel) AS rn
       |  FROM embeddings e CROSS JOIN cent r),
       |corpus AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM ranked WHERE rn = 1),
       |queries AS (
       |  SELECT vec_id, embedding, rlabel AS cluster FROM ranked
       |  WHERE rn <= 2 AND vec_id < 30),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.cluster,
       |         ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM queries q JOIN corpus c
       |    ON q.cluster = c.cluster AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cluster, cos, rank FROM (
       |  SELECT qid, nid, cluster, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 3
       |""".stripMargin

  // -------------------------------------------------------------------
  // Window-function battery beyond row_number (§2.6 depth): per-article
  // weekly series with lag delta, running cumulative total, and
  // per-site dense rank of article volumes.
  // -------------------------------------------------------------------
  def windowFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") < 200)
      .groupBy(col("l_partkey").as("article"),
        date_trunc("week", col("l_shipdate")).cast(DateType).as("wk"))
      .agg(dsum(col("l_quantity")).as("qty"))
    val series = Window.partitionBy(col("article")).orderBy(col("wk"))
    weekly
      .withColumn("prev_qty", lag(col("qty"), 1).over(series))
      .withColumn("wow_delta", col("qty") - coalesce(lag(col("qty"), 1).over(series), lit(0.0)))
      .withColumn("running_qty",
        sum(col("qty")).over(series.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("wk_rank",
        dense_rank().over(Window.partitionBy(col("article")).orderBy(col("qty").desc, col("wk"))))
  }

  val windowFunctionsOracle: String =
    """WITH weekly AS (
      |  SELECT l_partkey AS article,
      |         CAST(date_trunc('week', l_shipdate) AS DATE) AS wk,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |  FROM lineitem WHERE l_partkey < 200 GROUP BY 1, 2)
      |SELECT article, wk, qty,
      |       lag(qty) OVER w AS prev_qty,
      |       qty - COALESCE(lag(qty) OVER w, 0.0) AS wow_delta,
      |       SUM(qty) OVER (PARTITION BY article ORDER BY wk
      |                      ROWS UNBOUNDED PRECEDING) AS running_qty,
      |       dense_rank() OVER (PARTITION BY article ORDER BY qty DESC, wk) AS wk_rank
      |FROM weekly
      |WINDOW w AS (PARTITION BY article ORDER BY wk)
      |""".stripMargin

  // -------------------------------------------------------------------
  // Exact percentile profile (interpolated, deterministic on exact
  // decimal-cast inputs) — the NVARCHAR-sizing/profiling analog for
  // numeric distributions.
  // -------------------------------------------------------------------
  def percentileProfile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .withColumn("q", col("l_quantity").cast(D).cast(DoubleType))
      .groupBy(col("l_suppkey").as("site"))
      .agg(
        expr("percentile(q, 0.5)").as("median_qty"),
        expr("percentile(q, 0.95)").as("p95_qty"),
        min(col("q")).as("min_qty"), max(col("q")).as("max_qty"))

  val percentileProfileOracle: String =
    """SELECT l_suppkey AS site,
      |       quantile_cont(q, 0.5) AS median_qty,
      |       quantile_cont(q, 0.95) AS p95_qty,
      |       MIN(q) AS min_qty, MAX(q) AS max_qty
      |FROM (SELECT l_suppkey, CAST(CAST(l_quantity AS DECIMAL(18,6)) AS DOUBLE) AS q
      |      FROM lineitem)
      |GROUP BY 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // Curation cleaners: HTML strip + PII mask + URL count over
  // deterministically constructed noisy text (the corpus is clean, so
  // noise is synthesized from doc fields — same construction in the
  // oracle).
  // -------------------------------------------------------------------
  def textCleaners(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.TextAnalysis
    val noisy = concat(
      lit("<p>"), substring(col("text"), 1, 40), lit("</p> contact "),
      col("source"), lit("@example.com or 555-867-"),
      lpad((col("doc_id") % 10000).cast(StringType), 4, "0"),
      lit(" see https://docs.example.com/"), col("source"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        TextAnalysis.stripHtml(noisy).as("no_html"),
        TextAnalysis.maskPii(noisy).as("masked"),
        TextAnalysis.urlCount(noisy).as("urls"))
  }

  val textCleanersOracle: String =
    """WITH noisy AS (
      |  SELECT doc_id,
      |         '<p>' || substring(text, 1, 40) || '</p> contact ' || source
      |           || '@example.com or 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |           || ' see https://docs.example.com/' || source AS s
      |  FROM documents)
      |SELECT doc_id,
      |       regexp_replace(s, '<[^>]+>', ' ', 'g') AS no_html,
      |       regexp_replace(regexp_replace(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |                      '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS masked,
      |       len(regexp_extract_all(s, 'https?://[^\s]+')) AS urls
      |FROM noisy
      |""".stripMargin

  // -------------------------------------------------------------------
  // Semi-join (the positive twin of J4's anti-join) + INTERSECT/EXCEPT
  // set operations on article key sets.
  // -------------------------------------------------------------------
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val moved = Tables.lineitem(spark, sfDir).filter(col("l_suppkey") < 5)
      .select(col("l_partkey").as("p_partkey"))
    Tables.part(spark, sfDir)
      .join(moved, Seq("p_partkey"), "left_semi")
      .select(col("p_partkey").as("article"), col("p_brand").as("brand"))
  }

  val semiJoinOracle: String =
    """SELECT p_partkey AS article, p_brand AS brand FROM part p
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_partkey = p.p_partkey AND l.l_suppkey < 5)
      |""".stripMargin

  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val early = li.filter(to_date(col("l_shipdate")) < to_date(lit("1994-01-01")))
      .select(col("l_partkey").as("article"))
    val late = li.filter(to_date(col("l_shipdate")) >= to_date(lit("1997-01-01")))
      .select(col("l_partkey").as("article"))
    early.intersect(late).withColumn("op", lit("both"))
      .unionByName(early.except(late).withColumn("op", lit("early_only")))
  }

  val setOpsOracle: String =
    """WITH early AS (SELECT l_partkey AS article FROM lineitem
      |               WHERE CAST(l_shipdate AS DATE) < DATE '1994-01-01'),
      |late AS (SELECT l_partkey AS article FROM lineitem
      |         WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01')
      |SELECT article, 'both' AS op FROM (SELECT article FROM early INTERSECT SELECT article FROM late)
      |UNION ALL
      |SELECT article, 'early_only' AS op FROM (SELECT article FROM early EXCEPT SELECT article FROM late)
      |""".stripMargin

  // -------------------------------------------------------------------
  // Cube aggregation with grouping_id: all 4 grouping combinations of
  // (returnflag, linestatus) plus which-dimensions-aggregated marker.
  // -------------------------------------------------------------------
  def salesCube(spark: SparkSession, sfDir: String): DataFrame =
    // the cube's Expand (4 grouping sets per row) + partial aggregate
    // ran inside the single scan task — fan out on a deterministic
    // high-cardinality key (Widen scaladoc); the tiny per-set partial
    // states still combine map-side before one exchange
    graft.ops.Widen.byKeys(Tables.lineitem(spark, sfDir),
        expansion = 4, col("l_orderkey"), col("l_linenumber"))
      .cube(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("qty"))

  val salesCubeOracle: String =
    """SELECT l_returnflag AS rf, l_linestatus AS ls,
      |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |""".stripMargin

  // -------------------------------------------------------------------
  // Calendar densification (date spine / gap fill) — the weekly-report
  // continuity op: a report over a sparse fact stream must show EVERY
  // week for every site, zero-filled where nothing moved (the reference's
  // weekly outputs assume it implicitly; pandas gets it via reindex).
  // Spine = sites x generated week sequence — the site side is a small
  // dim (broadcast), the week sequence is one generated array, so the
  // spine costs no shuffle; the measures join is the only exchange.
  // -------------------------------------------------------------------
  def dateSpine(spark: SparkSession, sfDir: String): DataFrame = {
    val sites = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") < 10).select(col("s_suppkey").as("site"))
    val weeks = spark.range(1)
      .select(explode(expr(
        "sequence(to_date('1996-01-01'), to_date('1996-06-24'), interval 7 day)"))
        .as("week"))
    val spine = sites.crossJoin(broadcast(weeks))
    val qty = Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") < 10)
      .withColumn("week", date_trunc("week", col("l_shipdate")).cast(DateType))
      .filter(col("week").between(
        to_date(lit("1996-01-01")), to_date(lit("1996-06-24"))))
      .groupBy(col("l_suppkey").as("site"), col("week"))
      .agg(dsum(col("l_quantity")).as("qty"))
    spine.join(qty, Seq("site", "week"), "left")
      .withColumn("qty", coalesce(col("qty"), lit(0.0)))
  }

  val dateSpineOracle: String =
    """WITH sites AS (SELECT s_suppkey AS site FROM supplier WHERE s_suppkey < 10),
      |weeks AS (SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-06-24',
      |                 INTERVAL 7 DAY)) AS week),
      |spine AS (SELECT site, CAST(week AS DATE) AS week FROM sites CROSS JOIN weeks),
      |qty AS (
      |  SELECT l_suppkey AS site, CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |  FROM lineitem
      |  WHERE l_suppkey < 10
      |    AND CAST(date_trunc('week', l_shipdate) AS DATE)
      |        BETWEEN DATE '1996-01-01' AND DATE '1996-06-24'
      |  GROUP BY 1, 2)
      |SELECT s.site, s.week, COALESCE(q.qty, 0.0) AS qty
      |FROM spine s LEFT JOIN qty q ON s.site = q.site AND s.week = q.week
      |""".stripMargin

  // -------------------------------------------------------------------
  // Percentile outlier trim — the numeric-cleaning op: per group,
  // compute exact interpolated p01/p99 and report how many rows the
  // trim keeps vs drops. Two passes by necessity (the bounds must see
  // the whole group before any row can be judged); the bounds table is
  // one row per group, so the second pass is a broadcast join — no
  // second shuffle of the fact stream.
  // -------------------------------------------------------------------
  def outlierTrim(spark: SparkSession, sfDir: String): DataFrame = {
    // The percentile partial aggregate buffers every value (3 groups, no
    // map-side reduction) and ran inside the single scan task at sf0.1;
    // fan out at the priced width on a deterministic high-cardinality
    // hash key (guide §2.5 — NOT round-robin, whose retry-safety sort
    // cost ~0.4 s inside the single scan task) so the buffering and the
    // between-bounds count pass parallelize (percentile's value-count
    // merge is order-independent, so rows are unchanged)
    val v = graft.ops.Widen.byKeys(
      Tables.lineitem(spark, sfDir),
      expansion = 8, col("l_orderkey"), col("l_linenumber"))
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast(D).cast(DoubleType).as("v"))
    val bounds = v.groupBy("flag")
      .agg(expr("percentile(v, 0.01)").as("lo"), expr("percentile(v, 0.99)").as("hi"))
    v.join(broadcast(bounds), "flag")
      .groupBy("flag")
      .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        count(when(col("v").between(col("lo"), col("hi")), 1)).as("n_kept"),
        count(when(col("v") < col("lo") || col("v") > col("hi"), 1)).as("n_dropped"))
  }

  val outlierTrimOracle: String =
    """WITH v AS (SELECT l_returnflag AS flag,
      |                  CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS DOUBLE) AS v
      |           FROM lineitem),
      |b AS (SELECT flag, quantile_cont(v, 0.01) AS lo, quantile_cont(v, 0.99) AS hi
      |      FROM v GROUP BY 1)
      |SELECT v.flag, MIN(b.lo) AS lo, MIN(b.hi) AS hi,
      |       COUNT(CASE WHEN v.v BETWEEN b.lo AND b.hi THEN 1 END) AS n_kept,
      |       COUNT(CASE WHEN v.v < b.lo OR v.v > b.hi THEN 1 END) AS n_dropped
      |FROM v JOIN b ON v.flag = b.flag
      |GROUP BY 1
      |""".stripMargin

  /** The same cluster fixpoint via large-star/small-star contraction —
    * the O(log n)-round 100 TB path, under the same oracle. */
  def dedupClustersStar(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Dedup.connectedComponentsStar(
      embeddingNeardup(spark, sfDir).select("d1", "d2"), "d1", "d2")

  // -------------------------------------------------------------------
  // Equal-width histogram — the data-profiling op behind skew detection
  // and bucket sizing: counts per fixed-width value bucket per group.
  // Exact floor-division bucketing (no engine-specific histogram
  // functions), one partial+final hash agg.
  // -------------------------------------------------------------------
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val width = 10000.0
    val v = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast(D).cast(DoubleType).as("v"))
    v.withColumn("bucket", floor(col("v") / lit(width)).cast("long"))
      .groupBy("flag", "bucket")
      .agg(count(lit(1)).as("n"),
        (min(col("bucket")) * width).as("lo"),
        ((min(col("bucket")) + 1) * width).as("hi"))
  }

  val valueHistogramOracle: String =
    """WITH v AS (SELECT l_returnflag AS flag,
      |                  CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS DOUBLE) AS v
      |           FROM lineitem)
      |SELECT flag, bucket, COUNT(*) AS n,
      |       MIN(bucket) * 10000.0 AS lo, (MIN(bucket) + 1) * 10000.0 AS hi
      |FROM (SELECT flag, CAST(FLOOR(v / 10000.0) AS BIGINT) AS bucket, v FROM v)
      |GROUP BY 1, 2
      |""".stripMargin

  // -------------------------------------------------------------------
  // SCD2 interval build: each order becomes a version row valid from its
  // date until the customer's next order (NULL = current). The lead()
  // window is the semantically-required plan — interval building needs
  // neighbor order — and costs one shuffle on the key plus a sort that
  // AQE sizes; (o_orderdate, o_orderkey) is a total order per customer
  // so the intervals are deterministic.
  // -------------------------------------------------------------------
  def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sfDir)
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
      col("o_custkey").as("custkey"),
      col("o_orderkey").as("orderkey"),
      col("o_orderdate").as("valid_from"),
      lead(col("o_orderdate"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  val scd2IntervalsOracle: String =
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |       CAST(o_orderdate AS DATE) AS valid_from,
      |       lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |         ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS valid_to,
      |       lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |         ORDER BY CAST(o_orderdate AS DATE), o_orderkey) IS NULL AS is_current
      |FROM orders
      |""".stripMargin

  // -------------------------------------------------------------------
  // Skew-salted join, oracle-checked end-to-end: result rows are
  // identical to the plain equi-join (salting only changes row
  // placement), proven against the unsalted oracle SQL. The aggregate on
  // top keeps the checked output bounded.
  // -------------------------------------------------------------------
  def saltedJoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val dim = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.ops.Relational.saltedJoin(dim, Seq("l_orderkey"), 4)(li)
      .groupBy(col("o_orderpriority"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
  }

  val saltedJoinAggOracle: String =
    """SELECT o_orderpriority,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // Unpivot/melt (wide -> long reshape): the inverse of the pivot the
  // event_pivot query covers. Map-only — Spark's Expand emits one long
  // row per measure with no shuffle, so it scales linearly with input.
  // -------------------------------------------------------------------
  def unpivotLong(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")

  val unpivotLongOracle: String =
    """SELECT l_orderkey, l_linenumber, measure, value
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
      |      FROM lineitem WHERE l_orderkey < 1000)
      |UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
      |""".stripMargin

  // -------------------------------------------------------------------
  // Explicit GROUPING SETS (the general form behind rollup/cube): two
  // one-dimension totals plus the grand total in ONE pass — Expand emits
  // 3 rows per input into a single partial+final hash agg, vs 3 scans
  // for the union-of-group-bys a naive port would write.
  // -------------------------------------------------------------------
  def groupingSetsAgg(spark: SparkSession, sfDir: String): DataFrame =
    // same Expand fan-out as salesCube
    graft.ops.Widen.byKeys(Tables.lineitem(spark, sfDir),
        expansion = 4, col("l_orderkey"), col("l_linenumber"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("qty"))
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("gid"), col("n"), col("qty"))

  val groupingSetsAggOracle: String =
    """SELECT l_returnflag AS rf, l_linestatus AS ls,
      |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |""".stripMargin

  // -------------------------------------------------------------------
  // RANGE-frame rolling window: 7-day trailing quantity per article over
  // its daily aggregate. The frame is value-based (epoch days), so gaps
  // in the calendar shrink the frame instead of silently widening it the
  // way a ROWS frame would. Decimal inside the frame sum keeps the
  // result order-independent and oracle-exact.
  // -------------------------------------------------------------------
  def rolling7d(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") < 200)
      .groupBy(col("l_partkey").as("article"),
        to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_quantity").cast(D)).as("qty_dec"))
    val w = Window.partitionBy(col("article"))
      .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("qty7", sum(col("qty_dec")).over(w).cast(DoubleType))
      .select(col("article"), col("day"),
        col("qty_dec").cast(DoubleType).as("qty"), col("qty7"))
  }

  val rolling7dOracle: String =
    """WITH daily AS (
      |  SELECT l_partkey AS article, CAST(l_shipdate AS DATE) AS day,
      |         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty_dec
      |  FROM lineitem WHERE l_partkey < 200 GROUP BY 1, 2)
      |SELECT article, day, CAST(qty_dec AS DOUBLE) AS qty,
      |       CAST(SUM(qty_dec) OVER (PARTITION BY article
      |         ORDER BY day - DATE '1970-01-01'
      |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty7
      |FROM daily
      |""".stripMargin

  // -------------------------------------------------------------------
  // Heavy-hitter detection — the diagnostic that decides WHEN to salt a
  // join/agg key: the 10 hottest keys with their row counts and global
  // share. Planned as count-per-key then a single global graft_topk —
  // each task ships one 10-pair heap, so there is NO global sort and no
  // single-reducer ORDER BY ... LIMIT bottleneck at any key cardinality.
  // -------------------------------------------------------------------
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftExpressions.topKBy
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("n"))
    // total = sum of the per-key counts: one lineitem scan, not two
    counts
      .agg(topKBy(col("n").cast(DoubleType), col("key"), 10).as("top"),
        sum(col("n")).as("total"))
      .select(col("total"), posexplode(col("top")))
      .select(col("col.id").as("key"), col("col.score").cast("long").as("n"),
        (col("pos") + 1).cast("int").as("rank"),
        (col("col.score") / col("total").cast(DoubleType)).as("share"))
  }

  val heavyHittersOracle: String =
    """WITH c AS (SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |t AS (SELECT COUNT(*) AS total FROM lineitem)
      |SELECT key, n,
      |       CAST(row_number() OVER (ORDER BY n DESC, key) AS INTEGER) AS rank,
      |       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
      |FROM c CROSS JOIN t
      |QUALIFY rank <= 10
      |""".stripMargin

  // -------------------------------------------------------------------
  // Moment-based statistics with EXACT accumulation: Pearson correlation
  // per group from INTEGER sums (n, Σx, Σy, Σxy, Σx², Σy²) — x = the
  // integral quantity, y = the discount in CENTS (both exact by the
  // data's own shape; correlation is affine-invariant, so the ×100
  // changes nothing). The built-in corr() accumulates doubles in
  // partition order and is not reproducible across partitionings; the
  // previous DECIMAL form was order-free too but hit the engines'
  // decimal→double CAST disagreement in the last ULP once sums outgrow
  // 2^53 (the r15 sf0.1 probe's one residual). Int64 sums keep the
  // MOMENTS exact to astronomic scale, and int64→double conversion is
  // the HARDWARE correctly-rounded one in every engine — so the only FP
  // ops are IEEE divisions/sqrts of identical doubles: bit-identical on
  // any cluster layout, at any gate scale, and to the DuckDB oracle.
  // One partial+final hash agg, as before.
  //
  // ENVELOPE (the r16 verdict's unwritten boundary, now written AND
  // enforced): the COMBINE terms (n·Σx², Σx·Σx, …) grow quadratically
  // with group size — at this data's shape (x ≤ 50, so Σx² ≤ 2500·n)
  // they cross int64 near n ≈ 6×10⁷ rows per group (~TPC-H sf30).
  // Spark's Long multiply wraps SILENTLY past that while DuckDB errors,
  // so an unguarded combine would diverge from the oracle with no
  // symptom. [[corrFromMoments]] therefore checks each product exactly
  // (a·b overflows iff a > Long.Max/b for positive longs — three
  // comparisons per GROUP, post-aggregation, i.e. free) and refuses
  // loudly with the widen-or-pre-aggregate remedy instead of emitting a
  // wrapped correlation. Within the envelope nothing changed:
  // bit-identical to DuckDB, spec-pinned at the boundary
  // (CoverageQueriesSpec).
  // -------------------------------------------------------------------
  def corrStats(spark: SparkSession, sfDir: String): DataFrame = {
    val x = round(col("l_quantity")).cast(LongType)
    val y = round(col("l_discount") * 100).cast(LongType)
    corrFromMoments(
      Tables.lineitem(spark, sfDir)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy")))
  }

  /** True iff `a * b` stays inside int64 — EXACT via ANSI try_multiply
    * (Math.multiplyExact under the hood: null iff the product wraps).
    * NOT a floor-division comparison: Spark's `/` on longs is DOUBLE
    * division, whose rounding opens a ~ulp-wide false-accept band at
    * every divisor (e.g. a=2^62, b=2 reads as fitting because
    * Long.MaxValue rounds up to 2^63) — the silent wrap this guard
    * exists to prevent. */
  private def mulFits(a: org.apache.spark.sql.Column,
                      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    try_multiply(a, b).isNotNull

  /** The guarded moment combine behind [[corrStats]]: takes the exact
    * integer moments (flag, n, sx, sy, sxy, sxx, syy) — all
    * NON-NEGATIVE by the caller's data shape — and emits
    * (flag, n, corr_qty_disc). Every int64 product in the combine
    * (n·sxy, n·sxx, n·syy, sx·sy, sx·sx, sy·sy) is checked exactly
    * before it is trusted; a group past the envelope raises
    * (house-style loud refusal naming the group and the remedy) rather
    * than wrapping silently. The checks run on the post-aggregation
    * frame — one row per group — so the guard costs nothing at any
    * corpus scale. */
  private[graft] def corrFromMoments(moments: DataFrame): DataFrame = {
    val fits = mulFits(col("n"), col("sxy")) && mulFits(col("n"), col("sxx")) &&
      mulFits(col("n"), col("syy")) && mulFits(col("sx"), col("sy")) &&
      mulFits(col("sx"), col("sx")) && mulFits(col("sy"), col("sy"))
    // try_multiply is null BOTH on overflow and on a null operand; a
    // NULL moment (all-null group under sum()) must emit the null
    // correlation the unguarded expression would, not a misattributed
    // overflow refusal — so null inputs short-circuit first
    val anyNull = col("n").isNull || col("sx").isNull || col("sy").isNull ||
      col("sxy").isNull || col("sxx").isNull || col("syy").isNull
    moments.select(col("flag"), col("n"),
      when(anyNull, lit(null).cast(DoubleType))
      .when(fits,
        (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
          / sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType)))
        .otherwise(raise_error(concat(
          lit("corrStats: int64 moment combine would overflow for group "),
          col("flag").cast(StringType),
          lit(" (n="), col("n").cast(StringType),
          lit(") — past the ~6e7-rows-per-group exactness envelope; "),
          lit("pre-aggregate per sub-key and combine the moments, or "),
          lit("widen the combine to DECIMAL(38,0) accepting the "),
          lit("decimal->double last-ULP cast divergence vs DuckDB")))
          .cast(DoubleType))
        .as("corr_qty_disc"))
  }

  val corrStatsOracle: String =
    """WITH m AS (
      |  SELECT l_returnflag AS flag, COUNT(*) AS n,
      |         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
      |         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
      |         CAST(SUM(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy,
      |         CAST(SUM(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
      |         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT flag, n,
      |       CAST(n * sxy - sx * sy AS DOUBLE)
      |         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |         / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_disc
      |FROM m
      |""".stripMargin

  // -------------------------------------------------------------------
  // Per-key least-squares trend (weekly quantity slope per article) from
  // the same exact-moment machinery: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
  // with x = integer week index, y = decimal weekly quantity. Two
  // partial+final hash aggs ((article, week) then article); the division
  // is the only FP op, so the slope hash-matches DuckDB exactly.
  // -------------------------------------------------------------------
  def trendSlope(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") < 500)
      .groupBy(col("l_partkey").as("article"),
        floor(datediff(to_date(col("l_shipdate")), lit("1996-01-01").cast("date"))
          / 7).cast("long").as("wk"))
      .agg(sum(col("l_quantity").cast(D)).as("qty"))
    weekly.groupBy(col("article"))
      .agg(count(lit(1)).as("n"),
        sum(col("wk")).as("sx"), sum(col("qty")).as("sy"),
        sum(col("wk") * col("qty")).as("sxy"),
        sum(col("wk") * col("wk")).as("sxx"))
      .filter(col("n") > 1)
      .select(col("article"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
          .as("slope"))
  }

  val trendSlopeOracle: String =
    """WITH weekly AS (
      |  SELECT l_partkey AS article,
      |         CAST(FLOOR((CAST(l_shipdate AS DATE) - DATE '1996-01-01') / 7) AS BIGINT) AS wk,
      |         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      |  FROM lineitem WHERE l_partkey < 500 GROUP BY 1, 2),
      |m AS (
      |  SELECT article, COUNT(*) AS n, SUM(wk) AS sx, SUM(qty) AS sy,
      |         SUM(wk * qty) AS sxy, SUM(wk * wk) AS sxx
      |  FROM weekly GROUP BY 1)
      |SELECT article, n,
      |       CAST(n * sxy - sx * sy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
      |FROM m WHERE n > 1
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corr_stats" -> (corrStats _),
    "trend_slope" -> (trendSlope _),
    "heavy_hitters" -> (heavyHitters _),
    "grouping_sets_agg" -> (groupingSetsAgg _),
    "rolling_7d" -> (rolling7d _),
    "scd2_intervals" -> (scd2Intervals _),
    "salted_join" -> (saltedJoinAgg _),
    "unpivot_long" -> (unpivotLong _),
    "date_spine" -> (dateSpine _),
    "outlier_trim" -> (outlierTrim _),
    "value_histogram" -> (valueHistogram _),
    "dedup_clusters_star" -> (dedupClustersStar _),
    "ann_ivf" -> (annIvf _),
    "window_functions" -> (windowFunctions _),
    "percentile_profile" -> (percentileProfile _),
    "text_cleaners" -> (textCleaners _),
    "semi_join" -> (semiJoin _),
    "set_ops" -> (setOps _),
    "sales_cube" -> (salesCube _),
    "update_join" -> (updateJoin _),
    "schema_align" -> (schemaAlignQuery _),
    "ann_ivf_kmeans" -> (annIvfKmeans _),
    "semdedup" -> (semDedup _),
    "semdedup_auto" -> (semDedupAuto _),
    "ann_ivf_lloyd2" -> (annIvfLloyd2 _),
    "ann_ivf_probe2" -> (annIvfProbe2 _),
    "ann_ivf_pq" -> (annIvfPq _),
    "ann_index_lifecycle" -> (annIndexLifecycle _),
    "ann_lifecycle_probe2" -> (annLifecycleProbe2 _),
    "ann_drift_stats" -> (annDriftStatsQuery _),
    "ann_drift_sampled" -> (annDriftSampled _),
    "ann_drift_alerts" -> (annDriftAlerts _),
    "ann_layout_alerts" -> (annLayoutAlerts _),
    "ann_layout_volume" -> (annLayoutVolume _),
    "ann_cell_stats" -> (annCellStats _),
    "ann_binary_rerank" -> (annBinaryRerank _),
    "ann_binary_lifecycle" -> (annBinaryLifecycle _),
    "ann_binary_pruned" -> (annBinaryPruned _),
    "ann_binary_fetch" -> (annBinaryFetch _),
    "ann_binary_prepared" -> (annBinaryPrepared _),
    "ann_prepared" -> (annPrepared _),
    "ann_prepared_auto" -> (annPreparedAuto _),
    "ann_recell" -> (annRecell _),
    "ann_recall" -> (annRecall _),
    "ann_recall_sampled" -> (annRecallSampled _),
    "ann_binary_recall" -> (annBinaryRecall _),
    "ann_cell_scaleup" -> (annCellScaleup _),
    "range_exclusion" -> (rangeExclusion _),
    "sales_rollup" -> (salesRollup _),
    "term_frequency" -> (termFrequency _),
    "embedding_neardup" -> (embeddingNeardup _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_apply" -> (dedupApply _),
    "fuzzy_pairs" -> (fuzzyPairs _),
    "fuzzy_pairs2" -> (fuzzyPairs2 _),
    "fuzzy_join" -> (fuzzyJoinQuery _),
    "xlsx_roundtrip" -> (xlsxRoundtrip _),
  )

  val oracles: Map[String, String] = Map(
    "corr_stats" -> corrStatsOracle,
    "trend_slope" -> trendSlopeOracle,
    "heavy_hitters" -> heavyHittersOracle,
    "grouping_sets_agg" -> groupingSetsAggOracle,
    "rolling_7d" -> rolling7dOracle,
    "scd2_intervals" -> scd2IntervalsOracle,
    "salted_join" -> saltedJoinAggOracle,
    "unpivot_long" -> unpivotLongOracle,
    "ann_ivf" -> annIvfOracle,
    "window_functions" -> windowFunctionsOracle,
    "percentile_profile" -> percentileProfileOracle,
    "text_cleaners" -> textCleanersOracle,
    "semi_join" -> semiJoinOracle,
    "set_ops" -> setOpsOracle,
    "sales_cube" -> salesCubeOracle,
    "date_spine" -> dateSpineOracle,
    "outlier_trim" -> outlierTrimOracle,
    "value_histogram" -> valueHistogramOracle,
    "dedup_clusters_star" -> dedupClustersOracle, // same fixpoint, O(log n) rounds
    "update_join" -> updateJoinOracle,
    "schema_align" -> schemaAlignOracle,
    "ann_ivf_kmeans" -> annIvfKmeansOracle,
    "semdedup" -> semDedupOracle,
    "semdedup_auto" -> semDedupAutoOracle,
    "ann_ivf_lloyd2" -> annIvfLloyd2Oracle,
    "ann_ivf_probe2" -> annIvfProbe2Oracle,
    "ann_ivf_pq" -> annIvfPqOracle,
    "ann_index_lifecycle" -> annIvfPqOracle,
    "ann_lifecycle_probe2" -> annIvfPqProbe2Oracle,
    "ann_drift_stats" -> annDriftOracle,
    "ann_drift_sampled" -> annDriftSampledOracle,
    "ann_drift_alerts" -> annDriftAlertsOracle,
    "ann_layout_alerts" -> annLayoutAlertsOracle,
    "ann_layout_volume" -> annLayoutVolumeOracle,
    "ann_cell_stats" -> annCellStatsOracle,
    "ann_binary_rerank" -> annBinaryRerankOracle,
    "ann_binary_lifecycle" -> annBinaryRerankOracle,
    "ann_binary_pruned" -> annBinaryPrunedOracle,
    "ann_binary_fetch" -> annBinaryRerankOracle, // pruned fetch must be hash-invisible
    "ann_binary_prepared" -> annBinaryPrunedOracle, // handle must be hash-invisible
    "ann_prepared" -> annIvfPqProbe2Oracle, // handle must be hash-invisible
    "ann_prepared_auto" -> annIvfPqProbe2Oracle, // AUTO local path likewise
    "ann_recell" -> annIvfPqProbe2Oracle, // recell must be hash-invisible
    "ann_recall" -> annRecallOracle,
    "ann_recall_sampled" -> annRecallSampledOracle,
    "ann_binary_recall" -> annBinaryRecallOracle,
    "ann_cell_scaleup" -> annCellScaleupOracle,
    "range_exclusion" -> rangeExclusionOracle,
    "sales_rollup" -> salesRollupOracle,
    "term_frequency" -> termFrequencyOracle,
    "embedding_neardup" -> embeddingNeardupOracle,
    "dedup_clusters" -> dedupClustersOracle,
    "dedup_apply" -> dedupApplyOracle,
    "fuzzy_pairs" -> fuzzyPairsOracle,
    "fuzzy_pairs2" -> fuzzyPairs2Oracle,
    "fuzzy_join" -> fuzzyJoinOracle,
    "xlsx_roundtrip" -> xlsxRoundtripOracle,
  )
}
