package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.ops.{Dedup, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The LLM-training-data operator surface (BASELINE.json north star):
  * exact + near-duplicate detection (MinHash-LSH, SimHash, n-gram
  * Jaccard), embedding similarity search (brute-force + sign-LSH), and
  * text analysis (language ID, quality scoring, token counting,
  * fingerprinting) — all oracle-checked against DuckDB on the driver's
  * `documents` / `embeddings` tables.
  *
  * Cross-engine determinism:
  *   - all hashing is md5-derived 32-bit ints (hash32) + LCG mixes —
  *     bit-identical in DuckDB;
  *   - double folds (dot products, norms) are sequential left folds,
  *     matching DuckDB's list_reduce exactly;
  *   - ratios are single divisions of exact integer counts.
  */
object LlmQueries {

  private val D = DecimalType(18, 6)

  // Shared SQL fragments for the oracles -------------------------------

  /** tokens CTE body: lowercase alnum token list per doc. */
  private val tokSql =
    """SELECT doc_id, lang, source, text,
      |       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      |FROM documents""".stripMargin

  /** 3-token shingle list + distinct set + hash32 list, on top of toks. */
  private def shingleSql(n: Int) =
    s"""SELECT doc_id,
       |       CASE WHEN len(t) >= $n
       |            THEN list_transform(range(0, len(t)-${n - 1}),
       |                   i -> array_to_string(list_slice(t, i+1, i+$n), ' '))
       |            ELSE CAST([] AS VARCHAR[]) END AS s
       |FROM toks""".stripMargin

  private val hashSql =
    """SELECT doc_id,
      |       list_transform(s, x -> CAST(('0x' || substring(md5(x),1,8)) AS BIGINT)) AS h,
      |       list_distinct(s) AS sd
      |FROM sh""".stripMargin

  /** MinHash signature (k components) via the shared LCG family. */
  private def sigSql(k: Int) =
    s"""SELECT doc_id, sd,
       |       list_transform(range(0,$k), j ->
       |         list_min(list_transform(h, x ->
       |           (x * ((1103515245*(j+1)+12345) % 1073741789 + 1)
       |              + (214013*(j+1)+2531011) % 1073741789) % 4294967311))) AS sig
       |FROM hs""".stripMargin

  // -------------------------------------------------------------------
  // Exact dedup: content-hash keep-first (deterministic keeper).
  // -------------------------------------------------------------------
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactDedupByContent(col("text"), col("doc_id"))(
      Tables.documents(spark, sfDir))
      .select("doc_id", "content_hash", "lang", "source", "n_chars")

  val exactDedupOracle: String =
    """SELECT doc_id, md5(text) AS content_hash, lang, source, n_chars
      |FROM documents
      |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // MinHash + LSH near-dup pipeline: signature (k=16) -> 4x4 banding ->
  // candidate pairs -> signature-estimated + exact shingle Jaccard.
  // -------------------------------------------------------------------
  private val K = 16; private val Bands = 4; private val Rows = 4

  /** Per-bucket member cap on the LSH band join (Dedup.capBuckets): bounds
    * the quadratic blowup a web-scale boilerplate bucket would cause
    * (10^6 members -> 10^12 pairs without it). 1000 is far above any
    * bucket in the testdata corpora (<=5000 docs total), so capped and
    * uncapped plans are oracle-identical there; at 100 TB the cap is the
    * difference between a bounded self-join and a runaway stage. */
  private val LshBucketCap = 1000

  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.select(col("doc_id") +: Dedup.shingled(col("text"), 3): _*)
    val sig = base.select(col("doc_id"), col("shingle_set"),
      Dedup.minhashSig(col("shingle_hashes"), K).as("sig"))

    val banded = sig
      .select(col("doc_id"), Dedup.lshBands(col("sig"), Bands, Rows).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val pairs = Dedup.candidatePairs(
      Dedup.capBuckets("doc_id", LshBucketCap)(banded), "doc_id")

    val x = sig.select(col("doc_id").as("d1"), col("sig").as("sig1"), col("shingle_set").as("sd1"))
    val y = sig.select(col("doc_id").as("d2"), col("sig").as("sig2"), col("shingle_set").as("sd2"))
    pairs.join(x, "d1").join(y, "d2")
      .select(col("d1"), col("d2"),
        Dedup.estJaccard(col("sig1"), col("sig2"), K).as("est_jaccard"),
        Dedup.jaccard(col("sd1"), col("sd2")).as("jaccard"))
  }

  val minhashLshPairsOracle: String =
    s"""WITH toks AS ($tokSql),
       |sh AS (${shingleSql(3)}),
       |hs AS ($hashSql),
       |sig AS (${sigSql(K)}),
       |bands AS (SELECT doc_id, sd, sig, unnest(range(0,$Bands)) AS band FROM sig),
       |keyed AS (
       |  SELECT doc_id, band,
       |         array_to_string(list_slice(sig, band*$Rows+1, band*$Rows+$Rows), ',') AS bkey
       |  FROM bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM keyed a JOIN keyed b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT p.d1, p.d2,
       |       CAST(list_sum(list_transform(range(0,$K),
       |              i -> CASE WHEN x.sig[i+1] = y.sig[i+1] THEN 1 ELSE 0 END)) AS DOUBLE)/$K
       |         AS est_jaccard,
       |       CAST(len(list_filter(x.sd, e -> list_contains(y.sd, e))) AS DOUBLE)
       |         / (len(x.sd) + len(y.sd) - len(list_filter(x.sd, e -> list_contains(y.sd, e))))
       |         AS jaccard
       |FROM pairs p JOIN sig x ON p.d1 = x.doc_id JOIN sig y ON p.d2 = y.doc_id
       |""".stripMargin

  /** Incremental near-dup: a new batch (doc_id % 10 = 7) against the
    * standing corpus via cross-side LSH only (Dedup.candidatePairsAcross)
    * — batch-proportional work against a persisted banded index instead
    * of the corpus-quadratic pair recompute. Corpus buckets capped, batch
    * side left whole (every new doc must be checked). */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.select(col("doc_id") +: Dedup.shingled(col("text"), 3): _*)
    val sig = base.select(col("doc_id"), col("shingle_set"),
      Dedup.minhashSig(col("shingle_hashes"), K).as("sig"))
    val banded = sig
      .select(col("doc_id"), Dedup.lshBands(col("sig"), Bands, Rows).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val isBatch = col("doc_id") % 10 === 7
    val pairs = Dedup.candidatePairsAcross(
      banded.filter(isBatch),
      Dedup.capBuckets("doc_id", LshBucketCap)(banded.filter(!isBatch)), "doc_id")
    val x = sig.select(col("doc_id").as("d_new"), col("sig").as("sig1"), col("shingle_set").as("sd1"))
    val y = sig.select(col("doc_id").as("d_old"), col("sig").as("sig2"), col("shingle_set").as("sd2"))
    pairs.join(x, "d_new").join(y, "d_old")
      .select(col("d_new"), col("d_old"),
        Dedup.estJaccard(col("sig1"), col("sig2"), K).as("est_jaccard"),
        Dedup.jaccard(col("sd1"), col("sd2")).as("jaccard"))
  }

  val dedupIncrementalOracle: String =
    s"""WITH toks AS ($tokSql),
       |sh AS (${shingleSql(3)}),
       |hs AS ($hashSql),
       |sig AS (${sigSql(K)}),
       |bands AS (SELECT doc_id, sd, sig, unnest(range(0,$Bands)) AS band FROM sig),
       |keyed AS (
       |  SELECT doc_id, band,
       |         array_to_string(list_slice(sig, band*$Rows+1, band*$Rows+$Rows), ',') AS bkey
       |  FROM bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS d_new, b.doc_id AS d_old
       |  FROM keyed a JOIN keyed b
       |    ON a.band = b.band AND a.bkey = b.bkey
       |   AND a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7)
       |SELECT p.d_new, p.d_old,
       |       CAST(list_sum(list_transform(range(0,$K),
       |              i -> CASE WHEN x.sig[i+1] = y.sig[i+1] THEN 1 ELSE 0 END)) AS DOUBLE)/$K
       |         AS est_jaccard,
       |       CAST(len(list_filter(x.sd, e -> list_contains(y.sd, e))) AS DOUBLE)
       |         / (len(x.sd) + len(y.sd) - len(list_filter(x.sd, e -> list_contains(y.sd, e))))
       |         AS jaccard
       |FROM pairs p JOIN sig x ON p.d_new = x.doc_id JOIN sig y ON p.d_old = y.doc_id
       |""".stripMargin

  // -------------------------------------------------------------------
  // SimHash fingerprint per document (32-bit, token-level votes).
  // -------------------------------------------------------------------
  def simhashDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        simhash32(transform(tokens(col("text")), hash32 _)).as("simhash"))

  val simhashDocsOracle: String =
    s"""WITH toks AS ($tokSql),
       |hs AS (SELECT doc_id,
       |              list_transform(t, x -> CAST(('0x' || substring(md5(x),1,8)) AS BIGINT)) AS h
       |       FROM toks)
       |SELECT doc_id,
       |       CAST(CASE WHEN len(h) = 0 THEN 0
       |            ELSE list_sum(list_transform(range(0,32), b ->
       |                   CASE WHEN list_sum(list_transform(h, x -> 2*((x >> b) & 1) - 1)) >= 0
       |                        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
       |       END AS BIGINT) AS simhash
       |FROM hs
       |""".stripMargin

  // -------------------------------------------------------------------
  // SimHash near-dup pairs: block on the upper 12 bits, emit pairs with
  // Hamming distance <= 6 (the classic prefix-block Hamming search).
  // -------------------------------------------------------------------
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = simhashDocs(spark, sfDir)
      .withColumn("block", shiftright(col("simhash"), 20))
    val a = fp.select(col("doc_id").as("d1"), col("simhash").as("h1"), col("block"))
    val b = fp.select(col("doc_id").as("d2"), col("simhash").as("h2"), col("block"))
    a.join(b, Seq("block")).filter(col("d1") < col("d2"))
      .withColumn("hamming", Dedup.hamming(col("h1"), col("h2")))
      .filter(col("hamming") <= 6)
      .select("d1", "d2", "h1", "h2", "hamming")
  }

  val simhashPairsOracle: String =
    s"""WITH toks AS ($tokSql),
       |hs AS (SELECT doc_id,
       |              list_transform(t, x -> CAST(('0x' || substring(md5(x),1,8)) AS BIGINT)) AS h
       |       FROM toks),
       |fp AS (
       |  SELECT doc_id,
       |         CAST(CASE WHEN len(h) = 0 THEN 0
       |              ELSE list_sum(list_transform(range(0,32), b ->
       |                     CASE WHEN list_sum(list_transform(h, x -> 2*((x >> b) & 1) - 1)) >= 0
       |                          THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
       |         END AS BIGINT) AS simhash
       |  FROM hs)
       |SELECT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS h1, b.simhash AS h2,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b
       |  ON (a.simhash >> 20) = (b.simhash >> 20) AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
       |""".stripMargin

  // -------------------------------------------------------------------
  // Blocked pairwise 2-gram Jaccard (the quadratic-verify primitive,
  // bounded by residue blocking; at scale the block would be an LSH
  // bucket, as in minhash_lsh_pairs). The block COUNT is corpus-derived
  // — ceil(n/50) blocks keep expected within-block membership at ~50
  // docs, so total pairs stay ~n·25 (LINEAR in the corpus) instead of
  // the n²/B trap a fixed block count walks into at scale. The count
  // rides in as a broadcast one-row aggregate, never a driver collect.
  // -------------------------------------------------------------------
  def ngramJaccardBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.agg(count(lit(1)).as("__n"))
    val sets0 = docs.select(col("doc_id"),
        array_distinct(shingles(tokens(col("text")), 2)).as("sd"))
      .crossJoin(broadcast(n))
      .withColumn("block", col("doc_id") % ceil(col("__n") / lit(50.0)))
    // Pin the pair-join width on task-starved inputs (Widen scaladoc):
    // blocks hold ~50 docs, so the join emits ~25× its input rows and
    // each pair pays an array-intersect Jaccard — AQE's byte-sized
    // coalescing ran the whole stage in ONE task (4.3 s at sf0.1).
    // Both join sides derive from the same pinned frame, so the join
    // reuses the one explicit exchange. Production-scale inputs skip.
    val sets = graft.ops.Widen.byKeys(sets0, expansion = 32, col("block"))
    val a = sets.select(col("doc_id").as("d1"), col("sd").as("sd1"), col("block"))
    val b = sets.select(col("doc_id").as("d2"), col("sd").as("sd2"), col("block"))
    a.join(b, Seq("block")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), Dedup.jaccard(col("sd1"), col("sd2")).as("jaccard"))
  }

  val ngramJaccardBlockedOracle: String =
    s"""WITH toks AS ($tokSql),
       |sh AS (${shingleSql(2)}),
       |sets AS (SELECT doc_id, list_distinct(s) AS sd,
       |         doc_id % CAST(ceil((SELECT count(*) FROM documents) / 50.0) AS BIGINT) AS block FROM sh)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |       CAST(len(list_filter(a.sd, e -> list_contains(b.sd, e))) AS DOUBLE)
       |         / (len(a.sd) + len(b.sd) - len(list_filter(a.sd, e -> list_contains(b.sd, e))))
       |         AS jaccard
       |FROM sets a JOIN sets b ON a.block = b.block AND a.doc_id < b.doc_id
       |""".stripMargin

  // -------------------------------------------------------------------
  // Embedding similarity: brute-force exact cosine top-5 for a 20-vector
  // query set against the full corpus.
  // -------------------------------------------------------------------

  /** Shared oracle CTE: per-pair sequential-fold dot and norms. */
  private val cosPairSql =
    """SELECT q.vec_id AS qid, c.vec_id AS nid,
      |       list_reduce(list_transform(range(0,64),
      |         i -> CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE)),
      |         (acc, x) -> acc + x)
      |       / (sqrt(list_reduce(list_transform(range(0,64),
      |            i -> CAST(q.embedding[i+1] AS DOUBLE) * CAST(q.embedding[i+1] AS DOUBLE)),
      |            (acc, x) -> acc + x))
      |        * sqrt(list_reduce(list_transform(range(0,64),
      |            i -> CAST(c.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE)),
      |            (acc, x) -> acc + x))) AS cos""".stripMargin

  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    Similarity.bruteForceTopK(queries, corpus, 5)
  }

  val cosineTopKOracle: String =
    s"""WITH pairs AS (
       |  $cosPairSql
       |  FROM embeddings q JOIN embeddings c ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT qid, nid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM pairs)
       |WHERE rank <= 5
       |""".stripMargin

  /** Same ranking as `cosine_topk` through the bounded-heap `graft_topk`
    * aggregate instead of a window — the single-exchange, no-sort form a
    * 1000-executor cluster wants (see Similarity.bruteForceTopKAgg). */
  def cosineTopKAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    Similarity.bruteForceTopKAgg(queries, corpus, 5)
  }

  // -------------------------------------------------------------------
  // Sign-LSH ANN: 4-bit coordinate-sign bucket join, top-3 per query —
  // the pruned approximate path.
  // -------------------------------------------------------------------
  def annSignLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    Similarity.signLshTopK(queries, corpus, 4, 3)
  }

  val annSignLshOracle: String =
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |         list_sum(list_transform(range(0,4),
       |           i -> CASE WHEN embedding[i+1] > 0 THEN (1 << i) ELSE 0 END)) AS bucket
       |  FROM embeddings),
       |pairs AS (
       |  $cosPairSql, q.bucket
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < 50 AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT qid, nid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM pairs)
       |WHERE rank <= 3
       |""".stripMargin

  // -------------------------------------------------------------------
  // Multi-probe sign-LSH ANN: 8-bit buckets (4x finer than ann_sign_lsh,
  // so each probe scans ~N/256) with 1-bit-flip probing to recover
  // recall — the production dial for the quadratic-within-bucket concern.
  // -------------------------------------------------------------------
  def annMultiProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    Similarity.signLshMultiProbeTopK(queries, corpus, 8, 3)
  }

  val annMultiProbeOracle: String =
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |         list_sum(list_transform(range(0,8),
       |           i -> CASE WHEN embedding[i+1] > 0 THEN (1 << i) ELSE 0 END)) AS bucket
       |  FROM embeddings),
       |pairs AS (
       |  $cosPairSql
       |  FROM b q JOIN b c
       |    ON bit_count(xor(q.bucket, c.bucket)) <= 1
       |   AND q.vec_id < 50 AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, cos, rank FROM (
       |  SELECT qid, nid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM pairs)
       |WHERE rank <= 3
       |""".stripMargin

  // -------------------------------------------------------------------
  // Language ID: marker-word scores + priority argmax, with accuracy
  // flag against the labeled lang column.
  // -------------------------------------------------------------------
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val t = tokens(col("text"))
    val scored = docs.select(
      Seq(col("doc_id"), col("lang")) ++ TextAnalysis.langScores(t): _*)
    scored.withColumn("predicted",
        TextAnalysis.predictLang(col("score_en"), col("score_de"), col("score_es"), col("score_fr")))
      .withColumn("correct", (col("predicted") === col("lang")).cast(IntegerType))
  }

  private def markerListSql(l: String): String =
    TextAnalysis.langMarkers.toMap.apply(l).map(m => s"'$m'").mkString("[", ",", "]")

  val langIdOracle: String =
    s"""WITH toks AS ($tokSql),
       |scored AS (
       |  SELECT doc_id, lang,
       |         len(list_filter(t, x -> list_contains(${markerListSql("en")}, x))) AS score_en,
       |         len(list_filter(t, x -> list_contains(${markerListSql("de")}, x))) AS score_de,
       |         len(list_filter(t, x -> list_contains(${markerListSql("es")}, x))) AS score_es,
       |         len(list_filter(t, x -> list_contains(${markerListSql("fr")}, x))) AS score_fr
       |  FROM toks)
       |SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
       |       CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
       |            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
       |            WHEN score_es >= score_fr THEN 'es'
       |            ELSE 'fr' END AS predicted,
       |       CAST(CASE WHEN (CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
       |            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
       |            WHEN score_es >= score_fr THEN 'es'
       |            ELSE 'fr' END) = lang THEN 1 ELSE 0 END AS INTEGER) AS correct
       |FROM scored
       |""".stripMargin

  // -------------------------------------------------------------------
  // Quality statistics + composite score per document.
  // -------------------------------------------------------------------
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    // tokenize/score is pure map work that ran in the single scan task
    // (0.83 s at sf0.1) — fan out at the priced width (Widen scaladoc)
    val docs = graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
      expansion = 8, col("doc_id"))
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      TextAnalysis.nTokens(t).as("n_tokens"),
      TextAnalysis.avgTokenLen(t).as("avg_token_len"),
      TextAnalysis.stopwordRatio(t).as("stopword_ratio"),
      TextAnalysis.digitTokenRatio(t).as("digit_ratio"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.qualityScore(t, col("text")).as("quality"))
  }

  private val stopListSql =
    TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ",", "]")

  /** Zero-denominator guards mirror TextAnalysis.safeRatio: empty /
    * punctuation-only docs pin every ratio to 0.0 on both engines. */
  private val stopRatioSql =
    s"CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(len(list_filter(t, x -> list_contains($stopListSql, x))) AS DOUBLE) / len(t) END"
  private val punctRatioSql =
    "CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / len(text) END"
  private val qualitySql =
    s"""0.4 * least(1.0, CAST(len(t) AS DOUBLE) / 200)
       |      + 0.4 * ($stopRatioSql)
       |      + 0.2 * (1.0 - $punctRatioSql)""".stripMargin

  val textQualityOracle: String =
    s"""WITH toks AS ($tokSql)
       |SELECT doc_id,
       |       len(t) AS n_tokens,
       |       CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS DOUBLE) / len(t) END AS avg_token_len,
       |       $stopRatioSql AS stopword_ratio,
       |       CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(len(list_filter(t, x -> regexp_matches(x, '^[0-9]+$$'))) AS DOUBLE) / len(t) END AS digit_ratio,
       |       $punctRatioSql AS punct_ratio,
       |       $qualitySql AS quality
       |FROM toks
       |""".stripMargin

  // -------------------------------------------------------------------
  // Gopher quality gate (Rae et al. 2021, §A1.1): the rule flags + the
  // composite pass every web-scale curation pipeline screens with.
  // -------------------------------------------------------------------
  def gopherQuality(spark: SparkSession, sfDir: String): DataFrame = {
    // same starved-scan fan-out as textQuality
    val docs = graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
      expansion = 8, col("doc_id"))
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      TextAnalysis.nTokens(t).as("n_words"),
      TextAnalysis.avgTokenLen(t).as("mean_word_len"),
      TextAnalysis.gopherHashRatio(col("text"), t).as("hash_ratio"),
      TextAnalysis.gopherEllipsisRatio(col("text"), t).as("ellipsis_word_ratio"),
      TextAnalysis.gopherBulletLineRatio(col("text")).as("bullet_ratio"),
      TextAnalysis.gopherEllipsisLineRatio(col("text")).as("ellipsis_ratio"),
      TextAnalysis.gopherAlphaWordRatio(t).as("alpha_ratio"),
      TextAnalysis.gopherStopwordHits(t).as("stop_hits"),
      TextAnalysis.gopherPass(col("text"), t).as("pass"),
      // lower floors so the gate DISCRIMINATES on the short synthetic
      // fixture (the strict column is all-false there, which would let a
      // broken AND slip through the oracle unnoticed)
      TextAnalysis.gopherPassAt(col("text"), t, minWords = 30, minStopHits = 1)
        .as("pass_relaxed"))
  }

  /** The PAPER-threshold gate made non-vacuous: the fixture's prose
    * carries only one of the 8 Gopher stopwords ("the"), so the strict
    * `gopherPass` is all-false on raw documents and the oracle exercised
    * it only vacuously. Here each doc is deterministically rewritten
    * (the synthesis-from-fixture trick the HTML/mojibake/media queries
    * use) into one of three regimes keyed on doc_id:
    *   - `%3 == 0`: a stopword-rich sentence appended — these pass the
    *     stopword rule and the paper gate then discriminates on the
    *     50-word floor (base docs run 10..99 words);
    *   - `%3 == 1`: same sentence plus '#' spam — stopwords fine, but
    *     the hash-to-word ratio rule (>= 0.1) kills every one;
    *   - `%3 == 2`: untouched — still fails on < 2 stopword hits.
    * The strict gate is thus true for some rows and false for others
    * across three different rule arms, all hash-matched by the oracle. */
  def gopherQualityPaper(spark: SparkSession, sfDir: String): DataFrame = {
    // same starved-scan fan-out as textQuality
    val docs = graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
      expansion = 8, col("doc_id"))
    val stopTail = " and that is to be of note with the others"
    val dirty =
      when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), lit(stopTail)))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(col("text"), lit(stopTail), lit(" ########## ##########")))
        .otherwise(col("text"))
    val t = tokens(dirty)
    docs.select(
      col("doc_id"),
      TextAnalysis.nTokens(t).as("n_words"),
      TextAnalysis.gopherHashRatio(dirty, t).as("hash_ratio"),
      TextAnalysis.gopherStopwordHits(t).as("stop_hits"),
      TextAnalysis.gopherPass(dirty, t).as("pass"))
  }

  private val meanWordLenSql =
    "CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS DOUBLE) / len(t) END"
  private val hashRatioSql =
    """CASE WHEN len(t) = 0 THEN 0.0 ELSE
      |  CAST(len(text) - len(translate(text, '#', '')) AS DOUBLE) / len(t) END""".stripMargin
  private val ellipsisWordRatioSql =
    """CASE WHEN len(t) = 0 THEN 0.0 ELSE
      |  (CAST(len(text) - len(regexp_replace(text, '\.\.\.', '', 'g')) AS DOUBLE) / 3.0)
      |  / len(t) END""".stripMargin
  private val bulletRatioSql =
    """CASE WHEN len(string_split(text, chr(10))) = 0 THEN 0.0 ELSE
      |  CAST(len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
      |  / len(string_split(text, chr(10))) END""".stripMargin
  private val ellipsisRatioSql =
    """CASE WHEN len(string_split(text, chr(10))) = 0 THEN 0.0 ELSE
      |  CAST(len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '\.\.\.\s*$'))) AS DOUBLE)
      |  / len(string_split(text, chr(10))) END""".stripMargin
  private val alphaRatioSql =
    "CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(t) END"
  private val stopHitsSql = TextAnalysis.gopherStopwords
    .map(s => s"CASE WHEN list_contains(t, '$s') THEN 1 ELSE 0 END")
    .mkString(" + ")

  val gopherQualityOracle: String =
    s"""WITH toks AS ($tokSql)
       |SELECT doc_id,
       |       len(t) AS n_words,
       |       $meanWordLenSql AS mean_word_len,
       |       $hashRatioSql AS hash_ratio,
       |       $ellipsisWordRatioSql AS ellipsis_word_ratio,
       |       $bulletRatioSql AS bullet_ratio,
       |       $ellipsisRatioSql AS ellipsis_ratio,
       |       $alphaRatioSql AS alpha_ratio,
       |       $stopHitsSql AS stop_hits,
       |       (len(t) BETWEEN 50 AND 100000)
       |         AND ($meanWordLenSql BETWEEN 3.0 AND 10.0)
       |         AND ($hashRatioSql < 0.1)
       |         AND ($ellipsisWordRatioSql < 0.1)
       |         AND ($bulletRatioSql < 0.9)
       |         AND ($ellipsisRatioSql < 0.3)
       |         AND ($alphaRatioSql > 0.8)
       |         AND (($stopHitsSql) >= 2) AS pass,
       |       (len(t) BETWEEN 30 AND 100000)
       |         AND ($meanWordLenSql BETWEEN 3.0 AND 10.0)
       |         AND ($hashRatioSql < 0.1)
       |         AND ($ellipsisWordRatioSql < 0.1)
       |         AND ($bulletRatioSql < 0.9)
       |         AND ($ellipsisRatioSql < 0.3)
       |         AND ($alphaRatioSql > 0.8)
       |         AND (($stopHitsSql) >= 1) AS pass_relaxed
       |FROM toks
       |""".stripMargin

  val gopherQualityPaperOracle: String =
    s"""WITH built AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0
       |                THEN text || ' and that is to be of note with the others'
       |              WHEN doc_id % 3 = 1
       |                THEN text || ' and that is to be of note with the others' || ' ########## ##########'
       |              ELSE text END AS text
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
       |  FROM built
       |)
       |SELECT doc_id,
       |       len(t) AS n_words,
       |       $hashRatioSql AS hash_ratio,
       |       $stopHitsSql AS stop_hits,
       |       (len(t) BETWEEN 50 AND 100000)
       |         AND ($meanWordLenSql BETWEEN 3.0 AND 10.0)
       |         AND ($hashRatioSql < 0.1)
       |         AND ($ellipsisWordRatioSql < 0.1)
       |         AND ($bulletRatioSql < 0.9)
       |         AND ($ellipsisRatioSql < 0.3)
       |         AND ($alphaRatioSql > 0.8)
       |         AND (($stopHitsSql) >= 2) AS pass
       |FROM toks
       |""".stripMargin

  // -------------------------------------------------------------------
  // Token counting rollup per source: whitespace + BPE-ish regex counts.
  // -------------------------------------------------------------------
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.select(col("source"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"))
  }

  val tokenCountsOracle: String =
    """SELECT source, COUNT(*) AS docs,
      |       CAST(SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS ws_tokens,
      |       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
      |FROM documents GROUP BY 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // Rolling-hash document fingerprint (order-sensitive).
  // -------------------------------------------------------------------
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.fingerprint(tokens(col("text"))).as("fingerprint"))

  val docFingerprintOracle: String =
    s"""WITH toks AS ($tokSql),
       |hs AS (SELECT doc_id,
       |              list_transform(t, x -> CAST(('0x' || substring(md5(x),1,8)) AS BIGINT)) AS h
       |       FROM toks)
       |SELECT doc_id,
       |       CASE WHEN len(h) = 0 THEN 0
       |            ELSE list_reduce(h, (acc, x) -> (acc * 31 + x) % 4294967311) END AS fingerprint
       |FROM hs
       |""".stripMargin

  // -------------------------------------------------------------------
  // Document chunking: 50-token windows at stride 40 (10-token overlap)
  // — the training-example segmentation primitive. Pure per-row
  // generator (posexplode), no shuffle.
  // -------------------------------------------------------------------
  def docChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    val nChunks = ((size(t) + 39) / 40).cast(IntegerType) // ceil(n/40), positive -> truncation = floor
    Tables.documents(spark, sfDir)
      .filter(size(t) > 0)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(t, i * 40 + 1, lit(50)), " "))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        size(split(col("col"), " ")).as("chunk_tokens"),
        md5(col("col")).as("chunk_hash"))
  }

  val docChunksOracle: String =
    s"""WITH toks AS ($tokSql),
       |ch AS (
       |  SELECT doc_id, unnest(range(0, (len(t)+39)//40)) AS chunk_idx, t
       |  FROM toks WHERE len(t) > 0)
       |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       |       CAST(len(list_slice(t, chunk_idx*40+1, chunk_idx*40+50)) AS INTEGER) AS chunk_tokens,
       |       md5(array_to_string(list_slice(t, chunk_idx*40+1, chunk_idx*40+50), ' ')) AS chunk_hash
       |FROM ch
       |""".stripMargin

  // -------------------------------------------------------------------
  // Deterministic stratified sampling: ~20% per source stratum via the
  // md5-derived hash of (source, doc_id) — reproducible across engines,
  // runs, and cluster sizes (no RNG state), the property a training-data
  // sample must have.
  // -------------------------------------------------------------------
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(hash32(concat(col("source"), lit(":"), col("doc_id").cast(StringType))) % 100 < 20)
      .select("doc_id", "source", "lang")

  val stratifiedSampleOracle: String =
    """SELECT doc_id, source, lang FROM documents
      |WHERE CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100 < 20
      |""".stripMargin

  /** Deterministic train/val/test assignment — the split every training
    * pipeline needs pinned BEFORE any processing: 80/10/10 by the same
    * engine-identical md5 bucket the stratified sampler uses, keyed on
    * (source, doc_id) so membership survives any re-partitioning,
    * re-run, or engine swap. Reported as per-(source, split) doc and
    * char counts; the assignment itself is the `split` column. */
  def datasetSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val h = hash32(concat(col("source"), lit(":"), col("doc_id").cast(StringType))) % 100
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast(LongType).as("n_chars"))
  }

  val datasetSplitOracle: String =
    """WITH s AS (
      |  SELECT source,
      |         CASE WHEN h < 80 THEN 'train'
      |              WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
      |         len(text) AS l
      |  FROM (SELECT *,
      |          CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100 AS h
      |        FROM documents))
      |SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(l) AS BIGINT) AS n_chars
      |FROM s GROUP BY 1, 2
      |""".stripMargin

  // -------------------------------------------------------------------
  // End-to-end curation: quality gate -> exact dedup -> minhash-LSH
  // near-dup removal (greedy: drop the higher doc_id of each verified
  // pair) -> per-source corpus stats. One lazy plan composing the whole
  // training-data-curation surface; every stage reuses the
  // oracle-verified operator fragments above.
  // -------------------------------------------------------------------
  /** Gate thresholds sized to the synthetic corpus (composite quality
    * there spans ~0.22-0.45): ~40% of docs pass, so every downstream stage
    * — exact dedup, LSH banding, near-dup removal, the final rollup —
    * processes real rows and the oracle comparison is non-vacuous
    * (round-3 ADVICE). */
  private val MinTokens = 30; private val MinQuality = 0.35

  def curationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(col("text"))
    val quality = TextAnalysis.qualityScore(t, col("text"))

    // tokenize + quality gate + shingle/minhash are the pipeline's map
    // floor — fan the starved scan out once at the head (Widen scaladoc)
    val gated = graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
        expansion = 8, col("doc_id"))
      .filter(size(t) >= MinTokens && quality >= lit(MinQuality))
    val exactDeduped = Dedup.exactDedupByContent(col("text"), col("doc_id"))(gated)

    val base = exactDeduped.select(col("doc_id") +: Dedup.shingled(col("text"), 3): _*)
    val sig = base.select(col("doc_id"), col("shingle_set"),
      Dedup.minhashSig(col("shingle_hashes"), K).as("sig"))
    val banded = sig
      .select(col("doc_id"), Dedup.lshBands(col("sig"), Bands, Rows).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val pairs = Dedup.candidatePairs(
      Dedup.capBuckets("doc_id", LshBucketCap)(banded), "doc_id")
    val x = sig.select(col("doc_id").as("d1"), col("shingle_set").as("sd1"))
    val y = sig.select(col("doc_id").as("d2"), col("shingle_set").as("sd2"))
    val nearDups = pairs.join(x, "d1").join(y, "d2")
      .filter(Dedup.jaccard(col("sd1"), col("sd2")) >= 0.8)
      .select(col("d2").as("doc_id")).distinct()

    exactDeduped.join(nearDups, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(size(tokens(col("text")))).as("kept_tokens"))
  }

  val curationPipelineOracle: String =
    s"""WITH gated AS (
       |  SELECT d.*, t FROM (
       |    SELECT *, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
       |    FROM documents) d
       |  WHERE len(t) >= $MinTokens
       |    AND $qualitySql
       |      >= $MinQuality),
       |exact AS (
       |  SELECT * FROM gated
       |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
       |sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) >= 3
       |              THEN list_transform(range(0, len(t)-2),
       |                     i -> array_to_string(list_slice(t, i+1, i+3), ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS s
       |  FROM exact),
       |hs AS ($hashSql),
       |sig AS (${sigSql(K)}),
       |bands AS (SELECT doc_id, sd, sig, unnest(range(0,$Bands)) AS band FROM sig),
       |keyed AS (
       |  SELECT doc_id, band,
       |         array_to_string(list_slice(sig, band*$Rows+1, band*$Rows+$Rows), ',') AS bkey
       |  FROM bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM keyed a JOIN keyed b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |neardups AS (
       |  SELECT DISTINCT p.d2 AS doc_id
       |  FROM pairs p JOIN sig x ON p.d1 = x.doc_id JOIN sig y ON p.d2 = y.doc_id
       |  WHERE CAST(len(list_filter(x.sd, e -> list_contains(y.sd, e))) AS DOUBLE)
       |        / (len(x.sd) + len(y.sd) - len(list_filter(x.sd, e -> list_contains(y.sd, e)))) >= 0.8)
       |SELECT source, COUNT(*) AS kept_docs, CAST(SUM(len(t)) AS BIGINT) AS kept_tokens
       |FROM exact e
       |WHERE NOT EXISTS (SELECT 1 FROM neardups n WHERE n.doc_id = e.doc_id)
       |GROUP BY 1
       |""".stripMargin

  // -------------------------------------------------------------------
  // KMV (k-minimum-values) distinct-count sketch — the mergeable
  // cardinality sketch shape, chosen over HLL because its estimate is a
  // pure function of the k smallest md5 hashes: deterministic, engine-
  // independent, and therefore EXACTLY oracle-checkable (HLL estimates
  // differ across implementations). Estimate: (k-1) * 2^32 / h_k when
  // the group has >= k distinct hashes, else the exact count. At scale
  // the distinct + per-key window prunes to k rows per key before the
  // final aggregate; the sketch state (k hashes) is what a mergeable
  // accumulator would carry.
  // -------------------------------------------------------------------
  private val KmvK = 256

  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = graft.Tables.table(spark, sfDir, "lineitem")
    val hashed = li.select(col("l_returnflag").as("flag"),
        hash32(col("l_partkey").cast(StringType)).as("h"))
      .distinct()
    // Two-stage exact top-K. A single per-flag window sorts the whole
    // distinct hash universe on #flags tasks (3 here) — a parallelism
    // ceiling that worsens with scale. The k smallest of a union is the
    // k smallest of the per-salt k-smallests, so stage 1 keeps k per
    // (flag, salt) bucket at full parallelism and stage 2 runs the
    // per-flag window over only #flags * #salts * k survivors.
    val salts = 256
    val wSalt = Window.partitionBy(col("flag"), pmod(col("h"), lit(salts)))
      .orderBy(col("h"))
    val preKept = hashed.withColumn("srn", row_number().over(wSalt))
      .filter(col("srn") <= KmvK)
      .drop("srn")
    val w = Window.partitionBy(col("flag")).orderBy(col("h"))
    val kept = preKept.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
    kept.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(col("flag"),
        when(col("n") < KmvK, col("n").cast(DoubleType))
          .otherwise(lit((KmvK - 1).toDouble) * lit(4294967296.0) / col("hk"))
          .as("est_distinct"))
  }

  /** KMV as ONE aggregate: the custom bounded-top-K
    * TypedImperativeAggregate ([[graft.functions.KMinLongs]]) holds the k
    * smallest distinct hashes per flag map-side, so the whole sketch is a
    * single partial+final hash agg — one exchange of 256-long arrays, no
    * upstream distinct, no window, no sort. Same estimate (and oracle) as
    * `kmv_distinct`; this is the form a 1000-executor cluster wants. */
  def kmvDistinctAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftExpressions.kminLongs
    val li = graft.Tables.table(spark, sfDir, "lineitem")
    li.select(col("l_returnflag").as("flag"),
        hash32(col("l_partkey").cast(StringType)).as("h"))
      .groupBy(col("flag"))
      .agg(kminLongs(col("h"), KmvK).as("hs"))
      .select(col("flag"),
        when(size(col("hs")) < KmvK, size(col("hs")).cast(DoubleType))
          .otherwise(lit((KmvK - 1).toDouble) * lit(4294967296.0)
            / element_at(col("hs"), KmvK))
          .as("est_distinct"))
  }

  val kmvDistinctOracle: String =
    s"""WITH hashed AS (
       |  SELECT DISTINCT l_returnflag AS flag,
       |         CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)),1,8)) AS BIGINT) AS h
       |  FROM lineitem),
       |kept AS (
       |  SELECT flag, h FROM hashed
       |  QUALIFY row_number() OVER (PARTITION BY flag ORDER BY h) <= $KmvK),
       |agg AS (SELECT flag, COUNT(*) AS n, MAX(h) AS hk FROM kept GROUP BY 1)
       |SELECT flag,
       |       CASE WHEN n < $KmvK THEN CAST(n AS DOUBLE)
       |            ELSE ${KmvK - 1}.0 * 4294967296.0 / hk END AS est_distinct
       |FROM agg
       |""".stripMargin

  // -------------------------------------------------------------------
  // TF-IDF top terms per document (rational idf = N/df — products and
  // divisions are correctly-rounded IEEE ops on both engines, unlike
  // ln/exp, so the scores hash-match exactly). Restricted to doc_id < 50
  // to keep the bench query bounded; the plan shape (explode -> two
  // aggs -> broadcast df join -> per-doc top-k window) is scale-ready.
  // -------------------------------------------------------------------
  def tfidfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("nd"))
    val tf = terms.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.filter(col("doc_id") < 50)
      .join(broadcast(df), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast(DoubleType) * col("nd").cast(DoubleType) / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("doc_id", "token", "tf", "df", "score", "rank")
  }

  val tfidfTopKOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents)
      |SELECT doc_id, token, tf, df, score, rank FROM (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |         CAST(tf.tf AS DOUBLE) * CAST(nd.nd AS DOUBLE) / df.df AS score,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |           ORDER BY CAST(tf.tf AS DOUBLE) * CAST(nd.nd AS DOUBLE) / df.df DESC, tf.token) AS rank
      |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN nd
      |  WHERE tf.doc_id < 50)
      |WHERE rank <= 5
      |""".stripMargin

  /** `tfidf_topk` re-planned through `graft_topk`: the per-doc top-5
    * terms come out of a partial+final hash aggregate (k structs per doc
    * per task on the wire) instead of a window that sorts every scored
    * (doc, term) row. String ids break ties in binary order — identical
    * to the oracle's ORDER BY token for these ASCII tokens. */
  def tfidfTopKAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftExpressions.topKBy
    val docs = Tables.documents(spark, sfDir)
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("nd"))
    val tf = terms.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.filter(col("doc_id") < 50)
      .join(broadcast(df), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast(DoubleType) * col("nd").cast(DoubleType) / col("df"))
      .groupBy(col("doc_id"))
      .agg(topKBy(col("score"), col("token"), 5).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), col("col.id").as("token"), col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  val tfidfTopKAggOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents)
      |SELECT doc_id, token, score, rank FROM (
      |  SELECT tf.doc_id, tf.token,
      |         CAST(tf.tf AS DOUBLE) * CAST(nd.nd AS DOUBLE) / df.df AS score,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |           ORDER BY CAST(tf.tf AS DOUBLE) * CAST(nd.nd AS DOUBLE) / df.df DESC, tf.token) AS rank
      |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN nd
      |  WHERE tf.doc_id < 50)
      |WHERE rank <= 5
      |""".stripMargin

  // -------------------------------------------------------------------
  // Corpus-mix primitives. Both order docs by the md5 hash of their id —
  // a deterministic, RNG-free shuffle that is reproducible across
  // engines, runs, and cluster sizes (the property a training-data mix
  // must have). One shuffle on source; windows stay per-partition.
  // -------------------------------------------------------------------

  /** Exactly `k` docs per source (per-source quota sampling). */
  def balancedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash32(col("doc_id").cast(StringType))
    val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("doc_id", "source", "lang", "rn")
  }

  val balancedSampleOracle: String =
    """SELECT doc_id, source, lang,
      |       CAST(row_number() OVER (PARTITION BY source
      |         ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
      |                  doc_id) AS INTEGER) AS rn
      |FROM documents
      |QUALIFY rn <= 10
      |""".stripMargin

  /** Token-budget mix: walk each source in hash order and keep docs while
    * the running token total stays within the per-source budget — the
    * "N tokens from web, M from code" corpus-mixing op, as one running-sum
    * window. */
  def tokenBudgetSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash32(col("doc_id").cast(StringType))
    val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .withColumn("n_tok", size(tokens(col("text"))))
      .withColumn("cum_tok", sum(col("n_tok").cast("long")).over(w))
      .filter(col("cum_tok") <= 1000)
      .select("doc_id", "source", "n_tok", "cum_tok")
  }

  val tokenBudgetSampleOracle: String =
    s"""WITH toks AS ($tokSql)
       |SELECT doc_id, source, n_tok, cum_tok FROM (
       |  SELECT doc_id, source, CAST(len(t) AS INTEGER) AS n_tok,
       |         CAST(SUM(CAST(len(t) AS BIGINT)) OVER (PARTITION BY source
       |           ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |                    doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
       |  FROM toks)
       |WHERE cum_tok <= 1000
       |""".stripMargin

  /** Temperature-scaled domain mixing — the corpus-mix op that upsamples
    * rare domains relative to their natural share (the alpha<1 mixing of
    * multilingual/multi-domain training sets): after a quality gate makes
    * per-source counts n_s uneven, each source's quota is
    * min(n_s, floor(2*sqrt(n_s))) — the sqrt (alpha=0.5) temperature, with
    * NO cross-source normalization sum, so every arithmetic step (sqrt,
    * scale, floor) is IEEE-deterministic and engine-identical. Selection
    * within a source is the md5-ordered deterministic shuffle shared by
    * the other mix ops. Scale shape: one tiny quota aggregate broadcast
    * back over one per-source window — no global sort, no collect. */
  def domainMixSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eligible = Tables.documents(spark, sfDir)
      .withColumn("n_tok", size(tokens(col("text"))))
      .filter(col("n_tok") >= 60)
    val quotas = eligible.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("quota",
        least(col("n_docs"), floor(lit(2.0) * sqrt(col("n_docs").cast("double")))))
    val h = hash32(col("doc_id").cast(StringType))
    val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
    eligible.withColumn("rn", row_number().over(w))
      .join(broadcast(quotas), "source")
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rn"), col("n_docs"), col("quota"))
  }

  val domainMixSampleOracle: String =
    s"""WITH toks AS ($tokSql),
       |eligible AS (
       |  SELECT doc_id, source FROM toks WHERE len(t) >= 60),
       |q AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |         LEAST(COUNT(*),
       |               CAST(floor(2.0 * sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS quota
       |  FROM eligible GROUP BY source),
       |r AS (
       |  SELECT doc_id, source,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |                    doc_id) AS INTEGER) AS rn
       |  FROM eligible)
       |SELECT r.doc_id, r.source, r.rn, q.n_docs, q.quota
       |FROM r JOIN q USING (source) WHERE r.rn <= q.quota
       |""".stripMargin

  /** Cross-document exact span dedup — the C4/RefinedWeb-style "drop any
    * repeated line/paragraph, keep its first occurrence" scrub, over
    * 10-token spans (the synthetic corpus has no line structure): spans
    * are hashed corpus-wide, the FIRST occurrence in (doc_id, span_idx)
    * order survives, every later repeat is cut, and documents are
    * reassembled from their surviving spans. Docs reduced to nothing drop
    * out entirely. Scale shape: explode -> one window keyed by span text
    * (span-cardinality shuffle) -> one per-doc regroup; nothing is
    * quadratic in docs and no state leaves the executors. */
  def paragraphDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spansOf = Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      // zero-token docs have no spans; without the guard sequence(0, -1)
      // would DESCEND and emit phantom empty spans (oracle: range(0,0)=[])
      .filter(size(col("t")) > 0)
      .withColumn("span_idx",
        explode(sequence(lit(0L), ceil(size(col("t")) / lit(10.0)) - 1L)))
      .withColumn("span",
        array_join(slice(col("t"), (col("span_idx") * 10 + 1).cast("int"), lit(10)), " "))
      .select("doc_id", "span_idx", "span")
    val firstSeen = Window.partitionBy(col("span"))
      .orderBy(col("doc_id"), col("span_idx"))
    spansOf.withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_spans"),
        array_join(transform(array_sort(
          collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("cleaned"))
  }

  val paragraphDedupOracle: String =
    s"""WITH toks AS ($tokSql),
       |spans0 AS (
       |  SELECT doc_id,
       |         list_transform(range(0, CAST(ceil(len(t)/10.0) AS BIGINT)),
       |           i -> array_to_string(list_slice(t, i*10+1, i*10+10), ' ')) AS sp
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, UNNEST(sp) AS span, UNNEST(range(0, len(sp))) AS span_idx
       |  FROM spans0),
       |kept AS (
       |  SELECT doc_id, span_idx, span,
       |         row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
       |  FROM spans)
       |SELECT doc_id, COUNT(*) AS kept_spans,
       |       string_agg(span, ' ' ORDER BY span_idx) AS cleaned
       |FROM kept WHERE rn = 1 GROUP BY doc_id
       |""".stripMargin

  // -------------------------------------------------------------------
  // Decontamination — the train/eval overlap scrub every training corpus
  // needs: a candidate training document is contaminated if it shares any
  // 5-token shingle with the held-out benchmark set (here: doc_id % 10 = 0
  // stands in for the eval split). The benchmark side is tiny by nature
  // (eval sets are thousands of docs, the corpus is billions), so its
  // distinct shingle set broadcasts and the check is one map-side hash
  // join over the training side's exploded shingles — no corpus shuffle.
  // -------------------------------------------------------------------
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions.shingles
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(shingles(tokens(col("text")), 5))).as("shingle"))
    val bench = sh.filter(col("doc_id") % 10 === 0)
      .select(col("shingle"), col("doc_id").as("bench_id"))
    sh.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("n_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  val decontaminateOracle: String =
    s"""WITH toks AS ($tokSql),
       |sh AS (${shingleSql(5)}),
       |d AS (SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh),
       |bench AS (SELECT shingle, doc_id AS bench_id FROM d WHERE doc_id % 10 = 0),
       |train AS (SELECT * FROM d WHERE doc_id % 10 <> 0)
       |SELECT t.doc_id,
       |       COUNT(DISTINCT t.shingle) AS n_shingles,
       |       COUNT(DISTINCT b.bench_id) AS n_bench_docs
       |FROM train t JOIN bench b ON t.shingle = b.shingle
       |GROUP BY 1
       |""".stripMargin

  // -------------------------------------------------------------------
  // Repetition scoring — the boilerplate/spam quality signal: per doc,
  // the share of the most frequent token and the distinct-token ratio.
  // Two partial+final hash aggs (doc,token) -> (doc); ratios are single
  // divisions of exact integer counts, so they hash-match across engines.
  // -------------------------------------------------------------------
  def repetitionScore(spark: SparkSession, sfDir: String): DataFrame = {
    val terms = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    terms.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("top_c").cast(DoubleType) / col("n_tokens")).as("top_ratio"),
        (col("n_distinct").cast(DoubleType) / col("n_tokens")).as("distinct_ratio"))
  }

  val repetitionScoreOracle: String =
    s"""WITH toks AS ($tokSql),
       |t AS (SELECT doc_id, unnest(t) AS token FROM toks),
       |cnt AS (SELECT doc_id, token, COUNT(*) AS c FROM t GROUP BY 1, 2),
       |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |               COUNT(*) AS n_distinct, MAX(c) AS top_c
       |        FROM cnt GROUP BY 1)
       |SELECT doc_id, n_tokens, n_distinct,
       |       CAST(top_c AS DOUBLE) / n_tokens AS top_ratio,
       |       CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio
       |FROM agg
       |""".stripMargin

  // -------------------------------------------------------------------
  // Bigram LM statistics — the n-gram fluency/novelty quality signals:
  // per doc, mean corpus-frequency of its bigrams (low = unusual text),
  // the share of bigrams appearing nowhere else (novelty), and the least
  // predictable transition min P(w2|w1). Numeric discipline: sums are
  // over integer corpus counts (exact at any parallelism); the only
  // divisions are single int/int IEEE ops, so no ln/avg-of-doubles ever
  // enters the hash. Plan: one bigram explode scanned once, two count
  // aggs, two hash joins back on the (small) vocab side.
  // -------------------------------------------------------------------
  def bigramStats(spark: SparkSession, sfDir: String): DataFrame = {
    // tokens MUST be a materialized column before the bigram lambda:
    // element_at over an inlined tokens(text) expression re-tokenizes per
    // bigram position — O(len^2) regex work per doc (measured 18.8s at
    // sf0.1; 0.6s this way)
    // tokenize + bigram explode + the per-(doc, bigram) collapse all ran
    // inside the single scan task; a doc_id-keyed fan-out parallelizes
    // them AND satisfies the (doc_id, w1, w2) clustering, so the first
    // aggregation needs no second exchange (Widen scaladoc)
    val base = graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
        expansion = 16, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = base
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // collapse occurrences to per-(doc, bigram) counts first: every
    // downstream agg/join then works on the far smaller distinct table,
    // and the per-doc stats recover exactly via the d weights
    val dd = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("d"))
    val c2 = dd.groupBy("w1", "w2").agg(sum(col("d")).as("c2"))
    val c1 = dd.groupBy("w1").agg(sum(col("d")).as("c1"))
    dd.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy("doc_id")
      .agg(sum(col("d")).as("n_bigrams"),
        sum(col("d") * col("c2")).as("__sumc2"),
        sum(when(col("c2") === 1, col("d")).otherwise(0L)).as("__novel"),
        min(col("c2").cast(DoubleType) / col("c1")).as("min_cond_prob"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__sumc2").cast(DoubleType) / col("n_bigrams")).as("mean_bigram_freq"),
        (col("__novel").cast(DoubleType) / col("n_bigrams")).as("novel_ratio"),
        col("min_cond_prob"))
  }

  val bigramStatsOracle: String =
    s"""WITH toks AS ($tokSql),
       |bi AS (
       |  SELECT doc_id,
       |         unnest(list_slice(t, 1, len(t)-1)) AS w1,
       |         unnest(list_slice(t, 2, len(t))) AS w2
       |  FROM toks WHERE len(t) >= 2),
       |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
       |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1)
       |SELECT bi.doc_id, COUNT(*) AS n_bigrams,
       |       CAST(CAST(SUM(c2.c2) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_bigram_freq,
       |       CAST(CAST(SUM(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |         / COUNT(*) AS novel_ratio,
       |       MIN(CAST(c2.c2 AS DOUBLE) / c1.c1) AS min_cond_prob
       |FROM bi JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
       |        JOIN c1 ON bi.w1 = c1.w1
       |GROUP BY 1
       |""".stripMargin

  // -------------------------------------------------------------------
  // Deterministic weighted sampling — keep a doc with probability equal
  // to a per-doc weight (here length-proportional, capped at 1), decided
  // by comparing the doc's uniform hash draw u = h/2^32 against the
  // weight. RNG-free, reproducible across engines/runs/cluster sizes,
  // and map-side only — the weighted counterpart of stratified_sample.
  // -------------------------------------------------------------------
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_tok"),
        (hash32(col("doc_id").cast(StringType)) / lit(4294967296.0)).as("u"))
      .withColumn("w", least(lit(1.0), col("n_tok").cast(DoubleType) / lit(100.0)))
      .filter(col("u") < col("w"))
      .select("doc_id", "n_tok", "u", "w")

  val weightedSampleOracle: String =
    s"""WITH toks AS ($tokSql)
       |SELECT doc_id, n_tok, u, w FROM (
       |  SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tok,
       |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT)
       |           / 4294967296.0 AS u,
       |         LEAST(1.0, CAST(len(t) AS DOUBLE) / 100.0) AS w
       |  FROM toks)
       |WHERE u < w
       |""".stripMargin

  // -------------------------------------------------------------------
  // Sequence packing — assign docs to fixed-size (512-token) training
  // sequences: hash-ordered within each source (the deterministic
  // shuffle), running token cumsum, bin = the sequence where the doc
  // STARTS. Per-source windows keep the packing parallel across sources
  // (a single global order would be a one-task sort at scale); the
  // output is the packing manifest (docs and tokens per sequence).
  // -------------------------------------------------------------------
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash32(col("doc_id").cast(StringType))
    val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), size(tokens(col("text"))).as("n_tok"))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .withColumn("seq_bin", floor((col("cum") - col("n_tok")) / lit(512.0)))
      .groupBy("source", "seq_bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("tokens"))
  }

  /** Sharded packing — the 100 TB form: a per-SOURCE running cumsum has
    * parallelism = #sources (a handful in a real corpus mix — the same
    * partition-ceiling shape kmv_distinct had). Packing does not need one
    * global order per source, only a deterministic partition into
    * sequences — so shard each source by doc-id hash (256 ways) and pack
    * within (source, shard): full parallelism, identical manifest
    * semantics, at most one underfull trailing sequence per shard. */
  def packSequencesSharded(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash32(col("doc_id").cast(StringType))
    val shard = pmod(h, lit(256))
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), size(tokens(col("text"))).as("n_tok"),
        h.as("h"), shard.as("shard"))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .withColumn("seq_bin", floor((col("cum") - col("n_tok")) / lit(512.0)))
      .groupBy("source", "shard", "seq_bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("tokens"))
  }

  val packSequencesShardedOracle: String =
    s"""WITH toks AS ($tokSql),
       |c AS (
       |  SELECT source, doc_id, CAST(len(t) AS INTEGER) AS n_tok,
       |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) AS h,
       |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 256 AS shard
       |  FROM toks),
       |w AS (
       |  SELECT source, shard, n_tok,
       |         CAST(SUM(CAST(n_tok AS BIGINT)) OVER (PARTITION BY source, shard
       |           ORDER BY h, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM c)
       |SELECT source, shard, CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS seq_bin,
       |       COUNT(*) AS n_docs, CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS tokens
       |FROM w GROUP BY 1, 2, 3
       |""".stripMargin

  val packSequencesOracle: String =
    s"""WITH toks AS ($tokSql),
       |c AS (
       |  SELECT source, doc_id, CAST(len(t) AS INTEGER) AS n_tok,
       |         CAST(SUM(CAST(len(t) AS BIGINT)) OVER (PARTITION BY source
       |           ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |                    doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM toks)
       |SELECT source, CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS seq_bin,
       |       COUNT(*) AS n_docs, CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS tokens
       |FROM c GROUP BY 1, 2
       |""".stripMargin

  // -------------------------------------------------------------------
  // PII surface counts — the scrub-stage signal: per doc, counts of
  // digit runs, email-shaped and url-shaped substrings (conservative
  // character-class-only patterns, which match identically under Java
  // regex and DuckDB's RE2 — no backrefs, no lookaround, no bounded
  // quantifier ambiguity). Map-side only; the counts feed a redact/drop
  // policy downstream.
  // -------------------------------------------------------------------
  private val piiDigits = "[0-9]{4,}"
  private val piiEmail = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val piiUrl = "https?://[a-z0-9./_-]+"

  def piiCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_count(lower(col("text")), lit(piiDigits)).as("n_digit_runs"),
        regexp_count(lower(col("text")), lit(piiEmail)).as("n_emails"),
        regexp_count(lower(col("text")), lit(piiUrl)).as("n_urls"))

  val piiCountsOracle: String =
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(lower(text), '$piiDigits')) AS INTEGER) AS n_digit_runs,
       |       CAST(len(regexp_extract_all(lower(text), '$piiEmail')) AS INTEGER) AS n_emails,
       |       CAST(len(regexp_extract_all(lower(text), '$piiUrl')) AS INTEGER) AS n_urls
       |FROM documents
       |""".stripMargin

  /** PII REDACTION — the rewrite half of the PII story (pii_counts only
    * measures): emails -> <EMAIL>, then URLs -> <URL>, then 4+-digit runs
    * -> <NUM>, in that order (emails and URLs contain digits, so they must
    * be consumed first). The fixture text carries no PII, so each doc is
    * seeded with deterministic doc_id-derived contact data before
    * redaction — both engines construct the identical input, and the
    * redaction provably rewrites every doc. Pure map-side regexp_replace:
    * full codegen, no shuffle, linear at any corpus size. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val seeded = lower(concat(col("text"),
      lit(" contact user"), col("doc_id").cast(StringType),
      lit("@mail.com or call "),
      (col("doc_id") * 7919 + 10007).cast(StringType),
      lit(" see https://ex.org/d/"), col("doc_id").cast(StringType)))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(seeded,
          lit(piiEmail), lit("<EMAIL>")),
          lit(piiUrl), lit("<URL>")),
          lit(piiDigits), lit("<NUM>")).as("redacted"))
  }

  val piiRedactOracle: String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(
       |    lower(text || ' contact user' || CAST(doc_id AS VARCHAR)
       |          || '@mail.com or call '
       |          || CAST(doc_id * 7919 + 10007 AS VARCHAR)
       |          || ' see https://ex.org/d/' || CAST(doc_id AS VARCHAR)),
       |    '$piiEmail', '<EMAIL>', 'g'),
       |    '$piiUrl', '<URL>', 'g'),
       |    '$piiDigits', '<NUM>', 'g') AS redacted
       |FROM documents
       |""".stripMargin

  // -------------------------------------------------------------------
  // Curation-to-packing composition — the end-of-pipeline story: quality
  // gate -> exact dedup (deterministic keeper) -> 512-token sequence
  // packing manifest per source. Chains the same building blocks as
  // curation_pipeline and pack_sequences, proving the stages compose
  // into one lazy Catalyst plan (gate and dedup fold under the packing
  // window's shuffle; nothing materializes between stages).
  // -------------------------------------------------------------------
  def curationPack(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE into a column (the bigram_stats lesson: inline
    // tokens(text) re-evaluates per consumer) and carry n_tok through
    val base = Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tok", size(col("t")))
      .filter(col("n_tok") >= MinTokens &&
        TextAnalysis.qualityScore(col("t"), col("text")) >= lit(MinQuality))
    val exact = Dedup.exactDedupByContent(col("text"), col("doc_id"))(base)
    val h = hash32(col("doc_id").cast(StringType))
    val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exact.select(col("source"), col("doc_id"), col("n_tok"))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .withColumn("seq_bin", floor((col("cum") - col("n_tok")) / lit(512.0)))
      .groupBy("source", "seq_bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("tokens"))
  }

  val curationPackOracle: String =
    s"""WITH gated AS (
       |  SELECT d.*, t FROM (
       |    SELECT *, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
       |    FROM documents) d
       |  WHERE len(t) >= $MinTokens
       |    AND $qualitySql
       |      >= $MinQuality),
       |exact AS (
       |  SELECT * FROM gated
       |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
       |c AS (
       |  SELECT source, doc_id, CAST(len(t) AS INTEGER) AS n_tok,
       |         CAST(SUM(CAST(len(t) AS BIGINT)) OVER (PARTITION BY source
       |           ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |                    doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM exact)
       |SELECT source, CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS seq_bin,
       |       COUNT(*) AS n_docs, CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS tokens
       |FROM c GROUP BY 1, 2
       |""".stripMargin

  // -------------------------------------------------------------------
  // Exact duplicate-substring dedup (Lee et al. 2022 EXACTSUBSTR — see
  // ops/Dedup.scala for the operator and its 100 TB shuffle story). Two
  // query forms: the detection form reports the merged removable spans
  // per document; the apply form cuts them and rebuilds the text. w = 8
  // tokens here (the paper uses 50; the synthetic docs repeat shorter
  // sentences, and the operator is w-parameterized).
  // -------------------------------------------------------------------
  def substringDupSpans(spark: SparkSession, sfDir: String): DataFrame =
    // window-hash map pass ran in the single starved scan task — same
    // doc_id-keyed fan-out as text_quality (Widen scaladoc)
    Dedup.mergeWindowSpans(
      Dedup.duplicateWindows(
        graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
          expansion = 8, col("doc_id")),
        col("text"), col("doc_id"), w = 8), w = 8)

  def substringDedup(spark: SparkSession, sfDir: String): DataFrame =
    // same starved-scan fan-out as substringDupSpans
    Dedup.removeDuplicateSpans(
      graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
        expansion = 8, col("doc_id")),
      col("text"), col("doc_id"), w = 8)

  /** Incremental substring dedup: new batch (doc_id % 10 = 7, the
    * dedup_incremental convention) scrubbed against the published
    * corpus — corpus text contributes first occurrences but is never
    * rewritten. */
  def substringDedupIncr(spark: SparkSession, sfDir: String): DataFrame = {
    // same starved-scan fan-out as substringDupSpans
    val docs = graft.ops.Widen.byKeys(Tables.documents(spark, sfDir),
      expansion = 8, col("doc_id"))
    Dedup.removeDuplicateSpansAgainst(
      docs.filter(col("doc_id") % 10 === 7),
      docs.filter(col("doc_id") % 10 =!= 7),
      col("text"), col("doc_id"), w = 8)
  }

  /** Span-level decontamination: cut every 8-token window of the
    * training split (doc_id % 10 <> 0) that appears anywhere in the
    * eval split (doc_id % 10 = 0, same convention as the doc-level
    * `decontaminate` detection query) — no first-occurrence exemption;
    * contaminated text must not survive anywhere. The eval side rides
    * a broadcast [[graft.ops.Dedup.substringIndex]], so the training
    * corpus never shuffles. */
  def decontaminateSpans(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    Dedup.removeContaminatedSpans(
      docs.filter(col("doc_id") % 10 =!= 0),
      Dedup.substringIndex(docs.filter(col("doc_id") % 10 === 0),
        col("text"), col("doc_id"), w = 8),
      col("text"), col("doc_id"), w = 8)
  }

  /** Shared oracle fragments: window-hash occurrences (md5 of the
    * window text — the engine's exact shuffle key), the lag/running-sum
    * span merge over a `rem(doc_id, pos)` CTE, and the span-cut apply
    * tail over a filtered document set. */
  private val substringOccSql: String =
    s"""toks AS ($tokSql),
       |occ AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(t[i+1:i+8], ' ')) AS gh
       |  FROM toks, LATERAL (SELECT UNNEST(range(0, greatest(len(t)-7, 0))) AS i))""".stripMargin

  private val substringMergeSql: String =
    s"""isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos > coalesce(lag(pos) OVER w, -9) + 7 THEN 1 ELSE 0 END AS brk
       |  FROM rem WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
       |         COUNT(*) AS n_windows
       |  FROM (SELECT doc_id, pos,
       |               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |                              ROWS UNBOUNDED PRECEDING) AS island
       |        FROM isl)
       |  GROUP BY doc_id, island)""".stripMargin

  /** Span-cut apply tail; expects a `btoks` CTE naming the documents to
    * rebuild (the full corpus, or just the batch in the incremental
    * form). */
  private val substringApplySql: String =
    s"""cov AS (
       |  SELECT doc_id, UNNEST(range(span_start, span_end + 1)) AS p FROM spans),
       |pos_tok AS (
       |  SELECT doc_id, UNNEST(t) AS tok, UNNEST(range(0, len(t))) AS p FROM btoks),
       |kept AS (
       |  SELECT pt.doc_id, string_agg(pt.tok, ' ' ORDER BY pt.p) AS ct,
       |         COUNT(*) AS kept_n
       |  FROM pos_tok pt LEFT JOIN cov c ON pt.doc_id = c.doc_id AND pt.p = c.p
       |  WHERE c.p IS NULL GROUP BY pt.doc_id)
       |SELECT t.doc_id, coalesce(k.ct, '') AS clean_text,
       |       CAST(len(t.t) AS BIGINT) AS total_tokens,
       |       CAST(len(t.t) - coalesce(k.kept_n, 0) AS BIGINT) AS removed_tokens
       |FROM btoks t LEFT JOIN kept k ON t.doc_id = k.doc_id""".stripMargin

  private val substringSpansCte: String =
    s"""$substringOccSql,
       |rem AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |           row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
       |    FROM occ)
       |  WHERE rn > 1),
       |$substringMergeSql""".stripMargin

  val substringDupSpansOracle: String =
    s"""WITH $substringSpansCte
       |SELECT doc_id, CAST(span_start AS INT) AS span_start,
       |       CAST(span_end AS INT) AS span_end, n_windows
       |FROM spans
       |""".stripMargin

  val substringDedupOracle: String =
    s"""WITH $substringSpansCte,
       |btoks AS (SELECT * FROM toks),
       |$substringApplySql
       |""".stripMargin

  val substringDedupIncrOracle: String =
    s"""WITH $substringOccSql,
       |bocc AS (SELECT * FROM occ WHERE doc_id % 10 = 7),
       |cset AS (SELECT DISTINCT gh FROM occ WHERE doc_id % 10 <> 7),
       |rem AS (
       |  SELECT r.doc_id, r.pos
       |  FROM (SELECT doc_id, pos, gh,
       |               row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
       |        FROM bocc) r
       |  LEFT JOIN cset c ON r.gh = c.gh
       |  WHERE c.gh IS NOT NULL OR r.rn > 1),
       |$substringMergeSql,
       |btoks AS (SELECT * FROM toks WHERE doc_id % 10 = 7),
       |$substringApplySql
       |""".stripMargin

  val decontaminateSpansOracle: String =
    s"""WITH $substringOccSql,
       |eset AS (SELECT DISTINCT gh FROM occ WHERE doc_id % 10 = 0),
       |rem AS (
       |  SELECT o.doc_id, o.pos
       |  FROM occ o JOIN eset e ON o.gh = e.gh
       |  WHERE o.doc_id % 10 <> 0),
       |$substringMergeSql,
       |btoks AS (SELECT * FROM toks WHERE doc_id % 10 <> 0),
       |$substringApplySql
       |""".stripMargin

  /** Registration for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_pack" -> (curationPack _),
    "pii_counts" -> (piiCounts _),
    "pii_redact" -> (piiRedact _),
    "weighted_sample" -> (weightedSample _),
    "pack_sequences" -> (packSequences _),
    "pack_sequences_sharded" -> (packSequencesSharded _),
    "decontaminate" -> (decontaminate _),
    "repetition_score" -> (repetitionScore _),
    "bigram_stats" -> (bigramStats _),
    "curation_pipeline" -> (curationPipeline _),
    "doc_chunks" -> (docChunks _),
    "stratified_sample" -> (stratifiedSample _),
    "dataset_split" -> (datasetSplit _),
    "exact_dedup" -> (exactDedup _),
    "minhash_lsh_pairs" -> (minhashLshPairs _),
    "dedup_incremental" -> (dedupIncremental _),
    "simhash_docs" -> (simhashDocs _),
    "simhash_pairs" -> (simhashPairs _),
    "ngram_jaccard" -> (ngramJaccardBlocked _),
    "cosine_topk" -> (cosineTopK _),
    "cosine_topk_agg" -> (cosineTopKAgg _),
    "ann_sign_lsh" -> (annSignLsh _),
    "ann_multiprobe" -> (annMultiProbe _),
    "lang_id" -> (langId _),
    "text_quality" -> (textQuality _),
    "gopher_quality" -> (gopherQuality _),
    "gopher_quality_paper" -> (gopherQualityPaper _),
    "token_counts" -> (tokenCounts _),
    "doc_fingerprint" -> (docFingerprint _),
    "kmv_distinct" -> (kmvDistinct _),
    "kmv_distinct_agg" -> (kmvDistinctAgg _),
    "tfidf_topk" -> (tfidfTopK _),
    "tfidf_topk_agg" -> (tfidfTopKAgg _),
    "balanced_sample" -> (balancedSample _),
    "token_budget_sample" -> (tokenBudgetSample _),
    "domain_mix_sample" -> (domainMixSample _),
    "paragraph_dedup" -> (paragraphDedup _),
    "substring_dup_spans" -> (substringDupSpans _),
    "substring_dedup" -> (substringDedup _),
    "substring_dedup_incr" -> (substringDedupIncr _),
    "decontaminate_spans" -> (decontaminateSpans _),
  )

  val oracles: Map[String, String] = Map(
    "decontaminate" -> decontaminateOracle,
    "repetition_score" -> repetitionScoreOracle,
    "bigram_stats" -> bigramStatsOracle,
    "curation_pack" -> curationPackOracle,
    "pii_counts" -> piiCountsOracle,
    "pii_redact" -> piiRedactOracle,
    "weighted_sample" -> weightedSampleOracle,
    "pack_sequences" -> packSequencesOracle,
    "pack_sequences_sharded" -> packSequencesShardedOracle,
    "curation_pipeline" -> curationPipelineOracle,
    "doc_chunks" -> docChunksOracle,
    "stratified_sample" -> stratifiedSampleOracle,
    "dataset_split" -> datasetSplitOracle,
    "domain_mix_sample" -> domainMixSampleOracle,
    "paragraph_dedup" -> paragraphDedupOracle,
    "substring_dup_spans" -> substringDupSpansOracle,
    "substring_dedup" -> substringDedupOracle,
    "substring_dedup_incr" -> substringDedupIncrOracle,
    "decontaminate_spans" -> decontaminateSpansOracle,
    "exact_dedup" -> exactDedupOracle,
    "minhash_lsh_pairs" -> minhashLshPairsOracle,
    "dedup_incremental" -> dedupIncrementalOracle,
    "simhash_docs" -> simhashDocsOracle,
    "simhash_pairs" -> simhashPairsOracle,
    "ngram_jaccard" -> ngramJaccardBlockedOracle,
    "cosine_topk" -> cosineTopKOracle,
    "cosine_topk_agg" -> cosineTopKOracle, // same rows, single-shuffle plan
    "ann_sign_lsh" -> annSignLshOracle,
    "ann_multiprobe" -> annMultiProbeOracle,
    "lang_id" -> langIdOracle,
    "text_quality" -> textQualityOracle,
    "gopher_quality" -> gopherQualityOracle,
    "gopher_quality_paper" -> gopherQualityPaperOracle,
    "token_counts" -> tokenCountsOracle,
    "doc_fingerprint" -> docFingerprintOracle,
    "kmv_distinct" -> kmvDistinctOracle,
    "kmv_distinct_agg" -> kmvDistinctOracle, // same estimate, different plan
    "tfidf_topk" -> tfidfTopKOracle,
    "tfidf_topk_agg" -> tfidfTopKAggOracle,
    "balanced_sample" -> balancedSampleOracle,
    "token_budget_sample" -> tokenBudgetSampleOracle,
  )
}
