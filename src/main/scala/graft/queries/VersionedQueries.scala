package graft.queries

import graft.Tables
import graft.io.Versioned
import graft.ops.MaterializedAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the versioned table + its DataSource V2
  * format + incremental view maintenance. Each query BUILDS a fresh
  * versioned table from the sf parquet (orders split into three commits by
  * `o_orderkey % 3` — a deterministic partition the DuckDB oracle can
  * reproduce with a WHERE clause), exercises the commit/read machinery for
  * real, and returns an aggregate whose oracle runs over the original
  * parquet. The build cost is the point: these queries keep the write path
  * (atomic commits), the read path (snapshot/time-travel/CDC through the
  * `graft-versioned` format), and the maintenance path (delta folding)
  * under the same rows+schema+hash gate as every pure read.
  */
object VersionedQueries {

  private val D = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Rebuild `orders` as a 3-commit versioned table under java.io.tmpdir,
    * keyed by the sf dir so scale factors never collide. Rebuilt from
    * scratch on every call: version numbers (1,2,3) stay deterministic
    * across repeated runs in one JVM (warmup + timed bench iterations). */
  private def buildSource(spark: SparkSession, sfDir: String): String = {
    val root = QueryScratch.freshRoot("graft_versioned_src", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 2).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m), root)
    }
    root
  }

  private def priorityAgg(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))

  private val oracleSelect =
    """SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders""".stripMargin

  /** Newest snapshot through the DSv2 format: all three commits = the whole
    * orders table, scanned by the native parquet path the format delegates
    * to (pushdown/pruning proven in VersionedFormatSpec). */
  def versionedSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    priorityAgg(spark.read.format("graft-versioned").load(root))
  }

  val versionedSnapshotOracle: String =
    s"$oracleSelect GROUP BY 1, 2"

  /** The CONCURRENT-writer twin of [[versionedSnapshot]]: three driver
    * THREADS race [[Versioned.commitOcc]] on the disjoint
    * `o_orderkey % 3` slices with no coordination. Version ORDER is
    * nondeterministic (whoever wins each publish race), but the final
    * snapshot content is the exact union of the three slices — which is
    * precisely what the oracle checks (the driver sorts rows before
    * hashing, so commit order cannot leak into the comparison). This
    * keeps the OCC protocol's no-lost-updates guarantee under the same
    * rows+schema+hash gate as every sequential query. */
  def versionedOcc(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_occ_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val start = new java.util.concurrent.CountDownLatch(1)
    try {
      val futs = (0 to 2).map { m =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            start.await()
            Versioned.commitOcc(spark,
              orders.filter(pmod(col("o_orderkey"), lit(3)) === m), root)
          }
        })
      }
      start.countDown()
      val published = futs.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      require(published.sorted == Seq(1L, 2L, 3L),
        s"three racing appends must publish v1..v3, got $published")
    } finally pool.shutdownNow()
    priorityAgg(spark.read.format("graft-versioned").load(root))
  }

  val versionedOccOracle: String = versionedSnapshotOracle

  /** Time travel to v2 = the first two commits (o_orderkey % 3 IN (0, 1)):
    * the snapshot a reader pinned before the third load landed. */
  def versionedTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    priorityAgg(spark.read.format("graft-versioned").option("asOf", "2").load(root))
  }

  val versionedTimeTravelOracle: String =
    s"$oracleSelect WHERE o_orderkey % 3 IN (0, 1) GROUP BY 1, 2"

  /** CDC read: everything appended after v1 (commits 2 and 3) — the
    * exactly-once consumer's view of the new batches, no table replay. */
  def versionedChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    priorityAgg(spark.read.format("graft-versioned").option("changesFrom", "1").load(root))
  }

  val versionedChangesOracle: String =
    s"$oracleSelect WHERE o_orderkey % 3 IN (1, 2) GROUP BY 1, 2"

  /** Incrementally-maintained aggregate: refresh the state view after each
    * of the three commits (each refresh reads only that commit's files),
    * then return the final state — which must be bit-identical to one
    * aggregation over the whole table (the oracle). */
  def incrAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val srcRoot = QueryScratch.freshRoot("graft_incr_src", sfDir)
    val stateRoot = QueryScratch.freshRoot("graft_incr_state", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 2).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m), srcRoot)
      MaterializedAgg.refresh(spark, srcRoot, stateRoot,
        keys = Seq("o_orderpriority"), sumCols = Seq("o_totalprice"))
    }
    Versioned.read(spark, stateRoot)
      .select(col("o_orderpriority").as("priority"), col("cnt"),
        col("sum_o_totalprice").cast("double").as("sum_price"))
  }

  val incrAggOracle: String =
    """SELECT o_orderpriority AS priority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1""".stripMargin

  /** Copy-on-write MERGE: double the price of every 7th order (updates,
    * replacing rows in exactly the files that hold them) and insert the
    * same volume of brand-new keys (+100M — disjoint from real keys and
    * from the update keys: 100M ≡ 2 (mod 7), so insert keys ≡ 3). The
    * final snapshot through the DSv2 format must equal the oracle's
    * anti-join + union restatement of MERGE. */
  def versionedMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val updates = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(7)) === 1)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    Versioned.mergeInto(spark, root, updates.unionByName(inserts), Seq("o_orderkey"))
    priorityAgg(spark.read.format("graft-versioned").load(root))
  }

  val versionedMergeOracle: String =
    """WITH src AS (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |         o_totalprice * 2 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_orderstatus, o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 1
      |), merged AS (
      |  SELECT o_orderstatus, o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      |  UNION ALL
      |  SELECT o_orderstatus, o_orderpriority, o_totalprice FROM src
      |)
      |SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM merged GROUP BY 1, 2""".stripMargin

  /** Row-level version diff across a copy-on-write delete: v3 is the full
    * table, v4 removes every 5th order by rewriting only the files that
    * held them. diffVersions reads just the differing files; the
    * rewritten-but-surviving rows cancel in the multiset EXCEPT, so the
    * diff is exactly the deleted rows flagged 'delete' — which the oracle
    * states directly as a WHERE over the original table. */
  def versionedDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    Versioned.deleteWhere(spark, root, pmod(col("o_orderkey"), lit(5)) === 0)
    Versioned.diffVersions(spark, root, fromV = 3)
      .groupBy(col("_change"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
  }

  val versionedDiffOracle: String =
    """SELECT 'delete' AS _change, o_orderstatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1, 2""".stripMargin

  /** Build the 3-commit orders table at a catalog-addressable root
    * (<stable warehouse>/sql/<table>) and arm the live session: catalog
    * registered under `graft_sqlq`, optimizer rules injected so SQL
    * UPDATE/MERGE rewrite onto the copy-on-write library core. The
    * warehouse path is ONE fixed dir — NOT keyed by sfDir — because
    * Spark caches the catalog instance on first resolution: a per-sfDir
    * path would pin the catalog to whichever sfDir ran first (Bench's
    * warmup runs sf0.001 before the timed sfDir, which would silently
    * re-time the warmup-scale table). Each call wipes and rebuilds its
    * own TABLE root from the CURRENT sfDir, so calls stay
    * self-consistent and version numbers deterministic across warmup +
    * timed iterations. */
  private[graft] def buildSqlTable(spark: SparkSession, sfDir: String,
                                   table: String): (String, String) = {
    graft.GraftExtensions.injectOptimizerRules(spark)
    val wh = new java.io.File(sys.props("java.io.tmpdir"), "graft_sqlwh")
      .getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_sqlq",
      classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sqlq.warehouse", wh)
    val root = new java.io.File(new java.io.File(wh, "sql"), table).getAbsolutePath
    QueryScratch.wipe(root)
    val orders = Tables.orders(spark, sfDir)
    (0 to 2).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m), root)
    }
    (s"graft_sqlq.sql.$table", root)
  }

  /** Plain-SQL UPDATE on the versioned catalog table: the statement
    * rewrites onto the copy-on-write [[Versioned.updateWhere]] (only
    * files holding matches are rewritten, one atomic commit), and the
    * read-back goes through the catalog too — the whole round trip is
    * the SQL surface a warehouse user touches. */
  def versionedSqlUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val (ident, _) = buildSqlTable(spark, sfDir, "orders_u")
    spark.sql(s"UPDATE $ident SET o_totalprice = o_totalprice * 2 " +
      "WHERE pmod(o_orderkey, 7) = 0")
    priorityAgg(spark.table(ident))
  }

  val versionedSqlUpdateOracle: String =
    """WITH updated AS (
      |  SELECT o_orderstatus, o_orderpriority,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
      |              ELSE o_totalprice END AS o_totalprice
      |  FROM orders
      |)
      |SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM updated GROUP BY 1, 2""".stripMargin

  /** Plain-SQL MERGE (upsert shape: UPDATE SET * / INSERT *) on the
    * versioned catalog table — the reference's central T-SQL operation as
    * one statement, same update/insert split as [[versionedMerge]] so the
    * library path and the SQL path are checked against the same oracle. */
  def versionedSqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val (ident, _) = buildSqlTable(spark, sfDir, "orders_m")
    val orders = Tables.orders(spark, sfDir)
    val updates = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(7)) === 1)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    updates.unionByName(inserts).createOrReplaceTempView("graft_sql_merge_src")
    spark.sql(
      s"""MERGE INTO $ident t USING graft_sql_merge_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    priorityAgg(spark.table(ident))
  }

  val versionedSqlMergeOracle: String = versionedMergeOracle

  /** SQL `CALL` maintenance round trip on the catalog table: restore back
    * to v2 (metadata-only rollback — the table re-reads as the first two
    * commits), then compact_small bin-packs the accreted small files, and
    * the history procedure reports the full 5-version story. The returned
    * aggregate runs over the post-restore content (deterministic: commits
    * 1-2 = o_orderkey % 3 IN (0,1)) with the procedure-observed version
    * count pinned alongside — compaction must change neither rows nor
    * history length beyond its own commit. */
  def versionedCall(spark: SparkSession, sfDir: String): DataFrame = {
    val (ident, _) = buildSqlTable(spark, sfDir, "orders_p")
    val tbl = ident.stripPrefix("graft_sqlq.") // catalog-relative 'sql.orders_p'
    spark.sql(s"CALL graft_sqlq.system.restore('$tbl', 2)")      // v4 = v2 state
    // small_bytes pinned to MaxValue: every file counts as small, so the
    // pack always commits v5 — the DEFAULT threshold would make the
    // version count scale-dependent (files >= 32MB would no-op the call)
    spark.sql(s"CALL graft_sqlq.system.compact_small('$tbl', " +
      s"small_bytes => ${Long.MaxValue}L)")                      // v5, same rows
    val nVersions = spark.sql(s"CALL graft_sqlq.system.history('$tbl')").count()
    priorityAgg(spark.table(ident))
      .withColumn("n_versions", lit(nVersions))
  }

  val versionedCallOracle: String =
    """SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      |       CAST(5 AS BIGINT) AS n_versions
      |FROM orders WHERE o_orderkey % 3 IN (0, 1)
      |GROUP BY 1, 2""".stripMargin

  /** Shallow clone + copy-on-write independence: clone the source at v2
    * (metadata-only — no data copied), delete every 5th order ON THE
    * CLONE (rewrites only the touched files into the clone's own root,
    * carries the rest by absolute reference into the source), and read
    * the result through the DSv2 format. The oracle restates the pinned
    * version's rows minus the delete — the source is never modified. */
  def versionedClone(spark: SparkSession, sfDir: String): DataFrame = {
    val src = buildSource(spark, sfDir)
    val dst = QueryScratch.freshRoot("graft_clone_q", sfDir)
    Versioned.cloneTable(spark, src, dst, asOf = Some(2L))
    Versioned.deleteWhere(spark, dst, pmod(col("o_orderkey"), lit(5)) === 0)
    priorityAgg(spark.read.format("graft-versioned").load(dst))
  }

  val versionedCloneOracle: String =
    s"""$oracleSelect
       |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 <> 0
       |GROUP BY 1, 2""".stripMargin

  /** Retention DELETE on a date-banded table: three commits hold disjoint
    * o_orderdate ranges (footer stats on the date), then
    * `DELETE WHERE o_orderdate < 1995-01-01` — the oldest band is proven
    * all-match by its stats and dropped from the manifest with ZERO I/O,
    * the middle band straddles the cutoff and is rewritten, the newest is
    * proven match-free and carried unprobed (RetentionProofSpec asserts
    * the file-level behavior; this query gates the row-level result). */
  def versionedRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_retention_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    val y94 = java.sql.Timestamp.valueOf("1994-01-01 00:00:00")
    val y96 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val d = col("o_orderdate")
    Versioned.commit(spark, orders.filter(d < y94), root,
      statsCols = Seq("o_orderdate"))
    Versioned.commit(spark, orders.filter(d >= y94 && d < y96), root,
      statsCols = Seq("o_orderdate"))
    Versioned.commit(spark, orders.filter(d >= y96), root,
      statsCols = Seq("o_orderdate"))
    Versioned.deleteWhere(spark, root,
      d < java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
    priorityAgg(spark.read.format("graft-versioned").load(root))
  }

  val versionedRetentionOracle: String =
    s"""$oracleSelect
       |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
       |GROUP BY 1, 2""".stripMargin

  /** The general SQL MERGE clause family end-to-end as one statement:
    * conditional matched UPDATE, matched DELETE (first-match-wins order),
    * conditional NOT MATCHED INSERT, and NOT MATCHED BY SOURCE UPDATE —
    * planned by VersionedRowLevelSqlStrategy onto
    * [[Versioned.mergeIntoConditional]] (probe-pruned touched files,
    * atomic manifest publish). The oracle restates every clause with
    * plain CASE/joins in DuckDB. */
  def versionedSqlMergeCond(spark: SparkSession, sfDir: String): DataFrame = {
    val (ident, _) = buildSqlTable(spark, sfDir, "orders_mc")
    val orders = Tables.orders(spark, sfDir)
    val updates = orders.filter(pmod(col("o_orderkey"), lit(5)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(5)) === 1)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    updates.unionByName(inserts).createOrReplaceTempView("graft_sql_mergec_src")
    spark.sql(
      s"""MERGE INTO $ident t USING graft_sql_mergec_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.o_totalprice > 200000 THEN UPDATE SET *
         |WHEN MATCHED AND t.o_orderkey % 10 = 0 THEN DELETE
         |WHEN NOT MATCHED AND s.o_orderkey % 2 = 1 THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 97 = 3
         |  THEN UPDATE SET o_orderpriority = 'NMBS'""".stripMargin)
    priorityAgg(spark.table(ident))
  }

  val versionedSqlMergeCondOracle: String =
    """WITH a AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, o_orderpriority AS pr,
      |         o_totalprice * 2 AS tp
      |  FROM orders WHERE o_orderkey % 5 = 0
      |), tgt AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, o_orderpriority AS pr,
      |         o_totalprice AS tp
      |  FROM orders
      |), matched AS (
      |  SELECT CASE WHEN a.tp > 200000 THEN a.st ELSE t.st END AS st,
      |         CASE WHEN a.tp > 200000 THEN a.pr ELSE t.pr END AS pr,
      |         CASE WHEN a.tp > 200000 THEN a.tp ELSE t.tp END AS tp,
      |         CASE WHEN a.tp > 200000 THEN 0
      |              WHEN t.k % 10 = 0 THEN 1 ELSE 0 END AS del
      |  FROM tgt t JOIN a ON t.k = a.k
      |), unmatched AS (
      |  SELECT t.st, CASE WHEN t.k % 97 = 3 THEN 'NMBS' ELSE t.pr END AS pr,
      |         t.tp, 0 AS del
      |  FROM tgt t WHERE t.k % 5 <> 0
      |), ins AS (
      |  SELECT o_orderstatus AS st, o_orderpriority AS pr, o_totalprice AS tp,
      |         0 AS del
      |  FROM orders WHERE o_orderkey % 5 = 1 AND o_orderkey % 2 = 1
      |), final AS (
      |  SELECT st, pr, tp FROM matched WHERE del = 0
      |  UNION ALL SELECT st, pr, tp FROM unmatched WHERE del = 0
      |  UNION ALL SELECT st, pr, tp FROM ins WHERE del = 0
      |)
      |SELECT st AS status, pr AS priority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(tp AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM final GROUP BY 1, 2""".stripMargin

  /** Type-widening schema evolution end-to-end: the first commit writes
    * o_orderkey as INT and o_totalprice as FLOAT, later appends use
    * BIGINT/DOUBLE — the recorded schema widens, the old INT32/FLOAT
    * files are served widened by the vectorized reader (no rewrite), and
    * the aggregate over the mixed-physical table matches a plain UNION
    * restatement. Int->long/float->double are exact, so the compare is
    * bit-faithful. */
  def schemaWiden(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_widen_src", sfDir)
    val orders = Tables.orders(spark, sfDir)
    val narrow = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey").cast("int").as("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("float").as("o_totalprice"))
    val wide = orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Versioned.commit(spark, narrow, root)
    Versioned.commit(spark, wide, root)
    spark.read.format("graft-versioned").load(root)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("sum_key"),
        // min/max, not sum: a float-widened double is bit-exact per ROW
        // in both engines, but any accumulation + decimal->double
        // conversion exposes last-ulp rounding differences — extrema
        // compare bit-faithfully with no accumulation at all
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  val schemaWidenOracle: String =
    """WITH u AS (
      |  SELECT o_orderstatus, o_orderkey,
      |         CAST(CAST(o_totalprice AS FLOAT) AS DOUBLE) AS p
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 1
      |)
      |SELECT o_orderstatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
      |       MIN(p) AS min_price, MAX(p) AS max_price
      |FROM u GROUP BY 1""".stripMargin

  /** Commit-time CHECK constraints end-to-end: half of orders commits,
    * a `price_pos` constraint is recorded (metadata-only), a batch with
    * negated prices is REJECTED atomically (no version, no data), the
    * other half commits fine, and the final aggregate over the whole
    * table — plus pinned flags proving the rejection happened and the
    * constraint is live — matches a plain restatement. */
  def versionedConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_check_src", sfDir)
    val orders = Tables.orders(spark, sfDir)
    Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), root)
    Versioned.addConstraint(spark, root, "price_pos", "o_totalprice > 0")
    val rejected = scala.util.Try(Versioned.commit(spark,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .withColumn("o_totalprice", col("o_totalprice") * -1), root)).isFailure
    Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), root)
    priorityAgg(spark.read.format("graft-versioned").load(root))
      .withColumn("rejected", lit(rejected))
      .withColumn("n_constraints",
        lit(Versioned.constraints(spark, root).size))
  }

  val versionedConstraintsOracle: String =
    """SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      |       CAST(1 AS BOOLEAN) AS rejected,
      |       CAST(1 AS INTEGER) AS n_constraints
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** Merge-on-read DELETE: two deletion-vector deletes over the 3-commit
    * table — scattered predicates the stats proofs cannot touch, so every
    * file gets a vector (the second delete UNIONS into the first's) and
    * NO data file is rewritten (the point: at 100 TB this commit is
    * sidecars + manifest). The read goes through the library path, which
    * applies the vectors; the oracle replays the deletes as a WHERE. */
  def versionedDvDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_dv_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 2).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m),
        root, statsCols = Seq("o_orderkey"))
    }
    Versioned.deleteWhereDv(spark, root, pmod(col("o_orderkey"), lit(7)) === 0)
    Versioned.deleteWhereDv(spark, root, pmod(col("o_orderkey"), lit(7)) === 1)
    priorityAgg(Versioned.read(spark, root))
  }

  val versionedDvDeleteOracle: String =
    s"$oracleSelect WHERE o_orderkey % 7 NOT IN (0, 1) GROUP BY 1, 2"

  /** The materialize half: vector the table, then fold the vectors into
    * the data files (rewriting exactly the vectored files) — after which
    * the DSv2 scan is re-admitted and must see the identical content the
    * vectored read produced. Same oracle as [[versionedDvDelete]]: the
    * two representations (vectors applied at read vs materialized) are
    * indistinguishable to a reader, which is the whole contract. */
  def versionedDvMaterialize(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_dv_mat_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 2).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m),
        root, statsCols = Seq("o_orderkey"))
    }
    Versioned.deleteWhereDv(spark, root, pmod(col("o_orderkey"), lit(7)) === 0)
    Versioned.deleteWhereDv(spark, root, pmod(col("o_orderkey"), lit(7)) === 1)
    Versioned.dvMaterialize(spark, root)
    priorityAgg(spark.read.format("graft-versioned").load(root))
  }

  val versionedDvMaterializeOracle: String = versionedDvDeleteOracle

  /** Selective (thresholded) materialization: a ~1% scatter-delete lands
    * light vectors on every band, a second delete kills half of band 1 —
    * then `dvMaterialize(minDeadRatio = 0.25)` rewrites ONLY the
    * heavy-dead band, the light vectors survive and keep applying at
    * read. The oracle can't see the write amplification (the spec
    * asserts that); what it proves is the partial pass loses and
    * resurrects nothing — partial-materialized and vectored reads are
    * indistinguishable. */
  def versionedDvMaterializePartial(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_dv_matp_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 2).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m),
        root, statsCols = Seq("o_orderkey"))
    }
    Versioned.deleteWhereDv(spark, root, pmod(col("o_orderkey"), lit(97)) === 0)
    Versioned.deleteWhereDv(spark, root,
      pmod(col("o_orderkey"), lit(3)) === 1 && pmod(col("o_orderkey"), lit(2)) === 0)
    Versioned.dvMaterialize(spark, root, minDeadRatio = 0.25)
    priorityAgg(Versioned.read(spark, root))
  }

  val versionedDvMaterializePartialOracle: String =
    s"""$oracleSelect WHERE o_orderkey % 97 <> 0
       |AND NOT (o_orderkey % 3 = 1 AND o_orderkey % 2 = 0)
       |GROUP BY 1, 2""".stripMargin

  /** Keyed change-data-feed: against the v3 baseline, v4 UPDATEs every
    * %7 key's priority, v5 DELETEs every %11 key, v6 INSERTs fresh
    * (shifted) keys — then [[Versioned.diffVersionsKeyed]] classifies
    * the whole window into update_preimage/update_postimage (the %7 keys
    * that survived the delete), delete (%11 keys — including %7 ones
    * whose update was later deleted, which must surface their ORIGINAL
    * image), and insert (the shifted keys). The oracle replays the
    * classification as plain WHERE algebra over the source table. */
  def versionedCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    Versioned.updateWhere(spark, root, pmod(col("o_orderkey"), lit(7)) === 0,
      Map("o_orderpriority" -> lit("0-CDF")))
    Versioned.deleteWhere(spark, root, pmod(col("o_orderkey"), lit(11)) === 0)
    Versioned.commit(spark,
      Tables.orders(spark, sfDir).filter(pmod(col("o_orderkey"), lit(13)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)), root)
    Versioned.diffVersionsKeyed(spark, root, fromV = 3, keys = Seq("o_orderkey"))
      .groupBy(col("_change_type"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
  }

  val versionedCdfOracle: String =
    """WITH agg AS (
      |  SELECT 'delete' AS _change_type, o_orderpriority AS priority,
      |         o_totalprice FROM orders WHERE o_orderkey % 11 = 0
      |  UNION ALL
      |  SELECT 'update_preimage', o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
      |  UNION ALL
      |  SELECT 'update_postimage', '0-CDF', o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
      |  UNION ALL
      |  SELECT 'insert', o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 13 = 0)
      |SELECT _change_type, priority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM agg GROUP BY 1, 2""".stripMargin

  /** Merge-on-read UPDATE: every %7 key's priority and price change via
    * deletion vectors + one appended batch — zero existing files
    * rewritten (the manifest after the update is the manifest before
    * plus the appended batch plus #dv lines). Same final content as a
    * copy-on-write update, which is what the oracle checks. */
  def versionedDvUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    Versioned.updateWhereDv(spark, root, pmod(col("o_orderkey"), lit(7)) === 0,
      Map("o_orderpriority" -> lit("0-MOR"),
        "o_totalprice" -> (col("o_totalprice") * 2)))
    priorityAgg(Versioned.read(spark, root))
  }

  val versionedDvUpdateOracle: String =
    """WITH updated AS (
      |  SELECT o_orderstatus, o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0
      |  UNION ALL
      |  SELECT o_orderstatus, '0-MOR', o_totalprice * 2
      |  FROM orders WHERE o_orderkey % 7 = 0
      |)
      |SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM updated GROUP BY 1, 2""".stripMargin

  /** Merge-on-read MERGE, [[versionedMerge]]'s exact workload through
    * [[Versioned.mergeIntoDv]]: matched keys die via vectors, the whole
    * source appends, no existing file rewritten — and the final content
    * must be indistinguishable from the copy-on-write merge (same
    * oracle). */
  def versionedDvMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildSource(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val updates = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = orders.filter(pmod(col("o_orderkey"), lit(7)) === 1)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    Versioned.mergeIntoDv(spark, root, updates.unionByName(inserts),
      Seq("o_orderkey"))
    priorityAgg(Versioned.read(spark, root))
  }

  val versionedDvMergeOracle: String = versionedMergeOracle

  /** Metadata-only DROP COLUMN mid-history: two bands commit with
    * `o_custkey`, the column is dropped (no file rewritten), a third
    * band appends WITHOUT it, and the final read aggregates the
    * narrower schema over all three bands — old files project through
    * the recorded schema, so the dropped values never surface and the
    * post-drop append needs no knowledge of the column ever existing. */
  def versionedDropColumn(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_dropcol_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 1).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m),
        root, statsCols = Seq("o_orderkey"))
    }
    Versioned.dropColumns(spark, root, Seq("o_custkey"))
    Versioned.commit(spark,
      orders.filter(pmod(col("o_orderkey"), lit(3)) === 2).drop("o_custkey"), root)
    priorityAgg(Versioned.read(spark, root))
  }

  val versionedDropColumnOracle: String =
    s"$oracleSelect GROUP BY 1, 2"

  /** Metadata-only RENAME COLUMN via field-id mapping: two bands commit
    * under `o_totalprice`, the column is renamed to `price` (no file
    * rewritten — the field id stays and readers match files by id), a
    * third band appends under the NEW name, and the result unions two
    * legs: the full snapshot aggregated through the renamed column (old
    * files served by id) and the PRE-rename snapshot aggregated through
    * the old name (per-version schemas across the rename). */
  def versionedRename(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_rename_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    (0 to 1).foreach { m =>
      Versioned.commit(spark, orders.filter(pmod(col("o_orderkey"), lit(3)) === m),
        root, statsCols = Seq("o_orderkey"))
    }
    Versioned.renameColumn(spark, root, "o_totalprice", "price")
    Versioned.commit(spark,
      orders.filter(pmod(col("o_orderkey"), lit(3)) === 2)
        .withColumnRenamed("o_totalprice", "price"), root)
    def agg(df: DataFrame, priceCol: String, leg: String): DataFrame =
      df.groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("cnt"),
          sum(col(priceCol).cast(D)).cast("double").as("sum_price"))
        .withColumn("leg", lit(leg))
    agg(Versioned.read(spark, root), "price", "renamed_all")
      .unionByName(agg(Versioned.read(spark, root, asOf = Some(2L)),
        "o_totalprice", "pre_rename"))
  }

  /** The SQL TVF surface end-to-end under the driver gate: the same
    * 3-commit table, read back ENTIRELY through `spark.sql` over the
    * registered table functions — `graft_table_changes(root, 1, 3)` (the
    * unkeyed append window: bands 1-2 as inserts) and, after an UPDATE
    * commit, `graft_table_changes_keyed(root, 3, 4, 'o_orderkey')` (the
    * keyed classification: update_preimage/update_postimage pairs).
    * Pins the literal-argument analysis-time builder path
    * (GraftExtensions.tableRegistrations) that was previously
    * spec-covered only. */
  def versionedChangesSql(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val root = buildSource(spark, sfDir)
    Versioned.updateWhere(spark, root, pmod(col("o_orderkey"), lit(7)) === 0,
      Map("o_totalprice" -> (col("o_totalprice") * 2)))
    val window = spark.sql(
      s"SELECT * FROM graft_table_changes('$root', 1, 3)")
      .filter(col("_change") === "insert")
      .groupBy(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
    val keyed = spark.sql(
      s"SELECT * FROM graft_table_changes_keyed('$root', 3, 4, 'o_orderkey')")
      .groupBy(lit("UPD").as("status"), col("_change_type").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
    window.unionByName(keyed)
  }

  val versionedChangesSqlOracle: String =
    """SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey % 3 <> 0 GROUP BY 1, 2
      |UNION ALL
      |SELECT 'UPD' AS status, 'update_preimage' AS priority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey % 7 = 0
      |UNION ALL
      |SELECT 'UPD' AS status, 'update_postimage' AS priority, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin

  val versionedRenameOracle: String =
    """SELECT o_orderstatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      |       'renamed_all' AS leg
      |FROM orders GROUP BY 1
      |UNION ALL
      |SELECT o_orderstatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      |       'pre_rename' AS leg
      |FROM orders WHERE o_orderkey % 3 < 2 GROUP BY 1""".stripMargin

  /** The rename-then-maintain lifecycle under the driver gate: a
    * key-banded table (stats on the key) is RENAMED — which quarantines
    * every sidecar entry under the old name (`#statsdead`) — then
    * `reharvestStats` sheds the guards WITHOUT rewriting data (footer
    * reads resolve the renamed column by field id), and a retention
    * DELETE on the renamed key must run fully stats-proven again: the
    * old band drops metadata-only. `files_added_by_delete` pins that
    * last fact in the compared result — a scan-path delete would write
    * a rewrite batch and break the oracle's constant 0. */
  def versionedReharvest(spark: SparkSession, sfDir: String): DataFrame = {
    val root = QueryScratch.freshRoot("graft_reharvest_q", sfDir)
    val orders = Tables.orders(spark, sfDir)
    val maxKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val (cut1, cut2) = (maxKey / 3, 2 * maxKey / 3)
    val k = col("o_orderkey")
    Versioned.commit(spark, orders.filter(k <= cut1).coalesce(1),
      root, statsCols = Seq("o_orderkey"))
    Versioned.commit(spark, orders.filter(k > cut1 && k <= cut2).coalesce(1),
      root, statsCols = Seq("o_orderkey"))
    Versioned.commit(spark, orders.filter(k > cut2).coalesce(1),
      root, statsCols = Seq("o_orderkey"))
    Versioned.renameColumn(spark, root, "o_orderkey", "okey")
    val r = Versioned.reharvestStats(spark, root)
    require(r.shedNames == Seq("o_orderkey") && r.restattedCols == Seq("okey"),
      s"reharvest plan drifted: $r")
    Versioned.deleteWhere(spark, root, col("okey") <= cut1)
    val addedRow = Versioned.history(spark, root)
      .orderBy(col("version").desc).select("files_added").head()
    val added = if (addedRow.isNullAt(0)) -1L else addedRow.getLong(0)
    Versioned.read(spark, root)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
      .withColumn("files_added_by_delete", lit(added))
  }

  val versionedReharvestOracle: String =
    """SELECT o_orderstatus AS status, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
      |       CAST(0 AS BIGINT) AS files_added_by_delete
      |FROM orders
      |WHERE o_orderkey > (SELECT CAST(FLOOR(MAX(o_orderkey)/3.0) AS BIGINT)
      |                    FROM orders)
      |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "versioned_reharvest" -> (versionedReharvest _),
    "versioned_cdf" -> (versionedCdf _),
    "versioned_dv_update" -> (versionedDvUpdate _),
    "versioned_dv_merge" -> (versionedDvMerge _),
    "versioned_dv" -> (versionedDvDelete _),
    "versioned_dv_mat" -> (versionedDvMaterialize _),
    "versioned_dv_mat_partial" -> (versionedDvMaterializePartial _),
    "versioned_drop_column" -> (versionedDropColumn _),
    "versioned_rename" -> (versionedRename _),
    "versioned_changes_sql" -> (versionedChangesSql _),
    "versioned_snapshot" -> (versionedSnapshot _),
    "versioned_occ" -> (versionedOcc _),
    "versioned_time_travel" -> (versionedTimeTravel _),
    "versioned_changes" -> (versionedChanges _),
    "incr_agg" -> (incrAgg _),
    "versioned_merge" -> (versionedMerge _),
    "versioned_diff" -> (versionedDiff _),
    "versioned_sql_update" -> (versionedSqlUpdate _),
    "versioned_sql_merge" -> (versionedSqlMerge _),
    "versioned_sql_merge_cond" -> (versionedSqlMergeCond _),
    "schema_widen" -> (schemaWiden _),
    "versioned_constraints" -> (versionedConstraints _),
    "versioned_call" -> (versionedCall _),
    "versioned_clone" -> (versionedClone _),
    "versioned_retention" -> (versionedRetention _),
  )

  def oracles: Map[String, String] = Map(
    "versioned_reharvest" -> versionedReharvestOracle,
    "versioned_cdf" -> versionedCdfOracle,
    "versioned_dv_update" -> versionedDvUpdateOracle,
    "versioned_dv_merge" -> versionedDvMergeOracle,
    "versioned_dv" -> versionedDvDeleteOracle,
    "versioned_dv_mat" -> versionedDvMaterializeOracle,
    "versioned_dv_mat_partial" -> versionedDvMaterializePartialOracle,
    "versioned_drop_column" -> versionedDropColumnOracle,
    "versioned_rename" -> versionedRenameOracle,
    "versioned_changes_sql" -> versionedChangesSqlOracle,
    "versioned_snapshot" -> versionedSnapshotOracle,
    "versioned_occ" -> versionedOccOracle,
    "versioned_time_travel" -> versionedTimeTravelOracle,
    "versioned_changes" -> versionedChangesOracle,
    "incr_agg" -> incrAggOracle,
    "versioned_merge" -> versionedMergeOracle,
    "versioned_diff" -> versionedDiffOracle,
    "versioned_sql_update" -> versionedSqlUpdateOracle,
    "versioned_sql_merge" -> versionedSqlMergeOracle,
    "versioned_sql_merge_cond" -> versionedSqlMergeCondOracle,
    "schema_widen" -> schemaWidenOracle,
    "versioned_constraints" -> versionedConstraintsOracle,
    "versioned_call" -> versionedCallOracle,
    "versioned_clone" -> versionedCloneOracle,
    "versioned_retention" -> versionedRetentionOracle,
  )
}
