package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL `CALL` surface for the versioned table's maintenance operations —
  * the reference's out-of-band upkeep (re-extracting, archiving, manual
  * cleanup of staging outputs; e.g. pipelines/etl_utils.py's processed-file
  * moves) generalized to the lake-table maintenance a warehouse operator
  * actually runs, one statement each:
  *
  * {{{
  *   CALL graft.system.history('ns.tbl')                 -- DESCRIBE HISTORY
  *   CALL graft.system.restore('ns.tbl', 3)              -- rollback (metadata-only)
  *   CALL graft.system.vacuum('ns.tbl', keep => 2)       -- count-based GC
  *   CALL graft.system.vacuum_older_than('ns.tbl', TIMESTAMP'2026-01-01')
  *   CALL graft.system.compact('ns.tbl', 8, 'k')         -- full OPTIMIZE
  *   CALL graft.system.compact_small('ns.tbl')           -- incremental OPTIMIZE
  *   CALL graft.system.zorder('ns.tbl', 'a,b,c', 8)      -- multi-dim layout
  * }}}
  *
  * Implemented on Spark's DSv2 procedure API ([[VersionedCatalog]] is the
  * `ProcedureCatalog`): each procedure binds rigidly (fixed IN parameters,
  * defaults filled by the analyzer), delegates to the existing library core
  * ([[Versioned]].history/restore/vacuum/compactLatest/compactSmall/
  * commitZOrderedN — one atomic manifest publish each), and returns its
  * result rows through a driver-local scan: every result here is
  * metadata-sized (history rows, a new version number, a removed-count) —
  * table-scale data never flows through a procedure result.
  *
  * Table arguments are catalog-relative (`'ns.tbl'` under THIS catalog's
  * warehouse), so a statement can never reach outside the warehouse root.
  */
private[io] object VersionedProcedures {

  /** One rigid procedure: fixed params, fixed result schema, a body from
    * (session, catalog-relative-name -> root resolver, coerced+default-
    * filled args) to metadata-sized result rows. Bodies resolve their own
    * table argument(s) — most require an EXISTING table ([[existing]]);
    * clone's target must be fresh, so resolution stays per-body. */
  private final case class Spec(
      name: String,
      description: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      body: (SparkSession, String => String, InternalRow) => Array[InternalRow])

  /** Resolve arg `i` as a table that must already exist — maintenance on a
    * never-committed table is always a caller error (history would
    * silently report an empty story otherwise). */
  private def existing(spark: SparkSession, rootFor: String => String,
                       input: InternalRow, i: Int): String = {
    val name = str(input, i, "table")
    val root = rootFor(name)
    require(Versioned.versions(spark, root).nonEmpty,
      s"table $name does not exist (no committed versions at $root)")
    root
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def row(vs: Any*): Array[InternalRow] =
    Array(new GenericInternalRow(vs.toArray))

  private def str(input: InternalRow, i: Int, what: String): String = {
    require(!input.isNullAt(i), s"$what must not be null")
    input.getUTF8String(i).toString
  }

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private val newVersion = StructType(Seq(StructField("version", LongType, nullable = false)))
  private val removedCount = StructType(Seq(StructField("removed_versions", IntegerType, nullable = false)))

  private val specs: Map[String, Spec] = Seq(
    Spec("history", "one row per committed version (metadata-only)",
      Array(in("table", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = false),
        StructField("tag", StringType, nullable = true),
        StructField("num_files", LongType, nullable = false),
        StructField("total_bytes", LongType, nullable = false),
        StructField("files_added", LongType, nullable = true),
        StructField("operation", StringType, nullable = true))),
      (spark, rootFor, input) =>
        // executeCollect returns driver-copied InternalRows in the exact
        // result schema above (history's own column order)
        Versioned.history(spark, existing(spark, rootFor, input, 0))
          .queryExecution.executedPlan.executeCollect()),

    Spec("restore", "roll the table back to an old version as a new metadata-only commit",
      Array(in("table", StringType), in("version", LongType)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.restore(
        spark, existing(spark, rootFor, input, 0), input.getLong(1)))),

    Spec("vacuum", "drop all but the newest `keep` versions, then GC unreferenced files",
      Array(in("table", StringType), inDefault("keep", IntegerType, "1")),
      removedCount,
      (spark, rootFor, input) => {
        val root = existing(spark, rootFor, input, 0)
        val before = Versioned.versions(spark, root).size
        Versioned.vacuum(spark, root, keepVersions = input.getInt(1))
        row(before - Versioned.versions(spark, root).size)
      }),

    Spec("vacuum_dry_run", "list what vacuum WOULD reclaim (unreferenced files/vectors, dead dirs, expiring manifests) without deleting anything",
      Array(in("table", StringType), inDefault("keep", IntegerType, "1")),
      StructType(Seq(StructField("path", StringType, nullable = false))),
      (spark, rootFor, input) =>
        Versioned.vacuumDryRun(spark, existing(spark, rootFor, input, 0),
          keepVersions = input.getInt(1))
          .map(p => InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(p)))
          .toArray),

    Spec("vacuum_older_than", "drop versions published before the cutoff, then GC",
      Array(in("table", StringType), in("cutoff", TimestampType)),
      removedCount,
      (spark, rootFor, input) => {
        val root = existing(spark, rootFor, input, 0)
        val before = Versioned.versions(spark, root).size
        // TimestampType args arrive as micros since epoch
        Versioned.vacuumOlderThan(spark, root, input.getLong(1) / 1000L)
        row(before - Versioned.versions(spark, root).size)
      }),

    Spec("compact", "full rewrite into n_files outputs (optionally range-sorted on sort_cols)",
      Array(in("table", StringType), in("n_files", IntegerType),
        inDefault("sort_cols", StringType, "''")),
      newVersion,
      (spark, rootFor, input) => row(Versioned.compactLatest(
        spark, existing(spark, rootFor, input, 0), input.getInt(1),
        csv(str(input, 2, "sort_cols"))))),

    Spec("compact_small", "incremental OPTIMIZE: bin-pack only files under small_bytes",
      Array(in("table", StringType),
        inDefault("small_bytes", LongType, (32L * 1024 * 1024).toString),
        inDefault("target_bytes", LongType, (128L * 1024 * 1024).toString)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.compactSmall(
        spark, existing(spark, rootFor, input, 0),
        smallBytes = input.getLong(1), targetBytes = input.getLong(2)))),

    Spec("zorder", "rewrite the table laid out on the Z-order curve of `dims` (csv)",
      Array(in("table", StringType), in("dims", StringType), in("n_files", IntegerType)),
      newVersion,
      (spark, rootFor, input) => {
        val root = existing(spark, rootFor, input, 0)
        val dims = csv(str(input, 1, "dims"))
        row(Versioned.commitZOrderedN(spark, Versioned.read(spark, root), root,
          dims, input.getInt(2), replace = true))
      }),

    Spec("bloom", "retrofit per-file bloom sidecars over `cols` (csv) onto the current snapshot (no data rewritten)",
      Array(in("table", StringType), in("cols", StringType)),
      StructType(Seq(StructField("files_bloomed", LongType, nullable = false))),
      (spark, rootFor, input) => row(Versioned.buildBlooms(
        spark, existing(spark, rootFor, input, 0),
        csv(str(input, 1, "cols"))))),

    Spec("stats", "retrofit per-file min/max stats sidecars over `cols` (csv) from parquet footers (no data read)",
      Array(in("table", StringType), in("cols", StringType)),
      StructType(Seq(StructField("files_processed", LongType, nullable = false))),
      (spark, rootFor, input) => row(Versioned.buildStats(
        spark, existing(spark, rootFor, input, 0),
        csv(str(input, 1, "cols"))))),

    Spec("reharvest_stats", "shed the table's #statsdead guards without rewriting data: strip sidecar entries under dead names, re-harvest stats/blooms keyed by CURRENT names (field-id resolved, so pre-rename files count), publish a metadata-only commit; dry_run => true reports the plan only",
      Array(in("table", StringType),
        inDefault("dry_run", org.apache.spark.sql.types.BooleanType, "false")),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("shed_names", StringType, nullable = false),
        StructField("restatted_columns", StringType, nullable = false),
        StructField("rebloomed_columns", StringType, nullable = false),
        StructField("cleaned_dirs", LongType, nullable = false),
        StructField("files_restatted", LongType, nullable = false))),
      (spark, rootFor, input) => {
        val r = Versioned.reharvestStats(
          spark, existing(spark, rootFor, input, 0),
          dryRun = !input.isNullAt(1) && input.getBoolean(1))
        row(r.version,
          org.apache.spark.unsafe.types.UTF8String.fromString(r.shedNames.mkString(",")),
          org.apache.spark.unsafe.types.UTF8String.fromString(r.restattedCols.mkString(",")),
          org.apache.spark.unsafe.types.UTF8String.fromString(r.rebloomedCols.mkString(",")),
          r.cleanedDirs, r.filesRestatted)
      }),

    Spec("vacuum_claims", "GC the jdbc manifest committer's claims table: delete COMPLETED claim rows older than retention_hours (incomplete claims and younger rows always survive); jdbc_url defaults to spark.graft.committerJdbcUrl",
      Array(inDefault("retention_hours", LongType, "168"),
        inDefault("jdbc_url", StringType, "CAST(NULL AS STRING)")),
      StructType(Seq(StructField("claims_deleted", IntegerType, nullable = false))),
      (spark, rootFor, input) => {
        val url =
          if (!input.isNullAt(1)) str(input, 1, "jdbc_url")
          else Option(spark.conf.get(JdbcClaimManifestCommitter.UrlKey, null))
            .getOrElse(throw new IllegalArgumentException(
              s"no jdbc_url given and ${JdbcClaimManifestCommitter.UrlKey} is unset"))
        row(JdbcClaimManifestCommitter.vacuumClaims(
          url, input.getLong(0) * 60L * 60 * 1000))
      }),

    Spec("ann_drift", "measure a corpus table's reconstruction-quality drift against a persisted ANN model's training-time baseline (graft.ops.AnnIndex.driftStats): one row per quantile probe, drift_q > 0 means today's vectors reconstruct worse than at train time (~10486 per 0.01 cosine)",
      Array(in("corpus_table", StringType), in("model_table", StringType)),
      StructType(Seq(
        StructField("pct", IntegerType, nullable = false),
        StructField("baseline_q", LongType, nullable = false),
        StructField("current_q", LongType, nullable = false),
        StructField("drift_q", LongType, nullable = false))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.driftStats(spark,
          Versioned.read(spark, existing(spark, rootFor, input, 0)),
          existing(spark, rootFor, input, 1))
          .orderBy("pct")
          .queryExecution.executedPlan.executeCollect()),

    Spec("ann_rebuild", "re-encode a corpus table under the persisted ANN model and REPLACE the codes table in one commit (graft.ops.AnnIndex.rebuild) — the drift remedy; stop the maintenance sink first (single writer per root)",
      Array(in("corpus_table", StringType), in("model_table", StringType),
        in("codes_table", StringType)),
      newVersion,
      (spark, rootFor, input) => row(graft.ops.AnnIndex.rebuild(spark,
        Versioned.read(spark, existing(spark, rootFor, input, 0)),
        existing(spark, rootFor, input, 1),
        // the codes table may not exist yet: the first rebuild bootstraps it
        rootFor(str(input, 2, "codes_table"))))),

    Spec("ann_recell", "restore a celled ANN index table's one-file-per-cell range layout after maintenance appends eroded it (graft.ops.AnnIndex.recell) — LAYOUT-ONLY: no re-encode, no model read, results bit-identical, only the probed-cell file-skip ratio changes; the cheap remedy when pruned search reads too many files while ann_drift/ann_cells stay quiet. Stop the maintenance sink first (single writer per root)",
      Array(in("codes_table", StringType)),
      newVersion,
      (spark, rootFor, input) => row(graft.ops.AnnIndex.recell(spark,
        existing(spark, rootFor, input, 0)))),

    Spec("ann_layout", "layout health of a celled ANN index table (graft.ops.AnnIndex.layoutStats) — the decision half of ann_recell, metadata-only apart from one bounded distinct-cells scan (coverage itself reads only the stats sidecars): one row per live data file, cells_covered = how many live cells its cluster [min,max] may contain, cells = nlist, bytes = the file's length. Kept-files-per-probe = SUM(cells_covered)/ANY_VALUE(cells): exactly 1.0 at the rebuilt/recelled one-file-per-cell layout, rising ~1 per accreted all-cells maintenance file. Kept-BYTES-per-probe = SUM(cells_covered*bytes)/ANY_VALUE(cells) closes the open-count blind spot (a one-packed-file table keeps 1.0 files per probe while every probe reads everything); graft.ops.AnnIndex.needsRecell(tolKept) triggers on either leg",
      Array(in("codes_table", StringType)),
      StructType(Seq(
        StructField("file", StringType, nullable = true),
        StructField("cells_covered", IntegerType, nullable = false),
        StructField("cells", IntegerType, nullable = false),
        // null = unpriced (live file missing from its directory
        // listing — defensive): volume reads "unknown", never "smaller"
        StructField("bytes", LongType, nullable = true))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.layoutStats(spark,
          existing(spark, rootFor, input, 0))
          .orderBy("file")
          .queryExecution.executedPlan.executeCollect()),

    Spec("ann_layout_point", "the ONE scalar layout-health row of a celled ANN index table (graft.ops.AnnIndex.layoutPoint) — exactly what the layout monitor sink accretes per trigger, readable on demand: (files, cells, kept_per_probe, kept_bytes_per_probe, total_bytes). kept_per_probe counts the files an average single-cell probe OPENS (1.0 at the one-file-per-cell layout); kept_bytes_per_probe the bytes it READS — each is blind where the other sees (a one-packed-file table opens a 'perfect' 1.0 while reading everything; many tiny accreted files open high while reading little). Volume amplification vs the ideal layout = kept_bytes_per_probe*cells/total_bytes; ann_layout gives the per-file decomposition and ann_layout_alerts the run rule over an accreted series",
      Array(in("codes_table", StringType)),
      StructType(Seq(
        StructField("files", LongType, nullable = false),
        // cells/total_bytes nullable like the kept_* columns: the agg
        // over a degenerate empty per-file frame yields nulls, and any
        // unpriced file nulls BOTH volume columns (degradation must be
        // visible, never a smaller number)
        StructField("cells", LongType, nullable = true),
        StructField("kept_per_probe", org.apache.spark.sql.types.DoubleType, nullable = true),
        StructField("kept_bytes_per_probe", org.apache.spark.sql.types.DoubleType, nullable = true),
        StructField("total_bytes", LongType, nullable = true))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.layoutPoint(spark,
          existing(spark, rootFor, input, 0))
          .queryExecution.executedPlan.executeCollect()),

    Spec("ann_recall", "measured recall@k of the persisted pruned ANN search against the exact brute-force cosine ground truth (graft.ops.AnnIndex.recallAt): one row per query (qid, hits, recall), hits = |index top-k INTERSECT exact top-k| — the number that makes the nprobe dial tunable; at nprobe = every cell the residual below 1.0 is pure PQ quantization loss. queries_table and corpus_table are (vec_id, embedding) tables; the ground-truth side scans the corpus once under broadcast queries, so point queries_table at a SAMPLE at scale",
      Array(in("queries_table", StringType), in("model_table", StringType),
        in("codes_table", StringType), in("corpus_table", StringType),
        inDefault("k", IntegerType, "10"), inDefault("nprobe", IntegerType, "1")),
      StructType(Seq(
        StructField("qid", StringType, nullable = true),
        StructField("hits", LongType, nullable = false),
        StructField("recall", org.apache.spark.sql.types.DoubleType, nullable = false))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.recallAt(spark,
          Versioned.read(spark, existing(spark, rootFor, input, 0)),
          existing(spark, rootFor, input, 1),
          existing(spark, rootFor, input, 2),
          Versioned.read(spark, existing(spark, rootFor, input, 3)),
          k = input.getInt(4), nprobe = input.getInt(5))
          // order on the ORIGINAL qid (numeric ids come back numerically
          // ordered, not '10'-before-'2' lexicographic), THEN cast: the
          // fixed CALL schema rides qid as string, like ann_cells'
          // cluster, because vec_id types vary by corpus
          .orderBy("qid")
          .withColumn("qid",
            org.apache.spark.sql.functions.col("qid").cast(StringType))
          .queryExecution.executedPlan.executeCollect()),

    Spec("ann_prepare", "prepare and CACHE a reusable ANN search handle over the persisted (model, codes) pair in THIS SESSION (graft.ops.AnnIndex.prepare): the model collects once, the codes scan resolves once, and ann_search_prepared then serves searches at per-call cost = driver-side assignment + the pruned candidate join. The handle is version-pinned to the snapshot pair current NOW (returned as the result row); after either table advances, ann_search_prepared refuses and this CALL re-prepares cheaply (a model read and listing — no training). Lifecycle is EXPLICIT: a handle is held until re-prepared (replaced), released (ann_prepare_release), or evicted as the oldest entry when the JVM-wide cache exceeds its cap — there is NO GC-driven teardown, so release handles you are done with",
      Array(in("model_table", StringType), in("codes_table", StringType)),
      StructType(Seq(
        StructField("model_version", LongType, nullable = false),
        StructField("codes_version", LongType, nullable = false))),
      (spark, rootFor, input) => {
        val modelRoot = existing(spark, rootFor, input, 0)
        val codesRoot = existing(spark, rootFor, input, 1)
        // versions read BEFORE prepare: a commit racing in between makes
        // the recorded pair OLDER than what the handle serves, so the
        // search CALL's staleness check refuses and forces a re-prepare
        // — the conservative direction (recording after could pin a
        // version the handle does NOT serve)
        val mv = Versioned.versions(spark, modelRoot).last
        val cv = Versioned.versions(spark, codesRoot).last
        val handle = graft.ops.AnnIndex.prepare(spark, modelRoot, codesRoot)
        graft.ops.AnnPreparedRegistry.put(spark, modelRoot, codesRoot,
          handle, mv, cv)
        row(mv, cv)
      }),

    Spec("ann_search_prepared", "search a (vec_id, embedding) query table through the session handle ann_prepare cached for this (model, codes) pair (graft.ops.PreparedAnnSearch.search) — the SQL surface of the prepared path, so a SQL-only user stops re-paying the per-call model read, assignment job and scan resolution. Refuses without a prior ann_prepare IN THIS SESSION, and refuses a STALE handle (either table advanced past the prepared version pair) naming both pairs and the remedy; same query-batch cap as the Scala handle (batch past 10k (query, probed-cell) rows: use graft.ops.AnnIndex.search). local_bytes_cap > 0 enables the driver-local serve dial: when the probe's kept files total at most that many bytes, the candidate join runs driver-side in ONE job (row-identical by construction and by spec; narrow single-query serving drops under the local-mode multi-stage floor). local_bytes_cap = -1 is AUTO: the cap prices itself from the snapshot listing resolved at ann_prepare (ideal single-cell-probe bytes = total/nlist with a safety multiple, clamped to the dial's MEASURED win region — deliberately independent of nprobe, because the crossover is absolute driver-side work), so narrow probes on a healthy layout serve locally, eroded or mid/wide probes decline into the distributed join because their kept volume exceeds the cap, and re-preparing after a recell re-sizes it — no hand-tuned constant",
      Array(in("queries_table", StringType), in("model_table", StringType),
        in("codes_table", StringType), inDefault("k", IntegerType, "10"),
        inDefault("nprobe", IntegerType, "1"),
        inDefault("local_bytes_cap", LongType, "0")),
      StructType(Seq(
        StructField("qid", StringType, nullable = true),
        StructField("nid", StringType, nullable = true),
        StructField("cluster", StringType, nullable = true),
        StructField("cos_pq", org.apache.spark.sql.types.DoubleType, nullable = true),
        StructField("rank", IntegerType, nullable = false))),
      (spark, rootFor, input) => {
        val queriesRoot = existing(spark, rootFor, input, 0)
        val modelName = str(input, 1, "model_table")
        val codesName = str(input, 2, "codes_table")
        val modelRoot = existing(spark, rootFor, input, 1)
        val codesRoot = existing(spark, rootFor, input, 2)
        val (handle, mv, cv) = graft.ops.AnnPreparedRegistry
          .get(spark, modelRoot, codesRoot).getOrElse(
            throw new IllegalStateException(
              s"no prepared handle for ($modelName, $codesName) in this " +
                "session — CALL graft.system.ann_prepare" +
                s"('$modelName', '$codesName') first"))
        val curM = Versioned.versions(spark, modelRoot).last
        val curC = Versioned.versions(spark, codesRoot).last
        if (curM != mv || curC != cv) throw new IllegalStateException(
          s"prepared handle for ($modelName, $codesName) is STALE: " +
            s"prepared at (model v$mv, codes v$cv), current is " +
            s"(v$curM, v$curC) — CALL graft.system.ann_prepare" +
            s"('$modelName', '$codesName') again to adopt the new " +
            "snapshot (cheap: no training)")
        val sc = StringType
        handle.search(Versioned.read(spark, queriesRoot),
          k = input.getInt(3), nprobe = input.getInt(4),
          localBytesCap = input.getLong(5))
          // order on the ORIGINAL types, then cast to the fixed schema
          // (numeric ids come back numerically ordered, like ann_recall)
          .orderBy("qid", "rank")
          .select(
            org.apache.spark.sql.functions.col("qid").cast(sc),
            org.apache.spark.sql.functions.col("nid").cast(sc),
            org.apache.spark.sql.functions.col("cluster").cast(sc),
            org.apache.spark.sql.functions.col("cos_pq"),
            org.apache.spark.sql.functions.col("rank"))
          .queryExecution.executedPlan.executeCollect()
      }),

    Spec("ann_serve_probe", "price a probe WITHOUT running it, through the session handle ann_prepare cached for this (model, codes) pair: one row (auto_cap_bytes, kept_bytes, serves_local) — the cap the AUTO dial (ann_search_prepared local_bytes_cap = -1) resolves to on this handle (priced from the snapshot listing at prepare; width-independent), the EXACT kept volume this query batch's probe would read at `nprobe` (graft.ops.PreparedAnnSearch.probedKeptBytes — driver-side assignment only, NO job; null when any kept file is unpriced, which also disqualifies the dial), and whether AUTO would take the one-job driver-local path. The observability half of the serving dial: a deployment sees which side of the crossover a probe lands on before opting in, instead of inferring it from timings. Same handle-presence and version-staleness refusals as ann_search_prepared (a stale handle's pricing would describe a snapshot no longer served)",
      Array(in("queries_table", StringType), in("model_table", StringType),
        in("codes_table", StringType), inDefault("nprobe", IntegerType, "1")),
      StructType(Seq(
        StructField("auto_cap_bytes", LongType, nullable = false),
        StructField("kept_bytes", LongType, nullable = true),
        StructField("serves_local", BooleanType, nullable = false))),
      (spark, rootFor, input) => {
        val queriesRoot = existing(spark, rootFor, input, 0)
        val modelName = str(input, 1, "model_table")
        val codesName = str(input, 2, "codes_table")
        val modelRoot = existing(spark, rootFor, input, 1)
        val codesRoot = existing(spark, rootFor, input, 2)
        val (handle, mv, cv) = graft.ops.AnnPreparedRegistry
          .get(spark, modelRoot, codesRoot).getOrElse(
            throw new IllegalStateException(
              s"no prepared handle for ($modelName, $codesName) in this " +
                "session — CALL graft.system.ann_prepare" +
                s"('$modelName', '$codesName') first"))
        val curM = Versioned.versions(spark, modelRoot).last
        val curC = Versioned.versions(spark, codesRoot).last
        if (curM != mv || curC != cv) throw new IllegalStateException(
          s"prepared handle for ($modelName, $codesName) is STALE: " +
            s"prepared at (model v$mv, codes v$cv), current is " +
            s"(v$curM, v$curC) — CALL graft.system.ann_prepare" +
            s"('$modelName', '$codesName') again to adopt the new " +
            "snapshot (cheap: no training)")
        val cap = handle.autoLocalBytesCap
        val kept = handle.probedKeptBytes(
          Versioned.read(spark, queriesRoot), input.getInt(3))
        row(cap, kept.map(Long.box).orNull,
          kept.exists(_ <= cap): java.lang.Boolean)
      }),

    Spec("ann_prepare_release", "drop THIS SESSION's cached prepared-search handle for the (model, codes) pair — the explicit end of the ann_prepare lifecycle (handles are strongly held until re-prepared, released, or cap-evicted; there is no GC-driven teardown). Returns how many handles were dropped (0 or 1); releasing a pair that was never prepared is a no-op, not an error — and the tables need not EXIST anymore (a handle must stay releasable after its table was dropped, or the drop would pin the handle forever)",
      Array(in("model_table", StringType), in("codes_table", StringType)),
      StructType(Seq(
        StructField("released", IntegerType, nullable = false))),
      (spark, rootFor, input) => {
        // resolve names to roots WITHOUT the existence check: removal
        // from the registry is always safe, and requiring a live table
        // would make a dropped table's handle permanently unreleasable
        val dropped = graft.ops.AnnPreparedRegistry.release(spark,
          rootFor(str(input, 0, "model_table")),
          rootFor(str(input, 1, "codes_table")))
        row(if (dropped) 1 else 0)
      }),

    Spec("ann_prepared_list", "list THIS SESSION's cached prepared-search handles (graft.ops.AnnPreparedRegistry.listFor) — the observability half of the explicit ann_prepare lifecycle, so a session-per-tenant service can see its cache (and what a cap eviction or table advance would invalidate) before deciding what to release. One row per handle: the (model, codes) pair as the catalog-resolved ROOT paths the registry keys on, plus the version pair the handle serves. Reading the list does NOT refresh LRU recency — observing the cache never changes who the cap evicts next",
      Array.empty[ProcedureParameter],
      StructType(Seq(
        StructField("model_root", StringType, nullable = false),
        StructField("codes_root", StringType, nullable = false),
        StructField("model_version", LongType, nullable = false),
        StructField("codes_version", LongType, nullable = false))),
      (spark, _, _) =>
        graft.ops.AnnPreparedRegistry.listFor(spark).map {
          case (m, c, mv, cv) => new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(m),
            org.apache.spark.unsafe.types.UTF8String.fromString(c),
            mv, cv)): InternalRow
        }.toArray),

    Spec("ann_cells", "measure a persisted ANN codes table's per-cell occupancy against the model's training-time baseline (graft.ops.AnnIndex.cellStats) — the BALANCE half of the rebuild contract, codes-table-only (no corpus encode): a cell whose current_share has grown past tolerance degrades probed-cell search toward O(n) on that cell even while ann_drift stays quiet",
      Array(in("codes_table", StringType), in("model_table", StringType)),
      StructType(Seq(
        StructField("cluster", StringType, nullable = true),
        StructField("baseline_cnt", LongType, nullable = false),
        StructField("current_cnt", LongType, nullable = false),
        StructField("baseline_share", org.apache.spark.sql.types.DoubleType, nullable = true),
        StructField("current_share", org.apache.spark.sql.types.DoubleType, nullable = true))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.cellStats(spark,
          existing(spark, rootFor, input, 0),
          existing(spark, rootFor, input, 1))
          // the model's cell label type varies by corpus (integral or
          // string); the procedure's fixed schema rides it as string
          .withColumn("cluster",
            org.apache.spark.sql.functions.col("cluster").cast(StringType))
          .orderBy("cluster")
          .queryExecution.executedPlan.executeCollect()),

    Spec("ann_alerts", "reduce a drift-monitor table (versionedAnnDriftMonitorSink's accreted series, or any (batch_id, pct, drift_q) table) to maximal runs of consecutive drift breaches at the `pct` probe (graft.ops.AnnIndex.driftAlerts): a batch breaches when drift_q > tol_q, alert = run_len >= min_run — the operational endpoint of the monitor loop ('alert on a RUN of bad batches, not one'), one statement",
      Array(in("monitor_table", StringType), inDefault("pct", IntegerType, "90"),
        inDefault("tol_q", LongType, "10486"), inDefault("min_run", IntegerType, "3")),
      StructType(Seq(
        StructField("run_start", LongType, nullable = true),
        StructField("run_end", LongType, nullable = true),
        StructField("run_len", IntegerType, nullable = false),
        StructField("alert", org.apache.spark.sql.types.BooleanType, nullable = false))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.driftAlerts(
          Versioned.read(spark, existing(spark, rootFor, input, 0)),
          pct = input.getInt(1), tolQ = input.getLong(2),
          minRun = input.getInt(3))
          // batch ids are LONG in the monitor sink's own series; a
          // hand-built series with another integral batch_id rides the
          // same cast
          .select(
            org.apache.spark.sql.functions.col("run_start").cast(LongType),
            org.apache.spark.sql.functions.col("run_end").cast(LongType),
            org.apache.spark.sql.functions.col("run_len"),
            org.apache.spark.sql.functions.col("alert"))
          .orderBy("run_start")
          .queryExecution.executedPlan.executeCollect()),

    Spec("ann_layout_alerts", "reduce a layout-monitor table (versionedAnnLayoutMonitorSink's accreted series, or any (batch_id, kept_per_probe) table) to maximal runs of consecutive LAYOUT breaches (graft.ops.AnnIndex.layoutAlerts): a batch breaches when kept_per_probe > tol_kept (the same threshold ann_recell's trigger fires on) OR — when the series carries the sink's volume columns (kept_bytes_per_probe, cells, total_bytes) — when read-volume amplification kept_bytes_per_probe/(total_bytes/cells) > tol_kept, the leg that catches a table packed into one all-cells file (open count reads a 'perfect' 1.0 while every probe reads everything); alert = run_len >= min_run — the third erosion axis's run rule, closing its loop symmetry with ann_alerts ('recell on a RUN of eroded measurements, not one')",
      Array(in("monitor_table", StringType),
        inDefault("tol_kept", org.apache.spark.sql.types.DoubleType, "2.0"),
        inDefault("min_run", IntegerType, "3")),
      StructType(Seq(
        StructField("run_start", LongType, nullable = true),
        StructField("run_end", LongType, nullable = true),
        StructField("run_len", IntegerType, nullable = false),
        StructField("alert", org.apache.spark.sql.types.BooleanType, nullable = false))),
      (spark, rootFor, input) =>
        graft.ops.AnnIndex.layoutAlerts(
          Versioned.read(spark, existing(spark, rootFor, input, 0)),
          tolKept = input.getDouble(1), minRun = input.getInt(2))
          // same integral-batch_id cast discipline as ann_alerts
          .select(
            org.apache.spark.sql.functions.col("run_start").cast(LongType),
            org.apache.spark.sql.functions.col("run_end").cast(LongType),
            org.apache.spark.sql.functions.col("run_len"),
            org.apache.spark.sql.functions.col("alert"))
          .orderBy("run_start")
          .queryExecution.executedPlan.executeCollect()),

    Spec("add_constraint", "record a named CHECK constraint (metadata-only); future writes violating it abort before writing",
      Array(in("table", StringType), in("name", StringType),
        in("expression", StringType)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.addConstraint(
        spark, existing(spark, rootFor, input, 0),
        str(input, 1, "name"), str(input, 2, "expression")))),

    Spec("drop_constraint", "drop a named CHECK constraint (metadata-only)",
      Array(in("table", StringType), in("name", StringType)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.dropConstraint(
        spark, existing(spark, rootFor, input, 0), str(input, 1, "name")))),

    Spec("detail", "one metadata row describing the current snapshot (files, bytes, schema width, sidecar coverage, constraints, deletion vectors, column-mapping state)",
      Array(in("table", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("num_files", LongType, nullable = false),
        StructField("total_bytes", LongType, nullable = false),
        StructField("num_columns", IntegerType, nullable = false),
        StructField("stats_columns", StringType, nullable = false),
        StructField("bloom_columns", StringType, nullable = false),
        StructField("num_constraints", IntegerType, nullable = false),
        StructField("num_deletion_vectors", LongType, nullable = false),
        StructField("dv_deleted_rows", LongType, nullable = false),
        StructField("column_mapping", org.apache.spark.sql.types.BooleanType,
          nullable = false),
        StructField("max_field_id", LongType, nullable = false),
        StructField("dropped_names", StringType, nullable = false),
        StructField("stats_dead_names", StringType, nullable = false))),
      (spark, rootFor, input) => {
        val root = existing(spark, rootFor, input, 0)
        val d = Versioned.describeDetail(spark, root)
        row(d.version, d.numFiles, d.totalBytes, d.numColumns,
          org.apache.spark.unsafe.types.UTF8String.fromString(d.statsColumns),
          org.apache.spark.unsafe.types.UTF8String.fromString(d.bloomColumns),
          d.numConstraints, d.numDeletionVectors, d.dvDeletedRows,
          d.columnMapping, d.maxFieldId,
          org.apache.spark.unsafe.types.UTF8String.fromString(d.droppedNames),
          org.apache.spark.unsafe.types.UTF8String.fromString(d.statsDeadNames))
      }),

    Spec("drop_columns", "drop columns as a metadata-only commit (id-guarded on mapped tables, tombstoned on legacy ones); comma-separated list",
      Array(in("table", StringType), in("columns", StringType)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.dropColumns(
        spark, existing(spark, rootFor, input, 0),
        str(input, 1, "columns").split(",").map(_.trim).filter(_.nonEmpty).toSeq))),

    Spec("rename_column", "rename a column as a metadata-only commit via field-id column mapping (old files serve the renamed column by id; legacy tables refuse with the upgrade path)",
      Array(in("table", StringType), in("old_name", StringType),
        in("new_name", StringType)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.renameColumn(
        spark, existing(spark, rootFor, input, 0),
        str(input, 1, "old_name"), str(input, 2, "new_name")))),

    Spec("dv_delete", "merge-on-read DELETE: record matching rows dead in per-file deletion vectors (no data rewritten); predicate is a SQL boolean over the table's columns",
      Array(in("table", StringType), in("predicate", StringType)),
      newVersion,
      (spark, rootFor, input) => row(Versioned.deleteWhereDv(
        spark, existing(spark, rootFor, input, 0),
        org.apache.spark.sql.functions.expr(str(input, 1, "predicate"))))),

    Spec("dv_materialize", "fold deletion vectors into their data files; optional min_dead_ratio rewrites only files whose dead-row fraction reaches it (lighter files keep their vectors) — the default 0.0 folds everything, re-admitting the table to the DSv2 scan and the versioned stream",
      Array(in("table", StringType),
        inDefault("min_dead_ratio", DoubleType, "CAST(0.0 AS DOUBLE)")),
      newVersion,
      (spark, rootFor, input) => row(Versioned.dvMaterialize(
        spark, existing(spark, rootFor, input, 0),
        minDeadRatio = if (input.isNullAt(1)) 0.0 else input.getDouble(1)))),

    Spec("row_count", "exact snapshot row count from metadata alone (parquet footers minus deletion-vector cardinalities; no data read)",
      Array(in("table", StringType),
        inDefault("version", LongType, "CAST(NULL AS BIGINT)")),
      StructType(Seq(StructField("row_count", LongType, nullable = false))),
      (spark, rootFor, input) => {
        val root = existing(spark, rootFor, input, 0)
        val asOf = if (input.isNullAt(1)) None else Some(input.getLong(1))
        row(Versioned.countRows(spark, root, asOf))
      }),

    Spec("constraints", "list the current snapshot's CHECK constraints",
      Array(in("table", StringType)),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("expression", StringType, nullable = false))),
      (spark, rootFor, input) =>
        Versioned.constraints(spark, existing(spark, rootFor, input, 0))
          .map { case (n, e) => InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(n),
            org.apache.spark.unsafe.types.UTF8String.fromString(e)) }
          .toArray),

    Spec("clone", "shallow-clone a snapshot into a fresh table (no data copied)",
      Array(in("table", StringType), in("target", StringType),
        inDefault("version", LongType, "CAST(NULL AS BIGINT)")),
      newVersion,
      (spark, rootFor, input) => {
        val src = existing(spark, rootFor, input, 0)
        val dst = rootFor(str(input, 1, "target"))
        val asOf = if (input.isNullAt(2)) None else Some(input.getLong(2))
        row(Versioned.cloneTable(spark, src, dst, asOf))
      })
  ).map(s => s.name -> s).toMap

  def names: Seq[String] = specs.keys.toSeq.sorted

  /** Resolve `name` (case-insensitive) to an unbound procedure whose table
    * argument resolves through `rootFor`. */
  def load(ident: Identifier, rootFor: String => String): UnboundProcedure = {
    // SQL identifiers are case-insensitive session-wide: both the
    // namespace and the procedure name fold before matching
    val ns = ident.namespace().map(_.toLowerCase(java.util.Locale.ROOT))
    val known = (ns.isEmpty || ns.sameElements(Array("system"))) &&
      specs.contains(ident.name().toLowerCase(java.util.Locale.ROOT))
    if (!known)
      throw new IllegalArgumentException(
        s"undefined procedure ${(ns :+ ident.name()).mkString(".")}; " +
          s"known (namespace `system`): ${names.mkString(", ")}")
    new Rigid(specs(ident.name().toLowerCase(java.util.Locale.ROOT)), rootFor)
  }

  private final class Rigid(spec: Spec, rootFor: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = spec.name
    override def description(): String = spec.description
    // rigid binding: the parameter list is fixed; the analyzer has already
    // coerced arg types and filled defaults against parameters()
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = spec.params
    // every procedure mutates or lists mutable table state
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      java.util.Collections.singletonList[Scan](
        new ResultScan(spec.resultSchema, spec.body(spark, rootFor, input))).iterator()
    }
  }

  /** Driver-local result scan: procedure results are metadata-sized by
    * construction (history rows / version numbers / removed counts). */
  private final class ResultScan(schema: StructType, rs: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = rs
    override def readSchema(): StructType = schema
    override def description(): String = "graft procedure result"
  }
}
