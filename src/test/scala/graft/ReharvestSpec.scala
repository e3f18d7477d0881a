package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** `reharvestStats` — shedding `#statsdead` guards WITHOUT a data
  * rewrite (r11's "what's missing" #1): after a mapped RENAME or
  * DROP+re-add, the stats-proven DELETE / pruning paths degrade to
  * scanning until the guards are shed, and the only prior remedy was a
  * full-table replace (compactLatest — a 100 TB write for a
  * metadata-sized problem). The procedure strips the quarantined
  * sidecar entries, re-harvests under CURRENT names by field id
  * (footer reads for stats, one column-pruned pass for blooms), and
  * publishes a metadata-only shed commit. */
class ReharvestSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  private def diskFiles(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val d = new java.io.File(root)
    if (!d.exists()) Set.empty
    else walk(d).map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  private def entries(root: String): Set[String] =
    Versioned.snapshotFiles(spark, root).map(p =>
      new org.apache.hadoop.fs.Path(p).getName).toSet

  /** 3 commits x 1 file of 100 rows each, id-banded, stats on id. */
  private def buildBanded(): String = {
    val root = tmpRoot("graft_reh")
    (0 to 2).foreach { i =>
      Versioned.commit(spark,
        ((i * 100 + 1).toLong to (i * 100 + 100).toLong).map(j => (j, j * 2.0))
          .toDF("id", "x").coalesce(1), root, statsCols = Seq("id"))
    }
    root
  }

  test("rename degrades the proofs; reharvest restores them without a data rewrite") {
    val root = buildBanded()
    Versioned.renameColumn(spark, root, "id", "key") // v4
    assert(Versioned.statsDeadColumns(spark, root) == Set("id"))
    val dataBefore = diskFiles(root)

    // dry run: full plan reported, nothing changed
    val dry = Versioned.reharvestStats(spark, root, dryRun = true)
    assert(dry.version == -1L)
    assert(dry.shedNames == Seq("id") && dry.restattedCols == Seq("key"))
    assert(dry.cleanedDirs == 3 && dry.filesRestatted == 3)
    assert(Versioned.statsDeadColumns(spark, root) == Set("id"),
      "dry run must not shed")
    assert(Versioned.versions(spark, root).last == 4L, "dry run must not commit")

    // the real thing: metadata commit, guards shed, NO data file touched
    val r = Versioned.reharvestStats(spark, root)
    assert(r.version == 5L && r.shedNames == Seq("id"))
    assert(r.restattedCols == Seq("key") && r.rebloomedCols.isEmpty)
    assert(r.cleanedDirs == 3 && r.filesRestatted == 3)
    assert(Versioned.statsDeadColumns(spark, root).isEmpty)
    assert(diskFiles(root) == dataBefore, "reharvest must not write data files")
    val lastOp = Versioned.history(spark, root).orderBy(desc("version"))
      .select("operation").as[String].head()
    assert(lastOp == "reharvest_stats")

    // the restored machinery, end to end: pre-rename files prove under
    // the POST-rename name — band 1 drops metadata-only, band 3 carries
    // unprobed, nothing is written
    val entriesBefore = entries(root)
    Versioned.deleteWhere(spark, root, $"key" <= 100)
    assert(diskFiles(root) == dataBefore, "a proven delete must write no files")
    assert(entries(root).subsetOf(entriesBefore) && entries(root).size == 2)
    val t = Versioned.read(spark, root)
    assert(t.count() == 200 && t.agg(min($"key")).as[Long].head() == 101L)
    val added = Versioned.history(spark, root).orderBy(desc("version"))
      .select("files_added").as[Option[Long]].head()
    assert(added.contains(0L), "proven delete adds no files")

    // pruned range reads skip files again too (1 of the 2 remaining)
    assert(Versioned.readPruned(spark, root, "key", Some(101L), Some(150L))
      .inputFiles.length == 1)
  }

  test("reharvest is a no-op on a table without guards") {
    val root = buildBanded()
    val r = Versioned.reharvestStats(spark, root)
    assert(r.version == -1L && r.shedNames.isEmpty && r.cleanedDirs == 0)
    assert(Versioned.versions(spark, root).last == 3L)
  }

  test("a dropped column sheds clean: entries stripped, nothing re-harvested") {
    val root = tmpRoot("graft_reh_drop")
    Versioned.commit(spark,
      Seq((1L, 5L), (2L, 7L)).toDF("id", "x").coalesce(1),
      root, statsCols = Seq("id", "x"))
    Versioned.dropColumns(spark, root, Seq("x"))
    assert(Versioned.statsDeadColumns(spark, root) == Set("x"))
    val r = Versioned.reharvestStats(spark, root)
    assert(r.shedNames == Seq("x"))
    assert(r.restattedCols.isEmpty, "a retired id translates to no column")
    assert(Versioned.statsDeadColumns(spark, root).isEmpty)
    // the sidecar no longer tracks the dead name; id survives untouched
    assert(Versioned.describeDetail(spark, root).statsColumns == "id")
    // a later re-add starts CLEAN: old files carry no stats under x, so
    // a proof-shaped delete scans them (their x reads null and survives)
    Versioned.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType)))
    Versioned.commit(spark,
      Seq((3L, 100L), (4L, 200L)).toDF("id", "x").coalesce(1),
      root, statsCols = Seq("id", "x"))
    Versioned.deleteWhere(spark, root, $"x" >= 100L)
    val rows = Versioned.read(spark, root).select("id", "x")
      .as[(Long, Option[Long])].collect().toSet
    assert(rows == Set((1L, None), (2L, None)),
      "old rows (null x) must survive; the new band must go")
  }

  test("bloom sidecars follow the rename through reharvest") {
    val root = tmpRoot("graft_reh_bloom")
    Versioned.commit(spark,
      (1L to 50L).map(i => (i, s"u$i")).toDF("id", "v").coalesce(1),
      root, bloomCols = Seq("v"), statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "v", "label")
    val before = Versioned.describeDetail(spark, root)
    assert(before.bloomColumns == "v" && before.statsDeadNames == "v")
    val r = Versioned.reharvestStats(spark, root)
    assert(r.rebloomedCols == Seq("label"))
    val after = Versioned.describeDetail(spark, root)
    assert(after.bloomColumns == "label", s"got ${after.bloomColumns}")
    assert(after.statsDeadNames.isEmpty)
    assert(Versioned.read(spark, root).filter($"label" === "u7")
      .count() == 1, "rebuilt bloom must not lose rows")
  }

  test("restore across the shed stays sound in both directions") {
    val root = buildBanded()                         // v1..v3
    Versioned.renameColumn(spark, root, "id", "key") // v4
    Versioned.reharvestStats(spark, root)            // v5 (shed)
    // restore to the PRE-rename v3: its own manifest carries no
    // #statsdead (nothing was unstable then), its schema names `id`,
    // and the stripped `id` entries just mean no pruning — the delete
    // still scans correctly
    Versioned.restore(spark, root, 3L)               // v6
    assert(Versioned.read(spark, root).columns.toSeq == Seq("id", "x"))
    Versioned.deleteWhere(spark, root, $"id" <= 100)
    val t = Versioned.read(spark, root)
    assert(t.count() == 200 && t.agg(min($"id")).as[Long].head() == 101L)
    // and the re-harvested `key` entries under the restored schema are
    // simply never consulted (no column named key)
  }

  test("SQL CALL surface: reharvest_stats with dry_run, then for real") {
    val wh = java.nio.file.Files.createTempDirectory("graft_reh_wh").toFile
    wh.deleteOnExit()
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_reh", "graft.io.VersionedCatalog")
    s.conf.set("spark.sql.catalog.graft_reh.warehouse", wh.getAbsolutePath)
    s.sql("CREATE TABLE graft_reh.ns.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO graft_reh.ns.t VALUES (1, 'a'), (2, 'b')")
    s.sql("CALL graft_reh.system.stats('ns.t', 'id')")
    s.sql("ALTER TABLE graft_reh.ns.t RENAME COLUMN id TO ident")
    val dry = s.sql(
      "CALL graft_reh.system.reharvest_stats('ns.t', dry_run => true)").head()
    assert(dry.getLong(0) == -1L && dry.getString(1) == "id")
    val real = s.sql("CALL graft_reh.system.reharvest_stats('ns.t')").head()
    assert(real.getLong(0) > 0L && real.getString(2) == "ident")
    assert(s.sql("CALL graft_reh.system.detail('ns.t')")
      .select("stats_dead_names").head().getString(0).isEmpty)
    // claims GC is callable too (fresh database: nothing to delete)
    assert(s.sql("CALL graft_reh.system.vacuum_claims(jdbc_url => " +
      "'jdbc:derby:memory:graft_reh_claims;create=true')")
      .head().getInt(0) == 0)
  }
}
