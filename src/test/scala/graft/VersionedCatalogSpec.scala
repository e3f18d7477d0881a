package graft

import graft.io.Versioned
import org.apache.hadoop.fs.Path

/** The catalog must give versioned tables the real SQL surface: resolve
  * `graft_test.ns.tbl` to a warehouse root, serve VERSION AS OF and
  * TIMESTAMP AS OF through the connector time-travel API, list tables,
  * route CREATE/INSERT/OVERWRITE/CTAS/DROP through the manifest commit
  * protocol, and reject the paths that cannot honor it (ALTER, RENAME,
  * writes to pinned history).
  */
class VersionedCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  // epoch anchor for deterministic TIMESTAMP AS OF: 2026-01-01 00:00:00 UTC
  private val T0 = 1767225600000L

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toFile
    wh.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft_test", classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_test.warehouse", wh.getAbsolutePath)
    val root = new java.io.File(wh, "sales/orders").getAbsolutePath
    Versioned.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((3L, "c")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((9L, "z")).toDF("id", "k"), root, replace = true)
    // pin manifest publish times 10s apart so TIMESTAMP AS OF is exact
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1L, 2L, 3L).foreach { v =>
      fs.setTimes(new Path(root, s"_manifests/v$v.txt"), T0 + (v - 1) * 10000L, -1)
    }
    wh.getAbsolutePath
  }

  test("SELECT resolves the newest snapshot through the catalog") {
    warehouse
    assert(spark.sql("SELECT id FROM graft_test.sales.orders")
      .as[Long].collect().toSeq == Seq(9L))
  }

  test("VERSION AS OF reads the pinned snapshot") {
    warehouse
    assert(spark.sql("SELECT id FROM graft_test.sales.orders VERSION AS OF 1")
      .as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.sql("SELECT id FROM graft_test.sales.orders VERSION AS OF 2")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("TIMESTAMP AS OF resolves to the newest version committed by then") {
    warehouse
    // 00:00:05 — only v1 (T0) is published
    assert(spark.sql(
      "SELECT id FROM graft_test.sales.orders TIMESTAMP AS OF '2026-01-01 00:00:05'")
      .as[Long].collect().toSet == Set(1L, 2L))
    // 00:00:15 — v2 (T0+10s) is the newest at-or-before
    assert(spark.sql(
      "SELECT id FROM graft_test.sales.orders TIMESTAMP AS OF '2026-01-01 00:00:15'")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    // before any commit -> loud failure
    val err = intercept[Exception] {
      spark.sql(
        "SELECT id FROM graft_test.sales.orders TIMESTAMP AS OF '2025-12-31 00:00:00'")
        .collect()
    }
    assert(err.getMessage.contains("no version committed"))
  }

  test("SHOW TABLES lists committed tables only; missing tables fail to resolve") {
    warehouse
    new java.io.File(warehouse, "sales/empty_dir").mkdirs()
    val listed = spark.sql("SHOW TABLES IN graft_test.sales")
      .select("tableName").as[String].collect().toSet
    assert(listed == Set("orders"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_test.sales.nope").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cannot be found")
      || err.getMessage.toLowerCase.contains("not found"))
  }

  test("SQL DELETE goes through the copy-on-write manifest protocol") {
    val root = new java.io.File(warehouse, "sales/cow_del").getAbsolutePath
    Versioned.commit(spark, (1L to 100L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (101L to 200L).map(i => (i, s"r$i")).toDF("id", "k")
      .coalesce(1), root, statsCols = Seq("id"))
    spark.sql("DELETE FROM graft_test.sales.cow_del WHERE id BETWEEN 150 AND 160")
    assert(spark.sql("SELECT count(*) FROM graft_test.sales.cow_del")
      .as[Long].head() == 189L)
    // one atomic version was published; time travel still sees the rows
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(Versioned.read(spark, root, asOf = Some(2L)).count() == 200L)
    // the untouched band-1 file was carried by reference, not rewritten
    val m3 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_manifests", "v3.txt")))
    assert(m3.contains("data/b1/"), "band-1 file must be carried")
    assert(!m3.contains("data/b2/"), "band-2 file must be rewritten, not carried")
    // DELETE on a time-travel read has no live root and is refused
    val err = intercept[Exception] {
      spark.sql("DELETE FROM graft_test.sales.cow_del VERSION AS OF 1 WHERE id = 1")
    }
    assert(err.getMessage.toLowerCase.contains("delete"),
      s"unexpected: ${err.getMessage}")
  }

  test("SQL CREATE / INSERT / OVERWRITE / CTAS / DROP route through the manifest protocol") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft_test.sales.fresh (id BIGINT, k STRING)")
    // an empty v1 carrying the declared schema: reads 0 rows, lists, inserts
    assert(spark.sql("SELECT * FROM graft_test.sales.fresh").count() == 0L)
    spark.sql("INSERT INTO graft_test.sales.fresh VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_test.sales.fresh VALUES (3, 'c')")
    val root = new java.io.File(wh, "sales/fresh").getAbsolutePath
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(spark.sql("SELECT count(*) FROM graft_test.sales.fresh")
      .as[Long].head() == 3L)
    spark.sql("INSERT OVERWRITE graft_test.sales.fresh VALUES (9, 'z')")
    assert(spark.sql("SELECT k FROM graft_test.sales.fresh")
      .as[String].collect().toSeq == Seq("z"))
    // the overwrite is a replace commit: pre-overwrite history still reads
    assert(spark.sql("SELECT count(*) FROM graft_test.sales.fresh VERSION AS OF 3")
      .as[Long].head() == 3L)
    // CTAS = create + insert, end-to-end in SQL
    spark.sql("CREATE TABLE graft_test.sales.fresh_copy AS " +
      "SELECT * FROM graft_test.sales.fresh")
    assert(spark.sql("SELECT k FROM graft_test.sales.fresh_copy")
      .as[String].collect().toSeq == Seq("z"))
    // double create fails loudly; drop removes root and resolution
    intercept[Exception] {
      spark.sql("CREATE TABLE graft_test.sales.fresh (id BIGINT)")
    }
    spark.sql("DROP TABLE graft_test.sales.fresh_copy")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_test.sales.fresh_copy").collect()
    }
    spark.sql("DROP TABLE graft_test.sales.fresh")
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only schema commit") {
    val wh = warehouse
    val root = new java.io.File(new java.io.File(wh, "sales"), "altered").getAbsolutePath
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k").coalesce(1), root)
    val before = Versioned.versions(spark, root).last
    spark.sql("ALTER TABLE graft_test.sales.altered ADD COLUMNS (score DOUBLE, note STRING)")
    // one metadata-only version: same files, evolved schema
    assert(Versioned.versions(spark, root).last == before + 1)
    val t = spark.table("graft_test.sales.altered")
    assert(t.schema.fieldNames.toSeq == Seq("id", "k", "score", "note"))
    assert(t.filter($"score".isNull && $"note".isNull).count() == 1) // old row reads null
    spark.sql("INSERT INTO graft_test.sales.altered VALUES (2, 'b', 0.5, 'n')")
    assert(spark.table("graft_test.sales.altered").count() == 2)
  }

  test("unsupported ALTERs stay rejected; RENAME COLUMN round-trips") {
    warehouse
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"expected '$needle' in: ${e.getMessage}")
    }
    refuse("ALTER TABLE graft_test.sales.orders ADD COLUMN z INT NOT NULL",
      "NOT NULL")
    refuse("ALTER TABLE graft_test.sales.orders ADD COLUMN z INT FIRST",
      "positioned")
    // DROP COLUMN (round 10) and RENAME COLUMN (round 11, field-id
    // column mapping) are supported — positive coverage in
    // DropColumnsSpec / RenameColumnSpec; here just prove the catalog
    // routes RENAME COLUMN and the data survives the round trip
    spark.sql("ALTER TABLE graft_test.sales.orders RENAME COLUMN k TO kk")
    assert(spark.table("graft_test.sales.orders").columns.contains("kk"))
    spark.sql("ALTER TABLE graft_test.sales.orders RENAME COLUMN kk TO k")
    refuse("ALTER TABLE graft_test.sales.orders RENAME TO graft_test.sales.orders2",
      "does not support")
    // table untouched
    assert(spark.sql("SELECT count(*) FROM graft_test.sales.orders")
      .as[Long].head() == 1L)
  }
}
