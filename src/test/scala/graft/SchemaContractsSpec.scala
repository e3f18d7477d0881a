package graft

import graft.clean.SchemaContracts
import graft.io.Versioned
import graft.pipelines.DimLoader

/** Declared NVARCHAR(n) widths as enforceable contracts: the one-pass
  * pre-write batch assertion for plain parquet sinks, the persistent
  * CHECK-constraint install for versioned tables, and the DimLoader
  * wiring — an over-width value must fail the load with the target
  * untouched, exactly as the reference's SQL Server target refuses
  * "string or binary data would be truncated".
  */
class SchemaContractsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_widths").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("lengthChecks derive stable named CHECK expressions") {
    val checks = SchemaContracts.lengthChecks(Map("Site" -> 10, "Article No" -> 20))
    assert(checks == Seq(
      "len_article_no" -> "length(`Article No`) <= 20",
      "len_site" -> "length(`Site`) <= 10"))
    intercept[IllegalArgumentException] {
      SchemaContracts.lengthChecks(Map("x" -> 0))
    }
  }

  test("assertLengths: one-pass validation, NULL passes, absent columns ignored") {
    val ok = Seq(("S001", "A1"), ("S2", null)).toDF("Site", "Article")
    SchemaContracts.assertLengths(ok, Map("Site" -> 4, "Article" -> 2, "Ghost" -> 1))
    val e = intercept[IllegalArgumentException] {
      SchemaContracts.assertLengths(
        Seq(("STORE_00001", "A1")).toDF("Site", "Article"),
        Map("Site" -> 4, "Article" -> 2))
    }
    assert(e.getMessage.contains("`Site`") && e.getMessage.contains("NVARCHAR(4)"))
  }

  test("installLengthChecks: versioned write-time enforcement, idempotent reinstall") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(("S001", "ok")).toDF("Site", "note"), root)
    val vs = SchemaContracts.installLengthChecks(spark, root, Map("Site" -> 4))
    assert(vs == Seq(2L))
    // future over-width commits abort before publishing
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq(("STORE_LONG", "bad")).toDF("Site", "note"), root)
    }
    assert(e.getMessage.contains("len_site"))
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))
    // reinstalling the same widths is a no-op (no metadata churn)
    assert(SchemaContracts.installLengthChecks(spark, root, Map("Site" -> 4)).isEmpty)
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))
    // a CHANGED width under the same name is refused, not silently swapped
    val e2 = intercept[IllegalArgumentException] {
      SchemaContracts.installLengthChecks(spark, root, Map("Site" -> 8))
    }
    assert(e2.getMessage.contains("len_site"))
    // in-bounds writes still flow
    Versioned.commit(spark, Seq(("S002", "ok2")).toDF("Site", "note"), root)
    assert(Versioned.read(spark, root).count() == 2)
  }

  test("DimLoader.load rejects an over-width value pre-write (reference widths)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dimw").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "dc.csv")
    // dim_DC declares DC NVARCHAR(4) (etl_upload_excel.py:57); "DC001" is 5
    val w = new java.io.PrintWriter(csv)
    try w.println("DC,Region,DC_Type,Company\nDC001,WEST,Main,ACME")
    finally w.close()
    val target = new java.io.File(dir, "dim_DC").getAbsolutePath
    val cfg = DimLoader.config("DC")
    assert(cfg.widths("DC") == 4)
    val e = intercept[IllegalArgumentException] {
      DimLoader.load(spark, cfg, csv.getAbsolutePath, target)
    }
    assert(e.getMessage.contains("`DC`"))
    assert(!new java.io.File(target).exists(), "target untouched on rejection")
    // a conforming file loads
    val w2 = new java.io.PrintWriter(csv)
    try w2.println("DC,Region,DC_Type,Company\nDC01,WEST,Main,ACME")
    finally w2.close()
    DimLoader.load(spark, cfg, csv.getAbsolutePath, target)
    assert(spark.read.parquet(target).count() == 1)
  }
}
