package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** The `graft-versioned` DataSource V2 format must read exactly what the
  * library API reads (snapshot / time travel / changes), resolve the
  * snapshot at plan time (isolation), push filters and prune columns into
  * the native parquet scan, and reject writes (which would bypass the
  * manifest commit protocol).
  */
class VersionedFormatSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vfmt").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def threeCommits(): String = {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "x"), root)
    Versioned.commit(spark, Seq((3L, "a", 30.0)).toDF("id", "k", "x"), root)
    Versioned.commit(spark, Seq((4L, "c", 40.0), (5L, "a", 50.0)).toDF("id", "k", "x"), root)
    root
  }

  test("format read equals library read; short name resolves") {
    val root = threeCommits()
    val viaFormat = spark.read.format("graft-versioned").load(root)
    assert(viaFormat.select("id").as[Long].collect().toSet ==
      Versioned.read(spark, root).select("id").as[Long].collect().toSet)
    assert(viaFormat.count() == 5)
  }

  test("asOf option time-travels; changesFrom/changesTo read the diff") {
    val root = threeCommits()
    assert(spark.read.format("graft-versioned").option("asOf", "1").load(root)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.read.format("graft-versioned").option("asOf", "2").load(root)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(spark.read.format("graft-versioned")
      .option("changesFrom", "1").load(root)
      .select("id").as[Long].collect().toSet == Set(3L, 4L, 5L))
    assert(spark.read.format("graft-versioned")
      .option("changesFrom", "1").option("changesTo", "2").load(root)
      .select("id").as[Long].collect().toSet == Set(3L))
  }

  test("empty change-set reads as zero rows with the snapshot schema") {
    val root = threeCommits()
    val empty = spark.read.format("graft-versioned")
      .option("changesFrom", "3").load(root)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "k", "x"))
  }

  test("plan-time snapshot isolation: later commits don't leak into a loaded frame") {
    val root = threeCommits()
    val pinned = spark.read.format("graft-versioned").load(root)
    Versioned.commit(spark, Seq((99L, "z", 99.0)).toDF("id", "k", "x"), root)
    assert(pinned.count() == 5)
    assert(spark.read.format("graft-versioned").load(root).count() == 6)
  }

  test("filters push down and columns prune into the parquet scan") {
    val root = threeCommits()
    val q = spark.read.format("graft-versioned").load(root)
      .filter(col("id") > 2L).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"expected pushed filter in:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"expected pruned read schema in:\n$plan")
    assert(q.as[Long].collect().toSet == Set(3L, 4L, 5L))
  }

  test("writes through the format are rejected (commit protocol bypass)") {
    val root = threeCommits()
    val err = intercept[Exception] {
      Seq((6L, "d", 60.0)).toDF("id", "k", "x")
        .write.format("graft-versioned").mode("append").save(root)
    }
    // analyzer-level rejection: table advertises BATCH_READ only
    val msg = err.getMessage.toLowerCase
    assert(msg.contains("does not support") || msg.contains("unsupported")
      || msg.contains("does not allow"),
      s"unexpected error: ${err.getMessage}")
    // and the table is untouched
    assert(Versioned.read(spark, root).count() == 5)
  }

  test("asOf and changesFrom are mutually exclusive; missing version fails loudly") {
    val root = threeCommits()
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("asOf", "1").option("changesFrom", "1").load(root)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned").option("asOf", "42").load(root)
    }
  }
}
