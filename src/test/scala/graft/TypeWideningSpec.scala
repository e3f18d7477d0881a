package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-widening schema evolution on [[Versioned]] tables: append commits
  * may move a column along the value-preserving widening lattice
  * (byte/short/int -> larger integral or double, float -> double,
  * decimal precision/scale growth) in either batch-vs-table direction;
  * the recorded schema takes the wider type, old files are served
  * widened by the parquet vectorized reader (no rewrite), and both the
  * stats and bloom sidecars stay correct across mixed physical types —
  * integral bloom hashes are normalized to LONG on build and probe
  * exactly so a widening cannot flip old blooms into false negatives.
  */
class TypeWideningSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_widen").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("int widens to long: old files read widened, no rewrite") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1, "a"), (2, "b")).toDF("v", "k").coalesce(1), root)
    val before = manifestOf(root, 1L)
    Versioned.commit(spark, Seq((3L, "c")).toDF("v", "k").coalesce(1), root)
    // v1's files are carried untouched — widening is metadata-only
    assert(manifestOf(root, 2L).containsSlice(before))
    val now = Versioned.read(spark, root)
    assert(now.schema("v").dataType == LongType)
    assert(now.select("v").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // time travel shows v1's own (int) schema
    assert(Versioned.read(spark, root, asOf = Some(1L)).schema("v").dataType == IntegerType)
  }

  test("narrower batch onto a wider column keeps the wide type") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((10L, 1.5)).toDF("v", "x"), root)
    Versioned.commit(spark, Seq((11, 2.5f)).toDF("v", "x"), root) // int + float batch
    val now = Versioned.read(spark, root)
    assert(now.schema("v").dataType == LongType)
    assert(now.schema("x").dataType == DoubleType)
    assert(now.select("v").as[Long].collect().toSet == Set(10L, 11L))
    assert(now.select("x").as[Double].collect().toSet == Set(1.5, 2.5))
  }

  test("int widens to double; long does NOT (silent rounding past 2^53)") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(Tuple1(7)).toDF("v"), root)
    Versioned.commit(spark, Seq(Tuple1(0.5)).toDF("v"), root)
    assert(Versioned.read(spark, root).as[Double].collect().toSet == Set(7.0, 0.5))
    val root2 = tmpRoot()
    Versioned.commit(spark, Seq(Tuple1(7L)).toDF("v"), root2)
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq(Tuple1(0.5)).toDF("v"), root2)
    }
    assert(e.getMessage.contains("not a value-preserving widening"))
  }

  test("decimal grows precision and scale; shrinking either is rejected") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq(Tuple1(BigDecimal("12.34"))).toDF("d")
        .select(col("d").cast("decimal(10,2)").as("d")), root)
    Versioned.commit(spark,
      Seq(Tuple1(BigDecimal("5.6789"))).toDF("d")
        .select(col("d").cast("decimal(14,4)").as("d")), root)
    val now = Versioned.read(spark, root)
    assert(now.schema("d").dataType == DecimalType(14, 4))
    assert(now.select(col("d").cast("string")).as[String].collect().toSet
      == Set("12.3400", "5.6789"))
    // scale growth that shrinks integer digits is NOT a widening
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark,
        Seq(Tuple1(BigDecimal("1.23456789"))).toDF("d")
          .select(col("d").cast("decimal(14,9)").as("d")), root)
    }
    assert(e.getMessage.contains("not a value-preserving widening"))
  }

  test("range-stats pruning stays correct across mixed physical types") {
    val root = tmpRoot()
    Versioned.commit(spark, (1 to 100).toDF("v").coalesce(1), root,
      statsCols = Seq("v"))
    Versioned.commit(spark, (1000L to 1100L).toDF("v").coalesce(1), root,
      statsCols = Seq("v"))
    // prune to the int-physical band through the widened long schema
    val pruned = Versioned.readPruned(spark, root, "v", Some(10L), Some(20L))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.as[Long].collect().toSet == (10L to 20L).toSet)
  }

  test("int->double widening never lets stale blooms prune (double probes skip blooms)") {
    val root = tmpRoot()
    // bloom built while the column was INT (hashed-as-long)
    Versioned.commit(spark, (0 until 100).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), root, bloomCols = Seq("id"))
    // a double batch widens the column off the integral domain
    Versioned.commit(spark, Seq((1000.5, "w")).toDF("id", "v").coalesce(1), root)
    val table = spark.read.format("graft-versioned").load(root)
    assert(table.schema("id").dataType == DoubleType)
    // the pushed literal is now a DOUBLE: the stale integral bloom would
    // answer "no" for 42.0 — the probe must skip blooms entirely and the
    // row must come back
    assert(table.filter(col("id") === 42.0).count() == 1)
    assert(table.filter(col("id").isin(42.0, 1000.5)).count() == 2)
  }

  test("bloom point lookups survive int->long widening (hash normalized)") {
    val root = tmpRoot()
    Versioned.commit(spark, (0 until 400 by 4).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), root, bloomCols = Seq("id"))
    Versioned.commit(spark, (1L until 400L by 4L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), root, bloomCols = Seq("id"))
    val table = spark.read.format("graft-versioned").load(root)
    assert(table.schema("id").dataType == LongType)
    // 40 was written by the INT batch: its bloom must still answer yes to
    // the LONG literal the widened schema pushes
    val q = table.filter(col("id") === 40L)
    assert(q.count() == 1)
    q.collect()
    val kept = q.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r.table
    }.collectFirst {
      case t: graft.io.VersionedReadTable => t.prunedIndex.lastKeptFiles
    }.get
    assert(kept == 1, "the int-built bloom must match the long-typed probe")
  }
}
