package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth (SURVEY §2.1): the engine must read and
  * write more than parquet — ORC for columnar interchange, schema'd CSV
  * for the reference's spreadsheet-shaped exports, JSON for event drops —
  * and the parquet path must actually PRUNE partitions under a partition
  * filter (the property that makes date-partitioned layouts work at
  * 100 TB).
  */
class FormatSpec extends SparkSpecBase {
  import spark.implicits._

  /** File sources read everything back nullable; compare names + types. */
  private def shape(st: StructType): Seq[(String, String)] =
    st.fields.toSeq.map(f => (f.name, f.dataType.simpleString))

  private val rows = Seq(
    (1L, "alpha", java.sql.Date.valueOf("1996-03-01"), BigDecimal("12.34"), Seq(1, 2)),
    (2L, "beta", java.sql.Date.valueOf("1996-03-02"), BigDecimal("-0.50"), Seq.empty[Int]))

  test("ORC roundtrip preserves schema and values, incl. decimal and array") {
    val dir = Files.createTempDirectory("orc").toFile.getAbsolutePath + "/t"
    val df = rows.toDF("id", "name", "day", "amt", "xs")
    df.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(shape(back.schema) == shape(df.schema))
    assert(back.as[(Long, String, java.sql.Date, BigDecimal, Seq[Int])]
      .collect().toSet == rows.toSet)
  }

  test("schema'd CSV roundtrip: declared types survive, nulls map to empty") {
    val dir = Files.createTempDirectory("csv").toFile.getAbsolutePath + "/t"
    val df = Seq((1L, "a b", Some(1.5)), (2L, "c,d", None))
      .toDF("id", "s", "x")
    df.write.option("header", "true").csv(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("x", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.schema == schema)
    assert(back.as[(Long, String, Option[Double])].collect().toSet ==
      Set((1L, "a b", Some(1.5)), (2L, "c,d", None))) // quoted comma survives
  }

  test("JSON roundtrip preserves nested structs and arrays under a declared schema") {
    val dir = Files.createTempDirectory("json").toFile.getAbsolutePath + "/t"
    val df = Seq((1L, ("x", 2L), Seq("p", "q"))).toDF("id", "st", "tags")
    df.write.json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(shape(back.schema) == shape(df.schema))
    assert(back.select(col("id"), col("st._1"), col("st._2"), col("tags"))
      .as[(Long, String, Long, Seq[String])].head() == ((1L, "x", 2L, Seq("p", "q"))))
  }

  test("parquet partition pruning: a day filter reads only that day's partitions") {
    val dir = Files.createTempDirectory("prune").toFile.getAbsolutePath + "/t"
    (1 to 100).map(i => (i.toLong, s"d${i % 5}")).toDF("k", "day")
      .write.partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "d3")
    // the partition filter must reach the scan (not be a post-scan Filter)
    val scans = pruned.queryExecution.executedPlan.collectLeaves()
    val scan = scans.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail(s"no file scan leaf in:\n${pruned.queryExecution.executedPlan}"))
    assert(scan.partitionFilters.exists(_.toString.contains("day")),
      s"day predicate not pushed to partition filters: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
    assert(pruned.count() == 20)
  }
}
