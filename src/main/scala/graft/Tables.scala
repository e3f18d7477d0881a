package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At the
  * 100 TB design point these would be partitioned parquet/iceberg tables; the
  * loaders stay the single seam where partition pruning / bucketing metadata
  * would attach, so query code never hardcodes paths.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  /** `events.ts` has shifted parquet types across testdata generations:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects except as
    * long via the legacy conf — the ns→µs division is exact, the generator
    * emits micro-precision values) and plain timestamp[us] (which infers
    * as TIMESTAMP_NTZ under the default inferTimestampNTZ). Normalize
    * EVERY shape to the session-TZ TimestampType here — sessions pin UTC,
    * so the wall-clock values are identical in all cases and downstream
    * window/watermark code sees one stable type. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
