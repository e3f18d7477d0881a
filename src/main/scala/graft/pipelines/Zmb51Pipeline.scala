package graft.pipelines

import graft.clean.Clean
import graft.io.{SapTextReader, UpsertWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical reference pipeline (pipelines/etl_zmb51.py, traced in
  * SURVEY.md §3.1) as one lazy Spark plan: SAP tab-text scan -> rename ->
  * SAP-number parse -> sign flip -> date parse -> key dropna ->
  * group-aggregate -> keyed upsert on (Article, Site, Date).
  *
  * The reference runs this file-by-file (BATCH_SIZE=1) with eager pandas;
  * here the whole input glob is one scan and Catalyst fuses the cleaning
  * into the aggregation's map side — two stages total at any scale.
  */
object Zmb51Pipeline {

  val renames = Map(
    "Quantity i" -> "Quantity",
    "Amount LC" -> "Cost",
    "Amount in LC" -> "Cost",
    "Pstng Date" -> "Date")

  val upsertKeys = Seq("Article", "Site", "Date")

  /** Transform a raw SAP-text frame (all-string, trimmed headers) into the
    * aggregated movement fact. */
  def transform(raw: DataFrame): DataFrame = {
    val renamed = Clean.renameAll(raw, renames)
    renamed
      .withColumn("Quantity", -Clean.sapNumber(col("Quantity")))
      .withColumn("Cost", -Clean.sapNumber(col("Cost")))
      .withColumn("Date", Clean.sapDate(col("Date")))
      .na.drop(Seq("Article", "Site", "Date"))
      .groupBy(col("Article"), col("Site"), col("Date"))
      .agg(
        sum(col("Quantity")).as("Quantity"),
        sum(col("Cost")).as("Cost"),
        min(col("BUn")).as("BUn")) // deterministic stand-in for pandas first()
  }

  /** Full run: scan the export dir, transform, upsert into the target. */
  def run(spark: SparkSession, inputGlob: String, targetPath: String): Unit =
    UpsertWriter.upsert(spark, transform(SapTextReader.read(spark, inputGlob)),
      targetPath, upsertKeys)
}
