package graft.io

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin JDBC federation surface — the reference pulls parameterized query
  * results from SQL Server into frames (pipelines/etl_weekly_sales.py:54,
  * etl_StoreRP.py:204). The engine is the query processor for those
  * workloads (SURVEY S5), but TRUE federation — a dimension living in an
  * external RDBMS joined against lake facts — is Spark's built-in JDBC
  * source; this object pins the two shapes that matter at scale and the
  * seeding helper the specs/queries use against embedded Derby (the RDBMS
  * already on Spark's classpath, standing in for any JDBC server).
  *
  * Scale posture:
  *   - [[readQuery]] pushes the WHOLE query to the remote engine and reads
  *     the (dimension-sized) result on ONE task — the reference's
  *     `pd.read_sql` shape. Right when the result is small; a 100 TB fact
  *     must NOT come through this path.
  *   - [[readPartitioned]] range-splits the table on a numeric column into
  *     `numPartitions` independent JDBC reads — each of 1000 executors
  *     opens its own connection and reads its slice, and Catalyst pushes
  *     filters/required columns down to the remote engine
  *     (`PushedFilters` visible in the scan — spec-asserted).
  * Column identifiers are created QUOTED lowercase so Spark's
  * dialect-quoted SQL round-trips without case mangling (unquoted Derby
  * identifiers fold to uppercase).
  */
object Jdbc {

  /** (Re)create `table` with the given column DDL and load `df` into it
    * through Spark's own JDBC writer (one INSERT batch per partition —
    * executor-side, no driver collect). Test/demo fixture: stands in for
    * the DBA-owned table that already exists in a real deployment. */
  def seed(url: String, table: String, cols: Seq[(String, String)],
           df: DataFrame): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // no DROP IF EXISTS in Derby: swallow ONLY does-not-exist (42Y55);
      // any other failure (lock timeout, bad identifier) must surface
      // here, not as a misleading already-exists on the CREATE below
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case e: java.sql.SQLException if e.getSQLState == "42Y55" => () }
      st.executeUpdate(
        s"CREATE TABLE $table (${cols.map(c => s""""${c._1}" ${c._2}""").mkString(", ")})")
    } finally conn.close()
    df.coalesce(1).write.mode("append")
      .format("jdbc").option("url", url).option("dbtable", table).save()
  }

  /** Remote-evaluated query, dimension-sized result (the `pd.read_sql`
    * shape): the database runs `query`, Spark reads the result. */
  def readQuery(spark: SparkSession, url: String, query: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("query", query).load()

  /** Range-partitioned table read: `numPartitions` tasks each read one
    * `partCol` slice over its own connection. Bounds only steer the
    * split points — rows outside [lower, upper] still land in the first/
    * last slice, so the read is always complete. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
