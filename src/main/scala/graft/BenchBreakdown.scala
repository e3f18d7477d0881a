package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of the SQL MERGE bench entries — the
  * recorded answer to "why is `versioned_sql_merge_cond` the heaviest
  * bench query": how much of it is the 3-commit table build, the MERGE
  * statement itself, and specifically the NOT-MATCHED-BY-SOURCE clause
  * (which by definition probes every target file — Delta/Iceberg pay the
  * same full scan).
  *
  * Four shapes over the same source view, each on a freshly built table:
  *   build_*        — the 3-commit versioned `orders` build (write path)
  *   merge_upsert   — 2-clause UPDATE SET * / INSERT * (the
  *                    `versioned_sql_merge` shape)
  *   merge_cond3    — conditional UPDATE / DELETE / conditional INSERT
  *                    (the clause CASE-tree cost, still probe-pruned)
  *   merge_cond4    — cond3 + NOT MATCHED BY SOURCE UPDATE (forces the
  *                    full-scan probe; cond4 − cond3 isolates NMBS)
  *
  * Prints one JSON line of per-stage minimums over 3 iterations (same
  * min-of-N protocol as [[Bench]]). Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchBreakdown"
  */
object BenchBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(dir: String): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      def stage[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        out += name -> (System.nanoTime() - t0) / 1e9
        r
      }
      val orders = Tables.orders(spark, dir)
      val updates = orders.filter(pmod(col("o_orderkey"), lit(5)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = orders.filter(pmod(col("o_orderkey"), lit(5)) === 1)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      updates.unionByName(inserts).createOrReplaceTempView("graft_bd_src")

      val (idU, _) = stage("build_upsert") {
        queries.VersionedQueries.buildSqlTable(spark, dir, "orders_bd_u")
      }
      stage("merge_upsert") {
        spark.sql(
          s"""MERGE INTO $idU t USING graft_bd_src s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      stage("readback_agg") {
        spark.table(idU).groupBy("o_orderstatus").count().count()
      }

      val (id3, _) = stage("build_cond3") {
        queries.VersionedQueries.buildSqlTable(spark, dir, "orders_bd_c3")
      }
      stage("merge_cond3") {
        spark.sql(
          s"""MERGE INTO $id3 t USING graft_bd_src s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED AND s.o_totalprice > 200000 THEN UPDATE SET *
             |WHEN MATCHED AND t.o_orderkey % 10 = 0 THEN DELETE
             |WHEN NOT MATCHED AND s.o_orderkey % 2 = 1 THEN INSERT *""".stripMargin)
      }

      val (id4, _) = stage("build_cond4") {
        queries.VersionedQueries.buildSqlTable(spark, dir, "orders_bd_c4")
      }
      stage("merge_cond4") {
        spark.sql(
          s"""MERGE INTO $id4 t USING graft_bd_src s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED AND s.o_totalprice > 200000 THEN UPDATE SET *
             |WHEN MATCHED AND t.o_orderkey % 10 = 0 THEN DELETE
             |WHEN NOT MATCHED AND s.o_orderkey % 2 = 1 THEN INSERT *
             |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 97 = 3
             |  THEN UPDATE SET o_orderpriority = 'NMBS'""".stripMargin)
      }
      out.toSeq
    }

    val warmupDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warmupDir.isDirectory)
      try once(warmupDir.getAbsolutePath) catch { case _: Throwable => () }

    val runs = Seq.fill(3)(once(sfDir))
    val names = runs.head.map(_._1)
    val mins = names.map { n =>
      n -> runs.map(_.toMap.apply(n)).min
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3g", Double.box(v))
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"merge_breakdown","stages":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
