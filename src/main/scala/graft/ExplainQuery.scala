package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of any registered
  * SparkEntry query. Usage:
  *   runMain graft.ExplainQuery <queryName> [sfDir]
  * The round workflow uses this to verify pushdown/pruning/codegen claims
  * (e.g. "the filter reached the scan") instead of guessing from the API.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName(s"explain-$name")
      .getOrCreate()
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
    } finally spark.stop()
  }
}
