package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s   rows=$n")
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    t("count")(li.count())
    t("count2")(li.count())
    t("groupBy double sum")(li.groupBy("l_partkey","l_suppkey").agg(sum("l_quantity")).count())
    t("groupBy decimal sum")(li.groupBy("l_partkey","l_suppkey").agg(sum(col("l_quantity").cast(DecimalType(18,6)))).count())
    t("groupBy 3key date decimal")(li.groupBy(col("l_partkey"),col("l_suppkey"),to_date(col("l_shipdate"))).agg(sum(col("l_quantity").cast(DecimalType(18,6))), sum((-col("l_extendedprice")*(lit(1)-col("l_discount"))).cast(DecimalType(18,6))), min(col("l_returnflag"))).count())
    t("movement_agg")(graft.queries.RefQueries.movementAgg(spark, d).count())
    t("weekly_sales")(graft.queries.RefQueries.weeklySales(spark, d).count())
    t("weekly_sales2")(graft.queries.RefQueries.weeklySales(spark, d).count())
    spark.stop()
  }
}
