package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the pre-partitioning strategy for
  * repeated large-fact joins at the 100 TB design point: both sides
  * bucketed on the join key join with ZERO exchanges (only per-bucket
  * sorts), so the shuffle is paid once at write time, not per query.
  */
class BucketingSpec extends SparkSpecBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("bucketed-by-key tables join with no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      spark.sql("DROP TABLE IF EXISTS graft_fact_a")
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
      (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_fact_a")
      (1 to 5000).map(i => (i.toLong % 500, i.toLong * 2)).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_fact_b")

      val joined = spark.table("graft_fact_a").join(spark.table("graft_fact_b"), "k")
      val n = joined.count()

      val exchanges = collect(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty, s"expected no shuffle, got: $exchanges")

      // correctness vs the unbucketed join
      val plain = (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "va")
        .join((1 to 5000).map(i => (i.toLong % 500, i.toLong * 2)).toDF("k", "vb"), "k")
      assert(n == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_fact_a")
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
    }
  }
}
