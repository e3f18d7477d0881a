package graft

import graft.ops.Bucketed
import org.apache.spark.sql.functions._

/** Bucketed layout must actually remove the exchanges: an equi-join of two
  * tables bucketed on the join key with equal bucket counts, and a groupBy
  * on the bucket key, must plan with zero Exchange operators — and the
  * results must equal the unbucketed plans'.
  */
class BucketedSpec extends SparkSpecBase {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val tables: Unit = {
    val facts = (1L to 1000L).map(k => (k % 97, k, k * 0.5)).toDF("key", "id", "x")
    val dims = (0L to 96L).map(k => (k, s"name_$k")).toDF("key", "name")
    Bucketed.writeBucketed(facts, "graft_spec_facts", Seq("key"), 4)
    Bucketed.writeBucketedSingleFile(dims, "graft_spec_dims", Seq("key"), 4)
  }

  test("bucketed equi-join with matching bucket counts plans no Exchange") {
    tables
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_spec_facts")
        .join(spark.table("graft_spec_dims"), "key")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange"), s"unexpected Exchange in:\n$plan")
      assert(joined.count() == 1000)
      // same rows as the unbucketed dataflow
      val facts = (1L to 1000L).map(k => (k % 97, k, k * 0.5)).toDF("key", "id", "x")
      val dims = (0L to 96L).map(k => (k, s"name_$k")).toDF("key", "name")
      val expect = facts.join(dims, "key")
        .select("key", "id", "x", "name").collect().toSet
      assert(joined.select("key", "id", "x", "name").collect().toSet == expect)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("groupBy on the bucket key plans no Exchange") {
    tables
    val agg = spark.table("graft_spec_facts")
      .groupBy("key").agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val plan = planOf(agg)
    assert(!plan.contains("Exchange"), s"unexpected Exchange in:\n$plan")
    assert(agg.count() == 97)
    assert(agg.agg(sum("n")).as[Long].head() == 1000L)
  }

  test("mismatched bucket counts still join correctly (one side re-shuffles)") {
    tables
    val dims8 = (0L to 96L).map(k => (k, k * 2)).toDF("key", "twice")
    Bucketed.writeBucketed(dims8, "graft_spec_dims8", Seq("key"), 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_spec_facts")
        .join(spark.table("graft_spec_dims8"), "key")
      assert(joined.count() == 1000)
      assert(joined.filter(col("twice") =!= col("key") * 2).count() == 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
