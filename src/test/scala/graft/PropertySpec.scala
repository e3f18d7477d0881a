package graft

import graft.clean.Clean
import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests from SURVEY.md §5: round-trip of the SAP number format
  * and algebraic laws of the upsert op. ScalaCheck generators drive the
  * data; each property runs as one batched Spark job to keep the suite
  * fast.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val decimals: Gen[BigDecimal] = for {
    unscaled <- Gen.chooseNum(-999999999999L, 999999999999L)
    scale <- Gen.chooseNum(0, 6)
  } yield BigDecimal(unscaled, scale)

  /** Render a decimal the way SAP exports do: comma thousands grouping on
    * the integer part, trailing minus for negatives. */
  private def sapFormat(d: BigDecimal): String = {
    val abs = d.abs.bigDecimal.toPlainString
    val (intPart, fracPart) = abs.span(_ != '.')
    val grouped = intPart.reverse.grouped(3).mkString(",").reverse
    val s = grouped + fracPart
    if (d < 0) s + "-" else s
  }

  test("sapNumber round-trips SAP-formatted decimals (batch property)") {
    val samples = Gen.listOfN(300, decimals).sample.get
    val df = samples.map(d => (sapFormat(d), d.setScale(6).toString))
      .toDF("raw", "expected")
    val bad = df
      .withColumn("parsed", Clean.sapNumber(col("raw")))
      .filter(col("parsed").isNull || col("parsed") =!= col("expected").cast("decimal(18,6)"))
    assert(bad.count() == 0, s"mismatches: ${bad.take(5).mkString}")
  }

  test("upsertMerge is idempotent and staging-biased (batch property)") {
    val keys = Gen.listOfN(60, Gen.chooseNum(0, 19)).sample.get
    val target = keys.zipWithIndex.map { case (k, i) => (k, s"t$i") }
      .distinctBy(_._1).toDF("k", "v")
    val staging = Gen.listOfN(30, Gen.chooseNum(10, 29)).sample.get
      .zipWithIndex.map { case (k, i) => (k, s"s$i") }
      .distinctBy(_._1).toDF("k", "v")

    val once = Relational.upsertMerge(Seq("k"))(target, staging)
      .as[(Int, String)].collect().toSet
    val twice = Relational.upsertMerge(Seq("k"))(
      once.toSeq.toDF("k", "v"), staging).as[(Int, String)].collect().toSet
    assert(twice == once)

    val stagingKeys = staging.as[(Int, String)].collect().map(_._1).toSet
    // every staging key maps to the staging value
    assert(once.filter(r => stagingKeys(r._1)).forall(_._2.startsWith("s")))
    // non-staging target rows survive untouched
    val targetRows = target.as[(Int, String)].collect().toSet
    assert(targetRows.filter(r => !stagingKeys(r._1)).subsetOf(once))
  }
}
