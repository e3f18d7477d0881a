package graft

import graft.clean.Clean
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CleanSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("sapNumber parses SAP formats") {
    assert(one(Clean.sapNumber(lit("1,234.5-"))) == BigDecimal("-1234.500000").bigDecimal)
    assert(one(Clean.sapNumber(lit("12.34"))) == BigDecimal("12.340000").bigDecimal)
    assert(one(Clean.sapNumber(lit(" 1 234 "))) == BigDecimal("1234.000000").bigDecimal)
    assert(one(Clean.sapNumber(lit("abc"))) == null)
    assert(one(Clean.sapNumber(lit("1.2.3-"))) == null)
    assert(one(Clean.sapNumber(lit(null).cast(StringType))) == null)
  }

  test("sapDate parses MM/dd/yyyy, null on garbage") {
    assert(one(Clean.sapDate(lit("03/15/1996"))) == java.sql.Date.valueOf("1996-03-15"))
    assert(one(Clean.sapDate(lit("31/31/1996"))) == null)
    assert(one(Clean.sapDate(lit("nope"))) == null)
  }

  test("dashNull treats '-' as missing") {
    assert(one(Clean.dashNull(lit("-"))) == null)
    assert(one(Clean.dashNull(lit(" - "))) == null)
    assert(one(Clean.dashNull(lit("5"))) == BigDecimal("5.0000").bigDecimal)
  }

  test("stripLeadingZeros keeps single zero for all-zero input") {
    assert(one(Clean.stripLeadingZeros(lit("000123"))) == "123")
    assert(one(Clean.stripLeadingZeros(lit("0000"))) == "0")
    assert(one(Clean.stripLeadingZeros(lit("123"))) == "123")
  }

  test("stripDotZero removes trailing artifact only") {
    assert(one(Clean.stripDotZero(lit("123.0"))) == "123")
    assert(one(Clean.stripDotZero(lit("123.05"))) == "123.05")
  }

  test("normalizeColumnNames trims and collapses whitespace") {
    val df = Seq((1, 2)).toDF("  a  b ", "c\t d")
    assert(Clean.normalizeColumnNames(df).columns.toSeq == Seq("a b", "c d"))
  }

  test("schemaAlign coerces, fills, drops and orders") {
    val df = Seq(("x", "12.5", "oops", "2020-01-01")).toDF("s", "n", "bad", "d")
    val schema = StructType(Seq(
      StructField("n", DecimalType(10, 2)),
      StructField("s", StringType),
      StructField("bad", IntegerType),
      StructField("missing", StringType),
      StructField("d", DateType)))
    val out = Clean.schemaAlign(df, schema)
    assert(out.columns.toSeq == Seq("n", "s", "bad", "missing", "d"))
    val r = out.head
    assert(r.getDecimal(0) == BigDecimal("12.50").bigDecimal)
    assert(r.getString(1) == "x")
    assert(r.isNullAt(2))         // unparseable int -> null (coerce)
    assert(r.getString(3) == "")  // missing string -> empty fill
    assert(r.getDate(4) == java.sql.Date.valueOf("2020-01-01"))
  }
}
