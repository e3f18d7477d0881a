package graft

import graft.queries.CoverageQueries

/** Pins corrStats' int64 combine ENVELOPE (r16 verdict "missing" #2):
  * within it the guarded combine is bit-identical to the direct IEEE
  * expression; past it the query REFUSES loudly instead of silently
  * wrapping (Spark Long multiply wraps, DuckDB errors — an unguarded
  * combine would diverge from the oracle with no symptom). */
class MomentGuardSpec extends SparkSpecBase {
  import spark.implicits._

  private def moments(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long,
                      syy: Long) =
    Seq(("G", n, sx, sy, sxy, sxx, syy))
      .toDF("flag", "n", "sx", "sy", "sxy", "sxx", "syy")

  test("within the envelope the guard is invisible: bit-identical to the " +
    "unguarded IEEE combine") {
    // x = (1,2,3), y = (2,4,7): n=3 sx=6 sy=13 sxy=31 sxx=14 syy=69
    val out = CoverageQueries.corrFromMoments(
      moments(3, 6, 13, 31, 14, 69)).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "G" && out(0).getLong(1) == 3L)
    // the exact op order of the production expression: int64->double
    // conversions (hardware correctly-rounded), then /sqrt/sqrt
    val expected = (3L * 31 - 6L * 13).toDouble /
      math.sqrt((3L * 14 - 6L * 6).toDouble) /
      math.sqrt((3L * 69 - 13L * 13).toDouble)
    assert(out(0).getDouble(2) == expected)
  }

  test("a group past the envelope refuses loudly (n*sxx would wrap) " +
    "instead of emitting a wrapped correlation") {
    // n*sxx = 100 * (Long.Max/50) overflows int64 by 2x; every other
    // product is tiny, so the refusal is attributable to that term
    val bad = moments(100, 10, 10, 10, Long.MaxValue / 50, 10)
    val e = intercept[Exception] {
      CoverageQueries.corrFromMoments(bad).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(chain.contains("moment combine would overflow"), chain)
    assert(chain.contains("n=100"), chain)
  }

  test("a NULL moment emits the null correlation the unguarded expression " +
    "would, not a misattributed overflow refusal") {
    import org.apache.spark.sql.functions.lit
    val withNull = moments(3, 6, 13, 31, 14, 69)
      .withColumn("sxy", lit(null).cast("long"))
    val out = CoverageQueries.corrFromMoments(withNull).collect()
    assert(out.length == 1 && out(0).isNullAt(2), out.toSeq)
  }

  test("the guard is exact integer arithmetic, not double division: the " +
    "rounding false-accept shape (n=2, sxx=2^62) refuses") {
    // a floor-division guard computed with Spark's `/` (DOUBLE division)
    // would accept this: Long.MaxValue rounds up to 2^63, 2^63/2 = 2^62,
    // and 2^62 <= 2^62 — while 2*2^62 wraps to Long.MinValue. The
    // try_multiply guard must refuse.
    val bad = moments(2, 1, 1, 1, 1L << 62, 1)
    val e = intercept[Exception] {
      CoverageQueries.corrFromMoments(bad).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(chain.contains("moment combine would overflow"), chain)
  }

  test("the exactness check is per-PRODUCT, not a magnitude heuristic: " +
    "the boundary is one unit wide") {
    // floor(sqrt(Long.Max)) = 3037000499: its square is the largest
    // representable self-product, so sx = sy = that value keeps every
    // product (sx*sy, sx*sx, sy*sy) inside int64 and the combine runs;
    // one unit higher and the same shape refuses — an exact boundary,
    // not a magnitude heuristic with margin
    val b = 3037000499L
    assert(b * b > 0 && (b + 1) * (b + 1) < 0) // the wrap the guard exists for
    val ok = moments(1, b, b, 1, 1, 1)
    assert(CoverageQueries.corrFromMoments(ok).collect().length == 1)
    val over = moments(1, b + 1, b + 1, 1, 1, 1)
    val e = intercept[Exception] {
      CoverageQueries.corrFromMoments(over).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(chain.contains("moment combine would overflow"), chain)
  }
}
