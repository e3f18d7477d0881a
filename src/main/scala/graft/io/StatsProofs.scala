package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.graftx.Bridge.Pred

import graft.io.FileStats.ColStats

/** Strict per-file predicate proofs over sidecar stats — the evaluator
  * behind metadata-only DELETE (see `Versioned.deleteWhere`). Where the
  * scan-pruning path asks "MIGHT this file contain a match?" and stays
  * advisory (the predicate is re-applied to every row read), these proofs
  * are LOAD-BEARING: `allRowsMatch` lets a whole file be dropped from the
  * manifest without reading it, and `noRowMatches` lets a file be carried
  * without probing it. Iceberg's StrictMetricsEvaluator is the public
  * prior art for the same split.
  *
  * Provable fragment: conjunctions of `col <op> literal` comparisons
  * (`<, <=, >, >=, =`, either operand order) and `col IS NOT NULL`,
  * parsed from the Column's tree via [[Bridge.predTree]]. Any node
  * outside the fragment rejects the WHOLE predicate and the caller falls
  * back to scanning — OR, inequality, casts, and functions are
  * deliberately out of scope (a cast-wrapped column would need the
  * cast's monotonicity proven per type pair).
  *
  * Soundness rules, each load-bearing:
  *  - A row whose column is NULL satisfies no comparison (SQL three-valued
  *    logic → the row is NOT deleted), so `allRowsMatch` additionally
  *    requires the file's recorded null count to be exactly 0. Unknown
  *    (-1, pre-null-tracking sidecars) never proves.
  *  - `noRowMatches` needs no null knowledge: stats bound every NON-null
  *    value, and null rows fail the predicate on their own.
  *  - Float/double stats are excluded from BOTH proofs: SQL comparison
  *    normalizes -0.0 == 0.0 (and joins NaN == NaN) while the stats total
  *    order distinguishes them, so `x < 0.0` over a file whose max is
  *    -0.0 would "prove" all-match for rows SQL keeps.
  *  - Strictness is preserved exactly: `col < v` proves all-match only if
  *    max(col) is strictly below v; the relaxed-to-inclusive shortcut the
  *    advisory path takes would delete boundary rows here.
  *  - Parquet writers may truncate long binary min/max, but always to a
  *    valid (looser) bound — both proofs only ever get MORE conservative.
  */
private[io] object StatsProofs {

  /** One conjunct: an interval constraint on one column — each bound is
    * (value, inclusive) — or a bare IS NOT NULL (both bounds None). */
  final case class Conjunct(col: String,
                            lo: Option[(Any, Boolean)],
                            hi: Option[(Any, Boolean)])

  def parseColumn(c: Column): Option[Seq[Conjunct]] = parse(Bridge.predTree(c))

  private def parse(p: Pred): Option[Seq[Conjunct]] = p match {
    case Pred.Fn("and", Seq(l, r)) =>
      for (a <- parse(l); b <- parse(r)) yield a ++ b
    case Pred.Fn("isNotNull" | "isnotnull", Seq(Pred.Attr(a))) =>
      Some(Seq(Conjunct(a, None, None)))
    case Pred.Fn(op @ ("<" | "<=" | ">" | ">=" | "=" | "=="), Seq(l, r)) =>
      (l, r) match {
        case (Pred.Attr(a), lit: Pred.Lit) =>
          litValue(lit).map(v => Seq(conjunct(a, op, v)))
        case (lit: Pred.Lit, Pred.Attr(a)) =>
          litValue(lit).map(v => Seq(conjunct(a, flip(op), v)))
        case _ => None
      }
    case _ => None
  }

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case eq => eq
  }

  private def conjunct(a: String, op: String, v: Any): Conjunct = op match {
    case "<" => Conjunct(a, None, Some((v, false)))
    case "<=" => Conjunct(a, None, Some((v, true)))
    case ">" => Conjunct(a, Some((v, false)), None)
    case ">=" => Conjunct(a, Some((v, true)), None)
    case _ => Conjunct(a, Some((v, true)), Some((v, true)))
  }

  /** Literal -> the bound domain FileStats.coerce accepts. External JVM
    * values (DSL literals) pass through; typed literals from wrapped
    * catalyst trees carry internal encodings (epoch-day Int, micros Long,
    * UTF8String) decoded by the SAME translator the advisory pruner uses
    * ([[StatsPrunedFileIndex.internalValue]]) so the two paths can never
    * diverge. Unknown shapes reject the predicate — a half-understood
    * literal must not half-prove. */
  private def litValue(l: Pred.Lit): Option[Any] = (l.dataType, l.value) match {
    case (_, null) => None
    // external JVM shapes first: a DSL literal can carry its declared
    // type alongside the EXTERNAL value, which the internal decoder
    // would misread (e.g. TimestampType + java.sql.Timestamp)
    case (_, x: java.sql.Timestamp) => Some(x)
    case (_, x: java.time.Instant) => Some(x)
    case (_, x: java.sql.Date) => Some(x)
    case (_, x: java.time.LocalDate) => Some(x)
    case (_, x: String) => Some(x)
    case (Some(dt), v) => StatsPrunedFileIndex.internalValue(dt, v)
    case (None, x: Number) => Some(x)
    case _ => None
  }

  /** TRUE only when the stats PROVE every row of the file satisfies every
    * conjunct: usable non-float stats, exactly zero nulls, and the whole
    * [min, max] interval inside each bound (strictness respected). */
  def allRowsMatch(byCol: Map[String, ColStats], cs: Seq[Conjunct]): Boolean =
    cs.forall { c =>
      byCol.get(c.col).exists { s =>
        s.nulls == 0L &&
        ((c.lo.isEmpty && c.hi.isEmpty) || s.tag != "double") &&
        c.lo.forall { case (v, incl) =>
          cmpExact(s, s.min, v).exists(r => if (incl) r >= 0 else r > 0) } &&
        c.hi.forall { case (v, incl) =>
          cmpExact(s, s.max, v).exists(r => if (incl) r <= 0 else r < 0) }
      }
    }

  /** TRUE only when the stats PROVE no row satisfies the predicate: some
    * conjunct's interval is disjoint from the file's non-float [min, max]
    * (null rows fail every comparison on their own, so null counts are
    * irrelevant here; a bare IS NOT NULL conjunct proves nothing). */
  def noRowMatches(byCol: Map[String, ColStats], cs: Seq[Conjunct]): Boolean =
    cs.exists { c =>
      byCol.get(c.col).exists { s =>
        s.tag != "double" && (
          c.lo.exists { case (v, incl) =>
            cmpExact(s, s.max, v).exists(r => if (incl) r < 0 else r <= 0) } ||
          c.hi.exists { case (v, incl) =>
            cmpExact(s, s.min, v).exists(r => if (incl) r > 0 else r >= 0) })
      }
    }

  /** FileStats.cmpStat with a LOSSLESS-coercion gate. The advisory pruner
    * tolerates coerce()'s truncations (`longValue`, epoch-milli) because
    * every row is re-filtered after the scan; a load-bearing proof must
    * not — `id <= -0.5` truncated to `id <= 0` would drop a file whose
    * id=0 row SQL keeps. A bound that is not exactly representable in the
    * stat's domain compares as unknown, and both proofs fall back to the
    * scan path (conservative in each direction). */
  private def cmpExact(s: ColStats, stat: String, v: Any): Option[Int] =
    if (lossless(s.tag, v)) FileStats.cmpStat(s, stat, v) else None

  private def lossless(tag: String, v: Any): Boolean = (tag, v) match {
    case ("long", _: java.lang.Long | _: java.lang.Integer |
                  _: java.lang.Short | _: java.lang.Byte) => true
    case ("long", n: java.lang.Float) => wholeLong(n.doubleValue)
    case ("long", n: java.lang.Double) => wholeLong(n.doubleValue)
    case ("long", n: java.math.BigDecimal) =>
      scala.math.BigDecimal(n).isValidLong
    case ("long", n: scala.math.BigDecimal) => n.isValidLong
    case ("long", _) => false // unknown Number subtypes must not truncate
    case ("ts-millis", t: java.sql.Timestamp) => t.getNanos % 1000000 == 0
    case ("ts-millis", i: java.time.Instant) => i.getNano % 1000000 == 0
    case ("ts-micros", t: java.sql.Timestamp) => t.getNanos % 1000 == 0
    case ("ts-micros", i: java.time.Instant) => i.getNano % 1000 == 0
    case _ => true // string/date coercions are exact; "double" never proves
  }

  /** v is a whole number exactly representable as a Long (rejects NaN,
    * infinities, fractions, and magnitudes past 2^63). */
  private def wholeLong(v: Double): Boolean =
    v == Math.rint(v) && v.toLong.toDouble == v && Math.abs(v) < 9.223372036854776e18
}
