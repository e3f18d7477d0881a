package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators mirroring the reference's dataflow surface
  * (SURVEY.md §2), written shuffle-aware for the 100 TB design point:
  * every op is a pure DataFrame => DataFrame transform composable via
  * Dataset.transform, aggregations are partial+final hash aggs, small sides
  * of joins are broadcast by the caller.
  */
object Relational {

  /** D2 keep-last dedup (pipelines/etl_zmmidr_oun.py:72-76). The reference
    * relies on file/row order; distributed execution needs an explicit order,
    * so callers pass the ordering columns that define "last".
    *
    * Planned via the `graft_argmax` hash aggregate, not a window: the
    * `row_number() OVER (PARTITION BY keys ORDER BY order DESC) = 1` form
    * exchanges every input row and sorts whole partitions to discard all
    * but one row per key — at 100 TB the shuffle carries the full table
    * and a hot key serializes one task. The argmax form keeps one
    * (order, row) pair per key per task map-side, so the single exchange
    * ships at most |keys|×tasks buffered rows and nothing is ever sorted.
    * Same winner row: ties and null ordering match the window defaults
    * (see ArgMaxRow).
    */
  def dedupKeepLast(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame =
    argPick(keys, order, df, graft.functions.GraftExpressions.argMaxRow)

  /** D1 keep-first dedup with deterministic ordering — argmin twin of
    * [[dedupKeepLast]], same single-exchange no-sort plan. */
  def dedupKeepFirst(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame =
    argPick(keys, order, df, graft.functions.GraftExpressions.argMinRow)

  private def argPick(keys: Seq[String], order: Seq[Column], df: DataFrame,
                      pick: (Column, Column) => Column): DataFrame = {
    // backtick-quote: raw names may contain dots (SAP headers like
    // Bill.Doc) that col() would parse as nested-field paths
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    // positional field names: restoring by name would be ambiguous when
    // the input carries duplicate column names (e.g. an un-dropped join
    // key), which the window form this replaces accepted fine
    val payload = struct(df.columns.toSeq.zipWithIndex.map {
      case (c, i) => q(c).as(s"_$i")
    }: _*)
    df.groupBy(keys.map(q): _*)
      .agg(pick(struct(order: _*), payload).as("__w"))
      .select(df.columns.toSeq.zipWithIndex.map {
        case (c, i) => col("__w").getField(s"_$i").as(c)
      }: _*)
  }

  /** D3 duplicate detection: keys occurring more than once, with counts
    * (pipelines/etl_zmmidr_oun.py:72-75). */
  def duplicateKeys(keys: Seq[String])(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** J4 anti-join new-key detection (pipelines/etl_zmachk.py:113-117).
    * `existing` is expected to be small relative to batch -> broadcast it. */
  def antiJoinNewKeys(existing: DataFrame, keys: Seq[String])(batch: DataFrame): DataFrame =
    batch.join(broadcast(existing.select(keys.map(col): _*).distinct()), keys, "left_anti")

  /** J2 full-outer merge of two keyed measure streams with COALESCE'd keys
    * and zero-filled measures (pipelines/etl_weekly_sales.py:38-49).
    * Using-columns join coalesces the keys; measures are zero-filled here.
    * Both sides shuffle on the same keys -> single exchange each, and AQE
    * turns this into a broadcast join when one side is small.
    */
  def coalescedFullOuterMerge(keys: Seq[String], zeroFill: Seq[String])(
      left: DataFrame, right: DataFrame): DataFrame = {
    val joined = left.join(right, keys, "full_outer")
    zeroFill.foldLeft(joined)((d, m) =>
      d.withColumn(m, coalesce(col(m), lit(0).cast(d.schema(m).dataType))))
  }

  /** A2 regional rollup (pipelines/etl_zmmidr_oun.py:142-170): per region,
    * filter member sites, aggregate per article, stamp the region label,
    * union regions. Single pass: membership map (a tiny `(siteCol, region)`
    * DataFrame) is broadcast-joined in, then one groupBy(region, groupKey) —
    * avoids one shuffle per region at scale; sites outside any region drop
    * out via the inner join (the reference's isin filters). */
  def regionRollup(
      membership: DataFrame,
      siteCol: String,
      groupKey: String,
      aggs: Seq[Column])(df: DataFrame): DataFrame =
    df.join(broadcast(membership), Seq(siteCol), "inner")
      .groupBy(col("region"), col(groupKey))
      .agg(aggs.head, aggs.tail: _*)

  /** S8/J6 keyed upsert semantics (common/loader.py:41-153) as a dataflow
    * op: staging rows override target rows on matching keys, unmatched
    * target rows survive, new staging rows insert. One shuffle on `keys`.
    * Replay-idempotent: upsert(upsert(t, s), s) == upsert(t, s). */
  def upsertMerge(keys: Seq[String])(target: DataFrame, staging: DataFrame): DataFrame = {
    val t = target.withColumn("__prec", lit(0))
    val s = staging.withColumn("__prec", lit(1))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prec").desc)
    t.unionByName(s)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__prec")
  }

  /** A5 conditional aggregates (pipelines/etl_StoreRP.py:126-134):
    * COUNT(CASE WHEN pred THEN 1 END), AVG(CASE WHEN pred THEN x END). */
  def countWhere(pred: Column): Column = count(when(pred, 1))
  def avgWhere(pred: Column, value: Column): Column = avg(when(pred, value))

  /** 2.7 bag union by name over any number of inputs. */
  def unionAllByName(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** 2.6 "latest snapshot" selection, date-agnostic variant
    * (pipelines/etl_StoreRP.py:137-149). */
  def latestSnapshot(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame =
    dedupKeepLast(keys, order)(df)

  /** As-of join (beyond-reference temporal primitive): for every left
    * row, attach the payload of the latest right row whose `rightTime`
    * is <= the left row's `leftTime`, per join key — the point-in-time
    * lookup a snapshot/fact enrichment needs (and what a training-data
    * pipeline uses to join features "as of" a label timestamp).
    *
    * Spark has no ASOF JOIN operator; the scalable restatement is the
    * union-and-carry plan: tag both sides, union, and carry the last
    * right payload forward with a running `last(ignoreNulls)` window.
    * ONE shuffle on the keys + a per-key sort — no range join, no
    * per-key loop, no quadratic candidate set; at 100 TB the sort is
    * bounded per key, and skewed keys fall under AQE like any window.
    *
    * Determinism: at equal timestamps the right row sorts first
    * (inclusive <=), and `rightOrd` totally orders right rows sharing a
    * timestamp (highest wins). Payload travels as one struct so all
    * attached columns come from the SAME right row. Left rows with no
    * prior right row get nulls (left-outer semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: Column, rightTime: Column, rightOrd: Column,
               payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    // A null right timestamp would sort NULLS FIRST in the ascending
    // window and be carried into every left row as a phantom "earliest"
    // match; the inequality formulation (rt <= t) never matches null,
    // so drop such rows up front.
    val r = right.filter(rightTime.isNotNull).select(
      keys.map(col) ++ Seq(rightTime.as("__t"), rightOrd.as("__ord"),
        struct(payload.map(col): _*).as("__asof")): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(null).cast(r.schema("__ord").dataType))
      .withColumn("__asof", lit(null).cast(r.schema("__asof").dataType))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__last", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(s"`$c`")) ++ // backtick: dotted names
        payload.map(c => col(s"__last.`$c`").as(prefix + c)): _*)
  }

  /** Range (interval) join — left point rows joined to right interval
    * rows with `start <= point < end`, per key. Spark would execute the
    * naive inequality join as BroadcastNestedLoopJoin (quadratic); the
    * scalable restatement buckets the domain at `bucket` granularity:
    * each interval explodes to the buckets it covers, each point maps to
    * one bucket, and the join becomes a plain equi-join on
    * (keys, bucket) + a residual predicate. Candidates per point are
    * bounded by intervals overlapping its bucket — pick `bucket` near the
    * typical interval span so explosion stays O(1) per interval. A
    * (point, interval) pair meets in exactly one bucket (the point's), so
    * no dedup is needed. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                point: Column, start: Column, end: Column,
                bucket: Long): DataFrame = {
    // exact integer floor-div: subtracting pmod makes the numerator an
    // exact multiple, so the double division is exact — a plain
    // floor(x / bucket) could misround at bucket boundaries
    def bucketOf(c: Column) = ((c - pmod(c, lit(bucket))) / bucket).cast("long")
    val l = points.withColumn("__b", bucketOf(point))
    // Guard degenerate intervals (end <= start): sequence(a, b) with
    // b < a generates a DESCENDING range, so one corrupt row (e.g.
    // end=0 against an epoch-micros start) would materialize a huge
    // array and OOM the task before the residual filter runs. Empty
    // intervals match no point under start <= p < end, so explode an
    // empty array and let the row vanish.
    val r = intervals.withColumn("__b",
      explode(when(start < end, sequence(bucketOf(start), bucketOf(end - 1)))
        .otherwise(array().cast("array<long>"))))
    l.join(r, (keys :+ "__b").toIndexedSeq)
      .filter(point >= start && point < end)
      .drop("__b")
  }

  /** Skew-salted aggregation: when a grouping key is pathologically hot
    * (one key >> executor memory), aggregate in two stages — first on
    * (key, salt) with salt = hash(whole row) % factor, then on key.
    * Works for decomposable aggregates (sum/count/min/max); both stages
    * are partial+final hash aggs, so the extra shuffle only carries
    * `factor` rows per hot key. AQE's skew handling covers joins; this
    * covers the aggregation side it doesn't. */
  def saltedSum(keys: Seq[String], sums: Seq[(String, String)], factor: Int)(
      df: DataFrame): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sums.map { case (c, a) => sum(col(c)).as(a) }.head,
        sums.tail.map { case (c, a) => sum(col(c)).as(a) }: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(sums.map { case (_, a) => sum(col(a)).as(a) }.head,
        sums.tail.map { case (_, a) => sum(col(a)).as(a) }: _*)
  }

  /** Skew-salted broadcast-free join: replicate the (small) right side
    * `factor` times and salt the left side, so one hot left key spreads
    * over `factor` reducers. For when the right side is too big to
    * broadcast but small enough to replicate sparsely, and AQE's runtime
    * skew split is unavailable (e.g. disabled or non-AQE deployments). */
  def saltedJoin(right: DataFrame, keys: Seq[String], factor: Int)(
      left: DataFrame): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
