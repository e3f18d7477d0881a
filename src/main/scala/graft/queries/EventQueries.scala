package graft.queries

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream processing surface (SURVEY.md §2.9) in batch form:
  * tumbling/sliding windows, gap sessionization, pivot, and JSON
  * property extraction over the `events` table. The same transforms are
  * reused by `graft.streaming.Streams` on unbounded input; these batch
  * twins are what the DuckDB oracle can check.
  *
  * Scale notes: window aggs shuffle once on (window, key) with partial
  * aggregation; sessionization shuffles once on user_id and sorts within
  * partitions (the classic gaps-and-islands plan — at 100 TB the sort is
  * per-user-partition, bounded by per-user event counts, not global).
  */
object EventQueries {

  private val D = DecimalType(18, 6)

  /** DuckDB rendering of the µs-precision event timestamp (the parquet
    * stamps TIMESTAMP(NANOS); Spark reads it as µs via Tables.events). */
  private val tsSql = "make_timestamp(epoch_ns(ts) // 1000)"

  // -------------------------------------------------------------------
  // Tumbling 1-hour window aggregation (watermark-ready shape).
  // -------------------------------------------------------------------
  def eventWindowAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast(DoubleType).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  val eventWindowAggOracle: String =
    s"""SELECT time_bucket(INTERVAL '1 hour', $tsSql) AS window_start, event_type,
       |       COUNT(*) AS n,
       |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
       |FROM events GROUP BY 1, 2
       |""".stripMargin

  // -------------------------------------------------------------------
  // Sliding 2-hour window, 1-hour slide: every event lands in 2 windows.
  // -------------------------------------------------------------------
  def eventSlidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast(DoubleType).as("total"))
      .select(col("w.start").as("window_start"), col("n"), col("total"))

  val eventSlidingWindowOracle: String =
    s"""WITH e AS (
       |  SELECT unnest([time_bucket(INTERVAL '1 hour', $tsSql) - INTERVAL '1 hour',
       |                 time_bucket(INTERVAL '1 hour', $tsSql)]) AS window_start,
       |         value
       |  FROM events)
       |SELECT window_start, COUNT(*) AS n,
       |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
       |FROM e GROUP BY 1
       |""".stripMargin

  // -------------------------------------------------------------------
  // Gap sessionization (30-minute inactivity gap): gaps-and-islands via
  // lag + running sum of session starts, then per-session rollup.
  // -------------------------------------------------------------------
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(ord))
      .withColumn("new_sess",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast(DoubleType).as("total_value"))
  }

  val sessionizeOracle: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value, $tsSql AS ts,
       |         lag(epoch_us($tsSql)) OVER (PARTITION BY user_id ORDER BY $tsSql, event_id) AS prev_us
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
       |                 THEN 1 ELSE 0 END AS new_sess
       |  FROM e),
       |sess AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
       |FROM sess GROUP BY 1, 2
       |""".stripMargin

  // -------------------------------------------------------------------
  // Pivot: per-user event-type counts (explicit value list keeps the
  // column set deterministic, no extra distinct pass).
  // -------------------------------------------------------------------
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def eventPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    eventTypes.foldLeft(p)((d, t) => d.withColumn(t, coalesce(col(t), lit(0L))))
  }

  val eventPivotOracle: String =
    """SELECT user_id,
      |       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // JSON property extraction (semi-structured column handling).
  // -------------------------------------------------------------------
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  val jsonPropsOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |       MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
      |       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY 1
      |""".stripMargin

  // -------------------------------------------------------------------
  // As-of join: each purchase gets the latest click at-or-before it by
  // the same user (point-in-time feature lookup). Single-shuffle
  // union-and-carry plan — see Relational.asofJoin.
  // -------------------------------------------------------------------
  def asofJoinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
    Relational.asofJoin(purchases, clicks, Seq("user_id"),
        col("ts"), col("ts"), col("event_id"),
        Seq("event_id", "ts", "value"), "click_")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"),
        col("click_event_id").as("click_id"), col("click_ts"),
        col("click_value"))
  }

  val asofJoinOracle: String =
    s"""WITH p AS (
       |  SELECT event_id, user_id, $tsSql AS ts, value
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT event_id, user_id, $tsSql AS ts, value
       |  FROM events WHERE event_type = 'click')
       |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       |       p.value AS purchase_value, c.event_id AS click_id,
       |       c.ts AS click_ts, c.value AS click_value
       |FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
       |QUALIFY row_number() OVER (PARTITION BY p.event_id
       |  ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) = 1
       |""".stripMargin

  // -------------------------------------------------------------------
  // Range join: clicks within 7 days AFTER each signup by the same user
  // (attribution-window shape). Bucketized at 1-day granularity — an
  // equi-join on (user, day-bucket) + residual, never a nested loop.
  // -------------------------------------------------------------------
  private val DayUs = 86400000000L // 1 day in µs
  def rangeJoinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("s_us"))
      .withColumn("e_us", col("s_us") + lit(7 * DayUs))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
    Relational.rangeJoin(clicks, signups, Seq("user_id"),
        col("c_us"), col("s_us"), col("e_us"), DayUs)
      .select(col("signup_id"), col("click_id"), col("user_id"),
        ((col("c_us") - col("s_us")) / 1000000L).cast("long").as("secs_after"))
  }

  val rangeJoinOracle: String =
    s"""WITH s AS (
       |  SELECT event_id AS signup_id, user_id, epoch_ns(ts) // 1000 AS s_us
       |  FROM events WHERE event_type = 'signup'),
       |c AS (
       |  SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS c_us
       |  FROM events WHERE event_type = 'click')
       |SELECT s.signup_id, c.click_id, s.user_id,
       |       (c.c_us - s.s_us) // 1000000 AS secs_after
       |FROM c JOIN s ON c.user_id = s.user_id
       |  AND c.c_us >= s.s_us AND c.c_us < s.s_us + ${7 * DayUs}
       |""".stripMargin

  // -------------------------------------------------------------------
  // Conversion funnel — view -> click -> purchase, each stage anchored
  // at the user's FIRST qualifying event at-or-after the previous stage
  // (min-timestamp semantics: deterministic at any parallelism, no
  // window sort — each stage is a hash agg + an equi-join on user_id).
  // The product-analytics shape every event pipeline ends up needing.
  // -------------------------------------------------------------------
  def eventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("t0"))
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    // global aggregates (one row even on empty input) so an empty stage
    // reports 0 users — exactly like the oracle's per-CTE COUNT(*)
    v.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
      .unionByName(c.agg(count(lit(1)).as("users"))
        .select(lit("2_click").as("stage"), col("users")))
      .unionByName(p.agg(count(lit(1)).as("users"))
        .select(lit("3_purchase").as("stage"), col("users")))
  }

  val eventFunnelOracle: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts >= v.t0 GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.t1 GROUP BY 1)
      |SELECT '1_view' AS stage, COUNT(*) AS users FROM v
      |UNION ALL SELECT '2_click', COUNT(*) FROM c
      |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_funnel" -> (eventFunnel _),
    "asof_join" -> (asofJoinQuery _),
    "range_join" -> (rangeJoinQuery _),
    "event_window_agg" -> (eventWindowAgg _),
    "event_sliding_window" -> (eventSlidingWindow _),
    "sessionize" -> (sessionize _),
    "event_pivot" -> (eventPivot _),
    "json_props" -> (jsonProps _),
  )

  val oracles: Map[String, String] = Map(
    "event_funnel" -> eventFunnelOracle,
    "asof_join" -> asofJoinOracle,
    "range_join" -> rangeJoinOracle,
    "event_window_agg" -> eventWindowAggOracle,
    "event_sliding_window" -> eventSlidingWindowOracle,
    "sessionize" -> sessionizeOracle,
    "event_pivot" -> eventPivotOracle,
    "json_props" -> jsonPropsOracle,
  )
}
