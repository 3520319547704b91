package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over `events`: gap-fill with linear
  * interpolation, exponential smoothing, and robust (percentile-based)
  * statistics — the observability/feature-engineering band between the
  * calendar densification (`EventOps.qDateDensify`) and the z-score
  * anomaly queries.
  *
  * Scale posture shared by the whole file: raw event volume is only ever
  * touched by hash aggregations (one pass, map-side combined) or
  * broadcast-joined against per-type summary rows. Windows here
  * partition over the HOURLY GRID — |hours in range| × |event types|
  * rows, bounded by the time span, not by event volume — so a 100 TB
  * event history changes the aggregation cost but never the window
  * width. Nothing corpus-sized is collected or broadcast.
  */
object Series {

  /** Hourly mean per (event_type, hour), rounded to 6 dp so both engines
    * interpolate/smooth from bit-identical inputs (the raw avg comes
    * from differently-ordered FP summation).
    */
  private def hourlyKnown(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(avg("value"), 6).as("v"))

  private val hourlyKnownSql =
    """known AS (SELECT event_type, date_trunc('hour', ts) AS hour,
      |    round(avg(value), 6) AS v FROM events GROUP BY 1, 2)""".stripMargin

  /** 4-dp half-up rounding spelled as explicit double arithmetic —
    * `floor(x·10⁴ + 0.5) / 10⁴` — instead of the engines' `round()`.
    * Derived values here (interpolants, EWMA states) land EXACTLY on
    * .xxxx5 boundaries, where Spark's BigDecimal HALF_UP and DuckDB's
    * float rounding disagree by one ulp of the last digit; this formula
    * is the same IEEE multiply-add-floor-divide in both engines, so the
    * result is bit-identical by construction. Positive inputs only.
    */
  private def r4(c: Column): Column =
    floor(c * 10000 + lit(0.5)).cast("double") / 10000
  private def r4Sql(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  /** Gap-fill + linear interpolation: densify each event type's hourly
    * series over its own [min, max] hour span and fill missing hours by
    * interpolating between the previous and next observed points.
    *
    * Determinism: known points are rounded to 6 dp first; the
    * interpolation `pv + (nv - pv) * frac` is then elementwise IEEE
    * arithmetic on identical inputs (frac is a ratio of exact
    * microsecond integers), written in the same operation order in both
    * engines, and the output is rounded to 4 dp.
    */
  val qInterpolate: QuerySpec = QuerySpec(
    "q_interpolate",
    Some(s"""WITH $hourlyKnownSql,
      span AS (SELECT event_type, min(hour) AS mn, max(hour) AS mx
        FROM known GROUP BY 1),
      grid AS (SELECT event_type, unnest(generate_series(mn, mx,
        INTERVAL 1 HOUR)) AS hour FROM span),
      g AS (SELECT grid.event_type, grid.hour, known.v
        FROM grid LEFT JOIN known USING (event_type, hour)),
      f AS (SELECT event_type, hour, v,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
          OVER wp AS ph,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
          OVER wn AS nh
        FROM g
        WINDOW wp AS (PARTITION BY event_type ORDER BY hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY event_type ORDER BY hour
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT event_type, hour, CAST(v IS NOT NULL AS INT) AS is_obs,
        ${r4Sql("""CASE WHEN v IS NOT NULL THEN v
          ELSE pv + (nv - pv) * ((epoch_us(hour) - epoch_us(ph)) /
            CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE)) END""")} AS value
      FROM f ORDER BY event_type, hour"""),
    (spark, dir) => {
      val known = hourlyKnown(spark, dir)
      val span = known.groupBy("event_type")
        .agg(min("hour").as("mn"), max("hour").as("mx"))
      val grid = span.select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 hour")))
          .as("hour"))
      val g = grid.join(known, Seq("event_type", "hour"), "left")
      val wp = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val knownHour = when(col("v").isNotNull, col("hour"))
      val frac = (unix_micros(col("hour")) - unix_micros(col("ph"))) /
        (unix_micros(col("nh")) - unix_micros(col("ph"))).cast("double")
      g.select(col("event_type"), col("hour"), col("v"),
          last(col("v"), ignoreNulls = true).over(wp).as("pv"),
          last(knownHour, ignoreNulls = true).over(wp).as("ph"),
          first(col("v"), ignoreNulls = true).over(wn).as("nv"),
          first(knownHour, ignoreNulls = true).over(wn).as("nh"))
        .select(col("event_type"), col("hour"),
          col("v").isNotNull.cast("int").as("is_obs"),
          r4(when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) * frac))
            .as("value"))
        .orderBy("event_type", "hour")
    })

  /** Per-series point cap for [[ewmaSmoothed]]'s one-task fold: the
    * collected array is the task's memory bound, so it is ASSERTED, not
    * assumed. 1M hourly points ≈ a 114-year series (≈ 16 MB collected),
    * far past any real grid while still an order of magnitude under
    * task-memory trouble. Series past the cap should be re-grained
    * (daily buckets) or segment-folded; silently truncating would
    * corrupt the recurrence, so the guard fails fast instead.
    */
  val EwmaMaxPointsPerSeries = 1000000

  /** EWMA smoothing (α = 0.3) over each type's observed hourly series:
    * y_1 = v_1, y_t = α·v_t + (1−α)·y_{t−1}. The recurrence is
    * inherently sequential per series, so each series is folded IN ONE
    * TASK over its collected points — the per-series state is
    * |hours in range| (time-bounded, NOT event-volume-bounded; the
    * event-volume work happened in the hourly hash agg), which is the
    * same per-key-bounded-state argument the streaming operators make —
    * and capped at `maxPointsPerSeries` (guard raises rather than
    * spill or truncate; see [[EwmaMaxPointsPerSeries]]).
    * The oracle drives the identical recurrence through a recursive CTE.
    *
    * Determinism: inputs rounded to 6 dp; the fold applies the same
    * multiply-add sequence in both engines (doubles; DuckDB literals
    * cast to DOUBLE so no DECIMAL arithmetic sneaks in); output rounded
    * to 4 dp.
    */
  val qEwma: QuerySpec = QuerySpec(
    "q_ewma",
    Some(s"""WITH RECURSIVE $hourlyKnownSql,
      idx AS (SELECT event_type, hour, v,
        row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
        FROM known),
      ew AS (
        SELECT event_type, hour, rn, v, v AS y FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.event_type, i.hour, i.rn, i.v,
          CAST(0.3 AS DOUBLE) * i.v + CAST(0.7 AS DOUBLE) * ew.y
        FROM idx i JOIN ew
          ON i.event_type = ew.event_type AND i.rn = ew.rn + 1)
      SELECT event_type, hour, ${r4Sql("y")} AS ewma FROM ew
      ORDER BY event_type, hour"""),
    (spark, dir) => ewmaSmoothed(spark, dir))

  private[graft] def ewmaSmoothed(spark: SparkSession, dir: String,
      maxPointsPerSeries: Int = EwmaMaxPointsPerSeries): DataFrame = {
      val arr = hourlyKnown(spark, dir)
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour").as("h"),
          col("v").as("v")))).as("pts"))
        // fail fast on a series whose grid exceeds the one-task bound —
        // the error names the series so the caller can re-grain it
        .withColumn("pts",
          when(size(col("pts")) <= lit(maxPointsPerSeries), col("pts"))
            .otherwise(raise_error(concat(
              lit("Series.ewma: series '"), col("event_type"),
              lit(s"' exceeds $maxPointsPerSeries hourly points — " +
                "re-grain (e.g. daily) or segment the fold")))))
      val ys = aggregate(col("pts"), array().cast("array<double>"),
        (acc, x) => concat(acc, array(
          when(size(acc) === 0, x.getField("v"))
            .otherwise(lit(0.3) * x.getField("v") +
              lit(0.7) * element_at(acc, -1)))))
      arr.select(col("event_type"),
          explode(arrays_zip(col("pts").getField("h").as("hour"),
            ys.as("y"))).as("z"))
        .select(col("event_type"), col("z.hour").as("hour"),
          r4(col("z.y")).as("ewma"))
        .orderBy("event_type", "hour")
  }

  /** Winsorization: clip each event's value to its type's [p05, p95]
    * band. Exact linear-interpolation percentiles (Spark `percentile` ≡
    * DuckDB `quantile_cont`) computed in ONE per-type aggregation and
    * broadcast-joined back — never a per-type window over raw events,
    * for the same skew reason as [[EventOps.qZscoreOutliers]].
    * Percentiles rounded to 6 dp before the clip so both engines clip
    * against identical bounds.
    */
  val qWinsorize: QuerySpec = QuerySpec(
    "q_winsorize",
    Some("""WITH st AS (SELECT event_type,
        round(quantile_cont(value, 0.05), 6) AS p05,
        round(quantile_cont(value, 0.95), 6) AS p95
      FROM events GROUP BY 1)
      SELECT e.event_id, e.event_type, e.value,
        round(least(greatest(e.value, st.p05), st.p95), 4) AS clipped
      FROM events e JOIN st USING (event_type)
      ORDER BY event_id"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val st = ev.groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.05)), 6).as("p05"),
             round(percentile(col("value"), lit(0.95)), 6).as("p95"))
      ev.join(broadcast(st), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          round(least(greatest(col("value"), col("p05")), col("p95")), 4)
            .as("clipped"))
        .orderBy("event_id")
    })

  /** Robust outliers via median absolute deviation: flag events where
    * |value − median| > 3 · 1.4826 · MAD — the estimator that, unlike
    * [[EventOps.qZscoreOutliers]], a few extreme points cannot drag.
    * Two per-type aggregations (median, then MAD over deviations), each
    * broadcast-joined back; the robust z is rounded to 6 dp BEFORE the
    * threshold test so both engines decide membership identically.
    */
  val qMadOutliers: QuerySpec = QuerySpec(
    "q_mad_outliers",
    Some("""WITH med AS (SELECT event_type,
        round(quantile_cont(value, 0.5), 6) AS med FROM events GROUP BY 1),
      dev AS (SELECT e.event_id, e.event_type, abs(e.value - m.med) AS dv
        FROM events e JOIN med m USING (event_type)),
      md AS (SELECT event_type, round(quantile_cont(dv, 0.5), 6) AS mad
        FROM dev GROUP BY 1),
      z AS (SELECT d.event_id, d.event_type,
        round(d.dv / (CAST(1.4826 AS DOUBLE) * m.mad), 6) AS rz
        FROM dev d JOIN md m USING (event_type))
      SELECT event_id, event_type, round(rz, 4) AS robust_z FROM z
      WHERE rz > 3 ORDER BY event_id"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val med = ev.groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_id"), col("event_type"),
          abs(col("value") - col("med")).as("dv"))
      val md = dev.groupBy("event_type")
        .agg(round(percentile(col("dv"), lit(0.5)), 6).as("mad"))
      dev.join(broadcast(md), "event_type")
        .withColumn("rz", round(col("dv") / (lit(1.4826) * col("mad")), 6))
        .filter(col("rz") > 3)
        .select(col("event_id"), col("event_type"),
          round(col("rz"), 4).as("robust_z"))
        .orderBy("event_id")
    })

  /** Growth accounting: per-day active users, NEW users (first-ever
    * appearance), and the cumulative unique-user count. Cumulative
    * distinct is NOT computed as a distinct-over-growing-window (which
    * would be quadratic); each user contributes one row at their
    * first-seen day and the cumulative count is a running SUM of new
    * users — the standard scalable rewrite.
    *
    * Scale shape: first-seen is one hash agg keyed on user; DAU is one
    * hash agg keyed on (day, user) then (day); the running-sum window
    * orders the DAILY table — |days| rows, bounded by the calendar, not
    * event volume — so the single-partition window is provably tiny.
    * All outputs are exact integers.
    */
  val qCumulativeUniques: QuerySpec = QuerySpec(
    "q_cumulative_uniques",
    Some("""WITH fs AS (SELECT user_id,
        CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day
        FROM events GROUP BY 1),
      nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1),
      dau AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        count(DISTINCT user_id) AS active_users FROM events GROUP BY 1)
      SELECT dau.day, dau.active_users,
        coalesce(nu.new_users, 0) AS new_users,
        CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY dau.day)
          AS BIGINT) AS cumulative_users
      FROM dau LEFT JOIN nu ON dau.day = nu.day
      ORDER BY dau.day"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val nu = ev.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val dau = ev.groupBy("day")
        .agg(count_distinct(col("user_id")).as("active_users"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(nu, Seq("day"), "left")
        .select(col("day"), col("active_users"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cumulative_users", sum("new_users").over(w))
        .orderBy("day")
    })

  def specs: Seq[QuerySpec] =
    Seq(qInterpolate, qEwma, qWinsorize, qMadOutliers, qCumulativeUniques)
}
