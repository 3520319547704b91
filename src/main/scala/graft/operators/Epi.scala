package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Epidemiological calendar + epi-curve primitives — the reporting
  * spine of the reference's domain: CDC surveillance programs
  * aggregate case counts by MMWR WEEK (the public MMWR/epi-week
  * definition: weeks run Sunday–Saturday; week 1 of a year is the
  * week containing at least four January days, equivalently the week
  * whose WEDNESDAY falls in the new year), and publish weekly epi
  * curves with smoothing. The reference deploys the services around
  * exactly this reporting tier (`/root/reference/README.md:2-4`,
  * surveillance shared services over the MySQL store).
  *
  * The week computation is pure date arithmetic as column
  * expressions (no UDF, codegen-friendly): Sunday-of-week via
  * `dayofweek`, anchor = Sunday + 3 (that week's Wednesday), then
  * `mmwr_year = year(anchor)` and `mmwr_week =
  * (dayofyear(anchor) - 1) / 7 + 1` — consecutive Wednesdays are 7
  * days apart and the first MMWR week's Wednesday always has
  * day-of-year 1..7, so the quotient is exact. The DuckDB oracle
  * implements the same definition INDEPENDENTLY from its own
  * dayofweek convention (Sunday = 0 there, = 1 in Spark), so a hash
  * match cross-checks the epi-calendar logic itself, not a shared
  * formula transliterated.
  *
  * Scale: one hash aggregation by (year, week) — a few thousand
  * groups whatever the corpus — then a window over the tiny weekly
  * frame for the moving average. The corpus appears exactly once.
  */
object Epi {

  /** MMWR anchor: the Wednesday of `d`'s Sunday-started week. */
  private def mmwrAnchor(d: Column): Column =
    date_add(date_sub(to_date(d), dayofweek(to_date(d)) - 1), 3)

  /** MMWR year of a date/timestamp column. */
  def mmwrYear(d: Column): Column = year(mmwrAnchor(d))

  /** MMWR week number (1..53) of a date/timestamp column. */
  def mmwrWeek(d: Column): Column =
    ((dayofyear(mmwrAnchor(d)) - 1) / 7 + 1).cast("int")

  /** Weekly epi curve over the orders "line list": case counts and
    * exact-cents revenue per MMWR week, plus a centered 3-week moving
    * average of the count over each year's ordered weeks — the
    * standard smoothed weekly curve. Every year boundary in the
    * fixture's 7-year span exercises the week-1/week-52/53 rule
    * (where MMWR differs from naive ISO weeks — Sunday start AND the
    * four-January-days rule).
    */
  val qEpiweekCurve: QuerySpec = QuerySpec(
    "q_epiweek_curve",
    Some("""WITH anchored AS (
        SELECT CAST(o_orderdate AS DATE)
            - CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT)
            + 3 AS wed,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      weekly AS (
        SELECT year(wed) AS mmwr_year,
          (dayofyear(wed) - 1) // 7 + 1 AS mmwr_week,
          count(*) AS n, sum(cents) AS cents
        FROM anchored GROUP BY 1, 2)
      SELECT mmwr_year, mmwr_week, n,
        CAST(cents AS DOUBLE) / 100 AS revenue,
        round(avg(n) OVER (PARTITION BY mmwr_year ORDER BY mmwr_week
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS ma3
      FROM weekly ORDER BY mmwr_year, mmwr_week"""),
    (spark, dir) => {
      val weekly = Tables.load(spark, dir, "orders")
        .groupBy(mmwrYear(col("o_orderdate")).as("mmwr_year"),
          mmwrWeek(col("o_orderdate")).as("mmwr_week"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      val w = Window.partitionBy("mmwr_year").orderBy("mmwr_week")
        .rowsBetween(-1, 1)
      weekly.select(col("mmwr_year"), col("mmwr_week"), col("n"),
        (col("cents").cast("double") / 100).as("revenue"),
        round(avg(col("n")).over(w), 4).as("ma3"))
        .orderBy("mmwr_year", "mmwr_week")
    })

  /** EARS C2 aberration detection (CDC's Early Aberration Reporting
    * System, public algorithm): for each series and day, the test
    * statistic is `(count − μ) / σ` where μ/σ come from the 7-day
    * baseline ending 3 days before the test day (the 2-day guard band
    * that keeps an emerging signal out of its own baseline); a day
    * alerts when the statistic ≥ 3 with σ > 0. Order priorities stand
    * in for syndromes (5 independent series over the orders line
    * list).
    *
    * Correctness needs a DENSE day spine — a zero-case day must enter
    * the baseline as 0, not vanish (lag-window detectors silently
    * corrupt on sparse series): the spine is `sequence(min, max)` ×
    * series, left-joined to counts, zero-filled. Membership is
    * decided on the 6-dp-rounded statistic in BOTH engines (the
    * qZscoreOutliers discipline — a raw quotient within an ulp of 3
    * would flip the alert set between engines).
    *
    * Scale: the spine is DAYS × SERIES — metadata-sized versus the
    * corpus. The corpus appears once in the daily hash aggregation;
    * the window partitions by series over the small dense frame.
    */
  val qEarsAlerts: QuerySpec = QuerySpec(
    "q_ears_alerts",
    Some("""WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
          count(*) AS n
        FROM orders GROUP BY 1, 2),
      bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS d0,
          max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
      spine AS (
        SELECT p.prio, s.day
        FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) p,
          (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
             AS day FROM bounds) s),
      dense AS (
        SELECT spine.prio, spine.day, coalesce(daily.n, 0) AS n
        FROM spine LEFT JOIN daily
          ON daily.prio = spine.prio AND daily.day = spine.day),
      stat AS (
        SELECT prio, day, n,
          avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sigma
        FROM dense
        WINDOW w AS (PARTITION BY prio ORDER BY day
          ROWS BETWEEN 9 PRECEDING AND 3 PRECEDING))
      SELECT prio, day, n, round(round((n - mu) / sigma, 6), 4) AS c2
      FROM stat
      WHERE sigma > 0 AND round((n - mu) / sigma, 6) >= 3
      ORDER BY prio, day"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val daily = orders
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      val bounds = orders.agg(
        min(to_date(col("o_orderdate"))).as("d0"),
        max(to_date(col("o_orderdate"))).as("d1"))
      val spine = orders.select(col("o_orderpriority").as("prio")).distinct()
        .crossJoin(bounds.select(
          explode(sequence(col("d0"), col("d1"))).as("day")))
      val dense = spine.join(daily, Seq("prio", "day"), "left")
        .select(col("prio"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
      earsC2Score(dense)
        .filter(col("sigma") > 0 && col("c2r") >= 3)
        .select(col("prio"), col("day"), col("n"),
          round(col("c2r"), 4).as("c2"))
        .orderBy("prio", "day")
    })

  /** C2 scoring over a dense (prio, day, n) frame: 7-day baseline
    * ending 3 days back, rounded statistic — the scoring half of
    * [[qEarsAlerts]], reusable on any densified series.
    */
  def earsC2Score(dense: DataFrame): DataFrame = {
    val w = Window.partitionBy("prio").orderBy("day")
      .rowsBetween(-9, -3)
    dense
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sigma", stddev_samp(col("n")).over(w))
      .withColumn("c2r", round((col("n") - col("mu")) / col("sigma"), 6))
  }

  /** Farrington-style linear-trend scoring over a dense
    * (prio, day, t, y) frame: OLS over the 49-day window ending 8
    * days back (7-day guard), residual sd from the OLS identity,
    * rounded standardized statistic `zr` — the scoring half of
    * [[qFarringtonAlerts]]. Rows without a full window carry NULLs.
    */
  def farringtonScore(dense: DataFrame): DataFrame = {
    val w = Window.partitionBy("prio").orderBy("day")
      .rowsBetween(-56, -8)
    val fit = dense
      .withColumn("mx", avg(col("t")).over(w))
      .withColumn("my", avg(col("y")).over(w))
      .withColumn("mxy", avg(col("t") * col("y")).over(w))
      .withColumn("mxx", avg(col("t") * col("t")).over(w))
      .withColumn("myy", avg(col("y") * col("y")).over(w))
      .withColumn("m", count(lit(1)).over(w))
      .filter(col("m") === 49)
    val vx = col("mxx") - col("mx") * col("mx")
    val b = (col("mxy") - col("mx") * col("my")) / vx
    fit
      .withColumn("b", b)
      .withColumn("vr",
        (col("myy") - col("my") * col("my")) - b * b * vx)
      .withColumn("expected",
        col("my") + col("b") * (col("t") - col("mx")))
      .withColumn("sd", sqrt(greatest(col("vr"), lit(0.0))))
      .withColumn("zr",
        round((col("y") - col("expected")) / col("sd"), 6))
  }

  /** Farrington-style baseline-REGRESSION aberration detection (the
    * trend-aware complement to [[qEarsAlerts]]'s short-baseline C2;
    * Farrington et al. 1996 fit a trend over historical reference
    * windows — this is that linear-trend core, deterministic and
    * closed-form so two engines can recompute it exactly, without the
    * quasi-Poisson weighting): over the same densified day spine ×
    * series, each day's EXPECTED count comes from an OLS line fitted
    * to the 49-day baseline window ending 8 days before the test day
    * (a 7-day guard band keeps an emerging signal out of its own
    * fit), the residual variance comes from the OLS identity
    * `Var(resid) = Var(y) − b²·Var(x)` (no second pass), and a day
    * alerts when `count > expected + 2·sd(resid)` on the
    * 6-dp-rounded statistic (the cross-engine membership discipline).
    *
    * What the regression buys over C2: a steadily RISING series (a
    * growing surveillance catchment) alarms forever under a
    * mean-based detector but sits on the fitted line here — the spec
    * pins exactly that divergence on a synthetic ramp.
    *
    * Scale: identical to C2's — the corpus appears once in the daily
    * hash aggregation; the window sums (x, y, xy, x²) run over the
    * metadata-sized dense spine.
    */
  val qFarringtonAlerts: QuerySpec = QuerySpec(
    "q_farrington_alerts",
    Some("""WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
          count(*) AS n
        FROM orders GROUP BY 1, 2),
      bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS d0,
          max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
      spine AS (
        SELECT p.prio, s.day
        FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) p,
          (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
             AS day FROM bounds) s),
      dense AS (
        SELECT spine.prio, spine.day,
          CAST(spine.day - (SELECT d0 FROM bounds) AS DOUBLE) AS t,
          CAST(coalesce(daily.n, 0) AS DOUBLE) AS y
        FROM spine LEFT JOIN daily
          ON daily.prio = spine.prio AND daily.day = spine.day),
      fit AS (
        SELECT prio, day, t, y,
          avg(t) OVER w AS mx, avg(y) OVER w AS my,
          avg(t * y) OVER w AS mxy, avg(t * t) OVER w AS mxx,
          avg(y * y) OVER w AS myy, count(*) OVER w AS m
        FROM dense
        WINDOW w AS (PARTITION BY prio ORDER BY day
          ROWS BETWEEN 56 PRECEDING AND 8 PRECEDING)),
      scored AS (
        SELECT prio, day, t, y, mx, my,
          (mxy - mx * my) / (mxx - mx * mx) AS b,
          (myy - my * my)
            - ((mxy - mx * my) / (mxx - mx * mx))
              * ((mxy - mx * my) / (mxx - mx * mx))
              * (mxx - mx * mx) AS vr
        FROM fit WHERE m = 49),
      stat AS (
        SELECT prio, day, y,
          my + b * (t - mx) AS expected,
          sqrt(greatest(vr, 0)) AS sd
        FROM scored)
      SELECT prio, day, CAST(y AS BIGINT) AS n,
        round(expected, 4) AS expected,
        round(round((y - expected) / sd, 6), 4) AS z
      FROM stat
      WHERE sd > 0 AND round((y - expected) / sd, 6) >= 2
      ORDER BY prio, day"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val daily = orders
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val bounds = orders.agg(
        min(to_date(col("o_orderdate"))).as("d0"),
        max(to_date(col("o_orderdate"))).as("d1"))
      val spine = orders.select(col("o_orderpriority").as("prio")).distinct()
        .crossJoin(bounds.select(col("d0"),
          explode(sequence(col("d0"), col("d1"))).as("day")))
      val dense = spine.join(daily, Seq("prio", "day"), "left")
        .select(col("prio"), col("day"),
          datediff(col("day"), col("d0")).cast("double").as("t"),
          coalesce(col("cnt"), lit(0L)).cast("double").as("y"))
      farringtonScore(dense)
        .filter(col("sd") > 0 && col("zr") >= 2)
        .select(col("prio"), col("day"), col("y").cast("long").as("n"),
          round(col("expected"), 4).as("expected"),
          round(col("zr"), 4).as("z"))
        .orderBy("prio", "day")
    })

  /** Reporting-delay NOWCAST (reporting-triangle completeness
    * correction, the standard surveillance estimator for "how many
    * cases happened recently, given reporting lags"): from MATURE
    * event days (old enough that every report within `maxLag` has
    * arrived) estimate the lag distribution's cumulative completeness
    * `F(L)` = share of reports arriving within `L` days; a recent day
    * observed at available lag `L` is corrected to `observed / F(L)`.
    *
    * `lineList` carries one row per (event, report) with `day` (event
    * date) and `lag` (report delay in days, pre-filtered to reports
    * at or before the as-of instant and lags in `[0, maxLag]`).
    * Returns one row per recent day: observed count, completeness at
    * its available lag, and the corrected estimate (NULL when F = 0 —
    * no mature report ever arrived that fast, the estimate is
    * genuinely undefined).
    *
    * Scale: the corpus appears ONCE in two hash aggregations (mature
    * lag histogram — ≤ maxLag+1 groups; recent daily counts — ≤
    * maxLag days). The completeness table is maxLag+1 rows, built on
    * a dense lag spine (a lag with zero mature reports must
    * contribute 0, not vanish) and broadcast into the recent-day
    * join. No shuffle moves event rows twice.
    */
  def nowcast(lineList: DataFrame, asOf: String, maxLag: Int): DataFrame = {
    val asOfD = to_date(lit(asOf))
    val mature = lineList.filter(col("day") <= date_sub(asOfD, maxLag))
    val dist = mature.sparkSession.range(0, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
      .join(mature.groupBy("lag").agg(count(lit(1)).as("c")),
        Seq("lag"), "left")
      .select(col("lag"), coalesce(col("c"), lit(0L)).as("c"))
    val wCum = Window.orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // maxLag+1 rows — the unpartitioned windows are metadata-sized
    val f = dist.select(col("lag"), sum("c").over(wCum).as("cum"),
      sum("c").over(wAll).as("total"))
    val recent = lineList.filter(col("day") > date_sub(asOfD, maxLag))
      .groupBy("day").agg(count(lit(1)).as("observed"))
      .withColumn("lag", datediff(asOfD, col("day")).cast("int"))
    recent.join(broadcast(f), Seq("lag"))
      .select(col("day"), col("observed"),
        round(col("cum").cast("double") / col("total").cast("double"), 6)
          .as("completeness"),
        when(col("cum") > 0,
          round(col("observed").cast("double") * col("total").cast("double")
            / col("cum").cast("double"), 4)).as("nowcast"))
  }

  /** Nowcast over the orders line list: event day = o_orderdate,
    * report lag synthesized DETERMINISTICALLY as `o_orderkey % 11`
    * days (both engines derive the identical triangle — the row pins
    * the ESTIMATOR, not a lag model), as-of 1998-06-30, maxLag 10.
    * The DuckDB oracle rebuilds the whole estimator from first
    * principles: the as-of visibility filter, the mature/recent
    * split, the dense-lag cumulative completeness, and the corrected
    * counts, with the division written in the same operand order
    * (elementwise IEEE arithmetic, rounded once at the end in both
    * engines).
    */
  val qNowcast: QuerySpec = QuerySpec(
    "q_nowcast",
    Some("""WITH obs AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(o_orderkey % 11 AS INT) AS lag
        FROM orders
        WHERE CAST(o_orderdate AS DATE) + CAST(o_orderkey % 11 AS INT)
          <= DATE '1998-06-30'),
      mature AS (
        SELECT * FROM obs WHERE day <= DATE '1998-06-30' - 10),
      spine AS (SELECT CAST(range AS INT) AS lag FROM range(0, 11)),
      dist AS (
        SELECT s.lag, count(m.lag) AS c
        FROM spine s LEFT JOIN mature m ON m.lag = s.lag GROUP BY 1),
      f AS (
        SELECT lag, sum(c) OVER (ORDER BY lag) AS cum,
          sum(c) OVER () AS total FROM dist),
      recent AS (
        SELECT day, count(*) AS observed,
          datediff('day', day, DATE '1998-06-30') AS lag
        FROM obs WHERE day > DATE '1998-06-30' - 10 GROUP BY day)
      SELECT r.day, r.observed,
        round(CAST(f.cum AS DOUBLE) / CAST(f.total AS DOUBLE), 6)
          AS completeness,
        CASE WHEN f.cum > 0 THEN
          round(CAST(r.observed AS DOUBLE) * CAST(f.total AS DOUBLE)
            / CAST(f.cum AS DOUBLE), 4) END AS nowcast
      FROM recent r JOIN f ON f.lag = r.lag
      ORDER BY r.day"""),
    (spark, dir) => {
      val lineList = Tables.load(spark, dir, "orders")
        .select(to_date(col("o_orderdate")).as("day"),
          (col("o_orderkey") % 11).cast("int").as("lag"))
        .filter(date_add(col("day"), col("lag")) <= to_date(lit("1998-06-30")))
      nowcast(lineList, "1998-06-30", maxLag = 10).orderBy("day")
    })

  def specs: Seq[QuerySpec] =
    Seq(qEpiweekCurve, qEarsAlerts, qFarringtonAlerts, qNowcast)
}
