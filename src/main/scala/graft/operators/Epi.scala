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

  def specs: Seq[QuerySpec] = Seq(qEpiweekCurve)
}
