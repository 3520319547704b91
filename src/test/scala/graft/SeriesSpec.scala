package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Series
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic sanity for the time-series operators — the properties the
  * DuckDB oracle's hash compare implies but doesn't state: grid
  * contiguity, interpolant boundedness, EWMA seeding, clip bounds.
  */
class SeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("interpolate: per-type grid is contiguous, dense, and null-free") {
    val out = Series.qInterpolate.run(spark, sf).cache()
    val byType = out.groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("hour").as("mn"), max("hour").as("mx"),
        sum(col("value").isNull.cast("int")).as("nulls"))
      .collect()
    assert(byType.nonEmpty)
    byType.foreach { r =>
      val hours = (r.getAs[java.sql.Timestamp]("mx").getTime -
        r.getAs[java.sql.Timestamp]("mn").getTime) / 3600000L + 1
      assert(r.getAs[Long]("n") === hours, s"gaps in grid for ${r.get(0)}")
      assert(r.getAs[Long]("nulls") === 0L, s"null interpolant for ${r.get(0)}")
    }
    out.unpersist()
  }

  test("interpolate: gap-filled values stay inside the neighbor envelope") {
    // a linear interpolant lies between its two anchors; with anchors
    // rounded to 6 dp and the output to 4 dp the bound widens by at most
    // one ulp of the last digit
    val out = Series.qInterpolate.run(spark, sf)
    val bounds = out.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val joined = out.join(bounds, "event_type")
      .filter(col("value") < col("lo") - 0.0001 ||
              col("value") > col("hi") + 0.0001)
    assert(joined.count() === 0)
  }

  test("ewma: first point per type equals its observed hourly mean") {
    val known = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(avg("value"), 6).as("v"))
    val firstKnown = known
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("hour")))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hour"), col("v"))
    val firstEwma = Series.qEwma.run(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("hour")))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hour"), col("ewma"))
    val diff = firstKnown.join(firstEwma, Seq("event_type", "hour"))
      .filter(abs(col("v") - col("ewma")) > 0.0001)
    assert(diff.count() === 0)
  }

  test("winsorize: clip respects the band and keeps every event") {
    val ev = Tables.load(spark, sf, "events")
    val out = Series.qWinsorize.run(spark, sf).cache()
    assert(out.count() === ev.count())
    val st = ev.groupBy("event_type")
      .agg(round(percentile(col("value"), lit(0.05)), 6).as("p05"),
           round(percentile(col("value"), lit(0.95)), 6).as("p95"))
    val bad = out.join(st, "event_type")
      .filter(col("clipped") < col("p05") - 0.0001 ||
              col("clipped") > col("p95") + 0.0001 ||
        // inside the band the value must pass through unchanged
        (col("value") >= col("p05") && col("value") <= col("p95") &&
          abs(col("clipped") - col("value")) > 0.0001))
    assert(bad.count() === 0)
    out.unpersist()
  }

  test("mad outliers: every flagged row clears the 3-MAD threshold") {
    val out = Series.qMadOutliers.run(spark, sf)
    assert(out.filter(col("robust_z") <= 3).count() === 0)
  }

  test("ewma: per-series point cap fails fast, naming the series") {
    // fixture series have hundreds of hourly points: a cap of 2 must
    // trip the guard rather than truncate or spill
    val ex = intercept[Exception] {
      Series.ewmaSmoothed(spark, sf, maxPointsPerSeries = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("Series.ewma")), s"got: $ex")
    // the default cap admits the fixture unchanged
    assert(Series.ewmaSmoothed(spark, sf).count() ===
      Series.qEwma.run(spark, sf).count())
  }
}
