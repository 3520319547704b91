package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.sources.Tables

/** As-of join checked against a brute-force range-join + argmax. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("as-of equals brute-force latest-at-or-before") {
    val ev = Tables.load(spark, sf, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("pid"))

    val got = EventOps.asOfJoin(errors,
        purchases.withColumnRenamed("pid", "prev_purchase_id"),
        "user_id", "ts", "prev_purchase_id")
      .select("event_id", "prev_purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // brute force: range join then take latest ts (ties: max pid)
    val brute = errors.as("e").join(purchases.as("p"),
        col("e.user_id") === col("p.user_id") && col("p.ts") <= col("e.ts"), "left")
      .groupBy(col("e.event_id"))
      .agg(max(struct(col("p.ts"), col("p.pid"))).as("best"))
      .select(col("event_id"), col("best.pid").as("pid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got.size === brute.size)
    assert(got === brute)
  }

  test("forward as-of equals brute-force earliest-at-or-after") {
    val ev = Tables.load(spark, sf, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("pid"))

    val got = EventOps.asOfJoinForward(errors,
        purchases.withColumnRenamed("pid", "next_purchase_id"),
        "user_id", "ts", "next_purchase_id")
      .select("event_id", "next_purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // brute force: range join then take earliest ts (one pid per ts).
    // Unmatched rows must become a NULL STRUCT (ignored by min), not a
    // struct of nulls (which null-first ordering would rank smallest).
    val brute = errors.as("e").join(purchases.as("p"),
        col("e.user_id") === col("p.user_id") && col("p.ts") >= col("e.ts"), "left")
      .groupBy(col("e.event_id"))
      .agg(min(when(col("p.ts").isNotNull,
        struct(col("p.ts"), col("p.pid")))).as("best"))
      .select(col("event_id"), col("best.pid").as("pid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got.size === brute.size)
    assert(got === brute)
  }
}
