package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Changes, Funnels, Graph, Sketches}
import java.sql.Timestamp

/** CDC apply / SCD2 history, funnels, cohort retention, triangle
  * census, BFS hops, and count-min heavy hitters — edge cases the
  * sf0.01 oracles don't reach (tombstone-last keys, empty funnels,
  * crafted graphs with known triangle counts).
  */
class ChangesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def logDf(rows: (Long, String, String, Int)*) = {
    import spark.implicits._
    rows.toDF("k", "t", "op", "seq")
      .withColumn("t", to_timestamp(col("t")))
  }

  test("cdcApply: last upsert wins; delete-last tombstones the key") {
    val log = logDf(
      (1L, "2024-01-01 00:00:00", "U", 1),
      (1L, "2024-01-02 00:00:00", "U", 2), // survivor for key 1
      (2L, "2024-01-01 00:00:00", "U", 1),
      (2L, "2024-01-03 00:00:00", "D", 2), // key 2 dies
      (3L, "2024-01-01 00:00:00", "D", 1),
      (3L, "2024-01-02 00:00:00", "U", 2)) // delete then re-insert: alive
    val out = Changes.cdcApply(log, Seq("k"), Seq(col("t"), col("seq")))
      .select("k", "seq").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 2, 3L -> 2))
  }

  test("scd2: intervals chain, exactly one current version per live key") {
    val log = logDf(
      (1L, "2024-01-01 00:00:00", "U", 1),
      (1L, "2024-01-05 00:00:00", "U", 2),
      (1L, "2024-01-09 00:00:00", "U", 3),
      (2L, "2024-01-01 00:00:00", "U", 1),
      (2L, "2024-01-02 00:00:00", "D", 2))
    val hist = Changes.scd2(log, Seq("k"), "t", Seq(col("t"), col("seq")))
      .orderBy("k", "version").collect()
    // key 1: valid_to of version v = valid_from of v+1; last open+current
    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getInt(hist.head.fieldIndex("version"))).toSeq === Seq(1, 2, 3))
    val vt = hist.head.fieldIndex("valid_to")
    val vf = hist.head.fieldIndex("valid_from")
    assert(k1(0).getTimestamp(vt) === k1(1).getTimestamp(vf))
    assert(k1(1).getTimestamp(vt) === k1(2).getTimestamp(vf))
    assert(k1(2).isNullAt(vt))
    val cur = hist.head.fieldIndex("is_current")
    assert(k1.map(_.getBoolean(cur)).toSeq === Seq(false, false, true))
    // key 2 ends in a tombstone: its open-ended last version is NOT current
    val k2 = hist.filter(_.getLong(0) == 2L)
    assert(k2.map(_.getBoolean(cur)).toSeq === Seq(false, false))
  }

  test("funnel: strictly ordered steps; out-of-order events don't count") {
    import spark.implicits._
    // user 1 completes a->b->c in order; user 2 has b BEFORE a (b must
    // not count); user 3 only a
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "a"), (1L, "2024-01-02 00:00:00", "b"),
      (1L, "2024-01-03 00:00:00", "c"),
      (2L, "2024-01-01 00:00:00", "b"), (2L, "2024-01-02 00:00:00", "a"),
      (3L, "2024-01-01 00:00:00", "a"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Funnels.funnelCounts(ev, "user_id", "ts", "event_type",
      Seq("a", "b", "c")).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq === Seq((1, 3L), (2, 1L), (3, 1L)))
  }

  test("cohort retention: offsets measured from each user's first week") {
    import spark.implicits._
    // u1 first week W0 (Mon 2024-01-01), active W0 and W2; u2 first W1
    val ev = Seq(
      (1L, "2024-01-02 12:00:00"), (1L, "2024-01-16 08:00:00"),
      (2L, "2024-01-09 09:00:00"))
      .toDF("user_id", "ts").withColumn("ts", to_timestamp(col("ts")))
    val out = Funnels.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L), ("2024-01-08", 0L, 1L)))
  }

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("triangles: K4 has 4 triangles, 12 wedges, clustering 1.0") {
    // complete graph on 4 nodes: C(4,3)=4 triangles, every wedge closed
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = Graph.triangleStats(k4).collect().head
    assert(r.getLong(r.fieldIndex("n_triangles")) === 4L)
    assert(r.getLong(r.fieldIndex("n_wedges")) === 12L)
    assert(r.getDouble(r.fieldIndex("clustering")) === 1.0)
  }

  test("triangles: star graph has wedges but zero triangles") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r = Graph.triangleStats(star).collect().head
    assert(r.getLong(r.fieldIndex("n_triangles")) === 0L)
    assert(r.getLong(r.fieldIndex("n_wedges")) === 6L)
  }

  test("triangles: hub plus one closing edge counts exactly once") {
    // triangle (1,2,3) hanging off a size-5 star — the orientation must
    // count it once despite the shared hub
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
    val r = Graph.triangleStats(g).collect().head
    assert(r.getLong(r.fieldIndex("n_triangles")) === 1L)
  }

  test("bfsHops: hop = shortest distance, unreachable nodes absent") {
    import spark.implicits._
    // path 1-2-3-4-5 plus shortcut 1-3: dist(3)=1, dist(4)=2, dist(5)=3
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (8L, 9L))
    val sym = (e0 ++ e0.map(_.swap)).toDF("s", "t")
    val seeds = Seq(1L).toDF("node")
    val out = Graph.bfsHops(sym, seeds, depth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("heavy hitters: exact counts, contract booleans all true") {
    import spark.implicits._
    val df = (Seq.fill(50)(107L) ++ Seq.fill(30)(108L) ++ (1L to 20L))
      .toDF("key")
    val out = Sketches.heavyHitters(spark, df, "key", 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((107L, 50L), (108L, 30L)))
    out.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("no_undercount")))
      assert(r.getBoolean(r.fieldIndex("within_eps")))
    }
  }
}
