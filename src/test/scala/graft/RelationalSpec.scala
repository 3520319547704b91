package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Golden spot checks per SURVEY.md §2 operator row (the full
  * cross-engine check is graft.Verify + tools/check.py).
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  def run(q: QuerySpec) = q.run(spark, sf)

  test("q1 groups by (returnflag, linestatus) exhaustively") {
    val rows = run(Relational.q1PricingSummary).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getLong(rows.head.fieldIndex("count_order"))).sum > 0)
  }

  test("q5 flagship returns per-nation revenue, desc") {
    val rows = run(Relational.q5RegionRevenue).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-_: Double)))
  }

  test("full outer join keeps nations with customers but no suppliers") {
    val rows = run(Relational.qJoinFull).collect()
    // 25 nation keys appear among customers; only ~10 among suppliers
    assert(rows.length === 25)
    assert(rows.exists(_.getLong(1) == 0L)) // n_supp = 0 side survives
  }

  test("anti join = orders minus orders-with-lineitems") {
    val orders = Tables.load(spark, sf, "orders").count()
    val withItems = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(run(Relational.qJoinAnti).count() === orders - withItems)
  }

  test("intersect ⊆ union; except disjoint from intersect") {
    val inter = run(Relational.qIntersect).collect().map(_.getInt(0)).toSet
    val exc = run(Relational.qExcept).collect().map(_.getInt(0)).toSet
    assert(inter.intersect(exc).isEmpty)
  }

  test("window rank: rn is 1..3 within each customer") {
    val rows = run(Relational.qWindowRank).collect()
    assert(rows.map(_.getInt(rows.head.fieldIndex("rn"))).forall(r => r >= 1 && r <= 3))
  }

  test("rollup emits grand total row equal to table count") {
    val rows = run(Relational.qRollup).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getLong(rows.head.fieldIndex("n")) ===
      Tables.load(spark, sf, "orders").count())
  }

  test("topk matches global sort head") {
    val topk = run(Relational.qTopK).collect().map(_.getLong(0))
    val full = Tables.load(spark, sf, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25).collect().map(_.getLong(0))
    assert(topk.sameElements(full))
  }

  test("limit/offset window is rows 101-150 of the keyed sort") {
    val got = run(Relational.qLimitOffset).collect().map(_.getLong(0))
    val want = Tables.load(spark, sf, "orders").select("o_orderkey")
      .orderBy("o_orderkey").collect().map(_.getLong(0)).slice(100, 150)
    assert(got.sameElements(want))
  }
}
