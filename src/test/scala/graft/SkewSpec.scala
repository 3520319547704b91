package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** Salted join/agg must be result-identical to the plain forms. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("salted join equals plain join") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", buckets = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted two-phase sum equals plain groupBy sum") {
    val li = Tables.load(spark, sf, "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", buckets = 8)
      .select(col("l_returnflag"), round(col("sum_l_quantity"), 2).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === plain)
  }
}
