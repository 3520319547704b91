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

  test("salted sum actually spreads a hot key with IDENTICAL rows") {
    // regression for the r1 salt-from-value bug: a hot key whose rows
    // are exact duplicates hashes to ONE salt bucket under any
    // content-derived salt, so the first phase didn't spread at all
    // (ADVICE r1) — the position-derived salt must fan it out
    import spark.implicits._
    val hot = (1 to 10000).map(_ => ("hot", 1.0)) ++ Seq(("cold", 2.0))
    val df = hot.toDF("k", "v").repartition(8)
    // result still exact
    val s = Skew.saltedSum(df, "k", "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s === Map("hot" -> 10000.0, "cold" -> 2.0))
    // and the first phase genuinely fans the hot key over many buckets
    val firstPhase = df
      .withColumn("_salt", Skew.aggSalt(8))
      .filter(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(firstPhase >= 4, s"hot key only used $firstPhase salt buckets")
  }
}
