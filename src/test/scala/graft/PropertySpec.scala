package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Algebraic laws over the engine (SURVEY.md §5.4), sampled from
  * ScalaCheck generators with a fixed seed (no scalatest-plus bridge in
  * the offline cache; sampling keeps runs deterministic anyway). Each
  * case round-trips a Spark job, so samples are few.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  lazy val orders = Tables.load(spark, sf, "orders").cache()

  // the cache MUST be dropped when this suite ends: Spark's cache
  // manager substitutes InMemoryRelation for matching plan fragments
  // SESSION-WIDE, so a leaked cached fixture table silently rewrites
  // every later suite's orders scans (and erases the parquet
  // PushedFilters that PlanSpec asserts on)
  override def afterAll(): Unit = { orders.unpersist(blocking = true); () }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filter commutes with projection") {
    for (threshold <- samples(Gen.choose(1000.0, 400000.0), 5)) {
      val a = orders.filter(col("o_totalprice") > threshold)
        .select("o_orderkey").count()
      val b = orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_totalprice") > threshold)
        .select("o_orderkey").count()
      assert(a === b, s"threshold=$threshold")
    }
  }

  test("union-all count = sum of counts; distinct is idempotent") {
    for (k <- samples(Gen.choose(0L, 1500L), 5)) {
      val a = orders.filter(col("o_custkey") < k)
      val b = orders.filter(col("o_custkey") >= k)
      assert(a.union(b).count() === orders.count(), s"k=$k")
    }
    val d = orders.select("o_orderstatus").distinct()
    assert(d.distinct().count() === d.count())
  }

  test("groupBy count sums to table count for any key") {
    for (key <- Seq("o_orderstatus", "o_orderpriority", "o_custkey")) {
      val grouped = orders.groupBy(key).agg(count(lit(1)).as("n"))
        .agg(sum("n")).collect().head.getLong(0)
      assert(grouped === orders.count())
    }
  }
}
