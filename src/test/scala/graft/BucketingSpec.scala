package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed co-located join (SURVEY.md §2.3 / SCALE.md joins): writing
  * both fact tables bucketed by the join key lets the join run with NO
  * shuffle exchange — the partitioning is reused across jobs, the main
  * repeated-join optimization at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists — clear stale locations from previous runs
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("li_bkt", "ord_bkt").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bkt")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bkt")

    val joined = spark.table("li_bkt")
      .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join strategy question is real
    val plan = withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      joined.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n${plan.take(800)}")
    assert(withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(joined.count()) ===
      li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
  }

  private def withConf[A](key: String, value: String)(f: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
