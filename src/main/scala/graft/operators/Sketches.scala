package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators beyond HLL/t-digest (those live in
  * [[Extended]]): count-min frequency sketching with the same
  * hash-green error-bound contract pattern as `q_approx_distinct` —
  * the oracle checks the EXACT answer, plus in-engine booleans proving
  * the sketch landed inside its published bound.
  *
  * Scale shape: `count_min_sketch` is a mergeable aggregate — each
  * partition folds its rows into a local table and the driver merges
  * `numPartitions` fixed-size tables (width×depth counters, a few KB at
  * eps 0.001), so the corpus never moves; one pass, no shuffle of data
  * rows. That is exactly how a 1000-executor cluster would compute
  * global frequencies: ship sketches, not keys. The exact side (the
  * oracle anchor) is one hash aggregation.
  */
object Sketches {

  private val Eps = 0.001
  private val Confidence = 0.999
  private val Seed = 42

  /** Exact heavy hitters with a count-min contract: top-k keys by exact
    * count, each carrying proof booleans that the CMS estimate (a) never
    * under-counts (deterministic CMS guarantee) and (b) over-counts by
    * at most eps×N (holds with prob `Confidence`; fixed seed makes the
    * run reproducible).
    *
    * The sketch is queried on the driver — a count-min table IS a
    * driver-sized summary (that is its point), and only the k result
    * keys are probed; the corpus-sized work (sketch build, exact
    * counts) is fully distributed.
    */
  def heavyHitters(spark: SparkSession, df: DataFrame, keyCol: String,
                   k: Int): DataFrame = {
    val skBytes = df.agg(
      count_min_sketch(col(keyCol), lit(Eps), lit(Confidence), lit(Seed))
        .as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val cms = CountMinSketch.readFrom(skBytes)
    val slack = math.ceil(Eps * cms.totalCount()).toLong
    val exactTop = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(k)
      .collect() // k rows — the contract probe set, not a data path
    val rows = exactTop.map { r =>
      val key = r.getLong(0)
      val n = r.getLong(1)
      val est = cms.estimateCount(key)
      Row(key, n, est >= n, est <= n + slack)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField(keyCol, LongType),
        StructField("n", LongType),
        StructField("no_undercount", BooleanType),
        StructField("within_eps", BooleanType))))
  }

  /** Top-20 parts by lineitem frequency, CMS-contract-checked. */
  val qHeavyHitters: QuerySpec = QuerySpec(
    "q_heavy_hitters",
    Some("""SELECT l_partkey, count(*) AS n,
        true AS no_undercount, true AS within_eps
      FROM lineitem GROUP BY l_partkey
      ORDER BY n DESC, l_partkey LIMIT 20"""),
    (spark, dir) => {
      heavyHitters(spark, Tables.load(spark, dir, "lineitem"),
        "l_partkey", 20)
        .orderBy(col("n").desc, col("l_partkey").asc)
    })

  def specs: Seq[QuerySpec] = Seq(qHeavyHitters)
}
