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
      .head().getAs[Array[Byte]]("sk")
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

  /** Explicit bloom semi-join pruning (the third sketch family next to
    * CMS and HLL): build a mergeable bloom filter over the selective
    * dimension's keys, pre-filter the fact side with `might_contain`,
    * then exact-verify the survivors with the real semi-join — the
    * "prune cheap, verify exact" pipeline Spark's own runtime filter
    * rule applies, here as a first-class operator (the filter could be
    * persisted and reused across queries, which the runtime rule cannot).
    *
    * Contract columns, all in-engine: the pruned-then-verified result
    * must equal the direct semi-join (blooms never false-negative — a
    * missed row means the operator is broken), and the false-positive
    * overhead the verify join absorbs stays under 5%. The oracle checks
    * the exact aggregate + both booleans.
    */
  val qBloomPrune: QuerySpec = QuerySpec(
    "q_bloom_prune",
    Some("""WITH dim AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
      ex AS (SELECT o.* FROM orders o
             WHERE o.o_custkey IN (SELECT c_custkey FROM dim))
      SELECT count(*) AS n_exact, round(sum(o_totalprice), 2) AS sum_price,
        true AS no_false_negatives, true AS fp_rate_ok
      FROM ex"""),
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      import graft.functions.GraftFunctions.{bloomAgg, bloomMightContain}
      val dim = Tables.load(spark, dir, "customer")
        .filter(col("c_acctbal") > 9000).select("c_custkey")
      // the built filter lands on the driver as a literal: might_contain
      // requires a foldable/scalar-subquery filter side, and a bloom IS
      // a driver-sized summary (here 128 KiB), exactly like the CMS
      // table above — the corpus-sized work stays distributed
      val bf = dim.agg(
        bloomAgg(col("c_custkey"), 100000L, 8L * 131072L).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val orders = Tables.load(spark, dir, "orders")
      val cand = orders
        .filter(bloomMightContain(lit(bf), col("o_custkey")))
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val exact = cand.join(broadcast(dim),
        cand("o_custkey") === dim("c_custkey"), "left_semi")
      val exactRaw = orders.join(broadcast(dim),
        orders("o_custkey") === dim("c_custkey"), "left_semi")
      val missed = exactRaw.join(cand.select(col("o_orderkey").as("ck")),
        col("o_orderkey") === col("ck"), "left_anti")
      exact.agg(count(lit(1)).as("n_exact"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
        .crossJoin(orders.agg(count(lit(1)).as("n_total")))
        .select(col("n_exact"), col("sum_price"),
          (col("n_missed") === 0).as("no_false_negatives"),
          ((col("n_cand") - col("n_exact")).cast("double") /
            greatest(col("n_total") - col("n_exact"), lit(1L)) <= 0.05)
            .as("fp_rate_ok"))
    })

  def specs: Seq[QuerySpec] = Seq(qHeavyHitters, qBloomPrune)
}
