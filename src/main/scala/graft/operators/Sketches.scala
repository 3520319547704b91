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

  /** Single-pass data profiling — the warehouse "column statistics"
    * view (what ANALYZE feeds the CBO, surfaced as a queryable result):
    * per column, row/non-null/distinct counts and min/max. ONE scan:
    * every metric for every profiled column is an aggregate in one
    * `agg`, and the single wide row unpivots to per-column rows with
    * `stack` — profiling N columns costs one pass, not N.
    *
    * Profiled columns are restricted to integral/string types: min/max
    * serialize for the cross-engine compare, and double/timestamp
    * string formats legitimately differ between engines.
    */
  val qProfile: QuerySpec = QuerySpec(
    "q_profile",
    Some("""WITH m AS (SELECT
        count(*) AS n,
        count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
          CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
          CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
        count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3,
          CAST(min(o_orderstatus) AS VARCHAR) AS mn3, CAST(max(o_orderstatus) AS VARCHAR) AS mx3,
        count(o_orderpriority) AS nn4, count(DISTINCT o_orderpriority) AS nd4,
          CAST(min(o_orderpriority) AS VARCHAR) AS mn4, CAST(max(o_orderpriority) AS VARCHAR) AS mx4
      FROM orders)
      SELECT * FROM (
        SELECT 'o_orderkey' AS column_name, n, nn1 AS n_nonnull,
          nd1 AS n_distinct, mn1 AS min_v, mx1 AS max_v FROM m
        UNION ALL SELECT 'o_custkey', n, nn2, nd2, mn2, mx2 FROM m
        UNION ALL SELECT 'o_orderstatus', n, nn3, nd3, mn3, mx3 FROM m
        UNION ALL SELECT 'o_orderpriority', n, nn4, nd4, mn4, mx4 FROM m)
      ORDER BY column_name"""),
    (spark, dir) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      val aggs = count(lit(1)).as("n") +:
        cols.flatMap { c =>
          Seq(count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).cast("string").as(s"mn_$c"),
            max(col(c)).cast("string").as(s"mx_$c"))
        }
      val wide = Tables.load(spark, dir, "orders")
        .agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols
        .map(c => s"'$c', n, nn_$c, nd_$c, mn_$c, mx_$c")
        .mkString(", ")
      wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n, n_nonnull, n_distinct, min_v, max_v)")
        .orderBy("column_name")
    })

  /** The 1000-executor merge path of [[qHeavyHitters]], made literal:
    * the corpus is split into 8 disjoint chunks (as a cluster's
    * partitions would be), each chunk folds its OWN count-min table,
    * and the driver merges the 8 fixed-size tables. Because a CMS is a
    * linear sketch — counters are sums of per-row increments, and
    * addition commutes — the merged table is BIT-IDENTICAL to the
    * single-pass sketch with the same (eps, confidence, seed), so every
    * probe estimate matches exactly. The `merged_eq_single` column is
    * that proof, per key; the other contract booleans re-check the CMS
    * bounds THROUGH the merged sketch. Shares qHeavyHitters' exact
    * top-20, so the whole row is oracle-checked.
    *
    * Scale: each chunk sketch is a KB-sized table (the corpus never
    * moves); merge cost is O(chunks × table size) on the driver —
    * exactly how global frequencies are assembled from 1000 executors.
    */
  val qHeavyHittersMerged: QuerySpec = QuerySpec(
    "q_heavy_hitters_merged",
    Some("""SELECT l_partkey, count(*) AS n, true AS no_undercount,
        true AS within_eps, true AS merged_eq_single
      FROM lineitem GROUP BY l_partkey
      ORDER BY n DESC, l_partkey LIMIT 20"""),
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
      val single = CountMinSketch.readFrom(
        li.agg(count_min_sketch(col("l_partkey"), lit(Eps),
          lit(Confidence), lit(Seed)).as("sk"))
          .head().getAs[Array[Byte]]("sk"))
      // one sketch per disjoint chunk — 8 rows of KB-sized tables back
      // to the driver, merged pairwise (mergeInPlace mutates the target)
      val chunkRows = li
        .groupBy(pmod(col("l_orderkey"), lit(8)).as("chunk"))
        .agg(count_min_sketch(col("l_partkey"), lit(Eps), lit(Confidence),
          lit(Seed)).as("sk"))
        .collect() // 8 rows — sketch tables, not data
      val merged = chunkRows.map(r =>
          CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
        .reduce { (a, b) => a.mergeInPlace(b); a }
      val slack = math.ceil(Eps * merged.totalCount()).toLong
      val exactTop = li.groupBy("l_partkey").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l_partkey").asc)
        .limit(20)
        .collect() // the 20 probe keys, not a data path
      val rows = exactTop.map { r =>
        val key = r.getLong(0)
        val n = r.getLong(1)
        val est = merged.estimateCount(key)
        Row(key, n, est >= n, est <= n + slack,
          est == single.estimateCount(key))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        StructType(Seq(
          StructField("l_partkey", LongType),
          StructField("n", LongType),
          StructField("no_undercount", BooleanType),
          StructField("within_eps", BooleanType),
          StructField("merged_eq_single", BooleanType))))
        .orderBy(col("n").desc, col("l_partkey").asc)
    })

  // --- mergeable quantile sketch (GK) — completes the sketch family
  //     (HLL distinct / CMS frequency / Bloom membership / GK rank) ---

  private val QProbes = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
  /** Contracted rank error; sketches BUILD 4× tighter (GkBuildEps) so
    * merge-tree error growth has headroom — see GkSketch scaladoc.
    */
  private val RankEps = 0.01
  private val GkBuildEps = 0.0025

  /** Shared contract tail for the GK queries: the exact probe
    * quantiles (the oracle anchor — interpolated between exact order
    * statistics with Spark's `percentile` formula, which matches
    * DuckDB `quantile_cont` at 4 dp, pinned by q_approx_percentile)
    * and, for every (sketch, probe), the strict/weak ranks of the
    * sketch estimate; the contract boolean asserts the estimate's rank
    * interval [#(x < est)+1, #(x ≤ est)] intersects [φ·n ± (ε·n + 1)].
    * Probing via exact ranks (not value proximity) is the honest GK
    * guarantee — on a heavy-tied column the ε-rank value can be far
    * from the exact quantile in value space and still be correct.
    *
    * The exact order statistics are SKETCH-GUIDED (replacing Spark's
    * sort-based `percentile`, which buffers every value per partition
    * into one aggregation buffer — 4.7 s of a 4.8 s query at sf0.1,
    * measured): the first sketch brackets each probe's rank with
    * values queried at φ ± 3·ε̂ (ε̂ = its realized rank error), scan 1
    * is ONE codegen'd aggregate over the fact computing n, every
    * contract rank count AND each band's below-band count, and scan 2
    * resolves exact values from the ~6·ε̂·n rows inside the bands.
    * Using the sketch under test as its own guide is sound because
    * nothing is taken on faith: the walk `require`s that every needed
    * rank is actually covered by its band — a broken sketch fails
    * loudly, it can never vouch for itself. At cluster scale the band
    * resolve stays executor-side (sort the band rows, they are
    * ε̂-bounded); the driver-side walk here is the fixture-scale
    * shortcut for the same ~50k rows.
    */
  private def gkContract(spark: SparkSession, xs0: DataFrame,
                         sketches: Seq[(String, graft.functions.GkSketch)])
      : DataFrame = {
    val ests = sketches.map { case (_, sk) => QProbes.map(sk.query).toArray }
    val guide = sketches.head._2
    val nG = guide.n
    // realized rank slack of the guide (±ε̂·n in ranks), padded +1
    val eFrac = (guide.rankSlack + 1).toDouble / nG
    val bands = QProbes.map { q =>
      (guide.query(math.max(1e-9, q - 3 * eFrac)),
       guide.query(math.min(1.0, q + 3 * eFrac)))
    }
    val xs = xs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (n, exs, r) =
      try {
        // scan 1: one aggregate — n, per-probe below-band counts, and
        // the per-(sketch, probe) strict/weak rank counts
        val aggs = Seq.newBuilder[org.apache.spark.sql.Column]
        aggs += count(lit(1)).as("n")
        bands.zipWithIndex.foreach { case ((vlo, _), i) =>
          aggs += sum(when(col("x") < vlo, 1L).otherwise(0L)).as(s"below_$i")
        }
        QProbes.zipWithIndex.foreach { case (_, i) =>
          sketches.indices.foreach { j =>
            aggs += sum(when(col("x") < ests(j)(i), 1L).otherwise(0L))
              .as(s"lt_${j}_$i")
            aggs += sum(when(col("x") <= ests(j)(i), 1L).otherwise(0L))
              .as(s"le_${j}_$i")
          }
        }
        val built = aggs.result()
        val row = xs.agg(built.head, built.tail: _*).head()
        val nTotal = row.getAs[Long]("n")
        // scan 2: only rows inside some band survive — ~6·ε̂·n per
        // probe — then resolve each probe's floor/ceil order stats by
        // walking its band in value order from the below-band rank
        val bandPred = bands.map { case (vlo, vhi) =>
          col("x") >= vlo && col("x") <= vhi
        }.reduce(_ || _)
        val bandHist = xs.filter(bandPred)
          .groupBy("x").agg(count(lit(1)).as("c"))
          .orderBy("x")
          .collect().map(r => (r.getDouble(0), r.getLong(1)))
        val positions = QProbes.map(_ * (nTotal - 1))
        val exact = positions.zipWithIndex.map { case (p, i) =>
          val (kLo, kHi) = (p.floor.toLong, p.ceil.toLong)
          val (vlo, vhi) = bands(i)
          var cum = row.getAs[Long](s"below_$i")
          require(cum <= kLo,
            s"gk band $i starts past rank $kLo — guide sketch broke its bound")
          var vLo = Double.NaN
          var vHi = Double.NaN
          var idx = 0
          while (idx < bandHist.length && cum <= kHi) {
            val (v, c) = bandHist(idx)
            if (v >= vlo && v <= vhi) {
              if (cum <= kLo && kLo < cum + c) vLo = v
              if (cum <= kHi && kHi < cum + c) vHi = v
              cum += c
            }
            idx += 1
          }
          require(!vLo.isNaN && !vHi.isNaN,
            s"gk band $i did not cover ranks $kLo/$kHi — guide sketch broke its bound")
          if (kLo == kHi) vLo
          else (kHi - p) * vLo + (p - kLo) * vHi // Spark's percentile formula
        }
        (nTotal, exact, row)
      } finally { xs.unpersist(); () }
    // same HALF_UP-on-BigDecimal semantics as Spark's round(col, 4)
    def r4(v: Double): Double =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tol = RankEps * n + 1
    val rows = QProbes.zipWithIndex.map { case (q, i) =>
      val vals: Seq[Any] = Seq(q, r4(exs(i))) ++
        sketches.indices.map { j =>
          val lo = r.getAs[Long](s"lt_${j}_$i") + 1 // rank interval of est
          val hi = r.getAs[Long](s"le_${j}_$i")
          val target = q * n
          hi >= target - tol && lo <= target + tol
        }
      Row(vals: _*)
    }
    val schema = StructType(
      StructField("q", org.apache.spark.sql.types.DoubleType) +:
      StructField("exact_v", org.apache.spark.sql.types.DoubleType) +:
      sketches.map { case (nm, _) => StructField(nm, BooleanType) })
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
      .orderBy("q")
  }

  private def gkOracle(contracts: String*): String = {
    val bools = contracts.map(c => s"true AS $c").mkString(", ")
    QProbes.map { q =>
      s"""SELECT CAST($q AS DOUBLE) AS q,
         round(quantile_cont(CAST(l_extendedprice AS DOUBLE), $q), 4)
           AS exact_v, $bools FROM lineitem"""
    }.mkString("", "\nUNION ALL ", "\nORDER BY q")
  }

  /** Mergeable GK quantile sketch over lineitem prices, rank-ε
    * contracted. The sketch is a Spark `Aggregator` ([[graft.functions.GkQuantileAgg]]):
    * each of the 32 partitions folds its rows into a local tuple
    * summary and Spark merges the fixed-small summaries — values never
    * move, the same ship-sketches-not-keys shape as the CMS path. The
    * driver probes 7 quantiles on the KB-sized result (a GK table IS a
    * driver-sized summary, like the CMS/bloom above); the corpus-sized
    * work (sketch build, exact anchors, rank counts) is distributed.
    */
  val qQuantileSketch: QuerySpec = QuerySpec(
    "q_quantile_sketch",
    Some(gkOracle("within_rank_eps")),
    (spark, dir) => {
      val xs = Tables.load(spark, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("x"))
      val gk = udaf(new graft.functions.GkQuantileAgg(GkBuildEps),
        org.apache.spark.sql.Encoders.scalaDouble)
      val sk = graft.functions.GkSketch.fromBytes(
        xs.agg(gk(col("x")).as("sk")).head().getAs[Array[Byte]]("sk"))
      gkContract(spark, xs, Seq("within_rank_eps" -> sk))
    })

  /** The explicit 1000-executor merge path of [[qQuantileSketch]],
    * mirroring [[qHeavyHittersMerged]]: 8 disjoint chunks each fold
    * their OWN GK summary, the driver merges the 8 fixed-small tables
    * in chunk order. GK is NOT a linear sketch (unlike CMS the merged
    * table is not bit-identical to the single pass), so the proof is
    * the honest one: the MERGED sketch satisfies the same rank-ε
    * contract as the single-pass sketch, on shared oracle-checked
    * exact rows.
    */
  val qQuantileSketchMerged: QuerySpec = QuerySpec(
    "q_quantile_sketch_merged",
    Some(gkOracle("single_within_eps", "merged_within_eps")),
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_extendedprice").cast("double").as("x"))
      val gk = udaf(new graft.functions.GkQuantileAgg(GkBuildEps),
        org.apache.spark.sql.Encoders.scalaDouble)
      val single = graft.functions.GkSketch.fromBytes(
        li.agg(gk(col("x")).as("sk")).head().getAs[Array[Byte]]("sk"))
      val merged = li
        .groupBy(pmod(col("l_orderkey"), lit(8)).as("chunk"))
        .agg(gk(col("x")).as("sk"))
        .orderBy("chunk")
        .collect() // 8 rows — KB-sized summaries, not data
        .map(r => graft.functions.GkSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
        .reduce((a, b) => a.merge(b))
      gkContract(spark, li.select("x"),
        Seq("single_within_eps" -> single, "merged_within_eps" -> merged))
    })

  /** The GK summary as STREAMING STATE — the composition the sketch
    * family's merge proofs point at: a mergeable summary is exactly
    * what an incremental engine keeps between micro-batches. Events
    * arrive in 4 chunk files (one micro-batch each); the complete-mode
    * global aggregation folds every batch into the persisted GK buffer
    * through [[graft.functions.GkQuantileAgg]]'s reduce/merge path —
    * the same code Spark uses across partitions now runs across TIME —
    * and the drained sketch must satisfy the identical rank-ε contract
    * as a batch-built sketch, on oracle-anchored exact rows. State is
    * one O(1/ε·log εn) summary, not values: the unbounded-stream
    * quantile shape.
    */
  val qStreamQuantile: QuerySpec = QuerySpec(
    "q_stream_quantile",
    Some {
      val bools = "true AS within_rank_eps"
      QProbes.map { q =>
        s"""SELECT CAST($q AS DOUBLE) AS q,
           round(quantile_cont(value, $q), 4) AS exact_v, $bools
           FROM events"""
      }.mkString("", "\nUNION ALL ", "\nORDER BY q")
    },
    (spark, dir) => {
      val in = EventOps.stageEventChunks(spark, dir, 4)
      val src = spark.readStream.schema(Tables.eventsRaw)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/*.parquet")
      val gk = udaf(new graft.functions.GkQuantileAgg(GkBuildEps),
        org.apache.spark.sql.Encoders.scalaDouble)
      val table = EventOps.runStreamToTable(
        src.select(col("value").as("x")).agg(gk(col("x")).as("sk")),
        mode = "complete")
      val sk = graft.functions.GkSketch.fromBytes(
        table.head().getAs[Array[Byte]]("sk"))
      val xs = Tables.load(spark, dir, "events")
        .select(col("value").as("x"))
      gkContract(spark, xs, Seq("within_rank_eps" -> sk))
        .select("q", "exact_v", "within_rank_eps")
    })

  /** Mergeable HLL (DataSketches) union proof — the distinct-count
    * analogue of [[qHeavyHittersMerged]]/[[qQuantileSketchMerged]],
    * closing the persistable-merge story for the whole sketch family:
    * 8 disjoint chunks each build their own `hll_sketch_agg` summary
    * (the executor shape), `hll_union_agg` merges the fixed-small
    * sketches, and the union's estimate must satisfy the same
    * error-bound contract as the single-pass sketch. HLL registers are
    * per-bucket hash maxima — set-deterministic, union = elementwise
    * max — but sparse→dense promotion can take different routes in the
    * two builds, so the honest cross-build claim is a shared 1 %
    * consistency tolerance, not bit equality (same reasoning as GK's
    * contract-equivalence proof). Bound: lgK = 12 ⇒ RSE ≈ 1.04/√4096;
    * contracted at 3σ ≈ 5 % (+1 for integer slack).
    */
  val qHllMerged: QuerySpec = QuerySpec(
    "q_hll_merged",
    Some("""SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_n,
      true AS single_within_bound, true AS merged_within_bound,
      true AS merge_consistent FROM orders"""),
    (spark, dir) => {
      val o = Tables.load(spark, dir, "orders")
      val single = o
        .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
        .head().getAs[Long]("est")
      val merged = o
        .groupBy(pmod(col("o_orderkey"), lit(8)).as("chunk"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .head().getAs[Long]("est")
      val exact = o.agg(count_distinct(col("o_custkey")).as("n"))
        .head().getAs[Long]("n")
      val bound = 0.05 * exact + 1
      val row = Row(exact,
        math.abs(single - exact) <= bound,
        math.abs(merged - exact) <= bound,
        math.abs(merged - single) <= 0.01 * exact + 1)
      val schema = StructType(Seq(
        StructField("exact_n", LongType),
        StructField("single_within_bound", BooleanType),
        StructField("merged_within_bound", BooleanType),
        StructField("merge_consistent", BooleanType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), schema)
    })

  /** The GK summary PER GROUP — the always-on percentile-monitor shape
    * the sketch's scale story promises (one O(1/ε·log εn) summary per
    * key, values never shuffle) but no row exercised until now: one
    * `groupBy(flag).agg(gk(x))` builds an independent mergeable
    * summary per return-flag, and every (group, probe) estimate is
    * rank-contracted against that group's exact order statistics —
    * the same sketch-guided two-scan contract as [[qQuantileSketch]],
    * with the group column folded into the fused aggregate and the
    * band filter. Exact anchors per group are oracle-checked against
    * DuckDB's grouped `quantile_cont` at 4 dp.
    */
  val qQuantileByGroup: QuerySpec = QuerySpec(
    "q_quantile_by_group",
    Some {
      QProbes.map { q =>
        s"""SELECT l_returnflag AS grp, CAST($q AS DOUBLE) AS q,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), $q), 4)
             AS exact_v, true AS within_rank_eps
           FROM lineitem GROUP BY l_returnflag"""
      }.mkString("", "\nUNION ALL ", "\nORDER BY grp, q")
    },
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag").as("grp"),
          col("l_extendedprice").cast("double").as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val gk = udaf(new graft.functions.GkQuantileAgg(GkBuildEps),
          org.apache.spark.sql.Encoders.scalaDouble)
        val sketches = li.groupBy("grp").agg(gk(col("x")).as("sk")).collect()
          .map(r => r.getString(0) ->
            graft.functions.GkSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
        gkGroupContract(spark, li, sketches.toSeq)
      } finally { li.unpersist(); () }
    })

  /** Per-group rank-ε contract shared by the batch and streaming
    * grouped-quantile rows: `byG` is a persisted (grp, x) frame,
    * `sketches` one GK summary per group value. Same machinery as the
    * global contract with the group folded into the fused aggregate
    * and the band filter.
    */
  private def gkGroupContract(spark: SparkSession, byG: DataFrame,
      sketches: Seq[(String, graft.functions.GkSketch)]): DataFrame = {
    val info = sketches.map { case (g, sk) =>
      val eFrac = (sk.rankSlack + 1).toDouble / sk.n
      (g,
       QProbes.map(sk.query).toArray,
       QProbes.map(q => (sk.query(math.max(1e-9, q - 3 * eFrac)),
         sk.query(math.min(1.0, q + 3 * eFrac)))).toArray)
    }.sortBy(_._1)
    val li = byG
    val aggs = Seq.newBuilder[org.apache.spark.sql.Column]
        info.zipWithIndex.foreach { case ((g, ests, bands), j) =>
          aggs += sum(when(col("grp") === g, 1L).otherwise(0L)).as(s"n_$j")
          QProbes.indices.foreach { i =>
            aggs += sum(when(col("grp") === g && col("x") < ests(i), 1L)
              .otherwise(0L)).as(s"lt_${j}_$i")
            aggs += sum(when(col("grp") === g && col("x") <= ests(i), 1L)
              .otherwise(0L)).as(s"le_${j}_$i")
            aggs += sum(when(col("grp") === g && col("x") < bands(i)._1, 1L)
              .otherwise(0L)).as(s"below_${j}_$i")
          }
        }
        val built = aggs.result()
        val row = li.agg(built.head, built.tail: _*).head()
        val bandPred = info.map { case (g, _, bands) =>
          col("grp") === g && bands.map { case (lo, hi) =>
            col("x") >= lo && col("x") <= hi
          }.reduce(_ || _)
        }.reduce(_ || _)
        val bandHist = li.filter(bandPred)
          .groupBy("grp", "x").agg(count(lit(1)).as("c"))
          .orderBy("grp", "x").collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
          .groupBy(_._1)
        def r4(v: Double): Double =
          BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val rows = info.zipWithIndex.flatMap { case ((g, _, bands), j) =>
          val n = row.getAs[Long](s"n_$j")
          val hist = bandHist.getOrElse(g, Array.empty).map(t => (t._2, t._3))
          val tol = RankEps * n + 1
          QProbes.zipWithIndex.map { case (q, i) =>
            val p = q * (n - 1)
            val (kLo, kHi) = (p.floor.toLong, p.ceil.toLong)
            val (vlo, vhi) = bands(i)
            var cum = row.getAs[Long](s"below_${j}_$i")
            require(cum <= kLo,
              s"gk group $g band $i starts past rank $kLo — sketch broke its bound")
            var vLo = Double.NaN
            var vHi = Double.NaN
            var idx = 0
            while (idx < hist.length && cum <= kHi) {
              val (v, c) = hist(idx)
              if (v >= vlo && v <= vhi) {
                if (cum <= kLo && kLo < cum + c) vLo = v
                if (cum <= kHi && kHi < cum + c) vHi = v
                cum += c
              }
              idx += 1
            }
            require(!vLo.isNaN && !vHi.isNaN,
              s"gk group $g band $i missed ranks $kLo/$kHi — sketch broke its bound")
            val exact =
              if (kLo == kHi) vLo else (kHi - p) * vLo + (p - kLo) * vHi
            val target = q * n
            val lo = row.getAs[Long](s"lt_${j}_$i") + 1
            val hi = row.getAs[Long](s"le_${j}_$i")
            Row(g, q, r4(exact), hi >= target - tol && lo <= target + tol)
          }
        }
    val schema = StructType(Seq(
      StructField("grp", org.apache.spark.sql.types.StringType),
      StructField("q", org.apache.spark.sql.types.DoubleType),
      StructField("exact_v", org.apache.spark.sql.types.DoubleType),
      StructField("within_rank_eps", BooleanType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
      .orderBy("grp", "q")
  }

  /** The grouped GK summary as STREAMING STATE — the per-key
    * always-on percentile monitor composed end-to-end: events arrive
    * as 4 file micro-batches, a complete-mode `groupBy(event_type)`
    * aggregation folds every batch into one persisted GK buffer PER
    * KEY (state = #keys × O(1/ε·log εn) tuples, never values), and
    * each drained per-key sketch must satisfy the identical
    * per-group rank-ε contract as the batch build, on oracle-anchored
    * grouped exact quantiles. This is [[qStreamQuantile]] ×
    * [[qQuantileByGroup]]: the composition a production
    * latency-per-endpoint monitor actually runs.
    */
  val qStreamQuantileByGroup: QuerySpec = QuerySpec(
    "q_stream_quantile_by_group",
    Some {
      QProbes.map { q =>
        s"""SELECT event_type AS grp, CAST($q AS DOUBLE) AS q,
           round(quantile_cont(value, $q), 4) AS exact_v,
           true AS within_rank_eps
           FROM events GROUP BY event_type"""
      }.mkString("", "\nUNION ALL ", "\nORDER BY grp, q")
    },
    (spark, dir) => {
      val in = EventOps.stageEventChunks(spark, dir, 4)
      val src = spark.readStream.schema(Tables.eventsRaw)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/*.parquet")
      val gk = udaf(new graft.functions.GkQuantileAgg(GkBuildEps),
        org.apache.spark.sql.Encoders.scalaDouble)
      val table = EventOps.runStreamToTable(
        src.groupBy(col("event_type").as("grp"))
          .agg(gk(col("value")).as("sk")),
        mode = "complete")
      val sketches = table.collect().map(r => r.getString(0) ->
        graft.functions.GkSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
      val byG = Tables.load(spark, dir, "events")
        .select(col("event_type").as("grp"), col("value").as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try gkGroupContract(spark, byG, sketches.toSeq)
      finally { byG.unpersist(); () }
    })

  def specs: Seq[QuerySpec] =
    Seq(qHeavyHitters, qBloomPrune, qProfile, qHeavyHittersMerged,
      qQuantileSketch, qQuantileSketchMerged, qStreamQuantile, qHllMerged,
      qQuantileByGroup, qStreamQuantileByGroup)
}
