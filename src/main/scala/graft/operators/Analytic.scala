package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Typed UDAF geometric mean (SURVEY.md §2.10): exp of the mean log.
  * Mergeable two-field buffer → partial aggregation works (map-side
  * combine), unlike a naive collect-then-compute UDF.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Third-wave coverage: UDAF, pivot, analytic window functions,
  * distribution functions, sliding windows (batch form).
  */
object Analytic {

  // --- typed Aggregator UDAF ---
  val qUdafGeomean: QuerySpec = QuerySpec(
    "q_udaf_geomean",
    Some("""SELECT l_returnflag,
      round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean,
      count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      val geomean = udaf(GeoMean)
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(geomean(col("l_extendedprice")), 4).as("geo_mean"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    })

  // --- pivot (absent in MySQL; CASE-aggregation equivalent as oracle) ---
  val qPivot: QuerySpec = QuerySpec(
    "q_pivot",
    Some("""SELECT o_orderpriority,
      CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
      CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
      CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")
    })

  /** Unpivot/melt — the dual of [[qPivot]], exercised as a literal
    * round-trip: the pivoted wide frame melts back to long form through
    * Spark's native `unpivot` (codegen `Expand`, one pass, no join).
    * Oracle rebuilds the same long form with UNION ALL branches.
    */
  val qUnpivot: QuerySpec = QuerySpec(
    "q_unpivot",
    Some("""WITH p AS (
        SELECT o_orderpriority,
          CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
          CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
          CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, 'F' AS status, F AS n FROM p
      UNION ALL SELECT o_orderpriority, 'O', O FROM p
      UNION ALL SELECT o_orderpriority, 'P', P FROM p
      ORDER BY o_orderpriority, status"""),
    (spark, dir) => {
      qPivot.run(spark, dir)
        .unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")), "status", "n")
        .orderBy("o_orderpriority", "status")
    })

  // --- analytic window functions: first/last/nth over frames ---
  val qWindowAnalytic: QuerySpec = QuerySpec(
    "q_window_analytic",
    Some("""SELECT o_custkey, o_orderkey,
      first_value(o_orderkey) OVER w AS first_key,
      last_value(o_orderkey)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
      nth_value(o_orderkey, 2)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""),
    (spark, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(w).as("first_key"),
          last("o_orderkey").over(full).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    })

  // --- distribution functions (exact rationals — no rounding needed) ---
  val qWindowDistribution: QuerySpec = QuerySpec(
    "q_window_distribution",
    Some("""SELECT o_orderkey,
      percent_rank() OVER w AS pr,
      cume_dist() OVER w AS cd,
      ntile(10) OVER w AS decile
      FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""),
    (spark, dir) => {
      val w = Window.orderBy("o_totalprice", "o_orderkey")
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(10).over(w).as("decile"))
        .orderBy("o_orderkey")
    })

  // --- NULL-aware analytic variants (§2.5 depth): lag with an explicit
  //     default, IGNORE NULLS last_value, and a 2-step lead — over a
  //     value column with deterministic synthesized NULLs. Raw doubles,
  //     no rounding: pure elementwise passthrough is IEEE-identical. ---
  val qWindowNulls: QuerySpec = QuerySpec(
    "q_window_nulls",
    Some("""SELECT o_custkey, o_orderkey, v,
      lag(v, 1, -1.0) OVER w AS lag_def,
      last_value(v IGNORE NULLS)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nn,
      lead(v, 2) OVER w AS lead2
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
              CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS v
            FROM orders)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""),
    (spark, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val upToHere = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(spark, dir, "orders")
        .withColumn("v",
          when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"), col("v"),
          lag(col("v"), 1, -1.0).over(w).as("lag_def"),
          last(col("v"), ignoreNulls = true).over(upToHere).as("last_nn"),
          lead(col("v"), 2).over(w).as("lead2"))
        .orderBy("o_custkey", "o_orderkey")
    })

  // --- two-pass distribution functions: the scale-safe twin of
  //     q_window_distribution. The global no-partition window above is a
  //     one-task plan at 100 TB; this form range-partitions on the sort
  //     key, ranks locally per shard, and corrects with prefix-summed
  //     shard counts. The only global window runs over ONE ROW PER SHARD
  //     (metadata-sized), and the result is provably identical to the
  //     global window when the sort key is unique — enforced here by the
  //     (o_totalprice, o_orderkey) tiebreak, and proven by sharing the
  //     global-window oracle SQL. ---
  val qWindowDistTwoPass: QuerySpec = QuerySpec(
    "q_window_dist_twopass",
    Some("""SELECT o_orderkey,
      percent_rank() OVER w AS pr,
      cume_dist() OVER w AS cd,
      ntile(10) OVER w AS decile
      FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""),
    (spark, dir) => {
      val ranked = twoPassRank(
        Tables.load(spark, dir, "orders"), Seq("o_totalprice", "o_orderkey"))
      // with a unique total order: percent_rank=(rn-1)/(N-1), cume_dist
      // = rn/N — exact integer-valued doubles, division is IEEE-identical
      // across engines. ntile(k): first N%k buckets get one extra row.
      val k = 10
      val q = floor(col("_n") / k) // Spark `/` on longs is double division
      val r = col("_n") % k
      val cut = r * (q + 1)
      ranked.select(col("o_orderkey"),
          ((col("_rn") - 1).cast("double") / (col("_n") - 1).cast("double")).as("pr"),
          (col("_rn").cast("double") / col("_n").cast("double")).as("cd"),
          when(col("_rn") <= cut, ceil(col("_rn").cast("double") / (q + 1)))
            .otherwise(r + ceil((col("_rn") - cut).cast("double") / q))
            .cast("int").as("decile"))
        .orderBy("o_orderkey")
    })

  /** Global row number + total count without a global window: range
    * partition on the (unique) sort key, rank within shards, then add
    * prefix-summed shard offsets. Adds `_rn` (1-based global rank) and
    * `_n` (total rows). The `orderCols` MUST be a unique key — ties
    * would make shard-local ranks order-dependent.
    *
    * The local rank is a `mapPartitionsWithIndex` counter over the
    * already-range-sorted partitions — the documented per-partition-
    * imperative case — because a `Window.partitionBy(_pid)` here would
    * HASH-reshuffle data that is already range-placed (Catalyst can't
    * see RangePartitioning satisfies a pid-window): one data shuffle
    * total instead of two.
    */
  def twoPassRank(df: org.apache.spark.sql.DataFrame,
                  orderCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val oc = orderCols.map(col)
    val parted = df.repartitionByRange(oc: _*).sortWithinPartitions(oc: _*)
    val schema2 = parted.schema
      .add("_pid", org.apache.spark.sql.types.IntegerType)
      .add("_lrn", org.apache.spark.sql.types.LongType)
    val rdd = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = 0L
      it.map { r =>
        i += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ i)
      }
    }
    // persisted: `local` feeds BOTH the counts aggregation and the final
    // join — without it the sort + row-conversion pass runs twice over
    // the full data (the shuffle files are reused, the narrow work not)
    val local = parted.sparkSession.createDataFrame(rdd, schema2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per shard; the unpartitioned windows below are over
    // #shards rows — metadata, not data
    val counts = local.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
    val offs = counts
      .withColumn("_off", coalesce(sum("_cnt").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum("_cnt").over(
        Window.orderBy("_pid").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("_pid", "_off", "_n")
    local.join(broadcast(offs), "_pid")
      .withColumn("_rn", col("_lrn") + col("_off"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Global inclusive running sum of `valueCol` (LongType) in
    * `orderCols` order without a global window — the [[twoPassRank]]
    * machinery with a sum instead of a count: range partition on the
    * (unique) order key, per-partition local running sums, shard TOTALS
    * prefix-summed on the driver-side-tiny shard frame and broadcast
    * back. Adds `_cum`. One data shuffle total; the unpartitioned
    * window below runs over #shards rows (metadata, not data) — this is
    * the scale path for any "global cumulative" shape (token-offset
    * assignment, sequence packing) that a naive
    * `Window.orderBy(...)` would serialize through one task.
    */
  def twoPassPrefixSum(df: org.apache.spark.sql.DataFrame,
                       orderCols: Seq[String],
                       valueCol: String): org.apache.spark.sql.DataFrame = {
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"twoPassPrefixSum: '$valueCol' must be LongType, " +
        s"got ${df.schema(valueCol).dataType.simpleString}")
    val oc = orderCols.map(col)
    val parted = df.repartitionByRange(oc: _*).sortWithinPartitions(oc: _*)
    val vi = parted.schema.fieldIndex(valueCol)
    val schema2 = parted.schema
      .add("_pid", org.apache.spark.sql.types.IntegerType)
      .add("_lcum", org.apache.spark.sql.types.LongType)
    val rdd = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.map { r =>
        s += r.getLong(vi)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ s)
      }
    }
    // persisted for the same reason as twoPassRank: two consumers
    // (shard totals + final join) must not re-run the sort pass
    val local = parted.sparkSession.createDataFrame(rdd, schema2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offs = local.groupBy("_pid").agg(sum(valueCol).as("_tot"))
      .withColumn("_off", coalesce(sum("_tot").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offs), "_pid")
      .withColumn("_cum", col("_lcum") + col("_off"))
      .drop("_pid", "_lcum")
  }

  // --- sliding event-time windows, batch form (streaming form:
  //     graft.streaming.Streams.slidingCounts). 1 h window / 15 min
  //     slide → each event lands in 4 windows. ---
  val qWindowSliding: QuerySpec = QuerySpec(
    "q_window_sliding",
    Some("""SELECT w_start, event_type, count(*) AS n
      FROM (SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                     - to_minutes(15 * i.i) AS w_start, event_type
            FROM events, (SELECT unnest(generate_series(0, 3)) AS i) i)
      GROUP BY w_start, event_type ORDER BY w_start, event_type"""),
    (spark, dir) => {
      Tables.load(spark, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    })

  def specs: Seq[QuerySpec] = Seq(
    qUdafGeomean, qPivot, qUnpivot, qWindowAnalytic, qWindowNulls,
    qWindowDistribution, qWindowDistTwoPass, qWindowSliding)
}
