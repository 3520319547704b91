package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.plans.MvCatalog
import graft.sources.Tables

/** Automatic materialized-view rewrite as a QUERY surface — the
  * [[graft.plans.RewriteToMv]] optimizer rule driven end-to-end: a
  * summary MV is materialized once, and a LATER roll-up query written
  * against the BASE table is answered from the MV by Catalyst, with
  * the plan substitution verified in-query (every input file of the
  * executed plan is an MV file; the result is value-identical to the
  * same query with the rule disabled) while DuckDB hash-checks the
  * values against the base table — the oracle never sees the MV, so a
  * hash-green row proves the rewrite is invisible to results.
  *
  * Scale rationale: at 100 TB the fact scan dominates every roll-up;
  * a maintained per-(flag, status) summary is ~6 rows. The rewrite
  * turns a full fact scan into a KB-scale read with no query change —
  * the one optimization pushdown cannot express. Freshness is the
  * registration's job ([[MvCatalog.UpsertPin]] / caller contract);
  * these rows materialize and query in the same job, the AssumeFresh
  * case.
  */
object Matviews {

  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s))
  private val revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  /** Revenue in EXACT fixed-point (1e-4 units — price and discount
    * each carry two decimals, so the product has at most four): the
    * MV's partial-merge, the rule-off single fold, and DuckDB's direct
    * fold then sum the same LONGS, which is order-independent. The
    * plain double `revenue` sum is not: at sf0.01 the rolled-up
    * partials and the oracle's fold landed an ulp apart across a cent
    * boundary (…334.385) and the exact-hash gate flipped — the same
    * boundary fragility the `cents` discipline kills everywhere else
    * in the repo.
    */
  private val revenueFp: Column = round(revenue * 10000, 0).cast("long")
  private val cutoff = "1997-06-30 00:00:00"

  /** The summary MV both rows derive from: per-(returnflag, linestatus)
    * partial aggregates of the shipped-before-cutoff slice — raw sums
    * and counts (NOT rounded averages: partials must stay mergeable
    * for roll-up, the same discipline as
    * [[Changes.orderSummaryPartial]]).
    */
  private def pricingMvDef(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= ts(cutoff))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("qty_sum"),
        sum(revenueFp).as("rev_sum"),
        count(lit(1)).as("n_rows"),
        sum("l_discount").as("disc_sum"),
        count(col("l_discount")).as("disc_n"),
        countDistinct("l_suppkey").as("n_supp"))

  /** Materialize + register once per (session, fixture dir); repeat
    * calls (bench reps) reuse the registration.
    */
  private val registered =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def ensureMv(spark: SparkSession, dir: String): String =
    registered.getOrElseUpdate((graft.plans.MvCatalog.sessionKey(spark), dir), {
      val path = graft.Scratch.dir("mv-pricing")
      MvCatalog.materialize(spark, s"mv_pricing_$dir", pricingMvDef(spark, dir),
        path)
      path
    })

  /** Doubles compare with a relative tolerance: the rewritten plan
    * merges per-MV-group partial sums, a different FP addition order
    * than the base scan's single fold.
    */
  private def sameRows(a: Array[org.apache.spark.sql.Row],
                       b: Array[org.apache.spark.sql.Row]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      (0 until x.length).forall { i =>
        (x.get(i), y.get(i)) match {
          case (d1: Double, d2: Double) =>
            math.abs(d1 - d2) <= 1e-9 * math.max(1.0, math.abs(d1))
          case (v1, v2) => v1 == v2
        }
      }
    }

  /** Roll-up + residual-filter rewrite: the query groups by a SUBSET
    * of the MV's keys and filters on another key — Catalyst must
    * re-aggregate MV partials (Σ of sums, Σ of counts, Σsum/Σcount for
    * the average) under a key-only residual filter, reading ONLY MV
    * files, and the values must match both the rule-off run and
    * DuckDB's base-table computation.
    */
  val qMvRewrite: QuerySpec = QuerySpec(
    "q_mv_rewrite",
    Some(s"""SELECT l_returnflag,
      round(sum(l_quantity),2) AS sum_qty,
      round(CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000, 2) AS sum_rev,
      round(avg(l_discount),4) AS avg_disc,
      count(*) AS n
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '$cutoff' AND l_linestatus = 'O'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      val mvPath = ensureMv(spark, dir)
      def rollup: DataFrame = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= ts(cutoff) && col("l_linestatus") === "O")
        .groupBy("l_returnflag")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(revenueFp).cast("double") / 10000, 2).as("sum_rev"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
      val q = rollup
      val files = q.inputFiles
      require(files.nonEmpty && files.forall(_.contains(mvPath)),
        s"MV rewrite did not fire: plan reads ${files.take(3).mkString(",")}")
      val withMv = q.collect()
      spark.conf.set("graft.mv.rewrite.enabled", "false")
      val (baseline, baseFiles) =
        try { val b = rollup; (b.collect(), b.inputFiles) }
        finally spark.conf.set("graft.mv.rewrite.enabled", "true")
      require(baseFiles.exists(!_.contains(mvPath)),
        "rule-off baseline unexpectedly read the MV — contract meaningless")
      require(sameRows(withMv, baseline),
        "MV rewrite changed results vs the rule-off plan")
      q
    })

  /** Exact-key verbatim serve: grouping by EXACTLY the MV's keys makes
    * each MV row one result group, so even a non-decomposable
    * aggregate (COUNT DISTINCT) is served from the stored column —
    * the rewrite the roll-up path can never do, gated by the same
    * all-files-from-MV + rule-off parity contracts.
    */
  val qMvRewriteExact: QuerySpec = QuerySpec(
    "q_mv_rewrite_exact",
    Some(s"""SELECT l_returnflag, l_linestatus,
      count(DISTINCT l_suppkey) AS n_supp,
      round(sum(l_quantity),2) AS sum_qty
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '$cutoff'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    (spark, dir) => {
      val mvPath = ensureMv(spark, dir)
      def exact: DataFrame = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= ts(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          countDistinct("l_suppkey").as("n_supp"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
      val q = exact
      val files = q.inputFiles
      require(files.nonEmpty && files.forall(_.contains(mvPath)),
        s"exact-key MV rewrite did not fire: plan reads " +
          files.take(3).mkString(","))
      val withMv = q.collect()
      spark.conf.set("graft.mv.rewrite.enabled", "false")
      val baseline =
        try exact.collect()
        finally spark.conf.set("graft.mv.rewrite.enabled", "true")
      require(sameRows(withMv, baseline),
        "exact-key MV rewrite changed results vs the rule-off plan")
      q
    })

  /** The star-schema summary MV: fact×dim pre-joined, per-(priority,
    * flag) partials. Matching a JOIN base is width-independent
    * subtree comparison ([[graft.plans.MvCatalog.stripInnerProjects]]),
    * so the query builds the identical join from fresh reads.
    */
  private def starMvDef(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(
        sum("l_quantity").as("qty_sum"),
        sum(revenueFp).as("rev_sum"),
        count(lit(1)).as("n_rows"))

  private val registeredStar =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def ensureStarMv(spark: SparkSession, dir: String): String =
    registeredStar.getOrElseUpdate(
      (graft.plans.MvCatalog.sessionKey(spark), dir), {
        val path = graft.Scratch.dir("mv-star")
        MvCatalog.materialize(spark, s"mv_star_$dir",
          starMvDef(spark, dir), path)
        path
      })

  /** Join-base (star-schema) MV rewrite: the MV pre-joins the fact
    * table with its dimension and stores per-(priority, flag)
    * partials; a later roll-up over the SAME join — written against
    * the base tables — is answered from the MV with the join gone from
    * the plan entirely. In-query contracts: every input file is an MV
    * file (no fact or dim scan survives) and the values match the
    * rule-off run; DuckDB recomputes the join + aggregate from the raw
    * tables. Scale rationale: this is the rewrite that removes a
    * fact-dim SHUFFLE, not just a scan — at 100 TB the join dominates
    * the roll-up even when both scans prune well.
    */
  val qMvRewriteJoin: QuerySpec = QuerySpec(
    "q_mv_rewrite_join",
    Some("""SELECT o_orderpriority,
      round(sum(l_quantity),2) AS sum_qty,
      round(CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000, 2) AS sum_rev,
      count(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (spark, dir) => {
      val mvPath = ensureStarMv(spark, dir)
      def rollup: DataFrame = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(revenueFp).cast("double") / 10000, 2).as("sum_rev"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
      val q = rollup
      val files = q.inputFiles
      require(files.nonEmpty && files.forall(_.contains(mvPath)),
        s"join-base MV rewrite did not fire: plan reads " +
          files.take(3).mkString(","))
      val withMv = q.collect()
      spark.conf.set("graft.mv.rewrite.enabled", "false")
      val baseline =
        try rollup.collect()
        finally spark.conf.set("graft.mv.rewrite.enabled", "true")
      require(sameRows(withMv, baseline),
        "join-base MV rewrite changed results vs the rule-off plan")
      q
    })

  def specs: Seq[QuerySpec] = Seq(qMvRewrite, qMvRewriteExact, qMvRewriteJoin)
}
