package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy-preserving release — the de-identification half of the
  * reference's shared-services charter (a surveillance platform
  * re-publishes line lists and aggregates; the public techniques are
  * k-anonymity via quasi-identifier generalization, Sweeney 2002, and
  * calibrated-noise aggregate release, Dwork et al. 2006):
  *
  *  - [[kAnonymize]]: generalize quasi-identifiers up a fixed ladder
  *    (day → month → year; fine → coarse key buckets) to the FIRST
  *    level where every equivalence class holds ≥ k rows, suppressing
  *    residual small classes only at the top level. Deterministic by
  *    construction — the level choice is a pure function of the data.
  *  - [[noisyCounts]]: per-group counts with seeded Laplace noise.
  *    The noise is a deterministic function of (seed, group key) — a
  *    SHA-256-derived uniform through the inverse-CDF — so releases
  *    are reproducible and testable; a production deployment swaps
  *    the seeded uniform for a CSPRNG draw (the scaladoc'd seam: with
  *    a public seed this is calibrated perturbation, not a formal DP
  *    guarantee).
  *
  * Scale shape: k-anonymity costs one hash aggregation per ladder
  * level (ladder length is a small constant) to find the class sizes,
  * then one pass to emit — the corpus is never shuffled more than the
  * level aggs; noisy counts are ONE aggregation plus per-group scalar
  * noise (hash + ln — codegen'd built-ins).
  */
object Privacy {

  /** One generalization level: the named quasi-identifier columns. */
  final case class QiLevel(cols: Seq[(String, Column)])

  /** Smallest equivalence-class size under a level's grouping. An
    * EMPTY input has zero equivalence classes (min over zero groups is
    * SQL NULL) — trivially k-anonymous, not an error: report MaxValue
    * so the ladder picks level 0 and releases the empty frame.
    */
  private def minClassSize(df: DataFrame, level: QiLevel): Long = {
    val counts = df.groupBy(level.cols.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
    // one scalar to the driver per ladder level (ladder is O(3))
    val row = counts.agg(min("n")).head()
    if (row.isNullAt(0)) Long.MaxValue else row.getLong(0)
  }

  /** Generalize up `ladder` to the first level satisfying k; at the
    * top level, suppress classes still below k. Returns the chosen
    * level index and the released frame: generalized QI columns plus
    * `keep` (the released attributes), with a `k_level` column
    * stamping the level the release used.
    */
  def kAnonymize(df: DataFrame, ladder: Seq[QiLevel], k: Long,
                 keep: Seq[Column]): (Int, DataFrame) = {
    require(ladder.nonEmpty, "kAnonymize: empty generalization ladder")
    // the ladder scan's per-level sizes are the ONLY aggregations this
    // release runs — the chosen level's size is reused below, never
    // recomputed (one full-corpus agg per level, period)
    val sizes = scala.collection.mutable.Map.empty[Int, Long]
    def sizeAt(i: Int): Long =
      sizes.getOrElseUpdate(i, minClassSize(df, ladder(i)))
    val lvl = ladder.indices.find(sizeAt(_) >= k)
      .getOrElse(ladder.length - 1) // top level + suppression
    val level = ladder(lvl)
    val qi = level.cols.map { case (n, c) => c.as(n) }
    val gen = df.select(qi ++ keep: _*)
    val released =
      if (sizeAt(lvl) >= k) gen
      else {
        // top-level residual: suppress classes below k (the rows have
        // no k-anonymous representation in this ladder)
        val big = df.groupBy(qi: _*).agg(count(lit(1)).as("n"))
          .filter(col("n") >= k)
          .select(level.cols.map { case (n, _) => col(n) }: _*)
        gen.join(big, level.cols.map(_._1), "leftsemi")
      }
    (lvl, released.withColumn("k_level", lit(lvl)))
  }

  /** Seeded-uniform u ∈ (0,1) from SHA-256 of (seed, key): the first
    * 8 hex chars parsed as an integer, centered off 0 and 1. The SAME
    * formula is SQL-expressible in DuckDB (`('0x'||substr)::BIGINT`),
    * which is what makes the release cross-engine checkable.
    */
  private def seededUniform(seed: String, key: Column): Column =
    (conv(substring(sha2(concat_ws("|", lit(seed), key), 256), 1, 8),
      16, 10).cast("long").cast("double") + 0.5) / 4294967296.0

  /** Laplace(b) noise through the inverse CDF of the seeded uniform. */
  private def laplace(u: Column, b: Double): Column = {
    val c = u - 0.5
    -lit(b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** Per-group counts with seeded Laplace(1/eps) noise, rounded at 6
    * then 4 decimals (the suite's cross-engine double discipline —
    * `ln` may differ by an ulp between engines).
    */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
                  seed: String): DataFrame = {
    val key = concat_ws("~", groupCols.map(col): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n",
        round(round(col("n") + laplace(seededUniform(seed, key), 1.0 / eps),
          6), 4))
  }

  /** k-anonymous release of the orders line list: quasi-identifiers
    * are (customer bucket, order date) generalized day → month → year
    * with key buckets coarsening in step; k = 5; the released
    * attribute is the price. Both engines pick the level by the same
    * data-dependent rule (scalar min-class-size subqueries), so the
    * hash pins the LADDER SEMANTICS — which level a given corpus
    * needs — not just the emission.
    */
  val qKAnonymize: QuerySpec = QuerySpec(
    "q_k_anonymize",
    Some("""WITH l0 AS (SELECT o_custkey // 10 AS qc,
          CAST(o_orderdate AS DATE) AS qd, o_totalprice FROM orders),
      l1 AS (SELECT o_custkey // 100 AS qc,
          date_trunc('month', CAST(o_orderdate AS DATE))::DATE AS qd,
          o_totalprice FROM orders),
      l2 AS (SELECT o_custkey // 1000 AS qc,
          date_trunc('year', CAST(o_orderdate AS DATE))::DATE AS qd,
          o_totalprice FROM orders),
      m0 AS (SELECT min(n) AS m FROM (SELECT count(*) AS n FROM l0 GROUP BY qc, qd)),
      m1 AS (SELECT min(n) AS m FROM (SELECT count(*) AS n FROM l1 GROUP BY qc, qd)),
      m2 AS (SELECT min(n) AS m FROM (SELECT count(*) AS n FROM l2 GROUP BY qc, qd)),
      lvl AS (SELECT CASE WHEN (SELECT m FROM m0) >= 5 THEN 0
                          WHEN (SELECT m FROM m1) >= 5 THEN 1
                          ELSE 2 END AS l),
      gen AS (SELECT l0.* FROM l0, lvl WHERE lvl.l = 0
              UNION ALL SELECT l1.* FROM l1, lvl WHERE lvl.l = 1
              UNION ALL SELECT l2.* FROM l2, lvl WHERE lvl.l = 2),
      ok AS (SELECT qc, qd FROM gen GROUP BY qc, qd HAVING
               count(*) >= 5 OR (SELECT m FROM m2) >= 5 OR
               (SELECT l FROM lvl) < 2)
      SELECT gen.qc, gen.qd, round(gen.o_totalprice, 2) AS price,
        (SELECT l FROM lvl) AS k_level
      FROM gen SEMI JOIN ok ON gen.qc = ok.qc AND gen.qd = ok.qd
      ORDER BY qc, qd, price"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val ladder = Seq(
        QiLevel(Seq(
          "qc" -> (col("o_custkey") / 10).cast("long"),
          "qd" -> to_date(col("o_orderdate")))),
        QiLevel(Seq(
          "qc" -> (col("o_custkey") / 100).cast("long"),
          "qd" -> trunc(to_date(col("o_orderdate")), "month"))),
        QiLevel(Seq(
          "qc" -> (col("o_custkey") / 1000).cast("long"),
          "qd" -> trunc(to_date(col("o_orderdate")), "year"))))
      val (_, released) = kAnonymize(orders, ladder, k = 5L,
        keep = Seq(round(col("o_totalprice"), 2).as("price")))
      released.select(col("qc"), col("qd"), col("price"), col("k_level"))
        .orderBy("qc", "qd", "price")
    })

  /** Seeded noisy-count release per order priority — reproducible
    * calibrated perturbation, cross-engine: the identical SHA-256 →
    * uniform → inverse-CDF pipeline runs in DuckDB, so the hash check
    * pins the NOISE derivation, not just the counts.
    */
  val qNoisyCounts: QuerySpec = QuerySpec(
    "q_noisy_counts",
    Some("""WITH base AS (
        SELECT o_orderpriority AS prio, count(*) AS n
        FROM orders GROUP BY 1),
      u AS (SELECT prio, n,
        (('0x' || substr(sha256('graft-release-1|' || prio), 1, 8))::BIGINT
          + 0.5) / 4294967296.0 AS uu
        FROM base)
      SELECT prio, n,
        round(round(n + (-2.0) * sign(uu - 0.5)
          * ln(1.0 - 2.0 * abs(uu - 0.5)), 6), 4) AS noisy_n
      FROM u ORDER BY prio"""),
    (spark, dir) => {
      noisyCounts(Tables.load(spark, dir, "orders")
        .select(col("o_orderpriority").as("prio")),
        Seq("prio"), eps = 0.5, seed = "graft-release-1")
        .orderBy("prio")
    })

  /** Small-cell suppression for published contingency tables — the
    * third disclosure-control primitive (statistical agencies mask
    * counts below a threshold, and then COMPLEMENTARY-suppress: a row
    * with exactly one masked cell would let a reader recover it from
    * the row total, so the smallest surviving cell in that row masks
    * too; deterministic tie-break by column key). One pass over the
    * cell frame plus one per-row window — no iteration (full
    * cross-dimension complementary suppression is NP-hard; the
    * row-rule is the published-practice baseline and is stated as
    * such).
    */
  def suppressSmallCells(cells: DataFrame, rowCol: String, colCol: String,
                         nCol: String, k: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(rowCol)
    val primary = cells.withColumn("_prim", col(nCol) < k)
    // rank surviving cells per row by (count, column key): rank 1 is
    // the complementary victim when exactly one primary hides
    val rankW = Window.partitionBy(rowCol)
      .orderBy(when(col("_prim"), lit(null)).otherwise(col(nCol)).asc_nulls_last,
        col(colCol).asc)
    primary
      .withColumn("_nprim", sum(when(col("_prim"), 1).otherwise(0)).over(w))
      .withColumn("_rank", row_number().over(rankW))
      .withColumn("suppressed",
        col("_prim") || (col("_nprim") === 1 && col("_rank") === 1))
      .select(col(rowCol), col(colCol),
        when(col("suppressed"), lit(null)).otherwise(col(nCol)).as(nCol),
        col("suppressed"))
  }

  /** Nation × priority counts with k=5 suppression: primaries masked,
    * and every row with a lone primary loses its smallest surviving
    * cell too — the oracle recomputes the identical rule with its own
    * windows, so the hash pins the complementary-victim selection
    * (count-then-column tie-break), not just the threshold.
    */
  val qCellSuppression: QuerySpec = QuerySpec(
    "q_cell_suppression",
    Some("""WITH cells AS (
        SELECT c.c_nationkey AS nation, o.o_orderpriority AS prio,
          count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
      marked AS (
        SELECT nation, prio, n, n < 5 AS prim FROM cells),
      ranked AS (
        SELECT *,
          sum(CASE WHEN prim THEN 1 ELSE 0 END)
            OVER (PARTITION BY nation) AS nprim,
          row_number() OVER (PARTITION BY nation
            ORDER BY CASE WHEN prim THEN NULL ELSE n END ASC NULLS LAST,
              prio ASC) AS rnk
        FROM marked)
      SELECT nation, prio,
        CASE WHEN prim OR (nprim = 1 AND rnk = 1) THEN NULL ELSE n END AS n,
        prim OR (nprim = 1 AND rnk = 1) AS suppressed
      FROM ranked ORDER BY nation, prio"""),
    (spark, dir) => {
      val cells = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"))
      suppressSmallCells(cells, "nation", "prio", "n", k = 5L)
        .orderBy("nation", "prio")
    })

  def specs: Seq[QuerySpec] = Seq(qKAnonymize, qNoisyCounts, qCellSuppression)
}
