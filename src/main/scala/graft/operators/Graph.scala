package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Link-analysis over entity graphs (north-star curation surface):
  * PageRank scores which documents/hosts/suppliers are structurally
  * central — the standard prior for web-corpus quality weighting
  * (a crawl keeps high-rank hosts, downweights link farms).
  *
  * Like [[Dedup.connectedComponents]], the iteration runs at the RDD
  * layer with a pinned [[HashPartitioner]]: adjacency lists and rank
  * vectors share the partitioner, so the per-round `join` +
  * `reduceByKey` are narrow on the adjacency side and there is NO
  * Catalyst planning inside the loop (the r3-measured failure mode of
  * DataFrame fixpoints). A fixed iteration count keeps the whole loop
  * lazy — ONE action materializes the final ranks.
  *
  * Scale shape at 100 TB: edges hash-partition once; each iteration is
  * one shuffle of (node, contribution) pairs — the same volume GraphX's
  * Pregel moves — with map-side combining from `reduceByKey`. Skewed
  * in-degree (every web graph) is absorbed by the combiner: a hot
  * node's contributions pre-sum per partition, so the reducer sees at
  * most `numPartitions` rows for it.
  */
object Graph {

  /** Fixed-iteration PageRank. Damping 0.85, uniform init 1/N, no
    * dangling-mass term — callers must pass an edge set where every
    * node has out-degree ≥ 1 (symmetrize the graph first if needed;
    * [[qPageRank]] does).
    *
    * @param edges directed (src, dst) pairs, deduplicated
    * @return (node, score) — deterministic up to double sum order
    */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val part = new HashPartitioner(
      math.max(4, spark.sessionState.conf.numShufflePartitions / 4))
    val adj = edges
      .select(col(srcCol).cast("long"), col(dstCol).cast("long")).rdd
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupByKey(part)
      .mapValues(_.toArray)
      .persist()
    val n = adj.count() // the single upfront action: node count
    val nD = n.toDouble
    var ranks = adj.mapValues(_ => 1.0 / nD) // inherits `part`
    var i = 0
    while (i < iters) {
      val contribs = adj.join(ranks) // narrow: same partitioner both sides
        .values
        .flatMap { case (nbrs, r) =>
          val share = r / nbrs.length
          nbrs.map(d => (d, share))
        }
      // teleport uses the literal 0.15 (NOT 1 - 0.85, which is
      // 0.15000000000000002 in IEEE double) so the oracle's constant
      // is bit-identical
      ranks = contribs.reduceByKey(part, _ + _)
        .mapValues(c => 0.15 / nD + 0.85 * c)
      i += 1
    }
    val rows = ranks.map { case (node, s) => Row(node, s) }
    val df = spark.createDataFrame(rows,
      StructType(Seq(StructField("node", LongType), StructField("score", DoubleType))))
    adj.unpersist(blocking = false)
    df
  }

  /** Supplier ids are offset into their own id space so the two entity
    * kinds share one node namespace.
    */
  private val SuppOffset = 1000000L

  /** PageRank over the customer↔supplier trading graph (who-bought-
    * from-whom via orders⋈lineitem, symmetrized so no node dangles),
    * 3 iterations. Oracle: DuckDB computes the identical three
    * iterations as unrolled CTEs — scores hash-checked to 6 dp.
    */
  val qPageRank: QuerySpec = QuerySpec(
    "q_pagerank",
    Some("""WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),
      deg AS (SELECT s AS node, count(*) AS d FROM e GROUP BY s),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
      r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS score FROM deg, nn),
      r1 AS (SELECT e.t AS node,
          CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) +
          CAST(0.85 AS DOUBLE) * sum(r0.score / deg.d) AS score
        FROM r0 JOIN e ON r0.node = e.s JOIN deg ON deg.node = r0.node
        GROUP BY e.t),
      r2 AS (SELECT e.t AS node,
          CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) +
          CAST(0.85 AS DOUBLE) * sum(r1.score / deg.d) AS score
        FROM r1 JOIN e ON r1.node = e.s JOIN deg ON deg.node = r1.node
        GROUP BY e.t),
      r3 AS (SELECT e.t AS node,
          CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) +
          CAST(0.85 AS DOUBLE) * sum(r2.score / deg.d) AS score
        FROM r2 JOIN e ON r2.node = e.s JOIN deg ON deg.node = r2.node
        GROUP BY e.t)
      SELECT CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
        CASE WHEN node >= 1000000 THEN node - 1000000 ELSE node END AS entity_id,
        round(score, 6) AS score
      FROM r3 ORDER BY kind, entity_id"""),
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
      val e0 = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("s"),
          (col("l_suppkey") + SuppOffset).as("t"))
        .distinct()
      val edges = e0.unionAll(e0.select(col("t").as("s"), col("s").as("t")))
      pageRank(spark, edges, iters = 3, srcCol = "s", dstCol = "t")
        .select(
          when(col("node") >= SuppOffset, lit("supplier"))
            .otherwise(lit("customer")).as("kind"),
          when(col("node") >= SuppOffset, col("node") - SuppOffset)
            .otherwise(col("node")).as("entity_id"),
          round(col("score"), 6).as("score"))
        .orderBy("kind", "entity_id")
    })

  def specs: Seq[QuerySpec] = Seq(qPageRank)
}
