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
    // materialize the final ranks BEFORE dropping adj: the returned
    // DataFrame is consumed by a LATER action, and unpersisting adj
    // while ranks is still lazy would recompute the whole edge build +
    // groupByKey per consumer action (measured: 3× the operator cost at
    // sf0.1). One persist + count pins the (node, score) pairs — tiny
    // relative to the graph — then adj can go; the ContextCleaner frees
    // the ranks blocks once the frame is unreferenced.
    val finalRanks = ranks.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    finalRanks.count()
    adj.unpersist(blocking = false)
    val rows = finalRanks.map { case (node, s) => Row(node, s) }
    spark.createDataFrame(rows,
      StructType(Seq(StructField("node", LongType), StructField("score", DoubleType))))
  }

  /** Supplier ids are offset into their own id space so the two entity
    * kinds share one node namespace.
    */
  private val SuppOffset = 1000000L

  /** Symmetrize a directed (s, t) edge set by emitting both directions
    * from ONE pass — `explode` over a two-struct array, not
    * `e0.unionAll(e0.swap)`, whose two branches each recompute the
    * upstream join+distinct (the dominant cost of both graph fixtures).
    */
  private def symmetrize(e0: DataFrame): DataFrame =
    e0.select(explode(array(
      struct(col("s"), col("t")),
      struct(col("t").as("s"), col("s").as("t")))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))

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
      val edges = symmetrize(e0)
      pageRank(spark, edges, iters = 3, srcCol = "s", dstCol = "t")
        .select(
          when(col("node") >= SuppOffset, lit("supplier"))
            .otherwise(lit("customer")).as("kind"),
          when(col("node") >= SuppOffset, col("node") - SuppOffset)
            .otherwise(col("node")).as("entity_id"),
          round(col("score"), 6).as("score"))
        .orderBy("kind", "entity_id")
    })

  /** Co-purchase part graph: undirected (a < b) edges between parts
    * appearing in the same order at least `minSupport` times. The
    * support threshold is load-bearing at scale: raw co-occurrence on a
    * basket corpus is near-quadratic in basket size and mostly noise;
    * support-thresholded edges are the standard market-basket
    * sparsification (and keep the oracle's 3-way self-join tractable).
    */
  def copurchaseEdges(spark: SparkSession, dir: String,
                      minSupport: Int = 2): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
    // Pair generation as group-then-expand, not a self-join (r17,
    // guide §2.3/§2.4): the l1 ⋈ l2 ON k = k2 AND a < b form moves
    // lineitem into the join TWICE (or broadcasts it whole and caps
    // parallelism at the scan's split count — measured 3 tasks on the
    // fixture, 29 of 32 cores idle for the dominant 2.4 s stage);
    // grouping by order moves lineitem ONCE and expands the per-order
    // part pairs inside the aggregation's own partitions with codegen
    // array builtins. Equivalence to the join: per order, the join
    // emits each value pair (a < b) once per (row-with-a, row-with-b)
    // combination, i.e. cnt(a)·cnt(b); over the sorted multiset of the
    // order's parts, unordered position pairs (i < j) with DISTINCT
    // values realize exactly cnt(a)·cnt(b) for every a < b — duplicate
    // parts in one order contribute multiplicity, equal-value pairs
    // contribute nothing, both exactly as the join condition does.
    // Per-order blowup is C(k,2) in basket size k — bounded by the
    // order schema (≤ 7 lineitems) at any scale, same as the join's.
    li.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(filter(slice(ps, i + 2, size(ps)), y -> y > x),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select("a", "b")
  }

  /** Exact triangle count + global clustering coefficient by
    * degree-ordered orientation (the MapReduce-classic of Suri &
    * Vassilvitskii's "Counting Triangles and the Curse of the Last
    * Reducer", WWW'11): orient every edge from its lower-(degree, id)
    * endpoint to the higher one, enumerate wedges only at each edge's
    * SOURCE, and close them against the oriented edge set. Each
    * triangle is counted exactly once, and — the scale property — the
    * wedge count per node is bounded by its oriented out-degree, which
    * the orientation caps at O(sqrt(|E|)) for any graph: a celebrity
    * hub with degree 10^6 contributes almost no wedges because nearly
    * all its edges point INTO it. Two hash joins, no global window.
    */
  def triangleStats(edges0: DataFrame): DataFrame = {
    // The edge list is read FOUR times below (degree ×2, orientation,
    // edge count) and its upstream build (a co-occurrence self-join +
    // support aggregation for the fixture graph) dominates the operator
    // — materialize it once. localCheckpoint fits local mode; on a
    // cluster this is a persist(MEMORY_AND_DISK) or a parquet-staged
    // edge table, same derive-once shape.
    val edges = edges0.localCheckpoint()
    val deg = edges.select(col("a").as("x"))
      .unionAll(edges.select(col("b").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // rank = (degree, id) lexicographic — a total order, so orientation
    // is acyclic and every wedge/triangle has a unique lowest vertex
    val withDeg = edges
      .join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
    // materialized for the same reason as `edges`: wedge-left,
    // wedge-right, and the closing-edge probe all read it
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("src"), col("b").as("dst"),
          struct(col("db").as("rd"), col("b").as("rid")).as("dstRank")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"),
            struct(col("da").as("rd"), col("a").as("rid")).as("dstRank")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dstRank").as("dstRank"))
      .localCheckpoint()
    // distinct alias sets on every self-join side: all three frames
    // below share `oriented`'s lineage, and fresh exprIds are what keep
    // the join conditions out of Spark's ambiguous-self-join trap
    val w1 = oriented.select(col("src").as("u1"), col("dst").as("v"),
      col("dstRank").as("vRank"))
    val w2 = oriented.select(col("src").as("u2"), col("dst").as("w"),
      col("dstRank").as("wRank"))
    // wedges at the lowest-rank vertex, ordered so the closing edge
    // (if present) is oriented v->w by construction
    val wedges = w1.join(w2,
      col("u1") === col("u2") && col("vRank") < col("wRank"))
      .select(col("v"), col("w"))
    val closing = oriented.select(col("src").as("cv"), col("dst").as("cw"))
    val tri = wedges.join(closing,
      col("v") === col("cv") && col("w") === col("cw"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    // 1-row scalar sides: broadcast explicitly, same discipline as the
    // file's other small-side joins (AQE would get there, but the plan
    // should say what it means)
    tri.crossJoin(broadcast(stats)).crossJoin(broadcast(nEdges))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("clustering"))
  }

  /** Triangle census of the co-purchase part graph. Oracle: DuckDB
    * counts the same triangles by the a<b<c three-way self-join (a
    * different algorithm — orientation-free — so the hash match is an
    * independent derivation, not the same code twice).
    */
  val qTriangles: QuerySpec = QuerySpec(
    "q_triangles",
    Some("""WITH pairs AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT x, count(*) AS d FROM (
          SELECT a AS x FROM pairs UNION ALL SELECT b AS x FROM pairs)
        GROUP BY x),
      tri AS (SELECT count(*) AS t FROM pairs e1
        JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b)
      SELECT (SELECT count(*) FROM deg) AS n_nodes,
        (SELECT count(*) FROM pairs) AS n_edges,
        (SELECT t FROM tri) AS n_triangles,
        CAST((SELECT sum(d * (d - 1)) / 2 FROM deg) AS BIGINT) AS n_wedges,
        round(3.0 * (SELECT t FROM tri) /
          (SELECT sum(d * (d - 1)) / 2 FROM deg), 6) AS clustering"""),
    (spark, dir) =>
      triangleStats(copurchaseEdges(spark, dir)))

  /** Fixed-depth BFS: shortest-hop distance (≤ 3) from a seed node in
    * the symmetrized customer↔supplier trade graph. Three unrolled
    * frontier expansions — frontier ⋈ edges, anti-join visited — so the
    * per-round shuffle moves frontier-sized data, never the corpus; a
    * fixed depth keeps Catalyst out of any loop (the unbounded-depth
    * variant belongs at the RDD layer beside [[pageRank]] /
    * `Dedup.connectedComponents`).
    */
  def bfsHops(edges0: DataFrame, seeds: DataFrame, depth: Int): DataFrame = {
    // edges: (s, t); seeds: (node). Returns (node, hop = min distance).
    // Materialize the edge list once: every round joins against it, and
    // the final plan would otherwise re-derive its upstream build
    // `depth` times (cluster analogue: persist or a staged edge table).
    val edges = edges0.localCheckpoint()
    var visited = seeds.select(col("node"), lit(0).as("hop"))
    var frontier = seeds.select(col("node"))
    var i = 1
    while (i <= depth) {
      // fresh aliases per round: frontier carries edge lineage from the
      // previous round, so unrenamed edge columns would be ambiguous
      val e = edges.select(col("s").as(s"_s$i"), col("t").as(s"_t$i"))
      // materialize each round's frontier (node ids only — tiny): the
      // loop otherwise nests lineage, so round i re-runs every earlier
      // round's join once per LATER round and again in the final plan
      // (r16, guide §1.2 — the BPE lineage-cut discipline)
      val next = frontier.join(e, col("node") === col(s"_s$i"))
        .select(col(s"_t$i").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint()
      frontier = next
      visited = visited.unionAll(next.select(col("node"), lit(i).as("hop")))
      i += 1
    }
    visited
  }

  /** 3-hop neighborhood of the most active customer (max orders, key
    * tie-break) in the trade graph, entity kinds decoded.
    */
  val qBfsHops: QuerySpec = QuerySpec(
    "q_bfs_hops",
    Some("""WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),
      seed AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
        ORDER BY count(*) DESC, o_custkey LIMIT 1),
      h0 AS (SELECT node, 0 AS hop FROM seed),
      h1 AS (SELECT DISTINCT e.t AS node, 1 AS hop FROM e
        JOIN h0 ON e.s = h0.node
        WHERE e.t NOT IN (SELECT node FROM h0)),
      h2 AS (SELECT DISTINCT e.t AS node, 2 AS hop FROM e
        JOIN h1 ON e.s = h1.node
        WHERE e.t NOT IN (SELECT node FROM h0 UNION ALL SELECT node FROM h1)),
      h3 AS (SELECT DISTINCT e.t AS node, 3 AS hop FROM e
        JOIN h2 ON e.s = h2.node
        WHERE e.t NOT IN (SELECT node FROM h0 UNION ALL
          SELECT node FROM h1 UNION ALL SELECT node FROM h2)),
      hops AS (SELECT * FROM h0 UNION ALL SELECT * FROM h1
        UNION ALL SELECT * FROM h2 UNION ALL SELECT * FROM h3)
      SELECT CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END
          AS kind,
        CASE WHEN node >= 1000000 THEN node - 1000000 ELSE node END
          AS entity_id,
        hop
      FROM hops ORDER BY kind, entity_id"""),
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
      val ord = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey")
      val e0 = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("s"),
          (col("l_suppkey") + SuppOffset).as("t"))
        .distinct()
      val edges = symmetrize(e0)
      val seed = Tables.load(spark, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("o_custkey").asc)
        .limit(1)
        .select(col("o_custkey").as("node"))
      bfsHops(edges, seed, depth = 3)
        .select(
          when(col("node") >= SuppOffset, lit("supplier"))
            .otherwise(lit("customer")).as("kind"),
          when(col("node") >= SuppOffset, col("node") - SuppOffset)
            .otherwise(col("node")).as("entity_id"),
          col("hop"))
        .orderBy("kind", "entity_id")
    })

  def specs: Seq[QuerySpec] = Seq(qPageRank, qTriangles, qBfsHops)
}
