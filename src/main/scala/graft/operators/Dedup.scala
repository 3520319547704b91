package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup cluster collapse (SURVEY.md §2.11: "MinHash over shingles,
  * LSH banding, connected components"): pair emission (jaccardPairs /
  * qMinhashLsh) is only half a dedup pipeline — this module turns the
  * pair graph into clusters and keeps one representative per cluster.
  *
  * Algorithm: star contraction with pointer jumping — the DataFrame
  * rendition of the log-round connected-components map-reduce family
  * (Kiveris et al., "Connected Components in MapReduce and Beyond").
  * Each round is shuffle joins + one aggregation over a monotonically
  * SHRINKING edge set — no driver-side graph state, no `collect`; the
  * only per-round action is an `isEmpty` on a checkpointed frame.
  * Lineage is cut with `localCheckpoint` per round (on a cluster:
  * `checkpoint` to durable storage) so the plan doesn't grow with
  * iteration count.
  *
  * Determinism: the fixpoint labels every node with the MINIMUM id in
  * its component — engine-independent, so the result is oracle-checkable
  * (DuckDB twin: recursive-CTE transitive closure).
  */
object Dedup {

  /** Connected components over an undirected pair list, by star
    * contraction: each round merges every super-node into
    * `least(self, min neighbour)`, pointer-jumps the merge map, folds it
    * into the node labels, and CONTRACTS the edge set through the map
    * (self-loops drop). The edge set shrinks monotonically — a
    * near-clique dedup cluster collapses to zero edges in one round, a
    * path halves per round — so the expensive per-round join runs over
    * a vanishing graph, unlike fixed-edge-set label propagation which
    * pays full edge volume every round. Termination is `edges.isEmpty`
    * on a checkpointed frame (a metadata action, not a scan).
    *
    * The surviving super-node of a component is its minimum id (the min
    * never merges outward), so labels are engine-deterministic.
    *
    * @param pairs edge list; endpoints in `src`/`dst` columns
    * @return (id, comp) for every node that appears in a pair, where
    *         comp = min node id of the component
    */
  def connectedComponents(pairs: DataFrame, src: String = "doc1",
                          dst: String = "doc2", maxIters: Int = 25): DataFrame = {
    // normalize to u<v BEFORE deduping (half the distinct volume), then
    // double — the two directions are disjoint by construction, so the
    // doubled set needs no second distinct
    val norm = pairs.select(
        least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var edges = norm
      .union(norm.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint() // on a cluster: checkpoint() to durable storage
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var done = edges.isEmpty
    while (!done && iter < maxIters) {
      // merge map over current super-nodes: x → least(x, min neighbour).
      // c(x) < x or c(x) = x, so chains strictly decrease — acyclic.
      val c1 = edges.groupBy(col("u").as("x")).agg(min("v").as("m"))
        .select(col("x"), least(col("x"), col("m")).as("c"))
        .localCheckpoint()
      // full pointer-jump closure c := c(c) until fixpoint: a merge
      // CHAIN (x→x-1→…→root, the shape a path graph produces) collapses
      // to its root within log(chain) tiny self-joins, so the expensive
      // outer round count stays O(log n) on every graph shape. Inner
      // joins run over the supernode-sized merge map, not the edges.
      var c = c1
      var jumped = false
      while (!jumped) {
        val j = c.as("a")
          .join(c.select(col("x").as("c"), col("c").as("cc")).as("b"), Seq("c"), "left")
          .select(col("x"), col("c"), coalesce(col("cc"), col("c")).as("c2"))
          .localCheckpoint()
        jumped = j.filter(col("c2") =!= col("c")).isEmpty
        c = j.select(col("x"), col("c2").as("c"))
      }
      // fold into node labels: comp := c(comp) where defined. No
      // checkpoint here: labels is consumed once per round and once at
      // the end, and its lineage stays shallow (one join per round over
      // already-checkpointed inputs) — checkpointing it only added a
      // materialization job per round.
      labels = labels
        .join(c.withColumnRenamed("x", "comp"), Seq("comp"), "left")
        .select(col("id"), coalesce(col("c"), col("comp")).as("comp"))
      // contract the graph through the merge map: the edge set shrinks
      // every round (cliques vanish immediately, local-minima count at
      // least halves), which is what keeps round cost falling
      edges = edges
        .join(c.select(col("x").as("u"), col("c").as("cu")), Seq("u"))
        .join(c.select(col("x").as("v"), col("c").as("cv")), Seq("v"))
        .select(col("cu").as("u"), col("cv").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      done = edges.isEmpty
      iter += 1
    }
    labels
  }

  /** Collapse a near-dup pair graph to one kept row per cluster: the
    * representative is the minimum-id member; rows in no pair survive
    * untouched. Output schema = input schema.
    */
  def keepRepresentative(df: DataFrame, pairs: DataFrame,
                         idCol: String = "doc_id"): DataFrame =
    keepRepresentativeWith(df, connectedComponents(pairs), idCol)

  /** Collapse with a precomputed (id, comp) cluster map — the shared
    * implementation behind every keep-one path (so the representative
    * rule lives in exactly one place).
    */
  def keepRepresentativeWith(df: DataFrame, comps: DataFrame,
                             idCol: String = "doc_id"): DataFrame =
    df.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .drop("comp")

  // DuckDB oracle twin: undirected transitive closure by recursive CTE,
  // over the same exact-jaccard >= 0.9 pair graph as q_ngram_jaccard.
  private val jaccardPairsCte =
    """t AS (SELECT doc_id, lang,
      |    list_distinct(regexp_split_to_array(trim(text), ' +')) AS toks
      |  FROM documents),
      |pairs AS (
      |  SELECT a.doc_id AS doc1, b.doc_id AS doc2
      |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.9),
      |edges AS (
      |  SELECT doc1 AS src, doc2 AS dst FROM pairs
      |  UNION SELECT doc2, doc1 FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |comp AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS comp
      |  FROM reach GROUP BY src)""".stripMargin

  /** Session-lifetime memo of the jaccard cluster map per (session,
    * dir, threshold) — the cluster map is an index artifact exactly like
    * the persisted IVF index: derive once, consume from many queries.
    * The memoized frame is localCheckpoint'd, so reuse costs a cached
    * scan, not a recompute of candidate generation + CC rounds.
    */
  private val clusterMemo =
    scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String, Double), DataFrame]

  /** (id, comp) for the exact-jaccard near-dup graph of `dir`. */
  def jaccardClusters(spark: org.apache.spark.sql.SparkSession, dir: String,
                      threshold: Double): DataFrame =
    clusterMemo.getOrElseUpdate((spark, dir, threshold), {
      val pairs = TextOps.jaccardPairs(spark, dir, threshold)
        .select("doc1", "doc2")
      connectedComponents(pairs).localCheckpoint()
    })

  /** Cluster ids over the exact-jaccard near-dup graph. */
  val qDedupCluster: QuerySpec = QuerySpec(
    "q_dedup_cluster",
    Some(s"""WITH RECURSIVE $jaccardPairsCte
      SELECT doc_id, comp,
        CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS cluster_size
      FROM comp ORDER BY doc_id"""),
    (spark, dir) => {
      jaccardClusters(spark, dir, 0.9)
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("comp")))
        .select(col("id").as("doc_id"), col("comp"), col("cluster_size"))
        .orderBy("doc_id")
    })

  /** The dedup pipeline end-to-end: documents minus non-representative
    * near-dup cluster members.
    */
  val qDedupKeepRep: QuerySpec = QuerySpec(
    "q_dedup_keep_rep",
    Some(s"""WITH RECURSIVE $jaccardPairsCte
      SELECT d.doc_id, d.lang, d.source FROM documents d
      LEFT JOIN comp c ON d.doc_id = c.doc_id
      WHERE c.comp IS NULL OR c.comp = d.doc_id
      ORDER BY d.doc_id"""),
    (spark, dir) => {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .select("doc_id", "lang", "source")
      keepRepresentativeWith(docs, jaccardClusters(spark, dir, 0.9))
        .orderBy("doc_id")
    })

  /** The 100 TB dedup path end-to-end: MinHash signatures → LSH banding
    * → candidate pairs (est_sim ≥ 0.9) → connected components → keep
    * min-id representative. Rows-only (minhash is engine-specific
    * hashing); the oracle-checked q_dedup_keep_rep proves the identical
    * collapse logic on the exact-jaccard graph, and DedupSimilaritySpec
    * ties minhash estimates to true jaccard.
    */
  val qMinhashDedup: QuerySpec = QuerySpec(
    "q_minhash_dedup",
    None,
    (spark, dir) => {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .select("doc_id", "lang")
      val pairs = TextOps.minhashPairs(spark, dir)
        .filter(col("est_sim") >= 0.9)
        .select("doc1", "doc2")
      keepRepresentative(docs, pairs)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    })

  /** The LLM-data-curation pipeline end to end, composed from the
    * engine's own operators: alpha-ratio quality gate → near-dup
    * cluster collapse (keep min-id representative) → 80% deterministic
    * portable-hash sample → per-language counts. Every stage is
    * individually oracle-checked elsewhere; this query proves the
    * COMPOSITION matches the oracle too.
    */
  val qPipelineCurate: QuerySpec = QuerySpec(
    "q_pipeline_curate",
    Some(s"""WITH RECURSIVE $jaccardPairsCte
      SELECT lang, count(*) AS n_curated,
        CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM (
        SELECT d.doc_id, d.lang FROM documents d
        LEFT JOIN comp c ON d.doc_id = c.doc_id
        WHERE (c.comp IS NULL OR c.comp = d.doc_id)
          AND CAST(length(regexp_replace(d.text, '[^a-z]', '', 'g')) AS DOUBLE)
              / length(d.text) >= 0.7
          AND CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
              CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80)
      GROUP BY lang ORDER BY lang"""),
    (spark, dir) => {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val qualityOk = docs.filter(
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")) >= 0.7)
      val deduped = keepRepresentativeWith(
        qualityOk.select("doc_id", "lang"), jaccardClusters(spark, dir, 0.9))
      deduped
        .filter(Splits.portableBucket(col("doc_id").cast("string")) < 80)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_curated"), min("doc_id").as("first_doc"))
        .orderBy("lang")
    })

  def specs: Seq[QuerySpec] =
    Seq(qDedupCluster, qDedupKeepRep, qMinhashDedup, qPipelineCurate)
}
