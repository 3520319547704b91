package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup cluster collapse (SURVEY.md §2.11: "MinHash over shingles,
  * LSH banding, connected components"): pair emission (jaccardPairs /
  * qMinhashLsh) is only half a dedup pipeline — this module turns the
  * pair graph into clusters and keeps one representative per cluster.
  *
  * Algorithm: iterative min-label propagation with pointer jumping
  * (comp := comp(comp) each round), the DataFrame rendition of the
  * classic log-round connected-components map-reduce (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"). Each round is two
  * shuffle joins + one aggregation — no driver-side graph state, no
  * `collect`; the only per-round action is a one-row convergence
  * aggregate. Lineage is cut with `localCheckpoint` per round (on a
  * cluster: `checkpoint` to durable storage) so the plan doesn't grow
  * with iteration count.
  *
  * Determinism: the fixpoint labels every node with the MINIMUM id in
  * its component — engine-independent, so the result is oracle-checkable
  * (DuckDB twin: recursive-CTE transitive closure).
  */
object Dedup {

  /** Connected components over an undirected pair list.
    *
    * @param pairs edge list; endpoints in `src`/`dst` columns
    * @return (id, comp) for every node that appears in a pair, where
    *         comp = min node id of the component
    */
  def connectedComponents(pairs: DataFrame, src: String = "doc1",
                          dst: String = "doc2", maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col(src).as("src"), col(dst).as("dst"))
      .union(pairs.select(col(dst).as("src"), col(src).as("dst")))
      .distinct()
      .localCheckpoint() // reused every round; cut candidate-gen lineage
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    // invariant: comp(x) <= x, so sum(comp) decreases monotonically and
    // an unchanged sum IS the fixpoint — a 1-row action per round, not a
    // row-by-row diff
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // propagate: comp := min(comp, min over neighbours' comp)
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("comp").as("nbr_comp"))
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // pointer jumping: comp := comp(comp) — collapses label chains so
      // convergence is O(log diameter) rounds, not O(diameter)
      val next = prop
        .join(prop.select(col("id").as("comp"), col("comp").as("comp2")), Seq("comp"))
        .select(col("id"), col("comp2").as("comp"))
        .localCheckpoint()
      val s = next.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels
  }

  /** Collapse a near-dup pair graph to one kept row per cluster: the
    * representative is the minimum-id member; rows in no pair survive
    * untouched. Output schema = input schema.
    */
  def keepRepresentative(df: DataFrame, pairs: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(pairs).withColumnRenamed("id", idCol)
    df.join(comps, Seq(idCol), "left")
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .drop("comp")
  }

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

  /** Cluster ids over the exact-jaccard near-dup graph. */
  val qDedupCluster: QuerySpec = QuerySpec(
    "q_dedup_cluster",
    Some(s"""WITH RECURSIVE $jaccardPairsCte
      SELECT doc_id, comp,
        CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS cluster_size
      FROM comp ORDER BY doc_id"""),
    (spark, dir) => {
      val pairs = TextOps.jaccardPairs(spark, dir, 0.9).select("doc1", "doc2")
      connectedComponents(pairs)
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
      val pairs = TextOps.jaccardPairs(spark, dir, 0.9).select("doc1", "doc2")
      keepRepresentative(docs, pairs).orderBy("doc_id")
    })

  def specs: Seq[QuerySpec] = Seq(qDedupCluster, qDedupKeepRep)
}
