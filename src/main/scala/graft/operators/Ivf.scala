package graft.operators

import graft.QuerySpec
import graft.functions.GraftFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside random-hyperplane LSH (SURVEY.md §2.11).
  *
  * Index = k-means-style centroids; each corpus vector is assigned to
  * its nearest centroid ("cell"). A probe searches only the `nProbe`
  * nearest cells. Everything is DataFrame ops:
  *   - deterministic seeding (first k vectors by id — reproducible
  *     across cluster re-runs, no RNG state),
  *   - Lloyd iterations as assign (broadcast centroids, argmin via
  *     codegen'd cosine) + recompute (posexplode → per-dimension avg),
  *   - search as a semi-join on cell ids.
  * At 100 TB the corpus never shuffles during search — only the probe
  * set (small) joins against cell-pruned partitions; the index build is
  * iters × (one broadcast join + one narrow aggregation).
  */
object Ivf {

  /** Cell centroids as (cid: Int, centroid: array<float>). */
  def buildCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    var centroids = emb.orderBy("vec_id").limit(k)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cid"),
              col("embedding").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(emb, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), x => x.getField("m").cast("float")).as("centroid"))
    }
    centroids
  }

  /** Nearest-centroid assignment: (vec_id, embedding, cid). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    emb.select("vec_id", "embedding")
      .crossJoin(broadcast(centroids))
      .withColumn("sim", GraftFunctions.cosineSim(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cid")
  }

  /** Probe's candidate cells: nProbe nearest centroids per probe. */
  private def probeCells(probes: DataFrame, centroids: DataFrame,
                         nProbe: Int): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("cid"))
    probes.select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", GraftFunctions.cosineSim(col("pvec"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nProbe)
      .select("probe_id", "pvec", "cid")
  }

  /** ANN top-k searching only nProbe cells per probe. Same output
    * schema as VectorOps.topK; recall measured in IvfSpec.
    */
  def topKIvf(emb: DataFrame, probeFilter: Column, k: Int,
              numCells: Int = 16, iters: Int = 2, nProbe: Int = 4): DataFrame = {
    val centroids = buildCentroids(emb, numCells, iters)
    val cells = assign(emb, centroids)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"), col("cid"))
    val probes = probeCells(emb.filter(probeFilter), centroids, nProbe)
    val joined = probes.join(cells, Seq("cid"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(GraftFunctions.cosineSim(col("pvec"), col("cvec")), 6))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("probe_id", "neighbor_id", "sim", "rk")
  }

  val qCosineTopKIvf: QuerySpec = QuerySpec(
    "q_cosine_topk_ivf",
    None, // approximate by design; recall vs brute force in IvfSpec
    (spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      topKIvf(emb, col("vec_id") < 10, 5).orderBy("probe_id", "rk")
    })

  def specs: Seq[QuerySpec] = Seq(qCosineTopKIvf)
}
