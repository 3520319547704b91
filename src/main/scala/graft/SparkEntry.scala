package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY.md §2); each
  * entry with an `oracleSql` twin is hash-checked against DuckDB at
  * sf0.01 by the driver's Verify run.
  */
object SparkEntry {

  /** Every implemented QuerySpec, in module order. */
  def allSpecs: Seq[QuerySpec] =
    Relational.specs ++ Scalars.specs ++ EventOps.specs ++
      TextOps.specs ++ Dedup.specs ++ VectorOps.specs ++ Multimodal.specs ++
      Extended.specs ++ Analytic.specs ++ Ivf.specs ++ Pq.specs ++
      AnnIndex.specs ++ Splits.specs ++
      Bpe.specs ++
      SqlEntry.specs ++ Contamination.specs ++ Search.specs ++ Scrub.specs ++
      Graph.specs ++ Changes.specs ++ Funnels.specs ++ Sketches.specs ++
      Clustering.specs ++ Series.specs ++ Audit.specs ++ Baskets.specs ++
      Layout.specs ++ Matviews.specs ++ Hl7.specs ++ Epi.specs ++
      Privacy.specs ++ Vocab.specs ++ Linkage.specs ++ Classify.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5RegionRevenue.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hashing / approximate results) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(s => s.oracle.map(o => s.name -> o.stripMargin)).toMap
}
