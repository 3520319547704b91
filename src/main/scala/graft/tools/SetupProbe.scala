package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Times each bench setup build in isolation (same order as
  * graft.Bench) so a setup regression can be localized without a full
  * bench run.
  */
object SetupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[setup] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    try graft.SparkEntry.queries("q5_region_revenue")(spark, sfDir).count()
    catch { case _: Throwable => () }
    time("analyze")(graft.sources.Tables.analyzeAll(spark, sfDir))
    time("ivf_build")(graft.operators.Ivf.ensureIndex(spark, sfDir))
    time("jaccard_pairs_build")(
      graft.operators.TextOps.jaccardPairs(spark, sfDir, 0.9).count())
    time("jaccard_cc_build")(
      graft.operators.Dedup.jaccardClusters(spark, sfDir, 0.9).count())
    time("minhash_pairs_build")(
      graft.operators.TextOps.minhashPairs(spark, sfDir).count())
    time("minhash_shingle_pairs_build")(
      graft.operators.TextOps.minhashShinglePairs(spark, sfDir).count())
    time("shingle_jaccard_pairs_build")(
      graft.operators.TextOps.shingleJaccardPairs(spark, sfDir, 0.95).count())
    time("simhash_pairs_build")(
      graft.operators.TextOps.simhashPairsFor(spark, sfDir).count())
    time("global_jaccard_pairs_build")(
      graft.operators.TextOps.globalJaccardPairs(spark, sfDir, 0.9).count())
    time("minhash_cc_build")(
      graft.operators.Dedup.minhashClusters(spark, sfDir, 0.9).count())
    time("embed_cells_build")(
      graft.operators.VectorOps.embedCellsFor(spark, sfDir).count())
    spark.stop()
  }
}
