package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does minhash_cc_build time go: pair filter or CC fixpoint? */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("minhash_pairs (memoized build)")(
      graft.operators.TextOps.minhashPairs(spark, sfDir).count())
    val pairs = graft.operators.TextOps.minhashPairs(spark, sfDir)
      .filter(col("est_sim") >= 0.9).select("doc1", "doc2")
    time("pair filter count")(println("[cc] edges=" + pairs.count()))
    time("cc fixpoint")(
      println("[cc] rows=" + graft.operators.Dedup.connectedComponents(
        pairs).count()))
    time("minhashClusters (memo path)")(
      graft.operators.Dedup.minhashClusters(spark, sfDir, 0.9).count())
    spark.stop()
  }
}
