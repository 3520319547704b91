package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession
object NewQProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.analyzeAll(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[nq] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    Seq("q_containment_dedup", "q_interval_overlap", "q_ohlc_bars",
        "q_unpivot", "q_bloom_prune", "q_kmeans", "q_stream_cdc",
        "q_rrf_fusion", "q_heavy_hitters", "q_funnel",
        "q_cohort_retention", "q_cdc_apply", "q_scd2").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 2).foreach(i => time(s"$q $i")(fn(spark, sfDir).count()))
    }
    spark.stop()
  }
}
