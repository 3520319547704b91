package graft.tools
import org.apache.spark.sql.SparkSession
object R7Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.analyzeAll(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[r7] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    Seq("q_substring_dedup", "q_cosine_topk_lsh_exact", "q_embed_neardup_lsh_exact",
        "q_stream_resume", "q_qty_below_avg", "q_qty_below_avg_sql",
        "q_image_phash_pairs", "q_image_phash_contain", "q_funnel",
        "q1_pricing_summary").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 2).foreach(i => time(s"$q $i")(fn(spark, sfDir).count()))
    }
    spark.stop()
  }
}
