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
    Seq("q_interpolate", "q_ewma", "q_winsorize", "q_mad_outliers",
        "q_gopher_rules", "q_paragraph_dedup", "q_dedup_incremental",
        "q_top_supplier", "q_top_supplier_sql", "q_idle_rich", "q_idle_rich_sql",
        "q1_pricing_summary").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 2).foreach(i => time(s"$q $i")(fn(spark, sfDir).count()))
    }
    spark.stop()
  }
}
