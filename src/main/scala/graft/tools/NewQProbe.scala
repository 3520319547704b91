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
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_basket_rules", "q_record_linkage", "q_incremental_agg",
        "q_ab_test", "q_quality_checks", "q_table_diff", "q_histogram",
        "q_event_transitions", "q_tfidf_topk")
    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 2).foreach(i => time(s"$q $i")(fn(spark, sfDir).count()))
    }
    spark.stop()
  }
}
