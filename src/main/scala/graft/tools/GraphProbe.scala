package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Timing probe for the three graph queries at sf0.1. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.analyzeAll(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[g] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    Seq("q_pagerank", "q_bfs_hops", "q_triangles").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 3).foreach(i => time(s"$q $i")(fn(spark, sfDir).count()))
    }
    spark.stop()
  }
}
