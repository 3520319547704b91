package graft.tools
import org.apache.spark.sql.SparkSession
object KmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.analyzeAll(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[km] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 3).foreach { i =>
      time(s"q_kmeans $i")(graft.SparkEntry.queries("q_kmeans")(spark, sfDir).count())
    }
    spark.stop()
  }
}
