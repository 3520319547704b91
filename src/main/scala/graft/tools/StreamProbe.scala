package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Timing probe: stream-stream join cost vs state-partition count. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[sp] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val fn = graft.SparkEntry.queries("q_stream_join")
    val tumb = graft.SparkEntry.queries("q_stream_tumbling")
    time("join warm")(fn(spark, sfDir).count())
    Seq("32", "8", "4").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      (1 to 2).foreach(i => time(s"join p=$p $i")(fn(spark, sfDir).count()))
      time(s"tumbling p=$p")(tumb(spark, sfDir).count())
    }
    spark.stop()
  }
}
