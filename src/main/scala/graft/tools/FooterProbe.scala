package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: does footerManifestRows fire for int/timestamp sortCols,
  * and do its rows equal the scan-based derivation? */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{StatsManifest, TableStore}
    val store = TableStore.local
    println("[fp] outputTimestampType=" +
      spark.conf.get("spark.sql.parquet.outputTimestampType"))
    val dir = graft.Scratch.dir("footer-probe")
    val df = spark.range(0, 10000).select(
      col("id"),
      (col("id") % 7).cast("int").as("cid"),
      timestamp_seconds(col("id") * 60).as("ts"),
      concat(lit("p"), col("id") % 5).as("prio"))
    df.repartition(4).write.mode("overwrite").parquet(dir)
    val files = store.listNames(dir).filter(_.endsWith(".parquet"))
      .map(n => (store.child(dir, n), n))
    for (cols <- Seq(Seq("cid"), Seq("ts"), Seq("cid", "ts"), Seq("prio"))) {
      val foot = StatsManifest.footerManifestRows(
        spark, files, cols, spark.read.parquet(dir).schema)
      println(s"[fp] cols=$cols footer=${foot.isDefined}")
      foot.foreach { f =>
        val aggs = StatsManifest.statsAggs(cols)
        val scan = spark.read.parquet(dir)
          .groupBy(StatsManifest.relFile(store.baseName(dir)).as("file"))
          .agg(aggs.head, aggs.tail: _*)
        val diff = f.exceptAll(scan).count() + scan.exceptAll(f).count()
        println(s"[fp] cols=$cols diff_rows=$diff (0 = identical)")
        if (diff > 0) {
          println("[fp] footer rows:")
          f.orderBy("file").collect().foreach(r => println("[fp]   " + r))
          println("[fp] scan rows:")
          scan.orderBy("file").collect().foreach(r => println("[fp]   " + r))
        }
      }
    }
    spark.stop()
  }
}
