package graft.tools
import graft.GraftSession
import graft.operators.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** A/B timing of the shingle PPJoin build: df-dictionary order vs
  * xxhash64 order (same output — PpjoinSpec pins equality).
  */
object ShProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("sh-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def frame = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(TextOps.shingles(split(trim(col("text")), " +"))).as("toks"))
    // warm the parquet/tokenizer path so neither variant pays first-read cost
    frame.count()
    val h = time("hash-ordered")(TextOps.jaccardPairsHashOrdered(frame, 0.95).count())
    val d = time("dictionary")(TextOps.jaccardPairsOver(frame, 0.95).count())
    println(s"[sh] pairs: hash=$h dict=$d")
    spark.stop()
  }
}
