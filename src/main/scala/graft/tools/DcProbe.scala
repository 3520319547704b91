package graft.tools
import graft.GraftSession
import graft.operators.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Micro-timing of the shingle expression pipeline. */
object DcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dc-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dc] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .cache()
    docs.count() // warm + materialize tokens
    time("warm count 2")(docs.count())
    time("A sequence+transform lit")(
      docs.select(sum(size(transform(
        sequence(lit(0), size(col("toks")) - 3), i => lit("x"))))).collect())
    time("B + slice")(
      docs.select(sum(size(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", slice(col("toks"), i + lit(1), lit(3))))))).collect())
    time("C full shingles()")(
      docs.select(sum(size(TextOps.shingles(col("toks"))))).collect())
    time("D distinct(shingles)")(
      docs.select(sum(size(array_distinct(TextOps.shingles(col("toks")))))).collect())
    time("E explode+count")(
      docs.select(explode(TextOps.shingles(col("toks")))).count())
    time("F fingerprint-style (baseline)")(
      docs.select(sum(length(concat_ws(" ", col("toks"))))).collect())
    docs.unpersist()
    spark.stop()
  }
}
