package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan artifacts the optimization rounds commit under
  * `plans/` (r16). Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q...>
  */
object PlanDump extends App {
  val Array(sfDir, outDir, suffix, rest @ _*) = args.toSeq.toArray
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[16]").config("spark.sql.shuffle.partitions", "16"))
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  new java.io.File(outDir).mkdirs()
  rest.foreach { name =>
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt")
    } catch { case e: Throwable =>
      println(s"[plandump] $name failed: ${e.getMessage}")
    }
  }
  spark.stop()
}
