package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off plan probe for the unfiltered IVF search: prints the cells
  * scan's ReadSchema so the v2 cells layout (filter columns persisted
  * in the cells) can be checked for column pruning on the UNFILTERED
  * path, plus a min-of-N timing split build vs search.
  */
object IvfPlanProbe extends App {
  val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val path = graft.operators.Ivf.ensureIndex(spark, dir)
  val emb = graft.sources.Tables.load(spark, dir, "embeddings")
  val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 32)
  val res = graft.operators.Ivf.searchIndex(spark, path, probes, 5)
  val plan = res.queryExecution.executedPlan.toString
  plan.linesIterator.filter(l =>
    l.contains("ReadSchema") || l.contains("PushedFilters"))
    .foreach(l => println("PLAN " + l.trim.take(200)))
  val ts = (1 to 4).map { _ =>
    val t0 = System.nanoTime()
    res.count()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"PROBE search-only min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
  spark.stop()
}
