package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: does Spark's dynamic-pruning rule inject a runtime
  * filter on the graft V2 scan for a broadcast join keyed on a stat
  * column? Prints the optimized plan's pruning subqueries and the
  * final scan node.
  */
object DppProbe extends App {
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  import spark.implicits._
  implicit val store: graft.sources.TableStore = graft.sources.TableStore.local
  val dir = java.nio.file.Files.createTempDirectory("dpp").toString + "/t"
  val b0 = (1L to 64L).map(k => (k, (k * 10).toInt, s"s$k", false))
    .toDF("k", "v", "s", "_del")
  graft.sources.Ingest.upsertParquet(dir, Seq("k"), nBuckets = 2,
    keepVersions = 2, sortCols = Seq("v"), filesPerBucket = 4)(b0, 0L)
  val fact = spark.read.format("graft").load(dir)
  val dimPath = dir + "_dim"
  Seq((40, "hit"), (90, "hit"), (99999, "miss")).toDF("v", "tag")
    .write.parquet(dimPath)
  val dim = spark.read.parquet(dimPath)
  val joined = fact.join(broadcast(dim.filter(col("tag") === "hit")),
    Seq("v"))
  println("== optimized ==")
  println(joined.queryExecution.optimizedPlan.treeString.take(4000))
  joined.collect()
  println("== final ==")
  println(joined.queryExecution.executedPlan.toString.take(4000))
  spark.stop()
}
