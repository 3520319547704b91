package graft.tools
import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.tools.TimeQ <name>
  * [sfDir] [reps]` — min of `reps` (default 2), the bench's discipline
  * without the bench's 18-minute sweep.
  */
object TimeQ extends App {
  val name = args(0)
  val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
  val reps = args.lift(2).map(_.toInt).getOrElse(2)
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val ts = (1 to reps).map { _ =>
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"TIMEQ $name min=${ts.min}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
  spark.stop()
}
