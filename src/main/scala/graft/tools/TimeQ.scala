package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ extends App {
  val names = args.toSeq
  val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  names.foreach { n =>
    val t0 = System.nanoTime()
    val c = graft.SparkEntry.queries(n)(spark, sf).count()
    println(f"TIMEQ $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
  }
  graft.Memo.clearAll()
  spark.stop()
}
