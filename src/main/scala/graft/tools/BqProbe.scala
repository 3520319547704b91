package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BqProbe extends App {
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[8]").config("spark.sql.shuffle.partitions", "8")).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.01"
  val emb = graft.sources.Tables.load(spark, dir, "embeddings")
  val brute = graft.operators.VectorOps.topK(emb.filter(col("vec_id") < 50), emb, 5)
    .select("probe_id", "neighbor_id")
  for (s <- Seq(16, 32, 64)) {
    val bq = graft.operators.VectorOps.topKBinary(emb, col("vec_id") < 50, 5, Some(s))
      .select("probe_id", "neighbor_id")
    val hit = bq.join(brute, Seq("probe_id", "neighbor_id")).count()
    println(s"BQPROBE shortlist=$s recall@5=${hit.toDouble / brute.count()}")
  }
  spark.stop()
}
