package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall probe for the SQ8 operating point (the BqProbe discipline):
  * int8 rounding barely perturbs cosine order, so recall at small
  * shortlists should sit near 1 where 64-bit BQ needs shortlist 64
  * for ~0.6 — the number the scaladoc ladder quotes.
  */
object Sq8Probe extends App {
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[8]").config("spark.sql.shuffle.partitions", "8")).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
  val emb = graft.sources.Tables.load(spark, dir, "embeddings")
  val brute = graft.operators.VectorOps.topK(emb.filter(col("vec_id") < 50), emb, 5)
    .select("probe_id", "neighbor_id")
  for (s <- Seq(8, 16, 32)) {
    val sq = graft.operators.VectorOps.topKSq8(emb, col("vec_id") < 50, 5, Some(s))
      .select("probe_id", "neighbor_id")
    val hit = sq.join(brute, Seq("probe_id", "neighbor_id")).count()
    println(s"SQ8PROBE shortlist=$s recall@5=${hit.toDouble / brute.count()}")
  }
  spark.stop()
}
