package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainR14 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", 4)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    println("=== topKWhere ===")
    graft.operators.VectorOps.topKWhere(emb.filter(col("vec_id") < 10), emb,
      col("label") === col("p_label"), 5).explain("formatted")
    println("=== searchCellsWhere ===")
    val path = graft.operators.Ivf.ensureIndex(spark, dir)
    graft.operators.Ivf.searchCellsWhere(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/cells"),
      emb.filter(col("vec_id") < 10), 5, 8,
      col("label") === col("p_label")).explain("formatted")
    spark.stop()
  }
}
