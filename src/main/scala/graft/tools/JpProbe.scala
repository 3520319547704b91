package graft.tools
import graft.GraftSession
import graft.functions.GraftFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Decomposed timing of the PPJoin jaccard pair build — which stage
  * (dictionary, candidate join, verification) dominates at a given SF.
  */
object JpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.9
    val spark = GraftSession.local("jp-probe")
    GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jp] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs0 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), array_distinct(split(trim(col("text")), " +")).as("toks"))
    val inv0 = docs0.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok")).cache()
    time("tokenize+explode")(inv0.count())
    val idsRdd = inv0.groupBy("tok").agg(count(lit(1)).as("df"))
      .repartitionByRange(col("df"), col("tok"))
      .sortWithinPartitions("df", "tok")
      .select("tok").rdd.zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row(r.getString(0), (i + 1).toInt) }
    val ids = spark.createDataFrame(idsRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tid", org.apache.spark.sql.types.IntegerType)))).cache()
    time("dictionary ids")(ids.count())
    val docs = inv0.join(ids, "tok")
      .groupBy("doc_id", "lang")
      .agg(sort_array(collect_list(col("tid"))).as("tids"))
      .withColumn("n_toks", size(col("tids")))
      .withColumn("plen",
        (col("n_toks") - ceil(lit(threshold) * col("n_toks")) + 1).cast("int"))
      .cache()
    time("encode docs")(docs.count())
    val prefix = docs.select(col("doc_id"), col("lang"), col("n_toks"),
      explode(slice(col("tids"), lit(1), col("plen"))).as("tid"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.tid") === col("b.tid") && col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n_toks") >= ceil(lit(threshold) * col("b.n_toks")) &&
        col("b.n_toks") >= ceil(lit(threshold) * col("a.n_toks")))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct().cache()
    time("candidate join")(cands.count())
    val t1 = docs.select(col("doc_id").as("doc1"), col("tids").as("tids1"), col("n_toks").as("n1"))
    val t2 = docs.select(col("doc_id").as("doc2"), col("tids").as("tids2"), col("n_toks").as("n2"))
    val verified = cands.join(t1, "doc1").join(t2, "doc2")
      .withColumn("common", GraftFunctions.sortedIntIntersectCount(col("tids1"), col("tids2")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
    time("verification")(println("[jp] pairs=" + verified.count()))
    spark.stop()
  }
}
