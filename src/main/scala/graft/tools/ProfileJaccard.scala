package graft.tools

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch profiler for the near-dup jaccard pipeline stages. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.9
    val spark = GraftSession.local("profile")
    GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs0 = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(split(trim(col("text")), " +")).as("toks")).cache()
    t("docs0 count")(docs0.count())
    val inv0 = docs0.select(col("doc_id"), explode(col("toks")).as("tok"))
    val dfreq = inv0.groupBy("tok").agg(count(lit(1)).as("df"))
    val byRarity = inv0.join(broadcast(dfreq), "tok")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("doc_id"), transform(col("st"), s => s.getField("tok")).as("rare"))
    val docs = docs0.join(byRarity, "doc_id")
      .withColumn("n_toks", size(col("rare")))
      .withColumn("plen",
        (col("n_toks") - ceil(lit(threshold) * col("n_toks")) + 1).cast("int"))
      .cache()
    t("docs+rarity count")(docs.count())
    val prefix = docs.select(col("doc_id"), col("lang"),
      explode(slice(col("rare"), lit(1), col("plen"))).as("tok")).cache()
    t("prefix count")(prefix.count())
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct().cache()
    t("cands distinct count")(println(cands.count()))
    val sortedToks = docs0.select(col("doc_id"), array_sort(col("toks")).as("stoks"),
                                  size(col("toks")).as("n"))
    val t1 = sortedToks.select(col("doc_id").as("doc1"), col("stoks").as("toks1"), col("n").as("n1"))
    val t2 = sortedToks.select(col("doc_id").as("doc2"), col("stoks").as("toks2"), col("n").as("n2"))
    val out = cands.join(t1, "doc1").join(t2, "doc2")
      .withColumn("common", GraftFunctions.sortedIntersectCount(col("toks1"), col("toks2")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
    t("verify+filter count")(println(out.count()))
    spark.stop()
  }
}
