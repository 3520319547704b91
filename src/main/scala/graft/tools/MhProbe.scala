package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing of the minhash pair build. */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), array_distinct(split(trim(col("text")), " +")).as("toks"))
    time("tokenize only")(docs.count())
    val sigs = graft.operators.TextOps.minhashSignatures(docs).cache()
    time("signatures")(sigs.count())
    val numBands = 8; val rowsPerBand = 8
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until numBands).map { b =>
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)).as(Seq("band", "bhash")))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct().cache()
    time("band join + distinct")(println("[mh] cands=" + cands.count()))
    val s1 = sigs.select(col("doc_id").as("doc1"), col("sig").as("sig1"))
    val s2 = sigs.select(col("doc_id").as("doc2"), col("sig").as("sig2"))
    time("reattach + eq")(
      cands.join(s1, Seq("doc1")).join(s2, Seq("doc2"))
        .withColumn("est_sim",
          round(graft.functions.GraftFunctions.arrayEqCount(col("sig1"), col("sig2"))
            .cast("double") / 64, 4))
        .select("doc1", "doc2", "est_sim").count())
    spark.stop()
  }
}
