package graft.tools
import org.apache.spark.sql.SparkSession

/** 10× corpus scaling of BPE training (sf0.01 → sf0.1 documents): the
  * corpus shows up only in the word-count shuffle; the 40 merge
  * iterations ride the word table, which grows sub-linearly (Heap's
  * law) — the measured ratio for SCALE.md's text band.
  */
object BpeProbe extends App {
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val words = graft.operators.Bpe.wordCounts(docs, "text").count()
    val ts = (1 to 2).map(_ => timeIt {
      val m = graft.operators.Bpe.train(docs, "text", numMerges = 40)
      require(m.nonEmpty)
    }).min
    println(f"BPEPROBE $sf distinct_words=$words train40=$ts%.2f s")
  }
  spark.stop()
}
