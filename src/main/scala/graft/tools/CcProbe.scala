package graft.tools
import graft.GraftSession
import graft.operators.{Dedup, TextOps}
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("cc-probe")
    var t0 = System.nanoTime()
    val pairs = TextOps.jaccardPairs(spark, sfDir, 0.9).select("doc1", "doc2").localCheckpoint()
    println(f"pairs=${pairs.count()} jaccard_time=${(System.nanoTime()-t0)/1e9}%.2fs")
    t0 = System.nanoTime()
    val comps = Dedup.connectedComponents(pairs)
    println(f"nodes=${comps.count()} clusters=${comps.select("comp").distinct().count()} cc_time=${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
