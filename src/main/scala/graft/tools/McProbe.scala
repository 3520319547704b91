package graft.tools
import graft.GraftSession
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._
object McProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("mc-probe")
    var t0 = System.nanoTime()
    val pairs = TextOps.minhashPairs(spark, sfDir).filter(col("est_sim") >= 0.9)
      .select("doc1", "doc2").localCheckpoint()
    println(f"mh_pairs=${pairs.count()} pair_time=${(System.nanoTime()-t0)/1e9}%.2fs")
    t0 = System.nanoTime()
    val comps = Dedup.connectedComponents(pairs)
    println(f"nodes=${comps.count()} clusters=${comps.select("comp").distinct().count()} cc_time=${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
