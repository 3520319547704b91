package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspector: `runMain graft.tools.Explain <sfDir> <query> [query…]`
  * prints the formatted physical plan (and timing) for each named query —
  * the loop used to check pushdown/broadcast/codegen properties
  * (SURVEY.md §4).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-explain")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"========== $n ==========")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val cnt = df.count()
      println(f"rows=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
