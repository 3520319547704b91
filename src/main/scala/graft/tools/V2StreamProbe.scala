package graft.tools

import org.apache.spark.sql.Row

/** Diff the V2 change-feed stream against readTableChanges on the
  * shared source fixture — dev probe for q_stream_source_format.
  */
object V2StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("v2streamprobe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val table = graft.operators.Changes.sharedSourceTable(spark, dir)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val src = spark.readStream.format("graft").option("read", "changes")
      .option("maxBatchesPerTrigger", "1").load(table)
    val q = src.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val n = df.count()
        println(s"[probe] micro-batch $id rows=$n")
        df.collect().foreach(seen.add); ()
      }
      .option("checkpointLocation", graft.Scratch.dir("v2probe") + "/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(); q.stop()
    val got = spark.createDataFrame(new java.util.ArrayList(seen), src.schema)
    val want = graft.sources.Ingest.readTableChanges(spark, table, 0L, 999L)(
      graft.sources.TableStore.local)
    println(s"[probe] stream rows=${got.count()} api rows=${want.count()}")
    val g = got.collect().map(_.toString).sorted
    val w = want.collect().map(_.toString).sorted
    g.diff(w).take(5).foreach(r => println(s"[probe] stream-only: $r"))
    w.diff(g).take(5).foreach(r => println(s"[probe] api-only:    $r"))
    spark.stop()
  }
}
