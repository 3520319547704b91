package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Phase-level timing probe for the stream-stream join drain: split the
  * wall time into query start / awaitTermination / sink read, and dump
  * the engine's own per-batch durationMs breakdown (walCommit,
  * stateCommit, addBatch...) from the progress events.
  */
object StreamProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(): Long = System.nanoTime()
    def ms(a: Long, b: Long): String = f"${(b - a) / 1e6}%.0fms"
    // warm once through the normal path
    graft.SparkEntry.queries("q_stream_join")(spark, sfDir).count()
    val explicitCk = sys.env.get("SP2_EXPLICIT_CK").contains("1")
    (1 to 5).foreach { rep =>
      val t0 = t()
      val joined = graft.streaming.Streams.errorsWithRecentPurchases(
        graft.sources.Ingest.readStreamFiles(
          spark, s"$sfDir/events.*", graft.sources.Tables.eventsRaw)
          .transform(df => graft.sources.Tables.withEventTsAt(spark, sfDir)(df)),
        watermark = "3650 days")
      val t1 = t()
      val name = s"sp2_sink_$rep"
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      val w0 = joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = (if (explicitCk)
        w0.option("checkpointLocation", graft.Scratch.dir(s"sp2-ckpt-$rep"))
        else w0).start()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val t2 = t()
      q.awaitTermination()
      val t3 = t()
      val out = spark.table(name).localCheckpoint()
      spark.catalog.dropTempView(name)
      out.count()
      val t4 = t()
      println(s"[sp2] rep=$rep cpus=$cpus explicitCk=$explicitCk " +
        s"build=${ms(t0,t1)} start=${ms(t1,t2)} " +
        s"drain=${ms(t2,t3)} read=${ms(t3,t4)} total=${ms(t0,t4)}")
      if (rep == 1) {
        val root = new java.io.File(graft.Scratch.dir("stream-ck"))
        println(s"[sp2] stream-ck children: " +
          Option(root.listFiles()).map(_.map(_.getName).mkString(",")).getOrElse("none"))
      }
      q.recentProgress.foreach { p =>
        println(s"[sp2]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"[sp2]     state: commitTimeMs=${so.commitTimeMs} " +
            s"rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}
