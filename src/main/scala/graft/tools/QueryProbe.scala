package graft.tools
import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Generic stage-level timing probe: run a declared query N times and
  * print per-stage durations and task counts of the LAST run, plus the
  * wall time of each run. Usage: runMain graft.tools.QueryProbe <query>
  * [reps]. Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q_triangles")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (for { a <- si.submissionTime; b <- si.completionTime }
          yield b - a).getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"dur=${dur}%6dms cpu=${m.executorCpuTime / 1000000}%6dms " +
          f"run=${m.executorRunTime}%6dms " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
          f"in=${m.inputMetrics.bytesRead / 1024}%8dKB ${si.name.take(70)}")
      }
    })
    val fn = graft.SparkEntry.queries(qname)
    (1 to reps).foreach { i =>
      if (i == reps) { Thread.sleep(300); stages.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[qp] $qname rep=$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    Thread.sleep(500)
    stages.forEach(s => println("[qp] " + s))
    spark.stop()
  }
}
