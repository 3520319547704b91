package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock attribution for one declared query (guide §1/§7:
  * profile before changing anything): runs the query with a listener
  * recording every job's start/end and callsite, prints the jobs in
  * start order with durations and the gaps BETWEEN jobs (driver-side
  * work — planning, store ops, fs calls — that no stage metric shows).
  * Usage: runMain graft.tools.JobProfile <sfDir> <cpus> <q> [reps]
  */
object JobProfile extends App {
  val sfDir = args(0)
  val cpus = args(1)
  val q = args(2)
  val reps = if (args.length > 3) args(3).toInt else 2
  val spark = graft.GraftSession.configure(SparkSession.builder()
    .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus))
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  final case class J(id: Int, desc: String, t0: Long, var t1: Long = -1L)
  val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
  val order = new java.util.concurrent.ConcurrentLinkedQueue[J]()
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      val j = J(e.jobId, desc, e.time)
      jobs.put(e.jobId, j); order.add(j)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
    }
  })

  val fn = graft.SparkEntry.queries(q)
  (1 to reps).foreach { r =>
    jobs.clear(); order.clear()
    val w0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - w0) / 1e9
    // give the async listener bus a moment to drain before reading
    Thread.sleep(800)
    import scala.jdk.CollectionConverters._
    val js = order.asScala.toSeq.sortBy(_.t0)
    println(f"%n=== $q rep $r wall=$wall%.2fs jobs=${js.size} ===")
    var prevEnd = -1L
    var jobSum = 0L
    var gapSum = 0L
    js.foreach { j =>
      val dur = if (j.t1 > 0) j.t1 - j.t0 else -1
      val gap = if (prevEnd > 0) j.t0 - prevEnd else 0
      if (dur > 0) jobSum += dur
      if (gap > 0) gapSum += gap
      if (dur >= 50 || gap >= 50)
        println(f"  job ${j.id}%4d dur=${dur}%6dms gap_before=${gap}%6dms  ${j.desc.take(110)}")
      prevEnd = math.max(prevEnd, j.t1)
    }
    println(f"  [sum] jobs=${jobSum}ms inter-job-gaps=${gapSum}ms " +
      f"wall=${(wall * 1000).toLong}ms")
  }
  graft.Memo.clearAll()
  spark.stop()
}
