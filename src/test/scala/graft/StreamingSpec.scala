package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams
import graft.sources.Tables
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Structured-Streaming transforms driven by MemoryStream and checked
  * against their batch equivalents (SURVEY.md §5.5).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def fixtureEvents: Seq[Ev] = {
    Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  private def runToMemory(name: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                                        mode: OutputMode): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    stream.addData(fixtureEvents)
    val q = build(stream.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("streaming tumbling counts match the batch equivalent") {
    val got = runToMemory("t_tumbling")(Streams.tumblingCounts(_), OutputMode.Complete())
      .select("w_start", "event_type", "n", "sum_value")
      .orderBy("w_start", "event_type").collect()
    val want = operators.EventOps.qWindowTumbling.run(spark, sf).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) === w.getTimestamp(0))
      assert(g.getString(1) === w.getString(1))
      assert(g.getLong(2) === w.getLong(2))
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-6)
    }
  }

  test("session windows cover every event exactly once") {
    val got = runToMemory("t_session")(Streams.sessionCounts(_), OutputMode.Complete())
    val totalEvents = got.agg(sum("n_events")).collect().head.getLong(0)
    assert(totalEvents === Tables.load(spark, sf, "events").count())
  }

  test("streaming session windows equal the batch lag-gap sessionization") {
    val streaming = runToMemory("t_session_parity")(
      Streams.sessionCounts(_), OutputMode.Complete())
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // batch qSessionize: session_start = min(ts), same 30-min gap rule
    val batch = operators.EventOps.qSessionize.run(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streaming === batch)
  }

  test("dedupWithinWatermark drops an in-watermark duplicate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    stream.addData(Seq(
      Ev(1, t0, 1, "click", 1.0),
      Ev(1, t0, 1, "click", 1.0), // duplicate id within watermark
      Ev(2, t0, 1, "view", 2.0)))
    val q = Streams.dedupWithinWatermark(stream.toDF())
      .writeStream.format("memory").queryName("t_dedup").outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("t_dedup").count() === 2)
  }

  test("stream-stream join: errors matched to purchases within the hour") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    stream.addData(Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 5, "purchase", 9.0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:30:00"), 5, "error", 0.0),    // joins: 30 min gap
      Ev(3, Timestamp.valueOf("2024-01-01 08:00:00"), 5, "purchase", 1.0), // 2.5 h before → excluded
      Ev(4, Timestamp.valueOf("2024-01-01 10:20:00"), 6, "error", 0.0)))   // other user → no match
    // MemoryStream has no props column; add it to match the events shape
    val df = stream.toDF().withColumn("props", lit("{}"))
    val q = Streams.errorsWithRecentPurchases(df)
      .writeStream.format("memory").queryName("t_ssj")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("t_ssj").collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(rows.head.fieldIndex("error_id")) === 2L)
    assert(rows.head.getLong(rows.head.fieldIndex("purchase_id")) === 1L)
  }

  test("flatMapGroupsWithState keeps running totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = MemoryStream[Ev]
    val q = Streams.runningUserTotals(stream.toDF())
      .writeStream.format("memory").queryName("t_state")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(Seq(Ev(1, t0, 7, "click", 1.0), Ev(2, t0, 7, "view", 2.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(3, t0, 7, "click", 4.0), Ev(4, t0, 9, "view", 10.0)))
      q.processAllAvailable()
    } finally q.stop()
    // Update mode: last row per user reflects accumulated state
    val last = spark.table("t_state").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.last }
    assert(last(7L).getLong(1) === 3 && math.abs(last(7L).getDouble(2) - 7.0) < 1e-9)
    assert(last(9L).getLong(1) === 1 && math.abs(last(9L).getDouble(2) - 10.0) < 1e-9)
  }

  test("transformWithState counts per (user, type) on RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      val stream = MemoryStream[Ev]
      val q = Streams.typedEventCounts(stream.toDF())
        .writeStream.format("memory").queryName("t_tws")
        .outputMode(OutputMode.Update()).start()
      try {
        stream.addData(Seq(Ev(1, t0, 3, "click", 0), Ev(2, t0, 3, "click", 0),
                           Ev(3, t0, 3, "view", 0)))
        q.processAllAvailable()
        stream.addData(Seq(Ev(4, t0, 3, "click", 0)))
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("t_tws").collect()
        .groupBy(r => (r.getLong(0), r.getString(1)))
        .map { case (k, rows) => k -> rows.map(_.getLong(2)).max }
      assert(last((3L, "click")) === 3) // 2 in batch 1, +1 in batch 2
      assert(last((3L, "view")) === 1)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-static enrich joins dimension without streaming state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Ev]
    stream.addData(fixtureEvents.take(100))
    val dim = Tables.load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    val q = Streams.enrich(stream.toDF(), dim, "user_id", "c_custkey")
      .writeStream.format("memory").queryName("t_enrich").outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("t_enrich")
    assert(out.count() === 100)
    assert(out.filter(col("c_mktsegment").isNotNull).count() > 0)
  }

  test("checkpoint resume: no duplicate and no lost rows across a restart") {
    val (afterA, afterB) = operators.EventOps.streamResumePhases(spark, sf)
    def batchAgg(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      f(Tables.load(spark, sf, "events"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("w_start", "event_type").collect().map(_.toSeq).toSeq
    // phase 1 saw only the even-id half
    assert(canon(afterA) ===
      canon(batchAgg(_.filter(col("event_id") % 2 === 0))))
    // the resumed query's final state = the full fixture: a reprocessed
    // file would inflate counts, lost state would deflate them
    assert(canon(afterB) === canon(batchAgg(identity)))
    // and the restart genuinely added data (the drill isn't vacuous)
    assert(afterB.agg(sum("n")).head.getLong(0) >
      afterA.agg(sum("n")).head.getLong(0))
  }

  test("foreachBatch + MultiCommit: crash between tables recovers exactly-once on restart") {
    // the streaming face of the multi-table txn: one micro-batch
    // writes TWO tables through the coordinator; the first attempt at
    // batch 1 dies AFTER table A committed, the restarted query
    // replays batch 1 with the same id, and MultiCommit's roll-forward
    // makes the pair land exactly once — no lost batch, no double
    // apply, and the coordinator snapshot never shows the tear
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.{Ingest, MultiCommit}
    import graft.sources.MultiCommit.TxnPart
    import org.apache.spark.sql.types.{StructType, LongType, DoubleType}
    val base = graft.Scratch.dir("txn-stream")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val (a, b, coord, ck) = (s"$base/a", s"$base/b", s"$base/coord", s"$base/ck")
    val schema = new StructType().add("k", LongType).add("v", DoubleType)
    @volatile var crashArmed = true
    def stage(name: String, rows: Seq[(Long, Double)]): Unit = {
      val tmp = s"$base/stage_$name"
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$in/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def drain(): Unit = {
      val q = Ingest.readStreamFiles(spark, s"$in/*.parquet", schema)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (bd: DataFrame, id: Long) =>
          val batch = bd.persist()
          try {
            MultiCommit.commit(coord, Seq(
              TxnPart(a, id, () => Ingest.upsertParquet(a, Seq("k"),
                nBuckets = 2, keepVersions = 8)(batch, id)),
              TxnPart(b, id, () => {
                if (crashArmed && id >= 1L)
                  sys.error("injected crash between tables")
                Ingest.upsertParquet(b, Seq("k"), nBuckets = 2,
                  keepVersions = 8)(
                  batch.withColumn("v", col("v") * 10), id)
              })))
            ()
          } finally { batch.unpersist(); () }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def stateOf(t: String): Map[Long, Double] =
      Ingest.readUpsertTable(spark, t)
        .select("k", "v").as[(Long, Double)].collect().toMap
    stage("f0", Seq((1L, 1.0), (2L, 2.0)))
    drain() // batch 0 lands in both tables
    assert(MultiCommit.snapshot(coord) === Map(a -> 0L, b -> 0L))
    stage("f1", Seq((3L, 3.0)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    assert(ex.getMessage.contains("injected crash") ||
      Option(ex.getCause).exists(_.getMessage.contains("injected crash")))
    // torn mid-state: A is ahead (read-committed), the snapshot is not
    assert(stateOf(a) === Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
    assert(stateOf(b) === Map(1L -> 10.0, 2L -> 20.0))
    assert(MultiCommit.snapshot(coord) === Map(a -> 0L, b -> 0L))
    // restart from the same checkpoint: batch 1 replays with the SAME
    // id, A no-ops, B fills the gap, the txn completes
    crashArmed = false
    drain()
    assert(MultiCommit.snapshot(coord) === Map(a -> 1L, b -> 1L))
    assert(stateOf(a) === Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
    assert(stateOf(b) === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // exactly-once at the ledgers too: one commit per batch per table
    assert(Ingest.committedBatchIds(a) === Set(0L, 1L))
    assert(Ingest.committedBatchIds(b) === Set(0L, 1L))
  }

  test("streaming quarantine: bad rows dead-letter per micro-batch, crash-replay stays idempotent") {
    // the streaming face of quarantine mode: a foreachBatch upsert
    // pipeline with a pinned CHECK keeps flowing when a micro-batch
    // carries poison rows — the violations land in the dead-letter
    // area stamped with their batch, the clean remainder commits, and
    // a crash AFTER the quarantine write but BEFORE the commit replays
    // the batch with the same id, overwriting the same dead letters
    // instead of duplicating them
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Ingest
    import org.apache.spark.sql.types.{StructType, LongType, DoubleType}
    val base = graft.Scratch.dir("quarantine-stream")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val (t, ck) = (s"$base/t", s"$base/ck")
    val schema = new StructType().add("k", LongType).add("v", DoubleType)
    @volatile var crashArmed = true
    def stage(name: String, rows: Seq[(Long, Double)]): Unit = {
      val tmp = s"$base/stage_$name"
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$in/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def drain(): Unit = {
      val q = Ingest.readStreamFiles(spark, s"$in/*.parquet", schema)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (bd: DataFrame, id: Long) =>
          Ingest.upsertParquet(t, Seq("k"), nBuckets = 2, keepVersions = 8,
            constraints = Seq("v_nonneg" -> "v >= 0"), quarantine = true)(
            bd, id)
          if (crashArmed && id >= 1L)
            sys.error("injected crash after quarantine commit window")
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stage("f0", Seq((1L, 1.0), (2L, -2.0)))
    drain()
    assert(Ingest.readUpsertTable(spark, t).select("k", "v")
      .as[(Long, Double)].collect().toMap === Map(1L -> 1.0))
    assert(Ingest.readQuarantine(spark, t).select("k").as[Long]
      .collect().toSeq === Seq(2L))
    // batch 1: commits inside foreachBatch, then the query dies —
    // the restart replays batch 1 with the same id (no-op merge,
    // idempotent dead letters)
    stage("f1", Seq((3L, 3.0), (4L, -4.0)))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    crashArmed = false
    drain()
    assert(Ingest.readUpsertTable(spark, t).select("k", "v")
      .as[(Long, Double)].collect().toMap === Map(1L -> 1.0, 3L -> 3.0))
    val dead = Ingest.readQuarantine(spark, t)
      .select(col("k"), col(Ingest.QuarantineBatchCol))
      .as[(Long, Long)].collect().toSet
    assert(dead === Set((2L, 0L), (4L, 1L)), s"dead letters: $dead")
    assert(Ingest.committedBatchIds(t) === Set(0L, 1L))
  }

  test("stream-stream join state is BOUNDED: watermark eviction measured") {
    // The 100 TB streaming claim, measured instead of argued: feed the
    // fixture time-ordered in 6 micro-batches through the outer join
    // with a real 1-minute watermark and read the engine's own state
    // metrics. Eviction must fire (numRowsRemoved > 0) and buffered
    // state must stay well under the total join-side volume — roughly
    // one batch's span plus the 1-hour join bound, never the corpus.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = fixtureEvents.sortBy(_.ts.getTime)
    val sides = evs.count(e =>
      e.event_type == "error" || e.event_type == "purchase").toLong
    val stream = MemoryStream[Ev]
    // state layout is fixed at query start: size stores to state volume
    // (the runStreamToTable discipline), restore batch sizing after
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try Streams.errorsWithRecentPurchasesOuter(
          stream.toDF(), watermark = "1 minute")
        .writeStream.format("memory").queryName("t_state_bound")
        .outputMode(OutputMode.Append()).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try
      evs.grouped(evs.size / 6 + 1).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    finally q.stop()
    val stateProgs = q.recentProgress.toSeq.flatMap(_.stateOperators)
    assert(stateProgs.nonEmpty, "no state operator progress reported")
    val maxTotal = stateProgs.map(_.numRowsTotal).max
    val removed = stateProgs.map(_.numRowsRemoved).sum
    assert(removed > 0L, "watermark never evicted join state")
    assert(maxTotal < (sides * 7) / 10,
      s"state peaked at $maxTotal rows vs $sides join-side rows — unbounded")
    spark.catalog.dropTempView("t_state_bound")
  }
}
