package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table transactions for the upsert format: N tables' batches
  * made visible all-or-nothing, without changing the single-table
  * protocol at all.
  *
  * The trick is the same one the sink's exactly-once replay uses —
  * idempotence plus roll-FORWARD:
  *
  *   1. an INTENT record (txn id + every (table, batchId) pair) is
  *      appended to the coordinator ledger `_txns` BEFORE any table
  *      commits;
  *   2. each table's batch commits through its ordinary sink — whose
  *      replay contract skips tables that already committed the
  *      batchId, so re-running a txn converges instead of
  *      double-applying;
  *   3. a COMPLETE record is appended last.
  *
  * A crash anywhere leaves a durable intent with a PREFIX of the
  * tables committed. Recovery is simply re-running [[commit]] with the
  * same parts (exactly what a restarted streaming `foreachBatch`
  * does): committed tables no-op, missing ones commit, COMPLETE lands.
  * There is no rollback path — batch data is already durable and the
  * per-table sink has no uncommit — so the isolation story is honest
  * and two-level:
  *
  *   - DIRECT reads (`readUpsertTable`) are READ-COMMITTED per table:
  *     between steps 2 and 3 they can see table A's new batch before
  *     table B's. Unchanged single-table semantics.
  *   - SNAPSHOT reads ([[snapshot]] / [[read]]) resolve every table
  *     AS-OF the batch recorded by the last COMPLETE txn — they can
  *     never observe a torn transaction, crashed or in-flight.
  *
  * Retention interplay: a snapshot reader is a time-travel reader, so
  * each table's `keepVersions` must cover the coordinator's lag (the
  * batches between the last COMPLETE txn and CURRENT). Same contract
  * as any as-of reader, stated here because the coordinator makes it
  * structural.
  *
  * Single coordinator writer by contract (like the single-writer
  * table contract); the ledger parse is torn-line-defensive like
  * `_commits`.
  */
object MultiCommit {

  // field separator inside one intent record (paths may hold commas;
  // U+001F is the ASCII unit separator, untypeable in a path by accident)
  private val Sep: Char = '\u001f'

  /** One table's share of a txn: the batch id it will commit, and the
    * write that commits it (a normal sink call — e.g.
    * `Ingest.upsertParquet(dir, …)(batchDf, batchId)`).
    */
  final case class TxnPart(tableDir: String, batchId: Long, write: () => Unit)

  private def ledger(coordDir: String)(implicit store: TableStore): String =
    store.child(coordDir, "_txns")

  /** Parsed ledger: (txnId, tables) intents and completed txn ids —
    * garbage/torn lines degrade to "not recorded", never a failure.
    */
  private def readTxns(coordDir: String)(implicit store: TableStore)
      : (Seq[(Long, Seq[(String, Long)])], Set[Long]) = {
    val lines = store.readLog(ledger(coordDir))
    val intents = lines.flatMap { l =>
      l.split("\t", -1) match {
        case Array("intent", id, parts) =>
          scala.util.Try {
            val ps = parts.split(Sep.toString, -1).toSeq.filter(_.nonEmpty)
              .map { p =>
                val i = p.lastIndexOf('=')
                (p.substring(0, i), p.substring(i + 1).toLong)
              }
            (id.toLong, ps)
          }.toOption.filter(_._2.nonEmpty)
        case _ => None
      }
    }
    val complete = lines.flatMap { l =>
      l.split("\t", -1) match {
        case Array("complete", id) => scala.util.Try(id.toLong).toOption
        case _ => None
      }
    }.toSet
    (intents, complete)
  }

  /** Commit `parts` as one transaction; returns the txn id. Re-running
    * with the same parts (crash recovery, streaming replay) adopts the
    * existing intent and converges — the call is idempotent end to
    * end. Table paths must not contain tab or U+001F (ledger framing).
    */
  def commit(coordDir: String, parts: Seq[TxnPart])
            (implicit store: TableStore): Long = {
    require(parts.nonEmpty, "MultiCommit.commit: no parts")
    require(parts.map(_.tableDir).distinct.size == parts.size,
      "MultiCommit.commit: duplicate tableDir in one txn")
    parts.foreach(p => require(
      !p.tableDir.contains("\t") && !p.tableDir.contains(Sep.toString),
      s"MultiCommit: unframeable table path ${p.tableDir}"))
    store.mkdirs(coordDir)
    val (intents, complete) = readTxns(coordDir)
    val key = parts.map(p => (p.tableDir, p.batchId))
    val txnId = intents.find(i => !complete.contains(i._1) && i._2 == key)
      .map(_._1) // adopt the crashed txn's id: this IS the recovery run
      .getOrElse {
        val id = intents.map(_._1).foldLeft(-1L)(math.max) + 1
        val framed = key.map { case (d, b) => s"$d=$b" }.mkString(Sep.toString)
        store.appendLog(ledger(coordDir), s"intent\t$id\t$framed")
        id
      }
    parts.foreach { p =>
      // the sink's replay contract makes an already-committed batchId
      // a no-op, so a recovery run only fills the gap
      if (!Ingest.committedBatchIds(p.tableDir).contains(p.batchId)) p.write()
      require(Ingest.committedBatchIds(p.tableDir).contains(p.batchId),
        s"MultiCommit: part for ${p.tableDir} returned without committing " +
          s"batch ${p.batchId} — miswired write")
    }
    store.appendLog(ledger(coordDir), s"complete\t$txnId")
    txnId
  }

  /** The last-complete-txn view: for every table any COMPLETE txn has
    * touched, the batchId recorded by the LATEST complete txn touching
    * it. In-flight / crashed txns are invisible here by construction.
    */
  def snapshot(coordDir: String)
              (implicit store: TableStore): Map[String, Long] = {
    val (intents, complete) = readTxns(coordDir)
    intents.filter(i => complete.contains(i._1)).sortBy(_._1)
      .foldLeft(Map.empty[String, Long]) { case (m, (_, ps)) => m ++ ps }
  }

  /** Read one table at the coordinator snapshot — the all-or-nothing
    * read. Fails loudly for a table no complete txn has touched.
    */
  def read(spark: SparkSession, coordDir: String, tableDir: String)
          (implicit store: TableStore): DataFrame = {
    val snap = snapshot(coordDir)
    val b = snap.getOrElse(tableDir, throw new IllegalArgumentException(
      s"MultiCommit.read: no complete txn covers $tableDir " +
        s"(covered: ${snap.keys.toSeq.sorted.mkString(",")})"))
    Ingest.readUpsertTable(spark, tableDir, Some(b))
  }
}
