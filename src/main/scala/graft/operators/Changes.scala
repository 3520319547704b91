package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application and slowly-changing-dimension
  * history — the warehouse-maintenance surface a production tier needs
  * around the reference's OLTP store (the reference provisions a plain
  * MySQL tier, `mysql-persistent-template.json`; replicating its tables
  * into an analytics lake means applying its binlog as a changelog and
  * keeping dimension history).
  *
  * Scale shape: both operators are ONE hash shuffle on the business
  * key followed by a per-key ordered window — no self-join, no global
  * sort. At 100 TB of changelog the shuffle is the unavoidable
  * key-grouping; AQE absorbs hot-key skew (a key's history lands in
  * one partition, so per-key state is bounded by that key's change
  * count, not corpus size). `row_number`/`lead` stay inside
  * whole-stage codegen.
  */
object Changes {

  /** Apply a CDC changelog to produce the current snapshot: keep each
    * key's latest row by `ordering`, dropping keys whose final
    * operation is a delete. The classic "compact the binlog" operator —
    * upserts win by recency, deletes tombstone the key.
    *
    * @param log      changelog rows (full-row images)
    * @param keys     business key columns
    * @param ordering change-sequence columns (combined must be unique
    *                 per key for a deterministic winner)
    * @param opCol    operation column; rows where it equals `deleteOp`
    *                 are tombstones
    */
  def cdcApply(log: DataFrame, keys: Seq[String], ordering: Seq[Column],
               opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering.map(_.desc): _*)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= deleteOp)
      .drop("_rn")
  }

  /** SCD Type-2 history: every change becomes a versioned row with a
    * [valid_from, valid_to) interval; the key's last non-delete version
    * is flagged current. A delete closes the prior interval and emits
    * its own tombstone version (is_current = false) so the history
    * records WHEN the key died — the standard "type 2 with deletes"
    * shape.
    *
    * @param tsCol    the change timestamp that bounds validity
    * @param ordering full change order (ties in `tsCol` broken by the
    *                 remaining columns)
    */
  def scd2(log: DataFrame, keys: Seq[String], tsCol: String,
           ordering: Seq[Column], opCol: String = "op",
           deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
    log
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        col("valid_to").isNull && col(opCol) =!= deleteOp)
  }

  /** The synthetic changelog both queries share: each order is a
    * change event against its customer's "latest order" state —
    * sequence = (o_orderdate, o_orderkey), tombstone when the order
    * status is 'F' (closed). Derived, not invented: every column comes
    * from the driver's `orders` fixture so the DuckDB oracle can build
    * the identical log.
    */
  private def orderChangelog(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
      col("o_totalprice"), col("o_orderpriority"),
      when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"))

  /** CDC compaction: latest surviving state per customer. */
  val qCdcApply: QuerySpec = QuerySpec(
    "q_cdc_apply",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice, o_orderpriority
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY o_custkey"""),
    (spark, dir) => {
      cdcApply(orderChangelog(spark, dir), keys = Seq("o_custkey"),
        ordering = Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  /** SCD2 history over the same changelog: versioned validity
    * intervals per customer, current-flagged.
    */
  val qScd2: QuerySpec = QuerySpec(
    "q_scd2",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders)
      SELECT o_custkey,
        row_number() OVER w AS version,
        o_orderdate AS valid_from,
        lead(o_orderdate, 1) OVER w AS valid_to,
        (lead(o_orderdate, 1) OVER w IS NULL AND op <> 'D') AS is_current,
        round(o_totalprice, 2) AS o_totalprice
      FROM log
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, version"""),
    (spark, dir) => {
      scd2(orderChangelog(spark, dir), keys = Seq("o_custkey"),
        tsCol = "o_orderdate",
        ordering = Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("version"), col("valid_from"),
          col("valid_to"), col("is_current"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_custkey", "version")
    })

  /** The changelog through the STREAMING engine: orders as a file
    * stream, per-key winner state (`Streams.cdcLatestState`), update
    * mode. Each key's final emission — the row with its maximum
    * (o_orderdate, o_orderkey), monotone across updates — is the
    * compacted snapshot; tombstoned keys drop. Shares q_cdc_apply's
    * oracle, so streaming-CDC ≡ batch-CDC is hash-checked.
    */
  val qStreamCdc: QuerySpec = QuerySpec(
    "q_stream_cdc",
    qCdcApply.oracle,
    (spark, dir) => {
      val log = graft.sources.Ingest.readStreamFiles(
          spark, s"$dir/orders.*", Tables.orders)
        .select(
          col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"), col("o_orderpriority"),
          when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U"))
            .as("op"))
      val sunk = EventOps.runStreamToTable(
        graft.streaming.Streams.cdcLatestState(log), mode = "update")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      sunk.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1 && col("op") =!= "D")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  /** Pre-reduce a changelog chunk to its latest change per customer
    * (max_by on (o_orderdate, o_orderkey) — the sink's uniqueness
    * contract) carrying `_deleted = (op = 'D')` — the per-batch shape
    * both table-format CDC rows feed to the sink.
    */
  private def latestChangePerCustomer(batch: DataFrame): DataFrame =
    batch.groupBy("o_custkey")
      .agg(max_by(
        struct(col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"), col("o_orderpriority"), col("op")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderdate").as("o_orderdate"),
        col("m.o_orderkey").as("o_orderkey"),
        col("m.o_totalprice").as("o_totalprice"),
        col("m.o_orderpriority").as("o_orderpriority"),
        (col("m.op") === "D").as("_deleted"))

  /** The changelog applied to the TABLE FORMAT by the streaming
    * engine — the composition of [[qCdcApply]] (what a compacted
    * changelog means) with the tombstone-aware upsert sink (how a
    * table applies one exactly-once). Orders arrive as 4 date-range
    * file micro-batches; each batch pre-reduces to its latest change
    * per customer (max_by on (o_orderdate, o_orderkey) — the sink's
    * uniqueness contract) carrying `_deleted = (op = 'D')`, and
    * [[graft.sources.Ingest.upsertParquet]] MERGEs it: upserts replace,
    * tombstones drop the key from its bucket. Date-RANGE chunking means
    * later batches strictly dominate, so "latest batch wins per key"
    * composes with the in-batch argmax to the global argmax — whose
    * surviving (op ≠ 'D') rows are exactly q_cdc_apply's compacted
    * snapshot, shared verbatim as the oracle. A customer deleted by a
    * late tombstone is ABSENT from the final table read, not filtered
    * by this query — the delete physically happened in the format.
    */
  val qStreamCdcTable: QuerySpec = QuerySpec(
    "q_stream_cdc_table",
    qCdcApply.oracle, // shared — table-applied CDC must equal batch CDC
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("stream-cdc-table") // tmpfs-backed
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val table = s"$base/table"
      val log = orderChangelog(spark, dir)
      val n = 4
      // o_orderdate is a TIMESTAMP in the fixture; chunk on its DATE
      val b = log.agg(min(to_date(col("o_orderdate"))),
        max(to_date(col("o_orderdate")))).head() // 2 scalars
      val (d0, d1) = (b.getDate(0).toLocalDate, b.getDate(1).toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
      def writer(batch: DataFrame, id: Long): Unit =
        Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
          deleteCol = Some("_deleted"))(latestChangePerCustomer(batch), id)
      val src = Ingest.readStreamFiles(spark, s"$in/*.parquet",
        org.apache.spark.sql.types.StructType.fromDDL(
          "o_custkey BIGINT, o_orderdate TIMESTAMP, o_orderkey BIGINT, " +
            "o_totalprice DOUBLE, o_orderpriority STRING, op STRING"),
        basePath = Some(in))
      // micro-batch jobs are batch-sized: run the drain at streaming
      // state sizing
      EventOps.withStreamSizing(spark) {
        // date-RANGE buckets (value-based, not row-based): equal
        // dates can never split a chunk, so cross-batch recency is
        // exactly batch order; chunks staged once per fixture (r16),
        // copied into this invocation's fresh source dir
        val parts = EventOps.stagedChunks(spark, dir, "stream-cdc", n)(i =>
          log.filter(expr(
            s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * $n DIV $span")
            === i))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(writer).start()
        try (0 until n).foreach { i =>
          java.nio.file.Files.copy(parts(i),
            java.nio.file.Paths.get(s"$in/c$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          q.processAllAvailable() // each date-range chunk = one batch
        } finally q.stop()
      }
      Ingest.readUpsertTable(spark, table)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  /** Fold the [[orderChangelog]] into a FRESH upsert table under
    * `base` as `n` date-range batches (the [[qStreamCdcTable]]
    * chunking — value-based buckets, so cross-batch recency is exactly
    * batch order), tombstones applied, every version retained. Shared
    * by the table-format rows that need a realistically-built table.
    *
    * OPTIMIZATION r16 (guide §1.2 — don't measure fixture setup): on
    * the LOCAL store the fold runs ONCE per (session, fixture, shape)
    * into a pristine tree and each call receives a fresh
    * [[graft.sources.TableCopy]] link-copy to mutate — the mutating
    * bench rows (restore/WAP/DML/compact/rebucket/clone/colmap) were
    * paying the 2–4-batch churn fold per rep (~6–9 s each) around a
    * measured operator of 1–3 s. Non-local stores (the object-store
    * twin) keep the direct fold — their builds memoize at the call
    * site.
    */
  private val pristineCdcMemo =
    graft.Memo[(SparkSession, String, Int, Boolean, Seq[String], Int), String]()

  private def buildCdcUpsertTable(spark: SparkSession, dir: String,
                                  base: String, n: Int,
                                  changeFeed: Boolean,
                                  sortCols: Seq[String] = Nil,
                                  filesPerBucket: Int = 4)
                                 (implicit tstore: graft.sources.TableStore)
                                 : String = {
    // wipe through the SAME seam the build uses: a raw filesystem rm
    // would leave a non-POSIX store's control objects (CURRENT,
    // ledger, _meta) alive behind the deleted data, and the rebuild
    // would replay against a ledger for data that no longer exists
    tstore.deleteTree(base)
    val table = s"$base/table"
    if (tstore eq graft.sources.TableStore.local) {
      val pristine = pristineCdcMemo.getOrElseUpdate(
        (spark, dir, n, changeFeed, sortCols, filesPerBucket), {
          val p = graft.Scratch.dir("cdc-pristine") + "/table"
          foldCdcUpsertTable(spark, dir, p, n, changeFeed, sortCols,
            filesPerBucket)
          p
        })
      graft.sources.TableCopy.copyTree(pristine, table)
    } else
      foldCdcUpsertTable(spark, dir, table, n, changeFeed, sortCols,
        filesPerBucket)
    table
  }

  /** The actual fold body of [[buildCdcUpsertTable]], writing the
    * table at exactly `table`.
    */
  private def foldCdcUpsertTable(spark: SparkSession, dir: String,
                                 table: String, n: Int,
                                 changeFeed: Boolean,
                                 sortCols: Seq[String],
                                 filesPerBucket: Int)
                                (implicit tstore: graft.sources.TableStore)
                                : Unit = {
    import graft.sources.Ingest
    val log = orderChangelog(spark, dir)
    val bounds = log.agg(min(to_date(col("o_orderdate"))),
      max(to_date(col("o_orderdate")))).head() // 2 scalars
    val (d0, d1) = (bounds.getDate(0).toLocalDate, bounds.getDate(1).toLocalDate)
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
    // batch-sized merge jobs, not corpus-sized
    EventOps.withStreamSizing(spark) {
      (0 until n).foreach { i =>
        val chunk = log.filter(expr(
          s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * $n DIV $span") === i)
        Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
          keepVersions = n, deleteCol = Some("_deleted"),
          changeFeed = changeFeed, sortCols = sortCols,
          filesPerBucket = filesPerBucket)(latestChangePerCustomer(chunk), i.toLong)
      }
    }
  }

  /** The SAME CDC fold and read, run end-to-end against the STRICT
    * object-store control plane ([[graft.sources.ObjectTableStore]]:
    * no append, no rename, no hard links, CAS-only pointer swaps) —
    * the oracle-gated twin of the IngestObjectStoreSpec battery. The
    * final table state must equal the compacted changelog
    * ([[qCdcApply]]'s DuckDB oracle, shared verbatim): a format that
    * silently relied on any POSIX crutch in the merge / commit /
    * retention path would diverge or fail here. Everything else about
    * the fold (date-range batches, per-batch winners, tombstones,
    * change feed) is [[qStreamCdcTable]]'s.
    */
  /** Memoized object-store CDC fold: built ONCE per (session, fixture)
    * like [[sharedCdcTable]] — the copy-based control plane (no hard
    * links: every untouched bucket byte-copies forward) makes this the
    * single most expensive build in the suite, and re-folding it per
    * bench rep measured harness waste, not engine signal (VERDICT r12
    * item 4). The store INSTANCE memoizes with the path: its control
    * objects (CURRENT, ledger, `_meta`) live only in that instance's
    * in-process map, so reads must go through the same seam that
    * built it. Bench charges the build to `objectstore_cdc_build`.
    */
  private val objStoreMemo =
    graft.Memo[(SparkSession, String),
      (graft.sources.ObjectTableStore, String)]()

  def sharedObjectStoreCdcTable(spark: SparkSession, dir: String)
      : (graft.sources.ObjectTableStore, String) =
    objStoreMemo.getOrElseUpdate((spark, dir), {
      implicit val objStore: graft.sources.ObjectTableStore =
        new graft.sources.ObjectTableStore
      val t = buildCdcUpsertTable(spark, dir,
        graft.Scratch.dir("cdc-objstore"), n = 4, changeFeed = true)
      (objStore, t)
    })

  val qUpsertObjectStore: QuerySpec = QuerySpec(
    "q_upsert_objectstore",
    qCdcApply.oracle,
    (spark, dir) => {
      val (st, t) = sharedObjectStoreCdcTable(spark, dir)
      implicit val objStore: graft.sources.TableStore = st
      graft.sources.Ingest.readUpsertTable(spark, t)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  /** One CDC-built change-feed table per fixture dir, shared by every
    * READ-ONLY table-format consumer ([[qTableCdf]], [[qCdfMv]],
    * [[qUpsertLookup]]) — the build-once/consume-many discipline
    * (VERDICT r2): the table IS an index-like artifact, and a
    * production deployment folds the changelog once, not once per
    * query. Mutating rows ([[qUpsertRebucket]]) build their own copy.
    * Bench charges the build to the named `cdc_table_build` setup
    * entry.
    */
  private val cdcTableMemo = graft.Memo[(SparkSession, String), String]()

  def sharedCdcTable(spark: SparkSession, dir: String): String =
    cdcTableMemo.getOrElseUpdate((spark, dir),
      buildCdcUpsertTable(spark, dir, graft.Scratch.dir("cdc-shared"),
        n = 4, changeFeed = true))

  /** One SORT-CLUSTERED churned table per fixture dir (sortCols =
    * o_orderdate, no feed), shared by the READ-ONLY manifest consumers
    * [[qUpsertStatsPrune]] and [[qUpsertMetaCount]] — per-rep rebuilds
    * measured the 4-batch churn fold (~10 s of an 11 s median), not
    * the metadata reads those rows exist to time (VERDICT r15 item 3).
    * Mutating rows (OPTIMIZE, ZORDER, COMPACT) keep building their own
    * copies. Bench charges the build to `sorted_table_build`.
    */
  private val sortedTableMemo = graft.Memo[(SparkSession, String), String]()

  def sharedSortedTable(spark: SparkSession, dir: String): String =
    sortedTableMemo.getOrElseUpdate((spark, dir),
      buildCdcUpsertTable(spark, dir, graft.Scratch.dir("cdc-sorted"),
        n = 4, changeFeed = false, sortCols = Seq("o_orderdate")))

  /** The table format's CHANGE-DATA-FEED read back out — CDC in, CDC
    * out. The same 4 date-range changelog batches as
    * [[qStreamCdcTable]] fold into an upsert table written with
    * `changeFeed = true`; the query returns every change record the
    * format captured (`insert` / `update_preimage` / `update_postimage`
    * / `delete`, full rows + `_batch_id`). The DuckDB oracle derives
    * the identical feed from first principles: per (customer, batch)
    * winners (the in-batch argmax the sink's pre-reduce produces), the
    * previous winner via `lag` over the customer's batch sequence (the
    * table's pre-state — a customer's row after batch b is exactly its
    * batch-b winner when op='U', absent when 'D'), and the
    * classification matrix — winner D over a live row → delete with
    * the OLD row as image; U over live → pre+post pair; U over
    * dead/absent → insert; D over absent → nothing. A hash match here
    * proves the feed is byte-faithful to what the merges actually did,
    * which is the property an incremental MV/replica consumer depends
    * on. Scale: feed capture joins batch keys (broadcast) against
    * touched buckets only — cost rides the merge's own O(touched), and
    * the read is a parquet scan of the retained versions' `_changes`
    * dirs.
    */
  val qTableCdf: QuerySpec = QuerySpec(
    "q_table_cdf",
    Some("""WITH bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS d0,
               max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
      log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
          CAST(date_diff('day', d0, CAST(o_orderdate AS DATE)) AS BIGINT)
            * 4 // (date_diff('day', d0, d1) + 1) AS b
        FROM orders, bounds),
      winners AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_custkey, b
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM log)
        WHERE rn = 1),
      w2 AS (
        SELECT *,
          lag(op) OVER cw AS prev_op,
          lag(o_orderdate) OVER cw AS prev_date,
          lag(o_orderkey) OVER cw AS prev_key,
          lag(o_totalprice) OVER cw AS prev_price,
          lag(o_orderpriority) OVER cw AS prev_prio
        FROM winners WINDOW cw AS (PARTITION BY o_custkey ORDER BY b)),
      changes AS (
        SELECT b AS _batch_id, 'delete' AS _change_type, o_custkey,
          prev_date AS o_orderdate, prev_key AS o_orderkey,
          prev_price AS o_totalprice, prev_prio AS o_orderpriority
        FROM w2 WHERE op = 'D' AND prev_op = 'U'
        UNION ALL
        SELECT b, 'update_preimage', o_custkey, prev_date, prev_key,
          prev_price, prev_prio
        FROM w2 WHERE op = 'U' AND prev_op = 'U'
        UNION ALL
        SELECT b, 'update_postimage', o_custkey, o_orderdate, o_orderkey,
          o_totalprice, o_orderpriority
        FROM w2 WHERE op = 'U' AND prev_op = 'U'
        UNION ALL
        SELECT b, 'insert', o_custkey, o_orderdate, o_orderkey,
          o_totalprice, o_orderpriority
        FROM w2 WHERE op = 'U' AND (prev_op IS NULL OR prev_op = 'D'))
      SELECT _batch_id, _change_type, o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice, o_orderpriority
      FROM changes ORDER BY _batch_id, o_custkey, _change_type"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val n = 4
      val table = sharedCdcTable(spark, dir)
      Ingest.readTableChanges(spark, table, 0L, (n - 1).toLong)
        .select(col("_batch_id"), col("_change_type"), col("o_custkey"),
          col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("_batch_id", "o_custkey", "_change_type")
    })

  /** Point lookup through the table format's hash-bucket layout — the
    * read path the layout exists for. The CDC-built table (same fold
    * as [[qTableCdf]]) is probed for 4 customer keys (one
    * deliberately absent); [[graft.sources.Ingest.lookupUpsertTable]]
    * hashes the probe with the table's pinned bucket function and
    * scans ONLY those buckets. The pruning is ENFORCED inside the
    * query — it `require`s the pruned scan's file list is strictly
    * smaller than the full snapshot's, so the row fails loudly if the
    * bucket math ever stops pruning — while the DuckDB oracle
    * hash-checks the data: the compacted-changelog snapshot restricted
    * to the probe keys (the 4-batch fold equals global compaction —
    * the [[qStreamCdcTable]] argument). Scale: a k-key lookup reads
    * O(k) buckets of a table of ANY size; the only driver-side values
    * are ≤ nBuckets small ints.
    */
  val qUpsertLookup: QuerySpec = QuerySpec(
    "q_upsert_lookup",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice, o_orderpriority
      FROM ranked
      WHERE rn = 1 AND op <> 'D'
        AND o_custkey IN (1, 2, 3, 999999999)
      ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedCdcTable(spark, dir)
      import spark.implicits._
      val probe = Seq(1L, 2L, 3L, 999999999L).toDF("o_custkey")
      val pruned = Ingest.lookupUpsertTable(spark, table, probe)
      val nPruned = pruned.inputFiles.length
      val nFull = Ingest.readUpsertTable(spark, table).inputFiles.length
      require(nPruned < nFull,
        s"bucket pruning did not engage: lookup scans $nPruned of $nFull files")
      pruned.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  /** Widen-only SCHEMA EVOLUTION through the table format, end-to-end:
    * batch 0 writes orders WITHOUT `o_orderpriority`; batches 1–3
    * append it. The sink widens the pinned `_schema` (old files
    * surface the new column as null — history is never rewritten), so
    * customers whose latest change landed in batch 0 read a NULL
    * priority, bucketed here as '(pre-widening)'. The DuckDB oracle
    * derives the same thing from first principles: the global
    * per-customer winner, with the priority nulled exactly when the
    * winner's date-bucket is 0. Money sums run in exact integer cents
    * so engine summation order can't nudge the hash.
    */
  val qUpsertEvolve: QuerySpec = QuerySpec(
    "q_upsert_evolve",
    Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
          CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
      log AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          (date_diff('day', b.d0, CAST(o_orderdate AS DATE)) * 4)
            // (date_diff('day', b.d0, b.d1) + 1) AS bkt
        FROM orders, b),
      win AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM log)
        WHERE rn = 1)
      SELECT CASE WHEN bkt = 0 THEN '(pre-widening)'
          ELSE o_orderpriority END AS prio,
        count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend
      FROM win GROUP BY 1 ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.{Ingest, Tables}
      val base = graft.Scratch.dir("upsert-evolve") // tmpfs-backed
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      val table = s"$base/table"
      val log = Tables.load(spark, dir, "orders").select(
        col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderpriority"))
      val bounds = log.agg(min(to_date(col("o_orderdate"))),
        max(to_date(col("o_orderdate")))).head() // 2 scalars
      val (d0, d1) = (bounds.getDate(0).toLocalDate, bounds.getDate(1).toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
      def latest(df: DataFrame): DataFrame = {
        val payload = df.columns.filterNot(_ == "o_custkey")
        df.groupBy("o_custkey")
          .agg(max_by(struct(payload.map(col): _*),
            struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
          .select(col("o_custkey") +: payload.map(c => col(s"m.$c").as(c)): _*)
      }
      EventOps.withStreamSizing(spark) {
        (0 until 4).foreach { i =>
          val chunk = log.filter(expr(
            s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * 4 DIV $span") === i)
          // the first wave predates the o_orderpriority column
          val shaped = if (i == 0) chunk.drop("o_orderpriority") else chunk
          Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8)(
            latest(shaped), i.toLong)
        }
      }
      Ingest.readUpsertTable(spark, table)
        .groupBy(coalesce(col("o_orderpriority"), lit("(pre-widening)"))
          .as("prio"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("double") / 100).as("spend"))
        .orderBy("prio")
    })

  /** Incremental materialized-view maintenance for a per-customer
    * order summary: the standing aggregate (orders with key ≢0 mod 10)
    * and the new batch (keys ≡0 mod 10) are PARTIALLY aggregated
    * independently, then merged by re-aggregating the two partial
    * states — count adds, sum adds, min/max fold. The oracle is the
    * direct full recompute, so the hash match IS the proof that the
    * merge path equals recomputation (the delta-maintenance contract).
    *
    * Money sums run in exact integer cents (LONG micro-sums, the
    * k-means discipline) so merge order can't nudge an FP boundary;
    * the single divide-by-100 happens once at the end in both engines.
    *
    * Scale shape: this is the mergeable-partial-agg pattern Spark's own
    * hash aggregate uses, lifted to table level — at 100 TB the
    * standing side is a stored summary (|customers| rows) and the cost
    * per refresh is one scan + one hash agg of the DELTA plus a merge
    * keyed on the group key; the full fact table is never re-scanned.
    */
  val qIncrementalAgg: QuerySpec = QuerySpec(
    "q_incremental_agg",
    Some("""SELECT o_custkey, count(*) AS n_orders,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
          / 100 AS total_spend,
        min(o_orderdate) AS first_order, max(o_orderdate) AS last_order
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val standing =
        orderSummaryPartial(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0))
      val delta =
        orderSummaryPartial(orders.filter(pmod(col("o_orderkey"), lit(10)) === 0))
      orderSummaryMerge(standing.unionAll(delta))
        .select(col("o_custkey"), col("n_orders"),
          (col("cents").cast("double") / 100).as("total_spend"),
          col("first_order"), col("last_order"))
        .orderBy("o_custkey")
    })

  /** Partial per-customer order summary over (o_custkey, o_orderdate,
    * cents) rows — the map-side state of the incremental view. */
  def orderSummaryPartial(df: DataFrame): DataFrame =
    df.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"), sum("cents").as("cents"),
      min("o_orderdate").as("first_order"),
      max("o_orderdate").as("last_order"))

  /** Merge any number of partial summaries per key: count/sum add,
    * min/max fold — associative and commutative, so refresh order and
    * batch boundaries can't change the result. */
  def orderSummaryMerge(parts: DataFrame): DataFrame =
    parts.groupBy("o_custkey").agg(
      sum("n_orders").as("n_orders"), sum("cents").as("cents"),
      min("first_order").as("first_order"),
      max("last_order").as("last_order"))

  /** The same materialized view maintained BY THE STREAMING ENGINE:
    * orders arrive as a file stream, the per-customer summary lives in
    * streaming aggregation state (count/sum/min/max — exactly the
    * mergeable shape [[qIncrementalAgg]] proves), and the AvailableNow
    * drain's final state must hash-match the batch oracle, shared
    * verbatim. Batch delta-merge and streaming state are two routes to
    * one contract; both rows pin it.
    *
    * Scale: streaming state is |customers| rows keyed on o_custkey —
    * the state store shuffles arriving orders once per micro-batch;
    * cents stay exact LONGs so replay/merge order can't move the sum.
    */
  val qStreamMv: QuerySpec = QuerySpec(
    "q_stream_mv",
    qIncrementalAgg.oracle, // shared — streaming MV must equal batch
    (spark, dir) => {
      val ord = graft.sources.Ingest.readStreamFiles(
          spark, s"$dir/orders.*", Tables.orders)
        .select(col("o_custkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val agg = orderSummaryPartial(ord)
      EventOps.runStreamToTable(agg)
        .select(col("o_custkey"), col("n_orders"),
          (col("cents").cast("double") / 100).as("total_spend"),
          col("first_order"), col("last_order"))
        .orderBy("o_custkey")
    })

  /** Re-bucketing the table format under load — THE maintenance pass a
    * hash-bucketed table needs as it grows (bucket count must track
    * table size: merges cost O(touched buckets), lookups O(k)
    * buckets). The CDC-built table (same 4-batch fold as
    * [[qTableCdf]], 8 buckets) is rewritten by
    * [[graft.sources.Ingest.rebucketUpsertTable]] to 16 buckets as a
    * new GENERATION of the same committed batch — no new batchId, so a
    * streaming writer's ids can never collide with maintenance. The
    * row enforces the two physical contracts in-query (the
    * per-priority aggregate is identical before/after — compared in
    * exact integer cents; and a post-rebucket point lookup still
    * prunes to fewer files than the full snapshot) while DuckDB
    * hash-checks the data: the aggregate of the compacted changelog.
    */
  val qUpsertRebucket: QuerySpec = QuerySpec(
    "q_upsert_rebucket",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend,
        true AS rebucket_preserves, true AS lookup_pruned
      FROM ranked WHERE rn = 1 AND op <> 'D'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = buildCdcUpsertTable(spark, dir,
        graft.Scratch.dir("upsert-rebucket"), n = 4, changeFeed = false)
      // 5-row aggregate checksum, taken BEFORE the rewrite (the
      // superseded generation's files are swept by the rebucket, so
      // a lazy frame over them must not outlive it)
      def aggOf(df: DataFrame): DataFrame =
        df.groupBy(col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      val beforeAgg = aggOf(Ingest.readUpsertTable(spark, table))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      Ingest.rebucketUpsertTable(spark, table, 16)
      val after = Ingest.readUpsertTable(spark, table)
      val afterAgg = aggOf(after)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val preserved = beforeAgg == afterAgg
      import spark.implicits._
      val probe = Seq(1L, 2L, 3L).toDF("o_custkey")
      val pruned = Ingest.lookupUpsertTable(spark, table, probe)
      val lookupPruned = pruned.inputFiles.length < after.inputFiles.length
      require(preserved && lookupPruned,
        s"rebucket contract broken: preserved=$preserved pruned=$lookupPruned")
      aggOf(after)
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(preserved).as("rebucket_preserves"),
          lit(lookupPruned).as("lookup_pruned"))
        .orderBy("prio")
    })

  /** RESTORE as a first-class table op
    * ([[graft.sources.Ingest.restoreUpsertTable]]): roll the CDC-built
    * table back to its batch-1 snapshot AS A NEW COMMIT, then verify
    * the three contracts that make restore operationally safe —
    * (a) the post-restore CURRENT read is row-identical to the as-of-1
    * read (compared in exact integer cents), (b) the restore batch's
    * CHANGE-FEED slice is exactly the diff between the pre-restore and
    * target states (upsert rows = changed/re-inserted, deletes = keys
    * added after batch 1) so every feed consumer converges at diff
    * cost, and (c) history survives: the pre-restore batches are still
    * described by DESCRIBE HISTORY. DuckDB hash-checks the restored
    * state itself: the fold of chunks 0–1 of the date-partitioned
    * changelog. Scale: the write rides the diff (only buckets holding
    * changed keys rewrite) — restoring a 0.1%-churn day on a 100-TB
    * table writes ~0.1% of buckets; crash safety is the sink
    * protocol's, already failpoint-swept.
    */
  val qUpsertRestore: QuerySpec = QuerySpec(
    "q_upsert_restore",
    Some("""WITH bounds AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS d0,
          date_diff('day', CAST(min(o_orderdate) AS DATE),
            CAST(max(o_orderdate) AS DATE)) + 1 AS span
        FROM orders),
      log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
          CAST(date_diff('day', (SELECT d0 FROM bounds),
            CAST(o_orderdate AS DATE)) AS BIGINT) * 4
            // (SELECT span FROM bounds) AS b
        FROM orders),
      early AS (SELECT * FROM log WHERE b <= 1),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM early)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend,
        true AS restore_matches_asof, true AS feed_slice_is_diff,
        true AS history_survives
      FROM ranked WHERE rn = 1 AND op <> 'D'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = buildCdcUpsertTable(spark, dir,
        graft.Scratch.dir("upsert-restore"), n = 4, changeFeed = true)
      def canon(df: DataFrame): Set[(Long, Long, Long)] =
        df.select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = canon(Ingest.readUpsertTable(spark, table, Some(1L)))
      val pre = canon(Ingest.readUpsertTable(spark, table))
      val restoreBatch = Ingest.restoreUpsertTable(spark, table, 1L,
        keepVersions = 5)
      val after = Ingest.readUpsertTable(spark, table)
      val matchesAsOf = canon(after) == want
      // the feed slice must be exactly the diff, as upserts + deletes
      val slice = Ingest.readTableChanges(spark, table,
        restoreBatch, restoreBatch)
      val sliceUps = slice
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sliceDelKeys = slice.filter(col("_change_type") === "delete")
        .select("o_custkey").collect().map(_.getLong(0)).toSet
      val feedIsDiff = sliceUps == (want -- pre) &&
        sliceDelKeys == pre.map(_._1) -- want.map(_._1)
      // pre-restore history survives in the ledger (0..3 + the restore
      // batch; the cheap check — per-batch recounts belong to
      // q_upsert_history, not here)
      val historySurvives =
        Ingest.committedBatchIds(table) == Set(0L, 1L, 2L, 3L, restoreBatch)
      require(matchesAsOf && feedIsDiff && historySurvives,
        s"restore contract broken: asof=$matchesAsOf feed=$feedIsDiff " +
          s"history=$historySurvives")
      after.groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(matchesAsOf).as("restore_matches_asof"),
          lit(feedIsDiff).as("feed_slice_is_diff"),
          lit(historySurvives).as("history_survives"))
        .orderBy("prio")
    })

  /** Multi-table atomic commit as a query surface
    * ([[graft.sources.MultiCommit]]): two derived tables (per-priority
    * and per-status summaries of orders) are committed through the
    * coordinator in two txns, then a third txn TEARS mid-flight (the
    * priority table commits garbage, the status table's write dies) —
    * and the row reads through the COORDINATOR SNAPSHOT, which must
    * still serve the last complete txn's pair: the clean full-orders
    * fold DuckDB recomputes. The in-query contract pins the isolation
    * the snapshot provides: the direct (read-committed) read of the
    * priority table DOES see the torn txn's garbage while the
    * snapshot read does not. Scale: the coordinator adds two ledger
    * appends per txn — visibility cost is O(txns), data cost stays
    * the sink's.
    */
  val qMultiCommit: QuerySpec = QuerySpec(
    "q_multi_commit",
    Some("""SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend,
        (SELECT count(*) FROM orders) AS n_total,
        true AS snapshot_isolated
      FROM orders GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.MultiCommit
      import graft.sources.MultiCommit.TxnPart
      import graft.sources.Ingest
      val base = graft.Scratch.dir("multi-commit")
      val (pa, pb, coord) = (s"$base/prio", s"$base/status", s"$base/coord")
      val orders = Tables.load(spark, dir, "orders")
      def prioFold(half: Int): DataFrame = orders
        .filter(col("o_orderkey") % 2 <= half)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      def statusFold(half: Int): DataFrame = orders
        .filter(col("o_orderkey") % 2 <= half)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"))
      // one bucket each (r17): prio has ≤5 groups and status ≤3 at ANY
      // scale — group count does not grow with data, so extra buckets
      // only multiply each txn's commit write partitions
      def upPrio(b: Long, df: DataFrame): Unit =
        Ingest.upsertParquet(pa, Seq("prio"), nBuckets = 1,
          keepVersions = 8)(df, b)
      def upStatus(b: Long, df: DataFrame): Unit =
        Ingest.upsertParquet(pb, Seq("status"), nBuckets = 1,
          keepVersions = 8)(df, b)
      // txn 0: half the orders; txn 1: the full fold (overwrite upserts)
      MultiCommit.commit(coord, Seq(
        TxnPart(pa, 0L, () => upPrio(0L, prioFold(0))),
        TxnPart(pb, 0L, () => upStatus(0L, statusFold(0)))))
      MultiCommit.commit(coord, Seq(
        TxnPart(pa, 1L, () => upPrio(1L, prioFold(1))),
        TxnPart(pb, 1L, () => upStatus(1L, statusFold(1)))))
      // txn 2 tears: garbage lands in the priority table, the status
      // part dies before committing — and is never recovered
      val garbage = prioFold(1).withColumn("n", lit(-1L))
      try MultiCommit.commit(coord, Seq(
        TxnPart(pa, 2L, () => upPrio(2L, garbage)),
        TxnPart(pb, 2L, () => sys.error("simulated crash"))))
      catch { case e: RuntimeException
        if e.getMessage.contains("simulated crash") => () }
      // direct read is read-committed (sees the garbage)…
      val directSeesTear = Ingest.readUpsertTable(spark, pa)
        .filter(col("n") === -1L).count() > 0
      // …the coordinator snapshot does not
      val snapA = MultiCommit.read(spark, coord, pa)
      val snapClean = snapA.filter(col("n") === -1L).count() == 0
      val isolated = directSeesTear && snapClean
      require(isolated, s"snapshot isolation broken: " +
        s"direct=$directSeesTear snapClean=$snapClean")
      val nTotal = MultiCommit.read(spark, coord, pb)
        .agg(sum("n")).head().getLong(0)
      snapA.select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(nTotal).as("n_total"),
          lit(isolated).as("snapshot_isolated"))
        .orderBy("prio")
    })

  /** Zero-copy CLONE as a query surface
    * ([[graft.sources.Ingest.cloneUpsertTable]]): the CDC-built table
    * is cloned, the SOURCE then moves on (a further batch), and the
    * row reads THE CLONE — whose state must still be the fold at clone
    * time, which is what DuckDB recomputes. In-query contracts pin the
    * independence: the clone's aggregate is taken AFTER the source
    * advanced (a shared file mutated in place would change it), and
    * the source's post-advance state differs from the clone's.
    * Scale: the clone itself moves zero data bytes under POSIX (hard
    * links) and server-side copies elsewhere — the dev/test-sandbox op
    * for a 100-TB table.
    */
  val qUpsertClone: QuerySpec = QuerySpec(
    "q_upsert_clone",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend,
        true AS clone_isolated
      FROM ranked WHERE rn = 1 AND op <> 'D'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("upsert-clone")
      val table = buildCdcUpsertTable(spark, dir, base, n = 4,
        changeFeed = false)
      val clone = s"$base/clone"
      Ingest.cloneUpsertTable(spark, table, clone)
      // the source moves on: delete every 3rd customer key
      val victims = Ingest.readUpsertTable(spark, table)
        .filter(col("o_custkey") % 3 === 0)
        .withColumn("_deleted", lit(true))
      Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
        keepVersions = 4, deleteCol = Some("_deleted"))(victims, 4L)
      val srcN = Ingest.readUpsertTable(spark, table).count()
      val cloneDf = Ingest.readUpsertTable(spark, clone)
      val isolated = cloneDf.count() != srcN
      require(isolated, "source delete leaked into the clone")
      cloneDf.groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(isolated).as("clone_isolated"))
        .orderBy("prio")
    })

  /** Selective COMPACTION as a query surface
    * ([[graft.sources.Ingest.compactUpsertTable]]): the CDC-built
    * table takes a LAZY delete batch (merge-on-read: the tombstones
    * land in the deletion vector, no bucket rewrites), then COMPACT
    * runs with a threshold no bucket's file count exceeds — so the
    * only rewrite driver is the delete DEBT, and only the buckets the
    * deleted keys hash to rewrite. In-query contracts pin the op's
    * whole point: (a) the vector existed before and is PHYSICALLY
    * drained after (no `_deletes` in the new generation), (b) the
    * rewrite was selective (strictly fewer buckets than the table
    * has — cost rode the debt, not the table), (c) a second pass is
    * a true no-op (no new generation minted). DuckDB hash-checks the
    * compacted state: the changelog fold minus the five smallest
    * surviving customer keys. Scale: THIS is the cadence op a 100-TB
    * table schedules — 99% of buckets move zero data bytes (links),
    * debt drains at O(debt-buckets) write cost; crash windows are the
    * generation protocol's, already failpoint-swept.
    */
  val qUpsertCompact: QuerySpec = QuerySpec(
    "q_upsert_compact",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D'),
      victims AS (
        SELECT o_custkey FROM live ORDER BY o_custkey LIMIT 5)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend,
        true AS debt_drained, true AS compact_selective,
        true AS second_pass_noop
      FROM live WHERE o_custkey NOT IN (SELECT o_custkey FROM victims)
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.{Ingest, TableStore}
      val store = TableStore.local
      val table = buildCdcUpsertTable(spark, dir,
        graft.Scratch.dir("upsert-compact"), n = 3, changeFeed = false,
        sortCols = Seq("o_orderdate"), filesPerBucket = 6)
      // lazy tombstones for the 5 smallest surviving keys: pure
      // vector debt, no bucket rewrite at merge time
      val victims = Ingest.readUpsertTable(spark, table)
        .orderBy("o_custkey").limit(5)
        .withColumn("_deleted", lit(true))
      Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
        keepVersions = 3, deleteCol = Some("_deleted"),
        lazyDeletes = true, sortCols = Seq("o_orderdate"),
        filesPerBucket = 6)(victims, 3L)
      def curDeletes: String = {
        val cur = store.read(store.child(table, "CURRENT")).get.trim
        store.child(store.child(table, cur), "_deletes")
      }
      val debtBefore = store.isDirectory(curDeletes)
      // no bucket holds > 6 files (filesPerBucket), so the ONLY
      // rewrite driver at this threshold is the deletion vector
      val rewritten = Ingest.compactUpsertTable(spark, table,
        filesOver = 6)
      val selective = rewritten.nonEmpty && rewritten.size < 8
      val drained = debtBefore && !store.isDirectory(curDeletes)
      val noop = Ingest.compactUpsertTable(spark, table, filesOver = 6)
        .isEmpty
      require(selective && drained && noop,
        s"compact contract broken: selective=$selective (rewrote " +
          s"${rewritten.size}/8) drained=$drained noop=$noop")
      Ingest.readUpsertTable(spark, table)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(drained).as("debt_drained"),
          lit(selective).as("compact_selective"),
          lit(noop).as("second_pass_noop"))
        .orderBy("prio")
    })

  /** An incremental materialized view driven by the table format's
    * CHANGE FEED — the composition [[qTableCdf]] exists for: instead
    * of diffing snapshots, the consumer folds the feed's signed
    * contributions (`insert`/`update_postimage` add a row's measures,
    * `delete`/`update_preimage` subtract them) into the standing
    * per-priority aggregate. Folding ALL batches from an empty start
    * must land exactly on the final snapshot's aggregate — which is
    * what the DuckDB oracle recomputes from raw orders, so the hash
    * match proves feed-driven maintenance ≡ recompute (the contract a
    * replica or MV refresher depends on). Money runs in exact integer
    * cents so fold order can't nudge FP; a group whose contributions
    * net to zero rows is dropped (it no longer exists in the view).
    * Scale: the refresh cost is one scan of the RANGE'S feed + a hash
    * agg keyed on the group key — the snapshot is never re-scanned.
    */
  val qCdfMv: QuerySpec = QuerySpec(
    "q_cdf_mv",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend
      FROM ranked WHERE rn = 1 AND op <> 'D'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val n = 4
      val table = sharedCdcTable(spark, dir)
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      Ingest.readTableChanges(spark, table, 0L, (n - 1).toLong)
        .select(col("o_orderpriority").as("prio"),
          sign.as("s"),
          (sign * round(col("o_totalprice") * 100, 0).cast("long")).as("sc"))
        .groupBy("prio")
        .agg(sum("s").as("n"), sum("sc").as("cents"))
        .filter(col("n") =!= 0)
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
        .orderBy("prio")
    })

  /** The full derived-table pipeline, driven by the STREAMING engine
    * exactly-once: the changelog streams into the change-feed upsert
    * table ([[qStreamCdcTable]]'s path), and the SAME micro-batch
    * callback then reads exactly that batch's feed slice
    * (`readTableChanges(id, id)`) and folds its signed contributions
    * into a SECOND upsert table — the materialized view, keyed on the
    * group. Two tables, one batchId, each with its own idempotent
    * ledger: a crash between the base commit and the MV fold replays
    * the batch, the base table no-ops off its ledger, the feed slice
    * is still readable (retention covers the stream's depth), and the
    * MV fold commits — exactly-once end-to-end without a transaction
    * spanning the tables. The final MV read must equal [[qCdfMv]]'s
    * from-scratch fold, which must equal the snapshot recompute — the
    * oracle is shared verbatim, so streaming-incremental ≡
    * batch-incremental ≡ recompute is hash-checked as one chain.
    * Scale: each fold costs one scan of ONE batch's feed + a hash agg
    * on the group key + an O(touched buckets) MV merge — nothing
    * rescans history.
    */
  val qStreamCdfMv: QuerySpec = QuerySpec(
    "q_stream_cdf_mv",
    qCdfMv.oracle,
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("stream-cdf-mv")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val table = s"$base/table"
      val mv = s"$base/mv"
      val log = orderChangelog(spark, dir)
      val n = 4
      val b = log.agg(min(to_date(col("o_orderdate"))),
        max(to_date(col("o_orderdate")))).head() // 2 scalars
      val (d0, d1) = (b.getDate(0).toLocalDate, b.getDate(1).toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      def writer(batch: DataFrame, id: Long): Unit = {
        Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
          keepVersions = n, deleteCol = Some("_deleted"),
          changeFeed = true)(latestChangePerCustomer(batch), id)
        // fold THIS batch's feed slice into the standing view
        val delta = Ingest.readTableChanges(spark, table, id, id)
          .select(col("o_orderpriority").as("prio"), sign.as("s"),
            (sign * round(col("o_totalprice") * 100, 0).cast("long")).as("sc"))
          .groupBy("prio").agg(sum("s").as("n"), sum("sc").as("cents"))
        val merged =
          if (!new java.io.File(mv, "CURRENT").exists()) delta
          else Ingest.readUpsertTable(spark, mv)
            .unionByName(delta)
            .groupBy("prio").agg(sum("n").as("n"), sum("cents").as("cents"))
        // one bucket: the MV is keyed on the 5 priority groups — a
        // cardinality that does NOT grow with data — so extra hash
        // buckets only multiply per-commit write partitions (r17)
        Ingest.upsertParquet(mv, Seq("prio"), nBuckets = 1)(merged, id)
      }
      val src = Ingest.readStreamFiles(spark, s"$in/*.parquet",
        org.apache.spark.sql.types.StructType.fromDDL(
          "o_custkey BIGINT, o_orderdate TIMESTAMP, o_orderkey BIGINT, " +
            "o_totalprice DOUBLE, o_orderpriority STRING, op STRING"),
        basePath = Some(in))
      EventOps.withStreamSizing(spark) {
        // chunks staged once per fixture (r16), copied per invocation
        val parts = EventOps.stagedChunks(spark, dir, "stream-cdf-mv", n)(i =>
          log.filter(expr(
            s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * $n DIV $span")
            === i))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(writer).start()
        try (0 until n).foreach { i =>
          java.nio.file.Files.copy(parts(i),
            java.nio.file.Paths.get(s"$in/c$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          q.processAllAvailable() // each date-range chunk = one batch
        } finally q.stop()
      }
      Ingest.readUpsertTable(spark, mv)
        .filter(col("n") =!= 0) // a group whose rows all vanished
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
        .orderBy("prio")
    })

  /** The table format as a STREAMING SOURCE: a downstream consumer
    * tails the PUBLISHED change feed (`Ingest.changeFeedStream` over
    * the `feed/` files the sink hard-links at each commit) with its
    * OWN streaming query, checkpoint, and sink — no shared callback
    * with the writer, no access to the writer's state. This is the
    * decoupled half of the CDF story ([[qStreamCdfMv]] is the coupled
    * half: same-callback fold): writer and consumer compose only
    * through the feed files, the way a replica or MV refresher
    * actually deploys. The fold is the signed-contribution MV
    * (commutative + associative in exact cents), which is exactly what
    * makes FILE-atomic feed publication sufficient — a slice split
    * across micro-batches (forced here with a maxFilesPerTrigger that
    * does not divide the per-batch file count) folds to the same sums
    * in any order. Exactly-once: the file
    * source's checkpoint processes each feed file once; the MV is an
    * upsert table whose ledger makes replayed folds no-ops. Oracle
    * shared verbatim with [[qCdfMv]] / [[qStreamCdfMv]]: decoupled-
    * streaming ≡ coupled-streaming ≡ batch-incremental ≡ recompute,
    * one hash chain. Scale: consumer cost is O(new feed files) per
    * trigger + a hash agg on the group key; the base table is never
    * read.
    */
  val qStreamFeedMv: QuerySpec = QuerySpec(
    "q_stream_feed_mv",
    qCdfMv.oracle,
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedCdcTable(spark, dir) // publishes feed/ at commit
      val base = graft.Scratch.dir("stream-feed-mv")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      new java.io.File(base).mkdirs()
      val mv = s"$base/mv"
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      def fold(batch: DataFrame, id: Long): Unit = {
        val delta = batch
          .select(col("o_orderpriority").as("prio"), sign.as("s"),
            (sign * round(col("o_totalprice") * 100, 0).cast("long")).as("sc"))
          .groupBy("prio").agg(sum("s").as("n"), sum("sc").as("cents"))
        val merged =
          if (!new java.io.File(mv, "CURRENT").exists()) delta
          else Ingest.readUpsertTable(spark, mv)
            .unionByName(delta)
            .groupBy("prio").agg(sum("n").as("n"), sum("cents").as("cents"))
        // one bucket: the MV is keyed on the 5 priority groups — a
        // cardinality that does NOT grow with data — so extra hash
        // buckets only multiply per-commit write partitions (r17)
        Ingest.upsertParquet(mv, Seq("prio"), nBuckets = 1)(merged, id)
      }
      EventOps.withStreamSizing(spark) {
        // 5 files per trigger: not a divisor of the per-batch feed file
        // count, so slices still split across micro-batches (the
        // file-atomicity property under test) at ~half the trigger
        // count of smaller caps — trigger overhead, not data volume,
        // dominates this row's cost
        val src = Ingest.changeFeedStream(spark, table,
          maxFilesPerTrigger = Some(5))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(fold)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      Ingest.readUpsertTable(spark, mv)
        .filter(col("n") =!= 0) // a group whose rows all vanished
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
        .orderBy("prio")
    })

  /** MERGE-ON-READ deletes in the table format: the changelog's
    * upserts fold in date order (batches 0..3), then every customer
    * whose GLOBAL winner is a tombstone arrives as one delete-only
    * batch with `lazyDeletes = true` — which must rewrite NOTHING
    * (every bucket hard-links forward; the tombstones land in the
    * version's deletion vector) yet the snapshot read must hide the
    * deleted keys. Withholding deletes to the end is semantics-
    * preserving here: a surviving customer's latest U row IS its
    * global winner, and a tombstoned customer is dropped regardless of
    * its upsert history — so the final state is exactly [[qCdcApply]]'s
    * compacted snapshot (oracle re-derived with the contract column).
    * The in-query contract compares the delete version's bucket files
    * to the previous version's BY INODE: merge-on-read's whole value
    * is that a delete-only batch costs O(delete set) writes, not a
    * bucket rewrite — at 100 TB, a GDPR erasure touching a thousand
    * buckets writes one small key list instead of re-writing TBs.
    * Self-compaction and the CDF interplay are spec'd (IngestSpec
    * "lazy deletes" battery), not re-proven here.
    */
  val qUpsertMor: QuerySpec = QuerySpec(
    "q_upsert_mor",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice, o_orderpriority,
        true AS mor_no_rewrite
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("upsert-mor")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      val table = s"$base/table"
      val log = orderChangelog(spark, dir)
      val ups = log.filter(col("op") =!= "D")
      val n = 4
      val b = ups.agg(min(to_date(col("o_orderdate"))),
        max(to_date(col("o_orderdate")))).head() // 2 scalars
      val (d0, d1) = (b.getDate(0).toLocalDate, b.getDate(1).toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
      def up(batch: DataFrame, id: Long): Unit =
        Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
          keepVersions = 10, deleteCol = Some("_deleted"),
          lazyDeletes = true)(batch, id)
      EventOps.withStreamSizing(spark) {
        (0 until n).foreach { i =>
          val chunk = ups.filter(expr(
            s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * $n DIV $span")
            === i)
          up(latestChangePerCustomer(chunk), i.toLong)
        }
        // the erasure batch: global tombstone winners, deletes only
        up(latestChangePerCustomer(log).filter(col("_deleted")), n.toLong)
      }
      // contract: the delete batch hard-linked every bucket (same
      // inodes as the previous version — zero data I/O) and recorded a
      // deletion vector
      def bucketInodes(v: String): Map[String, Set[AnyRef]] = {
        val vd = new java.io.File(table, v)
        Option(vd.listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
          .map(d => d.getName -> Option(d.listFiles()).toSeq.flatten
            .filter(_.getName.endsWith(".parquet"))
            .map(f => java.nio.file.Files.readAttributes(f.toPath,
              classOf[java.nio.file.attribute.BasicFileAttributes])
              .fileKey()).toSet)
          .toMap
      }
      val noRewrite =
        bucketInodes(s"v_$n") == bucketInodes(s"v_${n - 1}") &&
          new java.io.File(table, s"v_$n/_deletes").isDirectory
      require(noRewrite,
        "merge-on-read contract broken: the delete-only batch rewrote " +
          "bucket data or recorded no deletion vector")
      Ingest.readUpsertTable(spark, table)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .withColumn("mor_no_rewrite", lit(noRewrite))
        .orderBy("o_custkey")
    })

  /** File-list data skipping INSIDE the table format: the table pins
    * `sortCols = o_orderdate`, so every bucket rewrite range-slices
    * its bucket into ~4 date-sorted files and commits a per-file
    * min/max manifest with the version (fresh rows for rewritten
    * buckets, carried+remapped rows for hard-linked ones — manifest
    * maintenance rides the merge's O(touched)). A one-year probe then
    * reads only the files whose date box overlaps (1999 — populated at
    * every fixture SF yet a small fraction of the span) — the composition of
    * hash-bucket-by-key (merge/lookup pruning) with sort-order-within-
    * bucket (scan pruning) that production formats call bucket + sort
    * order. In-query contract: the pruned read's file list is strictly
    * smaller than the snapshot's; answers hash-checked against the
    * window recompute. At 100 TB each bucket is multi-GB, and this is
    * the difference between a selective scan reading a few slices per
    * bucket vs every byte of every bucket ([[qStatsPruning]] proves
    * the same layer on a plain dir; this row proves it through the
    * format's version/link/vector machinery).
    */
  val qUpsertStatsPrune: QuerySpec = QuerySpec(
    "q_upsert_stats_prune",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend, true AS pruned
      FROM ranked
      WHERE rn = 1 AND op <> 'D'
        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedSortedTable(spark, dir)
      // 1999 is the selective band that is still populated at every
      // fixture SF (winners are per-customer LATEST orders, so they
      // cluster at the tail of the date range)
      val lo = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      val probe = Ingest.readUpsertTableWhere(spark, table,
        Seq(("o_orderdate", lo, hi)))
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      val pruned = probe.inputFiles.length <
        Ingest.readUpsertTable(spark, table).inputFiles.length
      require(pruned, "stats manifest did not prune the format's file list")
      probe.groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(pruned).as("pruned"))
        .orderBy("prio")
    })

  /** OPTIMIZE over a debt-carrying table: the same changelog fold as
    * [[qUpsertMor]] (upserts then a lazy erasure batch, sortCols
    * pinned), then ONE `optimizeUpsertTable` pass — which must apply
    * and clear the deletion vector, mint a new GENERATION of the same
    * committed batch (no batchId — a concurrent streaming writer's ids
    * can't collide with maintenance), and rebuild the sort layout +
    * stats manifest so pruned reads keep engaging. In-query contracts
    * pin all three (vector gone, `v_<b>.1` served, pruned file list
    * strictly smaller); the oracle hash-checks that maintenance
    * changed NOTHING observable — the compacted snapshot still equals
    * the recompute. At 100 TB this is the scheduled compaction job's
    * acceptance test: debt cleared, clustering restored, zero
    * semantic drift.
    */
  val qUpsertOptimize: QuerySpec = QuerySpec(
    "q_upsert_optimize",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice, o_orderpriority,
        true AS optimized
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val n = 4
      // derive-once fixture (r16): the 5-batch lazy-delete fold is
      // setup; OPTIMIZE below is what the row times, on a fresh copy
      val table = graft.sources.TableCopy.fresh(spark, dir,
        "upsert-optimize") { table =>
        val log = orderChangelog(spark, dir)
        val ups = log.filter(col("op") =!= "D")
        val b = ups.agg(min(to_date(col("o_orderdate"))),
          max(to_date(col("o_orderdate")))).head() // 2 scalars
        val (d0, d1) = (b.getDate(0).toLocalDate, b.getDate(1).toLocalDate)
        val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
        def up(batch: DataFrame, id: Long): Unit =
          Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
            keepVersions = 10, deleteCol = Some("_deleted"),
            lazyDeletes = true, sortCols = Seq("o_orderdate"))(batch, id)
        EventOps.withStreamSizing(spark) {
          (0 until n).foreach { i =>
            up(latestChangePerCustomer(ups.filter(expr(
              s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * $n DIV $span")
              === i)), i.toLong)
          }
          up(latestChangePerCustomer(log).filter(col("_deleted")), n.toLong)
        }
        require(new java.io.File(table, s"v_$n/_deletes").isDirectory,
          "setup: the lazy erasure batch recorded no vector debt")
      }
      EventOps.withStreamSizing(spark) {
        Ingest.optimizeUpsertTable(spark, table)
      }
      def cur(): java.io.File = new java.io.File(table,
        new String(java.nio.file.Files.readAllBytes(
          new java.io.File(table, "CURRENT").toPath)).trim)
      val genServed = cur().getName == s"v_$n.1"
      val debtCleared = !new java.io.File(cur(), "_deletes").exists()
      val lo = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      val stillPrunes = Ingest.readUpsertTableWhere(spark, table,
        Seq(("o_orderdate", lo, hi))).inputFiles.length <
        Ingest.readUpsertTable(spark, table).inputFiles.length
      require(genServed && debtCleared && stillPrunes,
        s"optimize contract broken: gen=$genServed debt=$debtCleared " +
          s"prune=$stillPrunes")
      Ingest.readUpsertTable(spark, table)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .withColumn("optimized",
          lit(genServed && debtCleared && stillPrunes))
        .orderBy("o_custkey")
    })

  /** A SECONDARY INDEX maintained from the change feed — the lookup
    * structure the reference's MySQL tier gives every non-key WHERE
    * clause, re-expressed in the format's own primitives. The index IS
    * an upsert table: keyed on (indexed value, primary key) so
    * uniqueness holds per batch, with `sortCols = indexed value` so a
    * value probe prunes by the stats manifest (value-sorted slices
    * inside each bucket — keyed on the pair, the bucket hash alone
    * could never serve a value-only probe). Maintenance is one fold of
    * each base batch's feed slice: per (value, pk), a surviving
    * post-image/insert upserts the entry, a net pre-image/delete
    * tombstones it — updates that MOVE a pk between values write the
    * tombstone under the old value and the upsert under the new one,
    * exactly the two entries a B-tree would touch. Probe path: pruned
    * index read → pk set → bucket-pruned base lookup, both reads
    * O(relevant files). In-query contract: the index probe's file
    * list is strictly smaller than the index scan's; the oracle
    * hash-checks the urgent-priority winners against the recompute —
    * proving the incrementally-maintained index serves exactly the
    * rows a fresh scan would. At 100 TB: index maintenance cost rides
    * the feed (O(batch)), never re-scans the base, and a value probe
    * costs a few slices + k bucket reads instead of a table scan.
    */
  private val secondaryIndexMemo = graft.Memo[(SparkSession, String), String]()

  /** The feed-maintained secondary index over [[sharedCdcTable]],
    * built ONCE per (session, fixture) — the derive-once/consume-many
    * discipline (r16): the index is an index-like artifact exactly
    * like the IVF cells, and [[qSecondaryIndex]] exists to time the
    * PROBE path, not the fold (its streaming twin [[qStreamIndex]]
    * keeps folding per call — maintenance IS that row's subject).
    */
  def sharedSecondaryIndex(spark: SparkSession, dir: String): String =
    secondaryIndexMemo.getOrElseUpdate((spark, dir), {
      import graft.sources.Ingest
      val table = sharedCdcTable(spark, dir)
      val idx = graft.Scratch.dir("secondary-index") + "/idx"
      EventOps.withStreamSizing(spark) {
        (0L until 4L).foreach { b =>
          val entries = Ingest.readTableChanges(spark, table, b, b)
            .groupBy(col("o_orderpriority"), col("o_custkey"))
            .agg(max(when(col("_change_type")
              .isin("insert", "update_postimage"), 1).otherwise(0)).as("keep"))
            .select(col("o_orderpriority"), col("o_custkey"),
              (col("keep") === 0).as("_del"))
          Ingest.upsertParquet(idx, Seq("o_orderpriority", "o_custkey"),
            nBuckets = 8, keepVersions = 1, deleteCol = Some("_del"),
            sortCols = Seq("o_orderpriority"))(entries, b)
        }
      }
      idx
    })

  val qSecondaryIndex: QuerySpec = QuerySpec(
    "q_secondary_index",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice, o_orderpriority,
        true AS via_index
      FROM ranked WHERE rn = 1 AND op <> 'D'
        AND o_orderpriority = '1-URGENT'
      ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedCdcTable(spark, dir) // feed-carrying base table
      // derive-once artifact (r16): the index IS an index — built once
      // per (session, fixture) like the IVF/PQ indexes and consumed
      // read-only here; the probe path below is what the row times.
      // Bench charges the fold to `secondary_index_build`.
      val idx = sharedSecondaryIndex(spark, dir)
      // probe: stats-pruned index read → pk set → bucket-pruned base read
      val probe = Ingest.readUpsertTableWhere(spark, idx,
        Seq(("o_orderpriority", "1-URGENT", "1-URGENT")))
        .filter(col("o_orderpriority") === "1-URGENT")
      val prunes = probe.inputFiles.length <
        Ingest.readUpsertTable(spark, idx).inputFiles.length
      require(prunes, "index probe did not prune the index's file list")
      val pks = probe.select("o_custkey")
      Ingest.lookupUpsertTable(spark, table, pks)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .withColumn("via_index", lit(prunes))
        .orderBy("o_custkey")
    })

  /** The secondary index maintained by a DECOUPLED STREAM over the
    * published feed — [[qSecondaryIndex]]'s batch fold re-expressed the
    * way a standalone index-maintenance service would run it
    * (`changeFeedStream` + its own checkpoint, no writer coupling).
    * The fold changes shape to survive FILE-atomic feed delivery: the
    * batch row's per-(value, pk) net-keep needs a batch's pre and post
    * images in the SAME view, which file slices split across triggers
    * do not guarantee — so the streamed index stores a SIGNED COUNT
    * per (value, pk) (+1 insert/post-image, −1 delete/pre-image),
    * which is commutative/associative and lands on the same live set
    * in any delivery order (a pk that leaves and returns to a value
    * sums +1−1+1 = 1). Entries whose count nets 0 tombstone out of the
    * index through the sink's own deleteCol — the dead (value, pk)
    * pair physically leaves the table. Probe path and oracle are
    * [[qSecondaryIndex]]'s verbatim: batch-maintained ≡
    * stream-maintained, one hash chain, with the same in-query
    * pruning contract.
    */
  val qStreamIndex: QuerySpec = QuerySpec(
    "q_stream_index",
    qSecondaryIndex.oracle,
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedCdcTable(spark, dir) // publishes feed/ at commit
      val base = graft.Scratch.dir("stream-index")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      new java.io.File(base).mkdirs()
      val idx = s"$base/idx"
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      def fold(batch: DataFrame, id: Long): Unit = {
        val delta = batch
          .select(col("o_orderpriority"), col("o_custkey"), sign.as("s"))
          .groupBy("o_orderpriority", "o_custkey").agg(sum("s").as("cnt"))
        // merge against the CURRENT rows of ONLY this trigger's keys
        // (bucket-pruned lookup — O(trigger), never an index scan),
        // the same delta discipline the streamed ANN fold already has
        // (r17, guide §2.4/§5): the previous shape re-read and
        // re-aggregated the WHOLE index every trigger and re-committed
        // every key, so each micro-batch paid O(index). Keys absent
        // from the trigger keep their rows untouched; a key whose
        // count nets 0 still tombstones out through deleteCol; a dead
        // key that returns starts from its delta alone (its old row
        // was physically removed) — the final live set is identical.
        val merged =
          if (!new java.io.File(idx, "CURRENT").exists()) delta
          else Ingest.lookupUpsertTable(spark, idx,
              delta.select("o_orderpriority", "o_custkey"))
            .select(col("o_orderpriority"), col("o_custkey"), col("cnt"))
            .unionByName(delta)
            .groupBy("o_orderpriority", "o_custkey").agg(sum("cnt").as("cnt"))
        // 4 buckets, 2 slices each: the index is value-skewed tiny rows,
        // so fewer, larger range slices cut per-trigger job count
        // without touching the pruning contract
        Ingest.upsertParquet(idx, Seq("o_orderpriority", "o_custkey"),
          nBuckets = 4, deleteCol = Some("_dead"),
          sortCols = Seq("o_orderpriority"), filesPerBucket = 2)(
          merged.withColumn("_dead", col("cnt") === 0), id)
      }
      EventOps.withStreamSizing(spark) {
        val src = Ingest.changeFeedStream(spark, table,
          maxFilesPerTrigger = Some(9))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(fold)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      val probe = Ingest.readUpsertTableWhere(spark, idx,
        Seq(("o_orderpriority", "1-URGENT", "1-URGENT")))
        .filter(col("o_orderpriority") === "1-URGENT" && col("cnt") > 0)
      val prunes = probe.inputFiles.length <
        Ingest.readUpsertTable(spark, idx).inputFiles.length
      require(prunes, "streamed index probe did not prune the file list")
      Ingest.lookupUpsertTable(spark, table, probe.select("o_custkey"))
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .withColumn("via_index", lit(prunes))
        .orderBy("o_custkey")
    })

  /** The change feed through the SQL surface
    * (`Tables.registerTableChanges` — the `table_changes(...)`-style
    * view other formats expose): plain `spark.sql` text over the
    * registered feed view, sharing [[qTableCdf]]'s oracle verbatim so
    * API-read ≡ SQL-read of the feed is hash-checked as one chain.
    */
  val qTableCdfSql: QuerySpec = QuerySpec(
    "q_table_cdf_sql",
    qTableCdf.oracle,
    (spark, dir) => {
      val table = sharedCdcTable(spark, dir)
      Tables.registerTableChanges(spark, "order_changes", table, 0L, 3L)
      spark.sql("""SELECT _batch_id, _change_type, o_custkey, o_orderdate,
          o_orderkey, round(o_totalprice, 2) AS o_totalprice,
          o_orderpriority
        FROM order_changes
        ORDER BY _batch_id, o_custkey, _change_type""")
    })

  /** DESCRIBE HISTORY over the CDC-built table: one row per committed
    * batch with the LIVE row count of that batch's retained snapshot
    * (time-travel read). The oracle recomputes each count from first
    * principles — the state after batch b is each customer's winner
    * among date chunks ≤ b, counted where the winner survives — so a
    * hash match proves the ledger, the retained versions, AND every
    * historical snapshot's contents agree with what the folds actually
    * did: the operational `DESCRIBE HISTORY` surface, oracle-checked.
    * Scale: counts are distributed jobs over ≤ keepVersions
    * snapshots; the driver holds only the summary rows.
    */
  val qUpsertHistory: QuerySpec = QuerySpec(
    "q_upsert_history",
    Some("""WITH bounds AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS d0,
          date_diff('day', CAST(min(o_orderdate) AS DATE),
            CAST(max(o_orderdate) AS DATE)) + 1 AS span
        FROM orders),
      log AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
          CAST(date_diff('day', (SELECT d0 FROM bounds),
            CAST(o_orderdate AS DATE)) AS BIGINT) * 4
            // (SELECT span FROM bounds) AS b
        FROM orders),
      expanded AS (
        SELECT l.*, v.bb
        FROM log l JOIN (VALUES (0), (1), (2), (3)) AS v(bb) ON l.b <= v.bb),
      winners AS (
        SELECT bb, o_custkey, op,
          row_number() OVER (PARTITION BY bb, o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM expanded)
      SELECT bb AS batch_id, true AS retained,
        count(*) FILTER (WHERE rn = 1 AND op = 'U') AS row_count,
        bb = 3 AS is_current
      FROM winners GROUP BY bb ORDER BY batch_id"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedCdcTable(spark, dir) // keepVersions=4: all retained
      Ingest.describeUpsertTable(spark, table).orderBy("batch_id")
    })

  /** REPLICATION through the change feed — the third consumer shape
    * the CDF exists for (after MV refresh and the secondary index): a
    * replica table applies each base batch's feed slice as its own
    * upsert batch. Per key per slice, a surviving
    * insert/update_postimage is the upsert row and a `delete` is a
    * tombstone (the sink's contract guarantees a key is one or the
    * other per batch; `update_preimage` rows are the OLD images and
    * are not applied). Same batchIds, own ledger — replica replay is
    * exactly-once independently of the base. The replica's CURRENT
    * must equal the base's CURRENT, which must equal the recompute:
    * the oracle is [[qCdcApply]]'s verbatim, extending the hash chain
    * to base-read ≡ replica-read. Scale: replication cost is one scan
    * of each batch's feed slice + an O(touched-buckets) merge on the
    * replica — the base is never re-read, and the replica can run a
    * DIFFERENT layout (here: fewer buckets — a replica tuned for its
    * own workload).
    */
  val qTableReplica: QuerySpec = QuerySpec(
    "q_table_replica",
    qCdcApply.oracle,
    (spark, dir) => {
      import graft.sources.Ingest
      val n = 4
      val base = sharedCdcTable(spark, dir)
      val rep = graft.Scratch.dir("table-replica") + "/rep"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(rep))
      EventOps.withStreamSizing(spark) {
        (0L until n.toLong).foreach { b =>
          val slice = Ingest.readTableChanges(spark, base, b, b)
          val entries = slice
            .filter(col("_change_type") =!= "update_preimage")
            .withColumn("_deleted", col("_change_type") === "delete")
            .drop("_change_type", "_batch_id")
          Ingest.upsertParquet(rep, Seq("o_custkey"), nBuckets = 4,
            deleteCol = Some("_deleted"))(entries, b)
        }
      }
      Ingest.readUpsertTable(spark, rep)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  /** Write-audit-publish as a query surface
    * ([[graft.sources.Ingest.branchUpsertTable]] /
    * [[graft.sources.Ingest.publishUpsertTable]]): the CDC-built table
    * is BRANCHED (zero-copy fork), a risky rewrite lands on the branch
    * (drop every 5th customer, double every surviving 7th customer's
    * total), the audit verifies the source never saw it, and PUBLISH
    * folds the audited diff back as one committed batch — whose state
    * DuckDB recomputes from raw orders. In-query contracts pin the
    * workflow: the source is untouched between branch and publish, the
    * publish batch's change-feed slice is non-empty (downstream
    * consumers ride the diff), and a re-publish mints nothing.
    * Scale: branch is the clone's zero-data-I/O op; publish costs two
    * snapshot scans + a write riding the diff (only buckets holding
    * the ~1/5 + ~1/7 touched keys rewrite).
    */
  val qUpsertWap: QuerySpec = QuerySpec(
    "q_upsert_wap",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      cur AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D'),
      published AS (
        SELECT o_orderpriority,
          CASE WHEN o_custkey % 7 = 0 THEN o_totalprice * 2
               ELSE o_totalprice END AS px
        FROM cur WHERE o_custkey % 5 <> 0)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(px * 100) AS BIGINT)) AS DOUBLE) / 100 AS spend,
        true AS audit_isolated, true AS feed_rides_diff,
        true AS republish_noop
      FROM published GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("upsert-wap")
      val table = buildCdcUpsertTable(spark, dir, base, n = 4,
        changeFeed = true)
      val branch = s"$base/branch"
      Ingest.branchUpsertTable(spark, table, branch)
      def spend(t: String): Long = Ingest.readUpsertTable(spark, t)
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")))
        .head().getLong(0)
      val srcPre = spend(table)
      // the risky rewrite lands on the BRANCH only
      val touched = Ingest.readUpsertTable(spark, branch)
        .filter(col("o_custkey") % 5 === 0 || col("o_custkey") % 7 === 0)
        .withColumn("o_totalprice",
          when(col("o_custkey") % 5 =!= 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
        .withColumn("_deleted", col("o_custkey") % 5 === 0)
      Ingest.upsertParquet(branch, Seq("o_custkey"), nBuckets = 8,
        keepVersions = 4, deleteCol = Some("_deleted"))(touched, 1L)
      val auditIsolated = spend(table) == srcPre && spend(branch) != srcPre
      val pub = Ingest.publishUpsertTable(spark, branch, keepVersions = 4)
      require(pub.nonEmpty, "publish found no diff to apply")
      val feedRidesDiff = Ingest.readTableChanges(spark, table,
        pub.get, pub.get).count() > 0
      val republishNoop =
        Ingest.publishUpsertTable(spark, branch, keepVersions = 4).isEmpty
      require(auditIsolated && feedRidesDiff && republishNoop,
        s"WAP contract broken: isolated=$auditIsolated " +
          s"feed=$feedRidesDiff noop=$republishNoop")
      Ingest.readUpsertTable(spark, table)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(auditIsolated).as("audit_isolated"),
          lit(feedRidesDiff).as("feed_rides_diff"),
          lit(republishNoop).as("republish_noop"))
        .orderBy("prio")
    })

  /** Incremental STAR-MV maintenance + automatic rewrite — the full
    * IVM loop in one row: the fact table's change-feed slices join a
    * BROADCAST dimension (customer) per batch, fold signed
    * contributions into a per-segment MV upsert table (refresh cost =
    * one feed-slice scan + a broadcast join + a tiny keyed agg — the
    * fact snapshot is never re-scanned), and the folded state is then
    * REGISTERED as the serve copy for [[graft.plans.RewriteToMv]]: the
    * star roll-up written against fact ⋈ dim is answered from the
    * maintained MV with the join gone from the plan. In-query
    * contracts: maintained state ≡ direct recompute in exact cents,
    * and the rewrite fired (all plan input files from the serve copy).
    * DuckDB recomputes from raw orders ⋈ customer. Scale: maintenance
    * rides the churn (feed slice × broadcast dim), serving rides the
    * MV (KB-scale) — the fact table is scanned zero times per query
    * after the initial build.
    */
  val qCdfStarMv: QuerySpec = QuerySpec(
    "q_cdf_star_mv",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      cur AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
      SELECT c_mktsegment AS seg, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend,
        true AS maintained_equals_recompute, true AS rewrite_fired
      FROM cur JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY seg"""),
    (spark, dir) => {
      import graft.sources.Ingest
      import graft.plans.MvCatalog
      val n = 4
      val table = sharedCdcTable(spark, dir)
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val base = graft.Scratch.dir("star-mv")
      val mv = s"$base/mv"
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      (0 until n).foreach { b =>
        val delta = Ingest.readTableChanges(spark, table, b, b)
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), sign.as("s"),
            (sign * round(col("o_totalprice") * 100, 0).cast("long")).as("sc"))
          .groupBy("c_mktsegment").agg(sum("s").as("n"), sum("sc").as("cents"))
        val merged =
          if (b == 0) delta
          else Ingest.readUpsertTable(spark, mv)
            .unionByName(delta)
            .groupBy("c_mktsegment").agg(sum("n").as("n"),
              sum("cents").as("cents"))
        // one bucket (r17, the 5-group-MV sizing): c_mktsegment has 5
        // segments at any scale, so a second bucket only doubles each
        // fold commit's write partitions
        Ingest.upsertParquet(mv, Seq("c_mktsegment"), nBuckets = 1,
          keepVersions = 2)(merged.filter(col("n") =!= 0), b.toLong)
      }
      // the maintained state IS the serve copy: write it once, register
      // it against the star definition, and let the optimizer answer
      // the fact ⋈ dim roll-up from it
      def factJoin = Ingest.readUpsertTable(spark, table)
        .join(cust, col("o_custkey") === col("c_custkey"))
      def starAgg(d: DataFrame): DataFrame = d
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      val serve = s"$base/serve"
      Ingest.readUpsertTable(spark, mv).write.mode("overwrite").parquet(serve)
      val mvName = s"mv_star_ivm_$base"
      MvCatalog.register(spark, mvName, starAgg(factJoin), serve,
        MvCatalog.UpsertPin(table)(graft.sources.TableStore.local))
      try {
        val q = starAgg(factJoin)
        val files = q.inputFiles
        val rewriteFired = files.nonEmpty && files.forall(_.contains(serve))
        require(rewriteFired, s"star-MV rewrite did not fire: plan reads " +
          files.take(3).mkString(","))
        // maintained ≡ recompute, in exact integer cents (rule off)
        spark.conf.set("graft.mv.rewrite.enabled", "false")
        val recompute =
          try starAgg(factJoin).collect()
          finally spark.conf.set("graft.mv.rewrite.enabled", "true")
        val got = q.collect()
        def keyed(rs: Array[org.apache.spark.sql.Row]) =
          rs.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val equalExact = keyed(got) == keyed(recompute)
        require(equalExact, "maintained star MV diverged from recompute")
        q.select(col("c_mktsegment").as("seg"), col("n"),
            (col("cents").cast("double") / 100).as("spend"),
            lit(equalExact).as("maintained_equals_recompute"),
            lit(rewriteFired).as("rewrite_fired"))
          .orderBy("seg")
      } finally MvCatalog.deregister(spark, mvName)
    })

  /** Row-level SQL DML on the table format
    * ([[graft.sources.Ingest.updateWhere]] / `deleteWhere`, spelled
    * `GRAFT UPDATE … SET … WHERE …` / `GRAFT DELETE … WHERE …` through
    * the injected parser): an UPDATE doubles every urgent customer's
    * total and a DELETE drops every third customer — both as ordinary
    * committed batches through the (failpoint-swept) sink, so history
    * survives, constraints screen, and the feed records exactly the
    * touched rows. DuckDB recomputes the final state from raw orders.
    * Scale: each statement costs one snapshot scan to find its rows
    * plus a write riding the match — selectivity-proportional bucket
    * rewrites, never a table rewrite.
    */
  val qUpsertDml: QuerySpec = QuerySpec(
    "q_upsert_dml",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      cur AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D'),
      mutated AS (
        SELECT o_orderpriority,
          CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2
               ELSE o_totalprice END AS px
        FROM cur WHERE o_custkey % 3 <> 0)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(px * 100) AS BIGINT)) AS DOUBLE) / 100 AS spend,
        true AS feed_records_dml, true AS history_survives
      FROM mutated GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("upsert-dml")
      val table = buildCdcUpsertTable(spark, dir, base, n = 4,
        changeFeed = true)
      def sq(s: String) = spark.sql(s).head()
      val upd = sq(s"GRAFT UPDATE '$table' KEEP 6 VERSIONS " +
        "SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderpriority = '1-URGENT'")
      val del = sq(s"GRAFT DELETE '$table' KEEP 6 VERSIONS " +
        "WHERE o_custkey % 3 = 0")
      require(!upd.isNullAt(0) && !del.isNullAt(0),
        "DML statements matched nothing — fixture degenerated")
      // the feed records exactly the DML rows: the update batch's
      // postimages are the urgent customers, the delete batch's
      // tombstones are the dropped keys
      val uN = Ingest.readTableChanges(spark, table,
        upd.getLong(0), upd.getLong(0))
        .filter(col("_change_type") === "update_postimage").count()
      val dN = Ingest.readTableChanges(spark, table,
        del.getLong(0), del.getLong(0))
        .filter(col("_change_type") === "delete").count()
      val feedRecords = uN == upd.getLong(1) && dN == del.getLong(1)
      // pre-DML state stays time-travelable
      val historySurvives = Ingest.readUpsertTable(spark, table,
        Some(3L)).count() > Ingest.readUpsertTable(spark, table).count()
      require(feedRecords && historySurvives,
        s"DML contract broken: feed=$feedRecords history=$historySurvives")
      Ingest.readUpsertTable(spark, table)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(feedRecords).as("feed_records_dml"),
          lit(historySurvives).as("history_survives"))
        .orderBy("prio")
    })

  /** NAMED SNAPSHOT TAGS as a query surface
    * ([[graft.sources.Ingest.createTag]]): an aggressively-retained
    * table (keepVersions=1) churns past a tagged snapshot, and the
    * as-of-tag read still serves the tagged state bit-for-bit — the
    * retention PIN is what the hash proves, because without it batch
    * 1's version is swept the moment batch 2 commits. The in-query
    * contract pins the refusal semantics around the pin: an as-of read
    * BETWEEN the pin and the retained suffix refuses with the
    * retention error (serving the pin would be stale data), and a
    * batch below the pin is plainly beyond retention. Scale: a tag is
    * one ledger line; the pin's cost is exactly the pinned snapshot's
    * storage (hard-link-shared against its neighbors), and every sweep
    * consults one small log — never the data.
    */
  val qUpsertTag: QuerySpec = QuerySpec(
    "q_upsert_tag",
    Some("""SELECT o_custkey, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend
      FROM orders WHERE o_orderkey % 4 IN (0, 1)
      GROUP BY o_custkey ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = tagTableFor(spark, dir)
      require(Ingest.listTags(table) == Seq("pre_churn" -> 1L),
        s"tag ledger: ${Ingest.listTags(table)}")
      // between pin and suffix: refused as retention (the pin is not
      // an excuse to serve stale state), not as corruption
      val exMid = scala.util.Try(
        Ingest.readUpsertTable(spark, table, Some(2L)).count())
      require(exMid.failed.toOption.exists(
        _.getMessage.contains("tag pin")), s"mid read: $exMid")
      // below the pin: plainly beyond retention
      require(scala.util.Try(
        Ingest.readUpsertTable(spark, table, Some(0L)).count()).isFailure,
        "asOf(0) must be beyond retention")
      Ingest.readUpsertTableAtTag(spark, table, "pre_churn")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("o_custkey"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
        .orderBy("o_custkey")
    })

  private val taggedTableMemo = graft.Memo[(SparkSession, String), String]()
  private val quarantineTableMemo =
    graft.Memo[(SparkSession, String), String]()

  /** Build-once (per session × fixture) tagged table: 4 order batches
    * under keepVersions=1 with a tag pinned after batch 1 — exposed
    * `private[graft]` so ScaleProbe can time the BUILD separately from
    * the memoized read the bench rows measure.
    */
  private[graft] def tagTableFor(spark: SparkSession, dir: String): String =
    taggedTableMemo.getOrElseUpdate((spark, dir), {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("upsert-tag")
      graft.sources.LocalTableStore.deleteTree(base)
      val t = s"$base/table"
      val log = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      EventOps.withStreamSizing(spark) {
        def up(i: Long, df: DataFrame): Unit =
          Ingest.upsertParquet(t, Seq("o_orderkey"), nBuckets = 8,
            keepVersions = 1)(df, i)
        up(0, log.filter(col("o_orderkey") % 4 === 0))
        up(1, log.filter(col("o_orderkey") % 4 === 1))
        Ingest.createTag(t, "pre_churn", 1L)
        // churn PAST the tag: updates to batch-0 keys, then new keys
        up(2, log.filter(col("o_orderkey") % 4 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0))
        up(3, log.filter(col("o_orderkey") % 4 === 2))
      }
      t
    })

  /** Build-once quarantined table: two order batches through the
    * price-cap constraint in dead-letter mode (same ScaleProbe seam).
    */
  private[graft] def quarantineTableFor(spark: SparkSession,
                                        dir: String): String =
    quarantineTableMemo.getOrElseUpdate((spark, dir), {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("upsert-quarantine")
      graft.sources.LocalTableStore.deleteTree(base)
      val t = s"$base/table"
      val log = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      EventOps.withStreamSizing(spark) {
        (0L to 1L).foreach { i =>
          Ingest.upsertParquet(t, Seq("o_orderkey"), nBuckets = 8,
            keepVersions = 2,
            constraints = Seq("price_cap" -> "o_totalprice < 100000"),
            quarantine = true)(
            log.filter(col("o_orderkey") % 2 === i), i)
        }
      }
      t
    })

  /** QUARANTINE (dead-letter) ingest as a query surface
    * ([[graft.sources.Ingest.upsertParquet]] `quarantine=true` +
    * [[graft.sources.Ingest.readQuarantine]]): orders stream in two
    * batches into a table pinning a price-cap CHECK; violating rows
    * are diverted to the dead-letter area — stamped with the broken
    * constraint and their batch — and the clean remainder commits.
    * The result unions the committed state with the per-batch
    * dead-letter ledger, so the hash pins BOTH sides of the split
    * against DuckDB's first-principles partition of the same rows.
    * In-query contract: every dead letter blames exactly the price
    * cap. Scale: the split is one extra scan of the cached batch;
    * dead letters write once per batch under `_quarantine/b_<id>` —
    * the table itself never holds (or rewrites around) a bad row.
    */
  val qUpsertQuarantine: QuerySpec = QuerySpec(
    "q_upsert_quarantine",
    Some("""WITH split AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
          o_totalprice < 100000 AS ok, o_orderkey % 2 AS b
        FROM orders)
      SELECT 'state' AS src, o_orderpriority AS grp, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend
      FROM split WHERE ok GROUP BY 2
      UNION ALL
      SELECT 'quarantine' AS src, CAST(b AS VARCHAR) AS grp, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend
      FROM split WHERE NOT ok GROUP BY 2
      ORDER BY src, grp"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val table = quarantineTableFor(spark, dir)
      val dead = Ingest.readQuarantine(spark, table)
      require(dead.filter(col(Ingest.QuarantineReasonCol) =!=
        array(lit("price_cap"))).count() == 0,
        "every dead letter must blame exactly the price cap")
      val state = Ingest.readUpsertTable(spark, table)
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(lit("state").as("src"), col("grp"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
      val letters = dead
        .groupBy(col(Ingest.QuarantineBatchCol).cast("string").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(lit("quarantine").as("src"), col("grp"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
      state.unionByName(letters).orderBy("src", "grp")
    })

  /** OPTIMIZE ZORDER as a query surface
    * ([[graft.sources.Ingest.optimizeUpsertTableZorder]]): a keyed
    * table pins (o_custkey, o_totalprice) as its stats columns, takes
    * two merges (linear range-sliced layout), then a ZORDER pass
    * re-clusters every bucket along the Morton curve over BOTH
    * columns. The gate is a 2-D box probe through the stats manifest
    * ([[graft.sources.Ingest.readUpsertTableWhere]]) constrained on
    * the TRAILING stats column only — the probe shape a linear layout
    * cannot prune (its files are tight on the LEADING column and span
    * the full trailing range, so nearly every file survives the
    * overlap test), while the curve's boxes are tight on both
    * dimensions. The pruned probe's rows must equal DuckDB's
    * full-table recomputation (pruning is a superset guarantee —
    * never loses a row); in-query contracts pin the strict
    * fewer-files win and that the rewrite preserved the state. The
    * complementary trade — a probe highly selective on the LEADING
    * column, where linear wins — is exactly why ZORDER is an opt-in
    * clause, not the default layout.
    */
  val qUpsertZorder: QuerySpec = QuerySpec(
    "q_upsert_zorder",
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice BETWEEN 50000 AND 60000
      ORDER BY o_orderkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      // derive-once fixture (r16): the 2-batch linear-sorted build is
      // setup; the ZORDER rewrite + probes below are what the row times
      val t = graft.sources.TableCopy.fresh(spark, dir,
        "upsert-zorder") { t =>
        val log = Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        EventOps.withStreamSizing(spark) {
          (0L to 1L).foreach { i =>
            Ingest.upsertParquet(t, Seq("o_orderkey"), nBuckets = 4,
              keepVersions = 4, sortCols = Seq("o_custkey", "o_totalprice"),
              filesPerBucket = 8)(
              log.filter(col("o_orderkey") % 2 === i), i)
          }
        }
      }
      val bounds = Seq[(String, Any, Any)](
        ("o_totalprice", 50000.0, 60000.0))
      val boxPred = col("o_totalprice").between(50000.0, 60000.0)
      EventOps.withStreamSizing(spark) {
        val fullBefore = Ingest.readUpsertTable(spark, t).count()
        val linear = Ingest.readUpsertTableWhere(spark, t, bounds)
        val linearFiles = linear.inputFiles.length
        val linearRows = linear.filter(boxPred).count()
        Ingest.optimizeUpsertTableZorder(spark, t,
          Seq("o_custkey", "o_totalprice"))
        val z = Ingest.readUpsertTableWhere(spark, t, bounds)
        val zFiles = z.inputFiles.length
        require(zFiles < linearFiles,
          s"zorder must strictly prune the trailing-dimension probe " +
            s"($linearFiles -> $zFiles files)")
        require(z.filter(boxPred).count() == linearRows,
          "zorder changed the box-probe result")
        require(Ingest.readUpsertTable(spark, t).count() == fullBefore,
          "zorder rewrite changed the row count")
      }
      Ingest.readUpsertTableWhere(spark, t, bounds)
        .filter(boxPred)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    })

  /** REQUEUE as a query surface — the dead-letter lifecycle's third
    * verb ([[graft.sources.Ingest.requeueQuarantine]]): two order
    * batches divert their price-cap violators, an operator FIXES the
    * letters (price clamped under the cap) and requeues them as one
    * committed batch through the same pinned constraint screen. The
    * final state must hold EVERY order — originals where they passed,
    * the clamped value where they were healed — which is exactly
    * DuckDB's CASE recomputation; in-query contracts pin the audit
    * counts (healed = all letters, nothing re-diverted) and the
    * emptied dead-letter area. Scale: the requeue batch is
    * letters-sized, the merge is bucket-scoped like any other batch,
    * and the consumed dirs sweep as control-plane deletes.
    */
  val qUpsertRequeue: QuerySpec = QuerySpec(
    "q_upsert_requeue",
    Some("""SELECT o_orderkey, o_orderpriority,
        CASE WHEN o_totalprice < 100000 THEN o_totalprice
             ELSE 99999.99 END AS price
      FROM orders ORDER BY o_orderkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      // derive-once fixture (r16): the 2-batch diverting ingest is
      // setup; the REQUEUE heal below is what the row times, on a
      // fresh copy (the heal deletes the copy's letters — unlinks,
      // never writes through the pristine's shared inodes)
      val t = graft.sources.TableCopy.fresh(spark, dir,
        "upsert-requeue") { t =>
        val log = Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
        EventOps.withStreamSizing(spark) {
          (0L to 1L).foreach { i =>
            Ingest.upsertParquet(t, Seq("o_orderkey"), nBuckets = 8,
              keepVersions = 4,
              constraints = Seq("price_cap" -> "o_totalprice < 100000"),
              quarantine = true)(
              log.filter(col("o_orderkey") % 2 === i), i)
          }
        }
      }
      EventOps.withStreamSizing(spark) {
        val expected = Ingest.readQuarantine(spark, t).count()
        val (healed, rediverted) = Ingest.requeueQuarantine(spark, t, 2L,
          fix = _.withColumn("o_totalprice",
            when(col("o_totalprice") < 100000, col("o_totalprice"))
              .otherwise(lit(99999.99))))
        require(healed == expected && rediverted == 0L,
          s"requeue audit: healed=$healed of $expected, " +
            s"rediverted=$rediverted")
        require(Ingest.readQuarantine(spark, t).count() == 0,
          "dead-letter area must be empty after a full heal")
      }
      Ingest.readUpsertTable(spark, t)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").as("price"))
        .orderBy("o_orderkey")
    })

  /** QUARANTINE under the STREAMING engine — the 24th streaming oracle
    * row (VERDICT r14 item 5, promoting the StreamingSpec crash-replay
    * shape to a hash gate): events land as 4 file micro-batches
    * (chunked by `event_id % 4`, staged one at a time so batch i IS
    * chunk i), each batch pre-reduces to its latest row per user and
    * MERGEs through the dead-letter sink — a `value <= 200` cap with
    * `quarantine = true`, so each batch's violating reduced rows
    * divert and its clean remainder commits. The result unions BOTH
    * sides of the split — the final table state (per user, the
    * highest batch whose reduced row was clean) and the per-batch
    * dead-letter ledger — against DuckDB's first-principles
    * recomputation of the same fold. In-query contracts: all 4
    * batches committed; every dead letter blames exactly the cap.
    * Scale: the split rides each micro-batch (cached-batch scan),
    * never the table — same shape the batch twin
    * ([[qUpsertQuarantine]]) pins, here proven through the streaming
    * engine's delivery.
    */
  val qStreamQuarantine: QuerySpec = QuerySpec(
    "q_stream_quarantine",
    Some("""WITH red AS (
        SELECT user_id, event_id, value, event_id % 4 AS b,
          row_number() OVER (PARTITION BY user_id, event_id % 4
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
      r1 AS (SELECT user_id, event_id, value, b FROM red WHERE rn = 1),
      st AS (SELECT user_id, event_id, value, b,
          row_number() OVER (PARTITION BY user_id ORDER BY b DESC) AS rn2
        FROM r1 WHERE value <= 200)
      SELECT 'state' AS src, user_id, event_id, value, b
      FROM st WHERE rn2 = 1
      UNION ALL
      SELECT 'quarantine' AS src, user_id, event_id, value, b
      FROM r1 WHERE value > 200
      ORDER BY src, user_id, event_id"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("stream-quarantine")
      graft.sources.LocalTableStore.deleteTree(base)
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val table = s"$base/table"
      val raw = spark.read.schema(Tables.eventsRaw)
        .parquet(s"$dir/events.parquet")
      def writer(b: DataFrame, id: Long): Unit =
        Ingest.upsertParquet(table, Seq("user_id"), nBuckets = 8,
          keepVersions = 2,
          constraints = Seq("value_cap" -> "value <= 200"),
          quarantine = true)(
          b.groupBy("user_id")
            .agg(max_by(struct(col("ts"), col("event_id"), col("value")),
              struct(col("ts"), col("event_id"))).as("m"))
            .select(col("user_id"), col("m.ts").as("ts"),
              col("m.event_id").as("event_id"), col("m.value").as("value"))
            .withColumn("b", lit(id)),
          id)
      val src = Ingest.readStreamFiles(
        spark, s"$in/*.parquet", Tables.eventsRaw, basePath = Some(in))
      EventOps.withStreamSizing(spark) {
        // chunks staged once per fixture (r16), copied per invocation
        val parts = EventOps.stagedChunks(spark, dir, "stream-quarantine",
          4)(i => raw.filter(pmod(col("event_id"), lit(4)) === i))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(writer).start()
        try (0 until 4).foreach { i =>
          java.nio.file.Files.copy(parts(i),
            java.nio.file.Paths.get(s"$in/c$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          q.processAllAvailable() // chunk i drains as batch i
        } finally q.stop()
      }
      require(Ingest.committedBatchIds(table) == Set(0L, 1L, 2L, 3L),
        s"committed: ${Ingest.committedBatchIds(table)}")
      val dead = Ingest.readQuarantine(spark, table)
      require(dead.filter(col(Ingest.QuarantineReasonCol) =!=
        array(lit("value_cap"))).count() == 0,
        "every dead letter must blame exactly the value cap")
      val state = Ingest.readUpsertTable(spark, table)
        .select(lit("state").as("src"), col("user_id"), col("event_id"),
          col("value"), col("b"))
      val letters = dead
        .select(lit("quarantine").as("src"), col("user_id"),
          col("event_id"), col("value"), col("b"))
      state.unionByName(letters).orderBy("src", "user_id", "event_id")
    })

  /** ANSI-shaped MERGE INTO with ordered multi-WHEN clauses
    * ([[graft.sources.Ingest.mergeInto]], spelled `GRAFT MERGE …
    * USING (…) WHEN …`): the table holds each odd customer's EARLIEST
    * order, the source each ≥-1997-active customer's LATEST, and one
    * MERGE routes every (target, source) pair — richer-order UPDATE,
    * urgent-order DELETE, new-customer INSERT, stale-low-priority
    * BY-SOURCE DELETE — as ONE committed batch through the sink.
    * DuckDB recomputes the final state from a FULL OUTER JOIN with the
    * same first-match CASE routing. Scale: the change set is one
    * keys-equality join (+ two anti-joins reusing it); with no
    * BY-SOURCE clause the target scan is bucket-pruned to the source's
    * keys — this row keeps the BY-SOURCE leg, the irreducible
    * full-coverage case, and the MergeSpec battery pins prune ≡ full.
    */
  val qUpsertMerge: QuerySpec = QuerySpec(
    "q_upsert_merge",
    Some("""WITH o AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
          round(o_totalprice, 2) AS o_totalprice, o_orderpriority,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_a,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
        FROM orders),
      init AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority FROM o WHERE rn_a = 1 AND o_custkey % 2 = 1),
      src AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority FROM o WHERE rn_d = 1
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
      j AS (SELECT COALESCE(t.o_custkey, s.o_custkey) AS k,
          t.o_custkey AS tk, s.o_custkey AS sk,
          t.o_orderdate AS td, t.o_orderkey AS tok,
          t.o_totalprice AS tp, t.o_orderpriority AS tpr,
          s.o_orderdate AS sd, s.o_orderkey AS sok,
          s.o_totalprice AS sp, s.o_orderpriority AS spr
        FROM init t FULL OUTER JOIN src s ON t.o_custkey = s.o_custkey),
      acted AS (SELECT *,
          CASE WHEN tk IS NOT NULL AND sk IS NOT NULL THEN
                 CASE WHEN sp > tp THEN 'U'
                      WHEN spr = '1-URGENT' THEN 'D'
                      ELSE 'K' END
               WHEN tk IS NULL THEN 'I'
               ELSE CASE WHEN tpr = '5-LOW' THEN 'D' ELSE 'K' END
          END AS act FROM j)
      SELECT k AS o_custkey,
        CASE WHEN act IN ('U','I') THEN sd ELSE td END AS o_orderdate,
        CASE WHEN act IN ('U','I') THEN sok ELSE tok END AS o_orderkey,
        CASE WHEN act IN ('U','I') THEN sp ELSE tp END AS o_totalprice,
        CASE WHEN act IN ('U','I') THEN spr ELSE tpr END
          AS o_orderpriority,
        true AS merged
      FROM acted WHERE act <> 'D' ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      implicit val tstore: graft.sources.TableStore =
        graft.sources.TableStore.local
      val base = graft.Scratch.dir("upsert-merge")
      tstore.deleteTree(base)
      val table = s"$base/table"
      val o = Tables.load(spark, dir, "orders").select(
        col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderpriority"))
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wDesc = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val init = o.withColumn("rn", row_number().over(wAsc))
        .filter(col("rn") === 1 && col("o_custkey") % 2 === 1).drop("rn")
      val src = o.withColumn("rn", row_number().over(wDesc))
        .filter(col("rn") === 1 && col("o_orderdate") >=
          lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .drop("rn")
      Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
        keepVersions = 4)(init, 0L)
      val res = Ingest.mergeInto(spark, table, src, Seq(
        Ingest.MatchedUpdate(Some("s.o_totalprice > t.o_totalprice"), Seq(
          "o_totalprice" -> "s.o_totalprice",
          "o_orderdate" -> "s.o_orderdate",
          "o_orderkey" -> "s.o_orderkey",
          "o_orderpriority" -> "s.o_orderpriority")),
        Ingest.MatchedDelete(Some("s.o_orderpriority = '1-URGENT'")),
        Ingest.NotMatchedInsert(None),
        Ingest.NotMatchedBySourceDelete(
          Some("t.o_orderpriority = '5-LOW'"))),
        keepVersions = 4)
      require(res.nonEmpty, "merge touched nothing — fixture degenerated")
      Ingest.readUpsertTable(spark, table)
        .withColumn("merged", lit(res.nonEmpty))
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice",
          "o_orderpriority", "merged")
        .orderBy("o_custkey")
    })

  /** [[qUpsertMerge]] driven ENTIRELY through the SQL surface — the
    * TPC-H DSL+SQL twin discipline applied to MERGE: one DuckDB
    * oracle, two engines' worth of plumbing (the `GRAFT MERGE` parse,
    * the USING query through the full delegate grammar with its
    * window functions, four WHEN clauses with `t.`/`s.` references),
    * and the hash must land on the same bytes the API row produced.
    */
  val qUpsertMergeSql: QuerySpec = QuerySpec(
    "q_upsert_merge_sql",
    qUpsertMerge.oracle, // shared verbatim — one oracle, two routes
    (spark, dir) => {
      import graft.sources.Ingest
      implicit val tstore: graft.sources.TableStore =
        graft.sources.TableStore.local
      val base = graft.Scratch.dir("upsert-merge-sql")
      tstore.deleteTree(base)
      val table = s"$base/table"
      val o = Tables.load(spark, dir, "orders").select(
        col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderpriority"))
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val init = o.withColumn("rn", row_number().over(wAsc))
        .filter(col("rn") === 1 && col("o_custkey") % 2 === 1).drop("rn")
      Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
        keepVersions = 4)(init, 0L)
      val usingSql =
        s"""SELECT o_custkey, o_orderdate, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM parquet.`$dir/orders.parquet`)
           WHERE rn = 1
             AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"""
      val res = spark.sql(
        s"GRAFT MERGE '$table' KEEP 4 VERSIONS USING ($usingSql) " +
          "WHEN MATCHED AND s.o_totalprice > t.o_totalprice THEN UPDATE " +
          "SET o_totalprice = s.o_totalprice, o_orderdate = s.o_orderdate, " +
          "o_orderkey = s.o_orderkey, o_orderpriority = s.o_orderpriority " +
          "WHEN MATCHED AND s.o_orderpriority = '1-URGENT' THEN DELETE " +
          "WHEN NOT MATCHED THEN INSERT " +
          "WHEN NOT MATCHED BY SOURCE AND t.o_orderpriority = '5-LOW' " +
          "THEN DELETE").head()
      require(!res.isNullAt(0), "SQL merge touched nothing")
      Ingest.readUpsertTable(spark, table)
        .withColumn("merged", lit(!res.isNullAt(0)))
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice",
          "o_orderpriority", "merged")
        .orderBy("o_custkey")
    })

  /** Metadata-only aggregation from the stats manifest
    * ([[graft.sources.Ingest.countWhere]] / `minMaxMeta`): the
    * manifest's `n_rows` + `nulls_<c>` columns answer a whole-table
    * COUNT and the sortCols MIN/MAX with ZERO data-file opens, and a
    * range-bounded COUNT folds fully-inside files from metadata while
    * scanning only predicate-boundary files — the aggregate-pushdown
    * every lakehouse planner special-cases, surfaced as an explicit
    * op. In-query contracts: the unbounded count and min/max opened no
    * data file; the 1999 band scanned strictly fewer files than the
    * snapshot holds. DuckDB recomputes all four numbers from the raw
    * changelog fold. At 100 TB: a full COUNT reads a manifest of
    * O(files) tiny rows instead of the table, and a selective COUNT's
    * data I/O is its boundary files — O(buckets) on a clustered table.
    */
  val qUpsertMetaCount: QuerySpec = QuerySpec(
    "q_upsert_meta_count",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      cur AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
      SELECT count(*) AS n_total,
        count(*) FILTER (WHERE o_orderdate
          BETWEEN TIMESTAMP '1999-01-01 00:00:00'
          AND TIMESTAMP '1999-12-31 23:59:59') AS n_band,
        min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        true AS meta_only, true AS band_pruned
      FROM cur"""),
    (spark, dir) => {
      import graft.sources.Ingest
      implicit val tstore: graft.sources.TableStore =
        graft.sources.TableStore.local
      val table = sharedSortedTable(spark, dir)
      val all = Ingest.countWhere(spark, table)
      require(all.scannedFiles == 0L,
        s"unbounded count opened ${all.scannedFiles} data files")
      val lo = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("1999-12-31 23:59:59")
      val band = Ingest.countWhere(spark, table, Seq(("o_orderdate", lo, hi)))
      require(band.scannedFiles < band.totalFiles,
        "banded count scanned every file — manifest pruning dead")
      val mm = Ingest.minMaxMeta(spark, table)
        .getOrElse(throw new IllegalStateException(
          "manifest-backed table must answer minMaxMeta"))
        .head()
      spark.range(1).select(
        lit(all.count).as("n_total"),
        lit(band.count).as("n_band"),
        lit(mm.getTimestamp(0)).as("min_date"),
        lit(mm.getTimestamp(1)).as("max_date"),
        lit(all.scannedFiles == 0L).as("meta_only"),
        lit(band.scannedFiles < band.totalFiles).as("band_pruned"))
    })

  /** Column mapping — metadata-only RENAME / DROP COLUMN
    * ([[graft.sources.Ingest.renameColumn]] / `dropColumn`, spelled
    * `GRAFT ALTER '<dir>' RENAME COLUMN a TO b` / `DROP COLUMN a`):
    * physical names in parquet are immutable, `_colmap` maps them to
    * the user-facing logical names, and both ops rewrite ONLY that
    * object — the in-query contract pins zero new versions (no data
    * I/O, the ALTER TABLE cost model a 100-TB table requires).
    * The row then exercises the full lifecycle: rename the price
    * column, DROP the priority column, and RE-ADD the same logical
    * name in a later batch — which mints a FRESH physical column, so
    * old rows read NULL (dropped data never resurfaces) while the
    * re-added subset carries the new value. DuckDB recomputes the
    * final state from raw orders with the same CASE.
    */
  val qUpsertColmap: QuerySpec = QuerySpec(
    "q_upsert_colmap",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      cur AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
      SELECT o_custkey, o_orderdate, o_orderkey,
        round(o_totalprice, 2) AS price,
        CASE WHEN o_custkey % 5 = 0 THEN 'REVIEWED' END
          AS o_orderpriority,
        true AS metadata_only
      FROM cur ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      implicit val tstore: graft.sources.TableStore =
        graft.sources.TableStore.local
      val table = buildCdcUpsertTable(spark, dir,
        graft.Scratch.dir("upsert-colmap"), n = 2, changeFeed = false)
      def versions(): Set[String] =
        tstore.listNames(table).filter(_.startsWith("v_")).toSet
      val before = versions()
      Ingest.renameColumn(table, "o_totalprice", "price")
      Ingest.dropColumn(table, "o_orderpriority")
      val metadataOnly = versions() == before
      require(metadataOnly, "ALTER minted a version — not metadata-only")
      // re-add the dropped logical name for a key subset: fresh
      // physical column, old rows stay NULL
      val subset = Ingest.readUpsertTable(spark, table)
        .filter(col("o_custkey") % 5 === 0)
        .withColumn("o_orderpriority", lit("REVIEWED"))
      Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
        keepVersions = 4)(subset, 2L)
      Ingest.readUpsertTable(spark, table)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          round(col("price"), 2).as("price"), col("o_orderpriority"),
          lit(metadataOnly).as("metadata_only"))
        .orderBy("o_custkey")
    })

  /** STREAMING MERGE — [[graft.sources.Ingest.mergeInto]] as the
    * foreachBatch body, the composition a CDC consumer with
    * conditional apply rules actually runs (plain upsert overwrites
    * unconditionally; this stream keeps each customer's RICHEST order:
    * update only when the incoming price is strictly higher, insert
    * new customers). Each date-range micro-batch pre-reduces per key
    * (max (price, orderkey)) then merges with `asBatch =` the
    * micro-batch id, so a crash-replayed batch no-ops — exactly-once
    * restated for an op whose change set derives from the
    * already-merged snapshot (MergeSpec pins the replay no-op).
    * DuckDB recomputes the fold: the conditional-update semantics make
    * the result the global argmax by (price, chunk ASC, orderkey) —
    * strict `>` means the EARLIEST chunk holding the max price wins,
    * with the in-chunk pre-reduce tie-break on orderkey.
    */
  val qStreamMerge: QuerySpec = QuerySpec(
    "q_stream_merge",
    Some("""WITH bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS d0,
          date_diff('day', min(CAST(o_orderdate AS DATE)),
            max(CAST(o_orderdate AS DATE))) + 1 AS span
        FROM orders),
      log AS (
        SELECT o.o_custkey, o.o_orderdate, o.o_orderkey,
          round(o.o_totalprice, 2) AS price, o.o_orderpriority,
          (date_diff('day', b.d0, CAST(o.o_orderdate AS DATE)) * 4)
            // b.span AS chunk
        FROM orders o CROSS JOIN bounds b),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY price DESC, chunk ASC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey, o_orderdate, o_orderkey, price, o_orderpriority
      FROM ranked WHERE rn = 1 ORDER BY o_custkey"""),
    (spark, dir) => {
      import graft.sources.Ingest
      implicit val tstore: graft.sources.TableStore =
        graft.sources.TableStore.local
      val base = graft.Scratch.dir("stream-merge")
      tstore.deleteTree(base)
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val table = s"$base/table"
      val log = Tables.load(spark, dir, "orders").select(
        col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("o_orderpriority"))
      val n = 4
      val b = log.agg(min(to_date(col("o_orderdate"))),
        max(to_date(col("o_orderdate")))).head() // 2 scalars
      val (d0, d1) = (b.getDate(0).toLocalDate, b.getDate(1).toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
      def writer(batch: DataFrame, id: Long): Unit = {
        // per-key pre-reduce: the batch's richest order (price, then
        // orderkey) — the MERGE cardinality contract per micro-batch
        val reduced = batch.groupBy("o_custkey")
          .agg(max_by(
            struct(col("o_orderdate"), col("o_orderkey"), col("price"),
              col("o_orderpriority")),
            struct(col("price"), col("o_orderkey"))).as("r"))
          .select(col("o_custkey"), col("r.o_orderdate"),
            col("r.o_orderkey"), col("r.price"), col("r.o_orderpriority"))
        if (!tstore.exists(tstore.child(table, "_meta")))
          Ingest.upsertParquet(table, Seq("o_custkey"), nBuckets = 8,
            keepVersions = n + 1)(reduced, id)
        else {
          Ingest.mergeInto(spark, table, reduced, Seq(
            Ingest.MatchedUpdate(Some("s.price > t.price"), Seq(
              "price" -> "s.price", "o_orderdate" -> "s.o_orderdate",
              "o_orderkey" -> "s.o_orderkey",
              "o_orderpriority" -> "s.o_orderpriority")),
            Ingest.NotMatchedInsert(None)),
            keepVersions = n + 1, asBatch = Some(id))
          ()
        }
      }
      val src = Ingest.readStreamFiles(spark, s"$in/*.parquet",
        org.apache.spark.sql.types.StructType.fromDDL(
          "o_custkey BIGINT, o_orderdate TIMESTAMP, o_orderkey BIGINT, " +
            "price DOUBLE, o_orderpriority STRING"),
        basePath = Some(in))
      EventOps.withStreamSizing(spark) {
        // chunks staged once per fixture (r16), copied per invocation
        val parts = EventOps.stagedChunks(spark, dir, "stream-merge", n)(i =>
          log.filter(expr(
            s"CAST(datediff(o_orderdate, '$d0') AS BIGINT) * $n DIV $span")
            === i))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(writer).start()
        try (0 until n).foreach { i =>
          java.nio.file.Files.copy(parts(i),
            java.nio.file.Paths.get(s"$in/c$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          q.processAllAvailable() // each date-range chunk = one batch
        } finally q.stop()
      }
      Ingest.readUpsertTable(spark, table)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("price"), col("o_orderpriority"))
        .orderBy("o_custkey")
    })

  // ---- the `graft` DataSource registration (format("graft")) --------
  //
  // The same table served through Spark's REGISTERED source surface:
  // spark.read.format("graft") with pushed-down pruning, CREATE TABLE
  // … USING graft + plain SQL, and the change feed as a read mode.
  // One memoized build (sortCols pinned + change feed on) backs all
  // three rows; the fold is the [[sharedCdcTable]] changelog, so the
  // oracles are the established recomputations.

  private val sourceTableMemo = graft.Memo[(SparkSession, String), String]()

  /** Public for Bench's named setup entry (`source_table_build`) —
    * derive-once/consume-many, the cdc_table_build discipline.
    */
  def sharedSourceTable(spark: SparkSession, dir: String): String =
    sourceTableMemo.getOrElseUpdate((spark, dir),
      buildCdcUpsertTable(spark, dir, graft.Scratch.dir("source-shared"),
        n = 4, changeFeed = true, sortCols = Seq("o_orderdate")))

  /** Snapshot read through `spark.read.format("graft")` — the stock
    * Spark verb, not the library API. The relation translates the
    * pushed date-range filters into stats-manifest bounds
    * ([[graft.sources.GraftSourceOptions.boundsFromFilters]]) and
    * file-list-skips before any footer I/O; the in-query contract
    * pins that the pushed bounds genuinely discard files on this
    * layout, and the hash check pins that pruning never changed an
    * answer. Scale: identical to [[qUpsertStatsPrune]]'s argument —
    * this row proves the SAME pruned read engages when the table is
    * reached through the registered format (where a user's WHERE
    * clause, not an explicit bounds call, is all the engine gets).
    */
  val qSourceRead: QuerySpec = QuerySpec(
    "q_source_read",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend, true AS pruned
      FROM ranked
      WHERE rn = 1 AND op <> 'D'
        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      import graft.sources.{Ingest, StatsManifest, TableStore}
      implicit val store: TableStore = TableStore.local
      val table = sharedSourceTable(spark, dir)
      val lo = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      // in-query contract: the open bounds the source pushes from this
      // WHERE clause strictly prune the snapshot's file list
      val mDir = store.child(Ingest.snapshotVersionDir(table),
        StatsManifest.ManifestDir)
      val all = StatsManifest.survivingFilesOpt(spark, mDir, Nil).get.size
      val hit = StatsManifest.survivingFilesOpt(spark, mDir,
        Seq(("o_orderdate", Some(lo), None), ("o_orderdate", None, Some(hi))))
        .get.size
      require(hit > 0 && hit < all,
        s"format pushdown did not prune: $hit of $all files")
      spark.read.format("graft").load(table)
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"),
          lit(true).as("pruned"))
        .orderBy("prio")
    })

  /** The same probe through the CATALOG: `CREATE TABLE … USING graft`
    * then plain `spark.sql` — SQL names a graft table like any other
    * source, Catalyst plans the relation, the relation pushes the
    * WHERE bounds. One fold, a third engine route (DSL / format read /
    * catalog SQL), one oracle discipline.
    */
  val qSourceSql: QuerySpec = QuerySpec(
    "q_source_sql",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_orderpriority AS prio, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100 AS spend
      FROM ranked
      WHERE rn = 1 AND op <> 'D'
        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY o_orderpriority ORDER BY prio"""),
    (spark, dir) => {
      val table = sharedSourceTable(spark, dir)
      spark.sql("DROP TABLE IF EXISTS graft_cdc_source")
      spark.sql(
        s"CREATE TABLE graft_cdc_source USING graft OPTIONS (path '$table')")
      spark.sql("""SELECT o_orderpriority AS prio, count(*) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / 100 AS spend
        FROM graft_cdc_source
        WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY o_orderpriority ORDER BY prio""")
    })

  /** The change feed through the registered source
    * (`option("read", "changes")`) — CDC consumers reach the feed with
    * a stock reader option instead of a library call. Same fold and
    * byte-faithfulness oracle as [[qTableCdf]] (the sort-order pin on
    * this build changes file layout, never feed content).
    */
  val qSourceCdf: QuerySpec = QuerySpec(
    "q_source_cdf",
    qTableCdf.oracle,
    (spark, dir) => {
      val table = sharedSourceTable(spark, dir)
      spark.read.format("graft").option("read", "changes")
        .option("endingBatch", "3").load(table)
        .select(col("_batch_id"), col("_change_type"), col("o_custkey"),
          col("o_orderdate"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy("_batch_id", "o_custkey", "_change_type")
    })

  /** The change feed as a REAL `readStream.format("graft")` source —
    * the V2 `MicroBatchStream` ([[graft.sources.GraftTable]]), not the
    * file-stream workaround: offsets are COMMITTED BATCH IDS, each
    * trigger admits at most `maxBatchesPerTrigger` ledger batches, and
    * a replayed range replans the identical immutable slice files.
    * Same signed-contribution MV fold and oracle as [[qStreamFeedMv]]
    * (stock-verb-streaming ≡ library-streaming ≡ batch-incremental ≡
    * recompute — one hash chain), with the stronger BATCH-atomic
    * micro-batches the ledger-offset source provides (the file tail
    * only had file-atomic slices). Exactly-once: Spark's checkpoint
    * pins the offset ranges; the MV upsert ledger no-ops replays.
    * Scale: per trigger the consumer reads O(admitted slices) and the
    * base table is never touched; offset discovery is one ledger read.
    */
  /** ORDER BY sortCol LIMIT k through the registered source — the
    * "latest few / earliest few" query every table UI and debugging
    * session runs, answered without scanning the table: the V2 scan's
    * TopN pushdown keeps only the files whose `o_orderdate` bounds
    * can still reach the top k (covering-prefix truncation over the
    * stats manifest — `GraftTable.topnTruncate`). The in-query
    * contract pins that the planned scan (a) actually received the
    * pushed TopN and (b) read strictly fewer files than the
    * snapshot holds; the hash pins that truncation never changed
    * the answer (the oracle recomputes the table state and top-k
    * from raw orders). Secondary sort on the unique key makes the
    * k-set deterministic.
    */
  val qSourceTopn: QuerySpec = QuerySpec(
    "q_source_topn",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          o_orderpriority,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log)
      SELECT o_custkey AS custkey, o_orderdate AS odate,
        o_orderkey AS okey, true AS pruned
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY odate, custkey LIMIT 10"""),
    (spark, dir) => {
      import graft.sources.Ingest
      import graft.sources.TableStore
      implicit val store: TableStore = TableStore.local
      val table = sharedSourceTable(spark, dir)
      val df = spark.read.format("graft").load(table)
        .orderBy(col("o_orderdate"), col("o_custkey"))
        .limit(10)
        .select(col("o_custkey").as("custkey"),
          col("o_orderdate").as("odate"), col("o_orderkey").as("okey"),
          lit(true).as("pruned"))
      // in-query contract: force one (cheap) execution so the adaptive
      // plan finalizes, then require the pushed TopN truncated the scan
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.description().contains("topn: o_orderdate asc 10") => b
      }
      require(scans.nonEmpty, "topN was not pushed into the graft scan")
      val nFiles = scans.head.inputPartitions.map {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.length
        case _ => 1
      }.sum
      val total = graft.sources.StatsManifest.fileRowCounts(spark,
        store.child(Ingest.snapshotVersionDir(table),
          graft.sources.StatsManifest.ManifestDir)).map(_.size)
        .getOrElse(0)
      require(total > 0 && nFiles < total,
        s"topN read $nFiles of $total files — no truncation engaged")
      df
    })

  val qStreamSourceFormat: QuerySpec = QuerySpec(
    "q_stream_source_format",
    qCdfMv.oracle,
    (spark, dir) => {
      import graft.sources.Ingest
      val table = sharedSourceTable(spark, dir) // feed on, 4 batches
      val base = graft.Scratch.dir("stream-source-format")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      new java.io.File(base).mkdirs()
      val mv = s"$base/mv"
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      def fold(batch: DataFrame, id: Long): Unit = {
        val delta = batch
          .select(col("o_orderpriority").as("prio"), sign.as("s"),
            (sign * round(col("o_totalprice") * 100, 0).cast("long")).as("sc"))
          .groupBy("prio").agg(sum("s").as("n"), sum("sc").as("cents"))
        val merged =
          if (!new java.io.File(mv, "CURRENT").exists()) delta
          else Ingest.readUpsertTable(spark, mv)
            .unionByName(delta)
            .groupBy("prio").agg(sum("n").as("n"), sum("cents").as("cents"))
        // one bucket: the MV is keyed on the 5 priority groups — a
        // cardinality that does NOT grow with data — so extra hash
        // buckets only multiply per-commit write partitions (r17)
        Ingest.upsertParquet(mv, Seq("prio"), nBuckets = 1)(merged, id)
      }
      EventOps.withStreamSizing(spark) {
        // one ledger batch per trigger: exercises the admission-control
        // path and proves the fold is batch-incremental end to end
        val src = spark.readStream.format("graft")
          .option("read", "changes")
          .option("maxBatchesPerTrigger", "1").load(table)
        require(src.isStreaming, "format stream is not a streaming frame")
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(fold)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      Ingest.readUpsertTable(spark, mv)
        .filter(col("n") =!= 0)
        .select(col("prio"), col("n"),
          (col("cents").cast("double") / 100).as("spend"))
        .orderBy("prio")
    })

  /** Metadata aggregates from PLAIN SQL: `SELECT count(*) [WHERE
    * sortCol BETWEEN …]` / `MIN/MAX(sortCol)` over a `CREATE TABLE …
    * USING graft` catalog table answer from the stats manifest — the
    * V2 scan's [[org.apache.spark.sql.connector.read.SupportsPushDownAggregates]]
    * replaces the data scan with a manifest fold (plus boundary-file
    * reads for band edges), closing the r15 gap where only the library
    * spelling (`countWhere` / `minMaxMeta`) reached the metadata path.
    * In-query contracts: each statement's optimized plan carries the
    * aggregate IN ITS SCAN (readSchema is the aggregate row — no data
    * columns survive), and the library twin confirms the unbounded
    * count is answerable with ZERO scanned data files. The unsound
    * cases (deletion vector, non-stat filter) are spec-pinned to
    * DECLINE in GraftSourceSpec. DuckDB recomputes all four values
    * from the raw changelog fold.
    */
  val qSourceAggSql: QuerySpec = QuerySpec(
    "q_source_agg_sql",
    Some("""WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        FROM orders),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM log),
      cur AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D')
      SELECT count(*) AS n_total,
        count(*) FILTER (WHERE o_orderdate
          BETWEEN TIMESTAMP '1999-01-01 00:00:00'
          AND TIMESTAMP '1999-12-31 23:59:59') AS n_band,
        min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        true AS pushed
      FROM cur"""),
    (spark, dir) => {
      import graft.sources.Ingest
      implicit val tstore: graft.sources.TableStore =
        graft.sources.TableStore.local
      val table = sharedSortedTable(spark, dir)
      spark.sql("DROP TABLE IF EXISTS graft_meta_sql")
      spark.sql(
        s"CREATE TABLE graft_meta_sql USING graft OPTIONS (path '$table')")
      def pushedInScan(df: DataFrame, marker: String): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation => r.scan
        }.exists(_.readSchema().fieldNames.contains(marker))
      val cnt = spark.sql("SELECT count(*) AS n_total FROM graft_meta_sql")
      require(pushedInScan(cnt, "count(*)"),
        "plain-SQL COUNT(*) did not push into the graft scan")
      val band = spark.sql(
        """SELECT count(*) AS n_band FROM graft_meta_sql
           WHERE o_orderdate BETWEEN TIMESTAMP '1999-01-01 00:00:00'
             AND TIMESTAMP '1999-12-31 23:59:59'""")
      require(pushedInScan(band, "count(*)"),
        "banded SQL COUNT did not push into the graft scan")
      val mm = spark.sql(
        """SELECT min(o_orderdate) AS min_date,
             max(o_orderdate) AS max_date FROM graft_meta_sql""")
      require(pushedInScan(mm, "min(o_orderdate)"),
        "SQL MIN/MAX did not push into the graft scan")
      // the library twin pins the ZERO-data-I/O property of the
      // manifest path this SQL now rides
      require(Ingest.countWhere(spark, table).scannedFiles == 0L,
        "metadata count path opened data files — manifest unhealthy")
      cnt.crossJoin(band).crossJoin(mm)
        .withColumn("pushed", lit(true))
    })

  /** Catalog-native time travel end to end: CREATE TABLE through the
    * `graft` [[graft.sources.GraftCatalog]] (multipart name, no path in
    * the query text), two INSERT INTO batches, then one SQL statement
    * joining CURRENT state against `VERSION AS OF 1` — the DuckDB
    * oracle recomputes both states from `customer` directly, so the
    * hash pins the whole catalog route: identifier→directory
    * resolution, the create-time empty batch, INSERT-as-committed-
    * batch, and ledgered version resolution inside a multipart-name
    * query. The update arithmetic stays elementwise (IEEE-identical in
    * both engines, no rounding).
    */
  val qCatalogTimetravel: QuerySpec = QuerySpec(
    "q_catalog_timetravel",
    Some("""SELECT c_custkey,
        CAST(c_acctbal AS DOUBLE) AS bal_v1,
        CAST(CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 100
             ELSE c_acctbal END AS DOUBLE) AS bal_cur
      FROM customer WHERE c_custkey % 3 = 0 ORDER BY c_custkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "customer")
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_acctbal"))
        .createOrReplaceTempView("tt_src")
      spark.sql("DROP NAMESPACE IF EXISTS graft.tt CASCADE")
      spark.sql("CREATE NAMESPACE graft.tt")
      spark.sql("""CREATE TABLE graft.tt.cust (c_custkey BIGINT,
        c_acctbal DOUBLE) TBLPROPERTIES ('keys'='c_custkey',
        'sortcols'='c_custkey', 'keepversions'='4')""")
      spark.sql("INSERT INTO graft.tt.cust SELECT * FROM tt_src")
      spark.sql("""INSERT INTO graft.tt.cust
        SELECT c_custkey, c_acctbal + 100 FROM tt_src
        WHERE c_custkey % 6 = 0""")
      spark.sql("""SELECT cur.c_custkey, v1.c_acctbal AS bal_v1,
          cur.c_acctbal AS bal_cur
        FROM graft.tt.cust cur
        JOIN (SELECT * FROM graft.tt.cust VERSION AS OF 1) v1
          USING (c_custkey)
        ORDER BY c_custkey""")
    })

  def specs: Seq[QuerySpec] =
    Seq(qCdcApply, qScd2, qStreamCdc, qStreamCdcTable, qTableCdf,
      qTableCdfSql, qUpsertLookup, qUpsertEvolve, qUpsertRebucket,
      qUpsertRestore, qUpsertClone, qUpsertWap, qUpsertDml, qUpsertCompact,
      qMultiCommit, qCdfMv,
      qCdfStarMv, qStreamCdfMv, qStreamFeedMv, qUpsertMor, qUpsertStatsPrune,
      qUpsertOptimize, qSecondaryIndex, qStreamIndex, qUpsertHistory,
      qTableReplica, qIncrementalAgg, qStreamMv, qUpsertObjectStore,
      qUpsertTag, qUpsertQuarantine, qStreamQuarantine, qUpsertRequeue,
      qUpsertZorder, qUpsertMerge, qUpsertMergeSql, qUpsertMetaCount,
      qUpsertColmap, qStreamMerge,
      qSourceRead, qSourceSql, qSourceCdf, qStreamSourceFormat,
      qSourceAggSql, qSourceTopn, qCatalogTimetravel)
}
