package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Source/sink facade (SURVEY.md §2.1) beyond the native Parquet path.
  *
  * The reference's services ingest delimited/JSON surveillance feeds into
  * a MySQL 5.6 tier (`mysql-persistent-template.json:68`); here the same
  * surface is Spark readers with *declared* schemas and FAILFAST parsing
  * (ANSI-strict — a malformed feed fails the job instead of silently
  * nulling), plus JDBC interop for the legacy wire protocol.
  */
object Ingest {

  // --- batch sources ---

  /** Strict CSV: declared schema, header, fail on malformed rows. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Strict JSON-lines with declared schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** JDBC read against the legacy relational tier (MySQL wire :3306).
    * `partitionColumn`/bounds split the scan into `numPartitions`
    * parallel range queries — the knob that makes a JDBC scan scale.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: Option[(String, Long, Long, Int)] = None,
               props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withPart = partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  // --- batch sinks ---

  /** Parquet sink, optionally hive-partitioned by columns (the layout
    * that enables partition pruning downstream, SURVEY.md §4).
    */
  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append,
                props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
    props.foldLeft(w) { case (r, (k, v)) => r.option(k, v) }.save()
  }

  // --- streaming sources / sinks ---

  /** File-based streaming source (new files under `path` become
    * micro-batches) with declared schema. `path` may be a glob; when it
    * does not itself name a directory (e.g. a single-file fixture),
    * pass the enclosing directory as `basePath` — the source requires a
    * directory there for partition discovery.
    */
  def readStreamFiles(spark: SparkSession, path: String, schema: StructType,
                      format: String = "parquet",
                      basePath: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schema).format(format)
    basePath.fold(r)(b => r.option("basePath", b)).load(path)
  }

  /** Exactly-once parquet streaming sink: checkpointed append. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())

  /** Idempotent micro-batch sink: hands (batchDF, batchId) to `write`;
    * the batchId is what a JDBC/key-value upsert uses to dedupe replayed
    * batches after failure (exactly-once at the sink contract).
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String)
                      (write: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(write)

  /** Hash-bucket partition column of an upsert table (hive-style dirs
    * `bkt=N` under each version — NOT underscore-prefixed, which
    * Spark's file listing would hide).
    */
  val UpsertBucketCol = "bkt"

  /** Daemon pool for overlapping INDEPENDENT data-plane (parquet job)
    * writes inside one merge commit — guide §2.6: the scheduler
    * happily runs several jobs at once, but the sink paid each job's
    * full latency sequentially (change capture, deletion vector,
    * quarantine diversion are all independent of the main bucket
    * rewrite). Control-plane ([[TableStore]]) op ORDER is unchanged —
    * the overlapped bodies perform no store mutations — so the
    * crash-window protocol (CrashWindowSpec) is untouched, and every
    * overlapped write lands strictly before the pointer swap.
    */
  private lazy val dataPlaneEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => {
          val t = new Thread(r, "graft-merge-dataplane")
          t.setDaemon(true)
          t
        }))

  /** How long a post-commit cleanup in two-writer OCC mode shields an
    * UNCOMMITTED build dir (a competing writer's possibly-in-flight
    * merge) before treating it as crashed — see [[cleanupStale]].
    */
  val OccInflightGraceMs: Long = 10L * 60 * 1000

  /** Dead-letter area under the table root (quarantine mode — see
    * [[upsertParquet]]) and the columns stamped onto diverted rows.
    */
  val QuarantineDir = "_quarantine"
  val QuarantineReasonCol = "_violated"
  val QuarantineBatchCol = "_q_batch"

  /** Committed batchIds of an upsert table. A torn/garbage line from a
    * crash mid-append degrades to "uncommitted" (safe: the merge is
    * idempotent), never a hard failure. Shared by the writer's replay
    * check, `cleanupStale`, and — critically — the time-travel read:
    * a `v_*` directory NOT in this set is a crashed partial build and
    * must never be served as a snapshot.
    */
  private[sources] def readLedger(root: String)(implicit store: TableStore): Set[Long] =
    store.readLog(store.child(root, "_commits"))
      .flatMap(l => scala.util.Try(l.trim.split("\\s+")(0).toLong).toOption)
      .toSet

  /** One streaming-writer transaction annotation in the commit ledger:
    * `<batchId> txn=<writerId>:<microBatchId>` — the batch id and the
    * writer token ride the SAME atomic append, so a commit can never
    * exist without its dedupe record. On the object/Hadoop stores an
    * append is one atomic object; on local POSIX a torn line degrades
    * the same way the plain ledger always has (leading token kept,
    * annotation lost) — which downgrades that ONE micro-batch from
    * exactly-once to at-least-once, and an upsert re-merge of the same
    * rows is state-idempotent.
    */
  private val TxnLine = """(\d+)\s+txn=([A-Za-z0-9._\-]+):(\d+)(?:\s.*)?""".r

  /** `ts=<epochMillis>` commit-wall-clock annotation (always the LAST
    * token — annotations compose left-to-right after the batch id).
    * Powers TIMESTAMP AS OF; commits from builds predating the
    * annotation simply have none and resolve as "before every
    * timestamped commit", which is chronologically true.
    */
  private val TsToken = """\bts=(\d+)\b""".r

  /** batch id → commit wall-clock millis, for the commits that carry
    * the annotation.
    */
  private[sources] def readCommitTimes(root: String)
                                      (implicit store: TableStore)
      : Map[Long, Long] =
    store.readLog(store.child(root, "_commits"))
      .flatMap { l =>
        for {
          b <- scala.util.Try(l.trim.split("\\s+")(0).toLong).toOption
          m <- TsToken.findFirstMatchIn(l)
        } yield b -> m.group(1).toLong
      }.toMap

  /** The newest committed batch whose commit wall-clock is at or
    * before `millis` — TIMESTAMP AS OF resolution. Commits without a
    * `ts=` annotation (pre-upgrade) count as arbitrarily old. Refuses
    * a timestamp before the first commit (there is no servable state
    * then). Wall-clock ordering follows ledger order under the
    * format's single-writer-per-table protocol; a skewed clock can
    * reorder annotations but never changes WHICH states existed.
    */
  def batchAtTimestamp(tableDir: String, millis: Long)
                      (implicit store: TableStore): Long = {
    val times = readCommitTimes(tableDir)
    val eligible = readLedger(tableDir)
      .filter(b => times.get(b).forall(_ <= millis))
    require(eligible.nonEmpty,
      s"no commit of $tableDir is at or before timestamp $millis — " +
        "the table did not exist yet (earliest commit is " +
        s"${readLedger(tableDir).minOption.map(b => times.get(b)
          .map(_.toString).getOrElse("untimestamped"))
          .getOrElse("<none>")})")
    eligible.max
  }

  /** Streaming writer transactions: writerId → (highest recorded
    * micro-batch id, the TABLE batch id it committed as). The table
    * batch id is what the replay no-op path heals feed publication
    * with; per-writer max because micro-batch ids are contiguous per
    * checkpoint.
    */
  private def readTxns(root: String)(implicit store: TableStore)
      : Map[String, (Long, Long)] =
    store.readLog(store.child(root, "_commits"))
      .flatMap { l =>
        l.trim match {
          case TxnLine(b, w, mb) =>
            scala.util.Try((w, mb.toLong, b.toLong)).toOption
          case _ => None
        }
      }
      .groupBy(_._1)
      .map { case (w, es) =>
        val top = es.maxBy(_._2)
        w -> (top._2, top._3)
      }

  /** Public read of the committed-batch ledger — the freshness token
    * external derivations (e.g. [[graft.plans.MvCatalog.UpsertPin]])
    * pin and re-check: any newer committed batch means state derived
    * earlier may lag.
    */
  def committedBatchIds(tableDir: String)
                       (implicit store: TableStore): Set[Long] =
    readLedger(tableDir)

  /** Version-dir name: `v_<batchId>` (generation 0 — written by the
    * upsert protocol itself; complete iff its batchId is in the
    * ledger) or `v_<batchId>.<gen>` (gen ≥ 1 — a MAINTENANCE rewrite
    * of the same committed state, e.g. [[rebucketUpsertTable]];
    * complete iff the dir holds `_gen_commit`, written last). A
    * maintenance pass never mints a batchId — the ledger stays the
    * batch history, generations are physical re-layouts of one batch's
    * state — so a streaming writer's monotone batchIds can never
    * collide with maintenance commits.
    */
  private def parseVersion(name: String): Option[(Long, Int)] =
    if (!name.startsWith("v_")) None
    else name.stripPrefix("v_").split("\\.", 2) match {
      case Array(b) => scala.util.Try(b.toLong).toOption.map(_ -> 0)
      case Array(b, g) => for {
        bb <- scala.util.Try(b.toLong).toOption
        gg <- scala.util.Try(g.toInt).toOption
      } yield (bb, gg)
      case _ => None
    }

  private def versionName(b: Long, gen: Int): String =
    if (gen == 0) s"v_$b" else s"v_$b.$gen"

  private def readCurrentName(root: String)
                             (implicit store: TableStore): Option[String] =
    store.read(store.child(root, "CURRENT")).map(_.trim).filter(_.nonEmpty)

  /** All version dirs under `root` as (dirName, batchId, gen). */
  private def versionDirs(root: String)
                         (implicit store: TableStore): Seq[(String, Long, Int)] =
    store.listNames(root).filter(n => store.isDirectory(store.child(root, n)))
      .flatMap(n => parseVersion(n).map { case (b, g) => (n, b, g) })

  /** Is this dir a COMPLETE snapshot? Gen 0 completeness is the
    * ledger's job (callers intersect with it); a gen ≥ 1 dir is
    * complete iff CURRENT names it or its `_gen_commit` marker exists
    * (written after data + feed + metadata, before the pointer swap) —
    * a crashed maintenance rewrite is therefore never servable. A dir
    * carrying the `_sweeping` marker ([[sweepDir]]) is NEVER complete
    * whatever its generation: a sweep died mid-delete, so the dir may
    * be missing arbitrary files — serving it would return silently
    * partial data (the one as-of crash window the marker closes).
    */
  private def genComplete(root: String, name: String, gen: Int,
                          cur: Option[String])
                         (implicit store: TableStore): Boolean = {
    val dir = store.child(root, name)
    !store.exists(store.child(dir, "_sweeping")) &&
      (gen == 0 || cur.contains(name) ||
        store.exists(store.child(dir, "_gen_commit")))
  }

  /** Delete a version dir crash-safely: stamp `_sweeping` FIRST (an
    * atomic whole-object put), then delete the tree. A crash
    * mid-delete leaves a half-deleted dir that [[genComplete]] then
    * refuses to serve (an as-of read fails loudly as beyond-retention
    * instead of silently returning the surviving fraction of the
    * rows), and the next cleanup re-sweeps it idempotently — the
    * marker is inside the dir, so completing the delete removes it.
    */
  private def sweepDir(dir: String)(implicit store: TableStore): Unit = {
    store.writeAtomic(dir, "_sweeping", "")
    store.deleteTree(dir)
  }

  /** The servable dir (full path) for committed batch `b`: its highest
    * COMPLETE generation (a maintenance rewrite holds the same state
    * laid out better, so newest generation always wins).
    */
  private[sources] def servableDir(root: String, b: Long)
                         (implicit store: TableStore): Option[String] = {
    val cur = readCurrentName(root)
    versionDirs(root)
      .collect { case (n, `b`, g) if genComplete(root, n, g, cur) => (n, g) }
      .sortBy(-_._2).headOption.map(p => store.child(root, p._1))
  }

  /** Drop anything not referenced: crashed partial builds (a gen-0 dir
    * whose batchId is NOT in the ledger, or a gen ≥ 1 dir with no
    * `_gen_commit` that CURRENT doesn't name — garbage whatever its
    * numbers; swept immediately under the single-writer contract), an
    * orphaned pointer tmp, committed versions beyond the retention
    * window (CURRENT plus the keepVersions-1 highest-batchId committed
    * others, each represented by its highest complete generation), and
    * superseded generations of a retained batch. `graceMs` hardens the
    * reader/retention race: a complete COMMITTED dir younger (by build
    * mtime) than the grace window survives even when out of retention,
    * so deleting a snapshot from under a reader requires BOTH an
    * out-of-retention snapshot AND a reader older than the grace.
    *
    * `inflightGraceMs` (zero under the single-writer contract, where an
    * uncommitted dir is by definition a crashed build and is swept
    * immediately) additionally shields UNCOMMITTED gen-0 dirs younger
    * than the window: in two-writer OCC mode the competing writer's
    * `v_<batchId>` build is legitimately mid-write when this writer's
    * post-commit cleanup runs, and deleting it would kill the
    * competitor's Spark write with an arbitrary IOException instead of
    * letting its pointer CAS lose cleanly. A genuinely crashed build
    * then lingers one window before a later cleanup sweeps it — the
    * price of not being able to distinguish "crashed" from "in flight"
    * on a filesystem.
    */
  private def cleanupStale(root: String, keepVersions: Int,
                           graceMs: Long, inflightGraceMs: Long = 0L)
                          (implicit store: TableStore): Seq[String] = {
    val cur = readCurrentName(root)
    val committed = readLedger(root)
    val now = System.currentTimeMillis()
    val vds = versionDirs(root)
    val curBatch = cur.flatMap(parseVersion).map(_._1)
    // tag pins extend retention: a tagged batch survives every sweep
    // until its tag drops. Pinned batches may sit BELOW the retention
    // suffix — the as-of read's vanished-middle guard knows a pin can
    // legitimately break the suffix shape (see resolveVersionDir).
    val pinned = tagPinnedBatches(root)
    val retainedBatches = (vds.map(_._2).distinct.filter(committed.contains)
      .sorted(Ordering[Long].reverse).take(math.max(1, keepVersions)) ++
      pinned.filter(committed.contains)).toSet
    // one keeper dir per retained batch: what CURRENT names for the
    // current batch, the highest complete generation otherwise
    val keep: Set[String] = retainedBatches.flatMap { b =>
      if (curBatch.contains(b)) cur
      else vds.collect { case (n, `b`, g) if genComplete(root, n, g, cur) => (n, g) }
        .sortBy(-_._2).headOption.map(_._1)
    } ++ cur
    val swept = vds.filterNot { case (n, _, _) => keep.contains(n) }
      .filterNot { case (n, b, g) =>
        committed.contains(b) && genComplete(root, n, g, cur) &&
          graceMs > 0 && now - store.lastModified(store.child(root, n)) < graceMs
      }
      .filterNot { case (n, b, g) =>
        // possibly a competing OCC writer's in-flight build — see
        // above. Liveness, not age: a directory's own mtime freezes
        // the moment Spark creates `_temporary` under it, so a merge
        // whose write outlives the grace window would lose its shield
        // mid-write if we aged by the top-level stamp; the shallow
        // walk sees task dirs churning under `_temporary/...`
        g == 0 && !committed.contains(b) && inflightGraceMs > 0 &&
          now - newestMtime(store.child(root, n)) < inflightGraceMs
      }
      // OLDEST FIRST — the crash-safety invariant of the whole sweep.
      // Deleting in ascending (batchId, gen) order means a crash at
      // ANY point leaves the still-present committed batches a
      // contiguous SUFFIX of the ledger: a fully-vanished batch
      // implies everything older is gone too, so an as-of read that
      // would have served it fails loudly on the empty-eligible
      // require (or the vanished-middle guard) instead of silently
      // falling back to an older snapshot. Sweeping in listing order
      // (UNSPECIFIED — observed v_1 before v_0) let a crash after a
      // fully-deleted MIDDLE version hand asOf(1) batch-0 state with
      // no error.
      .sortBy { case (_, b, g) => (b, g) }
      .map { case (n, _, _) => sweepDir(store.child(root, n)); n }
    store.delete(store.child(root, "CURRENT.tmp"))
    swept
  }

  /** Newest modification time anywhere in `dir`'s WRITE-ACTIVITY
    * surface: an in-flight Spark write keeps mutating task dirs under
    * `_temporary/0/_temporary/attempt_...` long after the top dir's own
    * mtime froze at creation — liveness detection must look below the
    * surface. Outside `_temporary` the walk is depth-bounded (cheap
    * LIST discipline); a `_temporary` subtree is walked WITHOUT a
    * depth bound, because that is exactly where a long-running task's
    * only churn lives — a single task writing one large file for
    * longer than the grace window advances only leaf mtimes at depth
    * 4+, and a bounded walk that missed them would expire the shield
    * and let a competitor sweep a LIVE build mid-write (recoverable by
    * the OCC re-merge, terminal on the last retry). Cost stays
    * bounded: called only for UNCOMMITTED sweep candidates (rare), and
    * `_temporary` holds only the in-flight attempt's files. A
    * genuinely crashed build's `_temporary` mtimes are frozen, so the
    * deep walk never delays its reaping past the grace window.
    */
  private def newestMtime(dir: String, depth: Int = 3)
                         (implicit store: TableStore): Long = {
    val own = store.lastModified(dir)
    if (depth <= 0) own
    else store.listNames(dir).map { n =>
      val c = store.child(dir, n)
      val childDepth = if (n == "_temporary") Int.MaxValue else depth - 1
      if (store.isDirectory(c)) newestMtime(c, childDepth)
      else store.lastModified(c)
    }.foldLeft(own)(math.max)
  }

  /** Hard-link `src` into `dstDir` under the same name (copy fallback —
    * see [[TableStore.linkOrCopy]]'s contract).
    */
  private def linkInto(src: String, dstDir: String)
                      (implicit store: TableStore): Unit =
    store.linkOrCopy(src, store.child(dstDir, store.baseName(src)))

  /** Keyed MERGE/upsert for a [[foreachBatchSink]] body — a minimal
    * copy-on-write table format with the exactly-once REPLAY contract
    * made explicit. Layout under `tableDir`:
    *
    *   - `v_<batchId>/bkt=N/part-….parquet` — immutable versioned
    *     snapshots, hash-bucketed on `keys`
    *     (`pmod(xxhash64(keys), nBuckets)`)
    *   - `CURRENT` — the snapshot pointer; updated by writing
    *     `CURRENT.tmp` and an ATOMIC rename over it, so readers
    *     ([[readUpsertTable]]) always resolve a fully-written version —
    *     old or new, never partial, with NO window where the table is
    *     absent (the r8 delete-then-rename swap had one)
    *   - `_commits` — append-only batchId ledger, written AFTER the
    *     pointer swap; parsed defensively (a torn line from a crash
    *     mid-append degrades to "uncommitted", which is safe because
    *     the merge is idempotent — never a hard failure)
    *
    * The rewrite is PARTITION-SCOPED: only buckets containing batch
    * keys are merged and rewritten; every untouched bucket hard-links
    * its files into the new version — zero data I/O, byte-identical by
    * construction (same inode), which is the logical sharing a
    * manifest-based table format gets from immutable data files. Batch
    * cost is therefore O(touched buckets), not O(table): at 100 TB
    * with nBuckets sized so a bucket is a few GB, a keyed micro-batch
    * rewrites only the buckets it lands in.
    *
    * Crash windows, enumerated against the protocol order
    * (build v_new → swap CURRENT → append ledger → delete old version):
    * before the swap, the partial `v_<batchId>` is unreferenced and is
    * rebuilt from scratch on replay; between swap and ledger append,
    * replay sees `CURRENT == v_<batchId>` and only re-appends the
    * commit record (the state already includes the batch); after the
    * append, replay no-ops off the ledger. Old versions are deleted
    * only after commit, and hard links keep shared files alive. A
    * reader holding a snapshot OLDER than the retention window still
    * races its deletion — single-writer, readers-on-retained-snapshots
    * is the isolation contract, and `keepVersions` sizes that window.
    *
    * `batch` must be unique per `keys` (pre-reduce it in the caller —
    * e.g. max_by on an ordering column); validated on the BATCH itself
    * before any merge, so the failure blames the data that broke the
    * contract, not the merged table.
    *
    * `keepVersions` retains that many committed snapshots (CURRENT
    * included) for reader isolation and time travel
    * ([[readUpsertTable]]'s `asOfBatch`); hard links make retention
    * nearly free — an unchanged bucket's files are shared across every
    * retained snapshot, so disk cost is the churn, not
    * keepVersions × table.
    *
    * `graceMs` (opt-in) additionally keeps any committed version whose
    * build is younger than the window, even when out of retention —
    * the reader/retention race then needs a reader that has been
    * holding its snapshot for longer than the grace, not merely a
    * commit landing mid-read. Zero by default so retention stays
    * exactly keepVersions-sized for callers that want that invariant.
    *
    * `changeFeed` (opt-in, pinned at table creation like keys/buckets)
    * additionally records WHAT each batch changed — the change-data-
    * feed a downstream incremental consumer (MV refresh, replication,
    * audit) reads instead of diffing snapshots. Each version carries
    * `v_<b>/_changes/` (underscore-prefixed, so snapshot reads never
    * see it) holding full-row change records: `insert` /
    * `update_preimage` / `update_postimage` / `delete` in a
    * `_change_type` column plus `_batch_id`. Pre-images are the table
    * rows the batch replaced or deleted — classification joins the
    * batch keys (broadcast — batch-sized by definition) against only
    * the TOUCHED buckets, so the feed costs one extra scan of the
    * buckets the merge already rewrites, never a table scan. A
    * tombstone for an absent key records nothing (the merge changed
    * nothing). Feed availability is retention-bounded exactly like
    * time travel: changes live inside their version dir and are swept
    * with it ([[readTableChanges]] fails loudly past the window). A
    * committed batch that created no version (a non-first empty batch)
    * is recorded in `_empty` so the reader can prove "zero changes"
    * rather than guess.
    *
    * `deleteCol` turns the sink into a full MERGE: name a boolean
    * column of the batch and rows where it is true are TOMBSTONES —
    * their keys are removed from the table (dropped from their touched
    * bucket during the merge) instead of upserted. The tombstone's
    * non-key columns are ignored; the marker column itself is never
    * written. Tombstones participate in the same key-uniqueness
    * contract (a key appears once per batch, as a delete OR an upsert,
    * not both) and the same bucket scoping — a delete-only batch still
    * rewrites only the buckets its keys hash to. This is the CDC apply
    * path: a `Changes`-style changelog (upserts + deletes) folds into
    * the table exactly-once.
    *
    * `lazyDeletes` (requires `deleteCol`) switches deletes to
    * MERGE-ON-READ deletion vectors: a tombstone whose bucket gets no
    * upserts in the same batch is recorded in the version's
    * `_deletes/` key list instead of rewriting the bucket — the bucket
    * hard-links forward untouched, so a delete-only batch costs
    * O(delete set) writes instead of O(touched buckets) data rewrite
    * (at 100 TB: a thousand-row GDPR erasure no longer rewrites a
    * thousand multi-GB buckets). Readers ([[readUpsertTable]],
    * [[lookupUpsertTable]], time travel) anti-join the snapshot
    * against its own version's vector — each version carries exactly
    * the vector that applies to its files. The debt self-compacts:
    * whenever a later batch rewrites a bucket for its own upserts, any
    * pending vector entries for that bucket are applied during the
    * rewrite and leave the vector; [[rebucketUpsertTable]] applies and
    * clears the whole vector (full rewrite). The change feed is
    * unaffected: a lazy delete still records its `delete` pre-image
    * (capture reads the bucket — read-only — without rewriting it),
    * and vector-hidden rows are excluded from pre-images so a
    * re-upsert of a lazily-deleted key correctly records `insert`.
    *
    * `sortCols` + `filesPerBucket` pin an IN-BUCKET layout (table
    * properties): each bucket rewrite range-slices its rows on
    * (bucket, sortCols) into ~filesPerBucket sorted files and the
    * version commits a per-file min/max `_stats/` manifest (fresh for
    * rewritten buckets, carried+path-remapped for linked ones) — the
    * bucket+sort-order layout [[readUpsertTableWhere]]'s file-list
    * skipping depends on. [[optimizeUpsertTable]] restores it after
    * churn.
    *
    * `constraints` (create-time, immutable) pin named CHECK
    * expressions enforced on every batch's upsert rows with
    * reject-batch semantics: a violating batch throws (blaming each
    * broken constraint by name and row count) and writes NOTHING —
    * the table never holds a row that fails its invariants. ANSI
    * CHECK: NULL passes; spell NOT NULL as `c IS NOT NULL`.
    * Expressions must reference TABLE columns only: tombstones are
    * exempt by contract (the check filters them out first), so the
    * delete flag is never needed — and op-generated batches (RESTORE,
    * PUBLISH) carry their own flag name, so an expression naming the
    * creating batch's flag would fail to resolve on them (it throws a
    * clear error, nothing is written).
    *
    * `quarantine` switches constraint enforcement from reject-batch to
    * DEAD-LETTER semantics: violating upsert rows are diverted to the
    * table's `_quarantine/b_<batchId>/` area (stamped with the broken
    * constraint names and batch id — read them back with
    * [[readQuarantine]]) and the clean remainder commits, so one bad
    * row no longer stalls a streaming pipeline. The table invariant is
    * unchanged — no committed row ever violates a pinned constraint;
    * what changes is where the violations go. Key uniqueness is
    * checked on the SURVIVING rows (a duplicate whose twin was
    * quarantined commits cleanly).
    *
    * `occRetries` sets the TWO-WRITER behavior. The sink is
    * single-writer by default (`0`): a competing commit detected at
    * the pointer CAS throws [[java.util.ConcurrentModificationException]]
    * and this batch writes nothing durable — fix the deployment.
    * With `occRetries > 0`, a detected conflict instead RE-MERGES the
    * batch against the snapshot the competitor published and retries
    * the CAS (up to the given number of times) — the optimistic-
    * concurrency loop that lets two legitimate writers share a table
    * without lost updates: each commit's merge base is the other's
    * committed snapshot, never a stale read. The lost-update guarantee
    * is exactly as strong as the store's [[TableStore.putConditional]]
    * (airtight within one JVM and on conditional-put object stores;
    * best-effort — microsecond window — across processes on a plain
    * filesystem). A conflict can also surface as an arbitrary I/O
    * failure BEFORE the CAS (the competitor's post-commit cleanup
    * sweeping this writer's in-flight build): with retries armed, any
    * failure while CURRENT provably moved re-merges too, and each
    * OCC-mode cleanup shields young uncommitted builds
    * ([[OccInflightGraceMs]]) so the race is closed from both sides.
    * Retries re-run the merge at full cost; contended tables should
    * still prefer one writer per table.
    */
  def upsertParquet(tableDir: String, keys: Seq[String], nBuckets: Int = 16,
                    keepVersions: Int = 1, deleteCol: Option[String] = None,
                    graceMs: Long = 0L, changeFeed: Boolean = false,
                    lazyDeletes: Boolean = false,
                    sortCols: Seq[String] = Nil,
                    filesPerBucket: Int = 4,
                    constraints: Seq[(String, String)] = Nil,
                    occRetries: Int = 0,
                    quarantine: Boolean = false,
                    txn: Option[(String, Long)] = None)
                   (batch: DataFrame, batchId: Long)
                   (implicit store: TableStore): Unit = {
    // column mapping: callers speak LOGICAL names (keys, sortCols and
    // the batch itself); storage speaks physical — translate once here
    val cm = colMap(tableDir)
    // occMode reflects "this TABLE is operated two-writer" and must
    // survive the retry countdown: deriving it from retries-remaining
    // would run the LAST retry's post-commit cleanup with no in-flight
    // shield, re-opening the sweep race on exactly the attempt that
    // can no longer re-merge
    upsertWithRetry(tableDir, keys.map(toPhysicalName(cm, _)), nBuckets,
      keepVersions, deleteCol,
      graceMs, changeFeed, lazyDeletes,
      sortCols.map(toPhysicalName(cm, _)), filesPerBucket,
      constraints, occRetries, occMode = occRetries > 0,
      quarantine = quarantine, txn = txn)(
      physicalizeBatch(tableDir, batch, deleteCol.toSet), batchId)
  }

  private def upsertWithRetry(tableDir: String, keys: Seq[String],
                    nBuckets: Int, keepVersions: Int,
                    deleteCol: Option[String], graceMs: Long,
                    changeFeed: Boolean, lazyDeletes: Boolean,
                    sortCols: Seq[String], filesPerBucket: Int,
                    constraints: Seq[(String, String)],
                    retriesLeft: Int, occMode: Boolean,
                    quarantine: Boolean = false,
                    txn: Option[(String, Long)] = None)
                   (batch: DataFrame, batchId: Long)
                   (implicit store: TableStore): Unit = {
    // consulted only by the OCC conflict guard below — single-writer
    // tables (the default, dominant path) skip the extra control read
    val before = if (occMode) readCurrentName(tableDir) else None
    def retry(): Unit =
      upsertWithRetry(tableDir, keys, nBuckets, keepVersions, deleteCol,
        graceMs, changeFeed, lazyDeletes, sortCols, filesPerBucket,
        constraints, retriesLeft - 1, occMode, quarantine, txn)(batch, batchId)
    try upsertOnce(tableDir, keys, nBuckets, keepVersions, deleteCol,
      graceMs, changeFeed, lazyDeletes, sortCols, filesPerBucket,
      constraints, occMode = occMode, quarantine = quarantine,
      txn = txn)(batch, batchId)
    catch {
      // a competing commit moved CURRENT mid-merge: nothing durable was
      // written, the merge is replay-idempotent, so re-merging against
      // the competitor's snapshot is a clean second attempt
      case _: java.util.ConcurrentModificationException if retriesLeft > 0 =>
        retry()
      // any OTHER failure while CURRENT provably moved under us is the
      // same conflict wearing a different exception: the competitor's
      // post-commit cleanup may have swept this writer's in-flight
      // v_<batchId> build (killing the Spark write with an arbitrary
      // IOException before the CAS could lose cleanly). Our pointer
      // never swapped — or swapped and the replay path below completes
      // the commit idempotently — so a re-merge is safe either way.
      // EXCEPT the sink's own deterministic batch validation
      // (IllegalArgumentException: constraint violations, NULL delete
      // flags, duplicate keys, meta mismatches) — a permanently-bad
      // batch fails identically against any snapshot, so re-merging
      // because a competitor HAPPENED to commit concurrently would
      // burn every retry at full merge cost and bury the real error
      // until the last attempt.
      case scala.util.control.NonFatal(e)
          if retriesLeft > 0 && !e.isInstanceOf[IllegalArgumentException] &&
            readCurrentName(tableDir) != before =>
        retry()
    }
  }

  private def upsertOnce(tableDir: String, keys: Seq[String], nBuckets: Int,
                    keepVersions: Int, deleteCol: Option[String],
                    graceMs: Long, changeFeed: Boolean,
                    lazyDeletes: Boolean,
                    sortCols: Seq[String],
                    filesPerBucket: Int,
                    constraints: Seq[(String, String)],
                    occMode: Boolean,
                    quarantine: Boolean,
                    txn: Option[(String, Long)] = None)
                   (batch: DataFrame, batchId: Long)
                   (implicit store: TableStore): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col, collect_set,
      count, first, lit, max, pmod, sum, when, xxhash64}
    val spark = batch.sparkSession
    val root = tableDir
    store.mkdirs(root)
    val commitsPath = store.child(root, "_commits")

    // keys and bucket count are TABLE properties, not call options: a
    // batch hashed with a different nBuckets would scope its merge to
    // the wrong buckets and leave the same key alive in two places.
    // First writer pins them in _meta (atomic rename); every later
    // call must match or fail loudly.
    require(sortCols.forall(batch.columns.contains),
      s"upsertParquet: sortCols ${sortCols.mkString(",")} not all present " +
        s"in the batch (columns: ${batch.columns.mkString(",")})")
    val metaStr = s"keys=${keys.mkString(",")}\nbuckets=$nBuckets\n" +
      (if (sortCols.isEmpty) ""
       else s"sort=${sortCols.mkString(",")}\nfpb=$filesPerBucket\n")
    store.read(store.child(root, "_meta")) match {
      case None => store.writeAtomic(root, "_meta", metaStr)
      case Some(have) => require(have == metaStr,
        s"upsertParquet: table $tableDir was created with [${have.trim
          .replace('\n', ' ')}] but this call passed [${metaStr.trim
          .replace('\n', ' ')}] — keys are immutable; the bucket count " +
          "changes only through rebucketUpsertTable (then pass the new count)")
    }
    // the change feed is a table property too: a feed with silent holes
    // (some batches recorded, some not) is worse than no feed, so the
    // marker is pinned before the first commit and every later call
    // must agree with it
    val cdfPath = store.child(root, "_cdf")
    if (changeFeed && !store.exists(cdfPath)) {
      require(readLedger(root).isEmpty,
        s"upsertParquet: table $tableDir has committed batches with no " +
          "change feed — the feed cannot start mid-history")
      store.writeAtomic(root, "_cdf", "")
    }
    require(!store.exists(cdfPath) || changeFeed,
      s"upsertParquet: table $tableDir records a change feed — " +
        "pass changeFeed=true (a silent hole would corrupt the feed)")
    // CHECK constraints are a create-time table property: pinned in
    // `_constraints` before the first commit, enforced on every later
    // batch whatever the caller passes (an invariant the table only
    // sometimes holds is not an invariant). ANSI CHECK semantics: a
    // row violates only when the expression is definitively FALSE —
    // NULL passes (write `c IS NOT NULL` for NOT NULL).
    val pinnedCons: Seq[(String, String)] =
      store.read(store.child(root, "_constraints")) match {
        case Some(pinned) =>
        val have = pinned
          .linesIterator.filter(_.nonEmpty)
          .map(_.split("=", 2)).collect { case Array(n, e) => n -> e }.toSeq
        // subset comparison (by name+expr): the pinned set can only
        // GROW through the explicit, data-validating ALTER
        // ([[addTableConstraint]]) — a caller still passing the
        // creation-time set remains correct; enforcement always uses
        // the PINNED set whatever the caller passes
        require(constraints.toSet.subsetOf(have.toSet),
          s"upsertParquet: table $tableDir pins constraints " +
            s"[${have.map(_._1).mkString(",")}] — pass a subset or none " +
            "(the sink cannot introduce constraints; use " +
            "addTableConstraint / GRAFT ALTER ADD CONSTRAINT)")
        have
      case None if constraints.nonEmpty =>
        require(readLedger(root).isEmpty,
          s"upsertParquet: table $tableDir has committed batches with no " +
            "constraints — invariants cannot start mid-history")
        require(constraints.forall(c => c._1.nonEmpty && !c._1.contains("=")),
          "upsertParquet: constraint names must be non-empty and '='-free")
        store.writeAtomic(root, "_constraints",
          constraints.map { case (n, e) => s"$n=$e" }.mkString("", "\n", "\n"))
        constraints
      case None => Nil
    }

    def readCurrent(): Option[String] = readCurrentName(root)
    def commit(): Unit = {
      // a streaming writer's (writerId, microBatchId) token rides the
      // SAME append as the batch id — commit and dedupe record are one
      // atomic ledger entry (see TxnLine); the ts= wall-clock token
      // (always last) powers TIMESTAMP AS OF
      val ts = s"ts=${System.currentTimeMillis()}"
      store.appendLog(commitsPath, txn match {
        case Some((w, mb)) => s"$batchId txn=$w:$mb $ts"
        case None => s"$batchId $ts"
      })
      // in two-writer OCC mode the other writer's uncommitted build may
      // be legitimately in flight — shield young ones from this sweep
      cleanupStale(root, keepVersions, graceMs,
        inflightGraceMs = if (occMode) OccInflightGraceMs else 0L)
      // publish AFTER the ledger append: a crashed uncommitted build
      // must never leak feed files (its rewrite on replay could differ)
      if (changeFeed) publishFeedSlice(root, batchId)
    }

    val done: Set[Long] = readLedger(root)
    if (done.contains(batchId)) {
      // replay of a committed batch: the merge is a no-op, but heal the
      // commit→publish crash window — link any feed files the crashed
      // attempt didn't get to (idempotent per file)
      if (changeFeed) publishFeedSlice(root, batchId)
      return
    }
    val vName = s"v_$batchId"
    if (readCurrent().contains(vName)) {
      commit() // crash between swap and append: state already has the batch
      return
    }

    require(!batch.columns.contains(UpsertBucketCol),
      s"upsertParquet: batch must not carry a '$UpsertBucketCol' column")
    deleteCol.foreach { c =>
      require(batch.columns.contains(c),
        s"upsertParquet: deleteCol '$c' is not a column of the batch")
      require(!keys.contains(c), s"upsertParquet: deleteCol '$c' is a key")
    }
    require(!lazyDeletes || deleteCol.nonEmpty,
      "upsertParquet: lazyDeletes without deleteCol — there is nothing to defer")
    val bkAll = batch.withColumn(UpsertBucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the table's DATA schema (tombstone marker excluded, bucket col
    // included) — pinned once so an empty snapshot stays readable:
    // spark.read with this schema over a version holding zero data
    // files is a well-typed empty table, not an inference failure.
    // Schema EVOLUTION is widen-only: a later batch may APPEND new
    // columns (old files simply read them as null through the pinned
    // schema — no rewrite of history), but dropping or retyping a
    // pinned column fails loudly — silent narrowing is how a table
    // format corrupts its own history. The widened _schema is written
    // (atomic rename) BEFORE the version build: if the build crashes,
    // a widened schema over old data is still sound (all-null column).
    def dataOf(df: DataFrame): DataFrame = deleteCol.fold(df)(df.drop(_))
    val batchSchema = dataOf(bkAll).schema
    val tableSchema: StructType =
      store.read(store.child(root, "_schema")) match {
        case None =>
        store.writeAtomic(root, "_schema", batchSchema.json)
        batchSchema
        case Some(pinnedJson) =>
        val pinned = org.apache.spark.sql.types.DataType.fromJson(pinnedJson)
          .asInstanceOf[StructType]
        val pinnedByName = pinned.fields.map(f => f.name -> f.dataType).toMap
        val batchByName = batchSchema.fields.map(f => f.name -> f.dataType).toMap
        val missing = pinned.fieldNames.filterNot(batchByName.contains)
        require(missing.isEmpty,
          s"upsertParquet: batch $batchId is missing pinned column(s) " +
            s"[${missing.mkString(",")}] — schema evolution is widen-only")
        // catalogString compares the full type shape while ignoring
        // top-level nullability flags (sameType is private[sql])
        val retyped = pinned.fields.filter(f =>
          batchByName(f.name).catalogString != f.dataType.catalogString)
        require(retyped.isEmpty,
          s"upsertParquet: batch $batchId retypes pinned column(s) " +
            retyped.map(f => s"${f.name}: ${f.dataType.simpleString} -> " +
              batchByName(f.name).simpleString).mkString("[", ", ", "]") +
            " — schema evolution is widen-only")
        val added = batchSchema.fields.filterNot(f => pinnedByName.contains(f.name))
        if (added.isEmpty) pinned
        else {
          val widened = StructType(pinned.fields.toSeq ++ added)
          store.writeAtomic(root, "_schema", widened.json)
          widened
        }
      }
    // Optimistic concurrency: the sink is SINGLE-writer by contract
    // (a streaming query's sequential batches), but a misconfigured
    // second writer is a silent-corruption hazard — both read the same
    // CURRENT, merge independently, and the second swap DROPS the
    // first writer's batch from history. The merge records the
    // snapshot it read; the swap is a compare-and-set on the pointer
    // ([[TableStore.putConditional]]) that fails loudly on a competing
    // commit instead of publishing a lost-update. The CAS is as atomic
    // as the store backend allows: airtight within one JVM and on
    // conditional-put object stores, best-effort (microsecond window)
    // across processes on a plain filesystem.
    var mergeBase: Option[String] = None
    def swapCurrent(): Unit = {
      if (!store.putConditional(root, "CURRENT", mergeBase, vName)) {
        val now = readCurrent()
        throw new java.util.ConcurrentModificationException(
          s"upsertParquet: CURRENT of $tableDir moved from " +
            s"${mergeBase.getOrElse("<none>")} to ${now.getOrElse("<none>")} " +
            s"while batch $batchId merged — a concurrent writer committed. " +
            "This batch wrote nothing durable; replay it against the new " +
            "snapshot (the sink is single-writer; fix the deployment)")
      }
    }
    // independent data-plane writes launched during the merge and all
    // awaited BEFORE the pointer swap (and in the finally, so a crashed
    // attempt never leaves a job racing a caller's cleanup)
    val pendingDataPlane =
      scala.collection.mutable.ArrayBuffer.empty[scala.concurrent.Future[Unit]]
    def overlap(body: => Unit): Unit =
      pendingDataPlane += scala.concurrent.Future(body)(dataPlaneEc)
    def awaitDataPlane(): Unit = pendingDataPlane.foreach(f =>
      scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf))
    // label every sink job (guide §1.5) so profilers and the UI can
    // attribute a commit's job cascade phase by phase; thread-local, so
    // the overlapped data-plane bodies label their own threads
    def phase[T](name: String)(body: => T): T = {
      val sc = spark.sparkContext
      sc.setJobDescription(s"sink:$name b=$batchId")
      try body finally sc.setJobDescription(null)
    }
    try {
      val delFlag = deleteCol.map(col).getOrElse(lit(false))
      val bk: DataFrame = if (pinnedCons.isEmpty) bkAll else {
        // tombstones are exempt (their non-key columns are ignored by
        // contract). Clean batches pay one scan of the CACHED batch;
        // head(1) short-circuits on the first violating partition, and
        // only the FAILURE path pays a second pass to blame the
        // specific constraint(s) by name
        import org.apache.spark.sql.functions.{expr, sum => fsum}
        val upsertRows = deleteCol.fold(bkAll)(c => bkAll.filter(!col(c)))
        val viol =
          try pinnedCons.map { case (n, e) =>
            // resolve eagerly so a constraint referencing a column this
            // batch lacks blames the CONSTRAINT, not the merge plan.
            // The one legitimate-looking offender is the delete flag:
            // tombstones are exempt by contract, so constraints must
            // reference TABLE columns only — op-generated batches
            // (RESTORE, PUBLISH) carry their own flag name and would
            // fail to resolve the creating batch's
            val p = n -> (expr(e) <=> lit(false))
            upsertRows.filter(p._2).queryExecution.analyzed
            p
          } catch {
            case ae: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                s"upsertParquet: a pinned constraint of $tableDir does not " +
                  s"resolve against batch $batchId (${ae.getMessage.linesIterator
                    .next()}). Constraints must reference table columns " +
                  "only — tombstones are exempt by contract, so the delete " +
                  "flag is never needed in a constraint expression", ae)
          }
        val anyViol = viol.map(_._2).reduce(_ || _)
        if (upsertRows.filter(anyViol).head(1).isEmpty) bkAll
        else if (!quarantine) {
          val counts = upsertRows.agg(
            fsum(when(viol.head._2, 1L).otherwise(0L)).as(viol.head._1),
            viol.tail.map { case (n, p) =>
              fsum(when(p, 1L).otherwise(0L)).as(n) }: _*).head()
          val broken = viol.indices
            .filter(i => !counts.isNullAt(i) && counts.getLong(i) > 0)
            .map(i => s"${viol(i)._1} (${counts.getLong(i)} rows)")
          throw new IllegalArgumentException(
            s"upsertParquet: batch $batchId violates pinned constraint(s) " +
              s"${broken.mkString("[", ", ", "]")} of $tableDir — nothing " +
              "was written (reject-batch semantics: fix or filter the feed)")
        } else {
          // QUARANTINE (dead-letter) mode: violating upsert rows are
          // diverted to `_quarantine/b_<batchId>/` — stamped with the
          // broken constraint names and the batch id — and the CLEAN
          // remainder commits as the batch, so one bad row no longer
          // stalls a streaming pipeline behind reject-batch semantics.
          // mode=overwrite under a per-batch dir makes a crash-replay
          // rewrite the same dead letters idempotently (a replay of an
          // already-COMMITTED batch returns before this point and never
          // re-writes). Tombstones are constraint-exempt and always
          // pass through. The split pays one extra scan of the CACHED
          // batch — never of the table. The table's own invariant is
          // intact: no committed row ever violates a pinned constraint.
          val qDir = store.child(store.child(root, QuarantineDir),
            s"b_$batchId")
          // the diversion write is independent of the merge — overlap
          // it (§2.6); awaited before the swap like every data-plane job
          overlap {
            dataOf(upsertRows.filter(anyViol))
              .drop(UpsertBucketCol)
              .withColumn(QuarantineReasonCol,
                org.apache.spark.sql.functions.filter(
                  org.apache.spark.sql.functions.array(viol.map { case (n, p) =>
                    when(p, lit(n)).otherwise(lit(null: String)) }: _*),
                  x => x.isNotNull))
              .withColumn(QuarantineBatchCol, lit(batchId))
              .write.mode("overwrite").parquet(qDir)
          }
          // null-safe keep: divert ONLY rows that are definitively
          // non-tombstones (flag <=> false, matching upsertRows) AND
          // definitively violating. A NULL delete flag must NOT short
          // a violating row out of the batch here — it has to reach
          // the sink's null-flag check and fail LOUDLY (three-valued
          // `delFlag || !anyViol` would silently drop it)
          bkAll.filter(!((delFlag <=> lit(false)) && (anyViol <=> lit(true))))
        }
      }
      // ONE aggregation job answers empty?, key-unique?, the touched
      // bucket set, AND which of those buckets have upserts (vs only
      // tombstones — the lazy-delete split). ≤ 2·nBuckets small ints,
      // the only driver-side collect in the sink; the cached batch then
      // feeds the merge without recomputing its upstream per action
      val summary = phase("summary")(bk
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("cnt"), first(col(UpsertBucketCol)).as("b"),
          first(delFlag).as("isDel"))
        .agg(max(col("cnt")).as("max_cnt"), collect_set(col("b")).as("bs"),
          collect_set(when(!col("isDel"), col("b"))).as("ubs"),
          sum(when(col("isDel").isNull, 1L).otherwise(0L)).as("null_flags"))
        .head())
      if (summary.isNullAt(0)) { // empty batch
        // a fully-diverted batch (every row quarantined) reaches this
        // path with its diversion write still in flight: the dead
        // letters must be durable before the ledger records the batch,
        // or a crash-replay would no-op and lose them
        awaitDataPlane()
        if (readCurrent().nonEmpty) {
          // a non-first empty batch commits no version; record it so
          // readTableChanges can prove "zero changes" — and DESCRIBE
          // HISTORY can report the batch's (unchanged) snapshot state —
          // instead of confusing it with a retention-swept batch. Replay
          // after a crash re-appends — duplicates are harmless (parsed
          // as a set).
          store.appendLog(store.child(root, "_empty"), s"$batchId")
        }
        if (readCurrent().isEmpty) {
          // first-ever batch is empty: the table must still become
          // readable (foreachBatch legitimately delivers an empty batch
          // 0), so commit an EMPTY snapshot — _schema carries the type
          val newV = store.child(root, vName)
          store.deleteTree(newV)
          dataOf(bk).write.partitionBy(UpsertBucketCol)
            .mode("overwrite").parquet(newV)
          swapCurrent()
        }
        commit(); return
      }
      if (summary.getLong(0) != 1L)
        throw new IllegalArgumentException(
          s"upsertParquet: batch $batchId has up to ${summary.getLong(0)} " +
            s"rows for one ${keys.mkString(",")} key — pre-reduce the batch " +
            "(e.g. max_by on an ordering column; a key may appear as an " +
            "upsert OR a tombstone, not both)")
      // a NULL delete flag is neither an upsert nor a tombstone — the
      // eager path would evict it while the lazy path would silently
      // keep the old row. Fail loudly instead of diverging by mode.
      if (summary.getLong(3) != 0L)
        throw new IllegalArgumentException(
          s"upsertParquet: batch $batchId has ${summary.getLong(3)} row(s) " +
            s"with a NULL '${deleteCol.get}' flag — coalesce it to " +
            "false (upsert) or true (delete) before writing")
      val touched: Set[Long] = summary.getSeq[Long](1).toSet
      val upsertBuckets: Set[Long] = summary.getSeq[Long](2).toSet
      // buckets this batch REWRITES: all touched buckets — minus, in
      // lazy mode, the delete-only buckets whose tombstones go to the
      // deletion vector instead
      val rewriteB: Set[Long] = if (lazyDeletes) upsertBuckets else touched

      val newV = store.child(root, vName)
      store.deleteTree(newV) // partial build from a previous crashed attempt
      store.mkdirs(newV)
      mergeBase = readCurrent() // the snapshot this merge is based on
      val curDir = mergeBase.map(store.child(root, _))
      // a rebucket that crashed between its pointer swap and its _meta
      // update leaves CURRENT hashed with a different count than _meta
      // — merging against it with this call's count would scope the
      // rewrite to the WRONG buckets (the same key alive in two
      // places). Fail loudly; re-running rebucketUpsertTable completes
      // the protocol idempotently.
      curDir.foreach { d =>
        versionBuckets(d).foreach(vb => require(vb == nBuckets,
          s"upsertParquet: CURRENT snapshot of $tableDir is hashed into " +
            s"$vb buckets but this call passed $nBuckets — re-run " +
            s"rebucketUpsertTable($vb) to complete the interrupted " +
            "rebucket, then pass the new count"))
      }
      def dirsOf(d: String, bs: Set[Long]): Seq[String] =
        bs.toSeq.sorted.map(b => store.child(d, s"$UpsertBucketCol=$b"))
          .filter(store.isDirectory)
      val rewriteDirs = curDir.toSeq.flatMap(dirsOf(_, rewriteB))
      // the prior version's deletion vector (keys + bucket), if any
      val prevDv: Option[DataFrame] = curDir
        .map(d => store.child(d, "_deletes"))
        .filter(d => store.listNames(d).exists(_.endsWith(".parquet")))
        .map(d => spark.read.parquet(d))
      val prevDvKeys = prevDv.map(_.select(keys.map(col): _*))
      // every batch key — upsert or tombstone — evicts its old row from
      // the rewritten buckets; only non-tombstone rows are re-inserted.
      // A delete is therefore just an eviction with no replacement.
      val upserts = dataOf(deleteCol.fold(bk)(c => bk.filter(!col(c))))
      // the new version's deletion vector: entries carried for buckets
      // NOT rewritten + this batch's lazily-deleted keys (tombstones in
      // delete-only buckets). Written INSIDE the version dir, so it is
      // atomic with the snapshot (pre-swap) and swept with it. The
      // write only needs the CACHED batch + the prior vector — nothing
      // from the bucket rewrite — so it overlaps the merge (§2.6).
      overlap { phase("deletion-vector") {
        val dvCols = keys.map(col) :+ col(UpsertBucketCol)
        val deleteOnlyB = touched -- upsertBuckets
        val dvAdds =
          if (lazyDeletes && deleteOnlyB.nonEmpty)
            Some(bk.filter(delFlag &&
              col(UpsertBucketCol).isin(deleteOnlyB.toSeq: _*))
              .select(dvCols: _*))
          else None
        val dvCarry = prevDv.map { dvd =>
          (if (rewriteB.isEmpty) dvd
           else dvd.filter(!col(UpsertBucketCol).isin(rewriteB.toSeq: _*)))
            .select(dvCols: _*)
        }
        (dvCarry.toSeq ++ dvAdds.toSeq).reduceOption(_.unionByName(_))
          .map(_.distinct())
          .filter(_.head(1).nonEmpty) // never write an empty _deletes dir
          .foreach(_.coalesce(1).write
            .parquet(store.child(newV, "_deletes")))
      } }
      // change capture: pre-images come from the CURRENT snapshot's
      // touched buckets and post-images from the cached batch — also
      // independent of the bucket rewrite, so it overlaps the merge
      // (§2.6). It reads the OLD version's files while the merge
      // writes the NEW dir: disjoint trees, no store mutations here.
      if (changeFeed) overlap { phase("change-capture") {
        val dataCols = dataOf(bk).columns
          .filterNot(_ == UpsertBucketCol).map(col)
        val flag = delFlag
        // capture reads ALL touched buckets (including delete-only
        // buckets the lazy path did not rewrite — read-only here), and
        // excludes vector-hidden rows: they are logically deleted, so a
        // re-upsert of such a key is an INSERT and a re-delete records
        // nothing
        val captureDirs = curDir.toSeq.flatMap(dirsOf(_, touched))
        val rawOld =
          if (captureDirs.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              tableSchema)
          else spark.read.schema(tableSchema)
            .option("basePath", curDir.get)
            .parquet(captureDirs: _*)
        val old = prevDvKeys.fold(rawOld)(dv =>
          rawOld.join(broadcast(dv), keys, "left_anti"))
        // pre-images: the table rows this batch replaces or deletes —
        // ≤ batch-size rows by construction; checkpointed so the
        // classification join and the output union don't re-scan the
        // touched buckets a third time
        val pre = old.join(
          broadcast(bk.select(keys.map(col) :+ flag.as("_is_delete"): _*)),
          keys, "inner").localCheckpoint()
        val preKeys = pre.select(keys.map(col): _*).distinct()
        val post = upserts.join(
          broadcast(preKeys.withColumn("_existed", lit(true))), keys, "left")
        val changes = pre.select(dataCols :+
            when(col("_is_delete"), "delete")
              .otherwise("update_preimage").as("_change_type"): _*)
          .unionByName(post.select(dataCols :+
            when(col("_existed"), "update_postimage")
              .otherwise("insert").as("_change_type"): _*))
          .withColumn("_batch_id", lit(batchId))
        changes.coalesce(math.max(1, touched.size))
          .write.parquet(store.child(newV, "_changes"))
      } }
      val merged = {
        val base =
          if (rewriteDirs.isEmpty) upserts
          // read old rows through the (possibly just-widened) table
          // schema: files from before a widening surface the new columns
          // as null, so survivors and upserts always union cleanly
          else {
            val survivors = spark.read.schema(tableSchema)
              .option("basePath", curDir.get)
              .parquet(rewriteDirs: _*)
              .join(broadcast(bk.select(keys.map(col): _*)), keys, "left_anti")
            // pending vector entries for rewritten buckets are APPLIED
            // here (and leave the vector below) — the debt self-compacts
            prevDvKeys.fold(survivors)(dv =>
              survivors.join(broadcast(dv), keys, "left_anti"))
              .unionByName(upserts)
          }
        base
      }
      // layout of the rewritten buckets: hash-partitioned one-file-per-
      // bucket by default; with pinned sortCols, RANGE-partitioned on
      // (bucket, sortCols) into ~filesPerBucket slices per bucket and
      // sorted within — each file then covers a tight sortCols range,
      // which is what makes the per-file manifest below actually prune
      // (hash buckets alone have full-range bounds on every column)
      val laidOut =
        if (sortCols.isEmpty)
          merged.repartition(math.max(1, rewriteB.size), col(UpsertBucketCol))
        else merged.repartitionByRange(
          math.max(1, rewriteB.size * filesPerBucket),
          (col(UpsertBucketCol) +: sortCols.map(col)): _*)
          .sortWithinPartitions(
            (col(UpsertBucketCol) +: sortCols.map(col)): _*)
      // append, NOT overwrite: newV was freshly deleteTree'd+mkdirs'd
      // above, so overwrite's implicit whole-dir delete is redundant —
      // and it would race the OVERLAPPED _changes/_deletes writers'
      // staging dirs inside newV (they may start before this job)
      phase("merge-write")(laidOut
        .write.partitionBy(UpsertBucketCol).mode("append").parquet(newV))
      curDir.foreach { d =>
        store.listNames(d)
          .filter(n => n.startsWith(s"$UpsertBucketCol=") &&
            store.isDirectory(store.child(d, n)) &&
            !rewriteB.contains(n.stripPrefix(s"$UpsertBucketCol=").toLong))
          .foreach { bname =>
            val bdir = store.child(d, bname)
            val dst = store.child(newV, bname)
            store.mkdirs(dst)
            store.listNames(bdir)
              .filterNot(n => store.isDirectory(store.child(bdir, n)))
              .foreach(n => linkInto(store.child(bdir, n), dst))
          }
      }
      // per-file min/max manifest for the pinned sortCols — the
      // file-LIST skipping layer (StatsManifest) composed into the
      // format. Fresh rows come from a narrow scan of the REWRITTEN
      // buckets only; rows for hard-linked buckets are CARRIED from
      // the previous version's manifest with their paths remapped
      // (same inodes, so the stats hold verbatim) — manifest cost
      // rides the merge's O(touched), never a table scan. Written
      // inside the version dir pre-swap: atomic with the snapshot,
      // swept with it, invisible to snapshot reads (underscore).
      if (sortCols.nonEmpty) {
        import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
        val aggs = StatsManifest.statsAggs(sortCols)
        val freshDirs = rewriteB.toSeq.sorted
          .map(b => store.child(newV, s"$UpsertBucketCol=$b"))
          .filter(store.isDirectory)
        // footer-derived stats first (r17, guide §6 — no second read
        // of the data just written); scan-based derivation is the
        // fallback whenever any column's footer stats aren't exact
        val footerFresh =
          if (freshDirs.isEmpty) None
          else footerFreshManifest(spark, newV, Some(rewriteB), sortCols,
            Some(tableSchema))
        val fresh =
          if (freshDirs.isEmpty) None
          else footerFresh
            .orElse(Some(spark.read.schema(tableSchema)
              .option("basePath", newV)
              .parquet(freshDirs: _*)
              .select(sortCols.map(col): _*)
              .groupBy(StatsManifest.relFile(vName).as("file"))
              .agg(aggs.head, aggs.tail: _*)))
        val carried = curDir
          .map(d => store.child(d, StatsManifest.ManifestDir))
          .filter(store.isDirectory)
          .flatMap { md =>
            val parts = store.listNames(md)
              .filter(_.endsWith(".parquet")).map(store.child(md, _))
            if (parts.isEmpty) None
            else Some(spark.read.parquet(parts: _*)
              .filter(!regexp_extract(col("file"),
                s"(^|/)$UpsertBucketCol=(\\d+)/", 2).cast("long")
                .isin(rewriteB.toSeq: _*))
              .withColumn("file",
                org.apache.spark.sql.functions.regexp_replace(col("file"),
                  java.util.regex.Pattern.quote(
                    s"/${store.baseName(curDir.get)}/"),
                  s"/$vName/")))
          }
        // the emptiness probe is a Spark job; skip it when the footer
        // path produced the fresh rows (≥1 row per file by construction)
        phase("manifest")((fresh.toSeq ++ carried.toSeq)
          .reduceOption(_.unionByName(_))
          .filter(m => footerFresh.isDefined || m.head(1).nonEmpty)
          .foreach(_.coalesce(1).write.parquet(
            store.child(newV, StatsManifest.ManifestDir))))
      }
      // overlapped data-plane writes (capture / dv / quarantine) must
      // all be durable before the snapshot becomes visible
      awaitDataPlane()
      swapCurrent()
      commit()
    } finally {
      // a failed merge must not leave an overlapped job racing the
      // caller's cleanup of the table dir
      pendingDataPlane.foreach(f => scala.util.Try(
        scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration.Inf)))
      bkAll.unpersist(); ()
    }
  }

  /** Read an [[upsertParquet]] table — its CURRENT snapshot, or (time
    * travel) the state as of a past batch: the highest RETAINED
    * COMMITTED snapshot with batchId ≤ `asOfBatch`. Candidate `v_*`
    * directories are intersected with the `_commits` ledger before
    * resolution: a directory without a commit record is a crashed
    * partial build (a writer that died mid-write, swept only by the
    * NEXT successful commit) and serving it would return torn data —
    * the one crash window the v9 enumeration missed. The CURRENT
    * branch needs no such check: the pointer is swapped atomically and
    * only ever names a fully-built version. Snapshots are immutable
    * and hard-link-shared, so a historical read costs the same as a
    * current one; asking for a batch older than the retention window
    * fails loudly rather than silently serving a newer state.
    */
  /** The table's pinned key columns, in LOGICAL (user-facing) names. */
  def tableKeyColumns(tableDir: String)
                     (implicit store: TableStore): Seq[String] = {
    val cm = colMap(tableDir)
    tableMeta(tableDir).apply("keys").split(",").toSeq
      .map(toLogicalName(cm, _))
  }

  /** The table's pinned sort (stats) columns in LOGICAL names — empty
    * when the table never pinned `sortCols` (no manifest, no pruned
    * reads). The columns a reader may push range bounds on.
    */
  def tableSortColumns(tableDir: String)
                      (implicit store: TableStore): Seq[String] = {
    val cm = colMap(tableDir)
    tableMeta(tableDir).get("sort").toSeq
      .flatMap(_.split(",").toSeq).map(toLogicalName(cm, _))
  }

  def readUpsertTable(spark: SparkSession, tableDir: String,
                      asOfBatch: Option[Long] = None)
                     (implicit store: TableStore): DataFrame = {
    val root = tableDir
    val vDir = resolveVersionDir(root, asOfBatch)
    logicalView(root)(applyDeletes(spark, root, vDir,
      pinnedReader(spark, root).option("basePath", vDir)
        .parquet(vDir))
      .drop(UpsertBucketCol))
  }

  /** Stats-pruned snapshot read: resolve the version like
    * [[readUpsertTable]], then consult its `_stats/` manifest (written
    * when the table pins `sortCols`) and read ONLY the files whose
    * min/max bounding box can contain a row matching every
    * `(column, lo, hi)` bound — file-LIST skipping before any footer
    * I/O, composed with the format's snapshot/vector semantics. Like
    * partition pruning this is a SUPERSET guarantee: the caller still
    * applies the row-level predicate. A version without a manifest
    * (table never pinned sortCols) degrades to the full snapshot scan
    * — never a wrong answer. Why it works: with pinned sortCols the
    * merge range-partitions each rewritten bucket into
    * ~`filesPerBucket` sorted slices, so each file covers a tight
    * sortCols range — a selective range probe then reads O(buckets)
    * files instead of O(buckets × filesPerBucket) (and at 100 TB,
    * "files the manifest discards" are object-store GETs that never
    * happen). The deletion vector applies after pruning, exactly as
    * in the full read.
    */
  def readUpsertTableWhere(spark: SparkSession, tableDir: String,
                           bounds: Seq[(String, Any, Any)],
                           asOfBatch: Option[Long] = None)
                          (implicit store: TableStore): DataFrame =
    readUpsertTableWhereOpt(spark, tableDir,
      bounds.map { case (c, lo, hi) => (c, Some(lo), Some(hi)) }, asOfBatch)

  /** [[readUpsertTableWhere]] with OPEN-ended bounds (`None` = that
    * side unbounded) — the shape the `graft` DataSource's filter
    * pushdown produces from one-sided predicates like `c >= x`.
    */
  def readUpsertTableWhereOpt(spark: SparkSession, tableDir: String,
                              bounds: Seq[(String, Option[Any], Option[Any])],
                              asOfBatch: Option[Long] = None)
                             (implicit store: TableStore): DataFrame = {
    val root = tableDir
    val vDir = resolveVersionDir(root, asOfBatch)
    val cm = colMap(root) // bounds arrive logical, the manifest is physical
    val physBounds = bounds.map { case (c, lo, hi) =>
      (toPhysicalName(cm, c), lo, hi) }
    StatsManifest.survivingFilesOpt(spark,
      store.child(vDir, StatsManifest.ManifestDir), physBounds) match {
      case None => readUpsertTable(spark, tableDir, asOfBatch)
      case Some(files) =>
        val base = pinnedReader(spark, root).option("basePath", vDir)
        val scan =
          if (files.isEmpty)
            base.parquet(vDir).filter(
              org.apache.spark.sql.functions.lit(false))
          else base.parquet(files: _*)
        logicalView(root)(
          applyDeletes(spark, root, vDir, scan).drop(UpsertBucketCol))
    }
  }

  /** Result of [[countWhere]]: the exact count plus how it was
    * answered — `metaFiles` contributed their manifest `n_rows` with
    * ZERO data I/O, `scannedFiles` (predicate-boundary files, or every
    * surviving file on the fallback path) were actually read.
    */
  final case class MetaCount(count: Long, metaFiles: Long,
                             scannedFiles: Long, totalFiles: Long)

  /** EXACT snapshot COUNT of rows satisfying every `(c, lo, hi)` bound
    * INCLUSIVELY (`lo <= c AND c <= hi`), answered from the stats
    * manifest wherever metadata suffices — the metadata-only
    * aggregation every lakehouse planner special-cases, surfaced as an
    * explicit op. Per manifest row (= data file) one of three cases:
    *
    *   - range strictly INSIDE every bound and zero NULLs in every
    *     bound column → every row matches: contribute `n_rows`, read
    *     nothing (the NULL-count guard matters — min/max ignore NULLs,
    *     so "range inside" alone would overcount files holding NULL
    *     rows that fail the predicate);
    *   - range DISJOINT from any bound (the [[readUpsertTableWhere]]
    *     overlap test fails) → no row can match: contribute 0, read
    *     nothing;
    *   - boundary (overlapping, not inside) → scan THAT FILE and count
    *     the predicate exactly.
    *
    * With no bounds at all, every file is "inside" and the table's
    * row count is one metadata fold — no data file opens. At 100 TB
    * the boundary set of a clustered table is O(buckets) files, so a
    * selective COUNT reads a sliver and a full COUNT reads nothing.
    *
    * Soundness gates (each degrades to the pruned-scan-and-count
    * fallback, never a wrong answer): no manifest (table never pinned
    * sortCols), a merge-on-read deletion vector on the snapshot
    * (vector-hidden rows are physically present, so file stats lie
    * about LIVE rows), or a manifest predating the `n_rows` schema.
    */
  def countWhere(spark: SparkSession, tableDir: String,
                 bounds: Seq[(String, Any, Any)] = Nil)
                (implicit store: TableStore): MetaCount = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val vDir = resolveVersionDir(tableDir, None)
    val manDir = store.child(vDir, StatsManifest.ManifestDir)
    val mparts =
      if (!store.isDirectory(manDir)) Nil
      else store.listNames(manDir).filter(_.endsWith(".parquet"))
        .map(store.child(manDir, _))
    val hasDv = store.exists(store.child(vDir, "_deletes"))
    // bounds arrive LOGICAL; the manifest and raw files are physical
    val cm = colMap(tableDir)
    val pBounds = bounds.map { case (c, lo, hi) =>
      (toPhysicalName(cm, c), lo, hi) }
    def rowPred(bs: Seq[(String, Any, Any)]): Column = bs
      .map { case (c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi) }
      .reduceOption(_ && _).getOrElse(lit(true))
    def fallback: MetaCount = {
      val scan = readUpsertTableWhere(spark, tableDir, bounds)
      val total = readUpsertTable(spark, tableDir).inputFiles.length.toLong
      MetaCount(scan.filter(rowPred(bounds)).count(), 0L,
        scan.inputFiles.length.toLong, total)
    }
    if (mparts.isEmpty || hasDv) return fallback
    val manifest = spark.read.parquet(mparts: _*)
    val mCols = manifest.columns.toSet
    val statsOk = mCols.contains("n_rows") &&
      pBounds.forall { case (c, _, _) =>
        mCols.contains(s"min_$c") && mCols.contains(s"nulls_$c") }
    if (!statsOk) return fallback
    val overlap = coalesce(pBounds.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduceOption(_ && _).getOrElse(lit(true)), lit(false))
    val inside = coalesce(pBounds.map { case (c, lo, hi) =>
      col(s"min_$c") >= lit(lo) && col(s"max_$c") <= lit(hi) &&
        col(s"nulls_$c") === 0
    }.reduceOption(_ && _).getOrElse(lit(true)), lit(false))
    // one row per data file — the same driver-side bound the format's
    // planning (survivingFiles, the sink's merge plan) already holds
    val classified = manifest
      .select(col("file"), col("n_rows"), overlap.as("ov"),
        inside.as("ins"))
      .collect()
    // a manifest row carried from a pre-`n_rows` generation reads NULL
    // through the unioned schema — metadata counting is then unsound
    // for the whole snapshot (that file's rows would silently drop)
    if (classified.exists(_.isNullAt(1))) return fallback
    val metaRows = classified.iterator
      .filter(_.getBoolean(3)).map(_.getLong(1)).sum
    val metaFiles = classified.count(_.getBoolean(3))
    val boundary = classified.iterator
      .filter(r => r.getBoolean(2) && !r.getBoolean(3))
      .map(r => StatsManifest.rebase(manDir, r.getString(0))).toSeq
    val scanned =
      if (boundary.isEmpty) 0L
      else pinnedReader(spark, tableDir).option("basePath", vDir)
        .parquet(boundary: _*).filter(rowPred(pBounds)).count()
    MetaCount(metaRows + scanned, metaFiles.toLong, boundary.length.toLong,
      classified.length.toLong)
  }

  /** Whole-snapshot MIN/MAX of the table's pinned `sortCols`, answered
    * from the stats manifest ALONE — one row `(min_<c>, max_<c>, …)`
    * folded over the per-file ranges, no data file opens (file min/max
    * ignore NULLs, so the fold equals the data's MIN/MAX under SQL
    * aggregate NULL semantics; an all-NULL column yields NULL exactly
    * as `min(c)` would). `None` when metadata cannot answer soundly:
    * no manifest, or a merge-on-read deletion vector on the snapshot
    * (a hidden row could hold the extreme — [[optimizeUpsertTable]]
    * clears the vector and restores the metadata path). Callers fall
    * back to aggregating the snapshot read.
    */
  def minMaxMeta(spark: SparkSession, tableDir: String)
                (implicit store: TableStore): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{max, min}
    val vDir = resolveVersionDir(tableDir, None)
    val manDir = store.child(vDir, StatsManifest.ManifestDir)
    val mparts =
      if (!store.isDirectory(manDir)) Nil
      else store.listNames(manDir).filter(_.endsWith(".parquet"))
        .map(store.child(manDir, _))
    if (mparts.isEmpty ||
        store.exists(store.child(vDir, "_deletes"))) None
    else {
      val manifest = spark.read.parquet(mparts: _*)
      val sortCols = tableMeta(tableDir).get("sort")
        .map(_.split(",").toSeq).getOrElse(Nil)
      val cm = colMap(tableDir) // output aliases use LOGICAL names
      def lg(c: String): String = toLogicalName(cm, c)
      if (sortCols.isEmpty) None
      else Some(manifest.agg(
        min(org.apache.spark.sql.functions.col(s"min_${sortCols.head}"))
          .as(s"min_${lg(sortCols.head)}"),
        (sortCols.map(c =>
          max(org.apache.spark.sql.functions.col(s"max_$c"))
            .as(s"max_${lg(c)}")) ++
          sortCols.tail.map(c =>
            min(org.apache.spark.sql.functions.col(s"min_$c"))
              .as(s"min_${lg(c)}"))): _*)
        .select(sortCols.flatMap(c =>
          Seq(org.apache.spark.sql.functions.col(s"min_${lg(c)}"),
            org.apache.spark.sql.functions.col(s"max_${lg(c)}"))): _*))
    }
  }

  /** DESCRIBE HISTORY for an upsert table: one row per COMMITTED
    * batch — (batch_id, retained, row_count, is_current) — the
    * operational surface an operator/debugger reads before touching a
    * table. `row_count` is the LIVE row count of that batch's
    * snapshot (time-travel read, deletion vector applied; −1 for a
    * committed batch whose version aged out of retention — history is
    * ledger-complete even where data is not). The per-retained-version
    * counts are distributed count() jobs; the driver holds only the
    * ≤ keepVersions summary rows, so the call is retention-bounded,
    * never table-bounded.
    */
  def describeUpsertTable(spark: SparkSession, tableDir: String)
                         (implicit store: TableStore): DataFrame = {
    val root = tableDir
    val committed = readLedger(root).toSeq.sorted
    val curBatch = readCurrentName(root).flatMap(parseVersion).map(_._1)
    val empties = emptyBatchIds(root)
    val rows = committed.map { b =>
      // a committed EMPTY batch mints no version dir, but its snapshot
      // state is fully known (identical to the preceding snapshot) and
      // as-of reads serve it — report THAT, not a retention sweep
      val retained = servableDir(root, b).isDefined ||
        (empties.contains(b) &&
          scala.util.Try(resolveVersionDir(root, Some(b))).isSuccess)
      val cnt =
        if (retained) readUpsertTable(spark, tableDir, Some(b)).count()
        else -1L
      (b, retained, cnt, curBatch.contains(b))
    }
    import spark.implicits._
    rows.toDF("batch_id", "retained", "row_count", "is_current")
  }

  /** One-row table detail from the CONTROL PLANE only — no data scan,
    * so it is as cheap on a 100-TB table as on a fixture: pinned
    * layout, ledger/version/retention counts, the CURRENT snapshot's
    * parquet file count (one LIST per bucket dir), and the feature
    * flags an operator checks before maintenance (feed, constraints,
    * pending merge-on-read vector, WAP-branch lineage). Per-batch row
    * counts live in [[describeUpsertTable]], which does scan.
    */
  def describeDetailUpsertTable(spark: SparkSession, tableDir: String)
                               (implicit store: TableStore): DataFrame = {
    val root = tableDir
    val meta = tableMeta(root)
    val curName = readCurrentName(root)
    require(curName.nonEmpty, s"upsert table has no CURRENT pointer: $root")
    val (curBatch, gen) = parseVersion(curName.get).get
    val curDir = store.child(root, curName.get)
    val skip = Set("_changes", "_deletes", StatsManifest.ManifestDir)
    def countParquet(dir: String): Long =
      store.listNames(dir).map { n =>
        val p = store.child(dir, n)
        if (store.isDirectory(p)) {
          if (skip.contains(n)) 0L else countParquet(p)
        } else if (n.endsWith(".parquet")) 1L else 0L
      }.sum
    val lineage = store.read(store.child(root, "_branch_base"))
      .map(_.split('\n').map(_.trim).filter(_.contains('='))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap)
    val nCons = store.read(store.child(root, "_constraints"))
      .map(_.linesIterator.count(_.contains('='))).getOrElse(0)
    import spark.implicits._
    Seq((
      meta("keys"), meta("buckets").toInt,
      meta.get("sort").orNull, meta.get("fpb").map(_.toInt).getOrElse(4),
      curBatch, gen.toLong,
      readLedger(root).size.toLong,
      versionDirs(root).size.toLong,
      countParquet(curDir),
      store.exists(store.child(root, "_cdf")),
      nCons.toLong,
      store.exists(store.child(curDir, "_deletes")),
      lineage.isDefined,
      lineage.flatMap(_.get("batch")).map(_.toLong)
        .map(java.lang.Long.valueOf).orNull.asInstanceOf[java.lang.Long],
      listTags(root).size.toLong,
      // ledger read hoisted OUT of the per-name closure (ADVICE r14:
      // one log read per quarantined batch was O(n²) in log reads)
      locally {
        val committed = readLedger(root)
        val qRoot = store.child(root, QuarantineDir)
        store.listNames(qRoot)
          .count(n => n.startsWith("b_") &&
            scala.util.Try(n.stripPrefix("b_").toLong).toOption
              .exists(committed.contains) &&
            // half-swept dirs (crashed prune) are not servable batches
            !store.exists(store.child(store.child(qRoot, n), "_sweeping")))
          .toLong
      }
    )).toDF("keys", "buckets", "sort_cols", "files_per_bucket",
      "current_batch", "generation", "committed_batches",
      "retained_versions", "data_files", "change_feed", "constraints",
      "pending_delete_vector", "is_branch", "branch_base",
      "tags", "quarantined_batches")
  }

  /** Batch ids committed with ZERO rows (`_empty` marker appends) —
    * batches that minted no version dir yet whose snapshot state is
    * known: identical to the preceding snapshot.
    */
  private[sources] def emptyBatchIds(root: String)
                           (implicit store: TableStore): Set[Long] =
    store.readLog(store.child(root, "_empty"))
      .flatMap(l => scala.util.Try(l.trim.toLong).toOption).toSet

  // ---- named snapshot TAGS -------------------------------------------
  //
  // A tag is a durable name for a committed snapshot that PINS it
  // against retention: every sweep ([[cleanupStale]] — the sink's
  // post-commit cleanup AND [[vacuumUpsertTable]]) retains tagged
  // batches beyond keepVersions until the tag is dropped. The ledger
  // is an append-only `_tags` log (`name=batch` creates, `name=`
  // drops; last entry for a name wins), so tag history survives
  // crashes exactly like the commit ledger — a torn trailing line
  // parses as no-op. Tags pin the RESOLVED snapshot: tagging an empty
  // batch pins the version that serves it (its state is identical by
  // construction).

  private val TagNameOk = "[A-Za-z0-9._-]{1,128}".r

  /** Per-name create-mutex markers for [[createTag]] (NOT `_tags.d` —
    * that prefix is the object-store layout of the `_tags` log
    * itself). One object per LIVE tag name; see createTag's protocol.
    */
  private val TagMarkerDir = "_tag_names"

  /** All live (created, not dropped) tags in creation order. */
  def listTags(tableDir: String)
              (implicit store: TableStore): Seq[(String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    store.readLog(store.child(tableDir, "_tags")).foreach { l =>
      l.split("=", 2) match {
        case Array(n, "") => m.remove(n.trim); ()
        case Array(n, b) =>
          scala.util.Try(b.trim.toLong).toOption
            .foreach(m.update(n.trim, _))
        case _ => ()
      }
    }
    m.toSeq
  }

  /** Batches pinned by at least one live tag — consulted by every
    * retention sweep. One small log read per sweep; never data-sized.
    */
  private def tagPinnedBatches(root: String)
                              (implicit store: TableStore): Set[Long] =
    listTags(root).map(_._2).toSet

  /** Create tag `name` for the snapshot an as-of read AT `atBatch`
    * serves. The tag records the RESOLVED batch (for an empty batch,
    * the version that serves it), so the pin always names a real
    * version dir. Fails loudly on a duplicate name (drop first — a
    * silently moved tag is how a pinned dataset changes under a
    * consumer), an uncommitted batch, or a batch beyond retention.
    *
    * Concurrency: create is CAS-STRICT per name wherever the store has
    * an exclusive-create primitive ([[TableStore.createExclusive]] —
    * S3 `If-None-Match: *`, HDFS/POSIX create-exclusive): the winner
    * of a same-name race creates the `_tag_names/<name>` marker and
    * appends; the loser throws the duplicate error having appended
    * NOTHING. Where the backend has no such primitive
    * (`createExclusive` = None) the check degrades to the documented
    * read-then-append under the single-operator deployment contract —
    * and either way the race can never UNpin a snapshot (the pin set
    * is the ledger's value set). A marker is deliberately NOT
    * self-healed on create: a marker whose log entry hasn't landed yet
    * is indistinguishable from crash debris, and "heal" logic would
    * let a racing loser delete the winner's fresh marker and append a
    * second pin — the exact double-append the marker exists to
    * prevent. Debris from a crashed create (marker without a live log
    * entry) blocks the name until an explicit [[dropTag]] — idempotent,
    * deletes the marker — clears it; the duplicate error says so.
    */
  def createTag(tableDir: String, name: String, atBatch: Long)
               (implicit store: TableStore): Long = {
    require(TagNameOk.matches(name) && !name.contains("="),
      s"createTag: tag name must match ${TagNameOk.regex}")
    def duplicate(): Nothing = throw new IllegalArgumentException(
      s"createTag: tag '$name' already exists on $tableDir " +
        s"(batch ${listTags(tableDir).toMap.get(name).getOrElse("?")}) — " +
        "tags are immutable names; dropTag first if the move is intentional")
    require(readLedger(tableDir).contains(atBatch),
      s"createTag: batch $atBatch is not committed on $tableDir")
    // resolves or throws the retention error — a tag can only ever be
    // created while its snapshot still exists
    val pinnedDir = resolveVersionDir(tableDir, Some(atBatch))
    val pinned = parseVersion(store.baseName(pinnedDir)).get._1
    val mDir = store.child(tableDir, TagMarkerDir)
    store.createExclusive(mDir, name, s"$pinned") match {
      case Some(true) => () // won the name
      case Some(false) =>
        val live = listTags(tableDir).toMap.get(name)
        throw new IllegalArgumentException(
          s"createTag: tag '$name' already exists on $tableDir" +
            live.fold(" (or is a crashed create's marker — dropTag to " +
              "clear it)")(b => s" (batch $b)") +
            " — tags are immutable names; dropTag first if the move is " +
            "intentional")
      case None => () // no exclusive-create: read-then-append fallback
    }
    // log-based duplicate check — the None fallback's only guard, and
    // a cheap belt under the marker (tags created before the marker
    // protocol existed have no marker)
    if (listTags(tableDir).exists(_._1 == name)) duplicate()
    store.appendLog(store.child(tableDir, "_tags"), s"$name=$pinned")
    pinned
  }

  /** Drop tag `name`, releasing its retention pin: the next sweep (any
    * commit or vacuum) reclaims the version unless retention or
    * another tag still holds it. Dropping an absent tag is a no-op
    * (idempotent replay).
    */
  def dropTag(tableDir: String, name: String)
             (implicit store: TableStore): Unit = {
    // full TagNameOk validation, mirroring createTag (ADVICE r14): a
    // name containing a newline would append a multi-line _tags entry
    // whose trailing line parses as a drop of a DIFFERENT tag in
    // line-based log stores — silently releasing its retention pin
    require(TagNameOk.matches(name) && !name.contains("="),
      s"dropTag: tag name must match ${TagNameOk.regex}")
    // release the create-mutex marker FIRST (see createTag): a crash
    // between the two leaves the tag still live in the log — the
    // log-based duplicate check keeps the name taken — never a dropped
    // tag whose name stays permanently uncreatable
    store.delete(store.child(store.child(tableDir, TagMarkerDir), name))
    store.appendLog(store.child(tableDir, "_tags"), s"$name=")
  }

  /** Snapshot read AS OF a named tag — [[readUpsertTable]] at the
    * tag's pinned batch.
    */
  def readUpsertTableAtTag(spark: SparkSession, tableDir: String,
                           tag: String)
                          (implicit store: TableStore): DataFrame = {
    val b = listTags(tableDir).toMap.getOrElse(tag,
      throw new IllegalArgumentException(
        s"no such tag '$tag' on $tableDir " +
          s"(tags: ${listTags(tableDir).map(_._1).mkString(",")})"))
    readUpsertTable(spark, tableDir, asOfBatch = Some(b))
  }

  /** The dead-letter table: every row quarantine mode diverted from a
    * COMMITTED batch, with [[QuarantineReasonCol]] (the broken
    * constraint names) and [[QuarantineBatchCol]]. Uncommitted batches'
    * quarantine dirs (a crashed attempt that never committed) are
    * excluded — the replay rewrites them when the batch lands. Schema
    * differences across batches (widen-only evolution) merge; an empty
    * quarantine reads as a typed empty table through the pinned table
    * schema.
    */
  def readQuarantine(spark: SparkSession, tableDir: String)
                    (implicit store: TableStore): DataFrame = {
    val qRoot = store.child(tableDir, QuarantineDir)
    val committed = readLedger(tableDir)
    val dirs = store.listNames(qRoot)
      .filter(_.startsWith("b_"))
      .filter(n => scala.util.Try(n.stripPrefix("b_").toLong)
        .toOption.exists(committed.contains))
      .map(n => store.child(qRoot, n))
      // a dir mid-delete when a prune crashed ([[sweepDir]]'s marker)
      // must never serve a silently PARTIAL set of dead letters — the
      // next prune finishes the sweep idempotently
      .filterNot(d => store.exists(store.child(d, "_sweeping")))
    if (dirs.nonEmpty)
      // letters surface through the CURRENT column mapping like every
      // other read (triage sees today's names; a requeue `fix` speaks
      // logical names and the sink translates back on re-ingest);
      // the blame/batch columns are unmapped and pass through
      logicalView(tableDir)(
        spark.read.option("mergeSchema", "true").parquet(dirs: _*))
    else {
      val base = store.read(store.child(tableDir, "_schema")) match {
        case Some(json) => org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType]
        case None => new StructType()
      }
      val fields = base.fields.filterNot(_.name == UpsertBucketCol) ++ Seq(
        org.apache.spark.sql.types.StructField(QuarantineReasonCol,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField(QuarantineBatchCol,
          org.apache.spark.sql.types.LongType))
      // same mapping on the typed-empty branch — a no-letters read
      // must show the same (logical) columns a letters read would
      logicalView(tableDir)(
        spark.createDataFrame(spark.sparkContext.emptyRDD[
          org.apache.spark.sql.Row], StructType(fields)))
    }
  }

  /** REQUEUE the dead-letter area: re-ingest every committed dead
    * letter as ONE new committed batch — the third of the quarantine
    * lifecycle's verbs (divert → inspect → prune | requeue), for the
    * case where the CONSTRAINT was right and the data was fixable:
    * apply `fix` to the letters, merge them through the ordinary sink
    * with the table's pinned constraints STILL screening
    * (quarantine=true — a letter `fix` failed to heal re-diverts into
    * `_quarantine/b_<asBatch>` rather than poisoning the table), then
    * sweep the consumed dirs. `fix` is a heal-in-place transform: a
    * fix that DROPS rows abandons those letters permanently (the
    * sweep still consumes their dirs) — filter deliberately, or prune
    * instead. Letters are pre-reduced per key by
    * highest source batch (latest wins — the same recency rule the
    * merge applies across batches); the stamp columns never enter the
    * table.
    *
    * Idempotent under the crash windows: `asBatch` already committed →
    * the merge is skipped (exactly-once) and the sweep re-runs
    * (deletes are idempotent); a crash between merge and sweep leaves
    * consumed dirs visible until the re-run finishes them. Input and
    * sweep are scoped to committed dead-letter dirs strictly BELOW
    * `asBatch`: the requeue's own re-diverted output (`b_<asBatch>`)
    * and letters from any LATER batch — which were never this
    * requeue's input — are untouched, so a replay with an old id can
    * never consume work it didn't do. Returns (healed, rediverted)
    * row counts for this invocation's consumption.
    */
  def requeueQuarantine(spark: SparkSession, tableDir: String, asBatch: Long,
                        fix: DataFrame => DataFrame = identity,
                        keepVersions: Int = 2)
                       (implicit store: TableStore): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, max_by, struct}
    val meta = tableMeta(tableDir)
    val keys = meta("keys").split(",").toSeq
    val nBuckets = meta("buckets").toInt
    val qRoot = store.child(tableDir, QuarantineDir)
    // what this invocation consumes: every committed dead-letter dir
    // BELOW asBatch — strictly below, never `!=`: a replay with an old
    // committed id must not consume (or sweep) letters from batches
    // newer than the requeue, which were never its input. Counted
    // BEFORE the merge/sweep so the audit also survives the
    // crash-replay window (merge committed, dirs not yet swept →
    // re-run recounts the same consumption; fully-swept previous run →
    // consumed = 0 by design).
    def consumedKeys(): Long = {
      val d = readQuarantine(spark, tableDir)
        .filter(col(QuarantineBatchCol) < asBatch)
      if (d.isEmpty) 0L else d.select(keys.map(col): _*).distinct().count()
    }
    val inputKeys = consumedKeys()
    if (!readLedger(tableDir).contains(asBatch)) {
      if (inputKeys == 0L) return (0L, 0L)
      // the ledger is monotone — a requeue behind the head would break
      // the time-travel suffix invariants
      require(readLedger(tableDir).forall(_ < asBatch),
        s"requeueQuarantine: asBatch $asBatch must exceed every " +
          s"committed batch of $tableDir")
      val dead = readQuarantine(spark, tableDir)
        .filter(col(QuarantineBatchCol) < asBatch)
      // latest source batch wins per key (the merge's own recency
      // rule applied across letter batches); a same-(key, batch) tie —
      // possible when a pre-reduce-violating duplicate pair BOTH
      // violated, so uniqueness never saw them — breaks
      // deterministically by full-row order. Stamp columns dropped.
      val rowStruct = struct(dead.columns.map(col).toSeq: _*)
      val healedInput = fix(
        dead.groupBy(keys.map(col): _*)
          .agg(max_by(rowStruct,
            struct(col(QuarantineBatchCol), rowStruct)).as("m"))
          .select(col("m.*"))
          .drop(QuarantineReasonCol, QuarantineBatchCol))
      upsertParquet(tableDir, keys, nBuckets, keepVersions = keepVersions,
        quarantine = true)(healedInput, asBatch)
    }
    // sweep the consumed dirs, oldest first (the sweep invariant);
    // idempotent on replay
    val committed = readLedger(tableDir)
    store.listNames(qRoot)
      .flatMap(n => scala.util.Try(n.stripPrefix("b_").toLong).toOption
        .filter(_ < asBatch).filter(committed.contains).map(_ -> n))
      .sortBy(_._1)
      .foreach { case (_, n) => sweepDir(store.child(qRoot, n)) }
    val rediverted = readQuarantine(spark, tableDir)
      .filter(col(QuarantineBatchCol) === asBatch).count()
    (math.max(0L, inputKeys - rediverted), rediverted)
  }

  /** Retention + orphan sweep for the dead-letter area (VERDICT r14
    * missing #1 — without it a streaming table with a constraint
    * regression grows `_quarantine/` unboundedly, and a crashed
    * never-committed batch leaves a `b_<id>` dir readQuarantine hides
    * but nothing deletes). Two sweeps, audited as (kind, name) rows:
    *
    *   - `quarantine` — COMMITTED dead-letter dirs beyond the
    *     `keepBatches` highest batch ids (retention; None = keep all);
    *   - `quarantine_orphan` — dirs whose batch is NOT in the ledger
    *     and whose write activity is older than `inflightGraceMs`
    *     (crash debris; the grace shields a two-writer competitor's
    *     just-written pre-commit quarantine exactly as [[cleanupStale]]
    *     shields its build dir — 0 keeps single-writer semantics,
    *     where an uncommitted dir at maintenance time IS debris).
    *
    * Deletes oldest-first through [[sweepDir]], so a crash mid-prune
    * leaves the retained committed dirs a contiguous suffix and the
    * half-deleted dir `_sweeping`-marked — [[readQuarantine]] refuses
    * it, the next prune finishes it. Replay stays idempotent: a
    * replayed COMMITTED batch returns before the quarantine write, so
    * pruned dead letters never resurrect; a replayed UNCOMMITTED batch
    * rewrites its dir from scratch (mode=overwrite) whether or not the
    * orphan sweep got there first. Cost: one LIST of `_quarantine/` +
    * one ledger read — never data-sized.
    */
  def pruneQuarantine(tableDir: String, keepBatches: Option[Int],
                      inflightGraceMs: Long = 0L)
                     (implicit store: TableStore): Seq[(String, String)] = {
    keepBatches.foreach(k => require(k >= 0,
      s"pruneQuarantine: keepBatches must be >= 0, got $k"))
    val qRoot = store.child(tableDir, QuarantineDir)
    val committed = readLedger(tableDir)
    val now = System.currentTimeMillis()
    val entries = store.listNames(qRoot).flatMap { n =>
      if (!n.startsWith("b_")) None
      else scala.util.Try(n.stripPrefix("b_").toLong).toOption.map(_ -> n)
    }
    // a dir still carrying the _sweeping marker is a crashed prune's
    // half-delete: debris whatever its batch or retention position —
    // finish it (idempotently) and keep it OUT of the retention count,
    // or a marked dir would occupy a keep slot while serving nothing
    val (half, whole) = entries.partition { case (_, n) =>
      store.exists(store.child(store.child(qRoot, n), "_sweeping"))
    }
    val (com, orph) = whole.partition { case (b, _) => committed.contains(b) }
    val orphans = orph.filter { case (_, n) =>
      inflightGraceMs <= 0L ||
        now - newestMtime(store.child(qRoot, n)) >= inflightGraceMs
    }
    val retired = keepBatches.fold(Seq.empty[(Long, String)]) { k =>
      com.sortBy(-_._1).drop(k)
    }
    (half.map(("quarantine_halfswept", _)) ++
      orphans.map(("quarantine_orphan", _)) ++
      retired.map(("quarantine", _)))
      .sortBy(_._2._1) // oldest first — the sweep's suffix invariant
      .map { case (kind, (_, n)) =>
        sweepDir(store.child(qRoot, n)); (kind, n)
      }
  }

  /** Apply a version's merge-on-read deletion vector (`_deletes/` —
    * see `upsertParquet(lazyDeletes=true)`): anti-join the snapshot
    * against the vector's keys. A version without a vector reads with
    * zero overhead. The join is left to the planner rather than
    * force-broadcast: the vector is churn-bounded (entries leave it at
    * every bucket rewrite / rebucket), so it is normally broadcast by
    * size stats, but a table carrying unbounded un-compacted delete
    * debt degrades to a shuffle join instead of a driver OOM.
    */
  private[sources] def applyDeletes(spark: SparkSession, root: String,
                           vDir: String, df: DataFrame)
                          (implicit store: TableStore): DataFrame = {
    val dvDir = store.child(vDir, "_deletes")
    val hasDv = store.listNames(dvDir).exists(_.endsWith(".parquet"))
    if (!hasDv) df
    else {
      val keys = tableMeta(root).apply("keys").split(",").toSeq
      df.join(spark.read.parquet(dvDir)
        .select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti")
    }
  }

  /** Parse the pinned `_meta` table properties (keys, buckets). */
  private[sources] def tableMeta(root: String)
                       (implicit store: TableStore): Map[String, String] =
    store.read(store.child(root, "_meta"))
      .getOrElse(throw new IllegalArgumentException(
        s"not an upsert table (no _meta): $root"))
      .linesIterator.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap

  /** The snapshot dir for CURRENT / a committed as-of batch (the
    * resolution rules documented on [[readUpsertTable]]).
    */
  /** The version directory a snapshot read serves — public so the
    * `graft` DataSource can price the relation (`sizeInBytes` =
    * physical bytes of exactly these files) for the broadcast-join
    * planner. Same committed-only resolution as [[readUpsertTable]].
    */
  def snapshotVersionDir(tableDir: String, asOfBatch: Option[Long] = None)
                        (implicit store: TableStore): String =
    resolveVersionDir(tableDir, asOfBatch)

  /** The committed batch id a tag names; loud when the tag is absent. */
  def tagBatch(tableDir: String, name: String)
              (implicit store: TableStore): Long =
    listTags(tableDir).collectFirst { case (`name`, b) => b }.getOrElse(
      throw new IllegalArgumentException(
        s"tag '$name' does not exist on $tableDir"))

  private[sources] def resolveVersionDir(root: String, asOfBatch: Option[Long])
                               (implicit store: TableStore): String = {
    val cur = readCurrentName(root)
    require(cur.nonEmpty, s"upsert table has no CURRENT pointer: $root")
    asOfBatch match {
      case None => store.child(root, cur.get)
      case Some(b) =>
        val committed = readLedger(root)
        val vds = versionDirs(root)
        val have = vds
          .collect { case (n, bb, g) if committed.contains(bb) &&
            genComplete(root, n, g, cur) => bb }.distinct
        val eligible = have.filter(_ <= b)
        require(eligible.nonEmpty,
          s"upsert table has no retained committed snapshot at or before " +
            s"batch $b (retained: ${have.sorted.mkString(",")}) — raise keepVersions")
        val best = eligible.max
        // a COMMITTED batch in (best, b] — whether its dir still
        // exists but is incomplete (mid-sweep: the `_sweeping` marker
        // survived a crash mid-delete) or the dir has VANISHED
        // entirely (a crash after a middle version's delete completed,
        // before older ones were swept) — was, a moment earlier, the
        // snapshot this read would rightfully serve; silently
        // answering with the older `best` state would be wrong data
        // with no error. Fail loudly. The ascending sweep order in
        // [[cleanupStale]] makes the vanished case unreachable in a
        // healthy table (retained batches stay a suffix of the
        // ledger), so this is defense-in-depth against out-of-band
        // deletion and pre-fix crash debris. Once a re-run cleanup
        // completes, the read gives the documented fallback or the
        // beyond-retention error. Zero-row batches (`_empty` ledger)
        // commit WITHOUT minting a version dir, so a healthy table
        // legitimately has committed batches with no snapshot — they
        // never shadow `best` (their snapshot state IS the previous
        // version's) and must not trip the guard.
        val shadowed =
          committed.filter(bb => bb > best && bb <= b) -- emptyBatchIds(root)
        // a TAG pin legitimately breaks the suffix shape: retention can
        // sweep batches between a pinned old snapshot and the retained
        // suffix, leaving `best` = the pin for this as-of range. That
        // is a healthy beyond-retention state, not corruption — refuse
        // with the retention error (serving the pin as-of `b` would be
        // stale data), not the corruption one.
        if (shadowed.nonEmpty && tagPinnedBatches(root).contains(best))
          throw new IllegalArgumentException(
            s"upsert table has no retained committed snapshot at batch $b " +
              s"— the nearest older snapshot (batch $best) survives only " +
              "via a tag pin and the batches between were retention-swept; " +
              "raise keepVersions or tag the batch you need")
        require(shadowed.isEmpty, {
          val (midSweep, vanished) =
            shadowed.partition(bb => vds.exists(_._2 == bb))
          s"as-of read of $root at batch $b cannot safely fall back to " +
            s"batch $best: committed batch(es) " +
            (if (midSweep.nonEmpty)
              s"${midSweep.toSeq.sorted.mkString(",")} are mid-sweep " +
                "(interrupted retention/vacuum delete)" else "") +
            (if (midSweep.nonEmpty && vanished.nonEmpty) " and " else "") +
            (if (vanished.nonEmpty)
              s"${vanished.toSeq.sorted.mkString(",")} have no snapshot dir " +
                "while an older one survives (non-suffix deletion)" else "") +
            " — re-run the cleanup (any commit or vacuum) and retry"
        })
        servableDir(root, best).get
    }
  }

  /** A version dir's own bucket count annotation (`_nbuckets`),
    * present on dirs written or stamped by [[rebucketUpsertTable]];
    * absent means the table-level `_meta` count applies.
    */
  private def versionBuckets(vDir: String)
                            (implicit store: TableStore): Option[Int] =
    store.read(store.child(vDir, "_nbuckets"))
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)

  /** Reader with the table's pinned `_schema` applied, so an
    * all-deleted / empty-first-batch snapshot (zero data files) still
    * reads as a typed empty table.
    */
  private[sources] def pinnedReader(spark: SparkSession, root: String)
                          (implicit store: TableStore) =
    store.read(store.child(root, "_schema")) match {
      case None => spark.read
      case Some(json) => spark.read.schema(
        org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType])
    }

  /** The pinned `_schema` as a StructType, when present. */
  private def pinnedSchema(root: String)
                          (implicit store: TableStore): Option[StructType] =
    store.read(store.child(root, "_schema")).map(json =>
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[StructType])

  /** Fresh stats-manifest rows for the (optionally bucket-restricted)
    * parquet files of a just-built version dir, derived from parquet
    * FOOTERS — no second read of the data the rewrite just wrote (r17,
    * guide §6). `None` whenever any file/column lacks exact footer
    * stats ([[StatsManifest.footerManifestRows]]); callers fall back
    * to the scan-based derivation.
    */
  private def footerFreshManifest(spark: SparkSession, newV: String,
                                  buckets: Option[Set[Long]],
                                  sortCols: Seq[String],
                                  schema: Option[StructType])
                                 (implicit store: TableStore)
      : Option[DataFrame] = {
    val sch = schema.getOrElse(return None)
    val dirs = store.listNames(newV)
      .filter(_.startsWith(s"$UpsertBucketCol="))
      .filter(n => store.isDirectory(store.child(newV, n)))
      .filter(n => buckets.forall(bs => scala.util.Try(
        n.stripPrefix(s"$UpsertBucketCol=").toLong).toOption.exists(bs)))
      .map(store.child(newV, _))
    val files = dirs.flatMap { d =>
      store.listNames(d).filter(_.endsWith(".parquet"))
        .filterNot(n => store.isDirectory(store.child(d, n)))
        .map(n => (store.child(d, n), s"${store.baseName(d)}/$n"))
    }
    if (files.isEmpty) None
    else StatsManifest.footerManifestRows(spark, files, sortCols, sch)
  }

  // --- column mapping (metadata-only RENAME / DROP COLUMN) ---

  /** Column-mapping state of a table (`_colmap`, one atomic control
    * object): `(physical, logical, live)` per NON-identity column.
    * Physical names are immutable once written into parquet files and
    * the pinned `_schema`; logical names are the user-facing surface
    * ([[renameColumn]] / [[dropColumn]] rewrite only this object —
    * zero data I/O, the ALTER TABLE cost model a 100-TB table
    * requires). A column absent from the map is identity-mapped and
    * live. A dead entry (`live = false`) is a DROP: the physical
    * column stays in history and the pinned schema, reads project it
    * out, and a later re-add of the same logical name mints a FRESH
    * physical name — dropped data is never resurrected (the field-ID
    * discipline, spelled with disjoint names instead of numeric ids:
    * [[renameColumn]] refuses targets that collide with any pinned
    * physical name, so logical→physical lookup is never ambiguous).
    */
  private[sources] def colMap(root: String)
                    (implicit store: TableStore): Seq[(String, String, Boolean)] =
    store.read(store.child(root, "_colmap")).toSeq
      .flatMap(_.split('\n')).map(_.trim).filter(_.nonEmpty).map { l =>
        val p = l.split('\t')
        require(p.length == 3, s"$root/_colmap: torn entry '$l'")
        (p(0), p(1), p(2) == "1")
      }

  private def writeColMap(root: String, cm: Seq[(String, String, Boolean)])
                         (implicit store: TableStore): Unit =
    store.writeAtomic(root, "_colmap",
      cm.filterNot(e => e._3 && e._1 == e._2) // identity entries vanish
        .map { case (p, lg, lv) => s"$p\t$lg\t${if (lv) "1" else "0"}" }
        .mkString("\n"))

  /** logical → physical for a LIVE name; identity when unmapped. */
  private[sources] def toPhysicalName(cm: Seq[(String, String, Boolean)],
                             logical: String): String =
    cm.find(e => e._3 && e._2 == logical).map(_._1).getOrElse(logical)

  /** physical → logical for a LIVE physical; identity when unmapped. */
  private[sources] def toLogicalName(cm: Seq[(String, String, Boolean)],
                            physical: String): String =
    cm.find(e => e._3 && e._1 == physical).map(_._2).getOrElse(physical)

  /** The user-facing column view of a PHYSICAL frame: dead physicals
    * dropped, live renames applied. Every snapshot/feed read ends
    * here; an empty map is the common case and a no-op.
    */
  private[sources] def logicalView(root: String)(df: DataFrame)
                         (implicit store: TableStore): DataFrame = {
    val cm = colMap(root)
    if (cm.isEmpty) df
    else {
      var out = df
      cm.filterNot(_._3).map(_._1).filter(out.columns.contains)
        .foreach(p => out = out.drop(p))
      cm.filter(_._3).foreach { case (p, lg, _) =>
        if (p != lg && out.columns.contains(p))
          out = out.withColumnRenamed(p, lg)
      }
      out
    }
  }

  /** The current LOGICAL column names of the table: pinned physicals
    * minus dead ones, live renames applied.
    */
  private def logicalNames(root: String,
                           cm: Seq[(String, String, Boolean)])
                          (implicit store: TableStore): Seq[String] = {
    val phys = store.read(store.child(root, "_schema"))
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType].fieldNames.toSeq)
      .getOrElse(Seq.empty)
    val dead = cm.filterNot(_._3).map(_._1).toSet
    phys.filterNot(dead).filterNot(_ == UpsertBucketCol)
      .map(p => toLogicalName(cm, p))
  }

  private val ColNameOk = "[A-Za-z_][A-Za-z0-9_]*".r

  /** ADD a named CHECK constraint to an EXISTING table — the explicit,
    * data-validating evolution of the create-time pin (`GRAFT ALTER
    * '<dir>' ADD CONSTRAINT n CHECK (expr)`): "invariants cannot start
    * mid-history" holds for the SINK (a writer cannot smuggle one in),
    * but an operator may promote one deliberately — at the price this
    * op charges up front: ONE full validation scan of the CURRENT
    * snapshot, refusing if any live row definitively violates (ANSI
    * CHECK: NULL passes). After the add, every later batch screens
    * against the grown pinned set exactly like a creation-time
    * constraint (including quarantine blame). The expression speaks
    * the table's PHYSICAL (creation-time) column names — the same rule
    * pinned constraints already follow under column mapping.
    * At 100 TB the validation scan is the op's honest cost (Delta
    * charges the same); it is one pushed-down predicate scan, not a
    * shuffle.
    */
  def addTableConstraint(spark: SparkSession, tableDir: String,
                         name: String, checkExpr: String)
                        (implicit store: TableStore): Unit = {
    import org.apache.spark.sql.functions.expr
    require(name.nonEmpty && !name.contains("=") && !name.contains("\n"),
      s"addTableConstraint: bad constraint name '$name'")
    // `_constraints` is a line-per-entry object: a newline inside the
    // expression would be parsed back as a bogus second entry
    require(!checkExpr.contains("\n") && !checkExpr.contains("\r"),
      "addTableConstraint: expression must be single-line")
    val have: Seq[(String, String)] =
      store.read(store.child(tableDir, "_constraints")).toSeq
        .flatMap(_.linesIterator).filter(_.nonEmpty)
        .map(_.split("=", 2)).collect { case Array(n, e) => n -> e }
    require(!have.exists(_._1 == name),
      s"addTableConstraint: '$name' already pinned on $tableDir")
    // validate the FULL current snapshot (physical view — constraint
    // expressions speak creation-time names): any definitively-FALSE
    // row refuses the add
    val vDir = resolveVersionDir(tableDir, None)
    val snap = applyDeletes(spark, tableDir, vDir,
      pinnedReader(spark, tableDir).option("basePath", vDir).parquet(vDir))
      .drop(UpsertBucketCol)
    // ANSI CHECK: a row violates only when the expression is
    // definitively FALSE (NULL passes — same rule the sink screens by)
    val violating = snap.filter(expr(checkExpr) <=>
      org.apache.spark.sql.functions.lit(false)).count()
    require(violating == 0L,
      s"addTableConstraint: $violating current row(s) of $tableDir " +
        s"violate '$name' — an invariant the data does not hold cannot " +
        "be pinned (heal the data first)")
    store.writeAtomic(tableDir, "_constraints",
      (have :+ (name -> checkExpr))
        .map { case (n, e) => s"$n=$e" }.mkString("", "\n", "\n"))
  }

  /** DROP a pinned CHECK constraint — metadata-only (`GRAFT ALTER
    * '<dir>' DROP CONSTRAINT n`): later batches stop screening it;
    * history is untouched (rows it once quarantined stay quarantined
    * with their recorded blame).
    */
  def dropTableConstraint(tableDir: String, name: String)
                         (implicit store: TableStore): Unit = {
    val have: Seq[(String, String)] =
      store.read(store.child(tableDir, "_constraints")).toSeq
        .flatMap(_.linesIterator).filter(_.nonEmpty)
        .map(_.split("=", 2)).collect { case Array(n, e) => n -> e }
    require(have.exists(_._1 == name),
      s"dropTableConstraint: no constraint '$name' on $tableDir " +
        s"(pinned: ${have.map(_._1).mkString(",")})")
    store.writeAtomic(tableDir, "_constraints",
      have.filterNot(_._1 == name)
        .map { case (n, e) => s"$n=$e" } match {
        case Nil => ""
        case ls => ls.mkString("", "\n", "\n")
      })
  }

  /** Metadata-only RENAME COLUMN: rewrite `_colmap` so reads surface
    * `to` where files store `from`'s physical column — no version, no
    * batch, no data I/O (`GRAFT ALTER '<dir>' RENAME COLUMN a TO b`).
    * Keys and sort columns may be renamed (their `_meta` pins stay
    * physical; every read/write path translates). The target must be
    * a fresh logical name AND must not collide with any pinned
    * physical name — keeping the two namespaces disjoint is what
    * makes name-based mapping as unambiguous as Iceberg's numeric
    * field ids. Pinned `_constraints` were declared against
    * creation-time (physical) names and keep validating unchanged;
    * as-of reads apply the CURRENT mapping (Delta's column-mapping
    * time-travel semantics).
    */
  def renameColumn(tableDir: String, from: String, to: String)
                  (implicit store: TableStore): Unit = {
    require(ColNameOk.matches(to),
      s"renameColumn: bad target column name '$to'")
    val cm = colMap(tableDir)
    val logical = logicalNames(tableDir, cm)
    require(logical.contains(from),
      s"renameColumn: no column '$from' (columns: ${logical.mkString(",")})")
    require(!logical.contains(to),
      s"renameColumn: column '$to' already exists")
    val phys = toPhysicalName(cm, from)
    val pinnedPhys = store.read(store.child(tableDir, "_schema"))
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType].fieldNames.toSet)
      .getOrElse(Set.empty)
    require(to == phys || !pinnedPhys.contains(to),
      s"renameColumn: '$to' collides with a physical column name — " +
        "pick a name never used by this table's storage")
    writeColMap(tableDir, cm.filterNot(_._1 == phys) :+ ((phys, to, true)))
  }

  /** Metadata-only DROP COLUMN: mark the physical column dead in
    * `_colmap` — history keeps the bytes, reads project the column
    * out, later batches may omit it (the sink null-fills the pinned
    * physical), and re-adding the same logical name creates a fresh
    * physical column (old values never resurface). Key and sort/stats
    * columns cannot be dropped (the layout and manifest are pinned on
    * them). `GRAFT ALTER '<dir>' DROP COLUMN a`.
    */
  def dropColumn(tableDir: String, name: String)
                (implicit store: TableStore): Unit = {
    val cm = colMap(tableDir)
    val logical = logicalNames(tableDir, cm)
    require(logical.contains(name),
      s"dropColumn: no column '$name' (columns: ${logical.mkString(",")})")
    val phys = toPhysicalName(cm, name)
    val meta = tableMeta(tableDir)
    require(!meta("keys").split(",").contains(phys),
      s"dropColumn: '$name' is a key column — the layout is pinned on it")
    require(!meta.get("sort").exists(_.split(",").contains(phys)),
      s"dropColumn: '$name' is a sort/stats column — the manifest is " +
        "pinned on it (REBUCKET/OPTIMIZE to a new layout first)")
    writeColMap(tableDir, cm.filterNot(_._1 == phys) :+ ((phys, name, false)))
  }

  /** Translate an incoming LOGICAL batch to the table's PHYSICAL
    * column names at the sink entry: live renames map back, a new
    * column colliding with a RETIRED physical name gets a fresh
    * physical (`<name>__<k>`, recorded live in `_colmap` so reads
    * surface the logical name), and retired physicals the pinned
    * schema still carries are null-filled so the widen-only check and
    * the bucket-merge union stay satisfied.
    */
  private def physicalizeBatch(root: String, batch: DataFrame,
                               skipCols: Set[String])
                              (implicit store: TableStore): DataFrame = {
    val cm = colMap(root)
    if (cm.isEmpty) return batch
    import org.apache.spark.sql.functions.lit
    var df = batch
    cm.filter(_._3).foreach { case (p, lg, _) =>
      if (lg != p && df.columns.contains(lg) && !skipCols(lg))
        df = df.withColumnRenamed(lg, p)
    }
    val retired = cm.filterNot(_._3).map(_._1).toSet
    val pinned = store.read(store.child(root, "_schema"))
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
    val pinnedNames = pinned.map(_.fieldNames.toSet).getOrElse(Set.empty)
    df.columns.filter(c => retired.contains(c) && !skipCols(c)).foreach { c =>
      val taken = pinnedNames ++ df.columns ++ retired
      val fresh = Iterator.from(2).map(i => s"${c}__$i")
        .find(f => !taken.contains(f)).get
      df = df.withColumnRenamed(c, fresh)
      writeColMap(root,
        colMap(root).filterNot(_._1 == fresh) :+ ((fresh, c, true)))
    }
    pinned.foreach(_.fields
      .filter(f => retired.contains(f.name) && !df.columns.contains(f.name))
      .foreach(f => df = df.withColumn(f.name, lit(null).cast(f.dataType))))
    df
  }

  /** MAINTENANCE ADVISOR — inspect a table's control plane and emit
    * the maintenance a 100-TB deployment's scheduler would run, one
    * row per recommendation `(action, target, reason, command)` with
    * `command` the ready-to-run GRAFT statement. Pure control-plane
    * reads (dir listings, small objects — no data file opens), so the
    * advisor itself is cron-cheap however large the table:
    *
    *   - a pending merge-on-read deletion vector → OPTIMIZE (drains
    *     debt, restores the metadata-aggregation path);
    *   - buckets holding more parquet files than `filesPerBucket` ×
    *     slack → COMPACT OVER n FILES (selective, link-carries the
    *     healthy buckets);
    *   - dead column-mapping entries → OPTIMIZE PURGE COLUMNS (the
    *     only way dropped bytes leave the snapshot);
    *   - committed dead-letter batches beyond `quarantineKeep` →
    *     QUARANTINE PRUNE;
    *   - retained version dirs beyond `keepVersions` + grace →
    *     VACUUM.
    *
    * The advisor RECOMMENDS — executing the emitted commands then
    * re-running it converges to zero rows (spec-pinned), the
    * idempotence a scheduler loop needs. Signals it deliberately does
    * NOT judge: ZORDER drift (probe-shape dependent — an operator
    * decision, SCALE.md), REBUCKET sizing (needs byte-level targets
    * the control plane does not carry).
    */
  def maintenancePlan(spark: SparkSession, tableDir: String,
                      keepVersions: Int = 4, quarantineKeep: Int = 8,
                      fileSlack: Int = 2)
                     (implicit store: TableStore): DataFrame = {
    import spark.implicits._
    val root = tableDir
    val meta = tableMeta(root)
    val curName = readCurrentName(root)
    require(curName.nonEmpty, s"upsert table has no CURRENT pointer: $root")
    val curDir = store.child(root, curName.get)
    val fpb = meta.get("fpb").map(_.toInt).getOrElse(4)
    val out = Seq.newBuilder[(String, String, String, String)]
    if (store.exists(store.child(curDir, "_deletes")))
      out += (("OPTIMIZE", root,
        "pending merge-on-read deletion vector (blocks metadata " +
          "aggregates, taxes every read)",
        s"GRAFT OPTIMIZE '$root'"))
    // per-bucket parquet counts of CURRENT — one listing per bucket
    val cap = fpb * fileSlack
    val fat = store.listNames(curDir)
      .filter(_.startsWith(s"$UpsertBucketCol="))
      .map { b =>
        b -> store.listNames(store.child(curDir, b))
          .count(_.endsWith(".parquet"))
      }
      .filter(_._2 > cap)
    if (fat.nonEmpty)
      out += (("COMPACT",
        fat.map(_._1).sorted.mkString(","),
        s"${fat.size} bucket(s) over $cap files (max ${fat.map(_._2).max})",
        s"GRAFT COMPACT '$root' OVER $cap FILES"))
    val dead = colMap(root).filterNot(_._3)
    if (dead.nonEmpty)
      out += (("OPTIMIZE PURGE COLUMNS", root,
        s"${dead.size} dropped column(s) still occupy bytes " +
          s"(${dead.map(_._2).sorted.mkString(",")})",
        s"GRAFT OPTIMIZE '$root' PURGE COLUMNS"))
    val qDir = store.child(root, QuarantineDir)
    if (store.isDirectory(qDir)) {
      val committed = readLedger(root)
      val qBatches = store.listNames(qDir)
        .filter(_.startsWith("b_"))
        .flatMap(n => scala.util.Try(n.drop(2).toLong).toOption)
        .filter(committed.contains)
      if (qBatches.size > quarantineKeep)
        out += (("QUARANTINE PRUNE", qDir,
          s"${qBatches.size} dead-letter batches retained > " +
            s"$quarantineKeep",
          s"GRAFT QUARANTINE PRUNE '$root' KEEP $quarantineKeep BATCHES"))
    }
    val retained = versionDirs(root).size
    if (retained > keepVersions)
      out += (("VACUUM", root,
        s"$retained retained versions > $keepVersions",
        s"GRAFT VACUUM '$root' KEEP $keepVersions VERSIONS"))
    out.result()
      .toDF("action", "target", "reason", "command")
  }

  /** Point-lookup read of an [[upsertParquet]] table: scan ONLY the
    * bucket dirs the probe keys hash to, then exact-match inside them.
    * This is the read path the hash-bucketed layout exists for — a
    * key's row can live in exactly one bucket (`pmod(xxhash64(keys),
    * nBuckets)`, pinned in `_meta`), so a k-key lookup reads O(k)
    * buckets however large the table is, where the plain
    * [[readUpsertTable]]-then-filter scans every file.
    *
    * `probe` carries the key columns (extra columns are ignored); it
    * is assumed point-lookup-sized — its distinct keys are broadcast
    * for the exact match. The only driver-side collect is the DISTINCT
    * BUCKET set, bounded by nBuckets small ints (the same bound the
    * sink's own merge planning uses), never by probe or table size. A
    * probe too large to broadcast belongs in a regular join against
    * [[readUpsertTable]] instead. Keys absent from the table simply
    * match nothing — including keys hashing to a bucket dir that does
    * not exist (never-written bucket), which contributes no scan at
    * all.
    */
  def lookupUpsertTable(spark: SparkSession, tableDir: String,
                        probe: DataFrame,
                        asOfBatch: Option[Long] = None)
                       (implicit store: TableStore): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, pmod, xxhash64}
    val root = tableDir
    val meta = tableMeta(root)
    val cm = colMap(root) // probe speaks logical; _meta pins physical
    val keys = meta("keys").split(",").toSeq.map(toLogicalName(cm, _))
    keys.foreach(k => require(probe.columns.contains(k),
      s"lookup probe is missing key column '$k' (table keys: " +
        s"${keys.mkString(",")})"))
    val vDir = resolveVersionDir(root, asOfBatch)
    // the bucket count that hashed THIS version's layout: the dir's own
    // `_nbuckets` annotation when present (stamped by rebucket — a
    // retained pre-rebucket snapshot keeps its original count), the
    // table-level `_meta` otherwise
    val nBuckets = versionBuckets(vDir).getOrElse(meta("buckets").toInt)
    val probeKeys = probe.select(keys.map(col): _*).distinct()
    // ≤ nBuckets small ints — bounded by the table property, not data
    val buckets: Seq[Long] = probeKeys
      .select(pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val bucketDirs = buckets
      .map(b => store.child(vDir, s"$UpsertBucketCol=$b"))
      .filter(store.isDirectory)
    val reader = pinnedReader(spark, root)
    val scan =
      if (bucketDirs.isEmpty)
        // typed empty via the pinned schema over the (possibly empty)
        // version dir — same trick the snapshot read uses
        reader.option("basePath", vDir).parquet(vDir)
          .filter(lit(false))
      else reader.option("basePath", vDir)
        .parquet(bucketDirs: _*)
    logicalView(root)(
      applyDeletes(spark, root, vDir, scan).drop(UpsertBucketCol))
      .join(broadcast(probeKeys), keys, "left_semi")
  }

  /** Re-bucket an [[upsertParquet]] table — THE maintenance operation a
    * hash-bucketed table format needs as it grows: batch cost is
    * O(touched buckets) and point lookups read O(k) buckets, so the
    * bucket count must track table size (16 buckets is right for
    * gigabytes and hopeless at 100 TB, where a bucket should stay a
    * few GB). The CURRENT snapshot is rewritten under the NEW hash
    * (`pmod(xxhash64(keys), newBuckets)`) as a new GENERATION of the
    * same committed batch — `v_<b>.<gen+1>` — never a new batchId, so
    * a streaming writer's monotone batchIds can't collide with
    * maintenance commits and the ledger stays the pure batch history.
    *
    * Protocol order, crash-safe at every step:
    *   1. stamp `_nbuckets` into every retained version dir that lacks
    *      one (their layout was implied by `_meta`, which is about to
    *      move — the annotation makes it explicit, so time-travel
    *      point lookups keep pruning correctly);
    *   2. build the new generation (data re-hashed + re-partitioned,
    *      one file per bucket; the change feed hard-linked forward —
    *      the feed lives inside its version);
    *   3. `_gen_commit` marker (a gen dir without it is a crashed
    *      build: never served, swept by the next cleanup);
    *   4. atomic CURRENT swap;
    *   5. `_meta` update to the new count (later writers must pass it
    *      — the sink fails loudly on a count that doesn't match
    *      CURRENT's `_nbuckets`, and re-running this op completes an
    *      interrupted rebucket idempotently);
    *   6. sweep the superseded generation (same reader race as
    *      retention: single-writer, readers-on-retained-snapshots).
    *
    * Doubles as small-file compaction for the snapshot: the rewrite
    * yields exactly one file per non-empty bucket.
    */
  def rebucketUpsertTable(spark: SparkSession, tableDir: String,
                          newBuckets: Int)
                         (implicit store: TableStore): Unit =
    rewriteGeneration(spark, tableDir, newBuckets, forceSameCount = false)

  /** OPTIMIZE for the table format: rewrite CURRENT as a new
    * generation at the SAME bucket count — one maintenance pass that
    * compacts each bucket's accumulated small files (range-slice churn
    * from sorted merges, link history), applies and clears any pending
    * merge-on-read deletion vector, restores the pinned in-bucket sort
    * order, and rebuilds the stats manifest fresh. The crash-safe
    * generation protocol (stamp → build → `_gen_commit` → swap → sweep)
    * is [[rebucketUpsertTable]]'s — same committed batch, no batchId
    * minted, idempotent completion — which is why this is one flag on
    * the shared body, not a second protocol. At 100 TB this is the
    * scheduled compaction job: run it when delete debt or file counts
    * cross a threshold, at full-rewrite cost, deliberately and rarely.
    */
  def optimizeUpsertTable(spark: SparkSession, tableDir: String,
                          purgeColumns: Boolean = false)
                         (implicit store: TableStore): Unit = {
    val n = tableMeta(tableDir).apply("buckets").toInt
    // purgeColumns (`GRAFT OPTIMIZE … PURGE COLUMNS`, Delta's REORG …
    // PURGE): the rewrite additionally excludes column-mapping-dropped
    // physical columns from the new generation, then narrows the
    // pinned schema and clears the dead `_colmap` entries — the only
    // way dropped bytes leave the CURRENT snapshot (retained old
    // versions keep theirs until retention sweeps them), and the
    // moment the dropped logical name becomes a plain fresh column
    // again for later writes
    rewriteGeneration(spark, tableDir, n, forceSameCount = true,
      purgeDeadCols = purgeColumns)
  }

  /** OPTIMIZE with MULTI-DIMENSIONAL clustering: the same full
    * generation rewrite as [[optimizeUpsertTable]], but each bucket's
    * files are laid out along a Morton (Z-order) curve over the
    * table's pinned stats columns instead of their linear sort — so a
    * range probe constrained on ANY of the dimensions (not just the
    * leading one) prunes files through the stats manifest. The
    * Delta-style contract, made explicit:
    *
    *   - `zorderBy` must be a permutation of the pinned `sortCols`
    *     (2 or 3 of them): the manifest's min/max schema — which every
    *     later merge carries and extends — does not change; ZORDER
    *     changes the CLUSTERING the stats describe, never the stats
    *     surface. Columns must cast to double (numeric/timestamp).
    *   - Later merges restore the pinned LINEAR sort in the buckets
    *     they rewrite (their manifests stay valid — linear slices have
    *     tight boxes on the leading column), so the interleaved layout
    *     degrades with churn and is restored at the next ZORDER pass —
    *     exactly the scheduled-maintenance cadence OPTIMIZE already
    *     has.
    *
    * Quantization is linear min/max scaling into the curve's per-dim
    * bit budget (16 bits × 2 dims / 10 × 3 — one extra stats agg per
    * pass); NULLs cluster together at the curve's origin end.
    */
  def optimizeUpsertTableZorder(spark: SparkSession, tableDir: String,
                                zorderBy: Seq[String])
                               (implicit store: TableStore): Unit = {
    val meta = tableMeta(tableDir)
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)
    require(zorderBy.size == 2 || zorderBy.size == 3,
      s"optimizeUpsertTableZorder: 2 or 3 columns, got ${zorderBy.size}")
    require(sortCols.nonEmpty && zorderBy.toSet == sortCols.toSet,
      s"optimizeUpsertTableZorder: ZORDER BY (${zorderBy.mkString(",")}) " +
        s"must be a permutation of the pinned stats columns " +
        s"(${sortCols.mkString(",")}) — the manifest schema every later " +
        "merge carries must not change")
    rewriteGeneration(spark, tableDir, meta("buckets").toInt,
      forceSameCount = true, zorderCols = zorderBy)
  }

  /** Selective COMPACTION: rewrite ONLY the buckets that need it —
    * file count above `filesOver`, or carrying merge-on-read delete
    * debt — and carry every other bucket's files forward as
    * links/copies. [[optimizeUpsertTable]] is the full-rewrite pass
    * (restores global layout, rebuilds everything); THIS is the
    * cadence op a 100-TB table actually schedules: cost rides the
    * small-file/delete DEBT, not the table. A bucket accumulating
    * range-slice churn compacts to its pinned layout; the other 99%
    * of the table moves zero data bytes (hard links under POSIX).
    *
    * Protocol is the generation rewrite's, unchanged: build
    * `v_<b>.<g+1>` (rewritten buckets written, carried buckets
    * linked, stats-manifest rows carried with their paths re-rooted +
    * rebuilt fresh for rewritten buckets, feed slice linked),
    * `_gen_commit` last, CAS swap, sweep the superseded generation —
    * so the crash windows are the ones CrashWindowSpec already
    * sweeps. The deletion vector is fully applied (its buckets are
    * forced into the rewrite set) and NOT carried forward.
    *
    * Returns the bucket ids rewritten — empty means no debt anywhere
    * and NO new generation was minted (a true no-op).
    */
  def compactUpsertTable(spark: SparkSession, tableDir: String,
                         filesOver: Int = 4)
                        (implicit store: TableStore): Seq[Int] = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(filesOver >= 1, s"compactUpsertTable: bad threshold $filesOver")
    val root = tableDir
    val meta = tableMeta(root)
    val keys = meta("keys").split(",").toSeq
    val curName = readCurrentName(root)
    require(curName.nonEmpty, s"upsert table has no CURRENT pointer: $root")
    val curDir = store.child(root, curName.get)
    val nBuckets = versionBuckets(curDir).getOrElse(meta("buckets").toInt)
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)

    def bucketOf(name: String): Option[Int] =
      if (name.startsWith(s"$UpsertBucketCol="))
        scala.util.Try(name.stripPrefix(s"$UpsertBucketCol=").toInt).toOption
      else None
    val bucketDirs: Seq[(Int, String)] = store.listNames(curDir)
      .flatMap(n => bucketOf(n).map(_ -> store.child(curDir, n)))
    def parquetsIn(d: String): Seq[String] =
      store.listNames(d).filter(_.endsWith(".parquet"))
        .filterNot(n => store.isDirectory(store.child(d, n)))
    val overgrown = bucketDirs
      .filter { case (_, d) => parquetsIn(d).size > filesOver }
      .map(_._1).toSet
    // delete debt forces its buckets in: compaction is how the vector
    // drains, and a partial apply would tear it
    val delDir = store.child(curDir, "_deletes")
    val debt: Set[Int] =
      if (!store.isDirectory(delDir)) Set.empty
      else spark.read.parquet(delDir)
        .select(pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))
          .cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
    val rewrite = overgrown ++ debt
    if (rewrite.isEmpty) return Nil

    val (b, g) = parseVersion(curName.get).get
    val newName = versionName(b, g + 1)
    val newV = store.child(root, newName)
    store.deleteTree(newV)
    store.mkdirs(newV)
    // rewritten buckets collapse to ONE sorted file each — maximum
    // compaction, and the reason a second pass is a guaranteed no-op.
    // (A single file's manifest bounds span the whole bucket; the
    // full-rewrite OPTIMIZE is the pass that restores the fpb-slice
    // layout when tight per-file pruning matters more than file count.)
    val selected = applyDeletes(spark, root, curDir,
      pinnedReader(spark, root).option("basePath", curDir).parquet(curDir))
      .filter(col(UpsertBucketCol).isin(rewrite.toSeq.map(_.toLong): _*))
    val laid = selected
      .repartition(math.max(1, rewrite.size), col(UpsertBucketCol))
      .sortWithinPartitions((col(UpsertBucketCol) +: sortCols.map(col)): _*)
    laid.write.partitionBy(UpsertBucketCol).mode("append").parquet(newV)
    // carried buckets: links, zero data movement
    bucketDirs.filterNot { case (bk, _) => rewrite.contains(bk) }
      .foreach { case (bk, d) =>
        val dst = store.child(newV, s"$UpsertBucketCol=$bk")
        store.mkdirs(dst)
        parquetsIn(d).foreach(n => linkInto(store.child(d, n), dst))
      }
    if (sortCols.nonEmpty) {
      // manifest: carried rows re-rooted to the new generation's
      // paths, fresh rows scanned only for the rewritten buckets
      import org.apache.spark.sql.functions.{input_file_name, regexp_replace}
      val aggs = StatsManifest.statsAggs(sortCols)
      val footerFresh = footerFreshManifest(spark, newV,
        Some(rewrite.map(_.toLong)), sortCols, pinnedSchema(root))
      val fresh = footerFresh
        .getOrElse(pinnedReader(spark, root).option("basePath", newV)
          .parquet(newV)
          .filter(col(UpsertBucketCol).isin(rewrite.toSeq.map(_.toLong): _*))
          .select(sortCols.map(col): _*)
          .groupBy(StatsManifest.relFile(newName).as("file"))
          .agg(aggs.head, aggs.tail: _*))
      val oldMan = store.child(curDir, StatsManifest.ManifestDir)
      val carriedOpt =
        if (!store.isDirectory(oldMan)) None
        else {
          val dropPat = rewrite.toSeq.sorted
            .map(bk => "(^|/)" + java.util.regex.Pattern
              .quote(s"$UpsertBucketCol=$bk/")).mkString("|")
          // carry by VERSION-DIR SEGMENT, not full-path prefix: on a
          // link-copied tree the recorded paths are the pristine
          // tree's, so a full-prefix replace is a silent no-op and the
          // carried rows would keep the OLD version segment under a
          // foreign prefix — outside StatsManifest.rebase's reach
          // (it keys on the NEW version-dir name). Matches the merge
          // path's carry (ADVICE r16).
          Some(spark.read.parquet(oldMan)
            .filter(!col("file").rlike(dropPat))
            .withColumn("file", regexp_replace(col("file"),
              java.util.regex.Pattern.quote(s"/${curName.get}/"),
              java.util.regex.Matcher.quoteReplacement(s"/$newName/"))))
        }
      val manifest = carriedOpt.fold(fresh)(c => fresh.unionByName(c))
      if (footerFresh.isDefined || manifest.head(1).nonEmpty)
        manifest.coalesce(1).write.parquet(
          store.child(newV, StatsManifest.ManifestDir))
    }
    val oldCh = store.child(curDir, "_changes")
    if (store.isDirectory(oldCh)) {
      val dst = store.child(newV, "_changes")
      store.mkdirs(dst)
      store.listNames(oldCh)
        .filterNot(n => store.isDirectory(store.child(oldCh, n)))
        .foreach(n => linkInto(store.child(oldCh, n), dst))
    }
    store.writeAtomic(newV, "_nbuckets", s"$nBuckets\n")
    store.writeAtomic(newV, "_gen_commit", "")
    if (!store.putConditional(root, "CURRENT", curName, newName)) {
      val nowName = readCurrentName(root)
      throw new java.util.ConcurrentModificationException(
        s"compactUpsertTable: CURRENT of $tableDir moved from " +
          s"${curName.getOrElse("<none>")} to ${nowName.getOrElse("<none>")} " +
          "while the compacted generation was built — a concurrent writer " +
          "committed. Nothing was swapped; re-run against the new snapshot")
    }
    sweepDir(curDir)
    rewrite.toSeq.sorted
  }

  /** RESTORE: make the table's state equal its committed snapshot at
    * `toBatch` — as a NEW committed batch through the normal sink, not
    * a history rewrite. History stays intact (the pre-restore batches
    * remain time-travelable within retention), replay/crash safety is
    * the sink protocol's (already failpoint-swept), and on a feed
    * table the batch's change slice records exactly the rows that
    * differ — so every downstream feed consumer (secondary index,
    * incremental MV, replica, ANN fold) converges to the restored
    * state by its ordinary fold, at diff cost.
    *
    * Cost: two snapshot scans for the diff (unavoidable — restore must
    * know what changed), then a write that RIDES THE DIFF: only
    * buckets holding changed/deleted keys rewrite. Restoring yesterday
    * on a 100-TB table with 0.1% churn writes ~0.1% of the buckets.
    * An identical snapshot (empty diff) commits an empty batch — feed
    * contiguity is preserved rather than skipping a batchId.
    *
    * Returns the minted batchId.
    */
  def restoreUpsertTable(spark: SparkSession, tableDir: String, toBatch: Long,
                         keepVersions: Int = 2, graceMs: Long = 0L)
                        (implicit store: TableStore): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val meta = tableMeta(tableDir)
    val keys = meta("keys").split(",").toSeq
    val nBuckets = meta("buckets").toInt
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)
    val fpb = meta.get("fpb").map(_.toInt).getOrElse(4)
    val feed = store.exists(store.child(tableDir, "_cdf"))
    val committed = readLedger(tableDir)
    require(committed.contains(toBatch),
      s"restoreUpsertTable: batch $toBatch is not committed in $tableDir " +
        s"(committed: ${committed.toSeq.sorted.mkString(",")})")
    val newBatch = committed.max + 1
    val target = readUpsertTable(spark, tableDir, Some(toBatch))
    val current = readUpsertTable(spark, tableDir)
    val flag = "_restore_deleted"
    require(!target.columns.contains(flag),
      s"restoreUpsertTable: table has a reserved column name $flag")
    // rows to write: any target row differing from current (changed or
    // re-inserted); keys to tombstone: present now, absent at toBatch
    val ups = target.exceptAll(current).withColumn(flag, lit(false))
    val dels = current
      .join(target.select(keys.map(col): _*), keys, "left_anti")
      .withColumn(flag, lit(true))
    upsertParquet(tableDir, keys, nBuckets = nBuckets,
      keepVersions = keepVersions, deleteCol = Some(flag),
      graceMs = graceMs, changeFeed = feed, sortCols = sortCols,
      filesPerBucket = fpb)(ups.unionByName(dels), newBatch)
    newBatch
  }

  /** Shallow CLONE: a NEW table at `dstDir` whose batch-0 state is
    * `srcDir`'s CURRENT snapshot, sharing data files through
    * [[TableStore.linkOrCopy]] — hard links under POSIX (zero data
    * I/O whatever the table size: the dev/test-sandbox op), server-side
    * copies under an object store. The clone is fully independent
    * afterwards: its first bucket rewrite breaks the sharing for
    * exactly the touched buckets, and neither table's
    * retention/vacuum can corrupt the other (links/copies, never
    * shared control state).
    *
    * Deliberately NOT carried: history (the clone starts at batch 0 —
    * time travel into the source's past belongs to the source, and
    * with it the `_tags` ledger: a tag names a SOURCE batch, which the
    * clone's fresh ledger cannot resolve) and the
    * CHANGE FEED (`_cdf`): a feed must start at a table's history
    * start, and batch 0 of a zero-copy clone has no change slice —
    * writing one would cost a full data copy. A consumer needing a
    * feed-bearing copy builds a replica through the feed instead
    * ([[graft.operators.Changes]]'s replication) at data cost. Carried:
    * `_meta` layout (keys/buckets/sort), pinned `_schema`,
    * `_constraints`, the snapshot's `_nbuckets` annotation, stats
    * manifest and any pending merge-on-read deletion vector (they ARE
    * the state).
    *
    * Crash safety: `CURRENT` is written LAST — a half-built clone has
    * no pointer and is not a table; re-running the clone clears the
    * debris and completes. Fails loudly if `dstDir` already has a
    * CURRENT pointer.
    */
  def cloneUpsertTable(spark: SparkSession, srcDir: String, dstDir: String)
                      (implicit store: TableStore): Unit = {
    cloneInto(spark, srcDir, dstDir, lineage = None)
    ()
  }

  /** Shared clone body ([[cloneUpsertTable]] / [[branchUpsertTable]]):
    * links the source's CURRENT snapshot into `dstDir`, writing the
    * optional `_branch_base` lineage file BEFORE the pointer so a
    * crash never yields a pointered table with half its identity.
    * Returns the cloned source version name (its batch id is the
    * branch base — race-free: read from the linked snapshot itself,
    * not a separate ledger fetch a concurrent writer could outrun).
    */
  private def cloneInto(spark: SparkSession, srcDir: String, dstDir: String,
                        lineage: Option[String => String])
                       (implicit store: TableStore): String = {
    require(tableMeta(srcDir).contains("keys"), // fails fast on non-tables
      s"cloneUpsertTable: $srcDir has no pinned keys")
    val curName = readCurrentName(srcDir)
    require(curName.nonEmpty, s"upsert table has no CURRENT pointer: $srcDir")
    require(readCurrentName(dstDir).isEmpty,
      s"cloneUpsertTable: $dstDir is already a table (has CURRENT)")
    store.deleteTree(dstDir) // clear any half-built clone debris
    val srcV = store.child(srcDir, curName.get)
    val dstV = store.child(dstDir, "v_0")
    def linkTree(src: String, dst: String): Unit = {
      store.mkdirs(dst)
      store.listNames(src).foreach { n =>
        val s = store.child(src, n)
        if (store.isDirectory(s)) {
          if (n != "_changes") linkTree(s, store.child(dst, n))
        } else if (n != "_gen_commit") linkInto(s, dst)
      }
    }
    linkTree(srcV, dstV)
    store.writeAtomic(dstDir, "_meta",
      store.read(store.child(srcDir, "_meta")).get)
    store.read(store.child(srcDir, "_schema"))
      .foreach(s => store.writeAtomic(dstDir, "_schema", s))
    store.read(store.child(srcDir, "_constraints"))
      .foreach(s => store.writeAtomic(dstDir, "_constraints", s))
    store.read(store.child(srcDir, "_colmap"))
      .foreach(s => store.writeAtomic(dstDir, "_colmap", s))
    lineage.foreach(f =>
      store.writeAtomic(dstDir, "_branch_base", f(curName.get)))
    store.appendLog(store.child(dstDir, "_commits"), "0")
    store.writeAtomic(dstDir, "CURRENT", "v_0")
    curName.get
  }

  /** Write-audit-publish BRANCH: a zero-copy [[cloneUpsertTable]] that
    * additionally records its lineage (`_branch_base`: the source root
    * and the batch id of the cloned snapshot) so [[publishUpsertTable]]
    * can later fast-forward the source to the audited branch state.
    * The WAP workflow this enables on a 100-TB table: branch (zero
    * data I/O under POSIX links, server-side copies elsewhere), write
    * the risky batches to the BRANCH through the ordinary sink
    * (constraints travel with the clone, so they screen the branch
    * writes too), audit with any query against the branch, then
    * publish — or discard the branch dir and the source never saw any
    * of it. Returns the base batch id the branch forked from.
    */
  def branchUpsertTable(spark: SparkSession, srcDir: String, branchDir: String)
                       (implicit store: TableStore): Long = {
    val srcV = cloneInto(spark, srcDir, branchDir,
      lineage = Some(v => s"src=$srcDir\nbatch=${parseVersion(v).get._1}\n"))
    parseVersion(srcV).get._1
  }

  /** PUBLISH the audited state of a WAP branch back to its source:
    * computes the branch-vs-source diff and applies it as ONE new
    * committed batch through the normal sink — so crash safety is the
    * (failpoint-swept) sink protocol's, the source's pinned
    * constraints screen the publish, and on a feed table the batch's
    * change slice is exactly the diff (every downstream consumer —
    * index, MV, replica, ANN fold — converges at diff cost).
    *
    * Concurrency: fails loudly (`ConcurrentModificationException`)
    * when the source advanced past the branch base — the audit ran
    * against a snapshot that is no longer the head, so silently
    * clobbering the newer commits would un-audit them; `force = true`
    * overrides with MERGE semantics: the diff applied is the branch's
    * OWN changes (branch CURRENT vs its batch-0 fork snapshot, which
    * must still be retained on the branch), so keys the source gained
    * or changed concurrently survive unless the branch touched the
    * same key (branch wins on contested keys). When the source never
    * moved the two diffs are identical by construction. A publish
    * that finds the source already equal to the branch returns None
    * without minting a batch, which makes publish convergent: a
    * re-run after a crash that landed the commit (or a publish of an
    * untouched branch) is a clean no-op, not a duplicate.
    *
    * Cost decomposes exactly like [[restoreUpsertTable]]: two snapshot
    * scans for the diff, then a write that rides the diff (only
    * buckets holding changed/deleted keys rewrite). Returns the minted
    * batch id, or None when the source already equals the branch.
    */
  def publishUpsertTable(spark: SparkSession, branchDir: String,
                         keepVersions: Int = 2, graceMs: Long = 0L,
                         force: Boolean = false)
                        (implicit store: TableStore): Option[Long] = {
    import org.apache.spark.sql.functions.{col, lit}
    val lineage = store.read(store.child(branchDir, "_branch_base"))
      .getOrElse(throw new IllegalArgumentException(
        s"publishUpsertTable: $branchDir is not a WAP branch " +
          "(no _branch_base lineage — was it created by branchUpsertTable?)"))
    val kv = lineage.split('\n').map(_.trim).filter(_.contains('='))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    val srcDir = kv("src")
    require(readLedger(branchDir).contains(0L), // branch batch 0 = the fork
      s"publishUpsertTable: branch $branchDir has no committed fork batch")
    val meta = tableMeta(srcDir)
    val keys = meta("keys").split(",").toSeq
    val nBuckets = meta("buckets").toInt
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)
    val fpb = meta.get("fpb").map(_.toInt).getOrElse(4)
    val feed = store.exists(store.child(srcDir, "_cdf"))
    val flag = "_publish_deleted"
    val target = readUpsertTable(spark, branchDir)
    // heal a swap-to-append crash window FIRST — skipping straight to
    // the empty-diff no-op would strand the version uncommitted
    completeDanglingCommit(spark, srcDir, keepVersions, graceMs)
    require(!target.columns.contains(flag),
      s"publishUpsertTable: table has a reserved column name $flag")
    // full-state diff of the branch vs a reference snapshot: upsert
    // rows = branch rows the reference lacks (changed or inserted),
    // tombstones = reference keys the branch dropped. The branch may
    // have WIDENED (the sink's evolution path publishes the new
    // columns); the reference side aligns with typed nulls.
    def diffVs(ref0: DataFrame): DataFrame = {
      require(ref0.columns.forall(target.columns.contains),
        s"publishUpsertTable: branch $branchDir dropped columns " +
          s"${ref0.columns.filterNot(target.columns.contains).mkString(",")} " +
          "— the format's evolution is widen-only")
      val ref = target.columns.filterNot(ref0.columns.contains)
        .foldLeft(ref0)((d, c) =>
          d.withColumn(c, lit(null).cast(target.schema(c).dataType)))
        .select(target.columns.map(col): _*)
      val ups = target.exceptAll(ref).withColumn(flag, lit(false))
      val dels = ref
        .join(target.select(keys.map(col): _*), keys, "left_anti")
        .withColumn(flag, lit(true))
      ups.unionByName(dels)
    }
    // already in sync (a re-run after a committed publish, or a branch
    // the source caught up with) → convergent no-op
    val syncDiff = diffVs(readUpsertTable(spark, srcDir))
    if (syncDiff.isEmpty) return None
    val head = readLedger(srcDir).max
    if (!force && head != baseOf(branchDir, srcDir))
      throw new java.util.ConcurrentModificationException(
        s"publishUpsertTable: $srcDir advanced past the branch base " +
          s"(base=${baseOf(branchDir, srcDir)}, head=$head) — the audit ran " +
          "against a stale snapshot; re-branch and re-audit, or pass " +
          "force=true to merge the branch's own changes over the head")
    // non-force: head == base, so the source CURRENT *is* the fork
    // snapshot and the two diffs coincide; force: diff the branch
    // against its OWN fork (batch 0, must still be retained) so
    // concurrent source commits survive on uncontested keys
    val diff =
      if (force) diffVs(readUpsertTable(spark, branchDir, Some(0L)))
      else syncDiff
    if (force && diff.isEmpty) return None // untouched branch, src moved
    val newBatch = head + 1
    upsertParquet(srcDir, keys, nBuckets = nBuckets,
      keepVersions = keepVersions, deleteCol = Some(flag),
      graceMs = graceMs, changeFeed = feed, sortCols = sortCols,
      filesPerBucket = fpb)(diff, newBatch)
    Some(newBatch)
  }

  /** Row-level DELETE as SQL-style DML on the table format: tombstone
    * every CURRENT row matching `predicate` (a SQL boolean expression
    * over the table's columns) as ONE new committed batch through the
    * normal sink — crash safety, OCC, constraints and the change feed
    * are all the sink's. The write rides the match: only buckets
    * holding matched keys rewrite (`lazyDeletes = true` defers even
    * that to a merge-on-read vector). No matches → None, nothing
    * minted. Returns (minted batch id, rows deleted).
    *
    * Scale: one snapshot scan to find victims (predicate pushed to the
    * pinned-schema parquet read), then the sink's diff-riding write —
    * a 0.1%-selectivity delete on a 100-TB table rewrites ~0.1% of
    * buckets, or zero data with lazyDeletes.
    */
  def deleteWhere(spark: SparkSession, tableDir: String, predicate: String,
                  keepVersions: Int = 2, graceMs: Long = 0L,
                  lazyDeletes: Boolean = false)
                 (implicit store: TableStore): Option[(Long, Long)] =
    dmlBatch(spark, tableDir, keepVersions, graceMs, lazyDeletes) { cur =>
      import org.apache.spark.sql.functions.{expr, lit}
      cur.filter(expr(predicate)).withColumn(DmlFlag, lit(true))
    }

  /** Row-level UPDATE as SQL-style DML on the table format: for every
    * CURRENT row matching `predicate`, apply the `set` assignments
    * (column → SQL expression over the row's columns — ALL of them
    * reading the pre-update row, standard SQL UPDATE semantics) and
    * commit the changed rows as ONE batch through the normal sink.
    * Key columns
    * cannot be assigned (an update that moves a key is a delete +
    * insert — spell it as one). Rows whose assignments produce the
    * values they already hold are skipped, so a no-op update mints
    * nothing (None). Returns (minted batch id, rows updated).
    */
  def updateWhere(spark: SparkSession, tableDir: String,
                  set: Seq[(String, String)], predicate: String,
                  keepVersions: Int = 2, graceMs: Long = 0L)
                 (implicit store: TableStore): Option[(Long, Long)] = {
    val keys = tableMeta(tableDir).apply("keys").split(",").toSeq
      .map(toLogicalName(colMap(tableDir), _)) // assignments are logical
    set.foreach { case (c, _) =>
      require(!keys.contains(c),
        s"updateWhere: cannot assign key column '$c' — an update that " +
          "moves a key is a delete + insert; run them as two statements")
    }
    dmlBatch(spark, tableDir, keepVersions, graceMs, lazyDel = false) { cur =>
      import org.apache.spark.sql.functions.{expr, lit}
      require(set.nonEmpty, "updateWhere: empty SET list")
      set.foreach { case (c, _) =>
        require(cur.columns.contains(c),
          s"updateWhere: '$c' is not a column of $tableDir")
      }
      require(set.map(_._1).distinct.size == set.size,
        s"updateWhere: duplicate assignment in ${set.map(_._1).mkString(",")}")
      val matched = cur.filter(expr(predicate))
      // SQL UPDATE semantics: every assignment expression reads the
      // PRE-update row — one select evaluates them all against the
      // input, never each other
      val updated = matched.select(cur.columns.map { c =>
        set.find(_._1 == c) match {
          case Some((_, e)) => expr(e).cast(cur.schema(c).dataType).as(c)
          case None => org.apache.spark.sql.functions.col(c)
        }
      }: _*)
      // no-op assignments write nothing: only rows that actually
      // changed ride into the sink (bag semantics are safe — keys are
      // unique in a snapshot, so exceptAll here is a keyed set diff)
      updated.exceptAll(matched).withColumn(DmlFlag, lit(false))
    }
  }

  /** SQL-shaped MERGE: apply `rows` as the table's next committed
    * batch — upserts by key, tombstones where `deleteCol` (if any) is
    * true; the INSERT/MERGE leg of the DML triad next to
    * [[updateWhere]] / [[deleteWhere]]. On an EXISTING table the
    * pinned layout wins (`keys`, if given, must agree); on a fresh dir
    * the call creates the table and `keys` is required (`nBuckets`
    * defaults sized for the first batch's role as the layout pin).
    * Returns (minted batch id, batch row count).
    *
    * Exactly-once replay takes one of two spellings:
    *
    *   - `txn = Some((writerId, microBatchId))` — for STREAMING
    *     writers (the `graft` format sink). The table batch id is
    *     MINTED as usual; the (writer, micro-batch) token is recorded
    *     in the same atomic ledger append as the commit, and a
    *     micro-batch id at or below the writer's recorded high-water
    *     mark no-ops BEFORE the source is evaluated. Dedupe is scoped
    *     PER WRITER — micro-batch ids (which restart at 0 per
    *     checkpoint) can never collide with minted batch ids or with
    *     another stream's ids, so "create by batch write, then stream
    *     into it" and "recreate the checkpoint" both process every
    *     micro-batch instead of silently swallowing the overlap.
    *   - `asBatch` pins the TABLE batch id itself — for callers that
    *     OWN the table's id space (quarantine REQUEUE, restore
    *     tooling): an already-committed pinned id no-ops with (id, 0),
    *     and a fresh pinned id must exceed every committed one (a
    *     lower id is a foreign id space). Do NOT pass raw micro-batch
    *     ids here — they collide with minted ids; that is what `txn`
    *     is for.
    */
  def upsertInto(spark: SparkSession, tableDir: String, rows: DataFrame,
                 keys: Seq[String] = Nil, nBuckets: Int = 16,
                 deleteCol: Option[String] = None, keepVersions: Int = 2,
                 graceMs: Long = 0L, asBatch: Option[Long] = None,
                 txn: Option[(String, Long)] = None)
                (implicit store: TableStore): (Long, Long) = {
    require(asBatch.isEmpty || txn.isEmpty,
      "upsertInto: asBatch pins the table id space, txn scopes dedupe " +
        "per writer — pass one or the other, never both")
    txn.foreach { case (wid, mb) =>
      require(wid.nonEmpty &&
        wid.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
        s"upsertInto: writer id '$wid' must be [A-Za-z0-9._-]+ (it is " +
          "parsed back out of the commit ledger)")
      readTxns(tableDir).get(wid).foreach { case (lastMb, tableBatch) =>
        if (mb <= lastMb) {
          // crash-replayed micro-batch: the data landed as `tableBatch`
          // the first time — no-op before evaluating the source, but
          // heal the commit→publish crash window exactly like the
          // in-sink replay path (idempotent per feed file)
          if (mb == lastMb && store.exists(store.child(tableDir, "_cdf")))
            publishFeedSlice(tableDir, tableBatch)
          return (tableBatch, 0L)
        }
      }
    }
    asBatch.foreach { a =>
      val done = readLedger(tableDir)
      if (done.contains(a)) return (a, 0L)
      require(done.forall(_ < a),
        s"upsertInto: pinned batch id $a is below an already-committed " +
          s"id of $tableDir — stale checkpoint / foreign id space")
    }
    val meta: Map[String, String] =
      if (store.exists(store.child(tableDir, "_meta"))) tableMeta(tableDir)
      else Map.empty // fresh dir: this call creates the table
    val (k, b) = meta.get("keys") match {
      case Some(mk) =>
        // callers speak logical names; _meta pins physical
        val pinned = mk.split(",").toSeq
          .map(toLogicalName(colMap(tableDir), _))
        require(keys.isEmpty || keys == pinned,
          s"upsertInto: $tableDir pins keys [${pinned.mkString(",")}] " +
            s"but the call passed [${keys.mkString(",")}]")
        (pinned, meta("buckets").toInt)
      case None =>
        require(keys.nonEmpty,
          s"upsertInto: $tableDir does not exist — pass keys to create it")
        (keys, nBuckets)
    }
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)
    val fpb = meta.get("fpb").map(_.toInt).getOrElse(4)
    val feed = store.exists(store.child(tableDir, "_cdf"))
    val batchId = asBatch.getOrElse(
      readLedger(tableDir).reduceOption(_ max _).getOrElse(-1L) + 1)
    // the source can be an arbitrary (expensive) query — evaluate it
    // once for both the row count and the merge
    val cached = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      upsertParquet(tableDir, k, nBuckets = b, keepVersions = keepVersions,
        deleteCol = deleteCol, graceMs = graceMs, changeFeed = feed,
        sortCols = sortCols, filesPerBucket = fpb, txn = txn)(cached, batchId)
      (batchId, n)
    } finally { cached.unpersist(); () }
  }

  /** One ordered WHEN clause of [[mergeInto]]. Conditions and SET
    * expressions are SQL strings; in MATCHED clauses they see the
    * target row as `t.<col>` and the source row as `s.<col>` (bare
    * names resolve when unambiguous), NOT MATCHED (insert) clauses see
    * only the source row, NOT MATCHED BY SOURCE clauses only the
    * target row. Clause order is significant: for each row the FIRST
    * clause of its leg whose condition holds applies, later clauses
    * never see the row (ANSI/Delta MERGE semantics).
    */
  sealed trait MergeClause { def cond: Option[String] }
  /** WHEN MATCHED [AND cond] THEN UPDATE SET c = expr, … — every
    * assignment reads the PRE-merge `t.`/`s.` row (standard UPDATE
    * semantics); key columns cannot be assigned.
    */
  final case class MatchedUpdate(cond: Option[String],
                                 set: Seq[(String, String)])
      extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE — tombstones the target row. */
  final case class MatchedDelete(cond: Option[String]) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT — inserts the source row
    * (the source must carry every table column; values cast to the
    * pinned schema).
    */
  final case class NotMatchedInsert(cond: Option[String]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET … — updates
    * target rows no source row matched (the sync-shaped leg).
    */
  final case class NotMatchedBySourceUpdate(cond: Option[String],
                                            set: Seq[(String, String)])
      extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE — tombstones
    * target rows no source row matched (full-sync deletion).
    */
  final case class NotMatchedBySourceDelete(cond: Option[String])
      extends MergeClause

  /** ANSI-shaped MERGE INTO with ordered multi-WHEN clauses — the
    * general DML verb [[updateWhere]] / [[deleteWhere]] / [[upsertInto]]
    * are special cases of: join the CURRENT snapshot with `source` on
    * the table's pinned keys, route every (target, source) pair through
    * the first applicable MATCHED clause, every unmatched source row
    * through the first applicable NOT MATCHED clause, every unmatched
    * target row through the first applicable NOT MATCHED BY SOURCE
    * clause, and commit everything the clauses touched as ONE batch
    * through the normal sink — crash safety, OCC, constraints, the
    * change feed and layout pins are all the sink's. Rows no clause
    * touches mint nothing; an entirely-untouched merge returns None.
    *
    * Cardinality: at most one source row may match a target key
    * (duplicate source keys are refused up front — two source rows
    * updating one target row is the nondeterminism ANSI MERGE forbids).
    *
    * Scale shape: building the change set is ONE equi-join of the
    * snapshot with the source on the pinned keys plus two anti-joins
    * that reuse it, and when no BY SOURCE clause needs full-target
    * coverage the target scan is BUCKET-PRUNED to the buckets the
    * source keys hash to (the [[lookupUpsertTable]] discipline — a
    * point-shaped merge against a 100-TB table reads O(source-keys)
    * buckets, not the table); the sink write then rides O(touched
    * buckets) as always. With BY SOURCE clauses the full snapshot scan
    * is irreducible — deciding "no source row matches" needs every
    * target row.
    *
    * `asBatch` pins the minted batch id for STREAMING callers
    * (foreachBatch micro-batch ids): a pinned id already in the
    * ledger is a crash-replayed micro-batch and no-ops — the
    * exactly-once discipline the raw sink gets from replaying the
    * same id, restated for an op whose change set derives from the
    * (already-merged) snapshot.
    */
  def mergeInto(spark: SparkSession, tableDir: String, source: DataFrame,
                clauses: Seq[MergeClause], keepVersions: Int = 2,
                graceMs: Long = 0L, asBatch: Option[Long] = None)
               (implicit store: TableStore): Option[(Long, Long)] = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, when}
    require(clauses.nonEmpty, "mergeInto: no WHEN clauses")
    // exactly-once replay for streaming callers (foreachBatch): a
    // caller-pinned batch id that is already committed is a replayed
    // micro-batch — skip BEFORE building a change set against the
    // post-merge snapshot (which would describe a different batch)
    if (asBatch.exists(readLedger(tableDir).contains)) return None
    val meta = tableMeta(tableDir)
    // the merge speaks LOGICAL names end to end (cur is the logical
    // view, the sink translates back); _meta pins physical
    val keys = meta("keys").split(",").toSeq
      .map(toLogicalName(colMap(tableDir), _))
    def checkSet(set: Seq[(String, String)]): Unit = {
      require(set.nonEmpty, "mergeInto: empty SET list")
      require(set.map(_._1).distinct.size == set.size,
        s"mergeInto: duplicate assignment in ${set.map(_._1).mkString(",")}")
      set.foreach { case (c, _) => require(!keys.contains(c),
        s"mergeInto: cannot assign key column '$c' — an update that " +
          "moves a key is a delete + insert; spell it as two clauses") }
    }
    clauses.foreach {
      case MatchedUpdate(_, set) => checkSet(set)
      case NotMatchedBySourceUpdate(_, set) => checkSet(set)
      case _ => ()
    }
    keys.foreach(k => require(source.columns.contains(k),
      s"mergeInto: source is missing key column '$k' (table keys: " +
        s"${keys.mkString(",")})"))
    // CURRENT may already reflect a swap-to-append-crashed write —
    // commit it before deriving the change set (the dmlBatch rule)
    completeDanglingCommit(spark, tableDir, keepVersions, graceMs)
    val needFullTarget = clauses.exists {
      case _: NotMatchedBySourceUpdate | _: NotMatchedBySourceDelete => true
      case _ => false
    }
    // the source can be an arbitrary query and feeds every leg —
    // evaluate it once
    val src = source
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dup = src.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"mergeInto: source has duplicate keys (e.g. ${dup.headOption
          .map(_.toString).getOrElse("")}) — MERGE requires at most one " +
          "source row per target key")
      val cur =
        if (needFullTarget) readUpsertTable(spark, tableDir)
        else bucketScopedSnapshot(spark, tableDir, src, keys)
      require(!cur.columns.contains(DmlFlag),
        s"DML: table has a reserved column name $DmlFlag")
      require(!cur.columns.contains("_mrg") && !src.columns.contains("_mrg"),
        "mergeInto: '_mrg' is reserved for the clause-routing column")
      val tSchema = cur.schema
      val t = cur.alias("t")
      val s = src.alias("s")
      val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k"))
        .reduce(_ && _)
      // route each row to the FIRST clause of its leg whose condition
      // holds (order = declaration order), then build every output
      // column as one when-chain over the routed index — a single
      // select per leg, no per-clause union
      def leg(baseCol: org.apache.spark.sql.types.StructField => Column,
              cands: Seq[(MergeClause, Int)], in: DataFrame): DataFrame = {
        val routed = cands.foldRight(lit(null).cast("int")) {
          case ((cl, i), els) =>
            when(cl.cond.map(expr).getOrElse(lit(true)), lit(i))
              .otherwise(els)
        }
        val out = in.withColumn("_mrg", routed)
          .filter(col("_mrg").isNotNull)
        val dataCols = tSchema.map { f =>
          cands.foldRight(baseCol(f)) { case ((cl, i), els) =>
            val setOf = cl match {
              case MatchedUpdate(_, set) => set
              case NotMatchedBySourceUpdate(_, set) => set
              case _ => Nil
            }
            setOf.find(_._1 == f.name) match {
              case Some((_, e)) =>
                when(col("_mrg") === i, expr(e).cast(f.dataType))
                  .otherwise(els)
              case None => els
            }
          }.as(f.name)
        }
        val delIdx = cands.collect {
          case ((_: MatchedDelete | _: NotMatchedBySourceDelete), i) => i
        }
        val flag =
          if (delIdx.isEmpty) lit(false)
          else col("_mrg").isin(delIdx: _*)
        out.select(dataCols :+ flag.as(DmlFlag): _*)
      }
      val idx = clauses.zipWithIndex
      val matchedCls = idx.filter {
        case ((_: MatchedUpdate | _: MatchedDelete), _) => true
        case _ => false
      }
      val insertCls = idx.filter {
        case ((_: NotMatchedInsert), _) => true
        case _ => false
      }
      val bySrcCls = idx.filter {
        case ((_: NotMatchedBySourceUpdate | _: NotMatchedBySourceDelete),
              _) => true
        case _ => false
      }
      val legs = Seq.newBuilder[DataFrame]
      if (matchedCls.nonEmpty)
        legs += leg(f => col(s"t.${f.name}"), matchedCls,
          t.join(s, keyCond, "inner"))
      if (insertCls.nonEmpty) {
        tSchema.foreach(f => require(src.columns.contains(f.name),
          s"mergeInto: NOT MATCHED INSERT needs source column " +
            s"'${f.name}' (source: ${src.columns.mkString(",")})"))
        legs += leg(f => col(s"s.${f.name}").cast(f.dataType), insertCls,
          s.join(t, keyCond, "left_anti"))
      }
      if (bySrcCls.nonEmpty)
        legs += leg(f => col(s"t.${f.name}"), bySrcCls,
          t.join(s, keyCond, "left_anti"))
      val change = legs.result().reduce(_.unionByName(_))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = change.count()
        if (n == 0) return None
        val newBatch = asBatch.getOrElse(
          readLedger(tableDir).reduceOption(_ max _).getOrElse(-1L) + 1)
        upsertParquet(tableDir, keys, nBuckets = meta("buckets").toInt,
          keepVersions = keepVersions, deleteCol = Some(DmlFlag),
          graceMs = graceMs,
          changeFeed = store.exists(store.child(tableDir, "_cdf")),
          sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil),
          filesPerBucket = meta.get("fpb").map(_.toInt).getOrElse(4))(
          change, newBatch)
        Some((newBatch, n))
      } finally { change.unpersist(); () }
    } finally { src.unpersist(); () }
  }

  /** The CURRENT snapshot restricted to the bucket dirs `probe`'s keys
    * hash to — complete for any per-key question about the probe's key
    * set ([[mergeInto]]'s matched + insert legs): a key's row can live
    * in exactly one bucket, so rows outside these dirs cannot match.
    * Unlike [[lookupUpsertTable]] the probe is NOT broadcast-semi-joined
    * in (merge sources can be large); only the ≤ nBuckets distinct
    * bucket ids reach the driver. Deletion vectors apply as on any
    * snapshot read.
    */
  private def bucketScopedSnapshot(spark: SparkSession, tableDir: String,
                                   probe: DataFrame, keys: Seq[String])
                                  (implicit store: TableStore): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val vDir = resolveVersionDir(tableDir, None)
    val nBuckets = versionBuckets(vDir)
      .getOrElse(tableMeta(tableDir).apply("buckets").toInt)
    val buckets: Seq[Long] = probe
      .select(pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val dirs = buckets
      .map(b => store.child(vDir, s"$UpsertBucketCol=$b"))
      .filter(store.isDirectory)
    val reader = pinnedReader(spark, tableDir)
    val scan =
      if (dirs.isEmpty)
        reader.option("basePath", vDir).parquet(vDir).filter(lit(false))
      else reader.option("basePath", vDir).parquet(dirs: _*)
    logicalView(tableDir)(
      applyDeletes(spark, tableDir, vDir, scan).drop(UpsertBucketCol))
  }

  private val DmlFlag = "_dml_deleted"

  /** Complete a swap-to-append sink crash: CURRENT points at a
    * complete generation-0 version whose batch id is missing from the
    * ledger (the writer died between the pointer CAS and the ledger
    * append). Replaying that batch id routes into the sink's
    * commit-completion path (`readCurrent == vName` → commit and
    * return — the batch frame is never touched, so an empty one
    * serves). Every op that can decide "nothing to do" from the
    * CURRENT state (publish's empty diff, DML's empty change set) MUST
    * run this first: the swapped state already reflects the crashed
    * write, so the op's own re-run would no-op and strand the version
    * uncommitted — invisible to as-of reads and bait for the retention
    * sweep. Ops that always replay the same batch id through the sink
    * (restore, upsertInto, the raw sink) self-heal and don't need it.
    */
  private def completeDanglingCommit(spark: SparkSession, tableDir: String,
                                     keepVersions: Int, graceMs: Long)
                                    (implicit store: TableStore): Unit =
    readCurrentName(tableDir).flatMap(parseVersion).map(_._1)
      .filterNot(readLedger(tableDir).contains).foreach { b =>
        val meta = tableMeta(tableDir)
        upsertParquet(tableDir, meta.apply("keys").split(",").toSeq,
          nBuckets = meta("buckets").toInt, keepVersions = keepVersions,
          graceMs = graceMs,
          changeFeed = store.exists(store.child(tableDir, "_cdf")),
          sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil),
          filesPerBucket = meta.get("fpb").map(_.toInt).getOrElse(4))(
          readUpsertTable(spark, tableDir).limit(0), b)
      }

  /** Shared DML shell: build the change set from CURRENT, mint nothing
    * when it is empty, else commit it as `head + 1` through the sink
    * (feed-aware, layout-preserving).
    */
  private def dmlBatch(spark: SparkSession, tableDir: String,
                       keepVersions: Int, graceMs: Long, lazyDel: Boolean)
                      (change: DataFrame => DataFrame)
                      (implicit store: TableStore): Option[(Long, Long)] = {
    val meta = tableMeta(tableDir)
    val keys = meta("keys").split(",").toSeq
    val nBuckets = meta("buckets").toInt
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)
    val fpb = meta.get("fpb").map(_.toInt).getOrElse(4)
    val feed = store.exists(store.child(tableDir, "_cdf"))
    // the change set derives from CURRENT, which already reflects a
    // swap-to-append-crashed write — commit it before deciding no-op
    completeDanglingCommit(spark, tableDir, keepVersions, graceMs)
    val cur = readUpsertTable(spark, tableDir)
    require(!cur.columns.contains(DmlFlag),
      s"DML: table has a reserved column name $DmlFlag")
    // the change set derives from a snapshot scan — evaluate it once
    // for both the emptiness check and the merge
    val batch = change(cur)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = batch.count()
      if (n == 0) return None
      val newBatch = readLedger(tableDir).reduceOption(_ max _).getOrElse(-1L) + 1
      upsertParquet(tableDir, keys, nBuckets = nBuckets,
        keepVersions = keepVersions, deleteCol = Some(DmlFlag),
        graceMs = graceMs, changeFeed = feed, lazyDeletes = lazyDel,
        sortCols = sortCols, filesPerBucket = fpb)(batch, newBatch)
      Some((newBatch, n))
    } finally { batch.unpersist(); () }
  }

  /** The batch id a WAP branch forked from — the `batch=` line
    * [[branchUpsertTable]] recorded in `_branch_base`, taken from the
    * source CURRENT's version name at clone time (race-free: the
    * linked snapshot names its own batch).
    */
  private def baseOf(branchDir: String, srcDir: String)
                    (implicit store: TableStore): Long =
    store.read(store.child(branchDir, "_branch_base")).flatMap {
      _.split('\n').map(_.trim).find(_.startsWith("batch="))
        .map(_.drop("batch=".length).toLong)
    }.getOrElse(throw new IllegalStateException(
      s"publishUpsertTable: $branchDir's _branch_base records no fork batch"))

  private def rewriteGeneration(spark: SparkSession, tableDir: String,
                                newBuckets: Int,
                                forceSameCount: Boolean,
                                zorderCols: Seq[String] = Nil,
                                purgeDeadCols: Boolean = false)
                               (implicit store: TableStore): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(newBuckets > 0, s"rebucketUpsertTable: bad bucket count $newBuckets")
    val root = tableDir
    val meta = tableMeta(root)
    val keys = meta("keys").split(",").toSeq
    val metaBuckets = meta("buckets").toInt
    val curName = readCurrentName(root)
    require(curName.nonEmpty, s"upsert table has no CURRENT pointer: $root")
    val curDir = store.child(root, curName.get)
    // preserve pinned layout properties (sort/fpb) across the bucket-
    // count change — dropping them would silently stop manifest builds
    val sortCols = meta.get("sort").map(_.split(",").toSeq).getOrElse(Nil)
    val fpb = meta.get("fpb").map(_.toInt).getOrElse(4)
    def syncMeta(): Unit = store.writeAtomic(root, "_meta",
      s"keys=${keys.mkString(",")}\nbuckets=$newBuckets\n" +
        (if (sortCols.isEmpty) "" else s"sort=${sortCols.mkString(",")}\nfpb=$fpb\n"))
    if (!forceSameCount &&
        versionBuckets(curDir).getOrElse(metaBuckets) == newBuckets) {
      // no-op, or completing a rebucket that crashed after the pointer
      // swap but before the _meta update
      if (metaBuckets != newBuckets) syncMeta()
      return
    }
    // step 1: make every complete retained dir's layout explicit
    // before _meta moves out from under it
    val cur = readCurrentName(root)
    versionDirs(root).foreach { case (n, _, g) =>
      val d = store.child(root, n)
      if (genComplete(root, n, g, cur) && versionBuckets(d).isEmpty)
        store.writeAtomic(d, "_nbuckets", s"$metaBuckets\n")
    }
    // step 2: the new generation
    val (b, g) = parseVersion(curName.get).get
    val newName = versionName(b, g + 1)
    val newV = store.child(root, newName)
    store.deleteTree(newV) // partial build from a previous crashed attempt
    // the full rewrite applies (and therefore clears) any pending
    // deletion vector — rebucket doubles as delete-debt compaction
    // PURGE COLUMNS: the full rewrite is the one moment dropped
    // physical columns can leave the data for free — exclude them from
    // the new generation's projection (REORG … PURGE)
    val deadPhys =
      if (!purgeDeadCols) Nil
      else colMap(root).filterNot(_._3).map(_._1)
    val rehashed0 = applyDeletes(spark, root, curDir,
      pinnedReader(spark, root).option("basePath", curDir)
        .parquet(curDir))
      .drop(UpsertBucketCol)
    val rehashed = deadPhys.filter(rehashed0.columns.contains)
      .foldLeft(rehashed0)(_ drop _)
      .withColumn(UpsertBucketCol,
        pmod(xxhash64(keys.map(col): _*), lit(newBuckets.toLong)))
    // same layout discipline as the sink: range-sliced sorted files per
    // bucket when sortCols are pinned (rebucket must not destroy the
    // clustering the manifest depends on), one file per bucket
    // otherwise — unless a ZORDER pass asked for interleaved
    // clustering, in which case the slices follow the Morton key over
    // the (quantized) stats columns and the manifest's per-file boxes
    // become tight on EVERY dimension instead of the leading one
    val rehashedLaid =
      if (zorderCols.nonEmpty) {
        // one stats pass quantizes each dim by linear min/max scaling
        // into the curve's bit budget (16 bits × 2 / 10 bits × 3)
        val statAggs = zorderCols.flatMap(c => Seq(
          org.apache.spark.sql.functions.min(col(c).cast("double")),
          org.apache.spark.sql.functions.max(col(c).cast("double"))))
        val st = rehashed.agg(statAggs.head, statAggs.tail: _*).head()
        val levels = if (zorderCols.size == 2) 65536L else 1024L
        def quant(i: Int): org.apache.spark.sql.Column = {
          // an all-NULL dimension degenerates to a constant lane
          val (lo, hi) =
            if (st.isNullAt(2 * i)) (0.0, 0.0)
            else (st.getDouble(2 * i), st.getDouble(2 * i + 1))
          if (hi <= lo) lit(0L)
          else org.apache.spark.sql.functions.least(
            org.apache.spark.sql.functions.greatest(
              ((col(zorderCols(i)).cast("double") - lo) / (hi - lo) *
                (levels - 1)).cast("long"), lit(0L)), lit(levels - 1))
        }
        val zk =
          if (zorderCols.size == 2)
            graft.operators.Layout.zkey2(quant(0), quant(1))
          else graft.operators.Layout.zkey3(quant(0), quant(1), quant(2))
        rehashed.withColumn("__zk", zk)
          .repartitionByRange(newBuckets * fpb,
            col(UpsertBucketCol), col("__zk"))
          .sortWithinPartitions(col(UpsertBucketCol), col("__zk"))
          .drop("__zk") // projection preserves partitioning + order
      }
      else if (sortCols.isEmpty)
        rehashed.repartition(newBuckets, col(UpsertBucketCol))
      else rehashed.repartitionByRange(newBuckets * fpb,
          (col(UpsertBucketCol) +: sortCols.map(col)): _*)
        .sortWithinPartitions((col(UpsertBucketCol) +: sortCols.map(col)): _*)
    rehashedLaid
      .write.partitionBy(UpsertBucketCol).mode("overwrite").parquet(newV)
    if (sortCols.nonEmpty) {
      // fresh manifest for the fully-rewritten generation
      import org.apache.spark.sql.functions.input_file_name
      val aggs = StatsManifest.statsAggs(sortCols)
      val footerFresh = footerFreshManifest(spark, newV, None, sortCols,
        pinnedSchema(root))
      val m = footerFresh
        .getOrElse(pinnedReader(spark, root).option("basePath", newV)
          .parquet(newV)
          .select(sortCols.map(col): _*)
          .groupBy(StatsManifest.relFile(newName).as("file"))
          .agg(aggs.head, aggs.tail: _*))
      if (footerFresh.isDefined || m.head(1).nonEmpty)
        m.coalesce(1).write.parquet(
          store.child(newV, StatsManifest.ManifestDir))
    }
    val oldCh = store.child(curDir, "_changes")
    if (store.isDirectory(oldCh)) {
      val dst = store.child(newV, "_changes")
      store.mkdirs(dst)
      store.listNames(oldCh)
        .filterNot(n => store.isDirectory(store.child(oldCh, n)))
        .foreach(n => linkInto(store.child(oldCh, n), dst))
    }
    store.writeAtomic(newV, "_nbuckets", s"$newBuckets\n")
    // step 3: completeness marker — LAST thing inside the dir
    store.writeAtomic(newV, "_gen_commit", "")
    // steps 4–6. Same optimistic-concurrency CAS as the sink's
    // swapCurrent: a maintenance pass racing a committing writer must
    // not point CURRENT back at the pre-commit snapshot (that would
    // silently drop the writer's batch from history). Atomicity is the
    // store backend's (airtight in-JVM / conditional-put, best-effort
    // cross-process on a plain filesystem).
    if (!store.putConditional(root, "CURRENT", curName, newName)) {
      val nowName = readCurrentName(root)
      throw new java.util.ConcurrentModificationException(
        s"rewriteGeneration: CURRENT of $tableDir moved from " +
          s"${curName.getOrElse("<none>")} to ${nowName.getOrElse("<none>")} " +
          "while the new generation was built — a concurrent writer " +
          "committed. Nothing was swapped (the crashed-build sweep " +
          "reclaims the orphan generation); re-run against the new snapshot")
    }
    syncMeta()
    if (purgeDeadCols && deadPhys.nonEmpty) {
      // narrow the pinned schema to the surviving physicals and clear
      // the dead mapping entries. Crash BETWEEN the swap and here is
      // sound — a wide schema over the narrow new files reads NULL for
      // the purged columns and the view still hides them — and a
      // re-run of the purge completes the narrowing. Retained
      // PRE-purge versions keep their bytes until retention sweeps
      // them (their time-travel reads column-prune through whatever
      // schema is pinned — parquet subset reads are always legal).
      store.read(store.child(root, "_schema")).foreach { j =>
        val s = org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType]
        store.writeAtomic(root, "_schema", StructType(
          s.fields.filterNot(f => deadPhys.contains(f.name)).toSeq).json)
      }
      writeColMap(root, colMap(root).filter(_._3))
    }
    sweepDir(curDir) // crash mid-delete leaves it marked, never served
  }

  /** Read the change-data-feed of an [[upsertParquet]] table written
    * with `changeFeed = true`: every change record with `_batch_id` in
    * `[fromBatch, toBatch]` — full rows tagged `insert` /
    * `update_preimage` / `update_postimage` / `delete` in
    * `_change_type`. This is what an incremental consumer reads
    * instead of diffing snapshots: an MV refresh folds the post-images
    * and deletes; a replica applies them in batch order.
    *
    * Availability is retention-bounded like time travel: a committed
    * batch in range must either have its version retained (the feed
    * lives inside `v_<b>/_changes`), or be provably change-free (a
    * non-first empty batch, recorded in `_empty`) — anything else
    * means the feed was swept and the read FAILS rather than silently
    * returning a hole. A table without the `_cdf` marker fails
    * immediately (it never recorded changes).
    */
  def readTableChanges(spark: SparkSession, tableDir: String,
                       fromBatch: Long, toBatch: Long)
                      (implicit store: TableStore): DataFrame = {
    val root = tableDir
    require(store.exists(store.child(root, "_cdf")),
      s"$tableDir is not a change-feed table — write it with changeFeed=true")
    val emptyIds: Set[Long] = emptyBatchIds(root)
    val committed = readLedger(root)
      .filter(b => b >= fromBatch && b <= toBatch).toSeq.sorted
    val paths = committed.flatMap { b =>
      // generation-aware: a rebucketed version carries its feed forward
      // (hard-linked into the new generation), so the servable dir is
      // always where the batch's changes live
      servableDir(root, b) match {
        case Some(vDir) =>
          val ch = store.child(vDir, "_changes")
          if (store.isDirectory(ch)) Some(ch) else None // zero changes
        case None if emptyIds.contains(b) => None // provably change-free
        case None => throw new IllegalArgumentException(
          s"change feed for batch $b of $tableDir is beyond the retention " +
            "window (its version was swept) — raise keepVersions/graceMs " +
            "or consume the feed before it ages out")
      }
    }
    val chSchema = changeSchema(root)
    logicalView(root)(
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], chSchema)
      else spark.read.schema(chSchema).parquet(paths: _*))
  }

  /** Change-record schema of a change-feed table: the pinned data
    * schema (bucket col dropped) plus `_change_type` / `_batch_id` —
    * shared by [[readTableChanges]] and [[changeFeedStream]] so a
    * zero-change range reads as a typed empty frame and file column
    * order can never matter.
    */
  private[sources] def changeSchema(root: String)
                          (implicit store: TableStore): StructType = {
    val json = store.read(store.child(root, "_schema"))
      .getOrElse(throw new IllegalArgumentException(
        s"$root has no _schema file"))
    val dataSchema = org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[StructType]
    StructType(
      dataSchema.fields.filterNot(_.name == UpsertBucketCol).toSeq ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_batch_id",
          org.apache.spark.sql.types.LongType)))
  }

  // ---- DataSource V2 planning surface --------------------------------
  //
  // The registered `graft` format's V2 table ([[GraftTable]]) plans
  // scans as FILE LISTS + per-task transforms; these accessors are the
  // seam through which it borrows the format's layout knowledge
  // without re-deriving any of it. All file lists are COMPLETE for
  // committed state by the format's own protocol ordering (data fully
  // written before the pointer swap, the swap before the ledger
  // append).

  /** The pinned PHYSICAL data schema of a snapshot read: `_schema`
    * minus the bucket partition column minus dead (dropped) physicals,
    * in pinned order. Rows in data files carry exactly these columns
    * (plus schema-evolution NULLs for physicals added later).
    */
  private[sources] def physicalDataSchema(root: String)
                                         (implicit store: TableStore)
      : StructType = {
    val json = store.read(store.child(root, "_schema"))
      .getOrElse(throw new IllegalArgumentException(
        s"$root has no _schema file"))
    val dead = colMap(root).filterNot(_._3).map(_._1).toSet
    StructType(org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[StructType].fields
      .filterNot(f => f.name == UpsertBucketCol || dead(f.name)).toSeq)
  }

  /** physical→logical rename of a schema's field NAMES (positional
    * identity otherwise — InternalRows carry no names, so the V2 scan
    * applies the column mapping for free by declaring logical names
    * over the physically-read positions).
    */
  private[sources] def toLogicalSchema(root: String, phys: StructType)
                                      (implicit store: TableStore)
      : StructType = {
    val cm = colMap(root)
    if (cm.isEmpty) phys
    else StructType(phys.fields.map(f =>
      f.copy(name = toLogicalName(cm, f.name))).toSeq)
  }

  /** Data files of the snapshot a batch read serves (CURRENT /
    * versionAsOf / tag), with the version dir they live under:
    * `(vDir, files)`. Complete by the commit protocol; bucket-dir
    * partitioning is invisible to direct file reads (the bucket id is
    * a dir name, not a file column).
    */
  private[sources] def snapshotFiles(root: String, asOf: Option[Long])
                                    (implicit store: TableStore)
      : (String, Seq[String]) = {
    val vDir = resolveVersionDir(root, asOf)
    val files = store.listNames(vDir)
      .filter(n => n.startsWith(s"$UpsertBucketCol="))
      .map(store.child(vDir, _))
      .flatMap(d => store.listNames(d)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .map(store.child(d, _)))
    (vDir, files)
  }

  /** The snapshot's merge-on-read deletion-vector parquet files (key
    * lists the scan must anti-filter), empty when the version carries
    * no debt.
    */
  private[sources] def deletionVectorFiles(vDir: String)
                                          (implicit store: TableStore)
      : Seq[String] = {
    val dvDir = store.child(vDir, "_deletes")
    if (!store.isDirectory(dvDir)) Nil
    else store.listNames(dvDir).filter(_.endsWith(".parquet"))
      .map(store.child(dvDir, _))
  }

  /** Change-slice parquet files of committed batches in
    * `[fromBatch, toBatch]` — the bounded-CDC file list
    * ([[readTableChanges]]'s resolution, exposed as paths): per batch
    * the retained version's `_changes`, with the same
    * retention-hole failure.
    */
  private[sources] def changeSliceFiles(root: String, fromBatch: Long,
                                        toBatch: Long)
                                       (implicit store: TableStore)
      : Seq[String] = {
    require(store.exists(store.child(root, "_cdf")),
      s"$root is not a change-feed table — write it with changeFeed=true")
    val emptyIds = emptyBatchIds(root)
    readLedger(root).filter(b => b >= fromBatch && b <= toBatch)
      .toSeq.sorted.flatMap { b =>
        sliceFilesOfBatch(root, b, emptyIds).getOrElse(
          throw new IllegalArgumentException(
            s"change feed for batch $b of $root is beyond the retention " +
              "window (its version was swept) — raise keepVersions/" +
              "graceMs or consume the feed before it ages out"))
      }
  }

  /** One committed batch's change-slice files for the STREAMING
    * source: the retained version's `_changes` when present
    * (authoritative — fully written before the batch committed), else
    * the published `feed/` hard links (complete once the writer's
    * replay healed any publish crash — the same eventual-completeness
    * contract [[changeFeedStream]]'s file tail rides). `None` when the
    * batch is beyond retention AND unpublished — the caller decides
    * whether that is a hole (non-empty batch) or silence (empty).
    */
  private[sources] def sliceFilesOfBatch(root: String, b: Long,
                                         emptyIds: Set[Long])
                                        (implicit store: TableStore)
      : Option[Seq[String]] = {
    servableDir(root, b) match {
      case Some(vDir) =>
        val ch = store.child(vDir, "_changes")
        if (!store.isDirectory(ch)) Some(Nil) // committed zero changes
        else Some(store.listNames(ch)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
          .map(store.child(ch, _)))
      case None =>
        val feedDir = store.child(root, "feed")
        val linked =
          if (!store.isDirectory(feedDir)) Nil
          else store.listNames(feedDir)
            .filter(n => n.startsWith(s"b$b-part-") && n.endsWith(".parquet"))
            .map(store.child(feedDir, _))
        if (linked.nonEmpty) Some(linked)
        else if (emptyIds.contains(b)) Some(Nil)
        else None
    }
  }

  /** Committed, non-sweeping dead-letter directories — the quarantine
    * read's file surface ([[readQuarantine]]'s resolution as paths).
    */
  private[sources] def quarantineFiles(root: String)
                                      (implicit store: TableStore)
      : Seq[String] = {
    val qRoot = store.child(root, QuarantineDir)
    val committed = readLedger(root)
    store.listNames(qRoot)
      .filter(_.startsWith("b_"))
      .filter(n => scala.util.Try(n.stripPrefix("b_").toLong)
        .toOption.exists(committed.contains))
      .map(n => store.child(qRoot, n))
      .filterNot(d => store.exists(store.child(d, "_sweeping")))
      .flatMap(d => store.listNames(d)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .map(store.child(d, _)))
  }

  /** Publish batch `b`'s change slice into the table's PUBLISHED feed
    * directory `feed/` — the append-only file surface a STREAMING
    * consumer tails ([[changeFeedStream]]), decoupled from snapshot
    * retention. Files are hard links (fallback copy) of the version's
    * `_changes` parquet, flat-named `b<batchId>-<part>` so a plain
    * directory listing is the whole feed (no globbing over version
    * dirs, whose underscore-prefixed `_changes` Spark's file stream
    * would hide). Idempotent per FILE: a crash mid-publish is healed
    * by the writer's next replay of the batch (link-if-absent), the
    * same eventual-completeness class as `cleanupStale`. Consumers see
    * slices FILE-atomically, not batch-atomically — sound for
    * commutative folds (signed-contribution MV maintenance); a
    * consumer needing batch atomicity reads [[readTableChanges]]
    * against the ledger instead. No-op when the batch produced no
    * version (a provably change-free batch).
    */
  private def publishFeedSlice(root: String, batchId: Long)
                              (implicit store: TableStore): Unit = {
    val feedDir = store.child(root, "feed")
    store.mkdirs(feedDir)
    servableDir(root, batchId).foreach { vDir =>
      val ch = store.child(vDir, "_changes")
      if (store.isDirectory(ch)) {
        store.listNames(ch)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet") &&
            !store.isDirectory(store.child(ch, n)))
          .foreach { n =>
            val dst = store.child(feedDir, s"b$batchId-$n")
            if (!store.exists(dst))
              store.linkOrCopy(store.child(ch, n), dst)
          }
      }
    }
  }

  /** The published change feed as a STREAMING source: tail the table's
    * `feed/` directory ([[publishFeedSlice]]) with the pinned change
    * schema. This is the decoupled-consumer half of the feed — a
    * downstream process (incremental MV, replica, audit trail) runs
    * its OWN streaming query with its OWN checkpoint against the feed
    * files, with no access to the writer's state: table-format-as-
    * stream-source. Exactly-once downstream comes from the consumer's
    * checkpoint (each feed file is processed once) composed with an
    * idempotent sink (e.g. a second [[upsertParquet]] table keyed by
    * the consumer's batchId). Feed files outlive snapshot retention
    * (hard links keep the inodes alive after their version is swept) —
    * the feed's lifecycle belongs to its consumers; prune consumed
    * files with [[pruneChangeFeed]]. `maxFilesPerTrigger` bounds each
    * micro-batch for incremental folds.
    */
  def changeFeedStream(spark: SparkSession, tableDir: String,
                       maxFilesPerTrigger: Option[Int] = None)
                      (implicit store: TableStore): DataFrame = {
    val root = tableDir
    require(store.exists(store.child(root, "_cdf")),
      s"$tableDir is not a change-feed table — write it with changeFeed=true")
    store.mkdirs(store.child(root, "feed")) // tail-before-first-commit is legal
    val r = spark.readStream.schema(changeSchema(root)).format("parquet")
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .load(store.child(root, "feed"))
  }

  /** Drop published feed files for batches `< beforeBatch` — called by
    * the feed's CONSUMERS once a prefix is folded/replicated (their
    * checkpoints remember processed files, so removal is safe for
    * them; a NEW consumer afterwards starts from the pruned suffix).
    */
  def pruneChangeFeed(tableDir: String, beforeBatch: Long)
                     (implicit store: TableStore): Seq[String] = {
    val feedDir = store.child(tableDir, "feed")
    store.listNames(feedDir)
      .flatMap { n =>
        if (!n.startsWith("b")) None
        else scala.util.Try(n.drop(1).takeWhile(_ != '-').toLong)
          .toOption.filter(_ < beforeBatch).map(_ -> n)
      }
      // oldest batch first, same suffix invariant as the version
      // sweep: a crash mid-prune leaves the surviving slices a
      // contiguous batch suffix, so a batch-bounded feed read over the
      // pruned range comes up visibly empty-at-the-front rather than
      // gapped in the middle
      .sortBy { case (b, n) => (b, n) }
      .map { case (_, n) => store.delete(store.child(feedDir, n)); n }
  }

  /** VACUUM for the table format — the one scheduled maintenance pass
    * that reclaims everything a running table sheds, AUDITED: returns
    * one row per removed object `(kind, name)` so an operator can see
    * (and log) exactly what a pass reclaimed. Three sweeps in one call:
    *
    *   - `version`: crashed partial builds, superseded generations and
    *     committed snapshots beyond `keepVersions` (the same rules the
    *     sink's own post-commit cleanup applies — this is that sweep,
    *     runnable out-of-band with its own, usually tighter, retention);
    *   - `feed`: published change-feed slices for batches below
    *     `feedBeforeBatch` — the CONSUMER-ACKNOWLEDGED watermark. The
    *     consumer-still-reading race is governed by contract, not
    *     detection: feed files are immutable and consumers checkpoint
    *     processed files, so pruning strictly below the lowest
    *     consumer's committed watermark can never remove a file a
    *     consumer still needs — pass the MIN over consumers (or None
    *     while any consumer's position is unknown, pruning nothing). A
    *     late NEW consumer starts from the pruned suffix by design.
    *   - `scratch`: an orphaned `CURRENT.tmp` from a crashed pointer
    *     write (reported only when present).
    *
    * `graceMs` extends the same reader-isolation grace the sink's
    * cleanup honors. Snapshot readers are isolated exactly as they are
    * from the sink's own cleanup: retention plus grace bounds the race
    * window, single-writer-plus-maintenance is the deployment contract.
    *
    * `inflightGraceMs`: on a table operated TWO-writer (`occRetries >
    * 0` at the sink), pass [[OccInflightGraceMs]] (or larger) so an
    * out-of-band vacuum shields a writer's young in-flight build the
    * same way the sink's own OCC-mode cleanup does — the default 0
    * keeps single-writer semantics, where an uncommitted dir is by
    * definition a crashed build.
    */
  def vacuumUpsertTable(spark: SparkSession, tableDir: String,
                        keepVersions: Int,
                        feedBeforeBatch: Option[Long] = None,
                        graceMs: Long = 0L,
                        inflightGraceMs: Long = 0L,
                        quarantineKeepBatches: Option[Int] = None)
                       (implicit store: TableStore): DataFrame = {
    require(store.exists(store.child(tableDir, "_meta")),
      s"not an upsert table (no _meta): $tableDir")
    val hadTmp = store.exists(store.child(tableDir, "CURRENT.tmp"))
    val sweptVersions =
      cleanupStale(tableDir, keepVersions, graceMs, inflightGraceMs)
    val sweptFeed = feedBeforeBatch.toSeq
      .flatMap(b => pruneChangeFeed(tableDir, b))
    // dead-letter area: orphaned (never-committed) dirs always sweep
    // under the same in-flight shield as version dirs; committed dirs
    // additionally retire beyond quarantineKeepBatches when given
    val sweptQuarantine =
      pruneQuarantine(tableDir, quarantineKeepBatches, inflightGraceMs)
    import spark.implicits._
    (sweptVersions.map("version" -> _) ++
      sweptFeed.map("feed" -> _) ++
      sweptQuarantine ++
      (if (hadTmp) Seq("scratch" -> "CURRENT.tmp") else Nil))
      .toDF("kind", "name")
  }
}
