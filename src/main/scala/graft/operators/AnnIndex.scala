package graft.operators

import graft.{Memo, QuerySpec}
import graft.functions.GraftFunctions
import graft.sources.{Ingest, LocalTableStore, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index MAINTENANCE from the change feed (SURVEY.md §2.11 × §2.1a)
  * — the composition the secondary index (`Changes.qSecondaryIndex`)
  * demonstrates for B-tree-shaped indexes, applied to the IVF vector
  * index: a corpus living behind the upsert format has a change feed,
  * so its ANN index can be MAINTAINED incrementally instead of derived
  * from scratch per corpus version ([[Ivf.ensureIndex]]'s shape).
  *
  * The index IS an upsert table — (vec_id → cid, embedding), keyed on
  * the corpus key with `sortCols = cid` so every bucket's files are
  * cell-range slices and a cell probe prunes by the stats manifest.
  * Maintenance folds each base batch's feed slice:
  *   - insert / update_postimage → re-assign the vector to its nearest
  *     centroid (an update that MOVES a vector between cells is one
  *     keyed upsert — the old entry is replaced, exactly the two
  *     touches a posting-list index would make);
  *   - delete → tombstone through the sink's own `deleteCol`.
  * Fold cost rides the feed: O(batch × centroids) assignment work +
  * O(touched buckets) index writes, never a corpus re-scan — at 100 TB
  * the difference between "index refresh = nightly rebuild" and "index
  * lags the table by one micro-batch".
  *
  * Centroids are the fixture-derived [[Ivf.ensureIndex]] set (the
  * coarse quantizer is versioned with the corpus generation; re-train
  * it at OPTIMIZE cadence, not per batch — centroid drift degrades
  * recall, never correctness, because assignment stays
  * nearest-centroid whatever the centroids are).
  *
  * Correctness gate: the maintained index's state — built through
  * inserts, perturbed-then-corrected updates (which move cells), and
  * deletes — must serve EXACTLY what a fresh build over the final
  * corpus serves. Probing all cells makes IVF exhaustive, so both
  * queries share `q_cosine_topk`'s brute-force DuckDB oracle,
  * hash-checked. The in-query `require` pins the scale contract: a
  * single-cell probe reads strictly fewer index files than the full
  * index scan (manifest pruning over the cid sort).
  */
object AnnIndex {

  /** Memoized embeddings-behind-the-format fixture: a 4-batch CDC
    * history whose FINAL state equals the `embeddings` fixture exactly
    * (so oracle queries over the fixture apply verbatim):
    *   - batch 0 inserts every vector — a fifth of them PERTURBED
    *     (reversed components: wrong cell, wrong neighbors) — plus
    *     ghost vectors that exist in no fixture;
    *   - batch 1 corrects the perturbed fifth (real cell moves);
    *   - batch 2 deletes the ghosts;
    *   - batch 3 re-upserts a seventh with unchanged values (update
    *     events whose pre == post — the no-op-update edge).
    */
  private val embCdcMemo = Memo[(SparkSession, String), String]()

  def sharedEmbCdcTable(spark: SparkSession, dir: String): String =
    embCdcMemo.getOrElseUpdate((spark, dir), {
      val base = graft.Scratch.dir("ann-emb-cdc")
      LocalTableStore.deleteTree(base)
      val table = s"$base/table"
      val emb = Tables.load(spark, dir, "embeddings")
      val perturbed = emb.filter(col("vec_id") % 5 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      val ghosts = emb.filter(col("vec_id") % 11 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val batches = Seq(
        emb.filter(col("vec_id") % 5 =!= 0).unionByName(perturbed)
          .unionByName(ghosts).withColumn("_del", lit(false)),
        emb.filter(col("vec_id") % 5 === 0).withColumn("_del", lit(false)),
        ghosts.withColumn("_del", lit(true)),
        emb.filter(col("vec_id") % 7 === 0).withColumn("_del", lit(false)))
      EventOps.withStreamSizing(spark) {
        batches.zipWithIndex.foreach { case (b, i) =>
          Ingest.upsertParquet(table, Seq("vec_id"), nBuckets = 4,
            keepVersions = 8, deleteCol = Some("_del"), changeFeed = true)(
            b, i.toLong)
        }
      }
      table
    })

  /** One feed-fold step of the BATCH-maintained index: re-assign the
    * batch's surviving images, tombstone its deletes (physical removal
    * — sound here because ledger reads are batch-atomic and applied in
    * batch order), upsert keyed on vec_id with cid-sorted layout.
    */
  private def foldSlice(slice: DataFrame, centroids: DataFrame,
                        idx: String, batchId: Long): Unit = {
    val live = Ivf.assign(
      slice.filter(col("_change_type").isin("insert", "update_postimage"))
        .select("vec_id", "embedding"), centroids)
      .withColumn("_del", lit(false))
    val dead = slice.filter(col("_change_type") === "delete")
      .select(col("vec_id"), col("embedding"), lit(-1).as("cid"),
        lit(true).as("_del"))
    Ingest.upsertParquet(idx, Seq("vec_id"), nBuckets = 4,
      keepVersions = 1, deleteCol = Some("_del"),
      sortCols = Seq("cid"), filesPerBucket = 2)(
      live.unionByName(dead), batchId)
  }

  /** Probe the maintained index through the shared IVF machinery,
    * asserting the manifest-pruning contract on the way.
    */
  private def searchMaintained(spark: SparkSession, dir: String,
                               state: DataFrame, idx: String,
                               k: Int, nProbe: Int): DataFrame = {
    val ivfPath = Ivf.ensureIndex(spark, dir)
    val centroids = spark.read.parquet(s"$ivfPath/centroids")
    // scale contract: a single-cell probe prunes the index's file list
    // through the stats manifest (cid-sorted slices inside each bucket)
    val oneCell = Ingest.readUpsertTableWhere(spark, idx, Seq(("cid", 0, 0)))
    require(oneCell.inputFiles.length <
        Ingest.readUpsertTable(spark, idx).inputFiles.length,
      "maintained-index cell probe did not prune the file list")
    val probes = state.filter(col("vec_id") < 10)
      .select("vec_id", "embedding")
    Ivf.searchCells(centroids,
      state.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cvec"), col("cid")),
      probes, k, nProbe)
  }

  /** Index OPTIMIZE — the coarse-quantizer retraining the maintenance
    * scaladoc above defers to "OPTIMIZE cadence": retrain `numCells`
    * centroids from the index's CURRENT live vectors
    * ([[Ivf.buildCentroids]] — deterministic seeding, no RNG state)
    * and re-assign every vector, restoring the recall that centroid
    * drift erodes (assignment stays nearest-centroid whatever the
    * centroids are, so drift degrades recall, never correctness — but
    * after enough churn the cells no longer partition the corpus
    * well). Commits as one full-corpus batch through the sink (the
    * deliberate full-rewrite cost class of
    * [[Ingest.optimizeUpsertTable]] — run it rarely, on a drift or
    * recall threshold, at 100 TB as the scheduled nightly/weekly job
    * while per-batch folds keep the index fresh in between). Returns
    * the retrained centroids (localCheckpointed, k rows) — the caller
    * persists them as the new coarse quantizer alongside the index.
    *
    * Handles BOTH index shapes. Batch-maintained (vec_id, embedding,
    * cid): every row retrains and re-assigns. Stream-maintained (+
    * `live`, `_bid`): only LIVE rows retrain and re-assign; the
    * logical tombstones the order-safe stream fold accumulates
    * (`live = false` rows that physical removal would have let a
    * late-delivered older upsert resurrect) are PHYSICALLY removed in
    * the same pass — sound here because optimize reads the table's
    * committed batch-atomic state, outside the file-atomic delivery
    * window the logical tombstones defend against. This is the
    * debt-compaction cadence the stream fold's scaladoc defers to.
    */
  def optimizeIndex(spark: SparkSession, idx: String, batchId: Long,
                    numCells: Int = 16, iters: Int = 2): DataFrame = {
    val state = Ingest.readUpsertTable(spark, idx)
    val streamShape = state.columns.contains("live")
    val live = if (streamShape) state.filter(col("live")) else state
    val centroids = Ivf.buildCentroids(
      live.select("vec_id", "embedding"), numCells, iters).localCheckpoint()
    val reassigned = Ivf.assign(live.select("vec_id", "embedding"), centroids)
    val batch =
      if (!streamShape) reassigned.withColumn("_del", lit(false))
      else {
        // live rows re-assigned (their _bid rides along — a later feed
        // entry must still win on batch id); dead rows become REAL
        // tombstones and leave the table
        val keep = reassigned
          .join(state.select("vec_id", "_bid"), "vec_id")
          .withColumn("live", lit(true)).withColumn("_del", lit(false))
        val drop = state.filter(!col("live"))
          .withColumn("_del", lit(true))
        keep.unionByName(drop.select(keep.columns.map(col): _*))
      }
    Ingest.upsertParquet(idx, Seq("vec_id"), nBuckets = 4,
      keepVersions = 1, deleteCol = Some("_del"),
      sortCols = Seq("cid"), filesPerBucket = 2)(batch, batchId)
    centroids
  }

  /** OPTIMIZE after drift, gated by the shared brute-force oracle: the
    * index is maintained with a STALE quantizer trained on the
    * perturbed batch-0 corpus (a fifth of the vectors reversed, plus
    * ghosts — real drift: the final corpus looks nothing like the
    * training set), then [[optimizeIndex]] retrains from the current
    * state and re-assigns. The all-cells probe over the optimized
    * index must still hash-match brute force (completeness: retrain +
    * re-assign lost or duplicated nothing); the RECALL restoration at
    * a fixed small nProbe — the thing optimize exists for — is
    * measured in IvfSpec against the same drifted fixture.
    */
  val qAnnIndexOptimize: QuerySpec = QuerySpec(
    "q_ann_index_optimize",
    VectorOps.qCosineTopK.oracle,
    (spark, dir) => {
      GraftFunctions.register(spark)
      // derive-once fixture (r16): the 4-slice drifted-index fold is
      // setup; the OPTIMIZE retrain below is what the row times
      val idx = graft.sources.TableCopy.fresh(spark, dir,
        "ann-index-opt") { idx =>
        buildDriftedIndex(spark, dir, idx)
        ()
      }
      val fresh = EventOps.withStreamSizing(spark) {
        optimizeIndex(spark, idx, batchId = 100L)
      }
      val state = Ingest.readUpsertTable(spark, idx)
      val probes = state.filter(col("vec_id") < 10)
        .select("vec_id", "embedding")
      Ivf.searchCells(fresh,
        state.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cvec"), col("cid")),
        probes, 5, nProbe = 16)
        .orderBy("probe_id", "rk")
    })

  /** The DRIFTED coarse quantizer: trained on batch 0's corpus (the
    * perturbed fifth and the ghosts included) — what a quantizer
    * pinned at table creation looks like after the history has moved
    * on. Shared by the optimize oracle row and IvfSpec's recall test.
    */
  private[graft] def staleCentroids(spark: SparkSession,
                                    dir: String): DataFrame = {
    val table = sharedEmbCdcTable(spark, dir)
    Ivf.buildCentroids(
      Ingest.readTableChanges(spark, table, 0, 0)
        .filter(col("_change_type") === "insert")
        .select("vec_id", "embedding"),
      16, 2).localCheckpoint()
  }

  /** Build the drifted maintained index (stale batch-0 quantizer) at
    * `idx`, folding all four feed slices; returns the stale centroids.
    * Shared by the optimize oracle row and IvfSpec's recall test.
    */
  private[graft] def buildDriftedIndex(spark: SparkSession, dir: String,
                                       idx: String): DataFrame = {
    val table = sharedEmbCdcTable(spark, dir)
    val stale = staleCentroids(spark, dir)
    EventOps.withStreamSizing(spark) {
      (0L until 4L).foreach { b =>
        foldSlice(Ingest.readTableChanges(spark, table, b, b),
          stale, idx, b)
      }
    }
    stale
  }

  val qAnnIndexMaintained: QuerySpec = QuerySpec(
    "q_ann_index_maintained",
    VectorOps.qCosineTopK.oracle, // maintained ≡ fresh ≡ brute force
    (spark, dir) => {
      GraftFunctions.register(spark)
      val table = sharedEmbCdcTable(spark, dir)
      val ivfPath = Ivf.ensureIndex(spark, dir)
      val centroids = spark.read.parquet(s"$ivfPath/centroids")
      val idx = graft.Scratch.dir("ann-index-batch") + "/idx"
      LocalTableStore.deleteTree(idx)
      EventOps.withStreamSizing(spark) {
        (0L until 4L).foreach { b =>
          foldSlice(Ingest.readTableChanges(spark, table, b, b),
            centroids, idx, b)
        }
      }
      searchMaintained(spark, dir, Ingest.readUpsertTable(spark, idx),
        idx, k = 5, nProbe = 16)
        .orderBy("probe_id", "rk")
    })

  /** The index maintained by a DECOUPLED STREAM over the published feed
    * — the standalone index-maintenance-service shape
    * (`changeFeedStream` + its own checkpoint, no writer coupling).
    * Feed delivery is FILE-atomic and file order is not batch order, so
    * the streamed fold must be order-safe where the batch fold need
    * not be: each entry carries its source `_batch_id`; a trigger's
    * delta is merged against the CURRENT index rows for ONLY its keys
    * (a bucket-pruned [[Ingest.lookupUpsertTable]] — O(trigger), never
    * an index scan) keeping the highest batch id per key; and deletes
    * become LOGICAL tombstones (`live = false`) rather than physical
    * removals — a late-delivered older upsert then loses to the
    * tombstone's higher batch id instead of resurrecting a deleted
    * vector. (Dead logical entries leave the index at OPTIMIZE/vacuum
    * cadence, the same debt-compaction story as deletion vectors.)
    * Same search path filtered to live entries; same shared
    * brute-force oracle — batch-maintained ≡ stream-maintained ≡
    * fresh build, one hash chain.
    */
  val qStreamAnnIndex: QuerySpec = QuerySpec(
    "q_stream_ann_index",
    VectorOps.qCosineTopK.oracle,
    (spark, dir) => {
      GraftFunctions.register(spark)
      val table = sharedEmbCdcTable(spark, dir)
      val ivfPath = Ivf.ensureIndex(spark, dir)
      val centroids = spark.read.parquet(s"$ivfPath/centroids")
      val base = graft.Scratch.dir("ann-index-stream")
      LocalTableStore.deleteTree(base)
      val idx = s"$base/idx"
      def fold(batch: DataFrame, id: Long): Unit = {
        // after the preimage filter a key has ONE record per base
        // batch, so max_by over _batch_id is the per-key winner of
        // whatever file slices this trigger happened to carry
        // persisted for the trigger's lifetime (guide §5): the frame is
        // consumed by the emptiness guard, the assignment, the lookup's
        // key projection AND the merge — unpersisted, each action
        // re-scanned the trigger's feed slices and re-ran the winner agg
        val winners = batch.filter(col("_change_type") =!= "update_preimage")
          .groupBy("vec_id")
          .agg(max_by(struct(col("embedding"), col("_change_type")),
            col("_batch_id")).as("w"), max(col("_batch_id")).as("_bid"))
          .select(col("vec_id"), col("w.embedding").as("embedding"),
            (col("w._change_type") =!= "delete").as("live"), col("_bid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try if (!winners.isEmpty) {
          val delta = Ivf.assign(winners, centroids)
            .select("vec_id", "embedding", "cid", "live", "_bid")
          val merged =
            if (!LocalTableStore.exists(s"$idx/CURRENT")) delta
            else Ingest.lookupUpsertTable(spark, idx,
                delta.select("vec_id"))
              .unionByName(delta)
              .groupBy("vec_id")
              .agg(max_by(struct(col("embedding"), col("cid"), col("live")),
                col("_bid")).as("w"), max(col("_bid")).as("_bid"))
              .select(col("vec_id"), col("w.embedding").as("embedding"),
                col("w.cid").as("cid"), col("w.live").as("live"), col("_bid"))
          Ingest.upsertParquet(idx, Seq("vec_id"), nBuckets = 4,
            keepVersions = 1, sortCols = Seq("cid"), filesPerBucket = 2)(
            merged, id)
        } finally { winners.unpersist(); () }
      }
      EventOps.withStreamSizing(spark) {
        val src = Ingest.changeFeedStream(spark, table,
          maxFilesPerTrigger = Some(3))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(fold)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      searchMaintained(spark, dir,
        Ingest.readUpsertTable(spark, idx).filter(col("live")),
        idx, k = 5, nProbe = 16)
        .orderBy("probe_id", "rk")
    })

  /** One feed-fold step of the maintained PQ CODES table — the
    * compressed domain a 100-TB corpus actually serves ADC from,
    * maintained incrementally like the IVF assignment instead of
    * re-encoded per corpus version: surviving post-images encode with
    * the PINNED codebooks (the fine quantizer is versioned with the
    * corpus generation exactly like the coarse one — retrain at
    * OPTIMIZE cadence), deletes tombstone through the sink. Fold cost
    * is O(batch × m × ks) encode work + O(touched buckets) writes.
    */
  private def foldPqSlice(slice: DataFrame, codebook: DataFrame,
                          codesTable: String, batchId: Long): Unit = {
    val live = Pq.encode(
      slice.filter(col("_change_type").isin("insert", "update_postimage"))
        .select("vec_id", "embedding"), codebook)
      .withColumn("_del", lit(false))
    val dead = slice.filter(col("_change_type") === "delete")
      .select(col("vec_id"),
        lit(null).cast("array<int>").as("codes"),
        lit(null).cast("double").as("cnorm"),
        lit(true).as("_del"))
    Ingest.upsertParquet(codesTable, Seq("vec_id"), nBuckets = 4,
      keepVersions = 1, deleteCol = Some("_del"))(
      live.unionByName(dead), batchId)
  }

  /** PQ codes OPTIMIZE — the FINE-quantizer retraining that completes
    * [[optimizeIndex]]'s coarse story one level down (VERDICT r12
    * missing #1): the fold above pins its codebooks forever, so after
    * sustained corpus drift the ADC estimates degrade with no recovery
    * path short of a scratch re-encode. This op IS that recovery path,
    * run at the same OPTIMIZE cadence: retrain the per-subspace
    * codebooks from the CURRENT live corpus vectors
    * ([[Pq.trainCodebooks]] — deterministic seeding, no RNG state) and
    * re-encode every vector against them in one full-rewrite batch
    * through the sink (the [[Ingest.optimizeUpsertTable]] cost class —
    * nightly/weekly, on a drift or ADC-error threshold, while the
    * per-batch folds keep the codes fresh in between). The maintained
    * folds already tombstoned deletes physically, so the codes table's
    * key set equals the live corpus and the re-encode REPLACES every
    * row — no stale code survives under an old codebook (a mixed-
    * codebook table would decode garbage: codes are meaningless
    * without the codebook that minted them, which is why the codebook
    * returns to the caller to be persisted WITH the table, versioned
    * like the coarse centroids). Codebook quality affects ADC
    * ESTIMATES only — shortlist recall, never rerank correctness — so
    * drift degrades recall, not results; the gate below pins the
    * plumbing exactly, and PqSpec measures the quantization-error drop
    * retraining exists for.
    */
  def optimizePqCodes(spark: SparkSession, codesTable: String,
                      corpus: DataFrame, batchId: Long,
                      m: Int = Pq.M, ks: Int = Pq.Ks,
                      iters: Int = 3, dim: Int = 64): DataFrame = {
    val cb = Pq.trainCodebooks(corpus, m, ks, iters, dim).localCheckpoint()
    val fresh = Pq.encode(corpus, cb, m, dim)
    val state = Ingest.readUpsertTable(spark, codesTable)
    // enforce the "corpus == live key set" precondition instead of
    // trusting it: a live row absent from `corpus` would keep codes
    // minted under the OLD codebook while the NEW one is returned —
    // exactly the mixed-codebook state the scaladoc calls garbage.
    // One anti-join count in a full-rewrite-cadence op.
    val orphans = (if (state.columns.contains("live"))
      state.filter(col("live")) else state)
      .select("vec_id")
      .join(corpus.select("vec_id"), Seq("vec_id"), "left_anti").count()
    require(orphans == 0L,
      s"optimizePqCodes: $orphans live row(s) in $codesTable are absent " +
        "from the passed corpus — re-encoding would leave them coded " +
        "under the old codebook (mixed-codebook ADC garbage); pass the " +
        "FULL live corpus")
    if (!state.columns.contains("live")) {
      // batch shape: the fold tombstoned deletes physically, so the
      // key set IS the live corpus — re-encode replaces every row
      Ingest.upsertParquet(codesTable, Seq("vec_id"), nBuckets = 4,
        keepVersions = 1, deleteCol = Some("_del"))(
        fresh.withColumn("_del", lit(false)), batchId)
    } else {
      // stream shape ([[qStreamAnnPq]]): live rows re-encode (their
      // `_bid` rides along — a later feed entry must still win on
      // batch id), and the accumulated logical tombstones become REAL
      // deletes and leave the table — sound here for the same reason
      // as [[optimizeIndex]]'s stream leg: optimize reads committed
      // batch-atomic state, outside the file-atomic delivery window
      // the logical tombstones defend against. This is the compaction
      // cadence the stream fold's scaladoc defers to.
      val keep = fresh
        .join(state.filter(col("live")).select("vec_id", "_bid"), "vec_id")
        .withColumn("live", lit(true)).withColumn("_del", lit(false))
      val drop = state.filter(!col("live")).withColumn("_del", lit(true))
      Ingest.upsertParquet(codesTable, Seq("vec_id"), nBuckets = 4,
        keepVersions = 1, deleteCol = Some("_del"))(
        keep.unionByName(drop.select(keep.columns.map(col): _*)), batchId)
    }
    cb
  }

  /** The DRIFTED fine quantizer + codes table: codebooks trained on
    * batch 0's corpus (perturbed fifth + ghosts included), all four
    * feed slices folded against them — what a codes table pinned at
    * creation looks like after the history moved on. Shared by the
    * optimize oracle row and PqSpec's quantization-error measurement.
    * Returns (staleCodebook, codesTablePath).
    */
  private[graft] def buildDriftedPqCodes(spark: SparkSession, dir: String,
                                         codesTable: String)
      : (DataFrame, String) = {
    val table = sharedEmbCdcTable(spark, dir)
    val stale = Pq.trainCodebooks(
      Ingest.readTableChanges(spark, table, 0, 0)
        .filter(col("_change_type") === "insert")
        .select("vec_id", "embedding")).localCheckpoint()
    EventOps.withStreamSizing(spark) {
      (0L until 4L).foreach { b =>
        foldPqSlice(Ingest.readTableChanges(spark, table, b, b),
          stale, codesTable, b)
      }
    }
    (stale, codesTable)
  }

  /** PQ-codes OPTIMIZE after drift, gated like [[qAnnIndexOptimize]]:
    * the codes table is maintained with a STALE fine quantizer trained
    * on the perturbed batch-0 corpus, then [[optimizePqCodes]]
    * retrains from the final corpus and re-encodes. Two checks before
    * the search: the optimized table must equal a fresh
    * train-and-encode of the final corpus cell-for-cell (retrain +
    * full-rewrite lost or duplicated nothing — the key set stayed
    * exactly the live corpus), and the corpus-wide-shortlist ADC
    * search over it must hash-match brute force (shares
    * `q_cosine_topk`'s oracle). The ADC-estimate improvement — the
    * thing the retrain exists for — is measured in PqSpec against the
    * same drifted fixture.
    */
  val qAnnIndexPqOptimize: QuerySpec = QuerySpec(
    "q_ann_index_pq_optimize",
    VectorOps.qCosineTopK.oracle,
    (spark, dir) => {
      GraftFunctions.register(spark)
      // derive-once fixture (r16): the drifted-codes fold is setup;
      // the OPTIMIZE retrain-and-re-encode below is what the row times
      val codesTable = graft.sources.TableCopy.fresh(spark, dir,
        "ann-index-pq-opt") { codesTable =>
        buildDriftedPqCodes(spark, dir, codesTable)
        ()
      }
      val emb = Tables.load(spark, dir, "embeddings")
      val cb = EventOps.withStreamSizing(spark) {
        optimizePqCodes(spark, codesTable, emb, batchId = 100L)
      }
      val optimized = Ingest.readUpsertTable(spark, codesTable)
      val (_, freshCodes) = Pq.indexFor(spark, dir)
      val diverged = optimized
        .select(col("vec_id"), col("codes").as("mc"), col("cnorm").as("mn"))
        .join(freshCodes.select(col("vec_id"), col("codes").as("fc"),
          col("cnorm").as("fn")), Seq("vec_id"), "full_outer")
        .filter(col("mc").isNull || col("fc").isNull ||
          col("mc") =!= col("fc") || col("mn") =!= col("fn"))
      require(diverged.isEmpty,
        "optimized PQ codes diverge from a fresh train-and-encode")
      Pq.searchPq(emb, col("vec_id") < 10, 5, cb,
        optimized.select("vec_id", "codes", "cnorm"),
        shortlist = Int.MaxValue)
        .orderBy("probe_id", "rk")
    })

  /** Feed-maintained PQ codes, gated on ONE hash chain: the maintained
    * codes table — built through inserts, cell-moving corrections and
    * deletes — must equal the fresh encode of the final corpus
    * cell-for-cell (checked in-query before the search runs), and the
    * corpus-wide-shortlist ADC search over it must equal brute force
    * bit-for-bit (shares `q_cosine_topk`'s oracle with
    * `q_cosine_topk_pq_exact`). Together: maintained ≡ fresh encode ≡
    * brute force.
    */
  val qAnnIndexPqMaintained: QuerySpec = QuerySpec(
    "q_ann_index_pq_maintained",
    VectorOps.qCosineTopK.oracle,
    (spark, dir) => {
      GraftFunctions.register(spark)
      val table = sharedEmbCdcTable(spark, dir)
      val (cb, freshCodes) = Pq.indexFor(spark, dir)
      val base = graft.Scratch.dir("ann-index-pq")
      LocalTableStore.deleteTree(base)
      val codesTable = s"$base/codes"
      EventOps.withStreamSizing(spark) {
        (0L until 4L).foreach { b =>
          foldPqSlice(Ingest.readTableChanges(spark, table, b, b),
            cb, codesTable, b)
        }
      }
      val maintained = Ingest.readUpsertTable(spark, codesTable)
      val m2 = maintained.select(col("vec_id"), col("codes").as("mc"),
        col("cnorm").as("mn"))
      val f2 = freshCodes.select(col("vec_id"), col("codes").as("fc"),
        col("cnorm").as("fn"))
      val diverged = m2.join(f2, Seq("vec_id"), "full_outer")
        .filter(col("mc").isNull || col("fc").isNull ||
          col("mc") =!= col("fc") || col("mn") =!= col("fn"))
      require(diverged.isEmpty,
        "maintained PQ codes diverge from the fresh encode")
      val emb = Tables.load(spark, dir, "embeddings")
      Pq.searchPq(emb, col("vec_id") < 10, 5, cb,
        maintained.select("vec_id", "codes", "cnorm"),
        shortlist = Int.MaxValue)
        .orderBy("probe_id", "rk")
    })

  /** PQ codes maintained by a DECOUPLED STREAM over the published feed
    * — [[qAnnIndexPqMaintained]]'s batch fold re-expressed the way the
    * IVF assignment already is in [[qStreamAnnIndex]], completing the
    * maintenance symmetry: both quantizer domains now fold from the
    * feed in batch AND stream shape. Same order-safety obligations
    * (feed delivery is FILE-atomic, file order is not batch order):
    * per-key winners by source `_batch_id` within the trigger, a
    * bucket-pruned merge against the CURRENT codes rows for ONLY the
    * trigger's keys, and deletes as LOGICAL tombstones (`live =
    * false`) so a late-delivered older upsert loses on batch id
    * instead of resurrecting a deleted vector's codes (dead entries
    * leave at OPTIMIZE cadence — [[optimizePqCodes]] on the live
    * corpus is exactly that compaction for this table). Encode cost
    * rides the trigger: O(delta × m × ks), never a corpus re-encode.
    * Gate: one hash chain — stream-maintained live codes ≡ fresh
    * encode cell-for-cell (checked in-query) AND corpus-wide ADC ≡
    * brute force (shares `q_cosine_topk`'s oracle).
    */
  val qStreamAnnPq: QuerySpec = QuerySpec(
    "q_stream_ann_pq",
    VectorOps.qCosineTopK.oracle,
    (spark, dir) => {
      GraftFunctions.register(spark)
      val table = sharedEmbCdcTable(spark, dir)
      val (cb, freshCodes) = Pq.indexFor(spark, dir)
      val base = graft.Scratch.dir("ann-pq-stream")
      LocalTableStore.deleteTree(base)
      val codesTable = s"$base/codes"
      def fold(batch: DataFrame, id: Long): Unit = {
        // persisted for the trigger's lifetime (guide §5): consumed by
        // the emptiness guard, the live/dead splits, the _bid join and
        // the merge — unpersisted, each action re-scanned the trigger's
        // feed slices and re-ran the winner agg
        val winners = batch.filter(col("_change_type") =!= "update_preimage")
          .groupBy("vec_id")
          .agg(max_by(struct(col("embedding"), col("_change_type")),
            col("_batch_id")).as("w"), max(col("_batch_id")).as("_bid"))
          .select(col("vec_id"), col("w.embedding").as("embedding"),
            (col("w._change_type") =!= "delete").as("live"), col("_bid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try if (!winners.isEmpty) {
          val alive = Pq.encode(
              winners.filter(col("live")).select("vec_id", "embedding"), cb)
            .withColumn("live", lit(true))
            .join(winners.select("vec_id", "_bid"), "vec_id")
            .select("vec_id", "codes", "cnorm", "live", "_bid")
          val dead = winners.filter(!col("live"))
            .select(col("vec_id"),
              lit(null).cast("array<int>").as("codes"),
              lit(null).cast("double").as("cnorm"),
              lit(false).as("live"), col("_bid"))
          val delta = alive.unionByName(dead)
          val merged =
            if (!LocalTableStore.exists(s"$codesTable/CURRENT")) delta
            else Ingest.lookupUpsertTable(spark, codesTable,
                delta.select("vec_id"))
              .unionByName(delta)
              .groupBy("vec_id")
              .agg(max_by(struct(col("codes"), col("cnorm"), col("live")),
                col("_bid")).as("w"), max(col("_bid")).as("_bid"))
              .select(col("vec_id"), col("w.codes").as("codes"),
                col("w.cnorm").as("cnorm"), col("w.live").as("live"),
                col("_bid"))
          Ingest.upsertParquet(codesTable, Seq("vec_id"), nBuckets = 4,
            keepVersions = 1)(merged, id)
        } finally { winners.unpersist(); () }
      }
      EventOps.withStreamSizing(spark) {
        val src = Ingest.changeFeedStream(spark, table,
          maxFilesPerTrigger = Some(3))
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(fold)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      val maintained = Ingest.readUpsertTable(spark, codesTable)
        .filter(col("live"))
      val diverged = maintained
        .select(col("vec_id"), col("codes").as("mc"), col("cnorm").as("mn"))
        .join(freshCodes.select(col("vec_id"), col("codes").as("fc"),
          col("cnorm").as("fn")), Seq("vec_id"), "full_outer")
        .filter(col("mc").isNull || col("fc").isNull ||
          col("mc") =!= col("fc") || col("mn") =!= col("fn"))
      require(diverged.isEmpty,
        "stream-maintained PQ codes diverge from the fresh encode")
      val emb = Tables.load(spark, dir, "embeddings")
      Pq.searchPq(emb, col("vec_id") < 10, 5, cb,
        maintained.select("vec_id", "codes", "cnorm"),
        shortlist = Int.MaxValue)
        .orderBy("probe_id", "rk")
    })

  def specs: Seq[QuerySpec] =
    Seq(qAnnIndexMaintained, qStreamAnnIndex, qAnnIndexOptimize,
      qAnnIndexPqMaintained, qAnnIndexPqOptimize, qStreamAnnPq)
}
