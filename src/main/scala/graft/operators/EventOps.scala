package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table (SURVEY.md §2.3 as-of
  * join, §2.5 sessionization, §2.9 batch-equivalents of the streaming
  * windows — the streaming forms live in graft.streaming).
  *
  * Scale notes: the as-of join is the union+window pattern — one shuffle
  * on (user_id), no range-join blowup: at 100 TB an events×orders range
  * join would be quadratic per key, while sort-within-partition is
  * n log n. Sessionization is the classic lag-gap → running-sum pattern,
  * also a single shuffle on the session key.
  */
object EventOps {

  /** As-of join core, reusable: for each left row, the latest right row
    * with same key and rightTs <= leftTs. Implemented as union + last()
    * over an ordered window — a single shuffle on the key.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               payload: String): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val outCols = (leftCols :+ payload :+ "_side").map(col)
    val l = left
      .withColumn("_side", lit(1))
      .withColumn(payload, lit(null).cast(right.schema(payload).dataType))
    val r = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(right.withColumn("_side", lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = l.select(outCols: _*).unionByName(r.select(outCols: _*))
    // Right rows sort before left rows at equal ts (_side 0 < 1) so a
    // same-instant right row is visible (non-strict <=).
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * same key and rightTs >= leftTs — the mirror of [[asOfJoin]] (same
    * union + single-shuffle window shape, frame reversed).
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      tsCol: String, payload: String): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val outCols = (leftCols :+ payload :+ "_side").map(col)
    val l = left
      .withColumn("_side", lit(1))
      .withColumn(payload, lit(null).cast(right.schema(payload).dataType))
    val r = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(right.withColumn("_side", lit(2))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = l.select(outCols: _*).unionByName(r.select(outCols: _*))
    // Right rows sort after left rows at equal ts (_side 2 > 1) so a
    // same-instant right row is inside the forward frame (non-strict >=).
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn(payload, first(col(payload), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** The as-of fixtures shared by all three as-of queries — errors as
    * the probe side, purchases deduped to one row per (user, ts) (max
    * event_id) so ties are deterministic in both engines. ONE
    * definition: the tie-break/projection contract must hold across the
    * backward, forward, and tolerance variants identically.
    */
  private def asOfSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.load(spark, dir, "events")
    (ev.filter(col("event_type") === "error")
       .select("event_id", "user_id", "ts"),
     ev.filter(col("event_type") === "purchase")
       .groupBy("user_id", "ts").agg(max("event_id").as("pid")))
  }

  /** For each error event: id of that user's most recent purchase at or
    * before it. Oracle uses DuckDB's native ASOF JOIN — same semantics.
    */
  val qAsofJoin: QuerySpec = QuerySpec(
    "q_asof_join",
    Some("""SELECT e.event_id, e.user_id, p.pid AS prev_purchase_id
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS pid FROM events
                      WHERE event_type = 'purchase' GROUP BY user_id, ts) p
      ON e.user_id = p.user_id AND p.ts <= e.ts
      ORDER BY event_id"""),
    (spark, dir) => {
      val (errors, purchases) = asOfSides(spark, dir)
      asOfJoin(errors, purchases.withColumnRenamed("pid", "prev_purchase_id"),
               "user_id", "ts", "prev_purchase_id")
        .select("event_id", "user_id", "prev_purchase_id")
        .orderBy("event_id")
    })

  /** Tolerance-bounded as-of join (the `merge_asof(tolerance=...)`
    * feature-engineering shape): the nearest preceding purchase counts
    * only if it happened within the last hour — stale matches become
    * NULL, not silently-old features. The payload rides as a struct so
    * the matched row's OWN timestamp survives the window for the
    * tolerance test; same single-shuffle union+window plan.
    */
  val qAsofTolerance: QuerySpec = QuerySpec(
    "q_asof_tolerance",
    Some("""SELECT e.event_id, e.user_id,
      CASE WHEN p.ts >= e.ts - INTERVAL 1 HOUR THEN p.pid END AS prev_purchase_id_1h
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS pid FROM events
                      WHERE event_type = 'purchase' GROUP BY user_id, ts) p
      ON e.user_id = p.user_id AND p.ts <= e.ts
      ORDER BY event_id"""),
    (spark, dir) => {
      val (errors, purchases0) = asOfSides(spark, dir)
      val purchases = purchases0.select(col("user_id"), col("ts"),
        struct(col("ts").as("pts"), col("pid")).as("pv"))
      asOfJoin(errors, purchases, "user_id", "ts", "pv")
        .select(col("event_id"), col("user_id"),
          when(col("pv.pts") >= col("ts") - expr("INTERVAL 1 HOUR"),
            col("pv.pid")).as("prev_purchase_id_1h"))
        .orderBy("event_id")
    })

  /** Forward twin of q_asof_join: next purchase at or after each error. */
  val qAsofForward: QuerySpec = QuerySpec(
    "q_asof_forward",
    Some("""SELECT e.event_id, e.user_id, p.pid AS next_purchase_id
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS pid FROM events
                      WHERE event_type = 'purchase' GROUP BY user_id, ts) p
      ON e.user_id = p.user_id AND p.ts >= e.ts
      ORDER BY event_id"""),
    (spark, dir) => {
      val (errors, purchases) = asOfSides(spark, dir)
      asOfJoinForward(errors,
          purchases.withColumnRenamed("pid", "next_purchase_id"),
          "user_id", "ts", "next_purchase_id")
        .select("event_id", "user_id", "next_purchase_id")
        .orderBy("event_id")
    })

  /** Calendar densification (gap filling): generate the full day range
    * spanned by the data, left-join daily counts, zero-fill the gaps —
    * the shape every activity/retention dashboard needs, and the dual
    * of aggregation (rows that DON'T exist become visible). The day
    * spine is sequence+explode over the self-derived [min, max] — a
    * one-row aggregate crossed with the counts, no driver-side range.
    */
  val qDateDensify: QuerySpec = QuerySpec(
    "q_date_densify",
    Some("""WITH b AS (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS mn,
                CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS mx FROM events),
      days AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM b),
      c AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
            FROM events GROUP BY 1)
      SELECT d.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM days d LEFT JOIN c ON d.day = c.day ORDER BY d.day"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")))
      val spine = ev.agg(min("day").as("mn"), max("day").as("mx"))
        .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 day")))
          .as("day"))
      val counts = ev.groupBy("day").agg(count(lit(1)).as("n"))
      spine.join(counts, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("day")
    })

  /** Gap-based sessionization (30-min inactivity), batch form. */
  val qSessionize: QuerySpec = QuerySpec(
    "q_sessionize",
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s AS (
        SELECT user_id, ts, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM g)
      SELECT user_id, session_seq, count(*) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end
      FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq"""),
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(spark, dir, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("session_seq", sum("is_new").over(run))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
             min("ts").as("session_start"), max("ts").as("session_end"))
        .orderBy("user_id", "session_seq")
    })

  /** Tumbling event-time window aggregate — batch equivalent of the
    * streaming `groupBy(window($"ts","1 hour"))` (graft.streaming has the
    * streaming form; results agree because tumbling windows are
    * epoch-aligned like date_trunc).
    */
  val qWindowTumbling: QuerySpec = QuerySpec(
    "q_window_tumbling",
    Some("""SELECT date_trunc('hour', ts) AS w_start, event_type,
      count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""),
    (spark, dir) => {
      Tables.load(spark, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    })

  /** BANDED point-in-interval join: how many sessions (any user) were
    * in progress when each error fired. A naive `ts BETWEEN start AND
    * end` theta join plans as a nested loop — O(points × intervals)
    * compares, the classic OSS-Spark range-join trap. Banding makes it
    * an EQUI-join: intervals explode into the 1-hour time bins they
    * cover, points carry their single bin, the join keys on the bin,
    * and the exact BETWEEN filter verifies — identical result (each
    * point has one bin and an interval covers distinct bins, so a
    * matching pair joins exactly once; no dedup needed), near-linear
    * shuffle. The oracle is DuckDB's naive theta join over the same
    * lag-gap sessions.
    */
  val qIntervalJoin: QuerySpec = QuerySpec(
    "q_interval_join",
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s AS (
        SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM g
      ), sess AS (
        SELECT user_id, seq, min(ts) AS st, max(ts) AS en
        FROM s GROUP BY user_id, seq)
      SELECT e.event_id, count(*) AS n_concurrent
      FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
      JOIN sess ON e.ts BETWEEN sess.st AND sess.en
      GROUP BY e.event_id ORDER BY event_id"""),
    (spark, dir) => {
      val binSeconds = 3600L
      def bin(c: org.apache.spark.sql.Column) =
        (unix_micros(c) / lit(binSeconds * 1000000L)).cast("long")
      val sess = qSessionize.run(spark, dir)
        .select(col("session_start").as("st"), col("session_end").as("en"))
      val sessBins = sess.withColumn("bin",
        explode(sequence(bin(col("st")), bin(col("en")))))
      Tables.load(spark, dir, "events")
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"), bin(col("ts")).as("bin"))
        .join(sessBins, Seq("bin"))
        .filter(col("ts").between(col("st"), col("en")))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_concurrent"))
        .orderBy("event_id")
    })

  /** Streaming = batch, machine-checked (VERDICT r3 item 3): the SAME
    * tumbling aggregation as [[qWindowTumbling]], but executed by the
    * Structured Streaming engine end-to-end — file streaming source over
    * the events fixture → watermarked `groupBy(window(...))` state →
    * `Trigger.AvailableNow` drain into a sink — and hash-compared against
    * the batch twin's DuckDB oracle. This converts "streaming rows are
    * spec-tested" into a green CORRECTNESS row through the streaming
    * engine itself.
    *
    * Complete output mode + memory sink: a file/parquet sink needs
    * append mode, and append only emits windows the watermark has passed
    * — the trailing window would never flush on a finite fixture.
    * Complete mode emits the full state at the final trigger, which is
    * exactly the batch answer. The watermark is set beyond the fixture's
    * time span so no row is late-dropped regardless of how AvailableNow
    * splits files into micro-batches (late-DROP semantics have their own
    * StreamingSpec coverage; this row checks engine equivalence). Memory
    * sink is driver-resident — fine for the windowed AGGREGATE (bounded
    * by distinct windows × event types, not input size); the production
    * sink is foreachBatch/Kafka (Ingest).
    */
  val qStreamTumbling: QuerySpec = QuerySpec(
    "q_stream_tumbling",
    qWindowTumbling.oracle, // shared verbatim — streaming must equal batch
    (spark, dir) => {
      val agg = graft.streaming.Streams.tumblingCounts(
        streamedEvents(spark, dir), watermark = "3650 days")
      runStreamToTable(agg).orderBy("w_start", "event_type")
    })

  /** Sliding-window counterpart: the streaming engine's overlapping
    * window expansion + state, hash-checked against the batch twin's
    * oracle ([[graft.operators.Analytic.qWindowSliding]]).
    */
  val qStreamSliding: QuerySpec = QuerySpec(
    "q_stream_sliding",
    Analytic.qWindowSliding.oracle,
    (spark, dir) => {
      val agg = graft.streaming.Streams.slidingCounts(
          streamedEvents(spark, dir), watermark = "3650 days")
        .select("w_start", "event_type", "n") // oracle carries no w_end
      runStreamToTable(agg).orderBy("w_start", "event_type")
    })

  /** Session windows through the streaming engine: `session_window`
    * state (merging windows!) drained the same way, hash-checked against
    * a DuckDB islands-CTE twin that reproduces session_window semantics
    * exactly — new session when the gap STRICTLY exceeds 30 minutes,
    * session_end = last event + gap (unlike [[qSessionize]]'s
    * session_end = last event, hence the separate oracle).
    */
  val qStreamSession: QuerySpec = QuerySpec(
    "q_stream_session",
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s AS (
        SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM g)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end,
        count(*) AS n_events
      FROM s GROUP BY user_id, seq
      ORDER BY user_id, session_start"""),
    (spark, dir) => {
      val agg = graft.streaming.Streams.sessionCounts(
        streamedEvents(spark, dir), gap = "30 minutes", watermark = "3650 days")
      runStreamToTable(agg)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    })

  /** Arbitrary stateful processing through the streaming engine:
    * [[graft.streaming.Streams.runningUserTotals]] (flatMapGroupsWithState,
    * update mode) emits a running (count, total) per user per
    * micro-batch; the FINAL update per user — the row with that user's
    * maximum n_events, which strictly increases per update — must equal
    * the batch aggregate, which is the DuckDB oracle. This converts the
    * §2.9 "arbitrary stateful" row from spec-only to hash-checked.
    */
  val qStreamStateful: QuerySpec = QuerySpec(
    "q_stream_stateful",
    Some("""SELECT user_id, count(*) AS n_events,
        round(sum(value), 2) AS total_value
      FROM events GROUP BY user_id ORDER BY user_id"""),
    (spark, dir) => {
      val upd = graft.streaming.Streams.runningUserTotals(
        streamedEvents(spark, dir))
      val sunk = runStreamToTable(upd, mode = "update")
      // update mode appends one row per (user, micro-batch): keep each
      // user's final state (max n_events — strictly increasing), then
      // round the double total for cross-engine stability
      val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
      sunk.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("n_events"),
          round(col("total_value"), 2).as("total_value"))
        .orderBy("user_id")
    })

  /** Stream-stream join through the streaming engine: for each error
    * event, purchases by the same user in the preceding hour
    * ([[graft.streaming.Streams.errorsWithRecentPurchases]] — a
    * time-bounded self-join of the stream, append mode, real join
    * state). The batch twin is a plain SQL theta join, so the oracle
    * hash-checks the streaming join's full result set.
    */
  val qStreamJoin: QuerySpec = QuerySpec(
    "q_stream_join",
    Some("""SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
        p.event_id AS purchase_id, p.ts AS purchase_ts
      FROM events e JOIN events p
        ON e.event_type = 'error' AND p.event_type = 'purchase'
        AND p.user_id = e.user_id
        AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR
      ORDER BY error_id, purchase_id"""),
    (spark, dir) => {
      val joined = graft.streaming.Streams.errorsWithRecentPurchases(
        streamedEvents(spark, dir), watermark = "3650 days")
      runStreamToTable(joined, mode = "append")
        .orderBy("error_id", "purchase_id")
    })

  /** LEFT OUTER stream-stream join — the semantically hard §2.9 join
    * mode: an unmatched left row emits its null-extended result only
    * when the WATERMARK proves no match can arrive, never at query
    * stop. So this twin runs with a real 1-minute watermark, and both
    * engines restrict the compared set to errors at least 3 hours older
    * than the SMALLER of the two sides' max timestamps — the global
    * watermark is the MIN across the per-side watermarks (each side
    * only observes its own filtered rows, so the last purchase, not
    * the last event, can gate eviction), and left-state eviction is
    * conservative by the 1-hour look-back plus the watermark delay;
    * the 3-hour margin absorbs both. Below that line the streaming
    * result is contractually complete (matches emitted on arrival,
    * null-extensions flushed by the final watermark advance). Rows
    * newer than that are legitimately still in state at drain end —
    * comparing them would test fixture truncation, not join semantics.
    * The cutoff is derived from the data identically in both engines.
    */
  val qStreamJoinOuter: QuerySpec = QuerySpec(
    "q_stream_join_outer",
    Some("""SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
        p.event_id AS purchase_id, p.ts AS purchase_ts
      FROM events e LEFT JOIN events p
        ON p.event_type = 'purchase'
        AND p.user_id = e.user_id
        AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR
      WHERE e.event_type = 'error'
        AND e.ts <= (SELECT least(
              max(CASE WHEN event_type = 'error' THEN ts END),
              max(CASE WHEN event_type = 'purchase' THEN ts END))
            - INTERVAL 3 HOUR FROM events)
      ORDER BY error_id, purchase_id"""),
    (spark, dir) => {
      val joined = graft.streaming.Streams.errorsWithRecentPurchasesOuter(
        streamedEvents(spark, dir), watermark = "1 minute")
      val cutoff = Tables.load(spark, dir, "events")
        .agg((least(
          max(when(col("event_type") === "error", col("ts"))),
          max(when(col("event_type") === "purchase", col("ts"))))
          - expr("INTERVAL 3 HOUR")).as("co"))
      runStreamToTable(joined, mode = "append")
        .crossJoin(broadcast(cutoff))
        .filter(col("error_ts") <= col("co"))
        .drop("co")
        .orderBy("error_id", "purchase_id")
    })

  /** FULL OUTER stream-stream join — both sides' unmatched rows emit
    * null-extended on watermark advance. Same completeness contract as
    * [[qStreamJoinOuter]], applied SYMMETRICALLY: a row is compared
    * when every non-null timestamp it carries is at least 3 h older
    * than the smaller per-side max (right-state eviction needs the
    * watermark past purchase_ts + the 1-hour look-AHEAD, the mirror of
    * the left bound; the shared margin covers both directions).
    */
  val qStreamJoinFull: QuerySpec = QuerySpec(
    "q_stream_join_full",
    Some("""WITH co AS (SELECT least(
            max(CASE WHEN event_type = 'error' THEN ts END),
            max(CASE WHEN event_type = 'purchase' THEN ts END))
          - INTERVAL 3 HOUR AS co FROM events),
      e AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'error'),
      p AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase')
      SELECT e.event_id AS error_id,
        coalesce(e.user_id, p.user_id) AS user_id,
        e.ts AS error_ts,
        p.event_id AS purchase_id, p.ts AS purchase_ts
      FROM e FULL OUTER JOIN p
        ON p.user_id = e.user_id
        AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR
      CROSS JOIN co
      WHERE (e.ts IS NULL OR e.ts <= co.co)
        AND (p.ts IS NULL OR p.ts <= co.co)
      ORDER BY error_id, purchase_id"""),
    (spark, dir) => {
      val joined = graft.streaming.Streams.errorsWithRecentPurchasesOuter(
        streamedEvents(spark, dir), watermark = "1 minute",
        joinType = "full_outer")
      val cutoff = Tables.load(spark, dir, "events")
        .agg((least(
          max(when(col("event_type") === "error", col("ts"))),
          max(when(col("event_type") === "purchase", col("ts"))))
          - expr("INTERVAL 3 HOUR")).as("co"))
      runStreamToTable(joined, mode = "append")
        .crossJoin(broadcast(cutoff))
        .filter((col("error_ts").isNull || col("error_ts") <= col("co")) &&
          (col("purchase_ts").isNull || col("purchase_ts") <= col("co")))
        .drop("co")
        .orderBy("error_id", "purchase_id")
    })

  /** LEFT SEMI stream-stream join — completes the §2.9 join-mode
    * matrix (inner / left outer / full outer / left semi). Semi
    * emission happens on match ARRIVAL, never on watermark advance
    * (unmatched rows simply never emit), so this twin drains complete
    * under the fixture-spanning watermark like the inner join — no
    * cutoff contract needed. The oracle is the EXISTS screen, i.e. the
    * DISTINCT-error projection of [[qStreamJoin]]'s theta join.
    */
  val qStreamJoinSemi: QuerySpec = QuerySpec(
    "q_stream_join_semi",
    Some("""SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts
      FROM events e
      WHERE e.event_type = 'error' AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
          AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR)
      ORDER BY error_id"""),
    (spark, dir) => {
      val joined = graft.streaming.Streams.errorsWithPurchaseSemi(
        streamedEvents(spark, dir), watermark = "3650 days")
      runStreamToTable(joined, mode = "append").orderBy("error_id")
    })

  /** Streaming dedup state against an oracle: dedup on a deliberately
    * non-unique key (user, event_type — event_id is unique, which would
    * make the check vacuous), then project the key: the surviving key
    * set is exactly SELECT DISTINCT, whatever representative rows the
    * dedup state kept.
    */
  val qStreamDedup: QuerySpec = QuerySpec(
    "q_stream_dedup",
    Some("""SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""),
    (spark, dir) => {
      val deduped = graft.streaming.Streams.dedupWithinWatermark(
          streamedEvents(spark, dir), watermark = "3650 days",
          keys = Seq("user_id", "event_type"))
        .select("user_id", "event_type")
      runStreamToTable(deduped, mode = "append")
        .orderBy("user_id", "event_type")
    })

  /** Spark-4 typed stateful processing (`transformWithState` on the
    * RocksDB state store) against an oracle: running count per (user,
    * event_type), final update per key = the batch GROUP BY count. The
    * RocksDB provider is set for the run and restored after —
    * transformWithState requires it, and it is the production state
    * store anyway.
    */
  val qStreamTyped: QuerySpec = QuerySpec(
    "q_stream_typed",
    Some("""SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""),
    (spark, dir) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val upd = graft.streaming.Streams.typedEventCounts(
          streamedEvents(spark, dir))
        val sunk = runStreamToTable(upd, mode = "update")
        // n strictly increases per update per key → final state = max
        sunk.groupBy("user_id", "event_type")
          .agg(max("n").as("n"))
          .orderBy("user_id", "event_type")
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    })

  /** Stream-static enrichment through the streaming engine: the event
    * stream left-joins the broadcast customer dimension per micro-batch
    * (no streaming state at all — the production "attach dimensions at
    * ingest" shape), hash-checked against the plain batch join oracle.
    */
  val qStreamEnrich: QuerySpec = QuerySpec(
    "q_stream_enrich",
    Some("""SELECT e.event_id, e.user_id, c.c_mktsegment
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY event_id"""),
    (spark, dir) => {
      val dim = Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      val enriched = graft.streaming.Streams.enrich(
          streamedEvents(spark, dir), dim, "user_id", "c_custkey")
        .select("event_id", "user_id", "c_mktsegment")
      runStreamToTable(enriched, mode = "append")
        .orderBy("event_id")
    })

  /** Events fixture as a file STREAMING source. The path must be a
    * GLOB: for a non-glob path the file stream source force-sets
    * basePath to the path itself, which fails for a single-file fixture
    * ("Option 'basePath' must be a directory").
    */
  private def streamedEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.withEventTsAt(spark, dir)(graft.sources.Ingest.readStreamFiles(
      spark, s"$dir/events.*", Tables.eventsRaw))

  /** Drain a streaming aggregate into a complete-mode memory sink via
    * `Trigger.AvailableNow` and return the sink table. Query names are
    * unique per invocation: reps in the same session must not collide on
    * an active query name or serve a stale memory table.
    */
  /** Stateful-stage parallelism for the streaming twins. A streaming
    * query pins one state-store instance per shuffle partition, and
    * EVERY micro-batch pays per-store commit I/O whether or not the
    * partition holds state — so state partitions must be sized to state
    * VOLUME (here: 150 users / a few thousand windows), not to core
    * count. 32 stores over this state ran the stream-stream join at
    * 9.3 s; 8 runs it at ~3.9 s, same result. On a cluster the same
    * sizing rule holds in the other direction: state partitions grow
    * with keyspace (and the store moves to RocksDB), independent of the
    * batch side's shuffle sizing, and the number is fixed at first
    * start because it is baked into the checkpoint.
    */
  private val StreamStatePartitions = 8

  /** Run `body` (which must START any streaming query it creates
    * before returning control here... in practice: the whole drain)
    * at streaming-state shuffle sizing, restoring the session's batch
    * sizing after. The conf is read when a query STARTS (it defines
    * the state layout for the checkpoint's lifetime), and micro-batch
    * jobs inside a `foreachBatch` sink plan per batch — so sinks that
    * merge inside the drain hold the sizing for the stream's whole
    * lifetime. One helper so every streaming row shares the
    * [[StreamStatePartitions]] rationale instead of restating an
    * ad-hoc `8`.
    */
  private[operators] def withStreamSizing[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StreamStatePartitions)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private val stagedChunksMemo =
    graft.Memo[(SparkSession, String, String), IndexedSeq[java.nio.file.Path]]()

  /** Stage `n` one-file parquet chunks ONCE per (session, fixture,
    * tag) and return the chunk part files (r16, guide §1.2): the
    * file-stream rows drain a fresh source dir + checkpoint per
    * invocation — that isolation needs a per-rep COPY of each staged
    * file, not a per-rep REWRITE of the chunking query. `chunk(i)`
    * must be deterministic in (fixture, i), which every caller's
    * value-based chunking already is.
    */
  private[operators] def stagedChunks(spark: SparkSession, dir: String,
                                      tag: String, n: Int)
                                     (chunk: Int => DataFrame)
                                     : IndexedSeq[java.nio.file.Path] = {
    val staged = stagedChunksMemo.getOrElseUpdate((spark, dir, tag), {
      val stage = graft.Scratch.dir(s"$tag-chunks")
      (0 until n).map { i =>
        val tmp = s"$stage/stage_$i"
        chunk(i).coalesce(1).write.mode("overwrite").parquet(tmp)
        new java.io.File(tmp).listFiles()
          .filter(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).head.toPath
      }
    })
    // the memo key omits n and the chunk fn: a tag MUST uniquely
    // determine the chunking (ADVICE r16) — fail loudly if reused
    require(staged.length == n,
      s"stagedChunks: tag '$tag' was first staged with n=${staged.length}, " +
        s"now requested with n=$n — tags must uniquely determine the chunking")
    staged
  }

  private[operators] def runStreamToTable(agg: DataFrame,
                               mode: String = "complete",
                               checkpoint: Option[String] = None): DataFrame = {
    val spark = agg.sparkSession
    val name = "graft_stream_" + streamSeq.incrementAndGet()
    val q = withStreamSizing(spark) {
        val w = agg.writeStream.format("memory").queryName(name)
          .outputMode(mode)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        // the engine permits checkpoint RECOVERY into a memory sink only
        // in complete mode (state lives in the state store, the sink is
        // rebuilt each trigger) — exactly the resume-proof shape.
        // (Checkpoint placement was A/B'd in r17 — the session default
        // already lands on tmpfs scratch; an explicit per-query Scratch
        // dir measured identical over 5 reps, so the default stands.)
        checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
      }
    q.awaitTermination()
    // eager copy, then drop the sink's temp view: repeated invocations
    // (bench reps) must not pin every run's full result in the driver
    // forever — the localCheckpoint blocks are context-cleaned once the
    // returned frame is unreferenced, a dropped view never is
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stage the events fixture as `n` parquet files (chunked by
    * event_id mod n) in a fresh per-invocation dir — generic
    * multi-micro-batch staging for streaming twins that need real
    * cross-batch STATE (pair with `maxFilesPerTrigger = 1` so each
    * file is its own AvailableNow micro-batch). Unlike
    * [[streamResumePhases]] there is no checkpoint here; callers get
    * the input dir and own the query lifecycle.
    */
  private[operators] def stageEventChunks(spark: SparkSession, dir: String,
                                          n: Int): String = {
    val base = graft.Scratch.dir("stream-chunks") // tmpfs-backed staging
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(base))
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    val raw = spark.read.schema(Tables.eventsRaw)
      .parquet(s"$dir/events.parquet")
    // chunks staged once per (fixture, n) (r16), copied per invocation
    val parts = stagedChunks(spark, dir, s"stream-chunks-$n", n)(i =>
      raw.filter(pmod(col("event_id"), lit(n)) === i))
    (0 until n).foreach { i =>
      java.nio.file.Files.copy(parts(i),
        java.nio.file.Paths.get(s"$in/c$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    in
  }

  /** Crash-resume drill behind [[qStreamResume]]: stage the events
    * fixture as two parquet files, drain file A through a CHECKPOINTED
    * tumbling aggregation, let the query object die (AvailableNow
    * terminates it — all that survives, as after a real driver crash,
    * is the checkpoint directory), land file B, and start a brand-new
    * query on the same checkpoint. Returns (afterA, afterB) as eager
    * tables.
    *
    * What the checkpoint must carry for afterB to equal the batch
    * answer over the FULL fixture: the file-source log (file A must not
    * be reprocessed — double-counting breaks the hash) and the window
    * state (file A's partial aggregates must survive the restart —
    * losing them breaks the hash the other way). Each invocation
    * stages into a fresh directory: a checkpoint binds to one source
    * history, so reps must never share one.
    */
  private[graft] def streamResumePhases(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // fresh tmpfs-backed dir per invocation: a checkpoint binds to one
    // source history, so reps must never share one
    val base = graft.Scratch.dir("stream-resume")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(base))
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    // halves staged with the RAW schema (long nanos ts) so the streamed
    // read is byte-identical to the fixture path in streamedEvents
    val raw = spark.read.schema(Tables.eventsRaw)
      .parquet(s"$dir/events.parquet")
    // halves staged once per fixture (r16), copied per invocation
    val halves = stagedChunks(spark, dir, "stream-resume", 2)(i =>
      raw.filter(col("event_id") % 2 === i))
    val (pa, pb) = (halves(0), halves(1))
    def drain(): DataFrame = {
      val src = Tables.withEventTs(graft.sources.Ingest.readStreamFiles(
        spark, s"$in/*.parquet", Tables.eventsRaw))
      runStreamToTable(
        graft.streaming.Streams.tumblingCounts(src, watermark = "3650 days"),
        checkpoint = Some(s"$base/ckpt"))
    }
    Files.copy(pa, Paths.get(s"$in/a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val afterA = drain()
    Files.copy(pb, Paths.get(s"$in/b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    (afterA, drain())
  }

  /** Exactly-once across a restart, machine-checked: the resumed
    * query's complete-mode output over (A then B) shares
    * [[qWindowTumbling]]'s batch oracle — green only if the checkpoint
    * restored both source offsets (no A reprocessing) and window state
    * (no A amnesia). StreamingSpec additionally pins the intermediate
    * afterA table to the batch aggregate of file A alone.
    */
  val qStreamResume: QuerySpec = QuerySpec(
    "q_stream_resume",
    qWindowTumbling.oracle,
    (spark, dir) =>
      streamResumePhases(spark, dir)._2.orderBy("w_start", "event_type"))

  /** Interval-range window frame (trailing 30 days per customer). */
  val qWindowRange: QuerySpec = QuerySpec(
    "q_window_range",
    Some("""SELECT o_custkey, o_orderkey,
      CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last30
      FROM orders ORDER BY o_custkey, o_orderkey"""),
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql("""SELECT o_custkey, o_orderkey,
        count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_last30
        FROM orders ORDER BY o_custkey, o_orderkey""")
    })

  /** Hourly OHLC bars per event type — time-series downsampling via
    * arg-min/arg-max aggregates (`min_by`/`max_by`, the §2.4 rows the
    * plain MIN/MAX family doesn't reach): open/close are the values AT
    * the bar's first/last instant, not extremes. One hash aggregation;
    * (event_type, ts) is unique in the fixture so the arg-selectors
    * are deterministic (verified at sf0.01 and sf0.1).
    */
  val qOhlcBars: QuerySpec = QuerySpec(
    "q_ohlc_bars",
    Some("""SELECT event_type, date_trunc('hour', ts) AS bar,
        round(arg_min(value, ts), 4) AS open,
        round(max(value), 4) AS high,
        round(min(value), 4) AS low,
        round(arg_max(value, ts), 4) AS close,
        count(*) AS n,
        round(sum(value), 4) AS volume
      FROM events GROUP BY 1, 2 ORDER BY event_type, bar"""),
    (spark, dir) => {
      Tables.load(spark, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bar"))
        .agg(
          round(min_by(col("value"), col("ts")), 4).as("open"),
          round(max(col("value")), 4).as("high"),
          round(min(col("value")), 4).as("low"),
          round(max_by(col("value"), col("ts")), 4).as("close"),
          count(lit(1)).as("n"),
          round(sum(col("value")), 4).as("volume"))
        .orderBy("event_type", "bar")
    })

  /** Interval-OVERLAP join (both sides are interval sets, NO shared
    * equi key — the genuinely hard temporal join, distinct from
    * [[qIntervalJoin]]'s point-in-interval case): user sessions
    * (30-min gap) × cross-user error storms (10-min gap over the error
    * sub-stream), matched where the intervals intersect.
    *
    * Scale shape: hour-bucket banding turns the theta join into an
    * equi-join — each interval explodes to its covered hour bins, the
    * join keys on the bin, a residual predicate keeps true overlaps,
    * and pairs spanning several shared bins dedupe on the interval
    * identities. Work is O(pairs that share an hour), not
    * |sessions|×|storms|. The storm derivation runs a global lag-gap
    * window over the ERROR SUB-STREAM only — incident-scale by
    * definition (the fleet-wide alert stream, not the corpus); the
    * per-user session side uses the usual keyed window.
    */
  val qIntervalOverlap: QuerySpec = QuerySpec(
    "q_interval_overlap",
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s AS (
        SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM g
      ), sess AS (
        SELECT user_id, min(ts) AS st, max(ts) AS en
        FROM s GROUP BY user_id, seq
      ), er AS (
        SELECT ts, event_id FROM events WHERE event_type = 'error'
      ), g2 AS (
        SELECT ts, event_id,
          CASE WHEN lag(ts) OVER w2 IS NULL
                 OR ts - lag(ts) OVER w2 > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM er WINDOW w2 AS (ORDER BY ts, event_id)
      ), s2 AS (
        SELECT ts, sum(is_new) OVER (ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM g2
      ), storm AS (
        SELECT min(ts) AS sst, max(ts) AS sen FROM s2 GROUP BY seq)
      SELECT sess.user_id, sess.st AS session_start, storm.sst AS storm_start,
        (epoch_us(least(sess.en, storm.sen)) -
         epoch_us(greatest(sess.st, storm.sst))) // 1000000 AS overlap_sec
      FROM sess JOIN storm
        ON sess.st <= storm.sen AND storm.sst <= sess.en
      ORDER BY user_id, session_start, storm_start"""),
    (spark, dir) => {
      val binSeconds = 3600L
      def bin(c: org.apache.spark.sql.Column) =
        (unix_micros(c) / lit(binSeconds * 1000000L)).cast("long")
      val ev = Tables.load(spark, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("seq", sum("is_new").over(run))
        .groupBy("user_id", "seq")
        .agg(min("ts").as("st"), max("ts").as("en"))
      val w2 = Window.orderBy(col("ts"), col("event_id"))
      val run2 = Window.orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val storms = ev.filter(col("event_type") === "error")
        .select("ts", "event_id")
        .withColumn("prev_ts", lag("ts", 1).over(w2))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 10L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("seq", sum("is_new").over(run2))
        .groupBy("seq")
        .agg(min("ts").as("sst"), max("ts").as("sen"))
      val sessBins = sess.withColumn("bin",
        explode(sequence(bin(col("st")), bin(col("en")))))
      val stormBins = storms.withColumn("bin",
        explode(sequence(bin(col("sst")), bin(col("sen")))))
      sessBins.join(stormBins, Seq("bin"))
        .filter(col("st") <= col("sen") && col("sst") <= col("en"))
        .select(col("user_id"), col("st"), col("en"), col("sst"), col("sen"))
        .distinct() // a pair sharing k hour bins must appear once
        .select(col("user_id"), col("st").as("session_start"),
          col("sst").as("storm_start"),
          // integer floor-division on exact microseconds both engines:
          // true division would round vs truncate differently on
          // fractional seconds
          expr("(unix_micros(least(en, sen)) - unix_micros(greatest(st, sst)))" +
            " div 1000000").as("overlap_sec"))
        .orderBy("user_id", "session_start", "storm_start")
    })

  /** OHLC through the STREAMING engine: the same hourly bars as
    * [[qOhlcBars]] computed by watermarked window state with
    * `min_by`/`max_by` aggregates, complete-mode drain — shares the
    * batch twin's oracle (the tenth streaming-engine oracle row).
    * The window's start is the hour truncation, so `bar` aligns with
    * `date_trunc('hour', ts)` exactly.
    */
  val qStreamOhlc: QuerySpec = QuerySpec(
    "q_stream_ohlc",
    qOhlcBars.oracle,
    (spark, dir) => {
      val agg = graft.streaming.Streams.tumblingOhlc(
        streamedEvents(spark, dir), watermark = "3650 days")
      runStreamToTable(agg)
        .select(col("event_type"), col("bar"), col("open"), col("high"),
          col("low"), col("close"), col("n"), col("volume"))
        .orderBy("event_type", "bar")
    })

  /** Z-score anomaly detection per event type: |value − μ_type| >
    * 3σ_type. Group stats come from ONE aggregation joined back
    * (broadcast — |event types| rows), NOT a window partitioned by
    * type: a per-type window puts each type's entire history in one
    * partition, which is exactly the skew a 100 TB event stream
    * cannot afford.
    */
  val qZscoreOutliers: QuerySpec = QuerySpec(
    "q_zscore_outliers",
    Some("""WITH st AS (SELECT event_type, avg(value) AS mu,
        stddev_samp(value) AS sigma FROM events GROUP BY event_type),
      zz AS (
        SELECT e.event_id, e.event_type,
          round((e.value - st.mu) / st.sigma, 6) AS z6
        FROM events e JOIN st USING (event_type))
      SELECT event_id, event_type, round(z6, 4) AS z FROM zz
      WHERE abs(z6) > 3
      ORDER BY event_id"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val st = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
      // z is rounded to 6 dp BEFORE the >3 membership test so both
      // engines decide row membership on the same value — the raw
      // quotient comes from differently-ordered FP summation and a z
      // within an ulp of 3 could otherwise flip the row set.
      ev.join(broadcast(st), "event_type")
        .withColumn("z6", round((col("value") - col("mu")) / col("sigma"), 6))
        .filter(abs(col("z6")) > 3)
        .select(col("event_id"), col("event_type"), round(col("z6"), 4).as("z"))
        .orderBy("event_id")
    })

  /** The exactly-once upsert sink driven END-TO-END by the streaming
    * engine — the 17th streaming oracle row, closing VERDICT r8 item 3:
    * events land as 4 time-ordered file micro-batches, each batch
    * pre-reduces to its latest row per user (max_by on (ts, event_id) —
    * the caller-side reduce the sink contract requires), and
    * [[graft.sources.Ingest.upsertParquet]] MERGEs it into the
    * bucket-scoped versioned table. Because chunks partition by ts
    * RANGE (value-based buckets — equal timestamps can never split)
    * and are staged one-at-a-time with a drain between, "latest batch
    * wins per key" composes with the in-batch argmax to exactly the
    * global argmax — which is the batch MERGE oracle: DuckDB's
    * row_number() latest event per user. The final state is read back
    * through the table's CURRENT snapshot pointer.
    */
  val qStreamUpsert: QuerySpec = QuerySpec(
    "q_stream_upsert",
    Some("""SELECT user_id, ts AS last_ts, event_type AS last_type,
        value AS last_value
      FROM (SELECT user_id, ts, event_type, value, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id"""),
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("stream-upsert") // tmpfs-backed
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val table = s"$base/table"
      val raw = spark.read.schema(Tables.eventsRaw)
        .parquet(s"$dir/events.parquet")
      val n = 4
      val bounds = raw.agg(min("ts"), max("ts")).head() // 2 scalars
      val tmin = bounds.getLong(0)
      val step = (bounds.getLong(1) - tmin) / n + 1 // bucket ∈ [0, n-1]
      def writer(b: DataFrame, id: Long): Unit =
        Ingest.upsertParquet(table, Seq("user_id"), nBuckets = 8)(
          b.groupBy("user_id")
            .agg(max_by(
              struct(col("ts"), col("event_id"), col("event_type"), col("value")),
              struct(col("ts"), col("event_id"))).as("m"))
            .select(col("user_id"), col("m.ts").as("ts"),
              col("m.event_type").as("event_type"), col("m.value").as("value")),
          id)
      val src = graft.sources.Ingest.readStreamFiles(
        spark, s"$in/*.parquet", Tables.eventsRaw, basePath = Some(in))
      // micro-batch jobs are batch-sized, not corpus-sized: run the
      // whole drain (the writer's merge jobs plan per batch, so the
      // conf must hold until the stream stops) at streaming state sizing
      withStreamSizing(spark) {
        val q = Ingest.foreachBatchSink(src, s"$base/ck")(writer).start()
        try (0 until n).foreach { i =>
          val tmp = s"$base/stage_$i"
          raw.filter(expr(s"(ts - ${tmin}L) DIV ${step}L") === i)
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .filter(f => f.getName.startsWith("part-") &&
              f.getName.endsWith(".parquet")).head.toPath
          java.nio.file.Files.copy(part,
            java.nio.file.Paths.get(s"$in/c$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          q.processAllAvailable() // each ts-range chunk is its own batch
        } finally q.stop()
      }
      Tables.withEventTs(Ingest.readUpsertTable(spark, table))
        .select(col("user_id"), col("ts").as("last_ts"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy("user_id")
    })

  /** The upsert sink reached through the REGISTERED format —
    * `writeStream.format("graft")` — composed with a STATEFUL
    * streaming aggregation (the 26th streaming oracle row). The same
    * 4 time-ordered file micro-batches as [[qStreamUpsert]] flow into
    * an update-mode `max_by` aggregation (engine state holds each
    * user's global argmax; each batch emits only the keys whose state
    * changed), and the format sink merges every update as one
    * committed batch whose id IS the micro-batch id — so a replayed
    * batch no-ops off the ledger and the pipeline is exactly-once
    * END-TO-END through stock Spark verbs alone: no foreachBatch, no
    * library call, no caller-side pre-reduce (the agg state already
    * guarantees one row per key per batch). Final snapshot ≡ the
    * global latest-event-per-user recompute — [[qStreamUpsert]]'s
    * oracle, reached by a different engine composition (state-update
    * merge vs per-chunk argmax composition).
    */
  val qStreamSinkFormat: QuerySpec = QuerySpec(
    "q_stream_sink_format",
    qStreamUpsert.oracle,
    (spark, dir) => {
      import graft.sources.Ingest
      val base = graft.Scratch.dir("stream-sink-format") // tmpfs-backed
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(base))
      val in = s"$base/in"
      new java.io.File(in).mkdirs()
      val table = s"$base/table"
      val raw = spark.read.schema(Tables.eventsRaw)
        .parquet(s"$dir/events.parquet")
      val n = 4
      val bounds = raw.agg(min("ts"), max("ts")).head() // 2 scalars
      val tmin = bounds.getLong(0)
      val step = (bounds.getLong(1) - tmin) / n + 1 // bucket ∈ [0, n-1]
      val src = Ingest.readStreamFiles(
        spark, s"$in/*.parquet", Tables.eventsRaw, basePath = Some(in))
      val latest = src.groupBy("user_id")
        .agg(max_by(
          struct(col("ts"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_type").as("event_type"), col("m.value").as("value"))
      withStreamSizing(spark) {
        val q = latest.writeStream.format("graft")
          .option("keys", "user_id").option("buckets", "8")
          .option("checkpointLocation", s"$base/ck")
          .outputMode("update")
          .start(table)
        try (0 until n).foreach { i =>
          val tmp = s"$base/stage_$i"
          raw.filter(expr(s"(ts - ${tmin}L) DIV ${step}L") === i)
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .filter(f => f.getName.startsWith("part-") &&
              f.getName.endsWith(".parquet")).head.toPath
          java.nio.file.Files.copy(part,
            java.nio.file.Paths.get(s"$in/c$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          q.processAllAvailable() // each ts-range chunk is its own batch
        } finally q.stop()
      }
      Tables.withEventTs(spark.read.format("graft").load(table))
        .select(col("user_id"), col("ts").as("last_ts"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy("user_id")
    })

  def specs: Seq[QuerySpec] =
    Seq(qAsofJoin, qAsofForward, qAsofTolerance, qSessionize, qIntervalJoin,
      qDateDensify,
      qWindowTumbling, qStreamTumbling, qStreamSliding, qStreamSession,
      qStreamStateful, qStreamJoin, qStreamJoinOuter, qStreamJoinFull,
      qStreamJoinSemi,
      qStreamDedup, qStreamTyped,
      qStreamEnrich, qWindowRange, qOhlcBars, qIntervalOverlap, qStreamOhlc,
      qZscoreOutliers, qStreamResume, qStreamUpsert, qStreamSinkFormat)
}
