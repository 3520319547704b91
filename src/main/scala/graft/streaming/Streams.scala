package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Output row of [[Streams.runningUserTotals]]. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Output row of [[Streams.typedEventCounts]]. */
case class TypedCount(user_id: Long, event_type: String, n: Long)

/** Full-row changelog image for [[Streams.cdcLatestState]]. */
case class CdcRow(o_custkey: Long, o_orderdate: java.sql.Timestamp,
                  o_orderkey: Long, o_totalprice: Double,
                  o_orderpriority: String, op: String)

/** transformWithState processor (Spark 4 stateful API): running count
  * per (user, event_type). ValueState lives in the configured state
  * store — RocksDB in production — and supports TTL (`TTLConfig`)
  * for bounded state without watermark gymnastics.
  */
class EventTypeCounter
    extends StatefulProcessor[(Long, String), (Long, String), TypedCount] {
  @transient private var n: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: (Long, String),
                               rows: Iterator[(Long, String)],
                               timerValues: TimerValues): Iterator[TypedCount] = {
    val c = (if (n.exists()) n.get() else 0L) + rows.size
    n.update(c)
    Iterator(TypedCount(key._1, key._2, c))
  }
}

/** Structured-Streaming transforms (SURVEY.md §2.9) — the streaming
  * counterpart of the reference tier's ingest path, north-star
  * "Structured Streaming + DataFrame ETL".
  *
  * Each transform takes a (possibly streaming) events-shaped DataFrame
  * (`event_id, ts timestamp, user_id, event_type, value, props`) and
  * returns a streaming-safe plan: watermarked, append-mode-compatible
  * aggregations. StreamingSpec drives them with MemoryStream and
  * asserts parity with the batch equivalents in operators.EventOps.
  *
  * Scale notes: all state here is watermark-bounded — windows expire and
  * dedup keys are dropped past the watermark (`dropDuplicatesWithinWatermark`,
  * never unbounded `dropDuplicates`), so state size is O(traffic within
  * the lateness horizon), not O(history). At 100 TB/day that's the
  * difference between a working job and an OOM-ing one; pair with the
  * RocksDB state store (`spark.sql.streaming.stateStore.providerClass`)
  * in cluster conf.
  */
object Streams {

  /** Tumbling event-time window aggregate with late-data drop. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Hourly OHLC bars per event type through the streaming engine —
    * arg-min/max aggregates (`min_by`/`max_by`) inside watermarked
    * window state, the streaming twin of `EventOps.qOhlcBars`.
    */
  def tumblingOhlc(events: DataFrame, window_ : String = "1 hour",
                   watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        round(min_by(col("value"), col("ts")), 4).as("open"),
        round(max(col("value")), 4).as("high"),
        round(min(col("value")), 4).as("low"),
        round(max_by(col("value"), col("ts")), 4).as("close"),
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("volume"))
      .select(col("window.start").as("bar"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("n"), col("volume"))

  /** Sliding window (length, slide) per event_type. */
  def slidingCounts(events: DataFrame, length: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
              col("event_type"), col("n"))

  /** Session windows (gap-based), per user. Streaming-native form of
    * EventOps.qSessionize.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Streaming dedup by key (default event_id), state bounded by the
    * watermark.
    */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes",
                           keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment: join the stream against a broadcast-able
    * dimension (e.g. customer) — no streaming state at all.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
             dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Stream-stream join (§2.9): for each error event, purchases by the
    * same user in the preceding hour. Both sides watermarked; the time
    * bound lets Spark expire join state — without it state grows
    * unboundedly. Inner join + append mode.
    */
  def errorsWithRecentPurchases(events: DataFrame,
                                watermark: String = "10 minutes"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
              col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
              col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    errors.join(purchases,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") <= col("error_ts") &&
      col("purchase_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR"))
      .select("error_id", "user_id", "error_ts", "purchase_id", "purchase_ts")
  }

  /** LEFT OUTER stream-stream variant of [[errorsWithRecentPurchases]]:
    * errors with no purchase in the preceding hour emit a null-extended
    * row — but only once the watermark passes the point where a match
    * is still possible (purchase_ts ≤ error_ts, so watermark > error_ts
    * suffices). Unlike the inner join, the watermark here must be REAL
    * (small): outer state flushes on watermark advance, never at query
    * stop, so a fixture-spanning watermark would hold every unmatched
    * row hostage. Callers therefore compare only rows older than the
    * final watermark minus the join bound (see qStreamJoinOuter).
    */
  def errorsWithRecentPurchasesOuter(events: DataFrame,
                                     watermark: String,
                                     joinType: String = "left_outer"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
              col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
              col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    errors.join(purchases,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") <= col("error_ts") &&
      col("purchase_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      // full outer: right-only rows have a null user_id from the left
      // side — coalesce in the side-independent key, keeping the same
      // column order as the inner variant so positional consumers see
      // one layout across all join modes
      .select(col("error_id"),
        coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("error_ts"), col("purchase_id"), col("purchase_ts"))
  }

  /** LEFT SEMI stream-stream join — the last join mode the streaming
    * engine supports, and the screening shape (EXISTS, not enrich):
    * errors that saw at least one same-user purchase in the preceding
    * hour, each emitted AT MOST ONCE. Emission is on the MATCH path
    * only — a left row leaves state the moment its first match arrives
    * (or silently at watermark eviction if none ever does) — so unlike
    * the outer modes the drained result is watermark-complete without
    * a cutoff contract: there is no null-extension waiting on the
    * watermark. The time bound still sizes state eviction both ways.
    */
  def errorsWithPurchaseSemi(events: DataFrame,
                             watermark: String): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
              col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
              col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    errors.join(purchases,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") <= col("error_ts") &&
      col("purchase_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR"),
      "left_semi")
  }

  /** Spark-4-native stateful op (§2.9): transformWithState with typed
    * ValueState per (user, event_type). Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — set it on the session
    * before starting the query.
    */
  def typedEventCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(identity)
      .transformWithState(new EventTypeCounter,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Arbitrary stateful op (§2.9): per-user running (count, total) via
    * flatMapGroupsWithState — emits an updated row per user per
    * micro-batch. State is two numbers per key; for unbounded key
    * domains pair with a timeout (`EventTimeTimeout`) and the RocksDB
    * state store in cluster conf.
    */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserTotals](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (c, t) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => c += 1; t += r._2 }
          state.update((c, t))
          Iterator(UserTotals(uid, c, t))
      }
      .toDF()
  }

  /** Streaming CDC apply (§2.9 × warehouse maintenance): the changelog
    * arrives as a stream and per-key state holds the current winner —
    * the latest full-row image by (o_orderdate, o_orderkey), tombstones
    * included (a delete must be able to overwrite an earlier upsert).
    * Emits the winner per key per micro-batch (update mode); the sink's
    * final emission per key IS the compacted snapshot, which is what
    * the batch `Changes.cdcApply` oracle checks. State: one row per
    * live key — the minimum any upsert-materialization holds; pair with
    * RocksDB + timeouts for unbounded key domains.
    */
  def cdcLatestState(changelog: DataFrame): DataFrame = {
    val spark = changelog.sparkSession
    import spark.implicits._
    changelog
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderpriority"), col("op"))
      .as[CdcRow]
      .groupByKey(_.o_custkey)
      .flatMapGroupsWithState[CdcRow, CdcRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[CdcRow], state: GroupState[CdcRow]) =>
          var cur = state.getOption.orNull
          rows.foreach { r =>
            if (cur == null ||
                r.o_orderdate.compareTo(cur.o_orderdate) > 0 ||
                (r.o_orderdate.compareTo(cur.o_orderdate) == 0 &&
                  r.o_orderkey > cur.o_orderkey)) cur = r
          }
          state.update(cur)
          Iterator(cur)
      }
      .toDF()
  }
}
