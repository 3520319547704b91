package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over the `events`
  * stream table — the product-analytics queries a deployment of the
  * reference's event-collecting tier runs daily.
  *
  * Scale shape: both are sequences of hash aggregations keyed on
  * `user_id` — no self-joins on the raw event table, no windows over
  * unbounded frames. The funnel's per-step join is user-keyed
  * (aggregated side ≤ one row per user, shrinking per step), so every
  * shuffle after the first moves at most |users| rows, not |events|;
  * at 100 TB of events that is the difference between shuffling the
  * corpus k times and shuffling it once. Retention's two aggregations
  * reuse the same (user) clustering, and the final matrix is
  * |cohorts| × |offsets| — tiny at any scale.
  */
object Funnels {

  /** Ordered funnel: for each step k, the users whose first step-k
    * event at-or-after their step-(k-1) instant exists. Returns the
    * per-user completion instants for the deepest stage reached; the
    * standard "min-scan per stage" formulation (each stage = filter +
    * groupBy-min + user-keyed join, never an event-level self-join).
    *
    * @return one row per user reaching step 1, columns
    *         (userCol, t1..tN nullable timestamps)
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prevT = s"t$i"
      val tK = s"t${i + 1}"
      // step-k events pre-aggregated to ONE row per user (their event
      // times as an array) BEFORE the join: the join is then 1:1
      // user-keyed and every post-step-1 shuffle moves ≤ |users| rows,
      // never |events| (r6 VERDICT: the previous event-level right side
      // made the scaladoc's claim false). The per-user min-candidate
      // can't be a plain scalar — the ≥ prevT cutoff varies per user —
      // so the selection happens after the join as array_min ∘ filter.
      val nextT = events.filter(col(typeCol) === step)
        .groupBy(col(userCol).as("_u"))
        .agg(collect_list(col(tsCol)).as("_ts"))
      acc.join(nextT, acc(userCol) === col("_u"), "left")
        // null prevT (stage not reached) → predicate null → empty
        // filter → array_min null; join miss → null array → null: both
        // match the old min(when(...)) semantics exactly
        .withColumn(tK, array_min(filter(col("_ts"), t => t >= col(prevT))))
        .drop("_u", "_ts")
    }
  }

  /** Funnel counts: users reaching each stage in order. ONE pass over
    * the per-user times (a single agg row unpivoted with `stack`), not
    * one scan per stage.
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, tsCol, typeCol, steps)
    val counts = times.agg(
      count(col("t1")).as("n1"),
      steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}, '$s', n${i + 1}" }
      .mkString(", ")
    counts.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS (step, step_name, n_users)")
  }

  /** Weekly cohort retention: cohort = ISO week of a user's first
    * event; cell (cohort, offset) = distinct users of that cohort
    * active `offset` weeks later.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val weeks = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("week"))
    val cohorts = weeks.groupBy("u").agg(min("week").as("cohort_week"))
    val active = weeks.distinct()
    active.join(cohorts, "u")
      .withColumn("week_offset",
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week"))) /
          (7L * 86400L)).cast("long"))
      // DATE, matching engines whose week-truncation yields a date
      .groupBy(col("cohort_week").cast("date").as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct("u").as("n_users"))
  }

  /** signup → view → click → purchase over the events fixture. */
  val qFunnel: QuerySpec = QuerySpec(
    "q_funnel",
    Some("""WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (
        SELECT s1.user_id, min(e.ts) AS t2
        FROM s1 LEFT JOIN events e
          ON e.user_id = s1.user_id AND e.event_type = 'view'
             AND e.ts >= s1.t1
        GROUP BY s1.user_id),
      s3 AS (
        SELECT s2.user_id, min(e.ts) AS t3
        FROM s2 LEFT JOIN events e
          ON e.user_id = s2.user_id AND e.event_type = 'click'
             AND e.ts >= s2.t2
        GROUP BY s2.user_id),
      s4 AS (
        SELECT s3.user_id, min(e.ts) AS t4
        FROM s3 LEFT JOIN events e
          ON e.user_id = s3.user_id AND e.event_type = 'purchase'
             AND e.ts >= s3.t3
        GROUP BY s3.user_id)
      SELECT * FROM (
        SELECT 1 AS step, 'signup' AS step_name, count(t1) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'view', count(t2) FROM s2
        UNION ALL
        SELECT 3, 'click', count(t3) FROM s3
        UNION ALL
        SELECT 4, 'purchase', count(t4) FROM s4)
      ORDER BY step"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      funnelCounts(ev, "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
        .orderBy("step")
    })

  /** Weekly retention matrix over the events fixture. */
  val qCohortRetention: QuerySpec = QuerySpec(
    "q_cohort_retention",
    Some("""WITH weeks AS (
        SELECT user_id AS u, date_trunc('week', ts) AS week FROM events),
      cohorts AS (
        SELECT u, min(week) AS cohort_week FROM weeks GROUP BY u),
      active AS (SELECT DISTINCT u, week FROM weeks)
      SELECT c.cohort_week,
        CAST((epoch(a.week) - epoch(c.cohort_week)) / (7 * 86400) AS BIGINT)
          AS week_offset,
        count(DISTINCT a.u) AS n_users
      FROM active a JOIN cohorts c ON a.u = c.u
      GROUP BY 1, 2
      ORDER BY cohort_week, week_offset"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      cohortRetention(ev, "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    })

  /** Event-transition matrix (first-order Markov view of user journeys):
    * per-user next-event pairs counted into (from, to, n, p) — the
    * product-analytics companion to the funnel, without its fixed step
    * order. The lead window partitions per user (bounded by one user's
    * history — the standard event-window skew posture); the transition
    * counts are a hash agg on (from, to), |event types|² rows; the
    * per-from totals broadcast back. p is an exact rational (count ÷
    * count), so membership and values are deterministic cross-engine.
    */
  val qEventTransitions: QuerySpec = QuerySpec(
    "q_event_transitions",
    Some("""WITH s AS (SELECT user_id, event_type,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS next_type
      FROM events),
      c AS (SELECT event_type, next_type, count(*) AS n FROM s
            WHERE next_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
      SELECT c.event_type, c.next_type, c.n,
        round(CAST(c.n AS DOUBLE) / t.tot, 4) AS p
      FROM c JOIN t USING (event_type)
      ORDER BY event_type, next_type"""),
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val c = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          lead("event_type", 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
      val t = c.groupBy("event_type").agg(sum("n").as("tot"))
      c.join(broadcast(t), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 4).as("p"))
        .orderBy("event_type", "next_type")
    })

  /** Two-proportion A/B test: users split by hash parity (user_id % 2),
    * conversion = "made a purchase over 150", pooled two-proportion
    * z-statistic. Every input to the z formula is an exact integer
    * (per-group user and converter counts), and the formula is written
    * with the IDENTICAL operation order in both engines — divisions,
    * one multiply chain, one sqrt (correctly rounded per IEEE-754) — so
    * the unrounded double matches bitwise before the 4 dp round.
    *
    * Scale shape: one scan → per-user hash agg (conversion flags fold
    * map-side) → a 2-row group agg → single-row conditional-agg pivot.
    * Nothing wider than |users| ever shuffles; output is one row.
    */
  val qAbTest: QuerySpec = QuerySpec(
    "q_ab_test",
    Some("""WITH u AS (SELECT user_id, user_id % 2 AS grp,
        max(CASE WHEN event_type = 'purchase' AND value > 150
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2),
      g AS (SELECT
        sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
        sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS conv_a,
        sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
        sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS conv_b
      FROM u)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
        CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
        round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
        round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
        round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
          / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
            * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
            * (1.0 / n_a + 1.0 / n_b)), 4) AS z
      FROM g"""),
    (spark, dir) => {
      val u = Tables.load(spark, dir, "events")
        .groupBy(col("user_id"), (col("user_id") % 2).as("grp"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 150, 1).otherwise(0)).as("conv"))
      abStats(u)
    })

  /** Pooled two-proportion z over per-unit (grp ∈ {0,1}, conv ∈ {0,1})
    * assignments; see qAbTest for the cross-engine FP argument. */
  def abStats(users: DataFrame): DataFrame = {
    val g = users.agg(
      sum(when(col("grp") === 0, 1).otherwise(0)).as("n_a"),
      sum(when(col("grp") === 0, col("conv")).otherwise(0)).as("conv_a"),
      sum(when(col("grp") === 1, 1).otherwise(0)).as("n_b"),
      sum(when(col("grp") === 1, col("conv")).otherwise(0)).as("conv_b"))
    val p = col("conv_a").cast("double") / col("n_a")
    val q = col("conv_b").cast("double") / col("n_b")
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    g.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(p, 6).as("rate_a"), round(q, 6).as("rate_b"),
      round((p - q) / sqrt(pool * (lit(1.0) - pool) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4).as("z"))
  }

  /** Marketing attribution for each purchase: LAST-TOUCH (most recent
    * click by the user at or before the purchase — the as-of backward
    * join, reusing [[EventOps.asOfJoin]]'s single-shuffle union+window
    * machinery) and FIRST-TOUCH (the user's first signup ever, one row
    * per user via a rank-1 window, broadcast-joined back). Clicks are
    * deduped to one per (user, ts) with a max-event_id tie-break and
    * the first-signup rank orders by (ts, event_id) — every tie is
    * broken identically in both engines.
    *
    * Scale shape: the as-of side is one shuffle on user_id (no range
    * join); first-touch is one user-keyed hash agg joined back — at
    * 100 TB both move |events of the named types| once, and the window
    * partitions per user.
    */
  val qAttribution: QuerySpec = QuerySpec(
    "q_attribution",
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, max(event_id) AS cid FROM events
        WHERE event_type = 'click' GROUP BY user_id, ts),
      s AS (SELECT user_id, event_id AS sid, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS rk
        FROM events WHERE event_type = 'signup')
      SELECT p.event_id AS purchase_id, p.user_id,
        lc.cid AS last_click_id, fs.sid AS first_signup_id
      FROM p
      ASOF LEFT JOIN c lc ON p.user_id = lc.user_id AND lc.ts <= p.ts
      LEFT JOIN (SELECT user_id, sid FROM s WHERE rk = 1) fs
        ON p.user_id = fs.user_id
      ORDER BY purchase_id"""),
    (spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("last_click_id"))
      val sw = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val firstSignup = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("first_signup_id"),
          row_number().over(sw).as("rk"))
        .filter(col("rk") === 1).drop("rk")
      EventOps.asOfJoin(purchases, clicks, "user_id", "ts", "last_click_id")
        .join(firstSignup, Seq("user_id"), "left")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_click_id"), col("first_signup_id"))
        .orderBy("purchase_id")
    })

  /** RFM segmentation: per-customer Recency (days from last order to
    * the corpus max order date), Frequency (order count), Monetary
    * (exact cents), each bucketed into quintiles with ntile(5). Every
    * ntile ORDER BY ends in c_custkey, so bucket assignment is a total
    * order — deterministic cross-engine (both engines share ntile's
    * equal-division semantics). Recency quintiles order DESC (most
    * recent = bucket 5, the conventional "5 is best" scoring).
    *
    * Scale: the per-customer rollup is one orders-keyed hash agg; the
    * ntile windows are global over |customers| rows — fine while the
    * segmentation table is summary-sized; at billions of customers the
    * two-pass distribution rewrite (q_window_dist_twopass) replaces
    * each ntile with a broadcast quantile lookup, same output contract.
    */
  val qRfmSegments: QuerySpec = QuerySpec(
    "q_rfm_segments",
    Some("""WITH cs AS (SELECT o_custkey,
        date_diff('day', max(o_orderdate),
          (SELECT max(o_orderdate) FROM orders)) AS rec_days,
        count(*) AS freq,
        sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey)
      SELECT o_custkey, rec_days, freq,
        CAST(cents AS DOUBLE) / 100 AS monetary,
        ntile(5) OVER (ORDER BY rec_days DESC, o_custkey) AS r_score,
        ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
        ntile(5) OVER (ORDER BY cents, o_custkey) AS m_score
      FROM cs ORDER BY o_custkey"""),
    (spark, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val orders = Tables.load(spark, dir, "orders")
      val maxDate = orders.agg(max("o_orderdate").as("mx"))
      val cs = orders
        .select(col("o_custkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100, 0).cast("long").as("c100"))
        .groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_order"),
          count(lit(1)).as("freq"), sum("c100").as("cents"))
        .crossJoin(broadcast(maxDate))
        .select(col("o_custkey"),
          datediff(col("mx"), col("last_order")).as("rec_days"),
          col("freq"), col("cents"))
      cs.select(col("o_custkey"), col("rec_days"), col("freq"),
          (col("cents").cast("double") / 100).as("monetary"),
          ntile(5).over(W.orderBy(col("rec_days").desc, col("o_custkey")))
            .as("r_score"),
          ntile(5).over(W.orderBy(col("freq"), col("o_custkey")))
            .as("f_score"),
          ntile(5).over(W.orderBy(col("cents"), col("o_custkey")))
            .as("m_score"))
        .orderBy("o_custkey")
    })

  def specs: Seq[QuerySpec] =
    Seq(qFunnel, qCohortRetention, qEventTransitions, qAbTest, qAttribution,
      qRfmSegments)
}
