package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.1–§2.7).
  *
  * The reference provisions a MySQL 5.6 relational tier
  * (`mysql-persistent-template.json:68`); this module re-expresses that
  * query surface on the DataFrame API so Catalyst plans it (predicate
  * pushdown, column pruning, broadcast vs shuffle joins, partial aggs,
  * AQE) — nothing here hand-schedules execution.
  *
  * Scale notes (100 TB design point):
  *  - dimension joins (`region`, `nation`) are explicitly `broadcast()`;
  *    fact-fact joins are left to AQE which picks SMJ + skew splitting;
  *  - every aggregate is a `groupBy.agg` → partial (map-side) + final
  *    HashAggregate, one shuffle on the group keys;
  *  - top-k uses orderBy+limit → `TakeOrderedAndProject` (no global sort
  *    materialization).
  */
object Relational {

  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s))

  /** Revenue expression used by the TPC-H-ish queries. */
  private val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // --- §2.4 aggregation: TPC-H Q1 analogue (scan → filter → hash agg) ---
  val q1PricingSummary: QuerySpec = QuerySpec(
    "q1_pricing_summary",
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),2) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_base_price,
      round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      round(avg(l_quantity),4) AS avg_qty,
      round(avg(l_extendedprice),4) AS avg_price,
      round(avg(l_discount),4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
    (spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2000-12-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(sum(revenue * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })

  // --- §2.3 + §2.6: join → agg → top-k (TPC-H Q3 analogue) ---
  val q3ShippingPriority: QuerySpec = QuerySpec(
    "q3_shipping_priority",
    Some("""SELECT o.o_orderkey, round(sum(l.l_extendedprice*(1-l.l_discount)),2) AS revenue,
      o.o_orderdate, o.o_orderpriority
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
    (spark, dir) => {
      val cust = Tables.load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") < ts("1999-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1999-01-01 00:00:00"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(revenue), 2).as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    })

  // --- §2.3 multi-way star join (TPC-H Q5 analogue; the flagship) ---
  val q5RegionRevenue: QuerySpec = QuerySpec(
    "q5_region_revenue",
    Some("""SELECT n.n_name, round(sum(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
      FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE r.r_name IN ('ASIA','EUROPE')
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY n.n_name ORDER BY revenue DESC, n_name"""),
    (spark, dir) => {
      val region = Tables.load(spark, dir, "region")
        .filter(col("r_name").isin("ASIA", "EUROPE")).select("r_regionkey")
      val nation = Tables.load(spark, dir, "nation")
      val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                col("o_orderdate") < ts("1999-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // Tiny dims broadcast explicitly; lineitem⋈orders is the only
      // genuinely large join and AQE handles its strategy/skew.
      val dim = cust
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(round(sum(revenue), 2).as("revenue"))
        .select("n_name", "revenue")
        .orderBy(col("revenue").desc, col("n_name"))
    })

  // --- §2.2 filters: BETWEEN / IN / LIKE / RLIKE / null logic ---
  val qFilterPredicates: QuerySpec = QuerySpec(
    "q_filter_predicates",
    Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      FROM part
      WHERE p_size BETWEEN 10 AND 30
        AND p_brand IN ('Brand#1','Brand#12','Brand#23','Brand#34','Brand#45')
        AND p_type NOT LIKE '%ECONOMY%'
        AND regexp_matches(p_type, '^(LARGE|SMALL)')
        AND p_retailprice IS NOT NULL
      ORDER BY p_partkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "part")
        .filter(col("p_size").between(10, 30))
        .filter(col("p_brand").isin("Brand#1", "Brand#12", "Brand#23", "Brand#34", "Brand#45"))
        .filter(!col("p_type").like("%ECONOMY%"))
        .filter(col("p_type").rlike("^(LARGE|SMALL)"))
        .filter(col("p_retailprice").isNotNull)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .orderBy("p_partkey")
    })

  // --- §2.3 left outer join (orders with zero lineitems kept) ---
  val qJoinLeft: QuerySpec = QuerySpec(
    "q_join_left",
    Some("""SELECT o.o_orderkey, o.o_orderstatus,
      count(l.l_orderkey) AS n_items,
      round(coalesce(sum(l.l_quantity), 0), 2) AS total_qty
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderstatus ORDER BY o_orderkey"""),
    (spark, dir) => {
      val ord = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderstatus")
      val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      ord.join(li, col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(count(col("l_orderkey")).as("n_items"),
             round(coalesce(sum("l_quantity"), lit(0.0)), 2).as("total_qty"))
        .orderBy("o_orderkey")
    })

  // --- §2.3 right outer join ---
  val qJoinRight: QuerySpec = QuerySpec(
    "q_join_right",
    Some("""SELECT n.n_nationkey, n.n_name, CAST(count(s.s_suppkey) AS BIGINT) AS n_supp
      FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_nationkey, n.n_name ORDER BY n_nationkey"""),
    (spark, dir) => {
      val s = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = Tables.load(spark, dir, "nation")
      s.join(n, col("s_nationkey") === col("n_nationkey"), "right")
        .groupBy("n_nationkey", "n_name")
        .agg(count(col("s_suppkey")).as("n_supp"))
        .orderBy("n_nationkey")
    })

  // --- §2.3 full outer join (absent in MySQL 5.6 — free in Spark) ---
  val qJoinFull: QuerySpec = QuerySpec(
    "q_join_full",
    Some("""SELECT coalesce(s.nk, c.nk) AS nationkey,
      coalesce(s.n_supp, 0) AS n_supp, coalesce(c.n_cust, 0) AS n_cust
      FROM (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      FULL OUTER JOIN (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
      ON s.nk = c.nk ORDER BY nationkey"""),
    (spark, dir) => {
      val s = Tables.load(spark, dir, "supplier")
        .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
      val c = Tables.load(spark, dir, "customer")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
      s.join(c, col("s_nationkey") === col("c_nationkey"), "full")
        .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
                coalesce(col("n_supp"), lit(0L)).as("n_supp"),
                coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nationkey")
    })

  // --- §2.3 semi join (IN/EXISTS rewrite surface) ---
  val qJoinSemi: QuerySpec = QuerySpec(
    "q_join_semi",
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      ORDER BY c_custkey"""),
    (spark, dir) => {
      val cust = Tables.load(spark, dir, "customer")
      val big = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 450000).select("o_custkey")
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    })

  // --- §2.3 anti join (NOT EXISTS) ---
  val qJoinAnti: QuerySpec = QuerySpec(
    "q_join_anti",
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      ORDER BY o_orderkey"""),
    (spark, dir) => {
      val ord = Tables.load(spark, dir, "orders")
      val li = Tables.load(spark, dir, "lineitem").select("l_orderkey")
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    })

  // --- §2.3 cross join ---
  val qJoinCross: QuerySpec = QuerySpec(
    "q_join_cross",
    Some("""SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
      ORDER BY r1, r2"""),
    (spark, dir) => {
      val r = Tables.load(spark, dir, "region")
      r.select(col("r_name").as("r1"))
        .crossJoin(r.select(col("r_name").as("r2")))
        .orderBy("r1", "r2")
    })

  // --- §2.3 theta (non-equi) self join ---
  val qJoinTheta: QuerySpec = QuerySpec(
    "q_join_theta",
    Some("""SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS rkey
      FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      ORDER BY n1, n2"""),
    (spark, dir) => {
      val n = Tables.load(spark, dir, "nation")
      n.as("a").join(n.as("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
        .select(col("a.n_name").as("n1"), col("b.n_name").as("n2"),
                col("a.n_regionkey").as("rkey"))
        .orderBy("n1", "n2")
    })

  // --- §2.5 ranking windows ---
  val qWindowRank: QuerySpec = QuerySpec(
    "q_window_rank",
    Some("""SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER w AS rn,
          rank()       OVER w2 AS rk,
          dense_rank() OVER w2 AS drk
        FROM orders
        WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
               w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
      ) WHERE rn <= 3 ORDER BY o_custkey, rn"""),
    (spark, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val w2 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
      Tables.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(w).as("rn"),
                rank().over(w2).as("rk"),
                dense_rank().over(w2).as("drk"),
                col("o_orderpriority"))
        .filter(col("rn") <= 3)
        .drop("o_orderpriority")
        .orderBy("o_custkey", "rn")
    })

  // --- §2.5 frames: running sum + lag/lead ---
  val qWindowRunning: QuerySpec = QuerySpec(
    "q_window_running",
    Some("""SELECT o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
      lag(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_key,
      lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key
      FROM orders ORDER BY o_custkey, o_orderkey"""),
    (spark, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("run_total"),
          lag("o_orderkey", 1).over(w).as("prev_key"),
          lead("o_orderkey", 1).over(w).as("next_key"))
        .orderBy("o_custkey", "o_orderkey")
    })

  // --- §2.4 ROLLUP (MySQL's only grouping-set form) + grouping() ---
  val qRollup: QuerySpec = QuerySpec(
    "q_rollup",
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      CAST(grouping(o_orderstatus) AS INT) AS g_status,
      CAST(grouping(o_orderpriority) AS INT) AS g_priority,
      count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(grouping("o_orderstatus").cast("int").as("g_status"),
             grouping("o_orderpriority").cast("int").as("g_priority"),
             count(lit(1)).as("n"),
             round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("g_status"), col("g_priority"), col("n"), col("total"))
        .orderBy("status", "priority")
    })

  // --- §2.4 CUBE (beyond MySQL — free in Spark/DuckDB) ---
  val qCube: QuerySpec = QuerySpec(
    "q_cube",
    Some("""SELECT coalesce(l_returnflag, '*') AS rflag,
      coalesce(l_linestatus, '*') AS lstatus,
      count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY rflag, lstatus"""),
    (spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("*")).as("rflag"),
                coalesce(col("l_linestatus"), lit("*")).as("lstatus"),
                col("n"), col("qty"))
        .orderBy("rflag", "lstatus")
    })

  // --- §2.4 DISTINCT aggregates ---
  val qDistinctAgg: QuerySpec = QuerySpec(
    "q_distinct_agg",
    Some("""SELECT l_returnflag,
      count(DISTINCT l_suppkey) AS n_supp,
      count(DISTINCT l_partkey) AS n_part,
      round(CAST(sum(DISTINCT l_quantity) AS DOUBLE), 2) AS sum_dist_qty,
      count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_supp"),
             countDistinct("l_partkey").as("n_part"),
             round(sum_distinct(col("l_quantity")), 2).as("sum_dist_qty"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    })

  // --- §2.4 HAVING ---
  val qHaving: QuerySpec = QuerySpec(
    "q_having",
    Some("""SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")
    })

  // --- §2.7 set operations ---
  val qUnionAll: QuerySpec = QuerySpec(
    "q_union_all",
    Some("""SELECT 'cust' AS src, c_nationkey AS nkey FROM customer
      UNION ALL SELECT 'supp' AS src, s_nationkey AS nkey FROM supplier
      ORDER BY src, nkey"""),
    (spark, dir) => {
      val c = Tables.load(spark, dir, "customer")
        .select(lit("cust").as("src"), col("c_nationkey").as("nkey"))
      val s = Tables.load(spark, dir, "supplier")
        .select(lit("supp").as("src"), col("s_nationkey").as("nkey"))
      c.union(s).orderBy("src", "nkey")
    })

  val qIntersect: QuerySpec = QuerySpec(
    "q_intersect",
    Some("""SELECT c_nationkey AS nkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY nkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nkey"))
        .intersect(Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nkey")))
        .orderBy("nkey")
    })

  val qExcept: QuerySpec = QuerySpec(
    "q_except",
    Some("""SELECT c_nationkey AS nkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier ORDER BY nkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nkey"))
        .except(Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nkey")))
        .orderBy("nkey")
    })

  // --- §2.6 top-k (TakeOrderedAndProject — no global sort at scale) ---
  val qTopK: QuerySpec = QuerySpec(
    "q_topk",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    })

  // --- §2.6 LIMIT/OFFSET ---
  val qLimitOffset: QuerySpec = QuerySpec(
    "q_limit_offset",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 50 OFFSET 100"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100).limit(50)
    })

  /** TPC-H Q21-shaped CBO stress (VERDICT r3 item 6): suppliers who were
    * the SOLE late supplier on a multi-supplier finished order — adapted
    * to this fixture's columns ("late" = shipped &gt; 60 days after the
    * order date; classic Q21 uses receipt vs commit dates the fixture
    * lacks). Six logical relations: lineitem three times (base + the
    * EXISTS other-supplier probe + the NOT EXISTS other-late-supplier
    * probe, both as explicit semi/anti joins on l_orderkey), orders
    * (selective status filter), supplier, nation. The optimizer has real
    * decisions to make — which lineitem join runs first, what broadcasts
    * — and PlanSpec guards the shape (dims broadcast, self-joins keyed on
    * l_orderkey, no cartesian); correctness is DuckDB's EXISTS/NOT
    * EXISTS evaluation of the same predicate.
    */
  val qJoinWaiting: QuerySpec = QuerySpec(
    "q_join_waiting",
    Some("""SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
      WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s.s_name
      ORDER BY numwait DESC, s_name LIMIT 20"""),
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
      // base: this supplier's late lineitems on finished orders (the
      // o_orderdate column rides along so both probes below can reuse it)
      val l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
      // someone ELSE supplied the same order (semi), and nobody else was
      // late on it (anti — the condition correlates l3 against the outer
      // row's o_orderdate, exactly the SQL NOT EXISTS)
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("ship3"))
      l1.join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3")
          && col("ship3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .join(Tables.load(spark, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(spark, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    })

  /** TPC-H Q17-shaped correlated-AGGREGATE subquery stress (r6 VERDICT
    * item 6): per-brand revenue from small-quantity lineitems, where
    * "small" is `l_quantity < 0.2 × avg(l_quantity) OF THAT PART` — the
    * correlated scalar aggregate that a naive engine evaluates once per
    * outer row. The DSL builds the decorrelated form a 100 TB plan
    * needs explicitly: prune lineitem to qualifying parts (broadcast
    * semi — part is the dimension), ONE part-keyed hash agg for the
    * thresholds, one part-keyed join back; lineitem is never scanned
    * per-row and never joined to itself unkeyed. The SQL twin
    * ([[SqlEntry.qQtyBelowAvgSql]]) runs the subquery TEXT through
    * Catalyst's decorrelation and must land on the same shape (PlanSpec
    * guards: exactly one join of two lineitem-rooted subtrees, keyed on
    * l_partkey, no cartesian).
    *
    * Membership determinism: l_quantity is integer-valued, so the
    * per-part avg is exact-rational in double (exact sum / exact count,
    * one division, one multiply by 0.2) — identical in both engines; no
    * rounding needed before the &lt; compare.
    */
  val qQtyBelowAvg: QuerySpec = QuerySpec(
    "q_qty_below_avg",
    Some("""SELECT p.p_brand, count(*) AS n_below,
        round(sum(l.l_extendedprice), 2) AS revenue_below
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size < 10
        AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p.p_brand
      ORDER BY p.p_brand"""),
    (spark, dir) => {
      val pt = Tables.load(spark, dir, "part")
        .filter(col("p_size") < 10)
        .select("p_partkey", "p_brand")
      // restrict lineitem ONCE to parts of interest: the threshold agg
      // and the probe both shrink; the avg is per part, so pruning whole
      // parts cannot change any retained part's threshold
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(pt).select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
      val thr = li.groupBy("l_partkey")
        .agg((avg("l_quantity") * 0.2).as("small_thr"))
        .withColumnRenamed("l_partkey", "t_partkey")
      li.join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("small_thr"))
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_below"),
          round(sum("l_extendedprice"), 2).as("revenue_below"))
        .orderBy("p_brand")
    })

  /** TPC-H Q15-shaped "equal to the max of an aggregate" subquery: the
    * top supplier(s) by revenue over a ship-date quarter, where the
    * comparison value is itself an aggregate over the SAME derived
    * table. The derived revenue table is computed ONCE (one hash agg
    * over the date-pruned lineitem scan) and reused for both sides —
    * its max is a one-row aggregate broadcast back, never a re-scan and
    * never a per-row subquery. Revenue is rounded to 4 dp BEFORE the
    * equality compare, so tie membership is decided on identical values
    * in both engines (the raw sums come from differently-ordered FP
    * summation).
    */
  val qTopSupplier: QuerySpec = QuerySpec(
    "q_top_supplier",
    Some("""WITH revenue AS (SELECT l_suppkey AS supplier_no,
        round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""),
    (spark, dir) => {
      val rev = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("total_revenue"))
      val mx = rev.agg(max("total_revenue").as("mr"))
      rev.join(broadcast(mx), col("total_revenue") === col("mr"))
        .join(Tables.load(spark, dir, "supplier"),
          col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    })

  /** TPC-H Q22-shaped stress (adapted: this fixture's customer has no
    * phone, so nationkey plays the country code, and every customer has
    * SOME order, so the NOT EXISTS is scoped to urgent orders):
    * positive-balance customers ABOVE the cohort's average balance who
    * never placed a '1-URGENT' order, counted per nation. Exercises the
    * remaining subquery combination — an UNCORRELATED scalar aggregate
    * feeding a filter (broadcast one-row join, never per-row) PLUS a
    * filtered NOT EXISTS decorrelated to a left-anti join on o_custkey.
    * The avg is rounded to 6 dp before the &gt; compare so both engines
    * admit the same customer set.
    */
  val qIdleRich: QuerySpec = QuerySpec(
    "q_idle_rich",
    Some("""SELECT c_nationkey AS cntry, count(*) AS numcust,
        round(sum(c_acctbal), 4) AS totacctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9)
        AND c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9))
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey ORDER BY cntry"""),
    (spark, dir) => {
      val nations = Seq(1, 3, 5, 7, 9)
      val cust = Tables.load(spark, dir, "customer")
        .filter(col("c_nationkey").isin(nations: _*))
      val thr = cust.filter(col("c_acctbal") > 0.0)
        .agg(round(avg("c_acctbal"), 6).as("thr"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(Tables.load(spark, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 4).as("totacctbal"))
        .orderBy("cntry")
    })

  /** TPC-H Q2-shaped correlated-MIN-over-a-multi-join (VERDICT r7 item
    * 2; adapted — the fixture has no partsupp, so the (part, supplier)
    * offer table is DERIVED: min unit price per pair from lineitem):
    * for small parts, the ASIA supplier(s) whose unit cost equals the
    * part's minimum unit cost among ASIA suppliers. The correlated
    * scalar-min subquery's inner side is itself a multi-join
    * (offers ⋈ supplier ⋈ nation ⋈ region) — the shape that forces an
    * optimizer to decorrelate into ONE per-part aggregate over the
    * joined inner, not a per-row re-plan.
    *
    * The DSL builds that target shape directly: the ASIA supplier set
    * is a broadcast dim (supplier ⋈ nation ⋈ region, dims all tiny);
    * offers are ONE (part, supplier)-keyed hash agg over lineitem,
    * semi-pruned to qualifying parts and ASIA suppliers BEFORE the
    * per-part min (pruning whole parts/suppliers cannot change a
    * retained part's min); the min is a part-keyed agg joined back on
    * (partkey, cost = min). Membership determinism: unit_cost is ONE
    * IEEE division, min picks an exact member, equality compares
    * identical bit patterns in both engines.
    */
  val qMinCostSupp: QuerySpec = QuerySpec(
    "q_min_cost_supp",
    Some("""WITH ps AS (SELECT l_partkey, l_suppkey,
        min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
      asia AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
      SELECT a.s_acctbal, a.s_name, a.n_name, p.p_partkey, p.p_brand,
        a.s_suppkey, ps.unit_cost
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN asia a ON a.s_suppkey = ps.l_suppkey
      WHERE p.p_size < 5
        AND ps.unit_cost = (SELECT min(ps2.unit_cost)
          FROM ps ps2 JOIN asia a2 ON a2.s_suppkey = ps2.l_suppkey
          WHERE ps2.l_partkey = p.p_partkey)
      ORDER BY a.s_acctbal DESC, a.s_name, p.p_partkey, a.s_suppkey
      LIMIT 100"""),
    (spark, dir) => {
      val asia = Tables.load(spark, dir, "supplier")
        .join(broadcast(Tables.load(spark, dir, "nation")
            .join(broadcast(Tables.load(spark, dir, "region")
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val smallParts = Tables.load(spark, dir, "part")
        .filter(col("p_size") < 5)
        .select("p_partkey", "p_brand")
      val offers = Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("price"))
        .join(broadcast(smallParts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(asia.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min("price").as("unit_cost"))
      val minCost = offers.groupBy(col("l_partkey").as("m_partkey"))
        .agg(min("unit_cost").as("min_cost"))
      offers
        .join(minCost, col("l_partkey") === col("m_partkey") &&
          col("unit_cost") === col("min_cost"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("s_suppkey"),
          col("unit_cost"))
        .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"),
          col("s_suppkey"))
        .limit(100)
    })

  /** TPC-H Q13-shaped outer-join count distribution: orders per
    * customer (excluding one priority class, so the join predicate is
    * compound and some customers genuinely count zero through the OUTER
    * join — an inner join would silently drop them), then the
    * distribution of those counts. The double aggregation is the point:
    * the first is custkey-keyed (shuffle on the join key it already
    * has), the second is a tiny c_count-keyed hash agg over one row per
    * customer. `count(o_orderkey)` not `count(*)` — NULL-extended rows
    * must count 0, which is exactly SQL's count-skips-nulls.
    */
  val qCustOrderDist: QuerySpec = QuerySpec(
    "q_cust_order_dist",
    Some("""SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey) cc
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""),
    (spark, dir) => {
      val cust = Tables.load(spark, dir, "customer").select("c_custkey")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    })

  /** TPC-H Q18-shaped IN-over-grouped-HAVING (large-volume orders): the
    * IN subquery is a grouped aggregate with a HAVING threshold over
    * the SAME fact table the outer query re-joins. The DSL computes the
    * per-order quantity agg ONCE and reuses it for both the membership
    * test and the output column — the decorrelated ideal (the SQL twin
    * leaves that discovery to Catalyst: it may semi-join and re-derive,
    * but never evaluate per-row). Sums of integer-valued quantities are
    * exact in double, so HAVING membership and total_qty are
    * deterministic; the ORDER BY (o_totalprice DESC, o_orderkey) is
    * total, making the LIMIT stable cross-engine.
    */
  val qBigOrders: QuerySpec = QuerySpec(
    "q_big_orders",
    Some("""SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        o.o_totalprice, sum(l.l_quantity) AS total_qty
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        o.o_totalprice
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 100"""),
    (spark, dir) => {
      val bigQty = Tables.load(spark, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.load(spark, dir, "orders")
        .join(bigQty, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(spark, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    })

  /** TPC-H Q20-shaped nested-IN with a correlated aggregate (adapted to
    * the derived (part, supplier) pair table): suppliers of red-named
    * parts whose 1995 shipped quantity for some such part exceeds 40%
    * of their ALL-TIME quantity for it — a membership subquery whose
    * inner filter is itself a correlated aggregate over a differently
    * filtered scan of the same fact. The DSL's decorrelated form: both
    * the 1995 and the all-time (part, supplier) aggs are keyed hash
    * aggs pruned to red parts FIRST (the correlation key set), joined
    * pairwise, thresholded, then distinct supplier keys semi-join the
    * supplier dim. Quantity sums are exact; 0.4 × exact is one IEEE
    * multiply, identical cross-engine.
    */
  val qConcentratedSupp: QuerySpec = QuerySpec(
    "q_concentrated_supp",
    Some("""WITH ps AS (SELECT l_partkey, l_suppkey,
        sum(l_quantity) AS qty95
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey)
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE s.s_suppkey IN (
        SELECT ps.l_suppkey FROM ps
        WHERE ps.l_partkey IN (SELECT p_partkey FROM part
            WHERE p_name LIKE 'red%')
          AND ps.qty95 > (SELECT 0.4 * sum(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = ps.l_partkey
              AND l2.l_suppkey = ps.l_suppkey))
      ORDER BY s.s_name, s.s_suppkey"""),
    (spark, dir) => {
      val redParts = Tables.load(spark, dir, "part")
        .filter(col("p_name").like("red%"))
        .select("p_partkey")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(broadcast(redParts),
          col("l_partkey") === col("p_partkey"), "left_semi")
      val qty95 = li
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-01-01").cast("timestamp"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("qty95"))
      val allTime = li
        .groupBy(col("l_partkey").as("t_partkey"),
          col("l_suppkey").as("t_suppkey"))
        .agg((lit(0.4) * sum("l_quantity")).as("thr"))
      val chosen = qty95
        .join(allTime, col("l_partkey") === col("t_partkey") &&
          col("l_suppkey") === col("t_suppkey"))
        .filter(col("qty95") > col("thr"))
        .select("l_suppkey").distinct()
      Tables.load(spark, dir, "supplier")
        .join(chosen, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.load(spark, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name", "s_suppkey")
    })

  /** TPC-H Q19-shaped DISJUNCTIVE join predicate (adapted to this
    * fixture's part columns): revenue over an OR of AND-blocks, each
    * block constraining BOTH sides of the part⋈lineitem join. The
    * optimizer shape the conjunctive suite doesn't reach: no single
    * disjunct can push alone, but the part-only projection of the OR
    * ((brand,size) bands) is inferable and must reach the part scan —
    * Catalyst extracts it via constraint propagation, so the join sees
    * only candidate parts and the full OR evaluates as the join's
    * residual. PlanSpec pins the pushed disjunction and no-cartesian.
    */
  val qDisjunctiveJoin: QuerySpec = QuerySpec(
    "q_disjunctive_join",
    Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
        AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 15)
         OR (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#16' AND p_size BETWEEN 20 AND 40
             AND l_quantity BETWEEN 25 AND 50)"""),
    (spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val pt = Tables.load(spark, dir, "part")
        .select("p_partkey", "p_brand", "p_size")
      def block(brand: String, szLo: Int, szHi: Int,
                qLo: Int, qHi: Int) =
        col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
      li.join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .filter(block("Brand#12", 1, 15, 1, 15) ||
                block("Brand#14", 10, 25, 10, 30) ||
                block("Brand#16", 20, 40, 25, 50))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n"))
    })

  /** TPC-H Q16-shaped NOT-IN + COUNT DISTINCT (adapted: the blacklist
    * is negative-balance suppliers, standing in for the complaints
    * predicate): how many distinct acceptable suppliers stock each
    * (type, size) band. NOT IN over a subquery is the one anti-join
    * spelling the suite's NOT-EXISTS rows don't cover — Catalyst plans
    * it null-aware; s_suppkey is non-null so it degrades to the same
    * anti join the DSL builds. The distinct count shuffles once on the
    * (type, size) group key.
    */
  val qSupplierVariety: QuerySpec = QuerySpec(
    "q_supplier_variety",
    Some("""SELECT p_type, p_size,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#12'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_type, p_size
      ORDER BY supplier_cnt DESC, p_type, p_size"""),
    (spark, dir) => {
      val pt = Tables.load(spark, dir, "part")
        .filter(col("p_brand") =!= "Brand#12" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_type", "p_size")
      val bad = Tables.load(spark, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .groupBy("p_type", "p_size")
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_type"), col("p_size"))
    })

  /** TPC-H Q11-shaped group-HAVING against a GLOBAL scalar fraction
    * (adapted: part stock value derived from lineitem): parts whose
    * total traded value exceeds 1.5× the mean per-part value (the
    * fixture's per-part totals are tight around the mean — 1.5×
    * selects a real tail at every SF where 2× selects nothing, which
    * would make the row vacuously green). The derived value table
    * computes ONCE: both the threshold (one-row aggregate, broadcast
    * back) and the output read the SAME materialized shuffle — AQE
    * exchange reuse, pinned by PlanSpec on the executed plan's
    * ReusedExchange — so the fact scans once, never per-group.
    * Membership is decided on 4 dp-rounded value vs 6 dp-rounded
    * threshold in both engines (sums of doubles are order-dependent
    * in the last ulp).
    */
  val qValuableParts: QuerySpec = QuerySpec(
    "q_valuable_parts",
    Some("""WITH v AS (SELECT l_partkey,
        sum(l_extendedprice * l_quantity) AS val
      FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey AS partkey, round(val, 2) AS part_value
      FROM v
      WHERE round(val, 4) > (SELECT round(1.5 * avg(val), 6) FROM v)
      ORDER BY part_value DESC, partkey"""),
    (spark, dir) => {
      val v = Tables.load(spark, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_extendedprice") * col("l_quantity")).as("val"))
      val thr = v.agg(round(lit(1.5) * avg("val"), 6).as("thr"))
      v.crossJoin(broadcast(thr))
        .filter(round(col("val"), 4) > col("thr"))
        .select(col("l_partkey").as("partkey"),
          round(col("val"), 2).as("part_value"))
        .orderBy(col("part_value").desc, col("partkey"))
    })

  /** TPC-H Q14-shaped conditional-aggregate ratio: the PROMO share of
    * one month's revenue — CASE inside an aggregate over a date-pruned
    * join, the classic selective-numerator/total-denominator ratio.
    * One agg, part broadcast, shipdate range reaches the parquet scan.
    */
  val qPromoShare: QuerySpec = QuerySpec(
    "q_promo_share",
    Some("""SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'"""),
    (spark, dir) => {
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-02-01").cast("timestamp"))
        .join(broadcast(Tables.load(spark, dir, "part")
          .select("p_partkey", "p_type")),
          col("p_partkey") === col("l_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))) /
            sum(rev), 4).as("promo_share"),
          round(sum(rev), 2).as("total_revenue"))
    })

  // --- round 10: the seven TPC-H shapes that were still missing, adapted
  // to this fixture's reduced schema (no partsupp, no l_commitdate /
  // l_receiptdate / l_shipmode — see TESTDATA.md). With these the suite
  // covers all 22 TPC-H query SHAPES: 1,3,5 direct; 2,11,13..22 shaped in
  // prior rounds; 4,6..10,12 here. Ref: the reference's MySQL 5.6 tier
  // (mysql-persistent-template.json:68) serves exactly this ad-hoc
  // analytic surface.

  /** TPC-H Q4-shaped EXISTS-per-order (order priority checking). The
    * original's "commit date < receipt date" late-line predicate becomes
    * "shipped > 60 days after the order date" — same shape: a quarter of
    * orders, an EXISTS-correlated lineitem probe with a NON-equi
    * component on top of the orderkey equi-join, count by priority.
    * Plan: the EXISTS is a LEFT SEMI join keyed on l_orderkey (the equi
    * part shuffles, the date comparison rides along as a join residual)
    * — never a per-order subquery. At 100 TB both sides partition on
    * orderkey; the quarter filter is pushed to the orders scan.
    */
  val q4PriorityLate: QuerySpec = QuerySpec(
    "q4_priority_late",
    Some("""SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (spark, dir) => {
      val o = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                col("o_orderdate") < ts("1996-04-01 00:00:00"))
      val l = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    })

  /** TPC-H Q6 (forecasting revenue change) — fits the schema verbatim:
    * one lineitem scan, three pushed predicates, a single global sum.
    * Plan: Filter directly over the parquet scan (all three predicates
    * in PushedFilters), partial+final agg, zero joins — the canonical
    * "is pushdown working" probe. At 100 TB this is the query where a
    * stats/Z-order layout (Layout.scala, StatsManifest.scala) turns a
    * full scan into a few row groups.
    */
  val q6RevenueDelta: QuerySpec = QuerySpec(
    "q6_revenue_delta",
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
    (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1997-01-01 00:00:00") &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")))

  /** TPC-H Q7-shaped (volume shipping): revenue flowing between two
    * specific nations, both directions, by ship year. The supplier's
    * nation and the customer's nation come through two independent
    * broadcast joins of the same 25-row dimension; the disjunctive
    * nation-pair predicate lands AFTER both (it references both sides).
    * Plan: lineitem⋈orders⋈customer are the fact joins (AQE SMJ on the
    * keys), supplier + both nation copies broadcast; one final 2-key
    * group. 100 TB: nothing here shuffles more than the two fact joins
    * the shape requires.
    */
  val q7NationVolume: QuerySpec = QuerySpec(
    "q7_nation_volume",
    Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              year(l_shipdate) AS l_year,
              l_extendedprice * (1 - l_discount) AS volume
            FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""),
    (spark, dir) => {
      val n1 = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey"),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    })

  /** TPC-H Q8-shaped (national market share): NATION_3's share of the
    * EUROPE market's STANDARD-part volume, by order year. The share is a
    * conditional-sum ratio per group — the same CASE/sum fusion as Q14
    * (`qPromoShare`) but grouped, over a 7-table star. Plan: part /
    * supplier / nation×2 / region broadcast; lineitem⋈orders⋈customer
    * shuffle on their keys; ONE final agg computes numerator and
    * denominator together (no second pass over the star).
    */
  val q8MarketShare: QuerySpec = QuerySpec(
    "q8_market_share",
    Some("""SELECT o_year,
        round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
              / sum(volume), 4) AS mkt_share
      FROM (SELECT year(o_orderdate) AS o_year,
              l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation
            FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
      GROUP BY o_year ORDER BY o_year"""),
    (spark, dir) => {
      val custNation = broadcast(Tables.load(spark, dir, "nation")
        .join(Tables.load(spark, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("n_nationkey").as("c_nkey")))
      val suppNation = broadcast(Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("nation")))
      Tables.load(spark, dir, "lineitem")
        .join(broadcast(Tables.load(spark, dir, "part")
          .filter(col("p_type") === "STANDARD").select("p_partkey")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                  col("o_orderdate") < ts("1998-01-01 00:00:00"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey"),
          col("c_custkey") === col("o_custkey"))
        .join(custNation, col("c_nationkey") === col("c_nkey"), "left_semi")
        .join(broadcast(Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(suppNation, col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_3", revenue).otherwise(lit(0))) /
            sum(revenue), 4).as("mkt_share"))
        .orderBy("o_year")
    })

  /** TPC-H Q9-shaped (product type profit). The original prices cost
    * from partsupp.ps_supplycost, which this fixture lacks; the adapted
    * cost model is 60% of the part's retail price — same shape: a
    * part-name pattern filter, profit = revenue − cost·qty, grouped by
    * the SUPPLIER's nation and order year. Plan: part (filtered, 2 cols)
    * and supplier + nation broadcast; lineitem⋈orders shuffles once on
    * orderkey; single 2-key agg.
    */
  val q9NationProfit: QuerySpec = QuerySpec(
    "q9_nation_profit",
    Some("""SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
              l_extendedprice * (1 - l_discount)
                - 0.6 * p_retailprice * l_quantity AS amount
            FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%') profit
      GROUP BY nation, o_year ORDER BY nation, o_year"""),
    (spark, dir) => {
      val amount = revenue - lit(0.6) * col("p_retailprice") * col("l_quantity")
      Tables.load(spark, dir, "lineitem")
        .join(broadcast(Tables.load(spark, dir, "part")
          .filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.load(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(amount), 2).as("sum_profit"))
        .orderBy("nation", "o_year")
    })

  /** TPC-H Q10 (returned item reporting) — fits the schema directly
    * minus the address/phone/comment columns: top 20 customers by
    * revenue lost to returns ('R' lines) in a quarter. Plan: the
    * orderdate quarter filter pushes to the orders scan, returnflag to
    * lineitem; nation broadcasts; orderBy+limit plans as
    * TakeOrderedAndProject (no global sort). The c_custkey tiebreak
    * makes the top-20 cut deterministic across engines. Revenue sums
    * per-row basis points (an exact BIGINT sum, order-independent) and
    * divides once at the end — both summing doubles and RE-rounding the
    * quotient diverge between engines at half boundaries, while
    * integer/10000.0 is the same IEEE double everywhere.
    */
  val q10ReturnedItems: QuerySpec = QuerySpec(
    "q10_returned_items",
    Some("""SELECT c_custkey, c_name,
        sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
          / CAST(10000.0 AS DOUBLE) AS revenue, c_acctbal, n_name
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                  col("o_orderdate") < ts("1996-04-01 00:00:00"))
          .select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(spark, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(spark, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((sum(round(revenue * 10000, 0).cast("long")) / 10000.0)
          .as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20))

  /** TPC-H Q12-shaped (shipping modes / order priority). The fixture has
    * no l_shipmode or receipt date, so the "late" predicate becomes
    * "shipped ≥ 30 days after the order date" and the partition column
    * becomes l_returnflag — the shape is intact: a join with a non-equi
    * residual, then fused conditional counts splitting critical
    * (1-URGENT/2-HIGH) from other priorities per group.
    */
  val q12LatePriority: QuerySpec = QuerySpec(
    "q12_late_priority",
    Some("""SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1997-01-01 00:00:00"))
        .join(Tables.load(spark, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1).otherwise(0)).as("high_line_count"),
          sum(when(!high, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_returnflag")
    })

  def specs: Seq[QuerySpec] = Seq(
    q4PriorityLate, q6RevenueDelta, q7NationVolume, q8MarketShare,
    q9NationProfit, q10ReturnedItems, q12LatePriority,
    q1PricingSummary, q3ShippingPriority, q5RegionRevenue, qFilterPredicates,
    qJoinLeft, qJoinRight, qJoinFull, qJoinSemi, qJoinAnti, qJoinCross, qJoinTheta,
    qJoinWaiting, qQtyBelowAvg, qTopSupplier, qIdleRich,
    qMinCostSupp, qCustOrderDist, qBigOrders, qConcentratedSupp,
    qDisjunctiveJoin, qSupplierVariety, qValuableParts, qPromoShare,
    qWindowRank, qWindowRunning, qRollup, qCube, qDistinctAgg, qHaving,
    qUnionAll, qIntersect, qExcept, qTopK, qLimitOffset)
}
