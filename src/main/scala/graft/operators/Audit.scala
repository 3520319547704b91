package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Warehouse auditing operators: declarative data-quality expectations
  * and snapshot diffing — the dbt-test/Deequ-shaped surface that sits
  * beside profiling (`Sketches.qProfile`) in any managed-table
  * deployment.
  */
object Audit {

  /** Data-quality expectation suite in long format (check_name, table,
    * metric) — uniqueness, referential integrity, null counts, and
    * range violations, each a COUNT so the result is exact-integer and
    * the pass threshold is downstream policy, not baked in.
    *
    * Scale shape: one aggregation pass per table (conditional aggs
    * share the scan), the uniqueness check is a hash agg on the key,
    * and the referential check is a left-anti join of fact keys against
    * the (distinct) dimension keys — every piece is the keyed
    * shuffle/broadcast shape it would need at 100 TB; results are one
    * row per check.
    */
  val qQualityChecks: QuerySpec = QuerySpec(
    "q_quality_checks",
    Some("""SELECT * FROM (
        SELECT 'orders_pk_dups' AS check_name, 'orders' AS tbl,
          (SELECT count(*) FROM (SELECT o_orderkey FROM orders
            GROUP BY o_orderkey HAVING count(*) > 1)) AS metric
        UNION ALL
        SELECT 'lineitem_orphans', 'lineitem',
          (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders))
        UNION ALL
        SELECT 'orders_null_date', 'orders',
          (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
        UNION ALL
        SELECT 'customer_negative_balance', 'customer',
          (SELECT count(*) FROM customer WHERE c_acctbal < 0)
        UNION ALL
        SELECT 'lineitem_discount_range', 'lineitem',
          (SELECT count(*) FROM lineitem
           WHERE l_discount < 0 OR l_discount > 0.5)
        UNION ALL
        SELECT 'lineitem_nonpositive_qty', 'lineitem',
          (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
      ) ORDER BY check_name"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val li = Tables.load(spark, dir, "lineitem")
      val cust = Tables.load(spark, dir, "customer")
      def one(name: String, tbl: String, metric: org.apache.spark.sql.DataFrame) =
        metric.select(lit(name).as("check_name"), lit(tbl).as("tbl"),
          col(metric.columns.head).as("metric"))
      val pkDups = orders.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(count(lit(1)))
      val orphans = li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)))
      val nullDate = orders.agg(
        sum(col("o_orderdate").isNull.cast("long")).as("m"))
      val negBal = cust.agg(
        sum((col("c_acctbal") < 0).cast("long")).as("m"))
      val discRange = li.agg(
        sum((col("l_discount") < 0 || col("l_discount") > 0.5)
          .cast("long")).as("m"))
      val nonposQty = li.agg(
        sum((col("l_quantity") <= 0).cast("long")).as("m"))
      one("orders_pk_dups", "orders", pkDups)
        .unionAll(one("lineitem_orphans", "lineitem", orphans))
        .unionAll(one("orders_null_date", "orders", nullDate))
        .unionAll(one("customer_negative_balance", "customer", negBal))
        .unionAll(one("lineitem_discount_range", "lineitem", discRange))
        .unionAll(one("lineitem_nonpositive_qty", "lineitem", nonposQty))
        .orderBy("check_name")
    })

  /** Snapshot diff: classify every key as added / removed / changed
    * between two versions of a keyed table. The versions are DERIVED
    * deterministically from the orders fixture (snapshot A drops keys
    * ≡0 mod 7, snapshot B drops keys ≡0 mod 5 and rewrites the
    * priority of keys ≡0 mod 3) so both engines construct identical
    * inputs; production feeds two real table versions through the same
    * plan. Comparison hashes the non-key columns (md5 of a
    * null-sentineled concat) so the diff never ships row payloads —
    * the full-outer join moves (key, 16-byte hash) pairs only, the
    * 100 TB posture for table diffing.
    */
  val qTableDiff: QuerySpec = QuerySpec(
    "q_table_diff",
    Some("""WITH a AS (SELECT o_orderkey AS k,
        md5(concat_ws('|', o_orderstatus,
          CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR),
          o_orderpriority)) AS h
        FROM orders WHERE o_orderkey % 7 <> 0),
      b AS (SELECT o_orderkey AS k,
        md5(concat_ws('|', o_orderstatus,
          CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR),
          CASE WHEN o_orderkey % 3 = 0 THEN 'X-DIFF'
               ELSE o_orderpriority END)) AS h
        FROM orders WHERE o_orderkey % 5 <> 0)
      SELECT coalesce(a.k, b.k) AS k,
        CASE WHEN a.k IS NULL THEN 'added'
             WHEN b.k IS NULL THEN 'removed'
             ELSE 'changed' END AS status
      FROM a FULL OUTER JOIN b ON a.k = b.k
      WHERE a.k IS NULL OR b.k IS NULL OR a.h <> b.h
      ORDER BY k"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      // money column hashed as exact integer cents, never a double→
      // string render (the engines' shortest-roundtrip formatters are
      // not guaranteed to agree — the qProfile precedent)
      def rowHash(prio: org.apache.spark.sql.Column) =
        md5(concat_ws("|", col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").cast("string"),
          prio))
      val a = orders.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("ak"),
          rowHash(col("o_orderpriority")).as("ah"))
      val b = orders.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey").as("bk"),
          rowHash(when(col("o_orderkey") % 3 === 0, "X-DIFF")
            .otherwise(col("o_orderpriority"))).as("bh"))
      a.join(b, col("ak") === col("bk"), "full_outer")
        .filter(col("ak").isNull || col("bk").isNull ||
          col("ah") =!= col("bh"))
        .select(coalesce(col("ak"), col("bk")).as("k"),
          when(col("ak").isNull, "added")
            .when(col("bk").isNull, "removed")
            .otherwise("changed").as("status"))
        .orderBy("k")
    })

  /** Equi-width 20-bucket histogram of order totals — the distribution
    * view profiling lacks. Bounds come from ONE min/max aggregation
    * broadcast back; bucketing is `floor((x − mn)/w)` clamped to the
    * last bucket, all identical-order IEEE arithmetic on identical
    * inputs, so bucket membership is deterministic cross-engine; the
    * histogram itself is a 20-row hash agg. Scale: one scan + one agg,
    * the same two-pass shape as every summary-broadcast operator here.
    * The width is floored at 1e-12 identically in both engines so a
    * degenerate min==max input degrades to one bucket-0 row instead of
    * Spark yielding NaN nulls while DuckDB errors on the inf cast.
    */
  val qHistogram: QuerySpec = QuerySpec(
    "q_histogram",
    Some("""WITH st AS (SELECT min(o_totalprice) AS mn,
        max(o_totalprice) AS mx FROM orders),
      b AS (SELECT least(CAST(floor((o_totalprice - st.mn) /
          greatest((st.mx - st.mn) / 20.0, 1e-12)) AS INT), 19) AS bucket,
        st.mn AS mn, greatest((st.mx - st.mn) / 20.0, 1e-12) AS w
        FROM orders, st)
      SELECT bucket, round(mn + bucket * w, 4) AS lo,
        round(mn + (bucket + 1) * w, 4) AS hi, count(*) AS n
      FROM b GROUP BY bucket, mn, w ORDER BY bucket"""),
    (spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val st = orders.agg(min("o_totalprice").as("mn"),
        max("o_totalprice").as("mx"))
      val w = greatest((col("mx") - col("mn")) / 20.0, lit(1e-12))
      orders.crossJoin(broadcast(st))
        .select(
          least(floor((col("o_totalprice") - col("mn")) / w).cast("int"),
            lit(19)).as("bucket"),
          col("mn"), w.as("w"))
        .groupBy("bucket", "mn", "w").agg(count(lit(1)).as("n"))
        .select(col("bucket"), round(col("mn") + col("bucket") * col("w"), 4)
            .as("lo"),
          round(col("mn") + (col("bucket") + 1) * col("w"), 4).as("hi"),
          col("n"))
        .orderBy("bucket")
    })

  def specs: Seq[QuerySpec] = Seq(qQualityChecks, qTableDiff, qHistogram)
}
