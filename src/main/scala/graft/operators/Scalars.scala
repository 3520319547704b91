package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8) + SQL entry point (E1) with
  * subqueries (§2.2 IN-subquery / scalar / correlated EXISTS).
  *
  * Everything codegen'd built-ins — no UDFs. Oracle SQL is written in
  * DuckDB dialect where names differ (strftime vs date_format etc.); the
  * contract is identical *results*, not identical SQL text.
  */
object Scalars {

  // --- string functions (on documents) ---
  val qScalarString: QuerySpec = QuerySpec(
    "q_scalar_string",
    Some("""SELECT doc_id,
      upper(lang) AS lang_up,
      length(text) AS n_len,
      substring(text, 1, 12) AS prefix,
      replace(substring(text, 1, 30), ' ', '_') AS repl,
      concat_ws('|', lang, source) AS tag,
      lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded,
      reverse(source) AS rev,
      left(text, 5) AS l5,
      right(trim(text), 5) AS r5,
      strpos(text, 'scan') AS pos_scan,
      split_part(text, ' ', 2) AS tok2
      FROM documents ORDER BY doc_id"""),
    // tok2 uses try_element_at + coalesce'' so a one-token document
    // yields '' like DuckDB's split_part, instead of the ANSI
    // INVALID_ARRAY_INDEX error element_at would throw (ADVICE r1).
    (spark, dir) => {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          upper(col("lang")).as("lang_up"),
          length(col("text")).as("n_len"),
          substring(col("text"), 1, 12).as("prefix"),
          regexp_replace(substring(col("text"), 1, 30), " ", "_").as("repl"),
          concat_ws("|", col("lang"), col("source")).as("tag"),
          lpad(col("doc_id").cast("string"), 6, "0").as("padded"),
          reverse(col("source")).as("rev"),
          expr("left(text, 5)").as("l5"),
          expr("right(trim(text), 5)").as("r5"),
          instr(col("text"), "scan").as("pos_scan"),
          coalesce(try_element_at(split(col("text"), " "), lit(2)), lit("")).as("tok2"))
        .orderBy("doc_id")
    })

  // --- math functions (on lineitem) ---
  val qScalarMath: QuerySpec = QuerySpec(
    "q_scalar_math",
    Some("""SELECT l_orderkey, l_linenumber,
      l_extendedprice / l_quantity AS unit_price,
      CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      abs(l_discount - 0.05) AS ab,
      round(sqrt(l_quantity), 6) AS sq,
      round(pow(l_quantity, 2), 2) AS p2,
      round(exp(l_discount), 8) AS ex,
      round(ln(l_quantity + 1), 8) AS lg,
      CAST(sign(l_discount - 0.05) AS INT) AS sg,
      greatest(l_quantity, l_extendedprice / 1000) AS gr,
      least(l_quantity, l_extendedprice / 1000) AS le,
      CAST(l_quantity AS INT) % 7 AS md
      FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber"""),
    (spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          // unit_price/ab left unrounded deliberately: elementwise IEEE
          // arithmetic is bit-identical across engines, while round()'s
          // boundary behavior is not (Spark rounds the exact binary
          // value, DuckDB the shortest decimal repr)
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          abs(col("l_discount") - 0.05).as("ab"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(pow(col("l_quantity"), 2), 2).as("p2"),
          round(exp(col("l_discount")), 8).as("ex"),
          round(log(col("l_quantity") + 1), 8).as("lg"),
          signum(col("l_discount") - 0.05).cast("int").as("sg"),
          greatest(col("l_quantity"), col("l_extendedprice") / 1000).as("gr"),
          least(col("l_quantity"), col("l_extendedprice") / 1000).as("le"),
          (col("l_quantity").cast("int") % 7).as("md"))
        .orderBy("l_orderkey", "l_linenumber")
    })

  // --- date/time functions (on orders) ---
  val qScalarDate: QuerySpec = QuerySpec(
    "q_scalar_date",
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS INT) AS y,
      CAST(month(o_orderdate) AS INT) AS m,
      CAST(day(o_orderdate) AS INT) AS d,
      CAST(quarter(o_orderdate) AS INT) AS q,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      strftime(o_orderdate, '%Y-%m') AS ym,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to,
      last_day(CAST(o_orderdate AS DATE)) AS eom,
      o_orderdate + INTERVAL 90 DAY AS due
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate")).as("days_to"),
          last_day(col("o_orderdate")).as("eom"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due"))
        .orderBy("o_orderkey")
    })

  // --- conditional expressions ---
  val qCaseWhen: QuerySpec = QuerySpec(
    "q_case_when",
    Some("""SELECT o_orderkey,
      CASE WHEN o_totalprice > 400000 THEN 'big'
           WHEN o_totalprice > 150000 THEN 'mid' ELSE 'small' END AS bucket,
      CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'other' END AS st,
      coalesce(nullif(o_orderstatus, 'P'), 'pending') AS np,
      if(o_totalprice > 250000, 1, 0) AS hi
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 400000, "big")
            .when(col("o_totalprice") > 150000, "mid").otherwise("small").as("bucket"),
          when(col("o_orderstatus") === "F", "final")
            .when(col("o_orderstatus") === "O", "open").otherwise("other").as("st"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("np"),
          when(col("o_totalprice") > 250000, 1).otherwise(0).as("hi"))
        .orderBy("o_orderkey")
    })

  // --- conditional aggregation ---
  val qCondAgg: QuerySpec = QuerySpec(
    "q_cond_agg",
    Some("""SELECT o_orderpriority,
      count(*) AS n,
      CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_final,
      round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_final,
      round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS avg_open
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_final"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2)
            .as("total_final"),
          round(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))), 4).as("avg_open"))
        .orderBy("o_orderpriority")
    })

  // --- JSON functions (events.props is JSON text, like the services'
  //     JSON-in-TEXT columns; SURVEY.md §2.8) ---
  val qJsonExtract: QuerySpec = QuerySpec(
    "q_json_extract",
    Some("""SELECT event_type,
      count(*) AS n,
      CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
      CAST(min(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
      CAST(max(CAST(props->>'$.k' AS INT)) AS INT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""),
    (spark, dir) => {
      Tables.load(spark, dir, "events")
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    })

  // --- schemaless JSON via VariantType (§2.8 parse_json mapping): the
  //     open-content path — parse once to a binary variant, extract
  //     typed values by path with no declared schema. variant_get
  //     casts inside the variant reader; try-semantics on missing paths
  //     return NULL, matching DuckDB's ->> on absent keys. ---
  val qVariantJson: QuerySpec = QuerySpec(
    "q_variant_json",
    Some("""SELECT event_id,
      CAST(props->>'$.k' AS INT) AS k_int,
      props->>'$.k' AS k_str,
      CAST(props->>'$.k' AS DOUBLE) AS k_dbl,
      props->>'$.missing' AS absent,
      CAST(props->>'$.k' AS INT) % 10 AS k_mod
      FROM events WHERE event_id < 2000 ORDER BY event_id"""),
    (spark, dir) => {
      val v = parse_json(col("props"))
      Tables.load(spark, dir, "events")
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          variant_get(v, "$.k", "int").as("k_int"),
          variant_get(v, "$.k", "string").as("k_str"),
          variant_get(v, "$.k", "double").as("k_dbl"),
          variant_get(v, "$.missing", "string").as("absent"),
          (variant_get(v, "$.k", "int") % 10).as("k_mod"))
        .orderBy("event_id")
    })

  // --- SQL entry (E1) with subqueries: Catalyst rewrites IN → semi join,
  //     correlated EXISTS → semi join, scalar subquery → scalar ---
  val qSubqueryIn: QuerySpec = QuerySpec(
    "q_subquery_in",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      ORDER BY o_orderkey"""),
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        ORDER BY o_orderkey""")
    })

  val qSubqueryScalar: QuerySpec = QuerySpec(
    "q_subquery_scalar",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (SELECT 1.8 * avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey"""),
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT 1.8 * avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey""")
    })

  // --- CAST/CONVERT surface (§2.8; ANSI mode on — overflow errors
  //     instead of silently nulling, matching the DuckDB oracle).
  //     price_dec is serialized to VARCHAR after the DECIMAL(18,2) cast:
  //     the values agree, but the driver's comparator hashes Spark's
  //     parquet decimal128 (pandas object/Decimal) differently from
  //     DuckDB's DECIMAL (float64) — a fixed "xxxx.yy" string is
  //     dtype-stable in both engines (CORRECTNESS_r01 red row). ---
  val qCasts: QuerySpec = QuerySpec(
    "q_casts",
    Some("""SELECT o_orderkey,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
      CAST(trunc(o_totalprice) AS INT) AS price_int,
      CAST(o_orderkey AS VARCHAR) AS key_str,
      CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      CAST(o_orderdate AS DATE) AS order_date,
      CAST(o_orderstatus = 'F' AS INT) AS is_final
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_dec"),
          col("o_totalprice").cast("int").as("price_int"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("string").cast("bigint").as("key_roundtrip"),
          col("o_orderdate").cast("date").as("order_date"),
          (col("o_orderstatus") === "F").cast("int").as("is_final"))
        .orderBy("o_orderkey")
    })

  // --- try_* error-handling surface (§2.8 adjunct): under ANSI mode a
  //     bad cast / div-by-zero / overflow is an ERROR; the try_ variants
  //     give the explicit NULL-on-failure escape. Parity notes: DuckDB's
  //     x/0 is NULL (matches try_divide); its TRY_CAST('3.9' AS INT)
  //     ROUNDS where Spark nulls — deliberately not exercised; overflow
  //     try_add is oracle'd with an explicit CASE (DuckDB has no TRY()
  //     wrapper in this version). ---
  val qTryFns: QuerySpec = QuerySpec(
    "q_try_fns",
    Some("""SELECT o_orderkey,
      TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS tc_ok,
      TRY_CAST(o_orderstatus AS INT) AS tc_bad,
      o_totalprice / (o_orderkey % 3) AS td,
      CASE WHEN o_orderkey > 7 THEN NULL
           ELSE o_orderkey + 9223372036854775800 END AS ta,
      TRY_CAST('2001-' || CAST(o_orderkey % 20 AS VARCHAR) || '-01'
        AS TIMESTAMP) AS tts
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""),
    (spark, dir) => {
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          expr("try_cast(cast(o_orderkey AS string) AS int)").as("tc_ok"),
          expr("try_cast(o_orderstatus AS int)").as("tc_bad"),
          try_divide(col("o_totalprice"), col("o_orderkey") % 3).as("td"),
          try_add(col("o_orderkey"), lit(9223372036854775800L)).as("ta"),
          expr("try_cast(concat('2001-', cast(o_orderkey % 20 AS string), '-01') AS timestamp)")
            .as("tts"))
        .orderBy("o_orderkey")
    })

  /** NOT IN vs NOT EXISTS under NULLs (§2.2): a NULL in the NOT IN
    * subquery makes every row's predicate UNKNOWN → zero rows, while
    * NOT EXISTS is unaffected. Both engines implement the standard;
    * the query pins the semantics so a future rewrite can't regress it.
    */
  val qNotInNull: QuerySpec = QuerySpec(
    "q_not_in_null",
    Some("""SELECT
      (SELECT count(*) FROM orders
       WHERE o_custkey NOT IN (SELECT nullif(c_custkey, 0) FROM customer)) AS n_not_in,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE nullif(c.c_custkey, 0) = o.o_custkey)) AS n_not_exists"""),
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql("""SELECT
        (SELECT count(*) FROM orders
         WHERE o_custkey NOT IN (SELECT nullif(c_custkey, 0) FROM customer)) AS n_not_in,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE nullif(c.c_custkey, 0) = o.o_custkey)) AS n_not_exists""")
    })

  def specs: Seq[QuerySpec] = Seq(
    qScalarString, qScalarMath, qScalarDate, qCaseWhen, qCondAgg,
    qJsonExtract, qVariantJson, qSubqueryIn, qSubqueryScalar, qCasts,
    qTryFns, qNotInNull)
}
