package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MvCatalog
import graft.sources.{Ingest, Tables}

/** [[graft.plans.RewriteToMv]] contracts beyond the two oracle rows:
  * soundness bail-outs (every case where the rule must NOT fire),
  * the freshness gate, and plan-shape details the driver's
  * value-hashing can't see.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))
  private val cutoff = "1997-06-30 00:00:00"

  private def li = Tables.load(spark, sf, "lineitem")

  private def mvDef: DataFrame = li
    .filter(col("l_shipdate") <= ts(cutoff))
    .groupBy("l_returnflag", "l_linestatus")
    .agg(sum("l_quantity").as("qty_sum"),
      count(lit(1)).as("n_rows"),
      min("l_shipdate").as("first_ship"),
      max("l_shipdate").as("last_ship"))

  private def withMv[A](name: String)(body: String => A): A = {
    val path = graft.Scratch.dir(s"mvspec-$name")
    MvCatalog.materialize(spark, name, mvDef, path)
    try body(path) finally MvCatalog.deregister(spark, name)
  }

  private def readsOnly(df: DataFrame, path: String): Boolean = {
    val fs = df.inputFiles
    fs.nonEmpty && fs.forall(_.contains(path))
  }

  test("roll-up fires: subset keys, min/max/count derived, MV files only") {
    withMv("mv_roll") { path =>
      val q = li.filter(col("l_shipdate") <= ts(cutoff))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"),
          min("l_shipdate").as("first_ship"), max("l_shipdate").as("last_ship"))
        .orderBy("l_returnflag")
      assert(readsOnly(q, path), q.inputFiles.take(3).mkString(","))
      val got = q.collect()
      spark.conf.set("graft.mv.rewrite.enabled", "false")
      val want = try {
        li.filter(col("l_shipdate") <= ts(cutoff))
          .groupBy("l_returnflag")
          .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"),
            min("l_shipdate").as("first_ship"), max("l_shipdate").as("last_ship"))
          .orderBy("l_returnflag").collect()
      } finally spark.conf.set("graft.mv.rewrite.enabled", "true")
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) === w.getString(0))
        assert(math.abs(g.getDouble(1) - w.getDouble(1)) < 1e-6)
        assert(g.getLong(2) === w.getLong(2))
        assert(g.getTimestamp(3) === w.getTimestamp(3))
        assert(g.getTimestamp(4) === w.getTimestamp(4))
      }
    }
  }

  test("global (no group keys) roll-up collapses the whole MV") {
    withMv("mv_global") { path =>
      val q = li.filter(col("l_shipdate") <= ts(cutoff))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      assert(readsOnly(q, path))
      val r = q.head()
      val base = li.filter(col("l_shipdate") <= ts(cutoff)).count()
      assert(r.getLong(0) === base)
    }
  }

  test("downstream operators survive the rewrite (HAVING + join on output)") {
    withMv("mv_downstream") { path =>
      val agg = li.filter(col("l_shipdate") <= ts(cutoff))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val q = agg.filter(col("n") > 0)
        .join(agg.select(col("l_returnflag").as("rf")), col("l_returnflag") === col("rf"))
      assert(readsOnly(q, path))
      assert(q.count() === 3)
    }
  }

  test("SQL entry point is rewritten too — the rule is plan-level, not API-level") {
    withMv("mv_sql") { path =>
      li.createOrReplaceTempView("mv_sql_lineitem")
      try {
        val q = spark.sql(
          s"""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
              FROM mv_sql_lineitem
              WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
              GROUP BY l_returnflag ORDER BY l_returnflag""")
        assert(readsOnly(q, path), q.inputFiles.take(3).mkString(","))
        assert(q.count() === 3)
      } finally spark.catalog.dropTempView("mv_sql_lineitem")
    }
  }

  test("join-base MV: a star roll-up over the same join is answered " +
    "from the MV; a different join condition declines") {
    // the MV pre-joins fact×dim and stores per-(priority, flag)
    // partials — the star-schema summary. Matching is sameResult on
    // the whole join subtree, so an independently-built identical
    // join on the query side must hit, and any semantic difference
    // (here: a different equi-condition) must decline.
    val orders = Tables.load(spark, sf, "orders")
    def joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
    val path = graft.Scratch.dir("mvspec-join")
    MvCatalog.materialize(spark, "mv_join", joined
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(sum("l_quantity").as("qty_sum"), count(lit(1)).as("n_rows")),
      path)
    try {
      val q = joined.groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      assert(readsOnly(q, path), "join-base roll-up must read only the MV")
      spark.conf.set("graft.mv.rewrite.enabled", "false")
      val base = try q.orderBy("o_orderpriority").collect()
        finally spark.conf.set("graft.mv.rewrite.enabled", "true")
      assert(q.orderBy("o_orderpriority").collect() === base)
      // a semantically different join below the same-shaped aggregate
      // must NOT be answered from the MV
      val other = li.join(orders, col("l_partkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      assert(!other.inputFiles.forall(_.contains(path)),
        "rewrite fired across a different join condition")
    } finally MvCatalog.deregister(spark, "mv_join")
  }

  test("does NOT fire: group key outside the MV") {
    withMv("mv_badkey") { path =>
      val q = li.filter(col("l_shipdate") <= ts(cutoff))
        .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      assert(!q.inputFiles.forall(_.contains(path)))
    }
  }

  test("does NOT fire: aggregate not derivable (sum of unstored column)") {
    withMv("mv_badagg") { path =>
      val q = li.filter(col("l_shipdate") <= ts(cutoff))
        .groupBy("l_returnflag").agg(sum("l_tax").as("t"))
      assert(!q.inputFiles.forall(_.contains(path)))
    }
  }

  test("does NOT fire: query filter wider than the MV slice") {
    withMv("mv_wider") { path =>
      val q = li // no shipdate filter: needs rows the MV dropped
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!q.inputFiles.forall(_.contains(path)))
      // and a DIFFERENT predicate on the same column must not unify
      val q2 = li.filter(col("l_shipdate") <= ts("1998-12-01 00:00:00"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!q2.inputFiles.forall(_.contains(path)))
    }
  }

  test("does NOT fire: residual filter needs row-level data") {
    withMv("mv_rowres") { path =>
      // l_quantity is aggregated away — a filter on it cannot move to
      // the MV even though a qty_sum column exists
      val q = li.filter(col("l_shipdate") <= ts(cutoff) &&
          col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!q.inputFiles.forall(_.contains(path)))
    }
  }

  test("does NOT fire: DISTINCT aggregate under roll-up keys") {
    withMv("mv_distinct") { path =>
      val q = li.filter(col("l_shipdate") <= ts(cutoff))
        .groupBy("l_returnflag")
        .agg(countDistinct("l_linestatus").as("n"))
      assert(!q.inputFiles.forall(_.contains(path)))
    }
  }

  test("freshness gate: a stale pin stops the rewrite, re-register re-arms") {
    // MV over an upsert-table snapshot, pinned at the ledger head; a
    // later commit must kill the rewrite even though the ORIGINAL
    // snapshot DataFrame still matches plan-for-plan.
    val t = java.nio.file.Files.createTempDirectory("mv-fresh").toString
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "g", "v")
      .write.format("parquet").mode("overwrite").save(s"$t/in1")
    def sink(in: String, b: Long): Unit =
      Ingest.upsertParquet(s"$t/tbl", Seq("k"), nBuckets = 4,
        keepVersions = 4)(spark.read.parquet(in), b)
    sink(s"$t/in1", 0L)
    val snapshot = Ingest.readUpsertTable(spark, s"$t/tbl")
    val mv = snapshot.groupBy("g").agg(sum("v").as("v_sum"))
    val path = graft.Scratch.dir("mv-fresh-mv")
    MvCatalog.materialize(spark, "mv_fresh", mv, path,
      MvCatalog.UpsertPin(s"$t/tbl"))
    try {
      val q1 = snapshot.groupBy("g").agg(sum("v").as("v_sum"))
      assert(readsOnly(q1, path), "fresh pin must rewrite")
      // commit batch 1 → pin goes stale → same plan no longer rewrites
      Seq((4L, "b", 40.0)).toDF("k", "g", "v")
        .write.format("parquet").mode("overwrite").save(s"$t/in2")
      sink(s"$t/in2", 1L)
      val q2 = snapshot.groupBy("g").agg(sum("v").as("v_sum"))
      assert(!q2.inputFiles.forall(_.contains(path)),
        "stale pin must stop the rewrite")
      // re-materialize from CURRENT → fresh pin → rewrites again, new rows
      val snap2 = Ingest.readUpsertTable(spark, s"$t/tbl")
      val mv2 = snap2.groupBy("g").agg(sum("v").as("v_sum"))
      MvCatalog.materialize(spark, "mv_fresh", mv2, path,
        MvCatalog.UpsertPin(s"$t/tbl"))
      val q3 = snap2.groupBy("g").agg(sum("v").as("v_sum"))
      assert(readsOnly(q3, path), "re-registered pin must re-arm")
      val bSum = q3.filter(col("g") === "b").head().getDouble(1)
      assert(math.abs(bSum - 60.0) < 1e-9)
    } finally MvCatalog.deregister(spark, "mv_fresh")
  }

  test("feed-maintained MV: incremental refresh from the change feed re-arms the rewrite") {
    // the full loop a deployment runs: MV registered over an upsert
    // table with UpsertPin → base commits → pin stale (rewrite off) →
    // the MV is refreshed INCREMENTALLY from the batch's feed slice
    // (signed contributions, no base rescan) → re-registered → the
    // rewrite serves the updated values from the refreshed parquet
    val t = java.nio.file.Files.createTempDirectory("mv-feed").toString
    import spark.implicits._
    def sink(rows: Seq[(Long, String, Double, Boolean)], b: Long): Unit =
      Ingest.upsertParquet(s"$t/tbl", Seq("k"), nBuckets = 4,
        keepVersions = 8, deleteCol = Some("_del"), changeFeed = true)(
        rows.toDF("k", "g", "v", "_del"), b)
    sink(Seq((1L, "a", 10.0, false), (2L, "b", 20.0, false),
      (3L, "a", 30.0, false)), 0L)
    val mvPath = graft.Scratch.dir("mv-feed-mv")
    def defOverCurrent() = Ingest.readUpsertTable(spark, s"$t/tbl")
      .groupBy("g").agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
    MvCatalog.materialize(spark, "mv_feed", defOverCurrent(), mvPath,
      MvCatalog.UpsertPin(s"$t/tbl"))
    def q() = Ingest.readUpsertTable(spark, s"$t/tbl")
      .groupBy("g").agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
    try {
      assert(readsOnly(q(), mvPath))
      // base moves: update k=2 (b: 20→25), delete k=3 (a loses 30), add k=4 (c)
      sink(Seq((2L, "b", 25.0, false), (3L, "a", 0.0, true),
        (4L, "c", 40.0, false)), 1L)
      assert(!q().inputFiles.forall(_.contains(mvPath)), "stale pin must gate")
      // incremental refresh: fold slice 1's signed contributions into
      // the stored MV — cost rides the slice, the base is not rescanned
      val slice = Ingest.readTableChanges(spark, s"$t/tbl", 1L, 1L)
      val delta = slice.select(col("g"),
          when(col("_change_type").isin("insert", "update_postimage"),
            col("v")).otherwise(-col("v")).as("dv"),
          when(col("_change_type").isin("insert", "update_postimage"),
            lit(1L)).otherwise(lit(-1L)).as("dn"))
        .groupBy("g").agg(sum("dv").as("dv"), sum("dn").as("dn"))
      val refreshed = spark.read.parquet(mvPath)
        .join(delta, Seq("g"), "full_outer")
        .select(col("g"),
          (coalesce(col("v_sum"), lit(0.0)) + coalesce(col("dv"), lit(0.0)))
            .as("v_sum"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
        .filter(col("n") > 0)
      val tmpOut = graft.Scratch.dir("mv-feed-refresh")
      refreshed.write.mode("overwrite").parquet(tmpOut)
      spark.read.parquet(tmpOut).write.mode("overwrite").parquet(mvPath)
      // register WITHOUT materialize: the parquet now holds the
      // incrementally-refreshed copy, and serving it (not a full
      // recompute) is exactly what this test pins
      MvCatalog.register(spark, "mv_feed", defOverCurrent(), mvPath,
        MvCatalog.UpsertPin(s"$t/tbl"))
      val served = q()
      assert(readsOnly(served, mvPath), "refreshed pin must re-arm")
      val got = served.orderBy("g").as[(String, Double, Long)].collect().toSeq
      assert(got === Seq(("a", 10.0, 1L), ("b", 25.0, 1L), ("c", 40.0, 1L)))
    } finally MvCatalog.deregister(spark, "mv_feed")
  }

  test("registration rejects shapes the rule cannot match soundly") {
    val bad1 = li.select("l_returnflag") // no aggregate
    intercept[IllegalArgumentException] {
      MvCatalog.register(spark, "mv_bad1", bad1, "/tmp/nope")
    }
    val bad2 = li.groupBy("l_returnflag")
      .agg(round(avg("l_discount"), 4).as("a")) // derived, not a bare agg
    intercept[IllegalArgumentException] {
      MvCatalog.register(spark, "mv_bad2", bad2, "/tmp/nope")
    }
  }
}
