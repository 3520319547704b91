package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, TableStore}

/** Catalog-native graft tables ([[graft.sources.GraftCatalog]]): the
  * stock multipart-name SQL verbs against the same control plane the
  * path-based format serves — CREATE NAMESPACE / TABLE, INSERT,
  * SELECT, VERSION AS OF / TIMESTAMP AS OF, ALTER RENAME/DROP COLUMN,
  * SHOW TABLES, DROP. The catalog adds no second metastore, so every
  * test cross-checks through the PATH-based read of the same dir.
  */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private implicit val store: TableStore = TableStore.local

  private def warehouse: String =
    spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def fresh(ns: String): String = {
    spark.sql(s"DROP NAMESPACE IF EXISTS graft.$ns CASCADE")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    ns
  }

  test("create / insert / select / drop — one control plane, two spellings") {
    val ns = fresh("cat1")
    spark.sql(s"""CREATE TABLE graft.$ns.obs (k BIGINT, v INT, s STRING)
      TBLPROPERTIES ('keys'='k', 'buckets'='4', 'sortcols'='v')""")
    // CREATE materialized the table's own control plane: batch 0 empty
    val dir = s"$warehouse/$ns/obs"
    assert(Ingest.committedBatchIds(dir) === Set(0L))
    assert(spark.sql(s"SELECT * FROM graft.$ns.obs").count() === 0L)

    spark.sql(s"INSERT INTO graft.$ns.obs VALUES (1, 10, 'a'), (2, 20, 'b')")
    spark.sql(s"INSERT INTO graft.$ns.obs VALUES (2, 21, 'B'), (3, 30, 'c')")
    val got = spark.sql(s"SELECT k, v, s FROM graft.$ns.obs ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got === Seq((1L, 10, "a"), (2L, 21, "B"), (3L, 30, "c")))
    // the PATH spelling reads the identical state
    assert(spark.read.format("graft").load(dir).count() === 3L)
    assert(Ingest.committedBatchIds(dir) === Set(0L, 1L, 2L))

    assert(spark.sql(s"SHOW TABLES IN graft.$ns").collect()
      .map(_.getString(1)).toSeq === Seq("obs"))
    spark.sql(s"DROP TABLE graft.$ns.obs")
    assert(!store.exists(dir))
  }

  test("VERSION AS OF and TIMESTAMP AS OF read ledgered history") {
    val ns = fresh("cat2")
    // history reads reach only RETAINED versions — pin retention past
    // the three commits this test travels across
    spark.sql(s"""CREATE TABLE graft.$ns.h (k BIGINT, v INT)
      TBLPROPERTIES ('keys'='k', 'keepversions'='4')""")
    spark.sql(s"INSERT INTO graft.$ns.h VALUES (1, 10)")
    val tsAfterB1 = java.time.Instant.now()
    Thread.sleep(5) // commit wall-clocks must straddle the probe instant
    spark.sql(s"INSERT INTO graft.$ns.h VALUES (1, 11), (2, 20)")

    def vals(q: String): Seq[(Long, Int)] =
      spark.sql(q).collect().map(r => (r.getLong(0), r.getInt(1)))
        .toSeq.sorted
    assert(vals(s"SELECT * FROM graft.$ns.h") === Seq((1L, 11), (2L, 20)))
    assert(vals(s"SELECT * FROM graft.$ns.h VERSION AS OF 1") ===
      Seq((1L, 10)))
    assert(vals(s"SELECT * FROM graft.$ns.h VERSION AS OF 0") === Nil)
    assert(vals(s"SELECT * FROM graft.$ns.h TIMESTAMP AS OF '$tsAfterB1'")
      === Seq((1L, 10)))
    // a timestamp before the first commit has no servable state
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.$ns.h " +
        "TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
  }

  test("ALTER TABLE RENAME/DROP COLUMN ride the metadata-only colmap") {
    val ns = fresh("cat3")
    spark.sql(s"""CREATE TABLE graft.$ns.c (k BIGINT, v INT, junk STRING)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO graft.$ns.c VALUES (1, 10, 'x')")
    val dir = s"$warehouse/$ns/c"
    val before = Ingest.committedBatchIds(dir).max
    spark.sql(s"ALTER TABLE graft.$ns.c RENAME COLUMN v TO val")
    spark.sql(s"ALTER TABLE graft.$ns.c DROP COLUMN junk")
    // metadata-only: no new version minted
    assert(Ingest.committedBatchIds(dir).max === before)
    assert(spark.sql(s"SELECT * FROM graft.$ns.c").columns.toSeq ===
      Seq("k", "val"))
    assert(spark.sql(s"SELECT val FROM graft.$ns.c WHERE k = 1")
      .head().getInt(0) === 10)
    // unsupported mutations refuse loudly, not half-apply
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$ns.c ADD COLUMN extra INT")
    }
  }

  test("refusals: rename table, partitioned create, missing keys, traversal") {
    val ns = fresh("cat4")
    spark.sql(s"""CREATE TABLE graft.$ns.r (k BIGINT, v INT)
      TBLPROPERTIES ('keys'='k')""")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$ns.r RENAME TO graft.$ns.r2")
    }
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.$ns.p (k BIGINT, d STRING)
        PARTITIONED BY (d) TBLPROPERTIES ('keys'='k')""")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$ns.nokeys (k BIGINT, v INT)")
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.$ns.`..`")
    }
    // a second CREATE of the same identifier refuses
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.$ns.r (k BIGINT, v INT)
        TBLPROPERTIES ('keys'='k')""")
    }
  }

  test("CTAS creates then lands the query as the first data batch") {
    val ns = fresh("cat5")
    spark.sql(s"""CREATE TABLE graft.$ns.s TBLPROPERTIES ('keys'='k')
      AS SELECT id AS k, CAST(id * 2 AS INT) AS v FROM range(5)""")
    val got = spark.sql(s"SELECT k, v FROM graft.$ns.s ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === (0L until 5L).map(i => (i, (i * 2).toInt)))
  }
}
