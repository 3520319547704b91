package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Ingest
import java.nio.file.Files

/** [[graft.sources.Ingest.mergeInto]] — ANSI-shaped multi-WHEN MERGE —
  * and the metadata-only aggregates ([[graft.sources.Ingest.countWhere]]
  * / [[graft.sources.Ingest.minMaxMeta]]), PARAMETERIZED over the
  * control-plane store like the ingest battery: POSIX, strict
  * object-store double, Hadoop FileSystem.
  */
abstract class MergeSuiteBase extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  implicit def store: graft.sources.TableStore

  private def tmp(): String =
    Files.createTempDirectory("graft-merge").toString

  /** 6-row table (id 1..6, qty = 10·id), keys = id, 8 buckets. */
  private def mkTable(changeFeed: Boolean = false,
                      sortCols: Seq[String] = Nil): String = {
    import spark.implicits._
    val dir = tmp() + "/t"
    val rows = (1L to 6L).map(i => (i, s"v$i", i * 10L))
      .toDF("id", "name", "qty")
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 8, keepVersions = 10,
      changeFeed = changeFeed, sortCols = sortCols)(rows, 0L)
    dir
  }

  private def state(dir: String): Map[Long, (String, Long)] =
    Ingest.readUpsertTable(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("multi-WHEN merge routes update, delete, insert and by-source delete") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq(
      (2L, "up", 100L), // matched, s.qty > t.qty -> UPDATE
      (3L, "dn", 1L),   // matched, s.qty < t.qty -> DELETE
      (4L, "eq", 40L),  // matched, neither cond -> untouched
      (7L, "new", 70L)  // unmatched -> INSERT
    ).toDF("id", "name", "qty")
    val res = Ingest.mergeInto(spark, dir, src, Seq(
      Ingest.MatchedUpdate(Some("s.qty > t.qty"),
        Seq("qty" -> "s.qty", "name" -> "s.name")),
      Ingest.MatchedDelete(Some("s.qty < t.qty")),
      Ingest.NotMatchedInsert(None),
      // ids 5,6 have qty 50,60 and no source row
      Ingest.NotMatchedBySourceDelete(Some("t.qty >= 50"))))
    assert(res.exists(_._1 == 1L)) // minted batch 1
    val got = state(dir)
    assert(got === Map(
      1L -> ("v1", 10L),   // by-source cond false -> kept
      2L -> ("up", 100L),  // updated
      4L -> ("v4", 40L),   // matched, no clause applied
      7L -> ("new", 70L))) // inserted
    // 3 deleted by MATCHED DELETE; 5,6 deleted by BY SOURCE DELETE
  }

  test("clause order is significant: the first matching WHEN wins") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((2L, "s", 5L)).toDF("id", "name", "qty")
    Ingest.mergeInto(spark, dir, src, Seq(
      Ingest.MatchedUpdate(None, Seq("qty" -> "999")),
      Ingest.MatchedDelete(None))) // also matches, must never fire
    assert(state(dir)(2L) === ("v2", 999L))
  }

  test("by-source UPDATE patches rows the source did not mention") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((1L, "keep", 10L)).toDF("id", "name", "qty")
    Ingest.mergeInto(spark, dir, src, Seq(
      Ingest.NotMatchedBySourceUpdate(Some("t.qty <= 30"),
        Seq("name" -> "concat(t.name, '!')"))))
    val got = state(dir)
    assert(got(2L) === ("v2!", 20L) && got(3L) === ("v3!", 30L))
    assert(got(1L) === ("v1", 10L) && got(4L) === ("v4", 40L))
  }

  test("duplicate source keys are refused (MERGE cardinality)") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((2L, "a", 1L), (2L, "b", 2L)).toDF("id", "name", "qty")
    val e = intercept[IllegalArgumentException] {
      Ingest.mergeInto(spark, dir, src,
        Seq(Ingest.MatchedUpdate(None, Seq("qty" -> "s.qty"))))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("assigning a key column is refused") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((2L, "a", 1L)).toDF("id", "name", "qty")
    val e = intercept[IllegalArgumentException] {
      Ingest.mergeInto(spark, dir, src,
        Seq(Ingest.MatchedUpdate(None, Seq("id" -> "s.id + 100"))))
    }
    assert(e.getMessage.contains("key column"))
  }

  test("a merge no clause touches mints nothing") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((2L, "x", 20L)).toDF("id", "name", "qty")
    val before = state(dir)
    val res = Ingest.mergeInto(spark, dir, src, Seq(
      Ingest.MatchedUpdate(Some("s.qty > t.qty"), Seq("qty" -> "s.qty")),
      Ingest.NotMatchedInsert(Some("false"))))
    assert(res.isEmpty)
    assert(state(dir) === before)
    assert(!store.exists(store.child(dir, "v_1")) &&
      !store.exists(store.child(dir, "v_1.1")))
  }

  test("bucket-pruned and full-target change sets agree") {
    import spark.implicits._
    val dirA = mkTable(); val dirB = mkTable()
    val src = Seq((2L, "up", 100L), (7L, "new", 70L)).toDF("id", "name", "qty")
    val clauses = Seq(
      Ingest.MatchedUpdate(None, Seq("qty" -> "s.qty", "name" -> "s.name")),
      Ingest.NotMatchedInsert(None))
    // A: no BY SOURCE clause -> target scan bucket-pruned to the
    // source's keys; B: a never-firing BY SOURCE clause forces the
    // full snapshot scan. Same clauses otherwise -> same final state.
    Ingest.mergeInto(spark, dirA, src, clauses)
    Ingest.mergeInto(spark, dirB, src,
      clauses :+ Ingest.NotMatchedBySourceDelete(Some("false")))
    assert(state(dirA) === state(dirB))
    assert(state(dirA)(2L) === ("up", 100L) &&
      state(dirA)(7L) === ("new", 70L))
  }

  test("merge rides the change feed: update pre/post, delete, insert") {
    import spark.implicits._
    val dir = mkTable(changeFeed = true)
    val src = Seq((2L, "up", 100L), (7L, "new", 70L), (3L, "rm", 0L))
      .toDF("id", "name", "qty")
    Ingest.mergeInto(spark, dir, src, Seq(
      Ingest.MatchedDelete(Some("s.qty = 0")),
      Ingest.MatchedUpdate(None, Seq("qty" -> "s.qty", "name" -> "s.name")),
      Ingest.NotMatchedInsert(None)))
    val feed = Ingest.readTableChanges(spark, dir, fromBatch = 1L,
        toBatch = 1L)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set(
      (2L, "update_preimage"), (2L, "update_postimage"),
      (3L, "delete"), (7L, "insert")))
  }

  test("SET expressions read the pre-merge row and cast to the pinned type") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((2L, "x", 7L)).toDF("id", "name", "qty")
    // both assignments see t.qty = 20 (pre-update), and the double-
    // typed expression casts back to the column's long
    Ingest.mergeInto(spark, dir, src, Seq(
      Ingest.MatchedUpdate(None, Seq(
        "qty" -> "t.qty + s.qty",
        "name" -> "concat(t.name, '_', cast(t.qty as string))"))))
    assert(state(dir)(2L) === ("v2_20", 27L))
  }

  test("a crash-replayed pinned batch id no-ops (streaming exactly-once)") {
    import spark.implicits._
    val dir = mkTable()
    val src = Seq((2L, "up", 100L)).toDF("id", "name", "qty")
    val clauses = Seq(
      Ingest.MatchedUpdate(None, Seq("qty" -> "t.qty + s.qty")))
    val first = Ingest.mergeInto(spark, dir, src, clauses,
      asBatch = Some(1L))
    assert(first.contains((1L, 1L)))
    assert(state(dir)(2L)._2 === 120L)
    // the replay: same micro-batch id redelivered after a "crash" —
    // without the guard the additive update would apply twice
    val replay = Ingest.mergeInto(spark, dir, src, clauses,
      asBatch = Some(1L))
    assert(replay.isEmpty)
    assert(state(dir)(2L)._2 === 120L)
  }

  test("ALTER ADD CONSTRAINT validates history, screens the future; DROP releases") {
    import spark.implicits._
    val dir = mkTable() // qty 10..60
    // an invariant the data does not hold cannot be pinned
    val e = intercept[IllegalArgumentException](
      Ingest.addTableConstraint(spark, dir, "qty_cap", "qty <= 50"))
    assert(e.getMessage.contains("violate"))
    Ingest.addTableConstraint(spark, dir, "qty_cap", "qty <= 100")
    // the grown pinned set screens every later batch, whatever the
    // caller passes (here: nothing — the creation-time set)
    intercept[IllegalArgumentException] {
      Ingest.upsertParquet(dir, Seq("id"), nBuckets = 8,
        keepVersions = 10)(Seq((9L, "x", 500L)).toDF("id", "name", "qty"),
        1L)
    }
    // a caller passing a SUBSET of the pinned set (the creation-time
    // list, or the added one) stays valid; an unknown one is refused
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 8, keepVersions = 10,
      constraints = Seq("qty_cap" -> "qty <= 100"))(
      Seq((9L, "ok", 90L)).toDF("id", "name", "qty"), 1L)
    intercept[IllegalArgumentException] {
      Ingest.upsertParquet(dir, Seq("id"), nBuckets = 8, keepVersions = 10,
        constraints = Seq("never_pinned" -> "true"))(
        Seq((10L, "x", 1L)).toDF("id", "name", "qty"), 2L)
    }
    // DROP is metadata-only and releases the screen
    Ingest.dropTableConstraint(dir, "qty_cap")
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 8, keepVersions = 10)(
      Seq((11L, "big", 999L)).toDF("id", "name", "qty"), 2L)
    assert(state(dir)(11L) === ("big", 999L))
    intercept[IllegalArgumentException](
      Ingest.dropTableConstraint(dir, "qty_cap")) // already gone
  }

  test("maintenancePlan flags every debt class and converges after the fixes") {
    import spark.implicits._
    val dir = tmp() + "/adv"
    // dense table: 2 heavy buckets -> many range slices per bucket
    val keys = (1L to 400L)
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 2, keepVersions = 10,
      sortCols = Seq("qty"), filesPerBucket = 4,
      deleteCol = Some("_del"), lazyDeletes = true)(
      keys.map(i => (i, s"v$i", i, false)).toDF("id", "name", "qty", "_del"),
      0L)
    // lazy delete -> pending vector; drop -> dead mapping entry
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 2, keepVersions = 10,
      sortCols = Seq("qty"), filesPerBucket = 4,
      deleteCol = Some("_del"), lazyDeletes = true)(
      Seq((1L, "v1", 1L, true)).toDF("id", "name", "qty", "_del"), 1L)
    Ingest.dropColumn(dir, "name")
    val plan = Ingest.maintenancePlan(spark, dir, keepVersions = 1)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(plan.contains("OPTIMIZE"), s"plan: ${plan.keys}")
    assert(plan.contains("OPTIMIZE PURGE COLUMNS"))
    assert(plan.contains("VACUUM"))
    assert(plan("VACUUM").contains("KEEP 1 VERSIONS"))
    // run the API equivalents of the emitted commands...
    Ingest.optimizeUpsertTable(spark, dir, purgeColumns = true)
    Ingest.vacuumUpsertTable(spark, dir, keepVersions = 1)
    // ...and the advisor converges to an empty plan
    val after = Ingest.maintenancePlan(spark, dir, keepVersions = 1)
    assert(after.count() === 0L,
      s"not converged: ${after.collect().mkString("; ")}")
  }

  // --- metadata-only aggregates ---

  /** Orders-shaped table pinned on sortCols = qty so the manifest
    * carries qty ranges; 48 rows over 3 committed batches.
    */
  private def mkStatsTable(): String = {
    import spark.implicits._
    val dir = tmp() + "/s"
    def batch(ids: Range, b: Long): Unit =
      Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10,
        sortCols = Seq("qty"), filesPerBucket = 2)(
        ids.map(i => (i.toLong, s"v$i", i.toLong)).toDF("id", "name", "qty"),
        b)
    batch(1 to 16, 0L); batch(17 to 32, 1L); batch(33 to 48, 2L)
    dir
  }

  test("countWhere with no bounds answers from metadata alone") {
    val dir = mkStatsTable()
    val mc = Ingest.countWhere(spark, dir)
    assert(mc.count === 48L)
    assert(mc.scannedFiles === 0L, "full count must open no data file")
    assert(mc.metaFiles === mc.totalFiles && mc.totalFiles > 0)
  }

  test("bounded countWhere: inside files fold from metadata, boundary files scan") {
    val dir = mkStatsTable()
    val mc = Ingest.countWhere(spark, dir, Seq(("qty", 10L, 30L)))
    val expect = Ingest.readUpsertTable(spark, dir)
      .filter(col("qty") >= 10 && col("qty") <= 30).count()
    assert(mc.count === expect)
    assert(mc.scannedFiles < mc.totalFiles,
      "a selective bound must not scan every file")
  }

  test("NULLs in a bound column never overcount (nulls_ guard)") {
    import spark.implicits._
    val dir = tmp() + "/n"
    val rows = (1L to 12L).map(i =>
      (i, s"v$i", if (i % 3 == 0) null else java.lang.Long.valueOf(i)))
      .toDF("id", "name", "qty")
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 2, keepVersions = 10,
      sortCols = Seq("qty"), filesPerBucket = 2)(rows, 0L)
    val mc = Ingest.countWhere(spark, dir, Seq(("qty", 1L, 12L)))
    val expect = Ingest.readUpsertTable(spark, dir)
      .filter(col("qty") >= 1 && col("qty") <= 12).count()
    assert(mc.count === expect) // 8: the four NULL-qty rows fail the bound
  }

  test("a deletion vector disables the metadata path but never the answer") {
    import spark.implicits._
    val dir = mkStatsTable()
    // lazy delete -> merge-on-read vector, no bucket rewrite
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10,
      sortCols = Seq("qty"), filesPerBucket = 2,
      deleteCol = Some("_del"), lazyDeletes = true)(
      Seq((48L, "v48", 48L, true)).toDF("id", "name", "qty", "_del"), 3L)
    val mc = Ingest.countWhere(spark, dir)
    assert(mc.count === 47L, "vector-hidden row must not be counted")
    assert(mc.metaFiles === 0L, "metadata path is unsound under a vector")
    assert(Ingest.minMaxMeta(spark, dir).isEmpty)
    // OPTIMIZE applies the vector and restores the metadata path
    Ingest.optimizeUpsertTable(spark, dir)
    val after = Ingest.countWhere(spark, dir)
    assert(after.count === 47L && after.scannedFiles === 0L)
  }

  test("minMaxMeta equals the data aggregate, from the manifest alone") {
    val dir = mkStatsTable()
    val m = Ingest.minMaxMeta(spark, dir)
      .getOrElse(fail("manifest-backed table must answer minMaxMeta"))
    val r = m.collect().head
    assert(r.getLong(r.fieldIndex("min_qty")) === 1L)
    assert(r.getLong(r.fieldIndex("max_qty")) === 48L)
  }

  test("countWhere on a manifest-less table degrades to an exact scan") {
    import spark.implicits._
    val dir = tmp() + "/p"
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 2, keepVersions = 10)(
      (1L to 9L).map(i => (i, i * 2L)).toDF("id", "qty"), 0L)
    val mc = Ingest.countWhere(spark, dir, Seq(("qty", 4L, 10L)))
    assert(mc.count === 4L && mc.metaFiles === 0L && mc.scannedFiles > 0L)
  }
}

class MergeSpec extends MergeSuiteBase {
  implicit def store: graft.sources.TableStore = graft.sources.LocalTableStore
}

class MergeObjectStoreSpec extends MergeSuiteBase {
  private val objStore = new graft.sources.ObjectTableStore
  implicit def store: graft.sources.TableStore = objStore
}

class MergeHadoopSpec extends MergeSuiteBase {
  private val hStore = new graft.sources.HadoopTableStore()
  implicit def store: graft.sources.TableStore = hStore
}
