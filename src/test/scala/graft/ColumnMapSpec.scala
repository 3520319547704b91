package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Ingest
import java.nio.file.Files

/** Column mapping — metadata-only RENAME / DROP COLUMN
  * ([[graft.sources.Ingest.renameColumn]] / `dropColumn`, `_colmap`):
  * physical names in files are immutable, logical names are the user
  * surface, and every read/write path translates. Parameterized over
  * the three control-plane stores like the ingest battery.
  */
abstract class ColumnMapSuiteBase extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  implicit def store: graft.sources.TableStore

  private def tmp(): String =
    Files.createTempDirectory("graft-colmap").toString

  private def mkTable(sortCols: Seq[String] = Nil,
                      changeFeed: Boolean = false): String = {
    import spark.implicits._
    val dir = tmp() + "/t"
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10,
      changeFeed = changeFeed, sortCols = sortCols)(
      (1L to 6L).map(i => (i, s"v$i", i * 10L)).toDF("id", "name", "qty"),
      0L)
    dir
  }

  private def versionDirs(dir: String): Set[String] =
    store.listNames(dir).filter(_.startsWith("v_")).toSet

  test("rename is metadata-only and round-trips through reads and writes") {
    import spark.implicits._
    val dir = mkTable()
    val before = versionDirs(dir)
    Ingest.renameColumn(dir, "qty", "quantity")
    assert(versionDirs(dir) === before, "rename must mint no version")
    val read = Ingest.readUpsertTable(spark, dir)
    assert(read.columns.toSeq === Seq("id", "name", "quantity"))
    // a later batch written with the NEW name merges into the same
    // physical column
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10)(
      Seq((2L, "v2", 999L)).toDF("id", "name", "quantity"), 1L)
    val got = Ingest.readUpsertTable(spark, dir)
      .select("id", "quantity").as[(Long, Long)].collect().toMap
    assert(got(2L) === 999L && got(3L) === 30L)
    // as-of reads apply the CURRENT mapping (Delta semantics)
    assert(Ingest.readUpsertTable(spark, dir, Some(0L))
      .columns.contains("quantity"))
  }

  test("renamed key column: lookups, merges and DML keep working") {
    import spark.implicits._
    val dir = mkTable()
    Ingest.renameColumn(dir, "id", "doc_id")
    val hit = Ingest.lookupUpsertTable(spark, dir,
      Seq(3L).toDF("doc_id"))
    assert(hit.select("doc_id", "qty").as[(Long, Long)].collect().toSeq ===
      Seq((3L, 30L)))
    Ingest.mergeInto(spark, dir,
      Seq((3L, "m", 333L)).toDF("doc_id", "name", "qty"),
      Seq(Ingest.MatchedUpdate(None, Seq("qty" -> "s.qty"))))
    assert(Ingest.readUpsertTable(spark, dir)
      .filter(col("doc_id") === 3L).head().getLong(2) === 333L)
    val e = intercept[IllegalArgumentException] {
      Ingest.updateWhere(spark, dir, Seq("doc_id" -> "doc_id + 1"),
        "qty > 0")
    }
    assert(e.getMessage.contains("key column"))
  }

  test("drop hides the column everywhere but keeps history bytes") {
    import spark.implicits._
    val dir = mkTable()
    Ingest.dropColumn(dir, "name")
    assert(Ingest.readUpsertTable(spark, dir).columns.toSeq ===
      Seq("id", "qty"))
    // a batch WITHOUT the dropped column commits (sink null-fills the
    // retired physical)
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10)(
      Seq((7L, 70L)).toDF("id", "qty"), 1L)
    assert(Ingest.readUpsertTable(spark, dir).count() === 7L)
    // the physical bytes are still in the files (only the view hides
    // them): a raw read of the current version still carries 'name'
    val vDir = store.listNames(dir).filter(_.startsWith("v_"))
      .filterNot(_.contains(".")).maxBy(_.drop(2).takeWhile(_.isDigit).toLong)
    val raw = spark.read.parquet(s"$dir/$vDir")
    assert(raw.columns.contains("name"))
  }

  test("re-adding a dropped logical name mints a fresh physical column") {
    import spark.implicits._
    val dir = mkTable()
    Ingest.dropColumn(dir, "name")
    // re-add: same logical name, fresh values for two keys only
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10)(
      Seq((1L, "fresh1", 10L), (2L, "fresh2", 20L))
        .toDF("id", "name", "qty"), 1L)
    val got = Ingest.readUpsertTable(spark, dir)
      .select("id", "name").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("fresh1") && got(2L) === Some("fresh2"))
    // old rows must read NULL — resurrecting the pre-drop values
    // would be the corruption the fresh-physical rule prevents
    assert(got(3L).isEmpty && got(6L).isEmpty)
  }

  test("key and sort columns cannot be dropped; collisions are refused") {
    val dir = mkTable(sortCols = Seq("qty"))
    assert(intercept[IllegalArgumentException](
      Ingest.dropColumn(dir, "id")).getMessage.contains("key column"))
    assert(intercept[IllegalArgumentException](
      Ingest.dropColumn(dir, "qty")).getMessage.contains("sort"))
    assert(intercept[IllegalArgumentException](
      Ingest.renameColumn(dir, "name", "qty")).getMessage
      .contains("already exists"))
    assert(intercept[IllegalArgumentException](
      Ingest.renameColumn(dir, "nope", "x")).getMessage
      .contains("no column"))
    // a target equal to a DIFFERENT column's physical name would make
    // logical->physical lookup ambiguous — refused; the own physical
    // name is always a legal target (plain rename-back)
    Ingest.renameColumn(dir, "name", "label")
    assert(intercept[IllegalArgumentException](
      Ingest.renameColumn(dir, "label", "id")).getMessage
      .contains("already exists"))
    Ingest.renameColumn(dir, "label", "name") // back to own physical: ok
    assert(Ingest.readUpsertTable(spark, dir).columns.contains("name"))
  }

  test("rename back to the own physical name clears the mapping") {
    val dir = mkTable()
    Ingest.renameColumn(dir, "qty", "quantity")
    Ingest.renameColumn(dir, "quantity", "qty")
    assert(!store.exists(store.child(dir, "_colmap")) ||
      store.read(store.child(dir, "_colmap")).get.trim.isEmpty)
    assert(Ingest.readUpsertTable(spark, dir).columns.contains("qty"))
  }

  test("renamed sort column: stats-pruned reads and countWhere translate") {
    val dir = mkTable(sortCols = Seq("qty"))
    Ingest.renameColumn(dir, "qty", "quantity")
    val pruned = Ingest.readUpsertTableWhere(spark, dir,
      Seq(("quantity", 10L, 20L)))
    assert(pruned.filter(col("quantity") >= 10 && col("quantity") <= 20)
      .count() === 2L)
    val mc = Ingest.countWhere(spark, dir, Seq(("quantity", 10L, 20L)))
    assert(mc.count === 2L)
    val mm = Ingest.minMaxMeta(spark, dir)
      .getOrElse(fail("manifest-backed table must answer minMaxMeta"))
    assert(mm.columns.toSeq === Seq("min_quantity", "max_quantity"))
    assert(mm.head().getLong(0) === 10L && mm.head().getLong(1) === 60L)
  }

  test("the change feed surfaces logical names") {
    import spark.implicits._
    val dir = mkTable(changeFeed = true)
    Ingest.renameColumn(dir, "qty", "quantity")
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10,
      changeFeed = true)(
      Seq((2L, "v2", 222L)).toDF("id", "name", "quantity"), 1L)
    val feed = Ingest.readTableChanges(spark, dir, 1L, 1L)
    assert(feed.columns.contains("quantity") && !feed.columns.contains("qty"))
    assert(feed.filter(col("_change_type") === "update_postimage")
      .head().getAs[Long]("quantity") === 222L)
  }

  test("OPTIMIZE PURGE COLUMNS reclaims dropped bytes and frees the name") {
    import spark.implicits._
    val dir = mkTable()
    Ingest.dropColumn(dir, "name")
    Ingest.optimizeUpsertTable(spark, dir, purgeColumns = true)
    // the new generation's files physically lack the purged column
    val cur = store.read(store.child(dir, "CURRENT")).get.trim
    val raw = spark.read.parquet(store.child(dir, cur))
    assert(!raw.columns.contains("name"),
      s"purged column still in ${raw.columns.mkString(",")}")
    // values and view unchanged
    assert(Ingest.readUpsertTable(spark, dir).columns.toSeq ===
      Seq("id", "qty"))
    assert(Ingest.readUpsertTable(spark, dir).count() === 6L)
    // the mapping entry is gone and the schema narrowed: re-adding
    // the name is now a PLAIN new column under its own physical name
    assert(!store.exists(store.child(dir, "_colmap")) ||
      store.read(store.child(dir, "_colmap")).get.trim.isEmpty)
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10)(
      Seq((1L, "post", 10L)).toDF("id", "name", "qty"), 1L)
    val got = Ingest.readUpsertTable(spark, dir)
      .select("id", "name").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("post") && got(2L).isEmpty)
    // identity physical, no __2 suffix: the rewritten bucket's files
    // carry the plain name (untouched buckets are links without it —
    // mergeSchema unions across the generation's files)
    val cur2 = store.read(store.child(dir, "CURRENT")).get.trim
    assert(spark.read.option("mergeSchema", "true")
      .parquet(store.child(dir, cur2)).columns.contains("name"))
  }

  test("dead letters surface through the column mapping") {
    import spark.implicits._
    val dir = tmp() + "/q"
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 2, keepVersions = 10,
      constraints = Seq("qty_pos" -> "qty >= 0"), quarantine = true)(
      Seq((1L, "a", 5L), (2L, "b", -1L)).toDF("id", "name", "qty"), 0L)
    Ingest.renameColumn(dir, "qty", "quantity")
    val letters = Ingest.readQuarantine(spark, dir)
    assert(letters.columns.contains("quantity") &&
      !letters.columns.contains("qty"))
    assert(letters.count() === 1L)
    // the no-letters branch shows the same (logical) columns
    val dir2 = tmp() + "/q2"
    Ingest.upsertParquet(dir2, Seq("id"), nBuckets = 2, keepVersions = 10,
      constraints = Seq("qty_pos" -> "qty >= 0"), quarantine = true)(
      Seq((1L, "a", 5L)).toDF("id", "name", "qty"), 0L)
    Ingest.renameColumn(dir2, "qty", "quantity")
    assert(Ingest.readQuarantine(spark, dir2).columns
      .contains("quantity"))
  }

  test("clone carries the column mapping") {
    val dir = mkTable()
    Ingest.renameColumn(dir, "qty", "quantity")
    Ingest.dropColumn(dir, "name")
    val dst = tmp() + "/c"
    Ingest.cloneUpsertTable(spark, dir, dst)
    assert(Ingest.readUpsertTable(spark, dst).columns.toSeq ===
      Seq("id", "quantity"))
  }
}

class ColumnMapSpec extends ColumnMapSuiteBase {
  implicit def store: graft.sources.TableStore = graft.sources.LocalTableStore

  // the SQL route shares the API path; local store only (the commands
  // bind TableStore.local)
  test("GRAFT ALTER RENAME/DROP COLUMN drive the mapping through SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-colmap")
      .toString + "/t"
    Ingest.upsertParquet(dir, Seq("id"), nBuckets = 4, keepVersions = 10)(
      (1L to 3L).map(i => (i, s"v$i", i * 10L)).toDF("id", "name", "qty"),
      0L)
    spark.sql(s"GRAFT ALTER '$dir' RENAME COLUMN qty TO quantity")
    spark.sql(s"GRAFT ALTER '$dir' DROP COLUMN name")
    assert(Ingest.readUpsertTable(spark, dir).columns.toSeq ===
      Seq("id", "quantity"))
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"GRAFT ALTER '$dir' DROP COLUMN id")
    }
    assert(e.getMessage.contains("key column"))
    // the purge pass through SQL: dropped bytes leave the snapshot
    spark.sql(s"GRAFT OPTIMIZE '$dir' PURGE COLUMNS")
    val cur = graft.sources.LocalTableStore
      .read(s"$dir/CURRENT").get.trim
    assert(!spark.read.parquet(s"$dir/$cur").columns.contains("name"))
    assert(Ingest.readUpsertTable(spark, dir).columns.toSeq ===
      Seq("id", "quantity"))
  }
}

class ColumnMapObjectStoreSpec extends ColumnMapSuiteBase {
  private val objStore = new graft.sources.ObjectTableStore
  implicit def store: graft.sources.TableStore = objStore
}

class ColumnMapHadoopSpec extends ColumnMapSuiteBase {
  private val hStore = new graft.sources.HadoopTableStore()
  implicit def store: graft.sources.TableStore = hStore
}
