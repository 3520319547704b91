package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Physical proofs for the layout band: the analytic pruning claim in
  * q_zorder_layout, re-checked against ACTUAL parquet row-group
  * skipping (a Z-ordered write must let the reader skip more data for
  * a 2-D range predicate than the linear layout), and the small-file
  * compaction file-count contract.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // populate metrics
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order write prunes more row groups than linear for a 2-D range") {
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(1023L)).cast("long").as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").bitwiseAND(lit(1023L)).as("y"))
    Layout.linearWrite(orders, col("x"), col("y"), s"$base/linear", 48)
    Layout.zorderWrite(orders, col("x"), col("y"), s"$base/zorder", 48)

    // one row group per file at fixture size → the scan metric counts
    // rows of row groups SURVIVING parquet min/max skipping
    val pred = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("x").between(100, 400) && col("y").between(200, 500))
    val linScan = scanOutputRows(pred(spark.read.parquet(s"$base/linear")))
    val zScan = scanOutputRows(pred(spark.read.parquet(s"$base/zorder")))

    // identical answers, cheaper read: the layouts are the same rows
    val linRows = pred(spark.read.parquet(s"$base/linear"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val zRows = pred(spark.read.parquet(s"$base/zorder"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(linRows.sameElements(zRows))
    assert(zScan < linScan,
      s"z-order read $zScan rows, linear $linScan — no pruning win")
  }

  test("compactZorder restores file count AND clustering in one rewrite") {
    val base = java.nio.file.Files.createTempDirectory("compactz").toString
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(1023L)).cast("long").as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").bitwiseAND(lit(1023L)).as("y"))
    val n = orders.count()
    // churned table state: many small files, clustering destroyed
    orders.repartition(97).write.mode("overwrite").parquet(s"$base/churned")
    // the baseline a maintenance pass must beat: same file count,
    // linear (y, x) clustering
    val target = (n + 47) / 48 // → 48 files
    Layout.linearWrite(orders, col("x"), col("y"), s"$base/linear", 48)
    Layout.compactZorder(spark, s"$base/churned", s"$base/restored",
      col("x"), col("y"), target)
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    // post-condition 1: file count back to ceil(n/target)
    assert(dataFiles(s"$base/restored") == ((n + target - 1) / target).toInt)
    val pred = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("x").between(100, 400) && col("y").between(200, 500))
    // post-condition 2: clustering restored — the 2-D probe skips more
    // row groups than the linear layout at the same file count
    val zScan = scanOutputRows(pred(spark.read.parquet(s"$base/restored")))
    val linScan = scanOutputRows(pred(spark.read.parquet(s"$base/linear")))
    assert(zScan < linScan,
      s"restored layout read $zScan rows, linear $linScan — no pruning win")
    // and the rewrite lost nothing
    assert(spark.read.parquet(s"$base/restored").count() == n)
  }

  test("compaction caps file count at ceil(n/target) and keeps all rows") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey")
    val n = orders.count()
    orders.repartition(97).write.mode("overwrite").parquet(s"$base/small")
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles(s"$base/small") == 97)

    val target = 2000L
    Layout.compact(spark, s"$base/small", s"$base/compacted", target)
    val expect = ((n + target - 1) / target).toInt
    assert(dataFiles(s"$base/compacted") == expect,
      s"expected $expect files, got ${dataFiles(s"$base/compacted")}")
    assert(spark.read.parquet(s"$base/compacted").count() == n)
  }

  test("stats manifest prunes the file list, never the answer") {
    import graft.sources.StatsManifest
    val base = java.nio.file.Files.createTempDirectory("manifest").toString
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(1023L)).cast("long").as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").bitwiseAND(lit(1023L)).as("y"))
    val clustered = orders
      .withColumn("zkey", Layout.zkey2(col("x"), col("y")))
      .repartitionByRange(32, col("zkey"))
      .sortWithinPartitions("zkey").drop("zkey")
    StatsManifest.writeWithStats(clustered, s"$base/t", Seq("x", "y"))
    // the manifest is invisible to a plain snapshot read
    val plain = spark.read.parquet(s"$base/t")
    assert(plain.columns.sorted.sameElements(Array("o_orderkey", "x", "y")))
    assert(plain.count() == orders.count())
    // pruning shrinks the file list and preserves the answer exactly
    val pred = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("x").between(100, 400) && col("y").between(200, 500))
    val pruned = pred(StatsManifest.prunedScan(spark, s"$base/t",
      Seq(("x", 100L, 400L), ("y", 200L, 500L))))
    assert(pruned.inputFiles.length < plain.inputFiles.length)
    val want = pred(plain).select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = pruned.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
    // a probe outside every file's box survives NO files and still
    // returns a typed empty frame
    val none = StatsManifest.prunedScan(spark, s"$base/t",
      Seq(("x", 5000L, 6000L)))
    assert(none.schema.fieldNames.contains("o_orderkey"))
    assert(none.count() == 0)
  }
}
