package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, Tables}
import java.nio.file.Files

/** Live JDBC round-trip against an embedded Derby database — the same
  * code path (Spark JDBC source/sink, partition-ranged read) that would
  * face the reference's MySQL tier on :3306; only the URL/driver differ.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("JDBC write + partition-ranged read round-trips the nation table") {
    val db = Files.createTempDirectory("graft-derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val nation = Tables.load(spark, sf, "nation")

    Ingest.writeJdbc(nation, url, "nation", SaveMode.Overwrite)

    // plain read
    val back = Ingest.readJdbc(spark, url, "nation")
    assert(back.count() === nation.count())

    // partition-ranged read: 4 parallel range queries over n_nationkey
    val ranged = Ingest.readJdbc(spark, url, "nation",
      partitionColumn = Some(("n_nationkey", 0L, 25L, 4)))
    assert(ranged.rdd.getNumPartitions === 4)
    val a = ranged.select("n_nationkey", "n_name", "n_regionkey")
    val b = nation.select("n_nationkey", "n_name", "n_regionkey")
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)

    // predicate pushdown into the remote query
    val one = Ingest.readJdbc(spark, url, "nation")
      .filter(col("n_nationkey") === 7)
    assert(one.count() === 1)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(n_nationkey,7)"), p.take(500))
  }
}
