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

  /** The same surface against a REAL MySQL-wire server — the
    * reference's actual tier (mysql-persistent-template.json:23,94).
    * Env-gated: set GRAFT_MYSQL_URL to a full JDBC URL (credentials in
    * the URL, e.g. jdbc:mysql://host:3306/db?user=u&password=p) and
    * put the Connector/J jar on the unmanaged classpath. Without the
    * env var (this container has no MySQL server and zero egress) the
    * test CANCELS — skipped, never failed — so the suite stays green
    * while the path lights up automatically wherever a server exists.
    */
  test("MySQL-wire round-trip (env-gated: GRAFT_MYSQL_URL)") {
    val url = sys.env.get("GRAFT_MYSQL_URL")
    assume(url.nonEmpty, "GRAFT_MYSQL_URL not set — no MySQL server in this environment")
    assume(scala.util.Try(Class.forName("com.mysql.cj.jdbc.Driver")).isSuccess,
      "MySQL Connector/J not on the classpath")
    val nation = Tables.load(spark, sf, "nation")
    Ingest.writeJdbc(nation, url.get, "graft_nation_smoke", SaveMode.Overwrite)
    val back = Ingest.readJdbc(spark, url.get, "graft_nation_smoke",
      partitionColumn = Some(("n_nationkey", 0L, 25L, 4)))
    assert(back.count() === nation.count())
    val a = back.select("n_nationkey", "n_name", "n_regionkey")
    val b = nation.select("n_nationkey", "n_name", "n_regionkey")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    // the real-dialect pushdown check the Derby test proves locally
    val one = Ingest.readJdbc(spark, url.get, "graft_nation_smoke")
      .filter(col("n_nationkey") === 7)
    assert(one.count() === 1)
  }
}
