package graft

/** GraftExtensions: custom expressions reachable from plain SQL entry in
  * a GraftSession-built session (injected via SparkSessionExtensions at
  * session construction — no per-session GraftFunctions.register call).
  */
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extension-injected functions work from SQL entry") {
    val row = spark.sql(
      """SELECT graft_cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       graft_sorted_int_intersect_count(array(1, 3, 5), array(3, 5, 7)) AS n,
        |       graft_sorted_intersect_count(array('a','b','c'), array('b','x')) AS s
        |""".stripMargin).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getInt(1) === 2)
    assert(row.getInt(2) === 1)
  }

  test("lsh signature callable from SQL with and without plane count") {
    val row = spark.sql(
      """SELECT graft_lsh_signature(array(CAST(0.5 AS FLOAT), CAST(-0.2 AS FLOAT))) AS d8,
        |       graft_lsh_signature(array(CAST(0.5 AS FLOAT), CAST(-0.2 AS FLOAT)), 8) AS e8,
        |       graft_lsh_signature(array(CAST(0.5 AS FLOAT), CAST(-0.2 AS FLOAT)), 16) AS p16
        |""".stripMargin).collect().head
    assert(row.getLong(0) === row.getLong(1)) // default = explicit 8
    assert(row.getLong(2) >= 0 && row.getLong(2) < (1L << 16))
    // the 16-plane signature's low 8 bits = the 8-plane signature
    // (plane p's hyperplane depends only on p, not the plane count)
    assert((row.getLong(2) & 0xffL) === row.getLong(0))
  }

  test("expressions handle nulls and empty arrays") {
    val rows = spark.sql(
      """SELECT graft_cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS null_in,
        |       graft_sorted_int_intersect_count(CAST(array() AS ARRAY<INT>), array(1, 2)) AS empty_in
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0))  // null propagates, no NPE
    assert(rows.getInt(1) === 0)
  }
}
