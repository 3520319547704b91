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

  test("jaro-winkler matches the textbook values and conventions") {
    val rows = spark.sql(
      """SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS a,
        |       graft_jaro_winkler('DIXON', 'DICKSONX') AS b,
        |       graft_jaro_winkler('JELLYFISH', 'SMELLYFISH') AS c,
        |       graft_jaro_winkler('aaxxxxxx', 'aayyyyyy') AS d,
        |       graft_jaro_winkler('', '') AS e,
        |       graft_jaro_winkler('abc', '') AS f
        |""".stripMargin).collect().head
    assert(math.abs(rows.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(rows.getDouble(1) - 0.8133333333333332) < 1e-12)
    assert(math.abs(rows.getDouble(2) - 0.8962962962962964) < 1e-12)
    // boost threshold: jaro 0.5 with a 2-char prefix stays UNboosted
    assert(rows.getDouble(3) === 0.5)
    assert(rows.getDouble(4) === 1.0 && rows.getDouble(5) === 0.0)
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
