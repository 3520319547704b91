package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Golden-output regression tests (SURVEY.md §5.2): expected values were
  * produced at sf0.001 and cross-checked against the DuckDB oracle
  * before being frozen here. They guard against silent semantic drift
  * independently of the oracle harness.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("q5 region revenue golden output (sf0.001)") {
    val got = Relational.q5RegionRevenue.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = Seq(
      ("NATION_13", 9789864.51), ("NATION_17", 8722806.21),
      ("NATION_2", 5465875.75), ("NATION_12", 4618758.96),
      ("NATION_8", 4467095.92), ("NATION_18", 4226163.90),
      ("NATION_3", 4178666.13), ("NATION_23", 3075926.33),
      ("NATION_22", 2347515.46), ("NATION_7", 1937622.83))
    assert(got.toSeq === want)
  }

  test("q1 pricing summary golden output (sf0.001)") {
    val got = Relational.q1PricingSummary.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(5),
                 r.getLong(9)))
    val want = Seq(
      ("A", "F", 21365.0, 43168067.43, 843L),
      ("A", "O", 21194.0, 43830903.42, 856L),
      ("N", "F", 24134.0, 49509793.18, 934L),
      ("N", "O", 21907.0, 45275322.24, 869L),
      ("R", "F", 21519.0, 46071803.90, 856L),
      ("R", "O", 21612.0, 44892019.34, 851L))
    assert(got.toSeq === want)
  }
}
