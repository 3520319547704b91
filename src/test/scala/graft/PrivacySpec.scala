package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Privacy
import graft.operators.Privacy.QiLevel

/** Privacy-release edge rules the oracle rows can't reach: the empty
  * release (zero equivalence classes is trivially k-anonymous, not an
  * NPE) and ladder determinism on a frame that needs suppression.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ladder = Seq(
    QiLevel(Seq("qb" -> (col("v") / 10).cast("long"))),
    QiLevel(Seq("qb" -> (col("v") / 100).cast("long"))))

  test("kAnonymize on an empty frame releases empty at level 0") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("v")
    val (lvl, out) = Privacy.kAnonymize(empty, ladder, 5L, Seq(col("v")))
    assert(lvl === 0)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("qb", "v", "k_level"))
  }

  test("top-level residual suppression keeps only classes >= k") {
    import spark.implicits._
    // 6 rows in bucket 0 (v 0..5), 1 row alone in bucket 9 (v 999):
    // level 0 min class = 1, level 1 min class = 1 -> top level with
    // suppression; the singleton class vanishes, the big class stays
    val df = ((0L to 5L) :+ 999L).toDF("v")
    val (lvl, out) = Privacy.kAnonymize(df, ladder, 5L, Seq(col("v")))
    assert(lvl === 1)
    val got = out.select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L to 5L))
  }

  test("noisyCounts is deterministic per (seed, group)") {
    import spark.implicits._
    val df = Seq("a", "a", "b").toDF("g")
    val r1 = Privacy.noisyCounts(df, Seq("g"), 1.0, "s").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val r2 = Privacy.noisyCounts(df, Seq("g"), 1.0, "s").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1 === r2)
    val other = Privacy.noisyCounts(df, Seq("g"), 1.0, "t").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1 !== other)
  }
}
