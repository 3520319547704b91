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

  test("budget ledger: composition, replay, immutability, refusal") {
    import spark.implicits._
    implicit val store: graft.sources.TableStore =
      graft.sources.TableStore.local
    val dir = java.nio.file.Files
      .createTempDirectory("privacy-budget").toString + "/ledger"
    val df = Seq("a", "a", "b", "b", "b").toDF("g")

    // no budget pinned -> refused
    intercept[IllegalArgumentException] {
      Privacy.noisyCountsBudgeted(spark, dir, "d", "r1", df, Seq("g"),
        1.0, "s1")
    }
    Privacy.initBudget(spark, dir, "d", 2.5)

    // sequential releases COMPOSE: spent is the sum of epsilons
    val r1 = Privacy.noisyCountsBudgeted(spark, dir, "d", "r1", df,
      Seq("g"), 1.0, "s1").collect().map(_.toString).sorted.toSeq
    assert(Privacy.spentEps(spark, dir, "d") === 1.0)
    Privacy.noisyCountsBudgeted(spark, dir, "d", "r2", df, Seq("g"),
      1.0, "s2")
    assert(Privacy.spentEps(spark, dir, "d") === 2.0)

    // replay of a committed release: identical frame, NO second debit
    val r1b = Privacy.noisyCountsBudgeted(spark, dir, "d", "r1", df,
      Seq("g"), 1.0, "s1").collect().map(_.toString).sorted.toSeq
    assert(r1b === r1)
    assert(Privacy.spentEps(spark, dir, "d") === 2.0)

    // a committed release's identity is immutable
    intercept[IllegalArgumentException] {
      Privacy.noisyCountsBudgeted(spark, dir, "d", "r1", df, Seq("g"),
        0.5, "s1")
    }
    intercept[IllegalArgumentException] {
      Privacy.noisyCountsBudgeted(spark, dir, "d", "r1", df, Seq("g"),
        1.0, "other-seed")
    }

    // exhaustion refuses and charges nothing
    intercept[IllegalStateException] {
      Privacy.noisyCountsBudgeted(spark, dir, "d", "r3", df, Seq("g"),
        1.0, "s3")
    }
    assert(Privacy.spentEps(spark, dir, "d") === 2.0)
    // the remaining 0.5 is still releasable
    Privacy.noisyCountsBudgeted(spark, dir, "d", "r4", df, Seq("g"),
      0.5, "s4")
    assert(Privacy.spentEps(spark, dir, "d") === 2.5)

    // a budget cannot shrink below what is spent; raising is fine
    intercept[IllegalArgumentException] {
      Privacy.initBudget(spark, dir, "d", 2.0)
    }
    Privacy.initBudget(spark, dir, "d", 4.0)
    Privacy.noisyCountsBudgeted(spark, dir, "d", "r5", df, Seq("g"),
      1.0, "s5")
    assert(Privacy.spentEps(spark, dir, "d") === 3.5)

    // datasets have independent budgets in one ledger
    Privacy.initBudget(spark, dir, "e", 1.0)
    assert(Privacy.spentEps(spark, dir, "e") === 0.0)
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
