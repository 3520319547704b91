package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Splits
import graft.sources.Tables

class SplitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("hash split is disjoint, exhaustive, stable, and ~80/20") {
    val docs = Tables.load(spark, sf, "documents")
    val (train, test) = Splits.trainTest(docs, "doc_id", testPct = 20)
    val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest === docs.count())
    assert(train.select("doc_id").intersect(test.select("doc_id")).count() === 0)
    // hash split: expect ~20% ± a loose tolerance on 500 rows
    assert(nTest > 50 && nTest < 150, s"test size $nTest")
    // stability: same rows land in the same split on recompute
    val (train2, _) = Splits.trainTest(docs, "doc_id", testPct = 20)
    assert(train2.select("doc_id").exceptAll(train.select("doc_id")).count() === 0)
  }

  test("portable split is disjoint, exhaustive, stable, and ~80/20") {
    val docs = Tables.load(spark, sf, "documents")
    val (train, test) = Splits.trainTestPortable(docs, "doc_id", testPct = 20)
    val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest === docs.count())
    assert(train.select("doc_id").intersect(test.select("doc_id")).count() === 0)
    assert(nTest > 50 && nTest < 150, s"test size $nTest")
    val (train2, _) = Splits.trainTestPortable(docs, "doc_id", testPct = 20)
    assert(train2.select("doc_id").exceptAll(train.select("doc_id")).count() === 0)
  }
}
