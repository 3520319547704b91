package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines
  * (SURVEY.md §2.11 adjunct): hash-based, not RNG-based — the split a
  * row lands in depends only on its key, so it is stable across runs,
  * cluster layouts, and incremental re-processing (a re-ingested
  * document lands in the same split it did last month, which RNG
  * `randomSplit` cannot promise).
  */
object Splits {

  /** Bucket in [0, 100) derived from the key column. */
  def splitBucket(key: Column, salt: String = "graft-split-v1"): Column =
    pmod(xxhash64(lit(salt), key), lit(100L))

  /** (train, test) with approximately `testPct`% held out, keyed. */
  def trainTest(df: DataFrame, key: String, testPct: Int): (DataFrame, DataFrame) = {
    val b = splitBucket(col(key))
    (df.filter(b >= testPct), df.filter(b < testPct))
  }

  /** Rows-only check: split sizes + invariants (disjoint, exhaustive). */
  val qTrainTestSplit: QuerySpec = QuerySpec(
    "q_train_test_split",
    None, // engine-specific hash; invariants asserted in SplitsSpec
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val (train, test) = trainTest(docs, "doc_id", testPct = 20)
      train.select(lit("train").as("split"), col("doc_id"))
        .unionByName(test.select(lit("test").as("split"), col("doc_id")))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split")
    })

  def specs: Seq[QuerySpec] = Seq(qTrainTestSplit)
}
