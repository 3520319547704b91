package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** The hash-ordered PPJoin ([[TextOps.jaccardPairsHashOrdered]]) must be
  * value-identical to the df-dictionary PPJoin ([[TextOps.jaccardPairsOver]]):
  * the prefix-filter theorem holds for ANY global total order, so the two
  * paths are interchangeable and the shingle build may take the cheaper
  * one. Pinned on both the token frame (skewed df — dictionary's home
  * turf) and the shingle frame (flat df — hash order's home turf).
  */
class PpjoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def tokenFrame: DataFrame =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(split(trim(col("text")), " +")).as("toks"))

  private def shingleFrame: DataFrame =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(TextOps.shingles(split(trim(col("text")), " +"))).as("toks"))

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc1"), col("doc2"), round(col("jaccard"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("hash-ordered == dictionary-ordered on token sets (skewed df)") {
    val dict = asSet(TextOps.jaccardPairsOver(tokenFrame, 0.9))
    val hash = asSet(TextOps.jaccardPairsHashOrdered(tokenFrame, 0.9))
    assert(dict.nonEmpty, "fixture must contain near-dup token pairs")
    assert(hash == dict,
      s"missing=${(dict -- hash).take(5)} extra=${(hash -- dict).take(5)}")
  }

  test("hash-ordered == dictionary-ordered on shingle sets (flat df)") {
    val dict = asSet(TextOps.jaccardPairsOver(shingleFrame, 0.95))
    val hash = asSet(TextOps.jaccardPairsHashOrdered(shingleFrame, 0.95))
    assert(dict.nonEmpty, "fixture must contain near-dup shingle pairs")
    assert(hash == dict,
      s"missing=${(dict -- hash).take(5)} extra=${(hash -- dict).take(5)}")
  }
}
