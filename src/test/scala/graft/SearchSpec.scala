package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search
import graft.sources.Tables

/** Behavior of the BM25 retrieval surface beyond the oracle-checked
  * score table: top-k agrees with the full scoring, and scores react to
  * term frequency the way BM25 must.
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))

  test("bm25TopK == head of the fully-scored ordering") {
    val terms = Seq("spark", "vector", "stream")
    val full = Search.bm25(docs, terms)
      .orderBy(col("bm25").desc, col("doc_id")).limit(7)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val topk = Search.bm25TopK(docs, terms, 7)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(full == topk)
    assert(topk.size == 7)
    // descending scores
    assert(topk.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("a rarer term outscores a common one at equal tf (idf ordering)") {
    import spark.implicits._
    // 10 docs share 'common'; 1 also has 'rare' — same dl, tf=1 each
    val t = (1L to 10L).map(i => (i, Seq("common", if (i == 1) "rare" else "pad")))
      .toDF("doc_id", "toks")
    val s = Search.bm25(t, Seq("common", "rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1 scores common+rare; every other doc only common — and the
    // rare term's contribution dominates the shared common one
    assert(s(1L) > s(2L) * 1.5, s.toString)
  }
}
