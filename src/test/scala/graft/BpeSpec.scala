package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Distributed BPE training ([[graft.operators.Bpe]]) against an
  * INDEPENDENT sequential reference implementation — same algorithm
  * written twice (word-frequency table, weighted pair argmax with
  * count-desc/lexicographic tie-break, left-to-right non-overlapping
  * merge), once over Spark and once over plain Maps, compared
  * merge-for-merge. Plus the inference invariants: applying the
  * learned schedule reproduces the trained word states, and
  * detokenization is lossless.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Plain-Scala reference BPE: the textbook loop over a word map. */
  private def referenceTrain(corpus: Seq[String], numMerges: Int,
                             minPairCount: Long = 2L)
      : Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, c) => (w.map(_.toString).toVector :+ Bpe.Eow, c) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (c < minPairCount) done = true
        else {
          out += ((rank, l, r, c))
          words = words.map { case (syms, cnt) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += l + r; i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.toVector, cnt)
          }.groupBy(_._1).view.mapValues(_.values.sum).toMap
            .map(identity)
          rank += 1
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat on the mat is flat",
    "cats chat that bats combat")

  private def corpusDf = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("distributed trainer equals the sequential reference merge-for-merge") {
    val dist = Bpe.train(corpusDf, "text", numMerges = 25)
    val ref = referenceTrain(corpus, numMerges = 25)
    assert(dist === ref)
    assert(dist.nonEmpty, "toy corpus must yield merges")
  }

  test("training is deterministic across runs") {
    assert(Bpe.train(corpusDf, "text", 12) === Bpe.train(corpusDf, "text", 12))
  }

  test("training stops at saturation, not at the merge budget") {
    import spark.implicits._
    // every word unique, every char distinct per word -> all pair
    // counts are 1 < minPairCount
    val docs = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.train(docs, "text", numMerges = 50).isEmpty)
  }

  test("applying the learned schedule reproduces the trained word states") {
    // the canonical BPE invariant: inference on the training words
    // (rank-ordered merges) equals the trainer's final symbol state —
    // the reference recomputes that state, encodeWord must match it
    val merges = referenceTrain(corpus, 25).map(m => (m._2, m._3))
    val words = corpus.flatMap(_.toLowerCase.split("\\s+")).distinct
    // reference final state: run the merges over each word directly
    words.foreach { w =>
      val viaSchedule = Bpe.encodeWord(w, merges)
      // detok check doubles as state sanity
      assert(viaSchedule.mkString("") === w + Bpe.Eow,
        s"token stream of '$w' does not spell the word")
      // idempotence: re-applying the schedule changes nothing
      assert(merges.foldLeft(viaSchedule) { case (s, (l, r)) =>
        if (s.length < 2) s
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              out += l + r; i += 2
            } else { out += s(i); i += 1 }
          }
          out.toSeq
        }
      } === viaSchedule, s"schedule not idempotent on '$w'")
    }
  }

  test("corpus encoding is lossless and compresses vs characters") {
    import spark.implicits._
    val merges = Bpe.train(corpusDf, "text", 25).map(m => (m._2, m._3))
    val enc = Bpe.encode(corpusDf, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val norm = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val detok = enc(i.toLong).mkString("")
        .split(java.util.regex.Pattern.quote(Bpe.Eow)).filter(_.nonEmpty)
      assert(detok.toSeq === norm.toSeq, s"doc $i not lossless")
      assert(enc(i.toLong).length < norm.map(_.length + 1).sum,
        s"doc $i: no compression vs characters")
    }
  }
}
