package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GkSketch

/** Direct contracts for the mergeable GK quantile summary (the query
  * path adds the cross-engine oracle; this pins the algorithm itself):
  * rank error within ε·n on adversarial orders, merge-order robustness,
  * serialization round-trip, and the summary-stays-small claim.
  */
class GkQuantileSpec extends AnyFunSuite {

  private val Eps = 0.005
  private val Probes = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Exact rank interval of v in sorted data: [#(x<v)+1, #(x≤v)]. */
  private def rankOk(sorted: Array[Double], v: Double, phi: Double,
                     slackEps: Double): Boolean = {
    val n = sorted.length
    val lo = sorted.count(_ < v) + 1
    val hi = sorted.count(_ <= v)
    val target = phi * n
    val tol = slackEps * n + 1
    hi >= target - tol && lo <= target + tol
  }

  private def checkAll(sk: GkSketch, data: Array[Double],
                       slackEps: Double): Unit = {
    val sorted = data.sorted
    Probes.foreach { q =>
      val est = sk.query(q)
      assert(rankOk(sorted, est, q, slackEps),
        s"phi=$q est=$est n=${data.length} outside rank eps $slackEps")
    }
  }

  private def build(data: Seq[Double], eps: Double = Eps): GkSketch = {
    val sk = new GkSketch(eps)
    data.foreach(sk.insert)
    sk
  }

  test("rank error within eps on random, sorted, reverse, and tied data") {
    val rnd = new scala.util.Random(42)
    val random = Array.fill(60000)(rnd.nextDouble() * 1e6)
    val sorted = random.sorted
    val reversed = sorted.reverse
    val tied = Array.tabulate(60000)(i => (i % 7).toDouble) // 7 values
    Seq(random, sorted, reversed, tied).foreach { data =>
      checkAll(build(data.toSeq), data, Eps)
    }
  }

  test("merge of 8 chunks keeps the bound, in any merge order") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(48000)(rnd.nextDouble() * 1000)
    val chunks = data.grouped(6000).map(c => build(c.toSeq)).toIndexedSeq
    // left fold, right fold, and a shuffled pairing — the bound must
    // hold for every tree shape Spark's partition merge could produce
    val leftFold = chunks.map(cloneSk).reduce((a, b) => a.merge(b))
    val rightFold = chunks.map(cloneSk).reduceRight((a, b) => b.merge(a))
    val shuffled = rnd.shuffle(chunks.map(cloneSk)).reduce((a, b) => a.merge(b))
    // one merge level: headroom 2× build eps (see GkSketch scaladoc)
    Seq(leftFold, rightFold, shuffled).foreach(checkAll(_, data, 2 * Eps))
  }

  test("serialization round-trip preserves queries; summary stays small") {
    val rnd = new scala.util.Random(11)
    val data = Array.fill(60000)(rnd.nextDouble())
    val sk = build(data.toSeq)
    val bytes = GkSketch.toBytes(sk)
    val back = GkSketch.fromBytes(bytes)
    Probes.foreach(q => assert(back.query(q) == sk.query(q)))
    // the summary claim: tuples ≪ n (exact storage would be 60000) and
    // the serialized form is KB-sized, so shipping it is cheap
    assert(sk.size < 6000, s"size=${sk.size}")
    assert(bytes.length < 256 * 1024, s"bytes=${bytes.length}")
  }

  test("tiny inputs: n=1 and all-equal answer exactly") {
    val one = build(Seq(3.5))
    Probes.foreach(q => assert(one.query(q) == 3.5))
    val eq = build(Seq.fill(10000)(2.0))
    Probes.foreach(q => assert(eq.query(q) == 2.0))
  }

  private def cloneSk(sk: GkSketch): GkSketch =
    GkSketch.fromBytes(GkSketch.toBytes(sk))
}
