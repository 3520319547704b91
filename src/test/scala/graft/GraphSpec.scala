package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank: mass conservation, agreement with a driver-side reference
  * implementation on a small graph, and determinism across runs.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edgesDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  /** Driver-side reference: same constants, same update rule. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = adj.size.toDouble
    var ranks = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contribs = scala.collection.mutable.Map.empty[Long, Double]
      for ((u, nbrs) <- adj; share = ranks(u) / nbrs.length; v <- nbrs)
        contribs(v) = contribs.getOrElse(v, 0.0) + share
      ranks = contribs.map { case (v, c) => v -> (0.15 / n + 0.85 * c) }.toMap
    }
    ranks
  }

  test("two symmetric nodes stay at 0.5 each") {
    val out = Graph.pageRank(spark, edgesDf((1L, 2L), (2L, 1L)), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(1L, 2L))
    out.values.foreach(s => assert(math.abs(s - 0.5) < 1e-12))
  }

  test("matches the driver-side reference on a crafted graph") {
    // symmetric core + a hub: node 9 linked to everyone
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L)) ++
      (1L to 4L).map(i => (9L, i))
    val sym = (base ++ base.map(_.swap)).distinct
    val ref = reference(sym, iters = 4)
    val out = Graph.pageRank(spark, edgesDf(sym: _*), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === ref.keySet)
    ref.foreach { case (node, s) =>
      assert(math.abs(out(node) - s) < 1e-12, s"node $node") }
    // mass conservation on a dangling-free graph
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // the hub outranks every spoke
    assert(out(9L) === out.values.max)
  }

  test("deterministic across runs at fixture scale") {
    val a = Graph.qPageRank.run(spark, TestSpark.sf).collect()
    val b = Graph.qPageRank.run(spark, TestSpark.sf).collect()
    assert(a.sameElements(b))
  }
}
