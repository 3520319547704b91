package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Linkage

/** Fellegi–Sunter EM linkage: the EM fit on hand-built pattern counts
  * (separated mixtures recovered, degenerate fields clamped, never
  * NaN), and the end-to-end classification's precision/recall shape on
  * the corrupted-customer fixture.
  */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("EM recovers a cleanly separated two-class mixture") {
    // 1000 pairs: 100 true matches agreeing on everything (pattern
    // 111 = 7), 900 non-matches agreeing on nothing (pattern 000 = 0)
    val c = Array(900.0, 0, 0, 0, 0, 0, 0, 100.0)
    val (m, u) = Linkage.emFit(c)
    assert(m.forall(_ > 0.99), m.toSeq.toString)
    assert(u.forall(_ < 0.01), u.toSeq.toString)
  }

  test("EM learns per-field agreement rates, not one global rate") {
    // matches (200): fields 1 and 3 always agree, field 2 agrees in
    // half (pattern 111 vs 101 — both halves carry two agreeing
    // fields, so neither can defect to the non-match class);
    // non-matches (800): nothing agrees
    val c = Array(800.0, 0, 0, 0, 0, 100.0, 0, 100.0)
    val (m, u) = Linkage.emFit(c)
    assert(m(0) > 0.99, s"field 1 always agrees in matches: ${m(0)}")
    assert(math.abs(m(1) - 0.5) < 0.05,
      s"field 2 agrees in half the matches: ${m(1)}")
    assert(m(2) > 0.99, s"field 3 always agrees in matches: ${m(2)}")
    assert(u.forall(_ < 0.01), u.toSeq.toString)
    // the clamp keeps every weight finite even for degenerate fields
    (0 until 3).foreach { f =>
      val w = math.log(m(f) / u(f)) / math.log(2)
      val v = math.log((1 - m(f)) / (1 - u(f))) / math.log(2)
      assert(!w.isNaN && !w.isInfinite && !v.isNaN && !v.isInfinite)
    }
  }

  test("fixture classification: perfect precision, misses only multi-corrupted keys") {
    val rows = Linkage.qLinkageEm.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every link found is a TRUE link (the corrupted copy of itself)
    assert(rows.forall { case (d, k) => d == k }, "no false positives")
    // the misses are exactly the keys corrupted in MULTIPLE fields at
    // once (balance %5 plus segment %7, or balance %5 plus a name
    // pattern): one field's evidence cannot outvote two disagreements
    val missed = (1L to 150L).toSet -- rows.map(_._1).toSet
    assert(missed === Set(35L, 70L, 105L, 140L, 150L), missed.toString)
  }
}
