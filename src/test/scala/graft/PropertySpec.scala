package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Algebraic laws over the engine (SURVEY.md §5.4), sampled from
  * ScalaCheck generators with a fixed seed (no scalatest-plus bridge in
  * the offline cache; sampling keeps runs deterministic anyway). Each
  * case round-trips a Spark job, so samples are few.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  lazy val orders = Tables.load(spark, sf, "orders").cache()

  // the cache MUST be dropped when this suite ends: Spark's cache
  // manager substitutes InMemoryRelation for matching plan fragments
  // SESSION-WIDE, so a leaked cached fixture table silently rewrites
  // every later suite's orders scans (and erases the parquet
  // PushedFilters that PlanSpec asserts on)
  override def afterAll(): Unit = { orders.unpersist(blocking = true); () }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("TopByState selection equals the window's ordering on adversarial doubles") {
    // the heap replaces row_number().over(orderBy(score [DESC|ASC],
    // id)) windows; equivalence must hold on the inputs Spark's SQL
    // ordering makes tricky — NaN (largest, ties NaN), ±0.0 (equal),
    // infinities, exact ties broken by id
    val tricky = Gen.oneOf(
      Gen.const(Double.NaN), Gen.const(0.0), Gen.const(-0.0),
      Gen.const(Double.PositiveInfinity), Gen.const(Double.NegativeInfinity),
      Gen.chooseNum(-3.0, 3.0), Gen.oneOf(1.0, 2.0, 2.0, 3.0))
    val rows = Gen.listOfN(40, Gen.zip(tricky, Gen.chooseNum(0L, 19L)))
    // Spark's SQL total order for doubles: NaN largest, NaN == NaN,
    // -0.0 == 0.0 — the reference the window would have used
    def sqlCompare(a: Double, b: Double): Int =
      if (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)) 0
      else if (java.lang.Double.isNaN(a)) 1
      else if (java.lang.Double.isNaN(b)) -1
      else java.lang.Double.compare(a + 0.0, b + 0.0) // +0.0 folds -0.0
    for {
      input <- samples(rows, 8)
      largest <- Seq(true, false)
      cap <- Seq(1, 3, 7, 100)
    } {
      // reference: full sort under the window's (score, id) order
      val want = input.sortWith { case ((sa, ia), (sb, ib)) =>
        val c = sqlCompare(sa, sb)
        if (c != 0) { if (largest) c > 0 else c < 0 } else ia < ib
      }.take(cap)
      // heap, folded in input order then merged from two halves (the
      // partial-aggregation shape)
      val (h1, h2) = input.splitAt(input.size / 2)
      def fold(xs: Seq[(Double, Long)]) =
        xs.foldLeft(new graft.functions.TopByState(cap, largest)) {
          case (s, (sc, id)) => s.insert(sc, id)
        }
      val got = fold(h1).merge(fold(h2)).result
      def key(p: (Double, Long)) =
        (if (java.lang.Double.isNaN(p._1)) "NaN" else (p._1 + 0.0).toString,
          p._2)
      assert(got.map(key) === want.map(key),
        s"largest=$largest cap=$cap input=$input")
    }
  }

  test("quarantine split is a PARTITION of the batch: disjoint, lossless, correctly blamed") {
    // for random batches against random constraint thresholds:
    // committed state ∪ dead letters = the input's upsert rows,
    // the two sides are disjoint, every dead letter actually violates
    // a pinned constraint, and every committed row violates none
    import spark.implicits._
    val batchGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(-20L, 20L), Gen.chooseNum(-5.0, 5.0)))
    for ((rows0, i) <- samples(batchGen, 4).zipWithIndex) {
      // one row per key (the sink's uniqueness contract)
      val rows = rows0.distinctBy(_._1)
      val table = java.nio.file.Files
        .createTempDirectory("graft-qprop").toString + s"/t$i"
      graft.sources.Ingest.upsertParquet(table, Seq("k"), nBuckets = 2,
        keepVersions = 2,
        constraints = Seq("v_pos" -> "v > 0", "k_nonneg" -> "k >= 0"),
        quarantine = true)(rows.toDF("k", "v"), 0L)
      val state = graft.sources.Ingest.readUpsertTable(spark, table)
        .select("k", "v").as[(Long, Double)].collect().toSet
      val dead = graft.sources.Ingest.readQuarantine(spark, table)
        .select(col("k"), col("v"),
          col(graft.sources.Ingest.QuarantineReasonCol))
        .as[(Long, Double, Seq[String])].collect()
      def violates(k: Long, v: Double): Seq[String] =
        Seq("v_pos" -> !(v > 0), "k_nonneg" -> !(k >= 0))
          .collect { case (n, true) => n }
      // partition: lossless and disjoint
      assert(state ++ dead.map(d => (d._1, d._2)) === rows.toSet,
        s"sample $i lost rows")
      assert(state.map(_._1).intersect(dead.map(_._1).toSet).isEmpty,
        s"sample $i overlaps")
      // blame: exact, both directions
      dead.foreach { case (k, v, why) =>
        assert(why === violates(k, v), s"sample $i blame for ($k,$v)")
      }
      state.foreach { case (k, v) =>
        assert(violates(k, v).isEmpty, s"sample $i committed a violator ($k,$v)")
      }
    }
  }

  test("theta sketch: merge law holds and estimator error stays bounded at small k") {
    // force the estimator-active regime regardless of fixture size:
    // k = 256 over the full lineitem orderkey domain (far above k)
    import graft.operators.Sketches
    val k = 256
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey")).withColumn("pop", lit("all"))
    val direct = Sketches.thetaSketch(li, "pop", "l_orderkey", k)
      .collect().head.getSeq[Long](1)
    val exact = li.select("l_orderkey").distinct().count()
    val est = Sketches.thetaEstimate(direct, k)
    val rel = math.abs(est - exact) / exact
    info(f"theta k=$k: exact=$exact est=$est%.0f rel-err=$rel%.4f")
    assert(rel <= 5.0 / math.sqrt(k), s"estimator error $rel out of bound")
    // merge law at the small k too: 4 chunk folds == the direct build
    val chunks = Sketches.thetaSketch(
      li.withColumn("pop", pmod(col("l_orderkey"), lit(4))),
      "pop", "l_orderkey", k)
      .collect().map(_.getSeq[Long](1)).toSeq
    assert(chunks.reduce(Sketches.thetaMerge(_, _, k)) == direct)
  }

  test("theta column algebra over persisted sketches equals the driver-side algebra") {
    // the SQL-visible surface (thetaMergeAgg / thetaEstimateCol /
    // thetaIntersectCol) must agree with the driver-side fold it
    // mirrors ELEMENT FOR ELEMENT in the merge and exactly in the
    // estimates — same k=256 estimator-active regime as above, two
    // overlapping populations (even keys; keys divisible by 3)
    import graft.operators.Sketches
    val k = 256
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey")
    val popA = li.filter(col("l_orderkey") % 2 === 0)
      .withColumn("pop", lit("even"))
    val popB = li.filter(col("l_orderkey") % 3 === 0)
      .withColumn("pop", lit("by3"))
    // chunked sketches round-trip through parquet (the PERSISTED path)
    val skPath = graft.Scratch.dir("theta-prop") + "/sk"
    Sketches.thetaSketch(
      popA.unionByName(popB).withColumn("g",
        concat_ws("#", col("pop"), pmod(col("l_orderkey"), lit(4)))),
      "g", "l_orderkey", k)
      .write.mode("overwrite").parquet(skPath)
    val merged = spark.read.parquet(skPath)
      .withColumn("pop", substring_index(col("g"), "#", 1))
      .groupBy("pop")
      .agg(Sketches.thetaMergeAgg(col("ks"), k).as("sk"),
        Sketches.thetaEstimateCol(
          Sketches.thetaMergeAgg(col("ks"), k), k).as("est"))
    val bySk = merged.collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getDouble(2))).toMap
    // engine merge == driver direct build, element for element
    def direct(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sketches.thetaSketch(df, "pop", "l_orderkey", k)
        .collect().head.getSeq[Long](1)
    assert(bySk("even")._1 == direct(popA))
    assert(bySk("by3")._1 == direct(popB))
    // engine estimate == driver estimate on the same sample
    assert(bySk("even")._2 === Sketches.thetaEstimate(bySk("even")._1, k))
    assert(bySk("by3")._2 === Sketches.thetaEstimate(bySk("by3")._1, k))
    // engine intersection column == driver thetaOverlap intersection
    val engI = merged.as("a").join(merged.as("b"),
        col("a.pop") === lit("even") && col("b.pop") === lit("by3"))
      .select(Sketches.thetaIntersectCol(col("a.sk"), col("b.sk"), k))
      .head().getDouble(0)
    val (_, _, _, drvI) =
      Sketches.thetaOverlap(bySk("even")._1, bySk("by3")._1, k)
    assert(engI === drvI)
    // and the estimate is actually good: exact |A∩B| = keys % 6 == 0
    val exactI = li.filter(col("l_orderkey") % 6 === 0)
      .distinct().count()
    val exactU = li.filter(
      col("l_orderkey") % 2 === 0 || col("l_orderkey") % 3 === 0)
      .distinct().count()
    assert(math.abs(engI - exactI) <= 5.0 / math.sqrt(k) * exactU,
      s"engine intersection $engI vs exact $exactI (union $exactU)")
  }

  test("filter commutes with projection") {
    for (threshold <- samples(Gen.choose(1000.0, 400000.0), 5)) {
      val a = orders.filter(col("o_totalprice") > threshold)
        .select("o_orderkey").count()
      val b = orders.select("o_orderkey", "o_totalprice")
        .filter(col("o_totalprice") > threshold)
        .select("o_orderkey").count()
      assert(a === b, s"threshold=$threshold")
    }
  }

  test("union-all count = sum of counts; distinct is idempotent") {
    for (k <- samples(Gen.choose(0L, 1500L), 5)) {
      val a = orders.filter(col("o_custkey") < k)
      val b = orders.filter(col("o_custkey") >= k)
      assert(a.union(b).count() === orders.count(), s"k=$k")
    }
    val d = orders.select("o_orderstatus").distinct()
    assert(d.distinct().count() === d.count())
  }

  test("groupBy count sums to table count for any key") {
    for (key <- Seq("o_orderstatus", "o_orderpriority", "o_custkey")) {
      val grouped = orders.groupBy(key).agg(count(lit(1)).as("n"))
        .agg(sum("n")).collect().head.getLong(0)
      assert(grouped === orders.count())
    }
  }
}
