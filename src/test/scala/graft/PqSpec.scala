package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Pq, VectorOps}
import graft.sources.Tables

/** Product-quantization ANN: code-shape invariants, deterministic
  * training, shortlist-dial recall, and the exactness limit.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every vector encodes to m codes in range, plus its exact norm") {
    val emb = Tables.load(spark, sf, "embeddings")
    val cb = Pq.trainCodebooks(emb)
    // one centroid per surviving (sub, code); never more than m × ks
    assert(cb.count() <= Pq.M.toLong * Pq.Ks)
    assert(cb.groupBy("sub", "code").count().filter(col("count") > 1)
      .count() === 0)
    val codes = Pq.encode(emb, cb)
    assert(codes.count() === emb.count())
    // m codes per vector, each a valid codeword id
    assert(codes.filter(size(col("codes")) =!= Pq.M).count() === 0)
    assert(codes.filter(exists(col("codes"),
      c => c < 0 || c >= Pq.Ks)).count() === 0)
    // the stored norm is the true vector norm
    val n1 = codes.filter(col("vec_id") === 0).head.getAs[Double]("cnorm")
    val want = math.sqrt(
      Tables.load(spark, sf, "embeddings").filter(col("vec_id") === 0)
        .select(explode(col("embedding")).as("x"))
        .agg(sum(col("x").cast("double") * col("x").cast("double")))
        .head.getDouble(0))
    assert(math.abs(n1 - want) < 1e-9)
  }

  test("training is deterministic: two runs produce identical codebooks") {
    val emb = Tables.load(spark, sf, "embeddings")
    def flat() = Pq.trainCodebooks(emb).orderBy("sub", "code")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Float](2).toVector)).toVector
    assert(flat() === flat())
  }

  test("recall rises with shortlist depth and hits 1 at the corpus limit") {
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = VectorOps.topK(emb.filter(col("vec_id") < 10), emb, 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = Pq.trainCodebooks(emb)
    val codes = Pq.encode(emb, cb)
    val recalls = Seq(10, 50, Int.MaxValue).map { s =>
      val got = Pq.searchPq(emb, col("vec_id") < 10, 5, cb, codes, s)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      s -> brute.count(got.contains).toDouble / brute.size
    }
    info(recalls.map { case (s, r) => s"shortlist=$s: $r" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq((s1, r1), (s2, r2)) =>
      assert(r2 >= r1, s"recall dropped from $r1 (s=$s1) to $r2 (s=$s2)")
    }
    // a corpus-wide shortlist reranks every candidate exactly
    assert(recalls.last._2 === 1.0, "corpus-wide shortlist must be exact")
    // the operating point of the q_cosine_topk_pq row
    assert(recalls(1)._2 >= 0.5, s"recall@shortlist=50 = ${recalls(1)._2}")
  }

  test("IVFPQ: recall rises with nProbe; all cells + full shortlist is exact") {
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = VectorOps.topK(emb.filter(col("vec_id") < 10), emb, 5)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = Pq.trainCodebooks(emb)
    val codes = Pq.encode(emb, cb)
    val path = operators.Ivf.ensureIndex(spark, sf)
    val centroids = spark.read.parquet(s"$path/centroids")
    val cells = spark.read.parquet(s"$path/cells")
    // with the SHORTLIST unbounded, nProbe is a pure coverage dial
    // (more cells only add exactly-reranked candidates) — recall is
    // structurally monotone. NB: this does NOT hold at a fixed
    // shortlist: extra candidates compete for the same ADC-ranked
    // slots and mis-ranking can evict true neighbors (measured here:
    // nProbe 2→4 at shortlist=50 DROPPED 0.86→0.80), which is why the
    // two knobs are independent dials, not one.
    val recalls = Seq(2, 4, 16).map { nProbe =>
      val got = Pq.searchIvfPq(emb, col("vec_id") < 10, 5, centroids, cells,
          cb, codes, nProbe, Int.MaxValue)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      nProbe -> brute.count(got.contains).toDouble / brute.size
    }
    info(recalls.map { case (n, r) => s"nProbe=$n: $r" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r2 >= r1, s"recall dropped from $r1 (nProbe=$n1) to $r2 (nProbe=$n2)")
    }
    assert(recalls.last._2 === 1.0,
      "all cells + corpus shortlist must equal brute force")
    // the q_cosine_topk_ivfpq operating point still clears a floor
    val op = Pq.searchIvfPq(emb, col("vec_id") < 10, 5, centroids, cells,
        cb, codes, nProbe = 4, shortlist = 50)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val opRecall = brute.count(op.contains).toDouble / brute.size
    info(s"operating point (nProbe=4, shortlist=50): $opRecall")
    assert(opRecall >= 0.5, s"operating-point recall $opRecall")
  }

  test("exact-limit PQ reports brute-force sims for shared pairs") {
    val emb = Tables.load(spark, sf, "embeddings")
    val bruteSim = VectorOps.topK(emb.filter(col("vec_id") < 10), emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val (cb, codes) = (Pq.trainCodebooks(emb),
      Pq.encode(emb, Pq.trainCodebooks(emb)))
    Pq.searchPq(emb, col("vec_id") < 10, 5, cb, codes, Int.MaxValue)
      .collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(bruteSim.contains(key), s"pair $key not in brute top-5")
        assert(math.abs(bruteSim(key) - r.getDouble(2)) < 1e-9)
      }
  }

  test("codebook retrain at OPTIMIZE drops quantization error after drift") {
    // the measurement behind q_ann_index_pq_optimize's hash gate: the
    // drifted fixture's codebooks were trained on the perturbed
    // batch-0 corpus (a fifth of the vectors reversed, plus ghosts),
    // so the FINAL corpus reconstructs badly under them; retraining
    // from the current live vectors must strictly improve the mean
    // squared reconstruction error — the drift metric a production
    // deployment thresholds to schedule this op.
    val base = graft.Scratch.dir("pq-opt-spec")
    graft.sources.LocalTableStore.deleteTree(base)
    val codesTable = s"$base/codes"
    val (staleCb, _) =
      graft.operators.AnnIndex.buildDriftedPqCodes(spark, sf, codesTable)
    val emb = Tables.load(spark, sf, "embeddings")
    val errStale = Pq.quantizationError(emb, staleCb)
    val fresh = graft.operators.AnnIndex.optimizePqCodes(
      spark, codesTable, emb, batchId = 100L)
    val errFresh = Pq.quantizationError(emb, fresh)
    info(f"quantization MSE: stale=$errStale%.6f retrained=$errFresh%.6f")
    assert(errFresh < errStale,
      s"retrain did not improve quantization error ($errStale -> $errFresh)")
    // and the optimized table now holds codes minted by the NEW
    // codebook for exactly the live corpus (no stale survivor rows)
    val optimized = graft.sources.Ingest.readUpsertTable(spark, codesTable)
    assert(optimized.count() === emb.count())
    val reFresh = Pq.encode(emb, fresh)
    assert(optimized.select("vec_id", "codes")
      .join(reFresh.select(col("vec_id"), col("codes").as("want")), "vec_id")
      .filter(col("codes") =!= col("want")).count() === 0)
  }

  test("stream-codes OPTIMIZE drops logical tombstones and retrains") {
    // the order-safe stream fold (q_stream_ann_pq) accumulates
    // live=false rows; optimizePqCodes' stream leg compacts them
    // physically while retraining the fine quantizer from the live
    // corpus — the same debt-compaction cadence as the IVF stream leg
    import graft.operators.AnnIndex
    import graft.sources.{Ingest, LocalTableStore}
    val emb = Tables.load(spark, sf, "embeddings")
    val staleCb = Pq.trainCodebooks(
      emb.withColumn("embedding", reverse(col("embedding"))))
    val ghosts = emb.filter(col("vec_id") % 11 === 0)
      .withColumn("vec_id", col("vec_id") + 2000000L)
    val liveRows = Pq.encode(emb, staleCb)
      .withColumn("live", lit(true)).withColumn("_bid", lit(0L))
    val deadRows = Pq.encode(ghosts, staleCb)
      .withColumn("live", lit(false)).withColumn("_bid", lit(1L))
    val base = graft.Scratch.dir("pqspec-sopt")
    LocalTableStore.deleteTree(base)
    val codesTable = s"$base/codes"
    Ingest.upsertParquet(codesTable, Seq("vec_id"), nBuckets = 4,
      keepVersions = 1)(liveRows.unionByName(deadRows), 0L)
    assert(Ingest.readUpsertTable(spark, codesTable).count() ===
      emb.count() + ghosts.count())
    val freshCb = AnnIndex.optimizePqCodes(spark, codesTable, emb,
      batchId = 10L)
    val state = Ingest.readUpsertTable(spark, codesTable)
    assert(state.count() === emb.count(), "tombstones not compacted")
    assert(state.filter(!col("live")).count() === 0)
    // codes now minted by the retrained codebook, _bid preserved
    val want = Pq.encode(emb, freshCb)
    assert(state.select("vec_id", "codes")
      .join(want.select(col("vec_id"), col("codes").as("w")), "vec_id")
      .filter(col("codes") =!= col("w")).count() === 0)
    assert(state.filter(col("_bid") =!= 0L).count() === 0)
    // and the retrain beat the reversed-corpus codebooks
    assert(Pq.quantizationError(emb, freshCb) <
      Pq.quantizationError(emb, staleCb))
    // the "corpus == live key set" precondition is ENFORCED, not
    // trusted: a partial corpus would strand live rows coded under
    // the old codebook while the new one is returned
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.optimizePqCodes(spark, codesTable,
        emb.filter(col("vec_id") % 2 === 0), batchId = 11L)
    }
    assert(ex.getMessage.contains("mixed-codebook"), ex.getMessage)
  }
}
