package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("media table carries payload + typed metadata") {
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "payload", "mime", "meta"))
    val row = media.orderBy("media_id").first()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[String]("mime").startsWith("text/plain;lang="))
    assert(row.getAs[Map[String, String]]("meta").contains("source"))
  }

  test("frame sampler emits every stride-th fixed-size chunk") {
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
    val frames = Multimodal.sampleFramesStub(media, frameBytes = 32, stride = 2)
    assert(frames.schema === Multimodal.frameSchema)
    val byDoc = frames.collect().groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rows =>
      val idxs = rows.map(_.getInt(1)).sorted
      assert(idxs.head === 0)
      assert(idxs.zip(idxs.tail).forall { case (a, b) => b - a == 2 }) // stride
      rows.foreach(r => assert(r.getAs[Array[Byte]](2).length <= 32))
    }
  }

  test("WAV roundtrip: real RIFF decode recovers exactly what was encoded") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 7L)
    val media = Multimodal.wavMedia(spark, sf)
      .filter(col("media_id").isin(ids: _*))
    val feats = Multimodal.decodeWav(media).orderBy("media_id").collect()
    assert(feats.length === ids.length)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000) // sample rate from the fmt chunk
      assert(r.getInt(2) === 1) // mono
      assert(r.getInt(3) === 800) // samples from the data chunk
      // recompute ground truth directly from the generator's samples
      val freq = 200.0 + (id % 16) * 50.0
      val samples = (0 until 800).map(i =>
        (math.sin(2.0 * math.Pi * freq * i / 8000) * 0.5 * 32767.0).toShort)
      val rms = math.sqrt(samples.map(s => math.pow(s / 32768.0, 2)).sum / 800)
      val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(math.abs(r.getDouble(4) - rms) < 1e-12, s"rms id=$id")
      assert(r.getInt(5) === zc, s"zcr id=$id")
    }
    // corrupt payload → null features, id preserved, no task failure
    val bad = Seq((99L, "not a wav".getBytes, "audio/wav"))
      .toDF("media_id", "payload", "mime")
    val badRow = Multimodal.decodeWav(bad).first()
    assert(badRow.getLong(0) === 99L && badRow.isNullAt(1) && badRow.isNullAt(4))
  }

  test("PPM roundtrip: decode recovers the gradient; resize re-encodes valid P6") {
    val media = Multimodal.ppmMedia(spark, sf).filter(col("media_id") === 5L)
    val f = Multimodal.decodePpm(media).first()
    assert(f.getInt(1) === 16 && f.getInt(2) === 12)
    // ground truth for the generator's gradient: mean over x of x*255/(w-1)
    val meanR = (0 until 16).map(x => x * 255 / 15).sum / 16.0
    val meanG = (0 until 12).map(y => y * 255 / 11).sum / 12.0
    assert(f.getDouble(3) === meanR)
    assert(f.getDouble(4) === meanG)
    assert(f.getDouble(5) === 5.0) // blue channel = id % 256 everywhere
    // resized payload is ITSELF a valid P6 the decoder accepts
    val thumb = Multimodal.decodePpm(Multimodal.resizePpm(media, 8, 8)).first()
    assert(thumb.getInt(1) === 8 && thumb.getInt(2) === 8)
    assert(thumb.getDouble(5) === 5.0) // nearest-neighbour preserves channel
    // luma histogram buckets sum to the pixel count
    assert(f.getString(6).split(",").map(_.toInt).sum === 16 * 12)
  }

  test("JPEG roundtrip: stock-JDK ImageIO decode recovers the gradient") {
    import spark.implicits._
    val media = Multimodal.jpegMedia(spark, sf).filter(col("media_id") === 5L)
    val f = Multimodal.decodeImage(media).first()
    // dimensions survive the codec exactly
    assert(f.getInt(1) === 16 && f.getInt(2) === 12)
    // channel means: JPEG is lossy, so compare against the analytic
    // gradient means within a quantization tolerance
    val meanR = (0 until 16).map(x => x * 255 / 15).sum / 16.0
    val meanG = (0 until 12).map(y => y * 255 / 11).sum / 12.0
    assert(math.abs(f.getDouble(3) - meanR) < 10.0, s"mean_r=${f.getDouble(3)}")
    assert(math.abs(f.getDouble(4) - meanG) < 10.0, s"mean_g=${f.getDouble(4)}")
    assert(math.abs(f.getDouble(5) - 5.0) < 10.0, s"mean_b=${f.getDouble(5)}")
    // luma histogram buckets sum to the pixel count
    assert(f.getString(6).split(",").map(_.toInt).sum === 16 * 12)
    // resized payload is ITSELF a valid JPEG the decoder accepts
    val thumb = Multimodal.decodeImage(Multimodal.resizeJpeg(media, 8, 8)).first()
    assert(thumb.getInt(1) === 8 && thumb.getInt(2) === 8)
    assert(thumb.getString(6).split(",").map(_.toInt).sum === 64)
    // decode is deterministic (same codec, same bytes)
    val a = Multimodal.decodeImage(Multimodal.jpegMedia(spark, sf))
      .orderBy("media_id").collect()
    val b = Multimodal.decodeImage(Multimodal.jpegMedia(spark, sf))
      .orderBy("media_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // corrupt payload → null features, id preserved, no task failure
    val bad = Seq((99L, "not a jpeg".getBytes, "image/jpeg"))
      .toDF("media_id", "payload", "mime")
    val badRow = Multimodal.decodeImage(bad).first()
    assert(badRow.getLong(0) === 99L && badRow.isNullAt(1) && badRow.isNullAt(3))
  }

  test("decode stub: distributed batch shape, deterministic features") {
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
      .repartition(4) // prove per-partition processing works
    val feats = Multimodal.decodeStub(media)
    assert(feats.schema === Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("feature")
      assert(f.length === 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3) // L1-normalized histogram
      assert(r.getInt(r.fieldIndex("n_bytes")) > 0)
    }
    // determinism across runs
    val again = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq ===
      again.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq)
  }

  test("dHash: payload-deterministic, discriminating, null on junk") {
    val media = Multimodal.patternPpmMedia(spark, sf)
    val h = Multimodal.dhashPpm(media)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // deterministic: byte-equal payloads (same class+variant) share a hash
    val byKey = h.keys.groupBy(id => (id % 40, (id / 40) % 3))
    byKey.values.filter(_.size > 1).foreach { ids =>
      assert(ids.map(h).toSet.size === 1, s"equal payloads, unequal dhash: $ids")
    }
    // discriminating: the 40 base patterns don't collapse to one hash
    assert(h.values.flatten.toSet.size > 10)
    // junk bytes hash to null, and null never reaches the pair join
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val jh = Multimodal.dhashPpm(junk).collect()
    assert(jh.forall(_.isNullAt(1)))
    assert(graft.operators.TextOps.hammingPairs64(
      Multimodal.dhashPpm(junk)
        .select(col("media_id").as("doc_id"), col("dhash").as("h64"))
    ).count() === 0)
  }

  test("MP4 roundtrip: box walk recovers the written container facts exactly") {
    import spark.implicits._
    // deterministic payloads of assorted lengths (partial last sample,
    // single-sample, exact-multiple) — every container fact is a
    // closed form of the length, asserted below without the closed
    // form (direct byte comparison), so writer and parser cannot
    // share a compensating bug
    val docs = Seq((1L, "a" * 100), (2L, "b" * 32), (3L, "c" * 65))
      .toDF("doc_id", "text")
    val media = Multimodal.mp4FromDocuments(
      docs.withColumn("text", col("text")))
    val meta = Multimodal.parseMp4Meta(media)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(meta(1L) === ((160L, 1000L, "vide", 4L, 100L))) // ceil(100/32)=4
    assert(meta(2L) === ((40L, 1000L, "vide", 1L, 32L)))
    assert(meta(3L) === ((120L, 1000L, "vide", 3L, 65L)))
    // stride-1 extraction recovers the original bytes, in order
    val frames = Multimodal.sampleMp4(media, stride = 1)
      .orderBy("media_id", "frame_idx").collect()
    val rebuilt = frames.filter(_.getLong(0) == 1L)
      .flatMap(_.getAs[Array[Byte]](2))
    assert(new String(rebuilt, "US-ASCII") === "a" * 100,
      "extracted samples must concatenate back to the packed bytes")
    // stride-4: indices 0 only for n=4? 0 and... 0,4? n=4 -> 0 only? no: 0 until 4 by 4 = [0]
    val s4 = Multimodal.sampleMp4(media, stride = 4)
      .filter(col("media_id") === 1L).collect()
    assert(s4.map(_.getInt(1)).toSeq === Seq(0))
  }

  test("MP4 parser: malformed payloads degrade to null rows, junk boxes skip") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),                    // too short
      (2L, "ftypXXXXXXXX".getBytes("US-ASCII")),     // torn box size
      (3L, Array.fill[Byte](64)(0x7f))               // sizes overrun
    ).toDF("media_id", "payload")
      .withColumn("mime", lit("video/mp4"))
      .withColumn("meta", map())
    val rows = Multimodal.parseMp4Meta(junk).collect()
    assert(rows.length === 3)
    assert(rows.forall(_.isNullAt(3)), "malformed payload must null-row")
    assert(Multimodal.sampleMp4(junk).count() === 0)
    // an unknown top-level box before moov is skipped by size, not fatal
    val good = Multimodal.mp4FromDocuments(
      Seq((9L, "x" * 40)).toDF("doc_id", "text"))
      .select("media_id", "payload").as[(Long, Array[Byte])].head()
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val shifted = Seq((9L, free ++ good._2))
      .toDF("media_id", "payload")
      .withColumn("mime", lit("video/mp4"))
      .withColumn("meta", map())
    // NB: stco offsets shift with the prefix, so only META parses; the
    // extractor guards overruns and drops out-of-range samples rather
    // than emitting wrong bytes
    val m = Multimodal.parseMp4Meta(shifted).head()
    assert(m.getString(3) === "vide" && m.getLong(4) === 2L)
    // a structurally-intact sample-table box with a LYING entry count
    // (box size unchanged) must null-row, not read adjacent boxes'
    // bytes or throw out of the task: the count is bounded by the
    // declared box size / payload length before any entry read
    def lied(tag: String, countOff: Int): Array[Byte] = {
      val pat = tag.getBytes("US-ASCII")
      val at = good._2.sliding(4).indexWhere(_.sameElements(pat))
      assert(at > 0, s"$tag box present in the fixture")
      val c = good._2.clone()
      c(at + countOff) = 0x7f.toByte // count MSB -> n ~ 2^31
      c
    }
    val lying = Seq(
      (11L, lied("stsz", 12)), (12L, lied("stco", 8)),
      (13L, lied("stsc", 8)))
      .toDF("media_id", "payload")
      .withColumn("mime", lit("video/mp4"))
      .withColumn("meta", map())
    val lrows = Multimodal.parseMp4Meta(lying).collect()
    assert(lrows.length === 3)
    assert(lrows.forall(_.isNullAt(3)), "lying entry count must null-row")
  }

  test("MP4 multi-chunk layout: general stsc/stco mapping recovers every sample") {
    import spark.implicits._
    // 7 variable-size samples in chunks of 3 -> chunks of 3,3,1 with a
    // two-run stsc (ragged final chunk) — the general mapping, not the
    // single-chunk special case the document fixture uses
    val samples = (1 to 7).map(i => Array.fill[Byte](i * 3)(i.toByte))
    val payload = Multimodal.buildMp4(samples, samplesPerChunk = 3)
    val media = Seq((5L, payload)).toDF("media_id", "payload")
      .withColumn("mime", lit("video/mp4"))
      .withColumn("meta", map())
    val meta = Multimodal.parseMp4Meta(media).head()
    assert(meta.getLong(4) === 7L)
    assert(meta.getLong(5) === samples.map(_.length).sum.toLong)
    val got = Multimodal.sampleMp4(media, stride = 1)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    assert(got.length === 7)
    got.foreach { case (i, bytes) =>
      assert(bytes === samples(i).toSeq, s"sample $i bytes diverge")
    }
    // stride-3 picks exactly indices 0, 3, 6 across chunk boundaries
    assert(Multimodal.sampleMp4(media, stride = 3)
      .select("frame_idx").as[Int].collect().sorted.toSeq === Seq(0, 3, 6))
  }
}
