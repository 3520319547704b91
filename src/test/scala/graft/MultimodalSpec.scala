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
}
