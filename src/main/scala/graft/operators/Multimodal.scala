package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.11): image/audio/video
  * payloads travel as opaque `binary` columns + a typed metadata struct;
  * Parquet stores both natively, so partitioning/pruning work unchanged.
  *
  * Decode comes in two tiers:
  *   - REAL decoders for uncompressed container formats, pure byte
  *     parsing with no codec dependency: RIFF/WAV PCM-16 audio
  *     ([[decodeWav]] — chunk walking, fmt validation, sample
  *     extraction, RMS/ZCR/peak features) and PPM P6 images
  *     ([[decodePpm]] — header parse, per-channel means, luma
  *     histogram; [[resizePpm]] — nearest-neighbour resize that
  *     re-encodes valid P6). Malformed payloads yield null feature
  *     rows, not task failures.
  *   - REAL JPEG decode/resize via the stock JDK's `javax.imageio`
  *     ([[decodeImage]]/[[resizeJpeg]] — headless-safe, no native deps;
  *     VERDICT r2 item 3): decode → width/height/channel means/luma
  *     histogram, nearest-neighbour thumbnail re-encoded as JPEG.
  *   - A STUB for the one genuinely codec-gated format (MP4 video needs
  *     native codecs absent here): [[sampleFramesStub]] keeps the real
  *     distributed shape — per-partition batched processing via
  *     `mapPartitions`, the Scala analogue of `mapInPandas` batch UDFs
  *     — with a byte-level stand-in body. [[decodeStub]] remains as the
  *     documented template for wiring any external decoder.
  * The Spark-side contract (schema, batching, partition parallelism,
  * exact encode→decode roundtrips) is tested in MultimodalSpec.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("meta", MapType(StringType, StringType))))

  /** Build a media table from documents (text bytes standing in for an
    * opaque payload — same plumbing as image/audio bytes).
    */
  def fromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("media_id"),
    col("text").cast("binary").as("payload"),
    concat(lit("text/plain;lang="), col("lang")).as("mime"),
    map(lit("source"), col("source"), lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** Feature-extraction output schema (what a real image/audio decoder
    * would emit: fixed-size feature vector + dimensions).
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder: deterministic fake features (byte histogram over 8
    * buckets, L1-normalized). A real deployment swaps the body for the
    * codec call; the `mapPartitions` batching shape — one decoder init
    * per partition, streamed rows — is the part that matters at scale.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // [decoder init would happen here, once per partition]
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Float](8)
        bytes.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = bytes.length.max(1)
        Row(id, bytes.length, hist.map(_ / n).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling output schema (what a video frame-sampler emits). */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** STUB frame sampler: treats the payload as fixed-size frames and
    * emits every `stride`-th one — the video-pipeline shape (decode →
    * frame-sample) with a byte-chunking stand-in for the codec. One row
    * in, many rows out, per-partition streaming: the same
    * `mapPartitions` batching as [[decodeStub]], but a flatMap.
    */
  def sampleFramesStub(media: DataFrame, frameBytes: Int = 64,
                       stride: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by stride).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          Row(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // REAL decoders: RIFF/WAV (PCM-16) and PPM (P6) — no codec libs
  // needed, just byte parsing. Payload synthesis is deterministic from
  // the media id, so encode→decode roundtrips are exactly checkable.
  // ------------------------------------------------------------------

  /** Build a valid RIFF/WAVE PCM-16 mono payload: a sine tone whose
    * frequency derives from the id. Real WAV bytes — any audio tool can
    * play them.
    */
  def syntheticWav(id: Long, nSamples: Int = 800, sampleRate: Int = 8000): Array[Byte] = {
    val freq = 200.0 + (id % 16) * 50.0
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = math.sin(2.0 * math.Pi * freq * i / sampleRate) * 0.5
      bb.putShort((v * 32767.0).toShort)
      i += 1
    }
    bb.array()
  }

  /** WAV media table: one synthetic tone per document id. */
  def wavMedia(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType))))
    Tables.load(spark, dir, "documents").select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticWav(id), "audio/wav")
      }
    }(enc)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("rms", DoubleType),
    StructField("zero_crossings", IntegerType),
    StructField("peak", DoubleType)))

  /** REAL RIFF/WAV decoder: validates the RIFF/WAVE magic, walks the
    * chunk list to `fmt ` and `data`, extracts PCM-16 samples, and
    * computes audio features (RMS energy, zero-crossing count, peak).
    * A payload that is not a valid PCM-16 WAV yields a null-feature row
    * (id preserved) so corrupt media is filterable, never job-fatal.
    */
  def decodeWav(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        parseWav(bytes) match {
          case Some((rate, channels, samples)) =>
            var sumSq = 0.0; var peak = 0.0; var zc = 0; var i = 0
            while (i < samples.length) {
              val v = samples(i) / 32768.0
              sumSq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (i > 0 && (samples(i - 1) < 0) != (samples(i) < 0)) zc += 1
              i += 1
            }
            val rms = if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length)
            Row(id, rate, channels, samples.length, rms, zc, peak)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** (sampleRate, channels, samples) or None if not a valid PCM-16 WAV.
    * Total: any malformed byte stream returns None (the outer try guards
    * remaining underflow paths) — decode must never fail a task.
    */
  private def parseWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = try {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
    if (tag() != "RIFF") return None
    bb.getInt // riff size (trust actual length instead)
    if (tag() != "WAVE") return None
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      val id = tag()
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None // truncated fmt chunk
          val fmtEnd = bb.position() + size
          val audioFormat = bb.getShort
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort
          if (audioFormat != 1) return None // only raw PCM
          bb.position(fmtEnd)
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort; i += 1 }
          bb.position(bb.position() + (size & 1)) // word-align (RIFF pad)
        case _ =>
          // skip unknown chunk; odd-sized chunks carry a pad byte that is
          // NOT counted in the size field (RIFF word alignment)
          bb.position(math.min(bb.limit(), bb.position() + size + (size & 1)))
      }
    }
    if (rate > 0 && channels > 0 && bits == 16 && samples != null)
      Some((rate, channels, samples))
    else None
  } catch { case _: RuntimeException => None }

  /** Build a valid PPM P6 payload: a deterministic RGB gradient. */
  def syntheticPpm(id: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val pixels = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        pixels(o) = ((x * 255) / math.max(1, w - 1)).toByte
        pixels(o + 1) = ((y * 255) / math.max(1, h - 1)).toByte
        pixels(o + 2) = (id % 256).toByte
        x += 1
      }
      y += 1
    }
    header ++ pixels
  }

  /** PPM media table: one synthetic gradient per document id. */
  def ppmMedia(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType))))
    Tables.load(spark, dir, "documents").select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticPpm(id), "image/x-portable-pixmap")
      }
    }(enc)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("luma_hist", StringType))) // 4 buckets, comma-joined

  /** REAL PPM P6 decoder: parses the ASCII header (magic, dimensions,
    * maxval, comment lines), reads the RGB raster, computes per-channel
    * means and a 4-bucket luminance histogram. Invalid payloads yield
    * null-feature rows.
    */
  def decodePpm(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        parsePpm(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, px)) =>
            var sr = 0.0; var sg = 0.0; var sb = 0.0
            val hist = new Array[Int](4)
            var i = 0
            val n = w * h
            while (i < n) {
              val rr = px(i * 3) & 0xff
              val gg = px(i * 3 + 1) & 0xff
              val bb2 = px(i * 3 + 2) & 0xff
              sr += rr; sg += gg; sb += bb2
              // integer Rec.601 luma — deterministic, no float rounding
              val luma = (299 * rr + 587 * gg + 114 * bb2) / 1000
              hist(math.min(3, luma / 64)) += 1
              i += 1
            }
            Row(id, w, h, sr / n, sg / n, sb / n, hist.mkString(","))
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** (width, height, rgbBytes) or None if not a valid P6. */
  private def parsePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 11) return None
    var pos = 0
    def token(): Option[String] = {
      // skip whitespace and '#' comment lines, then read a token
      while (pos < bytes.length &&
        (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else pos += 1
      }
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      if (pos > start) Some(new String(bytes, start, pos - start, "US-ASCII"))
      else None
    }
    try {
      if (!token().contains("P6")) return None
      val w = token().map(_.toInt).getOrElse(return None)
      val h = token().map(_.toInt).getOrElse(return None)
      val maxval = token().map(_.toInt).getOrElse(return None)
      if (w <= 0 || h <= 0 || maxval != 255) return None
      pos += 1 // single whitespace after maxval
      // bound-check in Long: a malicious 30000x30000 header makes
      // w*h*3 wrap negative in Int and bypass the length guard
      val need = w.toLong * h.toLong * 3L
      if (need > bytes.length.toLong - pos) return None
      Some((w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)))
    } catch { case _: RuntimeException => None }
  }

  /** REAL image resize: nearest-neighbour downsample, re-encoded as a
    * valid P6 payload — the output of this operator decodes with
    * [[decodePpm]] (or any PPM reader). One decoder/encoder pass per
    * row inside the same `mapPartitions` batching.
    */
  def resizePpm(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType))))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        parsePpm(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, px)) =>
            val out = new Array[Byte](outW * outH * 3)
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) {
                val sx = x * w / outW
                val so = (sy * w + sx) * 3
                val o = (y * outW + x) * 3
                out(o) = px(so); out(o + 1) = px(so + 1); out(o + 2) = px(so + 2)
                x += 1
              }
              y += 1
            }
            val header = s"P6\n$outW $outH\n255\n".getBytes("US-ASCII")
            Row(id, header ++ out, "image/x-portable-pixmap")
          // keep the id with a null payload (module convention: corrupt
          // media stays filterable, output cardinality = input)
          case None => Row(id, null, "image/x-portable-pixmap")
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // REAL JPEG decode via the stock JDK (javax.imageio — pure-Java
  // decoder, headless-safe, no native libs). This is the format a real
  // multimodal training pipeline actually reads; PPM above stays as the
  // zero-dependency byte-parsing tier.
  // ------------------------------------------------------------------

  // ImageIO never needs a display for JPEG/PNG, but set headless
  // defensively so AWT can't try to connect to one on an executor.
  private lazy val imageIoReady: Unit =
    System.setProperty("java.awt.headless", "true")

  /** Build a valid JPEG payload: the same deterministic RGB gradient as
    * [[syntheticPpm]], encoded through `ImageIO.write`. Real JPEG bytes —
    * any image tool opens them.
    */
  def syntheticJpeg(id: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    imageIoReady
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255) / math.max(1, w - 1)
        val g = (y * 255) / math.max(1, h - 1)
        val b = (id % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** JPEG media table: one synthetic gradient per document id. Memoized
    * per (session, dir): payload synthesis + encoding is fixture
    * CREATION (in production the JPEG bytes are the input), so the
    * decode-path queries shouldn't re-pay it every invocation.
    */
  def jpegMedia(spark: SparkSession, dir: String): DataFrame =
    jpegMemo.getOrElseUpdate((spark, dir), {
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("media_id", LongType),
        StructField("payload", BinaryType),
        StructField("mime", StringType))))
      Tables.load(spark, dir, "documents").select("doc_id").mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, syntheticJpeg(id), "image/jpeg")
        }
      }(enc).localCheckpoint()
    })

  private val jpegMemo = graft.Memo[(SparkSession, String), DataFrame]()

  /** REAL image decoder for any ImageIO-supported container (JPEG, PNG,
    * BMP, GIF): same feature surface as [[decodePpm]] — dimensions,
    * per-channel means, 4-bucket integer-luma histogram — same
    * `mapPartitions` batching, null-feature rows for undecodable
    * payloads.
    */
  def decodeImage(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      imageIoReady // once per partition, before the decoder loop
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null } // corrupt media: filterable, never job-fatal
        if (img == null) Row(id, null, null, null, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          val hist = new Array[Int](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val rr = (rgb >> 16) & 0xff
              val gg = (rgb >> 8) & 0xff
              val bb = rgb & 0xff
              sr += rr; sg += gg; sb += bb
              val luma = (299 * rr + 587 * gg + 114 * bb) / 1000
              hist(math.min(3, luma / 64)) += 1
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          Row(id, w, h, sr / n, sg / n, sb / n, hist.mkString(","))
        }
      }
    }(enc)
  }

  /** REAL JPEG resize: ImageIO decode → nearest-neighbour downsample
    * (same index arithmetic as [[resizePpm]], so the two tiers produce
    * comparable thumbnails) → re-encode as JPEG. Output decodes with
    * [[decodeImage]] or any image tool.
    */
  def resizeJpeg(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType))))
    media.select("media_id", "payload").mapPartitions { rows =>
      imageIoReady
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
        if (img == null) Row(id, null, "image/jpeg")
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              out.setRGB(x, y, img.getRGB(x * w / outW, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "jpg", bos)
          Row(id, bos.toByteArray, "image/jpeg")
        }
      }
    }(enc)
  }

  /** Audio pipeline surface: synthesize → REAL decode → features.
    * Rows-only (binary formats have no SQL oracle); exact encode→decode
    * roundtrips are asserted in MultimodalSpec.
    */
  val qAudioFeatures: QuerySpec = QuerySpec(
    "q_audio_features",
    None,
    (spark, dir) => {
      decodeWav(wavMedia(spark, dir))
        .select(col("media_id"), col("sample_rate"), col("n_channels"),
          col("n_samples"), round(col("rms"), 6).as("rms"),
          col("zero_crossings"), round(col("peak"), 6).as("peak"))
        .orderBy("media_id")
    })

  /** Image pipeline surface: synthesize → resize 8×8 → REAL decode of
    * the re-encoded thumbnail. Rows-only; roundtrip-tested.
    */
  val qImageFeatures: QuerySpec = QuerySpec(
    "q_image_features",
    None,
    (spark, dir) => {
      decodePpm(resizePpm(ppmMedia(spark, dir), 8, 8))
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"),
          col("luma_hist"))
        .orderBy("media_id")
    })

  /** JPEG pipeline surface: synthesize JPEG → REAL ImageIO decode of the
    * full image → nearest-neighbour resize 8×8 → decode the re-encoded
    * thumbnail. Rows-only (JPEG quantization is codec-internal);
    * MultimodalSpec pins exact dimensions and channel-mean tolerances
    * against the synthetic source.
    */
  val qImageFeaturesJpeg: QuerySpec = QuerySpec(
    "q_image_features_jpeg",
    None,
    (spark, dir) => {
      decodeImage(resizeJpeg(jpegMedia(spark, dir), 8, 8))
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"),
          col("luma_hist"))
        .orderBy("media_id")
    })

  // --- Image perceptual-hash dedup (dHash over the PPM decode path,
  //     banded Hamming pairs via the shared 16-bit-chunk machinery) ---

  /** Patterned PPM corpus for image dedup: payload bytes are a pure
    * function of (doc_id % 40, (doc_id / 40) % 3) — 40 base patterns
    * (hash-mixed grayscale noise) × 3 variants (variant t inverts a
    * 2-column vertical band at x = 4t). Two media rows have BYTE-EQUAL
    * payloads iff those two numbers match, which is what lets the
    * containment contract's oracle derive equal-payload pairs in pure
    * SQL over doc_id arithmetic ([[qImagePhashContain]]); same-pattern
    * different-variant rows are the near-dups the pair query surfaces.
    */
  def patternPpm(id: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val cls = (id % 40).toInt
    val variant = ((id / 40) % 3).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // integer hash mix — deterministic, engine-independent
        var v = cls * 1103515245 + x * 12345 + y * 1013904223
        v ^= (v >>> 13); v *= 196314165; v ^= (v >>> 16)
        var g = v & 0xff
        if (variant > 0 && x >= variant * 4 && x < variant * 4 + 2) g = 255 - g
        val o = (y * w + x) * 3
        px(o) = g.toByte; px(o + 1) = g.toByte; px(o + 2) = g.toByte
        x += 1
      }
      y += 1
    }
    header ++ px
  }

  /** Patterned media table keyed by document id. */
  def patternPpmMedia(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("mime", StringType))))
    Tables.load(spark, dir, "documents").select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, patternPpm(id), "image/x-portable-pixmap")
      }
    }(enc)
  }

  /** 64-bit dHash (difference hash, the standard perceptual image
    * fingerprint): decode → integer Rec.601 grayscale → nearest-
    * neighbour 9×8 grid → bit (y,x) = grid[y][x+1] &gt; grid[y][x].
    * All-integer arithmetic, so the fingerprint is deterministic across
    * engines and runs; invalid payloads yield a null hash (and
    * [[TextOps.hammingPairs64]] never pairs nulls). One mapPartitions
    * decode pass — codecs can't be Expressions; everything after the
    * hash is ordinary columnar work.
    */
  def dhashPpm(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType))))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        parsePpm(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, px)) if w >= 9 && h >= 8 =>
            def gray(sx: Int, sy: Int): Int = {
              val o = (sy * w + sx) * 3
              (299 * (px(o) & 0xff) + 587 * (px(o + 1) & 0xff) +
                114 * (px(o + 2) & 0xff)) / 1000
            }
            var bits = 0L
            var i = 0
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                // nearest-neighbour sample of the 9x8 comparison grid
                if (gray((x + 1) * w / 9, y * h / 8) >
                    gray(x * w / 9, y * h / 8)) bits |= (1L << i)
                i += 1; x += 1
              }
              y += 1
            }
            Row(id, bits)
          case _ => Row(id, null)
        }
      }
    }(enc)
  }

  /** Image near-dup pairs at dHash Hamming ≤ 3 over the patterned
    * corpus — the multimodal × dedup crossover: the SAME pigeonhole
    * chunk join as text simhash, fed by the image decode path.
    * Rows-only (the decode is engine-side); MultimodalSpec pins
    * determinism + discrimination, and [[qImagePhashContain]] is the
    * oracle-checked recall anchor.
    */
  val qImagePhashPairs: QuerySpec = QuerySpec(
    "q_image_phash_pairs",
    None,
    (spark, dir) =>
      TextOps.hammingPairs64(
          dhashPpm(patternPpmMedia(spark, dir))
            .select(col("media_id").as("doc_id"), col("dhash").as("h64")))
        .select(col("doc1").as("id1"), col("doc2").as("id2"), col("hamming"))
        .orderBy("id1", "id2"))

  /** Containment contract for the image dedup family, oracle-checked:
    * byte-equal payloads (md5 over the REAL bytes, the
    * [[qMultimodalMeta]] hashing surface) must all be surfaced by the
    * banded dHash pair generator — identical bytes ⇒ identical dHash ⇒
    * Hamming 0 ⇒ pigeonhole candidate. The oracle derives the
    * equal-payload pair set in pure SQL from the generation invariant
    * (payload = f(doc_id % 40, (doc_id/40) % 3)), so a green row pins
    * the synthetic corpus to its documented model, the decoder/hash
    * determinism, and the pair generator's Hamming-0 recall at once.
    */
  val qImagePhashContain: QuerySpec = QuerySpec(
    "q_image_phash_contain",
    Some("""SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM documents a JOIN documents b
        ON a.doc_id % 40 = b.doc_id % 40
       AND (a.doc_id // 40) % 3 = (b.doc_id // 40) % 3
       AND a.doc_id < b.doc_id
      ORDER BY id1, id2"""),
    (spark, dir) => {
      val media = patternPpmMedia(spark, dir)
      val byMd5 = media.select(col("media_id"), md5(col("payload")).as("m"))
      val eq = byMd5.as("a").join(byMd5.as("b"),
          col("a.m") === col("b.m") && col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      val cands = TextOps.hammingPairs64(
        dhashPpm(media)
          .select(col("media_id").as("doc_id"), col("dhash").as("h64")))
      eq.join(cands,
          eq("id1") === cands("doc1") && eq("id2") === cands("doc2"),
          "left_semi")
        .orderBy("id1", "id2")
    })

  /** SQL-checkable metadata surface over the binary payloads. */
  val qMultimodalMeta: QuerySpec = QuerySpec(
    "q_multimodal_meta",
    Some("""SELECT doc_id AS media_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS payload_md5,
      'text/plain;lang=' || lang AS mime
      FROM documents ORDER BY media_id"""),
    (spark, dir) => {
      fromDocuments(Tables.load(spark, dir, "documents"))
        .select(col("media_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("mime"))
        .orderBy("media_id")
    })

  // ---- MP4 / ISO-BMFF container tier (r13) -------------------------
  //
  // The container format is NOT codec-gated: ISO base-media (MP4) box
  // structure is pure byte parsing — what remained stubbed was only
  // the decode of the compressed access units inside. This tier makes
  // the container real: a minimal writer (deterministic fixture), a
  // box-walking metadata parser (mvhd/hdlr/stbl), and an stbl-driven
  // SAMPLE extractor that emits each access unit's exact bytes via the
  // stsz/stsc/stco chunk-offset mapping — the real "frame sampling" a
  // video pipeline does before handing units to a decoder. Only that
  // last decode step (compressed unit → pixels) still needs codecs and
  // stays the documented stub.

  /** Big-endian u32. */
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One ISO-BMFF box: 4-byte BE size (incl. header) + type + payload. */
  private def mp4Box(tp: String, payload: Array[Byte]): Array[Byte] = {
    val t = tp.getBytes("US-ASCII")
    require(t.length == 4, s"box type must be 4 chars: $tp")
    be32(8L + payload.length) ++ t ++ payload
  }
  private def fullBox(tp: String, version: Int, flags: Int,
                      payload: Array[Byte]): Array[Byte] =
    mp4Box(tp, Array(version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++ payload)

  /** Minimal valid single-track MP4: `ftyp` + `mdat` (the samples,
    * concatenated) + `moov` with a full sample table — stts (constant
    * `delta` ticks per sample), stsc/stco (the chunk layout: samples
    * grouped `samplesPerChunk` at a time, a run-length stsc with a
    * second run for a ragged final chunk — the general mapping the
    * extractor implements), stsz (true per-sample sizes). mdat
    * precedes moov so chunk offsets are known without a second pass
    * (the classic non-faststart layout).
    */
  def buildMp4(samples: Seq[Array[Byte]], timescale: Int = 1000,
               delta: Int = 40, samplesPerChunk: Int = 0): Array[Byte] = {
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val data = samples.foldLeft(Array.emptyByteArray)(_ ++ _)
    val mdat = mp4Box("mdat", data)
    val n = samples.length
    val duration = n.toLong * delta
    val mdatPayloadOff = ftyp.length + 8 // first sample's file offset
    val perChunk = if (samplesPerChunk <= 0) math.max(n, 1) else samplesPerChunk
    val chunks: Seq[Seq[Array[Byte]]] = samples.grouped(perChunk).toSeq
    val chunkOffs: Seq[Long] = chunks
      .scanLeft(mdatPayloadOff.toLong)((off, c) => off + c.map(_.length).sum)
      .dropRight(1)
    // run-length stsc: one run for the full chunks, a second for a
    // ragged final chunk (fewer samples than perChunk)
    val stscRuns: Seq[(Long, Long)] =
      if (chunks.isEmpty) Seq((1L, perChunk.toLong))
      else if (chunks.last.length == perChunk) Seq((1L, perChunk.toLong))
      else if (chunks.length == 1) Seq((1L, chunks.last.length.toLong))
      else Seq((1L, perChunk.toLong),
        (chunks.length.toLong, chunks.last.length.toLong))
    val mvhd = fullBox("mvhd", 0, 0,
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array[Byte](0x01, 0, 0, 0) ++
        new Array[Byte](8) ++ // reserved
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x40000000L)) ++ // identity matrix
        new Array[Byte](24) ++ be32(2)) // predefined + next track id
    val tkhd = fullBox("tkhd", 0, 7,
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(duration) ++
        new Array[Byte](8) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x40000000L)) ++
        be32(0) ++ be32(0)) // width, height (0: non-visual stand-in)
    val mdhd = fullBox("mdhd", 0, 0,
      be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        Array[Byte](0x55, 0xc4.toByte, 0, 0)) // und language
    val hdlr = fullBox("hdlr", 0, 0,
      be32(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12) ++
        Array[Byte](0)) // empty NUL-terminated name
    val vmhd = fullBox("vmhd", 0, 1, new Array[Byte](8))
    val stsd = fullBox("stsd", 0, 0, be32(1) ++
      mp4Box("mp4v", new Array[Byte](8))) // bare entry: 6 reserved + dri
    val stts = fullBox("stts", 0, 0, be32(1) ++ be32(n) ++ be32(delta))
    val stsc = fullBox("stsc", 0, 0, be32(stscRuns.length) ++
      stscRuns.flatMap { case (first, cnt) =>
        be32(first) ++ be32(cnt) ++ be32(1) }.toArray)
    val stsz = fullBox("stsz", 0, 0,
      be32(0) ++ be32(n) ++ samples.flatMap(s => be32(s.length)).toArray)
    val stco = fullBox("stco", 0, 0, be32(chunkOffs.length) ++
      chunkOffs.flatMap(be32).toArray)
    val stbl = mp4Box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = mp4Box("minf", vmhd ++ stbl)
    val mdia = mp4Box("mdia", mdhd ++ hdlr ++ minf)
    val trak = mp4Box("trak", tkhd ++ mdia)
    val moov = mp4Box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Parsed container facts (null-rows for malformed payloads). */
  private case class Mp4Meta(timescale: Long, duration: Long,
                             handler: String, nSamples: Int,
                             sampleSizes: Array[Long],
                             chunkOffsets: Array[Long],
                             stsc: Array[(Long, Long)])

  /** Walk the box tree; tolerate unknown boxes (skip by size). Returns
    * None on any structural violation — truncated box, size < 8,
    * overrun — the malformed-payload degradation MultimodalSpec pins.
    */
  private def walkMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    var timescale = 0L; var duration = 0L; var handler = ""
    var sizes: Array[Long] = null; var offsets: Array[Long] = null
    var stsc: Array[(Long, Long)] = null
    def u32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    def tp(p: Int): String =
      new String(bytes, p, 4, "US-ASCII")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(from: Int, to: Int): Boolean = {
      var p = from
      while (p < to) {
        if (p + 8 > to) return false
        val sz = u32(p)
        if (sz < 8 || p + sz > to) return false
        val t = tp(p + 4)
        val body = p + 8
        // every full-box read below is bounded by the DECLARED box
        // size before touching the payload: a lying entry count (or a
        // truncated fixed-layout box) must degrade to the null-feature
        // row, never read adjacent boxes' bytes or throw out of the
        // task (the documented malformed-payload contract)
        t match {
          case _ if containers(t) => if (!walk(body, p + sz.toInt)) return false
          case "mvhd" =>
            if (sz < 8 + 20) return false
            timescale = u32(body + 12); duration = u32(body + 16)
          case "hdlr" =>
            if (sz < 8 + 12) return false
            handler = tp(body + 8)
          case "stsz" =>
            if (sz < 8 + 12) return false
            val fixed = u32(body + 4); val n = u32(body + 8)
            // a sample occupies ≥ 1 byte, so n can never exceed the
            // payload length — rejects fixed-size boxes whose lying
            // count would otherwise allocate an arbitrary array
            if (n > bytes.length) return false
            if (fixed == 0 && 8 + 12 + 4L * n > sz) return false
            sizes = if (fixed != 0) Array.fill(n.toInt)(fixed)
                    else Array.tabulate(n.toInt)(i => u32(body + 12 + 4 * i))
          case "stco" =>
            if (sz < 8 + 8) return false
            val n = u32(body + 4)
            if (8 + 8 + 4L * n > sz) return false
            offsets = Array.tabulate(n.toInt)(i => u32(body + 8 + 4 * i))
          case "stsc" =>
            if (sz < 8 + 8) return false
            val n = u32(body + 4)
            if (8 + 8 + 12L * n > sz) return false
            stsc = Array.tabulate(n.toInt)(i =>
              (u32(body + 8 + 12 * i), u32(body + 12 + 12 * i)))
          case _ => ()
        }
        p += sz.toInt
      }
      true
    }
    if (bytes == null || bytes.length < 8 || !walk(0, bytes.length)) None
    else if (sizes == null || offsets == null || stsc == null) None
    else Some(Mp4Meta(timescale, duration, handler, sizes.length,
      sizes, offsets, stsc))
  }

  /** (fileOffset, size) of every sample, via the general stsc mapping:
    * each stsc run (firstChunk, samplesPerChunk) applies to chunks
    * [firstChunk, nextRun.firstChunk); within a chunk, sample k starts
    * at chunkOffset + sum of the chunk's earlier sample sizes.
    */
  private def sampleSpans(m: Mp4Meta): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](m.nSamples)
    var s = 0
    var run = 0
    var chunk = 1L
    while (s < m.nSamples && chunk <= m.chunkOffsets.length) {
      while (run + 1 < m.stsc.length && m.stsc(run + 1)._1 <= chunk) run += 1
      val perChunk = m.stsc(run)._2
      var off = m.chunkOffsets(chunk.toInt - 1)
      var k = 0L
      while (k < perChunk && s < m.nSamples) {
        out(s) = (off, m.sampleSizes(s))
        off += m.sampleSizes(s)
        s += 1; k += 1
      }
      chunk += 1
    }
    out
  }

  /** Container metadata schema (what [[parseMp4Meta]] emits). */
  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("duration_ms", LongType),
    StructField("timescale", LongType),
    StructField("handler", StringType),
    StructField("n_samples", LongType),
    StructField("sample_bytes", LongType)))

  /** REAL MP4 container metadata: duration (ms), track handler, sample
    * count and total sample payload from the box tree. Malformed
    * payloads yield a null-feature row, never a task failure — the
    * same degradation as the WAV/PPM/JPEG decoders.
    */
  def parseMp4Meta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mp4MetaSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        walkMp4(r.getAs[Array[Byte]](1)) match {
          case Some(m) =>
            val ms = if (m.timescale == 0) null
                     else java.lang.Long.valueOf(m.duration * 1000L / m.timescale)
            Row(id, ms, m.timescale, m.handler, m.nSamples.toLong,
              m.sampleSizes.sum)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL frame sampling at the container level: emit every `stride`-th
    * sample's exact bytes via the stsz/stsc/stco mapping — one row in,
    * many out, per-partition streaming (the video-pipeline shape). The
    * emitted unit is the codec's compressed access unit; DECODING it to
    * pixels is the one step that still needs native codecs
    * ([[sampleFramesStub]] remains the documented stand-in for that).
    */
  def sampleMp4(media: DataFrame, stride: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        walkMp4(bytes).iterator.flatMap { m =>
          val spans = sampleSpans(m)
          (0 until m.nSamples by stride).iterator.collect {
            case i if spans(i)._1 + spans(i)._2 <= bytes.length =>
              val (off, len) = spans(i)
              Row(id, i, java.util.Arrays.copyOfRange(
                bytes, off.toInt, (off + len).toInt))
          }
        }
      }
    }(enc)
  }

  /** Deterministic MP4 fixture: each document's text bytes packed as
    * 32-byte samples (last partial kept) at 25 fps (40 ms ticks in a
    * 1000-tick timescale) — so every container fact below is a closed
    * form of `octet_length(text)`, which is what lets DuckDB recompute
    * the oracle without parsing MP4.
    */
  def mp4FromDocuments(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id"), col("text").cast("binary").as("b"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val samples = b.grouped(32).toSeq
          Row(id, buildMp4(samples), "video/mp4",
            Map("n_samples" -> samples.length.toString))
        }
      }(enc)
  }

  /** Container round-trip, oracle-checked: build the MP4 per document,
    * parse it BACK through the box walker, and report the facts —
    * which DuckDB derives in closed form from the packing model
    * (n = ceil(len/32) samples, 40 ms each). A hash match pins writer
    * and parser to the same documented container layout.
    */
  val qVideoContainer: QuerySpec = QuerySpec(
    "q_video_container",
    Some("""SELECT doc_id AS media_id,
      CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) * 40
        AS duration_ms,
      'vide' AS handler,
      CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) AS n_samples,
      CAST(octet_length(encode(text)) AS BIGINT) AS sample_bytes
      FROM documents ORDER BY media_id"""),
    (spark, dir) => {
      val media = mp4FromDocuments(Tables.load(spark, dir, "documents"))
      parseMp4Meta(media)
        .select("media_id", "duration_ms", "handler", "n_samples",
          "sample_bytes")
        .orderBy("media_id")
    })

  /** Sample extraction, oracle-checked: every 4th access unit's bytes
    * out of the container via the chunk-offset tables, aggregated per
    * document — count and byte total again closed forms of the packing
    * (selected units are 32 B except a selected final partial). Green
    * = the stsz/stsc/stco arithmetic recovers exactly the units the
    * writer packed, which is the contract a real decoder hand-off
    * depends on.
    */
  val qVideoFrames: QuerySpec = QuerySpec(
    "q_video_frames",
    Some("""WITH f AS (SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS len,
        CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) AS n
        FROM documents)
      SELECT doc_id AS media_id,
        (n - 1) // 4 + 1 AS n_frames,
        CASE WHEN (n - 1) % 4 = 0
          THEN ((n - 1) // 4) * 32 + (len - 32 * (n - 1))
          ELSE ((n - 1) // 4 + 1) * 32 END AS frame_bytes
      FROM f ORDER BY media_id"""),
    (spark, dir) => {
      val media = mp4FromDocuments(Tables.load(spark, dir, "documents"))
      sampleMp4(media, stride = 4)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).as("frame_bytes"))
        .orderBy("media_id")
    })

  def specs: Seq[QuerySpec] =
    Seq(qMultimodalMeta, qAudioFeatures, qImageFeatures, qImageFeaturesJpeg,
      qImagePhashPairs, qImagePhashContain, qVideoContainer, qVideoFrames)
}
