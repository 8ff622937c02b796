package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by batched per-partition functions (the JVM analogue
  * of `mapInPandas` — one decoder instance per partition, rows streamed
  * through it).
  *
  * Decoding is PLUGGABLE via [[Decoder]]: callers hand
  * [[Multimodal.extractFeatures]] any implementation (a JNI image codec, an
  * ONNX audio model, …) and the per-partition open/decode/close lifecycle,
  * schema, partitioning and batch shape stay the same. The default shipped
  * here is [[ByteHistogramDecoder]] — a real (if deliberately simple)
  * decoder of the raw payload bytes, chosen because this container has no
  * image/audio codec libraries; it is deterministic and fully specified, so
  * it is also the oracle surface.
  */

/** Per-partition media decoder. One instance serves a whole partition:
  * [[open]] runs before the first row (codec handles, model weights, native
  * contexts), [[decode]] streams rows through, [[close]] runs after the
  * last row. `dim` is the feature width — Spark needs the schema statically,
  * so it cannot depend on the payload.
  *
  * INSTANCE LIFECYCLE CAVEAT: a Scala `object` decoder deserializes to the
  * shared JVM singleton, so in local (and any multi-core-executor) mode
  * concurrent partitions interleave open()/decode()/close() on ONE instance
  * — fine for stateless decoders like [[ByteHistogramDecoder]], but a codec
  * holding a native handle per instance would see close() from one task
  * mid-decode of another. Decoders with per-instance state must go through
  * [[Multimodal.extractFeaturesWith]], which constructs a FRESH instance
  * per partition from a factory. */
trait Decoder extends Serializable {
  def dim: Int
  def open(): Unit = ()
  def decode(mediaType: String, bytes: Array[Byte]): Array[Float]
  def close(): Unit = ()
}

/** Default [[Decoder]]: 16-bin high-nibble byte histogram of the encoded
  * payload, L1-normalized — shaped exactly like an embedding so every
  * downstream op (storage, search, dedup) is exercised for real. */
object ByteHistogramDecoder extends Decoder {
  val dim = 16
  def decode(mediaType: String, bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xff) >>> 4) += 1f; i += 1 }
    if (bytes.length > 0) { var b = 0; while (b < dim) { bins(b) /= bytes.length; b += 1 } }
    bins
  }
}

/** REAL image codec through the [[Decoder]] seam — `javax.imageio` ships
  * with the JDK (pure-Java PNG/JPEG, headless-safe), so unlike the
  * stand-in histogram this decoder exercises an actual encode→decode round
  * trip: [[Multimodal.syntheticPng]] renders a deterministic RGB recipe
  * into real PNG bytes in one map pass, and this decoder reads them back
  * and reports width/height/per-channel pixel sums. PNG is lossless, so
  * the DECODED stats equal the generating recipe — which is plain modular
  * integer arithmetic DuckDB re-derives from the parquet, making the
  * `mm_image_decode` query fully value-oracled even though no SQL engine
  * can parse a PNG. (JPEG decodes through the same seam; being lossy, its
  * pixel stats are codec-version-dependent, so the spec pins only its
  * lossless properties — dimensions.)
  *
  * Holds per-instance state (the open flag guards the lifecycle contract),
  * so it must be constructed fresh per partition via
  * [[Multimodal.extractFeaturesWith]] — the documented singleton trap.
  * Feature vector: [width, height, sumR, sumG, sumB]; the sums stay below
  * 2²⁴ at the recipe's ≤16×14 dimensions, so every value is exact in
  * Float and the BIGINT casts downstream are lossless. */
class ImageIoDecoder extends Decoder {
  val dim = 5
  private var opened = false
  override def open(): Unit = { opened = true }
  def decode(mediaType: String, bytes: Array[Byte]): Array[Float] = {
    require(opened, "ImageIoDecoder.decode before open(): lifecycle violation")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
  }
  override def close(): Unit = { opened = false }
}

/** REAL audio codec behind the same seam: [[Multimodal.syntheticWav]]
  * writes a deterministic 16-bit mono PCM recipe as genuine RIFF/WAVE
  * bytes, and this decoder parses them back through
  * `javax.sound.sampled.AudioSystem` (a real WAV parser, no audio device
  * needed) and reports sample count / rate / amplitude stats. PCM WAV is
  * lossless, so the decoded stats equal the generating recipe — modular
  * integer arithmetic DuckDB re-derives from `doc_id` alone, the exact
  * `mm_image_decode` device one modality over. Amplitudes are bounded to
  * ±1023 and clips to ≤311 samples, so every reported value stays below
  * 2²⁴ and is exact in Float.
  * Feature vector: [nSamples, sampleRate, sumAbs, maxAbs]. */
class WavDecoder extends Decoder {
  val dim = 4
  private var opened = false
  override def open(): Unit = { opened = true }
  def decode(mediaType: String, bytes: Array[Byte]): Array[Float] = {
    require(opened, "WavDecoder.decode before open(): lifecycle violation")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val raw = in.readAllBytes()
      val n = raw.length / 2
      var i = 0; var sumAbs = 0L; var maxAbs = 0L
      while (i < n) {
        // little-endian signed 16-bit
        val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toLong
        val a = math.abs(s)
        sumAbs += a; if (a > maxAbs) maxAbs = a
        i += 1
      }
      Array(n.toFloat, fmt.getSampleRate, sumAbs.toFloat, maxAbs.toFloat)
    } finally in.close()
  }
  override def close(): Unit = { opened = false }
}

object Multimodal {

  final case class Media(doc_id: Long, media_type: String, bytes: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, features: Array[Float])
  final case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Int,
                         frame_bytes: Array[Byte])

  /** Derive a deterministic fake media table from `documents`: the UTF-8 text
    * bytes stand in for an encoded payload; metadata derives from doc fields. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] =
    mediaProjection(Tables.documents(spark, dir))

  /** The documents→media projection on any frame with the documents schema —
    * including a `readStream` source: every step is a stateless column
    * expression, so the same projection (and [[extractFeatures]] behind it)
    * is the ingest-time feature-extraction twin, parity-spec'd streaming ==
    * batch like the SQ8 encode. */
  def mediaProjection(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("bytes"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"))
      .as[Media]
  }

  /** Feature extraction through any [[Decoder]]: one pass, partition-local,
    * no shuffle; open/close bracket each partition exactly once. close()
    * rides the task-completion listener, NOT iterator exhaustion — a
    * downstream limit() stops pulling mid-partition and a decode() failure
    * aborts the task, and in both cases a native codec handle must still be
    * released. */
  def extractFeatures(media: Dataset[Media],
                      decoder: Decoder = ByteHistogramDecoder): Dataset[MediaFeatures] =
    extractFeaturesWith(media, () => decoder)

  /** [[extractFeatures]] with a per-partition decoder FACTORY: each partition
    * constructs its own instance, so decoders holding per-instance native
    * state (a codec handle, a model context) never see interleaved
    * open/decode/close from concurrent tasks — the shared-singleton trap
    * documented on [[Decoder]]. The factory closure is what ships to
    * executors; keep it free of driver-side heavy state. */
  def extractFeaturesWith(media: Dataset[Media],
                          newDecoder: () => Decoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = newDecoder()
      decoder.open()
      // mapPartitions bodies always execute inside a task; the null guard
      // only covers exotic direct invocation, where leaking a test decoder
      // is acceptable
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      it.map(m => MediaFeatures(m.doc_id, m.media_type,
        m.bytes.length.toLong, decoder.decode(m.media_type, m.bytes)))
    }
  }

  final case class MediaFeatureCounts(doc_id: Long, media_type: String, n_bytes: Long,
                                      b0: Long, b1: Long, b2: Long, b3: Long,
                                      b4: Long, b5: Long, b6: Long, b7: Long,
                                      b8: Long, b9: Long, b10: Long, b11: Long,
                                      b12: Long, b13: Long, b14: Long, b15: Long)

  /** Driver-surface form of [[extractFeatures]] with the default
    * [[ByteHistogramDecoder]]: the same 16-bin high-nibble
    * byte histogram as raw integer counts in scalar columns — exactly
    * comparable by the oracle harness (the L1-normalized Array[Float] form is
    * float-divided and array-typed, which the pandas canonicalizer can't
    * sort). Same per-partition decode pass, no shuffle. */
  def extractFeatureCounts(media: Dataset[Media]): Dataset[MediaFeatureCounts] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bins = new Array[Long](16)
        var i = 0
        while (i < m.bytes.length) { bins((m.bytes(i) & 0xff) >>> 4) += 1L; i += 1 }
        MediaFeatureCounts(m.doc_id, m.media_type, m.bytes.length.toLong,
          bins(0), bins(1), bins(2), bins(3), bins(4), bins(5), bins(6), bins(7),
          bins(8), bins(9), bins(10), bins(11), bins(12), bins(13), bins(14), bins(15))
      }
    }
  }

  /** Frame sampling for video rows: n evenly spaced fixed-size windows of the
    * payload (a real impl samples decoded frames; offsets are the real part). */
  def sampleFrames(media: Dataset[Media], n: Int = 4, frameSize: Int = 32): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val len = m.bytes.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val off = math.min((len.toLong * i / n).toInt, math.max(0, len - 1))
        val end = math.min(off + frameSize, len)
        Frame(m.doc_id, i, off, java.util.Arrays.copyOfRange(m.bytes, off, end))
      }
    }
  }

  final case class ResizedMedia(doc_id: Long, media_type: String, n_bytes: Long,
                                resized_n_bytes: Long, byte_sum: Long,
                                new_width: Int, new_height: Int)

  /** RESIZE — payload thinning to a byte budget: keep every stride-th byte
    * (stride = ceil(n / targetBytes)), rescale the typed metadata by the
    * achieved ratio with INTEGER arithmetic (engine-independent, the
    * pack_sequences DIV lesson). This is the shape of a media resize —
    * bounded output size, metadata kept consistent, one map-only pass — on
    * the opaque stand-in payload; a pixel-aware resample plugs in through
    * the same [[Decoder]] seam as real codecs. The emitted `byte_sum` is an
    * order-independent content checksum so the oracle value-checks the
    * actual kept bytes, not just their count. */
  def resizePayload(media: Dataset[Media], targetBytes: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val n = m.bytes.length
      val stride = math.max(1, (n + targetBytes - 1) / targetBytes)
      var i = 0; var cnt = 0L; var sum = 0L
      while (i < n) { sum += (m.bytes(i) & 0xff); cnt += 1; i += stride }
      val nw = if (n > 0) (m.width.toLong * cnt / n).toInt else 0
      val nh = if (n > 0) (m.height.toLong * cnt / n).toInt else 0
      ResizedMedia(m.doc_id, m.media_type, n.toLong, cnt, sum, nw, nh)
    }
  }

  /** Oracle surface of [[resizePayload]] over the fixture media table. */
  def resize(spark: SparkSession, dir: String): DataFrame =
    resizePayload(mediaTable(spark, dir)).toDF()

  /** Oracle surface of [[sampleFrames]]: frame coordinates plus the md5 of
    * each frame's bytes — value-comparable while keeping the binary payload
    * out of the compare (the payload is ASCII here, so the oracle's VARCHAR
    * substring md5 is byte-identical). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("frame_idx"), col("byte_offset"),
        length(col("frame_bytes")).cast("bigint").as("n_bytes"),
        md5(col("frame_bytes")).as("frame_md5"))
  }

  /** Deterministic RGB image recipe + REAL PNG encode: dimensions
    * 4+id%13 × 4+id%11, channel c of pixel (x,y) =
    * (id·31 + y·w·3 + x·3 + c) mod 256 — plain integer arithmetic the
    * oracle replays in SQL. The returned bytes are genuine PNG
    * (JDK `javax.imageio` writer). */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 13).toInt
    val h = 4 + (docId % 11).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Int = ((docId * 31 + y * w * 3 + x * 3 + c) % 256).toInt
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A media table whose payloads are REAL PNGs (one per document,
    * [[syntheticPng]]): the codec-exercising twin of [[mediaTable]]'s
    * text-bytes stand-in. */
  def imageTable(spark: SparkSession, dir: String): Dataset[Media] =
    imageProjection(Tables.documents(spark, dir))

  /** [[imageTable]] over any documents-shaped frame — including a
    * `readStream` source: the PNG encode is a stateless per-row map, so
    * the same projection (and [[ImageIoDecoder]] behind it) serves
    * ingest-time image decoding, parity-spec'd streaming == batch like
    * the histogram-decoder twin. */
  def imageProjection(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val png = syntheticPng(id)
      Media(id, "image", png, 4 + (id % 13).toInt, 4 + (id % 11).toInt, 0L)
    }
  }

  /** The registered `mm_image_decode` query: encode every document's
    * recipe image to PNG, stream the payloads through [[ImageIoDecoder]]
    * under the per-partition open/decode/close lifecycle, and report the
    * DECODED geometry and per-channel pixel sums — all BIGINT, all equal
    * to the generating recipe because PNG is lossless, hence re-derivable
    * by DuckDB from `documents.doc_id` alone. One map-only pass (encode
    * fuses with decode in the same task); no shuffle. */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeaturesWith(imageTable(spark, dir), () => new ImageIoDecoder).toDF()
    feats.select(col("doc_id"),
      element_at(col("features"), 1).cast("bigint").as("width"),
      element_at(col("features"), 2).cast("bigint").as("height"),
      (element_at(col("features"), 1) * element_at(col("features"), 2))
        .cast("bigint").as("n_pixels"),
      element_at(col("features"), 3).cast("bigint").as("sum_r"),
      element_at(col("features"), 4).cast("bigint").as("sum_g"),
      element_at(col("features"), 5).cast("bigint").as("sum_b"))
  }

  /** Deterministic 16-bit mono PCM clip as REAL RIFF/WAVE bytes: sample i
    * = ((doc_id·7 + i·13) mod 2048) − 1024, nSamples = 100 + doc_id mod
    * 211, rate 8000 Hz — plain integer arithmetic the oracle replays.
    * Written via `javax.sound.sampled.AudioSystem` so the container is a
    * genuine encoder product, not hand-rolled bytes. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = (100 + docId % 211).toInt
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = (((docId * 7 + i * 13L) % 2048) - 1024).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A media table whose payloads are REAL WAV clips (one per document). */
  def audioProjection(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val wav = syntheticWav(id)
      Media(id, "audio", wav, 0, 0, (100 + id % 211) * 1000L / 8000L)
    }
  }

  /** The registered `mm_audio_decode` query: encode every document's PCM
    * recipe to WAV, decode through [[WavDecoder]] under the per-partition
    * lifecycle, and report sample count / rate / amplitude sums — all
    * BIGINT, all equal to the generating recipe because PCM is lossless,
    * hence re-derivable by DuckDB from `doc_id` alone. Map-only; encode
    * and decode fuse in the same task, no shuffle. */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeaturesWith(
      audioProjection(Tables.documents(spark, dir)), () => new WavDecoder).toDF()
    feats.select(col("doc_id"),
      element_at(col("features"), 1).cast("bigint").as("n_samples"),
      element_at(col("features"), 2).cast("bigint").as("sample_rate"),
      element_at(col("features"), 3).cast("bigint").as("sum_abs"),
      element_at(col("features"), 4).cast("bigint").as("max_abs"))
  }

  /** Oracle-friendly summary: per media_type, row/byte counts and mean
    * payload size — exercises the binary column end-to-end with exact ints. */
  def mediaSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(length(col("bytes"))).as("total_bytes"),
        (sum(length(col("bytes"))).cast("double") / count(lit(1))).as("avg_bytes"))
  }
}
