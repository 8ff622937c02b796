package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Test decoder: 2-wide features derived from payload + type, with
  * instrumented lifecycle (local mode ⇒ the singleton is shared, so the
  * atomic counters see every partition's open/close). */
object CountingDecoder extends Decoder {
  import java.util.concurrent.atomic.AtomicInteger
  private val opens = new AtomicInteger(0)
  private val closes = new AtomicInteger(0)
  val dim = 2
  override def open(): Unit = { opens.incrementAndGet(); () }
  def decode(mediaType: String, bytes: Array[Byte]): Array[Float] =
    Array(bytes.length.toFloat, mediaType.length.toFloat)
  override def close(): Unit = { closes.incrementAndGet(); () }
  def counts(): (Int, Int) = (opens.get, closes.get)
  def reset(): Unit = { opens.set(0); closes.set(0) }
}

/** Per-INSTANCE-state decoder (a stand-in for a codec holding one native
  * handle per instance): any decode outside its own open/close bracket, or a
  * second open on the same instance, throws — exactly the failure a shared
  * singleton produces when concurrent partitions interleave lifecycles. */
object HandleDecoder {
  val created = new java.util.concurrent.atomic.AtomicInteger(0)
}
class HandleDecoder extends Decoder {
  val dim = 1
  private var opened = false
  private var closed = false
  override def open(): Unit = {
    require(!opened && !closed, "open() twice on one instance — decoder shared across partitions")
    HandleDecoder.created.incrementAndGet()
    opened = true
  }
  def decode(mediaType: String, bytes: Array[Byte]): Array[Float] = {
    require(opened && !closed, "decode() outside this instance's open/close bracket")
    Array(bytes.length.toFloat)
  }
  override def close(): Unit = {
    require(opened && !closed, "close() without a live open on this instance")
    closed = true
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("ByteHistogramDecoder: deterministic, normalized 16-bin histogram") {
    val bytes = "hello world".getBytes("UTF-8")
    val f1 = ByteHistogramDecoder.decode("image", bytes)
    val f2 = ByteHistogramDecoder.decode("image", bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == ByteHistogramDecoder.dim)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(ByteHistogramDecoder.decode("audio", Array.empty[Byte]).toSeq == Seq.fill(16)(0f))
  }

  test("a custom Decoder plugs into extractFeatures; open/close bracket each partition once") {
    val media = Multimodal.mediaTable(spark, sf).repartition(3)
    val feats = Multimodal.extractFeatures(media, CountingDecoder).collect()
    assert(feats.forall(f => f.features.length == 2 &&
      f.features(0) == f.n_bytes.toFloat && f.features(1) == f.media_type.length.toFloat))
    val (opens, closes) = CountingDecoder.counts()
    assert(opens == 3, s"open() ran $opens times for 3 partitions")
    assert(closes == 3, s"close() ran $closes times for 3 partitions")
  }

  test("close() still runs when a limit stops consuming mid-partition") {
    CountingDecoder.reset()
    val media = Multimodal.mediaTable(spark, sf).repartition(3)
    Multimodal.extractFeatures(media, CountingDecoder).limit(5).collect()
    val (opens, closes) = CountingDecoder.counts()
    assert(opens > 0)
    assert(closes == opens,
      s"decoder leaked: $opens open(s) but only $closes close(s) after a partial read")
  }

  test("extractFeaturesWith constructs a FRESH decoder per partition (stateful-handle safety)") {
    HandleDecoder.created.set(0)
    val media = Multimodal.mediaTable(spark, sf).repartition(4)
    val n = media.count()
    // concurrent partitions on local[*]: a shared singleton would interleave
    // open/decode/close and trip HandleDecoder's per-instance requires
    val feats = Multimodal.extractFeaturesWith(media, () => new HandleDecoder).collect()
    assert(feats.length == n)
    assert(feats.forall(f => f.features.length == 1 && f.features(0) == f.n_bytes.toFloat))
    assert(HandleDecoder.created.get == 4,
      s"expected 4 instances for 4 partitions, got ${HandleDecoder.created.get}")
  }

  test("media table: binary payload + typed metadata for every document") {
    val media = Multimodal.mediaTable(spark, sf).collect()
    assert(media.nonEmpty)
    media.foreach { m =>
      assert(Set("image", "audio", "video").contains(m.media_type))
      assert(m.bytes.nonEmpty)
      assert(m.duration_ms >= 0)
    }
    assert(media.map(_.media_type).distinct.length == 3)
  }

  test("feature extraction preserves rows and emits fixed-width features") {
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(f.n_bytes > 0)
    }
  }

  test("frame sampling: only video rows, n frames, in-bounds windows") {
    val media = Multimodal.mediaTable(spark, sf)
    val nVideo = media.filter(_.media_type == "video").count()
    val frames = Multimodal.sampleFrames(media, n = 4, frameSize = 32).collect()
    assert(frames.length == nVideo * 4)
    frames.groupBy(_.doc_id).values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      fs.foreach(f => assert(f.frame_bytes.length <= 32 && f.frame_bytes.nonEmpty))
    }
  }

  test("resize: stride-exact kept bytes, bounded budget, integer-rescaled metadata") {
    val target = 64
    val media = Multimodal.mediaTable(spark, sf).collect().map(m => m.doc_id -> m).toMap
    val out = Multimodal.resizePayload(Multimodal.mediaTable(spark, sf), target).collect()
    assert(out.length == media.size)
    out.foreach { r =>
      val m = media(r.doc_id)
      val n = m.bytes.length
      val stride = math.max(1, (n + target - 1) / target)
      val kept = m.bytes.indices.by(stride).map(m.bytes(_) & 0xff)
      assert(r.n_bytes == n.toLong)
      assert(r.resized_n_bytes == kept.length.toLong, s"doc ${r.doc_id}")
      assert(r.byte_sum == kept.map(_.toLong).sum, s"doc ${r.doc_id} checksum")
      assert(r.resized_n_bytes <= target, s"doc ${r.doc_id} blew the byte budget")
      assert(r.new_width == (m.width.toLong * kept.length / n).toInt)
      assert(r.new_height == (m.height.toLong * kept.length / n).toInt)
    }
    // the budget binds on this fixture (payloads larger than the target)
    assert(out.exists(r => r.n_bytes > target && r.resized_n_bytes < r.n_bytes))
  }

  test("ImageIoDecoder: REAL PNG round trip — payload is genuine PNG, decoded stats equal the recipe") {
    val ids = Seq(0L, 1L, 7L, 42L, 499L)
    ids.foreach { id =>
      val png = Multimodal.syntheticPng(id)
      // actually a PNG, not a stand-in: the 8-byte signature
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G',
        s"doc $id payload lacks the PNG signature")
      val d = new ImageIoDecoder
      d.open()
      val f = d.decode("image", png)
      d.close()
      val (w, h) = (4 + (id % 13).toInt, 4 + (id % 11).toInt)
      assert(f(0) == w && f(1) == h, s"doc $id decoded ${f(0)}x${f(1)}, recipe ${w}x$h")
      // channel sums from the recipe (PNG is lossless)
      def sum(c: Int): Long = (0 until w * h).map(i => (id * 31 + i * 3 + c) % 256).sum
      assert(f(2).toLong == sum(0) && f(3).toLong == sum(1) && f(4).toLong == sum(2),
        s"doc $id channel sums ${f.drop(2).toSeq} != recipe ${(0 to 2).map(sum)}")
    }
    // lifecycle contract: decode before open must fail loudly
    intercept[IllegalArgumentException](new ImageIoDecoder().decode("image", Multimodal.syntheticPng(1L)))
  }

  test("ImageIoDecoder: JPEG decodes through the same seam (lossy — only dimensions pinned)") {
    val id = 9L
    val (w, h) = (4 + (id % 13).toInt, 4 + (id % 11).toInt)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, (x * 37 + y * 11) % 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val d = new ImageIoDecoder
    d.open()
    val f = d.decode("image", bos.toByteArray)
    assert(f(0) == w && f(1) == h, s"JPEG decoded ${f(0)}x${f(1)}, wrote ${w}x$h")
  }

  test("mm_image_decode: distributed decode equals the recipe for every document") {
    val rows = Multimodal.imageDecode(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (4 + (id % 13).toInt, 4 + (id % 11).toInt)
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getLong(3) == w.toLong * h)
      def sum(c: Int): Long = (0 until w * h).map(i => (id * 31 + i * 3 + c) % 256).sum
      assert(r.getLong(4) == sum(0) && r.getLong(5) == sum(1) && r.getLong(6) == sum(2))
    }
  }

  test("PHashDecoder: 8x8 grid equals a driver-local replay of the scrambled recipe") {
    val ids = Seq(0L, 1L, 7L, 42L, 499L)
    val dec = new PHashDecoder
    dec.open()
    ids.foreach { id =>
      val got = dec.decode("image", Multimodal.phashPng(id, 0))
      val (w, h) = (4 + (id % 13).toInt, 4 + (id % 11).toInt)
      def ch(pos: Long, c: Int): Long = {
        val v = id * 31 + pos * 3 + c
        (v * v / 256 + v) % 256
      }
      val want = (0 until 64).map { t =>
        val x = (t % 8) * w / 8; val y = (t / 8) * h / 8
        val pos = y.toLong * w + x
        (ch(pos, 0) + ch(pos, 1) + ch(pos, 2)).toFloat
      }
      assert(got.toSeq == want, s"doc $id grid mismatch")
    }
    dec.close()
  }

  test("mm_dedup_phash: finds every planted shifted copy; reported pairs verified at hamming <= 3") {
    val pairs = Multimodal.imageDedupPhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    val planted = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 7 == 0)
      .map(id => (id, id + Multimodal.PhashPlantOffset)).toSet
    val got = pairs.map { case (a, b, _) => (a, b) }.toSet
    assert(planted.subsetOf(got),
      s"missed planted pairs: ${(planted -- got).take(3)}")
    pairs.foreach { case (a, b, ham) =>
      assert(a < b && ham >= 0 && ham <= 3, s"bad pair ($a, $b, $ham)")
    }
    // the scrambled base corpus stays perceptually diverse: incidental
    // (non-planted) collisions are a sliver, not a quadratic clique
    assert(got.size - planted.size < nDocs / 10,
      s"${got.size - planted.size} incidental pairs on $nDocs docs — hash degenerating")
  }

  test("WavDecoder: REAL RIFF/WAVE round trip — payload is genuine WAV, decoded stats equal the recipe") {
    val ids = Seq(0L, 1L, 7L, 42L, 499L)
    ids.foreach { id =>
      val wav = Multimodal.syntheticWav(id)
      // actually a WAV container: RIFF....WAVE magic
      assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
        wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
        s"doc $id payload lacks the RIFF/WAVE magic")
      val d = new WavDecoder
      d.open()
      val f = d.decode("audio", wav)
      d.close()
      val n = (100 + id % 211).toInt
      def amp(i: Int): Long = math.abs(((id * 7 + i * 13L) % 2048) - 1024)
      assert(f(0).toLong == n && f(1) == 8000f, s"doc $id: ${f.toSeq}")
      assert(f(2).toLong == (0 until n).map(amp).sum)
      assert(f(3).toLong == (0 until n).map(amp).max)
    }
    intercept[IllegalArgumentException](new WavDecoder().decode("audio", Multimodal.syntheticWav(1L)))
  }

  test("mm_audio_decode: distributed decode equals the recipe for every document") {
    val rows = Multimodal.audioDecode(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (100 + id % 211).toInt
      def amp(i: Int): Long = math.abs(((id * 7 + i * 13L) % 2048) - 1024)
      assert(r.getLong(1) == n && r.getLong(2) == 8000L)
      assert(r.getLong(3) == (0 until n).map(amp).sum)
      assert(r.getLong(4) == (0 until n).map(amp).max)
    }
  }

  test("image decode on arrival: streaming ImageIO pipeline == batch (real-codec ingest twin)") {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = Multimodal.extractFeaturesWith(
        Multimodal.imageTable(spark, sf), () => new ImageIoDecoder).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val in = java.nio.file.Files.createTempDirectory("imgin")
    java.nio.file.Files.copy(new java.io.File(sf, "documents.parquet").toPath,
      in.resolve("documents.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("imgckpt").toString
    val schema = graft.Tables.documents(spark, sf).schema
    val q = Multimodal.extractFeaturesWith(
        Multimodal.imageProjection(spark.readStream.schema(schema).parquet(in.toString)),
        () => new ImageIoDecoder)
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("img_stream").outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("img_stream").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3).toSeq).toMap
    assert(got == batch, "streaming PNG decode must equal the batch pass")
  }

  test("feature extraction on arrival: streaming == batch (stateless ingest twin)") {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
      .map(f => f.doc_id -> ((f.media_type, f.n_bytes, f.features.toSeq))).toMap
    val in = java.nio.file.Files.createTempDirectory("mmin")
    java.nio.file.Files.copy(new java.io.File(sf, "documents.parquet").toPath,
      in.resolve("documents.parquet"))
    val out = java.nio.file.Files.createTempDirectory("mmout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mmckpt").toString
    val schema = graft.Tables.documents(spark, sf).schema
    // the SAME projection + mapPartitions decoder pipeline, on a stream
    val q = Multimodal.extractFeatures(Multimodal.mediaProjection(
        spark.readStream.schema(schema).parquet(in.toString)))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Multimodal.MediaFeatures], _: Long) =>
        ds.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    import org.apache.spark.sql.Encoders
    val streamed = spark.read.schema(Encoders.product[Multimodal.MediaFeatures].schema)
      .parquet(out).as[Multimodal.MediaFeatures](Encoders.product[Multimodal.MediaFeatures]).collect()
      .map(f => f.doc_id -> ((f.media_type, f.n_bytes, f.features.toSeq))).toMap
    assert(streamed == batch)
  }
}
