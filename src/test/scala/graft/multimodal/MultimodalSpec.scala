package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("decodeStub: deterministic, normalized 16-bin histogram") {
    val bytes = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq == Seq.fill(16)(0f))
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
}
