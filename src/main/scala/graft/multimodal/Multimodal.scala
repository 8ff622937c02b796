package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by batched per-partition functions (the JVM analogue
  * of `mapInPandas` — one decoder instance per partition, rows streamed
  * through it).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — schema, batch
  * shape, partitioning, feature/frame signatures — is the real pipeline and
  * is tested. Swapping in a real decoder changes only the stub body.
  */
object Multimodal {

  final case class Media(doc_id: Long, media_type: String, bytes: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, features: Array[Float])
  final case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Int,
                         frame_bytes: Array[Byte])

  /** Derive a deterministic fake media table from `documents`: the UTF-8 text
    * bytes stand in for an encoded payload; metadata derives from doc fields. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("bytes"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"))
      .as[Media]
  }

  /** STUB decoder: a real implementation would decode image/audio bytes; the
    * fake produces a deterministic 16-bin byte histogram, L1-normalized —
    * shaped exactly like an embedding so downstream ops are real. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xff) >>> 4) += 1f; i += 1 }
    if (bytes.length > 0) { var b = 0; while (b < 16) { bins(b) /= bytes.length; b += 1 } }
    bins
  }

  /** Feature extraction: one pass, partition-local, no shuffle. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition "decoder" init happens here (codec handles, model, …)
      it.map(m => MediaFeatures(m.doc_id, m.media_type, m.bytes.length.toLong,
        decodeStub(m.bytes)))
    }
  }

  final case class MediaFeatureCounts(doc_id: Long, media_type: String, n_bytes: Long,
                                      b0: Long, b1: Long, b2: Long, b3: Long,
                                      b4: Long, b5: Long, b6: Long, b7: Long,
                                      b8: Long, b9: Long, b10: Long, b11: Long,
                                      b12: Long, b13: Long, b14: Long, b15: Long)

  /** Driver-surface form of [[extractFeatures]]: the same 16-bin high-nibble
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
