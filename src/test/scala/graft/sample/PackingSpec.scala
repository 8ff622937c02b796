package graft.sample

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def localTruth(seqLen: Long): Map[Long, (Long, Long, Long, Long, Boolean)] = {
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.text.TextAnalysis.tokensCol(col("text"))).cast("bigint").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    counts.map { case (id, n) =>
      val start = cum
      cum += n
      val first = start / seqLen
      val last = if (n > 0) (start + n - 1) / seqLen else first
      id -> (n, start, first, last, last != first)
    }.toMap
  }

  test("two-phase prefix sum equals the sequential fold, any partition count") {
    val want = localTruth(512)
    val got = Packing.packSequences(spark, sf).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    }.toMap
    assert(got == want)
  }

  test("non-power-of-two seqLen: DIV chunk math matches exact integer floor division") {
    val want = localTruth(7)
    val got = Packing.packSequences(spark, sf, seqLen = 7).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    }.toMap
    assert(got == want)
  }

  // The operator's pitch is scan-shaped economics; this pins it. Hadoop FS
  // statistics count only real file reads (shuffle + checkpoint blocks go
  // through the BlockManager, not the Hadoop FS), so the packSequences
  // delta vs a known single full scan measures parquet scans directly.
  test("the corpus parquet is scanned exactly once") {
    def fileBytesRead: Long =
      org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE.get("file").getLong("bytesRead")
    val b0 = fileBytesRead
    Tables.documents(spark, sf).select(sum(length(col("text")))).collect()
    val oneScan = fileBytesRead - b0
    assert(oneScan > 0L)
    val b1 = fileBytesRead
    Packing.packSequences(spark, sf).collect()
    val packScan = fileBytesRead - b1
    assert(packScan < (oneScan * 1.5).toLong,
      s"pack_sequences read $packScan bytes vs $oneScan for one scan — corpus scanned more than once")
  }

  test("token stream is gap-free: starts are contiguous in doc_id order") {
    val rows = Packing.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((_, n1, s1), (_, _, s2)) => assert(s2 == s1 + n1)
      case _ => ()
    }
    assert(rows.head._3 == 0L)
  }
}
