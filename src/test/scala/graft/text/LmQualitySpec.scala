package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}

class LmQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("bigram-LM quality equals a driver-local reference model") {
    val toks: Map[Long, Seq[String]] = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val bigrams = toks.values.flatMap(t => t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val c2 = bigrams.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, xs) => w1 -> xs.values.sum }
    val v = toks.values.flatten.toSet.size.toLong
    def score(t: Seq[String]): Option[(Long, Double)] = {
      val bs = t.sliding(2).filter(_.size == 2).toSeq
      if (bs.isEmpty) None
      else {
        val nll = bs.map { p =>
          -math.log((c2((p(0), p(1))) + 1.0) / (c1(p(0)) + v))
        }
        Some((bs.size.toLong,
          BigDecimal(nll.sum / nll.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val got = TextAnalysis.lmQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == toks.size)
    toks.foreach { case (id, t) =>
      val row = got(id)
      assert(row.getLong(1) == t.size, s"doc $id n_tokens")
      score(t) match {
        case None =>
          assert(row.isNullAt(2) && row.isNullAt(3), s"doc $id should be null")
        case Some((nb, s)) =>
          assert(row.getLong(2) == nb, s"doc $id n_bigrams")
          assert(math.abs(row.getDouble(3) - s) <= 1e-6, s"doc $id score ${row.getDouble(3)} vs $s")
      }
    }
    // repetitive text is predictable ⇒ scores vary; sanity: all finite, positive
    got.values.foreach(r => if (!r.isNullAt(3)) assert(r.getDouble(3) > 0))
  }

  // four consumers (two bigram passes, vocab, doc list) of one tokenized
  // frame: the lazy persist must hold actual reads to ONE corpus scan —
  // same FS-statistics measurement as PackingSpec
  test("the corpus parquet is scanned exactly once") {
    def fileBytesRead: Long =
      org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE.get("file").getLong("bytesRead")
    val b0 = fileBytesRead
    Tables.documents(spark, sf).select(sum(length(col("text")))).collect()
    val oneScan = fileBytesRead - b0
    assert(oneScan > 0L)
    val b1 = fileBytesRead
    TextAnalysis.lmQuality(spark, sf).collect()
    val lmScan = fileBytesRead - b1
    assert(lmScan < (oneScan * 1.5).toLong,
      s"text_lm_quality read $lmScan bytes vs $oneScan for one scan")
  }
}
