package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** CDC chunking beyond the value oracle: the fold must equal a
  * driver-local reference chunker on every fixture doc, and the family's
  * defining property must hold — an insertion disturbs only the chunk it
  * lands in, while a fixed-stride framing loses everything after it. */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  val maskMod = 16
  val residue = 4

  private def refChunks(toks: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = List.empty[String]
    toks.foreach { t =>
      cur ::= t
      if (graft.functions.Fnv32.hash(t) % maskMod == residue) { out += cur.reverse.mkString(" "); cur = Nil }
    }
    if (cur.nonEmpty) out += cur.reverse.mkString(" ")
    out.toSeq
  }

  private def chunksOf(texts: Seq[String]): Map[Long, Seq[String]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"),
        CdcChunks.chunksCol(graft.text.TextAnalysis.tokensCol(lower(col("text"))), maskMod, residue).as("cs"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
  }

  test("chunk fold == driver-local reference on every fixture doc (order preserved)") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        CdcChunks.chunksCol(graft.text.TextAnalysis.tokensCol(lower(col("text"))), maskMod, residue).as("cs"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
    docs.foreach { case (id, text) =>
      val want = refChunks(text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq)
      assert(got(id) == want, s"doc $id chunk mismatch")
    }
    assert(got.values.exists(_.length > 1), "no doc split into 2+ chunks — degenerate mask")
  }

  test("insertion locality: one inserted token changes only its own chunk") {
    // pick a fixture doc with several chunks, inject a token mid-doc
    val base = graft.Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq)
      .find(t => refChunks(t).length >= 4).get
    val mid = base.length / 2
    val edited = (base.take(mid) :+ "graftinsertedtoken") ++ base.drop(mid)
    val Seq(a, b) = Seq(base, edited).map(t => refChunks(t))
    val gotMap = chunksOf(Seq(base.mkString(" "), edited.mkString(" ")))
    assert(gotMap(0L) == a && gotMap(1L) == b, "engine fold != reference on the edit pair")
    // CDC: every chunk except the edited one survives byte-identical
    val shared = a.toSet intersect b.toSet
    assert(shared.size >= a.length - 2,
      s"insertion destroyed ${a.length - shared.size} chunks — boundaries not content-defined")
    // the same edit under fixed-stride framing shifts every later window:
    // tail chunks differ, demonstrating what CDC buys
    val stride = 16
    val Seq(fa, fb) = Seq(base, edited).map(_.grouped(stride).map(_.mkString(" ")).toSeq)
    assert((fa.toSet intersect fb.toSet).size < shared.size,
      "fixed framing unexpectedly as stable as CDC on this edit")
  }

  test("census: duplicated chunks are real cross-doc duplicates with exact counts") {
    val rows = CdcChunks.cdcChunkDedup(spark, sf, maskMod, residue).collect()
    assert(rows.nonEmpty, "no duplicated chunks at fixture scale — degenerate")
    rows.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(2) >= r.getLong(1) && r.getLong(3) >= 1)
    }
  }
}
