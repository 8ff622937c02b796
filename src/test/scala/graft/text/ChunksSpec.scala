package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics + plan pins for sliding-window chunking (the value oracle is
  * the driver's DuckDB list-slice re-derivation). */
class ChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  val (chunkTokens, overlap) = (64, 16)
  val stride = chunkTokens - overlap

  lazy val docs: Array[(Long, Seq[String])] =
    graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("[^\\p{L}]+").filter(_.nonEmpty).toSeq))

  lazy val got: Array[(Long, Int, Int, Int, String)] =
    TextAnalysis.chunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))

  test("chunks equal the local sliding-window reference, including the short tail") {
    val want = docs.filter(_._2.nonEmpty).flatMap { case (id, tk) =>
      (0 until tk.length by stride).zipWithIndex.map { case (start, idx) =>
        val ck = tk.slice(start, start + chunkTokens)
        (id, idx, start, ck.length, ck.mkString(" "))
      }
    }.toSet
    assert(got.toSet == want, {
      val g = got.toSet
      s"diff: extra=${(g -- want).take(3)} missing=${(want -- g).take(3)}"
    })
    assert(got.exists(_._4 < chunkTokens), "no short tail chunk — degenerate fixture")
    assert(got.exists(_._2 > 0), "no doc produced more than one chunk")
  }

  test("coverage: every token position of every doc is inside at least one chunk") {
    val byDoc = got.groupBy(_._1)
    docs.filter(_._2.nonEmpty).foreach { case (id, tk) =>
      val covered = byDoc(id).flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == tk.indices.toSet, s"doc $id: coverage hole")
    }
  }

  test("plan: map-only — zero exchanges at any corpus size") {
    val plan = TextAnalysis.chunks(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking should never shuffle:\n${plan.take(1200)}")
  }
}
