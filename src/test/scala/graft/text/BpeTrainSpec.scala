package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  /** Driver-local reference: the same greedy BPE training over an
    * in-memory word list. */
  private def referenceTrain(ws: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var merges = Vector.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      ws.foreach { w =>
        val syms = BpeTrain.applyMerges(w, merges.map(m => (m._1, m._2)))
        BpeTrain.pairsOf(syms).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) done = true
        else merges :+= ((best._1._1, best._1._2, best._2))
      }
    }
    merges
  }

  test("hand case: learns the expected merges in order") {
    import spark.implicits._
    // 3 x {"abab", "abc"}: round 1 must merge (a,b) — it appears 3x2+3 = 9
    // times, every other pair at most 3. Round 2 then counts pairs of the
    // REWRITTEN words ([ab,ab] and [ab,c]) — merges building on merged
    // symbols is exactly the data dependence the loop exists for.
    val ws = Seq.fill(3)(Seq("abab", "abc")).flatten
    val ref = referenceTrain(ws, 3)
    assert(ref.head._1 == "a" && ref.head._2 == "b", ref.toString)
    // after merging (a,b): "abab" -> [ab, ab], "abc" -> [ab, c]
    assert(ref(1) == (("ab", "ab", 3L)) || ref(1) == (("ab", "c", 3L)), ref.toString)
  }

  test("bpeApply: distributed memoized apply == driver-local reference, map-only compression") {
    import org.apache.spark.sql.functions.{col, lower}
    val k = 6
    val merges = BpeTrain.trainMerges(spark, sf, k).map(m => (m.left, m.right))
    assert(merges.nonEmpty)
    val got = BpeTrain.bpeApplyWith(spark, sf, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // driver-local reference over the same tokenization
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(got.size == docs.length)
    docs.foreach { case (id, toks) =>
      val want = (toks.length.toLong,
        toks.map(w => BpeTrain.applyMerges(w, merges).length.toLong).sum)
      assert(got(id) == want, s"doc $id: got=${got(id)} want=$want")
    }
    // merges actually fired: subwords strictly below the char count somewhere
    val chars = docs.map(_._2.map(_.length.toLong).sum).sum
    assert(got.values.map(_._2).sum < chars, "no merge ever applied — apply untested")
  }

  test("distributed training equals the driver-local reference on the full fixture") {
    val k = 6
    val got = BpeTrain.trainMerges(spark, sf, k).map(m => (m.left, m.right, m.pair_count))
    val ws = BpeTrain.words(spark, sf).collect().toSeq
    val want = referenceTrain(ws, k)
    assert(got.nonEmpty && got.size == want.size)
    assert(got == want, s"got=$got want=$want")
    // every learned merge must have been worth learning (compositional
    // merges-on-merges are pinned by the hand case; whether the fixture's
    // first k winners are compound is a corpus property, not a contract)
    assert(got.forall(_._3 >= 2))
  }
}
