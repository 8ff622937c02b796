package graft.sample

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Greedy k-center beyond the value oracle: the distributed pick sequence
  * must equal a driver-local reference greedy on the same (rounded)
  * cosines, and the cover-cosine trace must be monotone (the greedy's
  * defining invariant: later picks are never farther from cover than
  * earlier ones). */
class KCenterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val d = na * nb
    if (d == 0.0) 0.0
    else BigDecimal(dot / math.sqrt(d)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("sample_kcenter == driver-local reference greedy; cover trace monotone") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val k = 8
    // reference greedy on rounded cosines with the vec_id tie-break
    var picks = Vector((1, vecs.head._1, Option.empty[Double]))
    var mc = scala.collection.mutable.Map.empty[Long, Double]
    vecs.tail.foreach { case (id, e) => mc(id) = cos6(e, vecs.head._2) }
    val byId = vecs.toMap
    for (r <- 2 to k) {
      val (pid, pmc) = mc.toSeq.minBy { case (id, c) => (c, id) }
      picks :+= ((r, pid, Some(pmc)))
      mc.remove(pid)
      if (r < k) {
        val pe = byId(pid)
        mc.keys.foreach { id => mc(id) = math.max(mc(id), cos6(byId(id), pe)) }
      }
    }
    val got = KCenter.kcenter(spark, sf, k).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2))))
      .sortBy(_._1).toVector
    assert(got == picks, s"pick sequence diverged:\n got=$got\nwant=$picks")
    // monotone cover trace: picked cover cosine never decreases
    val trace = got.flatMap(_._3)
    assert(trace == trace.sorted, s"cover trace not monotone: $trace")
    assert(got.map(_._2).distinct.length == k, "a vector picked twice")
  }
}
