package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Radius search beyond the value oracle: the IVF-ball-pruned scan must
  * equal the driver-local brute ε-ball exactly (pruning is only allowed
  * to skip provably-below-τ lists), at more than one list count. */
class RadiusSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("sim_radius_search == driver-local brute ε-ball at nlist 16 and 4") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val tau = 0.3
    val queries = vecs.filter(_._1 < 8)
    val want = (for {
      (qid, qe) <- queries
      (id, e) <- vecs if id != qid
      c = Similarity.cosine6(qe, e) if c >= tau
    } yield ((qid, id), c)).toMap
    for (nlist <- Seq(16, 4)) {
      val got = Similarity.radiusSearch(spark, sf, 8, tau, nlist).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(got == want, {
        val missing = (want.keySet -- got.keySet).take(3)
        s"nlist=$nlist: pruning dropped true neighbors $missing or added phantoms " +
          s"${(got.keySet -- want.keySet).take(3)}"
      })
    }
    assert(want.nonEmpty, "no neighbor within the ball at fixture scale — degenerate τ")
  }
}
