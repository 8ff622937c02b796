package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** MMR greedy semantics beyond the value oracle: a hand case where
  * diversity genuinely overrides relevance (and a negative sim acts as a
  * bonus, not a clamped zero), plus the structural invariants of the
  * registered query on the fixture. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("hand case: near-duplicate is deferred, orthogonal wins; negative sim is a bonus") {
    val a = Array(1f, 0f)
    val b = Array(0.99f, 0.14f) // near-dup of a, slightly lower rel
    val c = Array(0f, 1f)       // orthogonal, much lower rel
    val d = Array(-1f, 0f)      // anti-correlated with a: sim = -1
    val pool = Array((1L, 0.9, a), (2L, 0.89, b), (3L, 0.5, c), (4L, 0.3, d))
    val got = Mmr.greedy(pool, lambda = 0.7, outK = 4)
    // pick 2 is d, NOT the higher-rel near-dup b: its -1 sim to a is a
    // BONUS under the unclamped max (0.7*0.3 - 0.3*(-1) = 0.51), beating
    // both c's 0.35 and b's ~0.326; pick 3 is c (max sim over {a,d} = 0);
    // the near-duplicate b goes last despite the second-highest relevance
    assert(got.map(_._1) == Seq(1L, 4L, 3L, 2L),
      s"expected relevance-then-diversity order, got $got")
    assert(math.abs(got(1)._3 - (0.7 * 0.3 + 0.3)) < 1e-9,
      s"negative max-sim must add, not clamp to zero: $got")
    assert(math.abs(got(2)._3 - 0.35) < 1e-9)
    assert(got(3)._1 == 2L && got(3)._3 < 0.33,
      s"near-duplicate must pay the ~0.99-sim penalty: ${got(3)}")
  }

  test("registered query: picks ⊆ brute pool, rank-1 = brute rank-1, scores non-increasing") {
    val mmr = Mmr.mmrTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
    val brute = Similarity.bruteForceTopK(spark, sf, 8, 20).collect()
    val poolIds = brute.groupBy(_.query_id).view.mapValues(_.map(_.neighbor_id).toSet)
    val bruteTop1 = brute.filter(_.rank == 1).map(h => h.query_id -> h.neighbor_id).toMap
    mmr.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._2).toSet.subsetOf(poolIds(q)), s"query $q picked outside its pool")
      assert(sorted.head._2 == bruteTop1(q), s"query $q rank-1 must be the pure-relevance top-1")
      // each step's winner would have scored at least as high a step earlier
      // (penalty max over a subset), so greedy scores never increase
      sorted.sliding(2).foreach { case Array(x, y) =>
        assert(x._3 >= y._3, s"query $q scores increased: $x -> $y")
      }
      assert(sorted.map(_._4).toSeq == (1 to 5), s"query $q ranks not 1..5")
    }
  }
}
