package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural contracts of reciprocal-rank fusion beyond the value oracle:
  * the fused score is exactly the advertised function of the two ranks, and
  * fusion genuinely draws from BOTH lists (not one list renamed). */
class HybridRrfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("sim_hybrid_rrf: score == sum of 1/(60+rank) contributions; both lists contribute") {
    val rows = Similarity.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getInt(1))
      val vec = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getInt(2))
      assert(r.getDouble(3) == lex + vec,
        s"rrf_score is not the advertised rank function at $r")
      assert(!(r.isNullAt(1) && r.isNullAt(2)), "item on neither list")
    }
    // fusion is real: the top-k must contain evidence of both rankers
    assert(rows.exists(!_.isNullAt(1)) && rows.exists(!_.isNullAt(2)),
      "one ranker never reaches the fused top-k — fusion is vacuous")
    // scores strictly ordered by construction (desc, ties broken by item_id)
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted(Ordering[Double].reverse))
  }
}
