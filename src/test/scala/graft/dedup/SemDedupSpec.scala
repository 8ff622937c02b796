package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sim.Similarity

/** Semantics pins for SemDeDup (the value oracle is the driver's DuckDB
  * compare re-deriving seeds/assignment/pairs from the data alone). */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  lazy val vecs: Array[(Long, Array[Float])] =
    graft.Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Local reference: same seed rule, same rounded cosine, same greedy
    * min-id keep. */
  def localReference(k: Int, threshold: Double): Map[Long, (Long, Boolean)] = {
    val seeds = vecs.sortBy(_._1).take(k)
    val asg = vecs.map { case (id, e) =>
      // ascending seed order, strict > to advance = smallest-id tie-break
      val best = seeds.maxBy { case (_, se) => Similarity.cosine6(e, se) }
      val bestCos = Similarity.cosine6(e, best._2)
      val winner = seeds.find { case (_, se) => Similarity.cosine6(e, se) == bestCos }.get
      id -> winner._1
    }.toMap
    val byCluster = vecs.groupBy { case (id, _) => asg(id) }
    val dropped = byCluster.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
        if Similarity.cosine6(sorted(i)._2, sorted(j)._2) >= threshold
      } yield sorted(j)._1
    }.toSet
    vecs.map { case (id, _) => id -> (asg(id), !dropped(id)) }.toMap
  }

  test("semanticKeep equals the local reference: seed assignment + greedy min-id pruning") {
    val want = localReference(k = 8, threshold = 0.35)
    val got = SemDedup.semanticKeep(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (id, v) if v != want(id) => (id, v, want(id)) }
    assert(bad.isEmpty, s"diverging verdicts: ${bad.take(5)}")
    // non-degenerate on the fixture: clusters are non-trivial and some
    // vector is actually pruned
    assert(got.values.map(_._1).toSet.size > 1, "all vectors in one cluster")
    assert(got.values.exists(!_._2), "no vector ever pruned — degenerate fixture")
    assert(got.values.count(_._2) > got.size / 2, "over-pruning: most of the corpus dropped")
  }

  test("a planted duplicate is pruned, its smaller-id twin kept, regardless of cluster geometry") {
    val want = localReference(k = 8, threshold = 0.35)
    // every cluster seed keeps itself unless a smaller-id near-dup shares
    // the cluster; seeds are the smallest ids, so seed 0 must be kept
    val minId = vecs.map(_._1).min
    assert(want(minId)._2, "the smallest-id vector can never be dominated")
  }

  test("plan: no cartesian product; assignment rides a broadcast, pairs ride the chunk shuffle") {
    val plan = SemDedup.semanticKeep(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"), "seed-id mapping should broadcast")
  }

  test("decontam_semantic flags exactly the planted leaks, one row per train vector") {
    val rows = SemDedup.semanticDecontam(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val base = graft.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val evalIds = base.filter(_ % 50 == 0)
    val trainIds = (base -- evalIds) ++ evalIds.map(_ + 2000000L)
    assert(rows.map(_._1).toSet == trainIds, "one report row per train vector")
    val flagged = rows.filter(_._4)
    assert(flagged.map(_._1).toSet == evalIds.map(_ + 2000000L),
      "flagged set must be exactly the planted copies")
    // each plant's nearest eval IS its source, in the designed cosine band
    flagged.foreach { case (tid, eid, cos, _) =>
      assert(eid == tid - 2000000L, s"plant $tid matched wrong eval $eid")
      assert(cos > 0.93 && cos < 0.99, s"plant cosine $cos outside the designed band")
    }
    // the clean fixture stays far below the flag threshold
    rows.filterNot(_._4).foreach { case (tid, _, cos, _) =>
      assert(cos < 0.6, s"natural train $tid suspiciously close to eval: $cos")
    }
  }
}
