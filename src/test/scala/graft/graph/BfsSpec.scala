package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BFS correctness beyond the value oracle: the frontier iteration must
  * equal a driver-local reference BFS on the same (small at spec scale)
  * edge set, and the per-level structure must be sound. */
class BfsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("graph_bfs == driver-local reference BFS, levels sound") {
    // long node ids inside the engine; names only at the output boundary
    def nm(id: Long) = (if (id % 2 == 0) "c:" else "s:") + (id >> 1)
    val adjL = PageRank.bipartiteEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, es) => (s, es.map(_._2).toSet) }
    val source = adjL.keys.min // numeric-min election, as the engine
    // reference BFS
    var dist = Map(source -> 0)
    var frontier = Set(source)
    var d = 1
    while (frontier.nonEmpty && d <= 6) {
      val next = frontier.flatMap(n => adjL.getOrElse(n, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> d)
      frontier = next
      d += 1
    }
    val want = dist.map { case (n, dd) => (nm(n), dd) }
    val adj = adjL.map { case (s, es) => (nm(s), es.map(nm)) }
    val got = Bfs.graphBfs(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got == want, s"engine BFS drifted: ${got.size} vs ${want.size} nodes")
    // structure: exactly one root at 0; every level-d node has a level-(d-1)
    // in-neighbor (the BFS tree property)
    assert(got.count(_._2 == 0) == 1)
    val rev = adj.toSeq.flatMap { case (s, ds) => ds.map(dd => (dd, s)) }
      .groupBy(_._1).map { case (n, es) => (n, es.map(_._2).toSet) }
    got.filter(_._2 > 0).foreach { case (n, dn) =>
      assert(rev.getOrElse(n, Set.empty).exists(p => got.get(p).contains(dn - 1)),
        s"node $n at level $dn has no parent at level ${dn - 1}")
    }
  }
}
