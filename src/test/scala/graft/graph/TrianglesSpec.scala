package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edgesDF(pairs: Seq[(String, String)]) =
    pairs.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")

  /** Driver-local truth: brute-force over all vertex triples. */
  private def brute(pairs: Seq[(String, String)]): (Long, Long, Long) = {
    val und = pairs.filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap).distinct.toSet
    val nodes = und.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) && und((nodes(i), nodes(k)))
    } yield 1).size
    (nodes.length.toLong, und.size.toLong, tris.toLong)
  }

  test("K4 plus a pendant: 4 triangles, counted once each") {
    val k4 = for (a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b) yield (a, b)
    val g = k4 :+ ("d", "e")
    val row = Triangles.count(edgesDF(g)).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == brute(g))
  }

  test("star graph has zero triangles and the hub gets out-degree zero under orientation") {
    val star = (1 to 30).map(i => ("hub", f"leaf$i%02d"))
    val row = Triangles.count(edgesDF(star)).collect()(0)
    assert(row.getLong(2) == 0L)
    assert((row.getLong(0), row.getLong(1)) == (31L, 30L))
  }

  test("pseudo-random graph: distributed count equals driver-local brute force") {
    val rnd = (0 until 300).map { i =>
      val a = graft.sim.Similarity.mix64(i.toLong) % 25
      val b = graft.sim.Similarity.mix64(i.toLong * 31 + 7) % 25
      (s"n${math.floorMod(a, 25)}", s"n${math.floorMod(b, 25)}")
    }
    val row = Triangles.count(edgesDF(rnd)).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == brute(rnd))
  }

  test("direction and multiplicity collapse: reversed + duplicated edges change nothing") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val noisy = g ++ g.map(_.swap) ++ g
    val a = Triangles.count(edgesDF(g)).collect()(0)
    val b = Triangles.count(edgesDF(noisy)).collect()(0)
    assert(a.getLong(2) == 1L && b.getLong(2) == 1L)
    assert(a.getLong(1) == b.getLong(1))
  }
}
