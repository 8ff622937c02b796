package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Adamic-Adar beyond the value oracle: hand-case truth, the apex-degree
  * cut's declared semantics, and driver-local parity on the fixture. */
class LinkPredictionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def sym(und: Seq[(String, String)]) = {
    import spark.implicits._
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  test("hand graph: path u-w-v predicts (u,v) only above the cn floor; square predicts both diagonals") {
    // square a-b-c-d-a: (a,c) share {b,d}, (b,d) share {a,c} — cn=2 each,
    // every node deg 2 → weight 2·round(1e6/ln 2) = 2885390·2
    val got = LinkPrediction.adamicAdar(sym(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val w2 = math.rint(1e6 / math.log(2.0)).toLong
    assert(got == Map(("a", "c") -> ((2L, 2 * w2)), ("b", "d") -> ((2L, 2 * w2))))
  }

  test("apex cut: a super-hub's wedges are excluded by declared semantics") {
    // double star: hubs h1,h2 each joined to x0..x9. Leaf apexes (deg 2)
    // predict (h1,h2) with cn=10; hub apexes (deg 10) would predict every
    // leaf pair with cn=2 — but only if the cut admits them.
    val star = sym((0 until 10).flatMap(i => Seq(("h1", s"x$i"), ("h2", s"x$i"))))
    val w2 = math.rint(1e6 / math.log(2.0)).toLong
    val cut = LinkPrediction.adamicAdar(star, maxApexDeg = 4).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(cut == Map(("h1", "h2") -> ((10L, 10 * w2))),
      "deg-10 hubs must not serve as apexes under maxApexDeg=4")
    // raising the cut re-admits the hubs: all C(10,2) leaf pairs appear
    val w10 = math.rint(1e6 / math.log(10.0)).toLong
    val open = LinkPrediction.adamicAdar(star, maxApexDeg = 16).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val leafPairs = (for {
      i <- 0 until 10; j <- 0 until 10
      a = s"x$i"; b = s"x$j" if a < b
    } yield ((a, b), (2L, 2 * w10))).toMap
    assert(open == leafPairs + (("h1", "h2") -> ((10L, 10 * w2))))
  }

  test("graph_adamic_adar == driver-local reference on the fixture") {
    // reference over LONG ids — pair canonicalization (u < v) is numeric in
    // the engine now; names are formatted on the result pairs only
    def nm(id: Long) = (if (id % 2 == 0) "c:" else "s:") + (id >> 1)
    val edges = PageRank.bipartiteEdges(spark, sf)
      .filter(org.apache.spark.sql.functions.col("w") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = edges.toSeq.groupBy(_._1).map { case (n, es) => (n, es.length) }
    val wt = LinkPrediction.weightTable(64).toMap
    val byApex = edges.toSeq.groupBy(_._1)
    val want = byApex.toSeq
      .filter { case (w, _) => deg(w) >= 2 && deg(w) <= 64 }
      .flatMap { case (w, es) =>
        val ns = es.map(_._2).sorted
        for (i <- ns.indices; j <- (i + 1) until ns.length)
          yield ((ns(i), ns(j)), wt(deg(w)))
      }
      .groupBy(_._1)
      .map { case (p, ws) => (p, (ws.length.toLong, ws.map(_._2).sum)) }
      .filter { case (p, (cn, _)) => cn >= 2 && !edges.contains(p) }
      .map { case ((a, b), s) => ((nm(a), nm(b)), s) }
    val got = LinkPrediction.graphAdamicAdar(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == want,
      s"diff: extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
    assert(got.nonEmpty, "no predicted links — degenerate fixture")
  }
}
