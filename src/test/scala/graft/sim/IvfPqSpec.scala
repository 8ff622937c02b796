package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  lazy val vecs = Similarity.vectors(spark, sf)
  lazy val idx = IvfPq.train(vecs)

  test("index artifacts: codebook shapes, cross table == coarse·pq dot products") {
    assert(idx.coarse.length == 16 && idx.book.m == 8 && idx.book.dsub == 8)
    assert(idx.cross.length == 16)
    for (l <- Seq(0, 7, 15); j <- Seq(0, 7); c <- Seq(0, 15)) {
      val want = (0 until idx.book.dsub).map(d =>
        idx.coarse(l)(j * idx.book.dsub + d).toDouble * idx.book.centroids(j)(c)(d).toDouble).sum
      assert(idx.cross(l)(j)(c) == want)
    }
    val codes = IvfPq.encode(vecs, idx).collect()
    assert(codes.length == vecs.count())
    codes.foreach { c =>
      assert(c.list_id >= 0 && c.list_id < 16)
      assert(c.codes.length == 8 && c.codes.forall(b => (b & 0xff) < 16))
    }
  }

  test("(nprobe=nlist, rerank=corpus) endpoint reproduces brute force row-for-row") {
    val n = vecs.count().toInt
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    val got = IvfPq.topK(spark, sf, nprobe = 16, rerank = n, trained = Some(idx)).collect()
    assert(got.length == brute.size)
    got.foreach { h =>
      assert(brute((h.query_id, h.rank)) == ((h.neighbor_id, h.cosine)), h)
    }
  }

  test("recall sweep is all recall_ok with the pinned floors") {
    val sweep = IvfPq.recallSweep(spark, sf).collect()
    assert(sweep.length == 16) // 2 operating points x 8 queries
    assert(sweep.forall(_.getAs[Boolean]("recall_ok")),
      sweep.filterNot(_.getAs[Boolean]("recall_ok")).mkString(";"))
    assert(sweep.forall(_.getAs[Long]("n_hits") == 10L))
  }
}
