package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The IVF-pruned kNN join ([[Similarity.prunedKnnEdges]] /
  * [[Similarity.knnGraphPrunedSweep]]): exactness at the full-probe
  * endpoint, structural completeness, and that pruning really restricts
  * candidates to probed lists. */
class KnnPrunedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  val k = 3

  lazy val vecs = Similarity.vectors(spark, sf)
  lazy val all: Array[Similarity.Vec] = vecs.collect()
  lazy val nlist = math.max(16, ((all.length + 255) / 256).toInt)
  lazy val centroids: Array[Array[Float]] = {
    import spark.implicits._
    val trainArr = vecs
      .orderBy(xxhash64(col("vec_id"), lit("knntrain")), col("vec_id"))
      .limit(math.min(2048, all.length)).as[Similarity.Vec].collect()
    Similarity.trainCentroids(spark.createDataset(trainArr.toIndexedSeq), nlist)
  }

  test("endpoint nprobe = nlist EQUALS the exact kNN graph (every vector)") {
    val pruned = Similarity.prunedKnnEdges(vecs, vecs, centroids, nlist, k)
      .collect().toSet
    val exact = Similarity.knnGraph(spark, sf, k)
      .collect().map(e => (e.vec_id, e.neighbor_id)).toSet
    assert(pruned == exact,
      s"endpoint diverged: ${pruned.diff(exact).size} extra, ${exact.diff(pruned).size} missing")
  }

  test("sub-nlist rung: exactly k edges per query, neighbors only from probed lists") {
    val np = math.max(1, nlist / 8)
    val edges = Similarity.prunedKnnEdges(vecs, vecs, centroids, np, k)
      .collect().groupBy(_._1)
    assert(edges.size == all.length, "some query emitted no edges")
    // driver-local replay of the probe/home assignment
    def home(e: Array[Float]): Int =
      centroids.indices.maxBy(i => (Similarity.cosine(e, centroids(i)), -i))
    def probes(e: Array[Float]): Set[Int] =
      centroids.indices.map(i => (Similarity.cosine(e, centroids(i)), i))
        .sortBy { case (c, i) => (-c, i) }.take(np).map(_._2).toSet
    val byId = all.map(v => v.vec_id -> v.embedding).toMap
    all.foreach { q =>
      val es = edges(q.vec_id)
      assert(es.length == k, s"query ${q.vec_id} emitted ${es.length} edges")
      val ps = probes(q.embedding)
      es.foreach { case (_, nid) =>
        assert(ps.contains(home(byId(nid))),
          s"neighbor $nid of ${q.vec_id} lives outside its probed lists")
        assert(nid != q.vec_id, "self edge")
      }
    }
  }

  test("registered sweep: 3 rungs, all recall_ok, complete edge counts") {
    val rows = Similarity.knnGraphPrunedSweep(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recall_ok"), s"rung ${r.getAs[Int]("nprobe")} below floor")
      assert(r.getAs[Long]("n_edges") == k * r.getAs[Long]("n_queries"),
        s"rung ${r.getAs[Int]("nprobe")} incomplete")
    }
    val nps = rows.map(_.getAs[Int]("nprobe")).toSet
    assert(nps == Set(math.max(1, nlist / 8), math.max(2, nlist / 4), nlist))
  }
}
