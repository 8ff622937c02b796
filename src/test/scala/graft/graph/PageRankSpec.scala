package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential reference: the exact integer recurrence from the scaladoc
    * contract, computed driver-side — the distributed result must match it
    * bit-for-bit under any partitioning. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
                        scale: Long): Map[String, Long] = {
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val teleport = 15L * scale / (100L * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val s = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((u, v, w) <- edges) s(v) += r(u) * w / wout(u)
      r = nodes.map(v => v -> (teleport + 85L * s(v) / 100L)).toMap
    }
    r
  }

  private val handGraph = Seq(
    ("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L), ("c", "a", 1L),
    ("d", "a", 3L), ("b", "c", 5L), ("a", "e", 1L)) // e is dangling

  test("ranks == sequential reference bit-for-bit, under any partitioning") {
    val df = handGraph.toDF("src", "dst", "w")
    val want = reference(handGraph, 5, PageRank.Scale)
    for (parts <- Seq(1, 7)) {
      val got = PageRank.ranks(df.repartition(parts), iterations = 5)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("mass conservation with leak: total <= scale; dangling node keeps teleport only") {
    val got = PageRank.ranks(handGraph.toDF("src", "dst", "w"), iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(got.values.sum <= PageRank.Scale)
    val teleport = 15L * PageRank.Scale / (100L * got.size)
    // e has no out-edges and one weak in-edge; a is the hub every node feeds
    assert(got("a") > got("e"))
    assert(got("e") >= teleport)
  }

  test("star graph: hub outranks every leaf") {
    val star = (1 to 8).flatMap(i =>
      Seq(("hub", s"leaf$i", 1L), (s"leaf$i", "hub", 1L)))
    val got = PageRank.ranks(star.toDF("src", "dst", "w"), iterations = 5)
      .as[(String, Long)].collect().toMap
    assert((1 to 8).forall(i => got("hub") > got(s"leaf$i")))
  }

  test("textrank edges are symmetric with equal weights") {
    val e = PageRank.textrankEdges(spark, SparkTestSession.sf)
    val asym = e.as("x").join(e.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src"), "left")
      .filter(col("y.w").isNull || col("x.w") =!= col("y.w"))
    assert(asym.count() == 0)
  }
}
