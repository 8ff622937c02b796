package graft.sample

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural contracts of the shelf packer and the epoch upsampler,
  * beyond their value oracles. */
class BinsEpochsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("greedyBins: conservation, contiguous bins, overshoot < one document") {
    val budget = 256L
    val bins = Packing.greedyBins(spark, sf, budget).orderBy(col("bin_id")).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select(size(graft.text.TextAnalysis.tokensCol(col("text"))).cast("long").as("n"))
      .collect().map(_.getLong(0))
    assert(bins.map(_.getLong(1)).sum == docs.length, "every doc in exactly one bin")
    assert(bins.map(_.getLong(2)).sum == docs.sum, "token conservation")
    // shelf property: a bin overshoots by strictly less than one document
    val maxDoc = docs.max
    bins.foreach { b =>
      assert(b.getLong(3) >= 0 && b.getLong(3) < maxDoc,
        s"overshoot must be < max doc length ($maxDoc): $b")
    }
    // bins are a contiguous id range (every shelf between first and last
    // doc-run start is hit — offsets are a prefix sum, nothing is skipped
    // unless a single doc spans whole bins, bounded by the maxDoc check)
    assert(bins.nonEmpty && bins.length > 1, "fixture should fill several bins")
  }

  test("epochUpsample: every doc present, copies in {floor(e), floor(e)+1}, deterministic") {
    val a = Sampling.epochUpsample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    val byDoc = a.groupBy(_._1)
    assert(byDoc.size == nDocs, "every doc emitted at least once")
    byDoc.foreach { case (_, rows) =>
      val n = rows.head._3
      assert(rows.length == n, "copy_idx fan-out must equal n_copies")
      assert(rows.map(_._4).sorted.toSeq == (1L to n), "copy_idx must be 1..n")
      assert(n >= 1L && n <= 3L, s"e ∈ [1,3] ⇒ copies ∈ [1,3]: $n")
    }
    // same-source docs share the integer part of e: per source, observed
    // copy counts span at most {k, k+1}
    a.groupBy(_._2).foreach { case (src, rows) =>
      val counts = rows.groupBy(_._1).map(_._2.head._3).toSet
      assert(counts.size <= 2 && counts.max - counts.min <= 1,
        s"source $src copies must be {floor(e), floor(e)+1}: $counts")
    }
    val b = Sampling.epochUpsample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a.toSet == b.toSet, "hash-fate replication must be deterministic")
  }
}
