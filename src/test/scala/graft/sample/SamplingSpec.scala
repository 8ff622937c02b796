package graft.sample

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape and semantics pins for the deterministic sampling family
  * (the value oracles live in the driver's DuckDB compare). */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("sample_shuffle is a total deterministic permutation with ONE exchange") {
    val df = Sampling.shuffle(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, s"scans:\n${plan.take(1200)}")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"shuffle should plan exactly the shard window exchange:\n${plan.take(1200)}")
    val rows = df.collect()
    // a permutation: every doc exactly once, positions within a shard are
    // 1..count(shard) with no gaps, and the (h, doc_id) order is respected
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.groupBy(_.getInt(2)).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(r => (r.getInt(1), r.getLong(0)))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to rs.length).toSeq,
        s"shard $shard positions are not 1..n in (h, doc_id) order")
    }
    // stable under recomputation (no RNG state anywhere)
    assert(Sampling.shuffle(spark, sf).collect().toSet == rows.toSet)
  }

  test("sample_weighted keeps proportionally to quality, map-only") {
    val plan = Sampling.weightedByQuality(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weighted sampling plans a shuffle:\n${plan.take(1200)}")
    val kept = Sampling.weightedByQuality(spark, sf).collect()
    assert(kept.nonEmpty)
    // every kept row actually satisfies its own keep predicate
    kept.foreach { r =>
      assert(r.getInt(2) < r.getDouble(1) * 100,
        s"doc ${r.getLong(0)} kept with bucket ${r.getInt(2)} >= 100*quality ${r.getDouble(1)}")
    }
  }

  test("salted buckets are independent across salts") {
    import org.apache.spark.sql.functions._
    val b = graft.Tables.documents(spark, sf).select(
      Sampling.bucketCol(col("doc_id")).as("plain"),
      Sampling.saltedBucketCol(col("doc_id"), ":wq").as("wq")).collect()
    // not the identical fate vector (salting decorrelates decisions)
    assert(b.exists(r => r.getInt(0) != r.getInt(1)))
  }
}
