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

  test("sample_budget_select two-phase == naive global-window selection") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // naive truth: one global window over the per-doc frame (fine at spec
    // scale; the operator exists precisely to avoid this shape at 100 TB)
    val toks = graft.text.TextAnalysis.tokensCol(col("text"))
    val perDoc = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(toks).cast("bigint").as("n_tokens"),
        size(array_distinct(toks)).cast("bigint").as("n_dist"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr("n_dist * 1000000 DIV n_tokens").as("score"))
    val budget = perDoc.agg(expr("sum(n_tokens) DIV 5").as("b")).head().getLong(0)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = perDoc.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sel_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twoPhase = Sampling.budgetSelect(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoPhase == naive, s"two-phase $twoPhase != naive $naive")
    // and the selection genuinely fits the budget
    assert(twoPhase.toSeq.map(_._3).sum <= budget)
  }

  test("sample_stratified: Hamilton allocation is exact and fully picked") {
    val rows = Sampling.stratifiedSample(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count() / 20
    assert(rows.map(_.getLong(3)).sum == n, s"sum(alloc) != $n")
    rows.foreach { r =>
      val (nh, alloc, picked, members) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      assert(alloc <= nh, s"stratum ${r.getString(0)}/${r.getString(1)} over-allocated")
      assert(picked == alloc, "picked != alloc")
      val ids = if (members.isEmpty) Array.empty[String] else members.split(',')
      assert(ids.length == picked, "member roster disagrees with n_picked")
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

  test("source cap: window-reference equal, rides the TopKPerKey physical operator") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val k = 10
    val out = Sampling.sourceCap(spark, sf, k)
    val got = out.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("h"), r.getAs[Long]("rank"))).toSet
    // semantic truth: the row_number window form
    val w = Window.partitionBy(col("source")).orderBy(col("h").desc, col("doc_id"))
    val want = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.Fnv32.fnv32(concat(col("doc_id").cast("string"), lit(":cap"))).as("h"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("h"), r.getAs[Long]("rank"))).toSet
    assert(got == want)
    // the cap binds on this fixture (25 docs/source > k) and never exceeds k
    val bySource = got.groupBy(_._2)
    assert(bySource.values.forall(_.size <= k))
    assert(bySource.values.exists(_.size == k), "cap never binds — degenerate fixture")
    // the scale claim: the custom partial/final top-k operator, not a window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial") && plan.contains("TopKFinal"),
      s"source cap does not ride TopKPerKey:\n${plan.take(1200)}")
  }

  test("temperature mixing flattens the mixture and allocates the budget") {
    val rows = Sampling.temperatureMixture(spark, sf, tau = 0.7, budget = 1000000L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("raw_share"), r.getAs[Double]("temp_share"),
        r.getAs[Long]("budget_tokens"), r.getAs[Double]("epochs")))
    assert(rows.length == 20, "one row per source")
    // shares are distributions (up to 6-decimal rounding of each term)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 2e-5)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 2e-5)
    // τ<1 FLATTENS: every above-average source is downsampled, every
    // below-average source upsampled — the defining property of the rule
    val meanRaw = rows.map(_._3).sum / rows.length
    rows.foreach { case (src, _, raw, temp, _, _) =>
      if (raw > meanRaw + 1e-6) assert(temp < raw, s"$src: head source not flattened")
      if (raw < meanRaw - 1e-6) assert(temp > raw, s"$src: tail source not boosted")
    }
    // order is preserved (monotone transform): bigger source, bigger share
    val byTok = rows.sortBy(_._2)
    assert(byTok.map(_._4).toSeq == byTok.map(_._4).sorted.toSeq)
    // the budget column is the integer contract floor(share*B), epochs = B_s/c_s
    rows.foreach { case (_, c, _, temp, b, ep) =>
      assert(b == math.floor(temp * 1000000L).toLong)
      assert(ep == BigDecimal(b.toDouble / c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // scale shape: ONE corpus scan (the broadcast-total form scans twice —
    // Catalyst won't dedupe two different aggs over one subtree); the
    // global window runs over the SOURCES-SIZED agg output, after the
    // map-side-combined exchange
    val plan = Sampling.temperatureMixture(spark, sf).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, s"plan:\n${plan.take(1500)}")
    assert(plan.contains("Window"), "totals should be the post-agg window")
    assert(plan.indexOf("HashAggregate") > plan.indexOf("Window"),
      "window must sit ABOVE the aggregation (sources-sized input), not over the corpus")
  }
}
