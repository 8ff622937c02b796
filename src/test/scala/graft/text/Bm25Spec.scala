package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics + plan pins for BM25 (the value oracle is the driver's DuckDB
  * compare with interpolated float constants). */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  val terms = Seq("table", "query", "window")
  val (k1, b) = (1.2, 0.75)

  test("bm25 equals a local reference with the same fixed-order arithmetic") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase
        .split("[^\\p{L}]+").filter(_.nonEmpty).toSeq))
    val lens = docs.map { case (id, tk) => id -> tk.length.toLong }.toMap
    val tfs = docs.map { case (id, tk) =>
      id -> terms.map(t => tk.count(_ == t).toLong)
    }.toMap
    val nDocs = docs.length.toLong
    val totLen = lens.values.sum
    val dfs = terms.indices.map(i => tfs.values.count(_(i) > 0).toLong)
    val (k1p1, c0, c1) = (k1 + 1, k1 * (1 - b), k1 * b)
    val avg = totLen.toDouble / nDocs.toDouble
    val want = docs.map { case (id, _) =>
      val score = terms.indices.map { i =>
        val tf = tfs(id)(i).toDouble
        val df = dfs(i).toDouble
        math.log((nDocs.toDouble - df + 0.5) / (df + 0.5) + 1.0) *
          (tf * k1p1) / (tf + c0 + c1 * lens(id).toDouble / avg)
      }.reduce(_ + _)
      (id, lens(id),
        BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, _, s) => (-s, id) }.take(100).toSeq
    val got = TextAnalysis.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy { case (id, _, s) => (-s, id) }
    assert(got == want, {
      val diff = got.zip(want).collectFirst { case (g, w) if g != w => (g, w) }
      s"first divergence: $diff"
    })
    // the fixture really exercises the scorer: some doc matches some term
    assert(want.head._3 > 0, "no document matched any query term — degenerate fixture")
  }

  test("plan: one-row stats broadcast, bounded top-N, one corpus scan via checkpoint") {
    val plan = TextAnalysis.bm25(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"), "stats join must broadcast")
  }
}
