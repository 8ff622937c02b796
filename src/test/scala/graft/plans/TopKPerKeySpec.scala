package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkTestSession

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** `SparkPlan.collect` stops at AQE / query-stage leaves; walk through
    * them so assertions see the plan that actually ran. */
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.ReusedSubqueryExec
    val here = pf.lift(p).toSeq
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedSubqueryExec => Seq(r.child)
      case other => other.children
    }
    here ++ through.flatMap(deepCollect(_)(pf))
  }

  private def skewed = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 40 keys x 250 rows: window top-k would shuffle all 10k rows
    Seq.fill(10000)((rnd.nextInt(40), rnd.nextInt(100000), rnd.nextInt(1 << 20)))
      .toDF("key", "score", "id")
  }

  test("TopK.perKey equals the row_number window on skewed data") {
    val df = skewed
    val got = TopK.perKey(df, Seq("key"), "score", "id", 3)
      .collect().map(r => (r.getInt(0), r.getLong(3)) -> (r.getInt(1), r.getInt(2))).toMap
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .collect().map(r => (r.getInt(0), r.getInt(3).toLong) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("plans TopKPartial below the exchange, TopKFinal above; partial bounds the shuffle") {
    val df = skewed.repartition(8)
    val out = TopK.perKey(df, Seq("key"), "score", "id", 3)
    out.collect()
    val plan = out.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TopKFinal"), s.take(1500))
    assert(s.contains("TopKPartial"), s.take(1500))
    // partial runs map-side: an Exchange sits between final and partial
    val finalIdx = s.indexOf("TopKFinal")
    val exchangeIdx = s.indexOf("Exchange", finalIdx)
    val partialIdx = s.indexOf("TopKPartial", finalIdx)
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "expected Final -> Exchange -> Partial order")
    // the partial phase must have shed almost everything before the shuffle:
    // <= keys x k x partitions = 40*3*8 = 960 of 10000 input rows
    // (deepCollect: under AQE a plain collect sees nothing and the bound
    // would hold vacuously on an empty sum)
    val partial = deepCollect(plan) { case p: TopKPartialExec => p }
    assert(partial.nonEmpty, "TopKPartialExec not found in executed plan")
    val shuffled = partial.map(_.metrics("numOutputRows").value).sum
    assert(shuffled > 0L)
    assert(shuffled <= 40L * 3 * 8, s"partial let $shuffled rows through")
  }

  test("partial phase participates in WholeStageCodegen, fused with the scan") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val out = TopK.perKey(skewed, Seq("key"), "score", "id", 3)
    out.collect()
    val stages = deepCollect(out.queryExecution.executedPlan) {
      case w: WholeStageCodegenExec => w
    }
    // the partial heap must sit INSIDE a codegen stage (SortExec-style
    // blocking operator), not behind an InputAdapter iterator boundary
    assert(stages.exists(_.collect { case p: TopKPartialExec => p }.nonEmpty),
      out.queryExecution.executedPlan.toString.take(2000))
  }

  test("string order column: retained values must not alias the reused row buffer") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // zero-padded strings: lexicographic == numeric order; thousands of rows
    // per partition force UnsafeRow reuse, so any buffer-aliased retained
    // value would be clobbered by later rows
    val df = Seq.fill(6000)((rnd.nextInt(10), f"s${rnd.nextInt(100000)}%06d", rnd.nextInt(1 << 20)))
      .toDF("key", "name", "id").repartition(3)
    val got = TopK.perKey(df, Seq("key"), "name", "id", 4)
      .collect().map(r => (r.getInt(0), r.getLong(3)) -> (r.getString(1), r.getInt(2))).toMap
    val w = Window.partitionBy(col("key")).orderBy(col("name").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .collect().map(r => (r.getInt(0), r.getInt(3).toLong) -> (r.getString(1), r.getInt(2))).toMap
    assert(got == want)
  }

  test("ties resolve deterministically (lower tie id wins the better rank)") {
    import spark.implicits._
    val df = Seq((1, 50, 9), (1, 50, 2), (1, 50, 5), (1, 40, 1)).toDF("key", "score", "id")
    val got = TopK.perKey(df, Seq("key"), "score", "id", 3)
      .select("id", "rank").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(2 -> 1L, 5 -> 2L, 9 -> 3L))
  }

  test("k larger than any group emits whole groups, ranked") {
    import spark.implicits._
    val df = Seq((1, 10, 1), (1, 20, 2), (2, 5, 3)).toDF("key", "score", "id")
    val got = TopK.perKey(df, Seq("key"), "score", "id", 10)
      .select("key", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set((1, 2, 1L), (1, 1, 2L), (2, 3, 1L)))
  }
}
