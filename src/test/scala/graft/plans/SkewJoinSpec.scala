package graft.plans

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** AQE skew-join handling — the runtime half of the skew story
  * (`q_skew_salted` is the explicit-salting half): when one join key
  * dominates, AQE's OptimizeSkewedJoin splits the oversized shuffle
  * partition into parallel sub-reads instead of leaving one straggler
  * task. This spec proves the mechanism actually engages on this engine
  * build (thresholds lowered to fixture scale) and that the result is
  * unchanged — at 100 TB these thresholds stay at their defaults and the
  * same rewrite handles hot keys without any query change. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def deepFind(p: org.apache.spark.sql.execution.SparkPlan)
  : Seq[SortMergeJoinExec] = {
    val here = p match { case s: SortMergeJoinExec => Seq(s); case _ => Seq.empty }
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ through.flatMap(deepFind)
  }

  test("OptimizeSkewedJoin splits the hot key's partition; result unchanged") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // left: one hot key carrying 100k rows + a uniform tail; right: uniform
      val left = spark.range(120000).select(
        when(col("id") < 100000, 0L).otherwise(col("id") % 997).as("k"),
        col("id").as("payload"))
      val right = spark.range(997).select(col("id").as("k"), (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      // execute joined's OWN QueryExecution — count() would plan a separate
      // aggregate and leave THIS plan unexecuted/unfinalized (no AQE
      // skew marking to observe) — the PlanAudit lesson
      val n = joined.queryExecution.toRdd.count()
      // ground truth: every left row with k in [0, 997) matches exactly once
      assert(n == 120000L, s"join produced $n rows")
      val smjs = deepFind(joined.queryExecution.executedPlan)
      assert(smjs.nonEmpty, "expected a sort-merge join under AQE")
      assert(smjs.exists(_.isSkewJoin),
        "AQE did not mark the join skew-optimized — the hot-key partition was not split")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
