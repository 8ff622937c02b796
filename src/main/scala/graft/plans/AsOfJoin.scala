package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** As-of join as a first-class logical operator (the (c) tier of the
  * extension ladder: custom `LogicalPlan` + `Rule`, injected through
  * `SparkSessionExtensions`).
  *
  * Semantics: for every left row, the LATEST right row with the same key and
  * `rightTime <= leftTime`; right columns are null when no such row exists.
  * Ties between right rows at the same instant are broken deterministically:
  * the greatest right tuple (lexicographic over the right schema's field
  * order) wins — so retries and re-partitionings reproduce the same output.
  * A right row exactly at `leftTime` matches (inclusive).
  *
  * The rewrite (in [[AsOfJoinRule]]) is the linear union+window shape — tag
  * both sides, one shuffle on the key, partition-local ordered
  * carry-forward — NOT a per-key range join, which is quadratic per key and
  * is exactly what this operator exists to avoid at scale. One exchange
  * total, regardless of |L| and |R|.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                              leftKey: String, rightKey: String,
                              leftTime: String, rightTime: String)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Resolution rule: expands [[AsOfJoinPlan]] into standard operators once
  * both children are resolved. A trailing Project re-aliases the rewritten
  * output onto the node's advertised attribute ids, so operators already
  * resolved against this node keep binding. */
class AsOfJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case aj @ AsOfJoinPlan(l, r, lk, rk, lt, rt) if l.resolved && r.resolved =>
      val ldf = ColumnBridge.ofRows(spark, l)
      val rdf = ColumnBridge.ofRows(spark, r)
      val lNames = l.output.map(_.name)
      val rNames = r.output.map(_.name)
      val lStruct = struct(lNames.map(ldf(_)): _*)
      val rStruct = struct(rNames.map(rdf(_)): _*)
      val lType = ldf.select(lStruct).schema.head.dataType
      val rType = rdf.select(rStruct).schema.head.dataType

      val tagged = ldf.select(ldf(lk).as("__graft_k"), ldf(lt).as("__graft_t"),
          lit(1).as("__graft_side"), lStruct.as("__graft_l"),
          lit(null).cast(rType).as("__graft_r"))
        .unionAll(rdf.select(rdf(rk).as("__graft_k"), rdf(rt).as("__graft_t"),
          lit(0).as("__graft_side"), lit(null).cast(lType).as("__graft_l"),
          rStruct.as("__graft_r")))

      // ordering the frame by the right tuple makes the same-instant winner
      // deterministic (greatest right tuple) with zero extra shuffle; left
      // rows carry null __graft_r, which sorts first within their
      // (__graft_t, side=1) group and never affects which right row is last.
      // Only ORDERABLE right fields participate (a map-typed column would
      // fail analysis inside a sort order); rows identical on every orderable
      // field are genuinely interchangeable, so determinism survives. With no
      // orderable right field at all the tie stays arbitrary — nothing
      // observable can order it.
      val orderableR = r.output.filter(a =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType))
      val tieKeys: Seq[org.apache.spark.sql.Column] =
        if (orderableR.isEmpty) Nil
        else Seq(struct(orderableR.map(a => col(s"__graft_r.${a.name}")): _*))
      val w = Window.partitionBy(col("__graft_k"))
        .orderBy(col("__graft_t") +: col("__graft_side") +: tieKeys: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val res = tagged
        .withColumn("__graft_rlast", last(col("__graft_r"), ignoreNulls = true).over(w))
        .filter(col("__graft_side") === 1)
        .select(lNames.map(n => col(s"__graft_l.$n").as(n)) ++
                rNames.map(n => col(s"__graft_rlast.$n").as(n)): _*)

      val analyzed = res.queryExecution.analyzed
      Project(analyzed.output.zip(aj.output).map { case (a, o) =>
        Alias(a, o.name)(exprId = o.exprId) }, analyzed)
  }
}

/** Public API. Requires a session built with [[graft.GraftExtensions]] (the
  * rule fires during the analysis this call triggers). */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           key: (String, String), time: (String, String)): DataFrame =
    ColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(left.queryExecution.analyzed, right.queryExecution.analyzed,
        key._1, key._2, time._1, time._2))
}
