package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Per-key top-k as a FIRST-CLASS PHYSICAL operator — the (c) tier of the
  * extension ladder taken all the way down: logical node, planner
  * [[SparkStrategy]], and a two-phase [[SparkPlan]] pair with its own
  * `doExecute`, injected via `SparkSessionExtensions`.
  *
  * Why not a window? `row_number().over(partitionBy(key).orderBy(...))`
  * ships EVERY row through the exchange and then fully sorts each key group
  * just to discard all but k rows. This operator keeps a bounded heap per
  * key on the MAP side ([[TopKPartialExec]]), so at most
  * `keysPerPartition × k` rows reach the exchange — on a 100 TB fact table
  * with k=2 that is the difference between shuffling the table and
  * shuffling a rounding error. The reduce side ([[TopKFinalExec]]) declares
  * `ClusteredDistribution(keys)` (EnsureRequirements inserts the hash
  * exchange), merges the partial heaps, and emits rows with a dense `rank`
  * column. Semantics: rank by (orderCol DESC, tieCol ASC), exactly the
  * `row_number` window oracle shape.
  */
final case class TopKPerKeyPlan(child: LogicalPlan, keyExprs: Seq[Expression],
                                orderExpr: Expression, tieExpr: Expression, k: Int,
                                rankAttr: Attribute =
                                  AttributeReference("rank", LongType, nullable = false)())
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // key/order/tie are REAL expression children, so `references` reflects the
  // columns this operator consumes and ColumnPruning keeps them alive while
  // still pruning everything else off the child
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Bounded per-key heaps shared by both phases. Rows are copied before
  * retention (the child iterator reuses its UnsafeRow). */
private[plans] object TopKHeaps {
  type Entry = (Any, Any, InternalRow) // (orderVal, tieVal, row)

  def better(ordCmp: Ordering[Any], tieCmp: Ordering[Any])(a: Entry, b: Entry): Boolean = {
    val c = ordCmp.compare(a._1, b._1)
    c > 0 || (c == 0 && tieCmp.compare(a._2, b._2) < 0)
  }

  /** Consume a partition, retaining at most k best entries per key.
    * Retention discipline: values `eval`ed against the LIVE row may alias
    * its reused buffer (UTF8String, wide decimals), so they are only used
    * for the immediate keep/drop comparison; anything RETAINED (map key,
    * heap entry) is re-derived from a `copy()` of the row. Rows that lose
    * the comparison are never copied. */
  def collect(it: Iterator[InternalRow], keyProj: UnsafeProjection,
              ordExpr: Expression, tieExpr: Expression, k: Int,
              isBetter: (Entry, Entry) => Boolean)
  : scala.collection.mutable.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]] = {
    // head of each queue = WORST kept entry (ordering: "greatest" = least good)
    val heapOrd: Ordering[Entry] = Ordering.fromLessThan[Entry](isBetter)
    val heaps = scala.collection.mutable.LinkedHashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]]
    it.foreach { row =>
      val key = keyProj(row)
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = scala.collection.mutable.PriorityQueue.empty[Entry](heapOrd)
          heaps.put(key.copy(), h)
          h
      }
      def retained: Entry = {
        val c = row.copy()
        (ordExpr.eval(c), tieExpr.eval(c), c)
      }
      if (heap.size < k) heap.enqueue(retained)
      else {
        val transient: Entry = (ordExpr.eval(row), tieExpr.eval(row), row)
        if (isBetter(transient, heap.head)) { heap.dequeue(); heap.enqueue(retained) }
      }
    }
    heaps
  }
}

/** Map-side phase: per-partition per-key bounded heaps; no distribution
  * requirement, so it runs where the data already is. */
final case class TopKPartialExec(keyExprs: Seq[Expression], orderExpr: Expression,
                                 tieExpr: Expression, k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val bKeys = keyExprs.map(BindReferences.bindReference(_, child.output))
    val bOrd = BindReferences.bindReference(orderExpr, child.output)
    val bTie = BindReferences.bindReference(tieExpr, child.output)
    val ordCmp = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
    val tieCmp = TypeUtils.getInterpretedOrdering(tieExpr.dataType)
    val kLocal = k
    child.execute().mapPartitions { it =>
      val isBetter = TopKHeaps.better(ordCmp, tieCmp) _
      val heaps = TopKHeaps.collect(it, UnsafeProjection.create(bKeys), bOrd, bTie,
        kLocal, isBetter)
      heaps.valuesIterator.flatMap(_.iterator.map(_._3)).map { r => numOut += 1; r }
    }
  }
}

/** Reduce-side phase: requires co-location by key, merges the partial
  * winners, emits each key's rows best-first with a 1-based `rank`. */
final case class TopKFinalExec(keyExprs: Seq[Expression], orderExpr: Expression,
                               tieExpr: Expression, k: Int, rankAttr: Attribute,
                               child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val bKeys = keyExprs.map(BindReferences.bindReference(_, child.output))
    val bOrd = BindReferences.bindReference(orderExpr, child.output)
    val bTie = BindReferences.bindReference(tieExpr, child.output)
    val ordCmp = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
    val tieCmp = TypeUtils.getInterpretedOrdering(tieExpr.dataType)
    val kLocal = k
    val outputAttrs = output
    val childAttrs = child.output
    child.execute().mapPartitions { it =>
      val isBetter = TopKHeaps.better(ordCmp, tieCmp) _
      val heaps = TopKHeaps.collect(it, UnsafeProjection.create(bKeys), bOrd, bTie,
        kLocal, isBetter)
      val proj = UnsafeProjection.create(outputAttrs, childAttrs :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.valuesIterator.flatMap { heap =>
        val bestFirst = heap.dequeueAll.reverseIterator // dequeueAll = worst→best
        bestFirst.zipWithIndex.map { (e: (TopKHeaps.Entry, Int)) =>
          rankRow.update(0, (e._2 + 1).toLong)
          proj(joined(e._1._3, rankRow))
        }
      }
    }
  }
}

/** Planner strategy: [[TopKPerKeyPlan]] → Final(Partial(child)). */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKeyPlan =>
      TopKFinalExec(t.keyExprs, t.orderExpr, t.tieExpr, t.k, t.rankAttr,
        TopKPartialExec(t.keyExprs, t.orderExpr, t.tieExpr, t.k,
          planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** Public API. Requires a session built with [[graft.GraftExtensions]]. */
object TopK {
  def perKey(df: DataFrame, keys: Seq[String], orderBy: String, tieBy: String,
             k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def resolve(n: String): Attribute = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"TopKPerKey: column $n not among ${analyzed.output.map(_.name).mkString(", ")}"))
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(analyzed, keys.map(resolve), resolve(orderBy), resolve(tieBy), k))
  }
}
