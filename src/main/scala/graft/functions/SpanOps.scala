package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Span EXCISION — apply a duplicated-span cut-list to a token array.
  *
  * One fused codegen call per row (the [[TextHash]] pattern): a merge-walk
  * over the tokens and the doc's sorted, disjoint span list, O(tokens +
  * spans) with no per-token HOF lambda — an `exists()` filter over the span
  * array would evaluate an interpreted predicate tokens × spans times. */
object SpanOps {

  /** `excise_spans(tokens, starts, ends) -> array<string>`: tokens whose
    * position falls inside any `[starts(i), ends(i)]` interval are dropped.
    * Intervals must be sorted by start and pairwise disjoint (what
    * `dedup_span_extents` produces per document); an empty interval
    * (`end < start`) excises nothing. */
  def exciseSpansCol(tokens: Column, starts: Column, ends: Column): Column =
    ColumnBridge.column(ExciseSpansExpr(ColumnBridge.expression(tokens),
      ColumnBridge.expression(starts), ColumnBridge.expression(ends)))

  /** Hot-path entry referenced from generated code for [[exciseSpansCol]]. */
  def excise(toks: ArrayData, starts: ArrayData, ends: ArrayData): ArrayData = {
    val n = toks.numElements()
    val s = starts.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n)
    var si = 0
    var i = 0
    while (i < n) {
      while (si < s && ends.getLong(si) < i) si += 1 // empty/passed spans skip
      val inside = si < s && starts.getLong(si) <= i && i <= ends.getLong(si)
      if (!inside) out += (if (toks.isNullAt(i)) null else toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_excise_spans(array<string>, array<bigint>, array<bigint>) ->
  * array<string>` — see [[SpanOps.exciseSpansCol]]. */
case class ExciseSpansExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = first.dataType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"excise_spans requires (array<string>, array<bigint>, array<bigint>), got $other")
    }
  override protected def nullSafeEval(toks: Any, starts: Any, ends: Any): Any =
    SpanOps.excise(toks.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData],
      ends.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, e) => s"graft.functions.SpanOps.excise($t, $s, $e)")
  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): ExciseSpansExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "graft_excise_spans"
}
