package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Scalar int8 (SQ8) quantization statistics for an embedding column — the
  * storage-compression step of a vector index: per vector,
  * `scale = max|x| / 127`, `q_i = floor(x_i/scale + 0.5)` (symmetric
  * round-half-up into [-127, 127]), and the reconstruction error of
  * `q_i * scale`. Returns `[scale, mse, max_err]` as array<double>.
  *
  * One fused codegen call per row (map-only at any corpus size — the
  * compression decision this op informs is exactly the 4× shrink of a
  * 100 TB float32 index). Every operation here is IEEE-exact-rounded
  * (+, *, /, floor, abs; the error sum is an explicit LEFT fold in element
  * order), so the DuckDB oracle reproduces all three doubles bit-for-bit
  * with the same explicit folds — no rounding boundary to accept.
  * Degenerate inputs have a PINNED total contract (mirrored verbatim in the
  * oracle SQL, not fixture-dependent): any NULL element → result NULL
  * (SQL null propagation); an empty or all-zero vector defines scale = 0,
  * q = 0, zero error → [0, 0, 0]. */
object Quantize {

  def sq8StatsCol(c: Column): Column =
    ColumnBridge.column(Sq8StatsExpr(ColumnBridge.expression(c)))

  /** Hot-path entry referenced from generated code: array<float> (or
    * array<double>) embedding → [scale, mse, max_err]; null if any element
    * is null. */
  def sq8Stats(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var maxAbs = 0.0
    i = 0
    while (i < n) { val a = math.abs(x(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val scale = maxAbs / 127.0
    var sumSq = 0.0
    var maxErr = 0.0
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val q = math.floor(x(i) / scale + 0.5)
        val err = x(i) - q * scale
        sumSq += err * err // left fold in element order — oracle mirrors it
        val a = math.abs(err); if (a > maxErr) maxErr = a
        i += 1
      }
    }
    val mse = if (n == 0) 0.0 else sumSq / n
    new GenericArrayData(Array(scale, mse, maxErr))
  }
}

/** `graft_sq8_stats(array<float|double>) -> array<double>` — see
  * [[Quantize]]. */
case class Sq8StatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null even for a non-null child: a null ELEMENT nulls the whole result
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_stats requires array<float> or array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    Quantize.sq8Stats(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Quantize.sq8Stats($c, $isFloat);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Sq8StatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_sq8_stats"
}
