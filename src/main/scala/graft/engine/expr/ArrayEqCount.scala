package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Native codegen scalar: the number of positions where two array<bigint>
 * columns hold equal values — the MinHash signature-agreement count
 * (est_jaccard = eq / numHashes). Replaces the interpreted
 * `aggregate(zip_with(a, b, (x, v) -> IF(x = v, 1, 0)), 0, +)` lambda on
 * the q32 pair path: no zipped intermediate array, one loop.
 *
 * Mismatched lengths RAISE ([[DotProduct]]'s strictness): signatures of
 * different widths in one comparison is a pipeline bug, not data.
 */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_eq_count requires (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayEqCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.engine.expr.ArrayEqCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

object ArrayEqCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"array_eq_count: array length mismatch ($n vs ${b.numElements()})")
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq
  }

  def of(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ArrayEqCount(org.apache.spark.sql.GraftShims.expression(a),
        org.apache.spark.sql.GraftShims.expression(b)))
}
