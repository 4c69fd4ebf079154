package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native codegen scalar for one MinHash permutation minimum over a hash
 * array: min over h of `(a·h + c) mod 1e9+7` — the third member of the
 * dedup-path expression family (RollingFingerprint, HashedShingles, this).
 * Replaces the CodegenFallback `array_min(transform(sh, h -> (a*h+c)%M))`
 * lambda in the banded-MinHash block keys (q48/q75 and the q32 oracle
 * family): no intermediate permuted array, one register-level loop.
 *
 * Preconditions (both unreachable from the library call sites, which all
 * build on non-empty `HashedShingles` output behind a `size >= 3`
 * filter): the array must be non-empty (the lambda formulation returns
 * SQL NULL from array_min; this throws — a silent NULL block key would
 * put every empty doc in ONE bucket, the exact mega-bucket the caps
 * exist to prevent) and must not contain nulls.
 */
case class LcgMin(child: Expression, a: Long, c: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lcg_min requires array<bigint>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    LcgMin.compute(input.asInstanceOf[ArrayData], a, c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      in => s"graft.engine.expr.LcgMin.compute($in, ${a}L, ${c}L)")

  override protected def withNewChildInternal(newChild: Expression): LcgMin =
    copy(child = newChild)
}

object LcgMin {
  private val Mod = 1000000007L

  def compute(arr: ArrayData, a: Long, c: Long): Long = {
    val n = arr.numElements()
    if (n == 0) throw new IllegalArgumentException(
      "lcg_min of an empty array (an empty shingle set has no block key)")
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      val v = (a * arr.getLong(i) + c) % Mod
      if (v < min) min = v
      i += 1
    }
    min
  }

  def of(col: Column, a: Long, c: Long): Column =
    org.apache.spark.sql.GraftShims.column(
      LcgMin(org.apache.spark.sql.GraftShims.expression(col), a, c))
}
