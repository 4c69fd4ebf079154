package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native codegen scalar for the engine's portable hashed token-3-gram
 * shingles (the RollingFingerprint treatment applied to the OTHER
 * dedup-family hot path): per token, code = ascii(first) · 31 + length;
 * per 3-token window, hash = ((c₁·131 + c₂)·131 + c₃) mod 1e9+7;
 * result = the distinct hashes in first-occurrence order (array_distinct
 * semantics).
 *
 * Why not `array_distinct(transform(sequence(...), ...))`: higher-order
 * lambdas are CodegenFallback — per-row interpreted tree walks plus an
 * index array, a transform array, and a distinct pass per document. This
 * is one pass over precomputed token codes with a small dedup set.
 * Bit-identical to the lambda formulation on every ≥3-token input
 * (asserted in GraftFunctionsSpec) and to the DuckDB oracle arithmetic.
 *
 * Divergence for <3 tokens BY DESIGN: the lambda formulation's
 * `sequence(1, size-2)` turns DESCENDING below 3 tokens and crashes on
 * element_at(l, 0); this returns an empty array instead. Every caller
 * pre-filters `size(l) >= 3`, so the difference is unreachable in the
 * declared queries. Token codes use code-point semantics ([[TokenCode]],
 * r05) so the registered SQL function agrees with its lambda/oracle twins
 * on non-ASCII input too.
 */
case class HashedShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.engine.expr.HashedShingles.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  private val Mod = 1000000007L

  /** The walk, shared by eval and codegen. Null tokens (unreachable from
    * split() output) code as 0. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) codes(i) = 0L
      else codes(i) = TokenCode.of(arr.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    i = 0
    while (i <= n - 3) {
      seen.add(((codes(i) * 131 + codes(i + 1)) * 131 + codes(i + 2)) % Mod)
      i += 1
    }
    val res = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }

  /** Column-level API over a tokens-array column. */
  def of(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      HashedShingles(org.apache.spark.sql.GraftShims.expression(c)))
}
