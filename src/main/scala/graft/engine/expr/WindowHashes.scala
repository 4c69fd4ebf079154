package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native codegen scalar for the portable k-token rolling window hashes
 * behind the exact-substring dedup index (q88, `Dedup.windowHashes`) —
 * the fourth member of the native dedup-path family: per token,
 * code = ascii(first)·31 + length; per k-window starting at i,
 * h = fold over the window of `acc = (acc·131 + code) mod 1e9+7` (the
 * first code seeds the fold un-modded, matching the lambda formulation —
 * equivalent, since codes < 1e9+7); result = distinct hashes in
 * first-occurrence order.
 *
 * Why not `array_distinct(transform(sequence(...), ...))`: the lambda
 * chain is CodegenFallback and re-walks element_at k times per window as
 * an interpreted tree — at the 5M-doc stress scale the window hashing is
 * a triple-digit-seconds stage. This is one pass computing token codes,
 * then O(k) integer arithmetic per window.
 *
 * Divergence below k tokens BY DESIGN: the lambda's `sequence(1, n-k+1)`
 * turns DESCENDING and crashes on element_at(l, 0); this returns an
 * empty array. Every caller pre-filters `size >= k` (substringPairs
 * does). ASCII-first-char semantics as the rest of the family.
 */
case class WindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, "window size must be at least 2 tokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.engine.expr.WindowHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  private val Mod = 1000000007L

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) codes(i) = 0L
      else codes(i) = TokenCode.of(arr.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    i = 0
    while (i <= n - k) {
      var acc = codes(i)
      var j = 1
      while (j < k) {
        acc = (acc * 131 + codes(i + j)) % Mod
        j += 1
      }
      seen.add(acc)
      i += 1
    }
    val res = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }

  def of(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      WindowHashes(org.apache.spark.sql.GraftShims.expression(c), k))
}
