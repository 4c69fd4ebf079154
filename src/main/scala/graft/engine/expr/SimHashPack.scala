package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native codegen scalar packing a document's 64-bit SimHash into ONE long
 * in a single pass over its token array — the map-side signature step of
 * the SimHash near-dup family (operators/Dedup.simhashCandidates).
 *
 * Semantics (bit-identical to the aggregate reference formulation, see
 * `Dedup.packedSimhashViaAgg`): over the DISTINCT tokens of the input
 * array, each token contributes ±1 to each of 64 bit counters; bit b of
 * the result is set iff counter b ends ≥ 0. Distinctness is by token
 * string (set semantics — the ±1 vote of a token is order-independent),
 * computed inside the expression so callers pass a raw `split()` array.
 *
 * Two per-token bit sources, selected by `portable`:
 *  - portable = true: the engine's shared token code (ascii(first)·31 +
 *    length, mod 1000003); bit b votes +1 iff
 *    `((h·(2b+3)) mod M · 2654435761) mod M ≥ 500001`, M = 1000003 —
 *    plain int64 arithmetic (every intermediate < 2⁶²) that a DuckDB
 *    oracle reproduces bit-for-bit (the q48 polynomial/LCG recipe).
 *  - portable = false: Spark's xxhash64 (seed 42) of the token; bit b is
 *    the b-th bit of the hash — the production-quality default (forfeits
 *    the cross-engine oracle, like q32's default path).
 *
 * Why not the explode + 64-conditional-sum aggregate it replaces: that
 * plan shuffles |docs| × |distinct tokens| rows into a hash aggregate
 * carrying 64 buffer columns, just to compute a per-document scalar. This
 * is one map-side pass — no explode, no shuffle, no aggregate state — so
 * the signature step scales like every other map-only fingerprint in the
 * family. Token codes use code-point semantics ([[TokenCode]], r05) so
 * the registered SQL function agrees with its lambda/oracle twins on
 * non-ASCII input too.
 */
case class SimHashPack(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_pack requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashPack.compute(input.asInstanceOf[ArrayData], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.engine.expr.SimHashPack.compute($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  private val M = 1000003L
  private val Mul = 2654435761L

  /** The walk, shared by eval and codegen. Null tokens (unreachable from
    * split() output) are skipped. */
  def compute(arr: ArrayData, portable: Boolean): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    val seen = new java.util.HashSet[Any]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          if (portable) {
            val h = TokenCode.of(tok.toString) % M
            var b = 0
            while (b < 64) {
              val v = (h * (2 * b + 3)) % M * Mul % M
              if (v >= 500001L) counts(b) += 1 else counts(b) -= 1
              b += 1
            }
          } else {
            val h = XxHash64Function.hash(tok, StringType, 42L)
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
              b += 1
            }
          }
        }
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) res |= 1L << b
      b += 1
    }
    res
  }

  /** Column-level API over a raw tokens-array column (dedup is internal). */
  def of(tokens: Column, portable: Boolean): Column =
    org.apache.spark.sql.GraftShims.column(
      SimHashPack(org.apache.spark.sql.GraftShims.expression(tokens), portable))
}
