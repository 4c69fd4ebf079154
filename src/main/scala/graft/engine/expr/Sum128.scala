package graft.engine.expr

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/**
 * Exact 128-bit integer sum aggregate over a LongType column of UNSCALED
 * decimal values — the wide-decimal aggregation fast path.
 *
 * Why it exists (SCALING.md §Data-quality monitors, r06-late): Spark's
 * `Decimal` leaves its compact-Long representation whenever precision
 * exceeds 18 digits, so SUM over a DECIMAL(25,12) column (q129's Σdev²)
 * allocates and adds java BigDecimals PER ROW — measured ~60 s CPU per
 * 10M-row pass. This aggregate keeps the entire hot path in primitive
 * longs: the input is the decimal's unscaled long (free to extract for
 * compact decimals), `square = true` squares it into an exact 128-bit
 * product via `Math.multiplyHigh`, and the accumulator is a two-long
 * (hi, lo) 128-bit integer with carry — no allocation per row, no
 * BigDecimal until the single per-GROUP finalization, where the 128-bit
 * integer becomes a DECIMAL(38, resultScale) bit-identical to the
 * BigDecimal formulation it replaces (equality property-tested).
 *
 * Exactness bounds (documented contract, not silent wrap): with
 * `square = true` the accumulator holds Σx² exactly while n·x² < 2^127
 * (|x| ≤ 1e13 and n ≤ 1e12 keeps Σ ≤ 1e38 < 1.7e38); with
 * `square = false` it holds the signed Σx exactly under the same
 * headroom. Merge is associative/commutative 128-bit addition, so
 * partial aggregation (map-side combine) is exact at any partitioning.
 */
case class Sum128(
    child: Expression,
    resultScale: Int,
    square: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // No ImplicitCastInputTypes (AbstractDataType is private[sql]); the
  // companion builders always feed a LongType child, checked here.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sum128 requires a BIGINT child, got ${child.dataType}")
  override def dataType: DataType = DecimalType(38, resultScale)
  override def nullable: Boolean = false
  override def prettyName: String = if (square) "square_sum128" else "sum128"

  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L) // hi, lo

  @inline private def add128(buf: Array[Long], pHi: Long, pLo: Long): Unit = {
    val lo = buf(1) + pLo
    // unsigned overflow of the low word carries into the high word
    val carry = if (java.lang.Long.compareUnsigned(lo, buf(1)) < 0) 1L else 0L
    buf(0) = buf(0) + pHi + carry
    buf(1) = lo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (square) add128(buf, Math.multiplyHigh(x, x), x * x)
      else add128(buf, x >> 63, x) // sign-extended 128-bit addend
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    add128(buf, other(0), other(1))
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val bi = BigInteger.valueOf(buf(0)).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(buf(1))))
    Decimal(new java.math.BigDecimal(bi, resultScale), 38, resultScale)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(buf(0)); bb.putLong(buf(1))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array(bb.getLong(), bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Sum128 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Sum128 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

object Sum128 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftShims
  import org.apache.spark.sql.catalyst.expressions.UnscaledValue

  /** Σ of the column (a LongType of unscaled decimal values) as
    * DECIMAL(38, resultScale). */
  def sum(c: Column, resultScale: Int): Column =
    GraftShims.column(Sum128(GraftShims.expression(c), resultScale,
      square = false).toAggregateExpression())

  /** Σ of the column's SQUARES (exact 128-bit) as DECIMAL(38, resultScale)
    * — for an input at decimal scale s, pass resultScale = 2·s. */
  def squareSum(c: Column, resultScale: Int): Column =
    GraftShims.column(Sum128(GraftShims.expression(c), resultScale,
      square = true).toAggregateExpression())

  /** The unscaled long of a compact decimal column — free to extract
    * (no arithmetic) for precision ≤ 18. */
  def unscaled(c: Column): Column =
    GraftShims.column(UnscaledValue(GraftShims.expression(c)))
}
