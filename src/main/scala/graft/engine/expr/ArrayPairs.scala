package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Generic Catalyst Generator emitting every unordered element pair of an
 * array column as a row (a, b) with a before b in ARRAY ORDER — callers
 * pre-sort (sort_array) when they need doc_a < doc_b determinism. Element
 * type is arbitrary (longs, structs, …); downstream column math (xor /
 * bit_count, [[ArrayEqCount]], …) computes the pair's payload in ordinary
 * codegen expressions.
 *
 * CONTRACT (ADVICE r04): elements are treated as opaque — DISTINCTNESS is
 * the caller's job. An array carrying the same id twice yields an (x, x)
 * pair; every Dedup call site is structurally distinct-per-bucket (the
 * bucket is grouped BY doc, or postings are distinct per doc), and the
 * id-aware [[BucketPairDots]] twin skips equal-id pairs itself.
 *
 * This is the bucketed-pair idiom of the dedup family
 * (minhash/simhash/substring candidates) as ONE reusable operator: the
 * `flatten(transform(sequence(...), i -> transform(slice(...))))` lambda
 * chain it replaces materializes an index array, a nested pair-struct
 * array, and interpreted closure dispatch per element — this iterates.
 * Buckets are cap-bounded at every call site, so per-row fan-out is
 * ≤ cap(cap−1)/2 by construction. Generators run in GenerateExec outside
 * whole-stage codegen regardless of implementation (like explode), so
 * CodegenFallback costs nothing extra.
 */
case class ArrayPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  // nullability follows the input's containsNull: the library call sites
  // (collect_list output) are never-null, but the SQL-registered function
  // can legitimately receive arrays with null elements
  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elemType, nullable = elemNullable),
    StructField("b", elemType, nullable = elemNullable)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_pairs requires an array, got ${other.simpleString(10)}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) return Iterator.empty
    val n = arr.numElements()
    val t = elemType
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val row = InternalRow(arr.get(i, t), arr.get(j, t))
        j += 1
        if (j == n) { i += 1; j = i + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}

object ArrayPairs {
  /** Column-level API: pairs of an array column's elements, array order. */
  def of(xs: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      ArrayPairs(org.apache.spark.sql.GraftShims.expression(xs)))
}
