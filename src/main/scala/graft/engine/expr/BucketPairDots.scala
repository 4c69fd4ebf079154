package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Custom Catalyst Generator for the blocked-pairwise stage of the
 * similarity family: takes one LSH bucket's members as
 * array<struct<id: long, e: array<double>, nrm: double>> and emits one
 * row per unordered member pair — (doc_a, doc_b, dot, na, nb) with
 * doc_a < doc_b — computing the dot products in a tight primitive loop.
 *
 * Why: the join formulation it replaces self-joins the bucket-exploded
 * vectors, materializing every candidate pair as a row CARRYING BOTH
 * dim-sized double arrays through the join (~0.5 KB × millions of pairs);
 * here the bucket shuffles ONCE as a single grouped row, pairs exist only
 * as narrow generator output, and the vectors never leave the operator.
 * Cosine rounding/thresholding stays OUTSIDE in ordinary columns, so the
 * arithmetic path (left-to-right dot, round-half-up, decimal cast) is the
 * existing one, bit-identical to the DuckDB oracles.
 *
 * The dot accumulates left-to-right exactly like [[DotProduct]] (products
 * are commutative in operand order, so emitting (min, max) ids cannot
 * change the double). Mismatched vector lengths raise, matching
 * DotProduct's strictness. Generators run in GenerateExec outside
 * whole-stage codegen regardless of implementation (like explode), so
 * CodegenFallback costs nothing extra.
 */
case class BucketPairDots(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("dot", DoubleType, nullable = false),
    StructField("na", DoubleType, nullable = false),
    StructField("nb", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _),
      StructField(_, DoubleType, _, _))), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "bucket_pair_dots requires array<struct<long, array<double>, double>>, " +
        s"got ${other.simpleString(10)}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) return Iterator.empty
    val n = arr.numElements()
    // unpack once per bucket: primitive ids/norms, one double[] per vector
    val ids = new Array[Long](n)
    val nrms = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 3)
      ids(i) = s.getLong(0)
      vecs(i) = s.getArray(1).toDoubleArray()
      nrms(i) = s.getDouble(2)
      i += 1
    }
    val dim = vecs(0).length
    i = 0
    while (i < n) {
      if (vecs(i).length != dim)
        throw new IllegalArgumentException(
          s"bucket_pair_dots: vector length mismatch ($dim vs ${vecs(i).length})")
      i += 1
    }
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      // skip positions whose members share an id (degenerate input with
      // duplicate ids in one bucket): the doc_a < doc_b contract promises
      // STRICT inequality, and the self-join formulation this generator
      // replaced (join condition doc_a < doc_b) dropped such rows too
      // (ADVICE r04)
      private def skipSelfPairs(): Unit =
        while (a < n - 1 && ids(a) == ids(b)) step()
      private def step(): Unit = { b += 1; if (b == n) { a += 1; b = a + 1 } }
      skipSelfPairs()
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        val va = vecs(a); val vb = vecs(b)
        var s = 0.0
        var j = 0
        while (j < dim) { s += va(j) * vb(j); j += 1 }
        val row =
          if (ids(a) < ids(b)) InternalRow(ids(a), ids(b), s, nrms(a), nrms(b))
          else InternalRow(ids(b), ids(a), s, nrms(b), nrms(a))
        step()
        skipSelfPairs()
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BucketPairDots =
    copy(child = newChild)
}

object BucketPairDots {
  /** Column-level API over an array<struct<id, e, nrm>> bucket column. */
  def of(xs: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      BucketPairDots(org.apache.spark.sql.GraftShims.expression(xs)))
}
