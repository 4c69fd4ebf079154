package graft.engine.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed UDAF surface (SURVEY §4.3): second-largest value as a single-pass
 * Aggregator[IN, BUF, OUT], registered via functions.udaf.
 *
 * Multiset semantics (duplicated maxima count twice) — matches the SQL
 * row_number()=2 formulation. The (max1, max2) buffer is O(1), merges
 * associatively/commutatively, so partial aggregation (map-side combine)
 * is exact at any partitioning — the property that makes it 100 TB-safe.
 */
object SecondMaxAgg extends Aggregator[Double, (Double, Double), Double] {
  override def zero: (Double, Double) =
    (Double.NegativeInfinity, Double.NegativeInfinity)

  override def reduce(b: (Double, Double), v: Double): (Double, Double) =
    if (v > b._1) (v, b._1)
    else if (v > b._2) (b._1, v)
    else b

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    reduce(reduce(a, b._1), b._2)

  override def finish(r: (Double, Double)): Double = r._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
