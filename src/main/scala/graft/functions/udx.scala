package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** SURVEY.md §2.12 — user-defined scalar + aggregate surface.
  *
  * `clamp` demonstrates UDF registration; production code should prefer the
  * codegen'd built-ins `least(greatest(...))` — the UDF exists to exercise
  * the extension surface, and its semantics are oracle-checked against the
  * built-in formulation.
  */
object Udx {

  /** Scalar UDF: clamp a double into [lo, hi]. */
  val clamp: (Double, Double, Double) => Double =
    (v, lo, hi) => math.min(math.max(v, lo), hi)

  /** Typed UDAF: mean of `x` weighted by `w`, as an [[Aggregator]] with an
    * associative (sumXW, sumW) buffer — partial aggregation merges on
    * executors, a single division at the end.
    */
  object WeightedMeanAgg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-function form of [[WeightedMeanAgg]]. */
  def weightedMean(x: Column, w: Column): Column =
    udaf(WeightedMeanAgg, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(x, w)
}
