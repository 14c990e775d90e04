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

  /** Bounded top-k aggregator for kNN-style queries: keeps the k best
    * (sim desc, id asc) pairs in a fixed-size buffer, so the PARTIAL
    * aggregate already shrinks each map task's n·m candidate stream to k
    * rows per group — the shuffle after a broadcast nearest-neighbour scan
    * carries only groups×k rows, never the n·m candidate pairs. This is
    * what keeps brute-force kNN viable: the quadratic stream exists only
    * inside map tasks, pipelined, and is never materialized or shuffled.
    */
  class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, "k must be positive")
    private val ord: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)] { case (sim, id) => (-sim, id) }
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
      if (b.lengthCompare(k) < 0 || ord.lt(in, b.last)) ((in :: b).sorted(ord)).take(k)
      else b
    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Column-function form of [[TopKAgg]]: `topK(5, $"sim", $"b_id")`. */
  def topK(k: Int, sim: Column, id: Column): Column =
    udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(sim, id)

  /** SimHash bit-vote aggregator (Charikar, STOC 2002): streams 64-bit
    * feature hashes into a fixed 64-int vote buffer and finishes with the
    * sign-packed signature. Votes are algebraic (sum of ±1 per bit), so
    * partial aggregation shrinks each map task's hash stream to ONE 64-int
    * buffer per group before the shuffle — the gather-then-fold
    * formulation shipped every hash — and the plan stays one aggregate
    * column wide (a 64-sum-columns formulation pays ~1 s of driver
    * analysis + codegen on every cold plan, measured at sf0.1).
    */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) { if (((h >> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1; i += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Int]): Long = {
      var sh = 0L
      var i = 0
      while (i < 64) { if (r(i) > 0) sh |= (1L << i); i += 1 }
      sh
    }
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column-function form of [[SimHashAgg]]. */
  def simhashOf(h: Column): Column = udaf(SimHashAgg, Encoders.scalaLong).apply(h)
}
