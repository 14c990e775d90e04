package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join — SURVEY.md §2.13: pairs of rows satisfying
  * an INTERVAL predicate `rightVal − leftVal ∈ (low, high]`, executed as an
  * EQUI-join on a quantized bin key plus a residual filter, never as a
  * nested-loop or per-key cross product.
  *
  * Why this exists: Spark plans a pure inequality predicate as
  * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, broadcast cap on one
  * side), and an equi-key + inequality as a hash join whose per-key
  * fan-out is quadratic in the key's row count — one hot key (a bot user,
  * a default account) makes a straggler task at 100 TB. Quantizing the
  * value into bins of width `high − low` makes every left row match rows
  * in AT MOST TWO bins, so the join becomes a plain shuffled equi-join on
  * (keys…, bin): co-located, AQE-skew-splittable, and linear in the true
  * match count instead of the per-key row count squared. The same trick
  * under Databricks' range-join bin hints and KDB's window joins, built
  * here from stock Spark operators: explode(sequence(…)) for the ≤2 bin
  * replicas, an equi-join Catalyst already knows how to shuffle, and the
  * exact predicate kept as a residual so semantics never depend on the
  * binning.
  *
  * Cost model: left rows duplicate ×2 (the two candidate bins); right rows
  * don't duplicate. Candidates per left row = right rows within its two
  * bins — for time joins ("events within 5 minutes") that is the 10-minute
  * neighbourhood, not the whole key group. A custom `binWidth` trades the
  * duplication factor against bin population: width w covers the interval
  * with ⌈(high−low)/w⌉+1 replicas.
  */
object RangeJoin {

  /** The bin KEY is the floor multiple `c − pmod(c, w)` itself — never a
    * quotient: equal multiples ⇔ equal bins, so no division is needed at
    * all, and the arithmetic stays exact long math for the full value
    * range (a double-division quotient would silently misbin values above
    * 2^53, e.g. nanosecond epochs). pmod keeps floor semantics for
    * negative values.
    */
  private def binOf(c: Column, w: Long): Column = c - pmod(c, lit(w))

  /** All (left, right) row pairs with `keyEq` satisfied and
    * `rightVal ∈ (leftVal + lowExclusive, leftVal + highInclusive]`.
    *
    * @param left / right   input frames; column names must be disjoint
    *                       (rename before a self-join, as any Spark
    *                       self-join requires)
    * @param keyEq          extra equi condition (`lit(true)` for a pure
    *                       band join — still an equi-join on the bin key,
    *                       NO nested loop; RangeJoinSpec asserts the plan)
    * @param leftVal        long-typed value on the left frame (timestamps:
    *                       `unix_micros(ts)`)
    * @param rightVal       long-typed value on the right frame
    * @param lowExclusive   interval lower bound, exclusive
    * @param highInclusive  interval upper bound, inclusive
    * @param binWidth       bin width; 0 (default) = `high − low`, the
    *                       minimal-duplication choice (≤2 bins per left row)
    */
  def within(left: DataFrame, right: DataFrame, keyEq: Column,
      leftVal: Column, rightVal: Column,
      lowExclusive: Long, highInclusive: Long, binWidth: Long = 0L): DataFrame = {
    require(highInclusive > lowExclusive,
      s"empty interval: ($lowExclusive, $highInclusive]")
    // subtractExact: an interval wider than Long.MaxValue must fail loudly,
    // not wrap to a negative width that silently misbins every row
    val w = if (binWidth > 0) binWidth
      else Math.subtractExact(highInclusive, lowExclusive)
    // smallest admissible rightVal is leftVal+low+1 (long-integer values),
    // largest is leftVal+high → the left row's candidate bins, stepped by
    // the bin width (bin keys are floor MULTIPLES, see binOf)
    val lb = left.withColumn("__graft_bin_l", explode(sequence(
      binOf(leftVal + lit(lowExclusive + 1), w),
      binOf(leftVal + lit(highInclusive), w), lit(w))))
    val rb = right.withColumn("__graft_bin_r", binOf(rightVal, w))
    lb.join(rb,
        col("__graft_bin_l") === col("__graft_bin_r") && keyEq &&
          rightVal > leftVal + lit(lowExclusive) &&
          rightVal <= leftVal + lit(highInclusive))
      .drop("__graft_bin_l", "__graft_bin_r")
  }

  /** INTERVAL × INTERVAL overlap join (where [[within]] is point × band):
    * all (left, right) pairs with `keyEq` satisfied whose half-open
    * intervals `[leftStart, leftEnd)` and `[rightStart, rightEnd)`
    * overlap (`ls < re && rs < le`) — temporal containment/overlap, the
    * session-vs-session / availability-window join class.
    *
    * Exactly-once without a distinct: BOTH sides explode to the bins
    * their interval covers, but a pair is accepted only in the single
    * bin containing the overlap's START `greatest(ls, rs)` — a point
    * both intervals cover whenever the overlap is non-empty — so every
    * overlapping pair is emitted by exactly one bin match and the
    * candidate stream never needs the dedup shuffle a naive multi-bin
    * join would.
    *
    * Fan-out per row = interval length / binWidth + 1: pick `binWidth`
    * near the typical interval length (the within() trade-off, on both
    * sides). Zero/negative-length intervals cannot overlap under
    * half-open semantics and are filtered before the explode (Spark's
    * `sequence` would reject a descending range).
    */
  def overlaps(left: DataFrame, right: DataFrame, keyEq: Column,
      leftStart: Column, leftEnd: Column,
      rightStart: Column, rightEnd: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = binWidth
    val lb = left.where(leftEnd > leftStart).withColumn("__graft_bin_l",
      explode(sequence(binOf(leftStart, w), binOf(leftEnd - 1, w), lit(w))))
    val rb = right.where(rightEnd > rightStart).withColumn("__graft_bin_r",
      explode(sequence(binOf(rightStart, w), binOf(rightEnd - 1, w), lit(w))))
    lb.join(rb,
        col("__graft_bin_l") === col("__graft_bin_r") && keyEq &&
          col("__graft_bin_l") === binOf(greatest(leftStart, rightStart), w) &&
          leftStart < rightEnd && rightStart < leftEnd)
      .drop("__graft_bin_l", "__graft_bin_r")
  }
}
