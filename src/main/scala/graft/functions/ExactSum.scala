package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Final conversion for [[SumUnscaled128]]: the signed 128-bit integer
  * (hi·2⁶⁴ + unsigned lo) is the exact unscaled sum; interpret it at the
  * input's decimal scale and convert to double with BigDecimal's
  * correctly-rounded (nearest-even) conversion — the SAME rounding
  * `Decimal.toDouble` applies, so the result is bit-identical to
  * `sum(CAST(x AS DECIMAL(p, s))).cast("double")`. Runs once per GROUP,
  * never per row.
  */
object I128Sum {
  def toDouble(hi: Long, lo: Long, scale: Int): Double = {
    val loBytes = new Array[Byte](8)
    var i = 0
    while (i < 8) { loBytes(i) = (lo >>> (56 - 8 * i)).toByte; i += 1 }
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(1, loBytes))
    new java.math.BigDecimal(bi, scale).doubleValue()
  }
}

/** Exact order-independent SUM of a compact decimal column, finished as
  * DOUBLE — the codegen-friendly replacement for
  * `sum(CAST(x AS DECIMAL(18, s))).cast("double")` (guide §4: eliminate
  * non-codegen-friendly per-row work in the hot path).
  *
  * WHY: Spark's built-in `Sum` over a decimal input widens the buffer by
  * 10 digits (18 → 28), and a decimal with precision > 18 leaves the
  * compact-long representation — every row then pays a JavaBigDecimal
  * add plus re-serialization into the aggregation buffer. Measured at
  * sf0.1 (600k lineitems, 5 sums): 2.34 s vs 0.50 s for plain double
  * sums — the exactness discipline cost ~4× the aggregation itself.
  *
  * HOW: the input decimal (precision ≤ 18, REQUIRED) is compact, so its
  * unscaled value is one long. Accumulate those longs into a signed
  * 128-bit integer held as two long buffer slots (hi, lo) — plain
  * two's-complement carry arithmetic, fully codegen'd, no allocation:
  *
  *   lo' = lo + u                                (wrapping, LEGACY add)
  *   carry = ((lo & u) | ((lo | u) & ~lo')) >>> 63   (unsigned carry-out)
  *   hi' = hi + (u >> 63) + carry               (sign-extend u, add carry)
  *
  * Merge combines two (hi, lo) pairs with the same carry formula (no
  * sign extension — both are raw 128-bit limbs). Addition is associative
  * and every step exact, so the result is VALUE-IDENTICAL to the decimal
  * sum for every order of partial merges; the final double conversion
  * ([[I128Sum.toDouble]]) applies the identical nearest-even rounding.
  *
  * Headroom: 2¹²⁷ ≈ 1.7e38 of unscaled sum vs the old decimal(28)'s
  * 1e28 — strictly wider before overflow, i.e. this CANNOT overflow
  * where the old form succeeded. Nulls are ignored and an all-null /
  * empty group yields NULL, exactly like `Sum` (the `seen` flag).
  */
case class SumUnscaled128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private lazy val scale: Int = child.dataType match {
    case dt: DecimalType =>
      require(dt.precision <= Decimal.MAX_LONG_DIGITS,
        s"graft_dsum needs a compact decimal input (precision <= 18), got " +
          s"${child.dataType.simpleString} — cast to DECIMAL(18, s) first")
      dt.scale
    case other => throw new IllegalArgumentException(
      s"graft_dsum expects a decimal input, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dsum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case dt: DecimalType if dt.precision <= Decimal.MAX_LONG_DIGITS =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dsum needs a compact decimal input (precision <= 18), got " +
            s"${other.simpleString} — cast to DECIMAL(18, s) first")
    }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Wrapping long add — EXPLICITLY legacy so ANSI mode (Spark 4 default)
    * cannot turn the deliberate 64-bit wraparound into an overflow error. */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Unsigned carry-out of a+b (two's complement), as 0L/1L. */
  private def carryOut(a: Expression, b: Expression, sum: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val u = UnscaledValue(child)
    val loNew = wadd(lo, u)
    val hiNew = wadd(wadd(hi, ShiftRight(u, Literal(63))), carryOut(lo, u, loNew))
    Seq(
      If(IsNull(child), hi, hiNew),
      If(IsNull(child), lo, loNew),
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val loM = wadd(lo.left, lo.right)
    val hiM = wadd(wadd(hi.left, hi.right), carryOut(lo.left, lo.right, loM))
    Seq(hiM, loM, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      StaticInvoke(I128Sum.getClass, DoubleType, "toDouble",
        Seq(hi, lo, Literal(scale)),
        inputTypes = Seq(LongType, LongType, IntegerType),
        propagateNull = false, returnNullable = false),
      Literal(null, DoubleType))

  override protected def withNewChildInternal(newChild: Expression): SumUnscaled128 =
    copy(child = newChild)
}

/** Per-row double → unscaled-long conversion for [[SumUnscaledFixed]].
  *
  * The SEMANTIC DEFINITION is the slow path: Spark's
  * `CAST(x AS DECIMAL(18, s))` converts through the double's shortest
  * decimal string (`BigDecimal.valueOf` = `Double.toString`) and rounds
  * HALF_UP at scale s — the cross-engine contract every dsum oracle pins.
  *
  * The fast path skips the string round-trip when its result is PROVABLY
  * identical: candidate r = round(x·10ˢ), accepted iff r/10ˢ re-rounds to
  * exactly x. Proof of equivalence under the guard |x·10ˢ| < 2⁵⁰:
  * acceptance means x is the correctly-rounded double of the decimal
  * r·10⁻ˢ, so the shortest-repr decimal d of x also lies in x's rounding
  * interval: |d − r·10⁻ˢ| < ulp(x) ≤ 2⁻⁵¹·|x| < 0.5·10⁻ˢ (the guard),
  * hence d rounds at scale s to exactly r — no other grid point or tie is
  * reachable. Every money-like corpus value (≤ s decimal places) takes
  * this path; computed products (long binary expansions) fail the
  * round-trip check and take the definitional slow path. r.toDouble is
  * exact (|r| ≤ 2⁵⁰) and the division is correctly rounded, so the check
  * itself is exact.
  *
  * Overflow: unscaled results beyond Long range throw (ArithmeticException)
  * — the ANSI cast on the old path also threw there; values between 18
  * digits and 2⁶³ are accepted rather than refused (the 128-bit buffer is
  * exact far beyond either), documented as strictly-wider-never-narrower.
  */
object D2U {
  private val POW: Array[Double] = Array.tabulate(19)(i => math.pow(10, i))
  def unscaled(x: Double, s: Int): Long = {
    val p = POW(s)
    val y = x * p
    if (java.lang.Math.abs(y) < 1.125899906842624e15) { // 2^50
      val r = java.lang.Math.round(y)
      if (r.toDouble / p == x) return r
    }
    // BigDecimal.valueOf(NaN/Infinity) would throw a raw
    // NumberFormatException — fail with a diagnosable message that names
    // the aggregate and the offending value instead
    if (!java.lang.Double.isFinite(x))
      throw new ArithmeticException(
        s"graft_dsum: non-finite input $x cannot be summed exactly at " +
          s"scale $s — filter NaN/Infinity rows first")
    java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }
}

/** [[SumUnscaled128]] with the scale declared by the CALLER (second
  * argument, a foldable int) instead of read off a pre-cast decimal input
  * — `graft_dsum(x, s)`. Value-identical to
  * `sum(CAST(x AS DECIMAL(18, s))).cast("double")` for every input type:
  *
  *  - DOUBLE children skip the per-row Cast→Decimal→UnscaledValue chain
  *    (shortest-string parse + BigDecimal setScale + precision check +
  *    Decimal boxing) for one codegen'd [[D2U.unscaled]] call whose fast
  *    path is a multiply, a round and a verifying division (r18, guide
  *    §4 / §1.2 — measured 0.96 s → ~0.4 s for the 6-sum agg_group
  *    aggregate at sf0.1).
  *  - Every other child type keeps the definitional
  *    `UnscaledValue(CAST(child AS DECIMAL(18, s)))` — exact for
  *    integers and rescaled decimals, so T.dsum needs no type analysis
  *    at call sites.
  *
  * Accumulation and final conversion are [[SumUnscaled128]]'s verbatim.
  */
case class SumUnscaledFixed(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dsum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType if scale >= 0 && scale <= 18 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dsum(x, s) needs a numeric x and 0 <= s <= 18, got " +
            s"${other.simpleString} at scale $scale")
    }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  private def carryOut(a: Expression, b: Expression, sum: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val u: Expression = child.dataType match {
      case DoubleType => StaticInvoke(D2U.getClass, LongType, "unscaled",
        Seq(child, Literal(scale)),
        inputTypes = Seq(DoubleType, IntegerType),
        propagateNull = false, returnNullable = false)
      case _ => UnscaledValue(Cast(child, DecimalType(18, scale)))
    }
    val loNew = wadd(lo, u)
    val hiNew = wadd(wadd(hi, ShiftRight(u, Literal(63))), carryOut(lo, u, loNew))
    Seq(
      If(IsNull(child), hi, hiNew),
      If(IsNull(child), lo, loNew),
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val loM = wadd(lo.left, lo.right)
    val hiM = wadd(wadd(hi.left, hi.right), carryOut(lo.left, lo.right, loM))
    Seq(hiM, loM, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      StaticInvoke(I128Sum.getClass, DoubleType, "toDouble",
        Seq(hi, lo, Literal(scale)),
        inputTypes = Seq(LongType, LongType, IntegerType),
        propagateNull = false, returnNullable = false),
      Literal(null, DoubleType))

  override protected def withNewChildInternal(newChild: Expression): SumUnscaledFixed =
    copy(child = newChild)
}
