package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native quantizer kernels for the IVF / IVF-PQ similarity tier
  * ([[graft.ml.Sim.ivfpqTopK]]), registered as SQL functions by
  * [[graft.GraftExtensions]].
  *
  * Why these exist (round 11, measured): the same math written as
  * Catalyst array expressions is pathological at BOTH ends — higher-order
  * lambdas (`aggregate(zip_with(...))`) are CodegenFallback and interpret
  * per element with boxing, while unrolling the fixed-size cell/code
  * loops into 100+ flat expressions generates a whole-stage method past
  * HotSpot's huge-method JIT limit, leaving the hot path as INTERPRETED
  * BYTECODE (54 s vs 3.7 s with codegen off at bench SF). Each kernel
  * here generates ONE static call into [[PqKernels]] — tiny generated
  * code that stays JIT-compiled, with the quantizer constants decoded
  * once per expression instance from their foldable literal children and
  * shipped as plain `double[][]` reference objects.
  *
  * Distance convention matches `graft_dot`'s zero-padding: a vector
  * shorter than a centroid scores as if zero-padded, so mixed-length
  * corpora degrade instead of throwing.
  */
object PqKernels {

  private[functions] def mat(e: Expression): Array[Array[Double]] = {
    val ad = e.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private[functions] def cube(e: Expression): Array[Array[Array[Double]]] = {
    val ad = e.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val m = ad.getArray(i)
      Array.tabulate(m.numElements())(j => m.getArray(j).toDoubleArray())
    }
  }

  private def d2(x: ArrayData, c: Array[Double]): Double = {
    val n = math.min(x.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) { val z = x.getDouble(i) - c(i); s += z * z; i += 1 }
    while (i < c.length) { s += c(i) * c(i); i += 1 } // x zero-padded
    s
  }

  private def d2Sub(x: ArrayData, off: Int, b: Array[Double]): Double = {
    val nx = x.numElements()
    var s = 0.0
    var j = 0
    while (j < b.length) {
      val xv = if (off + j < nx) x.getDouble(off + j) else 0.0
      val z = xv - b(j)
      s += z * z
      j += 1
    }
    s
  }

  /** Indices of the `np` nearest centers, ascending by (distance, index). */
  def nearestCells(x: ArrayData, cents: Array[Array[Double]], np: Int): ArrayData = {
    val k = cents.length
    val m = math.min(np, k)
    val bestD = Array.fill(m)(Double.MaxValue)
    val bestC = Array.fill(m)(Int.MaxValue)
    var c = 0
    while (c < k) {
      val d = d2(x, cents(c))
      var pos = m
      while (pos > 0 && (d < bestD(pos - 1) ||
          (d == bestD(pos - 1) && c < bestC(pos - 1)))) pos -= 1
      if (pos < m) {
        var q = m - 1
        while (q > pos) { bestD(q) = bestD(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
        bestD(pos) = d
        bestC(pos) = c
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  /** Per-subspace argmin code of the residual against each codebook. */
  def pqEncode(r: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val d = d2Sub(r, off, book(c))
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(s) = best
      off += book(0).length
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** The ADC lookup table: dtab[s][c] = ‖qr_s − CB[s][c]‖². */
  def adcTable(qr: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) { row(c) = d2Sub(qr, off, book(c)); c += 1 }
      out(s) = new GenericArrayData(row)
      off += book(0).length
      s += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def checkVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private[functions] def checkMat(e: Expression): Boolean = e.foldable && (e.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  })

  private[functions] def checkCube(e: Expression): Boolean = e.foldable && (e.dataType match {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  })
}

/** `graft_nearest_cells(vec, centers, nprobe) -> array<int>` — the `nprobe`
  * nearest coarse-quantizer cells, ascending by (distance, index). Serves
  * both cell assignment (nprobe=1) and multi-probe query fan-out.
  */
case class NearestCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.checkVec(first.dataType) && PqKernels.checkMat(second) &&
        third.foldable && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, foldable array<array<double>>, foldable int)")

  @transient private lazy val cents = PqKernels.mat(second)
  @transient private lazy val np = third.eval(null).asInstanceOf[Number].intValue()

  override def nullSafeEval(v: Any, c: Any, n: Any): Any =
    PqKernels.nearestCells(v.asInstanceOf[ArrayData], cents, np)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val ref = ctx.addReferenceObj("cents", cents, "double[][]")
      s"${ev.value} = graft.functions.PqKernels.nearestCells($v, $ref, $np);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCells = copy(f, s, t)
}

/** `graft_pq_encode(residual, codebooks) -> array<int>` — per-subspace
  * argmin PQ codes of a residual vector.
  */
case class PqEncode(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.checkVec(left.dataType) && PqKernels.checkCube(right))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, foldable array<array<array<double>>>)")

  @transient private lazy val books = PqKernels.cube(right)

  override def nullSafeEval(r: Any, b: Any): Any =
    PqKernels.pqEncode(r.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, _) => {
      val ref = ctx.addReferenceObj("books", books, "double[][][]")
      s"${ev.value} = graft.functions.PqKernels.pqEncode($r, $ref);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(l, r)
}

/** `graft_adc_table(queryResidual, codebooks) -> array<array<double>>` —
  * the per-probe asymmetric-distance lookup table (Jégou et al. §5):
  * candidates then pay m table lookups instead of m×ds arithmetic.
  */
case class AdcTable(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_adc_table"

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.checkVec(left.dataType) && PqKernels.checkCube(right))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, foldable array<array<array<double>>>)")

  @transient private lazy val books = PqKernels.cube(right)

  override def nullSafeEval(q: Any, b: Any): Any =
    PqKernels.adcTable(q.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, _) => {
      val ref = ctx.addReferenceObj("books", books, "double[][][]")
      s"${ev.value} = graft.functions.PqKernels.adcTable($q, $ref);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcTable =
    copy(l, r)
}
