package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed binary logistic regression via IRLS / Newton–Raphson (the
  * classical GLM fit — McCullagh & Nelder, *Generalized Linear Models*,
  * 1989; the same iteration MLlib's LogisticRegression L-BFGS path
  * approximates): each iteration computes the exact Newton step from ONE
  * distributed aggregate — the (d+1)×(d+1) weighted moment matrix X'WX
  * (upper triangle, w = p(1−p)) and the score vector X'(y−p), both plain
  * codegen'd column expressions over the current coefficient LITERALS —
  * and solves the (d+1)-dimensional system on the driver. Corpus cost is
  * `iters` aggregate passes; nothing corpus-sized is ever collected, and
  * the per-pass shuffle is the fixed (d+1)(d+2)/2 + (d+1) doubles of the
  * sufficient statistics. At 100 TB the shape is unchanged — this is the
  * textbook "sufficient statistics in the cluster, solve on the driver"
  * GLM and scales in d², not n.
  *
  * Determinism note: the moment sums are IEEE double partial sums, so the
  * last ulps depend on partition order; callers exposing results round
  * (ml_logreg reports 6dp) and the spec compares against a driver
  * reference at 1e-6. A tiny ridge (1e-9) keeps the solve stable on
  * near-separable data.
  */
object LogReg {

  /** @param features numeric feature columns (an intercept is added)
    * @param labelCol 0/1 integer label column
    * @return fitted coefficients, intercept first, then `features` order */
  def fit(df: DataFrame, features: Seq[String], labelCol: String,
      iters: Int = 8, ridge: Double = 1e-9): Array[Double] = {
    val d = features.length + 1
    var beta = new Array[Double](d)
    val xs: Seq[Column] = lit(1.0) +: features.map(col(_).cast("double"))
    val y = col(labelCol).cast("double")
    for (_ <- 1 to iters) {
      val eta = xs.zip(beta).map { case (x, b) => x * lit(b) }
        .reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      val w = p * (lit(1.0) - p)
      val r = y - p
      val hess = for { j <- 0 until d; k <- j until d }
        yield sum(w * xs(j) * xs(k)).as(s"h_${j}_$k")
      val grad = (0 until d).map(j => sum(r * xs(j)).as(s"g_$j"))
      val row = df.agg(hess.head, (hess.tail ++ grad): _*).head()
      val a = Array.tabulate(d, d) { (j, k) =>
        val (lo, hi) = (math.min(j, k), math.max(j, k))
        row.getAs[Double](s"h_${lo}_$hi") + (if (j == k) ridge else 0.0)
      }
      val g = Array.tabulate(d)(j => row.getAs[Double](s"g_$j"))
      beta = beta.zip(solve(a, g)).map { case (b, s) => b + s }
    }
    beta
  }

  /** Gaussian elimination with partial pivoting on a small dense system
    * (mutates copies; d is the schema width, never the corpus). */
  private[graft] def solve(a0: Array[Array[Double]],
      b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (c <- 0 until n) {
      var piv = c
      for (r2 <- c + 1 until n)
        if (math.abs(a(r2)(c)) > math.abs(a(piv)(c))) piv = r2
      val (ta, tb) = (a(c), b(c)); a(c) = a(piv); b(c) = b(piv)
      a(piv) = ta; b(piv) = tb
      require(math.abs(a(c)(c)) > 1e-300, "singular IRLS system")
      for (r2 <- c + 1 until n) {
        val f = a(r2)(c) / a(c)(c)
        for (k <- c until n) a(r2)(k) -= f * a(c)(k)
        b(r2) -= f * b(c)
      }
    }
    val x = new Array[Double](n)
    for (c <- n - 1 to 0 by -1) {
      var s = b(c)
      for (k <- c + 1 until n) s -= a(c)(k) * x(k)
      x(c) = s / a(c)(c)
    }
    x
  }
}
