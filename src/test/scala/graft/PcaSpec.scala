package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Spectral-law verification for ml_pca (queries/Stats.scala + ml/Pca):
  * rather than pinning values, assert the DEFINITION — the reported
  * (eigenvalue, loading) pairs must satisfy A·v = λ·v against a correlation
  * matrix recomputed INDEPENDENTLY from raw rows with BigInt sums, be
  * orthonormal, sum to the trace, and descend. Any wrong moment, wrong
  * descale, or broken rotation fails at least one law.
  */
class PcaSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def refCorr(sf: String): Array[Array[Double]] = {
    val rows = T.t(spark, sf, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")).collect()
      .map(r => Array.tabulate(4)(i =>
        BigInt(math.rint(r.getDouble(i) * 100).toLong)))
    val n = BigInt(rows.length)
    def s(i: Int) = rows.map(_(i)).sum
    def p(i: Int, j: Int) = rows.map(r => r(i) * r(j)).sum
    Array.tabulate(4, 4)((i, j) =>
      (n * p(i, j) - s(i) * s(j)).toDouble /
        math.sqrt((n * p(i, i) - s(i) * s(i)).toDouble *
                  (n * p(j, j) - s(j) * s(j)).toDouble))
  }

  test("ml_pca satisfies the spectral laws of the independent corr matrix") {
    val out = SparkEntry.queries("ml_pca")(spark, sf001).collect()
      .sortBy(_.getLong(0))
    out.length shouldBe 4
    val vals = out.map(_.getDouble(1))
    val vecs = out.map(r => Array.tabulate(4)(i => r.getDouble(3 + i)))
    val a = refCorr(sf001)
    // eigen residual: ||A v - λ v||∞ small (loadings are 6dp-rounded, and
    // A v amplifies that by ≤ ||A|| ~ λmax, so 1e-4 is the honest bound)
    for (k <- 0 until 4; i <- 0 until 4) {
      val av = (0 until 4).map(j => a(i)(j) * vecs(k)(j)).sum
      withClue(s"component ${k + 1}, row $i: ") {
        av shouldBe (vals(k) * vecs(k)(i)) +- 1e-4
      }
    }
    // orthonormality at rounding precision
    for (k <- 0 until 4; l <- k until 4) {
      val dot = (0 until 4).map(i => vecs(k)(i) * vecs(l)(i)).sum
      withClue(s"v${k}.v$l: ") {
        dot shouldBe (if (k == l) 1.0 else 0.0) +- 1e-4
      }
    }
    // trace(corr) = d; eigenvalues descend and are non-negative (corr is
    // PSD); pct_var is λ/d
    vals.sum shouldBe 4.0 +- 1e-4
    vals.sliding(2).foreach { case Array(x, y) => x should be >= y; case _ => }
    vals.foreach(_ should be >= -1e-9)
    out.foreach(r => r.getDouble(2) shouldBe (r.getDouble(1) / 4.0) +- 1e-6)
    // sign convention: each vector's largest-|entry| is positive
    vecs.foreach { v =>
      val piv = v.indices.maxBy(i => (math.abs(v(i)), -i))
      v(piv) should be > 0.0
    }
  }

  test("eigenSym recovers a hand-built spectrum exactly") {
    // A = Q diag(3,1) Qᵀ with Q a 45° rotation: eigenvalues {3, 1},
    // eigenvectors (±1/√2, 1/√2)
    val h = math.sqrt(0.5)
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (vals, vecs) = graft.ml.Pca.eigenSym(a)
    vals(0) shouldBe 3.0 +- 1e-12
    vals(1) shouldBe 1.0 +- 1e-12
    math.abs(vecs(0)(0)) shouldBe h +- 1e-12
    math.abs(vecs(0)(1)) shouldBe h +- 1e-12
    // sign canonicalization: max-|entry| positive (first index on tie)
    vecs(0)(0) should be > 0.0
    vecs(1).map(math.abs).max shouldBe h +- 1e-12
  }
}
