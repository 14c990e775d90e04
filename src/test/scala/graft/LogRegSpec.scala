package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Third opinion for ml_logreg / LogReg.fit: the distributed IRLS must
  * land on the same coefficients as an INDEPENDENT pure-Scala IRLS over
  * the collected rows (separate code path — its own sigmoid/Newton/solve),
  * recover planted signs on a separable set, and strictly improve the
  * log-likelihood over the null model.
  */
class LogRegSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** Independent driver IRLS (own solve via Cramer-free elimination). */
  private def refIrls(x: Array[Array[Double]], y: Array[Double],
      iters: Int): Array[Double] = {
    val d = x(0).length
    var beta = new Array[Double](d)
    for (_ <- 1 to iters) {
      val a = Array.fill(d, d)(0.0)
      val g = Array.fill(d)(0.0)
      x.zip(y).foreach { case (xi, yi) =>
        val eta = xi.zip(beta).map { case (v, b) => v * b }.sum
        val p = 1.0 / (1.0 + math.exp(-eta))
        val w = p * (1.0 - p)
        for (j <- 0 until d) {
          g(j) += (yi - p) * xi(j)
          for (k <- 0 until d) a(j)(k) += w * xi(j) * xi(k)
        }
      }
      for (j <- 0 until d) a(j)(j) += 1e-9
      // local elimination, written independently of LogReg.solve
      for (c <- 0 until d) {
        val piv = (c until d).maxBy(r => math.abs(a(r)(c)))
        val (ta, tg) = (a(c), g(c)); a(c) = a(piv); g(c) = g(piv)
        a(piv) = ta; g(piv) = tg
        for (r <- c + 1 until d) {
          val f = a(r)(c) / a(c)(c)
          for (k <- c until d) a(r)(k) -= f * a(c)(k)
          g(r) -= f * g(c)
        }
      }
      val step = new Array[Double](d)
      for (c <- d - 1 to 0 by -1) {
        var s = g(c)
        for (k <- c + 1 until d) s -= a(c)(k) * step(k)
        step(c) = s / a(c)(c)
      }
      beta = beta.zip(step).map { case (b, s) => b + s }
    }
    beta
  }

  private def logLik(x: Array[Array[Double]], y: Array[Double],
      beta: Array[Double]): Double =
    x.zip(y).map { case (xi, yi) =>
      val eta = xi.zip(beta).map { case (v, b) => v * b }.sum
      val p = 1.0 / (1.0 + math.exp(-eta))
      yi * math.log(p) + (1.0 - yi) * math.log(1.0 - p)
    }.sum

  test("distributed IRLS matches an independent driver IRLS to 1e-6") {
    val df = T.t(spark, sf001, "embeddings").select(
      element_at(col("embedding"), 1).cast("double").as("f1"),
      element_at(col("embedding"), 2).cast("double").as("f2"),
      element_at(col("embedding"), 3).cast("double").as("f3"),
      (col("label") % 2).cast("int").as("y"))
    val beta = graft.ml.LogReg.fit(df, Seq("f1", "f2", "f3"), "y")
    val rows = df.collect().map(r =>
      (Array(1.0, r.getDouble(0), r.getDouble(1), r.getDouble(2)),
        r.getInt(3).toDouble))
    val (x, y) = (rows.map(_._1), rows.map(_._2))
    val ref = refIrls(x, y, 8)
    beta.zip(ref).zipWithIndex.foreach { case ((b, r), i) =>
      withClue(s"coef $i: ") { b shouldBe r +- 1e-6 }
    }
    // the fit beats the null model on its own training data
    val nullBeta = Array(math.log(
      y.sum / (y.length - y.sum)), 0.0, 0.0, 0.0)
    logLik(x, y, beta) should be > logLik(x, y, nullBeta) - 1e-9
    // the declared query reports exactly these coefficients at 6dp
    val out = SparkEntry.queries("ml_logreg")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.keySet shouldBe Set("intercept", "f1", "f2", "f3")
    Seq("intercept" -> 0, "f1" -> 1, "f2" -> 2, "f3" -> 3).foreach {
      case (n, i) => out(n) shouldBe beta(i) +- 1e-5
    }
  }

  test("planted separable data: signs recover, training accuracy is high") {
    import spark.implicits._
    // y = 1 iff 2·a − b > 0 plus margin: IRLS must find positive a-weight,
    // negative b-weight, near-perfect separation
    val rows = (0 until 400).map { i =>
      val a = (i % 21 - 10) / 10.0
      val b = ((i * 7) % 19 - 9) / 9.0
      val y = if (2.0 * a - b > 0.15) 1 else if (2.0 * a - b < -0.15) 0
        else (i % 2)
      (a, b, y)
    }
    val df = rows.toDF("a", "b", "y")
    val beta = graft.ml.LogReg.fit(df, Seq("a", "b"), "y", iters = 12)
    beta(1) should be > 0.0
    beta(2) should be < 0.0
    val acc = rows.count { case (a, b, y) =>
      val p = 1.0 / (1.0 + math.exp(-(beta(0) + beta(1) * a + beta(2) * b)))
      (if (p >= 0.5) 1 else 0) == y
    }.toDouble / rows.size
    acc should be > 0.85
  }

  test("solve: hand 3x3 system with pivoting") {
    val a = Array(Array(0.0, 2.0, 1.0), Array(1.0, 0.0, 1.0),
      Array(2.0, 1.0, 0.0))
    val b = Array(5.0, 4.0, 4.0)
    val x = graft.ml.LogReg.solve(a, b)
    // verify A·x = b
    a.zip(b).foreach { case (row, bi) =>
      row.zip(x).map { case (v, xi) => v * xi }.sum shouldBe bi +- 1e-12
    }
  }
}
