package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Third opinion for the naive Bayes pair (queries/Caim.scala): the fit
  * counts and every prediction recompute on the driver from the raw
  * embeddings with EXACT BigInt rational comparisons (cross-multiplication,
  * no doubles anywhere in the argmax) — so a Spark/DuckDB agreement on a
  * wrong smoothing or a float-fragile tie-break can't slip through.
  */
class NbSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** (vec_id, label, bins per feature) with the query's 20-bin grid. */
  private def binned(sf: String): (Array[(Long, Int, Array[Int])], Int) = {
    val raw = T.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        element_at(col("embedding"), 1).cast("double"),
        element_at(col("embedding"), 2).cast("double"),
        element_at(col("embedding"), 3).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Array(r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    val lo = Array.tabulate(3)(f => raw.map(_._3(f)).min)
    val hi = Array.tabulate(3)(f => raw.map(_._3(f)).max)
    val rows = raw.map { case (id, lab, fs) =>
      (id, lab, Array.tabulate(3) { f =>
        math.min(math.floor((fs(f) - lo(f)) / ((hi(f) - lo(f)) / 20)), 19.0)
          .toInt
      })
    }
    (rows, raw.length)
  }

  test("nb_fit: class-conditional counts match a driver histogram exactly") {
    val out = SparkEntry.queries("nb_fit")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue,
        r.getAs[Number](2).intValue) -> r.getAs[Number](3).longValue).toMap
    val (rows, n) = binned(sf001)
    val ref = rows.flatMap { case (_, lab, bins) =>
      bins.zipWithIndex.map { case (b, f) => (s"f${f + 1}", b.toLong, lab) }
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    out shouldBe ref
    out.values.sum shouldBe 3L * n // every (row, feature) counted once
  }

  test("nb_classify: every argmax recomputes via exact BigInt rationals") {
    val out = SparkEntry.queries("nb_classify")(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val (rows, n) = binned(sf001)
    val priors = rows.groupBy(_._2).map { case (c, g) => c -> g.length }
    val counts = rows.flatMap { case (_, lab, bins) =>
      bins.zipWithIndex.map { case (b, f) => (f, b, lab) }
    }.groupBy(identity).map { case (k, g) => k -> g.length }
    val classes = priors.keys.toSeq.sorted
    rows.foreach { case (id, trueLab, bins) =>
      // score_c = n_c·Π(cnt+1) / ((n_c+20)^3·N): compare fractions by
      // cross-multiplication in BigInt — exact, no doubles
      val scored = classes.map { c =>
        val nc = priors(c)
        val num = BigInt(nc) * (0 until 3)
          .map(f => BigInt(counts.getOrElse((f, bins(f), c), 0) + 1)).product
        val den = BigInt(nc + 20).pow(3) * BigInt(n)
        (c, num, den)
      }
      val best = scored.reduceLeft { (a, b) =>
        val cmp = (a._2 * b._3).compare(b._2 * a._3)
        if (cmp > 0) a else if (cmp < 0) b
        else if (a._1 <= b._1) a else b
      }
      withClue(s"vec $id: ") {
        out(id) shouldBe ((trueLab, best._1))
      }
    }
    // the model beats chance on its own training data (10 classes)
    val acc = out.count { case (_, (t, p)) => t == p }.toDouble / out.size
    acc should be > 0.15
  }
}
