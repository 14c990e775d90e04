package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.ml.AmevaDiscretizer

/** Ameva discretizer laws (González-Abril et al. 2009 over the shared
  * SupervisedHistogram): separable data cuts at the class boundary,
  * label-independent noise is rejected, boundaries are partitioning-
  * invariant, and — the load-bearing check — the estimator's prefix-sum
  * incremental greedy lands on EXACTLY the boundaries of an independent
  * from-scratch chi-square greedy (contingency table rebuilt per candidate,
  * no shared arithmetic).
  */
class AmevaSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def fitOn(df: org.apache.spark.sql.DataFrame): Array[Double] =
    new AmevaDiscretizer()
      .setInputCols(Array("x")).setOutputCols(Array("xb"))
      .setLabelCol("y").fit(df).boundaries(0)

  test("separable two-class data cuts exactly at the class boundary") {
    import spark.implicits._
    val df = ((1 to 40).map(v => (v.toDouble, "a")) ++
      (61 to 100).map(v => (v.toDouble, "b"))).toDF("x", "y")
    fitOn(df) shouldBe Array(1.0, 50.5, 100.0)
  }

  test("criterion contrast with MDLP: periodic labels fragment under chi-square") {
    import spark.implicits._
    // alternating labels ARE perfectly predictable from x at fine grain:
    // isolating pure single-value intervals drives chi2 toward its
    // N(l-1) maximum faster than the /k penalty divides it, so Ameva
    // keeps cutting — while MDLP's coding-cost term rejects the same
    // data outright (MdlpSpec's noise test). The pair documents that the
    // two criteria genuinely differ, not just in formula but in outcome.
    val df = (1 to 60).map(v => (v.toDouble, if (v % 2 == 0) "a" else "b"))
      .toDF("x", "y")
    fitOn(df).length should be > 10
  }

  test("boundaries are invariant to input partitioning") {
    val e = T.t(spark, sf001, "embeddings")
      .select(element_at(col("embedding"), 1).cast("double").as("x"),
        col("label").as("y"))
    val base = fitOn(e)
    base.length should be >= 2
    fitOn(e.repartition(7)) shouldBe base
    fitOn(e.orderBy(rand(seed = 11))) shouldBe base
  }

  test("incremental greedy equals an independent from-scratch chi-square greedy") {
    // independent reference: no prefix sums, no incremental term tracking —
    // for a candidate cut set, build the full quanta matrix and compute
    // chi2 from the textbook formula, then run the same accept-while-
    // improving loop by brute force
    val raw = T.t(spark, sf001, "embeddings")
      .select(element_at(col("embedding"), 2).cast("double").as("x"),
        col("label").cast("string").as("y"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    val labels = raw.map(_._2).distinct.sorted
    val values = raw.map(_._1).distinct.sorted
    val n = raw.length.toDouble
    val s = labels.length
    def chi2(cuts: List[Double]): Double = {
      val edges = cuts.sorted
      def bin(v: Double) = edges.count(v > _)
      val cells = raw.groupBy { case (v, y) => (bin(v), y) }
        .map { case (k, g) => k -> g.length.toLong }
      val rows = cells.groupBy(_._1._1).map { case (b, g) => b -> g.values.sum }
      val colsT = cells.groupBy(_._1._2).map { case (y, g) => y -> g.values.sum }
      cells.map { case ((b, y), c) =>
        val e = rows(b).toDouble * colsT(y) / n
        (c - e) * (c - e) / e
      }.sum
    }
    def ameva(cuts: List[Double]): Double =
      chi2(cuts) / ((cuts.length + 1).toDouble * (s - 1))
    val candidates = values.sliding(2).map(p => (p(0) + p(1)) / 2).toList
    var cuts = List.empty[Double]
    var best = 0.0
    var go = true
    while (go) {
      val options = candidates.filterNot(cuts.contains)
        .map(c => (c, ameva(c :: cuts)))
      if (options.isEmpty) go = false
      else {
        // deterministic tiebreak mirrors the estimator: first (lowest
        // position) strict maximum wins
        val (c, sc) = options.minBy { case (cc, ss) => (-ss, cc) }
        if (sc > best) { cuts = c :: cuts; best = sc } else go = false
      }
    }
    val expected = (values.head +: cuts.sorted.toArray :+ values.last).distinct
    val got = fitOn(T.t(spark, sf001, "embeddings")
      .select(element_at(col("embedding"), 2).cast("double").as("x"),
        col("label").as("y")))
    got.map(b => math.rint(b * 1e9) / 1e9).toSeq shouldBe
      expected.map(b => math.rint(b * 1e9) / 1e9).toSeq
  }
}
