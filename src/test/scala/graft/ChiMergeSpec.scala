package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ChiMerge (ml/ChiMergeDiscretizer.scala) against an independently
  * written reference merge loop — the AmevaSpec contract: the kernel is
  * re-derived here from Kerber's paper (priority-free linear min scan,
  * literal 2×S chi-square), not shared with the implementation, so a
  * drifted formula in either fails the equality.
  */
class ChiMergeSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** Independent reference: literal bottom-up merge, leftmost min tie. */
  private def refChiMerge(values: Array[Double], counts: Array[Array[Long]],
      s: Int, thr: Double): Array[Double] = {
    var iv = values.indices.map(i => (List(i), counts(i).toSeq)).toList
    def chi(a: Seq[Long], b: Seq[Long]): Double = {
      val (ra, rb) = (a.sum.toDouble, b.sum.toDouble)
      if (ra == 0 || rb == 0) return 0.0
      val n = ra + rb
      (0 until s).map { j =>
        val cs = (a(j) + b(j)).toDouble
        if (cs == 0) 0.0
        else {
          // (x*x, not pow): bit-identical chi values keep the leftmost-
          // tie ordering comparable with the implementation's
          val ea = ra * cs / n; val eb = rb * cs / n
          val da = a(j) - ea; val db = b(j) - eb
          da * da / ea + db * db / eb
        }
      }.sum
    }
    var go = true
    while (go && iv.length > 1) {
      val chis = iv.zip(iv.tail).map { case ((_, a), (_, b)) => chi(a, b) }
      val minChi = chis.min
      if (minChi < thr) {
        val at = chis.indexOf(minChi) // leftmost among exact ties
        val merged = (iv(at)._1 ++ iv(at + 1)._1,
          iv(at)._2.zip(iv(at + 1)._2).map { case (x, y) => x + y })
        iv = iv.take(at) ::: merged :: iv.drop(at + 2)
      } else go = false
    }
    val cuts = iv.tail.map(_._1.head).toArray
      .map(p => (values(p - 1) + values(p)) / 2)
    (values(0) +: cuts :+ values(values.length - 1)).distinct
  }

  test("chiMergeSelect equals the independent reference on the corpus") {
    val df = T.t(spark, sf001, "embeddings").select(
      element_at(col("embedding"), 1).cast("double").as("f1"), col("label"))
    val rows = df.collect().map(r => (r.getDouble(0), r.get(1).toString))
    val labels = rows.map(_._2).distinct.sorted
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val values = byV.map(_._1).toArray
    val counts = byV.map { case (_, v) =>
      labels.map(l => v.count(_._2 == l).toLong).toArray }.toArray
    val thr = graft.ml.ChiMergeDiscretizer.threshold(labels.length, 0.05)
    val got = graft.ml.ChiMergeDiscretizer.chiMergeSelect(
      values, counts, labels.length, 0.05)
    val ref = refChiMerge(values, counts, labels.length, thr)
    got shouldBe ref
    // boundaries are strictly increasing and span the value range
    got.toSeq shouldBe got.toSeq.sorted
    got.distinct.length shouldBe got.length
    got.head shouldBe values.head
    got.last shouldBe values.last
    // the merge actually merged (far fewer intervals than values) but a
    // class-structure cut survived somewhere across the four features
    got.length should be < values.length
  }

  test("hand case: clean class separation keeps exactly that cut") {
    // values 1..6, classes A,A,A,B,B,B with strong counts: every
    // within-class adjacent pair has chi2 = 0 and merges; the A|B pair is
    // maximally significant and must survive at alpha = 0.05
    val values = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val counts = Array(Array(10L, 0L), Array(10L, 0L), Array(10L, 0L),
      Array(0L, 10L), Array(0L, 10L), Array(0L, 10L))
    val got = graft.ml.ChiMergeDiscretizer.chiMergeSelect(values, counts, 2, 0.05)
    got shouldBe Array(1.0, 3.5, 6.0)
    // pure noise (identical distributions) merges to ONE interval
    val noise = Array.fill(6)(Array(5L, 5L))
    graft.ml.ChiMergeDiscretizer.chiMergeSelect(values, noise, 2, 0.05) shouldBe
      Array(1.0, 6.0)
  }

  test("significance stop law: every surviving adjacent pair is significant") {
    val df = T.t(spark, sf001, "embeddings").select(
      element_at(col("embedding"), 2).cast("double").as("f2"), col("label"))
    val rows = df.collect().map(r => (r.getDouble(0), r.get(1).toString))
    val labels = rows.map(_._2).distinct.sorted
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val values = byV.map(_._1).toArray
    val counts = byV.map { case (_, v) =>
      labels.map(l => v.count(_._2 == l).toLong).toArray }.toArray
    val thr = graft.ml.ChiMergeDiscretizer.threshold(labels.length, 0.05)
    val bounds = graft.ml.ChiMergeDiscretizer.chiMergeSelect(
      values, counts, labels.length, 0.05)
    if (bounds.length > 2) {
      // rebuild final interval class vectors from the cuts
      val cuts = bounds.slice(1, bounds.length - 1)
      val ivs = collection.mutable.ArrayBuffer
        .fill(cuts.length + 1)(Array.fill(labels.length)(0L))
      values.indices.foreach { i =>
        val bin = cuts.count(_ < values(i))
        labels.indices.foreach(s => ivs(bin)(s) += counts(i)(s))
      }
      def chi(a: Array[Long], b: Array[Long]): Double = {
        val (ra, rb) = (a.sum.toDouble, b.sum.toDouble)
        val n = ra + rb
        labels.indices.map { j =>
          val cs = (a(j) + b(j)).toDouble
          if (cs == 0) 0.0
          else {
            val ea = ra * cs / n; val eb = rb * cs / n
            val da = a(j) - ea; val db = b(j) - eb
            da * da / ea + db * db / eb
          }
        }.sum
      }
      ivs.zip(ivs.tail).foreach { case (a, b) =>
        chi(a, b) should be >= thr
      }
    }
  }

  test("disc_chimerge query emits sane per-feature boundary rows") {
    val out = SparkEntry.queries("disc_chimerge")(spark, sf001).collect()
    out should not be empty
    val byF = out.groupBy(_.getAs[String]("feature"))
    byF.keySet shouldBe Set("f1", "f2", "f3", "f4")
    byF.values.foreach { rows =>
      val bs = rows.sortBy(_.getAs[Long]("bin_idx")).map(_.getAs[Double]("boundary"))
      bs.toSeq shouldBe bs.toSeq.sorted
      bs.length should be >= 2
    }
  }
}
