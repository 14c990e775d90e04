package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Laws of the native quantizer kernels (round 11 — graft_nearest_cells,
  * graft_pq_encode, graft_adc_table), checked through the registered SQL
  * surface against driver-side brute force on small literal frames.
  */
class PqKernelsSpec extends AnyFunSuite with SparkFixture with Matchers {

  import org.apache.spark.sql.Column

  private val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(5.0, 5.0))
  private def centsLit = typedLit(cents)
  // 2 subspaces × 2 codes × 1 dim each
  private val books = Seq(Seq(Seq(0.0), Seq(1.0)), Seq(Seq(0.0), Seq(2.0)))
  private def cbLit = typedLit(books)

  private def onVec(v: Seq[Double], c: Column): Any = {
    import spark.implicits._
    Seq(v).toDF("e").select(c.as("out")).head().get(0)
  }

  test("nearest cells: ascending by distance, ties to the lower index") {
    val out = onVec(Seq(0.9, 0.1),
      call_function("graft_nearest_cells", col("e"), centsLit, lit(4)))
      .asInstanceOf[scala.collection.Seq[Int]].toList
    // exact distances: c1 (1,0) closest, then c0 (0,0) [0.82] vs c2 (0,1)
    // [1.62], then c2, then c3
    out shouldBe List(1, 0, 2, 3)
    // nprobe=1 is the head of the same ranking
    onVec(Seq(0.9, 0.1),
      call_function("graft_nearest_cells", col("e"), centsLit, lit(1)))
      .asInstanceOf[scala.collection.Seq[Int]].toList shouldBe List(1)
    // (0.5, 0.5) is equidistant (d²=0.5) from c0, c1, AND c2 → the
    // three-way tie resolves to ascending index order
    onVec(Seq(0.5, 0.5),
      call_function("graft_nearest_cells", col("e"), centsLit, lit(3)))
      .asInstanceOf[scala.collection.Seq[Int]].toList shouldBe List(0, 1, 2)
  }

  test("nearest cells: a short vector scores as zero-padded") {
    // vec (3.0) against 2-dim centroids: d2 to c3 = (3-5)² + 5² = 29,
    // to c1 = 4 + 0 = 4, to c0 = 9, to c2 = 9 + 1 = 10 → 1,0,2,3
    onVec(Seq(3.0),
      call_function("graft_nearest_cells", col("e"), centsLit, lit(4)))
      .asInstanceOf[scala.collection.Seq[Int]].toList shouldBe List(1, 0, 2, 3)
  }

  test("pq codes are the argmin of the adc table rows") {
    val r = Seq(0.8, 0.7)
    val codes = onVec(r, call_function("graft_pq_encode", col("e"), cbLit))
      .asInstanceOf[scala.collection.Seq[Int]].toList
    val dtab = onVec(r, call_function("graft_adc_table", col("e"), cbLit))
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Double]]].map(_.toList).toList
    // subspace 0: |0.8-0|²=0.64 vs |0.8-1|²=0.04 → code 1
    // subspace 1: |0.7-0|²=0.49 vs |0.7-2|²=1.69 → code 0
    codes shouldBe List(1, 0)
    dtab shouldBe List(List(0.6400000000000001, 0.03999999999999998),
      List(0.48999999999999994, 1.6900000000000002))
    codes.zipWithIndex.foreach { case (code, s) =>
      dtab(s)(code) shouldBe dtab(s).min
    }
  }

  test("null input yields null, not a crash") {
    import spark.implicits._
    val out = Seq(Option.empty[Seq[Double]]).toDF("e")
      .select(call_function("graft_nearest_cells",
        col("e").cast("array<double>"), centsLit, lit(2)).as("o"))
      .head()
    out.isNullAt(0) shouldBe true
  }
}
