package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Layout

/** Z-order layout: correctness of the Morton bit-interleave and the actual
  * file-skipping payoff — per-file min/max boxes from a z-clustered write
  * must let a 2-D box predicate prune more files than a linear sort does.
  */
class LayoutSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def tmp(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_layout_${java.util.UUID.randomUUID().toString.take(8)}_$tag"

  test("zColumn interleaves bits correctly on known values") {
    import spark.implicits._
    // 2 dims, 2 bits, bounds [0,3]: quantized value == input value.
    // z(x, y) interleaves x at even positions, y at odd:
    // (0,0)->0 (1,0)->1 (0,1)->2 (1,1)->3 (2,0)->4 (3,3)->15
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3), (2, 3))
      .toDF("x", "y")
    val z = df.select(col("x"), col("y"),
      Layout.zColumn(Seq(col("x"), col("y")), Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    z((0, 0)) shouldBe 0L
    z((1, 0)) shouldBe 1L
    z((0, 1)) shouldBe 2L
    z((1, 1)) shouldBe 3L
    z((2, 0)) shouldBe 4L
    z((3, 3)) shouldBe 15L
    z((2, 3)) shouldBe 14L
  }

  test("zColumn: nulls quantize to the low corner, not a null z") {
    import spark.implicits._
    val df = Seq((Some(2), Some(2)), (None, Some(3)), (Some(3), None)).toDF("x", "y")
    val zs = df.select(Layout.zColumn(Seq(col("x"), col("y")),
      Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z")).collect().map(_.getLong(0))
    zs.foreach(_ should be >= 0L)
    // null x with y=3 → x-bits 0, y-bits full: z = 0b1010 = 10
    zs should contain(10L)
  }

  test("z-clustered files prune a 2-D box scan better than a linear sort") {
    val rows = T.t(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val linDir = tmp("linear"); val zDir = tmp("zorder")
    // linear layout: the classic single-key sort. 256 files ≈ a 16×16 cell
    // grid for the z layout — at 64 files the 8×8 cells are so coarse that
    // a 10% box cannot show the margin (measured 8 vs 5)
    rows.repartitionByRange(256, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey").write.parquet(linDir)
    Layout.zOrdered(rows, Seq("l_orderkey", "l_partkey"), nFiles = 256).write.parquet(zDir)

    // per-file min/max boxes straight from what was written (the same
    // stats the parquet reader prunes with), via input_file_name
    def boxes(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_orderkey").as("xlo"), max("l_orderkey").as("xhi"),
          min("l_partkey").as("ylo"), max("l_partkey").as("yhi"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // the 2-D box: middle ~10% of each dimension
    val (xq, yq) = {
      val r = rows.agg(
        expr("approx_percentile(l_orderkey, array(0.45, 0.55))"),
        expr("approx_percentile(l_partkey, array(0.45, 0.55))")).head()
      (r.getSeq[Long](0), r.getSeq[Long](1))
    }
    def overlapping(bs: Array[(Long, Long, Long, Long)]): Int =
      bs.count { case (xlo, xhi, ylo, yhi) =>
        xhi >= xq.head && xlo <= xq.last && yhi >= yq.head && ylo <= yq.last }

    val lin = overlapping(boxes(linDir))
    val zo = overlapping(boxes(zDir))
    withClue(s"linear=$lin zorder=$zo of 256 files: ") {
      // linear: every orderkey-matching file spans all partkeys → all its
      // ~10% of files overlap. zorder: only files whose 2-D cell meets the
      // box. The margin is the whole point of the layout.
      zo should be < lin
      zo should be <= lin / 2
    }
    // layout must not change the row set
    spark.read.parquet(zDir).exceptAll(rows).count() shouldBe 0L
    rows.exceptAll(spark.read.parquet(zDir)).count() shouldBe 0L
  }
}
