package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Mview

/** [[graft.operators.Mview]] — incremental aggregate maintenance. The
  * refresh contract is algebraic: state ∪ agg(delta) re-aggregated ≡
  * agg(base ∪ delta), for re-mergeable measures. The declared query
  * `agg_incremental` hash-pins one instance against the DuckDB full
  * recompute; this spec pins the operator's algebra directly — chained
  * refreshes, retractions, new-key appearance, and the error contract.
  */
class MviewSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def partial(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).as("sv"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))

  private val merge = Map("n" -> "sum", "sv" -> "sum",
    "mn" -> "min", "mx" -> "max")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n", "sv", "mn", "mx").orderBy("k").collect().toSeq

  test("one refresh reconstructs the full aggregate exactly") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val delta = Seq((1L, 30.0), (3L, 7.0)).toDF("k", "v") // new key 3 appears
    val got = Mview.combine(partial(base), partial(delta), Seq("k"), merge)
    sortedRows(got) shouldBe sortedRows(partial(base.unionByName(delta)))
  }

  test("chained refreshes fold any batch split to the same state") {
    import spark.implicits._
    val rows = (1 to 40).map(i => ((i % 5).toLong, i * 1.5))
    val full = partial(rows.toDF("k", "v"))
    // three different split points, two chained refreshes each
    for (cut1 <- Seq(10, 20); cut2 <- Seq(30)) {
      val s0 = partial(rows.take(cut1).toDF("k", "v"))
      val s1 = Mview.combine(s0,
        partial(rows.slice(cut1, cut2).toDF("k", "v")), Seq("k"), merge)
      val s2 = Mview.combine(s1,
        partial(rows.drop(cut2).toDF("k", "v")), Seq("k"), merge)
      sortedRows(s2) shouldBe sortedRows(full)
    }
  }

  test("retractions ride in as negative sum deltas") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (1L, 20.0)).toDF("k", "v")
    val state = base.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).as("sv"))
    // retract the 20.0 row: n -= 1, sv -= 20 (sum-only state — min/max
    // are insert-only monotone by the documented contract)
    val retract = Seq((1L, -1L, java.math.BigDecimal.valueOf(-20.0)))
      .toDF("k", "n", "sv")
      .select(col("k"), col("n"), col("sv").cast("decimal(28,2)"))
    val got = Mview.combine(state, retract, Seq("k"),
      Map("n" -> "sum", "sv" -> "sum")).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("n") shouldBe 1L
    got.head.getAs[java.math.BigDecimal]("sv").doubleValue() shouldBe 10.0
  }

  test("unsupported merge function is rejected, not silently wrong") {
    import spark.implicits._
    val s = Seq((1L, 1L)).toDF("k", "n")
    an[IllegalArgumentException] should be thrownBy
      Mview.combine(s, s, Seq("k"), Map("n" -> "avg"))
    an[IllegalArgumentException] should be thrownBy
      Mview.combine(s, s, Seq.empty, Map("n" -> "sum"))
  }

  test("refresh plan reads state and delta only — never the base table") {
    import spark.implicits._
    // state persisted to parquet (the materialized view), delta tiny:
    // the refresh plan's scans must be exactly those two inputs
    val dir = java.nio.file.Files.createTempDirectory("graft-mview").toString
    partial(Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v"))
      .write.parquet(s"$dir/state")
    val state = spark.read.parquet(s"$dir/state")
    val delta = partial(Seq((2L, 9.0)).toDF("k", "v"))
    val refreshed = Mview.combine(state, delta, Seq("k"), merge)
    val scans = refreshed.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).toSeq
    scans.size shouldBe 1 // the state parquet; the delta is in-memory here
    scans.head should include("/state")
    // and the refreshed state round-trips as next round's input
    refreshed.write.parquet(s"$dir/state2")
    sortedRows(spark.read.parquet(s"$dir/state2")) shouldBe
      sortedRows(partial(Seq((1L, 10.0), (2L, 5.0), (2L, 9.0)).toDF("k", "v")))
  }
}
