package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.GlobalRank

/** The two-pass distributed prefix-sum kernel must be VALUE-IDENTICAL to
  * the single-partition global window it replaces (round-14 verdict item
  * 1) — the four rewired queries keep their oracle hashes only if this
  * equivalence is exact, so it is pinned directly against
  * `Window.orderBy` on frames deliberately larger than the partition
  * count, with exclusive/inclusive frames, groups, and decimal sums.
  */
class GlobalRankSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def frame(n: Int) = {
    import spark.implicits._
    // deterministic pseudo-random values; v is UNIQUE (the kernel's
    // tie-free order contract), c/g derived
    (1 to n).map { i =>
      val v = (i * 2654435761L) % 100000
      (v, (v % 7) + 1, s"g${v % 3}")
    }.toDF("v", "c", "g").repartition(8)
  }

  test("global inclusive running sum matches the single-partition window") {
    val df = frame(5000)
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("c")).over(w))
      .select("v", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GlobalRank.prefix(df, Nil, Seq("v"), Seq("c" -> "cum"),
        inclusive = true, numParts = 7)
      .select("v", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expect
  }

  test("global exclusive running sum matches, first row is exact zero") {
    val df = frame(3000)
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val expect = df
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .select("v", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GlobalRank.prefix(df, Nil, Seq("v"), Seq("c" -> "cum"),
        inclusive = false, numParts = 5)
      .select("v", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expect
    got(expect.keys.min) shouldBe 0L
  }

  test("grouped row_number matches window row_number over every group") {
    val df = frame(4000)
    val w = Window.partitionBy("g").orderBy("v")
    val expect = df.withColumn("rn", row_number().over(w).cast("long"))
      .select("g", "v", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = GlobalRank.prefix(df, Seq("g"), Seq("v"), Nil,
        inclusive = false, rnCol = Some("rn"), numParts = 6)
      .select("g", "v", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe expect
  }

  test("grouped running sum + row number in one pass match the windows") {
    val df = frame(3000)
    val w = Window.partitionBy("g").orderBy("v")
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df
      .withColumn("cum", sum(col("c")).over(wr))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("g", "v", "cum", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = GlobalRank.prefix(df, Seq("g"), Seq("v"), Seq("c" -> "cum"),
        inclusive = true, rnCol = Some("rn"), numParts = 5)
      .select("g", "v", "cum", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    got shouldBe expect
  }

  test("decimal running sums stay exact (values, not float-near)") {
    import spark.implicits._
    val df = (1 to 2000).map { i =>
      val v = (i * 48271L) % 65536
      (v, BigDecimal(v % 97) / 100)
    }.toDF("v", "x").select(col("v"), col("x").cast("decimal(18,4)").as("x"))
      .repartition(8)
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("x")).over(w))
      .select(col("v"), col("cum").cast("decimal(38,4)"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val got = GlobalRank.prefix(df, Nil, Seq("v"), Seq("x" -> "cum"),
        inclusive = true, numParts = 9)
      .select(col("v"), col("cum").cast("decimal(38,4)"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    got shouldBe expect
  }

  test("the kernel plans no partition-less window and reuses the range exchange") {
    val df = frame(2000)
    val out = GlobalRank.prefix(df, Nil, Seq("v"), Seq("c" -> "cum"),
      inclusive = true, numParts = 7)
    val lw = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    lw shouldBe empty
    // both branches (offsets + local window) read the SAME pinned range
    // shuffle — the partition ids they join on come from one
    // materialization, never two independently-sampled exchanges
    out.collect()
    val exec = out.queryExecution.executedPlan.toString
    (exec.split("Scan ExistingRDD").length - 1) should be >= 2
    exec should not include "Exchange rangepartitioning"
  }

  test("a rewired corpus query scans the corpus inside the pinned shuffle only") {
    // agg_auc's distinct-value frame is materialized once as the pinned
    // range shuffle; the consuming plan must hold NO second corpus scan
    val df = SparkEntry.queries("agg_auc")(spark, sf001)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    (fin.split("Scan ExistingRDD").length - 1) should be >= 2
    (fin.split("FileScan parquet").length - 1) shouldBe 0
  }

  test("the kernel-riding queries plan no partition-less window") {
    for (q <- Seq("agg_ks_test", "agg_kruskal", "agg_auc", "agg_gini",
        "agg_cdf", "events_lorenz", "agg_mwu")) {
      val lw = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
      withClue(s"$q: ") { lw shouldBe empty }
    }
  }

  test("prefix fails loudly on internal/output name collisions instead of " +
      "silently corrupting") {
    import spark.implicits._
    val d = Seq((1L, 2L)).toDF("v", "c")
    // input already carries a kernel-internal name
    val exPid = intercept[IllegalArgumentException] {
      GlobalRank.prefix(d.withColumnRenamed("c", "__pid"), Nil, Seq("v"),
        Seq("v" -> "cum"), inclusive = true)
    }
    exPid.getMessage should include("__pid")
    intercept[IllegalArgumentException] {
      GlobalRank.prefix(d.withColumnRenamed("v", "__o_c"), Nil, Seq("c"),
        Seq("c" -> "cum"), inclusive = true)
    }
    // output name shadowing an input column
    val exOut = intercept[IllegalArgumentException] {
      GlobalRank.prefix(d, Nil, Seq("v"), Seq("c" -> "v"), inclusive = true)
    }
    exOut.getMessage should include("shadow")
    // rnCol shadowing an input column
    intercept[IllegalArgumentException] {
      GlobalRank.prefix(d, Nil, Seq("v"), Seq("c" -> "cum"),
        inclusive = true, rnCol = Some("c"))
    }
    // clean names still work
    GlobalRank.prefix(d, Nil, Seq("v"), Seq("c" -> "cum"), inclusive = true)
      .select("cum").as[Long].collect() shouldBe Array(2L)
  }
}
