package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Cost-based optimizer statistics (round 9 capability): `ANALYZE TABLE`
  * computes table row counts and per-column NDV/min/max into the catalog,
  * and with CBO enabled the optimizer consumes them — row-count
  * estimates flow through the plan and predicate selectivity shrinks
  * them. At 100 TB this is what makes join-order and broadcast decisions
  * data-aware instead of file-size-guessed; the capability here pins that
  * the wiring works end to end on a catalog table.
  */
class CboStatsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("ANALYZE TABLE feeds row counts and column NDV into CBO estimates") {
    val name = "graft_stats_customer"
    T.t(spark, sf001, "customer").write.mode("overwrite").saveAsTable(name)
    try {
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val n = T.t(spark, sf001, "customer").count()

      // table-level: the analyzed row count reaches the optimizer
      val scanStats = spark.table(name).queryExecution.optimizedPlan.stats
      scanStats.rowCount shouldBe defined
      scanStats.rowCount.get.toLong shouldBe n

      // column-level: a unique-key equality predicate estimates ~rowCount/ndv
      // rows — selectivity only CBO column stats can know
      val filtered = spark.table(name).where(col("c_custkey") === 42L)
      val fStats = filtered.queryExecution.optimizedPlan.stats
      fStats.rowCount shouldBe defined
      fStats.rowCount.get.toLong should be < math.max(2L, n / 10)

      // a low-NDV predicate estimates a correspondingly larger slice
      val seg = spark.table(name).where(col("c_mktsegment") === "BUILDING")
      val sStats = seg.queryExecution.optimizedPlan.stats
      sStats.rowCount shouldBe defined
      sStats.rowCount.get.toLong should be > fStats.rowCount.get.toLong
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }
}
