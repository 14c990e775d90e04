package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pipeline observability capability (SURVEY.md §2.13, round 8): QC
  * counters collected WITH the job via `Dataset.observe` — at 100 TB the
  * alternative is a second full scan per metric, which is exactly the
  * pattern the engine exists to avoid. `observe` attaches an aggregate to
  * a point IN the plan (here: between ingest and the quality filter), so
  * input counts, drop counts, and data-quality sums ride the same task
  * pass that produces the output.
  */
class ObserveSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("QC metrics ride the producing job and match a recomputation") {
    val docs = T.t(spark, sf001, "documents")
    val obs = Observation("qc")
    // the observation point sees PRE-filter rows; the action downstream
    // consumes only the filtered output — one job, both numbers
    val kept = docs
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(when(col("n_chars") >= 40, 1L).otherwise(0L)).as("n_pass"),
        sum(col("n_chars")).as("chars_in"),
        max(col("n_chars")).as("max_chars"))
      .where(col("n_chars") >= 40)
    val nKept = kept.count()
    val m = obs.get
    m("n_in") shouldBe docs.count()
    m("n_pass") shouldBe nKept
    m("chars_in") shouldBe docs.agg(sum("n_chars")).head().getLong(0)
    m("max_chars") shouldBe docs.agg(max("n_chars")).head().getLong(0)
  }

  test("observation metrics survive into a write job (the sink-side shape)") {
    val docs = T.t(spark, sf001, "documents")
    val obs = Observation("sink_qc")
    val dir = java.nio.file.Files.createTempDirectory("graft-observe").toString + "/out"
    // DISTINCT aggregates are rejected in observed metrics (analysis
    // error) — scalar aggregates only
    docs.observe(obs, count(lit(1)).as("rows_written"),
        sum(col("n_chars")).as("chars_written"))
      .write.mode("overwrite").parquet(dir)
    val m = obs.get
    m("rows_written") shouldBe docs.count()
    m("chars_written") shouldBe docs.agg(sum("n_chars")).head().getLong(0)
    spark.read.parquet(dir).count() shouldBe m("rows_written")
  }
}
