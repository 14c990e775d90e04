package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Runtime bloom-filter join pruning (SURVEY.md §2.13 capability, round 7):
  * Catalyst's `InjectRuntimeFilter` rule turns a selective dim-side
  * predicate into a bloom filter evaluated on the fact side BEFORE its
  * shuffle — at 100 TB this is the difference between shuffling the whole
  * fact table and shuffling only rows whose key can possibly match. The
  * engine does this for free when the plan is declarative; what this spec
  * pins is that OUR session wiring (extensions, AQE confs) leaves the rule
  * operative, with the thresholds scaled down to toy-SF sizes (defaults:
  * creation side ≤ 10 MB, application-side scan ≥ 10 GB — a 100 TB fact
  * table clears the real default on its own).
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom might_contain on the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // scale the size gates to toy SF: the fact scan is ~100 KB here, not
      // the ≥ 10 GB the production default expects
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // force the join off the broadcast path: runtime bloom filters target
      // shuffle joins (a broadcast join already prunes at the probe)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = T.t(spark, sf001, "lineitem")
      val dim = T.t(spark, sf001, "part").filter(col("p_size") <= 2)
      val j = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum(col("l_quantity")).as("q"))
      val optimized = j.queryExecution.optimizedPlan.toString
      optimized should include("might_contain")
      // and the filter must land on the FACT side scan, keyed on the join key
      optimized should include("l_partkey")
      // result equivalence: the bloom is a pre-filter, never a semantics change
      val expected = withoutBloom {
        fact.join(dim, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand").agg(sum(col("l_quantity")).as("q")).collect().toSet
      }
      j.collect().toSet shouldBe expected
    }
  }

  private def withoutBloom[A](body: => A): A = {
    val k = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val old = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body
    finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("bloom filter stays OFF the plan when the dim side is not selective") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // no dim-side predicate → nothing selective to turn into a bloom;
      // the rule must not tax the fact scan with a useless filter
      val fact = T.t(spark, sf001, "lineitem")
      val dim = T.t(spark, sf001, "part")
      val j = fact.join(dim, col("l_partkey") === col("p_partkey"))
      j.queryExecution.optimizedPlan.toString should not include "might_contain"
    }
  }
}
