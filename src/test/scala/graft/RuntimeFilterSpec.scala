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

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // the partition-layout sibling of the bloom filter: when the fact table
    // is PARTITIONED on the join key's functional dependency (here:
    // event_type directories), a selective dim-side filter becomes a
    // runtime subquery in the fact scan's PartitionFilters — whole
    // directories are skipped before any file is opened. BucketingSpec pins
    // the STATIC case (literal predicate); this pins the runtime-join case
    // a star-schema query actually presents at 100 TB.
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val base = s"${sys.props("java.io.tmpdir")}/graft_dpp_$tag"
    val dimDir = s"${sys.props("java.io.tmpdir")}/graft_dppdim_$tag"
    T.t(spark, sf001, "events").write.partitionBy("event_type").parquet(base)
    val fact = spark.read.parquet(base)
    import spark.implicits._
    // the dim must be a REAL relation: a local Seq constant-folds to a bare
    // LocalRelation at optimization time, and with the Filter folded away
    // there is no selective predicate left for DPP to hang a subquery on
    Seq(("click", 1), ("view", 2), ("purchase", 3)).toDF("et", "weight")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("weight") === 1)
    withConfs(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // the toy fact side is far under the broadcast threshold either way;
      // DPP applies on the broadcast-join path via reuse of the dim's
      // broadcast as the pruning subquery
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000") {
      val j = fact.join(dim, col("event_type") === col("et"))
        .groupBy("event_type").count()
      val plan = j.queryExecution.executedPlan.toString
      plan should include("dynamicpruning")
      // semantics: identical to the statically-filtered result
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = fact.filter(col("event_type") === "click")
        .groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got shouldBe exp
    }
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
