package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Storage-layer co-location (SURVEY.md §4, PLANS.md): pre-bucketing both
  * sides of a repeated join key eliminates the join shuffle entirely — at
  * 100 TB this is the difference between a map-side merge and re-shuffling
  * the fact table on every query. Demonstrated end-to-end: write bucketed
  * tables, join, assert the plan has no Exchange and results are identical
  * to the plain join.
  */
class BucketingSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "v", "name").orderBy("k", "v")
    val plain = fact.join(dim, "k").select("k", "v", "name").orderBy("k", "v")
    salted.collect() shouldBe plain.collect()
  }

  test("two-phase hot-key salted join equals plain join and salts only hot keys") {
    import spark.implicits._
    // 90% of fact rows on key 0 — the skew shape hotSaltedJoin targets
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "v", "name").orderBy("k", "v").collect()
    // sampleFraction = 1 makes the detect exact for the value assertion:
    // key 0 (1800 rows) clears minHotRows = 1000, keys 1..6 (~29 each) do
    // not — the small side must replicate ONLY the hot key
    val hot = graft.operators.Skew.hotSaltedJoin(fact, dim, "k", salts = 8,
      minHotRows = 1000L, sampleFraction = 1.0)
    hot.select("k", "v", "name").orderBy("k", "v").collect() shouldBe plain
    // cold-path degradation: with a threshold no key reaches, the result
    // is still the plain join (sampling only ever moves cost, not values)
    graft.operators.Skew.hotSaltedJoin(fact, dim, "k", salts = 8,
        minHotRows = 100000L, sampleFraction = 0.05)
      .select("k", "v", "name").orderBy("k", "v").collect() shouldBe plain
  }

  test("AQE splits a skewed join partition at runtime (the native salting)") {
    import spark.implicits._
    // the engine-side complement of Skew.saltedJoin: AQE detects an
    // oversized post-shuffle partition and splits it into parallel reads of
    // the same map outputs — no manual salt column, same effect. Thresholds
    // are scaled down to make the toy hot key qualify (at 100 TB the
    // production defaults of 256MB/factor-5 do this for real skew).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carries ~100k rows with an incompressible payload that
      // must FLOW THROUGH the join (an aggregate consumes it after the
      // join, or column pruning drops it before the shuffle and the hot
      // partition compresses under every threshold — measured: 100k bare
      // longs coalesce instead of splitting)
      val fact = spark.range(110000)
        .select(when(col("id") < 100000, 0L).otherwise(col("id") % 7).as("k"),
          md5(concat(lit("x"), col("id").cast("string"))).as("payload"))
      val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
      val j = fact.join(dim, "k")
        .groupBy("name").agg(count(lit(1)).as("cnt"), max(col("payload")).as("mp"))
      val rows = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows("dim0") shouldBe 100000L + 1429L // hot key + id%7==0 tail ids
      // the FINAL adaptive plan marks the split join legs with skew=true
      j.queryExecution.executedPlan.toString should include("skew=true")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("partitioned writes prune partitions at the scan") {
    // the corpus ships unpartitioned (SURVEY §4: DPP inert) — demonstrate
    // the partition-pruning path by re-laying events out by event_type
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    T.t(spark, sf001, "events").write.partitionBy("event_type").parquet(base)
    val q = spark.read.parquet(base).filter(col("event_type") === "purchase")
    val scan = q.queryExecution.executedPlan.toString()
    scan should include("PartitionFilters")
    scan should include("event_type")
    // pruned read returns exactly the purchase rows
    q.count() shouldBe T.t(spark, sf001, "events")
      .filter(col("event_type") === "purchase").count()
    // and reads only 1 of the 5 partition directories
    val parts = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    all(parts) should include("event_type=purchase")
  }

  test("date-partitioned writes prune to the queried day range") {
    // the canonical production layout: facts partitioned by ingestion day,
    // queries over a date window read only the matching directories
    val base = java.nio.file.Files.createTempDirectory("graft-bydate").toString + "/events"
    val events = T.t(spark, sf001, "events").withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").parquet(base)
    val days = events.select("day").distinct().orderBy("day")
      .collect().map(_.getDate(0))
    days.length should be > 2
    val cut = days(days.length / 2)
    val q = spark.read.parquet(base).filter(col("day") >= cut)
    // the range predicate must reach the scan as a PARTITION filter
    val scan = q.queryExecution.executedPlan.toString()
    scan should include("PartitionFilters")
    scan should include("day")
    q.count() shouldBe events.filter(col("day") >= cut).count()
    // and only the matching day directories are read
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    val readDays = files.map(f => f.split("day=")(1).split("/")(0)).distinct.sorted
    readDays shouldBe days.filter(_.compareTo(cut) >= 0).map(_.toString).sorted
  }

  test("bucketed tables join with zero shuffles") {
    val base = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      T.t(spark, sf001, "orders").write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders_b").saveAsTable("orders_b")
      T.t(spark, sf001, "customer").write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer_b").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val plan = joined.queryExecution.executedPlan.toString()
      plan should not include "Exchange"

      val plain = T.t(spark, sf001, "orders")
        .join(T.t(spark, sf001, "customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      joined.orderBy("o_orderkey").collect() shouldBe plain.orderBy("o_orderkey").collect()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
