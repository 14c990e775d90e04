package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** §2.1 capability rows: CSV/JSON sources with explicit vs inferred schema
  * (no CSV/JSON fixture exists in the corpus, so round-trip through temp
  * dirs), and the parquet sink the harness itself exercises.
  */
class SourcesSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/data"

  test("CSV round-trip with explicit schema") {
    val dir = tmp("graft-csv")
    val src = T.t(spark, sf001, "nation")
    src.write.option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    back.schema shouldBe schema
    back.orderBy("n_nationkey").collect() shouldBe src.orderBy("n_nationkey").collect()
  }

  test("JSON round-trip with schema inference") {
    val dir = tmp("graft-json")
    val src = T.t(spark, sf001, "region")
    src.write.json(dir)
    val back = spark.read.json(dir) // inferred: JSON integers widen to LongType
    back.select(col("r_regionkey").cast("int"), col("r_name"))
      .orderBy("r_regionkey").collect() shouldBe
      src.select("r_regionkey", "r_name").orderBy("r_regionkey").collect()
  }

  test("malformed JSON lines are captured per-row, never fatal") {
    // at corpus scale some fraction of source lines is always broken; one
    // bad record must not kill the read. PERMISSIVE mode (the default)
    // parses good rows and lands broken ones in _corrupt_record
    val dir = tmp("graft-badjson")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"r_regionkey": 1, "r_name": "AMERICA"}
        |{"r_regionkey": 2, "r_name": "ASIA"}
        |{"r_regionkey": oops not json
        |""".stripMargin)
    // Spark disallows filtering the internal corrupt column straight off a
    // raw file scan — materialize the parse once (its own documented rule)
    val back = spark.read
      .schema("r_regionkey INT, r_name STRING, _corrupt_record STRING")
      .json(dir).cache()
    back.count() shouldBe 3
    back.filter(col("_corrupt_record").isNotNull).count() shouldBe 1
    back.filter(col("_corrupt_record").isNull)
      .select("r_regionkey", "r_name").orderBy("r_regionkey")
      .collect().map(r => (r.getInt(0), r.getString(1))) shouldBe
      Array((1, "AMERICA"), (2, "ASIA"))
    back.unpersist(blocking = false)
    // DROPMALFORMED: broken rows silently excluded when that's the policy
    spark.read.schema("r_regionkey INT, r_name STRING")
      .option("mode", "DROPMALFORMED").json(dir).count() shouldBe 2
  }

  test("ORC round-trip preserves types exactly") {
    val dir = tmp("graft-orc")
    val src = T.t(spark, sf001, "customer")
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    back.schema shouldBe src.schema
    back.orderBy("c_custkey").collect() shouldBe src.orderBy("c_custkey").collect()
    // predicate pushdown reaches the ORC reader like it does for parquet
    val plan = back.filter(col("c_acctbal") > 0).queryExecution.executedPlan.toString()
    plan should include("PushedFilters")
  }

  test("parquet sink round-trip preserves types exactly") {
    val dir = tmp("graft-parquet")
    val src = T.t(spark, sf001, "customer")
    src.write.parquet(dir)
    val back = spark.read.parquet(dir)
    back.schema shouldBe src.schema
    back.orderBy("c_custkey").collect() shouldBe src.orderBy("c_custkey").collect()
  }

  test("schema evolution: mergeSchema reads a drifted directory, nulls backfilled") {
    // the ingest-directory reality at 100 TB: files written over months
    // drift (a column added); a merged read must surface the union schema
    // with NULL backfill for old files instead of failing or silently
    // dropping the new column (footer-sampled default picks ONE file's
    // schema — nondeterministic on a drifted dir)
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString + "/d"
    val v1 = T.t(spark, sf001, "nation").select("n_nationkey", "n_name")
    val v2 = T.t(spark, sf001, "nation")
      .select(col("n_nationkey") + 1000, col("n_name"), col("n_regionkey"))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    v1.write.parquet(dir)
    v2.write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.columns.toSet shouldBe Set("n_nationkey", "n_name", "n_regionkey")
    merged.count() shouldBe v1.count() + v2.count()
    // old files' rows surface the new column as NULL
    merged.where(col("n_nationkey") < 1000 && col("n_regionkey").isNull)
      .count() shouldBe v1.count()
    merged.where(col("n_nationkey") >= 1000 && col("n_regionkey").isNotNull)
      .count() shouldBe v2.count()
  }

  test("ignoreCorruptFiles skips a truncated parquet part, keeps the rest") {
    // object-store reality: a failed writer leaves a torn file; the batch
    // must degrade to the readable parts under the flag instead of dying
    // (and must FAIL LOUDLY without it — both directions pinned)
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toString + "/d"
    T.t(spark, sf001, "nation").repartition(4).write.parquet(dir)
    val whole = spark.read.parquet(dir).count()
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).minBy(_.getName)
    // truncate to half: valid magic header, torn footer
    val raf = new java.io.RandomAccessFile(part, "rw")
    try raf.setLength(raf.length() / 2) finally raf.close()
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    ex.getMessage.toLowerCase should include regex "corrupt|footer|parquet"
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      // explicit schema: the flag governs SCAN-time corruption, not the
      // footer-sampling schema inference (which would still die on the
      // torn footer) — production readers carry their schema anyway
      val kept = spark.read.schema(T.t(spark, sf001, "nation").schema)
        .parquet(dir).count()
      kept should be < whole
      kept should be > 0L
    } finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
  }

  test("partitioned read prunes non-matching partitions at the listing") {
    // the source_partitioned contract: the event_type predicate must land
    // in PartitionFilters (directory-level pruning, zero bytes read from
    // other types), NOT in PushedFilters (row-group level, after listing)
    val plan = SparkEntry.queries("source_partitioned")(spark, sf001)
      .queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[[^\\]]*event_type"
  }

  test("declared manifest_skipping shape prunes at least 2/3 of the files") {
    import graft.operators.ManifestTable
    import graft.operators.ManifestTable.{ColGe, ColLt}
    // the declared query's exact composition at sf0.001: six 5-day
    // appends with ts stats, a 10-day read window — 4 of the 6 batches'
    // ranges cannot intersect the predicate and must never open
    val dir = java.nio.file.Files
      .createTempDirectory("graft-skipspec").toString + "/t"
    val e = T.t(spark, sf001, "events")
      .withColumn("d", dayofmonth(col("ts")))
    (0 to 5).foreach { w =>
      val lo = w * 5 + 1
      val b = if (w == 5) e.filter(col("d") >= lo)
              else e.filter(col("d") >= lo && col("d") <= lo + 4)
      ManifestTable.commit(spark, dir, b.drop("d"), replace = w == 0,
        statsCols = Seq("ts", "user_id", "value"))
    }
    val preds = Seq(ColGe("ts", "2024-01-11 00:00:00"),
      ColLt("ts", "2024-01-21 00:00:00"))
    val (kept, total) = ManifestTable.pruneFiles(spark, dir, preds)
    assert(kept.size * 3 <= total,
      s"expected >= 2/3 of files pruned, kept ${kept.size} of $total")
    // and the pruned read is value-identical to the unpruned filtered read
    val full = ManifestTable.read(spark, dir)
      .where(col("ts") >= "2024-01-11 00:00:00" &&
        col("ts") < "2024-01-21 00:00:00").count()
    ManifestTable.readPruned(spark, dir, preds).count() shouldBe full
  }

  test("T.t restores the caller's NTZ-inference conf and still reads timestamps") {
    // round-11 advice: the loader must not mutate shared session state at
    // a distance. Simulate a stray session that deliberately enabled NTZ
    // inference: T.t must (a) leave the caller's conf exactly as it found
    // it, and (b) still deliver TimestampType with correct values — the
    // schema is bound at read.parquet (footer inference under the
    // temporarily-set conf), and execution honours the relation's schema,
    // not the session conf at action time.
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true") // the stray-session posture
    try {
      val ev = T.t(spark, sf001, "events")
      ev.schema("ts").dataType shouldBe TimestampType
      spark.conf.get(key) shouldBe "true" // restored, not clobbered
      // execution under the caller's conf=true still yields the contract
      // values (UTC session tz): min ts collects as a real Timestamp
      val mn = ev.agg(min(unix_micros(col("ts")))).head().getLong(0)
      mn should be > 0L
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
