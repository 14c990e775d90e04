package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Dynamic partition overwrite (SURVEY.md §2.13, round 8) — the
  * incremental-update shape for a partitioned 100 TB corpus: a daily
  * delta replaces ONLY the partitions it touches, while every other
  * partition's files stay byte-identical on disk (no table format
  * needed — this is core Spark's partitionOverwriteMode=dynamic). The
  * alternative static overwrite truncates the whole root: the difference
  * between rewriting a day and rewriting the world.
  */
class PartitionOverwriteSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def listFiles(dir: String): Map[String, Set[(String, Long)]] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map { p =>
        p.getName -> p.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).map(f => (f.getName, f.length())).toSet
      }.toMap
  }

  test("a delta rewrites only the partitions it touches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dynpart").toString + "/t"
    val events = T.t(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    events.write.partitionBy("event_type").parquet(dir)
    val before = listFiles(dir)
    before.size should be > 1
    // the day's delta: replacement rows for ONE event_type
    val touched = events.select("event_type").head().getString(0)
    val delta = events.where(col("event_type") === touched)
      .withColumn("user_id", col("user_id") + 1000000L)
      .limit(100)
    val expectedOther = events.where(col("event_type") =!= touched).count()
    val deltaRows = delta.count()
    delta.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(dir)
    val after = listFiles(dir)
    // untouched partitions: identical file names AND sizes on disk
    before.keys.filterNot(_ == s"event_type=$touched").foreach { p =>
      after(p) shouldBe before(p)
    }
    // touched partition: fully replaced by the delta
    val back = spark.read.parquet(dir)
    back.where(col("event_type") === touched).count() shouldBe deltaRows
    back.where(col("event_type") === touched)
      .where(col("user_id") < 1000000L).count() shouldBe 0L
    back.where(col("event_type") =!= touched).count() shouldBe expectedOther
  }

  test("static overwrite (the default) truncates the whole root — the hazard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-statpart").toString + "/t"
    val events = T.t(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    events.write.partitionBy("event_type").parquet(dir)
    val touched = events.select("event_type").head().getString(0)
    events.where(col("event_type") === touched).limit(10)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // every other partition is GONE: this is why the dynamic mode exists
    spark.read.parquet(dir).select("event_type").distinct().count() shouldBe 1L
  }
}
