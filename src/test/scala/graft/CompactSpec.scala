package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Compact

/** Small-file compaction: byte-driven sizing, row-set preservation, and the
  * narrow-vs-shuffle plan contract. */
class CompactSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def tmp(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_compact_${java.util.UUID.randomUUID().toString.take(8)}_$tag"

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compaction collapses a many-small-file dir to the byte-sized count") {
    val in = tmp("in"); val out = tmp("out")
    val df = T.t(spark, sf001, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    df.repartition(64).write.parquet(in)
    parquetFiles(in).length shouldBe 64
    val total = Compact.dataBytes(spark, in)
    total should be > 0L
    // target a quarter of the input: expect ceil(total / (total/4)) = 4-ish
    val n = Compact.rewriteParquet(spark, in, out, targetBytes = total / 4)
    n shouldBe Compact.targetFileCount(total, total / 4)
    parquetFiles(out).length shouldBe n
    n should be < 10
    // the row SET is untouched (order is not part of the contract)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    b.count() shouldBe a.count()
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }

  test("sizing math: ceil with floor 1") {
    Compact.targetFileCount(0L, 100L) shouldBe 1
    Compact.targetFileCount(1L, 100L) shouldBe 1
    Compact.targetFileCount(100L, 100L) shouldBe 1
    Compact.targetFileCount(101L, 100L) shouldBe 2
    Compact.targetFileCount(1000L, 100L) shouldBe 10
  }

  test("default compaction is narrow (no exchange); shuffle=true exchanges once") {
    // the input must not carry its own exchange, or the narrow assertion
    // tests the fixture instead of the operator
    val df = T.t(spark, sf001, "orders").filter(col("o_orderkey") > 0)
    val narrow = Compact.sized(df, 2)
    narrow.queryExecution.executedPlan.toString should not include "Exchange"
    val balanced = Compact.sized(df, 2, shuffle = true)
    balanced.queryExecution.executedPlan.toString should include("Exchange")
  }

  test("partitioned layouts compact recursively, partition values preserved") {
    val in = tmp("part_in"); val out = tmp("part_out")
    // a partitioned write leaves leaf files under event_type=... dirs; the
    // byte listing must find them recursively, and the rewrite must keep
    // the partition column's VALUES (as a data column — compaction is a
    // physical-layout operator, the partitioning scheme itself is the
    // caller's choice on the next write)
    T.t(spark, sf001, "events").select("event_id", "user_id", "event_type")
      .repartition(8).write.partitionBy("event_type").parquet(in)
    val total = Compact.dataBytes(spark, in)
    total should be > 0L
    Compact.rewriteParquet(spark, in, out, targetBytes = total)
    val a = spark.read.parquet(in).select("event_id", "user_id", "event_type")
    val b = spark.read.parquet(out).select("event_id", "user_id", "event_type")
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }

  test("compact-in-place is refused") {
    val in = tmp("same")
    an[IllegalArgumentException] should be thrownBy
      Compact.rewriteParquet(spark, in, in, 1024L)
  }

  test("in-place via a different spelling of the same dir is refused") {
    // the guard must compare FS-qualified paths: file:/x vs /x (and
    // trailing-slash variants) are the same directory — an unqualified
    // Path compare would let the overwrite truncate the dir being read
    val in = tmp("spelled")
    an[IllegalArgumentException] should be thrownBy
      Compact.rewriteParquet(spark, in, s"file:$in", 1024L)
    an[IllegalArgumentException] should be thrownBy
      Compact.rewriteParquet(spark, s"file:$in", in, 1024L)
  }

  test("nested in/out dirs are refused in both directions") {
    val in = tmp("nested")
    an[IllegalArgumentException] should be thrownBy
      Compact.rewriteParquet(spark, in, s"$in/compacted", 1024L)
    an[IllegalArgumentException] should be thrownBy
      Compact.rewriteParquet(spark, s"$in/part", in, 1024L)
  }
}
