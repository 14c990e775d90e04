package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{ManifestTable, Upsert}

/** Manifest-swap commit protocol (round 11, verdict item 7): readers only
  * ever see fully-committed snapshots; uncommitted data batches are
  * invisible; version slots are a rename-CAS; time travel reads any
  * retained snapshot; expire removes unreferenced batches and nothing
  * else; Upsert.merge composed through commit() publishes atomically.
  */
class ManifestTableSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-manifest").toString + "/t"

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def asSet(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("append commits accumulate; replace commits swap the whole snapshot") {
    val dir = tmpDir()
    ManifestTable.commit(spark, dir, df(1L -> "a", 2L -> "b")) shouldBe 1L
    asSet(ManifestTable.read(spark, dir)) shouldBe Set(1L -> "a", 2L -> "b")
    ManifestTable.commit(spark, dir, df(3L -> "c")) shouldBe 2L
    asSet(ManifestTable.read(spark, dir)) shouldBe
      Set(1L -> "a", 2L -> "b", 3L -> "c")
    ManifestTable.commit(spark, dir, df(9L -> "z"), replace = true) shouldBe 3L
    asSet(ManifestTable.read(spark, dir)) shouldBe Set(9L -> "z")
    // time travel: every retained snapshot stays readable as-committed
    asSet(ManifestTable.read(spark, dir, version = 1L)) shouldBe
      Set(1L -> "a", 2L -> "b")
    asSet(ManifestTable.read(spark, dir, version = 2L)) shouldBe
      Set(1L -> "a", 2L -> "b", 3L -> "c")
  }

  test("a crashed writer's data batch is invisible to readers") {
    val dir = tmpDir()
    ManifestTable.commit(spark, dir, df(1L -> "a"))
    // simulate a writer that died after its data write, before its
    // manifest rename: bytes on disk under data/, no manifest entry
    df(666L -> "torn").write.parquet(s"$dir/data/crashed-batch")
    asSet(ManifestTable.read(spark, dir)) shouldBe Set(1L -> "a")
    // the next real commit still lands at the next version and still
    // excludes the orphan
    ManifestTable.commit(spark, dir, df(2L -> "b")) shouldBe 2L
    asSet(ManifestTable.read(spark, dir)) shouldBe Set(1L -> "a", 2L -> "b")
  }

  test("version-slot CAS: an occupied slot forces the committer onto the next") {
    val dir = tmpDir()
    ManifestTable.commit(spark, dir, df(1L -> "a"))
    // simulate a concurrent winner of v2: its manifest appears between
    // this committer's version resolution and its rename
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val v2 = new org.apache.hadoop.fs.Path(s"$dir/_manifests/v2.manifest")
    val out = fs.create(v2, false)
    try out.write("".getBytes("UTF-8")) finally out.close()
    // this commit must observe v2 as head and land at v3 (appending to
    // v2's — empty — file list, the post-race head)
    ManifestTable.commit(spark, dir, df(3L -> "c")) shouldBe 3L
    asSet(ManifestTable.read(spark, dir)) shouldBe Set(3L -> "c")
    asSet(ManifestTable.read(spark, dir, version = 1L)) shouldBe Set(1L -> "a")
  }

  test("expire keeps the last snapshots and vacuums unreferenced batches") {
    val dir = tmpDir()
    ManifestTable.commit(spark, dir, df(1L -> "a"))
    ManifestTable.commit(spark, dir, df(2L -> "b"), replace = true)
    ManifestTable.commit(spark, dir, df(3L -> "c"))
    ManifestTable.expire(spark, dir, keepLast = 2)
    ManifestTable.versions(spark, dir) shouldBe Seq(2L, 3L)
    // v1's batch is gone from disk, the retained snapshots read intact
    asSet(ManifestTable.read(spark, dir, version = 2L)) shouldBe Set(2L -> "b")
    asSet(ManifestTable.read(spark, dir)) shouldBe Set(2L -> "b", 3L -> "c")
    intercept[IllegalArgumentException] {
      ManifestTable.read(spark, dir, version = 1L)
    }
  }

  test("Upsert.merge publishes atomically through commit(replace)") {
    val dir = tmpDir()
    ManifestTable.commit(spark, dir,
      df(1L -> "a", 2L -> "b"), replace = true)
    val target = ManifestTable.read(spark, dir)
    val merged = Upsert.merge(target, df(2L -> "b2", 3L -> "c"), Seq("k"))
    // NOTE the read-before-write: the merge reads snapshot v1 and commits
    // v2 — readers see v1 until the rename, then v2, never the in-between
    ManifestTable.commit(spark, dir, merged, replace = true) shouldBe 2L
    asSet(ManifestTable.read(spark, dir)) shouldBe
      Set(1L -> "a", 2L -> "b2", 3L -> "c")
    asSet(ManifestTable.read(spark, dir, version = 1L)) shouldBe
      Set(1L -> "a", 2L -> "b")
  }

  test("streaming foreachBatch sink commits one atomic snapshot per micro-batch") {
    // the real CDC-sink shape: a stream lands in the manifest table via
    // foreachBatch + commit(append) — every micro-batch becomes one
    // atomic snapshot, the latest read sees exactly the union, and every
    // intermediate snapshot stays time-travelable
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir()
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) { ManifestTable.commit(spark, dir, batch); () }
      }
      .outputMode("append").start()
    try {
      ms.addData(1L -> "a"); q.processAllAvailable()
      ms.addData(2L -> "b", 3L -> "c"); q.processAllAvailable()
      ms.addData(4L -> "d"); q.processAllAvailable()
    } finally q.stop()
    ManifestTable.versions(spark, dir) shouldBe Seq(1L, 2L, 3L)
    asSet(ManifestTable.read(spark, dir)) shouldBe
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    // time travel: snapshot 2 = first two batches only
    asSet(ManifestTable.read(spark, dir, version = 2L)) shouldBe
      Set(1L -> "a", 2L -> "b", 3L -> "c")
  }
}
