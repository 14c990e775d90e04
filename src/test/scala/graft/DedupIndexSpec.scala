package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.DedupIndex

/** Incremental batch-vs-index dedup (SURVEY.md §2.13, round 8): the
  * persisted band table stands in for the historical corpus, and a new
  * batch's candidates must be EXACTLY what a full-corpus rebuild would
  * have found for pairs touching the batch — band values are pure
  * functions of each doc's own shingles, so incremental and rebuild can
  * only differ if the band math diverged.
  */
class DedupIndexSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def shingled = graft.queries.Llm.shingleArrays(
    T.t(spark, sf001, "documents").select(col("doc_id"), col("text")))

  private def pairKey(a: Long, b: Long) = (math.min(a, b), math.max(a, b))

  test("incremental candidates = full rebuild restricted to batch-touching pairs") {
    val sh = shingled
    val isBatch = col("doc_id") % 5 === 0
    val index = DedupIndex.bandTable(sh.where(!isBatch))
    val batch = DedupIndex.bandTable(sh.where(isBatch))
    val inc = DedupIndex.candidates(batch, index, maxBucket = 1 << 20)
      .collect().map(r => pairKey(r.getLong(0), r.getLong(1))).toSet
    // full rebuild: self-candidates over the whole corpus's band table
    val all = DedupIndex.bandTable(sh)
    val full = DedupIndex.candidates(all, all.limit(0), maxBucket = 1 << 20)
      .collect().map(r => pairKey(r.getLong(0), r.getLong(1))).toSet
    val batchIds = sh.where(isBatch).select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = full.filter { case (a, b) => batchIds(a) || batchIds(b) }
    inc shouldBe expected
    inc should not be empty
    // and the batch path found genuinely CROSS pairs, not just
    // within-batch ones — the point of keeping the index
    inc.count { case (a, b) => batchIds(a) ^ batchIds(b) } should be > 0
  }

  test("the index survives a parquet round trip (the persisted-index shape)") {
    val sh = shingled
    val isBatch = col("doc_id") % 5 === 0
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-index").toString + "/ix"
    DedupIndex.bandTable(sh.where(!isBatch)).write.parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val live = DedupIndex.bandTable(sh.where(!isBatch))
    val batch = DedupIndex.bandTable(sh.where(isBatch))
    val a = DedupIndex.candidates(batch, fromDisk).collect()
      .map(r => pairKey(r.getLong(0), r.getLong(1))).toSet
    val b = DedupIndex.candidates(batch, live).collect()
      .map(r => pairKey(r.getLong(0), r.getLong(1))).toSet
    a shouldBe b
  }

  test("re-ingested docs emit each unordered pair exactly once") {
    import spark.implicits._
    // doc 4 lives in BOTH frames (re-ingest): the batch×index join finds
    // (5,4) while the batch self-join finds (4,5) — without least/greatest
    // normalization distinct() keeps both orientations and downstream
    // re-ranks score the pair twice
    val txt = "alpha beta gamma delta epsilon zeta"
    val d = Seq(1L, 4L, 5L).map(i => (i, txt)).toDF("doc_id", "text")
    val sh = graft.queries.Llm.shingleArrays(d)
    val batch = DedupIndex.bandTable(sh.where(col("doc_id") >= 4))
    val index = DedupIndex.bandTable(sh.where(col("doc_id") <= 4))
    val got = DedupIndex.candidates(batch, index).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (a, b) => a should be < b }
    got.toSet shouldBe Set((1L, 4L), (1L, 5L), (4L, 5L))
    got.length shouldBe 3
  }

  test("bucket cap bounds combined batch+index fan-out") {
    import spark.implicits._
    // 20 identical docs split 15 index / 5 batch: every band collapses to
    // one bucket of combined size 20 — a cap below that must yield zero
    // candidates, the default cap the full quadratic set touching batch
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val d = (1 to 20).map(i => (i.toLong, txt)).toDF("doc_id", "text")
    val sh = graft.queries.Llm.shingleArrays(d)
    val ix = DedupIndex.bandTable(sh.where(col("doc_id") > 5))
    val ba = DedupIndex.bandTable(sh.where(col("doc_id") <= 5))
    DedupIndex.candidates(ba, ix, maxBucket = 10).count() shouldBe 0L
    // pairs touching the 5 batch docs: cross 5×15 + within C(5,2)
    DedupIndex.candidates(ba, ix).count() shouldBe (5L * 15 + 10)
  }
}
