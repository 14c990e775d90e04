package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Components

/** Min-label-propagation connected components. */
class ComponentsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("chain, pair, and triangle resolve to min-id clusters") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
      .toDF("a_id", "b_id")
    val got = Components.connected(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L)
  }

  test("a long path needs multiple propagation rounds and still converges") {
    import spark.implicits._
    val n = 40
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")
    val got = Components.connected(edges).collect()
    got.length shouldBe n
    got.foreach(_.getLong(1) shouldBe 1L)
  }

  test("distributed path (threshold 0) agrees with the driver union-find path") {
    import spark.implicits._
    // mixed shapes: a 25-chain (pointer jump earns its keep), a star, a
    // triangle with a tail, an isolated pair — same answer both ways
    val edges = ((1 until 25).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L),
        (200L, 201L), (201L, 202L), (200L, 202L), (202L, 203L),
        (300L, 301L))).toDF("a_id", "b_id")
    val small = Components.connected(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Components.connected(edges, smallThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    dist shouldBe small
    dist(25L) shouldBe 1L
    dist(203L) shouldBe 200L
  }

  test("Dedup.survivors keeps unclustered rows plus one representative per cluster") {
    val docs = T.t(spark, sf001, "documents")
    val tr = new graft.operators.Tracked
    val pairs = graft.queries.Llm.clusterEdges(docs, 0.5, tr)
    val clusters = Components.connected(pairs, "da", "db", tr)
    val kept = graft.operators.Dedup.survivors(docs, clusters)
    // schema unchanged; every cluster keeps exactly its min-id member;
    // all unclustered docs survive
    kept.columns shouldBe docs.columns
    val cl = clusters.collect().map(r => r.getLong(0) -> r.getLong(1))
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val losers = cl.collect { case (id, c) if id != c => id }.toSet
    val reps = cl.map(_._2).toSet
    reps.subsetOf(keptIds) shouldBe true
    keptIds.intersect(losers) shouldBe empty
    kept.count() shouldBe docs.count() - losers.size
    tr.release()
  }

  test("dedup_clusters is transitive over the pairwise jaccard output") {
    val pairs = SparkEntry.queries("dedup_jaccard")(spark, sf001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc is clustered, and paired docs share a cluster
    pairs.foreach { case (a, b) =>
      clusters(a) shouldBe clusters(b)
      clusters(a) should be <= math.min(a, b)
    }
  }
}
