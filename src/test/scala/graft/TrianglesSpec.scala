package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Triangles

/** Degree-ordered triangle census (r12): exactness of the wedge
  * orientation on hand-checkable and adversarial graphs, and the bucket-cap
  * observability contract (capped buckets are countable, and 0 on the bench
  * corpora — the silent-signal-loss guard from the r11 verdict).
  */
class TrianglesSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** one synthetic activity bucket per desired edge: on day `i`, exactly the
    * edge's two users fire event type "t", so co-occurrence with
    * minShared = 1 reproduces the edge list verbatim */
  private def eventsFor(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((a, i.toLong * 86400L), (b, i.toLong * 86400L))
    }.toDF("user_id", "sec")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
        lit("t").as("event_type"))
  }

  private def summary(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Triangles.run(eventsFor(edges), minShared = 1L).collect()(0)
    (r.getAs[Number]("n_edges").longValue,
      r.getAs[Number]("n_triangles").longValue,
      r.getAs[Number]("n_tri_users").longValue)
  }

  test("hub wedges close exactly once (hand-checked graph)") {
    // hub 100 touches 1..4; closures 1-2 and 3-4 -> exactly two triangles.
    // The hub has max degree, so under degree order it is never a wedge
    // center for these triangles — the orientation the r11 plan lacked.
    val edges = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (1L, 2L), (3L, 4L))
    summary(edges) shouldBe ((6L, 2L, 5L))
  }

  test("K4 yields its four triangles; a triangle-free star yields zero") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    summary(k4) shouldBe ((6L, 4L, 4L))
    val star = (1L to 9L).map(i => (0L, i))
    summary(star) shouldBe ((9L, 0L, 0L))
  }

  test("pseudo-random graph matches the driver brute force") {
    // deterministic scrambled edge set with ties in degree and a skewed
    // hub — the brute force is the definition, the operator is the plan
    val raw = (0L until 120L).map { i =>
      val a = (i * 7 + 3) % 23
      val b = (i * i + 5 * i + 1) % 23
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct
    val adj = raw.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    // each triangle is seen from all 3 of its edges
    val bruteTri = raw.map { case (a, b) => (adj(a) & adj(b)).size }.sum / 3
    val triUsers = raw.flatMap { case (a, b) =>
      if ((adj(a) & adj(b)).nonEmpty) (adj(a) & adj(b)) + a + b else Set.empty[Long]
    }.toSet.size
    summary(raw) shouldBe ((raw.size.toLong, bruteTri.toLong, triUsers.toLong))
  }

  test("perNode: hand-checked clustering coefficients, isolated users kept") {
    // hub 100 touches 1..4 with closures 1-2, 3-4 (the first test's
    // graph): deg(100)=4 in 2 triangles -> 2*2/(4*3) = 1/3; each leaf has
    // deg 2 in 1 triangle -> coeff 1.0. User 999 is active but edge-free
    // (its bucket is shared with nobody often enough) and must still get
    // a (0, 0, 0.0) row — the feature-join contract.
    val edges = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (1L, 2L), (3L, 4L))
    val ev = {
      import spark.implicits._
      // 999's lone event sits on day 500 — far from every edge bucket
      eventsFor(edges).union(Seq((999L, 500L * 86400L)).toDF("user_id", "sec")
        .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
          lit("t").as("event_type")))
    }
    val got = Triangles.perNode(ev, minShared = 1L).collect()
      .map(r => r.getAs[Number]("user_id").longValue ->
        ((r.getAs[Number]("degree").longValue,
          r.getAs[Number]("n_tri").longValue,
          r.getAs[Double]("coeff")))).toMap
    got(100L) shouldBe ((4L, 2L, 0.333333))
    Seq(1L, 2L, 3L, 4L).foreach(u => got(u) shouldBe ((2L, 1L, 1.0)))
    got(999L) shouldBe ((0L, 0L, 0.0))
    got.size shouldBe 6
  }

  test("repartition dispatch: both parallelism branches are value-identical") {
    // the r12 AQE-fan-out fix is plan-only: forcing the pinned-repartition
    // branch (gate 0 — what a 10x corpus takes) must reproduce the
    // broadcast branch bit-for-bit, summary and per-node alike — the
    // Components/PageRank dispatch-equivalence contract
    val edges = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (1L, 2L), (3L, 4L), (2L, 3L))
    val ev = eventsFor(edges)
    Triangles.run(ev, minShared = 1L, repartitionGate = 0L).collect() shouldBe
      Triangles.run(ev, minShared = 1L).collect()
    Triangles.perNode(ev, minShared = 1L, repartitionGate = 0L)
      .orderBy("user_id").collect() shouldBe
      Triangles.perNode(ev, minShared = 1L).orderBy("user_id").collect()
    // wedge-phase dispatch (r12): forcing the DISTRIBUTED degree-ordered
    // wedge join (gate 0 — what a >500k-edge graph takes) must agree with
    // the default driver closure, summary and per-node alike
    Triangles.run(ev, minShared = 1L, wedgeGate = 0L).collect() shouldBe
      Triangles.run(ev, minShared = 1L).collect()
    Triangles.perNode(ev, minShared = 1L, wedgeGate = 0L)
      .orderBy("user_id").collect() shouldBe
      Triangles.perNode(ev, minShared = 1L).orderBy("user_id").collect()
    // and on the real corpus slice, all three forced branches agree
    val corpus = spark.read.parquet(s"$sf001/events.parquet")
    Triangles.run(corpus, repartitionGate = 0L).collect() shouldBe
      Triangles.run(corpus).collect()
    Triangles.run(corpus, wedgeGate = 0L).collect() shouldBe
      Triangles.run(corpus).collect()
  }

  test("linkPrediction: hand-checked scores on path and cycle graphs") {
    // path 1-2-3: the single candidate (1,3) shares only hub 2 (deg 2):
    // cn=1, jaccard = 1/(1+1-1) = 1, aa = 1/ln 2
    val path = Triangles.linkPrediction(eventsFor(Seq((1L, 2L), (2L, 3L))),
      minCommon = 1L, minShared = 1L).collect()
    path.length shouldBe 1
    path(0).getAs[Long]("a") shouldBe 1L
    path(0).getAs[Long]("b") shouldBe 3L
    path(0).getAs[Long]("cn") shouldBe 1L
    path(0).getAs[Double]("jaccard") shouldBe 1.0
    path(0).getAs[Double]("adamic_adar") shouldBe (1.0 / math.log(2.0) +- 1e-6)
    // 4-cycle 1-2-3-4-1: the two diagonals each share both neighbours
    // (cn=2, all degrees 2): jaccard = 2/(2+2-2) = 1, aa = 2/ln 2
    val cyc = Triangles.linkPrediction(
      eventsFor(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))),
      minShared = 1L).collect()
    cyc.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))) shouldBe
      Array((1L, 3L), (2L, 4L))
    cyc.foreach { r =>
      r.getAs[Long]("cn") shouldBe 2L
      r.getAs[Double]("jaccard") shouldBe 1.0
      r.getAs[Double]("adamic_adar") shouldBe (2.0 / math.log(2.0) +- 1e-6)
    }
    // adjacent pairs never score: K3 has no non-adjacent pair at all
    Triangles.linkPrediction(eventsFor(Seq((1L, 2L), (2L, 3L), (1L, 3L))),
      minCommon = 1L, minShared = 1L).collect() shouldBe empty
  }

  test("linkPrediction: wedge-dispatch branches agree, on toys and corpus") {
    // the driver closure (default below the gate) and the distributed
    // wedge join (gate 0) must produce the same scored pairs — the census
    // branch-equivalence contract extended to the r12 proximity scores
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a"), r.getAs[Long]("b"))
    val edges = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (1L, 2L), (3L, 4L), (2L, 3L))
    val toy = Triangles.linkPrediction(eventsFor(edges), minCommon = 1L,
      minShared = 1L).collect()
    val toyDist = Triangles.linkPrediction(eventsFor(edges), minCommon = 1L,
      minShared = 1L, wedgeGate = 0L).collect()
    // r13: repartitionGate = 0 additionally forces the distributed branch's
    // raw z-join wedge regime (the beyond-broadcast path) — all three
    // must agree
    val toyRaw = Triangles.linkPrediction(eventsFor(edges), minCommon = 1L,
      minShared = 1L, wedgeGate = 0L, repartitionGate = 0L).collect()
    toy.map(key) shouldBe toyDist.map(key)
    toy.map(key) shouldBe toyRaw.map(key)
    toy.zip(toyRaw).foreach { case (d, x) =>
      d.getAs[Long]("cn") shouldBe x.getAs[Long]("cn")
      d.getAs[Double]("adamic_adar") shouldBe
        (x.getAs[Double]("adamic_adar") +- 1e-6)
    }
    toy.zip(toyDist).foreach { case (d, x) =>
      d.getAs[Long]("cn") shouldBe x.getAs[Long]("cn")
      d.getAs[Double]("jaccard") shouldBe (x.getAs[Double]("jaccard") +- 1e-6)
      d.getAs[Double]("adamic_adar") shouldBe
        (x.getAs[Double]("adamic_adar") +- 1e-6)
    }
    // minShared=20: the sf0.001 ≥30 graph is EMPTY (the declared query's
    // honest zero-row case, exempted in QueriesSpec) — the denser graph
    // makes the corpus branch comparison non-vacuous (22 scored pairs)
    val corpus = spark.read.parquet(s"$sf001/events.parquet")
    val drv = Triangles.linkPrediction(corpus, minShared = 20L).collect()
    val dist = Triangles.linkPrediction(corpus, minShared = 20L,
      wedgeGate = 0L).collect()
    drv should not be empty
    drv.length shouldBe dist.length
    drv.map(key) shouldBe dist.map(key)
    drv.zip(dist).foreach { case (d, x) =>
      d.getAs[Long]("cn") shouldBe x.getAs[Long]("cn")
      d.getAs[Double]("jaccard") shouldBe (x.getAs[Double]("jaccard") +- 1e-6)
      d.getAs[Double]("adamic_adar") shouldBe
        (x.getAs[Double]("adamic_adar") +- 1e-6)
    }
    // structural laws on the corpus result: canonical pair order, the
    // minCommon floor, and Jaccard's (0, 1] range
    drv.foreach { r =>
      r.getAs[Long]("a") should be < r.getAs[Long]("b")
      r.getAs[Long]("cn") should be >= 2L
      r.getAs[Double]("jaccard") should (be > 0.0 and be <= 1.0)
      r.getAs[Double]("adamic_adar") should be > 0.0
    }
  }

  test("closeTriangles matches a set brute force on 200 random graphs") {
    // the driver closure is the shipped below-gate path (r12) — exercise
    // it spark-free on generated graphs with hubs, ties, and disconnected
    // vertices, against the definition: {a,b,c} with all three edges
    // present. The CaimPropertiesSpec seeded-Gen harness (reproducible
    // failures, starvation guard).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeSetGen: Gen[Array[(Long, Long)]] = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(0, 80)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (math.min(a, b), math.max(a, b)))
    } yield pairs.filter { case (a, b) => a != b }.distinct.sorted.toArray
    val params = Gen.Parameters.default
    var run = 0
    var seedNo = 0L
    while (run < 200 && seedNo < 4000L) {
      edgeSetGen.apply(params, Seed(seedNo)).foreach { es =>
        val edgeSet = es.toSet
        val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val brute = (for {
          ia <- verts.indices; ib <- (ia + 1) until verts.length
          ic <- (ib + 1) until verts.length
          a = verts(ia); b = verts(ib); c = verts(ic)
          if edgeSet((a, b)) && edgeSet((b, c)) && edgeSet((a, c))
        } yield (a, b, c)).toSet
        graft.operators.Triangles.closeTriangles(es).toSet shouldBe brute
        run += 1
      }
      seedNo += 1
    }
    run should be >= 100
  }

  test("bucket cap drops oversize buckets and is observable, 0 on corpus") {
    val edges = Seq((1L, 2L), (3L, 4L), (1L, 3L))
    // every synthetic bucket holds 2 users; cap=1 drops them all — the
    // WARN path — and cappedBuckets exposes exactly those buckets
    Triangles.cappedBuckets(eventsFor(edges), bucketCap = 1L)
      .count() shouldBe 3L
    val r = Triangles.run(eventsFor(edges), minShared = 1L, bucketCap = 1L)
      .collect()(0)
    r.getAs[Number]("n_edges").longValue shouldBe 0L
    r.getAs[Number]("n_triangles").longValue shouldBe 0L
    // the shipped cap never binds on the bench corpora (max bucket 587
    // users at sf0.1) — pinned so silent truncation can't creep in
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    Triangles.cappedBuckets(ev).count() shouldBe 0L
  }
}
