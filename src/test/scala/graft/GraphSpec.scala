package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Both sides of the PageRank stats dispatch (operators/PageRank.scala)
  * compute the identical fixed point — the SimSpec both-sides-of-the-gate
  * pattern: the driver branch is what the small declared graph rides; the
  * distributed branch is the 100 TB path, and it must not drift.
  */
class GraphSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def tradeGraph() = {
    val o = T.t(spark, sf001, "orders"); val c = T.t(spark, sf001, "customer")
    val l = T.t(spark, sf001, "lineitem"); val su = T.t(spark, sf001, "supplier")
    val edges = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .join(su, l("l_suppkey") === su("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val nodes = T.t(spark, sf001, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    (nodes, edges)
  }

  test("driver and distributed PageRank branches agree to rounding") {
    val (nodes, edges) = tradeGraph()
    def ranks(gate: Long): Map[Long, Double] =
      graft.operators.PageRank.run(nodes, edges, iters = 10, damping = 0.85,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val driver = ranks(Long.MaxValue) // every graph below the gate
    val dist = ranks(0L)              // every graph at/above the gate
    driver.keySet shouldBe dist.keySet
    driver.keySet should not be empty
    // identical fixed point; only float association order may differ
    driver.foreach { case (n, p) =>
      withClue(s"node $n: ") { dist(n) shouldBe p +- 1e-9 }
    }
  }

  test("driver and distributed HITS branches agree to rounding; scores " +
      "are L2-normalized") {
    val (nodes, edges) = tradeGraph()
    def scores(gate: Long): Map[Long, (Double, Double)] =
      graft.operators.Hits.run(nodes, edges, iters = 10,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    val driver = scores(Long.MaxValue)
    val dist = scores(0L)
    driver.keySet shouldBe dist.keySet
    driver.keySet should not be empty
    driver.foreach { case (n, (h, a)) =>
      withClue(s"node $n hub: ") { dist(n)._1 shouldBe h +- 1e-9 }
      withClue(s"node $n auth: ") { dist(n)._2 shouldBe a +- 1e-9 }
    }
    // unit L2 norms (the per-round normalization contract)
    math.sqrt(driver.values.map(_._1).map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    math.sqrt(driver.values.map(_._2).map(x => x * x).sum) shouldBe 1.0 +- 1e-9
  }

  test("dangling mass is redistributed, conserving total rank") {
    // a 4-node graph with a SINK (node 3 has no out-edges) exercises the
    // dangling branch the sink-free trade graph never hits
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node")
    val edges = Seq((0L, 1L, 2L), (0L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L))
      .toDF("src", "dst", "w")
    def ranks(gate: Long): Map[Long, Double] =
      graft.operators.PageRank.run(nodes, edges, iters = 10, damping = 0.85,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val driver = ranks(Long.MaxValue)
    val dist = ranks(0L)
    // conservation only holds if sink mass is recycled
    driver.values.sum shouldBe 1.0 +- 1e-9
    dist.values.sum shouldBe 1.0 +- 1e-9
    driver.foreach { case (n, p) =>
      withClue(s"node $n: ") { dist(n) shouldBe p +- 1e-9 }
    }
    // the sink collects the most rank on this topology
    driver.maxBy(_._2)._1 shouldBe 3L
  }

  test("sssp branches agree bit-exactly and match an independent Bellman-Ford") {
    val (nodes, edges0) = tradeGraph()
    val edges = edges0.select(col("src"), col("dst"),
      expr("1000000L div (w + 1) + 1").cast("long").as("cost"))
    def dists(gate: Long): Map[Long, Long] =
      graft.operators.Sssp.run(nodes, edges, source = 0L, rounds = 6,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = dists(Long.MaxValue)
    val dist = dists(0L)
    driver shouldBe dist // exact integers: BIT-equal, not approximately
    // independent reference relaxation over the collected cost edges
    val es = edges.collect().map(r => (r.getAs[Number](0).longValue,
      r.getAs[Number](1).longValue, r.getLong(2)))
    val ns = nodes.collect().map(_.getLong(0))
    var ref = ns.map(v => v -> (if (v == 0L) 0L else Long.MaxValue / 4)).toMap
    for (_ <- 1 to 6) {
      val nd = scala.collection.mutable.Map(ref.toSeq: _*)
      for ((u, v, c) <- es if ref(u) < Long.MaxValue / 4)
        if (ref(u) + c < nd(v)) nd(v) = ref(u) + c
      ref = nd.toMap
    }
    val reachable = ref.filter(_._2 < Long.MaxValue / 4)
    driver shouldBe reachable
    driver(0L) shouldBe 0L
    // some route must beat its direct edge (otherwise the graph is a
    // trivial star and the relaxation proves nothing)
    val direct = es.filter(_._1 == 0L).map(e => e._2 -> e._3).toMap
    withClue("no multi-hop improvement found: ") {
      direct.exists { case (v, c) => driver(v) < c } shouldBe true
    }
  }

  test("sssp respects the hop bound: rounds=1 gives direct edges only") {
    val (nodes, edges0) = tradeGraph()
    val edges = edges0.select(col("src"), col("dst"),
      expr("1000000L div (w + 1) + 1").cast("long").as("cost"))
    val one = graft.operators.Sssp.run(nodes, edges, source = 0L, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = edges.where(col("src") === 0L).collect()
      .map(r => r.getAs[Number](1).longValue -> r.getLong(2)).toMap
    one(0L) shouldBe 0L
    (one - 0L) shouldBe direct
  }

  test("all-source distances: branches agree bit-exactly; src 0 equals Sssp") {
    val (nodes, edges0) = tradeGraph()
    val edges = edges0.select(col("src"), col("dst"),
      expr("1000000L div (w + 1) + 1").cast("long").as("cost"))
    def dists(gate: Long): Map[(Long, Long), Long] =
      graft.operators.AllSourceDistances.run(nodes, edges, rounds = 6,
          distributedMinEdges = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val driver = dists(Long.MaxValue)
    val dist = dists(0L)
    driver shouldBe dist // exact integers: BIT-equal
    // cross-operator law: the src = 0 slice IS graph_sssp's frame
    val sssp = graft.operators.Sssp.run(nodes, edges, source = 0L, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    driver.collect { case ((0L, v), d) => v -> d } shouldBe sssp
    // self distances are zero; symmetry is NOT assumed (directed costs)
    nodes.collect().map(_.getLong(0)).foreach(v => driver((v, v)) shouldBe 0L)
  }

  /** Independent synchronous peel over a collected edge list. */
  private def refPeel(es: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] = {
    var cur = es
    def degs(e: Seq[(Long, Long)]): Map[Long, Long] =
      (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
        .map { case (v, o) => v -> o.size.toLong }
    for (_ <- 1 to rounds) {
      val d = degs(cur)
      cur = cur.filter { case (a, b) => d(a) >= k && d(b) >= k }
    }
    degs(cur)
  }

  test("kcore branches agree bit-exactly and match an independent peel") {
    // minShared=20: the sf0.001 corpus's ≥30 graph is empty, so the
    // denser graph keeps this non-vacuous (44 edges, a real peel)
    val (edges, _) = graft.operators.Triangles.cooccurEdges(
      T.t(spark, sf001, "events"), minShared = 20L)
    def core(gate: Long): Map[Long, Long] =
      graft.operators.KCore.run(edges, k = 3L, rounds = 8,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = core(Long.MaxValue)
    val dist = core(0L)
    driver shouldBe dist // exact integers: BIT-equal
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    driver shouldBe refPeel(es, 3L, 8)
    // every survivor keeps >= k ties inside the core, and the peel
    // actually removed someone (otherwise k=3 asserts nothing here)
    driver.values.foreach(_ should be >= 3L)
    val allNodes = (es.map(_._1) ++ es.map(_._2)).distinct
    withClue(s"peel removed nobody of ${allNodes.size}: ") {
      driver.size should be < allNodes.size
    }
    driver should not be empty
    // declared R=8 has converged on the corpus: round 9 changes nothing,
    // so the fixed-R contract frame IS the 3-core here
    refPeel(es, 3L, 9) shouldBe driver
  }

  test("kcore on a hand graph: pendant chain peels, clique survives") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus a pendant path 4-5-6: 5 and 6 peel out (deg
    // < 3), then 4 still has 3 ties inside the clique
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u1", "u2")
    val out = graft.operators.KCore.run(es, k = 3L, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    // k=2: the whole graph except the pendant tail's endpoint chain —
    // 5 and 6 have degree < 2 after 6 peels? 5 has deg 2 (4 and 6), 6 has
    // deg 1 → 6 peels, then 5 drops to deg 1 → peels; 4-core members stay
    val out2 = graft.operators.KCore.run(es, k = 2L, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out2.keySet shouldBe Set(1L, 2L, 3L, 4L)
  }

  /** Independent synchronous label propagation: plain maps, most-frequent
    * neighbour label, ties to the minimum — no shared code with the
    * operator's CSR sweep or its DataFrame rounds. */
  private def refLabelProp(es: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (es ++ es.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, g) => v -> g.map(_._2) }
    var lab: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = nbrs.map { case (v, ns) =>
        val counts = ns.map(lab).groupBy(identity).map { case (l, g) => l -> g.size }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelprop branches agree bit-exactly and match an independent reference") {
    val (edges, _) = graft.operators.Triangles.cooccurEdges(
      T.t(spark, sf001, "events"), minShared = 20L)
    def communities(gate: Long): Map[Long, Long] =
      graft.operators.LabelProp.run(edges, rounds = 4,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = communities(Long.MaxValue)
    val dist = communities(0L)
    driver shouldBe dist // exact integers: BIT-equal
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    driver shouldBe refLabelProp(es, 4)
    driver should not be empty
    // propagation actually merged somebody (labels coarser than identity)
    withClue(s"no label moved across ${driver.size} nodes: ") {
      driver.values.toSet.size should be < driver.size
    }
  }

  test("graph_modularity: terms recompute from the reference partition and edges") {
    // sf0.01: the ≥30-shared graph is non-degenerate there (the declared
    // query's sf0.001 shape — all-singleton, m = 0, q_term ≡ 0 — is
    // asserted separately below)
    val out = SparkEntry.queries("graph_modularity")(spark, sf01c).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val (edges, _) = graft.operators.Triangles.cooccurEdges(
      T.t(spark, sf01c, "events"))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val allUsers = T.t(spark, sf01c, "events").select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val inGraph = refLabelProp(es, 4)
    val lab = allUsers.map(u => u -> inGraph.getOrElse(u, u)).toMap
    val m = es.size
    m should be > 0
    val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
      .map { case (v, g) => v -> g.size }
    val byC = lab.groupBy(_._2)
    out.keySet shouldBe byC.keySet
    byC.foreach { case (c, members) =>
      val nodes = members.keySet
      val mIn = es.count { case (a, b) =>
        lab(a) == c && lab(b) == c }
      val degSum = nodes.toSeq.map(v => deg.getOrElse(v, 0)).sum.toLong
      val q = mIn.toDouble / m -
        (degSum.toDouble / (2.0 * m)) * (degSum.toDouble / (2.0 * m))
      val (gn, gm, gd, gq) = out(c)
      withClue(s"community $c: ") {
        gn shouldBe nodes.size.toLong
        gm shouldBe mIn.toLong
        gd shouldBe degSum
        gq shouldBe BigDecimal(q)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    // partition laws: within-edges ≤ m total, degree sums partition 2m,
    // and Q = Σ q_term is a valid modularity (≤ 1)
    out.values.map(_._2).sum should be <= m.toLong
    out.values.map(_._3).sum shouldBe 2L * m
    out.values.map(_._4).sum should be <= 1.0
    // the edgeless sf0.001 corpus degrades to all-singletons with q ≡ 0
    val degenerate =
      SparkEntry.queries("graph_modularity")(spark, sf001).collect()
    degenerate.length should be > 0
    degenerate.foreach { r =>
      r.getLong(1) shouldBe 1L; r.getLong(2) shouldBe 0L
      r.getLong(3) shouldBe 0L; r.getDouble(4) shouldBe 0.0
    }
  }

  test("graph_assortativity: coefficient recomputes from raw degree pairs") {
    val row = SparkEntry.queries("graph_assortativity")(spark, sf01c).head()
    val (edges, _) = graft.operators.Triangles.cooccurEdges(
      T.t(spark, sf01c, "events"))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    es should not be empty
    val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
      .map { case (v, g) => v -> BigInt(g.size) }
    val pairs = es.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m2 = BigInt(pairs.size)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val r = (m2 * sxy - sx * sy).toDouble /
      math.sqrt((m2 * sxx - sx * sx).toDouble * (m2 * syy - sy * sy).toDouble)
    row.getLong(0) shouldBe es.size.toLong
    row.getDouble(1) shouldBe BigDecimal(r)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    math.abs(row.getDouble(1)) should be <= 1.0
    // the edgeless sf0.001 corpus reports the 0.0 convention, not NULL/NaN
    val degenerate =
      SparkEntry.queries("graph_assortativity")(spark, sf001).head()
    degenerate.getLong(0) shouldBe 0L
    degenerate.getDouble(1) shouldBe 0.0
  }

  test("labelprop on a hand graph: two triangles split at the bridge") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the bridge 3–4: after 4
    // deterministic rounds each triangle converges to one community and
    // the bridge does not merge them (hand-traced: {1,2,3}→1, {4,5,6}→3)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("u1", "u2")
    def run(gate: Long): Map[Long, Long] =
      graft.operators.LabelProp.run(es, rounds = 4,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = run(Long.MaxValue)
    driver shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L)
    run(0L) shouldBe driver
  }

  test("graph_census: manifest read-back equals the live edge frame, re-run stable") {
    // the declared census surface publishes cooccurEdges through a
    // ManifestTable replace-commit and returns the READ-BACK; the round
    // trip must be lossless and a second publication (QueriesSpec runs
    // every query twice per JVM) must read back the same head
    val q = graft.queries.Graph.queries("graph_census")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).toSeq
    val first = pairs(q(spark, sf001))
    val (live, n) = graft.operators.Triangles.cooccurEdges(
      T.t(spark, sf001, "events"))
    first.toSet shouldBe pairs(live.orderBy("u1", "u2")).toSet
    first.length.toLong shouldBe n
    // canonical orientation survives the round trip
    all(first.map { case (a, b) => a < b }) shouldBe true
    pairs(q(spark, sf001)) shouldBe first
  }

  test("metrics consume the published census: read-back path equals a " +
      "direct rebuild for every census-family metric") {
    // r13 verdict item 1: the metric queries now READ the committed
    // census snapshot (operators/Census read-or-publish) instead of
    // rebuilding the corpus→edge collapse per query. The declared outputs
    // must be value-identical to metrics computed from a LIVE
    // cooccurEdges build — at sf0.01, where the ≥30-shared graph is
    // non-degenerate. (kcore/labelprop/modularity/assortativity are
    // additionally hash-checked against the DuckDB oracle, which rebuilds
    // the same graph from raw events SQL — an independent rebuild pin.)
    val ev = T.t(spark, sf01c, "events")
    val (live, n) = graft.operators.Triangles.cooccurEdges(ev)
    n should be > 0L // non-degenerate corpus, or this test pins nothing
    // the published snapshot IS the live edge set
    val (pub, nPub) = graft.operators.Census.edges(spark, sf01c, ev)
    nPub shouldBe n
    pub.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      live.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // round 15 (r14 item 6): the census is a named CATALOG table — the
    // committed head pins (census, census_meta) atomically, the read path
    // goes through Catalog.readTable, and the meta count is the build's
    val cdir = graft.operators.Census.dir(sf01c)
    graft.operators.Catalog.versions(spark, cdir) should not be empty
    graft.operators.Catalog
      .tableVersions(spark, cdir).keySet shouldBe Set("census", "census_meta")
    graft.operators.Catalog.readTable(spark, cdir, "census")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      live.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.operators.Catalog.readTable(spark, cdir, "census_meta")
      .head().getLong(0) shouldBe n
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // summary (events_triangles)
    rows(SparkEntry.queries("events_triangles")(spark, sf01c)) shouldBe
      rows(graft.operators.Triangles.run(ev))
    // per-node clustering
    rows(SparkEntry.queries("graph_clustering")(spark, sf01c)) shouldBe
      rows(graft.operators.Triangles.perNode(ev).orderBy("user_id"))
    // link prediction
    rows(SparkEntry.queries("graph_linkpred")(spark, sf01c)) shouldBe
      rows(graft.operators.Triangles.linkPrediction(ev))
    // kcore through the census path re-runs stable (the read path is
    // deterministic parquet, so two reads must agree row-for-row)
    rows(SparkEntry.queries("graph_kcore")(spark, sf01c)) shouldBe
      rows(SparkEntry.queries("graph_kcore")(spark, sf01c))
  }

  test("betweenness branches agree to rounding on the trade graph") {
    val (nodes, edges0) = tradeGraph()
    val edges = edges0.select(col("src"), col("dst"),
      expr("1000000L div (w + 1) + 1").cast("long").as("cost"))
    def bc(gate: Long): Map[Long, Double] =
      graft.operators.Betweenness.run(nodes, edges, rounds = 6,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val driver = bc(Long.MaxValue)
    val dist = bc(0L)
    driver.keySet shouldBe dist.keySet
    driver.keySet should not be empty
    driver.foreach { case (n, v) =>
      withClue(s"node $n: ") { dist(n) shouldBe v +- 1e-9 }
    }
    // data-dependent: at least one broker exists on the trade graph, or
    // the query asserts nothing
    withClue("all-zero betweenness — trivial topology: ") {
      driver.values.exists(_ > 0.0) shouldBe true
    }
  }

  test("betweenness on a hand graph: the bridge carries the dependency") {
    import spark.implicits._
    // a --1--> b --1--> c, plus a decoy direct a --3--> c: the only
    // shortest a→c route goes through b, so bc(b) = 1 and others 0
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 3L))
      .toDF("src", "dst", "cost")
    for (gate <- Seq(Long.MaxValue, 0L)) {
      val got = graft.operators.Betweenness.run(nodes, edges, rounds = 4,
          distributedMinEdges = gate)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      withClue(s"gate $gate: ") {
        got shouldBe Map(0L -> 0.0, 1L -> 1.0, 2L -> 0.0)
      }
    }
    // two equal-cost routes split the dependency: a→b→d and a→c→d give
    // σ(d) = 2, so each middle node carries 0.5
    val nodes2 = Seq(0L, 1L, 2L, 3L).toDF("node")
    val edges2 = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "cost")
    val got2 = graft.operators.Betweenness.run(nodes2, edges2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got2 shouldBe Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.5, 3L -> 0.0)
  }

  test("betweenness is additive over disjoint source sets (the sampling law)") {
    import spark.implicits._
    val (nodes, edges0) = tradeGraph()
    val edges = edges0.select(col("src"), col("dst"),
      expr("1000000L div (w + 1) + 1").cast("long").as("cost"))
    val ids = nodes.collect().map(_.getLong(0)).sorted
    val (s1, s2) = ids.splitAt(ids.length / 2)
    def bc(srcs: Seq[Long]): Map[Long, Double] =
      graft.operators.Betweenness.run(nodes, edges, rounds = 6,
          sources = srcs.toDF("node"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = graft.operators.Betweenness.run(nodes, edges, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = bc(s1); val b = bc(s2)
    // every node keeps a row under sampling, and bc = Σ_s δ_s splits
    // exactly across a partition of the sources (to rounding)
    a.keySet shouldBe full.keySet
    full.foreach { case (n, v) =>
      withClue(s"node $n: ") { (a(n) + b(n)) shouldBe v +- 2e-6 }
    }
    // all-nodes-as-sources IS the default
    bc(ids.toSeq) shouldBe full
    // and both dispatch branches honor the sample identically
    val dist = graft.operators.Betweenness.run(nodes, edges, rounds = 6,
        distributedMinEdges = 0L, sources = s1.toSeq.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach { case (n, v) =>
      withClue(s"node $n: ") { dist(n) shouldBe v +- 1e-9 }
    }
  }

  test("betweenness fixed-K contract has converged on the corpus: K and K+1 agree") {
    val (nodes, edges0) = tradeGraph()
    val edges = edges0.select(col("src"), col("dst"),
      expr("1000000L div (w + 1) + 1").cast("long").as("cost"))
    def bc(k: Int): Map[Long, Double] =
      graft.operators.Betweenness.run(nodes, edges, rounds = k)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val atK = bc(6)
    val atK1 = bc(7)
    atK.keySet shouldBe atK1.keySet
    atK.foreach { case (n, v) =>
      withClue(s"node $n: ") { atK1(n) shouldBe v +- 1e-6 }
    }
  }
}
