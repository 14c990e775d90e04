package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Per-operator smoke + spot checks at sf0.001, plus the distributed-
  * correctness property: results must not depend on shuffle parallelism
  * (SURVEY.md §5.3). Full value-level verification is the driver's DuckDB
  * oracle (t2); these tests catch regressions fast.
  */
class QueriesSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("every declared query runs and returns rows at sf0.001") {
    val empties = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = SparkEntry.queries(name)(spark, sf001).count()
      if (n == 0) Some(name) else None
    }
    // dedup_jaccard/minhash and sim_cosine_pairs legitimately may be sparse
    // at sf0.001 but must still be non-empty on this corpus
    empties shouldBe empty
  }

  test("flagship entry returns rows (t1 smoke shape)") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
    df.columns should contain allOf ("l_returnflag", "l_linestatus", "sum_qty", "cnt")
  }

  test("oracle map only references declared queries") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.diff(qs) shouldBe empty
  }

  test("bench stdout line is constant-size regardless of declared-query count") {
    // the driver captures only the LAST ~2,000 chars of Bench's stdout
    // (minus sbt's trailing "[success]" line). Round 8 moved per-query
    // timings to BENCH_DETAIL.json, so the stdout line no longer grows
    // with the query count — this canary pins the worst-case line (big
    // total, error count present, long detail path) far inside the
    // window, where it stays for ANY number of future declarations.
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","n_errors":99,""" +
      s""""n_queries":${SparkEntry.queries.size},"detail":"BENCH_DETAIL.json","sf":"sf0.001"}"""
    withClue(s"${line.length} chars at ${SparkEntry.queries.size} queries: ") {
      line.length should be <= 500
    }
  }

  test("agg_group spot values: totals add up against raw scan") {
    val res = SparkEntry.queries("agg_group")(spark, sf001)
    val total = res.agg(sum("cnt")).head().getLong(0)
    val expected = T.t(spark, sf001, "lineitem")
      .filter(col("l_shipdate") <= expr("TIMESTAMP '2000-12-01 00:00:00'")).count()
    total shouldBe expected
  }

  test("split_hash and sample_stratified match an independent md5 computation") {
    // membership recomputed from first principles (java MessageDigest, not
    // Spark's md5) — the engine-portability claim the oracle relies on
    def hb(key: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    val orders = T.t(spark, sf001, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    val expTest = orders.count(k => hb(k) < "40").toLong
    val split = SparkEntry.queries("split_hash")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    split("test") shouldBe expTest
    split("train") shouldBe orders.length - expTest
    val docs = T.t(spark, sf001, "documents")
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val cuts = Map("en" -> "80", "es" -> "40", "de" -> "20", "fr" -> "20", "zh" -> "20")
    val expKept = docs.filter { case (id, l) => cuts.get(l).exists(hb(id) < _) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val strat = SparkEntry.queries("sample_stratified")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strat shouldBe expKept
  }

  test("text_boilerplate matches an in-memory brute force over the corpus") {
    // independent recompute: Scala collections, no Spark dataflow — the
    // distinct-window DF join has to agree with a direct set computation
    val docs = T.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      // limit -1: keep trailing empty tokens, matching Spark's split()
      // and the DuckDB oracle (Scala's default drops them)
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val wins = docs.collect { case (id, tk) if tk.length >= 5 =>
      id -> (0 to tk.length - 5).map(i => tk.slice(i, i + 5).mkString(" ")).toSet
    }
    val df = wins.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val exp = wins.map { case (id, ws) =>
      val shared = ws.count(df(_) >= 2)
      (id, ws.size.toLong, shared.toLong,
        BigDecimal(shared.toDouble / ws.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("text_boilerplate")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    got shouldBe exp
  }

  test("hashed boilerplate path: identical values, long-only exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val trA = new graft.operators.Tracked
    val trB = new graft.operators.Tracked
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = T.t(spark, sf001, "documents")
      val text = graft.queries.TextAnalysis
        .boilerplateStats(docs, hashKeys = false, trA)
      val hashed = graft.queries.TextAnalysis
        .boilerplateStats(docs, hashKeys = true, trB)
      // the scale sibling must agree value-for-value on the fixture (no
      // 64-bit collisions on this corpus — the documented tolerance)
      hashed.orderBy("doc_id").collect() shouldBe
        text.orderBy("doc_id").collect()
      // and the ~25-byte window strings never cross an exchange: the
      // distinct, the doc-frequency agg, and the join probe all shuffle
      // bare longs (the dominant shuffle on a real corpus). The sealed
      // result and the window table are persisted, so the real plan
      // hides behind InMemoryTableScan nodes — recurse through cached
      // plans to reach every exchange in the dataflow.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def allExchanges(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
        case e: ShuffleExchangeExec => Seq(e)
        case s: InMemoryTableScanExec => allExchanges(s.relation.cachedPlan)
      }.flatten
      val exchanges = allExchanges(hashed.queryExecution.executedPlan)
      exchanges should not be empty
      exchanges.foreach { e =>
        withClue(s"exchange ${e.output.map(_.name)}: ") {
          e.output.exists(_.dataType == StringType) shouldBe false
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      trA.release(); trB.release()
    }
  }

  test("every query result is invariant to shuffle parallelism") {
    // the distributed-correctness property (SURVEY §5.3): rerunning any
    // query with different shuffle partitioning must be bit-identical.
    // sim_ann_ivf is excluded: KMeans|| initialization legitimately depends
    // on data partitioning (its own spec checks recall instead).
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(_ == "sim_ann_ivf")
    val failures = names.flatMap { name =>
      val r8 = SparkEntry.queries(name)(spark, sf001).collect()
      spark.conf.set("spark.sql.shuffle.partitions", 3)
      try {
        val r3 = SparkEntry.queries(name)(spark, sf001).collect()
        if (r3.sameElements(r8)) None else Some(name)
      } finally spark.conf.set("spark.sql.shuffle.partitions", 8)
    }
    failures shouldBe empty
  }

  test("dedup_simhash pairs are all true near-dups and cover most of them") {
    val exact = SparkEntry.queries("dedup_jaccard")(spark, sf001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sh = SparkEntry.queries("dedup_simhash")(spark, sf001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // precision: every simhash pair is a true jaccard>=0.5 pair
    sh.foreach(p => exact.keySet should contain(p))
    // recall: at least half of the near-identical (j>=0.9) pairs are found
    val high = exact.filter(_._2 >= 0.9).keySet
    if (high.nonEmpty)
      sh.toSet.intersect(high).size.toDouble / high.size should be >= 0.5
  }

  test("dedup_minhash candidates cover all exact-jaccard pairs") {
    val exact = SparkEntry.queries("dedup_jaccard")(spark, sf001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("dedup_minhash")(spark, sf001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.diff(cand) shouldBe empty
  }

  test("agg_approx_quantile estimates sit inside the neighbouring exact order stats") {
    val rows = SparkEntry.queries("agg_approx_quantile")(spark, sf001).collect()
    rows.length shouldBe 3
    val base = graft.T.t(spark, sf001, "lineitem")
    rows.foreach { r =>
      val flag = r.getString(0)
      val vals = base.filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      for ((p, i) <- Seq(0.5 -> 1, 0.95 -> 2, 0.99 -> 3)) {
        val est = r.getDouble(i)
        // GK guarantee at accuracy 10000: rank error <= n/10000 (< 1 here,
        // but allow +-2 ranks for the discrete index convention)
        val target = (p * vals.length).toInt
        val lo = vals(math.max(0, target - 2))
        val hi = vals(math.min(vals.length - 1, target + 2))
        est should (be >= lo and be <= hi)
      }
    }
  }

  test("agg_sketch_union estimates track exact distincts; union row is consistent") {
    val rows = SparkEntry.queries("agg_sketch_union")(spark, sf001).collect()
    val (all, perType) = rows.partition(_.getString(0) == "ALL")
    all should have length 1
    perType.length should be >= 3
    // per-type: lgK=12 default HLL keeps relative error well under 2% at
    // corpus cardinalities
    perType.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      math.abs(est - exact) / exact should be <= 0.02
    }
    // the ALL row comes from MERGING the per-type sketches — it must agree
    // with the exact distinct over the whole table to the same tolerance
    val exactAll = graft.T.t(spark, sf001, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    math.abs(all.head.getLong(1).toDouble - exactAll) / exactAll should be <= 0.02
  }

  test("jaccardPairsAuto: forced LSH path matches the exact kernel") {
    // gate 1 forces the banded-LSH + exact-re-rank path; b=8, r=2 banding
    // keeps every true τ=0.5 pair on this corpus (the dedup_minhash
    // coverage invariant above), and the re-rank scores exactly, so the
    // dispatch must reproduce the exact kernel's (da, db, jac) rows
    val docs = graft.T.t(spark, sf001, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("da"), col("db"), round(col("jac"), 6))
        .collect().map(_.toString).toSet
    val trA = new graft.operators.Tracked
    val exact = rows(graft.queries.Llm.jaccardPairs(docs, 0.5, trA))
    val trB = new graft.operators.Tracked
    val lsh = rows(graft.queries.Llm.jaccardPairsAuto(docs, 0.5, trB,
      lshThreshold = 1))
    lsh shouldBe exact
  }

  test("caim_fit emits per-feature strictly-increasing boundary arrays") {
    val rows = SparkEntry.queries("caim_fit")(spark, sf001).collect()
    val byF = rows.groupBy(_.getString(0))
    byF.keySet shouldBe Set("f1", "f2", "f3", "f4")
    byF.values.foreach { rs =>
      val bs = rs.sortBy(_.getLong(1)).map(_.getDouble(2))
      bs.length should be >= 2
      bs.sliding(2).foreach {
        case Array(a, b) => a should be < b
        case _ =>
      }
    }
  }

  test("dedup_embed_lsh survivors are a subset-consistent view of dedup_embed") {
    // the LSH path re-ranks exactly, so every (dup_id, keep_id) it emits
    // must agree with the exact quadratic query where present; on this
    // corpus the default banding covers all exact pairs (SimSpec), so the
    // two queries coincide
    val exact = SparkEntry.queries("dedup_embed")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = SparkEntry.queries("dedup_embed_lsh")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    lsh shouldBe exact
  }

  test("r=2 minhash banding prunes low-similarity candidates vs r=1") {
    // the round-7 re-band rationale, pinned: with r=1 a j=0.1 garbage pair
    // collides with p ≈ 0.81, with (b=8, r=2) p ≈ 0.08 — on this corpus
    // the candidate set must shrink by at least 2× while still covering
    // every exact pair (the superset test above pins coverage)
    val tr = new graft.operators.Tracked
    try {
      val docs = tr.persist(
        graft.queries.Llm.shingleArrays(T.t(spark, sf001, "documents")))
      val r1 = graft.queries.Llm.minhashCandidates(docs, 16, 1, 4096, tr).count()
      val r2 = graft.queries.Llm.minhashCandidates(docs, 8, 2, 4096, tr).count()
      info(s"candidates: b=16,r=1 -> $r1; b=8,r=2 -> $r2")
      r2 should be > 0L
      r2 should be <= r1 / 2
    } finally tr.release()
  }

  test("minhash and simhash bucket caps bound degenerate boilerplate fan-out") {
    import spark.implicits._
    // 40 identical documents: every band of every doc lands in ONE bucket
    // of size 40 — the degenerate-boilerplate corpus whose candidate
    // volume is quadratic. A cap below the bucket size must bound the
    // candidate set to zero (recall loss confined to over-cap buckets);
    // at the declared queries' 4096 cap the full pair set comes back.
    val docs = (1L to 40L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val allPairs = 40L * 39 / 2
    val tr = new graft.operators.Tracked
    try {
      val sa = tr.persist(graft.queries.Llm.shingleArrays(docs))
      graft.queries.Llm.minhashCandidates(sa, nBands = 8, rowsPerBand = 2,
        maxBucket = 10, tr = tr).count() shouldBe 0L
      graft.queries.Llm.minhashCandidates(sa, nBands = 8, rowsPerBand = 2,
        maxBucket = 4096, tr = tr).count() shouldBe allPairs
      graft.queries.TextAnalysis.simhashBandPairs(docs, maxBucket = 10, tr = tr)
        .count() shouldBe 0L
      graft.queries.TextAnalysis.simhashBandPairs(docs, maxBucket = 4096, tr = tr)
        .count() shouldBe allPairs
    } finally tr.release()
  }

  test("sim_topk ranks are consistent with sim_cosine_pairs") {
    val topk = SparkEntry.queries("sim_topk")(spark, sf001).collect()
    // per a_id: sims are non-increasing in rank
    topk.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      byRank.sliding(2).foreach {
        case Array(hi, lo) => hi should be >= lo
        case _ =>
      }
    }
  }

  test("sim_ann_ivf recalls a useful fraction of exact top-5 neighbours") {
    val exact = SparkEntry.queries("sim_topk")(spark, sf001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("sim_ann_ivf")(spark, sf001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.15 // weak-structure random embeddings; nprobe=2/16
    // every ANN neighbour's sim must be correct: spot-check via exact pairs map
    ann.size should be > 0
  }

  test("approx_percentile sketch is within tolerance of the exact percentile") {
    // quantile-sketch capability (Greenwald-Khanna): accuracy vs the exact
    // interpolated percentile that agg_percentile declares
    val r = T.t(spark, sf001, "lineitem").agg(
      org.apache.spark.sql.functions.expr(
        "approx_percentile(l_quantity, array(0.5, 0.95), 1000)").as("ap"),
      org.apache.spark.sql.functions.expr(
        "percentile(l_quantity, array(0.5, 0.95))").as("ep")).collect()(0)
    val ap = r.getSeq[Double](0)
    val ep = r.getSeq[Double](1)
    ap.zip(ep).foreach { case (a, e) => math.abs(a - e) should be <= 1.0 }
  }

  test("HLL sketches built per group union to the global estimate") {
    // the re-aggregation pattern behind every 100 TB distinct-count
    // rollup: per-partition/per-day sketches persist as tiny binaries and
    // UNION later instead of rescanning raw data. Datasketches HLL via
    // Spark's hll_sketch_agg / hll_union_agg built-ins.
    val docs = T.t(spark, sf001, "documents")
    val perSrc = docs.groupBy("source")
      .agg(expr("hll_sketch_agg(doc_id)").as("sk"))
    perSrc.count() should be > 1L // genuinely partial sketches
    val est = perSrc
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    val exact = docs.select("doc_id").distinct().count()
    math.abs(est - exact).toDouble / exact should be < 0.05
  }

  test("approx_count_distinct is within rsd of exact") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T.t(spark, sf001, "events").groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (k, ex) =>
      math.abs(approx(k) - ex).toDouble / ex should be < 0.1
    }
  }

  test("jaccard self-join shuffles no string payload under hash compaction") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val tr = new graft.operators.Tracked
    // AQE off for the inspection: AdaptiveSparkPlanExec hides its input
    // plan from collect(), and sparkPlan predates EnsureRequirements (no
    // Exchange nodes exist there at all)
    // restore whatever the session had, not a hard-coded value — other
    // suites share this SparkSession
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pairs = graft.queries.Llm.jaccardPairs(
        T.t(spark, sf001, "documents"), 0.5, tr)
      // every shuffle in the kernel carries only longs/doubles — the
      // ~20-byte shingle strings never cross an exchange once the runtime
      // bijection check passes (the whole point of the compaction; on
      // real corpora this is the dominant shuffle)
      val exchanges = pairs.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      exchanges should not be empty
      exchanges.foreach { e =>
        withClue(s"exchange ${e.output.map(_.name)}: ") {
          e.output.exists(_.dataType == StringType) shouldBe false
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      tr.release()
    }
  }

  test("count-min heavy hitters obey the epsilon-overestimate guarantee") {
    val est = SparkEntry.queries("agg_heavy_hitters")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = T.t(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val exact = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    est.keySet shouldBe exact.keySet
    exact.foreach { case (w, ex) =>
      // CMS never underestimates; overestimate bounded by ε·N (ε = 0.001)
      est(w) should be >= ex
      est(w) - ex should be <= (0.001 * total).toLong + 1
    }
  }

  test("SQL-text variant agrees with the DSL variant (dialect pre-check)") {
    T.t(spark, sf001, "lineitem").createOrReplaceTempView("lineitem")
    val sqlRes = spark.sql(
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""").collect()
    val dsl = SparkEntry.queries("agg_group")(spark, sf001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "cnt").collect()
    sqlRes shouldBe dsl
  }
}
