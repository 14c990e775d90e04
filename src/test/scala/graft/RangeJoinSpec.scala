package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.RangeJoin

/** Banded range join (SURVEY.md §2.13): equi-join on a quantized bin key +
  * exact residual. Pins (1) result equivalence with the naive inequality
  * join, (2) the plan shape — an equi-join even with NO key, where stock
  * Spark falls back to BroadcastNestedLoopJoin, (3) interval edge
  * semantics (open low, closed high), (4) custom bin widths.
  */
class RangeJoinSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def events = T.t(spark, sf001, "events")

  private def sides = {
    val e = events
    (e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts")),
      e.select(col("event_id").as("b_id"), col("user_id").as("u2"), col("ts").as("b_ts")))
  }

  test("keyed band join equals the naive equi+inequality join") {
    val (e1, e2) = sides
    val naive = e1.join(e2, col("user_id") === col("u2") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = RangeJoin.within(e1, e2, col("user_id") === col("u2"),
        unix_micros(col("a_ts")), unix_micros(col("b_ts")), 0L, 300000000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    banded shouldBe naive
    naive should not be empty
  }

  test("keyless band join stays an equi-join — no nested loop in the plan") {
    val (e1, e2) = sides
    val pure = RangeJoin.within(e1, e2, lit(true),
      unix_micros(col("a_ts")), unix_micros(col("b_ts")), 0L, 60000000L)
    val plan = pure.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // and it is the same result the nested-loop plan would produce
    val naive = e1.limit(200).join(e2, col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 MINUTE"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bandedOnSubset = RangeJoin.within(e1.limit(200), e2, lit(true),
        unix_micros(col("a_ts")), unix_micros(col("b_ts")), 0L, 60000000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bandedOnSubset shouldBe naive
  }

  test("interval bounds: open low excludes ties, closed high includes the edge") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("lid", "lv")
    val r = Seq((10L, 100L), (11L, 101L), (12L, 110L), (13L, 111L)).toDF("rid", "rv")
    val got = RangeJoin.within(l, r, lit(true), col("lv"), col("rv"), 0L, 10L)
      .select("rid").collect().map(_.getLong(0)).toSet
    // rv=100 is a tie with lv (excluded: open low); rv=110 is lv+high
    // (included: closed high); rv=111 is beyond
    got shouldBe Set(11L, 12L)
  }

  test("custom bin width changes the plan constant, never the result") {
    val (e1, e2) = sides
    val default = RangeJoin.within(e1, e2, col("user_id") === col("u2"),
        unix_micros(col("a_ts")), unix_micros(col("b_ts")), 0L, 300000000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = RangeJoin.within(e1, e2, col("user_id") === col("u2"),
        unix_micros(col("a_ts")), unix_micros(col("b_ts")), 0L, 300000000L,
        binWidth = 100000000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    narrow shouldBe default
  }

  test("optimizer rule rewrites a naive interval join when enabled") {
    val (e1r, e2r) = sides
    val e1 = e1r.select(col("a_id"), col("user_id"), unix_micros(col("a_ts")).as("av"))
    val e2 = e2r.select(col("b_id"), col("u2"), unix_micros(col("b_ts")).as("bv"))
    def naive = e1.join(e2, col("user_id") === col("u2") &&
        col("bv") > col("av") && col("bv") <= col("av") + lit(300000000L))
      .select("a_id", "b_id")
    val off = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      val on = naive
      // rewritten: the two-bin explode shows up as a Generate/sequence and
      // the join now carries the bin equi-key
      val plan = on.queryExecution.optimizedPlan.toString
      plan should include("__graft_bin")
      // and the residual keeps results identical
      on.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe off
      // keyless naive join: nested loop without the rule, equi-join with it
      val pure = e1.join(e2, col("bv") > col("av") &&
          col("bv") <= col("av") + lit(60000000L))
      val purePlan = pure.queryExecution.executedPlan.toString
      purePlan should include("__graft_bin")
      // the data path is the banded equi-join; the only nested-loop node
      // allowed is the residual out-of-range-anchor leg (round 8), which
      // is runtime-empty on µs-epoch data (scan-level filter pruning)
      "BroadcastNestedLoopJoin".r.findAllIn(purePlan).size should be <= 1
      (purePlan.contains("SortMergeJoin") || purePlan.contains("ShuffledHashJoin") ||
        purePlan.contains("BroadcastHashJoin")) shouldBe true
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
    // flag off: untouched
    naive.queryExecution.optimizedPlan.toString should not include "__graft_bin"
  }

  test("optimizer rule handles non-strict bounds, subtraction offsets, and swapped orientation") {
    val (e1r, e2r) = sides
    val e1 = e1r.select(col("a_id"), col("user_id"), unix_micros(col("a_ts")).as("av"))
    val e2 = e2r.select(col("b_id"), col("u2"), unix_micros(col("b_ts")).as("bv"))
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ≥ lower + < upper (both non-canonical strictness)
    def q1 = e1.join(e2, col("user_id") === col("u2") &&
      col("bv") >= col("av") + lit(1L) && col("bv") < col("av") + lit(60000001L))
    // interval anchored on the RIGHT side's value, written as a LOOKBACK
    // with a subtraction: av ∈ [bv − 5 min, bv) — the anchor side (right)
    // must get the explode
    def q2 = e1.join(e2, col("user_id") === col("u2") &&
      col("av") < col("bv") && col("av") >= col("bv") - lit(300000000L))
    val off1 = collectPairs(q1)
    val off2 = collectPairs(q2)
    off1 should not be empty
    off2 should not be empty
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      q1.queryExecution.optimizedPlan.toString should include("__graft_bin")
      q2.queryExecution.optimizedPlan.toString should include("__graft_bin")
      collectPairs(q1) shouldBe off1
      collectPairs(q2) shouldBe off2
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
  }

  test("optimizer rule keeps anchors at Long extremes (residual leg, no dropped rows)") {
    import spark.implicits._
    // anchors beyond |2^61| would wrap the bin-endpoint arithmetic and
    // silently drop their rows from the rewritten join; the round-8 guard
    // routes them through the residual (non-rewritten) union leg. The
    // contract is EQUIVALENCE: flag-on must return exactly the flag-off
    // result. ANSI mode would make the original predicate itself throw on
    // anchor+offset overflow (equivalently in both modes), so the
    // equivalence is pinned with ANSI off, where the failure mode the
    // guard exists for — silent wrap → dropped rows — is live.
    val lv = Seq(1L -> 100L, 2L -> (1L << 61), 3L -> (Long.MaxValue - 3L),
      4L -> (-(1L << 61) - 7L), 5L -> Long.MinValue, 6L -> 150L)
    val rv = Seq(10L -> 105L, 11L -> ((1L << 61) + 5L), 12L -> (Long.MaxValue - 1L),
      13L -> (-(1L << 61) - 2L), 14L -> (Long.MinValue + 4L), 15L -> 155L)
    val l = lv.toDF("lid", "av")
    val r = rv.toDF("rid", "bv")
    def q = l.join(r, col("bv") > col("av") && col("bv") <= col("av") + lit(10L))
      .select("lid", "rid")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val off = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      // matches that exist ONLY via out-of-range anchors — the rows the
      // unguarded rewrite would have dropped
      off should contain allOf ((2L, 11L), (4L, 13L), (5L, 14L))
      off should contain ((1L, 10L))
      spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
      val plan = q.queryExecution.optimizedPlan.toString
      plan should include("__graft_bin")
      plan should include("Union")
      q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet shouldBe off
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewrite")
      spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("optimizer rule rewrites EVERY band join in a multi-join chain") {
    // round-8 limitation lifted: the old planted-filter fixed-point marker
    // was searched arbitrarily deep, so an outer band join above an
    // already-rewritten join declined its own rewrite. The residual leg is
    // now typed Cross (semantically Inner, but unmatchable by the rule),
    // the deep search is gone, and a chained a⋈b⋈c band query must show
    // TWO banded joins — two Generates — while still converging and
    // returning the naive result.
    val (e1r, e2r) = sides
    val e1 = e1r.select(col("a_id"), col("user_id"), unix_micros(col("a_ts")).as("av"))
    val e2 = e2r.select(col("b_id"), col("u2"), unix_micros(col("b_ts")).as("bv"))
    val e3 = events.select(col("event_id").as("c_id"), col("user_id").as("u3"),
      unix_micros(col("ts")).as("cv"))
    def q = e1.join(e2, col("user_id") === col("u2") &&
        col("bv") > col("av") && col("bv") <= col("av") + lit(7200000000L))
      .join(e3, col("u2") === col("u3") &&
        col("cv") > col("bv") && col("cv") <= col("bv") + lit(7200000000L))
      .select("a_id", "b_id", "c_id")
    val off = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    off should not be empty
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      // both joins banded; the outer residual leg duplicates the inner
      // Union subtree (the df.union(df) shape), so the inner Generate
      // appears twice: 1 outer + 2 inner copies. Plan size is 2^k legs
      // for k chained band joins — but each residual copy carries the
      // out-of-range anchor filter pushed to its scans, so the duplicate
      // legs are runtime-empty (pushed-filter scan pruning); data cost
      // stays linear.
      "Generate".r.findAllIn(plan).size shouldBe 3
      "Join Cross".r.findAllIn(plan).size shouldBe 3
      // terminal: 6 joins total (outer banded+residual, inner pair ×2
      // copies) — NOT the ~100-leg fixed-point-cap explosion
      "Join ".r.findAllIn(plan).size shouldBe 6
      q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe off
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
  }

  test("nested-rewrite budget caps a deep band-join chain at 4 rewrites") {
    import spark.implicits._
    // 6 chained band joins: nested rewrites double the child subtree per
    // level (2^k legs), so the budget must stop at 4 — Generate count
    // follows G(k) = 2^k − 1: exactly 15, never 31 — while results stay
    // equal to flag-off. Parquet-backed inputs: LocalRelation lets
    // ConvertToLocalRelation fold the runtime-empty residual legs
    // mid-batch, which would both hide the duplication this budget
    // bounds and re-open the budget for later iterations. Tiny values,
    // all in one band — only the PLAN shape is under test.
    val dir = java.nio.file.Files.createTempDirectory("graft-rjbudget").toString
    val ts = (0 to 5).map { i =>
      Seq(1L, 2L, 3L).toDF(s"id$i").withColumn(s"v$i", col(s"id$i") + lit(i))
        .write.parquet(s"$dir/t$i")
      spark.read.parquet(s"$dir/t$i")
    }
    def chain = ts.reduceLeft { (acc, next) =>
      val i = next.columns.head.stripPrefix("id").toInt
      acc.join(next,
        col(s"v$i") > col(s"v${i - 1}") && col(s"v$i") <= col(s"v${i - 1}") + lit(10L))
    }
    val off = chain.count()
    off should be > 0L
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      val plan = chain.queryExecution.optimizedPlan.toString
      "Generate".r.findAllIn(plan).size shouldBe 15
      chain.count() shouldBe off
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
  }

  test("optimizer rule converges on parquet-backed tables (no plan explosion)") {
    // regression: the residual leg's fixed-point marker was an
    // unreferenced projected column, which ColumnPruning (same optimizer
    // batch) stripped — the rule then re-rewrote the residual join on
    // EVERY batch iteration until the 100-iteration cap: ~200 Generate
    // nodes and ~1600 plan lines for a two-table join. LocalRelation
    // inputs hid it (ConvertToLocalRelation folds the residual leg), so
    // this spec pins the parquet-backed shape the production path uses.
    val dir = java.nio.file.Files.createTempDirectory("graft-rjconv").toString
    val (e1r, e2r) = sides
    e1r.select(col("a_id"), unix_micros(col("a_ts")).as("av")).write.parquet(s"$dir/a")
    e2r.select(col("b_id"), unix_micros(col("b_ts")).as("bv")).write.parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    def q = a.join(b, col("bv") > col("av") && col("bv") <= col("av") + lit(60000000L))
      .select("a_id", "b_id")
    val off = q.count()
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      plan should include("__graft_bin")
      "Generate".r.findAllIn(plan).size shouldBe 1
      "Join ".r.findAllIn(plan).size should be <= 2
      q.count() shouldBe off
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
  }

  test("interval-overlap join equals the naive inequality join, exactly once, no nested loop") {
    val e = events
    def iv(typ: String, ida: String, ukey: String, sCol: String, eCol: String) =
      e.where(col("event_type") === typ)
        .select(col("user_id").as(ukey), col("event_id").as(ida),
          unix_micros(col("ts")).as(sCol),
          (unix_micros(col("ts")) +
            (lit(3600L) + pmod(col("event_id"), lit(7200L))) * lit(1000000L)).as(eCol))
    val v = iv("view", "a_id", "user_id", "ls", "le")
    val p = iv("purchase", "b_id", "u2", "rs", "re")
    val naive = v.join(p, col("user_id") === col("u2") &&
        col("ls") < col("re") && col("rs") < col("le"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val banded = RangeJoin.overlaps(v, p, col("user_id") === col("u2"),
        col("ls"), col("le"), col("rs"), col("re"), binWidth = 10800000000L)
    val got = banded.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.toSet shouldBe naive.toSet
    naive should not be empty
    // exactly-once: no pair is emitted from two bins
    got.length shouldBe got.toSet.size
    val plan = banded.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("interval-overlap join: edge semantics and degenerate intervals") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 50L, 50L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 10L, 15L), (11L, 29L, 40L), (12L, 45L, 60L)).toDF("rid", "rs", "re")
    val got = RangeJoin.overlaps(l, r, lit(true),
        col("ls"), col("le"), col("rs"), col("re"), binWidth = 7L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // [0,10) vs [10,15): touching endpoints do NOT overlap (half-open);
    // [20,30) vs [29,40): one-unit overlap does; [50,50) is empty — never
    got shouldBe Set((2L, 11L))
  }

  test("rule declines its own residual-leg shape even without the Cross marker") {
    // round-9 backstop: the residual leg's terminal marker is its Cross
    // join type — an implicit cross-version assumption (no current rule
    // normalizes InnerLike subtypes, but no contract forbids it). If that
    // ever changed, the structural check must recognize the leg by its
    // planted guard filter and decline. This spec builds the exact
    // residual shape with an INNER join — the worst case the backstop
    // exists for — and pins that the rule leaves it alone, while the same
    // join without the guard still rewrites.
    val cap = 1L << 61
    val dir = java.nio.file.Files.createTempDirectory("graft-rjres").toString
    val (e1r, e2r) = sides
    e1r.limit(50).select(col("a_id"), unix_micros(col("a_ts")).as("av"))
      .write.parquet(s"$dir/a")
    e2r.limit(50).select(col("b_id"), unix_micros(col("b_ts")).as("bv"))
      .write.parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    val bandCond = col("bv") > col("av") && col("bv") <= col("av") + lit(60000000L)
    val residualShaped = a
      .filter(col("av").isNull || !(col("av") > lit(-cap) && col("av") < lit(cap)))
      .join(b, bandCond)
    val plain = a.join(b, bandCond)
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      residualShaped.queryExecution.optimizedPlan.toString should not include "__graft_bin"
      plain.queryExecution.optimizedPlan.toString should include("__graft_bin")
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
  }

  test("residual leg is scan-pruned free on real-magnitude data") {
    // the documented claim behind the residual-union design: on µs-epoch
    // anchors (~2^51, far inside ±2^61) the residual leg costs nothing —
    // its out-of-range filter is PUSHED to the parquet scan (row-group
    // stats prune the read) and the leg's join streams zero rows. Note
    // this is scan pruning, not AQE: the keyless leg has no exchange, so
    // there is no query-stage boundary where AQE could even observe
    // emptiness.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val dir = java.nio.file.Files.createTempDirectory("graft-rjaqe").toString
    val (e1r, e2r) = sides
    e1r.select(col("a_id"), unix_micros(col("a_ts")).as("av")).write.parquet(s"$dir/a")
    e2r.select(col("b_id"), unix_micros(col("b_ts")).as("bv")).write.parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    def q = a.join(b, col("bv") > col("av") && col("bv") <= col("av") + lit(60000000L))
      .select("a_id", "b_id")
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      val df = q
      // execute THIS DataFrame's own QueryExecution (count() would build
      // a separate one and leave df's metrics untouched)
      df.collect().length should be > 0
      // unwrap the adaptive root and every query-stage wrapper: both keep
      // their subtree as internal state, not as children, so a plain
      // collect() sees nothing below them
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def bnljs(p: SparkPlan): Seq[BroadcastNestedLoopJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => bnljs(a.executedPlan)
        case q: QueryStageExec => bnljs(q.plan)
        case j: BroadcastNestedLoopJoinExec => j +: j.children.flatMap(bnljs)
        case other => other.children.flatMap(bnljs)
      }
      // the out-of-range anchor filter reached the residual scan
      df.queryExecution.executedPlan.toString should
        include("PushedFilters: [Or(IsNull(av)")
      // and the residual nested-loop emitted nothing at runtime
      val residual = bnljs(df.queryExecution.executedPlan)
      residual should have size 1
      residual.head.metrics("numOutputRows").value shouldBe 0L
    } finally spark.conf.unset("spark.graft.rangeJoin.rewrite")
  }

  test("values above 2^53 bin exactly (no double round-trip in the bin key)") {
    import spark.implicits._
    // nanosecond-epoch magnitude: a quotient computed through double
    // division would round here and could misbin; bin keys are pure-long
    // floor multiples so pairs must survive at any magnitude
    val base = 4000000000000000000L
    val l = Seq((1L, base), (2L, base + 1000L)).toDF("lid", "lv")
    val r = Seq((10L, base + 5L), (11L, base + 1005L), (12L, base + 500L))
      .toDF("rid", "rv")
    val got = RangeJoin.within(l, r, lit(true), col("lv"), col("rv"), 0L, 10L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    got shouldBe Set((1L, 10L), (2L, 11L))
    // an interval wider than Long.MaxValue fails loudly instead of wrapping
    an[ArithmeticException] should be thrownBy
      RangeJoin.within(l, r, lit(true), col("lv"), col("rv"),
        -6000000000000000000L, 5000000000000000000L)
  }

  test("negative values bin with floor semantics (pairs straddling zero)") {
    import spark.implicits._
    val l = Seq((1L, -5L), (2L, -15L)).toDF("lid", "lv")
    val r = Seq((10L, 3L), (11L, -8L), (12L, -30L)).toDF("rid", "rv")
    // interval (0, 10]: lid=1 matches rv in (-5, 5] → {3}; lid=2 matches
    // rv in (-15, -5] → {-8}
    val got = RangeJoin.within(l, r, lit(true), col("lv"), col("rv"), 0L, 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 10L), (2L, 11L))
  }

  test("property: flag-on rewrite equals wrap-exact brute force at any magnitude") {
    import spark.implicits._
    // the rewrite's total contract: flag-on returns exactly what the
    // naive join returns, for anchors ANYWHERE in long range — banded
    // leg inside (−2^61, 2^61), residual (Cross) leg outside it. The
    // expected side recomputes the predicate with plain Scala Long
    // arithmetic, which WRAPS exactly like Spark's non-ANSI Add — so
    // this pins wrap-for-wrap equivalence, not mathematical comparison
    // (the decimal-residual design this round rejected would fail here).
    val caseGen: Gen[(List[Long], List[Long], Long, Long)] = for {
      scale <- Gen.oneOf(0L, 1000000L, (1L << 61) - 30L, -(1L << 61) - 30L,
        Long.MaxValue - 60L, Long.MinValue + 60L)
      lvs <- Gen.listOfN(10, Gen.choose(-50L, 50L).map(x => scale + x))
      rvs <- Gen.listOfN(10, Gen.choose(-50L, 50L).map(x => scale + x))
      lo <- Gen.choose(-20L, 15L)
      span <- Gen.choose(1L, 40L)
    } yield (lvs, rvs, lo, lo + span)
    val params = Gen.Parameters.default
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
    try {
      var run = 0
      var seedNo = 0L
      while (run < 45 && seedNo < 1000) {
        caseGen.apply(params, Seed(seedNo)).foreach { case (lvs, rvs, lo, hi) =>
          val l = lvs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "av")
          val r = rvs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "bv")
          val got = l.join(r,
              col("bv") > col("av") + lit(lo) && col("bv") <= col("av") + lit(hi))
            .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
          val want = (for {
            (lv, li) <- lvs.zipWithIndex
            (rv, ri) <- rvs.zipWithIndex
            if rv > lv + lo && rv <= lv + hi // Long wrap, like non-ANSI Add
          } yield (li.toLong, ri.toLong)).toSet
          withClue(s"seed=$seedNo lo=$lo hi=$hi: ") { got shouldBe want }
          run += 1
        }
        seedNo += 1
      }
      run should be >= 40
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.rewrite")
      spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("property: overlap join equals the in-memory brute force on random intervals") {
    import spark.implicits._
    // random interval sets: mixed magnitudes incl. negative starts (pmod
    // floor bins), zero-length and inverted intervals (must vanish),
    // lengths straddling the bin width in both directions. Exactly-once
    // is asserted via multiset size — a pair emitted by two bins would
    // show as a duplicate even when the SET matches.
    val caseGen: Gen[(List[(Long, Long)], List[(Long, Long)], Long)] = for {
      scale <- Gen.oneOf(-1000000L, 0L, 1000000L)
      mkIv = for {
        st <- Gen.choose(-60L, 60L)
        len <- Gen.choose(-2L, 25L) // negative/zero length: degenerate
      } yield (scale + st, scale + st + len)
      lvs <- Gen.listOfN(10, mkIv)
      rvs <- Gen.listOfN(10, mkIv)
      bw <- Gen.oneOf(1L, 4L, 9L, 64L)
    } yield (lvs, rvs, bw)
    val params = Gen.Parameters.default
    var run = 0
    var seedNo = 0L
    while (run < 60 && seedNo < 1000) {
      caseGen.apply(params, Seed(seedNo)).foreach { case (lvs, rvs, bw) =>
        val l = lvs.zipWithIndex.map { case ((s0, e0), i) => (i.toLong, s0, e0) }
          .toDF("lid", "ls", "le")
        val r = rvs.zipWithIndex.map { case ((s0, e0), i) => (i.toLong, s0, e0) }
          .toDF("rid", "rs", "re")
        val got = RangeJoin.overlaps(l, r, lit(true),
            col("ls"), col("le"), col("rs"), col("re"), bw)
          .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
        val want = (for {
          ((ls, le), li) <- lvs.zipWithIndex
          ((rs, re), ri) <- rvs.zipWithIndex
          if le > ls && re > rs && ls < re && rs < le
        } yield (li.toLong, ri.toLong)).toSet
        withClue(s"seed=$seedNo bw=$bw: ") {
          got.toSet shouldBe want
          got.length shouldBe want.size // exactly-once, no double-bin emits
        }
        run += 1
      }
      seedNo += 1
    }
    run should be >= 50
  }

  test("property: banded join equals the in-memory brute force on random inputs") {
    import spark.implicits._
    // random magnitudes mix small, NEGATIVE (the -1M scale — values are
    // genuinely below zero, exercising pmod floor semantics), and >2^53
    // values; random interval bounds include negative-lo (lookback) and
    // custom widths. Fixed seeds so failures reproduce.
    val caseGen: Gen[(List[Long], List[Long], Long, Long, Long)] = for {
      scale <- Gen.oneOf(-1000000L, 100L, 1000000L, 4000000000000000000L)
      lvs <- Gen.listOfN(12, Gen.choose(-50L, 50L).map(x => scale + x))
      rvs <- Gen.listOfN(12, Gen.choose(-50L, 50L).map(x => scale + x))
      lo <- Gen.choose(-20L, 15L)
      span <- Gen.choose(1L, 40L)
      bw <- Gen.oneOf(0L, 1L, 3L, 7L, 100L)
    } yield (lvs, rvs, lo, lo + span, bw)
    val params = Gen.Parameters.default
    var run = 0
    var seedNo = 0L
    while (run < 60 && seedNo < 1000) {
      caseGen.apply(params, Seed(seedNo)).foreach { case (lvs, rvs, lo, hi, bw) =>
        val l = lvs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
        val r = rvs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
        val got = RangeJoin.within(l, r, lit(true), col("lv"), col("rv"), lo, hi, bw)
          .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val want = (for {
          (lv, li) <- lvs.zipWithIndex
          (rv, ri) <- rvs.zipWithIndex
          // BigInt avoids overflow in the expected-side arithmetic
          if BigInt(rv) > BigInt(lv) + lo && BigInt(rv) <= BigInt(lv) + hi
        } yield (li.toLong, ri.toLong)).toSet
        withClue(s"seed=$seedNo lo=$lo hi=$hi bw=$bw: ") { got shouldBe want }
        run += 1
      }
      seedNo += 1
    }
    run should be >= 50
  }
}
