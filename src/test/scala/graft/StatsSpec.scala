package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Third-opinion checks for the round-12 statistical-inference batch
  * (queries/Stats.scala): each statistic recomputes on the driver with an
  * INDEPENDENT brute-force formulation (raw per-row ranks / direct
  * probability sums, no shared intermediate with the Spark plan), so a
  * Spark/DuckDB agreement on a wrong formula can't slip through. Plus the
  * join_bloom prefilter-equivalence law: a bloom filter has no false
  * negatives, so the bloom-prefiltered join must return EXACTLY the plain
  * join's rows.
  */
class StatsSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def avgRanks(xs: Seq[Double]): Map[Double, Double] = {
    val sorted = xs.sorted
    sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.length) }
  }

  test("agg_spearman: rho recomputes from raw per-row tie-average ranks") {
    val out = SparkEntry.queries("agg_spearman")(spark, sf001).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Number]("n").longValue, r.getAs[Double]("rho"))).toMap
    val rows = T.t(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_discount").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val (xs, ys) = (rs.map(_._2).toSeq, rs.map(_._3).toSeq)
      val (rx, ry) = (avgRanks(xs), avgRanks(ys))
      val (rxs, rys) = (xs.map(rx), ys.map(ry))
      val n = rs.length
      val (mx, my) = (rxs.sum / n, rys.sum / n)
      val cov = rxs.zip(rys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rxs.map(a => (a - mx) * (a - mx)).sum
      val vy = rys.map(b => (b - my) * (b - my)).sum
      val rho = cov / math.sqrt(vx * vy)
      out(g)._1 shouldBe n.toLong
      out(g)._2 shouldBe (rho +- 1e-5)
    }
  }

  test("agg_spearman: ranks are a monotonic-dependence measure (sanity)") {
    // each group's |rho| must be small on this corpus (quantity and
    // discount are drawn independently) — a formula bug that collapses to
    // Pearson-over-values or to rho = 1 would blow this envelope
    SparkEntry.queries("agg_spearman")(spark, sf001).collect().foreach { r =>
      math.abs(r.getAs[Double]("rho")) should be < 0.2
    }
  }

  test("agg_kruskal: H recomputes from raw global tie-average ranks") {
    val r = SparkEntry.queries("agg_kruskal")(spark, sf001).collect()(0)
    val rows = T.t(spark, sf001, "events")
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val rk = avgRanks(rows.map(_._2).toSeq)
    val n = rows.length
    val byG = rows.groupBy(_._1)
    val s = byG.values.map { g =>
      val rsum = g.map(x => rk(x._2)).sum
      rsum * rsum / g.length
    }.sum
    val hRaw = 12.0 / (n.toDouble * (n + 1)) * s - 3.0 * (n + 1)
    val tsum = rows.groupBy(_._2).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val hAdj = hRaw / (1.0 - tsum / (math.pow(n, 3) - n))
    r.getAs[Number]("k").longValue shouldBe byG.size.toLong
    r.getAs[Number]("n").longValue shouldBe n.toLong
    r.getAs[Double]("h") shouldBe (hRaw +- 1e-4)
    r.getAs[Double]("h_adj") shouldBe (hAdj +- 1e-4)
  }

  test("agg_cramers_v: V recomputes from a raw driver contingency grid") {
    val r = SparkEntry.queries("agg_cramers_v")(spark, sf001).collect()(0)
    val cells = T.t(spark, sf001, "events")
      .select(col("event_type"), expr("(unix_micros(ts) div 86400000000) % 7"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = cells.length.toDouble
    val rowM = cells.groupBy(_._1).map { case (k, v) => k -> v.length }
    val colM = cells.groupBy(_._2).map { case (k, v) => k -> v.length }
    val obs = cells.groupBy(identity).map { case (k, v) => k -> v.length }
    // FULL grid including zero cells — the zero-cell (0-e)^2/e = e term
    // is exactly what the naive observed-cells-only chi2 drops
    val chi2 = (for (rk <- rowM.keys; ck <- colM.keys) yield {
      val e = rowM(rk) * colM(ck) / n
      val o = obs.getOrElse((rk, ck), 0).toDouble
      (o - e) * (o - e) / e
    }).sum
    val mind = math.min(rowM.size - 1, colM.size - 1)
    r.getAs[Number]("n").longValue shouldBe cells.length.toLong
    r.getAs[Number]("dof").longValue shouldBe
      ((rowM.size - 1) * (colM.size - 1)).toLong
    r.getAs[Double]("chi2") shouldBe (chi2 +- 1e-4)
    r.getAs[Double]("v") shouldBe (math.sqrt(chi2 / (n * mind)) +- 1e-6)
    r.getAs[Double]("v") should (be >= 0.0 and be <= 1.0)
  }

  test("agg_mutual_info: MI recomputes from raw joint/marginal probabilities") {
    val r = SparkEntry.queries("agg_mutual_info")(spark, sf001).collect()(0)
    val cells = T.t(spark, sf001, "events")
      .select(col("event_type"), expr("(unix_micros(ts) div 86400000000) % 7"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = cells.length.toDouble
    val px = cells.groupBy(_._1).map { case (k, v) => k -> v.length / n }
    val py = cells.groupBy(_._2).map { case (k, v) => k -> v.length / n }
    val pxy = cells.groupBy(identity).map { case (k, v) => k -> v.length / n }
    val mi = pxy.map { case ((x, y), p) => p * math.log(p / (px(x) * py(y))) }.sum
    val hx = -px.values.map(p => p * math.log(p)).sum
    val hy = -py.values.map(p => p * math.log(p)).sum
    r.getAs[Number]("n").longValue shouldBe cells.length.toLong
    r.getAs[Double]("mi") shouldBe (mi +- 1e-6)
    r.getAs[Double]("nmi") shouldBe (mi / math.sqrt(hx * hy) +- 1e-6)
    // MI is bounded by each marginal entropy; NMI by [0, 1]
    r.getAs[Double]("mi") should be <= math.min(hx, hy) + 1e-9
    r.getAs[Double]("nmi") should (be >= 0.0 and be <= 1.0)
  }

  test("join_bloom: bloom prefilter is result-identical to the plain join") {
    // no-false-negatives law: the bloom drops only rows the equi-join
    // would drop anyway, so the aggregated results must match EXACTLY
    val bloomed = SparkEntry.queries("join_bloom")(spark, sf001).collect()
    val dim = T.t(spark, sf001, "customer").where(col("c_nationkey") === 7)
    val plain = T.t(spark, sf001, "orders")
      .join(dim.select("c_custkey"), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        T.dsum(col("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority").collect()
    bloomed.length shouldBe plain.length
    bloomed.zip(plain).foreach { case (a, b) =>
      a.getAs[String]("o_orderpriority") shouldBe b.getAs[String]("o_orderpriority")
      a.getAs[Number]("n_orders").longValue shouldBe b.getAs[Number]("n_orders").longValue
      a.getAs[Double]("total_price") shouldBe (b.getAs[Double]("total_price") +- 1e-9)
    }
  }

  test("join_bloom: the bloom prefilter is selective before the join") {
    // the 100 TB point of the pattern: the fact-side filter must actually
    // drop the bulk of orders BEFORE any shuffle. Nation-7 customers are
    // ~1/25 of the dim, so the bloom (fp rate ~0 at this fill) keeps ~4%.
    val dim = T.t(spark, sf001, "customer").where(col("c_nationkey") === 7)
    val bf = dim.agg(
      expr("graft_bloom_agg(xxhash64(c_custkey), 100000L, 1048576L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val o = T.t(spark, sf001, "orders")
    val kept = o.where(call_function("graft_bloom_contains", lit(bf),
      xxhash64(col("o_custkey")))).count()
    val total = o.count()
    kept.toDouble / total should be < 0.10
    // and every surviving-key order with a true nation-7 customer is kept
    val trueMatch = o.join(dim.select("c_custkey"),
      o("o_custkey") === col("c_custkey")).count()
    kept should be >= trueMatch
  }
}
