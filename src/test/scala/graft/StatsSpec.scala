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

  test("ts_trend: S, z and Sen's slope recompute from raw daily counts") {
    val out = SparkEntry.queries("ts_trend")(spark, sf001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Number]("nd").longValue, r.getAs[Number]("s").longValue,
          r.getAs[Double]("z"), r.getAs[Double]("sen_slope"))).toMap
    val daily = T.t(spark, sf001, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((g, d), v) => (g, d, v.length.toLong) }
      .toSeq
    daily.groupBy(_._1).foreach { case (g, ds) =>
      val pts = ds.map(x => (x._2, x._3)).sortBy(_._1)
      val nd = pts.length
      val pairs = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(i), pts(j))
      val s = pairs.map { case ((_, n1), (_, n2)) =>
        java.lang.Long.signum(n2 - n1).toLong }.sum
      val tsum = pts.groupBy(_._2).values
        .map(gr => { val t = gr.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val vs = (nd.toLong * (nd - 1) * (2L * nd + 5) - tsum).toDouble / 18.0
      val z = if (s > 0) (s - 1) / math.sqrt(vs)
        else if (s < 0) (s + 1) / math.sqrt(vs) else 0.0
      val slopes = pairs.map { case ((d1, n1), (d2, n2)) =>
        (n2 - n1).toDouble / (d2 - d1) }.sorted
      val m = slopes.length
      val sen = if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      out(g)._1 shouldBe nd.toLong
      out(g)._2 shouldBe s
      out(g)._3 shouldBe (z +- 1e-5)
      out(g)._4 shouldBe (sen +- 1e-5)
    }
  }

  test("agg_theil: per-segment T recomputes raw; decomposition reconstructs total") {
    val out = SparkEntry.queries("agg_theil")(spark, sf001).collect()
    val perCust = T.t(spark, sf001, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("x"))
      .join(T.t(spark, sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("x")).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue.toDouble))
    def theil(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
    }
    val byG = perCust.groupBy(_._1).map { case (g, v) => g -> v.map(_._2).toSeq }
    out.foreach { r =>
      val g = r.getAs[String]("c_mktsegment")
      r.getAs[Number]("n_cust").longValue shouldBe byG(g).length.toLong
      r.getAs[Double]("theil") shouldBe (theil(byG(g)) +- 1e-5)
    }
    // Theil's additive decomposition: total inequality over ALL customers
    // must equal the sum of the within shares plus the between terms —
    // the law Gini lacks, and the reason this query exists
    val total = theil(perCust.map(_._2).toSeq)
    val reconstructed = out.map(r =>
      r.getAs[Double]("within_share") + r.getAs[Double]("between_term")).sum
    reconstructed shouldBe (total +- 1e-4)
    out.foreach(_.getAs[Double]("theil") should be >= 0.0)
  }

  test("text_zipf: the OLS fit recomputes from literal token ranks") {
    val r = SparkEntry.queries("text_zipf")(spark, sf001).collect()(0)
    val counts = T.t(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("c")).collect()
      .map(x => (x.getString(0), x.getAs[Number](1).longValue))
    val top = counts.sortBy { case (tk, c) => (-c, tk) }.take(1000)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    r.getAs[Number]("n_tokens").longValue shouldBe top.length.toLong
    r.getAs[Double]("slope") shouldBe (slope +- 1e-5)
    r.getAs[Double]("intercept") shouldBe (intercept +- 1e-5)
    r.getAs[Double]("r2") shouldBe (r2 +- 1e-5)
    // the fit's defining shape: frequency falls with rank, and r2 is a
    // valid squared correlation
    r.getAs[Double]("slope") should be < 0.0
    r.getAs[Double]("r2") should (be >= 0.0 and be <= 1.0)
  }

  test("agg_auc: AUC recomputes from a literal pairwise comparison") {
    val r = SparkEntry.queries("agg_auc")(spark, sf001).collect()(0)
    val sv = T.t(spark, sf001, "events")
      .where(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0) == "purchase", x.getDouble(1)))
    val pos = sv.filter(_._1).map(_._2); val neg = sv.filterNot(_._1).map(_._2)
    // the probabilistic definition, O(n_pos*n_neg) literal: wins + half
    // ties — the quantity the rank formula must equal exactly
    var wins = 0.0
    for (p <- pos; n <- neg)
      wins += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val auc = wins / (pos.length.toLong * neg.length)
    r.getAs[Number]("n_pos").longValue shouldBe pos.length.toLong
    r.getAs[Number]("n_neg").longValue shouldBe neg.length.toLong
    r.getAs[Double]("auc") shouldBe (auc +- 1e-5)
    r.getAs[Double]("gini") shouldBe (2 * auc - 1 +- 1e-5)
  }

  test("agg_kendall: tau-b recomputes from literal pair enumeration") {
    val out = SparkEntry.queries("agg_kendall")(spark, sf001).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Number]("n").longValue,
          r.getAs[Number]("concordant").longValue,
          r.getAs[Number]("discordant").longValue,
          r.getAs[Double]("tau_b"))).toMap
    val rows = T.t(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect().map(r => (r.getString(0),
        r.getAs[Number](1).doubleValue, r.getAs[Number](2).doubleValue))
    rows.groupBy(_._1).foreach { case (g, v) =>
      val xs = v.map(x => (x._2, x._3))
      val n = xs.length
      var cc = 0L; var dd = 0L
      for (i <- xs.indices; j <- (i + 1) until n) {
        val p = (xs(i)._1 - xs(j)._1) * (xs(i)._2 - xs(j)._2)
        if (p > 0) cc += 1 else if (p < 0) dd += 1
      }
      def tiePairs(k: Seq[Double]): Long =
        k.groupBy(identity).values.map(t => t.size.toLong * (t.size - 1) / 2).sum
      val n0 = n.toLong * (n - 1) / 2
      val tau = (cc - dd).toDouble /
        math.sqrt((n0 - tiePairs(xs.map(_._1))).toDouble *
          (n0 - tiePairs(xs.map(_._2))).toDouble)
      out(g)._1 shouldBe n.toLong
      out(g)._2 shouldBe cc
      out(g)._3 shouldBe dd
      out(g)._4 shouldBe (tau +- 1e-5)
    }
  }

  test("eval_calibration: bins recompute raw and ECE terms decompose") {
    val out = SparkEntry.queries("eval_calibration")(spark, sf001).collect()
    val sv = T.t(spark, sf001, "events")
      .where(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0) == "purchase", x.getDouble(1)))
      .map { case (y, v) =>
        val p = v / (v + 50.0); (math.floor(p * 10).toLong, p, y) }
    val byBin = sv.groupBy(_._1)
    val nn = sv.length.toDouble
    out.map(_.getAs[Number]("bin").longValue).toSet shouldBe byBin.keySet
    out.foreach { r =>
      val b = byBin(r.getAs[Number]("bin").longValue)
      r.getAs[Number]("n").longValue shouldBe b.length.toLong
      r.getAs[Number]("n_pos").longValue shouldBe b.count(_._3).toLong
      val mp = b.map(_._2).sum / b.length
      val obs = b.count(_._3).toDouble / b.length
      r.getAs[Double]("mean_pred") shouldBe (mp +- 1e-5)
      r.getAs[Double]("obs_rate") shouldBe (obs +- 1e-5)
      r.getAs[Double]("ece_term") shouldBe
        (math.abs(mp - obs) * b.length / nn +- 1e-5)
    }
    // the decomposition law: the printed column sums to the corpus ECE
    val ece = byBin.values.map { b =>
      val mp = b.map(_._2).sum / b.length
      val obs = b.count(_._3).toDouble / b.length
      math.abs(mp - obs) * b.length / nn
    }.sum
    out.map(_.getAs[Double]("ece_term")).sum shouldBe (ece +- 1e-4)
  }

  test("events_assoc_rules: confidence and lift recompute from raw baskets") {
    val out = SparkEntry.queries("events_assoc_rules")(spark, sf001).collect()
    val ut = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"),
        col("event_type")).distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
    val byBasket = ut.groupBy(_._1).map { case (b, v) => b -> v.map(_._2).toSet }
    val nb = byBasket.size.toDouble
    val na = ut.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val nab = scala.collection.mutable.Map.empty[(String, String), Long]
    byBasket.values.foreach { ts =>
      for (a <- ts; b <- ts if a != b)
        nab((a, b)) = nab.getOrElse((a, b), 0L) + 1
    }
    val expected = nab.filter(_._2 >= 50)
    out.length shouldBe expected.size
    out.foreach { r =>
      val key = (r.getAs[String]("antecedent"), r.getAs[String]("consequent"))
      val s = expected(key)
      r.getAs[Number]("support").longValue shouldBe s
      r.getAs[Double]("confidence") shouldBe (s.toDouble / na(key._1) +- 1e-5)
      r.getAs[Double]("lift") shouldBe
        (s * nb / (na(key._1) * na(key._2)) +- 1e-5)
    }
    // day baskets keep the rules non-degenerate: some rule's confidence
    // must be strictly inside (0, 1) (user-level baskets collapse to 1.0
    // on this corpus — the grain choice IS the operator)
    out.map(_.getAs[Double]("confidence")).exists(c => c > 0 && c < 1)
      .shouldBe(true)
    // the symmetry law: lift(a->b) == lift(b->a) when both pass support
    val lifts = out.map(r => (r.getAs[String]("antecedent"),
      r.getAs[String]("consequent")) -> r.getAs[Double]("lift")).toMap
    lifts.foreach { case ((a, b), l) =>
      lifts.get((b, a)).foreach(_ shouldBe l +- 1e-5)
    }
  }

  test("sample_temperature: targets recompute and temperature flattens shares") {
    val out = SparkEntry.queries("sample_temperature")(spark, sf001).collect()
    val counts = T.t(spark, sf001, "documents").groupBy("lang")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dsum = counts.values.map(n => math.sqrt(n.toDouble)).sum
    val ntot = counts.values.sum.toDouble
    out.length shouldBe counts.size
    out.foreach { r =>
      val g = r.getAs[String]("lang"); val n = counts(g)
      val tShare = math.sqrt(n.toDouble) / dsum
      r.getAs[Number]("n_docs").longValue shouldBe n
      r.getAs[Double]("raw_share") shouldBe (n / ntot +- 1e-5)
      r.getAs[Double]("temp_share") shouldBe (tShare +- 1e-5)
      val target = math.floor(tShare * 200).toLong
      r.getAs[Number]("target").longValue shouldBe target
      // ranks are dense 1..n per lang, so the cut keeps exactly target
      r.getAs[Number]("n_kept").longValue shouldBe target
      // temperature pulls every share toward uniform: strictly between
      // (or equal when already at) the raw share and 1/k on each side
      val raw = n / ntot; val unif = 1.0 / counts.size
      if (raw > unif) tShare should (be < raw and be > unif)
      else if (raw < unif) tShare should (be > raw and be < unif)
    }
    // shares are a distribution
    out.map(_.getAs[Double]("temp_share")).sum shouldBe (1.0 +- 1e-4)
  }

  test("ts_decompose: components recompute raw and reconstruct the series") {
    val out = SparkEntry.queries("ts_decompose")(spark, sf001).collect()
    val daily = T.t(spark, sf001, "events")
      .where(col("event_type") === "purchase")
      .select(expr("unix_micros(ts) div 86400000000")).collect()
      .map(_.getLong(0)).groupBy(identity)
      .map { case (d, v) => d -> v.length.toLong }.toSeq.sortBy(_._1)
    val n = daily.map(_._2)
    val trend = daily.indices.map { i =>
      if (i >= 3 && i < daily.length - 3)
        Some((i - 3 to i + 3).map(n).sum / 7.0)
      else None
    }
    val seas = daily.indices.flatMap(i =>
        trend(i).map(tr => (daily(i)._1 % 7, n(i) - tr)))
      .groupBy(_._1).map { case (dow, v) =>
        dow -> v.map(_._2).sum / v.length }
    out.length shouldBe daily.length
    out.zipWithIndex.foreach { case (r, i) =>
      r.getAs[Number]("d").longValue shouldBe daily(i)._1
      r.getAs[Number]("n").longValue shouldBe n(i)
      trend(i) match {
        case Some(tr) =>
          r.getAs[Double]("trend") shouldBe (tr +- 1e-5)
          r.getAs[Double]("seasonal") shouldBe
            (seas(daily(i)._1 % 7) +- 1e-5)
          // the decomposition law: trend + seasonal + resid == x
          (r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
            r.getAs[Double]("resid")) shouldBe (n(i).toDouble +- 1e-4)
        case None => r.isNullAt(r.fieldIndex("trend")) shouldBe true
      }
    }
    // seasonal components of a full cycle average to ~0 by construction
    // only when every DOW has equal weight — just pin they're bounded
    seas.values.foreach(s => math.abs(s) should be < 100.0)
  }

  test("ts_cross_corr: per-lag Pearson recomputes from raw daily counts") {
    val out = SparkEntry.queries("ts_cross_corr")(spark, sf001).collect()
      .map(r => r.getAs[Number]("lag").longValue ->
        (r.getAs[Number]("n_days").longValue, r.getAs[Double]("ccf"))).toMap
    val daily = T.t(spark, sf001, "events")
      .where(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), v) => (t, d) -> v.length.toLong }
    val x = daily.collect { case (("purchase", d), c) => d -> c }.toMap
    val y = daily.collect { case (("view", d), c) => d -> c }.toMap
    (-7L to 7L).foreach { lag =>
      val pairs = x.toSeq.flatMap { case (d, xv) =>
        y.get(d + lag).map(yv => (xv.toDouble, yv.toDouble)) }
      if (pairs.length >= 8) {
        val m = pairs.length
        val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val r = (m * sxy - sx * sy) /
          math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
        out(lag)._1 shouldBe m.toLong
        out(lag)._2 shouldBe (r +- 1e-5)
      } else out.contains(lag) shouldBe false
    }
    // lag 0 must be present (full overlap) and the CCF is a correlation
    out.keySet should contain(0L)
    out.values.foreach(_._2 should (be >= -1.0 and be <= 1.0))
  }

  test("split_kfold: folds recompute from md5 and partition the table") {
    val out = SparkEntry.queries("split_kfold")(spark, sf001).collect()
    val keys = T.t(spark, sf001, "orders").select("o_orderkey").collect()
      .map(_.getAs[Number](0).longValue)
    def fold(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      if (hex < "33") 0L else if (hex < "66") 1L
      else if (hex < "99") 2L else if (hex < "cc") 3L else 4L
    }
    val expected = keys.groupBy(fold).map { case (f, v) => f -> v.length.toLong }
    out.map(r => r.getAs[Number]("fold").longValue ->
      r.getAs[Number]("n").longValue).toMap shouldBe expected
    // the partition law: folds are exhaustive and disjoint by construction
    out.map(_.getAs[Number]("n").longValue).sum shouldBe keys.length.toLong
    out.map(_.getAs[Number]("fold").longValue).toSet shouldBe
      expected.keySet
  }

  test("text_readability: ARI recomputes from raw integer counts") {
    val out = SparkEntry.queries("text_readability")(spark, sf001).collect()
    val docs = T.t(spark, sf001, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).map { case (g, v) =>
      g -> v.map { case (_, text) =>
        val words = text.split(" ", -1).length.toLong
        val chars = text.length.toLong - (words - 1)
        val sents = math.max(1L, text.count(_ == '.').toLong)
        4.71 * chars / words + 0.5 * words / sents - 21.43
      }
    }
    out.length shouldBe byLang.size
    out.foreach { r =>
      val aris = byLang(r.getAs[String]("lang"))
      r.getAs[Number]("n_docs").longValue shouldBe aris.length.toLong
      r.getAs[Double]("avg_ari") shouldBe (aris.sum / aris.length +- 1e-5)
      r.getAs[Double]("min_ari") shouldBe (aris.min +- 1e-5)
      r.getAs[Double]("max_ari") shouldBe (aris.max +- 1e-5)
    }
  }

  test("manifest_time_travel: v1 sees only the replace, head sees the append") {
    val out = SparkEntry.queries("manifest_time_travel")(spark, sf001)
      .collect()
    val c = T.t(spark, sf001, "customer")
      .select(col("c_mktsegment"), col("c_acctbal").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val low = c.filter(_._2 <= 5000).groupBy(_._1)
      .map { case (g, v) => g -> v.length.toLong }
    val all = c.groupBy(_._1).map { case (g, v) => g -> v.length.toLong }
    out.length shouldBe all.size
    out.foreach { r =>
      val g = r.getAs[String]("c_mktsegment")
      r.getAs[Number]("n_v1").longValue shouldBe low.getOrElse(g, 0L)
      r.getAs[Number]("n_head").longValue shouldBe all(g)
      r.getAs[Number]("n_added").longValue shouldBe
        (all(g) - low.getOrElse(g, 0L))
    }
    // the append added someone, so time travel distinguishes snapshots
    out.map(_.getAs[Number]("n_added").longValue).sum should be > 0L
  }

  test("agg_hhi: HHI recomputes from raw shares and orders the family") {
    val out = SparkEntry.queries("agg_hhi")(spark, sf001).collect()
    val perCust = T.t(spark, sf001, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("x"))
      .join(T.t(spark, sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("x")).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val byG = perCust.groupBy(_._1).map { case (g, v) => g -> v.map(_._2) }
    out.length shouldBe byG.size
    out.foreach { r =>
      val xs = byG(r.getAs[String]("c_mktsegment"))
      val tot = xs.sum.toDouble
      // literal share-squared definition, not the Σx²/(Σx)² the engines
      // share — a drifted formula would show here
      val hhi = xs.map(x => math.pow(x / tot, 2)).sum
      val n = xs.length
      r.getAs[Number]("n_cust").longValue shouldBe n.toLong
      r.getAs[Double]("hhi") shouldBe (hhi +- 1e-5)
      r.getAs[Double]("hhi_norm") shouldBe
        ((hhi - 1.0 / n) / (1.0 - 1.0 / n) +- 1e-5)
      // bounds: 1/n <= HHI <= 1, so HHI* in [0, 1]
      r.getAs[Double]("hhi") should (be >= 1.0 / n - 1e-9 and be <= 1.0)
      r.getAs[Double]("hhi_norm") should (be >= -1e-9 and be <= 1.0)
    }
  }

  test("text_novelty: hashed plan matches a literal text-keyed brute force") {
    val out = SparkEntry.queries("text_novelty")(spark, sf001).collect()
    val docs = T.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val grams = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      if (tk.length < 8) Seq.empty
      else tk.sliding(8).map(w => (id, w.mkString(" "))).toSeq.distinct
    }
    val first = grams.groupBy(_._2).map { case (w, v) => w -> v.map(_._1).min }
    val expected = grams.groupBy(_._1).map { case (id, v) =>
      id -> (v.size.toLong, v.count(g => first(g._2) == id).toLong) }
    out.length shouldBe expected.size
    out.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val (ng, novel) = expected(id)
      r.getAs[Number]("n_grams").longValue shouldBe ng
      r.getAs[Number]("n_novel").longValue shouldBe novel
      r.getAs[Double]("novelty") shouldBe (novel.toDouble / ng +- 1e-5)
    }
    // the lowest doc_id with windows is fully novel by construction
    val firstDoc = expected.keys.min
    out.find(_.getLong(0) == firstDoc).get
      .getAs[Double]("novelty") shouldBe 1.0
    // and duplication exists in the corpus, so novelty < 1 somewhere
    out.map(_.getAs[Double]("novelty")).min should be < 1.0
  }

  test("events_out_of_order: lateness recomputes from the jittered arrivals") {
    val out = SparkEntry.queries("events_out_of_order")(spark, sf001)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Number]("n").longValue,
          r.getAs[Number]("n_reordered").longValue,
          r.getAs[Number]("n_late_10m").longValue,
          r.getAs[Double]("max_late_s"),
          r.getAs[Double]("avg_reorder_s"))).toMap
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def jitter(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ((hex(0).toInt * 31 + hex(1).toInt) % 1024).toLong * 1500000L
    }
    val late = ev.groupBy(_._1).values.flatMap { rows =>
      val byArr = rows.map(r => (r._4 + jitter(r._2), r._2, r._3, r._4))
        .sortBy(x => (x._1, x._2))
      var runMax = Long.MinValue
      byArr.map { case (_, _, t, us) =>
        val l = if (runMax == Long.MinValue) 0L else math.max(0L, runMax - us)
        runMax = math.max(runMax, us)
        (t, l)
      }
    }.toSeq
    late.groupBy(_._1).foreach { case (t, v) =>
      val ls = v.map(_._2)
      val re = ls.filter(_ > 0)
      val got = out(t)
      got._1 shouldBe ls.length.toLong
      got._2 shouldBe re.length.toLong
      got._3 shouldBe ls.count(_ > 600000000L).toLong
      got._4 shouldBe (ls.max / 1e6 +- 1e-5)
      val avg = if (re.isEmpty) 0.0 else re.sum.toDouble / re.length / 1e6
      got._5 shouldBe (avg +- 1e-5)
    }
    // the jitter reorders SOMETHING, or the profile asserts nothing
    out.values.map(_._2).sum should be > 0L
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

  test("ts_periodogram: powers recompute from a driver DFT with the same quantization") {
    val out = SparkEntry.queries("ts_periodogram")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.keySet shouldBe (1L to 14L).toSet
    val daily = T.t(spark, sf001, "events")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val d0 = daily.map(_._1).min
    val dd = daily.map(_._1).max - d0 + 1
    def q15(v: Double) = BigDecimal(v)
      .setScale(15, BigDecimal.RoundingMode.HALF_UP)
    (1L to 14L).foreach { k =>
      var sc = BigDecimal(0); var ss = BigDecimal(0)
      daily.foreach { case (d, y) =>
        val ang = 2.0 * math.Pi * k * (d - d0) / dd
        sc += q15(y * math.cos(ang))
        ss += q15(y * math.sin(ang))
      }
      val p = (sc.toDouble * sc.toDouble + ss.toDouble * ss.toDouble) / dd
      withClue(s"k=$k: ") {
        out(k) shouldBe BigDecimal(p)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    out.values.foreach(_ should be >= 0.0)
  }

  test("agg_cov_matrix: every cell recomputes from exact BigInt sums") {
    val out = SparkEntry.queries("agg_cov_matrix")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    out.size shouldBe 10
    // independent recomputation: exact ×100 integer scaling, BigInt
    // sufficient statistics, the same single double chain, 6dp HALF_UP
    val rows = T.t(spark, sf001, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")).collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)).map(v => BigInt(math.rint(v * 100).toLong)))
    val names = Seq("quantity", "extendedprice", "discount", "tax")
    val n = BigInt(rows.length)
    def s(i: Int) = rows.map(_(i)).sum
    def p(i: Int, j: Int) = rows.map(r => r(i) * r(j)).sum
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (i <- 0 until 4; j <- i until 4) {
      val (cov, corr) = out((names(i), names(j)))
      val num = (n * p(i, j) - s(i) * s(j)).toDouble
      withClue(s"${names(i)}/${names(j)}: ") {
        cov shouldBe r6(num / n.toDouble / (n - 1).toDouble / 10000.0)
        corr shouldBe r6(num / math.sqrt((n * p(i, i) - s(i) * s(i)).toDouble
          * (n * p(j, j) - s(j) * s(j)).toDouble))
      }
    }
    // matrix laws: unit diagonal, |corr| ≤ 1 off-diagonal
    names.foreach(c => out((c, c))._2 shouldBe 1.0)
    out.values.foreach { case (_, corr) => math.abs(corr) should be <= 1.0 }
  }
}
