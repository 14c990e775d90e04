package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 event-analytics and text-quality queries: semantic invariants
  * the hash oracle cannot express (ordering within a row, density of the
  * gap-filled grid, information-theoretic bounds).
  */
class EventsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("events_funnel: stage timestamps are strictly ordered and stage matches nulls") {
    val rows = SparkEntry.queries("events_funnel")(spark, sf001).collect()
    rows should not be empty
    rows.foreach { r =>
      val s1 = Option(r.getAs[java.lang.Long]("signup_us"))
      val s2 = Option(r.getAs[java.lang.Long]("view_us"))
      val s3 = Option(r.getAs[java.lang.Long]("purchase_us"))
      val stage = r.getAs[Long]("stage")
      // each stage requires the previous one, strictly later, within 24h
      if (s2.isDefined) { s1.isDefined shouldBe true; s2.get should be > s1.get
        (s2.get - s1.get) should be <= 86400000000L }
      if (s3.isDefined) { s2.isDefined shouldBe true; s3.get should be > s2.get
        (s3.get - s2.get) should be <= 86400000000L }
      stage shouldBe Seq(s1, s2, s3).count(_.isDefined).toLong
    }
    // the 24h conversion windows must actually discriminate on the corpus
    rows.map(_.getAs[Long]("stage")).distinct.length should be > 1
  }

  test("ts_fill_gaps: per-user day grid is dense and totals are preserved") {
    val out = SparkEntry.queries("ts_fill_gaps")(spark, sf001).collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_.getAs[Long]("d")).sorted
      days shouldBe (days.min to days.max) // contiguous, no holes
      rs.filter(_.getAs[Long]("n_events") == 0L)
        .foreach(_.getAs[Double]("sum_value") shouldBe 0.0)
    }
    out.map(_.getAs[Long]("n_events")).sum shouldBe
      T.t(spark, sf001, "events").count()
  }

  test("retention_cohort: week 0 holds every cohort member and offsets are bounded") {
    val rows = SparkEntry.queries("retention_cohort")(spark, sf001).collect()
    rows should not be empty
    val users = T.t(spark, sf001, "events").select("user_id").distinct().count()
    val wk0 = rows.filter(_.getAs[Long]("wk") == 0L).map(_.getAs[Long]("n_users")).sum
    wk0 shouldBe users // everyone's first event is in their own week 0
    rows.foreach { r =>
      r.getAs[Long]("wk") should be >= 0L
      r.getAs[Long]("n_users") should be <= users
    }
  }

  test("text_entropy: bounded by log2 of distinct and total token counts") {
    val rows = SparkEntry.queries("text_entropy")(spark, sf001).collect()
    rows should not be empty
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val nd = r.getAs[Long]("n_distinct").toDouble
      h should be >= 0.0
      h should be <= (math.log(nd) / math.log(2) + 1e-6)
    }
  }

  test("quality_lm: equals an in-memory brute-force unigram LM recompute") {
    val rows = SparkEntry.queries("quality_lm")(spark, sf001).collect()
    rows should not be empty
    // third opinion: recompute corpus unigram frequencies and per-doc
    // mean surprisal from the raw text on the driver — catches a
    // frequency-join bug (every doc scoring the corpus mean) or a sign/
    // ratio swap that the positivity+bound assertions alone would pass
    val docs = T.t(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val freq = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = freq.values.sum.toDouble
    def log2(x: Double) = math.log(x) / math.log(2)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id)
      r.getAs[Long]("n_tokens") shouldBe toks.size.toLong
      val want = -toks.map(tk => log2(freq(tk) / total)).sum / toks.size
      r.getAs[Double]("avg_surprisal") shouldBe (math.rint(want * 1e6) / 1e6 +- 1e-6)
      r.getAs[Double]("avg_surprisal") should be > 0.0
    }
    // and the ordering property the signal exists for: the doc with the
    // rarest average token scores above the doc with the most common one
    val byScore = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_surprisal"))
    val meanRarity = docs.view.mapValues(tks =>
      -tks.map(tk => log2(freq(tk) / total)).sum / tks.size).toMap
    val rarest = meanRarity.maxBy(_._2)._1
    val commonest = meanRarity.minBy(_._2)._1
    byScore.toMap.apply(rarest) should be > byScore.toMap.apply(commonest)
  }

  test("new round-9 queries are distribution invariant (shuffle partitions)") {
    val names = Seq("events_funnel", "retention_cohort", "ts_fill_gaps",
      "ts_rolling_avg", "text_entropy", "quality_lm", "agg_winsorize",
      "agg_moments", "upsert_merge", "join_overlap", "events_markov",
      "agg_incremental", "agg_corr", "win_distribution", "join_multiway",
      "join_fuzzy", "join_star", "events_ngrams", "ts_zscore", "agg_hist",
      "agg_ratio", "agg_distinct_multi", "agg_mad", "win_streak",
      "events_attribution", "events_path", "join_agg_semi",
      "set_except_all", "set_intersect_all", "subquery_scalar",
      "filter_pipeline", "events_rfm", "ts_ohlc", "ts_interpolate",
      "events_entropy", "ts_cum_users", "ts_rolling_median",
      "text_top_tokens", "sample_weighted", "events_dau_wau",
      "join_asof_near", "text_tfidf", "agg_listagg", "ts_monthly",
      "events_cooccur", "ts_ewma", "ts_seasonality", "events_pareto",
      "events_session_stats", "agg_ttest")
    val before = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf001).collect().toSeq).toMap
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      names.foreach { n =>
        SparkEntry.queries(n)(spark, sf001).collect().toSeq shouldBe before(n)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("events_markov: transitions conserve mass (rows − users) and are complete") {
    val e = T.t(spark, sf001, "events")
    val total = e.count()
    val users = e.select("user_id").distinct().count()
    val rows = SparkEntry.queries("events_markov")(spark, sf001).collect()
    rows should not be empty
    // every event except each user's last contributes exactly one transition
    rows.map(_.getAs[Long]("n")).sum shouldBe (total - users)
    rows.foreach(_.getAs[Long]("n") should be > 0L)
  }

  test("agg_incremental equals the non-incremental full aggregate") {
    // the declared query IS the incremental path; recompute the same
    // aggregate in one pass and require bit-identity (the oracle pins
    // this against DuckDB too — this is the Spark-internal third opinion)
    val full = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("v")).cast("double"), 2).as("sum_value"),
        min(col("d")).as("d_min"), max(col("d")).as("d_max"))
      .orderBy("user_id")
    SparkEntry.queries("agg_incremental")(spark, sf001).collect().toSeq shouldBe
      full.collect().toSeq
  }

  test("agg_corr: exact-sum correlation within 1e-6 of the built-in and in [-1, 1]") {
    val got = SparkEntry.queries("agg_corr")(spark, sf001).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("corr_qty_price"))
      .toMap
    got should not be empty
    val builtin = T.t(spark, sf001, "lineitem").groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("c")).toMap
    got.foreach { case (k, v) =>
      v should (be >= -1.0 and be <= 1.0)
      v shouldBe (builtin(k) +- 1e-6)
    }
  }

  test("agg_ols: least-squares laws vs the built-in regression aggregates") {
    val got = SparkEntry.queries("agg_ols")(spark, sf001).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
          r.getAs[Double]("r2")))).toMap
    got should not be empty
    val builtin = T.t(spark, sf001, "lineitem").groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("s"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("i"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r"),
        avg(col("l_quantity")).as("mx"), avg(col("l_extendedprice")).as("my"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Double]("s"), r.getAs[Double]("i"), r.getAs[Double]("r"),
          r.getAs[Double]("mx"), r.getAs[Double]("my")))).toMap
    got.foreach { case (k, (slope, icept, r2)) =>
      val (bs, bi, br, mx, my) = builtin(k)
      slope shouldBe (bs +- 1e-4)
      icept shouldBe (bi +- 1e-2) // intercept magnitude ~1e4: relative 1e-6
      r2 should (be >= 0.0 and be <= 1.0)
      r2 shouldBe (br +- 1e-6)
      // the fitted line passes through the centroid (x̄, ȳ)
      (slope * mx + icept) shouldBe (my +- 1.0)
    }
  }

  test("agg_anova: F recomputes from a driver-side brute force") {
    val r = SparkEntry.queries("agg_anova")(spark, sf001).collect()(0)
    val ys = T.t(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val k = ys.size; val n = ys.values.map(_.length).sum
    val m = ys.values.flatten.sum / n
    val ssb = ys.values.map(v => v.length * math.pow(v.sum / v.length - m, 2)).sum
    val ssw = ys.values.map(v => { val mg = v.sum / v.length
      v.map(y => (y - mg) * (y - mg)).sum }).sum
    r.getAs[Long]("k") shouldBe k.toLong
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Double]("ssb") shouldBe (ssb +- math.abs(ssb) * 1e-6)
    r.getAs[Double]("f") shouldBe
      ((ssb / (k - 1)) / (ssw / (n - k)) +- 1e-4)
  }

  test("agg_mwu: U and z recompute from a driver-side rank sum") {
    val r = SparkEntry.queries("agg_mwu")(spark, sf001).collect()(0)
    val rows = T.t(spark, sf001, "events")
      .where(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0) == "purchase", x.getDouble(1)))
    val sorted = rows.map(_._2).sorted
    // average rank per value (ties share the mean of their rank block)
    val avgRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.length) }
    val n1 = rows.count(_._1).toLong; val n2 = rows.size - n1; val nn = rows.size
    val r1 = rows.filter(_._1).map(x => avgRank(x._2)).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val tsum = rows.groupBy(_._2).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val z = (u1 - n1 * n2 / 2.0) /
      math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - tsum / (nn.toDouble * (nn - 1))))
    r.getAs[Long]("n1") shouldBe n1
    r.getAs[Long]("n2") shouldBe n2
    r.getAs[Double]("u1") shouldBe (u1 +- 0.051)
    r.getAs[Double]("z") shouldBe (z +- 1e-5)
  }

  test("ts_anomaly: every flagged day recomputes past the z threshold") {
    val rows = SparkEntry.queries("ts_anomaly")(spark, sf001).collect()
    rows should not be empty
    // recompute each type's daily series moments on the driver
    val daily = T.t(spark, sf001, "events")
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getAs[String](0), r.getAs[Long]("d"), r.getAs[Long]("x")))
    val byType = daily.groupBy(_._1)
    rows.foreach { r =>
      val (et, d, n, z) = (r.getAs[String]("event_type"), r.getAs[Long]("d"),
        r.getAs[Long]("n_events"), r.getAs[Double]("z"))
      math.abs(z) should be > 2.0
      val xs = byType(et).map(_._3)
      val (nd, sn, snn) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
      byType(et).find(t => t._2 == d).map(_._3) shouldBe Some(n)
      val zRef = (n * nd - sn).toDouble / math.sqrt((nd * snn - sn * sn).toDouble)
      z shouldBe (zRef +- 1e-6)
    }
    // and no unflagged day clears the threshold (completeness)
    val flagged = rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("d"))).toSet
    daily.foreach { case (et, d, x) =>
      val xs = byType(et).map(_._3)
      val (nd, sn, snn) = (xs.length.toLong, xs.sum, xs.map(v => v * v).sum)
      if (nd * snn - sn * sn > 0) {
        val z = math.rint((x * nd - sn).toDouble /
          math.sqrt((nd * snn - sn * sn).toDouble) * 1e6) / 1e6
        withClue(s"$et day $d z=$z: ") {
          (math.abs(z) > 2.0) shouldBe flagged((et, d))
        }
      }
    }
  }

  test("win_distribution: cume_dist is the exact empirical CDF per segment") {
    val rows = SparkEntry.queries("win_distribution")(spark, sf001).collect()
    rows should not be empty
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, seg) =>
      val n = seg.length.toDouble
      // sorted by (acctbal, custkey): row i (1-based) has cd = i/n exactly
      // (to the declared 6-dp rounding), and third_name starts at row 3
      seg.zipWithIndex.foreach { case (r, i) =>
        r.getAs[Double]("cd") shouldBe
          (math.rint((i + 1) / n * 1e6) / 1e6 +- 1e-9)
        // the running frame sees no 3rd row before index 2; from there on
        // the value is the constant 3rd-row name for the whole segment
        if (i < 2) r.getAs[String]("third_name") shouldBe null
        else {
          r.getAs[String]("third_name") should not be null
          r.getAs[String]("third_name") shouldBe seg(2).getAs[String]("third_name")
        }
      }
    }
  }

  test("join_fuzzy: blocking is effective and close counts match a brute force") {
    val p = T.t(spark, sf001, "part")
      .select("p_partkey", "p_brand", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def noun(s: String) = s.substring(s.lastIndexOf(' ') + 1)
    val brute = p.flatMap { case (k1, br1, n1) => p.collect {
      case (k2, br2, n2) if k1 < k2 && br1 == br2 && noun(n1) == noun(n2) =>
        ((br1, noun(n1)), if (lev(n1, n2) <= 3) 1L else 0L)
    } }.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val got = SparkEntry.queries("join_fuzzy")(spark, sf001).collect()
      .map(r => ((r.getAs[String]("p_brand"), r.getAs[String]("noun")),
        (r.getAs[Long]("n_cand"), r.getAs[Long]("n_close")))).toMap
    got shouldBe brute
    // blocking must prune: candidate pairs well under the all-pairs count
    val allPairs = p.length.toLong * (p.length - 1) / 2
    got.values.map(_._1).sum should be < allPairs / 5
  }

  test("events_ngrams: trigram counts are bounded by their markov pair margins") {
    // each (t1,t2,t3) journey contains the (t1,t2) transition, so no
    // trigram can outnumber its first-order margin — a cross-query
    // consistency check between the two sequence views
    val pairs = SparkEntry.queries("events_markov")(spark, sf001).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n")).toMap
    val tri = SparkEntry.queries("events_ngrams")(spark, sf001).collect()
    tri should not be empty
    tri.length should be <= 20
    tri.foreach { r =>
      val n = r.getAs[Long]("n")
      n should be <= pairs((r.getAs[String]("t1"), r.getAs[String]("t2")))
      n should be <= pairs((r.getAs[String]("t2"), r.getAs[String]("t3")))
    }
    // and the list arrives count-descending
    tri.map(_.getAs[Long]("n")).toSeq shouldBe
      tri.map(_.getAs[Long]("n")).toSeq.sorted.reverse
  }

  test("ts_zscore equals a driver-side brute-force recompute") {
    val rows = SparkEntry.queries("ts_zscore")(spark, sf001).collect()
    rows should not be empty
    // brute force: densify each user's series and score trailing 7-day
    // frames with exact arithmetic on the 2-dp values
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, seq) =>
      val days = seq.map(_.getAs[Long]("d"))
      days.toSeq shouldBe (days.min to days.max).toSeq // dense grid
      val vals = seq.map(_.getAs[Double]("sum_value"))
      seq.zipWithIndex.foreach { case (r, i) =>
        val frame = vals.slice(math.max(0, i - 6), i + 1)
        val n = frame.length
        val s1 = frame.map(v => math.rint(v * 100).toLong).sum / 100.0
        val s2 = frame.map(v => math.rint(v * 100).toLong)
          .map(c => c * c).sum / 10000.0
        val vr = if (n >= 2) (s2 - s1 * s1 / n) / (n - 1) else Double.NaN
        val zGot = Option(r.getAs[java.lang.Double]("z"))
        if (n >= 3 && vr > 0) {
          val want = math.rint((r.getAs[Double]("sum_value") - s1 / n) /
            math.sqrt(vr) * 1e6) / 1e6
          zGot.map(_.doubleValue()) shouldBe Some(want)
          r.getAs[Boolean]("anomaly") shouldBe (math.abs(want) > 2.0)
        } else {
          zGot shouldBe None
          r.getAs[Boolean]("anomaly") shouldBe false
        }
      }
    }
    // the 2σ gate must actually fire somewhere on the corpus
    rows.count(_.getAs[Boolean]("anomaly")) should be > 0
  }

  test("win_streak equals a driver-side streak recompute") {
    val got = SparkEntry.queries("win_streak")(spark, sf001).collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_streaks"),
        r.getAs[Long]("longest"), r.getAs[Long]("active_days")))).toMap
    got should not be empty
    val days = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).sorted.toSeq }
    got.keySet shouldBe days.keySet
    days.foreach { case (u, ds) =>
      // split the sorted day list into runs of consecutive days
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if d == h.head + 1 => (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }
      got(u) shouldBe ((runs.length.toLong,
        runs.map(_.length).max.toLong, ds.length.toLong))
    }
  }

  test("events_attribution equals a driver-side last-touch recompute") {
    val got = SparkEntry.queries("events_attribution")(spark, sf001).collect()
      .map(r => r.getAs[String]("touch_type") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value"))))
      .toMap
    got.keySet shouldBe Set("view", "click")
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val acc = collection.mutable.Map.empty[String, (Long, Long)] // n, cents
    ev.groupBy(_._1).values.foreach { rows =>
      var lastTouch: Option[(String, Long)] = None
      rows.sortBy(r => (r._3, r._2)).foreach { case (_, _, us, t, v) =>
        if (t == "purchase") lastTouch.foreach { case (tt, tus) =>
          if (us - tus <= 7L * 86400000000L) {
            val (n, c) = acc.getOrElse(tt, (0L, 0L))
            acc(tt) = (n + 1, c + math.rint(v * 100).toLong)
          }
        }
        if (t == "view" || t == "click") lastTouch = Some((t, us))
      }
    }
    acc.foreach { case (tt, (n, cents)) =>
      got(tt) shouldBe ((n, cents / 100.0))
    }
  }

  test("events_path equals a driver-side session-path recompute") {
    val got = SparkEntry.queries("events_path")(spark, sf001).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n"))).toSeq
    got should not be empty
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var sess = List.empty[List[String]]
      var lastUs = Long.MinValue
      ordered.foreach { case (_, _, us, t) =>
        if (sess.isEmpty || us - lastUs >= 1800000000L) sess ::= List(t)
        else sess = (t :: sess.head) :: sess.tail
        lastUs = us
      }
      sess.foreach { s =>
        val p = s.reverse.take(3).mkString(">")
        paths(p) = paths.getOrElse(p, 0L) + 1
      }
    }
    val want = paths.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    got shouldBe want
  }

  test("agg_ratio: shares within each status sum to one") {
    val rows = SparkEntry.queries("agg_ratio")(spark, sf001).collect()
    rows should not be empty
    rows.groupBy(_.getAs[String]("status")).foreach { case (_, rs) =>
      rs.map(_.getAs[Double]("share")).sum shouldBe 1.0 +- 1e-5
      rs.foreach(_.getAs[Double]("share") should be > 0.0)
    }
  }

  test("agg_distinct_multi equals separately computed distinct counts") {
    val rows = SparkEntry.queries("agg_distinct_multi")(spark, sf001).collect()
    rows should not be empty
    val li = T.t(spark, sf001, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_suppkey").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      val mine = li.filter(_._1 == f)
      r.getAs[Long]("n_orders") shouldBe mine.map(_._2).distinct.length.toLong
      r.getAs[Long]("n_supps") shouldBe mine.map(_._3).distinct.length.toLong
      r.getAs[Long]("n_rows") shouldBe mine.length.toLong
    }
  }

  test("agg_mad equals a driver-side interpolated-median recompute") {
    def medInterp(sorted: Array[Double]): Double = {
      val pos = 0.5 * (sorted.length - 1)
      val lo = pos.toInt
      if (lo + 1 < sorted.length)
        sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
      else sorted(lo)
    }
    val rows = SparkEntry.queries("agg_mad")(spark, sf001).collect()
    rows should not be empty
    val byStatus = T.t(spark, sf001, "orders")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    rows.foreach { r =>
      val vals = byStatus(r.getAs[String]("o_orderstatus")).map(_._2)
      val med = medInterp(vals.sorted)
      val mad = medInterp(vals.map(v => math.abs(v - med)).sorted)
      r.getAs[Long]("n") shouldBe vals.length.toLong
      r.getAs[Double]("med") shouldBe med +- 1e-6
      r.getAs[Double]("mad") shouldBe mad +- 1e-6
    }
  }

  test("join_agg_semi equals a driver-side HAVING recompute") {
    val got = SparkEntry.queries("join_agg_semi")(spark, sf001).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("c_custkey"), r.getAs[Double]("total_qty"))))
      .toMap
    got should not be empty
    val sums = T.t(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 100).toLong))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val custOf = T.t(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = sums.filter(_._2 > 30000)
      .map { case (ok, cents) => ok -> ((custOf(ok), cents / 100.0)) }
    got shouldBe want
  }

  test("multiset set ops: per-key counts are exact bag difference / intersection") {
    def hist(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.get(0).asInstanceOf[Number].longValue)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c = hist(T.t(spark, sf001, "customer").select("c_nationkey").collect())
    val s = hist(T.t(spark, sf001, "supplier").select("s_nationkey").collect())
    val exc = hist(SparkEntry.queries("set_except_all")(spark, sf001).collect())
    val int = hist(SparkEntry.queries("set_intersect_all")(spark, sf001).collect())
    (c.keySet ++ s.keySet).foreach { k =>
      val (nc, ns) = (c.getOrElse(k, 0L), s.getOrElse(k, 0L))
      exc.getOrElse(k, 0L) shouldBe math.max(0L, nc - ns)
      int.getOrElse(k, 0L) shouldBe math.min(nc, ns)
    }
  }

  test("subquery_scalar equals a driver-side correlated-max recompute") {
    val got = SparkEntry.queries("subquery_scalar")(spark, sf001).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        Option(r.getAs[java.lang.Double]("max_price")).map(_.doubleValue()))
      .toMap
    val maxes = T.t(spark, sf001, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) =>
        k -> math.rint(vs.map(_._2).max * 100) / 100.0 }
    val custs = T.t(spark, sf001, "customer").select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    got.keySet shouldBe custs
    custs.foreach { ck => got(ck) shouldBe maxes.get(ck) }
  }

  test("filter_pipeline equals a driver-side cascade recompute") {
    val got = SparkEntry.queries("filter_pipeline")(spark, sf001).collect()
      .map(r => r.getAs[String]("reason") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars")))).toMap
    val markers = Set("the", "a", "order", "data")
    val acc = collection.mutable.Map.empty[String, (Long, Long)]
    T.t(spark, sf001, "documents").select("text", "n_chars").collect()
      .foreach { r =>
        val (text, nChars) = (r.getString(0), r.getLong(1))
        val tk = text.split(" ", -1)
        val stopR = tk.count(markers) .toDouble / math.max(tk.length, 1)
        val distR = tk.distinct.length.toDouble / math.max(tk.length, 1)
        val reason =
          if (nChars < 100) "too_short"
          else if (tk.length < 20) "too_few_tokens"
          else if (stopR < 0.05) "low_stopword"
          else if (distR < 0.30) "repetitive"
          else "kept"
        val (n, c) = acc.getOrElse(reason, (0L, 0L))
        acc(reason) = (n + 1, c + nChars)
      }
    got shouldBe acc.toMap
    // the cascade must actually discriminate on the corpus
    got.keySet.size should be >= 4
    got.keySet should contain ("kept")
  }

  test("events_rfm equals a driver-side quartile recompute") {
    def pctl(sorted: Array[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo + 1 < sorted.length)
        sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
      else sorted(lo)
    }
    val got = SparkEntry.queries("events_rfm")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("r_q"), r.getAs[Long]("f_q"),
        r.getAs[Long]("m_q")) -> r.getAs[Long]("n_users")).toMap
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val dmax = ev.map(_._2).max
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val p = rows.filter(_._3 == "purchase")
      (u, (dmax - rows.map(_._2).max).toDouble, p.length.toDouble,
        p.map(r => math.rint(r._4 * 100).toLong).sum / 100.0)
    }.toArray
    def qs(vs: Array[Double]) = {
      val s = vs.sorted
      (pctl(s, 0.25), pctl(s, 0.5), pctl(s, 0.75))
    }
    val (rq, fq, mq) = (qs(users.map(_._2)), qs(users.map(_._3)),
      qs(users.map(_._4)))
    def bucket(v: Double, q: (Double, Double, Double)): Long =
      1L + (if (v > q._1) 1 else 0) + (if (v > q._2) 1 else 0) +
        (if (v > q._3) 1 else 0)
    val want = users.groupBy { case (_, r, f, m) =>
      (bucket(r, rq), bucket(f, fq), bucket(m, mq)) }
      .map { case (k, us) => k -> us.length.toLong }
    got shouldBe want
    got.values.sum shouldBe users.length.toLong
  }

  test("ts_ohlc equals a driver-side resample recompute") {
    val got = SparkEntry.queries("ts_ohlc")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("wk")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Double]("vsum")))).toMap
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(r => (r._1, r._3 / 604800000000L)).map {
      case (k, rows) =>
        val ordered = rows.sortBy(r => (r._3, r._2))
        val vs = rows.map(_._4)
        k -> ((rows.length.toLong,
          math.rint(ordered.head._4 * 100) / 100.0,
          math.rint(vs.max * 100) / 100.0,
          math.rint(vs.min * 100) / 100.0,
          math.rint(ordered.last._4 * 100) / 100.0,
          rows.map(r => math.rint(r._4 * 100).toLong).sum / 100.0))
    }
    got shouldBe want
  }

  test("ts_interpolate equals a driver-side interpolation recompute") {
    val got = SparkEntry.queries("ts_interpolate")(spark, sf001).collect()
    got should not be empty
    got.map(_.getAs[String]("src")).toSet shouldBe
      Set("obs", "interp") // sf0.001 has no leading/trailing gaps
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val daily = ev.groupBy(r => (r._1, r._2)).map { case (k, rows) =>
      k -> rows.map(r => math.rint(r._3 * 100).toLong).sum / 100.0 }
    got.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      val days = rows.map(_.getAs[Long]("d"))
      days.toSeq shouldBe (days.min to days.max).toSeq
      val obsDays = days.filter(d => daily.contains((u, d))).sorted
      rows.foreach { r =>
        val d = r.getAs[Long]("d")
        val vi = r.getAs[Double]("v_interp")
        daily.get((u, d)) match {
          case Some(v) =>
            r.getAs[String]("src") shouldBe "obs"
            vi shouldBe v
          case None =>
            r.getAs[String]("src") shouldBe "interp"
            val pd = obsDays.filter(_ < d).max
            val nd = obsDays.filter(_ > d).min
            val (pv, nv) = (daily((u, pd)), daily((u, nd)))
            val want = math.rint(
              (pv + (nv - pv) * (d - pd) / (nd - pd).toDouble) * 1e6) / 1e6
            vi shouldBe want +- 1e-6
        }
      }
    }
  }

  test("events_entropy equals the exact-count entropy formula") {
    val got = SparkEntry.queries("events_entropy")(spark, sf001).collect()
    got should not be empty
    val counts = T.t(spark, sf001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.groupBy(_._2).map(_._2.length.toLong).toArray }
    got.foreach { r =>
      val cs = counts(r.getAs[Long]("user_id"))
      val n = cs.sum.toDouble
      r.getAs[Long]("n_events") shouldBe cs.sum
      r.getAs[Long]("n_types") shouldBe cs.length.toLong
      val h = math.log(n) / math.log(2) -
        cs.map(c => c * math.log(c.toDouble) / math.log(2)).sum / n
      r.getAs[Double]("entropy") shouldBe h +- 1e-5
      r.getAs[Double]("entropy") should be <=
        math.log(cs.length.toDouble) / math.log(2) + 1e-9
      r.getAs[Double]("entropy") should be >= 0.0
    }
  }

  test("ts_cum_users: running total is monotone and lands on the user count") {
    val rows = SparkEntry.queries("ts_cum_users")(spark, sf001).collect()
    rows should not be empty
    val cums = rows.map(_.getAs[Long]("cum_users"))
    cums.toSeq shouldBe cums.sorted
    rows.map(_.getAs[Long]("new_users")).sum shouldBe cums.last
    cums.last shouldBe
      T.t(spark, sf001, "events").select("user_id").distinct().count()
    // prefix-sum law: cum(i) = cum(i-1) + new(i)
    rows.sliding(2).foreach {
      case Array(a, b) => b.getAs[Long]("cum_users") shouldBe
        a.getAs[Long]("cum_users") + b.getAs[Long]("new_users")
      case _ =>
    }
  }

  test("ts_rolling_median equals a driver-side frame-median recompute") {
    def medInterp7(frame: Seq[Double]): Double = {
      val s = frame.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      val m = if (lo + 1 < s.length) s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
              else s(lo)
      math.rint(m * 1e6) / 1e6
    }
    val med = SparkEntry.queries("ts_rolling_median")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("d")) ->
        r.getAs[Double]("med7")).toMap
    med should not be empty
    val grid = SparkEntry.queries("ts_fill_gaps")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("d"),
        r.getAs[Double]("sum_value")))
    grid.groupBy(_._1).foreach { case (u, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, d, _), i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._3).toSeq
        med((u, d)) shouldBe medInterp7(frame) +- 1e-6
      }
    }
  }

  test("text_top_tokens: ranks are dense, counts ordered, tiebreak lexicographic") {
    val rows = SparkEntry.queries("text_top_tokens")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"),
        r.getAs[String]("tk"), r.getAs[Long]("c")))
    rows should not be empty
    val docs = T.t(spark, sf001, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._2)
      byRank.map(_._2).toSeq shouldBe (1L to byRank.length)
      // counts non-increasing; equal counts must be token-ascending
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          a._4 should be >= b._4
          if (a._4 == b._4) a._3 should be < b._3
        case _ =>
      }
      // each (token, count) matches the raw text's occurrence count
      val counts = docs(doc).split(" ", -1).groupBy(identity)
        .map { case (t, o) => t -> o.length.toLong }
      byRank.foreach { case (_, _, tk, c) => counts(tk) shouldBe c }
      // rank-1 token really is a modal token of the doc
      byRank.head._4 shouldBe counts.values.max
    }
  }

  test("events_dau_wau equals a driver-side window recompute") {
    val got = SparkEntry.queries("events_dau_wau")(spark, sf001).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("dau"),
        r.getAs[Long]("wau"), r.getAs[Double]("stickiness")))).toMap
    got should not be empty
    val ud = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byDay = ud.groupBy(_._2)
    byDay.foreach { case (d, rows) =>
      val dau = rows.length.toLong
      val wau = ud.filter { case (_, da) => da >= d - 6 && da <= d }
        .map(_._1).distinct.length.toLong
      got(d) shouldBe ((dau, wau, math.rint(dau.toDouble / wau * 1e6) / 1e6))
      wau should be >= dau
    }
    got.keySet shouldBe byDay.keySet
  }

  test("join_asof_near picks the closer signup with earlier-wins ties") {
    val got = SparkEntry.queries("join_asof_near")(spark, sf001).collect()
      .map(r => r.getAs[Long]("p_id") ->
        ((r.getAs[Long]("signup_us"), r.getAs[Long]("delta_us")))).toMap
    got should not be empty
    val ev = T.t(spark, sf001, "events")
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._2)
    val want = collection.mutable.Map.empty[Long, (Long, Long)]
    byUser.values.foreach { rows =>
      val signups = rows.filter(_._4 == "signup").map(_._3).sorted
      rows.filter(_._4 == "purchase").foreach { case (pid, _, us, _) =>
        val back = signups.filter(_ <= us).lastOption
        val fwd = signups.filter(_ >= us).headOption
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) => Some(if (us - b <= f - us) b else f)
          case (b, f) => b.orElse(f)
        }
        pick.foreach(su => want(pid) = (su, su - us))
      }
    }
    got shouldBe want.toMap
  }

  test("text_tfidf: the reported token maximizes the smoothed tf-idf score") {
    val rows = SparkEntry.queries("text_tfidf")(spark, sf001).collect()
    rows should not be empty
    val docs = T.t(spark, sf001, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = docs.size
    val tfAll = docs.map { case (id, text) =>
      id -> text.split(" ", -1).groupBy(identity)
        .map { case (t, o) => t -> o.length.toLong } }
    val df = tfAll.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    rows.length shouldBe n // exactly one keyword per doc
    rows.foreach { r =>
      val (doc, tk) = (r.getAs[Long]("doc_id"), r.getAs[String]("tk"))
      val tf = tfAll(doc)
      r.getAs[Long]("tf") shouldBe tf(tk)
      r.getAs[Long]("df") shouldBe df(tk)
      def score(t: String) = tf(t) * math.log((n + 1.0) / (df(t) + 1.0))
      r.getAs[Double]("score") shouldBe score(tk) +- 1e-6
      // argmax with score-desc, token-asc tiebreak
      val best = tf.keys.minBy(t => (-score(t), t))
      tk shouldBe best
    }
  }

  test("agg_listagg: delimited sets are sorted and equal the distinct values") {
    val rows = SparkEntry.queries("agg_listagg")(spark, sf001).collect()
    rows should not be empty
    val want = T.t(spark, sf001, "orders")
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
    rows.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      val got = r.getAs[String]("statuses").split(",").toSeq
      got shouldBe got.sorted
      got.toSet shouldBe want(p).map(_._2).toSet
      r.getAs[Long]("n") shouldBe want(p).length.toLong
    }
  }

  test("ts_monthly: calendar months partition the orders and sums are exact") {
    val rows = SparkEntry.queries("ts_monthly")(spark, sf001).collect()
    rows should not be empty
    val orders = T.t(spark, sf001, "orders")
      .select(col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    rows.map(_.getAs[Long]("n")).sum shouldBe orders.length.toLong
    rows.foreach { r =>
      val m = r.getAs[java.sql.Date]("m").toString // yyyy-mm-01
      m.endsWith("-01") shouldBe true
      val mine = orders.filter(_._1.substring(0, 7) == m.substring(0, 7))
      r.getAs[Long]("n") shouldBe mine.length.toLong
      r.getAs[Double]("revenue") shouldBe
        mine.map(o => math.rint(o._2 * 100).toLong).sum / 100.0
    }
  }

  test("events_cooccur equals a driver-side session-pair recompute") {
    val got = SparkEntry.queries("events_cooccur")(spark, sf001).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) ->
        r.getAs[Long]("n")).toMap
    got should not be empty
    got.keys.foreach { case (t1, t2) => t1 should be < t2 }
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var sess = List.empty[Set[String]]
      var lastUs = Long.MinValue
      ordered.foreach { case (_, _, us, t) =>
        if (sess.isEmpty || us - lastUs >= 1800000000L) sess ::= Set(t)
        else sess = (sess.head + t) :: sess.tail
        lastUs = us
      }
      sess.foreach { types =>
        types.toSeq.sorted.combinations(2).foreach { case Seq(a, b) =>
          pairs((a, b)) = pairs.getOrElse((a, b), 0L) + 1
        }
      }
    }
    got shouldBe pairs.toMap
  }

  test("ts_ewma equals a driver-side exact-cents recompute") {
    val got = SparkEntry.queries("ts_ewma")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("ewma")).toMap
    got should not be empty
    val daily = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((u, d), rows) =>
        (u, d) -> math.rint(rows.map(r =>
          BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble * 100).toLong }
    val want = daily.keys.groupBy(_._1).flatMap { case (u, ks) =>
      val lo = ks.map(_._2).min; val hi = ks.map(_._2).max
      (lo to hi).map { d =>
        val frame = (math.max(lo, d - 7) to d)
          .map(k => daily.getOrElse((u, k), 0L))
        val m = frame.length
        val num = frame.reverse.zipWithIndex
          .map { case (v, k) => v * math.pow(0.5, k) }.sum
        (u, d) -> BigDecimal(num / (2.0 - math.pow(0.5, m - 1)) / 100.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) => v shouldBe want(k) }
  }

  test("ts_seasonality: slots partition the user-days and events total") {
    val rows = SparkEntry.queries("ts_seasonality")(spark, sf001).collect()
    rows should not be empty
    rows.map(_.getAs[Long]("dow")).toSet.subsetOf((0L to 6L).toSet) shouldBe true
    val e = T.t(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.map(_.getAs[Long]("n_events")).sum shouldBe e.length.toLong
    rows.map(_.getAs[Long]("user_days")).sum shouldBe e.distinct.length.toLong
    val wantByDow = e.groupBy(_._2 % 7)
    rows.foreach { r =>
      r.getAs[Long]("n_events") shouldBe
        wantByDow(r.getAs[Long]("dow")).length.toLong
    }
  }

  test("events_pareto: deciles partition users and shares are ordered") {
    val rows = SparkEntry.queries("events_pareto")(spark, sf001).collect()
    rows should not be empty
    val e = T.t(spark, sf001, "events")
    rows.map(_.getAs[Long]("n_users")).sum shouldBe
      e.select("user_id").distinct().count()
    rows.map(_.getAs[Long]("n_events")).sum shouldBe e.count()
    rows.foreach(r => r.getAs[Long]("decile") should (be >= 1L and be <= 10L))
    // threshold bucketing orders buckets by event-count range, so the
    // per-user mean volume is strictly increasing with decile
    val avg = rows.sortBy(_.getAs[Long]("decile")).map(r =>
      r.getAs[Long]("n_events").toDouble / r.getAs[Long]("n_users"))
    avg.zip(avg.tail).foreach { case (a, b) => b should be > a }
    math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) should be < 1e-4
  }

  test("events_session_stats equals a driver-side session recompute") {
    val got = SparkEntry.queries("events_session_stats")(spark, sf001)
      .collect().map(r => r.getAs[Long]("len") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Double]("avg_dur_us"),
         r.getAs[Long]("max_dur_us"))).toMap
    got should not be empty
    val ev = T.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var cur = collection.mutable.ArrayBuffer.empty[Long]
      var lastUs = Long.MinValue
      ordered.foreach { case (_, _, us) =>
        if (cur.nonEmpty && us - lastUs >= 1800000000L) {
          sessions += ((cur.length.toLong, cur.max - cur.min)); cur.clear()
        }
        cur += us; lastUs = us
      }
      if (cur.nonEmpty) sessions += ((cur.length.toLong, cur.max - cur.min))
    }
    val want = sessions.groupBy(_._1).map { case (len, ss) =>
      len -> (ss.length.toLong,
        BigDecimal(ss.map(_._2).sum.toDouble / ss.length)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ss.map(_._2).max)
    }
    got shouldBe want
  }

  test("agg_ttest equals a driver-side Welch recompute") {
    val rows = SparkEntry.queries("agg_ttest")(spark, sf001).collect()
    rows should not be empty
    val o = T.t(spark, sf001, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.rint(r.getDouble(1) * 100).toLong))
    rows.map(_.getAs[Long]("n")).sum shouldBe o.length.toLong
    val by = o.groupBy(_._1)
    val (tn, tsv, tsq) = (o.length.toLong,
      o.map(x => BigInt(x._2)).sum, o.map(x => BigInt(x._2) * x._2).sum)
    rows.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      val cs = by(p).map(_._2)
      val n = cs.length.toLong
      val sv = cs.map(BigInt(_)).sum; val sq = cs.map(c => BigInt(c) * c).sum
      val mu = sv.toDouble / n; val ex2 = sq.toDouble / n
      val nc = tn - n
      val muc = (tsv - sv).toDouble / nc; val ex2c = (tsq - sq).toDouble / nc
      val t = (mu - muc) / math.sqrt(
        (ex2 - mu * mu) * n / (n - 1) / n + (ex2c - muc * muc) * nc / (nc - 1) / nc)
      r.getAs[Long]("n") shouldBe n
      r.getAs[Double]("t") shouldBe
        BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  test("events_itemsets: itemset supports equal SQL-computed basket counts") {
    val rows = SparkEntry.queries("events_itemsets")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows should not be empty
    // ground truth: per-user distinct-type baskets recomputed directly
    val baskets = T.t(spark, sf001, "events")
      .groupBy("user_id").agg(collect_set(col("event_type")).as("s"))
      .collect().map(_.getSeq[String](1).toSet)
    val n = baskets.length
    rows.foreach { case (itemset, freq) =>
      val items = itemset.split(",").toSet
      freq shouldBe baskets.count(b => items.subsetOf(b)).toLong
      freq.toDouble should be >= 0.2 * n // declared minSupport
    }
    // completeness at size 1: every type over threshold is reported
    val types = baskets.flatten.toSet
    types.filter(t => baskets.count(_.contains(t)) >= 0.2 * n)
      .foreach(t => rows should contain key t)
  }

  test("events_prefixspan: single-step supports match and support is anti-monotone") {
    val rows = SparkEntry.queries("events_prefixspan")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows should not be empty
    val baskets = T.t(spark, sf001, "events")
      .groupBy("user_id").agg(collect_set(col("event_type")).as("s"))
      .collect().map(_.getSeq[String](1).toSet)
    // a 1-step pattern <t> is supported by exactly the users that ever
    // emit t (sequence order is irrelevant at length 1)
    rows.filterNot(_._1.contains(">")).foreach { case (t, freq) =>
      freq shouldBe baskets.count(_.contains(t)).toLong
    }
    // anti-monotone law: extending a pattern can never raise its support
    rows.filter(_._1.contains(">")).foreach { case (p, freq) =>
      val prefix = p.split(">").dropRight(1).mkString(">")
      freq should be <= rows(prefix)
    }
  }

  test("agg_hist: bins partition the rows and bounds sit inside their bin") {
    val rows = SparkEntry.queries("agg_hist")(spark, sf001).collect()
    rows should not be empty
    val total = T.t(spark, sf001, "orders").count()
    rows.map(_.getAs[Long]("n")).sum shouldBe total
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      r.getAs[Double]("lo") should be >= bin * 50000.0
      r.getAs[Double]("hi") should be < (bin + 1) * 50000.0
      r.getAs[Double]("lo") should be <= r.getAs[Double]("hi")
    }
  }

  test("events_survival is a valid Kaplan-Meier curve") {
    val rows = SparkEntry.queries("events_survival")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows should not be empty
    // event times ascend, the risk set telescopes (every listed time has
    // >= 1 conversion, so strictly fewer remain at risk), survival falls
    rows.sliding(2).foreach {
      case Array((t1, n1, _, s1), (t2, n2, _, s2)) =>
        t2 should be > t1; n2 should be < n1; s2 should be < s1
      case _ =>
    }
    rows.foreach { case (t, n, d, s) =>
      t should (be >= 0L and be <= 48L)
      d should be >= 1L; d should be <= n
      s should be >= 0.0; s should be <= 1.0
    }
    // the survival column IS the running product of (1 - d/n) — recompute
    // it on the driver from the query's own risk/conversion columns
    var p = 1.0
    rows.foreach { case (t, n, d, s) =>
      p *= 1.0 - d.toDouble / n
      withClue(s"t=$t: ") { s shouldBe p +- 5.1e-7 }
    }
    // never-converters are right-censored at 48 h, NOT dropped (r12 fix):
    // every distinct user is at risk at the first listed event time, and
    // users without any purchase record still shrink later risk sets only
    // at the 48 h censoring boundary
    val allUsers = T.t(spark, sf001, "events")
      .select("user_id").distinct().count()
    rows.head._2 shouldBe allUsers
  }

  test("events_pattern: matches recompute from a driver regex over sorted histories") {
    val out = SparkEntry.queries("events_pattern")(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue)).toMap
    // independent: collect raw events, sort per user by (us, event_id),
    // count non-overlapping 'vc*p' matches with a hand Matcher loop
    val hist = T.t(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).map { case (u, g) =>
        u -> g.sortBy(e => (e._2, e._3)).map(_._4.head).mkString
      }
    val ref = hist.flatMap { case (u, seq) =>
      val m = java.util.regex.Pattern.compile("vc*p").matcher(seq)
      var k = 0L
      while (m.find()) k += 1
      if (k >= 1) Some(u -> ((seq.length.toLong, k))) else None
    }.toMap
    out shouldBe ref
    out should not be empty
    // at least one match used the c* arm somewhere (else the pattern
    // asserts only adjacency): total funnels exceed strict 'vp' count
    val strict = hist.values.map { seq =>
      val m = java.util.regex.Pattern.compile("vp").matcher(seq)
      var k = 0L; while (m.find()) k += 1; k
    }.sum
    withClue(s"vc*p total vs vp total: ") {
      out.values.map(_._2).sum should be >= strict
    }
  }
}
