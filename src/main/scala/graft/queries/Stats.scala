package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.T.{Q, t}

/** §2.4 statistical-inference extensions (round 12, second batch): rank
  * correlation, the k-group rank test, categorical effect size, and
  * information-theoretic dependence — the four measures a feature-screening
  * pass over training data reaches for right after the chi-square / ANOVA /
  * MWU family this library already declares.
  *
  * Shared float discipline (the agg_corr / agg_mwu precedent): every
  * sufficient statistic that crosses a shuffle is an EXACT integer or
  * DECIMAL sum — order-independent under any partitioning — and the final
  * statistic is ONE identical double chain evaluated once on both engines.
  * Rank-based statistics ride DOUBLED tie-average ranks (2·rank is always
  * an exact BIGINT: 2·cumBefore + t + 1), so rank sums stay in the exact
  * integer domain at any realistic SF and the 2× cancels inside the
  * scale-invariant correlation / is algebraically folded into the
  * Kruskal–Wallis constant (12/4 = 3).
  */
object Stats {

  private val DayUs = 86400000000L

  /** The four lineitem measures of the multivariate tier (output name →
    * source column); values carry ≤ 2dp, so ×100 integer scaling is exact. */
  private val covCols = Seq("quantity" -> "l_quantity",
    "extendedprice" -> "l_extendedprice", "discount" -> "l_discount",
    "tax" -> "l_tax")

  /** The one-pass d² moment block shared by agg_cov_matrix and ml_pca:
    * count + 4 sums + 10 cross-product sums of the ×100-scaled exact
    * integers, every statistic an order-independent DECIMAL(38,0) sum
    * (per-row products peak ~1.1e14, past BIGINT's sf1 sum headroom). */
  private def covStatsFrame(s: org.apache.spark.sql.SparkSession,
      sf: String): org.apache.spark.sql.DataFrame = {
    val d38 = DecimalType(38, 0)
    val scaled = t(s, sf, "lineitem").select(
      covCols.map { case (n, c) =>
        expr(s"CAST(rint($c * 100) AS BIGINT)").as(n) }: _*)
    val sums = covCols.map { case (n, _) => sum(col(n).cast(d38)).as(s"s_$n") }
    val crosses = for {
      (i, (x, _)) <- covCols.zipWithIndex.map(_.swap)
      (j, (y, _)) <- covCols.zipWithIndex.map(_.swap) if i <= j
    } yield sum((col(x) * col(y)).cast(d38)).as(s"p_${x}_$y")
    scaled.agg(count(lit(1)).as("n"), (sums ++ crosses): _*)
  }

  val queries: Map[String, Q] = Map(
    // Spearman rank correlation per group (quantity vs discount by return
    // flag) — the monotonic-dependence screen Pearson (agg_corr) can't
    // give: ρ = Pearson over tie-average ranks. The corpus collapses to
    // the distinct (flag, qty, disc) VALUE-PAIR table in ONE map-side-
    // combined agg (bounded by the 50×11 value domain per group, never the
    // corpus); per-column rank tables derive FROM that compact frame
    // (grouping it again, no second corpus pass), ranks come from one
    // window each over the ≤50-row per-group domains, and the weighted
    // Pearson runs over doubled ranks so every shuffled sum is exact
    // DECIMAL (c·rx2·ry2 outgrows BIGINT near sf1 — the cast is the scale
    // fix, not decoration). Numerators/variances are exact integer
    // differences cast to double once; Spearman is scale-invariant so the
    // rank doubling cancels identically on both engines.
    "agg_spearman" -> ((s, sf) => {
      val pairs = t(s, sf, "lineitem")
        .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("x"),
          col("l_discount").as("y"))
        .agg(count(lit(1)).as("c"))
      val wx = Window.partitionBy("g").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
      val rx = pairs.groupBy("g", "x").agg(sum(col("c")).as("tx"))
        .withColumn("rx2", lit(2L) * coalesce(sum(col("tx")).over(wx), lit(0L))
          + col("tx") + 1)
      val wy = Window.partitionBy("g").orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ry = pairs.groupBy("g", "y").agg(sum(col("c")).as("ty"))
        .withColumn("ry2", lit(2L) * coalesce(sum(col("ty")).over(wy), lit(0L))
          + col("ty") + 1)
      val d38 = DecimalType(38, 0)
      pairs.join(rx.select("g", "x", "rx2"), Seq("g", "x"))
        .join(ry.select("g", "y", "ry2"), Seq("g", "y"))
        .groupBy("g")
        .agg(sum(col("c")).as("n"),
          sum((col("c").cast(d38) * col("rx2"))).as("sx"),
          sum((col("c").cast(d38) * col("ry2"))).as("sy"),
          sum((col("c").cast(d38) * col("rx2") * col("rx2"))).as("sxx"),
          sum((col("c").cast(d38) * col("ry2") * col("ry2"))).as("syy"),
          sum((col("c").cast(d38) * col("rx2") * col("ry2"))).as("sxy"))
        .select(col("g").as("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
            6).as("rho"))
        .orderBy("l_returnflag")
    }),

    // Kruskal–Wallis H across ALL event types over value — agg_mwu's
    // k-group generalization (the nonparametric ANOVA): the corpus
    // collapses to the per-(value, type) count table in one agg (bounded
    // by the 2dp value domain × k), the global tie-average rank rides one
    // window over the per-value rollup OF that frame, and the per-group
    // rank sums R_j are exact DECIMAL sums of c·(2·avgRank) — so the only
    // float arithmetic is the k-term Σ R_j²/n_j finish and the published
    // tie correction C = 1 − Σ(t³−t)/(N³−N), each ONE identical chain
    // over exact operands (N³ deliberately computed in double: it
    // overflows BIGINT near sf1, and the deterministic double rounding of
    // identical exact operands is cross-engine safe where the overflow is
    // not). The doubled rank folds into the constant: 12/(N(N+1))·(R/2)²
    // = 3/(N(N+1))·R2².
    "agg_kruskal" -> ((s, sf) => {
      val d38 = DecimalType(38, 0)
      val vt = t(s, sf, "events")
        .groupBy(col("value").as("v"), col("event_type").as("g"))
        .agg(count(lit(1)).as("c"))
      val tv = vt.groupBy("v").agg(sum(col("c")).as("tt"))
      // the distinct-value frame is corpus-growing (continuous values):
      // running count rides the two-pass GlobalRank kernel, not a
      // single-partition global window
      val ranked = graft.operators.GlobalRank
        .prefix(tv, Nil, Seq("v"), Seq("tt" -> "cum"), inclusive = false)
        .withColumn("rk2", lit(2L) * col("cum") + col("tt") + 1)
      val byG = vt.join(ranked.select("v", "rk2"), Seq("v"))
        .groupBy("g")
        .agg(sum(col("c")).as("nj"),
          sum(col("c").cast(d38) * col("rk2")).as("r2j"))
      // tie totals aggregate the KERNEL output (the pinned range shuffle);
      // aggregating tv here would re-run the per-value rollup a second time
      val ties = ranked.agg(
        sum((col("tt").cast(d38) * col("tt") * col("tt") - col("tt"))).as("tsum"))
      byG.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
          sum(col("r2j").cast("double") * col("r2j").cast("double") /
            col("nj")).as("s4"))
        .crossJoin(broadcast(ties))
        .withColumn("h_raw",
          lit(3.0) * col("s4") / (col("n") * (col("n") + 1)).cast("double") -
            lit(3.0) * (col("n") + 1).cast("double"))
        .withColumn("nd", col("n").cast("double"))
        .select(col("k"), col("n"), round(col("h_raw"), 6).as("h"),
          round(col("h_raw") / (lit(1.0) - col("tsum").cast("double") /
            (col("nd") * col("nd") * col("nd") - col("nd"))), 6).as("h_adj"))
    }),

    // Cramér's V — the EFFECT SIZE the agg_chisq significance test can't
    // report (χ² grows linearly with N; V = √(χ²/(N·min(r−1,c−1))) is the
    // 0–1 association strength that survives a 100× corpus growth
    // unchanged): same full-grid contingency construction as agg_chisq
    // (marginal cross-join, zero cells kept via coalesce so χ² isn't
    // understated), χ² kept UNROUNDED into V — deriving V from the
    // 6dp-rounded χ² would double-round — and both statistics rounded
    // only at the output boundary. One corpus-pass agg; everything after
    // runs on the ≤ r×c cell frame.
    "agg_cramers_v" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val c = tr.persist(t(s, sf, "events")
        .groupBy(col("event_type"),
          expr(s"(unix_micros(ts) div $DayUs) % 7").as("dow"))
        .agg(count(lit(1)).as("n")))
      val rt = c.groupBy("event_type").agg(sum(col("n")).as("rn"))
      val ct = c.groupBy("dow").agg(sum(col("n")).as("cn"))
      val tot = rt.agg(sum(col("rn")).as("nt"), (count(lit(1)) - 1).as("dr"))
        .crossJoin(broadcast(ct.agg((count(lit(1)) - 1).as("dc"))))
      val cells = rt.crossJoin(ct)
        .join(c, Seq("event_type", "dow"), "left")
        .withColumn("o", coalesce(col("n"), lit(0L)))
      tr.seal(cells
        .crossJoin(broadcast(tot))
        .agg(max(col("nt")).as("n"),
          max(col("dr") * col("dc")).as("dof"),
          max(least(col("dr"), col("dc"))).as("mind"),
          sum(pow(col("o") - col("rn") * col("cn") * lit(1.0) / col("nt"), 2)
            / (col("rn") * col("cn") * lit(1.0) / col("nt"))).as("chi2_raw"))
        .select(col("n"), col("dof"), round(col("chi2_raw"), 6).as("chi2"),
          round(sqrt(col("chi2_raw") / (col("n") * col("mind")).cast("double")),
            6).as("v")))
    }),

    // Mutual information + normalized MI between event type and day-of-
    // week — the model-free dependence measure feature selection ranks
    // by: MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over OBSERVED cells (empty
    // cells contribute exactly 0, so unlike χ² no grid materialization is
    // needed), with H(X), H(Y) folded over the SAME cell frame
    // (Σ_cells (c/N)ln(rn/N) telescopes to Σ_x (rn/N)ln(rn/N) because
    // cell counts partition each marginal) — one corpus-pass agg, three
    // window sums over the ≤ r×c compact frame, one output row, and NO
    // scalar cross-join anywhere. All counts exact integers; the ln
    // chain is per-cell deterministic and the ≤35-term association noise
    // (~1e-16 relative) is 10 orders inside the 6dp round.
    "agg_mutual_info" -> ((s, sf) => {
      val cells = t(s, sf, "events")
        .groupBy(col("event_type"),
          expr(s"(unix_micros(ts) div $DayUs) % 7").as("dow"))
        .agg(count(lit(1)).as("c"))
      // the grand-total frame is the ≤ r×c cell table — bounded by the
      // type×dow DOMAIN, never the corpus — and keyed on a non-foldable
      // always-zero key (the GlobalRank pmod idiom) so the plan never
      // shows a partition-less window (round-16 sweep)
      val g = cells
        .withColumn("rn", sum(col("c")).over(Window.partitionBy("event_type")))
        .withColumn("cn", sum(col("c")).over(Window.partitionBy("dow")))
        .withColumn("nt", sum(col("c")).over(
          Window.partitionBy(pmod(xxhash64(col("dow")), lit(1)))))
      g.agg(count(lit(1)).as("n_cells"), max(col("nt")).as("n"),
          sum(col("c") * (log(col("c").cast("double")) +
            log(col("nt").cast("double")) - log(col("rn").cast("double")) -
            log(col("cn").cast("double")))).as("misum"),
          sum(col("c") * log(col("rn").cast("double") / col("nt"))).as("hxs"),
          sum(col("c") * log(col("cn").cast("double") / col("nt"))).as("hys"))
        .select(col("n_cells"), col("n"),
          round(col("misum") / col("n"), 6).as("mi"),
          round((col("misum") / col("n")) /
            sqrt((col("hxs") / col("n")) * (col("hys") / col("n"))), 6)
            .as("nmi"))
    }),

    // Mann–Kendall trend test + Sen's slope per event type over the daily
    // count series (Mann 1945; Kendall 1975; Sen, JASA 1968) — the
    // distribution-free "is this metric drifting" monitor every ops
    // dashboard needs, robust where OLS-on-time is outlier-hostage. The
    // corpus collapses to the per-(type, day) count table in ONE agg
    // (bounded by k × the DAY domain, never the corpus); the pairwise
    // phase — S = Σ sign(n_j − n_i) over day pairs and Sen's slope = the
    // median pairwise slope — is a self-join of that ≤30-row-per-type
    // frame (k·C(days,2) ≈ 2.2k pairs at any SF: quadratic in the bounded
    // day DOMAIN, constant in corpus size; a year of days is 66k pairs
    // per type — still a compact frame at 100 TB). S and the variance
    // operands (incl. the tie term Σt(t−1)(2t+5)) are exact integers; z
    // applies the standard continuity correction (S∓1) in one identical
    // chain; the slope median rides the exact-interpolation percentile ↔
    // quantile_cont pairing (the agg_percentile contract).
    "ts_trend" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .groupBy(col("event_type").as("g"),
          expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("n"))
      val pairs = daily.select(col("g"), col("d").as("d1"), col("n").as("n1"))
        .join(daily.select(col("g"), col("d").as("d2"), col("n").as("n2")),
          Seq("g"))
        .where(col("d1") < col("d2"))
      val sStat = pairs.groupBy("g").agg(
        sum(when(col("n2") > col("n1"), 1L)
          .when(col("n2") < col("n1"), -1L).otherwise(0L)).as("s"),
        expr("percentile((n2 - n1) / (d2 - d1), 0.5)").as("sen"))
      val nd = daily.groupBy("g").agg(count(lit(1)).as("nd"))
      val ties = daily.groupBy("g", "n").agg(count(lit(1)).as("t"))
        .groupBy("g")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .as("tsum"))
      sStat.join(nd, Seq("g")).join(ties, Seq("g"))
        .withColumn("vs",
          (col("nd") * (col("nd") - 1) * (lit(2L) * col("nd") + 5)
            - col("tsum")).cast("double") / 18.0)
        .select(col("g").as("event_type"), col("nd"), col("s"),
          round(when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("vs")))
            .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("vs")))
            .otherwise(lit(0.0)), 6).as("z"),
          round(col("sen"), 6).as("sen_slope"))
        .orderBy("event_type")
    }),

    // Theil T inequality index of per-customer order activity by market
    // segment, with the between/within decomposition (Theil, *Economics
    // and Information Theory*, 1967) — the additively-decomposable
    // concentration measure agg_gini can't give (Gini doesn't decompose):
    // per segment T_g = Σ (x/µ_g)ln(x/µ_g)/n_g over per-customer order
    // counts, plus each segment's between-group term (n_g/n)(µ_g/µ)
    // ln(µ_g/µ) and within-group share (n_g/n)(µ_g/µ)T_g, whose sums
    // reconstruct total inequality exactly (the law StatsSpec asserts).
    // The corpus collapses twice: orders → per-customer counts (one agg),
    // counts → the (segment, x) VALUE-DOMAIN table (x is a small integer
    // — the frame is ≤ segments × max-orders-per-customer rows at any
    // SF). All shuffled sums are exact integers; µ_g, µ and every ln
    // chain evaluate once over exact operands on the ≤200-row compact
    // frame (the MI discipline); grand totals ride a 1-row broadcast.
    "agg_theil" -> ((s, sf) => {
      val x = t(s, sf, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x"))
      val seg = t(s, sf, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val sx = x.join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("x")).agg(count(lit(1)).as("c"))
      val g = sx.groupBy("c_mktsegment")
        .agg(sum(col("c")).as("ng"), sum(col("c") * col("x")).as("sg"))
      val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("stot"))
      sx.join(g, Seq("c_mktsegment"))
        .withColumn("mug", col("sg").cast("double") / col("ng"))
        .withColumn("term",
          col("c") * (col("x") / col("mug")) * log(col("x") / col("mug")))
        .groupBy(col("c_mktsegment"), col("ng"), col("sg"), col("mug"))
        .agg((sum(col("term")) / col("ng")).as("tg"))
        .crossJoin(broadcast(tot))
        .withColumn("mu", col("stot").cast("double") / col("n"))
        .withColumn("w",
          (col("ng").cast("double") / col("n")) * (col("mug") / col("mu")))
        .select(col("c_mktsegment"), col("ng").as("n_cust"),
          round(col("mug"), 6).as("mean_orders"),
          round(col("tg"), 6).as("theil"),
          round(col("w") * col("tg"), 6).as("within_share"),
          round(col("w") * log(col("mug") / col("mu")), 6).as("between_term"))
        .orderBy("c_mktsegment")
    }),

    // Zipf rank–frequency fit over the corpus token distribution (Zipf
    // 1949; the sanity check every tokenizer/corpus-health pipeline runs:
    // natural text has log-log slope ≈ −1, and a collapsed or templated
    // corpus shows up as a broken slope/r²): ONE corpus token-count agg
    // (the text_wordcount shape), a row_number rank over the VOCAB-sized
    // frame (top-1000 by count desc, token — deterministic cut), then OLS
    // of ln(freq) on ln(rank). Float discipline: the per-point ln/product
    // chains are identical on both engines, each term casts to
    // DECIMAL(38,15) so the shuffled sufficient-statistic sums are EXACT
    // and order-independent (the doubled-rank discipline extended to
    // irrational terms), and the closed-form slope/intercept/r² evaluate
    // once over the exact sums — intercept in cross-moment form, never
    // derived from the rounded slope (the agg_ols contract).
    "text_zipf" -> ((s, sf) => {
      val d = DecimalType(38, 15)
      val freq = t(s, sf, "documents")
        .select(explode(split(col("text"), " ")).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("c"))
      // top-1000 via TakeOrderedAndProject (distributed per-partition
      // top-k + merge — the round-16 rewrite of the former global-window
      // rank, whose single-partition sort was vocab-sized and at 100 TB
      // the vocab is NOT bounded); the rank is then a 1000-row window on
      // a non-foldable always-zero key (the GlobalRank pmod idiom) under
      // the SAME total order, so values are unchanged
      val top = freq.orderBy(desc("c"), col("tk")).limit(1000)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(pmod(xxhash64(col("tk")), lit(1)))
            .orderBy(desc("c"), col("tk"))))
      top.select(log(col("r").cast("double")).as("lr"),
          log(col("c").cast("double")).as("lf"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("lr").cast(d)).as("sx"), sum(col("lf").cast(d)).as("sy"),
          sum((col("lr") * col("lr")).cast(d)).as("sxx"),
          sum((col("lf") * col("lf")).cast(d)).as("syy"),
          sum((col("lr") * col("lf")).cast(d)).as("sxy"))
        .select(col("n_tokens"), col("sx").cast("double").as("sx"),
          col("sy").cast("double").as("sy"), col("sxx").cast("double").as("sxx"),
          col("syy").cast("double").as("syy"), col("sxy").cast("double").as("sxy"))
        .select(col("n_tokens"),
          round((col("n_tokens") * col("sxy") - col("sx") * col("sy")) /
            (col("n_tokens") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope"),
          round((col("sy") * col("sxx") - col("sx") * col("sxy")) /
            (col("n_tokens") * col("sxx") - col("sx") * col("sx")), 6)
            .as("intercept"),
          round(pow(col("n_tokens") * col("sxy") - col("sx") * col("sy"), 2) /
            ((col("n_tokens") * col("sxx") - col("sx") * col("sx")) *
             (col("n_tokens") * col("syy") - col("sy") * col("sy"))), 6)
            .as("r2"))
    }),

    // Herfindahl–Hirschman concentration index per market segment
    // (Herfindahl 1950; Hirschman 1945 — the antitrust-standard
    // concentration number) over per-customer order activity, with the
    // normalized HHI* = (H − 1/n)/(1 − 1/n) that is comparable across
    // segment sizes: completes the concentration family (agg_gini rank
    // form, agg_theil decomposable form, HHI the share-squared form
    // regulators actually quote). H = Σx²/(Σx)² needs only TWO exact
    // BIGINT sums over the (segment, count) value-domain collapse — both
    // shuffled statistics are exact integers, and the entire float
    // finish is one identical chain (6dp).
    "agg_hhi" -> ((s, sf) => {
      val x = t(s, sf, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x"))
      x.join(broadcast(t(s, sf, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("hhi",
          col("sxx").cast("double") / (col("sx") * col("sx")))
        .select(col("c_mktsegment"), col("n_cust"),
          round(col("hhi"), 6).as("hhi"),
          round((col("hhi") - lit(1.0) / col("n_cust")) /
            (lit(1.0) - lit(1.0) / col("n_cust")), 6).as("hhi_norm"))
        .orderBy("c_mktsegment")
    }),

    // ROC AUC of event value as a purchase-vs-view score (Hanley &
    // McNeil, Radiology 1982: AUC is the Mann–Whitney U statistic
    // normalized — P(score_pos > score_neg) + ½P(tie)) — the
    // threshold-free ranking-quality number every model-eval pipeline
    // reports, completing the eval tier beside the confusion matrix
    // (which fixes ONE threshold) and agg_mwu (which tests the same
    // quantity instead of reporting it). Identical machinery: the corpus
    // collapses to the per-distinct-VALUE table (c_pos, tie count) in one
    // map-side-combined agg — bounded by the 2dp value DOMAIN — one
    // running window over the compact frame yields exact half-integer
    // tie-average ranks, and AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻) is a single
    // float division over exact operands. Gini = 2·AUC − 1 derives from
    // the UNROUNDED AUC (the agg_cramers_v no-double-rounding rule).
    "agg_auc" -> ((s, sf) => {
      val byV = t(s, sf, "events")
        .where(col("event_type").isin("purchase", "view"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c1"), count(lit(1)).as("tt"))
      // distinct-value CDF frame grows with the corpus: two-pass
      // GlobalRank, not a single-partition global window
      graft.operators.GlobalRank
        .prefix(byV, Nil, Seq("value"), Seq("tt" -> "cum"),
          inclusive = false)
        .withColumn("avg_rk", col("cum") + (col("tt") + 1) / lit(2.0))
        .agg(sum(col("c1") * col("avg_rk")).as("r1"),
          sum(col("c1")).as("np"), sum(col("tt") - col("c1")).as("nn"))
        .withColumn("auc_raw",
          (col("r1") - col("np") * (col("np") + 1) / lit(2.0)) /
            (col("np") * col("nn")))
        .select(col("np").as("n_pos"), col("nn").as("n_neg"),
          round(col("auc_raw"), 6).as("auc"),
          round(col("auc_raw") * 2 - 1, 6).as("gini"))
    }),

    // Kendall rank correlation τ-b per return flag (Kendall, Biometrika
    // 1938; τ-b tie form per Agresti) between quantity and discount —
    // the concordance-based dependence measure that pairs with
    // agg_spearman exactly as MWU pairs with the t-test: τ counts
    // agreeing pair ORDERINGS, so it is robust where ρ's rank-moment
    // arithmetic is tie-dominated. The corpus collapses ONCE to the
    // (flag, qty, disc) VALUE-PAIR cell table (≤550 cells per flag — the
    // agg_spearman frame); concordant/discordant/tie counts come from a
    // self-join of that compact frame joining each unordered cell pair
    // exactly once ((x1,y1) < (x2,y2) lexicographically — quadratic in
    // the bounded value DOMAIN, never the corpus), weighted by exact
    // c1·c2 products, with same-cell pairs contributing c(c−1)/2 to both
    // tie totals. τ-b = (C−D)/√((n0−tx)(n0−ty)) is ONE float chain over
    // exact BIGINT sums (n0 = n(n−1)/2 pairs; tx/ty from per-value
    // marginal rollups of the SAME cell frame).
    "agg_kendall" -> ((s, sf) => {
      val cells = t(s, sf, "lineitem")
        .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("x"),
          col("l_discount").as("y"))
        .agg(count(lit(1)).as("c"))
      val a = cells.select(col("g"), col("x").as("x1"), col("y").as("y1"),
        col("c").as("c1"))
      val b = cells.select(col("g"), col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2"))
      val pairs = a.join(b, Seq("g"))
        .where(col("x1") < col("x2") ||
          (col("x1") === col("x2") && col("y1") < col("y2")))
      val cd = pairs.groupBy("g").agg(
        sum(when(col("x1") < col("x2") && col("y1") < col("y2"),
          col("c1") * col("c2")).otherwise(lit(0L))).as("cc"),
        sum(when(col("x1") < col("x2") && col("y1") > col("y2"),
          col("c1") * col("c2")).otherwise(lit(0L))).as("dd"))
      val marg = cells.groupBy("g").agg(sum(col("c")).as("n"))
      val tx = cells.groupBy("g", "x").agg(sum(col("c")).as("cx"))
        .groupBy("g").agg(sum(col("cx") * (col("cx") - 1)).as("tx2"))
      val ty = cells.groupBy("g", "y").agg(sum(col("c")).as("cy"))
        .groupBy("g").agg(sum(col("cy") * (col("cy") - 1)).as("ty2"))
      cd.join(marg, Seq("g")).join(tx, Seq("g")).join(ty, Seq("g"))
        .withColumn("n0x2", col("n") * (col("n") - 1))
        .select(col("g").as("l_returnflag"), col("n"),
          col("cc").as("concordant"), col("dd").as("discordant"),
          round((col("cc") - col("dd")).cast("double") * 2 /
            sqrt((col("n0x2") - col("tx2")).cast("double") *
              (col("n0x2") - col("ty2")).cast("double")), 6).as("tau_b"))
        .orderBy("l_returnflag")
    }),

    // calibration / reliability table (Murphy & Winkler 1977; the
    // reliability-diagram binning every probabilistic-model eval runs,
    // with the Expected Calibration Error decomposition of Naeini et al.
    // AAAI 2015): score purchase-vs-view events with the deterministic
    // monotone link p = value/(value+50) ∈ (0,1), bin into 10 equal-width
    // probability bins, and per bin report n, mean predicted p, observed
    // positive rate, and the bin's |gap|·n/N ECE contribution. One
    // corpus-pass agg keyed by the bin (the map-side-combined shape);
    // the bin index floor(10p) is the identical double chain on both
    // engines, per-term p casts to DECIMAL(38,15) so the shuffled mean-p
    // sums are EXACT and order-independent (the text_zipf discipline);
    // observed rates are exact-integer divisions; the grand total rides a
    // 1-row broadcast. ECE itself is the sum of the printed column — the
    // decomposition law StatsSpec asserts.
    "eval_calibration" -> ((s, sf) => {
      val d = DecimalType(38, 15)
      val scored = t(s, sf, "events")
        .where(col("event_type").isin("purchase", "view"))
        .withColumn("p", col("value") / (col("value") + 50.0))
        .withColumn("bin", floor(col("p") * 10).cast("long"))
        .withColumn("y",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
      val bins = scored.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
          sum(col("p").cast(d)).as("sp"))
      val tot = bins.agg(sum(col("n")).as("nn"))
      bins.crossJoin(broadcast(tot))
        .withColumn("mean_p", col("sp").cast("double") / col("n"))
        .withColumn("obs", col("n_pos").cast("double") / col("n"))
        .select(col("bin"), col("n"), col("n_pos"),
          round(col("mean_p"), 6).as("mean_pred"),
          round(col("obs"), 6).as("obs_rate"),
          round(abs(col("mean_p") - col("obs")) * col("n") / col("nn"), 6)
            .as("ece_term"))
        .orderBy("bin")
    }),

    // covariance / correlation MATRIX (round 12, third batch) — the
    // multivariate screen behind every feature-selection and PCA pass:
    // all 10 ordered pairs over lineitem's four measures in ONE corpus
    // aggregate. Values are fixed-scale (≤ 2dp), so each is rint-scaled
    // to an exact integer ×100 and the 14 sufficient statistics (4 sums,
    // 10 cross-products) cross the shuffle as exact DECIMAL(38,0) sums —
    // order-independent under any partitioning; products peak ~1.1e14 per
    // row so BIGINT would overflow the sf1 sum but decimal never does.
    // The pair expansion is a 10-row literal frame crossJoined with the
    // broadcast 1-row stats (the scalar-subquery shape); cov descales by
    // the exact 100×100, corr is scale-invariant. Each final statistic is
    // ONE identical double chain from exact operands on both engines.
    // Spark-first: a single Tungsten hash-agg computes the full
    // O(d²) moment block per partition and merges 14 decimals — the
    // covariance-matrix shape that at 100 TB beats d² separate
    // covar_samp passes by d² scans.
    "agg_cov_matrix" -> ((s, sf) => {
      val cols = covCols
      val stats = covStatsFrame(s, sf)
      val pairs = s.createDataFrame(
        s.sparkContext.parallelize(for {
          (i, (x, _)) <- cols.zipWithIndex.map(_.swap)
          (j, (y, _)) <- cols.zipWithIndex.map(_.swap) if i <= j
        } yield org.apache.spark.sql.Row(x, y), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("y",
            org.apache.spark.sql.types.StringType))))
      val sMap = map(cols.flatMap { case (n, _) =>
        Seq(lit(n), col(s"s_$n")) }: _*)
      val pMap = map((for {
        (i, (x, _)) <- cols.zipWithIndex.map(_.swap)
        (j, (y, _)) <- cols.zipWithIndex.map(_.swap) if i <= j
      } yield Seq(lit(s"${x}_$y"), col(s"p_${x}_$y"))).flatten: _*)
      pairs.crossJoin(broadcast(stats))
        .withColumn("sx", element_at(sMap, col("x")))
        .withColumn("sy", element_at(sMap, col("y")))
        .withColumn("sxy", element_at(pMap, concat_ws("_", col("x"), col("y"))))
        .withColumn("sxx", element_at(pMap, concat_ws("_", col("x"), col("x"))))
        .withColumn("syy", element_at(pMap, concat_ws("_", col("y"), col("y"))))
        .select(col("x"), col("y"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / col("n") / (col("n") - lit(1)) / lit(10000.0), 6).as("cov"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
            .as("corr"))
        .orderBy("x", "y")
    }),

    // periodogram (round 12, third batch) — the Schuster/Fourier power
    // spectrum of the daily event series: P(k) = |Σ_d y_d·e^(−2πikd/D)|²/D
    // for k = 1..14, the seasonality detector that finds ANY period (the
    // fixed-lag ts_seasonality/ts_autocorr queries can only confirm a
    // hypothesized one — a weekly cycle shows as the peak near k = D/7).
    // Plan: the corpus collapses to the ≤|days| daily frame FIRST (one
    // map-side-combined agg, the ts_changepoint discipline); the span
    // rides a 1-row broadcast; frequencies are a broadcast 14-row range,
    // so the trig stage is 14×|days| rows — day-domain, never corpus.
    // Float discipline: y_d is an exact integer, the angle is one
    // identical double chain (2π·k·off/D — constant-folded 2π is the
    // same double both engines), and each y·cos / y·sin term quantizes to
    // DECIMAL(38,15) (the graph_linkpred per-term discipline) so the
    // per-frequency sums are exact order-independent decimal adds; the
    // power finish is one identical chain (round 6).
    "ts_periodogram" -> ((s, sf) => {
      val d15 = DecimalType(38, 15)
      val daily = t(s, sf, "events")
        .groupBy(expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("y"))
      val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
      val freqs = s.range(1, 15).select(col("id").as("k"))
      daily.crossJoin(broadcast(span))
        .withColumn("off", col("d") - col("d0"))
        .withColumn("dd", col("d1") - col("d0") + lit(1L))
        .crossJoin(broadcast(freqs))
        .withColumn("ang",
          lit(2.0 * math.Pi) * col("k") * col("off") / col("dd"))
        .groupBy("k")
        .agg(max(col("dd")).as("dd"),
          sum((col("y") * cos(col("ang"))).cast(d15)).as("sc"),
          sum((col("y") * sin(col("ang"))).cast(d15)).as("ss"))
        .select(col("k"),
          round((col("sc").cast("double") * col("sc").cast("double")
            + col("ss").cast("double") * col("ss").cast("double"))
            / col("dd"), 6).as("power"))
        .orderBy("k")
    }),

    // PCA (round 12, third batch; rows-only) — eigendecomposition of the
    // CORRELATION matrix (the standard choice when column scales differ by
    // 10⁶, as lineitem's do) over the same one-pass d² moment block as
    // agg_cov_matrix. Spark-first split: the corpus contributes ONLY the
    // exact-decimal sufficient statistics (one distributed aggregate);
    // the d×d eigen step is driver arithmetic on 16 doubles via
    // deterministic cyclic Jacobi ([[graft.ml.Pca]]) — the CAIM bounded
    // executor→driver contract, invariant in the corpus size. The 1-row
    // stats collect is the documented driver boundary. Determinism:
    // exact-integer inputs → identical corr matrix every run; fixed sweep
    // order; (eigenvalue DESC, column ASC) sort; largest-|loading|-
    // positive sign convention. Not SQL-expressible (iterative eigen) →
    // no oracle; PcaSpec asserts the spectral laws (A·v = λ·v against an
    // independently BigInt-recomputed matrix, orthonormality, trace = d,
    // λ descending ≥ 0) — stronger than a value pin, it verifies the
    // DEFINITION.
    "ml_pca" -> ((s, sf) => {
      val row = covStatsFrame(s, sf).head()
      val n = row.getAs[Long]("n")
      val names = covCols.map(_._1)
      def sv(x: String) =
        BigInt(row.getAs[java.math.BigDecimal](s"s_$x").toBigInteger)
      def pv(x: String, y: String) = {
        val key = if (covCols.indexWhere(_._1 == x) <=
          covCols.indexWhere(_._1 == y)) s"p_${x}_$y" else s"p_${y}_$x"
        BigInt(row.getAs[java.math.BigDecimal](key).toBigInteger)
      }
      def num(i: Int, j: Int): BigInt =
        BigInt(n) * pv(names(i), names(j)) - sv(names(i)) * sv(names(j))
      val corr = Array.tabulate(4, 4)((i, j) =>
        num(i, j).toDouble / math.sqrt(num(i, i).toDouble * num(j, j).toDouble))
      val (vals, vecs) = graft.ml.Pca.eigenSym(corr)
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(vals.indices.map { k =>
          org.apache.spark.sql.Row(
            (k + 1).toLong +: r6(vals(k)) +: r6(vals(k) / 4.0) +:
              vecs(k).map(r6).toSeq: _*)
        }: _*)
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("component",
          org.apache.spark.sql.types.LongType) +:
        org.apache.spark.sql.types.StructField("eigenvalue",
          org.apache.spark.sql.types.DoubleType) +:
        org.apache.spark.sql.types.StructField("pct_var",
          org.apache.spark.sql.types.DoubleType) +:
        names.map(c => org.apache.spark.sql.types.StructField(s"load_$c",
          org.apache.spark.sql.types.DoubleType)))
      s.createDataFrame(rows, schema)
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_spearman" ->
      """WITH pairs AS (SELECT l_returnflag AS g, l_quantity AS x,
             l_discount AS y, count(*) AS c FROM lineitem GROUP BY 1, 2, 3),
           rx AS (SELECT g, x, sum(c) AS tx FROM pairs GROUP BY 1, 2),
           rxr AS (SELECT g, x,
             2 * coalesce(sum(tx) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + tx + 1 AS rx2 FROM rx),
           ry AS (SELECT g, y, sum(c) AS ty FROM pairs GROUP BY 1, 2),
           ryr AS (SELECT g, y,
             2 * coalesce(sum(ty) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + ty + 1 AS ry2 FROM ry),
           s AS (SELECT g, sum(c) AS n,
               sum(c * rx2) AS sx, sum(c * ry2) AS sy,
               sum(c * rx2 * rx2) AS sxx, sum(c * ry2 * ry2) AS syy,
               sum(c * rx2 * ry2) AS sxy
             FROM pairs JOIN rxr USING (g, x) JOIN ryr USING (g, y)
             GROUP BY 1)
         SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                  CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
         FROM s ORDER BY l_returnflag""",
    "agg_kruskal" ->
      """WITH vt AS (SELECT value AS v, event_type AS g, count(*) AS c
             FROM events GROUP BY 1, 2),
           tv AS (SELECT v, sum(c) AS tt FROM vt GROUP BY 1),
           ranked AS (SELECT v,
             2 * coalesce(sum(tt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + tt + 1 AS rk2 FROM tv),
           byg AS (SELECT g, sum(c) AS nj, sum(c * rk2) AS r2j
             FROM vt JOIN ranked USING (v) GROUP BY 1),
           ties AS (SELECT sum(tt * tt * tt - tt) AS tsum FROM tv),
           agg AS (SELECT count(*) AS k, sum(nj) AS n,
               sum(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE) / nj) AS s4
             FROM byg),
           fin AS (SELECT k, n,
               3.0 * s4 / CAST(n * (n + 1) AS DOUBLE)
                 - 3.0 * CAST(n + 1 AS DOUBLE) AS h_raw,
               CAST(n AS DOUBLE) AS nd, tsum
             FROM agg CROSS JOIN ties)
         SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(h_raw, 6) AS h,
           round(h_raw / (1.0 - CAST(tsum AS DOUBLE)
             / (nd * nd * nd - nd)), 6) AS h_adj
         FROM fin""",
    "agg_cramers_v" ->
      """WITH c AS (SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow,
             count(*) AS n FROM events GROUP BY 1, 2),
           rt AS (SELECT event_type, sum(n) AS rn FROM c GROUP BY 1),
           ct AS (SELECT dow, sum(n) AS cn FROM c GROUP BY 1),
           tot AS (SELECT (SELECT sum(n) FROM c) AS nt,
             (SELECT count(*) FROM rt) - 1 AS dr,
             (SELECT count(*) FROM ct) - 1 AS dc),
           cells AS (SELECT rt.event_type, rt.rn, ct.dow, ct.cn,
               coalesce(c.n, 0) AS o
             FROM rt CROSS JOIN ct
             LEFT JOIN c ON c.event_type = rt.event_type AND c.dow = ct.dow),
           agg AS (SELECT CAST(max(nt) AS BIGINT) AS n,
               CAST(max(dr * dc) AS BIGINT) AS dof,
               CAST(max(least(dr, dc)) AS BIGINT) AS mind,
               sum(pow(o - rn * cn * 1.0 / nt, 2)
                 / (rn * cn * 1.0 / nt)) AS chi2_raw
             FROM cells CROSS JOIN tot)
         SELECT n, dof, round(chi2_raw, 6) AS chi2,
           round(sqrt(chi2_raw / CAST(n * mind AS DOUBLE)), 6) AS v
         FROM agg""",
    "agg_mutual_info" ->
      """WITH cells AS (SELECT event_type,
             (epoch_us(ts) // 86400000000) % 7 AS dow, count(*) AS c
           FROM events GROUP BY 1, 2),
           g AS (SELECT c,
             sum(c) OVER (PARTITION BY event_type) AS rn,
             sum(c) OVER (PARTITION BY dow) AS cn,
             sum(c) OVER () AS nt FROM cells),
           agg AS (SELECT count(*) AS n_cells, max(nt) AS n,
               sum(c * (ln(CAST(c AS DOUBLE)) + ln(CAST(nt AS DOUBLE))
                 - ln(CAST(rn AS DOUBLE)) - ln(CAST(cn AS DOUBLE)))) AS misum,
               sum(c * ln(CAST(rn AS DOUBLE) / nt)) AS hxs,
               sum(c * ln(CAST(cn AS DOUBLE) / nt)) AS hys
             FROM g)
         SELECT CAST(n_cells AS BIGINT) AS n_cells, CAST(n AS BIGINT) AS n,
           round(misum / n, 6) AS mi,
           round((misum / n) / sqrt((hxs / n) * (hys / n)), 6) AS nmi
         FROM agg""",
    "ts_trend" ->
      """WITH daily AS (SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             count(*) AS n FROM events GROUP BY 1, 2),
           pairs AS (SELECT a.g, a.n AS n1, b.n AS n2, a.d AS d1, b.d AS d2
             FROM daily a JOIN daily b ON a.g = b.g AND a.d < b.d),
           s AS (SELECT g,
               sum(CASE WHEN n2 > n1 THEN 1 WHEN n2 < n1 THEN -1 ELSE 0 END) AS s,
               quantile_cont((n2 - n1) / (d2 - d1), 0.5) AS sen
             FROM pairs GROUP BY 1),
           nd AS (SELECT g, count(*) AS nd FROM daily GROUP BY 1),
           ties AS (SELECT g, sum(t * (t - 1) * (2 * t + 5)) AS tsum FROM
             (SELECT g, n, count(*) AS t FROM daily GROUP BY 1, 2) GROUP BY 1),
           fin AS (SELECT s.g, nd.nd, s.s, s.sen,
               CAST(nd.nd * (nd.nd - 1) * (2 * nd.nd + 5) - ties.tsum AS DOUBLE)
                 / 18.0 AS vs
             FROM s JOIN nd USING (g) JOIN ties USING (g))
         SELECT g AS event_type, CAST(nd AS BIGINT) AS nd, CAST(s AS BIGINT) AS s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(vs)
                      WHEN s < 0 THEN (s + 1) / sqrt(vs) ELSE 0.0 END, 6) AS z,
           round(sen, 6) AS sen_slope
         FROM fin ORDER BY event_type""",
    "agg_theil" ->
      """WITH x AS (SELECT o_custkey, count(*) AS x FROM orders GROUP BY 1),
           sx AS (SELECT c_mktsegment, x.x AS x, count(*) AS c
             FROM x JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
           g AS (SELECT c_mktsegment, sum(c) AS ng, sum(c * x) AS sg
             FROM sx GROUP BY 1),
           tot AS (SELECT sum(ng) AS n, sum(sg) AS stot FROM g),
           tg AS (SELECT sx.c_mktsegment, g.ng, g.sg,
               CAST(g.sg AS DOUBLE) / g.ng AS mug,
               sum(c * (x / (CAST(g.sg AS DOUBLE) / g.ng))
                 * ln(x / (CAST(g.sg AS DOUBLE) / g.ng))) / g.ng AS tg
             FROM sx JOIN g USING (c_mktsegment) GROUP BY 1, 2, 3, 4),
           fin AS (SELECT tg.*, CAST(stot AS DOUBLE) / n AS mu,
               (CAST(ng AS DOUBLE) / n)
                 * (mug / (CAST(stot AS DOUBLE) / n)) AS w
             FROM tg CROSS JOIN tot)
         SELECT c_mktsegment, CAST(ng AS BIGINT) AS n_cust,
           round(mug, 6) AS mean_orders, round(tg, 6) AS theil,
           round(w * tg, 6) AS within_share,
           round(w * ln(mug / mu), 6) AS between_term
         FROM fin ORDER BY c_mktsegment""",
    "text_zipf" ->
      """WITH freq AS (SELECT tk, count(*) AS c FROM
             (SELECT unnest(string_split(text, ' ')) AS tk FROM documents)
             GROUP BY 1),
           top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tk) AS r
             FROM freq QUALIFY r <= 1000),
           terms AS (SELECT ln(CAST(r AS DOUBLE)) AS lr,
               ln(CAST(c AS DOUBLE)) AS lf FROM top),
           agg AS (SELECT count(*) AS n_tokens,
               sum(CAST(lr AS DECIMAL(38,15))) AS sx,
               sum(CAST(lf AS DECIMAL(38,15))) AS sy,
               sum(CAST(lr * lr AS DECIMAL(38,15))) AS sxx,
               sum(CAST(lf * lf AS DECIMAL(38,15))) AS syy,
               sum(CAST(lr * lf AS DECIMAL(38,15))) AS sxy
             FROM terms),
           d AS (SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
               CAST(sxy AS DOUBLE) AS sxy FROM agg)
         SELECT n_tokens,
           round((n_tokens * sxy - sx * sy) / (n_tokens * sxx - sx * sx), 6)
             AS slope,
           round((sy * sxx - sx * sxy) / (n_tokens * sxx - sx * sx), 6)
             AS intercept,
           round(pow(n_tokens * sxy - sx * sy, 2)
             / ((n_tokens * sxx - sx * sx) * (n_tokens * syy - sy * sy)), 6)
             AS r2
         FROM d""",
    "agg_hhi" ->
      """WITH x AS (SELECT o_custkey, count(*) AS x FROM orders GROUP BY 1),
           g AS (SELECT c_mktsegment, count(*) AS n_cust, sum(x.x) AS sx,
               sum(x.x * x.x) AS sxx
             FROM x JOIN customer ON o_custkey = c_custkey GROUP BY 1),
           h AS (SELECT c_mktsegment, n_cust,
               CAST(sxx AS DOUBLE) / (sx * sx) AS hhi FROM g)
         SELECT c_mktsegment, CAST(n_cust AS BIGINT) AS n_cust,
           round(hhi, 6) AS hhi,
           round((hhi - 1.0 / n_cust) / (1.0 - 1.0 / n_cust), 6) AS hhi_norm
         FROM h ORDER BY c_mktsegment""",
    "agg_auc" ->
      """WITH byv AS (SELECT value,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
             count(*) AS tt
           FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
         ranked AS (SELECT c1, tt,
             coalesce(sum(tt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (tt + 1) / 2.0 AS avg_rk
           FROM byv),
         agg AS (SELECT sum(c1 * avg_rk) AS r1, sum(c1) AS np,
             sum(tt - c1) AS nn FROM ranked),
         fin AS (SELECT np, nn,
             (r1 - np * (np + 1) / 2.0) / (np * nn) AS auc_raw FROM agg)
         SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round(auc_raw, 6) AS auc, round(auc_raw * 2 - 1, 6) AS gini
         FROM fin""",
    "agg_kendall" ->
      """WITH cells AS MATERIALIZED (SELECT l_returnflag AS g,
             l_quantity AS x, l_discount AS y, count(*) AS c
           FROM lineitem GROUP BY 1, 2, 3),
         cd AS (SELECT a.g,
             sum(CASE WHEN a.x < b.x AND a.y < b.y
                 THEN a.c * b.c ELSE 0 END) AS cc,
             sum(CASE WHEN a.x < b.x AND a.y > b.y
                 THEN a.c * b.c ELSE 0 END) AS dd
           FROM cells a JOIN cells b ON a.g = b.g
             AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
           GROUP BY 1),
         marg AS (SELECT g, sum(c) AS n FROM cells GROUP BY 1),
         tx AS (SELECT g, sum(cx * (cx - 1)) AS tx2 FROM
             (SELECT g, x, sum(c) AS cx FROM cells GROUP BY 1, 2)
           GROUP BY 1),
         ty AS (SELECT g, sum(cy * (cy - 1)) AS ty2 FROM
             (SELECT g, y, sum(c) AS cy FROM cells GROUP BY 1, 2)
           GROUP BY 1)
         SELECT cd.g AS l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(cc AS BIGINT) AS concordant, CAST(dd AS BIGINT) AS discordant,
           round(CAST(cc - dd AS DOUBLE) * 2 /
             sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
               * CAST(n * (n - 1) - ty2 AS DOUBLE)), 6) AS tau_b
         FROM cd JOIN marg USING (g) JOIN tx USING (g) JOIN ty USING (g)
         ORDER BY l_returnflag""",
    "eval_calibration" ->
      """WITH scored AS (SELECT value / (value + 50.0) AS p,
             CAST(floor(value / (value + 50.0) * 10) AS BIGINT) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events WHERE event_type IN ('purchase', 'view')),
         bins AS (SELECT bin, count(*) AS n, sum(y) AS n_pos,
             sum(CAST(p AS DECIMAL(38,15))) AS sp
           FROM scored GROUP BY 1),
         tot AS (SELECT sum(n) AS nn FROM bins)
         SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           round(CAST(sp AS DOUBLE) / n, 6) AS mean_pred,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS obs_rate,
           round(abs(CAST(sp AS DOUBLE) / n - CAST(n_pos AS DOUBLE) / n)
             * n / nn, 6) AS ece_term
         FROM bins CROSS JOIN tot ORDER BY bin""",
    "agg_cov_matrix" ->
      """WITH sc AS (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS e,
             CAST(round(l_discount * 100) AS BIGINT) AS d,
             CAST(round(l_tax * 100) AS BIGINT) AS t FROM lineitem),
           st AS (SELECT count(*) AS n,
             sum(q) AS s_q, sum(e) AS s_e, sum(d) AS s_d, sum(t) AS s_t,
             sum(q*q) AS p_qq, sum(q*e) AS p_qe, sum(q*d) AS p_qd,
             sum(q*t) AS p_qt, sum(e*e) AS p_ee, sum(e*d) AS p_ed,
             sum(e*t) AS p_et, sum(d*d) AS p_dd, sum(d*t) AS p_dt,
             sum(t*t) AS p_tt FROM sc),
           pr AS (SELECT * FROM (VALUES
             ('quantity','quantity'), ('quantity','extendedprice'),
             ('quantity','discount'), ('quantity','tax'),
             ('extendedprice','extendedprice'), ('extendedprice','discount'),
             ('extendedprice','tax'), ('discount','discount'),
             ('discount','tax'), ('tax','tax')) AS v(x, y)),
           m AS (SELECT x, y, n,
             CASE x WHEN 'quantity' THEN s_q WHEN 'extendedprice' THEN s_e
               WHEN 'discount' THEN s_d ELSE s_t END AS sx,
             CASE y WHEN 'quantity' THEN s_q WHEN 'extendedprice' THEN s_e
               WHEN 'discount' THEN s_d ELSE s_t END AS sy,
             CASE WHEN x = 'quantity' AND y = 'quantity' THEN p_qq
               WHEN x = 'quantity' AND y = 'extendedprice' THEN p_qe
               WHEN x = 'quantity' AND y = 'discount' THEN p_qd
               WHEN x = 'quantity' AND y = 'tax' THEN p_qt
               WHEN x = 'extendedprice' AND y = 'extendedprice' THEN p_ee
               WHEN x = 'extendedprice' AND y = 'discount' THEN p_ed
               WHEN x = 'extendedprice' AND y = 'tax' THEN p_et
               WHEN x = 'discount' AND y = 'discount' THEN p_dd
               WHEN x = 'discount' AND y = 'tax' THEN p_dt
               ELSE p_tt END AS sxy,
             CASE x WHEN 'quantity' THEN p_qq WHEN 'extendedprice' THEN p_ee
               WHEN 'discount' THEN p_dd ELSE p_tt END AS sxx,
             CASE y WHEN 'quantity' THEN p_qq WHEN 'extendedprice' THEN p_ee
               WHEN 'discount' THEN p_dd ELSE p_tt END AS syy
             FROM pr CROSS JOIN st)
         SELECT x, y,
           round(CAST(n * sxy - sx * sy AS DOUBLE) / n / (n - 1)
             / 10000.0, 6) AS cov,
           round(CAST(n * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                  CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr
         FROM m ORDER BY x, y""",
    "ts_periodogram" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
             count(*) AS y FROM events GROUP BY 1),
           span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
           f AS (SELECT unnest(range(1, 15)) AS k),
           terms AS (SELECT k, d1 - d0 + 1 AS dd,
               CAST(y * cos(2 * pi() * k * (d - d0) / (d1 - d0 + 1))
                 AS DECIMAL(38,15)) AS tc,
               CAST(y * sin(2 * pi() * k * (d - d0) / (d1 - d0 + 1))
                 AS DECIMAL(38,15)) AS tsn
             FROM daily CROSS JOIN span CROSS JOIN f),
           s AS (SELECT k, max(dd) AS dd, sum(tc) AS sc, sum(tsn) AS ss
             FROM terms GROUP BY 1)
         SELECT CAST(k AS BIGINT) AS k,
           round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
             + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / dd, 6) AS power
         FROM s ORDER BY k"""
  )
}
