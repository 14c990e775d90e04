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
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val ranked = tv
        .withColumn("rk2", lit(2L) * coalesce(sum(col("tt")).over(w), lit(0L))
          + col("tt") + 1)
      val byG = vt.join(ranked.select("v", "rk2"), Seq("v"))
        .groupBy("g")
        .agg(sum(col("c")).as("nj"),
          sum(col("c").cast(d38) * col("rk2")).as("r2j"))
      val ties = tv.agg(
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
      val g = cells
        .withColumn("rn", sum(col("c")).over(Window.partitionBy("event_type")))
        .withColumn("cn", sum(col("c")).over(Window.partitionBy("dow")))
        .withColumn("nt", sum(col("c")).over(Window.partitionBy()))
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
         FROM agg"""
  )
}
