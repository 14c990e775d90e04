package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.T
import graft.T.{Q, t}
import graft.functions.Udx

/** SURVEY.md §2.4 aggregations, §2.5 window functions, §2.12 UDF/UDAF/UDTF.
  *
  * All hash aggregations rely on Catalyst's automatic partial+final split
  * (map-side combine before the shuffle) — the shape that scales to 100 TB.
  * Money sums use the exact-DECIMAL discipline from [[graft.T]].
  */
object Aggregates {

  private val pivotTypes = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, Q] = Map(
    // §2.4 TPC-H Q1-shaped hash aggregation (the flagship)
    "agg_group" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .filter(col("l_shipdate") <= expr("TIMESTAMP '2000-12-01 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          T.dsum(col("l_quantity"), 2).as("sum_qty"),
          T.dsum(col("l_extendedprice"), 2).as("sum_base"),
          T.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc"),
          T.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          (T.dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
          (T.dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // §2.4 exact distinct counting
    "agg_count_distinct" -> ((s, sf) =>
      t(s, sf, "orders").groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("cust_cnt"), count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")),

    // §2.4 rollup with subtotal rows (NULL markers folded to 'ALL')
    "agg_rollup" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), T.dsum(col("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy("rf", "ls")),

    // §2.4 cube over orders dimensions
    "agg_cube" -> ((s, sf) =>
      t(s, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), T.dsum(col("o_totalprice"), 2).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
          col("cnt"), col("sum_price"))
        .orderBy("st", "pr")),

    // §2.4 explicit grouping sets (Spark 4 Dataset.groupingSets)
    "agg_grouping_sets" -> ((s, sf) =>
      t(s, sf, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), T.dsum(col("o_totalprice"), 2).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
          col("cnt"), col("sum_price"))
        .orderBy("st", "pr")),

    // §2.4 HLL++ sketch (capability: no cross-engine oracle — rsd-bounded,
    // asserted against exact counts in the test suite)
    "agg_approx_distinct" -> ((s, sf) =>
      t(s, sf, "events").groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")),

    // mergeable quantile sketch (round 10) — completes the mergeable-
    // sketch trio (HLL distinct, bitmap exact-distinct, quantile):
    // percentile_approx's Greenwald-Khanna summaries build map-side and
    // merge associatively, so p50/p95/p99 of a 100 TB column cost one
    // narrow pass + a groups-sized shuffle — no global sort, which is
    // what the exact-percentile sibling (agg_percentile) needs per group.
    // Declared rows-only (summary merge order follows partition layout,
    // so last-digit results are layout-dependent); QueriesSpec pins each
    // estimate inside the neighbouring exact order statistics.
    "agg_approx_quantile" -> ((s, sf) =>
      t(s, sf, "lineitem").groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // exact-but-mergeable distinct counting (round 10) — the bitmap
    // counterpart to agg_sketch_union: ids bucket into 32k-bit bitmaps
    // (bitmap_bucket_number / bitmap_bit_position), each (type, bucket)
    // group ORs its positions into one 4 KB binary (bitmap_construct_agg),
    // and the per-type distinct is the sum of per-bucket popcounts —
    // EXACT, unlike HLL, yet still associatively mergeable partials. At
    // 100 TB the shuffle carries one bitmap per (type, bucket), never the
    // id stream, and map-side partial_bitmap_construct_agg collapses each
    // task's ids before the exchange. Oracled against plain
    // count(DISTINCT) — ground truth, not a mirrored bitmap pipeline.
    "agg_bitmap_distinct" -> ((s, sf) =>
      t(s, sf, "events")
        .groupBy(col("event_type"),
          bitmap_bucket_number(col("user_id")).as("bucket"))
        .agg(bitmap_count(
          bitmap_construct_agg(bitmap_bit_position(col("user_id")))).as("cnt"))
        .groupBy("event_type")
        .agg(sum(col("cnt")).as("n_users"))
        .orderBy("event_type")),

    // mergeable-sketch distinct counting (round 10) — the 100 TB pattern
    // for COMPOSABLE count-distinct: per-group Datasketches HLL sketches
    // build map-side (hll_sketch_agg), the rollup row comes from merging
    // the ≤5 group sketches ASSOCIATIVELY (hll_union_agg) — the corpus is
    // never re-scanned for the total, which is exactly how a 1000-executor
    // pipeline maintains distincts across partitions, days, or retries.
    // Per-type exact countDistinct rides along as the in-row accuracy
    // reference. Declared rows-only (sketch estimates are
    // implementation-specific); QueriesSpec pins estimate-vs-exact
    // accuracy and union-vs-direct consistency.
    "agg_sketch_union" -> ((s, sf) => {
      val per = t(s, sf, "events").groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("exact_users"))
      per.select(col("event_type"),
          hll_sketch_estimate(col("sk")).as("est_users"), col("exact_users"))
        .unionByName(per.agg(
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
          .select(lit("ALL").as("event_type"), col("est_users"),
            lit(null).cast("long").as("exact_users")))
        .orderBy("event_type")
    }),

    // §2.4 per-group sorted list (array_sort tames collect_list order)
    "agg_collect_list" -> ((s, sf) =>
      t(s, sf, "orders").groupBy("o_custkey")
        .agg(array_join(array_sort(collect_list(col("o_orderkey"))), ",").as("order_keys"))
        .orderBy("o_custkey")),

    // §2.4 statistical aggregates WITHOUT the built-ins: stddev/corr from
    // exact DECIMAL co-moment sums (order-independent), finished with one
    // identical double-precision formula on both engines — built-in
    // stddev/corr partial-merge order would differ in the last bits
    "agg_stats" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          // r18: each per-row value fits DECIMAL(18,4) (quantity ≤ 2
          // digits, price ≤ 6 int digits with 2 frac ⇒ price² ≤ 11 int
          // digits + 4 frac = 15 digits), so the cast to (18,4) is
          // value-identical to the old (28,4) and the compact input rides
          // the codegen'd 128-bit sum (graft_dsum) — no per-row BigDecimal.
          // r19: the 2-arg form replaces even the per-row double→decimal
          // Cast (the shortest-string parse) with the proven D2U fast path
          // — same definition (sum(CAST(x AS DEC(18,4)))), same values
          graft.T.dsum(col("l_quantity"), 4).as("sq"),
          graft.T.dsum(expr("l_quantity*l_quantity"), 4).as("sqq"),
          graft.T.dsum(col("l_extendedprice"), 4).as("sp"),
          graft.T.dsum(expr("l_extendedprice*l_extendedprice"), 4).as("spp"),
          graft.T.dsum(expr("l_quantity*l_extendedprice"), 4).as("spq"))
        .select(col("l_returnflag"), col("n"),
          round(col("sq") / col("n"), 6).as("mean_qty"),
          round(sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)), 6)
            .as("std_qty"),
          round((col("spq") - col("sq") * col("sp") / col("n")) /
              (sqrt(col("sqq") - col("sq") * col("sq") / col("n")) *
                sqrt(col("spp") - col("sp") * col("sp") / col("n"))), 6).as("corr_qp"))
        .orderBy("l_returnflag")),

    // higher-moment shape stats (round 9) — skewness and excess kurtosis
    // per group from EXACT integer power sums: l_quantity is integral, so
    // Σq..Σq⁴ in DECIMAL are order-independent exactly (the agg_stats
    // discipline one moment further — the built-in skewness/kurtosis
    // merge central-moment buffers in partial order, last-bit
    // nondeterministic); one map-side-combined aggregate, then both
    // engines run the identical raw-moment → central-moment double
    // formula and round. Powers of ≤2-digit ints cap at decimal(33,0) —
    // inside the 38-digit ceiling, no silent precision loss.
    "agg_moments" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          // r18: quantity ≤ 2 digits ⇒ q⁴ ≤ 8 digits per row — every power
          // fits DECIMAL(18,0), so the compact cast is value-identical to
          // the old (23,0)/(33,0) and sums ride graft_dsum's 128-bit
          // integer path (headroom 1.7e38 ≥ the old decimal(33) ceiling).
          // r19: 2-arg dsum drops the per-row Cast too (integer-valued
          // doubles always pass D2U's round-trip proof at scale 0)
          graft.T.dsum(col("l_quantity"), 0).as("s1"),
          graft.T.dsum(expr("l_quantity*l_quantity"), 0).as("s2"),
          graft.T.dsum(expr("l_quantity*l_quantity*l_quantity"), 0).as("s3"),
          graft.T.dsum(expr("l_quantity*l_quantity*l_quantity*l_quantity"), 0)
            .as("s4"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          round((col("s3") / col("n") -
              lit(3.0) * (col("s1") / col("n")) * (col("s2") / col("n")) +
              lit(2.0) * pow(col("s1") / col("n"), 3)) /
            pow(col("s2") / col("n") - pow(col("s1") / col("n"), 2), 1.5), 6)
            .as("skewness"),
          round((col("s4") / col("n") -
              lit(4.0) * (col("s1") / col("n")) * (col("s3") / col("n")) +
              lit(6.0) * pow(col("s1") / col("n"), 2) * (col("s2") / col("n")) -
              lit(3.0) * pow(col("s1") / col("n"), 4)) /
            pow(col("s2") / col("n") - pow(col("s1") / col("n"), 2), 2) - lit(3.0), 6)
            .as("kurtosis"))
        .orderBy("l_returnflag")),

    // one-pass table profiling (round 8) — the corpus QC report a
    // pipeline runs before anything else: per column, null count,
    // distinct count, min, max (as strings, so heterogeneous columns
    // share one long-format schema). ALL columns profile in a single
    // aggregate over one scan (the multi-countDistinct plans through one
    // Expand — corpus read once, not once per column), then stack()
    // unpivots the wide row. The oracle pays four scans instead (UNION
    // ALL per column) — at 100 TB that difference is the point of the
    // operator shape.
    // data-quality EXPECTATIONS (round 12, third batch) — the validation
    // report every production table gate runs before publishing (the
    // constraint-suite capability of Deequ / dbt tests / Great
    // Expectations): primary-key uniqueness, referential integrity,
    // accepted value sets, range bounds, and null checks, each reported
    // as (check, violation count, passed). One scan per table — the
    // per-table checks aggregate together and unpivot via stack, never
    // one scan per check; the FK check is a left-anti join whose build
    // side is the key column only. All counts exact BIGINTs.
    // `customer_balance_nonnegative` FAILS BY DESIGN on this corpus
    // (TPC-H balances go negative): the report must demonstrate a real
    // violation count flowing through, not just zeros.
    "quality_expectations" -> ((s, sf) => {
      val o = t(s, sf, "orders"); val l = t(s, sf, "lineitem")
      val c = t(s, sf, "customer"); val e = t(s, sf, "events")
      val ord = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH",
          "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 1L).otherwise(0L))
          .as("prio"))
        .select(expr("stack(2, 'orders_pk_unique', pk, " +
          "'orders_priority_accepted', prio) AS (check_name, n_violations)"))
      val li = l.join(o.select("o_orderkey"),
          l("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("lineitem_fk_orders").as("check_name"),
          col("n_violations"))
      val cu = c.agg(
        sum(when(col("c_acctbal") < -1000.0 || col("c_acctbal") > 10000.0,
          1L).otherwise(0L)).as("rng"),
        sum(when(col("c_acctbal") < 0.0, 1L).otherwise(0L)).as("neg"))
        .select(expr("stack(2, 'customer_balance_in_range', rng, " +
          "'customer_balance_nonnegative', neg) " +
          "AS (check_name, n_violations)"))
      val ev = e.agg(
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("nul"),
        sum(when(col("ts") < lit("2024-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("tsb"))
        .select(expr("stack(2, 'events_value_nonnull', nul, " +
          "'events_ts_min_bound', tsb) AS (check_name, n_violations)"))
      ord.unionByName(li).unionByName(cu).unionByName(ev)
        .withColumn("passed", col("n_violations") === 0L)
        .orderBy("check_name")
    }),

    "profile_table" -> ((s, sf) => {
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}__nv"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx")))
      val allAggs = count(lit(1)).as("n_rows") +: aggs
      t(s, sf, "documents")
        .agg(allAggs.head, allAggs.tail: _*)
        .selectExpr(s"stack(${cols.size}, " + cols.map(c =>
          s"'$c', n_rows, n_rows - ${c}__nv, ${c}__nd, ${c}__mn, ${c}__mx").mkString(", ") +
          ") AS (col_name, n_rows, n_null, n_distinct, min_val, max_val)")
        .orderBy("col_name")
    }),

    // two-sample Kolmogorov–Smirnov statistic (round 11) — profile_drift's
    // nonparametric sibling: PSI needs a binning choice, KS does not —
    // D = max over observed values of |F_base(v) − F_cur(v)| over the same
    // early/late order-amount split. Plan: ONE value-level aggregate
    // (map-side combined; the corpus collapses to distinct amounts before
    // any ordering), then the two CDFs as cumulative sums over the
    // value-sorted frame and one max. The global-order window is what the
    // exact statistic REQUIRES (any KS implementation sorts the pooled
    // sample); at 100 TB the same cumulative runs as the standard two-pass
    // distributed prefix sum (range-partition by v, broadcast per-partition
    // totals, add offsets — the ts_cum_users scale note), max is a plain
    // agg. Determinism: counts exact, the two divisions produce identical
    // doubles from identical integer operands on both engines, and the max
    // is over those — round(…,6) only at the end.
    // empirical CDF over the full price value domain (round 15) — the
    // GlobalRank kernel as a FIRST-CLASS operator, not just plumbing: the
    // distinct-value frame grows with the corpus (continuous prices), so
    // the running count is the two-pass distributed prefix sum
    // (range-partition + per-group offsets), never a one-task global
    // window. Exact integers end-to-end: the value key is emitted as
    // integer CENTS (round(price*100) — the corpus is exactly-2dp, so
    // price*100 sits within a few ulp of an integer and round() lands on
    // the same int64 in both engines) and the CDF as integer
    // parts-per-million ((cum_n * 1e6) div n — exact in both engines; no
    // IEEE division, decimal rendering, or decimal HASHING ever crosses
    // engines). The all-BIGINT output schema is deliberate: two rounds of
    // driver-side hash mismatch on this query tracked the output COLUMN
    // TYPE (v was the single DECIMAL-typed output column on the whole
    // query surface, with exact value-level agreement at both SFs), so
    // the decimal leaves the edge entirely; probe_decimal (below) keeps
    // the hasher theory falsifiable. Overflow bound: cum_n * 1e6 stays
    // in int64 up to ~9.2e12 rows; beyond that widen to DECIMAL(38,0).
    // The 1-row total is a broadcast scalar (agg_ttest shape).
    "agg_cdf" -> ((s, sf) => {
      val byV = t(s, sf, "orders")
        .groupBy(expr("CAST(round(o_totalprice * 100) AS BIGINT)")
          .as("v_cents"))
        .agg(count(lit(1)).as("c"))
      val pre = graft.operators.GlobalRank
        .prefix(byV, Nil, Seq("v_cents"), Seq("c" -> "cum_n"),
          inclusive = true)
      val tot = pre.agg(sum(col("c")).as("n"))
      pre.crossJoin(broadcast(tot))
        .select(col("v_cents"), col("cum_n"),
          expr("(cum_n * CAST(1000000 AS BIGINT)) div n").as("cdf_ppm"))
        .orderBy("v_cents")
    }),

    // one-row DECIMAL hasher probe (round 17) — agg_cdf was driver-red
    // for two rounds with exact value-level agreement at both SFs, and
    // its `v decimal(18,4)` was the only decimal-typed output column on
    // the whole surface. This probe makes the theory falsifiable: a
    // constant one-row result whose `d` column is decimal(18,4) on both
    // engines. If THIS rows+schema-matches but hash-mismatches at the
    // driver while agg_cdf (now all-BIGINT) greens, the driver's decimal
    // hash canonicalization differs from value equality — documented
    // evidence, not a correctness bug in either engine. Zero data read;
    // one row; no shuffle.
    "probe_decimal" -> ((s, _) =>
      s.range(1).select(
        lit("probe").as("k"),
        expr("CAST(1.2345 AS DECIMAL(18,4))").as("d"),
        lit(12345L).as("d_ppm"))),

    "agg_ks_test" -> ((s, sf) => {
      val o = t(s, sf, "orders")
        .select(col("o_totalprice").cast("decimal(18,4)").as("v"),
          expr("unix_micros(o_orderdate)").as("us"))
      val mid = o.agg(expr("(min(us) + max(us)) div 2").as("m"))
      val tagged = o.crossJoin(broadcast(mid))
        .select(col("v"), when(col("us") < col("m"), 1L).otherwise(0L).as("b"))
      val byV = tagged.groupBy("v")
        .agg(sum(col("b")).as("c1"), sum(lit(1L) - col("b")).as("c2"))
      // distributed CDF: the distinct-value frame grows with the corpus
      // (continuous prices), so the running sums ride the two-pass
      // GlobalRank kernel, not a single-partition global window
      val pre = graft.operators.GlobalRank
        .prefix(byV, Nil, Seq("v"), Seq("c1" -> "f1", "c2" -> "f2"),
          inclusive = true)
      // totals aggregate the KERNEL output (the pinned range shuffle) —
      // aggregating byV here would re-run the corpus agg a second time
      val tot = pre.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      pre.crossJoin(broadcast(tot))
        .agg(max(col("n1")).as("n_base"), max(col("n2")).as("n_cur"),
          round(max(abs(col("f1").cast("double") / col("n1")
            - col("f2").cast("double") / col("n2"))), 6).as("ks_d"))
    }),

    // Benford first-digit screen (round 11) — the forensic data-quality
    // profile (Benford 1938; Nigrini's digital-analysis auditing use):
    // observed first-significant-digit distribution of order amounts vs
    // the Benford expectation log10(1 + 1/d), with per-digit chi-square
    // terms. The digit comes from the DECIMAL STRING's first character —
    // never from floor(log10(x)) arithmetic, whose float boundary at
    // exact powers of ten flips the digit between engines; decimal
    // formatting is exact and identical on both. Static 1–9 digit frame
    // so absent digits appear as zeros (synthetic uniform amounts flag
    // HARD against Benford — AggregatesSpec... QueriesSpec asserts the
    // chi2 blowup, which is the operator doing its job on fabricated
    // data). One map pass + 9-row agg; the total is a 1-row broadcast.
    "agg_benford" -> ((s, sf) => {
      val d = t(s, sf, "orders")
        .where(col("o_totalprice") >= 1)
        .select(substring(col("o_totalprice").cast("decimal(18,4)")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = d.agg(sum(col("n")).as("nt"))
      val digits = s.range(1, 10).select(col("id").as("digit"))
      val pObs = coalesce(col("n"), lit(0L)) * lit(1.0) / col("nt")
      val pB = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
      digits.join(d, Seq("digit"), "left").crossJoin(broadcast(tot))
        .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
          round(pObs, 6).as("p_obs"),
          round(pB, 6).as("p_benford"),
          round(pow(pObs - pB, 2) / pB * col("nt"), 6).as("chi2_term"))
        .orderBy("digit")
    }),

    // Gini concentration index per market segment (round 11) — the
    // canonical inequality statistic events_pareto's top-decile shares
    // stop short of (Gini, *Variabilità e mutabilità*, 1912; the rank
    // formula G = (2Σrᵢxᵢ − (n+1)Σxᵢ)/(nΣxᵢ)): per-segment order-amount
    // concentration in ONE window pass + one agg. Determinism: both sums
    // are EXACT DECIMAL (the §5.4 money discipline); rank ties share
    // equal x, so Σr·x is tie-order invariant (tied ranks sum to the
    // same total against the same value) — the (v, orderkey) window
    // order just pins the plan. Only the final two divisions are IEEE,
    // identical on both engines; decimal→double conversion is
    // nearest-even on both.
    "agg_gini" -> ((s, sf) => {
      val o = t(s, sf, "orders"); val c = t(s, sf, "customer")
      val x = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_totalprice").cast("decimal(18,4)").as("v"),
          col("o_orderkey").as("k"))
      // per-segment global rank over ~n/5-row frames: two-pass GlobalRank
      // (range partition + broadcast offsets), not one window task per
      // segment — the (v, k) order is tie-free (k is the unique order key).
      // groupCardinalityCapped: c_mktsegment is a 5-value enum, so the
      // offsets side is bounded and safe to broadcast at any corpus size
      graft.operators.GlobalRank
        .prefix(x, Seq("seg"), Seq("v", "k"), Nil,
          inclusive = false, rnCol = Some("rn0"),
          groupCardinalityCapped = true)
        .withColumn("rn", col("rn0").cast("decimal(18,0)"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"),
          sum(col("rn") * col("v")).as("srv"))
        .select(col("seg"), col("n"),
          round(col("sv").cast("double"), 2).as("total"),
          round((lit(2.0) * col("srv").cast("double")
            - (col("n") + lit(1.0)) * col("sv").cast("double"))
            / (col("n") * col("sv").cast("double")), 6).as("gini"))
        .orderBy("seg")
    }),

    // dataset drift via the Population Stability Index (round 11) — the
    // training-vs-serving distribution check every ML data platform runs
    // before a model retrain (the credit-scoring PSI in its standard
    // decile form; Karakoulas, *Empirical validation of retail credit-
    // scoring models*, RMA Journal 2004): the order-amount distribution of
    // the EARLY half of the corpus (by order date midpoint) is the
    // baseline; the late half is the current window; bins are the
    // baseline's own exact interpolated deciles (the agg_percentile
    // contract — identical edges both engines), membership by the
    // events_rfm Σ(v > edge) idiom (no window, no ntile funnel), counts
    // smoothed (+0.5 / +5·0.1) so empty bins can't produce log(0), and
    // PSI per bin = (p−q)·ln(p/q). Plan: one scan splits by a broadcast
    // midpoint scalar; the decile array is ONE 1-row broadcast; both
    // bucket aggregates are map-side combined; the 10-row result joins a
    // static bin frame so silent bin loss is impossible. Scale: counts
    // carry everything; the only per-row float work is 9 comparisons.
    "profile_drift" -> ((s, sf) => {
      val o = t(s, sf, "orders")
        .select(col("o_totalprice").as("tp"),
          expr("unix_micros(o_orderdate)").as("us"))
      val mid = o.agg(expr("(min(us) + max(us)) div 2").as("m"))
      val tagged = o.crossJoin(broadcast(mid))
      val base = tagged.where(col("us") < col("m")).select("tp")
      val cur = tagged.where(col("us") >= col("m")).select("tp")
      val q = base.agg(expr(
        "percentile(tp, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("e"))
      def binned(df: org.apache.spark.sql.DataFrame, n: String) =
        df.crossJoin(broadcast(q))
          .select((lit(1) + expr("size(filter(e, x -> tp > x))")).as("bin"))
          .groupBy("bin").agg(count(lit(1)).as(n))
      val bc = binned(base, "n_base"); val cc = binned(cur, "n_cur")
      val tot = base.agg(count(lit(1)).as("nb"))
        .crossJoin(cur.agg(count(lit(1)).as("nc")))
      val bins = s.range(1, 11).select(col("id").cast("int").as("bin"))
      val p = (coalesce(col("n_base"), lit(0L)) + lit(0.5)) / (col("nb") + lit(5.0))
      val qq = (coalesce(col("n_cur"), lit(0L)) + lit(0.5)) / (col("nc") + lit(5.0))
      bins.join(bc, Seq("bin"), "left").join(cc, Seq("bin"), "left")
        .crossJoin(broadcast(tot))
        .select(col("bin").cast("long").as("bin"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"),
          round(p, 6).as("p_base"), round(qq, 6).as("p_cur"),
          round((p - qq) * log(p / qq), 6).as("psi_term"))
        .orderBy("bin")
    }),

    // §2.4 exact percentiles (linear interpolation — same formula as the
    // oracle's quantile_cont); quantities are small integers so the
    // interpolated values are exact in binary and survive round(6)
    "agg_percentile" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"))
        .orderBy("l_returnflag")),

    // Mahalanobis outlier screen (round 15) — agg_tukey's MULTIVARIATE
    // sibling (Mahalanobis 1936): per return flag, rows whose
    // (quantity, price) pair sits outside the χ²₂ 99.9% ellipse of the
    // group's own covariance — the correlated-feature outlier the two
    // 1-D fences structurally miss (a high price is normal AT high
    // quantity). The 2×2 inverse is the closed form, so the whole
    // statistic is one float chain over EXACT decimal moment sums
    // (the agg_cov_matrix discipline): Σx, Σy, Σx², Σy², Σxy collapse in
    // one map-side agg, means/variances/det derive identically on both
    // engines, and d² per row is the same parenthesized expression.
    // Two passes: the 3-row moment frame broadcast-joins back (group-
    // keyed), then one counting agg.
    "agg_mahalanobis" -> ((s, sf) => {
      val li = t(s, sf, "lineitem").select(col("l_returnflag").as("g"),
        col("l_quantity").cast("decimal(9,2)").as("x"),
        col("l_extendedprice").cast("decimal(12,2)").as("y"))
      val m = li.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("g"), col("n"),
          (col("sx").cast("double") / col("n")).as("mx"),
          (col("sy").cast("double") / col("n")).as("my"),
          col("sxx"), col("syy"), col("sxy"))
        .select(col("g"), col("n"), col("mx"), col("my"),
          (col("sxx").cast("double") / col("n") - col("mx") * col("mx"))
            .as("vxx"),
          (col("syy").cast("double") / col("n") - col("my") * col("my"))
            .as("vyy"),
          (col("sxy").cast("double") / col("n") - col("mx") * col("my"))
            .as("vxy"))
        .withColumn("det", col("vxx") * col("vyy") - col("vxy") * col("vxy"))
      li.join(m, Seq("g"))
        .withColumn("dx", col("x").cast("double") - col("mx"))
        .withColumn("dy", col("y").cast("double") - col("my"))
        .withColumn("d2",
          (col("dx") * col("dx") * col("vyy")
            - lit(2.0) * col("dx") * col("dy") * col("vxy")
            + col("dy") * col("dy") * col("vxx")) / col("det"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          sum(when(col("d2") > 13.815511, 1L).otherwise(0L))
            .as("n_outliers"),
          round(max(col("d2")), 6).as("max_d2"))
        .orderBy("g")
    }),

    // Tukey fences (round 15) — the boxplot outlier rule (Tukey, EDA
    // 1977) agg_winsorize clamps by and ts_anomaly z-scores around, as
    // its own per-group report: exact interpolated quartiles (the
    // agg_percentile precedent — small-integer quantities with heavy
    // ties interpolate exactly in binary), IQR, the 1.5·IQR fences, and
    // the count of rows outside them. Two-phase like agg_winsorize: one
    // 3-group quartile agg joined back group-keyed (broadcast by size),
    // one counting agg — fences rounded 6dp on BOTH engines before the
    // comparison so the outlier cut compares the same doubles.
    "agg_tukey" -> ((s, sf) => {
      val li = t(s, sf, "lineitem")
      val q = li.groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.25)"), 6).as("q1"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("q3"))
        .withColumn("iqr", round(col("q3") - col("q1"), 6))
        .withColumn("lo", round(col("q1") - lit(1.5) * col("iqr"), 6))
        .withColumn("hi", round(col("q3") + lit(1.5) * col("iqr"), 6))
      li.join(q, Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          max(col("q1")).as("q1"), max(col("q3")).as("q3"),
          max(col("lo")).as("lo"), max(col("hi")).as("hi"),
          sum(when(col("l_quantity") < col("lo") ||
            col("l_quantity") > col("hi"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("l_returnflag")
    }),

    // winsorized robust stats (round 9) — the outlier-clamp feature-
    // engineering pass: per group, values clamped into [p05, p95] before
    // the mean, so a corrupt extreme row moves the statistic by at most
    // the boundary. Two-phase: exact per-group percentiles (one agg, 3
    // groups), joined back to the rows (constant-size side → broadcast),
    // clamp via least/greatest, exact decimal sum of the clamped values.
    // Boundaries are rounded to 6 dp BEFORE clamping on BOTH engines so
    // the clamp compares the same doubles; quantities are small integers
    // with heavy ties, so the interpolated percentiles are exact in
    // binary (the agg_percentile precedent) and the round is a no-op
    // safety net, not a semantics change.
    "agg_winsorize" -> ((s, sf) => {
      val li = t(s, sf, "lineitem")
      val q = li.groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.05)"), 6).as("p05"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"))
      li.join(broadcast(q), "l_returnflag")
        .withColumn("wq", least(greatest(col("l_quantity"), col("p05")), col("p95")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          T.dsum(col("wq"), 6).as("w_sum"),
          round(T.dsum(col("wq"), 6) / count(lit(1)), 6).as("w_avg"))
        .orderBy("l_returnflag")
    }),

    // §2.4 pivot to the quanta-matrix shape (explicit pivot values)
    "agg_pivot" -> ((s, sf) => {
      val p = t(s, sf, "events").groupBy("user_id")
        .pivot("event_type", pivotTypes).count()
      p.select(col("user_id") +: pivotTypes.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy("user_id")
    }),

    // §2.5 ranking family: rank/dense_rank on the value ordering alone,
    // row_number with a unique tiebreak
    "win_rank" -> ((s, sf) => {
      val wv = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      val wu = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, sf, "customer").select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        rank().over(wv).cast("long").as("rnk"),
        dense_rank().over(wv).cast("long").as("drnk"),
        row_number().over(wu).cast("long").as("rn"))
        .orderBy("c_custkey")
    }),

    // §2.5 relative-position windows: percent_rank and cume_dist share one
    // per-segment exchange; both are exact rationals of ranks/counts, so
    // round(6) is engine-stable
    "win_percent_rank" -> ((s, sf) => {
      val wv = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      t(s, sf, "customer").select(col("c_custkey"), col("c_mktsegment"),
        round(percent_rank().over(wv), 6).as("pr"),
        round(cume_dist().over(wv), 6).as("cd"))
        .orderBy("c_custkey")
    }),

    // §2.5 lag/lead: inter-event gap in microseconds per user
    "win_lag_lead" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, sf, "events").select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))).as("next_us"))
        .orderBy("event_id")
    }),

    // §2.5 running total (exact decimal accumulation inside the frame)
    "win_running" -> ((s, sf) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, sf, "orders").select(col("o_orderkey"), col("o_custkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("cum_spent"))
        .orderBy("o_orderkey")
    }),

    // §2.5 value-range frame: ±1000 of each order's totalprice
    "win_range_frame" -> ((s, sf) =>
      t(s, sf, "orders").selectExpr("o_orderkey",
        """count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
           RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS near_cnt""")
        .orderBy("o_orderkey")),

    // §2.5 event-TIME range frame (round 10): per user at each event, how
    // many events and how much value landed in the trailing hour — the
    // rate-limiter / burst-detection window. The frame is keyed on TIME
    // (epoch µs RANGE), not row counts: a burst of 50 events in a minute
    // all share one frame edge, which ROWS frames cannot express. Equal-µs
    // peers are included in both engines by RANGE semantics, so the result
    // is deterministic without a unique tiebreak. One user-hash exchange +
    // one sort; the decimal frame sum keeps values exact.
    "win_time_range" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0)
      t(s, sf, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_1h"))
        .orderBy("event_id")
    }),

    // §2.5 deterministic equal-frequency quartiles
    "win_ntile" -> ((s, sf) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, sf, "customer").select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_custkey")
    }),

    // §2.4 unpivot / melt — the inverse of agg_pivot (wide measures →
    // long (key, measure, value) rows), via the typed Dataset.unpivot
    // API; narrow (each row expands in place, no shuffle before the
    // ordering). The measure name column makes the melt lossless.
    // r18 note: the sort-below-the-melt restructure (range-sort 600k
    // source rows, melt after, drop the 2.4M-row sort) was attempted and
    // REVERTED: (l_orderkey, l_linenumber) is NOT unique in this corpus,
    // so the declared ORDER BY has tie classes and the oracle hash pins
    // the incumbent tie order — deliberately left alone (OPTIMIZATION_r18).
    "agg_unpivot" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "measure", valueColumnName = "v")
        .orderBy("l_orderkey", "l_linenumber", "measure")),

    // §2.4 bitwise aggregates (bit_and / bit_or / bit_xor are commutative
    // and associative, so map-side partial aggregation applies and the
    // result is merge-order independent — oracle-able unlike mode())
    "agg_bitwise" -> ((s, sf) =>
      t(s, sf, "lineitem").groupBy("l_returnflag")
        .agg(expr("bit_and(l_orderkey)").as("band"),
          expr("bit_or(l_orderkey)").as("bor"),
          expr("bit_xor(l_orderkey)").as("bxor"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // §2.4 boolean aggregates (round 8): count_if + bool_and/bool_or —
    // all commutative/associative, so map-side partial aggregation
    // applies and the one-bit agg buffers shuffle instead of rows
    "agg_bool" -> ((s, sf) =>
      t(s, sf, "orders").groupBy("o_orderpriority")
        .agg(count_if(col("o_totalprice") > 150000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_orderstatus") === "F").as("any_f"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // §2.4 heavy hitters via the built-in Count–Min sketch aggregate
    // (Cormode & Muthukrishnan 2005): one distributed mergeable-sketch
    // pass, then the driver queries the 31-word vocabulary against the
    // sketch — the same designed, bounded driver boundary as the CAIM
    // histogram. Deterministic for a fixed seed (cell-wise-add merge is
    // commutative), but DuckDB has no CMS → rows-only declared; the test
    // suite pins the ε-overestimate guarantee against exact counts.
    "agg_heavy_hitters" -> ((s, sf) => {
      // cached: the sketch pass and the vocabulary pass are two actions
      // over the same exploded-token frame — without the persist the
      // split+explode scan of the corpus would run twice
      val toks = t(s, sf, "documents").select(explode(split(col("text"), " ")).as("w"))
        .persist()
      try {
        val skBytes = toks
          .select(expr("count_min_sketch(w, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(skBytes))
        // the query dictionary: distinct tokens, CAPPED — on this corpus
        // that is all 31 words, but a real corpus has unbounded
        // vocabulary, and a sketch query set must be a bounded dictionary
        // (top candidates from a sampling pass, a known lexicon, …), so
        // the cap is part of the operator's contract, not a test shortcut.
        // Ordered before the cap: limit without ordering is
        // nondeterministic, and the declared row set must be stable
        // run-to-run once the vocabulary exceeds the cap.
        val vocab = toks.distinct().orderBy("w").limit(10000)
          .collect().map(_.getString(0))
        import s.implicits._
        vocab.map(w => (w, cms.estimateCount(w))).toSeq.toDF("w", "est")
      } finally toks.unpersist(blocking = false) // result is driver data — no lineage on toks
    }),

    // §2.4 deterministic mode: most frequent quantity per return flag,
    // smallest value on ties — count + window argmax, NOT the built-in
    // mode() whose tie-break is engine-dependent (the determinism rule
    // that makes this oracle-able where mode() is not)
    "agg_mode" -> ((s, sf) => {
      val cnt = t(s, sf, "lineitem").groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      cnt.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    }),

    // §2.5 value-offset windows: first/last/nth over an explicit full
    // frame (last_value under the default frame is the famous footgun —
    // it returns the CURRENT row; the unbounded-following frame makes it
    // the true partition extremum, and the unique (price, key) ordering
    // makes all three engine-stable)
    "win_first_last" -> ((s, sf) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, sf, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        first(col("o_orderkey")).over(w).as("top_key"),
        last(col("o_orderkey")).over(w).as("bottom_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("runnerup_key"))
        .orderBy("o_orderkey")
    }),

    // §2.5 top-3 orders per customer (rank-filter top-k)
    "topk_per_group" -> ((s, sf) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, sf, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // §2.12 scalar UDF (clamp)
    "udf_scalar" -> ((s, sf) => {
      val clampUdf = udf(Udx.clamp)
      t(s, sf, "events").select(col("event_id"),
        clampUdf(col("value"), lit(10.0), lit(400.0)).as("clamped"))
        .orderBy("event_id")
    }),

    // §2.12 typed Aggregator UDAF: quantity-weighted mean price
    "udaf_aggregator" -> ((s, sf) =>
      t(s, sf, "lineitem").groupBy("l_returnflag")
        .agg(round(Udx.weightedMean(col("l_extendedprice"), col("l_quantity")), 4).as("wmean_price"))
        .orderBy("l_returnflag")),

    // §2.12 table-generating function: token + 0-based position per doc
    "udtf_posexplode" -> ((s, sf) =>
      t(s, sf, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")),

    // §2.4 exact Pearson correlation per group (round 9) — the
    // feature-screening statistic, from EXACT decimal cross/power sums
    // (Σx, Σy, Σx², Σy², Σxy) exactly like agg_moments: the built-in
    // corr() merges co-moment buffers in partial order (last-bit
    // nondeterministic across partitionings), the raw-sum form is
    // order-independent exactly, and the closed-form finish is one
    // identical double expression on both engines. One map-side-combined
    // aggregate, one 3-row shuffle. l_quantity/l_extendedprice carry ≤2
    // decimals so the decimal products are exact.
    "agg_corr" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        // r19: the exact decimal sums/cross-sums ride the 128-bit
        // aggregates (graft_dsum / graft_dxsum) — value-identical to the
        // declared sum(CAST(..) [* CAST(..)]).cast("double") chains
        // (ExactSumSpec pins both), with no per-row string-path cast,
        // BigDecimal multiply, or decimal(38) buffer adds
        .agg(count(lit(1)).as("n"),
          graft.T.dsum(col("l_quantity"), 2).as("sx"),
          graft.T.dsum(col("l_extendedprice"), 2).as("sy"),
          graft.T.dxsum(col("l_quantity"), col("l_quantity"), 2, 2).as("sxx"),
          graft.T.dxsum(col("l_extendedprice"), col("l_extendedprice"), 2, 2)
            .as("syy"),
          graft.T.dxsum(col("l_quantity"), col("l_extendedprice"), 2, 2)
            .as("sxy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")),

    // §2.4 grouped least-squares regression (round 12) — the per-segment
    // trend fit (price-per-unit slope by return flag) that completes the
    // sufficient-statistics family (agg_corr = direction, this = the
    // LINE): ŷ = slope·x + intercept with slope = (nΣxy−ΣxΣy)/(nΣx²−
    // (Σx)²), the intercept in its closed cross-moment form (ΣyΣx² −
    // ΣxΣxy)/(nΣx²−(Σx)²) — never derived FROM the rounded slope — and
    // r² as the squared correlation. agg_corr's discipline end-to-end:
    // the built-in regr_slope/regr_* merge co-moment buffers in partition
    // order (last-bit nondeterministic), so the raw sums are exact
    // DECIMAL (order-independent) and each coefficient is ONE identical
    // double chain on both engines. One map-side-combined aggregate; the
    // 3-row finish is free.
    "agg_ols" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        // r19: 128-bit exact sums/cross-sums (see agg_corr) — identical
        // values to the declared decimal chains, none of the per-row cost
        .agg(count(lit(1)).as("n"),
          graft.T.dsum(col("l_quantity"), 2).as("sx"),
          graft.T.dsum(col("l_extendedprice"), 2).as("sy"),
          graft.T.dxsum(col("l_quantity"), col("l_quantity"), 2, 2).as("sxx"),
          graft.T.dxsum(col("l_extendedprice"), col("l_extendedprice"), 2, 2)
            .as("syy"),
          graft.T.dxsum(col("l_quantity"), col("l_extendedprice"), 2, 2)
            .as("sxy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") * col("sxx") - col("sx") * col("sxy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("intercept"),
          round(((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
        .orderBy("l_returnflag")),

    // §2.4 one-way ANOVA (round 12) — the k-group mean-difference test
    // completing the inference family (agg_ttest = 2 groups, this = k):
    // F = (SSB/(k−1)) / (SSW/(n−k)) over price by return flag. Float
    // discipline is the point here: SSB is computed as Σ n_g(m_g − m)² —
    // per-group terms from EXACT decimal sums through one identical
    // division chain, so each term is bit-identical cross-engine and the
    // final Σ over k=3 terms carries ~1 ulp of association noise against
    // a 2dp round (safe by 5 orders). The textbook Σs²/n − (Σs)²/n form
    // is NOT hash-safe: it cancels ~6 significant digits of two 1e14
    // sums whose last bits are partial-merge-order dependent, amplifying
    // order noise past the rounding grid (measured ±0.06 on this corpus).
    // SSW feeds F only as a full-precision ratio operand (relative noise
    // ~3e-16), never a rounded output column.
    "agg_anova" -> ((s, sf) => {
      val g = t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        // r19: 128-bit exact sums (see agg_corr) — value-identical
        .agg(count(lit(1)).as("ng"),
          graft.T.dsum(col("l_extendedprice"), 2).as("sg"),
          graft.T.dxsum(col("l_extendedprice"), col("l_extendedprice"), 2, 2)
            .as("ssg"))
      val tot = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("nt"),
        sum(col("sg").cast("decimal(28,2)")).cast("double").as("st"))
      g.crossJoin(broadcast(tot))
        .select(col("k"), col("nt"),
          (col("ng") * pow(col("sg") / col("ng") - col("st") / col("nt"), 2)).as("tb"),
          (col("ssg") - col("sg") * col("sg") / col("ng")).as("tw"))
        .groupBy("k", "nt")
        .agg(sum(col("tb")).as("ssb"), sum(col("tw")).as("ssw"))
        .select(col("k"), col("nt").as("n"),
          round(col("ssb"), 2).as("ssb"),
          round((col("ssb") / (col("k") - 1)) / (col("ssw") / (col("nt") - col("k"))), 6)
            .as("f"))
    }),

    // §2.4 fixed-width histogram (round 9) — the distribution-profiling
    // primitive behind any QC dashboard: integer bin = floor(x / width)
    // (engine-portable — no width_bucket in DuckDB 1.0, and floor of an
    // exact-2-dp double over a power-of-ten width is float-safe), count
    // + exact observed [lo, hi] per bin. One map-side-combined hash agg;
    // bins in flight ∝ distinct bins, never rows.
    "agg_hist" -> ((s, sf) =>
      t(s, sf, "orders")
        .groupBy(floor(col("o_totalprice") / lit(50000)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("bin")),

    // §2.4 share-of-total / ratio-to-report (round 9) — the window-over-
    // aggregate composition every revenue dashboard runs: group to
    // (status, priority) cells, then each cell's share of its status
    // total via a window sum OVER THE AGGREGATED result (15 rows at any
    // SF — the window never touches fact rows, so its exchange is free).
    // Numerator and denominator are both exact decimal sums; one IEEE
    // division at the end is bit-identical cross-engine.
    "agg_ratio" -> ((s, sf) => {
      val a = t(s, sf, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      a.select(col("status"), col("priority"), col("n"),
          round(col("rev").cast("double"), 2).as("revenue"),
          round(col("rev").cast("double") /
            sum(col("rev")).over(Window.partitionBy("status")).cast("double"),
            6).as("share"))
        .orderBy("status", "priority")
    }),

    // §2.4 multi-column exact distinct counts (round 9) — the
    // cardinality-profiling shape that exercises Spark's Expand operator:
    // two COUNT(DISTINCT ...) on different columns + plain aggregates in
    // ONE statement. Spark rewrites to an Expand (3 rows per input: one
    // per distinct-group + one for the plain aggs) feeding a two-level
    // aggregate — one logical pass over the fact table instead of a
    // self-join per distinct column.
    "agg_distinct_multi" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"),
          round(graft.T.dsum(col("l_quantity"), 2), 2).as("sum_qty"))
        .orderBy("l_returnflag")),

    // §2.4 robust dispersion: median absolute deviation (round 9) — the
    // outlier-resistant complement to ts_zscore's mean/σ: per-group
    // median, then the median of |x − median|. Two exact interpolated
    // percentile aggregations (the agg_percentile contract) bridged by a
    // 3-row broadcast of the group medians — the fact side is scanned
    // twice but never shuffled beyond its two group-key aggregates.
    "agg_mad" -> ((s, sf) => {
      val o = t(s, sf, "orders").select(col("o_orderstatus"), col("o_totalprice"))
      val m = o.groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med0"))
      o.join(broadcast(m), "o_orderstatus")
        .select(col("o_orderstatus"), col("med0"),
          abs(col("o_totalprice") - col("med0")).as("ad"))
        .groupBy("o_orderstatus")
        .agg(round(max(col("med0")), 6).as("med"),
          round(expr("percentile(ad, 0.5)"), 6).as("mad"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // exact WEIGHTED median (round 14) — the aggregation primitive
    // percentile()/median() can't express (every row counts equally
    // there): the smallest value whose cumulative weight reaches half
    // the group's total — the lower weighted median (Edgeworth 1888),
    // the "median order price weighted by line count" class of question.
    // One group-keyed sort window for the cumulative weight + the
    // group-total window on the SAME partitioning (one exchange serves
    // both), then 2·cum ≥ total selects an upward-closed suffix of the
    // (value, key) order, whose min IS the first qualifying row — exact
    // integer weight arithmetic, no float threshold anywhere; the
    // tiebreak key makes both engines cut identically.
    "agg_weighted_median" -> ((s, sf) => {
      val w1 = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wg = Window.partitionBy("o_orderpriority")
      t(s, sf, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), (pmod(col("o_orderkey"), lit(5)) + 1).as("wt"))
        .withColumn("cw", sum(col("wt")).over(w1))
        .withColumn("tw", sum(col("wt")).over(wg))
        .where(col("cw") * 2 >= col("tw"))
        .groupBy("o_orderpriority")
        .agg(min(struct(col("o_totalprice"), col("o_orderkey"))).as("f"),
          max(col("tw")).as("total_w"))
        .select(col("o_orderpriority"), col("f.o_totalprice").as("wmedian"),
          col("total_w"))
        .orderBy("o_orderpriority")
    }),

    // §2.4 string aggregation (round 9) — LISTAGG, the report-friendly
    // collapse of a group's values into one delimited string: per
    // priority the sorted distinct status set. collect_set's arrival
    // order is partition-dependent, so the sort happens explicitly
    // (array_sort) before the join — determinism comes from the data,
    // never the schedule.
    "agg_listagg" -> ((s, sf) =>
      t(s, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // §2.4 calendar-month rollup (round 9) — real calendar semantics
    // (month lengths, year boundaries) where the events tier deliberately
    // uses pure integer day/week ids: date_trunc('month') is the one
    // calendar primitive both engines define identically on a timestamp.
    "ts_monthly" -> ((s, sf) =>
      t(s, sf, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
        .agg(count(lit(1)).as("n"),
          round(graft.T.dsum(col("o_totalprice"), 2), 2).as("revenue"))
        .orderBy("m")),

    // §2.4 hypothesis testing (round 9) — Welch's two-sample t statistic
    // per order priority against its complement ("does this segment
    // spend differently?"), the A/B-test primitive computed entirely
    // from MERGEABLE sufficient statistics: per-group (n, Σc, Σc²) over
    // integer cents (2dp price × 100, rint'd — exact), complement stats
    // by subtracting the group row from the broadcast global totals
    // (decimal arithmetic, exact), then ONE identical chain of double
    // ops on both engines (ts_zscore discipline: exact sums in, one
    // closed formula out, round before compare). The t statistic is
    // scale-invariant so cents never need un-scaling; only the reported
    // mean divides by 100. One scan, one 5-row broadcast — no second
    // pass, no window.
    "agg_ttest" -> ((s, sf) => {
      val g = t(s, sf, "orders")
        .select(col("o_orderpriority"),
          expr("CAST(rint(o_totalprice * 100) AS BIGINT)").as("c"))
        .groupBy("o_orderpriority")
        // r19: the cents sums ride the 128-bit aggregate finished as
        // DECIMAL(38,0) (graft_dsumd) — same exact values and types as
        // the old sum(CAST(.. AS DECIMAL(38,0))) without its per-row
        // non-compact buffer adds; c and c*c fit 18 digits per row by
        // column bound (price < 1e7 cents, c² < 1e14)
        .agg(count(lit(1)).as("n"),
          graft.T.dsumDec(col("c").cast("decimal(18,0)")).as("sv"),
          graft.T.dsumDec((col("c") * col("c")).cast("decimal(18,0)")).as("sq"))
      val tot = g.agg(sum(col("n")).as("tn"),
        sum(col("sv")).as("tsv"), sum(col("sq")).as("tsq"))
      g.crossJoin(broadcast(tot))
        .withColumn("mu", col("sv").cast("double") / col("n"))
        .withColumn("ex2", col("sq").cast("double") / col("n"))
        .withColumn("nc", col("tn") - col("n"))
        .withColumn("muc", (col("tsv") - col("sv")).cast("double") / col("nc"))
        .withColumn("ex2c", (col("tsq") - col("sq")).cast("double") / col("nc"))
        .select(col("o_orderpriority"), col("n"),
          round(col("mu") / 100.0, 2).as("mean"),
          round((col("mu") - col("muc")) /
            sqrt((col("ex2") - col("mu") * col("mu")) * col("n")
                / (col("n") - lit(1)) / col("n") +
              (col("ex2c") - col("muc") * col("muc")) * col("nc")
                / (col("nc") - lit(1)) / col("nc")), 6)
            .as("t"))
        .orderBy("o_orderpriority")
    }),

    // §2.5 distribution window functions (round 9): cume_dist — the
    // empirical CDF position, i.e. percentile features computed in
    // place — and nth_value with an explicit running frame. The
    // compound (acctbal, custkey) ordering makes every row its own
    // peer group, so cume_dist is rank/n exactly and deterministic on
    // both engines; one segment-hash exchange, one sort, both
    // functions share it.
    "win_distribution" -> ((s, sf) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, sf, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("c_name"), 3)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("third_name"))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "quality_expectations" ->
      """WITH checks AS (
           SELECT 'orders_pk_unique' AS check_name,
               count(*) - count(DISTINCT o_orderkey) AS n FROM orders
           UNION ALL SELECT 'orders_priority_accepted',
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
                 '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 1 ELSE 0 END)
             FROM orders
           UNION ALL SELECT 'lineitem_fk_orders', count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
               WHERE o.o_orderkey = l.l_orderkey)
           UNION ALL SELECT 'customer_balance_in_range',
               sum(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000
                 THEN 1 ELSE 0 END) FROM customer
           UNION ALL SELECT 'customer_balance_nonnegative',
               sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) FROM customer
           UNION ALL SELECT 'events_value_nonnull',
               sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) FROM events
           UNION ALL SELECT 'events_ts_min_bound',
               sum(CASE WHEN ts < TIMESTAMP '2024-01-01' THEN 1 ELSE 0 END)
             FROM events)
         SELECT check_name, CAST(n AS BIGINT) AS n_violations,
           n = 0 AS passed
         FROM checks ORDER BY check_name""",
    // ground truth for the bitmap pipeline: plain exact distinct
    "agg_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "agg_cdf" ->
      """WITH byv AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
             AS v_cents, count(*) AS c FROM orders GROUP BY 1),
           tot AS (SELECT sum(c) AS n FROM byv)
         SELECT v_cents,
           CAST(sum(c) OVER (ORDER BY v_cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_n,
           CAST((CAST(sum(c) OVER (ORDER BY v_cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             * 1000000) // CAST((SELECT n FROM tot) AS BIGINT) AS BIGINT)
             AS cdf_ppm
         FROM byv ORDER BY v_cents""",
    "probe_decimal" ->
      """SELECT 'probe' AS k, CAST(1.2345 AS DECIMAL(18,4)) AS d,
           CAST(12345 AS BIGINT) AS d_ppm""",
    "agg_ks_test" ->
      """WITH o AS (SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS v,
             epoch_us(o_orderdate) AS us FROM orders),
           mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM o),
           tagged AS (SELECT v, CASE WHEN us < (SELECT m FROM mid)
               THEN 1 ELSE 0 END AS b FROM o),
           byv AS (SELECT v, sum(b) AS c1, sum(1 - b) AS c2
             FROM tagged GROUP BY 1),
           tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM byv),
           cdf AS (SELECT v,
             sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS f1,
             sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS f2
             FROM byv)
         SELECT CAST(max(n1) AS BIGINT) AS n_base,
           CAST(max(n2) AS BIGINT) AS n_cur,
           round(max(abs(CAST(f1 AS DOUBLE)/n1 - CAST(f2 AS DOUBLE)/n2)), 6) AS ks_d
         FROM cdf CROSS JOIN tot""",
    "agg_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR),
               1, 1) AS BIGINT) AS digit
           FROM orders WHERE o_totalprice >= 1),
           c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
           t AS (SELECT sum(n) AS nt FROM c),
           digits AS (SELECT unnest(range(1, 10)) AS digit)
         SELECT digit, CAST(coalesce(n, 0) AS BIGINT) AS n,
           round(coalesce(n, 0) * 1.0 / nt, 6) AS p_obs,
           round(log10(1.0 + 1.0/digit), 6) AS p_benford,
           round(pow(coalesce(n, 0) * 1.0 / nt - log10(1.0 + 1.0/digit), 2)
                 / log10(1.0 + 1.0/digit) * nt, 6) AS chi2_term
         FROM digits LEFT JOIN c USING (digit) CROSS JOIN t ORDER BY digit""",
    "agg_gini" ->
      """WITH x AS (SELECT c.c_mktsegment AS seg,
             CAST(o.o_totalprice AS DECIMAL(18,4)) AS v, o.o_orderkey AS k
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           r AS (SELECT seg, v,
             row_number() OVER (PARTITION BY seg ORDER BY v, k) AS rn FROM x),
           a AS (SELECT seg, count(*) AS n, sum(v) AS sv,
             sum(CAST(rn AS DECIMAL(18,0)) * v) AS srv FROM r GROUP BY 1)
         SELECT seg, CAST(n AS BIGINT) AS n,
           round(CAST(sv AS DOUBLE), 2) AS total,
           round((2.0 * CAST(srv AS DOUBLE) - (n + 1.0) * CAST(sv AS DOUBLE))
                 / (n * CAST(sv AS DOUBLE)), 6) AS gini
         FROM a ORDER BY seg""",
    "profile_drift" ->
      """WITH o AS (SELECT o_totalprice AS tp, epoch_us(o_orderdate) AS us FROM orders),
           mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM o),
           base AS (SELECT tp FROM o CROSS JOIN mid WHERE us < m),
           cur AS (SELECT tp FROM o CROSS JOIN mid WHERE us >= m),
           q AS (SELECT quantile_cont(tp, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
                 FROM base),
           bb AS (SELECT 1 + len(list_filter(e, x -> tp > x)) AS bin
                  FROM base CROSS JOIN q),
           cb AS (SELECT 1 + len(list_filter(e, x -> tp > x)) AS bin
                  FROM cur CROSS JOIN q),
           bc AS (SELECT bin, count(*) AS n_base FROM bb GROUP BY 1),
           cc AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY 1),
           tot AS (SELECT (SELECT count(*) FROM base) AS nb,
                          (SELECT count(*) FROM cur) AS nc),
           bins AS (SELECT unnest(range(1, 11)) AS bin)
         SELECT CAST(bin AS BIGINT) AS bin,
           CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
           round((coalesce(n_base, 0) + 0.5)/(nb + 5.0), 6) AS p_base,
           round((coalesce(n_cur, 0) + 0.5)/(nc + 5.0), 6) AS p_cur,
           round(((coalesce(n_base, 0) + 0.5)/(nb + 5.0)
                  - (coalesce(n_cur, 0) + 0.5)/(nc + 5.0))
                 * ln(((coalesce(n_base, 0) + 0.5)/(nb + 5.0))
                      /((coalesce(n_cur, 0) + 0.5)/(nc + 5.0))), 6) AS psi_term
         FROM bins LEFT JOIN bc USING (bin) LEFT JOIN cc USING (bin)
         CROSS JOIN tot ORDER BY bin""",
    "profile_table" ->
      """SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           count(*) - count(doc_id) AS n_null, count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
         FROM documents
         UNION ALL
         SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
         UNION ALL
         SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
         UNION ALL
         SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
         ORDER BY col_name""",
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
         CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
         count(*) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "agg_stats" ->
      """WITH a AS (SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) sq,
           CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(28,4))) AS DOUBLE) sqq,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) sp,
           CAST(sum(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) spp,
           CAST(sum(CAST(l_quantity*l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) spq
         FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           round(sq/n, 6) AS mean_qty,
           round(sqrt((sqq - sq*sq/n)/(n-1)), 6) AS std_qty,
           round((spq - sq*sp/n) / (sqrt(sqq - sq*sq/n) * sqrt(spp - sp*sp/n)), 6) AS corr_qp
         FROM a ORDER BY l_returnflag""",
    "agg_mahalanobis" ->
      """WITH li AS (SELECT l_returnflag AS g,
             CAST(l_quantity AS DECIMAL(9,2)) AS x,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS y FROM lineitem),
           s1 AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             FROM li GROUP BY 1),
           s2 AS (SELECT g, n,
               CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
               sxx, syy, sxy FROM s1),
           m AS (SELECT g, n, mx, my,
               CAST(sxx AS DOUBLE) / n - mx * mx AS vxx,
               CAST(syy AS DOUBLE) / n - my * my AS vyy,
               CAST(sxy AS DOUBLE) / n - mx * my AS vxy FROM s2),
           md AS (SELECT g, n, mx, my, vxx, vyy, vxy,
               vxx * vyy - vxy * vxy AS det FROM m),
           d AS (SELECT li.g,
               (CAST(li.x AS DOUBLE) - md.mx) AS dx,
               (CAST(li.y AS DOUBLE) - md.my) AS dy,
               md.vxx, md.vyy, md.vxy, md.det
             FROM li JOIN md ON li.g = md.g),
           d2 AS (SELECT g,
               (dx * dx * vyy - 2.0 * dx * dy * vxy + dy * dy * vxx) / det
                 AS d2 FROM d)
         SELECT g, count(*) AS n,
           CAST(sum(CASE WHEN d2 > 13.815511 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(max(d2), 6) AS max_d2
         FROM d2 GROUP BY 1 ORDER BY g""",
    "agg_tukey" ->
      """WITH q AS (SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.25), 6) AS q1,
             round(quantile_cont(l_quantity, 0.75), 6) AS q3
           FROM lineitem GROUP BY 1),
           f AS (SELECT l_returnflag, q1, q3,
             round(q3 - q1, 6) AS iqr,
             round(q1 - 1.5 * round(q3 - q1, 6), 6) AS lo,
             round(q3 + 1.5 * round(q3 - q1, 6), 6) AS hi FROM q)
         SELECT l.l_returnflag, count(*) AS n,
           max(f.q1) AS q1, max(f.q3) AS q3,
           max(f.lo) AS lo, max(f.hi) AS hi,
           CAST(sum(CASE WHEN l.l_quantity < f.lo OR l.l_quantity > f.hi
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
         GROUP BY 1 ORDER BY l.l_returnflag""",
    "agg_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.25), 6) AS p25,
         round(quantile_cont(l_quantity, 0.5), 6) AS p50,
         round(quantile_cont(l_quantity, 0.95), 6) AS p95
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_moments" ->
      """WITH a AS (SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(23,0))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(23,0))) AS DOUBLE) AS s2,
             CAST(sum(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(23,0)))
                  AS DOUBLE) AS s3,
             CAST(sum(CAST(l_quantity*l_quantity*l_quantity*l_quantity
                  AS DECIMAL(33,0))) AS DOUBLE) AS s4
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*pow(s1/n, 3))
                 / pow(s2/n - pow(s1/n, 2), 1.5), 6) AS skewness,
           round((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*pow(s1/n, 2)*(s2/n)
                  - 3.0*pow(s1/n, 4))
                 / pow(s2/n - pow(s1/n, 2), 2) - 3.0, 6) AS kurtosis
         FROM a ORDER BY l_returnflag""",
    "agg_winsorize" ->
      """WITH q AS (SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.05), 6) AS p05,
             round(quantile_cont(l_quantity, 0.95), 6) AS p95
           FROM lineitem GROUP BY l_returnflag)
         SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n, q.p05, q.p95,
           CAST(sum(CAST(least(greatest(l_quantity, q.p05), q.p95)
                         AS DECIMAL(18,6))) AS DOUBLE) AS w_sum,
           round(CAST(sum(CAST(least(greatest(l_quantity, q.p05), q.p95)
                         AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS w_avg
         FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
         GROUP BY l.l_returnflag, q.p05, q.p95 ORDER BY l.l_returnflag""",
    "agg_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS cust_cnt, count(*) AS cnt
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
         count(*) AS cnt, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""",
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pr,
         count(*) AS cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY st, pr""",
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pr,
         count(*) AS cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY GROUPING SETS ((o_orderstatus),(o_orderpriority),())
         ORDER BY st, pr""",
    "agg_collect_list" ->
      """SELECT o_custkey, string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "agg_pivot" ->
      """SELECT user_id,
         count(*) FILTER (WHERE event_type='click') AS click,
         count(*) FILTER (WHERE event_type='error') AS error,
         count(*) FILTER (WHERE event_type='purchase') AS purchase,
         count(*) FILTER (WHERE event_type='signup') AS signup,
         count(*) FILTER (WHERE event_type='view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "win_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
         rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
         dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer ORDER BY c_custkey""",
    "win_percent_rank" ->
      """SELECT c_custkey, c_mktsegment,
         round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC), 6) AS pr,
         round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC), 6) AS cd
         FROM customer ORDER BY c_custkey""",
    "agg_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, v FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS v FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, measure""",
    "agg_bitwise" ->
      """SELECT l_returnflag,
         bit_and(l_orderkey) AS band, bit_or(l_orderkey) AS bor,
         bit_xor(l_orderkey) AS bxor, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_bool" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         bool_and(o_totalprice > 0) AS all_pos,
         bool_or(o_orderstatus = 'F') AS any_f,
         CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
           SELECT l_returnflag, l_quantity, count(*) AS cnt,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY count(*) DESC, l_quantity ASC) AS rn
           FROM lineitem GROUP BY l_returnflag, l_quantity)
         WHERE rn = 1 ORDER BY l_returnflag""",
    "win_first_last" ->
      """SELECT o_orderkey, o_orderstatus,
         first_value(o_orderkey) OVER w AS top_key,
         last_value(o_orderkey) OVER w AS bottom_key,
         nth_value(o_orderkey, 2) OVER w AS runnerup_key
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""",
    "win_lag_lead" ->
      """SELECT event_id, user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_us
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "win_running" ->
      """SELECT o_orderkey, o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spent
         FROM orders ORDER BY o_orderkey""",
    "win_range_frame" ->
      """SELECT o_orderkey,
         count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                        RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS near_cnt
         FROM orders ORDER BY o_orderkey""",
    "win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
         ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
         FROM customer ORDER BY c_custkey""",
    "win_time_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
         count(*) OVER w AS n_1h,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "udf_scalar" ->
      """SELECT event_id, least(greatest(value, 10.0), 400.0) AS clamped
         FROM events ORDER BY event_id""",
    "udaf_aggregator" ->
      """SELECT l_returnflag,
         round(sum(l_extendedprice*l_quantity)/sum(l_quantity), 4) AS wmean_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "udtf_posexplode" ->
      """SELECT doc_id, unnest(range(len(string_split(text,' ')))) AS pos,
         unnest(string_split(text,' ')) AS token
         FROM documents ORDER BY doc_id, pos""",
    "agg_corr" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((n*sxy - sx*sy)
                 / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS corr_qty_price
         FROM s ORDER BY l_returnflag""",
    "agg_ols" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
           round((sy*sxx - sx*sxy) / (n*sxx - sx*sx), 6) AS intercept,
           round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                 / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
         FROM s ORDER BY l_returnflag""",
    "agg_anova" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS ng,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sg,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ssg
           FROM lineitem GROUP BY 1),
           tot AS (SELECT count(*) AS k, sum(ng) AS nt,
             CAST(sum(CAST(sg AS DECIMAL(28,2))) AS DOUBLE) AS st FROM g),
           terms AS (SELECT k, nt,
             ng * pow(sg / ng - st / nt, 2) AS tb,
             ssg - sg * sg / ng AS tw
           FROM g CROSS JOIN tot),
           agg AS (SELECT k, nt, sum(tb) AS ssb, sum(tw) AS ssw
             FROM terms GROUP BY 1, 2)
         SELECT CAST(k AS BIGINT) AS k, CAST(nt AS BIGINT) AS n,
           round(ssb, 2) AS ssb,
           round((ssb / (k - 1)) / (ssw / (nt - k)), 6) AS f
         FROM agg""",
    "agg_hist" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(min(o_totalprice) AS DOUBLE), 2) AS lo,
           round(CAST(max(o_totalprice) AS DOUBLE), 2) AS hi
         FROM orders GROUP BY 1 ORDER BY 1""",
    "agg_listagg" ->
      """SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "ts_monthly" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
         FROM orders GROUP BY 1 ORDER BY 1""",
    "agg_ttest" ->
      """WITH o AS (SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
           g AS (SELECT o_orderpriority, count(*) AS n,
               sum(c) AS sv, sum(c * c) AS sq FROM o GROUP BY 1),
           tot AS (SELECT sum(n) AS tn, sum(sv) AS tsv, sum(sq) AS tsq FROM g),
           m AS (SELECT o_orderpriority, n,
               CAST(sv AS DOUBLE) / n AS mu,
               CAST(sq AS DOUBLE) / n AS ex2,
               tn - n AS nc,
               CAST(tsv - sv AS DOUBLE) / (tn - n) AS muc,
               CAST(tsq - sq AS DOUBLE) / (tn - n) AS ex2c
             FROM g, tot)
         SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           round(mu / 100.0, 2) AS mean,
           round((mu - muc) / sqrt((ex2 - mu * mu) * n / (n - 1) / n
             + (ex2c - muc * muc) * nc / (nc - 1) / nc), 6) AS t
         FROM m ORDER BY 1""",
    "agg_ratio" ->
      """WITH a AS (SELECT o_orderstatus AS status, o_orderpriority AS priority,
             count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1, 2)
         SELECT status, priority, CAST(n AS BIGINT) AS n,
           round(CAST(rev AS DOUBLE), 2) AS revenue,
           round(CAST(rev AS DOUBLE)
                 / CAST(sum(rev) OVER (PARTITION BY status) AS DOUBLE), 6)
             AS share
         FROM a ORDER BY 1, 2""",
    "agg_distinct_multi" ->
      """SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_weighted_median" ->
      """WITH o AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
               o_orderkey % 5 + 1 AS wt FROM orders),
           c AS (SELECT *,
               sum(wt) OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS cw,
               sum(wt) OVER (PARTITION BY o_orderpriority) AS tw
             FROM o),
           f AS (SELECT o_orderpriority, o_totalprice, tw,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey) AS rn
             FROM c WHERE cw * 2 >= tw)
         SELECT o_orderpriority, o_totalprice AS wmedian,
           CAST(tw AS BIGINT) AS total_w
         FROM f WHERE rn = 1 ORDER BY o_orderpriority""",
    "agg_mad" ->
      """WITH m AS (SELECT o_orderstatus, median(o_totalprice) AS med0
             FROM orders GROUP BY 1),
           d AS (SELECT o.o_orderstatus, med0,
               abs(o_totalprice - med0) AS ad
             FROM orders o JOIN m USING (o_orderstatus))
         SELECT o_orderstatus, round(CAST(max(med0) AS DOUBLE), 6) AS med,
           round(CAST(median(ad) AS DOUBLE), 6) AS mad,
           CAST(count(*) AS BIGINT) AS n
         FROM d GROUP BY 1 ORDER BY 1""",
    "win_distribution" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey), 6) AS cd,
           nth_value(c_name, 3) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_name
         FROM customer ORDER BY c_mktsegment, c_acctbal, c_custkey"""
  )
}
