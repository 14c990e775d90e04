package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.T
import graft.T.{Q, t}

/** Event-analytics operators (round 9) — the product-analytics tier of the
  * engine surface: ordered funnels, cohort retention, and gap-filled
  * time-series resampling over the `events` table. All three are the
  * canonical warehouse workloads a corpus/user-events pipeline runs next
  * to its training-data passes, and all three stay exact and
  * hash-oracle-checkable.
  *
  * Scale posture, per query:
  *  - `events_funnel`: three unbounded window aggregates over ONE
  *    user-hash exchange (stage k's minimum is a per-partition constant
  *    stage k+1 references — no self-joins, no per-stage shuffles), then
  *    one map-side-combined groupBy on the same key.
  *  - `retention_cohort`: one agg for first-touch, one equi-join back on
  *    user_id (both sides hash on the same key), offsets by pure integer
  *    µs arithmetic — no calendar/week-boundary semantics to disagree
  *    cross-engine.
  *  - `ts_fill_gaps`: the dense day grid comes from explode(sequence)
  *    bounded by each user's OWN [min, max] day span — fan-out rides the
  *    time range, never the corpus; the left join lands on the same
  *    (user, day) key both sides already aggregate on.
  */
object Events {

  private val DayUs = 86400000000L
  private val WeekUs = 7L * DayUs

  /** Dense per-user daily grid with zero-fill — the kernel behind
    * `ts_fill_gaps` and the precondition for `ts_rolling_avg` (a ROWS
    * frame over a sparse series spans arbitrary wall-clock time; over the
    * densified grid, 7 rows ARE 7 days). Day ids are epoch-µs integer
    * division; the grid explode is bounded by each user's own span.
    */
  private def dailyGrid(s: org.apache.spark.sql.SparkSession,
      sf: String): org.apache.spark.sql.DataFrame = {
    val e = t(s, sf, "events")
      .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"),
        col("value"))
    val daily = e.groupBy("user_id", "d")
      .agg(count(lit(1)).as("n_events"), T.dsum(col("value"), 2).as("sum_value"))
    val grid = e.groupBy("user_id")
      .agg(min(col("d")).as("dlo"), max(col("d")).as("dhi"))
      .select(col("user_id"), explode(sequence(col("dlo"), col("dhi"))).as("d"))
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("sum_value"), lit(0.0)), 2).as("sum_value"))
  }

  val queries: Map[String, Q] = Map(
    // ordered conversion funnel signup → view → purchase with a 24-hour
    // conversion window per stage: per user, the first signup, the first
    // view within (s1, s1+24h], and the first purchase within
    // (s2, s2+24h] — strictly ordered (each stage's clock starts at the
    // previous stage's event) and windowed, the semantics product
    // funnels mean and naive per-type minima get wrong. Three window
    // minima over one user partition; stage k's column is constant per
    // partition so stage k+1's conditional min can reference it without
    // a join.
    "events_funnel" -> ((s, sf) => {
      val byUser = Window.partitionBy("user_id")
      t(s, sf, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("s1",
          min(when(col("event_type") === "signup", col("us"))).over(byUser))
        .withColumn("s2",
          min(when(col("event_type") === "view" && col("us") > col("s1") &&
            col("us") <= col("s1") + lit(DayUs), col("us"))).over(byUser))
        .withColumn("s3",
          min(when(col("event_type") === "purchase" && col("us") > col("s2") &&
            col("us") <= col("s2") + lit(DayUs), col("us"))).over(byUser))
        .groupBy("user_id")
        .agg(min("s1").as("signup_us"), min("s2").as("view_us"),
          min("s3").as("purchase_us"))
        .withColumn("stage",
          when(col("purchase_us").isNotNull, 3)
            .when(col("view_us").isNotNull, 2)
            .when(col("signup_us").isNotNull, 1)
            .otherwise(0).cast("long"))
        .orderBy("user_id")
    }),

    // weekly cohort retention: users cohorted by their first-touch day
    // (first event of any type), counted distinct in each whole-week
    // offset any of their later events falls into. Week offsets are
    // integer µs arithmetic from the user's own first touch
    // ((us − t0) div week), not calendar weeks — exact, engine-portable,
    // and the per-user alignment retention curves actually want
    // (calendar weeks smear a Sunday first touch across two buckets).
    "retention_cohort" -> ((s, sf) => {
      val e = t(s, sf, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val first = e.groupBy("user_id").agg(min(col("us")).as("t0"))
      e.join(first, "user_id")
        .withColumn("cohort_day", expr(s"(t0 div $DayUs) * $DayUs"))
        .withColumn("wk", expr(s"(us - t0) div $WeekUs"))
        .groupBy("cohort_day", "wk")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "wk")
    }),

    // gap-filled daily resample: each user's event series densified to
    // one row per day over the user's own [first, last] day span, with
    // empty days materialized as explicit zero rows — the downsample/
    // zero-fill step every time-series feature pipeline runs before
    // windowed models, and the step a plain groupBy silently gets wrong
    // (missing days just don't exist). Day ids are epoch-µs integer
    // division; the grid is explode(sequence(lo, hi)) — fan-out bounded
    // by the span in days, never by event volume.
    "ts_fill_gaps" -> ((s, sf) =>
      dailyGrid(s, sf).orderBy("user_id", "d")),

    // trailing 7-day rolling mean per user over the DENSIFIED grid (round
    // 9) — the smoothing pass behind any per-entity trend feature, and
    // the reason ts_fill_gaps exists as a kernel: on the dense series a
    // 7-ROW frame is exactly 7 days, so the window is a rows frame (one
    // sort within the already-user-partitioned exchange), not a
    // range-join. The frame holds ≤7 bounded doubles; round(6) absorbs
    // the frame-sum order noise (fn_math discipline).
    "ts_rolling_avg" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-6, 0)
      dailyGrid(s, sf)
        .withColumn("avg7", round(avg(col("sum_value")).over(w), 6))
        .withColumn("n7", count(lit(1)).over(w))
        .orderBy("user_id", "d")
    }),

    // event-type transition matrix (round 9) — the first-order Markov
    // view of user behavior (what follows what), the input to
    // next-action models and funnel diagnostics. One lead() over each
    // user's time-ordered sequence (event_id is the unique tiebreak for
    // same-µs events, so the sequence — and the hash — is deterministic
    // on both engines), then a map-side-combined count on the (from,
    // to) pair. One user-hash exchange for the window + one tiny pair
    // shuffle; transitions never leave their user's partition.
    "events_markov" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      t(s, sf, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // second-order sequence patterns (round 9) — the top event-type
    // TRIGRAMS across all user journeys, where events_markov stops at
    // first-order pairs: two stacked lead()s over the same
    // (us, event_id)-ordered user window (ONE exchange + one sort feed
    // both — Spark collapses same-spec window functions into a single
    // Window operator), then a map-side-combined count and a bounded
    // top-20 (TakeOrderedAndProject; count-desc with full lexicographic
    // tiebreak so the cut is deterministic on both engines).
    "events_ngrams" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      t(s, sf, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type").as("t1"))
        .withColumn("t2", lead(col("t1"), 1).over(w))
        .withColumn("t3", lead(col("t1"), 2).over(w))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .groupBy("t1", "t2", "t3")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("t1"), col("t2"), col("t3"))
        .limit(20)
    }),

    // rolling z-score anomaly flag (round 9) — the per-entity outlier
    // detector over the DENSIFIED grid (ts_fill_gaps' kernel): each
    // (user, day)'s value scored against its own trailing 7-day mean/std,
    // flagged beyond 2σ. Mean and variance come from EXACT decimal frame
    // sums (Σv, Σv² over the 7-row frame — order-independent exactly;
    // a windowed stddev_samp would merge float buffers in frame order),
    // finished by one identical double formula on both engines; days
    // with fewer than 3 observations or zero variance emit NULL rather
    // than a fabricated score. Same single user-hash exchange + sort as
    // ts_rolling_avg; the two decimal frame sums share it.
    "ts_zscore" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-6, 0)
      dailyGrid(s, sf)
        .withColumn("n7", count(lit(1)).over(w))
        .withColumn("s1",
          sum(col("sum_value").cast("decimal(18,2)")).over(w).cast("double"))
        .withColumn("s2",
          sum((col("sum_value").cast("decimal(18,2)") *
            col("sum_value").cast("decimal(18,2)"))).over(w).cast("double"))
        .withColumn("vr", // guarded: ANSI mode throws on n7=1's zero divisor
          when(col("n7") >= 2,
            (col("s2") - col("s1") * col("s1") / col("n7")) / (col("n7") - lit(1))))
        .withColumn("z",
          when(col("n7") >= 3 && col("vr") > 0,
            round((col("sum_value") - col("s1") / col("n7")) / sqrt(col("vr")), 6)))
        .select(col("user_id"), col("d"), col("sum_value"), col("z"),
          when(col("z").isNotNull && abs(col("z")) > 2.0, true)
            .otherwise(false).as("anomaly"))
        .orderBy("user_id", "d")
    }),

    // longest-streak gaps-and-islands (round 9) — the engagement metric
    // over ACTIVE days (not the zero-filled grid): distinct (user, day),
    // island id = day − row_number (consecutive days share it), then
    // per-user streak stats. One explicit user-hash repartition up front
    // lets every downstream step reuse the same exchange: the (user, day)
    // distinct, the window, and both per-user aggregates are all
    // satisfied by hashpartitioning(user_id) — a 4-stage pipeline on ONE
    // shuffle of (user_id, day) pairs, never raw events.
    "win_streak" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("d")
      t(s, sf, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"))
        .repartition(col("user_id"))
        .distinct()
        .withColumn("isl", col("d") - row_number().over(w))
        .groupBy("user_id", "isl").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"), max("len").as("longest"),
          sum("len").as("active_days"))
        .orderBy("user_id")
    }),

    // first differencing (round 16) — the Δy step every stationarity/
    // forecasting decision rests on (ts_adf regresses EXACTLY this
    // difference), declared as its own surface: per event type's daily
    // count series, diff = n_t − n_{t−1} (exact BIGINT; null on each
    // series' first day — lag semantics, never a fake 0) and the pct
    // change as the one float (ratio of exact ints, guarded against the
    // zero divisor, round 6). One type-keyed window; the series frame is
    // type × day domain-bounded after the single corpus collapse.
    "ts_diff" -> ((s, sf) => {
      val w = Window.partitionBy("g").orderBy("d")
      t(s, sf, "events")
        .groupBy(col("event_type").as("g"),
          expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev", lag(col("n"), 1).over(w))
        .select(col("g"), col("d"), col("n"),
          (col("n") - col("prev")).as("diff"),
          when(col("prev") > 0,
            round((col("n") - col("prev")).cast("double") / col("prev"), 6))
            .as("pct"))
        .orderBy("g", "d")
    }),

    // per-user maximum drawdown (round 16) — the classic running-peak
    // statistic (finance's drawdown, SRE's burn-down) over each user's
    // cumulative daily purchase value: cum_t = Σ value up to day t,
    // dd_t = max(cum_1..t) − cum_t, report max_t dd_t. EXACT end to end:
    // daily sums, the running cumulative, the running peak and the
    // difference all stay DECIMAL(18,2)-exact; the one double cast is the
    // final rendering. All three windows share the ONE user-keyed hash
    // exchange (user-bounded partitions — the win_streak shape).
    "win_drawdown" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, sf, "events")
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("dv"))
        .withColumn("cum", sum(col("dv")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          (max(col("peak") - col("cum"))).cast("double").as("max_drawdown"))
        .orderBy("user_id")
    }),

    // event-type AUDIENCE overlap (round 16) — "how much do the users who
    // click overlap the users who purchase": exact Jaccard between the
    // distinct-user sets of every type pair. The distinct (type, user)
    // frame collapses the corpus FIRST; the pair fan-out is then per-user
    // C(k,2) with k = |types| (≤ 10 here) — bounded by the type DOMAIN
    // squared, never the corpus squared. Counts exact BIGINT; the one
    // float is the final ratio of exact ints, round(…,6).
    "events_user_overlap" -> ((s, sf) => {
      val tu = t(s, sf, "events")
        .select(col("event_type").as("et"), col("user_id")).distinct()
      val sizes = tu.groupBy("et").agg(count(lit(1)).as("n"))
      val common = tu.as("a").join(tu.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.et") < col("b.et"))
        .groupBy(col("a.et").as("type_a"), col("b.et").as("type_b"))
        .agg(count(lit(1)).as("n_common"))
      common
        .join(broadcast(sizes).withColumnRenamed("et", "type_a")
          .withColumnRenamed("n", "n_a"), "type_a")
        .join(broadcast(sizes).withColumnRenamed("et", "type_b")
          .withColumnRenamed("n", "n_b"), "type_b")
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_common"),
          round(col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
        .orderBy("type_a", "type_b")
    }),

    // last-touch attribution (round 9) — the marketing-analytics join of
    // conversions to the most recent preceding touchpoint: for each
    // purchase, the latest view/click strictly before it (within a 7-day
    // lookback), credited by count and exact decimal value. Both the
    // touch type (last ignore-nulls) and its timestamp (max of a
    // conditional — null rows vanish from the aggregate) come from ONE
    // window spec over the user-ordered event stream — no self-join of
    // purchases back against touches, so the fact table shuffles once.
    "events_attribution" -> ((s, sf) => {
      val isTouch = col("event_type").isin("view", "click")
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, sf, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"), col("value"))
        .withColumn("touch",
          last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
        .withColumn("touch_us", max(when(isTouch, col("us"))).over(w))
        .filter(col("event_type") === "purchase" && col("touch").isNotNull &&
          col("us") - col("touch_us") <= lit(7L * DayUs))
        .groupBy(col("touch").as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
            .as("attributed_value"))
        .orderBy("touch_type")
    }),

    // top session paths (round 9) — journey analysis over the sessionize
    // kernel: 30-min-gap sessions, each session's first ≤3 event types
    // joined "a>b>c", global top-10 paths. The lag flag and running
    // session id share one window spec (one exchange + sort); the
    // row_number and per-session collect reuse that user partitioning
    // (subset-key distribution — no new exchange); only the final path
    // count re-shuffles, on ≤|sessions| short strings. The in-session
    // concat goes through array_sort(struct(rn, t)) so the path order is
    // the deterministic (us, event_id) event order, not collect order.
    "events_path" -> ((s, sf) => {
      val wo = Window.partitionBy("user_id").orderBy("us", "event_id")
      t(s, sf, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
        .withColumn("brk",
          when(lag(col("us"), 1).over(wo).isNotNull &&
            col("us") - lag(col("us"), 1).over(wo) >= 1800000000L, 1).otherwise(0))
        .withColumn("sess", sum(col("brk")).over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "sess").orderBy("us", "event_id")))
        .filter(col("rn") <= 3)
        .groupBy("user_id", "sess")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"),
            col("event_type").as("t")))), x => x.getField("t")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path"))
        .limit(10)
    }),

    // RFM segmentation (round 9) — the user-value cube behind retention
    // marketing: per user recency (days since last event vs the corpus
    // max day), frequency (purchase count), monetary (exact decimal
    // purchase value), each bucketed into quartiles. The scale-clean
    // bucketing: exact interpolated percentile boundaries computed ONCE
    // (a 1-row broadcast, the agg_winsorize pattern), then quartile =
    // 1 + Σ(v > qᵢ) per row — never a global ntile window, which would
    // funnel every user through one partition. Output is the 4×4×4
    // segment histogram.
    "events_rfm" -> ((s, sf) => {
      val e = t(s, sf, "events").select(col("user_id"),
        expr(s"unix_micros(ts) div $DayUs").as("d"),
        col("event_type"), col("value"))
      val u = e.groupBy("user_id").agg(
        max(col("d")).as("dmaxu"),
        count(when(col("event_type") === "purchase", 1)).as("freq"),
        coalesce(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))), lit(0).cast("decimal(18,2)"))
          .cast("double").as("mon"))
      val mx = e.agg(max(col("d")).as("dmax"))
      val u2 = u.crossJoin(broadcast(mx))
        .select(col("user_id"), (col("dmax") - col("dmaxu")).as("rec"),
          col("freq"), col("mon"))
      val q = u2.agg(
        expr("percentile(rec, 0.25)").as("r1"),
        expr("percentile(rec, 0.5)").as("r2"),
        expr("percentile(rec, 0.75)").as("r3"),
        expr("percentile(freq, 0.25)").as("f1"),
        expr("percentile(freq, 0.5)").as("f2"),
        expr("percentile(freq, 0.75)").as("f3"),
        expr("percentile(mon, 0.25)").as("m1"),
        expr("percentile(mon, 0.5)").as("m2"),
        expr("percentile(mon, 0.75)").as("m3"))
      def bucket(v: org.apache.spark.sql.Column, b1: String, b2: String,
          b3: String) =
        (lit(1) + (v > col(b1)).cast("int") + (v > col(b2)).cast("int") +
          (v > col(b3)).cast("int")).cast("long")
      u2.crossJoin(broadcast(q))
        .select(bucket(col("rec"), "r1", "r2", "r3").as("r_q"),
          bucket(col("freq"), "f1", "f2", "f3").as("f_q"),
          bucket(col("mon"), "m1", "m2", "m3").as("m_q"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r_q", "f_q", "m_q")
    }),

    // weekly OHLC resample (round 9) — the financial downsample shape
    // over each user's value stream: per (user, week) the first/max/min/
    // last value plus count and exact decimal volume. First/last ride
    // min_by/max_by over a ZERO-PADDED (µs, event_id) string key —
    // lexicographic order equals numeric order, ties impossible
    // (event_id unique), so the pick is deterministic on both engines
    // without a sort or window. One map-side-combined hash agg; state ∝
    // (user, week) cells.
    "ts_ohlc" -> ((s, sf) =>
      t(s, sf, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) div $WeekUs").as("wk"),
          concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 12, "0")).as("okey"),
          col("value"))
        .groupBy("user_id", "wk")
        .agg(count(lit(1)).as("n"),
          round(min_by(col("value"), col("okey")), 2).as("open"),
          round(max(col("value")), 2).as("high"),
          round(min(col("value")), 2).as("low"),
          round(max_by(col("value"), col("okey")), 2).as("close"),
          round(graft.T.dsum(col("value"), 2), 2).as("vsum"))
        .orderBy("user_id", "wk")),

    // linear gap interpolation (round 9) — the time-series repair step
    // zero-fill (ts_fill_gaps) is wrong for: missing days get the line
    // between their surrounding observations, leading/trailing gaps get
    // forward/backward fill, and every row carries its provenance
    // ('obs'/'interp'/'ffill'/'bfill'). Surrounding observations come
    // from two frames over ONE (user, day) sort — last/max ignore-nulls
    // backward, first/min ignore-nulls forward — so the repair adds no
    // exchange beyond the grid join's. The interpolation arithmetic is
    // one identically-associated expression on both engines.
    "ts_interpolate" -> ((s, sf) => {
      val e = t(s, sf, "events").select(col("user_id"),
        expr(s"unix_micros(ts) div $DayUs").as("d"), col("value"))
      val daily = e.groupBy("user_id", "d")
        .agg(round(T.dsum(col("value"), 2), 2).as("v"))
      val grid = e.groupBy("user_id")
        .agg(min("d").as("dlo"), max("d").as("dhi"))
        .select(col("user_id"), explode(sequence(col("dlo"), col("dhi"))).as("d"))
      val wb = Window.partitionBy("user_id").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "d"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wb))
        .withColumn("pd", max(when(col("v").isNotNull, col("d"))).over(wb))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
        .withColumn("nd", min(when(col("v").isNotNull, col("d"))).over(wf))
        .select(col("user_id"), col("d"), col("v"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) * (col("d") - col("pd")) /
                (col("nd") - col("pd")))
            .when(col("pv").isNotNull, col("pv"))
            .otherwise(col("nv")), 6).as("v_interp"),
          when(col("v").isNotNull, "obs")
            .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
            .when(col("pv").isNotNull, "ffill").otherwise("bfill").as("src"))
        .orderBy("user_id", "d")
    }),

    // behavioral entropy (round 9) — text_entropy's information measure
    // turned on the event stream: each user's event-type distribution
    // scored as Shannon entropy (0 = monomaniac, log2(5) = uniform over
    // the five types). Same exact-count algebra: H = log2(n) − Σc·log2(c)/n,
    // two stacked map-side-combined aggregates, state ∝ (user, type).
    "events_entropy" -> ((s, sf) =>
      t(s, sf, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).cast("long").as("n_events"),
          count(lit(1)).as("n_types"),
          round(log2(sum(col("c"))) -
            sum(col("c") * log2(col("c"))) / sum(col("c")), 6).as("entropy"))
        .orderBy("user_id")),

    // cumulative unique users (round 9) — the growth-dashboard counter
    // done the scale-correct way: distinct-to-date is NOT a running
    // count-distinct over an ever-growing set; each user collapses to
    // their FIRST day (one agg), days roll up to new-user counts (one
    // agg), and the running total is a window over ≤ #days rows — the
    // 100 TB corpus never passes through the window.
    "ts_cum_users" -> ((s, sf) =>
      t(s, sf, "events")
        .groupBy("user_id")
        .agg(min(expr(s"unix_micros(ts) div $DayUs")).as("d"))
        .groupBy("d").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("d")),

    // DAU / WAU / stickiness (round 9) — the growth-dashboard triple:
    // daily actives, trailing-7-day actives, and their ratio, per
    // observed day. WAU is NOT a windowed count-distinct over raw events
    // (distinct doesn't decompose over frames): each distinct (user, day)
    // activity expands to the ≤7 window-END days it supports, then ONE
    // exact count-distinct per day — shuffle ∝ 7 × |user-days| (already
    // deduped), never 7 × |events|.
    "events_dau_wau" -> ((s, sf) => {
      val ud = t(s, sf, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"))
        .distinct()
      val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(sequence(col("d"), col("d") + lit(6))).as("d"))
        .groupBy("d").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, "d")
        .select(col("d"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy("d")
    }),

    // rolling 7-day MEDIAN (round 9) — ts_rolling_avg's robust sibling:
    // the trailing-frame median over the densified grid shrugs off the
    // single-day spikes ts_zscore flags. Exact interpolated percentile
    // as a WINDOW aggregate (both engines sort the same 7 doubles and
    // interpolate identically — the agg_percentile contract, framed);
    // shares the one user-hash exchange + sort every grid query rides.
    "ts_rolling_median" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-6, 0)
      dailyGrid(s, sf)
        .select(col("user_id"), col("d"),
          round(expr("percentile(sum_value, 0.5)").over(w), 6).as("med7"))
        .orderBy("user_id", "d")
    }),

    // within-session co-occurrence (round 9) — the market-basket matrix
    // over sessions: which event types appear TOGETHER in one sitting.
    // Sessions from the sessionize kernel, then distinct (session, type)
    // and a same-session self-join with t1 < t2 — the pair fan-out is
    // bounded by the type vocabulary (≤ C(5,2) = 10 pairs per session),
    // never by session length, and the join is co-partitioned on the
    // (user, session) key both sides already hash for their distinct.
    // frequent-itemset mining (round 10) — MLlib FPGrowth over per-user
    // event-type baskets: the association tier above events_cooccur's
    // pairwise counts ("users who error also purchase?"), covering every
    // itemset size in one pass. Baskets are the DISTINCT event types per
    // user (≤5 items, itemset lattice ≤2⁵ — the model is tiny at any
    // corpus size; FP-trees build on partial baskets map-side). Declared
    // rows-only (FP-tree traversal order is impl-specific); itemset SETS
    // and counts are deterministic — EventsSpec pins size-1 and size-2
    // frequencies against SQL ground truth. Items emit sorted + joined so
    // row identity is engine-stable.
    "events_itemsets" -> ((s, sf) => {
      import org.apache.spark.ml.fpm.FPGrowth
      val baskets = t(s, sf, "events")
        .groupBy("user_id")
        .agg(array_sort(collect_set(col("event_type"))).as("items"))
      new FPGrowth().setItemsCol("items").setMinSupport(0.2)
        .setMinConfidence(0.5).fit(baskets)
        .freqItemsets
        .select(array_join(array_sort(col("items")), ",").as("itemset"),
          col("freq"))
        .orderBy("itemset")
    }),

    // sequential-pattern mining (round 10) — MLlib PrefixSpan over each
    // user's time-ordered event-type sequence: ORDER-aware journeys
    // ("view then click then purchase") with gaps allowed, the
    // generalization of events_path's contiguous session paths and
    // events_funnel's one fixed order. Each user's sequence is their
    // (ts, event_id)-sorted event types as 1-item steps; minSupport 0.2,
    // patterns ≤3 steps. Rows-only declared (projection-database order is
    // impl-specific); EventsSpec pins single-step pattern support =
    // distinct-user counts and the anti-monotone support law.
    "events_prefixspan" -> ((s, sf) => {
      // PrefixSpan ITERATES its input (one projection pass per pattern
      // length) — uncached, every pass re-runs the corpus scan + the
      // sequence-building aggregate. The ml.fpm wrapper derives a FRESH
      // uncached RDD from its Dataset argument (caching the Dataset
      // leaves that RDD at StorageLevel.NONE and the recompute + WARN in
      // place), so the query drops to the mllib API over an explicitly
      // persisted sequence RDD — an adjudicated .rdd use: the consumer
      // is itself an RDD-based algorithm, not a declarative plan.
      import org.apache.spark.mllib.fpm.{PrefixSpan => MllibPrefixSpan}
      import s.implicits._
      val seqs = t(s, sf, "events")
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("us"), col("event_id"),
            col("event_type")).as("step"))
        .groupBy("user_id")
        .agg(transform(array_sort(collect_list(col("step"))),
          x => array(x.getField("event_type"))).as("sequence"))
      val rdd = seqs.select("sequence").rdd
        .map(_.getSeq[scala.collection.Seq[String]](0).map(_.toArray).toArray)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = new MllibPrefixSpan()
        .setMinSupport(0.2).setMaxPatternLength(3).run(rdd)
      // seal (materialize) the tiny pattern frame BEFORE unpersisting the
      // sequence cache — the result RDD's lineage reaches back through it
      val tr = new graft.operators.Tracked
      val out = tr.seal(model.freqSequences
        .map(fs => (fs.sequence.map(_.mkString("+")).mkString(">"), fs.freq))
        .toDF("pattern", "freq"))
      rdd.unpersist(blocking = false)
      out.orderBy("pattern")
    }),

    "events_cooccur" -> ((s, sf) => {
      val wo = Window.partitionBy("user_id").orderBy("us", "event_id")
      val st = t(s, sf, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
        .withColumn("brk",
          when(lag(col("us"), 1).over(wo).isNotNull &&
            col("us") - lag(col("us"), 1).over(wo) >= 1800000000L, 1).otherwise(0))
        .withColumn("sess", sum(col("brk")).over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("user_id", "sess", "event_type").distinct()
      st.select(col("user_id"), col("sess"), col("event_type").as("t1"))
        .join(st.select(col("user_id").as("u2"), col("sess").as("s2"),
            col("event_type").as("t2")),
          col("user_id") === col("u2") && col("sess") === col("s2") &&
            col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n"))
        .orderBy("t1", "t2")
    }),

    // trailing-8-day EWMA per user over the densified grid (round 9) —
    // ts_rolling_avg's recency-weighted sibling, the smoothing every
    // trend feature actually ships. The recursive EWMA definition does
    // not decompose over partitions, so this is the FRAME-BOUNDED form:
    // ewma(d) = Σₖ wₖ·v(d−k) / Σₖ wₖ over k = 0..7 with wₖ = 0.5ᵏ.
    // Exactness is engineered, not hoped for: v enters as integer cents
    // (the 2dp daily sum × 100, rint'd), and every weight is a power of
    // TWO — cents · 2⁻ᵏ is an exact double (mantissa shift), every term
    // is a multiple of 2⁻⁷ far below 2⁵³, so the frame sum is exact in
    // ANY accumulation order and both engines' divisions see identical
    // operands. Spark computes it as one collect_list over the same
    // user-hash window ts_rolling_avg already sorts (frame order is the
    // window order — deterministic), folded by a codegen'd higher-order
    // aggregate; the oracle uses an equivalent dense-grid range
    // self-join. Σwₖ closes to 2 − 0.5^(m−1) for an m-row frame.
    // Holt double exponential smoothing (round 14) — the ADAPTIVE
    // level+trend model the ts tier stopped short of (ts_ewma smooths
    // level only; ts_forecast evaluates static baselines): per event
    // type's daily-count series, l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}),
    // b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1} (Holt 1957, per Hyndman &
    // Athanasopoulos §8.2), initialized l_1 = y_1, b_1 = 0; output the
    // final state and the h = 7 forecast l + 7b. CROSS-ENGINE EXACTNESS
    // BY CONSTRUCTION: the recursion is sequential per key — both engines
    // execute the IDENTICAL IEEE op sequence in the identical order
    // (the oracle's recursive CTE repeats the same literals and
    // parenthesization), so unlike order-free float aggregates this needs
    // no tolerance at all; round(6) is cosmetic. Plan shape: the corpus
    // collapses to ≤ |types|·|days| rows in one map-side-combined agg,
    // then ONE codegen'd aggregate() fold over each key's sorted
    // day-array — per-key state is bounded by the series length (days,
    // not events), the right shape for millions of keys at 100 TB.
    "ts_holt" -> ((s, sf) =>
      t(s, sf, "events")
        .groupBy(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("y"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("sr"))
        .select(col("event_type"),
          size(col("sr")).cast("long").as("n_days"),
          // greatest(..,0): a one-day series would pass length -1 and
          // slice throws; clamp so it folds to the (l=y1, b=0) init state
          expr("""aggregate(slice(sr, 2, greatest(size(sr) - 1, 0)),
            struct(CAST(sr[0].y AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b),
            (acc, x) -> struct(
              0.3 * x.y + 0.7 * (acc.l + acc.b) AS l,
              0.2 * ((0.3 * x.y + 0.7 * (acc.l + acc.b)) - acc.l)
                + 0.8 * acc.b AS b)) AS hb"""))
        .select(col("event_type"), col("n_days"),
          round(col("hb.l"), 6).as("level"),
          round(col("hb.b"), 6).as("trend"),
          round(col("hb.l") + lit(7.0) * col("hb.b"), 6).as("fc_7"))
        .orderBy("event_type")),

    // (augmented) Dickey–Fuller stationarity test, lag-0 with constant +
    // trend (Dickey & Fuller, JASA 1979) — the unit-root check behind
    // every "can I difference/forecast this series" decision, per event
    // type over the daily count series: regress Δy_t on (1, t, y_{t−1})
    // and report ρ̂ and its t-statistic (compare to the DF critical
    // values; ρ̂ near 0 = unit root). The 3×3 normal equations solve in
    // CLOSED FORM (Cramer determinants), so the whole statistic is one
    // float chain over EXACT BIGINT sums — n, Σz, Σt, Σz², Σt², Σzt and
    // the Δy cross-sums collapse from the ≤|days| daily frame (bounded
    // windows: the lag rides a day-domain partitioned window, the PLANS
    // taxonomy's bounded case), identically parenthesized on both
    // engines, with RSS from the normal-equation identity (no second
    // pass). Corpus rows cross ONE map-side agg at any scale.
    "ts_adf" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .groupBy(col("event_type").as("g"),
          expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy("g").orderBy("d")
      val obs = daily
        .withColumn("z", lag(col("y"), 1).over(w))
        .withColumn("tt", row_number().over(w).cast("long"))
        .where(col("z").isNotNull)
        .select(col("g"), (col("y") - col("z")).as("dy"), col("z"),
          col("tt"))
      val sums = obs.groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("z")).as("sz"), sum(col("tt")).as("st"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("tt") * col("tt")).as("stt"),
        sum(col("z") * col("tt")).as("szt"),
        sum(col("dy")).as("sdy"),
        sum(col("dy") * col("z")).as("sdyz"),
        sum(col("dy") * col("tt")).as("sdyt"),
        sum(col("dy") * col("dy")).as("sdd"))
      val dbl = Seq("n", "sz", "st", "szz", "stt", "szt", "sdy", "sdyz",
        "sdyt", "sdd")
      val d = sums.select(col("g") +:
        dbl.map(c => col(c).cast("double").as(s"d$c")): _*)
      d.withColumn("det",
          col("dn") * (col("dszz") * col("dstt") - col("dszt") * col("dszt"))
            - col("dsz") * (col("dsz") * col("dstt") - col("dszt") * col("dst"))
            + col("dst") * (col("dsz") * col("dszt") - col("dszz") * col("dst")))
        .withColumn("det1",
          col("dsdy") * (col("dszz") * col("dstt") - col("dszt") * col("dszt"))
            - col("dsz") * (col("dsdyz") * col("dstt") - col("dszt") * col("dsdyt"))
            + col("dst") * (col("dsdyz") * col("dszt") - col("dszz") * col("dsdyt")))
        .withColumn("det2",
          col("dn") * (col("dsdyz") * col("dstt") - col("dszt") * col("dsdyt"))
            - col("dsdy") * (col("dsz") * col("dstt") - col("dszt") * col("dst"))
            + col("dst") * (col("dsz") * col("dsdyt") - col("dsdyz") * col("dst")))
        .withColumn("det3",
          col("dn") * (col("dszz") * col("dsdyt") - col("dsdyz") * col("dszt"))
            - col("dsz") * (col("dsz") * col("dsdyt") - col("dsdyz") * col("dst"))
            + col("dsdy") * (col("dsz") * col("dszt") - col("dszz") * col("dst")))
        .withColumn("alpha", col("det1") / col("det"))
        .withColumn("rho", col("det2") / col("det"))
        .withColumn("beta", col("det3") / col("det"))
        .withColumn("rss", col("dsdd") - col("alpha") * col("dsdy")
          - col("rho") * col("dsdyz") - col("beta") * col("dsdyt"))
        .withColumn("s2", col("rss") / (col("dn") - lit(3.0)))
        .withColumn("c22", col("dn") * col("dstt") - col("dst") * col("dst"))
        .select(col("g").as("event_type"), col("dn").cast("long").as("n_obs"),
          round(col("rho"), 6).as("rho"),
          round(col("rho") / sqrt(col("s2") * col("c22") / col("det")), 6)
            .as("t_stat"))
        .orderBy("event_type")
    }),

    "ts_ewma" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-7, 0)
      dailyGrid(s, sf)
        .withColumn("cents", expr("CAST(rint(sum_value * 100) AS BIGINT)"))
        .withColumn("vs", collect_list(col("cents")).over(w))
        .select(col("user_id"), col("d"), col("n_events"), col("sum_value"),
          round(expr(
            """aggregate(zip_with(vs, sequence(size(vs) - 1, 0, -1),
               (v, k) -> v * pow(0.5d, k)), 0d, (a, x) -> a + x)""")
            / (lit(2.0) - expr("pow(0.5d, size(vs) - 1)")) / 100.0, 6)
            .as("ewma"))
        .orderBy("user_id", "d")
    }),

    // day-of-week seasonality profile (round 9) — the weekly-rhythm
    // rollup behind staffing/capacity features: per day-of-week slot
    // (day id mod 7 — pure integer arithmetic, no calendar/locale
    // first-day-of-week semantics to disagree cross-engine), total
    // events, active user-days, and the average event value. Two
    // map-side-combined aggregates (events → user-days → 7 slots); the
    // value average divides the exact decimal sum by the exact count in
    // ONE IEEE division, so the 6dp round is deterministic.
    "ts_seasonality" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"),
          col("value"))
        .groupBy("user_id", "d")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
      daily.groupBy(pmod(col("d"), lit(7)).cast("long").as("dow"))
        .agg(sum(col("n")).as("n_events"),
          count(lit(1)).as("user_days"),
          round(sum(col("sv")).cast("double") / sum(col("n")), 6)
            .as("avg_value"))
        .orderBy("dow")
    }),

    // triangle count over the user co-occurrence graph (round 11; r12:
    // degree-ordered orientation + cap observability) — the community-
    // density primitive on top of the bucketed-pair kernel, factored into
    // [[graft.operators.Triangles]]: users sharing >= 30 (day, event_type)
    // activity buckets form an edge (pairs per BUCKET, never all-users^2,
    // capped at 65536 active users per bucket; capped buckets are now
    // counted and WARN-logged, never silent — none bind at bench SFs, so
    // the oracle applies the identical cap and stays value-equal), and
    // each triangle is found exactly once as a wedge at its minimum-
    // (degree, id) vertex — the orientation that bounds every wedge list
    // by O(sqrt(m)) on power-law graphs, vs the max total degree under raw
    // id order (the "last reducer"). The summary is orientation-invariant,
    // so the id-ordered DuckDB oracle is unchanged. r14: the edge list
    // comes from the PUBLISHED census snapshot (graft.operators.Census —
    // read-or-publish), so only the run's first census-family query pays
    // the corpus collapse; this query is the wedge phase + summary.
    "events_triangles" -> ((s, sf) => {
      val (edges, n) =
        graft.operators.Census.edges(s, sf, t(s, sf, "events"))
      graft.operators.Triangles.summaryOf(edges, n)
    }),

    // Mann–Whitney U rank-sum test (round 12) — the nonparametric
    // two-sample location test completing the inference family beside
    // agg_ttest (parametric) and agg_ks_test (distribution-shape): do
    // purchase events carry different values than views, without assuming
    // normality? The corpus NEVER sees a row-level rank: it collapses to
    // the per-distinct-VALUE table first (one map-side-combined agg —
    // value, group-1 count, tie count; bounded by the 2dp value DOMAIN,
    // not the corpus), where the tie-group average rank is
    // cumulative-count-before + (t+1)/2 — one running window over the
    // compact frame (the agg_ks_test shape). Ranks and tie counts are
    // exact integers, so every average rank is an exact half-integer and
    // the rank sum R₁ = Σ c₁(v)·avgRank(v) is EXACT in double up to 2^52,
    // order-independent by construction. U₁ = R₁ − n₁(n₁+1)/2 stays exact
    // (1dp round is formatting only), and the normal approximation with
    // the published tie correction z = (U₁ − n₁n₂/2)/√(n₁n₂/12·((N+1) −
    // Σ(t³−t)/N(N−1))) is ONE identical float chain over exact integer
    // operands (6dp) — Σ(t³−t) rides the SAME compact-frame aggregate.
    "agg_mwu" -> ((s, sf) => {
      val byV = t(s, sf, "events")
        .where(col("event_type").isin("purchase", "view"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c1"), count(lit(1)).as("tt"))
      // the distinct-value frame grows with the corpus (continuous
      // values): the running count rides the two-pass GlobalRank kernel
      // (round 15 — the agg_auc rewire), not a single-partition window
      val ranked = graft.operators.GlobalRank
        .prefix(byV, Nil, Seq("value"), Seq("tt" -> "cum"),
          inclusive = false)
        .withColumn("avg_rk", col("cum") + (col("tt") + 1) / lit(2.0))
      ranked.agg(
          sum(col("c1") * col("avg_rk")).as("r1"),
          sum(col("c1")).as("n1"),
          sum(col("tt") - col("c1")).as("n2"),
          sum(col("tt")).as("nn"),
          sum(col("tt") * col("tt") * col("tt") - col("tt")).as("tsum"))
        .select(col("n1"), col("n2"),
          round(col("r1") - col("n1") * (col("n1") + 1) / lit(2.0), 1).as("u1"),
          round((col("r1") - col("n1") * (col("n1") + 1) / lit(2.0) -
              col("n1") * col("n2") / lit(2.0)) /
            sqrt(col("n1") * col("n2") / lit(12.0) *
              ((col("nn") + 1) - col("tsum") * lit(1.0) /
                (col("nn") * (col("nn") - 1)))), 6).as("z"))
    }),

    // z-score volume anomaly detection (round 12) — the "which days were
    // abnormal" alerting primitive over per-(event_type, day) counts:
    // flag days where |x − μ| > 2σ with μ, σ from the POPULATION moments
    // of the type's own daily series. The corpus collapses to the ≤
    // |types|·|days| daily table FIRST (one map-side-combined agg — the
    // only stage that touches corpus rows at 100 TB); moments derive from
    // that compact table as exact BIGINT sums (nd, Σx, Σx²), and the
    // z-score is written in the cancelled form (x·nd − Σx) /
    // sqrt(nd·Σx² − (Σx)²): BOTH operands are exact integers (< 2^53 at
    // any realistic SF), so the single division-after-sqrt is the ONLY
    // float op — bit-identical cross-engine, no rounding discipline
    // needed beyond the 6dp on z. Zero-variance series are excluded by an
    // exact integer predicate, never a NaN comparison.
    "ts_anomaly" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .groupBy(col("event_type"),
          expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("x"))
      val m = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("x")).as("sn"),
          sum(col("x") * col("x")).as("snn"))
      daily.join(m, "event_type")
        .where(col("nd") * col("snn") - col("sn") * col("sn") > 0)
        .withColumn("z", round((col("x") * col("nd") - col("sn")) /
          sqrt((col("nd") * col("snn") - col("sn") * col("sn"))
            .cast("double")), 6))
        .where(abs(col("z")) > 2.0)
        .select(col("event_type"), col("d"), col("x").as("n_events"), col("z"))
        .orderBy("event_type", "d")
    }),

    // lag-k autocorrelation of the daily volume series (round 11) — the
    // seasonality detector ts_seasonality's fixed weekly fold can't give:
    // r_k = Pearson(x_t, x_{t+k}) for k = 1..7 over per-day event counts.
    // The corpus collapses to ≤ |days| rows FIRST; the lag pairing is a
    // tiny self-join on d+k (explode of the 7 lags); every sufficient
    // statistic (n, Σx, Σy, Σx², Σy², Σxy) stays exact BIGINT and the
    // correlation is ONE identically-associated double chain per lag —
    // the agg_corr discipline, never a float accumulation. Degenerate
    // (zero-variance) lags yield NULL, not a fabricated 0.
    "ts_autocorr" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .groupBy(expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("x"))
      val withK = daily.select(col("d"), col("x"),
        explode(sequence(lit(1), lit(7))).as("k"))
      val pairs = withK.join(
        daily.select(col("d").as("d2"), col("x").as("y")),
        col("d2") === col("d") + col("k"))
      pairs.groupBy("k")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("long").as("sx"), sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("y") * col("y")).cast("long").as("syy"),
          sum(col("x") * col("y")).cast("long").as("sxy"))
        .select(col("k"), col("n"),
          round(when(col("n") * col("sxx") - col("sx") * col("sx") === 0 ||
              col("n") * col("syy") - col("sy") * col("sy") === 0, lit(null))
            .otherwise((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))), 6)
            .as("autocorr"))
        .orderBy("k")
    }),

    // peak concurrent users per day (round 11) — the sweep-line /
    // interval-concurrency primitive ("how many sessions overlap at the
    // busiest instant?"): each user's daily activity is the interval
    // [first event, last event]; +1/−1 boundary points aggregate per
    // (day, instant) so sort keys are UNIQUE (a ROWS running frame over
    // duplicate keys would be order-ambiguous), and concurrency at t =
    // starts(≤ t) − ends(< t) — the convention where a session ending
    // exactly when another starts still overlaps it. The window
    // partitions by DAY: no global sort; within-day points are bounded
    // by active users, so the plan holds at any corpus length.
    "events_concurrency" -> ((s, sf) => {
      val iv = t(s, sf, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"),
          expr("unix_micros(ts)").as("us"))
        .groupBy("user_id", "d")
        .agg(min(col("us")).as("st"), max(col("us")).as("en"))
      val starts = iv.groupBy(col("d"), col("st").as("t")).agg(count(lit(1)).as("ns"))
      val ends = iv.groupBy(col("d"), col("en").as("t")).agg(count(lit(1)).as("ne"))
      val pts = starts.join(ends, Seq("d", "t"), "full")
        .select(col("d"), col("t"),
          coalesce(col("ns"), lit(0L)).as("ns"), coalesce(col("ne"), lit(0L)).as("ne"))
      val w = Window.partitionBy("d").orderBy("t")
      val conc = pts.withColumn("c",
        sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long") -
          coalesce(sum(col("ne")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      val users = iv.groupBy("d").agg(count(lit(1)).as("n_users"))
      conc.groupBy("d").agg(max(col("c")).as("peak"))
        .join(users, "d")
        .select(col("d"), col("peak"), col("n_users"))
        .orderBy("d")
    }),

    // mean-shift changepoint scan (round 11) — level-shift detection over
    // the daily event-volume series: for every candidate split day k the
    // score is |mean(days ≤ k) − mean(days > k)|, the two-sample split
    // statistic whose argmax is the CUSUM-family changepoint estimate
    // (Page 1954's statistic in its declarative prefix-sum form — the
    // sequential max-recursion form is not expressible cross-engine, the
    // prefix-sum scan is). Both running means derive from ONE cumulative
    // sum over the per-day aggregate: the corpus collapses to ≤ |days|
    // rows BEFORE the global-order window, so the single-partition sort
    // ranks dozens of rows at any corpus size (the ts_cum_users
    // discipline); totals broadcast as a 1-row scalar. Exact integer
    // counts, two identically-associated IEEE divisions, rounded 6dp.
    "ts_changepoint" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .groupBy(expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("cnt"))
      val tot = daily.agg(sum(col("cnt")).cast("long").as("n_total"),
        count(lit(1)).as("n_days"))
      val w = Window.orderBy("d")
      daily
        .withColumn("cum", sum(col("cnt")).over(w).cast("long"))
        .withColumn("k", row_number().over(w).cast("long"))
        .crossJoin(broadcast(tot))
        .where(col("k") < col("n_days"))
        .select(col("d"), col("cnt"),
          round(abs(col("cum").cast("double") / col("k").cast("double") -
            (col("n_total") - col("cum")).cast("double") /
              (col("n_days") - col("k")).cast("double")), 6).as("shift"))
        .orderBy("d")
    }),

    // volume-concentration deciles (round 9) — the Pareto/Lorenz view of
    // user activity ("do 10% of users generate 80% of events?"): users
    // bucketed by event count into deciles via exact interpolated
    // percentile BOUNDARIES (the events_rfm pattern — a 1-row broadcast
    // and a per-row Σ(n > qᵢ), never a global ntile window that would
    // funnel every user through one partition), then per decile: users,
    // events, and each decile's share of all events. Counts stay BIGINT
    // to the end; share is one IEEE division of exact longs.
    "events_pareto" -> ((s, sf) => {
      val u = t(s, sf, "events").groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val qs = (1 to 9).map(i => expr(s"percentile(n, 0.$i)").as(s"q$i"))
      val q = u.agg(qs.head, qs.tail: _*)
      val tot = u.agg(sum(col("n")).as("tot"))
      def dec(v: org.apache.spark.sql.Column) =
        (1 to 9).foldLeft(lit(1))((acc, i) =>
          acc + (v > col(s"q$i")).cast("int")).cast("long")
      u.crossJoin(broadcast(q)).crossJoin(broadcast(tot))
        .select(dec(col("n")).as("decile"), col("n"), col("tot"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
          round(sum(col("n")).cast("double") / max(col("tot")), 6)
            .as("share"))
        .orderBy("decile")
    }),

    // inter-arrival time distribution (round 15) — the activity-cadence
    // profile behind every sessionization/timeout choice (the 30-minute
    // gap sessionize hardcodes should come FROM this table): successive
    // same-user event gaps, bucketed into the five human bands an
    // operator actually reasons in, with exact per-band stats. The lag
    // rides the per-user window (a user's events bound the partition, the
    // sessionize shape); gaps are exact integer micros, shares one IEEE
    // division at the edge. A static band frame left-joins the observed
    // counts so an empty band shows as zero rather than vanishing.
    "events_inter_arrival" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gaps = t(s, sf, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .where(col("gap").isNotNull)
      val MinUs = 60000000L; val HourUs = 3600000000L
      val banded = gaps.select(
        when(col("gap") < MinUs, 1)
          .when(col("gap") < 10 * MinUs, 2)
          .when(col("gap") < HourUs, 3)
          .when(col("gap") < 24 * HourUs, 4)
          .otherwise(5).cast("long").as("band"), col("gap"))
      val stats = banded.groupBy("band")
        .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_us"),
          max(col("gap")).as("max_us"))
      val tot = gaps.agg(count(lit(1)).as("nt"))
      val bands = t(s, sf, "region").sparkSession.range(1, 6)
        .select(col("id").as("band"))
      bands.join(stats, Seq("band"), "left")
        .crossJoin(broadcast(tot))
        .select(col("band"),
          coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
          col("min_us"), col("max_us"),
          round(coalesce(col("n_gaps"), lit(0L)).cast("double") / col("nt"),
            6).as("share"))
        .orderBy("band")
    }),

    // Lorenz curve over user activity (round 15) — events_pareto's decile
    // view made a proper cumulative-distribution curve (Lorenz 1905; the
    // Gini construction's x-axis): users ranked ASCENDING by event count
    // (user_id tiebreak — the GlobalRank kernel's tie-free order
    // contract), 20 ventile points of (cumulative user share, cumulative
    // event share). The per-user frame grows with the corpus, so BOTH the
    // global rank and the running event sum ride the two-pass GlobalRank
    // kernel — at 100 TB this is range-partitioned parallel work, not a
    // one-task window. Integer arithmetic end-to-end (the ventile id is
    // exact ceil division on BIGINTs); shares are two IEEE divisions of
    // exact longs, identical cross-engine; the 1-row (n_users, n_events)
    // total is a broadcast scalar (the events_pareto shape).
    "events_lorenz" -> ((s, sf) => {
      val u = t(s, sf, "events").groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val pre = graft.operators.GlobalRank
        .prefix(u, Nil, Seq("n", "user_id"), Seq("n" -> "cum"),
          inclusive = true, rnCol = Some("rn"))
      val tot = pre.agg(count(lit(1)).as("nu"), sum(col("n")).as("ne"))
      pre.crossJoin(broadcast(tot))
        .select(expr("(rn * 20 + nu - 1) div nu").as("ventile"),
          col("rn"), col("cum"), col("nu"), col("ne"))
        .groupBy("ventile")
        .agg(round(max(col("rn")).cast("double") / max(col("nu")), 6)
            .as("u_frac"),
          round(max(col("cum")).cast("double") / max(col("ne")), 6)
            .as("e_frac"))
        .orderBy("ventile")
    }),

    // session-length histogram (round 9) — the engagement distribution
    // over the sessionize kernel: sessions keyed by their event count,
    // each length bucket reporting how many sessions, their mean
    // duration, and the longest. The kernel's lag flag + running id
    // share one user-hash window (one exchange + sort); the per-session
    // rollup reuses that partitioning (subset key), and only the
    // ≤|sessions| (length, duration) pairs re-shuffle into the ≤ max-
    // session-length histogram. Durations are integer µs; the mean is
    // one IEEE division of exact longs, rounded at 2.
    "events_session_stats" -> ((s, sf) => {
      val wo = Window.partitionBy("user_id").orderBy("us", "event_id")
      t(s, sf, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("brk",
          when(lag(col("us"), 1).over(wo).isNotNull &&
            col("us") - lag(col("us"), 1).over(wo) >= 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess", sum(col("brk")).over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("len"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
        .groupBy("len")
        .agg(count(lit(1)).as("n_sessions"),
          round(sum(col("dur_us")).cast("double") / count(lit(1)), 2)
            .as("avg_dur_us"),
          max(col("dur_us")).as("max_dur_us"))
        .orderBy("len")
    }),

    // incremental aggregate maintenance (round 9,
    // [[graft.operators.Mview]]) — DECLARED as: maintain a per-user
    // events aggregate (count / exact decimal sum / day min / day max)
    // incrementally — state built from days < 19740, then ONE
    // delta-sized refresh folds the remaining days in — and the result
    // is hash-checked against the oracle's single full-corpus
    // aggregate. That equality (state ∪ agg(delta) re-agged ≡
    // agg(base ∪ delta)) is the materialized-view refresh contract;
    // at 100 TB the refresh reads |state| + |delta|, never the base.
    "agg_incremental" -> ((s, sf) => {
      val cutDay = 19740L
      val e = t(s, sf, "events").select(col("user_id"),
        expr(s"unix_micros(ts) div ${86400000000L}").as("d"),
        col("value").cast("decimal(18,2)").as("v"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("user_id").agg(count(lit(1)).cast("long").as("n_events"),
          sum(col("v")).as("sv"), min(col("d")).as("d_min"),
          max(col("d")).as("d_max"))
      val state = partial(e.where(col("d") < cutDay))
      val deltaPartial = partial(e.where(col("d") >= cutDay))
      graft.operators.Mview.combine(state, deltaPartial, Seq("user_id"),
          Map("n_events" -> "sum", "sv" -> "sum",
            "d_min" -> "min", "d_max" -> "max"))
        .select(col("user_id"), col("n_events"),
          round(col("sv").cast("double"), 2).as("sum_value"),
          col("d_min"), col("d_max"))
        .orderBy("user_id")
    }),

    // forecast backtest (round 11) — the evaluation-loop primitive the
    // descriptive time-series tier (seasonality, autocorr, EWMA) stops
    // short of: hold out the final week of daily volume, forecast it with
    // the two standard baselines every real forecast must beat
    // (Hyndman & Athanasopoulos, *Forecasting: Principles and Practice*,
    // §5.2 — seasonal-naive ŷ(d) = y(d−7), and the train mean), and emit
    // per-day actual/forecast/absolute-error for both. Plan: the corpus
    // collapses to ≤|days| rows FIRST (one map-side-combined agg — the
    // ts_changepoint discipline); the season shift is a self-join of that
    // tiny frame on d−7, the train mean a 1-row broadcast; exact integer
    // counts everywhere, the mean is the only division (round 6).
    "ts_forecast" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val daily = tr.persist(t(s, sf, "events")
        .groupBy(expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("y")))
      val mx = daily.agg(max(col("d")).as("dmax"))
      val trainStats = daily.crossJoin(broadcast(mx))
        .where(col("d") <= col("dmax") - 7)
        .agg(sum(col("y")).as("sy"), count(lit(1)).as("nd"))
      val out = daily.crossJoin(broadcast(mx))
        .where(col("d") > col("dmax") - 7)
        .join(daily.select((col("d") + 7).as("d"), col("y").as("yhat_snaive")),
          "d")
        .crossJoin(broadcast(trainStats))
        .select(col("d"), col("y"),
          col("yhat_snaive"),
          round(col("sy").cast("double") / col("nd"), 6).as("yhat_mean"),
          abs(col("y") - col("yhat_snaive")).as("ae_snaive"),
          round(abs(col("y") - col("sy").cast("double") / col("nd")), 6)
            .as("ae_mean"))
      tr.seal(out).orderBy("d")
    }),

    // view→purchase conversion-lag distribution (round 11) — the "how
    // long does conversion take" summary the funnel count can't give:
    // per user the first view and the first purchase AT OR AFTER it
    // (directional — a purchase before any view doesn't count), lag
    // summarized as min / median / p90 / max with the agg_percentile
    // exact-interpolation contract (lags are exact integer µs < 2^53, so
    // the midpoint interpolation is exact in double on both engines;
    // round(…,1) guards the formatting edge). Two map-side-combined user
    // aggs + one join; the 1-row output is the whole shuffle.
    "events_conversion_lag" -> ((s, sf) => {
      val e = t(s, sf, "events")
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("v_us"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), expr("unix_micros(ts)").as("p_us"))
        .join(v, "user_id")
        .where(col("p_us") >= col("v_us"))
        .groupBy("user_id").agg(min(col("p_us")).as("p_us"), min(col("v_us")).as("v_us"))
      p.select((col("p_us") - col("v_us")).as("lag_us"))
        .agg(count(lit(1)).as("n_users"),
          min(col("lag_us")).as("min_us"),
          round(expr("percentile(lag_us, 0.5)"), 1).as("med_us"),
          round(expr("percentile(lag_us, 0.9)"), 1).as("p90_us"),
          max(col("lag_us")).as("max_us"))
    }),

    // chi-square test of independence (round 11) — the categorical
    // sibling of agg_ttest: is event type independent of day-of-week?
    // Contingency cells from ONE map-side-combined agg, marginals derived
    // from the COMPACT cell table (never a second corpus pass), expected
    // counts r·c/N, Σ(o−e)²/e with its degrees of freedom. The full r×c
    // grid is materialized (marginal cross-join, cell counts left-joined
    // with coalesce 0, r12 fix) so a category pair with ZERO observed
    // events still contributes its (0−e)²/e = e term — dof always assumed
    // the full grid, and omitting empty cells understated χ². Integer
    // counts everywhere; the per-cell term is the only float chain
    // (identical expression both engines, 6dp).
    "agg_chisq" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val c = tr.persist(t(s, sf, "events")
        .groupBy(col("event_type"),
          expr(s"(unix_micros(ts) div $DayUs) % 7").as("dow"))
        .agg(count(lit(1)).as("n")))
      val rt = c.groupBy("event_type").agg(sum(col("n")).as("rn"))
      val ct = c.groupBy("dow").agg(sum(col("n")).as("cn"))
      val tot = rt.agg(sum(col("rn")).as("nt"),
        (count(lit(1)) - 1).as("dr"))
        .crossJoin(broadcast(ct.agg((count(lit(1)) - 1).as("dc"))))
      val cells = rt.crossJoin(ct)
        .join(c, Seq("event_type", "dow"), "left")
        .withColumn("o", coalesce(col("n"), lit(0L)))
      tr.seal(cells
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_cells"),
          max(col("dr") * col("dc")).as("dof"),
          round(sum(pow(col("o") - col("rn") * col("cn") * lit(1.0) / col("nt"), 2)
            / (col("rn") * col("cn") * lit(1.0) / col("nt"))), 6).as("chi2")))
    }),

    // Kaplan–Meier time-to-conversion survival (round 11) — the estimator
    // behind every "how long until a user purchases" product question
    // (Kaplan & Meier, *Nonparametric estimation from incomplete
    // observations*, JASA 1958): each user is observed for 48 hours after
    // their FIRST event; the event is their first `purchase`, and users
    // who never purchase OR convert later than the window are
    // RIGHT-CENSORED at 48 h (the administrative-censoring design —
    // deterministic, no clock dependence; never-converters enter every
    // risk set, r12 fix — an inner join on conversions would estimate the
    // different "time among eventual converters" quantity). The terminal
    // factor is guarded: if an hour's at-risk cohort fully converts
    // (d_t == n_risk), the survival product is exactly 0.0 from there on —
    // Spark's log(0) is NULL and window sum() would silently skip it, so
    // the log term pins −∞ explicitly (mirrored in the oracle's CASE).
    // S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) with d_i =
    // conversions at hour t_i and n_i = users still at risk (neither
    // converted nor censored before t_i). Plan: two per-user min aggs
    // (first event hour, first purchase hour — map-side combined) joined
    // on user, grouped by lifetime hour (≤49 distinct rows), then the
    // risk set as ONE reverse-cumulative window sum and the product as
    // exp of a forward-cumulative sum of logs — both windows run over the
    // tiny hour-grouped frame in a SINGLE partition by construction (the
    // frame is bounded by the observation window, not the corpus), and the
    // cumulative order is the hour order, identical in any engine, so
    // round(…,6) only absorbs last-bit ln/÷ noise (the fn_math
    // discipline). At 100 TB the user aggs carry the scale; everything
    // after is constant-size.
    "events_survival" -> ((s, sf) => {
      val HourUs = 3600000000L
      val win = 48L
      val e = t(s, sf, "events")
      val first = e.groupBy("user_id")
        .agg(min(expr(s"unix_micros(ts) div $HourUs")).as("h0"))
      val conv = e.where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(min(expr(s"unix_micros(ts) div $HourUs")).as("hc"))
      val life = first.join(conv, Seq("user_id"), "left")
        .select(
          when(col("hc").isNull || col("hc") - col("h0") > win, lit(win))
            .otherwise(col("hc") - col("h0")).as("lt"),
          when(col("hc").isNull || col("hc") - col("h0") > win, lit(0L))
            .otherwise(lit(1L)).as("ev"))
      val byT = life.groupBy(col("lt").as("t_hour"))
        .agg(sum(col("ev")).as("d_t"), count(lit(1)).as("ended_t"))
      val all = Window.orderBy(col("t_hour").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.orderBy(col("t_hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk", sum(col("ended_t")).over(all))
        .withColumn("surv", round(exp(sum(
          when(col("d_t") < col("n_risk"),
            log(lit(1.0) - col("d_t").cast("double") / col("n_risk")))
            .otherwise(lit(Double.NegativeInfinity)))
          .over(fwd)), 6))
        .where(col("d_t") > 0)
        .select(col("t_hour"), col("n_risk"), col("d_t").as("n_conv"),
          col("surv"))
        .orderBy("t_hour")
    }),

    // out-of-order arrival profile (round 12) — the watermark-sizing
    // tool of every Structured Streaming deployment (the
    // `withWatermark` delay is a GUESS unless measured — this measures
    // it): arrival time = event time + a deterministic portable network
    // jitter (0..1023 × 1.5 s from two md5 hex chars via ascii() — the
    // Split hex-prefix discipline extended to an integer draw, identical
    // on both engines), and each event's lateness is how far its event
    // time trails the user's running event-time maximum at arrival
    // (Akidau et al., *The Dataflow Model*, VLDB 2015 — watermarks bound
    // exactly this skew). Per event type: event count, reordered count,
    // count late by > 10 min (the stream_* windows' canonical delay),
    // worst lateness, and the mean lateness among reordered events. The
    // running max is one window over user-hash partitions (arrival order
    // within user — no global sort); lateness values are exact µs
    // BIGINTs so every aggregate before the final µs→s division is
    // exact integer arithmetic (6dp).
    "events_out_of_order" -> ((s, sf) => {
      val md = md5(col("event_id").cast("string").cast("binary"))
      val jitter = (ascii(substring(md, 1, 1)) * 31 +
        ascii(substring(md, 2, 1))) % 1024
      val w = Window.partitionBy("user_id").orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, sf, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("arr_us",
          col("us") + jitter.cast("long") * 1500000L)
        .withColumn("late_us",
          greatest(lit(0L), coalesce(max(col("us")).over(w), col("us"))
            - col("us")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("late_us") > 0L, 1L).otherwise(0L))
            .as("n_reordered"),
          sum(when(col("late_us") > 600000000L, 1L).otherwise(0L))
            .as("n_late_10m"),
          round(max(col("late_us")) / lit(1e6), 6).as("max_late_s"),
          round((sum(when(col("late_us") > 0L, col("late_us"))
              .otherwise(0L)) /
            greatest(sum(when(col("late_us") > 0L, 1L).otherwise(0L)),
              lit(1L))
              .cast("double")) / lit(1e6), 6).as("avg_reorder_s"))
        .orderBy("event_type")
    }),

    // classical additive seasonal decomposition of the daily purchase
    // series (the moving-average method of Macaulay 1931, the
    // "decompose(type='additive')" every ops dashboard runs before
    // anomaly thresholds): trend = centered 7-day MA (full windows only
    // — edges carry null, never a shrunken biased window), seasonal =
    // day-of-week mean of the detrended series, residual = x − trend −
    // seasonal. The corpus collapses to the ≤|days| daily count table in
    // ONE agg; all three components derive from that compact frame (two
    // windows + one 7-row broadcast join), so the single-partition
    // window is day-domain-bounded — the agg_ks_test compact-frame
    // shape, never a corpus sort. Float discipline: daily counts are
    // exact integers, trend = Σ7/7.0 is one identical division, the
    // detrended terms cast to DECIMAL(38,15) before the seasonal mean so
    // the per-DOW sums are order-independent, and the final chain is
    // identical on both engines (6dp).
    "ts_decompose" -> ((s, sf) => {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 15)
      val daily = t(s, sf, "events")
        .where(col("event_type") === "purchase")
        .groupBy(expr(s"unix_micros(ts) div $DayUs").as("d"))
        .agg(count(lit(1)).as("n"))
      val w7 = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("wn", count(lit(1)).over(w7))
        .withColumn("trend",
          when(col("wn") === 7, sum(col("n")).over(w7) / lit(7.0)))
        .drop("wn")
      val seas = tr.where(col("trend").isNotNull)
        .groupBy(pmod(col("d"), lit(7)).as("dow"))
        .agg((sum((col("n") - col("trend")).cast(d38)).cast("double") /
          count(lit(1))).as("seasonal"))
      tr.withColumn("dow", pmod(col("d"), lit(7)))
        .join(broadcast(seas), Seq("dow"), "left")
        .select(col("d"), col("n"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("n") - col("trend") - col("seasonal"), 6).as("resid"))
        .orderBy("d")
    }),

    // cross-correlation function between the purchase and view daily
    // series at lags −7..+7 (the CCF of Box & Jenkins, *Time Series
    // Analysis*, 1970 §11 — "does one metric LEAD the other?", the
    // question ts_autocorr's single-series ACF cannot ask): per lag,
    // Pearson r between x_t (purchases) and y_{t+lag} (views) over the
    // overlapping days. The corpus collapses ONCE to the two ≤|days|
    // daily count tables; the 15 lags come from one exploded sequence
    // against the compact frame (the frame stays ≤15·|days| rows —
    // day-domain-bounded at any SF). Counts are exact integers, so ALL
    // five sufficient statistics are exact BIGINT sums and the
    // cross-moment form n·Σxy − Σx·Σy is exact integer arithmetic — the
    // only float op is the final normalized division (6dp), identical
    // on both engines.
    "ts_cross_corr" -> ((s, sf) => {
      val daily = t(s, sf, "events")
        .where(col("event_type").isin("purchase", "view"))
        .groupBy(expr(s"unix_micros(ts) div $DayUs").as("d"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val x = daily.where(col("event_type") === "purchase")
        .select(col("d"), col("n").as("x"))
      val y = daily.where(col("event_type") === "view")
        .select(col("d"), col("n").as("y"))
      x.select(col("d"), col("x"),
          explode(expr("sequence(-7, 7)")).as("lag"))
        .join(y.select(col("d").as("dy"), col("y")),
          col("d") + col("lag") === col("dy"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .where(col("n_days") >= 8)
        .select(col("lag").cast("long").as("lag"), col("n_days"),
          round((col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n_days") * col("syy") - col("sy") * col("sy"))
                .cast("double")), 6).as("ccf"))
        .orderBy("lag")
    }),

    // association rules with confidence and lift (Agrawal, Imieliński &
    // Swami, SIGMOD 1993 — the support/confidence framework;
    // Brin et al. SIGMOD 1997 for lift/interest) over (user, day)
    // event-type baskets — the DIRECTED rule surface events_cooccur's
    // symmetric pair counts and events_itemsets' frequent sets stop
    // short of: for every ordered type pair a→b, support n_ab (baskets
    // with both), confidence n_ab/n_a ("given a that day, how often b"),
    // and lift N·n_ab/(n_a·n_b) (association strength normalized by
    // independence — lift < 1 IS informative, so no lift floor, only a
    // support floor). Baskets are user-DAYS, not users: on this corpus
    // every user eventually touches every type, so user-level baskets
    // degenerate to all-1.0 rules — the day grain is where association
    // is a real signal. The corpus collapses ONCE to the distinct
    // (user, day, type) frame; antecedent counts are a rollup of it; the
    // basket self-join shuffles on the (user, day) basket key (baskets
    // are ≤|types| wide, so pairs are ≤k²·baskets — linear in baskets,
    // never corpus²); everything after runs on the ≤k²-row rule frame.
    // Counts and N are exact integers; confidence/lift are single
    // divisions over exact operands (6dp); N rides a 1-row broadcast.
    "events_assoc_rules" -> ((s, sf) => {
      val ut = t(s, sf, "events")
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"),
          col("event_type")).distinct()
      val na = ut.groupBy(col("event_type").as("a")).agg(count(lit(1)).as("n_a"))
      val tot = ut.select("user_id", "d").distinct()
        .agg(count(lit(1)).as("nb_total"))
      val pairs = ut.select(col("user_id"), col("d"), col("event_type").as("a"))
        .join(ut.select(col("user_id"), col("d"), col("event_type").as("b")),
          Seq("user_id", "d"))
        .where(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 50)
      pairs.join(na, Seq("a"))
        .join(na.select(col("a").as("b"), col("n_a").as("n_b")), Seq("b"))
        .crossJoin(broadcast(tot))
        .select(col("a").as("antecedent"), col("b").as("consequent"),
          col("n_ab").as("support"),
          round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
          round(col("n_ab").cast("double") * col("nb_total") /
            (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy("antecedent", "consequent")
    }),

    // A/B experiment readout (round 12, third batch) — the two-proportion
    // z-test every experimentation pipeline ends in: users split 50/50 by
    // the PORTABLE md5 bucket (graft.operators.Split.portableBucket — the
    // same engine-reproducible assignment the split/sample tier rides, so
    // the oracle assigns identically), conversion = any purchase event,
    // then the pooled-variance z statistic. Per-user conversion collapses
    // in ONE map-side-combined aggregate; every count is an exact BIGINT;
    // the z is one identical float chain over exact operands (round 6).
    // On a hash-random split of one population z ≈ 0 — the null holds by
    // construction, which is exactly what a correctness row should pin
    // (an assignment bug or a count leak shows up as |z| inflation).
    "events_ab_test" -> ((s, sf) => {
      val v = when(graft.operators.Split.portableBucket(col("user_id"))
        < lit("80"), "control").otherwise("treatment")
      val users = t(s, sf, "events")
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= 14L).cast("long").as("conv"))
        .withColumn("variant", v)
      users.agg(
          sum(when(col("variant") === "control", 1L).otherwise(0L)).as("n_c"),
          sum(when(col("variant") === "control", col("conv")).otherwise(0L))
            .as("x_c"),
          sum(when(col("variant") === "treatment", 1L).otherwise(0L))
            .as("n_t"),
          sum(when(col("variant") === "treatment", col("conv")).otherwise(0L))
            .as("x_t"))
        .select(col("n_c"), col("x_c"), col("n_t"), col("x_t"),
          round(col("x_c").cast("double") / col("n_c"), 6).as("rate_c"),
          round(col("x_t").cast("double") / col("n_t"), 6).as("rate_t"),
          when(col("x_c") + col("x_t") === 0 ||
              col("x_c") + col("x_t") === col("n_c") + col("n_t"), lit(0.0))
            .otherwise(round((col("x_t").cast("double") / col("n_t")
                - col("x_c").cast("double") / col("n_c"))
              / sqrt((col("x_c") + col("x_t")).cast("double")
                  / (col("n_c") + col("n_t"))
                * (lit(1.0) - (col("x_c") + col("x_t")).cast("double")
                  / (col("n_c") + col("n_t")))
                * (lit(1.0) / col("n_c") + lit(1.0) / col("n_t"))), 6))
            .as("z"))
    }),

    // symbolic sequence-pattern matching (round 12, third batch) — the
    // MATCH_RECOGNIZE / CEP capability (SQL:2016 row pattern matching;
    // Flink CEP's core): each user's full event history becomes a
    // SYMBOL STRING (one char per event — the five corpus types have
    // distinct initials) in deterministic (ts, event_id) order, and the
    // funnel pattern v c* p ("view, then zero or more clicks, then
    // purchase, with nothing else between") is counted as non-overlapping
    // regex matches. Regex over a per-user symbol string is the
    // Spark-first reduction of row-pattern matching: the automaton the
    // MATCH_RECOGNIZE spec compiles to IS a regex over the symbol
    // alphabet, and both engines' regex engines agree on leftmost
    // non-overlapping semantics for this pattern class (no backreference
    // ambiguity). One sessionize-shaped shuffle (groupBy user); the
    // symbol string is bounded by per-user activity (≤ a few KB at any
    // SF — event history per user, never the corpus), and the match
    // runs map-side after the agg. Deterministic order inside
    // collect_list via array_sort on (us, event_id) — the events_path
    // discipline.
    "events_pattern" -> ((s, sf) => {
      t(s, sf, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), substring(col("event_type"), 1, 1).as("sym"))
        .groupBy("user_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("us"), col("event_id"),
            col("sym").as("s")))), x => x.getField("s")), "").as("seq"))
        .select(col("user_id"), length(col("seq")).as("n_events"),
          expr("size(regexp_extract_all(seq, 'vc*p', 0))").cast("long")
            .as("n_funnels"))
        .where(col("n_funnels") >= 1)
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS us1 FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
           s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS us2 FROM events e
                  JOIN s1 ON e.user_id = s1.user_id
                  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.us1
                    AND epoch_us(e.ts) <= s1.us1 + 86400000000 GROUP BY 1),
           s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS us3 FROM events e
                  JOIN s2 ON e.user_id = s2.user_id
                  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.us2
                    AND epoch_us(e.ts) <= s2.us2 + 86400000000 GROUP BY 1),
           u AS (SELECT DISTINCT user_id FROM events)
         SELECT u.user_id, s1.us1 AS signup_us, s2.us2 AS view_us,
           s3.us3 AS purchase_us,
           CAST(CASE WHEN s3.us3 IS NOT NULL THEN 3
                     WHEN s2.us2 IS NOT NULL THEN 2
                     WHEN s1.us1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
         FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
                LEFT JOIN s2 ON u.user_id = s2.user_id
                LEFT JOIN s3 ON u.user_id = s3.user_id
         ORDER BY u.user_id""",
    "retention_cohort" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
           f AS (SELECT user_id, min(us) AS t0 FROM e GROUP BY 1)
         SELECT CAST((t0 // 86400000000) * 86400000000 AS BIGINT) AS cohort_day,
           CAST((us - t0) // 604800000000 AS BIGINT) AS wk,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN f ON e.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY cohort_day, wk""",
    "ts_fill_gaps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value FROM events),
           daily AS (SELECT user_id, d, count(*) AS n,
                       sum(CAST(value AS DECIMAL(18,2))) AS sv
                     FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(d) AS lo, max(d) AS hi FROM e GROUP BY 1),
           grid AS (SELECT user_id, unnest([lo + x for x in range(0, hi - lo + 1)]) AS d
                    FROM span)
         SELECT g.user_id, CAST(g.d AS BIGINT) AS d,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           round(CAST(coalesce(sv, 0) AS DOUBLE), 2) AS sum_value
         FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
         ORDER BY g.user_id, g.d""",
    "ts_rolling_avg" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value FROM events),
           daily AS (SELECT user_id, d, count(*) AS n,
                       sum(CAST(value AS DECIMAL(18,2))) AS sv
                     FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(d) AS lo, max(d) AS hi FROM e GROUP BY 1),
           grid AS (SELECT user_id, unnest([lo + x for x in range(0, hi - lo + 1)]) AS d
                    FROM span),
           filled AS (SELECT g.user_id, g.d,
               CAST(coalesce(n, 0) AS BIGINT) AS n_events,
               round(CAST(coalesce(sv, 0) AS DOUBLE), 2) AS sum_value
             FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d)
         SELECT user_id, CAST(d AS BIGINT) AS d, n_events, sum_value,
           round(avg(sum_value) OVER (PARTITION BY user_id ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg7,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
         FROM filled ORDER BY user_id, d""",
    "events_markov" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             FROM events),
           nx AS (SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS to_type
             FROM e)
         SELECT from_type, to_type, count(*) AS n
         FROM nx WHERE to_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "agg_incremental" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value
             FROM events)
         SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value,
           CAST(min(d) AS BIGINT) AS d_min, CAST(max(d) AS BIGINT) AS d_max
         FROM e GROUP BY 1 ORDER BY 1""",
    "events_ngrams" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             FROM events),
           w AS (SELECT event_type AS t1,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS t2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS t3
             FROM e)
         SELECT t1, t2, t3, count(*) AS n FROM w
         WHERE t2 IS NOT NULL AND t3 IS NOT NULL
         GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20""",
    "ts_zscore" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value FROM events),
           daily AS (SELECT user_id, d, count(*) AS n,
                       sum(CAST(value AS DECIMAL(18,2))) AS sv
                     FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(d) AS lo, max(d) AS hi FROM e GROUP BY 1),
           grid AS (SELECT user_id, unnest([lo + x for x in range(0, hi - lo + 1)]) AS d
                    FROM span),
           filled AS (SELECT g.user_id, CAST(g.d AS BIGINT) AS d,
               round(CAST(coalesce(sv, 0) AS DOUBLE), 2) AS sum_value
             FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d),
           fr AS (SELECT user_id, d, sum_value,
               count(*) OVER w AS n7,
               CAST(sum(CAST(sum_value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
               CAST(sum(CAST(sum_value AS DECIMAL(18,2))
                        * CAST(sum_value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s2
             FROM filled
             WINDOW w AS (PARTITION BY user_id ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
           zs AS (SELECT user_id, d, sum_value,
               CASE WHEN n7 >= 3 AND (s2 - s1*s1/n7) / (n7 - 1) > 0
                    THEN round((sum_value - s1/n7)
                               / sqrt((s2 - s1*s1/n7) / (n7 - 1)), 6) END AS z
             FROM fr)
         SELECT user_id, d, sum_value, z,
           CASE WHEN z IS NOT NULL AND abs(z) > 2.0 THEN true ELSE false END
             AS anomaly
         FROM zs ORDER BY user_id, d""",
    "events_cooccur" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             FROM events),
           g AS (SELECT *, CASE WHEN lag(us) OVER w IS NOT NULL
                    AND us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
             FROM g),
           st AS (SELECT DISTINCT user_id, sess, event_type FROM s)
         SELECT a.event_type AS t1, b.event_type AS t2,
           CAST(count(*) AS BIGINT) AS n
         FROM st a JOIN st b ON a.user_id = b.user_id AND a.sess = b.sess
           AND a.event_type < b.event_type
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "ts_holt" ->
      """WITH RECURSIVE
           daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d,
               count(*) AS y
             FROM events GROUP BY 1, 2),
           s AS (SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS idx,
               CAST(y AS DOUBLE) AS y
             FROM daily),
           n AS (SELECT event_type, count(*) AS n_days FROM s GROUP BY 1),
           h AS (
             SELECT event_type, idx, y AS l, CAST(0.0 AS DOUBLE) AS b
             FROM s WHERE idx = 1
             UNION ALL
             SELECT s.event_type, s.idx,
               0.3 * s.y + 0.7 * (h.l + h.b) AS l,
               0.2 * ((0.3 * s.y + 0.7 * (h.l + h.b)) - h.l) + 0.8 * h.b AS b
             FROM h JOIN s ON s.event_type = h.event_type
               AND s.idx = h.idx + 1)
         SELECT n.event_type, CAST(n.n_days AS BIGINT) AS n_days,
           round(h.l, 6) AS level, round(h.b, 6) AS trend,
           round(h.l + 7.0 * h.b, 6) AS fc_7
         FROM h JOIN n ON n.event_type = h.event_type AND h.idx = n.n_days
         ORDER BY n.event_type""",
    "ts_adf" ->
      """WITH daily AS (SELECT event_type AS g,
             epoch_us(ts) // 86400000000 AS d, count(*) AS y
           FROM events GROUP BY 1, 2),
           o AS (SELECT g, y - lag(y) OVER w AS dy, lag(y) OVER w AS z,
               CAST(row_number() OVER w AS BIGINT) AS tt
             FROM daily WINDOW w AS (PARTITION BY g ORDER BY d)),
           obs AS (SELECT * FROM o WHERE z IS NOT NULL),
           s AS (SELECT g, count(*) AS n, sum(z) AS sz, sum(tt) AS st,
               sum(z*z) AS szz, sum(tt*tt) AS stt, sum(z*tt) AS szt,
               sum(dy) AS sdy, sum(dy*z) AS sdyz, sum(dy*tt) AS sdyt,
               sum(dy*dy) AS sdd
             FROM obs GROUP BY 1),
           dd AS (SELECT g, CAST(n AS DOUBLE) dn, CAST(sz AS DOUBLE) dsz,
               CAST(st AS DOUBLE) dst, CAST(szz AS DOUBLE) dszz,
               CAST(stt AS DOUBLE) dstt, CAST(szt AS DOUBLE) dszt,
               CAST(sdy AS DOUBLE) dsdy, CAST(sdyz AS DOUBLE) dsdyz,
               CAST(sdyt AS DOUBLE) dsdyt, CAST(sdd AS DOUBLE) dsdd
             FROM s),
           k AS (SELECT g, dn, dsdy, dsdyz, dsdyt, dsdd, dstt, dst,
               dn * (dszz * dstt - dszt * dszt)
                 - dsz * (dsz * dstt - dszt * dst)
                 + dst * (dsz * dszt - dszz * dst) AS det,
               dsdy * (dszz * dstt - dszt * dszt)
                 - dsz * (dsdyz * dstt - dszt * dsdyt)
                 + dst * (dsdyz * dszt - dszz * dsdyt) AS det1,
               dn * (dsdyz * dstt - dszt * dsdyt)
                 - dsdy * (dsz * dstt - dszt * dst)
                 + dst * (dsz * dsdyt - dsdyz * dst) AS det2,
               dn * (dszz * dsdyt - dsdyz * dszt)
                 - dsz * (dsz * dsdyt - dsdyz * dst)
                 + dsdy * (dsz * dszt - dszz * dst) AS det3
             FROM dd),
           fit AS (SELECT g, dn, dstt, dst, det,
               det1 / det AS alpha, det2 / det AS rho, det3 / det AS beta,
               dsdy, dsdyz, dsdyt, dsdd FROM k),
           fin AS (SELECT g, dn, det, rho,
               (dsdd - alpha * dsdy - rho * dsdyz - beta * dsdyt)
                 / (dn - 3.0) AS s2,
               dn * dstt - dst * dst AS c22 FROM fit)
         SELECT g AS event_type, CAST(dn AS BIGINT) AS n_obs,
           round(rho, 6) AS rho,
           round(rho / sqrt(s2 * c22 / det), 6) AS t_stat
         FROM fin ORDER BY event_type""",
    "ts_ewma" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value
             FROM events),
           daily AS (SELECT user_id, d, count(*) AS n,
               sum(CAST(value AS DECIMAL(18,2))) AS sv
             FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(d) AS lo, max(d) AS hi FROM e GROUP BY 1),
           grid AS (SELECT user_id, unnest([lo + x for x in range(0, hi - lo + 1)]) AS d
                    FROM span),
           filled AS (SELECT g.user_id, g.d,
               CAST(coalesce(n, 0) AS BIGINT) AS n_events,
               round(CAST(coalesce(sv, 0) AS DOUBLE), 2) AS sum_value,
               CAST(round(round(CAST(coalesce(sv, 0) AS DOUBLE), 2) * 100)
                 AS BIGINT) AS cents
             FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id
               AND g.d = daily.d)
         SELECT a.user_id, CAST(a.d AS BIGINT) AS d, a.n_events, a.sum_value,
           round(sum(b.cents * pow(0.5, a.d - b.d))
             / (2.0 - pow(0.5, count(*) - 1)) / 100.0, 6) AS ewma
         FROM filled a JOIN filled b ON a.user_id = b.user_id
           AND b.d >= a.d - 7 AND b.d <= a.d
         GROUP BY a.user_id, a.d, a.n_events, a.sum_value
         ORDER BY 1, 2""",
    "events_triangles" ->
      """WITH ua AS (SELECT user_id, d, event_type FROM
               (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d,
                       event_type FROM events)
             QUALIFY count(*) OVER (PARTITION BY d, event_type) <= 65536),
         e AS (SELECT a.user_id AS u1, b.user_id AS u2
               FROM ua a JOIN ua b ON a.d = b.d AND a.event_type = b.event_type
                                   AND a.user_id < b.user_id
               GROUP BY 1, 2 HAVING count(*) >= 30),
         tri AS (SELECT e1.u1 AS a, e1.u2 AS b, e2.u2 AS c
                 FROM e e1 JOIN e e2 ON e2.u1 = e1.u2
                           JOIN e e3 ON e3.u1 = e1.u1 AND e3.u2 = e2.u2)
         SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
                CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
                CAST((SELECT count(DISTINCT u)
                      FROM (SELECT unnest([a, b, c]) AS u FROM tri)) AS BIGINT) AS n_tri_users""",
    "ts_autocorr" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS x
             FROM events GROUP BY 1),
         wk AS (SELECT d, x, unnest(range(1, 8)) AS k FROM daily),
         pairs AS (SELECT wk.k, wk.x AS x, b.x AS y
             FROM wk JOIN daily b ON b.d = wk.d + wk.k),
         s AS (SELECT k, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(y*y) AS BIGINT) AS syy,
                      CAST(sum(x*y) AS BIGINT) AS sxy
               FROM pairs GROUP BY k)
         SELECT k, n,
           round(CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
             ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                  / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                     * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END, 6) AS autocorr
         FROM s ORDER BY k""",
    "events_concurrency" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                            min(epoch_us(ts)) AS st, max(epoch_us(ts)) AS en
             FROM events GROUP BY 1, 2),
         starts AS (SELECT d, st AS t, count(*) AS ns FROM iv GROUP BY 1, 2),
         ends AS (SELECT d, en AS t, count(*) AS ne FROM iv GROUP BY 1, 2),
         pts AS (SELECT coalesce(starts.d, ends.d) AS d,
                        coalesce(starts.t, ends.t) AS t,
                        coalesce(ns, 0) AS ns, coalesce(ne, 0) AS ne
                 FROM starts FULL JOIN ends
                   ON starts.d = ends.d AND starts.t = ends.t),
         conc AS (SELECT d, t,
             CAST(sum(ns) OVER (PARTITION BY d ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - CAST(coalesce(sum(ne) OVER (PARTITION BY d ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
           FROM pts),
         users AS (SELECT d, count(*) AS n_users FROM iv GROUP BY 1)
         SELECT conc.d, max(c) AS peak, max(n_users) AS n_users
         FROM conc JOIN users ON users.d = conc.d
         GROUP BY conc.d ORDER BY conc.d""",
    "ts_changepoint" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS cnt
             FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total, count(*) AS n_days
             FROM daily),
         cum AS (SELECT d, cnt, CAST(sum(cnt) OVER (ORDER BY d) AS BIGINT) AS cum,
                 CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k FROM daily)
         SELECT d, cnt, round(abs(CAST(cum AS DOUBLE) / CAST(k AS DOUBLE)
             - CAST(n_total - cum AS DOUBLE) / CAST(n_days - k AS DOUBLE)), 6) AS shift
         FROM cum CROSS JOIN tot WHERE k < n_days ORDER BY d""",
    "ts_seasonality" ->
      """WITH daily AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
             count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS sv
           FROM events GROUP BY 1, 2)
         SELECT CAST(d % 7 AS BIGINT) AS dow,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS user_days,
           round(CAST(sum(sv) AS DOUBLE) / sum(n), 6) AS avg_value
         FROM daily GROUP BY 1 ORDER BY 1""",
    "events_pareto" ->
      """WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
           q AS (SELECT quantile_cont(n, 0.1) q1, quantile_cont(n, 0.2) q2,
               quantile_cont(n, 0.3) q3, quantile_cont(n, 0.4) q4,
               quantile_cont(n, 0.5) q5, quantile_cont(n, 0.6) q6,
               quantile_cont(n, 0.7) q7, quantile_cont(n, 0.8) q8,
               quantile_cont(n, 0.9) q9 FROM u),
           tot AS (SELECT sum(n) AS tot FROM u)
         SELECT CAST(1 + (n > q1)::INT + (n > q2)::INT + (n > q3)::INT
             + (n > q4)::INT + (n > q5)::INT + (n > q6)::INT + (n > q7)::INT
             + (n > q8)::INT + (n > q9)::INT AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(CAST(sum(n) AS DOUBLE) / max(tot), 6) AS share
         FROM u, q, tot GROUP BY 1 ORDER BY 1""",
    "events_inter_arrival" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           g AS (SELECT us - lag(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS gap FROM e),
           gaps AS (SELECT gap FROM g WHERE gap IS NOT NULL),
           banded AS (SELECT CAST(CASE
                 WHEN gap < 60000000 THEN 1
                 WHEN gap < 600000000 THEN 2
                 WHEN gap < 3600000000 THEN 3
                 WHEN gap < 86400000000 THEN 4
                 ELSE 5 END AS BIGINT) AS band, gap FROM gaps),
           stats AS (SELECT band, count(*) AS n_gaps, min(gap) AS min_us,
               max(gap) AS max_us FROM banded GROUP BY 1),
           tot AS (SELECT count(*) AS nt FROM gaps),
           bands AS (SELECT unnest([1, 2, 3, 4, 5]) AS band)
         SELECT CAST(bands.band AS BIGINT) AS band,
           CAST(coalesce(n_gaps, 0) AS BIGINT) AS n_gaps, min_us, max_us,
           round(CAST(coalesce(n_gaps, 0) AS DOUBLE)
             / CAST((SELECT nt FROM tot) AS DOUBLE), 6) AS share
         FROM bands LEFT JOIN stats ON stats.band = bands.band
         ORDER BY band""",
    "events_lorenz" ->
      """WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
           r AS (SELECT user_id, n,
               row_number() OVER (ORDER BY n, user_id) AS rn,
               sum(n) OVER (ORDER BY n, user_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM u),
           tot AS (SELECT count(*) AS nu, sum(n) AS ne FROM u)
         SELECT (rn * 20 + nu - 1) // nu AS ventile,
           round(CAST(max(rn) AS DOUBLE) / CAST(max(nu) AS DOUBLE), 6)
             AS u_frac,
           round(CAST(max(cum) AS DOUBLE) / CAST(max(ne) AS DOUBLE), 6)
             AS e_frac
         FROM r, tot GROUP BY 1 ORDER BY 1""",
    "events_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           g AS (SELECT *, CASE WHEN lag(us) OVER w IS NOT NULL
                    AND us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
             FROM g),
           per AS (SELECT user_id, sess, count(*) AS len,
               max(us) - min(us) AS dur_us
             FROM s GROUP BY 1, 2)
         SELECT CAST(len AS BIGINT) AS len,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(CAST(sum(dur_us) AS DOUBLE) / count(*), 2) AS avg_dur_us,
           CAST(max(dur_us) AS BIGINT) AS max_dur_us
         FROM per GROUP BY 1 ORDER BY 1""",
    "events_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
             FROM events),
           dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1),
           ex AS (SELECT user_id, unnest([d + x for x in range(0, 7)]) AS d7
             FROM ud),
           wau AS (SELECT d7 AS d, count(DISTINCT user_id) AS wau FROM ex
             GROUP BY 1)
         SELECT CAST(dau.d AS BIGINT) AS d, CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau,
           round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
         FROM dau JOIN wau ON dau.d = wau.d ORDER BY 1""",
    "ts_rolling_median" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value
             FROM events),
           daily AS (SELECT user_id, d,
               sum(CAST(value AS DECIMAL(18,2))) AS sv FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(d) lo, max(d) hi FROM e GROUP BY 1),
           grid AS (SELECT user_id,
               unnest([lo + x for x in range(0, hi - lo + 1)]) AS d FROM span),
           filled AS (SELECT g.user_id, CAST(g.d AS BIGINT) AS d,
               round(CAST(coalesce(sv, 0) AS DOUBLE), 2) AS v
             FROM grid g LEFT JOIN daily
               ON g.user_id = daily.user_id AND g.d = daily.d)
         SELECT user_id, d,
           round(CAST(quantile_cont(v, 0.5) OVER (PARTITION BY user_id
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS DOUBLE), 6) AS med7
         FROM filled ORDER BY user_id, d""",
    "ts_interpolate" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, value
             FROM events),
           daily AS (SELECT user_id, d,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS v
             FROM e GROUP BY 1, 2),
           span AS (SELECT user_id, min(d) lo, max(d) hi FROM e GROUP BY 1),
           grid AS (SELECT user_id,
               unnest([lo + x for x in range(0, hi - lo + 1)]) AS d FROM span),
           filled AS (SELECT g.user_id, CAST(g.d AS BIGINT) AS d, v
             FROM grid g LEFT JOIN daily
               ON g.user_id = daily.user_id AND g.d = daily.d),
           w2 AS (SELECT user_id, d, v,
               last_value(v IGNORE NULLS) OVER wb AS pv,
               max(CASE WHEN v IS NOT NULL THEN d END) OVER wb AS pd,
               first_value(v IGNORE NULLS) OVER wf AS nv,
               min(CASE WHEN v IS NOT NULL THEN d END) OVER wf AS nd
             FROM filled
             WINDOW wb AS (PARTITION BY user_id ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY d
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, d, v,
           round(CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (d - pd) / (nd - pd)
             WHEN pv IS NOT NULL THEN pv ELSE nv END, 6) AS v_interp,
           CASE WHEN v IS NOT NULL THEN 'obs'
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
             WHEN pv IS NOT NULL THEN 'ffill' ELSE 'bfill' END AS src
         FROM w2 ORDER BY user_id, d""",
    "ts_diff" ->
      """WITH daily AS (
           SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         l AS (
           SELECT g, d, n,
             lag(n) OVER (PARTITION BY g ORDER BY d) AS prev
           FROM daily)
         SELECT g, CAST(d AS BIGINT) AS d, CAST(n AS BIGINT) AS n,
           CAST(n - prev AS BIGINT) AS diff,
           CASE WHEN prev > 0
                THEN round((n - prev) * 1.0 / prev, 6) END AS pct
         FROM l ORDER BY g, d""",
    "win_drawdown" ->
      """WITH daily AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                  sum(CAST(value AS DECIMAL(18,2))) AS dv
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (
           SELECT user_id, d, dv,
             sum(dv) OVER (PARTITION BY user_id ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM daily),
         p AS (
           SELECT user_id, d, cum,
             max(cum) OVER (PARTITION BY user_id ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS peak
           FROM c)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(peak - cum) AS DOUBLE) AS max_drawdown
         FROM p GROUP BY 1 ORDER BY user_id""",
    "events_user_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type AS et, user_id FROM events),
           sz AS (SELECT et, count(*) AS n FROM tu GROUP BY 1),
           cm AS (SELECT a.et AS type_a, b.et AS type_b, count(*) AS n_common
                  FROM tu a JOIN tu b
                    ON a.user_id = b.user_id AND a.et < b.et
                  GROUP BY 1, 2)
         SELECT cm.type_a, cm.type_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(cm.n_common AS BIGINT) AS n_common,
           round(CAST(cm.n_common AS DOUBLE) /
             (sa.n + sb.n - cm.n_common), 6) AS jaccard
         FROM cm JOIN sz sa ON sa.et = cm.type_a
                 JOIN sz sb ON sb.et = cm.type_b
         ORDER BY type_a, type_b""",
    "events_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events
             GROUP BY 1, 2)
         SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy
         FROM c GROUP BY 1 ORDER BY 1""",
    "ts_cum_users" ->
      """WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS d0
             FROM events GROUP BY 1),
           nd AS (SELECT d0 AS d, count(*) AS new_users FROM f GROUP BY 1)
         SELECT CAST(d AS BIGINT) AS d, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users
         FROM nd ORDER BY d""",
    "events_rfm" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
             event_type, value FROM events),
           mx AS (SELECT max(d) AS dmax FROM e),
           u AS (SELECT user_id,
               (SELECT dmax FROM mx) - max(d) AS rec,
               count(*) FILTER (WHERE event_type = 'purchase') AS freq,
               CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                 FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS mon
             FROM e GROUP BY 1),
           q AS (SELECT quantile_cont(rec, 0.25) r1, quantile_cont(rec, 0.5) r2,
               quantile_cont(rec, 0.75) r3,
               quantile_cont(freq, 0.25) f1, quantile_cont(freq, 0.5) f2,
               quantile_cont(freq, 0.75) f3,
               quantile_cont(mon, 0.25) m1, quantile_cont(mon, 0.5) m2,
               quantile_cont(mon, 0.75) m3 FROM u)
         SELECT CAST(1 + (rec > r1)::INT + (rec > r2)::INT + (rec > r3)::INT
               AS BIGINT) AS r_q,
           CAST(1 + (freq > f1)::INT + (freq > f2)::INT + (freq > f3)::INT
               AS BIGINT) AS f_q,
           CAST(1 + (mon > m1)::INT + (mon > m2)::INT + (mon > m3)::INT
               AS BIGINT) AS m_q,
           CAST(count(*) AS BIGINT) AS n_users
         FROM u, q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "ts_ohlc" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey,
             value FROM events)
         SELECT user_id, wk, CAST(count(*) AS BIGINT) AS n,
           round(arg_min(value, okey), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(arg_max(value, okey), 2) AS close,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS vsum
         FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
    "win_streak" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
             FROM events),
           i AS (SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
             FROM e),
           s AS (SELECT user_id, isl, count(*) AS len FROM i GROUP BY 1, 2)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest,
           CAST(sum(len) AS BIGINT) AS active_days
         FROM s GROUP BY 1 ORDER BY 1""",
    "events_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
             value FROM events),
           m AS (SELECT user_id, us, event_type, value,
               last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN event_type END IGNORE NULLS) OVER w AS touch,
               max(CASE WHEN event_type IN ('view', 'click') THEN us END)
                 OVER w AS touch_us
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT touch AS touch_type, CAST(count(*) AS BIGINT) AS n_purchases,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS attributed_value
         FROM m
         WHERE event_type = 'purchase' AND touch IS NOT NULL
           AND us - touch_us <= 7 * 86400000000
         GROUP BY 1 ORDER BY 1""",
    "events_path" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             FROM events),
           g AS (SELECT *, CASE WHEN lag(us) OVER w IS NOT NULL
                    AND us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
             FROM g),
           r AS (SELECT user_id, sess, event_type,
               row_number() OVER (PARTITION BY user_id, sess
                 ORDER BY us, event_id) AS rn
             FROM s),
           p AS (SELECT user_id, sess,
               string_agg(event_type, '>' ORDER BY rn) AS path
             FROM r WHERE rn <= 3 GROUP BY 1, 2)
         SELECT path, CAST(count(*) AS BIGINT) AS n FROM p
         GROUP BY 1 ORDER BY n DESC, path LIMIT 10""",
    "events_conversion_lag" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
             WHERE event_type = 'view' GROUP BY 1),
           p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us, min(v.v_us) AS v_us
             FROM events e JOIN v ON e.user_id = v.user_id
             WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
             GROUP BY 1),
           lag AS (SELECT p_us - v_us AS lag_us FROM p)
         SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lag_us) AS BIGINT) AS min_us,
           round(quantile_cont(lag_us, 0.5), 1) AS med_us,
           round(quantile_cont(lag_us, 0.9), 1) AS p90_us,
           CAST(max(lag_us) AS BIGINT) AS max_us
         FROM lag""",
    "agg_chisq" ->
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
             LEFT JOIN c ON c.event_type = rt.event_type AND c.dow = ct.dow)
         SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(dr * dc) AS BIGINT) AS dof,
           round(sum(pow(o - rn * cn * 1.0 / nt, 2) / (rn * cn * 1.0 / nt)), 6) AS chi2
         FROM cells CROSS JOIN tot""",
    "ts_forecast" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS y
             FROM events GROUP BY 1),
           mx AS (SELECT max(d) AS dmax FROM daily),
           tr AS (SELECT sum(y) AS sy, count(*) AS nd FROM daily
                  WHERE d <= (SELECT dmax FROM mx) - 7)
         SELECT a.d, a.y, b.y AS yhat_snaive,
           round(CAST(sy AS DOUBLE) / nd, 6) AS yhat_mean,
           CAST(abs(a.y - b.y) AS BIGINT) AS ae_snaive,
           round(abs(a.y - CAST(sy AS DOUBLE) / nd), 6) AS ae_mean
         FROM daily a
         JOIN daily b ON b.d = a.d - 7
         CROSS JOIN tr
         WHERE a.d > (SELECT dmax FROM mx) - 7
         ORDER BY a.d""",
    "agg_mwu" ->
      """WITH byv AS (SELECT value,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
             count(*) AS tt
           FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
           rk AS (SELECT c1, tt,
             coalesce(sum(tt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (tt + 1) / 2.0 AS avg_rk
           FROM byv),
           agg AS (SELECT sum(c1 * avg_rk) AS r1, sum(c1) AS n1,
             sum(tt - c1) AS n2, sum(tt) AS nn,
             sum(tt * tt * tt - tt) AS tsum FROM rk)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u1,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0 * ((nn + 1) - tsum * 1.0 / (nn * (nn - 1)))),
             6) AS z
         FROM agg""",
    "ts_anomaly" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d,
             count(*) AS x FROM events GROUP BY 1, 2),
           m AS (SELECT event_type, count(*) AS nd, sum(x) AS sn,
             sum(x * x) AS snn FROM daily GROUP BY 1),
           z AS (SELECT event_type, d, x,
             round((x * nd - sn) / sqrt(CAST(nd * snn - sn * sn AS DOUBLE)), 6) AS z
             FROM daily JOIN m USING (event_type)
             WHERE nd * snn - sn * sn > 0)
         SELECT event_type, CAST(d AS BIGINT) AS d, CAST(x AS BIGINT) AS n_events, z
         FROM z WHERE abs(z) > 2.0 ORDER BY event_type, d""",
    "events_survival" ->
      """WITH u AS (SELECT user_id, min(epoch_us(ts) // 3600000000) AS h0
             FROM events GROUP BY 1),
           conv AS (SELECT user_id, min(epoch_us(ts) // 3600000000) AS hc
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
           life AS (SELECT
               CASE WHEN hc IS NULL OR hc - h0 > 48 THEN 48
                    ELSE hc - h0 END AS lt,
               CASE WHEN hc IS NULL OR hc - h0 > 48 THEN 0 ELSE 1 END AS ev
             FROM u LEFT JOIN conv USING (user_id)),
           byt AS (SELECT lt AS t_hour, sum(ev) AS d_t, count(*) AS ended_t
             FROM life GROUP BY 1),
           risk AS (SELECT t_hour, d_t,
               sum(ended_t) OVER (ORDER BY t_hour DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
             FROM byt)
         SELECT t_hour, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_t AS BIGINT) AS n_conv,
           round(exp(sum(CASE WHEN d_t < n_risk
               THEN ln(1.0 - d_t * 1.0 / n_risk)
               ELSE CAST('-infinity' AS DOUBLE) END) OVER (
             ORDER BY t_hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS surv
         FROM risk WHERE d_t > 0 ORDER BY t_hour""",
    "events_out_of_order" ->
      """WITH a AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us,
             epoch_us(ts)
               + ((ascii(substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) * 31
                   + ascii(substr(md5(CAST(event_id AS VARCHAR)), 2, 1)))
                  % 1024) * 1500000 AS arr_us
           FROM events),
           l AS (SELECT event_type,
             greatest(0, coalesce(max(us) OVER (PARTITION BY user_id
                 ORDER BY arr_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us)
               - us) AS late_us
           FROM a)
         SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reordered,
           CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late_10m,
           round(max(late_us) / 1e6, 6) AS max_late_s,
           round((sum(CASE WHEN late_us > 0 THEN late_us ELSE 0 END)
             / CAST(greatest(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END),
                 1) AS DOUBLE)) / 1e6, 6) AS avg_reorder_s
         FROM l GROUP BY 1 ORDER BY event_type""",
    "ts_decompose" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
             count(*) AS n
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         tr AS (SELECT d, n,
             CASE WHEN count(*) OVER w7 = 7
               THEN sum(n) OVER w7 / 7.0 END AS trend
           FROM daily
           WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         seas AS (SELECT d % 7 AS dow,
             CAST(sum(CAST(n - trend AS DECIMAL(38,15))) AS DOUBLE)
               / count(*) AS seasonal
           FROM tr WHERE trend IS NOT NULL GROUP BY 1)
         SELECT d, CAST(n AS BIGINT) AS n, round(trend, 6) AS trend,
           round(seasonal, 6) AS seasonal,
           round(n - trend - seasonal, 6) AS resid
         FROM tr LEFT JOIN seas ON d % 7 = seas.dow ORDER BY d""",
    "ts_cross_corr" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, event_type,
             count(*) AS n FROM events
           WHERE event_type IN ('purchase', 'view') GROUP BY 1, 2),
         x AS (SELECT d, n AS x FROM daily WHERE event_type = 'purchase'),
         y AS (SELECT d AS dy, n AS y FROM daily WHERE event_type = 'view'),
         lagged AS (SELECT x.d, x.x, l.lag, y.y
           FROM x CROSS JOIN (SELECT unnest(range(-7, 8)) AS lag) l
           JOIN y ON x.d + l.lag = y.dy),
         agg AS (SELECT lag, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
           FROM lagged GROUP BY 1 HAVING count(*) >= 8)
         SELECT CAST(lag AS BIGINT) AS lag, CAST(n_days AS BIGINT) AS n_days,
           round(CAST(n_days * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
               * CAST(n_days * syy - sy * sy AS DOUBLE)), 6) AS ccf
         FROM agg ORDER BY lag""",
    "events_assoc_rules" ->
      """WITH ut AS MATERIALIZED (SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS d, event_type FROM events),
           na AS (SELECT event_type AS a, count(*) AS n_a FROM ut GROUP BY 1),
           tot AS (SELECT count(*) AS nb_total FROM
             (SELECT DISTINCT user_id, d FROM ut)),
           pairs AS (SELECT l.event_type AS a, r.event_type AS b,
               count(*) AS n_ab
             FROM ut l JOIN ut r ON l.user_id = r.user_id AND l.d = r.d
               AND l.event_type <> r.event_type
             GROUP BY 1, 2 HAVING count(*) >= 50)
         SELECT pairs.a AS antecedent, pairs.b AS consequent,
           CAST(n_ab AS BIGINT) AS support,
           round(CAST(n_ab AS DOUBLE) / na.n_a, 6) AS confidence,
           round(CAST(n_ab AS DOUBLE) * nb_total / (na.n_a * nb.n_a), 6)
             AS lift
         FROM pairs JOIN na ON na.a = pairs.a
                    JOIN na nb ON nb.a = pairs.b
                    CROSS JOIN tot
         ORDER BY antecedent, consequent""",
    "events_ab_test" ->
      """WITH u AS (SELECT user_id,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) >= 14 THEN 1 ELSE 0 END AS conv,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
               THEN 'control' ELSE 'treatment' END AS variant
           FROM events GROUP BY user_id),
           s AS (SELECT
             CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN variant = 'control' THEN conv ELSE 0 END)
               AS BIGINT) AS x_c,
             CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN variant = 'treatment' THEN conv ELSE 0 END)
               AS BIGINT) AS x_t
           FROM u)
         SELECT n_c, x_c, n_t, x_t,
           round(CAST(x_c AS DOUBLE) / n_c, 6) AS rate_c,
           round(CAST(x_t AS DOUBLE) / n_t, 6) AS rate_t,
           CASE WHEN x_c + x_t = 0 OR x_c + x_t = n_c + n_t THEN 0.0
             ELSE round((CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c)
               / sqrt(CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)
                 * (1.0 - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t))
                 * (1.0 / n_c + 1.0 / n_t)), 6) END AS z
         FROM s""",
    "events_pattern" ->
      """WITH seqs AS (SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
               ORDER BY epoch_us(ts), event_id) AS seq
           FROM events GROUP BY 1)
         SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
           CAST(length(regexp_extract_all(seq, 'vc*p', 0)) AS BIGINT)
             AS n_funnels
         FROM seqs WHERE length(regexp_extract_all(seq, 'vc*p', 0)) >= 1
         ORDER BY user_id"""
  )
}
