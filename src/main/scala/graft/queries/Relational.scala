package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.T
import graft.T.{Q, t}

/** SURVEY.md §2.1–2.3, §2.6, §2.7 — scans, projections/filters, joins,
  * sort/limit, set operations. Pure DataFrame-DSL, fully Catalyst-optimized:
  * filters/projections push to the parquet scan; small dimensions broadcast.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // §2.1 full scan with explicit projection
    "scan_parquet" -> ((s, sf) =>
      t(s, sf, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")),

    // §2.2 computed projection: revenue expression + casts
    // r18: computed projection above the global sort (the fn_math move,
    // see Scalars.scala) — the two string-repr decimal casts per row ran
    // twice (range-sampling pass + shuffle map pass); now once, after the
    // exchange, which carries the 5 raw columns instead
    "project_select" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)").cast("double").as("revenue"),
          col("l_quantity").cast("long").as("qty_int"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .cast("decimal(18,6)").cast("double").as("charge"))),

    // §2.2 compound predicate: BETWEEN / IN / LIKE / OR / IS NULL
    "filter_pred" -> ((s, sf) =>
      t(s, sf, "part")
        .filter(col("p_size").between(10, 20) &&
          (col("p_type").isin("ECONOMY", "PROMO") || col("p_name").like("red%")) &&
          col("p_brand").isNotNull)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")),

    // §2.3 equi inner join
    "join_inner" -> ((s, sf) => {
      val o = t(s, sf, "orders"); val c = t(s, sf, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
        .orderBy("o_orderkey")
    }),

    // §2.3 left outer join + aggregate (customers with zero orders kept)
    "join_left" -> ((s, sf) => {
      val o = t(s, sf, "orders"); val c = t(s, sf, "customer")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("order_cnt"),
          coalesce(T.dsum(col("o_totalprice"), 2), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    }),

    // §2.3 full outer join of two aggregated sides
    "join_full" -> ((s, sf) => {
      val c = t(s, sf, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("c_cnt"))
      val su = t(s, sf, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("s_cnt"))
      c.join(su, c("nk") === su("nk"), "full_outer")
        .select(coalesce(c("nk"), su("nk")).as("nk"),
          coalesce(col("c_cnt"), lit(0L)).as("c_cnt"),
          coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
        .orderBy("nk")
    }),

    // §2.3 left-semi: customers having at least one order
    "join_semi" -> ((s, sf) => {
      val o = t(s, sf, "orders"); val c = t(s, sf, "customer")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // §2.3 left-anti: customers with no urgent orders (the unfiltered FK is
    // fully covered in this corpus, so the anti side is filtered)
    "join_anti" -> ((s, sf) => {
      val o = t(s, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val c = t(s, sf, "customer")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // §2.3 explicit broadcast of the small dimension (plan-level hint;
    // at 100 TB the fact side never shuffles for this join)
    "join_broadcast" -> ((s, sf) => {
      val l = t(s, sf, "lineitem"); val p = t(s, sf, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(T.dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    // §2.3 bloom-prefiltered join (round 12) — the RUNTIME-FILTER pattern
    // as explicit user surface: build a bloom filter over the selective
    // dim's keys (nation-7 customers) with Spark's own BloomFilterAggregate
    // kernel (exposed as graft_bloom_agg/graft_bloom_contains — the exact
    // expressions AQE's internal runtime filtering uses), ship the
    // BLOOM-SIZED binary (128 KB here, never the keys) to the fact scan,
    // and drop ~24/25 of orders BEFORE the join shuffle. False positives
    // are eliminated by the exact equi-join that follows, so hash-matching
    // the plain-join SQL is precisely the correctness contract (the
    // join_salted "pure plan rewrite" discipline); false negatives are
    // impossible by construction. The driver boundary is bloom-bytes-
    // bounded (the scalar-subquery shape Spark itself materializes for
    // runtime filters), independent of corpus size — at 100 TB this is the
    // difference between shuffling the whole fact table and shuffling the
    // ~4% that can match, exactly where DPP/AQE can't see the selectivity
    // (a predicate on a non-partition dim attribute).
    "join_bloom" -> ((s, sf) => {
      val dim = t(s, sf, "customer").where(col("c_nationkey") === 7)
      val bf = dim.agg(
          expr("graft_bloom_agg(xxhash64(c_custkey), 100000L, 1048576L)")
            .as("bf")).head.getAs[Array[Byte]]("bf")
      val bfCol = if (bf == null) lit(null).cast("binary") else lit(bf)
      val o = t(s, sf, "orders")
        .where(call_function("graft_bloom_contains", bfCol,
          xxhash64(col("o_custkey"))))
      o.join(dim.select("c_custkey"), o("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          T.dsum(col("o_totalprice"), 2).as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // §2.3 skew-salted join DECLARED against the plain-join oracle: the
    // salting is a pure plan rewrite, so hash-matching the unsalted SQL is
    // exactly the correctness contract ([[graft.operators.Skew]]).
    // Round 11: the declared path is the two-phase hotSaltedJoin — a
    // sampled hot-key detect, then salt ONLY the hot keys and plain-join
    // the cold rest in one shuffle. On this uniform corpus no key clears
    // the hot threshold, so the whole query degrades to the plain join
    // plus one column-pruned 1% sample aggregate — which is exactly the
    // point: skew handling must not tax the un-skewed case. The hot path
    // itself is value-pinned in BucketingSpec on a 90%-one-key frame.
    "join_salted" -> ((s, sf) => {
      val l = t(s, sf, "lineitem").select("l_partkey", "l_quantity")
      val p = t(s, sf, "part").select("p_partkey", "p_brand")
        .withColumnRenamed("p_partkey", "l_partkey")
      graft.operators.Skew.hotSaltedJoin(l, p, "l_partkey", salts = 8,
          minHotRows = 50000L)
        .groupBy("p_brand")
        .agg(T.dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    // §2.2 scalar subquery: rows above the global average, per group
    "filter_subquery" -> ((s, sf) => {
      val l = t(s, sf, "lineitem")
      val avgQ = l.agg(avg(col("l_quantity")).as("gavg"))
      l.crossJoin(broadcast(avgQ))
        .filter(col("l_quantity") > col("gavg"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_above"), T.dsum(col("l_quantity"), 2).as("sum_above"))
        .orderBy("l_returnflag")
    }),

    // §2.3 cartesian product
    "join_cross" -> ((s, sf) =>
      t(s, sf, "region").crossJoin(t(s, sf, "nation"))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")),

    // §2.3 null-safe equality join (round 8): <=> treats NULL as a
    // joinable value (SQL IS NOT DISTINCT FROM) where = drops every
    // NULL-keyed row — the semantics a pipeline needs when a nullable
    // provenance key (here: a fabricated sometimes-NULL lang) must still
    // pair up. Still a hash-partitionable equi-join at any scale: the
    // null-safe comparison is an equi-key for shuffle purposes (NULLs
    // co-locate in one partition), never a nested loop. Aggregated to
    // per-key pair counts; NULLS FIRST pinned on both engines.
    "join_nullsafe" -> ((s, sf) => {
      val a = t(s, sf, "documents").select(col("doc_id").as("a_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(null)).otherwise(col("lang")).as("la"))
      val b = t(s, sf, "documents").select(col("doc_id").as("b_id"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit(null)).otherwise(col("lang")).as("lb"))
      a.join(b, col("la") <=> col("lb"))
        .groupBy("la")
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("b_id")).as("n_b"))
        .orderBy(asc_nulls_first("la"))
    }),

    // §2.3 range/interval join: same-user event pairs within (0, 5 min]
    // Executed through the banded operator [[graft.operators.RangeJoin]]:
    // an equi-join on (user, 5-min time bin) + exact residual, so one hot
    // user costs its 10-minute neighbourhoods, not |events(user)|² — the
    // plain equi-key + inequality plan's straggler mode at scale. Same
    // result set as the naive join (residual keeps exact semantics), same
    // oracle; RangeJoinSpec pins the equivalence and the plan shape.
    "join_range" -> ((s, sf) => {
      val e = t(s, sf, "events")
      val e1 = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
      val e2 = e.select(col("event_id").as("b_id"), col("user_id").as("u2"), col("ts").as("b_ts"))
      graft.operators.RangeJoin.within(e1, e2, col("user_id") === col("u2"),
          unix_micros(col("a_ts")), unix_micros(col("b_ts")),
          lowExclusive = 0L, highInclusive = 300000000L)
        .select("a_id", "b_id").orderBy("a_id", "b_id")
    }),

    // §2.3 as-of join: latest signup at-or-before each purchase, per user.
    // Expressed as a single ordered window MERGE, not an inequality join:
    // union both event types, sort per user by (ts, signup-before-purchase)
    // so an at-ts signup is visible to its purchase, and carry the latest
    // signup forward with last(ignoreNulls). Linear per user — one exchange,
    // no pair fan-out — where the r3 inequality-join + max() plan did
    // O(purchases × signups) work per user and stragglered on hot users.
    // Purchases with no at-or-before signup are dropped (inner-join
    // semantics, same as the oracle).
    "join_asof" -> ((s, sf) => {
      val e = t(s, sf, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "purchase").cast("int").as("is_p"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("is_p").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("signup_us",
          last(when(col("is_p") === 0, unix_micros(col("ts"))), ignoreNulls = true).over(w))
        .where(col("is_p") === 1 && col("signup_us").isNotNull)
        .select(col("event_id").as("p_id"), col("user_id"), col("signup_us"))
        .orderBy("p_id")
    }),

    // §2.3 FORWARD as-of join: EARLIEST signup at-or-after each purchase —
    // the same ordered window merge as join_asof run in reverse time
    // (desc ts; at equal ts the signup sorts first so it is visible to the
    // purchase). Still linear per user, one exchange, no pair fan-out.
    "join_asof_fwd" -> ((s, sf) => {
      val e = t(s, sf, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "purchase").cast("int").as("is_p"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("is_p").asc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("signup_us",
          last(when(col("is_p") === 0, unix_micros(col("ts"))), ignoreNulls = true).over(w))
        .where(col("is_p") === 1 && col("signup_us").isNotNull)
        .select(col("event_id").as("p_id"), col("user_id"), col("signup_us"))
        .orderBy("p_id")
    }),

    // §2.3 correlated LATERAL join: top-2 suppliers per nation by account
    // balance, via the Spark 4 Dataset.lateralJoin API (side-effect-free —
    // no temp views on the shared session) with `.outer()` marking the
    // correlated reference. The lateral subquery re-executes per outer row
    // LOGICALLY; Catalyst decorrelates it into a ranked window + join, so
    // the physical plan is the same shuffle topk_per_group gets — no
    // nested-loop execution.
    "join_lateral" -> ((s, sf) =>
      t(s, sf, "nation").lateralJoin(
          t(s, sf, "supplier")
            .where(col("s_nationkey") === col("n_nationkey").outer())
            .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
            .limit(2))
        .select("n_nationkey", "n_name", "s_name", "s_acctbal")
        .orderBy("n_nationkey", "s_name")),

    // §2.6 global top-k → TakeOrderedAndProject physical operator
    "sort_limit" -> ((s, sf) =>
      t(s, sf, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)),

    // §2.7 bag union of two conformed projections
    "set_union_all" -> ((s, sf) => {
      val c = t(s, sf, "customer").select(lit("C").as("side"),
        col("c_custkey").as("key"), col("c_name").as("name"), col("c_nationkey").as("nk"))
      val su = t(s, sf, "supplier").select(lit("S").as("side"),
        col("s_suppkey").as("key"), col("s_name").as("name"), col("s_nationkey").as("nk"))
      c.unionAll(su).orderBy("side", "key")
    }),

    // §2.7 set intersection (distinct semantics)
    "set_intersect" -> ((s, sf) =>
      t(s, sf, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, sf, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // §2.7 set difference
    "set_except" -> ((s, sf) =>
      t(s, sf, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, sf, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // interval-OVERLAP join (round 9, [[graft.operators.RangeJoin.overlaps]])
    // — interval × interval where join_range is point × band: synthetic
    // per-event availability windows (length 1–3 h, a pure function of
    // event_id) on view vs purchase events of the same user, paired when
    // the windows overlap. Executes as an equi-join on (user, bin) with
    // each pair accepted only in the bin holding the overlap's start —
    // exactly-once by construction, no dedup shuffle, no nested loop.
    "join_overlap" -> ((s, sf) => {
      val e = t(s, sf, "events")
      def iv(typ: String, ida: String, ukey: String, sCol: String, eCol: String) =
        e.where(col("event_type") === typ)
          .select(col("user_id").as(ukey), col("event_id").as(ida),
            unix_micros(col("ts")).as(sCol),
            (unix_micros(col("ts")) +
              (lit(3600L) + pmod(col("event_id"), lit(7200L))) * lit(1000000L)).as(eCol))
      val v = iv("view", "a_id", "user_id", "ls", "le")
      val p = iv("purchase", "b_id", "u2", "rs", "re")
      graft.operators.RangeJoin.overlaps(v, p, col("user_id") === col("u2"),
          col("ls"), col("le"), col("rs"), col("re"), binWidth = 10800000000L)
        .select(col("user_id"), col("a_id"), col("b_id"),
          (least(col("le"), col("re")) - greatest(col("ls"), col("rs"))).as("overlap_us"))
        .orderBy("a_id", "b_id")
    }),

    // MERGE-style upsert (round 9, [[graft.operators.Upsert]]): a
    // deterministic synthetic delta — every 10th customer's balance
    // updated (+1000), every 7th customer re-keyed into a fabricated
    // insert — merged into the base table, then rolled up per segment
    // with an inserted-row count so update-wins, insert-appends, and
    // untouched-survives are all hash-pinned. Plan: the target
    // anti-joins the delta's KEY SET (delta-sized → broadcast at scale;
    // the target itself never shuffles) + a narrow union.
    "upsert_merge" -> ((s, sf) => {
      val base = t(s, sf, "customer")
      val updates = base.filter(pmod(col("c_custkey"), lit(10)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
      val inserts = base.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
          concat(lit("new-"), col("c_custkey").cast("string")).as("c_name"),
          col("c_nationkey"), lit(100.0).as("c_acctbal"), col("c_mktsegment"))
      graft.operators.Upsert.merge(base, updates.unionByName(inserts), Seq("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(when(col("c_custkey") >= 10000000L, 1L).otherwise(0L)).as("n_inserted"),
          T.dsum(col("c_acctbal"), 2).as("acctbal_sum"))
        .orderBy("c_mktsegment")
    }),

    // CDC changelog apply (round 14) — the full change-data-capture
    // consume pipeline upsert_merge's key-unique contract delegates
    // upstream: an OUT-OF-ORDER changelog (I/U/D rows with sequence
    // numbers; one key can carry several competing changes) is first
    // COMPACTED to latest-per-key (one row_number window over the
    // delta-sized changelog — never the base), then applied through
    // [[graft.operators.Upsert.applyChanges]]: D deletes its key, U/I
    // upsert, untouched base rows pass through the keys-only anti-join
    // (delta-sized side broadcasts at scale; the base never shuffles).
    // The changelog is deterministic: U (+100 balance, seq 1) for
    // custkey%5, D (seq 2) for custkey%7 — so %35 keys exercise the
    // ordering, the DELETE must win — and I (new key, segment NEW,
    // seq 3) for custkey%11. Hash-matching the oracle's identical
    // compact-then-apply SQL pins all four outcomes: untouched,
    // updated, deleted (including the U-then-D race), inserted.
    "upsert_cdc" -> ((s, sf) => {
      val c = t(s, sf, "customer")
      val u = c.filter(pmod(col("c_custkey"), lit(5)) === 0)
        .select(col("c_custkey"), lit("U").as("op"), lit(1L).as("seq"),
          (col("c_acctbal") + lit(100.0)).as("bal"),
          col("c_mktsegment").as("seg"))
      val del = c.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select(col("c_custkey"), lit("D").as("op"), lit(2L).as("seq"),
          lit(null).cast("double").as("bal"),
          lit(null).cast("string").as("seg"))
      val ins = c.filter(pmod(col("c_custkey"), lit(11)) === 0)
        .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
          lit("I").as("op"), lit(3L).as("seq"), lit(0.0).as("bal"),
          lit("NEW").as("seg"))
      val w = Window.partitionBy("c_custkey").orderBy(col("seq").desc)
      val latest = u.unionByName(del).unionByName(ins)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn", "seq")
      val base = c.select(col("c_custkey"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg"))
      graft.operators.Upsert.applyChanges(base, latest, Seq("c_custkey"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_cust"), T.dsum(col("bal"), 2).as("sum_bal"))
        .orderBy("seg")
    }),

    // SCD Type-2 versioned merge (round 12, third batch) — the dimension-
    // history primitive ([[graft.operators.Upsert.scd2]], spec'd since
    // round 9, now a DECLARED row): the base customer table opens as
    // version 0, a delta (every 10th customer, +1000 balance, effective
    // t = 1s) closes each touched key's open version at t and appends the
    // new open one; untouched keys and closed history are immutable. The
    // rollup hash-pins all three outcomes — version counts, open/closed
    // splits, and the open-version balance sum (updated keys count their
    // NEW balance, exactly once). Plan: both scd2 joins carry delta-sized
    // key sides (broadcast at scale; history never shuffles) + a narrow
    // union — the upsert_merge posture with validity bookkeeping.
    // POINT-IN-TIME join against the SCD2 dimension (round 15) — the
    // canonical consumption query upsert_scd2's versioned table exists
    // for: each order joins the customer VERSION valid at its order
    // date (equi on the key + validity-interval residual — every fact
    // row matches exactly one version, so the plan is a plain hash join,
    // never an interval explosion). The dimension change is effective
    // 1995-01-01, mid-way through the order-date domain, so BOTH
    // versions are exercised: earlier orders see the original balance,
    // later orders of delta'd customers see the +1000 restatement — the
    // "metrics as they were known at the time" semantics a backfilled
    // report needs. Exact decimal balance sums; counts BIGINT.
    "join_pit_scd" -> ((s, sf) => {
      val effUs = 788918400000000L // 1995-01-01 UTC, mid order-date domain
      val c = t(s, sf, "customer")
      val base = c.withColumn("valid_from_us", lit(0L))
        .withColumn("valid_to_us", lit(null).cast("long"))
      val delta = c.filter(pmod(col("c_custkey"), lit(10)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
        .withColumn("eff_us", lit(effUs))
      val dim = graft.operators.Upsert.scd2(base, delta, Seq("c_custkey"),
        "eff_us")
      val fact = t(s, sf, "orders").select(col("o_custkey"),
        unix_micros(col("o_orderdate")).as("t"))
      fact.join(dim, fact("o_custkey") === dim("c_custkey") &&
          col("t") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("t") < col("valid_to_us")))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          T.dsum(col("c_acctbal"), 2).as("bal_at_order_sum"))
        .orderBy("c_mktsegment")
    }),

    "upsert_scd2" -> ((s, sf) => {
      val base = t(s, sf, "customer")
        .withColumn("valid_from_us", lit(0L))
        .withColumn("valid_to_us", lit(null).cast("long"))
      val delta = t(s, sf, "customer")
        .filter(pmod(col("c_custkey"), lit(10)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
        .withColumn("eff_us", lit(1000000L))
      graft.operators.Upsert.scd2(base, delta, Seq("c_custkey"), "eff_us")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("valid_to_us").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(when(col("valid_to_us").isNotNull, 1L).otherwise(0L))
            .as("n_closed"),
          T.dsum(when(col("valid_to_us").isNull, col("c_acctbal"))
            .otherwise(lit(0.0)), 2).as("open_bal_sum"))
        .orderBy("c_mktsegment")
    }),

    // §2.3 three-table selective join (round 9, the TPC-H Q3 shape):
    // filtered customer ⋈ filtered orders ⋈ filtered lineitem, exact
    // decimal revenue, top 10. The query the optimizer stack exists
    // for: all three filters push to their parquet scans, the customer
    // dimension broadcasts (no fact shuffle for that join), lineitem ⋈
    // orders hashes on the shared orderkey, and the top-10 is a
    // TakeOrderedAndProject (per-partition heap + driver merge of 10
    // rows/task — never a full sort). At 100 TB the plan is identical;
    // only the orderkey shuffle scales, and AQE sizes it.
    "join_multiway" -> ((s, sf) => {
      val cut = lit("1998-07-01").cast("timestamp")
      val c = t(s, sf, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = t(s, sf, "orders")
        .filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = t(s, sf, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          unix_micros(col("o_orderdate")).as("odate_us"),
          col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // §2.3 blocked fuzzy self-join (round 9): entity-resolution's
    // candidate-pair shape — exact blocking on stable attributes
    // (brand + the name's last token), edit-distance scoring only
    // inside a block. The blocking key is what makes fuzzy matching
    // scale: the join is a plain hash equi-join on (brand, noun) and
    // the quadratic levenshtein work is confined to each block
    // (candidate pairs ∝ Σ block², never corpus²) — the same
    // bucket-then-score discipline as minhashCandidates. Aggregated to
    // per-block candidate/close-pair counts so the declared result is
    // small and hash-pinned at any SF.
    "join_fuzzy" -> ((s, sf) => {
      val p = t(s, sf, "part").select(col("p_partkey"), col("p_brand"),
        col("p_name"), element_at(split(col("p_name"), " "), -1).as("noun"))
      val a = p.select(col("p_brand"), col("noun"),
        col("p_partkey").as("a_key"), col("p_name").as("a_name"))
      val b = p.select(col("p_brand"), col("noun"),
        col("p_partkey").as("b_key"), col("p_name").as("b_name"))
      a.join(b, Seq("p_brand", "noun"))
        .filter(col("a_key") < col("b_key"))
        .groupBy("p_brand", "noun")
        .agg(count(lit(1)).as("n_cand"),
          sum(when(levenshtein(col("a_name"), col("b_name")) <= 3, 1L)
            .otherwise(0L)).as("n_close"))
        .orderBy("p_brand", "noun")
    }),

    // §2.3 NEAREST as-of join (round 9): each purchase matched to its
    // closest signup in EITHER direction (ties → the earlier one) — the
    // sensor-alignment semantics backward/forward as-of can't express
    // alone. Composes both ordered-window-merge kernels over ONE user-hash
    // exchange (two sorts, asc + desc, no pair fan-out), then an O(1)
    // per-row pick of the nearer candidate. Inner semantics: purchases
    // with no signup on either side drop.
    "join_asof_near" -> ((s, sf) => {
      val e = t(s, sf, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          (col("event_type") === "purchase").cast("int").as("is_p"))
      val wb = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("is_p").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id")
        .orderBy(col("us").desc, col("is_p").asc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("back_us",
          last(when(col("is_p") === 0, col("us")), ignoreNulls = true).over(wb))
        .withColumn("fwd_us",
          last(when(col("is_p") === 0, col("us")), ignoreNulls = true).over(wf))
        .where(col("is_p") === 1 &&
          (col("back_us").isNotNull || col("fwd_us").isNotNull))
        .select(col("event_id").as("p_id"), col("user_id"),
          when(col("fwd_us").isNull, col("back_us"))
            .when(col("back_us").isNull, col("fwd_us"))
            .when(col("us") - col("back_us") <= col("fwd_us") - col("us"),
              col("back_us"))
            .otherwise(col("fwd_us")).as("signup_us"),
          (when(col("fwd_us").isNull, col("back_us"))
            .when(col("back_us").isNull, col("fwd_us"))
            .when(col("us") - col("back_us") <= col("fwd_us") - col("us"),
              col("back_us"))
            .otherwise(col("fwd_us")) - col("us")).as("delta_us"))
        .orderBy("p_id")
    }),

    // §2.3 agg-then-probe join (round 9, the TPC-H Q18 shape): orders
    // whose line items sum past a quantity threshold, joined back to
    // orders + customer. The distinct plan shape: a FULL fact-table
    // aggregate feeds the join as a (filtered, now small) build side —
    // the HAVING collapse happens before any wide row moves, so the
    // expensive side of the join is the one that was already
    // aggregate-shuffled on the same orderkey (no second fact shuffle;
    // AQE sizes the collapsed side into a broadcast at runtime).
    "join_agg_semi" -> ((s, sf) => {
      val big = t(s, sf, "lineitem").groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        .filter(col("qty") > 300)
      t(s, sf, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, sf, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("qty").cast("double").as("total_qty"))
        .orderBy("o_orderkey")
    }),

    // §2.7 multiset set ops (round 9): EXCEPT ALL / INTERSECT ALL — bag
    // semantics where set_except/set_intersect deduplicate. Spark plans
    // both as a count-compare aggregate (sum of +1/−1 tags), one
    // shuffle on the value — never a join per duplicate.
    "set_except_all" -> ((s, sf) =>
      t(s, sf, "customer").select(col("c_nationkey").as("nk"))
        .exceptAll(t(s, sf, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    "set_intersect_all" -> ((s, sf) =>
      t(s, sf, "customer").select(col("c_nationkey").as("nk"))
        .intersectAll(t(s, sf, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // §2.2 correlated scalar subquery (round 9) — the SQL front-end
    // surface the DataFrame rows can't show: per customer, the max of a
    // correlated aggregate over orders, written as a subquery in the
    // SELECT list and decorrelated by Catalyst into one orderless
    // custkey-agg + left join (never a per-row probe). Tables are bound
    // by direct parquet path (no temp-view session state).
    "subquery_scalar" -> ((s, sf) => s.sql(
      s"""SELECT c_custkey,
            round((SELECT max(o_totalprice) FROM parquet.`$sf/orders.parquet` o
                   WHERE o.o_custkey = c.c_custkey), 2) AS max_price
          FROM parquet.`$sf/customer.parquet` c ORDER BY c_custkey""")),

    // §4 storage co-location DECLARED (round 11): both join sides are
    // written bucketed on the join key (8 buckets, sorted), registered as
    // external tables, and joined through the catalog — Spark matches the
    // bucket specs and plans the join with NO exchange on either side
    // (BucketingSpec plan-asserts zero Exchange on this exact shape). At
    // 100 TB this is the repeated-join answer: the fact table's join
    // shuffle is paid ONCE at write time, then every query joins
    // map-side. The oracle is the plain join's aggregate — co-location is
    // a pure physical rewrite, values must not move.
    "join_bucketed" -> ((s, sf) => {
      val tag = new java.io.File(sf).getName.replace('.', '_')
      val dir = s"${sys.props("java.io.tmpdir")}/graft_bucketed_$tag"
      val (lt, pt) = (s"graft_bl_$tag", s"graft_bp_$tag")
      t(s, sf, "lineitem").select("l_partkey", "l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_partkey").sortBy("l_partkey")
        .option("path", s"$dir/l").saveAsTable(lt)
      t(s, sf, "part").select("p_partkey", "p_brand")
        .write.mode("overwrite").bucketBy(8, "p_partkey").sortBy("p_partkey")
        .option("path", s"$dir/p").saveAsTable(pt)
      s.table(lt).join(s.table(pt), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(T.dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    // §2.3 multi-EXISTS join (round 11, the TPC-H Q21 shape adapted to
    // the corpus columns): per supplier, count returned lineitems in
    // orders where ANOTHER supplier also shipped (EXISTS) but no OTHER
    // supplier's line was returned (NOT EXISTS) — the
    // sole-blame-in-a-shared-order analytic. One semi + one anti join,
    // both keyed on l_orderkey with a suppkey-inequality residual: the
    // probe side shuffles on orderkey ONCE and both existence checks
    // reuse that co-partitioning (subset-key exchange reuse); nothing is
    // ever materialized per matching pair — EXISTS short-circuits in the
    // hash join. Top-20 by count with a full tiebreak (numwait desc,
    // suppkey asc) keeps the limit deterministic cross-engine.
    "join_exists_multi" -> ((s, sf) => {
      val l = t(s, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
      val base = l.where(col("l_returnflag") === "R")
      val others = l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val othersR = base.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      base
        .join(others, col("l_orderkey") === col("ok2") &&
          col("sk2") =!= col("l_suppkey"), "left_semi")
        .join(othersR, col("l_orderkey") === col("ok3") &&
          col("sk3") =!= col("l_suppkey"), "left_anti")
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("suppkey"))
        .limit(20)
    }),

    // §2.3 five-table star join (round 9, the TPC-H Q5 shape): region →
    // nation → customer → orders → lineitem, region filter + order-date
    // range, revenue per nation. The deep-join-tree case join_multiway's
    // three tables don't exercise: THREE dimension hops broadcast in
    // sequence (region 1 row, nation 25, then the customer side), the
    // only repartitioning fact-side is the lineitem ⋈ orders orderkey
    // hash — one shuffle for a 5-table query. The region filter prunes
    // 4/5 of nations before any fact row is touched; at 100 TB with CBO
    // stats the optimizer proves that cardinality collapse itself.
    "join_star" -> ((s, sf) => {
      val r = t(s, sf, "region").filter(col("r_name") === "ASIA")
      val n = t(s, sf, "nation")
      val c = t(s, sf, "customer")
      val o = t(s, sf, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, sf, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c.join(broadcast(n.join(broadcast(r),
            col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "project_select" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
         CAST(l_quantity AS BIGINT) AS qty_int,
         CAST(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "filter_pred" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
         WHERE p_size BETWEEN 10 AND 20
           AND (p_type IN ('ECONOMY','PROMO') OR p_name LIKE 'red%')
           AND p_brand IS NOT NULL
         ORDER BY p_partkey""",
    "join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "join_full" ->
      """WITH c AS (SELECT c_nationkey nk, count(*) c_cnt FROM customer GROUP BY 1),
              s AS (SELECT s_nationkey nk, count(*) s_cnt FROM supplier GROUP BY 1)
         SELECT coalesce(c.nk, s.nk) AS nk,
                coalesce(c_cnt, 0) AS c_cnt, coalesce(s_cnt, 0) AS s_cnt
         FROM c FULL JOIN s ON c.nk = s.nk ORDER BY nk""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "join_broadcast" ->
      """SELECT p_brand, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "join_salted" ->
      """SELECT p_brand, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "join_bloom" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_nationkey = 7
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "filter_subquery" ->
      """SELECT l_returnflag, count(*) AS n_above,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_above
         FROM lineitem
         WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
         FROM region CROSS JOIN nation ORDER BY r_regionkey, n_nationkey""",
    "join_nullsafe" ->
      """WITH a AS (SELECT doc_id AS a_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS la FROM documents),
           b AS (SELECT doc_id AS b_id,
             CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lb FROM documents)
         SELECT la, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT b_id) AS BIGINT) AS n_b
         FROM a JOIN b ON la IS NOT DISTINCT FROM lb
         GROUP BY la ORDER BY la NULLS FIRST""",
    "join_range" ->
      """SELECT e1.event_id AS a_id, e2.event_id AS b_id
         FROM events e1 JOIN events e2
           ON e1.user_id = e2.user_id
          AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
         ORDER BY a_id, b_id""",
    "join_asof" ->
      """SELECT p.event_id AS p_id, p.user_id, max(epoch_us(s.ts)) AS signup_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND s.ts <= p.ts
         GROUP BY p.event_id, p.user_id ORDER BY p_id""",
    "join_asof_fwd" ->
      """SELECT p.event_id AS p_id, p.user_id, min(epoch_us(s.ts)) AS signup_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND s.ts >= p.ts
         GROUP BY p.event_id, p.user_id ORDER BY p_id""",
    "join_lateral" ->
      """SELECT n_nationkey, n_name, s_name, s_acctbal
         FROM nation,
         LATERAL (SELECT s_name, s_acctbal FROM supplier
                  WHERE s_nationkey = n_nationkey
                  ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 2)
         ORDER BY n_nationkey, s_name""",
    "sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "set_union_all" ->
      """SELECT 'C' AS side, c_custkey AS key, c_name AS name, c_nationkey AS nk FROM customer
         UNION ALL
         SELECT 'S', s_suppkey, s_name, s_nationkey FROM supplier
         ORDER BY side, key""",
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""",
    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""",
    "join_overlap" ->
      """WITH v AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS ls,
             epoch_us(ts) + (3600 + event_id % 7200) * 1000000 AS le
           FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id AS u2, event_id AS b_id, epoch_us(ts) AS rs,
             epoch_us(ts) + (3600 + event_id % 7200) * 1000000 AS re
           FROM events WHERE event_type = 'purchase')
         SELECT v.user_id, a_id, b_id,
           CAST(least(le, re) - greatest(ls, rs) AS BIGINT) AS overlap_us
         FROM v JOIN p ON v.user_id = p.u2 AND ls < re AND rs < le
         ORDER BY a_id, b_id""",
    "join_pit_scd" ->
      """WITH delta AS (SELECT c_custkey, c_acctbal + 1000.0 AS new_bal
             FROM customer WHERE c_custkey % 10 = 0),
           dim AS (
             SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal AS bal,
                 0 AS vf,
                 CASE WHEN d.c_custkey IS NOT NULL
                   THEN 788918400000000 END AS vt
               FROM customer c LEFT JOIN delta d ON d.c_custkey = c.c_custkey
             UNION ALL
             SELECT c.c_custkey, c.c_mktsegment, d.new_bal,
                 788918400000000, NULL
               FROM delta d JOIN customer c ON c.c_custkey = d.c_custkey),
           f AS (SELECT o_custkey, epoch_us(o_orderdate) AS t FROM orders)
         SELECT dim.c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(dim.bal AS DECIMAL(18,2))) AS DOUBLE)
             AS bal_at_order_sum
         FROM f JOIN dim ON dim.c_custkey = f.o_custkey
           AND f.t >= dim.vf AND (dim.vt IS NULL OR f.t < dim.vt)
         GROUP BY 1 ORDER BY dim.c_mktsegment""",
    "upsert_scd2" ->
      """WITH delta AS (SELECT c_custkey, c_acctbal + 1000.0 AS new_bal
             FROM customer WHERE c_custkey % 10 = 0),
           versions AS (
             SELECT c.c_mktsegment,
                 CASE WHEN d.c_custkey IS NOT NULL THEN 1000000 END AS vt,
                 c.c_acctbal AS bal
               FROM customer c LEFT JOIN delta d ON d.c_custkey = c.c_custkey
             UNION ALL
             SELECT c.c_mktsegment, NULL, d.new_bal
               FROM delta d JOIN customer c ON c.c_custkey = d.c_custkey)
         SELECT c_mktsegment, count(*) AS n_versions,
           CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open,
           CAST(sum(CASE WHEN vt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_closed,
           CAST(sum(CAST(CASE WHEN vt IS NULL THEN bal ELSE 0.0 END
             AS DECIMAL(18,2))) AS DOUBLE) AS open_bal_sum
         FROM versions GROUP BY 1 ORDER BY c_mktsegment""",
    "upsert_cdc" ->
      """WITH ch AS (
           SELECT c_custkey AS k, 'U' AS op, 1 AS seq,
                  c_acctbal + 100.0 AS bal, c_mktsegment AS seg
           FROM customer WHERE c_custkey % 5 = 0
           UNION ALL
           SELECT c_custkey, 'D', 2, CAST(NULL AS DOUBLE),
                  CAST(NULL AS VARCHAR)
           FROM customer WHERE c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey + 1000000, 'I', 3, 0.0, 'NEW'
           FROM customer WHERE c_custkey % 11 = 0),
         latest AS (
           SELECT k, op, bal, seg FROM (
             SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) rn
             FROM ch) WHERE rn = 1),
         applied AS (
           SELECT c.c_custkey AS k, c.c_acctbal AS bal, c.c_mktsegment AS seg
           FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = c.c_custkey)
           UNION ALL
           SELECT k, bal, seg FROM latest WHERE op <> 'D')
         SELECT seg, count(*) AS n_cust,
           CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM applied GROUP BY 1 ORDER BY seg""",
    "upsert_merge" ->
      """WITH delta AS (
           SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
                  c_mktsegment
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 10000000, 'new-' || CAST(c_custkey AS VARCHAR),
                  c_nationkey, 100.0, c_mktsegment
           FROM customer WHERE c_custkey % 7 = 0),
         merged AS (
           SELECT * FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
           UNION ALL SELECT * FROM delta)
         SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN c_custkey >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
         FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_multiway" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-07-01'
           AND l_shipdate > TIMESTAMP '1998-07-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "join_fuzzy" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_name,
             split_part(p_name, ' ', -1) AS noun FROM part)
         SELECT a.p_brand, a.noun, CAST(count(*) AS BIGINT) AS n_cand,
           CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) <= 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_close
         FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.noun = b.noun
           AND a.p_partkey < b.p_partkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "join_asof_near" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(event_type = 'purchase' AS INT) AS is_p
           FROM events WHERE event_type IN ('purchase', 'signup')),
           w2 AS (SELECT *,
               last_value(CASE WHEN is_p = 0 THEN us END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                   ORDER BY us ASC, is_p ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS back_us,
               last_value(CASE WHEN is_p = 0 THEN us END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                   ORDER BY us DESC, is_p ASC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS fwd_us
             FROM e),
           p AS (SELECT event_id AS p_id, user_id, us,
               CASE WHEN fwd_us IS NULL THEN back_us
                 WHEN back_us IS NULL THEN fwd_us
                 WHEN us - back_us <= fwd_us - us THEN back_us
                 ELSE fwd_us END AS signup_us
             FROM w2 WHERE is_p = 1
               AND (back_us IS NOT NULL OR fwd_us IS NOT NULL))
         SELECT p_id, user_id, signup_us, signup_us - us AS delta_us
         FROM p ORDER BY p_id""",
    "join_agg_semi" ->
      """WITH big AS (SELECT l_orderkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
         SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(qty AS DOUBLE) AS total_qty
         FROM big JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
         ORDER BY o_orderkey""",
    "set_except_all" ->
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY nk""",
    "set_intersect_all" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nk""",
    "subquery_scalar" ->
      """SELECT c_custkey,
           round((SELECT max(o_totalprice) FROM orders o
                  WHERE o.o_custkey = c.c_custkey), 2) AS max_price
         FROM customer c ORDER BY c_custkey""",
    "join_bucketed" ->
      """SELECT p_brand, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY p_brand""",
    "join_exists_multi" ->
      """SELECT l1.l_suppkey AS suppkey, count(*) AS numwait FROM lineitem l1
         WHERE l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY 1 ORDER BY numwait DESC, suppkey LIMIT 20""",
    "join_star" ->
      """SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
         FROM region JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""")
}
