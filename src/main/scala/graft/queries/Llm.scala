package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.T.{Q, t}

/** SURVEY.md §2.10 — LLM-data-pipeline operators: dedup (exact / n-gram
  * Jaccard / MinHash-LSH), similarity search over embeddings, text analysis,
  * sessionization.
  *
  * Literature: shingle-set resemblance and MinHash are Broder, *On the
  * resemblance and containment of documents* (SEQUENCES 1997); LSH banding
  * follows Indyk & Motwani (STOC 1998); the IVF coarse-quantizer shape in
  * `sim_ann_ivf` follows the inverted-file structure of Jégou, Douze &
  * Schmid, *Product Quantization for Nearest Neighbor Search* (TPAMI 2011).
  *
  * Scale notes: `dedup_jaccard` uses 3-gram shingles (not unigrams) so the
  * inverted-index self-join stays sparse — the corpus has only 31 distinct
  * words, so unigram joins would be quadratic in the corpus; 3-gram shingle
  * cardinality is ~27k and keeps candidate pairs bounded. `dedup_minhash` is
  * the sub-quadratic 100 TB path over the same shingles.
  */
object Llm {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Non-blocking observability for the df-cap in [[pairIntersections]]:
    * a once-per-session QueryExecutionListener that WARN-logs when the
    * observed hot-shingle count bound (see [[hotShingleDfCap]]) actually
    * excluded shingle types — replaces the r15 eager `hot.count()` driver
    * action, which cost one extra full aggregation job per invocation
    * even when the cap never binds. */
  private[graft] object HotShingleObserver {
    // per-invocation suffix: a plan may contain TWO pairIntersections
    // invocations (e.g. a future pair-of-corpora diff) and Spark fails
    // analysis on duplicate observed-metric names — unique names keep the
    // composition legal; the listener matches by prefix
    val MetricPrefix = "graft_hot_shingles"
    private val invocations = new java.util.concurrent.atomic.AtomicLong(0L)
    def nextMetricName(): String =
      s"${MetricPrefix}_${invocations.incrementAndGet()}"
    // weak keys: sessions come and go under tests; a strong set would pin
    // every retired session (and its state) for the JVM's lifetime
    private val registered = java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
    def ensure(spark: SparkSession): Unit =
      if (registered.add(spark))
        spark.listenerManager.register(
          new org.apache.spark.sql.util.QueryExecutionListener {
            override def onSuccess(funcName: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                durationNs: Long): Unit =
              // the cap travels INSIDE the observed row — the listener is
              // once-per-session and must not bake in the dfCap of
              // whichever ensure() call registered it
              qe.observedMetrics.foreach { case (name, row) =>
                if (name.startsWith(MetricPrefix)) {
                  val i = row.fieldIndex("n_hot")
                  val nHot = if (row.isNullAt(i)) 0L else row.getLong(i)
                  val j = row.fieldIndex("df_cap")
                  val dfCap = if (row.isNullAt(j)) 0L else row.getLong(j)
                  if (nHot > 0L)
                    logger.warn(s"pairIntersections: $nHot shingle types " +
                      s"exceed the df cap $dfCap and are EXCLUDED from " +
                      "the inverted index — intersection counts for " +
                      "pairs sharing them are lower bounds (candidate " +
                      s"volume bounded by cap²=${dfCap * dfCap} per type)")
                }
              }
            override def onFailure(funcName: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                exception: Exception): Unit = ()
          })
  }

  /** Per-doc distinct 3-gram shingle ARRAY: (doc_id, ss) — fully narrow
    * (pure map stage, no shuffle): each row's shingles come from its own
    * text, so signature/size computations on top of this stay narrow too.
    */
  private[graft] def shingleArrays(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 3)
      .select(col("doc_id"), array_distinct(
        expr("transform(sequence(0, size(tk)-3), i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))"))
        .as("ss"))

  /** Per-doc distinct 3-gram shingles, exploded: (doc_id, s).
    *
    * The array table is persisted before the explode: generating from a
    * COMPUTED `array_distinct(transform(...))` makes codegen re-derive the
    * array per emitted element (~20× slower, measured); over a cached
    * column the explode is a plain O(1)-per-element loop. One tiny row per
    * doc — the persist is registered on `tr`, so the operator body frees it
    * once its result is sealed (no reliance on harness clearCache).
    */
  private[graft] def shingles(docs: DataFrame, tr: graft.operators.Tracked): DataFrame =
    tr.persist(shingleArrays(docs))
      .select(col("doc_id"), explode(col("ss")).as("s"))

  /** Unordered exact n-gram (3-shingle) Jaccard near-dup pairs
    * (da, db, jac) at threshold `tau` — the shared kernel behind
    * `dedup_jaccard` (rounded + ordered for the oracle) and
    * `dedup_clusters` (edge stream; feeding the SAME pair frame to
    * [[graft.operators.Components]] means the expensive shingle self-join
    * runs exactly once — and without the oracle's global sort, whose
    * range-partition sampling job would compute the join a second time).
    *
    * The inverted-index self-join keys on xxhash64(shingle) — a long
    * hashes/partitions far cheaper than a ~20-char string. Semantics stay
    * EXACT via a runtime-verified hash compaction: one cheap aggregate
    * checks `countDistinct(shingle) == countDistinct(hash)` — when equal
    * (always, in practice: P[any collision] ≈ d²/2⁶⁵ for d distinct
    * shingles) the hash is injective ON THIS CORPUS and the join carries
    * NO string payload at all; on a detected collision it falls back to
    * string equality as a residual predicate. The same AQE-style
    * runtime-statistics move `Sim.topK(auto)` makes — and at 100 TB,
    * dropping ~20-byte strings from both sides of the dominant self-join
    * shuffle is the difference that check pays for a million times over
    * (measured at sf0.1: 2.3–3.1 s → 1.7–1.9 s for the join+count stage;
    * the check itself costs ~0.1 s). Pair counts group on (da, db) only;
    * the tiny per-doc sizes table joins onto the counted stream afterwards
    * (at 100 TB that join is ∝ pairs, not corpus).
    */
  private[graft] def jaccardPairs(docsRaw: DataFrame, tau: Double,
      tr: graft.operators.Tracked): DataFrame =
    pairIntersections(docsRaw, tr)
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .where(col("jac") >= tau)
      .select(col("da"), col("db"), col("jac"))

  /** Document-frequency cap on shingle types entering the inverted-index
    * self-join (round-15: the r14 verdict's "df-cap on hot shingles",
    * promoted from prose to code). A shingle in B documents contributes
    * B(B-1)/2 candidate pairs — one boilerplate navigation string shared
    * by a million pages is a 5·10¹¹-pair hot bucket, THE way the exact
    * kernel dies at scale. Shingles with df > cap are excluded, so
    * candidate volume is bounded by Σ min(df, cap)² and the hottest
    * bucket by cap². Intersection counts for pairs that shared a dropped
    * shingle become lower bounds — the standard stop-shingle trade
    * (boilerplate n-grams carry no dedup signal), COUNTED and WARN-logged
    * when binding, never silent (the Triangles / text_collocations
    * observability contract). Never binds at bench SFs — max df ≪ 4096 —
    * so the oracles need no cap clause (LlmSpec pins both legs). */
  private[graft] val hotShingleDfCap = 4096

  /** The shared exact intersection-count core: unordered doc pairs with
    * ≥ 1 shared 3-shingle, as (da, db, na, nb, i) — |A|, |B|, |A∩B| from
    * the hash-compacted inverted-index self-join. [[jaccardPairs]] maps it
    * to symmetric Jaccard; `dedup_containment` maps it to the ASYMMETRIC
    * containment pair (Broder 1997's r(A,B) = |A∩B|/|A|). */
  private[graft] def pairIntersections(docsRaw: DataFrame,
      tr: graft.operators.Tracked,
      dfCap: Int = hotShingleDfCap): DataFrame = {
    // persist the per-doc ARRAY table (one small row per doc), not the
    // exploded rows: referencing size(ss) and explode(ss) over a computed
    // column would make codegen re-derive the whole shingle transform per
    // exploded row (~50× the work); over a cached column both are O(1)
    val docs = tr.persist(shingleArrays(docsRaw))
    // the per-doc shingle count rides the exploded rows (8 bytes) and is
    // grouped alongside the pair, so NO post-aggregation joins against a
    // sizes table are needed — the candidate-pair stream (orders of
    // magnitude larger than the final pair set; 1.1M vs 256 at sf0.1)
    // goes straight from the count aggregate into the jac filter. Same
    // move dedup_minhash's exact scorer makes.
    val shS = docs.select(col("doc_id"), size(col("ss")).cast("long").as("n"),
        explode(col("ss")).as("s"))
      .select(col("doc_id"), col("n"), col("s"), xxhash64(col("s")).as("h"))
    // ONE corpus-pass per-hash aggregate serves BOTH runtime decisions
    // (r18 — guide §1.2 "don't compute things twice"): document frequency
    // for the df-cap AND the hash-injectivity check. The old shape paid
    // two full corpus passes — a countDistinct(s)/countDistinct(h) pair
    // (which plans as an Expand that doubles and shuffles every exploded
    // shingle STRING) plus the groupBy(h) df count. Injectivity per hash
    // is min(s) != max(s) — h is a function of s, so countDistinct
    // equality and per-hash-single-preimage are the same predicate — and
    // the probe runs over the persisted per-hash frame (|distinct
    // shingles| rows), not the corpus.
    val dfs = tr.persist(shS.groupBy("h").agg(count(lit(1)).as("df"),
        min(col("s")).as("__mn"), max(col("s")).as("__mx"))
      .observe(HotShingleObserver.nextMetricName(),
        sum(when(col("df") > dfCap, 1L).otherwise(0L)).as("n_hot"),
        max(lit(dfCap.toLong)).as("df_cap")))
    HotShingleObserver.ensure(docsRaw.sparkSession)
    val collided = !dfs.where(col("__mn") =!= col("__mx")).isEmpty
    val shAll = if (collided) shS else shS.drop("s")
    // df-cap on hot shingles (see [[hotShingleDfCap]]): (doc_id, h) is
    // unique by construction (ss is array_distinct), so count(*) per h IS
    // document frequency. The left_anti exclusion is UNCONDITIONAL — no
    // blocking driver count() runs on the hot path for the CAP itself;
    // when nothing is hot AQE's empty-relation propagation deletes the
    // anti-join at runtime, and the bound count surfaces through an
    // observed metric WARN-logged by a once-per-session listener.
    val hot = dfs.where(col("df") > dfCap).select("h")
    val sh = shAll.join(hot, Seq("h"), "left_anti")
    val joinCond =
      if (collided)
        col("a.h") === col("b.h") && col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id")
      else col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")
    sh.as("a").join(sh.as("b"), joinCond)
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
  }

  /** Banded MinHash-LSH candidate pairs (a_id, b_id) over a PERSISTED
    * per-doc shingle-array frame (doc_id, ss). k = nBands × rowsPerBand
    * salted-xxhash64 signature minima come from ONE codegen'd aggregate;
    * a band's value is xxhash64 over its r consecutive minima — AND-
    * amplification within a band, OR across bands (Broder 1997; Indyk &
    * Motwani 1998), so P[candidate] = 1 − (1 − j^r)^b. r ≥ 2 is what makes
    * this scale-honest: at r=1 a j=0.1 garbage pair collides with
    * p = 1−0.9^16 ≈ 0.81 (near-all-pairs on boilerplate-heavy corpora);
    * at b=8, r=2 that drops to 1−(1−0.01)^8 ≈ 0.08 while a true τ=0.5
    * pair keeps p ≈ 0.90 and j=0.7 keeps p ≈ 0.996. Candidates come from
    * a bucketed equi-join on (band, value) — never all pairs.
    *
    * `maxBucket` bounds per-bucket join fan-out: one degenerate band value
    * (the minhash of a boilerplate shingle shared by everything) would make
    * a single bucket's pair volume quadratic — AQE splits partitions but
    * cannot split one key's join fan-out — so buckets larger than
    * `maxBucket` are DROPPED (documented recall loss on pathological
    * buckets only; the same skew contract [[graft.streaming.IncrementalDedup]]
    * enforces on stream state via its own maxBucket). The capped band frame
    * is persisted through `tr` (nDocs × nBands tiny rows), so both sides of
    * the self-join read the cache instead of recomputing the signature
    * aggregate and the bucket-size window.
    */
  private[graft] def minhashCandidates(docs: DataFrame, nBands: Int,
      rowsPerBand: Int, maxBucket: Int, tr: graft.operators.Tracked): DataFrame = {
    // band math lives in the operator (round 8): the same band table backs
    // the incremental batch-vs-index path, and sharing the code is what
    // makes the incremental candidate set provably the full rebuild's
    val bands0 = graft.operators.DedupIndex.bandTable(docs, nBands, rowsPerBand)
    // bucket-size cap: one window count partitioned on the SAME (band, bv)
    // key the candidate join shuffles on — the exchange is shared work, and
    // the filter runs before any pair is generated
    val bands = tr.persist(bands0
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bv")))
      .where(col("bsz") <= maxBucket).drop("bsz"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Jaccard pair stream wired for [[graft.operators.Components]]: a
    * TRACKED persist (not a seal!) so Components' dispatch count — the
    * one action that materializes the symmetric edge cache — fills this
    * cache too, and the `inputs.free()` right after it reclaims it
    * before any propagation (or, on the driver union–find path, before
    * the collect's result is even used). The one place this
    * ownership-sensitive wiring lives — the declared queries, the
    * pipeline demo, and the specs all call it.
    */
  /** Auto-dispatching Jaccard pair search — the `Sim.topK(auto)` treatment
    * for the shingle kernel: exact inverted-index pairs while the corpus
    * is small, banded MinHash-LSH candidates + the SAME exact-Jaccard
    * scorer once `count ≥ lshThreshold`. One column-pruned count() decides
    * the dispatch; both paths emit the identical `(da, db, jac)` schema
    * with exactly-computed Jaccard, so the swap only changes recall on
    * across-bucket pairs (1 − (1 − τ²)⁸ ≈ 0.90 at τ = 0.5 with the b=8,
    * r=2 bands) — the documented LSH contract. What the swap buys at
    * scale: the exact path's candidate volume is bounded by shingle-
    * bucket sizes (a boilerplate shingle shared corpus-wide goes
    * quadratic); the banded path's is bounded by `maxBucket` per (band,
    * value) bucket, which no single hot shingle can blow up.
    */
  private[graft] def jaccardPairsAuto(docsRaw: DataFrame, tau: Double,
      tr: graft.operators.Tracked, lshThreshold: Long = 1000000): DataFrame = {
    // memoized dispatch count (see Sim.countOnce): dedup_jaccard /
    // dedup_clusters / dedup_survivors / contamination bind this kernel
    // to the same documents scan — one count job serves them all
    if (graft.ml.Sim.countOnce(docsRaw) < lshThreshold) jaccardPairs(docsRaw, tau, tr)
    else {
      val docs = tr.persist(shingleArrays(docsRaw))
      val cand = minhashCandidates(docs, nBands = 8, rowsPerBand = 2,
        maxBucket = 65536, tr = tr)
      // exact |A∩B| re-rank over 64-bit-hashed shingles — dedup_minhash's
      // scorer verbatim: work ∝ candidates × shingles/doc, never corpus²
      val shh = docs.select(col("doc_id"), size(col("ss")).cast("long").as("n"),
          explode(col("ss")).as("s"))
        .select(col("doc_id"), col("n"), xxhash64(col("s")).as("h"))
      cand
        .join(shh.select(col("doc_id").as("a_id"), col("n").as("na"), col("h")), "a_id")
        .join(shh.select(col("doc_id").as("b_id"), col("n").as("nb"), col("h")), Seq("b_id", "h"))
        .groupBy(col("a_id").as("da"), col("b_id").as("db"),
          col("na"), col("nb"))
        .agg(count(lit(1)).as("i"))
        .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .where(col("jac") >= tau)
        .select(col("da"), col("db"), col("jac"))
    }
  }

  private[graft] def clusterEdges(docsRaw: DataFrame, tau: Double,
      tr: graft.operators.Tracked): DataFrame =
    tr.persist(jaccardPairsAuto(docsRaw, tau, tr).select("da", "db"))

  // Similarity kernels (cosine pairs, bounded top-k, IVF) live in the
  // library surface [[graft.ml.Sim]]; the declared queries below are thin
  // bindings of those operators to the corpus tables. Dot/norm use the
  // codegen'd `graft_dot` expression ([[graft.functions.DotProduct]],
  // registered by [[graft.GraftExtensions]]).

  val queries: Map[String, Q] = Map(
    // exact dedup: content hash → survivor (min doc_id) + multiplicity
    "dedup_exact" -> ((s, sf) =>
      t(s, sf, "documents")
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("cnt"))
        .orderBy("h")),

    // URL-canonicalization dedup (round 8) — the provenance-level dedup a
    // web corpus runs BEFORE any content pass: the same page crawled as
    // http:// vs https://, mixed-case host, tracking params (utm_*), or a
    // fragment is one document. Synthetic URLs are fabricated per doc with
    // all four noise axes (the text_redact fabricate-then-operate
    // pattern), canonicalized by rebuild — forced https, lowercased host,
    // path kept verbatim, content param p kept, tracking/fragment dropped
    // — then collapsed to the min-doc_id survivor per canonical URL.
    // Pure map stage + one count-only hash agg: at 100 TB this is the
    // cheapest dedup tier (no text ever shuffles, just short URLs), which
    // is WHY crawl pipelines run it first. Regexes stay in the common
    // Java-regex ∩ RE2 dialect so the oracle is semantics-identical.
    "dedup_url" -> ((s, sf) =>
      t(s, sf, "documents")
        .withColumn("url", concat(
          when(pmod(col("doc_id"), lit(2)) === 0, lit("http://"))
            .otherwise(lit("https://")),
          when(pmod(col("doc_id"), lit(3)) === 0, upper(col("source")))
            .otherwise(col("source")),
          lit(".Example.COM/"), col("lang"), lit("/doc-"),
          pmod(col("doc_id"), lit(50)),
          lit("?p="), pmod(col("doc_id"), lit(5)),
          when(pmod(col("doc_id"), lit(4)) === 0, lit("&utm_source=feed"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, lit("#frag"))
            .otherwise(lit(""))))
        .withColumn("canon", concat(lit("https://"),
          lower(regexp_extract(col("url"), "^https?://([^/]+)/", 1)),
          regexp_extract(col("url"), "^https?://[^/]+(/[^?#]*)", 1),
          lit("?p="), regexp_extract(col("url"), "[?&]p=([0-9]+)", 1)))
        .groupBy("canon")
        .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_dups"))
        // NULLS FIRST pinned on both sides: a NULL canon group (possible if
        // lang/source ever arrive NULL) must sort identically cross-engine —
        // Spark defaults NULLS FIRST, DuckDB NULLS LAST.
        .orderBy(asc_nulls_first("canon"))),

    // exact n-gram (3-shingle) Jaccard near-dup pairs, tau = 0.5 (kernel:
    // [[jaccardPairsAuto]] — exact inverted-index at this corpus size,
    // size-gated swap to banded-LSH candidates + exact re-rank at scale).
    // Sealed BEFORE the oracle's global sort so the range-partition
    // sampling job reads the cache instead of re-running the self-join.
    "dedup_jaccard" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      tr.seal(jaccardPairsAuto(t(s, sf, "documents"), 0.5, tr)
          .select(col("da"), col("db"), round(col("jac"), 6).as("jac")))
        .orderBy("da", "db")
    }),

    // asymmetric n-gram CONTAINMENT pairs (round 14) — Broder 1997's
    // r(A,B) = |A∩B|/|A|, the quote / partial-copy / superset detector
    // Jaccard structurally cannot be: a short doc fully embedded in a long
    // one has jac ≈ |A|/|B| (arbitrarily small) but containment 1.0 —
    // exactly the "document A is quoted inside B" case a training-data
    // pipeline must catch to kill leaked snippets without deduping the
    // host doc. Rides the SAME hash-compacted inverted-index core as
    // dedup_jaccard ([[pairIntersections]] — the self-join runs once and
    // both directed rows come off one inline(), no second pass); output
    // is DIRECTED (src contained-in dst) at τ = 0.8. Scale posture:
    // candidate volume ∝ Σ shingle-bucket², never corpus² (measured
    // sub-linear at the composed 10×/100× corpora, 0 spill). Honest
    // limit: minhash-LSH banding is NOT a valid candidate generator for
    // containment — it targets symmetric Jaccard and misses exactly the
    // high-containment/low-jaccard short-in-long pairs this operator
    // exists for — so at true scale the knob is a df-cap on hot
    // shingles (the text_boilerplate move) or the dedup_spans suffix
    // machinery, never banding.
    "dedup_containment" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      tr.seal(pairIntersections(t(s, sf, "documents"), tr)
          .select(expr("""inline(array(
            struct(da AS src, db AS dst, cast(i AS double)/na AS c),
            struct(db AS src, da AS dst, cast(i AS double)/nb AS c)))"""))
          .where(col("c") >= 0.8)
          .select(col("src"), col("dst"), round(col("c"), 6).as("containment")))
        .orderBy("src", "dst")
    }),

    // MinHash-LSH near-dup pairs (capability row: hash-seed dependent, no
    // cross-engine oracle; tests assert candidates ⊇ dedup_jaccard pairs).
    // Round 7: banding is b=8 bands × r=2 rows ([[minhashCandidates]],
    // 1−(1−j²)⁸ curve — r≥2 AND-amplification keeps j=0.1 garbage at
    // p ≈ 0.08 instead of r=1's 0.81) with a 4096-doc bucket cap, the same
    // skew bound as IncrementalDedup. Candidates are then scored with EXACT
    // Jaccard (not the k-sample estimate, which at k=16 would drop ~40% of
    // true borderline pairs), so the ≥ τ filter preserves the candidates ⊇
    // exact-pairs invariant on this corpus (QueriesSpec pins it).
    "dedup_minhash" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val docs = tr.persist(shingleArrays(t(s, sf, "documents")))
      val cand = minhashCandidates(docs, nBands = 8, rowsPerBand = 2,
        maxBucket = 4096, tr = tr)
      val sh = docs.select(col("doc_id"), size(col("ss")).cast("long").as("n"),
        explode(col("ss")).as("s"))
      // exact |A∩B| per candidate pair via two codegen'd hash joins over
      // 64-bit-hashed shingles (longs shuffle/probe far cheaper than
      // strings; a cross-shingle hash collision could only inflate jac —
      // superset-safe for a candidate generator). Work stays ∝ candidate
      // pairs × shingles-per-doc, never corpus².
      // candidate set is hinted only by its true runtime size: no explicit
      // broadcast() — it is corpus-proportional, and AQE's runtime stats
      // pick broadcast when it fits and shuffle joins when it doesn't
      val shh = sh.select(col("doc_id"), col("n"), xxhash64(col("s")).as("h"))
      tr.seal(cand
          .join(shh.select(col("doc_id").as("a_id"), col("n").as("na"), col("h")), "a_id")
          .join(shh.select(col("doc_id").as("b_id"), col("n").as("nb"), col("h")), Seq("b_id", "h"))
          .groupBy(col("a_id"), col("b_id"), col("na"), col("nb"))
          .agg(count(lit(1)).as("i"))
          .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .where(col("jac") >= 0.5)
          .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jac")))
        .orderBy("a_id", "b_id")
    }),

    // the streaming IncrementalDedup module run in BATCH mode (the same
    // code path — flatMapGroupsWithState executes per-group transiently):
    // banded minhash candidates from per-bucket state, distinct'd and
    // ordered. Rows-only declared (band values are hash-seed dependent);
    // StreamingSpec pins the cross-batch incremental behaviour and the
    // candidates ⊇ exact-pairs invariant.
    "dedup_incremental" -> ((s, sf) => {
      import s.implicits._
      graft.streaming.IncrementalDedup.candidates(
          graft.streaming.IncrementalDedup.bandRows(t(s, sf, "documents"))
            .as[graft.streaming.BandedDoc])
        .toDF()
        .distinct()
        .orderBy("a_id", "b_id")
    }),

    // transitive near-dup CLUSTERS over the exact jaccard pairs: min-label
    // connected components ([[graft.operators.Components]]), so chains
    // (a,b),(b,c) collapse to one cluster with one survivor — the step a
    // real dedup pipeline needs on top of pairwise output. Oracled against
    // a recursive-CTE reachability closure. The pair stream comes from the
    // shared [[jaccardPairs]] kernel — sealed once, UNSORTED (r3 reused the
    // declared query, whose global sort re-ran the whole self-join inside
    // the range-partition sampling job: half the 10.9 s wall time).
    "dedup_clusters" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val pairs = clusterEdges(t(s, sf, "documents"), 0.5, tr)
      graft.operators.Components.connected(pairs, "da", "db", tr)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    }),

    // survivor materialization over the jaccard clusters — the dedup
    // END PRODUCT a pipeline actually writes: unclustered docs + one
    // representative (the hash-min member) per near-dup cluster, original
    // schema. Declares [[graft.operators.Dedup.survivors]]; oracled as an
    // anti-join against the recursive-closure losers.
    "dedup_survivors" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val docs = t(s, sf, "documents")
      val pairs = clusterEdges(docs, 0.5, tr)
      val clusters = graft.operators.Components.connected(pairs, "da", "db", tr)
      graft.operators.Dedup.survivors(docs, clusters)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // cosine similarity pairs over 64-dim embeddings, tau = 0.4 — exact
    // all-pairs at this corpus size via [[graft.ml.Sim.cosinePairsAuto]],
    // which swaps in hyperplane-LSH candidates + exact re-rank above its
    // size gate (the topK(auto) treatment for the pair stream)
    "sim_cosine_pairs" -> ((s, sf) =>
      graft.ml.Sim.cosinePairsAuto(t(s, sf, "embeddings"), 0.4)
        .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
        .orderBy("a_id", "b_id")),

    // embedding-cosine near-dup collapse: every vector similar (τ=0.4) to a
    // smaller-id vector is a duplicate; survivor = smallest such id. Same
    // pair stream as sim_cosine_pairs, so the oracle cut is engine-stable.
    "dedup_embed" -> ((s, sf) =>
      graft.ml.Sim.cosinePairsAuto(t(s, sf, "embeddings"), 0.4)
        .groupBy(col("b_id").as("dup_id"))
        .agg(min(col("a_id")).as("keep_id"), count(lit(1)).as("n_better"))
        .orderBy("dup_id")),

    // quality-aware SURVIVOR SELECTION per near-dup cluster (round 15) —
    // the policy step after clustering that every dedup pipeline actually
    // ships: "min doc_id" (dedup_survivors) is reproducible but
    // quality-blind; the production rule keeps the LONGEST member (most
    // content — the standard near-dup keep heuristic), doc_id ascending
    // as the deterministic tiebreak. One pair pass (the shared
    // jaccardPairs kernel at τ = 0.5), the Components min-label collapse,
    // then a per-cluster max_by over a (len, -doc_id) struct — exact
    // integer ordering, no floats anywhere. Output per cluster: size,
    // the kept doc, its length — the audit table a curation review reads.
    "dedup_best_of_cluster" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val docs = t(s, sf, "documents")
      val pairs = tr.persist(
        jaccardPairs(docs, 0.5, tr).select(col("da"), col("db")))
      val clusters = graft.operators.Components
        .connected(pairs, "da", "db", tr)
      val scored = docs.select(col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("len"))
      tr.seal(clusters
          .join(scored, clusters("id") === scored("doc_id"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            expr("max_by(doc_id, struct(len, -doc_id))").as("survivor"),
            max(col("len")).as("best_len")))
        .orderBy("cluster")
    }),

    // EMBEDDING-level train/eval contamination (round 15) —
    // contamination_check's semantic sibling: n-gram overlap misses
    // paraphrases, but a near-identical embedding does not. Eval docs =
    // the vec_id % 10 == 0 slice (the split_hash-style deterministic
    // holdout); for each, every train vector within the τ=0.4 cosine cut
    // plus the max similarity — the "your eval set leaks" report. Rides
    // the SAME auto-dispatched pair kernel as sim_cosine_pairs (exact
    // below the 500k gate, hyperplane-LSH + exact re-rank above), whose
    // >= τ cut is proven engine-stable by that query's own hash check;
    // max-then-round keeps the 6dp boundary discipline. At 100 TB the
    // candidate stream is the LSH-bucketed volume, never eval × train.
    "contamination_embed" -> ((s, sf) =>
      graft.ml.Sim.cosinePairsAuto(t(s, sf, "embeddings"), 0.4)
        .select(expr("""inline(array(
          struct(a_id AS x, b_id AS y, sim AS sim),
          struct(b_id AS x, a_id AS y, sim AS sim)))"""))
        .where(pmod(col("x"), lit(10)) === 0 &&
          pmod(col("y"), lit(10)) =!= 0)
        .groupBy(col("x").as("eval_id"))
        .agg(count(lit(1)).as("n_train_hits"),
          round(max(col("sim")), 6).as("max_sim"))
        .orderBy("eval_id")),

    // deterministic global TRAINING SHUFFLE + sharding (round 15) — the
    // step between curation and the trainer: every epoch-0 data order is
    // a portable seeded hash order (md5(doc_id || seed) — the
    // Split.portableBucket discipline, reproducible across engines,
    // languages, and reruns; never a nondeterministic repartition), and
    // docs land in 8 shards by hash prefix. The declared frame is the
    // per-shard manifest a trainer validates before reading: doc count,
    // token budget, an id checksum, and the first/last doc in SHUFFLE
    // ORDER (min_by/max_by on the hash — pinning the order itself, not
    // just membership). One narrow map + one 8-group agg at any scale.
    "shard_shuffle" -> ((s, sf) =>
      t(s, sf, "documents")
        .select(col("doc_id"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("toks"),
          md5(concat(col("doc_id").cast("string"), lit(":epoch0"))
            .cast("binary")).as("h"))
        .withColumn("shard", expr(
          "CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) % 8 AS BIGINT)"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          sum(col("doc_id")).as("id_checksum"),
          expr("min_by(doc_id, h)").as("first_doc"),
          expr("max_by(doc_id, h)").as("last_doc"))
        .orderBy("shard")),

    // transitive near-dup CLUSTERS over the embedding-cosine pair stream:
    // the same Components kernel as dedup_clusters consuming a DIFFERENT
    // pair source — chains of τ=0.4 cosine pairs collapse to one cluster.
    // Oracled against the same recursive-CTE closure over the cosine CTE;
    // the pair SET is engine-stable (the unrounded >= τ cut already
    // hash-matches in sim_cosine_pairs), so the closure is too.
    "dedup_embed_clusters" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val pairs = tr.persist(
        graft.ml.Sim.cosinePairsAuto(t(s, sf, "embeddings"), 0.4)
          .select("a_id", "b_id"))
      graft.operators.Components.connected(pairs, "a_id", "b_id", tr)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // sub-quadratic embedding near-dup collapse (round 7, rows-only: LSH
    // bucketing is hyperplane-seed dependent, so no cross-engine oracle;
    // SimSpec pins candidates ⊇ exact τ=0.4 pairs and fixed-seed
    // determinism). The [[graft.ml.Sim.cosineLshPairs]] candidate stream —
    // banded random-hyperplane buckets, exact graft_dot re-rank, round-7
    // bucket cap — collapsed to survivors exactly like dedup_embed: every
    // vector similar to a smaller-id vector is a duplicate. This is the
    // 100 TB path of that query: candidates from buckets, never all pairs.
    "dedup_embed_lsh" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      tr.seal(graft.ml.Sim.cosineLshPairsAuto(t(s, sf, "embeddings"), 0.4, tr = tr)
          .groupBy(col("b_id").as("dup_id"))
          .agg(min(col("a_id")).as("keep_id"), count(lit(1)).as("n_better")))
        .orderBy("dup_id")
    }),

    // brute-force top-5 nearest neighbours per vector (capability row:
    // float-rank ties across engines → validated in tests, not oracled).
    // The bounded TopKAgg partial-aggregates INSIDE the broadcast-join map
    // tasks, so the n² candidate stream is pipelined and only n×5 hits are
    // ever shuffled.
    "sim_topk" -> ((s, sf) => graft.ml.Sim.bruteTopK(t(s, sf, "embeddings"), 5)),

    // k-means clustering (round 12, third batch; rows-only) — the
    // unsupervised-segmentation operator every feature store ships,
    // exposed from the IVF coarse quantizer ([[graft.ml.Sim
    // .kmeansAssign]]): driver Lloyd over the one bounded sample collect,
    // then corpus assignment as a single codegen'd map stage over the
    // broadcast centroid literal — no join, no shuffle before the
    // per-cluster rollup. Per-cluster within-cluster squared error rides
    // per-term DECIMAL(38,15) quantization so the reported WSS is
    // order-independent under any partitioning. Not SQL-expressible
    // (iterative fit) → no oracle; KmeansSpec recomputes every
    // assignment and the WSS from the deterministic centroids.
    "ml_kmeans" -> ((s, sf) =>
      graft.ml.Sim.kmeansAssign(t(s, sf, "embeddings"), k = 8)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("d2")
            .cast(org.apache.spark.sql.types.DecimalType(38, 15)))
            .cast("double"), 6).as("wss"))
        .orderBy("cluster")),

    // IVF approximate nearest neighbours (capability row: the 100 TB scale
    // path for sim_topk). A KMeans coarse quantizer partitions vectors into
    // cells; each query probes its nprobe=4 nearest cells (the r12 shipped
    // operating point — recall 0.569 on the isotropic bench corpus vs
    // 0.368 at nprobe=2; curve table in ivfTopK's scaladoc, floor asserted
    // by RecallSpec) and re-ranks exactly with graft_dot. Candidate volume
    // drops from O(n²) to O(n²·nprobe/k) — at scale the cell assignment
    // also becomes the shuffle/bucketing key so each cell joins co-located.
    // r14: auto √n cell sizing (nCells = -1) — a FIXED cell count does
    // not survive scale (candidates ∝ n²·nprobe/nCells); the composed-
    // corpus sweep (PLANS.md r14) measured recall 1.0 at 10×/100× under
    // √n cells with nprobe = 4
    "sim_ann_ivf" -> ((s, sf) =>
      graft.ml.Sim.ivfTopK(t(s, sf, "embeddings"), 5, nCells = -1, nprobe = 4)),

    // IVF-PQ approximate nearest neighbours (round 11, capability row: the
    // memory tier above sim_ann_ivf — KMeans-dependent, rows-only; SimSpec
    // pins recall/exactness/rank laws). The cell-bucketed candidate join
    // carries m=8 small-int CODES instead of 64-dim vectors (8 bytes/row
    // through the dominant shuffle instead of 512), ADC ranks candidates,
    // and only the k×refine shortlist fetches true vectors for the exact
    // re-rank — emitted sims are TRUE cosines. At 100 TB this is what
    // keeps the ANN join's shuffle volume independent of embedding width.
    "sim_ann_ivfpq" -> ((s, sf) =>
      graft.ml.Sim.ivfpqTopK(t(s, sf, "embeddings"), 5, nCells = -1,
        nprobe = 4, m = 8)),

    // k-NN majority-vote classification over the embedding table
    // (capability row: float-rank ties in the neighbour search make the
    // votes engine-dependent → rows-only check; KnnSpec pins determinism
    // and vote semantics). The SURVEY §2.10 composition delivered as a
    // declared query: Sim.topK + topk_per_group-style vote + argmax.
    // auto = true (round 11): the declared path rides the size-gated
    // dispatch — brute force below the 500k gate (what the test corpus
    // sees), IVF coarse quantization above it — so the declared plan is
    // never O(n²) at scale; CaimSpec pins brute ≡ auto on both sides of
    // the gate (degenerate-IVF identity).
    "knn_classify" -> ((s, sf) =>
      graft.ml.Knn.classify(t(s, sf, "embeddings"), k = 5, auto = true)),

    // canonical generator demo: tokenize + explode + count
    "text_wordcount" -> ((s, sf) =>
      t(s, sf, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy("w")),

    // global bigram counts
    "text_ngrams" -> ((s, sf) =>
      t(s, sf, "documents")
        .select(split(col("text"), " ").as("tk"))
        .where(size(col("tk")) >= 2)
        .select(explode(
          expr("transform(sequence(0, size(tk)-2), i -> concat(tk[i], ' ', tk[i+1]))")).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("cnt"))
        .orderBy("bg")),

    // per-language document analytics
    "text_stats" -> ((s, sf) =>
      t(s, sf, "documents").groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars")).as("sum_chars"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(avg(size(split(col("text"), " ")).cast("long")), 6).as("avg_toks"),
          countDistinct(col("source")).as("srcs"))
        .orderBy("lang")),

    // deterministic train/test hash split as a DECLARED query (round 7):
    // side = pure function of the key's md5 hex prefix
    // ([[graft.operators.Split.portableKeep]] — engine-portable, so the
    // oracle reproduces the EXACT membership, not just the fraction), then
    // per-side stats prove balance and disjoint-complete coverage. Narrow
    // until the final toy-sized aggregate: at 100 TB the split itself is a
    // pure map-stage predicate — no shuffle, no driver state, stable under
    // repartitioning and corpus growth (SplitSpec pins those properties).
    "split_hash" -> ((s, sf) =>
      t(s, sf, "orders")
        .withColumn("side",
          when(graft.operators.Split.portableKeep(col("o_orderkey"), 0.25), "test")
            .otherwise("train"))
        .groupBy("side")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          graft.T.dsum(col("o_totalprice"), 2).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("side")),

    // deterministic stratified downsample as a DECLARED query (round 7):
    // per-language keep-fractions (en 1/2, es 1/4, other listed-language
    // docs 1/8) decided by the key's md5 bucket — the
    // [[graft.operators.Split.sampleByHash]] semantics with the portable
    // hash, so membership is oracle-verifiable cross-engine. Unlisted /
    // null strata drop (the sampler's honest default). Pure map-stage
    // filter at any scale; per-stratum counts + exact sums expose the
    // realized rates.
    // deterministic FIXED-SIZE per-stratum sample (round 8) — the
    // eval-set prep step sample_stratified's fractional rates cannot
    // express ("exactly 10 docs per language"): rank docs inside each
    // stratum by the md5 of their key (both engines compute identical
    // md5 hex, so the order is portable), keep rank <= 10, doc_id as the
    // total tie-break. The declared shape is the per-stratum window
    // sort; its 100 TB sibling is topk_per_group's bounded TopKAgg
    // (partial top-k inside map tasks — only n_strata × k rows shuffle),
    // same contract as the dedup exact/scale sibling pairs.
    "sample_fixed" -> ((s, sf) => {
      import org.apache.spark.sql.expressions.Window
      t(s, sf, "documents")
        .withColumn("hk", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))).cast("long"))
        .where(col("rk") <= 10)
        .select(col("lang"), col("rk"), col("doc_id"), col("hk"))
        .orderBy("lang", "rk")
    }),

    // weighted deterministic sampling (round 9,
    // [[graft.operators.Split.keepWeighted]]): importance sampling where
    // membership is a pure function of (key, weight) — lineitem rows kept
    // proportionally to their quantity (w/50), so heavy rows survive the
    // downsample and the kept set is reproducible and subset-monotone in
    // the weight. Narrow map + filter, one tiny groupBy; the md5-portable
    // hash makes the exact kept multiset hash-checkable in DuckDB.
    "sample_weighted" -> ((s, sf) =>
      t(s, sf, "lineitem")
        .withColumn("k", concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")))
        .withColumn("kept", graft.operators.Split.keepWeighted(
          col("k"), col("l_quantity"), 50.0))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          round(sum(when(col("kept"), col("l_quantity").cast("decimal(18,2)")))
            .cast("double"), 2).as("qty_kept"))
        .orderBy("l_returnflag")),

    "sample_stratified" -> ((s, sf) => {
      val keep =
        when(col("lang") === "en", graft.operators.Split.portableKeep(col("doc_id"), 0.5))
          .when(col("lang") === "es", graft.operators.Split.portableKeep(col("doc_id"), 0.25))
          .when(col("lang").isin("de", "fr", "zh"),
            graft.operators.Split.portableKeep(col("doc_id"), 0.125))
          .otherwise(lit(false))
      t(s, sf, "documents")
        .where(keep)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),

    // class-balanced downsample (round 10) — the training-mix equalizer:
    // every language capped at the SMALLEST class's count, members chosen
    // by md5 hash rank (portable, re-run-stable, corpus-growth-stable for
    // surviving ranks) rather than an RNG. The cap comes from one 5-row
    // aggregate head() — the bounded runtime-statistics move Sim.topK(auto)
    // makes, never a data collect. One lang-hash exchange + per-lang sort;
    // at 100 TB an EXACT per-class cap inherently ranks within each class —
    // the cheaper approximate path is the fractional hash-keep sibling
    // (sample_stratified), which needs no sort at all.
    "sample_balanced" -> ((s, sf) => {
      val docs = t(s, sf, "documents").filter(col("lang").isNotNull)
      val cap = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n"))).head().getLong(0)
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      docs.select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= cap)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // incremental batch-vs-index dedup as a DECLARED query (round 8,
    // binding [[graft.operators.DedupIndex]]): the md5-portable 20% of
    // docs play the "new batch", the complement's band table plays the
    // persisted historical index, and the output is each batch doc's
    // candidate near-dups — against history AND within the batch —
    // found without touching corpus text (bare-long band joins).
    // Rows-only by design (xxhash64 banding has no oracle engine);
    // DedupIndexSpec pins incremental ≡ full-rebuild-restricted-to-batch.
    "dedup_index_inc" -> ((s, sf) => {
      val tr = new graft.operators.Tracked
      val docs = t(s, sf, "documents").select(col("doc_id"), col("text"))
      val isBatch = graft.operators.Split.portableKeep(col("doc_id"), 0.2)
      // two band tables over disjoint doc subsets PARTITION the minhash
      // aggregation work (each doc's signature computes once, in whichever
      // side owns it) — measured faster than one full-corpus band table
      // behind an extra persist (3.8 vs 4.5 s cold, 1.5 vs 2.2 s warm at
      // sf0.1). In the real deployment the index side is a parquet read,
      // not a recompute — DedupIndexSpec pins that round trip.
      val sh = tr.persist(shingleArrays(docs))
      val cand = graft.operators.DedupIndex.candidates(
        graft.operators.DedupIndex.bandTable(sh.where(isBatch)),
        graft.operators.DedupIndex.bandTable(sh.where(!isBatch)),
        maxBucket = 4096, tr = tr)
      tr.seal(cand).orderBy("a_id", "b_id")
    }),

    // sequence packing as a DECLARED query (round 8, binding the round-7
    // [[graft.operators.Pack]] operator): whitespace token counts per doc
    // feed per-partition first-fit-decreasing into 512-token bins. The
    // assignment is a pure function of (doc ids, lengths, partitions) —
    // partitions pinned to 8 so the output is machine-independent
    // (PackSpec pins determinism + invariance to INPUT partitioning).
    // Rows-only by design: FFD bin ids are a greedy artifact with no
    // SQL-expressible oracle; the spec pins the invariants (capacity
    // respected, each doc exactly once, oversize isolation, fill > 0.7).
    // At 100 TB: one exchange + in-partition sort, no driver state.
    "pack_bins" -> ((s, sf) =>
      graft.operators.Pack.firstFit(
          t(s, sf, "documents")
            .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks")),
          "doc_id", "n_toks", capacity = 512L, partitions = 8)
        .toDF().orderBy("doc_id")),

    // train/eval n-gram decontamination as a DECLARED query (round 8,
    // binding the round-7 [[graft.operators.Contamination]] operator):
    // the held-out eval split is the md5-portable 20% of doc_ids (same
    // deterministic membership primitive split_hash oracles), train is
    // the complement; each eval doc reports its 5-gram windows, windows
    // also present anywhere in train, distinct train docs sharing one,
    // and the contaminated flag. Rows-only by design: the window
    // inverted index joins on xxhash64, which no oracle engine
    // reproduces; ContaminationSpec pins the semantics and the
    // hashed-join plan shape. At 100 TB the join ships bare longs and
    // is never all-pairs.
    "contamination_check" -> ((s, sf) => {
      val docs = t(s, sf, "documents").select(col("doc_id"), col("text"))
      val isEval = graft.operators.Split.portableKeep(col("doc_id"), 0.2)
      graft.operators.Contamination.ngramHits(
          docs.where(!isEval), docs.where(isEval), n = 5)
        .orderBy("doc_id")
    }),

    // AUDIT-grade n-gram decontamination (round 17) — contamination_check
    // with the hash dropped: the same eval-split / 5-gram-window /
    // inverted-index join, but keyed on the window STRING, so every
    // count is exact by construction and the whole report hash-checks
    // against a DuckDB recomputation (converting the decontamination
    // tier's one rows-only capability into an oracle-verified law). This
    // is the compliance variant a release audit runs on the flagged
    // subset; contamination_check (8-byte hashed keys, collision odds
    // 2⁻⁶⁴-per-pair toward over-flagging only) is the 100 TB sweep.
    // Output: only CONTAMINATED eval docs (inner join — the audit report
    // is the hits, not the clean bill).
    "contamination_ngram" -> ((s, sf) => {
      val docs = t(s, sf, "documents").select(col("doc_id"), col("text"))
      val isEval = graft.operators.Split.portableKeep(col("doc_id"), 0.2)
      val trainW = graft.functions.TextWindows
        .wordWindows(docs.where(!isEval), 5)
        .select(col("w"), col("doc_id").as("train_doc"))
      val evalW = graft.functions.TextWindows
        .wordWindows(docs.where(isEval), 5)
      evalW.join(trainW, "w")
        .groupBy("doc_id")
        .agg(countDistinct(col("w")).as("hits"),
          countDistinct(col("train_doc")).as("train_docs"))
        .orderBy("doc_id")
    }),

    // data-mixture upsampling as a DECLARED query (round 8) — the
    // "wiki×2.5, web×0.5" source-weighting step a training pipeline runs
    // last: per-stratum mixture weights realized as floor(w) full copies
    // plus one fractional copy decided by the key's md5-portable bucket
    // (so 2.5 means every en doc twice and a deterministic half of them a
    // third time — membership reproducible cross-engine AND monotone in
    // w, like the downsampler). Weights: en 2.5, es 1.25, de/fr/zh 0.5,
    // anything else 0. Pure map stage + constant-factor explode at any
    // scale; copy_idx makes replication itself hash-verifiable.
    // token-budget curriculum selection (round 14) — the data-curation
    // primitive sample_mixture's PROPORTIONS can't express: each source
    // gets a fixed TOKEN budget (the unit training actually bills by),
    // filled best-first — docs ranked by the declared priority
    // (n_chars DESC, doc_id) and kept while the per-source cumulative
    // token count stays inside 10,000 — the "take the best N tokens per
    // domain" loop of every curriculum/budget mix (Gopher/Llama-style
    // token-count mixes). One window cumsum per source (the exchange is
    // source-keyed, the sort per group — no global sort) + one rollup;
    // order is total (doc_id tiebreak), so RANGE≡ROWS and both engines
    // cut identically. At 100 TB the frame shuffles once on source and
    // each group's sort is its own partition — the topk_per_group shape.
    "sample_token_budget" -> ((s, sf) => {
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      t(s, sf, "documents").where(col("text").isNotNull)
        .select(col("source"), col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .where(col("cum") <= 10000)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(sum(col("n_tokens")) / lit(10000.0), 6).as("budget_fill"))
        .orderBy("source")
    }),

    "sample_mixture" -> ((s, sf) => {
      val base = when(col("lang") === "en", 2)
        .when(col("lang") === "es", 1)
        .when(col("lang").isin("de", "fr", "zh"), 0)
      val extra = when(col("lang") === "es",
          graft.operators.Split.portableKeep(col("doc_id"), 0.25))
        .otherwise(graft.operators.Split.portableKeep(col("doc_id"), 0.5))
        .cast("int")
      t(s, sf, "documents")
        .withColumn("copies", base + extra)
        .where(col("copies") > 0)
        .select(col("doc_id"), explode(expr("sequence(1, copies)")).as("copy_idx"),
          col("lang"))
        .select(col("doc_id"), col("copy_idx").cast("long").as("copy_idx"), col("lang"))
        .orderBy("doc_id", "copy_idx")
    }),

    // deterministic k-fold assignment (round 12) — cross-validation's
    // split primitive beside split_hash's single train/test cut: fold =
    // the md5-hex-prefix bucket of the order key cut at '33'/'66'/'99'/
    // 'cc' (the 256-bucket space split 51/51/51/51/52 — the same
    // lexicographic-equals-numeric hex compare split_hash rides, so
    // membership is portable, re-run-stable, and oracle-verifiable
    // cross-engine; a row's fold NEVER depends on partitioning or corpus
    // growth). Declared as the per-fold audit rollup (the split_hash
    // shape); the assignment itself is a pure map-stage expression at
    // any SF.
    "split_kfold" -> ((s, sf) => {
      val p = graft.operators.Split.portableBucket(col("o_orderkey"))
      t(s, sf, "orders")
        .withColumn("fold",
          when(p < "33", 0L).when(p < "66", 1L).when(p < "99", 2L)
            .when(p < "cc", 3L).otherwise(4L))
        .groupBy("fold")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          graft.T.dsum(col("o_totalprice"), 2).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("fold")
    }),

    // temperature-scaled mixture sampling (the multilingual-corpus
    // rebalancing of Xue et al., *mT5*, NAACL 2021 §3.1 / Conneau et al.,
    // *XLM-R*, ACL 2020: sample language i with p_i ∝ n_i^α, α = 0.5) —
    // the principled version of sample_mixture's hand-set copy counts:
    // temperature UP-weights tail languages without drowning the head.
    // Per-language targets t_i = floor(200·√n_i/Σ√n_j) derive from the
    // 5-row count rollup (√ and the floor are ONE identical double chain
    // on both engines — the operands are exact integers, so no
    // accumulation-order risk exists before the final chain); membership
    // is the md5-rank cut of sample_fixed (portable, re-run-stable), so
    // the kept multiset is hash-checkable cross-engine. Declared as the
    // per-language audit row: corpus count, raw share, temperature share,
    // target, kept. Pure map + one bounded window at any SF.
    "sample_temperature" -> ((s, sf) => {
      val counts = t(s, sf, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
      val denom = counts.agg(sum(sqrt(col("n_docs"))).as("dsum"),
        sum(col("n_docs")).as("ntot"))
      val targets = counts.crossJoin(broadcast(denom))
        .withColumn("t_share", sqrt(col("n_docs")) / col("dsum"))
        .withColumn("target", floor(col("t_share") * 200).cast("long"))
      val ranked = t(s, sf, "documents")
        .withColumn("hk", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("hk"), col("doc_id")))
          .cast("long"))
      ranked.join(broadcast(targets), Seq("lang"))
        .groupBy(col("lang"), col("n_docs"), col("ntot"), col("t_share"),
          col("target"))
        .agg(sum(when(col("rk") <= col("target"), 1L).otherwise(0L))
          .as("n_kept"),
          min(when(col("rk") <= col("target"), col("doc_id"))).as("min_id"))
        .select(col("lang"), col("n_docs"),
          round(col("n_docs").cast("double") / col("ntot"), 6).as("raw_share"),
          round(col("t_share"), 6).as("temp_share"),
          col("target"), col("n_kept"), col("min_id"))
        .orderBy("lang")
    }),

    // 30-min-gap sessionization: flag + running sum + per-session stats
    "sessionize" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val flagged = t(s, sf, "events").select(col("user_id"), col("ts"), col("event_id"),
        when(lag(col("ts"), 1).over(w).isNull ||
             unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) >= 1800000000L, 1)
          .otherwise(0).as("ns"))
      flagged
        .withColumn("sid", sum(col("ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"))
        .orderBy("user_id", "sid")
    })
  )

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS cnt
         FROM documents GROUP BY 1 ORDER BY h""",
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END) ||
           (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END) ||
           '.Example.COM/' || lang || '/doc-' || CAST(doc_id % 50 AS VARCHAR) ||
           '?p=' || CAST(doc_id % 5 AS VARCHAR) ||
           (CASE WHEN doc_id % 4 = 0 THEN '&utm_source=feed' ELSE '' END) ||
           (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
         FROM documents),
       c AS (SELECT doc_id,
           'https://' || lower(regexp_extract(url, '^https?://([^/]+)/', 1)) ||
           regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) ||
           '?p=' || regexp_extract(url, '[?&]p=([0-9]+)', 1) AS canon
         FROM u)
       SELECT canon, CAST(min(doc_id) AS BIGINT) AS survivor,
         CAST(count(*) AS BIGINT) AS n_dups
       FROM c GROUP BY canon ORDER BY canon NULLS FIRST""",
    "dedup_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
           sh AS (SELECT doc_id, unnest(list_distinct(
                    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])) AS s
                  FROM tok),
           sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
           inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM sh a
                     JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         SELECT da, db, round(jac, 6) AS jac FROM (
           SELECT da, db, i*1.0/(sa.n + sb.n - i) AS jac
           FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id)
         WHERE jac >= 0.5 ORDER BY da, db""",
    "dedup_containment" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
           sh AS (SELECT doc_id, unnest(list_distinct(
                    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])) AS s
                  FROM tok),
           sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
           inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM sh a
                     JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
           dirs AS (SELECT da AS src, db AS dst, CAST(i AS DOUBLE)/sa.n AS c
                      FROM inter JOIN sz sa ON da = sa.doc_id
                    UNION ALL
                    SELECT db, da, CAST(i AS DOUBLE)/sb.n
                      FROM inter JOIN sz sb ON db = sb.doc_id)
         SELECT src, dst, round(c, 6) AS containment FROM dirs
         WHERE c >= 0.8 ORDER BY src, dst""",
    "dedup_best_of_cluster" ->
      """WITH RECURSIVE
           tok AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
           sh AS (SELECT doc_id, unnest(list_distinct(
                    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])) AS s
                  FROM tok),
           sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
           inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM sh a
                     JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
           pairs AS (SELECT da, db FROM inter
                     JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                     WHERE i*1.0/(sa.n + sb.n - i) >= 0.5),
           edges AS (SELECT da AS u, db AS v FROM pairs
                     UNION ALL SELECT db, da FROM pairs),
           nodes AS (SELECT DISTINCT u AS id FROM edges),
           reach AS (SELECT id, id AS lbl FROM nodes
                     UNION
                     SELECT e.v AS id, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
           comp AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
           lens AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT)
                      AS len FROM documents),
           ranked AS (SELECT comp.cluster, comp.id, lens.len,
                 row_number() OVER (PARTITION BY comp.cluster
                   ORDER BY lens.len DESC, comp.id) AS rk
               FROM comp JOIN lens ON lens.doc_id = comp.id)
         SELECT cluster, count(*) AS n_members,
           CAST(max(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS survivor,
           max(len) AS best_len
         FROM ranked GROUP BY 1 ORDER BY cluster""",
    // audit-grade decontamination: the same eval split (md5 prefix <
    // '34' = ceil(0.2·256)/256 of doc_ids), the same 5-gram windows as
    // string keys, recomputed wholesale
    "contamination_ngram" ->
      """WITH tok AS (SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34' AS is_eval,
             string_split(text, ' ') AS tk
           FROM documents),
         w AS (SELECT doc_id, is_eval, unnest(
             [array_to_string(tk[i+1:i+5], ' ')
              for i in range(0, len(tk) - 4)]) AS w
           FROM tok WHERE len(tk) >= 5)
         SELECT e.doc_id, count(DISTINCT e.w) AS hits,
                count(DISTINCT t.doc_id) AS train_docs
         FROM w e JOIN w t ON e.w = t.w AND e.is_eval AND NOT t.is_eval
         GROUP BY e.doc_id ORDER BY e.doc_id""",
    "contamination_embed" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e,
                    sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) nrm
                    FROM embeddings),
           p AS (SELECT a.vec_id a_id, b.vec_id b_id,
                   list_sum(list_transform(list_zip(a.e, b.e), q -> q[1]*q[2]))/(a.nrm*b.nrm) sim
                 FROM n a JOIN n b ON a.vec_id < b.vec_id),
           d AS (SELECT a_id AS x, b_id AS y, sim FROM p WHERE sim >= 0.4
                 UNION ALL
                 SELECT b_id, a_id, sim FROM p WHERE sim >= 0.4)
         SELECT x AS eval_id, count(*) AS n_train_hits,
           round(max(sim), 6) AS max_sim
         FROM d WHERE x % 10 = 0 AND y % 10 <> 0
         GROUP BY 1 ORDER BY eval_id""",
    "shard_shuffle" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             md5(doc_id::VARCHAR || ':epoch0') AS h
           FROM documents),
           s AS (SELECT doc_id, toks, h,
             CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 8
               AS BIGINT) AS shard FROM d)
         SELECT shard, count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           arg_min(doc_id, h) AS first_doc, arg_max(doc_id, h) AS last_doc
         FROM s GROUP BY 1 ORDER BY shard""",
    "sim_cosine_pairs" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e,
                    sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) nrm
                    FROM embeddings),
           p AS (SELECT a.vec_id a_id, b.vec_id b_id,
                   list_sum(list_transform(list_zip(a.e, b.e), q -> q[1]*q[2]))/(a.nrm*b.nrm) sim
                 FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT a_id, b_id, round(sim, 6) AS sim FROM p
         WHERE sim >= 0.4 ORDER BY a_id, b_id""",
    "dedup_clusters" ->
      """WITH RECURSIVE
           tok AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
           sh AS (SELECT doc_id, unnest(list_distinct(
                    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])) AS s
                  FROM tok),
           sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
           inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM sh a
                     JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
           pairs AS (SELECT da, db FROM inter
                     JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                     WHERE i*1.0/(sa.n + sb.n - i) >= 0.5),
           edges AS (SELECT da AS u, db AS v FROM pairs
                     UNION ALL SELECT db, da FROM pairs),
           nodes AS (SELECT DISTINCT u AS id FROM edges),
           reach AS (SELECT id, id AS lbl FROM nodes
                     UNION
                     SELECT e.v AS id, r.lbl FROM reach r JOIN edges e ON e.u = r.id)
         SELECT id AS doc_id, min(lbl) AS cluster
         FROM reach GROUP BY id ORDER BY doc_id""",
    "dedup_survivors" ->
      """WITH RECURSIVE
           tok AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
           sh AS (SELECT doc_id, unnest(list_distinct(
                    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])) AS s
                  FROM tok),
           sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
           inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM sh a
                     JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
           pairs AS (SELECT da, db FROM inter
                     JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                     WHERE i*1.0/(sa.n + sb.n - i) >= 0.5),
           edges AS (SELECT da AS u, db AS v FROM pairs
                     UNION ALL SELECT db, da FROM pairs),
           nodes AS (SELECT DISTINCT u AS id FROM edges),
           reach AS (SELECT id, id AS lbl FROM nodes
                     UNION
                     SELECT e.v AS id, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
           clus AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
         SELECT d.doc_id, d.lang, d.source, d.n_chars
         FROM documents d LEFT JOIN clus c ON d.doc_id = c.id
         WHERE c.cluster IS NULL OR c.cluster = d.doc_id
         ORDER BY d.doc_id""",
    "dedup_embed_clusters" ->
      """WITH RECURSIVE
           n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e,
                 sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) nrm
                 FROM embeddings),
           p AS (SELECT a.vec_id a_id, b.vec_id b_id,
                   list_sum(list_transform(list_zip(a.e, b.e), q -> q[1]*q[2]))/(a.nrm*b.nrm) sim
                 FROM n a JOIN n b ON a.vec_id < b.vec_id),
           pairs AS (SELECT a_id, b_id FROM p WHERE sim >= 0.4),
           edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                     UNION ALL SELECT b_id, a_id FROM pairs),
           nodes AS (SELECT DISTINCT u AS id FROM edges),
           reach AS (SELECT id, id AS lbl FROM nodes
                     UNION
                     SELECT e.v AS id, r.lbl FROM reach r JOIN edges e ON e.u = r.id)
         SELECT id AS vec_id, min(lbl) AS cluster
         FROM reach GROUP BY id ORDER BY vec_id""",
    "dedup_embed" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e,
                    sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) nrm
                    FROM embeddings),
           p AS (SELECT a.vec_id a_id, b.vec_id b_id,
                   list_sum(list_transform(list_zip(a.e, b.e), q -> q[1]*q[2]))/(a.nrm*b.nrm) sim
                 FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT b_id AS dup_id, min(a_id) AS keep_id, count(*) AS n_better
         FROM p WHERE sim >= 0.4 GROUP BY 1 ORDER BY dup_id""",
    "text_wordcount" ->
      """SELECT w, count(*) AS cnt FROM
         (SELECT unnest(string_split(text,' ')) AS w FROM documents)
         GROUP BY w ORDER BY w""",
    "text_ngrams" ->
      """SELECT bg, count(*) AS cnt FROM (
           SELECT unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS bg
           FROM (SELECT string_split(text,' ') AS tk FROM documents))
         GROUP BY bg ORDER BY bg""",
    "text_stats" ->
      """SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         round(avg(n_chars), 6) AS avg_chars,
         round(avg(len(string_split(text,' '))), 6) AS avg_toks,
         count(DISTINCT source) AS srcs
         FROM documents GROUP BY lang ORDER BY lang""",
    "sample_mixture" ->
      """WITH w AS (SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN 2 WHEN lang = 'es' THEN 1
                  WHEN lang IN ('de', 'fr', 'zh') THEN 0 END
             + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                         (CASE WHEN lang = 'es' THEN '40' ELSE '80' END)
                    THEN 1 ELSE 0 END AS copies
           FROM documents WHERE lang IN ('en', 'es', 'de', 'fr', 'zh'))
         SELECT doc_id, CAST(unnest([i for i in range(1, copies + 1)]) AS BIGINT) AS copy_idx, lang
         FROM w WHERE copies > 0 ORDER BY doc_id, copy_idx""",
    "sample_token_budget" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents WHERE text IS NOT NULL),
           c AS (SELECT source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
             FROM d)
         SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / 10000.0, 6) AS budget_fill
         FROM c WHERE cum <= 10000 GROUP BY 1 ORDER BY source""",
    "split_hash" ->
      """WITH s AS (SELECT *,
             CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '40'
                  THEN 'test' ELSE 'train' END AS side
           FROM orders)
         SELECT side, count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM s GROUP BY side ORDER BY side""",
    "sample_fixed" ->
      """WITH r AS (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
             CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           FROM documents)
         SELECT lang, rk, doc_id, hk FROM r WHERE rk <= 10
         ORDER BY lang, rk""",
    "split_kfold" ->
      """WITH s AS (SELECT *,
             CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '33'
                    THEN 0
                  WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '66'
                    THEN 1
                  WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '99'
                    THEN 2
                  WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < 'cc'
                    THEN 3
                  ELSE 4 END AS fold
           FROM orders)
         SELECT CAST(fold AS BIGINT) AS fold, count(*) AS n,
                count(DISTINCT o_custkey) AS n_cust,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM s GROUP BY fold ORDER BY fold""",
    "sample_temperature" ->
      """WITH counts AS (SELECT lang, count(*) AS n_docs
             FROM documents GROUP BY 1),
           denom AS (SELECT sum(sqrt(n_docs)) AS dsum, sum(n_docs) AS ntot
             FROM counts),
           targets AS (SELECT lang, n_docs, ntot,
               sqrt(n_docs) / dsum AS t_share,
               CAST(floor(sqrt(n_docs) / dsum * 200) AS BIGINT) AS target
             FROM counts CROSS JOIN denom),
           ranked AS (SELECT lang, doc_id,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                 AS rk
             FROM documents)
         SELECT t.lang, CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(n_docs AS DOUBLE) / ntot, 6) AS raw_share,
           round(t_share, 6) AS temp_share, target,
           CAST(sum(CASE WHEN rk <= target THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           min(CASE WHEN rk <= target THEN doc_id END) AS min_id
         FROM ranked r JOIN targets t ON r.lang = t.lang
         GROUP BY 1, 2, 3, 4, 5 ORDER BY t.lang""",
    "sample_weighted" ->
      """WITH s AS (SELECT l_returnflag, l_quantity,
             CAST(l_orderkey AS VARCHAR) || '-'
               || CAST(l_linenumber AS VARCHAR) AS k,
             CAST(ceil(l_quantity * 256.0 / 50.0) AS INT) AS cut
           FROM lineitem),
           t2 AS (SELECT l_returnflag, l_quantity,
             (l_quantity > 0 AND (cut >= 256
                OR substr(md5(k), 1, 2) < lpad(lower(to_hex(cut)), 2, '0')))
               AS kept
           FROM s)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(sum(CASE WHEN kept
               THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2)
             AS qty_kept
         FROM t2 GROUP BY 1 ORDER BY 1""",
    "sample_stratified" ->
      """WITH k AS (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hb
                    FROM documents)
         SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM k
         WHERE (lang = 'en' AND hb < '80')
            OR (lang = 'es' AND hb < '40')
            OR (lang IN ('de','fr','zh') AND hb < '20')
         GROUP BY lang ORDER BY lang""",
    "sample_balanced" ->
      """WITH m AS (SELECT min(cnt) AS cap FROM
             (SELECT lang, count(*) AS cnt FROM documents
              WHERE lang IS NOT NULL GROUP BY 1)),
           r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents WHERE lang IS NOT NULL)
         SELECT doc_id, lang FROM r, m WHERE rn <= cap ORDER BY doc_id""",
    "sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           s2 AS (SELECT user_id, ts,
             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
           FROM g)
         SELECT user_id, sid, count(*) AS n_events,
                min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
         FROM s2 GROUP BY user_id, sid ORDER BY user_id, sid"""
  )
}
