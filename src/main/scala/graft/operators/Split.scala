package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines (SURVEY.md §2.13
  * addition, round 3). Unlike `randomSplit` — whose assignment depends on
  * partitioning and sampler state — a hash split is a pure function of the
  * key: stable across runs, cluster sizes, repartitionings, and engine
  * versions, and every row sharing a key lands on the same side (no
  * train/test leakage between duplicate documents when keyed on content).
  * Narrow (one projection + filter per side): no shuffle, no driver state.
  */
object Split {

  private val Buckets = 1000000L

  /** Bucket in [0, 1e6) from the key: pmod(xxhash64(key, seed), 1e6).
    * xxhash64 SKIPS null inputs (it would hash only the seed column), so
    * without an explicit branch every null key would land in one
    * hash-of-seed-determined bucket that silently moves with the seed —
    * instead nulls are routed to bucket 0, a fixed documented side.
    */
  def bucket(key: Column, seed: Int = 42): Column =
    when(key.isNull, lit(0L)).otherwise(pmod(xxhash64(key, lit(seed)), lit(Buckets)))

  /** (train, test) with ≈ testFrac of keys in test.
    * Same (key, seed) → same side, always.
    */
  def byHash(df: DataFrame, key: Column, testFrac: Double, seed: Int = 42)
      : (DataFrame, DataFrame) = {
    require(testFrac >= 0.0 && testFrac <= 1.0, "testFrac must be in [0, 1]")
    val cut = (testFrac * Buckets).toLong
    val b = bucket(key, seed)
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** K-fold assignment column (0 until k) from the key — for deterministic
    * cross-validation folds at any scale.
    */
  def fold(key: Column, k: Int, seed: Int = 42): Column = {
    require(k > 0, "k must be positive")
    when(key.isNull, lit(0L)).otherwise(pmod(xxhash64(key, lit(seed)), lit(k.toLong)))
  }

  /** Engine-portable sibling of [[bucket]] (round 7): the first two hex
    * chars of md5(key-as-string) — 256 uniform buckets whose assignment any
    * engine with a standard md5 reproduces byte-for-byte (DuckDB, Trino,
    * Python's hashlib, ...), unlike xxhash64, whose seeding is
    * Spark-specific. Use this when split MEMBERSHIP itself must be
    * auditable outside Spark — e.g. a train/test registry checked by a
    * non-Spark validator, or the declared `split_hash` /
    * `sample_stratified` queries, which are hash-verified against DuckDB on
    * exactly this assignment. 256 buckets quantize fractions to 1/256 —
    * ample for split work; use [[bucket]] (1e6 buckets, one codegen'd hash
    * vs md5's bytes-and-hex detour) when resolution or per-row cost
    * matters more than cross-engine auditability. Null keys yield a null
    * prefix (callers decide the policy; [[portableKeep]] drops them).
    */
  def portableBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  /** Keep-predicate at ⌈frac·256⌉/256 of keys: the fixed-width lowercase
    * hex prefix compares lexicographically exactly as it does numerically,
    * so `prefix < '40'` is the 25% cut in every engine. Monotone in `frac`
    * (same subset property sampleByHash has) and null keys are dropped —
    * the same honest-sampler contract.
    */
  def portableKeep(key: Column, frac: Double): Column = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0, 1], got $frac")
    val cut = math.ceil(frac * 256).toInt
    if (cut >= 256) key.isNotNull
    else if (cut <= 0) lit(false)
    else key.isNotNull && portableBucket(key) < lit(f"$cut%02x")
  }

  /** Deterministic stratified downsample (round 4): keep a per-stratum
    * fraction of rows, membership decided by the KEY's hash bucket — not a
    * Bernoulli RNG like `stat.sampleBy`, whose draw depends on row order
    * and partitioning. Re-runs, repartitionings, and corpus growth keep
    * every previously-sampled key sampled (hash-stable membership is what
    * makes corpus downsampling reproducible and incrementally extendable),
    * and duplicate keys sample together. Strata missing from `fractions`
    * default to `defaultFrac` (0 = drop — the usual "keep only listed
    * languages at these rates" shape). Null KEYS are always dropped: the
    * split's null→bucket-0 policy would keep 100% of null-key rows in any
    * stratum with a positive fraction, silently breaking the per-stratum
    * rate — a sampler has no "must land somewhere" obligation, so
    * exclusion is the honest contract (hash a coalesced surrogate key if
    * null rows must participate). A NULL STRATUM is different from a null
    * key: the row still has a hashable identity, it just matches no listed
    * stratum (`strata === lit(s)` is null-false for every s), so it samples
    * at `defaultFrac` like any other unlisted stratum — with the default
    * `defaultFrac = 0.0` null-stratum rows are dropped; pass a positive
    * default (or coalesce the stratum column upstream) to keep them at a
    * chosen rate. SplitSpec pins this. Narrow: one projection + filter, no
    * shuffle, no driver state.
    */
  def sampleByHash(df: DataFrame, key: Column, strata: Column,
      fractions: Map[String, Double], defaultFrac: Double = 0.0,
      seed: Int = 42): DataFrame = {
    (fractions.values ++ Seq(defaultFrac)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0, 1], got $f"))
    val cut = fractions.foldLeft(lit((defaultFrac * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(strata === lit(stratum), lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(key.isNotNull && bucket(key, seed) < cut)
  }

  /** Weighted deterministic keep (round 9): accept a row iff its key's
    * portable 256-bucket hash fraction falls below weight / maxWeight —
    * the hash-split discipline extended to importance sampling.
    * Membership is a pure function of (key, weight): re-runs,
    * repartitionings, and corpus growth keep the same rows, and raising
    * a row's weight only ever ADDS it (the subset-monotone law
    * [[portableKeep]] has in `frac`, here per row in `weight`).
    * Quantized to 1/256 by ceil — weight == maxWeight keeps certainly,
    * any positive weight keeps ≥ 1/256 of its keys. The per-row cut
    * compares as a fixed-width lowercase hex string (Spark `hex` and
    * DuckDB `to_hex` are both uppercase — lower() on each side keeps the
    * comparison engine-portable against md5's lowercase output).
    * Non-positive weights and null keys drop.
    */
  def keepWeighted(key: Column, weight: Column, maxWeight: Double): Column = {
    require(maxWeight > 0, s"maxWeight must be positive, got $maxWeight")
    val cut = ceil(weight * lit(256.0) / lit(maxWeight)).cast("int")
    key.isNotNull && weight > lit(0) &&
      ((cut >= lit(256)) || portableBucket(key) < lpad(lower(hex(cut)), 2, "0"))
  }
}
