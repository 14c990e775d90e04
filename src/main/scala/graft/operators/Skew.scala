package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4; AQE's skew-join split
  * handles sort-merge skew automatically at runtime — this utility is the
  * explicit variant for when a handful of keys dominate, e.g. a null-ish
  * default user or a viral document at 100 TB).
  *
  * The large side gets a deterministic content-derived salt in [0, salts);
  * the small side is replicated once per salt value; the join key becomes
  * (key, salt). Results are identical to the unsalted join for any salt
  * assignment, so correctness never depends on the hash.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(key) === replicatedSmall(key) &&
          saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key)).drop(saltedLarge("__salt")).drop(replicatedSmall("__salt"))
  }

  /** Two-phase hot-key-only salted join (round-11 verdict item 5): the
    * plan a 100 TB skew actually wants. [[saltedJoin]] pays the salt hash
    * on EVERY large row and replicates the small side `salts`× for ALL
    * keys — worst-case-uniform pricing even when one key carries the skew.
    * This variant detects the hot keys first and salts only those:
    *
    *  1. DETECT — a seeded Bernoulli sample of the large side's key column
    *     (column-pruned scan, `sampleFraction` of the rows) is
    *     hash-aggregated; keys whose sampled count implies ≥ `minHotRows`
    *     true rows are hot. The hot frame is bounded by construction
    *     (≤ sampled-rows / threshold keys, hard-capped at `maxHotKeys` by
    *     descending count, so the heaviest keys win the cap) and
    *     broadcasts at any corpus size.
    *  2. JOIN — both sides left-broadcast-join the hot frame (map-side
    *     tag, no shuffle). Hot large rows get a content-derived salt in
    *     [0, salts); cold rows get salt 0. The small side explodes to
    *     `salts` replicas for hot keys and exactly one for cold keys. ONE
    *     shuffle join on (key, salt) then serves both populations: the
    *     hot key's rows spread over `salts` reducers, the cold rest pays
    *     nothing beyond the plain join it would have run anyway.
    *
    * Results are identical to the unsalted join for ANY hot-set choice and
    * ANY salt assignment (the pairs matched are exactly the key-equal
    * pairs), so correctness never depends on the sample — the sample only
    * moves cost. Misses degrade to AQE's runtime skew split; false
    * positives cost one extra small-side replica set.
    */
  def hotSaltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int,
      minHotRows: Long = 100000L, sampleFraction: Double = 0.01,
      seed: Long = 42L, maxHotKeys: Int = 1024): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1, "sampleFraction in (0,1]")
    val thresh = math.max(2L, (minHotRows * sampleFraction).toLong)
    val hot = large.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed)
      .groupBy(key).agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= thresh)
      .orderBy(col("__cnt").desc, col(key))
      .limit(maxHotKeys)
      .select(col(key), lit(true).as("__hot"))
    val l2 = large.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", when(col("__hot").isNotNull,
        pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts.toLong)))
        .otherwise(0L))
      .drop("__hot")
    val s2 = small.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", explode(sequence(lit(0L),
        when(col("__hot").isNotNull, lit(salts.toLong - 1)).otherwise(lit(0L)))))
      .drop("__hot")
    l2.join(s2,
        l2(key) === s2(key) && l2("__salt") === s2("__salt"))
      .drop(s2(key)).drop(l2("__salt")).drop(s2("__salt"))
  }
}
