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
}
