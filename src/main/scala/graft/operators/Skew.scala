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
}
