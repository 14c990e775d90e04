package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive: keep a keyed aggregate table current by merging DELTA
  * partials into the stored state, never rescanning the base.
  *
  * This is the batch shape of Spark's own partial/final aggregation
  * split, surfaced as a library operator: the stored state IS a final
  * aggregate whose measures are all re-mergeable (count and sum are
  * plain additions; min/max are idempotent lattice joins), so
  * `state ∪ agg(delta)` re-aggregated on the keys reconstructs exactly
  * the aggregate over `base ∪ delta`.
  *
  * 100 TB posture: the refresh cost is `O(|state| + |delta|)` — one
  * delta-sized partial aggregate (map-side combined) plus one shuffle of
  * state + delta partials on the group keys. The 100 TB base is never
  * read again; that asymmetry is the entire point of maintaining the
  * view. The state side can additionally be written bucketed on the
  * keys so the refresh shuffle touches only the delta partials.
  *
  * Contract: measures must be re-mergeable under the declared merge
  * function. `sum`/`count-as-sum` are exact for inserts AND deletes
  * (retractions ride in as negative deltas); `min`/`max` are
  * insert-only monotone (a deletion can invalidate a stored extremum —
  * that case is a rebuild, not an incremental apply, and the scaladoc
  * of [[Upsert.scd2]] sets the same precedent of declaring the
  * monotone contract instead of silently corrupting).
  */
object Mview {

  /** Merge aggregate state with a PARTIAL aggregate of the delta.
    * Both inputs must carry `keys` plus the measure columns named in
    * `merge` (`colName -> "sum" | "min" | "max"`), with identical
    * types (keep sums in DECIMAL until the final read-out for exact,
    * order-independent merging). Count maintenance is `count(*) ->
    * sum`: store the count as a summable measure.
    */
  def combine(state: DataFrame, deltaPartial: DataFrame, keys: Seq[String],
      merge: Map[String, String]): DataFrame = {
    require(keys.nonEmpty, "Mview.combine needs at least one key column")
    val aggs = merge.toSeq.sortBy(_._1).map { case (c, how) =>
      (how match {
        case "sum" => sum(col(c))
        case "min" => min(col(c))
        case "max" => max(col(c))
        case other => throw new IllegalArgumentException(
          s"unsupported merge '$other' for column '$c' (sum|min|max)")
      }).as(c)
    }
    state.select(state.columns.map(col): _*)
      .unionByName(deltaPartial.select(state.columns.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
