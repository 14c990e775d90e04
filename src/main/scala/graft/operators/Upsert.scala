package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style upsert for parquet-backed corpora — the incremental-update
  * primitive plain Spark-on-parquet lacks (Delta/Iceberg ship it as MERGE
  * INTO): a delta frame's rows REPLACE same-key target rows, and new keys
  * append.
  *
  * Shape and scale posture: one anti-join of the target against the
  * delta's KEY SET (keys only — the delta payload never enters the join),
  * then a narrow unionByName with the delta. The key set is delta-sized,
  * so at corpus scale the anti-join broadcasts (size-based, no hint) and
  * the target side never shuffles; the full-outer-join formulation this
  * replaces would shuffle the entire target on every merge. For a
  * partitioned corpus, compose with dynamic partition overwrite
  * (`partitionOverwriteMode=dynamic`, the round-8 capability): write
  * `merge(...)` filtered to the delta's partitions and only touched
  * directories rewrite.
  *
  * Semantics (UpsertSpec): delta wins on key collision; one output row
  * per target∪delta key (the delta must be key-unique — enforce upstream
  * with dedup_exact/dropDuplicates, the usual CDC compaction step);
  * re-applying the same delta is idempotent.
  */
object Upsert {

  /** Delta rows replace same-key target rows; unmatched delta rows append. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source)
  }

  /** CDC apply: `changes` carries an op column with I/U/D markers. Upserts
    * (I/U) merge like [[merge]]; D rows delete their target key and emit
    * nothing. One anti-join against ALL touched keys (so a deleted key
    * vanishes and an upserted key is replaced), then the surviving
    * change rows append. Only a LITERAL "D" deletes: the comparison is
    * null-safe, so a malformed NULL op row upserts (visibly wrong data)
    * instead of silently deleting its key (invisibly lost data).
    */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    target.join(changes.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(changes.where(!(col(opCol) <=> "D")).drop(opCol))
  }

  /** SCD Type-2 history merge — versioned upsert for dimensions whose
    * past must stay queryable (as-of joins over provenance/metadata
    * tables): `history` carries validity columns (`validTo` NULL = the
    * key's current version); each delta row CLOSES its key's current
    * version at the delta's effective timestamp and appends as the new
    * open version. Closed versions are never touched, so point-in-time
    * reads (`valid_from ≤ t < coalesce(valid_to, ∞)`) see exactly the
    * version that was current at t.
    *
    * MONOTONE apply: a delta row takes effect only when its
    * `effectiveFrom` is STRICTLY later than the key's open version's
    * `validFrom` (new keys always apply). A late-arriving delta (older
    * than the current version) and a re-applied delta (a job retry —
    * same effectiveFrom) are both no-ops instead of history corruption:
    * without the guard, a retry would close the just-written version at
    * its own valid_from (an empty interval) and append a duplicate, and
    * a late delta would write a version whose validity range is
    * inverted. Out-of-order history RECONSTRUCTION (inserting a version
    * into the middle of the timeline) is deliberately out of scope —
    * that is a rebuild (sort + window over all versions), not an
    * incremental apply.
    *
    * Plan: two joins of delta-sized sides (the open-version keys and the
    * accepted-delta keys — both broadcast at corpus scale; the history
    * itself never shuffles) plus a narrow union of the new versions.
    * The delta must be key-unique (one new version per key per apply;
    * compact upstream like [[merge]]).
    */
  def scd2(history: DataFrame, delta: DataFrame, keys: Seq[String],
      effectiveFrom: String, validFrom: String = "valid_from_us",
      validTo: String = "valid_to_us"): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    // each key's open-version start — the monotonicity watermark
    val openFrom = history.where(col(validTo).isNull)
      .select((keys.map(col) :+ col(validFrom).as("__open_from")): _*)
    val accepted = delta.join(openFrom, keys, "left")
      .where(col("__open_from").isNull || col(effectiveFrom) > col("__open_from"))
      .drop("__open_from")
    val newFrom = accepted
      .select((keys.map(col) :+ col(effectiveFrom).as("__new_from")): _*)
    val closed = history.join(newFrom, keys, "left")
      .withColumn(validTo,
        when(col(validTo).isNull && col("__new_from").isNotNull, col("__new_from"))
          .otherwise(col(validTo)))
      .drop("__new_from")
    val fresh = accepted
      .withColumn(validFrom, col(effectiveFrom))
      .withColumn(validTo, lit(null).cast("long"))
      .select(closed.columns.map(col): _*)
    closed.unionByName(fresh)
  }
}
