package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection (SURVEY.md §2.13 addition, round 7):
  * the decontamination pass every serious training corpus runs — find eval
  * documents whose content leaked into the training set, by shared
  * n-token windows (the standard is 10-13-gram overlap: long enough that
  * chance collisions are negligible, short enough to catch partial
  * copies).
  *
  * Shape: both corpora explode to hashed n-gram windows (narrow — each
  * row's windows come from its own text), the candidate stage is one
  * equi-join on the 64-bit window hash (bucketed, never all-pairs; a
  * cross-text hash collision can only ADD a spurious hit at ~2⁻⁶⁴ per
  * distinct window pair — a detector may over-flag, it must not miss),
  * and per-eval-doc hit counts come from one aggregate. At 100 TB the
  * train side's distinct window hashes are the big frame; they shuffle as
  * bare longs, and the whole check is one hash join + one aggregate — the
  * same inverted-index shape as the jaccard kernel.
  *
  * Output: one row per EVAL doc — (doc_id, n_windows, hits,
  * train_docs, contaminated): total windows, windows also present in
  * train, distinct train docs sharing a window, and the flag. Eval docs
  * shorter than `n` tokens have zero windows and are reported clean
  * (callers wanting exact-match semantics for short docs should lower `n`
  * or add an exact-hash pass — dedup_exact is that operator).
  */
object Contamination {

  /** (doc_id, w) hashed window stream over the shared
    * [[graft.functions.TextWindows]] kernel (the O(L²)-safe
    * explode+slice idiom), collapsed to xxhash64 so the join frames
    * below carry 8-byte longs, never text. Window duplicates within a
    * doc pass through — downstream counts are countDistinct, so they
    * cannot inflate results.
    */
  private def windows(docs: DataFrame, n: Int): DataFrame =
    graft.functions.TextWindows.wordWindows(docs, n)
      .select(col("doc_id"), xxhash64(col("w")).as("w"))

  def ngramHits(train: DataFrame, eval_ : DataFrame, n: Int = 13): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    // the train side ships (hash, doc) pairs of 8-byte longs — per-doc
    // distinct windows; at scale this is the dominant frame and it
    // carries no text
    val trainW = windows(train, n)
      .select(col("w"), col("doc_id").as("train_doc"))
    val evalW = windows(eval_, n)
    // hits = this eval doc's distinct windows found ANYWHERE in train
    // (not match-pair count: one leaked window shared by 100 train docs is
    // one contaminated window, attributed via train_docs)
    val hits = evalW.join(trainW, "w")
      .groupBy("doc_id")
      .agg(countDistinct(col("w")).as("hits"),
        countDistinct(col("train_doc")).as("train_docs"))
    val counts = eval_.select(col("doc_id"),
      greatest(size(split(col("text"), " ")) - (n - 1), lit(0))
        .cast("long").as("n_windows"))
    counts.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("train_docs"), lit(0L)).as("train_docs"))
      .withColumn("contaminated", col("hits") > 0)
  }
}
