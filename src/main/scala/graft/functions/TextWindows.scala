package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared word-window stream: (doc_id, w) where w is the space-joined
  * n-token sliding window of `text`. Shaped as explode(sequence) +
  * per-row slice-join — O(windows × n) by construction; exploding a
  * computed `transform(...)` array instead would make codegen re-derive
  * the whole window array per emitted element (the documented O(L²)
  * trap). Docs under n tokens have no windows and drop. Within-doc
  * duplicate windows pass through — callers distinct/aggregate per their
  * own semantics. ONE definition for the three window consumers
  * (text_repetition, text_boilerplate, Contamination), so tokenization
  * and window bounds can never silently diverge between them.
  */
object TextWindows {
  def wordWindows(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= n)
      .select(col("doc_id"), col("tk"),
        explode(expr(s"sequence(0, size(tk) - $n)")).as("i"))
      .select(col("doc_id"),
        expr(s"concat_ws(' ', slice(tk, i + 1, $n))").as("w"))
  }
}
