package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch prep (SURVEY.md §2.13 addition,
  * round 7): assign variable-length documents to fixed-capacity token bins
  * (the "pack 2048-token training sequences" step after chunking), so
  * padding waste — the difference between sum(tokens) and
  * bins × capacity — stays small.
  *
  * Exact global bin packing is NP-hard and inherently sequential; the
  * scalable shape is per-partition first-fit-decreasing: spread docs
  * evenly by key hash, sort each partition by length descending, greedy
  * first-fit within the partition. With thousands of docs per partition
  * and doc length ≪ capacity, per-partition FFD converges to the same
  * ~`11/9·OPT + O(1)` bound global FFD has (Johnson 1973) — the waste is
  * dominated by the last, partially-filled bin of each partition, which
  * amortizes to nothing at real partition sizes. One exchange (the even
  * re-spread) + an in-partition sort; no driver state, no global sort.
  *
  * Output: one row per input doc — (doc_id, n_tokens, bin). Bin ids are
  * unique across partitions (partitionId in the high 32 bits, dense local
  * bin index in the low) and the whole assignment is a pure function of
  * (doc ids, lengths, `partitions`): hash re-spread + a total in-partition
  * order + deterministic greedy, so re-runs and differently-partitioned
  * inputs pack identically. Docs LONGER than the capacity get a bin of
  * their own (the caller's chunker should have split them — they are
  * detectable as `n_tokens > capacity`); null/non-positive lengths are
  * dropped.
  */
object Pack {

  def firstFit(docs: DataFrame, docIdCol: String, tokensCol: String,
      capacity: Long, partitions: Int = 0): Dataset[(Long, Long, Long)] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    docs
      .select(col(docIdCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .where(col("n_tokens").isNotNull && col("n_tokens") > 0)
      .repartition(n, col("doc_id"))
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id").asc)
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        // remaining capacity per open bin; indexWhere is O(bins) per doc —
        // fine while bins-per-partition stays in the thousands (swap in a
        // capacity-indexed tree for extreme partition sizes)
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { case (id, t) =>
          val bin =
            if (t >= capacity) { remaining += 0L; remaining.length - 1 }
            else {
              val fit = remaining.indexWhere(_ >= t)
              if (fit >= 0) { remaining(fit) -= t; fit }
              else { remaining += (capacity - t); remaining.length - 1 }
            }
          (id, t, (pid << 32) | bin.toLong)
        }
      }
      .toDF("doc_id", "n_tokens", "bin").as[(Long, Long, Long)]
  }

  /** Packing quality summary: (bins, docs, sum_tokens, fill). bins/docs/
    * sum_tokens count EVERYTHING; fill is sum_tokens / (bins × capacity)
    * over non-oversize bins only — an oversize singleton (one doc longer
    * than capacity, the chunker's leftover) is not packing waste, so its
    * bin leaves the denominator and its tokens leave the numerator. A
    * packing that is all oversize singletons reports fill = 1.0 (no
    * packable waste to measure).
    */
  def fill(packed: DataFrame, capacity: Long): (Long, Long, Long, Double) = {
    val perBin = packed.groupBy("bin").agg(
      max(col("n_tokens")).as("mx"), sum(col("n_tokens")).as("tk"),
      count(lit(1)).as("dc"))
    val r = perBin.agg(count(lit(1)), sum(col("dc")), sum(col("tk")),
      count(when(col("mx") <= capacity, lit(1))),
      coalesce(sum(when(col("mx") <= capacity, col("tk"))), lit(0L))).head()
    val bins = r.getLong(0); val docs = r.getLong(1); val toks = r.getLong(2)
    val okBins = r.getLong(3); val okToks = r.getLong(4)
    val f = if (okBins == 0) 1.0 else okToks.toDouble / (okBins * capacity)
    (bins, docs, toks, f)
  }
}
