package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via Z-ordering (Morton codes) — the
  * write-side sibling of [[Compact]] (SURVEY.md §2.13 addition, round 7).
  *
  * Parquet scans skip files and row groups whose column min/max statistics
  * exclude the predicate. A layout sorted on ONE column gives tight stats
  * on that column only: a query filtering on two dimensions still reads
  * every file for the second dimension's sake. Interleaving the bits of
  * both dimensions' quantized values (Morton 1966's Z-curve — the same
  * layout primitive behind Delta Lake's OPTIMIZE ZORDER and column-store
  * multi-dim clustering) makes z-contiguous ranges cover RECTANGLES of the
  * value space, so every file holds a bounded box of all interleaved
  * dimensions and a 2-D selective scan prunes to the few files whose boxes
  * intersect it. LayoutSpec pins exactly that, counting overlap from
  * per-file min/max.
  *
  * Scale shape: quantization bounds come from one column-pruned min/max
  * aggregate (a scan-count-style job, same runtime-statistics move
  * `Sim.topK(auto)` makes); the z column itself is a pure per-row bit
  * expression (codegen'd, narrow); the clustered write is ONE range
  * exchange + in-partition sort — the exchange any clustered write pays.
  * Skew caveat: range partitioning on z samples the real distribution, so
  * heavily duplicated keys land together; cap per-file volume by passing a
  * larger `nFiles` or compose with [[Compact.sized]] afterwards.
  */
object Layout {

  /** Morton z-value of `cols`, each linearly quantized to `bits` bits over
    * its `[min, max]` range (bounds from `bounds`, one row per col). Bit i
    * of dimension d lands at position `i * k + d` — the canonical
    * interleave. `bits * cols.size` must fit a long (≤ 63). NULL in any
    * dimension quantizes to bucket 0 (nulls cluster together at the low
    * corner rather than poisoning the whole file's stats with a null-wide
    * range).
    */
  def zColumn(cols: Seq[Column], bounds: Seq[(Double, Double)], bits: Int = 12): Column = {
    val k = cols.size
    require(k >= 1, "need at least one column")
    require(bounds.size == k, "one (min, max) per column")
    require(bits * k <= 63, s"bits * cols = ${bits * k} exceeds a long")
    val levels = (1L << bits) - 1
    val q = cols.zip(bounds).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * lit(levels.toDouble)), lit(0L)),
        lit(levels)).cast("long")
    }
    val terms = for {
      b <- 0 until bits
      d <- 0 until k
    } yield shiftleft(shiftright(q(d), b).bitwiseAND(lit(1L)), b * k + d)
    coalesce(terms.reduce(_.bitwiseOR(_)), lit(0L))
  }

  /** `df` clustered for multi-dimensional scans: rows range-partitioned
    * and sorted by the z-value of `cols` into `nFiles` output partitions.
    * Bounds are measured from the data (one min/max aggregate). Write the
    * result with `.write.parquet(...)` — each output file then carries a
    * bounded box of all `cols` in its parquet stats.
    */
  def zOrdered(df: DataFrame, cols: Seq[String], nFiles: Int, bits: Int = 12): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    val row = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        .head, cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        .tail: _*).head()
    val bounds = cols.indices.map { i =>
      // an all-null / empty dimension quantizes everything to bucket 0
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      (lo, hi)
    }
    val z = zColumn(cols.map(col), bounds, bits)
    df.withColumn("__graft_z", z)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}
