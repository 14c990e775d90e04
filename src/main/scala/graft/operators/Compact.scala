package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction for parquet directories (SURVEY.md §2.13 addition,
  * round 7). The chronic sink-side failure mode of a large pipeline is not
  * too much data but too many FILES: a 1000-executor streaming or
  * per-partition batch write leaves thousands of kilobyte parquet files per
  * day, and every downstream scan then pays one task + one footer read +
  * one object-store GET per file — listing alone can dominate a 100 TB
  * read. Compaction rewrites a directory to files near a target size so
  * scans read few, large, row-group-aligned files.
  *
  * Sizing is byte-driven from the ACTUAL input (one filesystem listing —
  * metadata only, no data read): `ceil(totalBytes / targetBytes)` output
  * files. Two rewrite shapes, chosen by `shuffle`:
  *
  *  - `shuffle = false` (default): `coalesce(n)` — NARROW; each output
  *    task concatenates whole input splits, no exchange, no sort. The
  *    right tool when inputs are uniformly small (the streaming-sink
  *    case): output skew is bounded by input-split skew.
  *  - `shuffle = true`: `repartition(n)` — one round-robin exchange buying
  *    exactly-balanced outputs. The right tool when input files are wildly
  *    uneven and downstream cares about per-file balance more than one
  *    shuffle of the data.
  *
  * Columnar invariants (row order inside a file, encodings) are rewritten,
  * not preserved — compaction is a physical-layout operator; the row SET
  * is untouched (CompactSpec pins set-equality, file count, and the
  * narrow/exchange plan split).
  */
object Compact {

  /** Total bytes of non-hidden data files directly under `dir` (recursive:
    * partitioned layouts count their leaf files). Metadata-only: one
    * driver-side listing, the same cost every scan's file index pays.
    * Uses Hadoop's `FileSystem` abstraction — the filesystem API Spark
    * itself bundles and exposes (`sparkContext.hadoopConfiguration`), so
    * the listing works on any store Spark can read (local, HDFS, object
    * stores).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** ceil(totalBytes / targetBytes), floor 1 — the output file count for a
    * directory of `totalBytes`. */
  def targetFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet directory `inDir` into `outDir` as ≈`targetBytes`
    * files. Returns the output file count it sized. `outDir` must differ
    * from `inDir`: compact-in-place would have the read and the overwrite
    * racing on the same listing — callers swap directories (or a catalog
    * pointer) atomically after the rewrite lands.
    */
  def rewriteParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, shuffle: Boolean = false): Int = {
    // qualify BOTH paths against their FileSystem before comparing:
    // unqualified Path equality lets different spellings of the same
    // directory (relative vs absolute, file:/x vs /x) slip past the guard,
    // and the SaveMode.Overwrite below would then truncate the directory
    // being read
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String): Path = {
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    val qIn = qualified(inDir)
    val qOut = qualified(outDir)
    require(qIn != qOut,
      "compact-in-place is not supported: write to a sibling dir and swap")
    // a nested target corrupts the same way: out under in is truncated
    // mid-read by the overwrite's directory prep; in under out is deleted
    // outright by the overwrite
    def isAncestor(a: Path, b: Path): Boolean = {
      var cur = b.getParent
      while (cur != null) { if (cur == a) return true; cur = cur.getParent }
      false
    }
    require(!isAncestor(qIn, qOut) && !isAncestor(qOut, qIn),
      s"in/out dirs must be disjoint, got $qIn and $qOut")
    val n = targetFileCount(dataBytes(spark, inDir), targetBytes)
    val df = spark.read.parquet(inDir)
    sized(df, n, shuffle).write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }

  /** The layout step alone: `df` arranged into `n` output partitions,
    * narrow (`coalesce`) or balanced (`repartition`). Exposed for callers
    * that compose compaction into a larger write (e.g. compact + sort
    * within partitions for range-scan locality).
    */
  def sized(df: DataFrame, n: Int, shuffle: Boolean = false): DataFrame =
    if (shuffle) df.repartition(n) else df.coalesce(n)
}
