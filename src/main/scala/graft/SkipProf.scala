package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-path economics of manifest data skipping (dev tool, the StreamProf
  * pattern): build a stats-committed events table at the given corpus (six
  * 5-day ingest-window appends, the declared manifest_skipping shape), then
  * time the SAME 10-day window read two ways, noop-forced —
  *
  *  - `full`: [[graft.operators.ManifestTable.read]] + row filter (every
  *    file opens; parquet row-group stats may still prune pages);
  *  - `skip`: [[graft.operators.ManifestTable.readPruned]] (files whose
  *    sidecar ranges cannot intersect never open).
  *
  * Prints one line with files kept/total and warm seconds per path. The
  * claim under measure: skipping is a METADATA decision whose cost does
  * not grow with the table, and the read scales with the window asked
  * for, not the table size.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 runMain graft.SkipProf [reps=3]
  */
object SkipProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.ManifestTable
    import graft.operators.ManifestTable.{ColGe, ColLt}

    val dir = s"${sys.props("java.io.tmpdir")}/graft_skipprof_" +
      new java.io.File(sfDir).getName
    val e = T.t(spark, sfDir, "events").withColumn("d", dayofmonth(col("ts")))
    if (ManifestTable.versions(spark, dir).isEmpty) {
      (0 to 5).foreach { w =>
        val lo = w * 5 + 1
        val b = if (w == 5) e.filter(col("d") >= lo)
                else e.filter(col("d") >= lo && col("d") <= lo + 4)
        ManifestTable.commit(spark, dir, b.drop("d"), replace = w == 0,
          statsCols = Seq("ts", "user_id", "value"))
      }
    }
    val preds = Seq(ColGe("ts", "2024-01-11 00:00:00"),
      ColLt("ts", "2024-01-21 00:00:00"))
    val (kept, total) = ManifestTable.pruneFiles(spark, dir, preds)
    def timeIt(f: () => org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
    val residual = col("ts") >= "2024-01-11 00:00:00" &&
      col("ts") < "2024-01-21 00:00:00"
    val full = timeIt(() => ManifestTable.read(spark, dir).where(residual))
    val skip = timeIt(() => ManifestTable.readPruned(spark, dir, preds))
    def fmt(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString(" ")
    println(s"[skipprof] sf=${new java.io.File(sfDir).getName} " +
      s"files=${kept.size}/$total full=[${fmt(full)}] " +
      s"skip=[${fmt(skip)}] sec")

    // bloom leg (round 15): the POINT-LOOKUP economics — user-interleaved
    // batches (every file spans the full user domain, range stats prune
    // nothing), one-user read full vs bloom-pruned
    import graft.operators.ManifestTable.ColEq
    val bdir = s"${sys.props("java.io.tmpdir")}/graft_skipprof_bloom_" +
      new java.io.File(sfDir).getName
    if (ManifestTable.versions(spark, bdir).isEmpty) {
      val ev = T.t(spark, sfDir, "events")
      (0 to 5).foreach(r => ManifestTable.commit(spark, bdir,
        ev.filter(pmod(col("user_id"), lit(6)) === r),
        replace = r == 0, bloomCols = Seq("user_id")))
    }
    val bp = Seq(ColEq("user_id", 3L))
    val (bKept, bTotal) = ManifestTable.pruneFiles(spark, bdir, bp)
    val bFull = timeIt(() =>
      ManifestTable.read(spark, bdir).where(col("user_id") === 3L))
    val bSkip = timeIt(() => ManifestTable.readPruned(spark, bdir, bp))
    println(s"[skipprof-bloom] sf=${new java.io.File(sfDir).getName} " +
      s"files=${bKept.size}/$bTotal full=[${fmt(bFull)}] " +
      s"bloom=[${fmt(bSkip)}] sec")
    spark.stop()
  }
}
