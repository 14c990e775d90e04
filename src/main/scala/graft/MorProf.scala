package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Merge-on-read LIFECYCLE TAIL economics (dev tool, the SkipProf
  * pattern; r16 verdict item 6): build a many-version MoR events table at
  * the given corpus — W ingest appends, D row-level deleteWhere commits
  * (each publishing a position sidecar, no file rewritten), one upsertMor
  * MERGE, then the OPTIMIZE (REPLACE materialization) — and measure the
  * two lifecycle-tail costs the declared queries don't:
  *
  *  - `expire(keepLast = 1)` on the long history: manifests dropped,
  *    unreferenced data batches AND `_deletes/` sidecars vacuumed —
  *    printed with before/after data-file and sidecar counts;
  *  - the post-expire head read: survivors intact (row count printed
  *    against the pre-expire head count), plan join-free (the
  *    materialized head pays no anti-join).
  *
  * The claim under measure: the MoR tail is METADATA-speed — expire is
  * O(versions) manifest reads + O(dead dirs) deletes, never a data scan;
  * at 100 TB the nightly OPTIMIZE+expire pays one table rewrite (the
  * declared manifest_delete_compact cost) and the vacuum itself is
  * filesystem-bounded.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 runMain graft.MorProf
  */
object MorProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val dir = s"${sys.props("java.io.tmpdir")}/graft_morprof_" +
      new java.io.File(sfDir).getName
    org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def countFiles(sub: String): Int = {
      val root = new java.io.File(s"$dir/$sub")
      if (!root.exists()) 0
      else root.listFiles().count(_.isDirectory)
    }

    val e = T.t(spark, sfDir, "events")
    // 8 ingest appends (event_id % 8) + 3 deleteWhere sidecar commits +
    // one MERGE — 12 versions of history before the OPTIMIZE
    val tBuild = secs {
      (0 to 7).foreach(r => ManifestTable.commit(spark, dir,
        e.filter(pmod(col("event_id"), lit(8)) === r),
        statsCols = Seq("ts")))
    }
    val tDel = secs {
      ManifestTable.deleteWhere(spark, dir, col("event_type") === "click")
      ManifestTable.deleteWhere(spark, dir,
        col("event_type") === "view" && pmod(col("user_id"), lit(5)) === 0)
      ManifestTable.deleteWhere(spark, dir,
        col("event_type") === "purchase" && col("value") < 10.0)
    }
    val tMerge = secs {
      val upd = e.filter(col("event_type") === "purchase" &&
          col("value") >= 10.0)
        .withColumn("value",
          expr("CAST(CAST(value AS DECIMAL(18,2)) + 1.00 AS DOUBLE)"))
      ManifestTable.upsertMor(spark, dir, upd, Seq("event_id"))
    }
    val headRows = ManifestTable.read(spark, dir).count()
    // the round-17 change feed over the full 12-version history: every
    // insert + delete event counted (forces the position-resolve joins)
    var nChanges = 0L
    val tCdf = secs {
      nChanges = ManifestTable.changes(spark, dir, 0L).count()
    }
    // the two feed consumers at the same scale: the per-key last-event
    // fold (mirror apply) and the SCD2 interval build — each one keyed
    // exchange over the O(changes) frame
    import org.apache.spark.sql.expressions.Window
    var nLive = 0L
    val tApply = secs {
      val w = Window.partitionBy("event_id")
        .orderBy(col("_commit_version").desc,
          when(col("_change_type") === "insert", 1).otherwise(0).desc)
      nLive = ManifestTable.changes(spark, dir, 0L)
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .where(col("rn") === 1 && col("_change_type") === "insert")
        .count()
    }
    var nIntervals = 0L
    val tScd2 = secs {
      val ord = col("_commit_version") * 2 +
        when(col("_change_type") === "insert", 1).otherwise(0)
      val w = Window.partitionBy("event_id").orderBy(ord)
      nIntervals = ManifestTable.changes(spark, dir, 0L)
        .withColumn("next_v",
          org.apache.spark.sql.functions.lead(col("_commit_version"), 1).over(w))
        .where(col("_change_type") === "insert")
        .count()
    }
    // the STREAMING CDF drain at the same scale (r17 verdict item 6): a
    // real AvailableNow readChangeFeed query through TxnSink with
    // version-level admission, run TWICE against one checkpoint — the
    // second invocation resumes and pays ONLY the late commit, the
    // exactly-once incremental-consumer contract at 100× volume.
    val outTbl = s"$dir-cdfout"
    val ckpt = s"$dir-cdfckpt"
    Seq(outTbl, ckpt).foreach(p => org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(p), true))
    def drainCdf(): Double = secs {
      val q = spark.readStream
        .format(classOf[graft.streaming.ManifestTableProvider].getName)
        .option("path", dir)
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "4")
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.streaming.TxnSink.commitBatch(outTbl, b, id); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val tDrain1 = drainCdf()
    val nDrained1 = ManifestTable.read(spark, outTbl).count()
    // a late ingest commit lands after the first drain...
    ManifestTable.commit(spark, dir,
      e.filter(pmod(col("event_id"), lit(1000)) === 0)
        .withColumn("event_id", col("event_id") + lit(2000000000L)),
      statsCols = Seq("ts"))
    // ...and the checkpointed consumer resumes, paying only its increment
    val tDrain2 = drainCdf()
    val nDrained2 = ManifestTable.read(spark, outTbl).count()
    val headRowsLate = ManifestTable.read(spark, dir).count()
    // OPTIMIZE: the declared manifest_delete_compact move — REPLACE from
    // read(), drops every delete entry
    val tOpt = secs {
      ManifestTable.commit(spark, dir,
        ManifestTable.read(spark, dir).repartition(8), replace = true,
        statsCols = Seq("ts"))
    }
    val (nVer0, nBatch0, nSide0) =
      (ManifestTable.versions(spark, dir).size, countFiles("data"),
        countFiles("_deletes"))
    val tExpire = secs { ManifestTable.expire(spark, dir, keepLast = 1) }
    val (nVer1, nBatch1, nSide1) =
      (ManifestTable.versions(spark, dir).size, countFiles("data"),
        countFiles("_deletes"))
    val headRows1 = ManifestTable.read(spark, dir).count()
    val joins = ManifestTable.read(spark, dir)
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    println(f"[morprof] sf=$sfDir rows=$headRows%d build=$tBuild%.1fs " +
      f"3xdeleteWhere=$tDel%.1fs upsertMor=$tMerge%.1fs " +
      f"changes=$tCdf%.1fs ($nChanges%d events) " +
      f"apply=$tApply%.1fs ($nLive%d live) scd2=$tScd2%.1fs " +
      f"($nIntervals%d intervals) " +
      f"cdfDrain=$tDrain1%.1fs ($nDrained1%d events, " +
      f"${(nDrained1 / math.max(tDrain1, 0.001)).toLong}%d ev/s) " +
      f"cdfResume=$tDrain2%.1fs (+${nDrained2 - nDrained1}%d events) " +
      f"optimize=$tOpt%.1fs " +
      f"expire=$tExpire%.2fs versions $nVer0%d->$nVer1%d " +
      f"batchDirs $nBatch0%d->$nBatch1%d sidecars $nSide0%d->$nSide1%d " +
      f"survivors=$headRows1%d (match=${headRows1 == headRowsLate}) " +
      f"headJoins=$joins%d")
    spark.stop()
  }
}
