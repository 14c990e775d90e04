package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool (round 16, r15 verdict item 5): stage-split profile of the
  * `stream_manifest_source` bench cost — the r15 bench line tripled
  * (0.62 → 2.06 s) and nobody measured which stage owns the constant.
  * Times, separately and twice:
  *   1. staging  — the 3 manifest commits of the events table (one-time
  *                 bench fixture cost, NOT source overhead);
  *   2. drain    — the AvailableNow produce→stream→TxnSink loop, with the
  *                 engine's own per-batch durationMs breakdown
  *                 (addBatch / triggerExecution / latestOffset);
  *   3. readback — the sink-table aggregate.
  * Usage: `sbt "runMain graft.MsrcProf <sfDir>"`.
  */
object MsrcProf {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (rep <- 1 to 2) {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-msrcprof-$rep").toString
      val (srcTbl, outTbl, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
      val e = T.t(spark, sf, "events")
      val (_, tStage) = time {
        (0 to 2).foreach { r =>
          graft.operators.ManifestTable.commit(spark, srcTbl,
            e.filter(pmod(col("event_id"), lit(3)) === r))
        }
      }
      val (progress, tDrain) = time {
        val q = spark.readStream
          .format(classOf[graft.streaming.ManifestTableProvider].getName)
          .option("path", srcTbl).load()
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            graft.streaming.TxnSink.commitBatch(outTbl, b, id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.toSeq
      }
      val (_, tRead) = time {
        graft.operators.ManifestTable.read(spark, outTbl)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            T.dsum(col("value"), 2).as("sum_value"))
          .orderBy("event_type").collect()
      }
      println(f"[msrcprof] rep=$rep stage=$tStage%.2f drain=$tDrain%.2f " +
        f"readback=$tRead%.2f total=${tStage + tDrain + tRead}%.2f")
      progress.foreach { p =>
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
        println(s"[msrcprof]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${ms("triggerExecution")} addBatchMs=${ms("addBatch")} " +
          s"latestOffsetMs=${ms("latestOffset")} queryPlanningMs=${ms("queryPlanning")}")
      }
    }
    spark.stop()
  }
}
