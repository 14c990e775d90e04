package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual declared queries (cold + repeat) to separate
  * real query cost from JVM/session warmup and run-to-run noise — and
  * report each run's SHUFFLE traffic and spill, because at 100 TB the
  * shuffle bytes are the cost model: two queries with equal local wall
  * time but 10× different shuffle volume scale completely differently.
  * Usage: runMain graft.Prof <sfDir> <reps> <query> [query ...]
  */
object Prof {

  /** Accumulates stage-level shuffle/spill totals off the listener bus.
    * Listener delivery is asynchronous; [[Prof.main]] sleeps briefly after
    * each action before reading a delta — fine for a dev tool's ±KB
    * accuracy, not for exact accounting.
    */
  private final class StageMetrics extends SparkListener {
    val sw = new java.util.concurrent.atomic.AtomicLong
    val sr = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.diskBytesSpilled)
        stages.incrementAndGet()
      }
    }
    def snap(): Array[Long] = Array(sw.get, sr.get, spill.get, stages.get)
  }

  private def mb(bytes: Long): String = f"${bytes / 1048576.0}%.1fMB"

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "32m"))
      // scan-parallelism floor, same contract as Bench (r18)
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SCAN_PARTS",
          (2 * cpus.toInt).toString))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "131072"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)
    Bench.warmup(spark, sfDir)
    names.foreach { n =>
      val runs = (1 to reps).map { _ =>
        Thread.sleep(300) // let the listener bus drain the previous run
        val before = metrics.snap()
        val t0 = System.nanoTime()
        // noop-sink forcing — same contract as Bench (count() lets the
        // optimizer prune columns and collapse global-agg finals)
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        Thread.sleep(300)
        val after = metrics.snap()
        (sec, after.zip(before).map { case (a, b) => a - b })
      }
      val times = runs.map(_._1).map(t => f"$t%.2f").mkString(" ")
      val d = runs.last._2 // steady-state rep: caches warm, codegen done
      println(f"[prof] $n%-22s $times  shufW=${mb(d(0))} shufR=${mb(d(1))} " +
        f"spill=${mb(d(2))} stages=${d(3)}")
    }
    spark.stop()
  }
}
