package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming scaling probe (round 14, r13 verdict item 4) — dev tool, the
  * streaming sibling of [[Prof]]: drives the three stateful shapes the
  * declared stream_* queries rest on (watermarked keyed dedup, session
  * windows, the stream-stream interval join) through MemoryStream at a
  * parametric event count, and reports per-shape wall time, throughput,
  * micro-batch latency, and — the 100 TB survival metric — the state-store
  * row count's MAXIMUM across the run, which must track the watermark
  * horizon (keys-per-horizon), not the stream length.
  *
  * Usage: `sbt "runMain graft.StreamProf [nEvents] [nChunks]"` — run at
  * n and 10n for the scaling exponent; state flatness across n is the
  * bounded-state claim, wall-time linearity is the throughput claim.
  */
object StreamProf {

  private case class ShapeResult(name: String, events: Long, sec: Double,
      maxBatchSec: Double, maxState: Long, lastState: Long, rows: Long)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val chunks = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1704067200000L // 2024-01-01T00:00:00Z
    val perChunk = n / chunks
    // one chunk = one event-hour: 10× the events at the same chunk count =
    // 10× the per-horizon rate (state should scale ~10×); more CHUNKS at
    // the same per-chunk rate = a longer stream (state should stay flat)
    def chunkRows(c: Int): Seq[(Long, Timestamp, Long, String, Double)] =
      (0 until perChunk).map { i =>
        val evId = (c.toLong * perChunk + i)
        val t = new Timestamp(base + c * 3600000L + i.toLong * 3600000L / perChunk)
        (evId, t, evId % 997, if (i % 3 == 0) "purchase" else "view", 1.0)
      }

    def drive(name: String,
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        feed: (Seq[(Long, Timestamp, Long, String, Double)],
               MemoryStream[(Long, Timestamp, Long, String, Double)],
               MemoryStream[(Long, Timestamp, Long, String, Double)]) => Unit)
        : ShapeResult = {
      val msA = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val msB = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def df(ms: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = mk(df(msA)) // mk may also read msB via closure
      val sink = s"streamprof_$name"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      var maxState = 0L; var lastState = 0L; var maxBatch = 0.0
      val t0 = System.nanoTime()
      try {
        (0 until chunks).foreach { c =>
          val b0 = System.nanoTime()
          feed(chunkRows(c), msA, msB)
          q.processAllAvailable()
          maxBatch = math.max(maxBatch, (System.nanoTime() - b0) / 1e9)
          val so = q.lastProgress.stateOperators
          if (so.nonEmpty) {
            lastState = so.map(_.numRowsTotal).sum
            maxState = math.max(maxState, lastState)
          }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = spark.table(sink).count()
        ShapeResult(name, n.toLong, sec, maxBatch, maxState, lastState, rows)
      } finally q.stop()
    }

    // watermarked keyed dedup (stream_dedup's shape) — every event a new
    // key: the adversarial state load
    val dedup = drive("dedup",
      df => df.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("event_id"),
      (rows, msA, _) => { msA.addData(rows); () })

    // session windows (stream_session's shape), 997 concurrent users
    val session = drive("session",
      df => graft.queries.Streams.session(df.withWatermark("ts", "10 minutes")),
      (rows, msA, _) => { msA.addData(rows); () })

    // stream-stream interval join (stream_join's shape): views joined to
    // purchases of the same user within 10 minutes, both sides watermarked
    var msBRef: MemoryStream[(Long, Timestamp, Long, String, Double)] = null
    val join = {
      val msA = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val msB = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def df(ms: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = graft.queries.Streams.intervalJoin(
        df(msA).withWatermark("ts", "10 minutes"),
        df(msB).withWatermark("ts", "10 minutes"), "10 minutes")
      val q = out.writeStream.format("memory").queryName("streamprof_join")
        .outputMode("append").start()
      var maxState = 0L; var lastState = 0L; var maxBatch = 0.0
      val t0 = System.nanoTime()
      try {
        (0 until chunks).foreach { c =>
          val b0 = System.nanoTime()
          val rows = chunkRows(c)
          msA.addData(rows.filter(_._4 == "view"))
          msB.addData(rows.filter(_._4 == "purchase"))
          q.processAllAvailable()
          maxBatch = math.max(maxBatch, (System.nanoTime() - b0) / 1e9)
          val so = q.lastProgress.stateOperators
          if (so.nonEmpty) {
            lastState = so.map(_.numRowsTotal).sum
            maxState = math.max(maxState, lastState)
          }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = spark.table("streamprof_join").count()
        ShapeResult("join", n.toLong, sec, maxBatch, maxState, lastState, rows)
      } finally q.stop()
    }
    msBRef = null // silence unused warning path

    def r2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    Seq(dedup, session, join).foreach { r =>
      println(f"[streamprof] ${r.name}%-8s n=${r.events} chunks=$chunks " +
        f"sec=${r2(r.sec)} maxBatchSec=${r2(r.maxBatchSec)} " +
        f"evPerSec=${(r.events / r.sec).toLong} " +
        f"maxState=${r.maxState} lastState=${r.lastState} outRows=${r.rows}")
    }
    spark.stop()
  }
}
