package graft.queries

import org.apache.spark.sql.functions._
import graft.T
import graft.T.{Q, t}

/** SURVEY.md §2.11 — event-time operators written once, runnable in both
  * batch (declared here, oracle-checked) and Structured Streaming (same
  * expressions under readStream + MemoryStream in the test suite, with
  * watermarks / stateful dedup as capability tests).
  *
  * Window starts are emitted as epoch microseconds; both engines align
  * tumbling/sliding grids to the epoch so `date_trunc`/`time_bucket` agree.
  */
object Streams {
  import org.apache.spark.sql.DataFrame

  /** Write-once event-time transforms: valid on a batch DataFrame (declared
    * queries below) and on a readStream DataFrame (StreamingSpec). Results
    * are unordered — batch callers add their ORDER BY.
    */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("cnt"), col("sum_value"))

  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("cnt"), col("sum_value"))

  def session(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value"), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("ws_us"),
        unix_micros(col("session_window.end")).as("we_us"), col("cnt"), col("sum_value"))

  val queries: Map[String, Q] = Map(
    // 1-hour tumbling event-time windows per event_type
    "stream_tumbling" -> ((s, sf) =>
      tumbling(t(s, sf, "events")).orderBy("ws_us", "event_type")),

    // 1-hour windows sliding every 15 min (each event lands in 4 windows)
    "stream_sliding" -> ((s, sf) =>
      sliding(t(s, sf, "events")).orderBy("ws_us")),

    // data-driven session windows, 30-min gap, per user
    "stream_session" -> ((s, sf) =>
      session(t(s, sf, "events")).orderBy("user_id", "ws_us"))
  )

  val oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
         count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""",
    "stream_sliding" ->
      """SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(15*k)) AS ws_us,
         count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
         GROUP BY 1 ORDER BY ws_us""",
    "stream_session" ->
      """WITH g AS (SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           s2 AS (SELECT user_id, ts, value,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT user_id, min(epoch_us(ts)) AS ws_us,
                max(epoch_us(ts)) + 1800000000 AS we_us,
                count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s2 GROUP BY user_id, sid ORDER BY user_id, ws_us"""
  )
}
