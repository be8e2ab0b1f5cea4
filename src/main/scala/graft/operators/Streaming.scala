package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch-checkable forms of the streaming operators (SURVEY §2.6
  * Q-stream-*): the same window expressions the streaming builders in
  * [[graft.streaming.EventStreams]] use, run over the bounded `events`
  * table so DuckDB can oracle-check the window algebra. Watermark/
  * late-data *behavior* has no SQL oracle and is pinned by
  * StreamingSpec with MemoryStream feeds.
  *
  * Scale posture: event-time windows group on (window, keys) — the
  * shuffle key space is bounded by time range, not row count; session
  * windows shuffle on user_id. Skewed users would take salting on the
  * groupBy prefix; AQE's skew handling covers the join side.
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour windows (window.start == date_trunc hour).
    "q_stream_window_hour" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("window.start").as("ws"), col("n"), col("total"))
        .orderBy(col("ws"))),

    // Sliding 1-hour windows every 30 minutes: each event lands in
    // exactly two windows.
    "q_stream_window_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
        .orderBy(col("ws"))),

    // Session windows per user, 30-minute gap (gaps-and-islands).
    "q_stream_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("total"))
        .orderBy(col("user_id"), col("session_start")))
  )

  val oracles: Map[String, String] = Map(
    "q_stream_window_hour" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY ws""".stripMargin,

    "q_stream_window_sliding" ->
      """SELECT ws, count(*) AS n FROM (
        | SELECT unnest([
        |   CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP),
        |   CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP)
        | ]) AS ws
        | FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,

    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        | round(sum(value), 2) AS total
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin
  )
}
