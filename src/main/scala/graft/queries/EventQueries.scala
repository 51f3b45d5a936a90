package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Event-time windowing over the `events` table — SURVEY.md §2.2
  * "Streaming" ([E]; the reference itself has no streams).
  *
  * These are the BATCH twins of the Structured Streaming jobs in
  * `graft.streaming.EventStreams`: identical `window`/`session_window`
  * expressions run over `readStream` there, and the ScalaTest suite
  * asserts stream-vs-batch agreement on closed windows (watermark
  * semantics have no DuckDB oracle — SURVEY.md §5).
  *
  * Scale notes: event-time windows shuffle on (window, key) — at 100 TB
  * the streaming form keys state by (user, window) in the state store and
  * the watermark bounds state size; the batch form below is a plain hash
  * aggregate. Session windows merge per-key, so skewed users are the risk
  * — mitigated by AQE skew-split in batch, state TTL in streaming.
  */
object EventQueries {

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  val defs: Map[String, Q] = Map(
    // Tumbling 15-minute windows per event type.
    "q_window_tumbling" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(fmt(col("w.start")).as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // Sliding windows: 30-minute width, 15-minute slide.
    "q_window_sliding" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(fmt(col("w.start")).as("w_start"), col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    }),

    // Session windows: 5-minute inactivity gap per user.
    "q_window_session" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), fmt(col("w.start")).as("sess_start"),
          fmt(col("w.end")).as("sess_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("sess_start"))
    }),

    // Stateful-dedup batch twin: first event per (user, type), explicit
    // order — mirrors dropDuplicatesWithinWatermark keyed semantics.
    "q_event_dedup_first" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(
          min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
          fmt(min(col("ts"))).as("first_ts"),
          count(lit(1)).as("n_total"))
        .orderBy(col("user_id"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_tumbling" ->
      s"""SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q_window_sliding" ->
      s"""WITH e AS (
         |  SELECT unnest([time_bucket(INTERVAL '15 minutes', ts),
         |                 time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes']) AS w_start,
         |         value
         |  FROM events)
         |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM e GROUP BY 1 ORDER BY w_start""".stripMargin,

    "q_window_session" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              >= INTERVAL '5 minutes' OR
         |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM marked)
         |SELECT user_id,
         |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
         |  strftime(MAX(ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS sess_end,
         |  COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM sess GROUP BY user_id, sess_id
         |ORDER BY user_id, sess_start""".stripMargin,

    "q_event_dedup_first" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type,
        |  MAX(CASE WHEN rn = 1 THEN event_id END) AS first_event_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |  COUNT(*) AS n_total
        |FROM r GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin
  )
}
