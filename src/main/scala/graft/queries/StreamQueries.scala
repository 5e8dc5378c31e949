package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams
import graft.util.OracleSafe._

/** Structured Streaming operators driven synchronously through the memory
  * sink so they pass the same DuckDB-oracle gate as batch queries. The
  * events parquet arrives as one micro-batch; multi-batch semantics
  * (watermark lateness, cross-batch state) are covered in StreamingSpec.
  */
object StreamQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- watermarked tumbling window over the stream ----
    QueryDef("q41_stream_tumbling_hourly",
      (s, dir) => Streams.runToTable(
          Streams.tumblingHourly(Streams.eventsStream(s, dir)),
          "q41_sink", OutputMode.Complete())
        .orderBy("hour", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |${sqlDsum("value")} AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin)),

    // ---- streaming dedup ----
    QueryDef("q42_stream_dedup_counts",
      (s, dir) => Streams.runToTable(
          Streams.dedupCounts(Streams.eventsStream(s, dir)),
          "q42_sink", OutputMode.Complete())
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- custom cross-batch state: per-user session summaries ----
    QueryDef("q43_stream_user_sessions",
      (s, dir) => Streams.runToTable(
          Streams.userSessions(Streams.eventsStream(s, dir)).toDF(),
          "q43_sink", OutputMode.Append())
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          timestamp_micros(col("first_ts_us")).as("first_ts"),
          timestamp_micros(col("last_ts_us")).as("last_ts"))
        .orderBy("user_id"),
      Some("""WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts, 1) OVER w IS NULL
        |           OR epoch(ts) - epoch(LAG(ts, 1) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
        |FROM flagged
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin))
  )
}
