package graft

import scala.collection.immutable.ListMap
import Qh._
import graft.ops.Windows

/** Streaming-window inventory, batch-verified against DuckDB (SURVEY.md
  * §2.2 rows `tumbling_window`/`sliding_window`/`session_window`).
  *
  * Oracle notes: DuckDB `time_bucket` and Spark `window` are both
  * epoch-aligned for minute-granularity widths (midnight-anchored origins
  * divide evenly), so bucket starts agree. A sliding window of width W and
  * step S=W/2 puts each event in exactly two buckets — expressed in SQL as
  * a two-arm UNION ALL. Session windows use the lag/cumsum gap-detection
  * idiom; Spark's `session_window` merges an event arriving at EXACTLY
  * gap after the previous one (verified empirically in
  * StreamingWindowSpec), so a new session starts only when the gap is
  * strictly greater — hence the `>` boundary.
  */
object QueriesWindows {

  val defs: ListMap[String, QueryDef] = ListMap(

    "tumbling_window" -> QueryDef(
      (s, d) => Windows.tumbling(t(s, d, "events"))
        .orderBy("bucket", "event_type"),
      s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket, event_type,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin),

    "sliding_window" -> QueryDef(
      (s, d) => Windows.sliding(t(s, d, "events"))
        .orderBy("bucket", "event_type"),
      s"""SELECT bucket, event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM (
         |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket, event_type, value FROM events
         |  UNION ALL
         |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type, value FROM events)
         |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin),

    "session_window" -> QueryDef(
      (s, d) => Windows.sessions(t(s, d, "events"))
        .orderBy("user_id", "session_start"),
      """WITH y AS (
        |  SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |z AS (
        |  SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts, COUNT(*) AS n
        |FROM z GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)
  )
}
