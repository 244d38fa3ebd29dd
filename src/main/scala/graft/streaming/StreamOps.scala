package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` table.
  *
  * The same windowed aggregation is exposed twice:
  *  - q60: batch execution (oracle-checkable against DuckDB time_bucket).
  *  - q61: true streaming execution — readStream over the parquet file,
  *    watermark + tumbling window, memory sink drained synchronously.
  *    Same oracle SQL as q60: streaming and batch must agree.
  *
  * Scale: tumbling-window counts aggregate by (window, type) — partial
  * aggregation map-side, then a shuffle of window keys only. Watermark
  * bounds state; at 100 TB/day the state store holds one window's keys.
  */
object StreamOps {

  type Q = (SparkSession, String) => DataFrame

  private def windowedAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      // NTZ on the way out: the oracle's time_bucket is tz-naive, and a
      // tz-aware parquet column would compare unequal in the driver.
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  // ---- q60: windowed aggregation, batch mode ------------------------------
  private val q60: Q = (s, d) =>
    windowedAgg(Tables.events(s, d)).orderBy(col("window_start"), col("event_type"))

  private val q60Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |  count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  // ---- q61: the same aggregation through a real streaming query -----------
  private val q61: Q = (s, d) => {
    val src = Tables.eventsStream(s, d)
    val agg = windowedAgg(src.withWatermark("ts", "2 hours"))
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name).orderBy(col("window_start"), col("event_type"))
  }

  // ---- q62: session windows (gap-based) on the streaming table, batch -----
  private val q62: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }
  // Oracle: gap-based sessionization expressed with window functions —
  // identical semantics to session_window(ts, 30 min).
  private val q62Sql =
    """WITH t AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
      |           OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |sess AS (
      |  SELECT user_id,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM t),
      |per_sess AS (
      |  SELECT user_id, sess_id, count(*) AS n_events
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events,
      |  max(n_events) AS max_session_events
      |FROM per_sess
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q60_window_agg" -> q60,
    "q61_stream_window" -> q61,
    "q62_session_window" -> q62)

  val oracle: Map[String, String] = Map(
    "q60_window_agg" -> q60Sql,
    "q61_stream_window" -> q60Sql,
    "q62_session_window" -> q62Sql)
}
