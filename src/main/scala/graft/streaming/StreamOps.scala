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
// top-level so Spark's generated encoder code can reach them
case class Ev(user_id: Long, tsSec: Long)
case class Sess(user_id: Long, n_sessions: Long, n_events: Long)

object StreamOps {

  type Q = (SparkSession, String) => DataFrame

  /** State partitions are fixed at stream start from shuffle.partitions;
    * size them to the stream's key volume, not the batch default — every
    * partition costs a state store instance per operator. At a real
    * 100 TB/day feed this would be hundreds; for the test streams it's 8.
    * Restores the session conf afterwards. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

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

  /** Drain a streaming frame into a uniquely-named in-memory sink and
    * return the sink table — the shared run pattern of every memory-sink
    * gate (one implementation; four hand-copies drifted before). The
    * sink's temp view lives for the session: the returned frame reads it
    * LAZILY, so dropping it here would empty the gate's result. */
  private def runToMemory(s: SparkSession, df: DataFrame, mode: String,
      checkpoint: Option[String] = None): DataFrame = {
    val name = s"graft_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val w0 = df.writeStream.outputMode(mode).format("memory").queryName(name)
    val q = checkpoint.fold(w0)(ck => w0.option("checkpointLocation", ck)).start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name)
  }

  // ---- q61: the same aggregation through a real streaming query -----------
  private val q61: Q = (s, d) => withStatePartitions(s, 8) {
    val src = Tables.eventsStream(s, d)
    val agg = windowedAgg(src.withWatermark("ts", "2 hours"))
    runToMemory(s, agg, "complete").orderBy(col("window_start"), col("event_type"))
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
      |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
      |  max(n_events) AS max_session_events
      |FROM per_sess
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q63: stateful sessionization via mapGroupsWithState -----------------
  // KeyValueGroupedDataset.mapGroupsWithState — the custom-state surface.
  // Batch execution here (state lives within the single invocation);
  // the same function runs unchanged on a stream with a timeout.
  private val q63: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val evs = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("long").as("tsSec")).as[Ev]
    evs.groupByKey(_.user_id)
      .mapGroupsWithState[Long, Sess](GroupStateTimeout.NoTimeout) {
        case (uid, it, _) =>
          val ts = it.map(_.tsSec).toArray
          java.util.Arrays.sort(ts)
          var sessions = 0L
          var prev = Long.MinValue
          ts.foreach { t =>
            if (prev == Long.MinValue || t - prev > 1800) sessions += 1
            prev = t
          }
          Sess(uid, sessions, ts.length.toLong)
      }
      .toDF()
      .orderBy(col("user_id"))
  }
  private val q63Sql =
    """WITH t AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER (
      |          PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)) AS gap
      |  FROM events)
      |SELECT user_id,
      |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM t
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q64: streaming pipeline into the graft sink -------------------------
  // readStream(events) → transform → writeStream format("graft") → read the
  // graft files back and aggregate. Exercises the DSv2 STREAMING_WRITE
  // path end-to-end; the oracle runs on the original parquet.
  private val q64: Q = (s, d) => withStatePartitions(s, 8) {
    val outDir = s"/tmp/graft_gate/${d.replaceAll("[^A-Za-z0-9.]", "_")}/stream_sink"
    val ckDir = outDir + "_ck"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckDir))
    val src = Tables.eventsStream(s, d)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val q = src.writeStream
      .format("graft")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.format("graft").load(outDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_type"))
  }
  private val q64Sql =
    """SELECT event_type, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  round(sum(value), 4) AS sum_value
      |FROM events
      |WHERE event_type IN ('click', 'view', 'purchase')
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q65: graft as the streaming SOURCE ----------------------------------
  // Batch-write events into graft, then stream them back out of the graft
  // micro-batch source into a windowed aggregation. Oracle runs on the
  // original parquet: proves source fidelity end-to-end.
  private val q65: Q = (s, d) => withStatePartitions(s, 8) {
    val base = s"/tmp/graft_gate/${d.replaceAll("[^A-Za-z0-9.]", "_")}"
    val srcDir = s"$base/events_graft"
    val ckDir = s"$base/events_graft_ck"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckDir))
    Tables.events(s, d).write.format("graft").mode("overwrite").save(srcDir)
    val stream = s.readStream.format("graft").load(srcDir)
    val agg = windowedAgg(stream.withWatermark("ts", "2 hours"))
    runToMemory(s, agg, "complete", Some(ckDir))
      .orderBy(col("window_start"), col("event_type"))
  }

  // ---- q66: stream-stream join (clicks ⋈ purchases within 1 hour) ---------
  // Two watermarked streams joined on key + time range — the stateful
  // join surface. Watermarks bound both join states; at scale the state
  // store holds one hour of clicks per user, not the stream's history.
  // The joined pairs land in a memory sink (append mode, the only mode a
  // stream-stream join supports) and are aggregated batch-side for a
  // deterministic oracle-checkable result.
  private val q66: Q = (s, d) => withStatePartitions(s, 8) {
    val clicks = Tables.eventsStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
      .withWatermark("cts", "2 hours")
    val purchases = Tables.eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"), col("value"))
      .withWatermark("pts", "2 hours")
    val joined = clicks.join(purchases,
      expr("user_id = p_user AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR"))
    runToMemory(s, joined, "append")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), round(sum(col("value")), 4).as("attributed_value"))
      .orderBy(col("user_id"))
  }
  private val q66Sql =
    """WITH c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id AS p_user, ts AS pts, value FROM events WHERE event_type = 'purchase')
      |SELECT user_id, count(*) AS n_pairs, round(sum(value), 4) AS attributed_value
      |FROM c JOIN p ON user_id = p_user AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q67: streaming deduplication (stateful dropDuplicates) --------------
  // Ingest-time dedup: first arrival per (user_id, event_type) wins.
  // State honesty: with the event-time column EXCLUDED from the dedup
  // keys, Spark never watermark-expires this state — that is the point,
  // not an oversight: the gate's semantics are EXACT global uniqueness
  // (the oracle is a plain COUNT(DISTINCT)), so every key ever seen must
  // stay remembered. The state store therefore grows with the DISTINCT
  // KEY CARDINALITY (|users| × |event types|), not with stream length —
  // bounded and modest for an entity-keyed feed like this one. A feed
  // whose key space itself is unbounded (e.g. event ids) must trade
  // exactness for expiry: dropDuplicatesWithinWatermark bounds state to
  // the watermark window but re-emits a duplicate arriving after its
  // original expired, which would break this gate's exact oracle.
  // Count-distinct is arrival-order-independent, so the batch oracle
  // matches exactly.
  private val q67: Q = (s, d) => withStatePartitions(s, 8) {
    val src = Tables.eventsStream(s, d)
      .withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")
    runToMemory(s, src, "append")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique_users"))
      .orderBy(col("event_type"))
  }
  private val q67Sql =
    """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q68: streaming CDC apply (foreachBatch → keyed upsert) ---------------
  // The change-data-capture shape: a batch-loaded base table, a stream of
  // keyed updates, and foreachBatch applying each micro-batch through
  // FormatOps.upsert — one copy-on-write generation per apply, atomic for
  // concurrent readers, history VERSION AS OF-addressable. event_id is
  // unique in the stream, so the final state is batch-boundary-invariant
  // and the parquet oracle can state it exactly. At 100 TB you'd widen
  // the trigger so each apply amortizes the rewrite; the apply itself is
  // one anti-join shuffle of the (small) batch against the table.
  private val q68: Q = (s, d) => withStatePartitions(s, 8) {
    val base = s"/tmp/graft_gate/${d.replaceAll("[^A-Za-z0-9.]", "_")}"
    val dir = s"$base/events_cdc"
    val ck = s"$base/events_cdc_ck"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val cdc = Tables.eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("value") * 2.0).as("value"))
    val q = cdc.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.FormatOps.upsert(
          batch.sparkSession, dir, "data", batch, keys = Seq("event_id"))
      }
      .option("checkpointLocation", ck)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.format("graft").load(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_type"))
  }
  private val q68Sql =
    """SELECT event_type, count(*) AS n,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END), 4)
      |    AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q68_stream_cdc_upsert" -> q68,
    "q67_stream_dedup" -> q67,
    "q66_stream_stream_join" -> q66,
    "q65_graft_stream_source" -> q65,
    "q60_window_agg" -> q60,
    "q61_stream_window" -> q61,
    "q62_session_window" -> q62,
    "q63_stateful_sessions" -> q63,
    "q64_graft_stream_sink" -> q64)

  val oracle: Map[String, String] = Map(
    "q68_stream_cdc_upsert" -> q68Sql,
    "q67_stream_dedup" -> q67Sql,
    "q66_stream_stream_join" -> q66Sql,
    "q65_graft_stream_source" -> q60Sql,
    "q60_window_agg" -> q60Sql,
    "q61_stream_window" -> q60Sql,
    "q62_session_window" -> q62Sql,
    "q63_stateful_sessions" -> q63Sql,
    "q64_graft_stream_sink" -> q64Sql)
}
