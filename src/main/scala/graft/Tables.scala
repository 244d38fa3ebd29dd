package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory explicitly so the same code
  * runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench). At cluster
  * scale the same loaders would point at a distributed store; nothing here
  * assumes local files beyond the path string.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as a nanos-since-epoch long
    * (legacy conf) and truncate to a micros TIMESTAMP — same convention
    * as Spark's own Parquet nanos handling everywhere else. */
  def events(s: SparkSession, d: String): DataFrame = normalizeEventTs(eventsRaw(s, d))

  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** The driver has shipped `events.ts` in two shapes over time:
    * TIMESTAMP(NANOS) (read as nanos-since-epoch long under the legacy
    * conf) and plain TIMESTAMP_NTZ. Normalize both to a session-tz
    * TIMESTAMP; every harness pins the session tz to UTC, so the NTZ
    * cast preserves the instant and downstream `cast(ts as long)` /
    * `withWatermark("ts", …)` stay legal. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  /** Streaming source over events with the same ts normalization. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    val rawSchema: StructType = eventsRaw(s, d).schema
    // FileStreamSource needs a directory or glob (a literal file path makes
    // basePath inference fail); the glob matches exactly events.parquet.
    normalizeEventTs(s.readStream.schema(rawSchema).parquet(s"$d/events.parque[t]"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
