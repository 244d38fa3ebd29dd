package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column plus a typed metadata struct; decode /
  * feature-extraction runs as a typed partition-local pipeline.
  *
  * The container has no image/audio codecs, so the decoder below is a
  * clearly-marked DETERMINISTIC STUB (it derives fake dimensions from the
  * byte length). Everything around it — the binary column, the metadata
  * struct schema, the Dataset[T] encoder, the per-partition batch shape —
  * is the real plumbing a production decode (e.g. JNI into a codec, or
  * `mapInPandas` from PySpark) would plug into.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Raw "media" record: id + opaque bytes (what a real pipeline reads
    * from object storage). */
  case class MediaRow(doc_id: Long, media: Array[Byte])
  /** Extracted features; `width`/`height` come from the stub decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, n_frames: Int, mode: String)

  /** STUB decoder: a real implementation would parse the container format
    * here (libjpeg/ffmpeg/...). Deterministic on the byte content so the
    * pipeline stays oracle-checkable. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val n = m.media.length.toLong
    val width = (n % 64L).toInt + 1
    val height = (n % 48L).toInt + 1
    val frames = (n % 8L).toInt + 1
    val mode = if (n % 2L == 0L) "rgb" else "gray"
    MediaFeatures(m.doc_id, n, width, height, frames, mode)
  }

  // ---- q50: binary media column -> per-partition decode -> features -------
  private val q50: Q = (s, d) => {
    import s.implicits._
    // Fake media bytes: utf-8 of the text column stands in for image bytes.
    val media = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
    // mapPartitions = the batch shape of a real decoder (amortizes codec
    // init per partition, the same contract mapInPandas gives in PySpark).
    media.mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }
  private val q50Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
      |  CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS height,
      |  CAST(octet_length(encode(text)) % 8 + 1 AS INT) AS n_frames,
      |  CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'rgb' ELSE 'gray' END AS mode
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q51: media metadata aggregation (mixed binary + struct columns) ----
  private val q51: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("media", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        octet_length(col("media")).as("n_bytes"),
        col("source").as("origin"),
        lit("image/fake").as("mime")))
      .groupBy(col("meta.origin").as("origin"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.n_bytes").cast("long")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
      .orderBy(col("origin"))
  }
  private val q51Sql =
    """SELECT source AS origin, count(*) AS n_media,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(max(octet_length(encode(text))) AS INT) AS max_bytes
      |FROM documents
      |GROUP BY source
      |ORDER BY origin""".stripMargin

  // ---- q52: frame sampling (video-style explode + per-frame features) -----
  // A video pipeline shape: one row per sampled frame via explode, then a
  // per-frame feature (here a hash — the stub for a real frame embedding),
  // re-aggregated per media item. Frame count comes from the stub decoder.
  private val q52: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("nb", octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .withColumn("n_frames", (col("nb") % 8 + 1).cast("int"))
      .withColumn("mode", when(col("nb") % 2 === 0, "rgb").otherwise("gray"))
      .select(col("doc_id"), col("mode"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_sig",
        md5(encode(concat(col("doc_id").cast("string"), lit("-"),
          col("frame_idx").cast("string")), "UTF-8")))
      .groupBy(col("mode"))
      .agg(
        count(lit(1)).as("n_frames_total"),
        countDistinct(col("doc_id")).as("n_media"),
        countDistinct(col("frame_sig")).as("n_distinct_sigs"))
      .orderBy(col("mode"))
  }
  private val q52Sql =
    """WITH m AS (
      |  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN nb % 2 = 0 THEN 'rgb' ELSE 'gray' END AS mode,
      |    unnest(generate_series(0, CAST(nb % 8 AS INT))) AS frame_idx
      |  FROM m)
      |SELECT mode, count(*) AS n_frames_total,
      |  count(DISTINCT doc_id) AS n_media,
      |  count(DISTINCT md5(CAST(doc_id AS VARCHAR) || '-' || CAST(frame_idx AS VARCHAR))) AS n_distinct_sigs
      |FROM f
      |GROUP BY mode
      |ORDER BY mode""".stripMargin

  // ---- q53: resize planning (aspect-preserving thumbnail dims) -------------
  // The resize step of an image pipeline: target box 32x32, preserve
  // aspect ratio, never upscale. Pure arithmetic on the stub decoder's
  // dimensions — the real pixel work would slot into the same
  // mapPartitions stage as q50's decoder.
  private val q53: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("nb", octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .withColumn("w", (col("nb") % 64 + 1).cast("int"))
      .withColumn("h", (col("nb") % 48 + 1).cast("int"))
      .withColumn("scale", least(lit(1.0), lit(32.0) / greatest(col("w"), col("h"))))
      .withColumn("out_w", greatest(lit(1), floor(col("w") * col("scale")).cast("int")))
      .withColumn("out_h", greatest(lit(1), floor(col("h") * col("scale")).cast("int")))
      .groupBy(col("out_w"), col("out_h"))
      .agg(count(lit(1)).as("n_images"))
      .orderBy(col("out_w"), col("out_h"))
  }
  private val q53Sql =
    """WITH m AS (
      |  SELECT CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS w,
      |         CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS h
      |  FROM documents),
      |r AS (
      |  SELECT w, h, least(1.0, 32.0 / greatest(w, h)) AS scale FROM m)
      |SELECT greatest(1, CAST(floor(w * scale) AS INT)) AS out_w,
      |       greatest(1, CAST(floor(h * scale) AS INT)) AS out_h,
      |       count(*) AS n_images
      |FROM r
      |GROUP BY 1, 2
      |ORDER BY out_w, out_h""".stripMargin

  val queries: Map[String, Q] = Map(
    "q50_media_decode" -> q50,
    "q51_media_metadata" -> q51,
    "q52_frame_sample" -> q52,
    "q53_resize_plan" -> q53)

  val oracle: Map[String, String] = Map(
    "q50_media_decode" -> q50Sql,
    "q51_media_metadata" -> q51Sql,
    "q52_frame_sample" -> q52Sql,
    "q53_resize_plan" -> q53Sql)
}
