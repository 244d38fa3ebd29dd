package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column plus a typed metadata struct; decode /
  * feature-extraction runs as a typed partition-local pipeline.
  *
  * Two tiers:
  *  - q126/q127 are REAL decoders: BMP (24-bit uncompressed) and WAV
  *    (RIFF/PCM16) are pure byte layouts needing no codec library, so
  *    genuine files are generated, byte-level parsed (headers validated,
  *    row stride honored, RIFF chunks walked), and exact integer
  *    features are hash-checked against a closed-form oracle.
  *  - q50's decoder stays a clearly-marked DETERMINISTIC STUB standing
  *    in for compressed formats (JPEG/H.264) whose codecs this
  *    container doesn't ship. Everything around it — the binary column,
  *    the metadata struct schema, the Dataset[T] encoder, the
  *    per-partition batch shape — is the real plumbing a production
  *    decode (JNI into a codec, or `mapInPandas`) would plug into.
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

  // ==== REAL decoders =======================================================
  // The container ships no image/audio codec libraries, but two media
  // containers need none: BMP (24-bit uncompressed) and WAV (RIFF/PCM16)
  // are pure byte layouts. The gates below GENERATE genuine files whose
  // pixels/samples follow a closed-form formula of (doc_id, position),
  // push the real bytes through a byte-level parser (headers validated,
  // row padding honored, RIFF chunks walked), and the DuckDB oracle
  // RECOMPUTES the expected features from the formula — a decoder that
  // misreads any offset, stride or sign hash-mismatches immediately.
  // Exact integer features (pixel/abs-sample sums), no float rounding.

  /** One real 24-bit BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
    * pixel array with 4-byte row padding. Channel value at (x, y):
    * `(7x + 13y + docId) % 256` in all three channels. */
  def bmpBytes(docId: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + dataSize) // file size
    out.putInt(0)             // reserved
    out.putInt(54)            // pixel-array offset
    out.putInt(40)            // BITMAPINFOHEADER size
    out.putInt(w).putInt(h)
    out.putShort(1)           // planes
    out.putShort(24)          // bpp
    out.putInt(0)             // BI_RGB (uncompressed)
    out.putInt(dataSize)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up storage, like the real format
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = ((7 * x + 13 * y + docId) % 256).toByte
        out.put(v).put(v).put(v)
        x += 1
      }
      var pad = rowSize - 3 * w
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  case class BmpFeatures(doc_id: Long, width: Int, height: Int, bpp: Int,
      channel_sum: Long)

  /** REAL BMP parse: validates the magic, follows the header's own pixel
    * offset, honors the 4-byte row stride. Throws on malformed input —
    * a decoder, not a length heuristic. */
  def decodeBmp(docId: Long, bytes: Array[Byte]): BmpFeatures = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bb.get(0) == 'B' && bb.get(1) == 'M', "not a BMP")
    val pixelOff = bb.getInt(10)
    val w = bb.getInt(18)
    val rawH = bb.getInt(22)
    // negative biHeight is a LEGAL top-down BMP (rows stored first-to-
    // last); the channel sum is orientation-invariant so both store
    // orders decode identically. Guard Int.MinValue (|h| overflows) and
    // non-positive width loudly instead of a vacuous bounds check — a
    // negative rowSize*h product used to sail through `require(... <=
    // length)` and return a silent channel_sum=0.
    require(rawH != 0 && rawH != Int.MinValue && w > 0,
      s"malformed BMP dimensions ${w}x$rawH")
    val h = math.abs(rawH)
    val bpp = bb.getShort(28).toInt
    require(bpp == 24 && bb.getInt(30) == 0, s"unsupported BMP variant bpp=$bpp")
    val rowSize = ((3L * w + 3) / 4) * 4 // long math: 4-byte stride, no int wrap
    require(pixelOff >= 54 && pixelOff + rowSize * h <= bytes.length,
      "truncated pixel array")
    var sum = 0L
    var y = 0
    while (y < h) {
      val base = pixelOff + y * rowSize.toInt
      var i = 0
      while (i < 3 * w) { sum += bytes(base + i) & 0xff; i += 1 }
      y += 1
    }
    BmpFeatures(docId, w, rawH, bpp, sum)
  }

  // ---- q126: REAL BMP encode -> decode -> exact pixel-sum oracle -----------
  private val q126: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .map { id =>
        MediaRow(id, bmpBytes(id, (id % 13).toInt + 4, (id % 9).toInt + 4))
      }
    media.mapPartitions(_.map(m => decodeBmp(m.doc_id, m.media)))
      .toDF()
      .orderBy(col("doc_id"))
  }
  private val q126Sql =
    """WITH d AS (
      |  SELECT doc_id, CAST(doc_id % 13 + 4 AS INT) AS w,
      |         CAST(doc_id % 9 + 4 AS INT) AS h
      |  FROM documents),
      |p1 AS (SELECT doc_id, w, h,
      |         unnest(generate_series(0, w - 1)) AS x FROM d),
      |p2 AS (SELECT doc_id, w, h, x,
      |         unnest(generate_series(0, h - 1)) AS y FROM p1)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  24 AS bpp,
      |  CAST(3 * sum((7 * x + 13 * y + doc_id) % 256) AS BIGINT) AS channel_sum
      |FROM p2
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin

  /** One real PCM16 mono WAV: RIFF header, `fmt ` chunk, `data` chunk.
    * Sample i: `((31*docId + 17*i) % 65536) - 32768`. */
  def wavBytes(docId: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val dataSize = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
    out.putShort(1)          // PCM
    out.putShort(1)          // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byte rate
    out.putShort(2)          // block align
    out.putShort(16)         // bits per sample
    out.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      out.putShort((((31 * docId + 17 * i) % 65536) - 32768).toShort)
      i += 1
    }
    out.array()
  }

  case class WavFeatures(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_samples: Long, abs_sum: Long)

  /** REAL RIFF/WAV parse: walks chunks to find `fmt ` and `data` (order
    * not assumed), validates PCM16, decodes little-endian samples. */
  def decodeWav(docId: Long, bytes: Array[Byte]): WavFeatures = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a WAV")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val len = bb.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(bb.getShort(off + 8) == 1, "not PCM")
          channels = bb.getShort(off + 10).toInt
          rate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22).toInt
        case "data" => dataOff = off + 8; dataLen = len
        case _ => // skip unknown chunks, like a real reader
      }
      off += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    require(rate > 0 && dataOff >= 0 && bits == 16, "missing fmt/data or not 16-bit")
    val n = dataLen / 2
    var sum = 0L
    var i = 0
    while (i < n) { sum += math.abs(bb.getShort(dataOff + i * 2).toLong); i += 1 }
    WavFeatures(docId, rate, channels, bits, n, sum)
  }

  // ---- q127: REAL WAV encode -> decode -> exact abs-sample-sum oracle ------
  private val q127: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, wavBytes(id, (id % 50).toInt + 20)))
    media.mapPartitions(_.map(m => decodeWav(m.doc_id, m.media)))
      .toDF()
      .orderBy(col("doc_id"))
  }
  private val q127Sql =
    """WITH d AS (
      |  SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n FROM documents),
      |s AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d)
      |SELECT doc_id, 16000 AS sample_rate, 1 AS channels, 16 AS bits,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(sum(abs(((31 * doc_id + 17 * i) % 65536) - 32768)) AS BIGINT) AS abs_sum
      |FROM s
      |GROUP BY doc_id, n
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q50_media_decode" -> q50,
    "q51_media_metadata" -> q51,
    "q52_frame_sample" -> q52,
    "q53_resize_plan" -> q53,
    "q126_bmp_decode" -> q126,
    "q127_wav_decode" -> q127)

  val oracle: Map[String, String] = Map(
    "q50_media_decode" -> q50Sql,
    "q51_media_metadata" -> q51Sql,
    "q52_frame_sample" -> q52Sql,
    "q53_resize_plan" -> q53Sql,
    "q126_bmp_decode" -> q126Sql,
    "q127_wav_decode" -> q127Sql)
}
