package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.apache.spark.sql.types._

/** Round-10 regressions for the round-9 advice findings:
  *  - mode-0 key sketches (BINARY / floating keys) must count distinct
  *    by SQL equality, so upsert's rows>distinct duplicate-key admission
  *    check fires for them (identity-hashed Array[Byte] made every row
  *    "distinct" and duplicate batches were silently admitted);
  *  - float/double zone-map compares must treat -0.0 = 0.0 like Spark's
  *    own SQLOrderingUtil, or a [-0.0,-0.0] chunk wrongly skips
  *    EqualTo(col, 0.0);
  *  - `_commit_version` comes from a dedicated monotonic counter a
  *    `restore` never rewinds (the old generation-pointer stamp re-issued
  *    versions after a restore, letting a stale delete beat a later
  *    insert in the CDC fold);
  *  - hostile PNG IHDR dimensions must refuse cleanly, not overflow the
  *    size guard into a NegativeArraySizeException.
  */
class AdviceRegressionSpec extends SparkSpec {

  test("binary single-key upsert refuses duplicate keys (sketch counts by value)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advice-bin-dup").toString
    Seq((Array[Byte](1, 2), 10), (Array[Byte](3, 4), 20)).toDF("k", "v")
      .write.format("graft").option("table", "t").mode("append").save(dir)
    val dup = Seq((Array[Byte](9, 9), 1), (Array[Byte](9, 9), 2)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.FormatOps.upsert(s, dir, "t", dup, Seq("k"))
    }
    assert(e.getMessage.contains("multiple rows for key"))
    // and a clean batch still lands
    graft.operators.FormatOps.upsert(s, dir, "t",
      Seq((Array[Byte](1, 2), 99)).toDF("k", "v"), Seq("k"))
    val got = s.read.format("graft").option("table", "t").load(dir)
      .filter(col("k") === lit(Array[Byte](1, 2))).select("v").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(99))
  }

  test("double single-key upsert treats -0.0 and 0.0 as ONE key (SQL equality)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advice-zero-dup").toString
    Seq((1.5d, 1)).toDF("k", "v")
      .write.format("graft").option("table", "t").mode("append").save(dir)
    // Spark groups -0.0 with 0.0: two rows, one SQL key — ambiguous MERGE
    val dup = Seq((0.0d, 1), (-0.0d, 2)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.FormatOps.upsert(s, dir, "t", dup, Seq("k"))
    }
    assert(e.getMessage.contains("multiple rows for key"))
  }

  test("zone map never skips EqualTo(col, 0.0) on a [-0.0,-0.0] chunk") {
    def bits(d: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(java.lang.Double.doubleToLongBits(d)); b.array()
    }
    val schema = StructType(Seq(StructField("x", DoubleType)))
    val negZero = Map("x" -> ColStats(0, Some(bits(-0.0d)), Some(bits(-0.0d))))
    assert(!Stats.canSkip(EqualTo("x", 0.0d), schema, negZero))
    assert(!Stats.canSkip(EqualTo("x", -0.0d), schema, negZero))
    // ordinary skips still prove: a [1.0, 2.0] chunk can't hold 0.0
    val oneTwo = Map("x" -> ColStats(0, Some(bits(1.0d)), Some(bits(2.0d))))
    assert(Stats.canSkip(EqualTo("x", 0.0d), schema, oneTwo))
  }

  test("commit versions stay strictly increasing across a restore") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advice-cdf-restore").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft").option("table", "t").mode("append").save(dir)
    def versions(): Seq[Long] =
      s.read.format("graft").option("table", "changes")
        .load(s"$dir/${"_changes"}")
        .select("_commit_version").distinct().as[Long].collect().toSeq.sorted
    graft.operators.FormatOps.upsert(s, dir, "t",
      Seq((1L, "a2")).toDF("id", "v"), Seq("id"), captureChanges = true)
    graft.operators.FormatOps.upsert(s, dir, "t",
      Seq((1L, "a3")).toDF("id", "v"), Seq("id"), captureChanges = true)
    val before = versions()
    assert(before.size == 2 && before.distinct.size == 2)
    // swing the pointer back while the higher generation survives: the
    // old pointer+1 stamp would now RE-ISSUE before.max
    graft.operators.FormatOps.restore(s, dir, 1)
    graft.operators.FormatOps.upsert(s, dir, "t",
      Seq((2L, "b2")).toDF("id", "v"), Seq("id"), captureChanges = true)
    val after = versions()
    assert(after.size == 3, s"expected 3 distinct versions, got $after")
    assert(after.max > before.max,
      s"post-restore capture re-issued a version: $after vs $before")
  }

  test("hostile PNG IHDR dimensions refuse cleanly (no allocator crash)") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte))
    def chunk(typ: String, body: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4).putInt(body.length)
      out.write(bb.array())
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    // w=2^30, h=2, greyscale: h*(1+w) overflows Int to a negative
    // "expect" that sailed past the old size guard
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(1 << 30).putInt(2)
      .put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IEND", Array.empty[Byte])
    val e = intercept[IllegalArgumentException] {
      graft.operators.Multimodal.decodePng(1L, out.toByteArray)
    }
    assert(e.getMessage.contains("PNG too large"))
  }
}
