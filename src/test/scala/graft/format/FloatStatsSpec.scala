package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Float/double min/max statistics with NaN accounting (footer v5):
  * quality scores and embedding norms are exactly the columns an
  * LLM-pipeline user filters, and before v5 a single NaN dropped a
  * chunk's float stats entirely (indistinguishable from all-null), so
  * the whole type was excluded from pruning and footer aggregates.
  * Now min/max cover the non-NaN values, `nanCount` says how many the
  * range omits, and the skip/aggregate logic applies Spark's own
  * ordering (NaN above every value). */
class FloatStatsSpec extends SparkSpec {
  private val conf = new Configuration()

  private def oneFile(dir: String): Path =
    new Path(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".graft")).head.toString)

  test("NaN-free double chunks prune and answer footer min/max") {
    val dir = Files.createTempDirectory("graft-fstats1").toString
    spark.range(0, 200000).coalesce(1)
      .select(col("id"), (col("id").cast("double") / 100.0).as("score"))
      .write.format("graft").mode("append").save(dir)
    val p = oneFile(dir)
    val fs = p.getFileSystem(conf)

    // stats present, nanCount 0
    val r = GraftFileReader.open(fs, p)
    val t = r.footer.chunks.head.tables.head
    val cs = t.stats(t.schema.fieldIndex("score"))
    r.close()
    assert(cs.min.isDefined && cs.max.isDefined && cs.nanCount == 0)

    // chunk-level skip: 200K rows span two chunks; a selective range on
    // the clustered double skips the non-matching chunk outright
    def scan(filters: Array[org.apache.spark.sql.sources.Filter]): (Long, Map[String, Long]) = {
      val schema = new StructType().add("id", LongType).add("score", DoubleType)
      val rd = new graft.sources.GraftPartitionReader(fs, p, schema, None, filters, -1)
      var n = 0L
      try {
        while (rd.next()) n += rd.get().numRows()
        (n, rd.currentMetricsValues().map(m => m.name -> m.value).toMap)
      } finally rd.close()
    }
    val (hit, m) = scan(Array(org.apache.spark.sql.sources.GreaterThan("score", 1998.0)))
    assert(hit >= 200L && hit <= Meta.BlockRows.toLong,
      s"double range scan decoded $hit rows; want <= one block")
    assert(m("skippedChunks") >= 1, s"skippedChunks=${m("skippedChunks")}")
    assert(m("skippedBlocks") >= 1, s"skippedBlocks=${m("skippedBlocks")}")

    // footer-answered MIN/MAX on the double (plan-asserted)
    val agg = spark.read.format("graft").load(dir)
      .agg(min("score").as("mn"), max("score").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggs="),
      "double min/max must answer from footers")
    val row = agg.head()
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 1999.99)
  }

  test("NaN rows survive comparison filters and poison pushed MAX, like Spark") {
    val dir = Files.createTempDirectory("graft-fstats2").toString
    // one clean file and one NaN-bearing file (every 10th row)
    spark.range(0, 10000).coalesce(1)
      .select(col("id"), col("id").cast("double").as("score"))
      .write.format("graft").mode("append").save(dir)
    spark.range(10000, 20000).coalesce(1)
      .select(col("id"),
        when(col("id") % 10 === 0, lit(Double.NaN))
          .otherwise(col("id").cast("double")).as("score"))
      .write.format("graft").mode("append").save(dir)

    val t = spark.read.format("graft").load(dir)
    // Spark orders NaN above every value: score > 1e9 matches exactly
    // the 1000 NaN rows — a skip built on the NaN-bearing chunk's
    // stored (non-NaN) max would wrongly prune them to 0
    assert(t.filter(col("score") > 1e9).count() == 1000L)
    assert(t.filter(col("score") < 0.0).count() == 0L) // min-side proofs intact
    // equality against a real value inside the NaN chunk's range
    assert(t.filter(col("score") === 10001.0).count() == 1L)

    // pushed aggregates mirror Spark's NaN semantics exactly
    val agg = t.agg(min("score").as("mn"), max("score").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggs="))
    val row = agg.head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1).isNaN, s"max over NaN-bearing data must be NaN, got ${row.getDouble(1)}")
    // identical to the unpushed answer
    val plain = t.withColumn("x", col("score") + 0.0)
      .agg(min("x"), max("x")).head()
    assert(plain.getDouble(0) == row.getDouble(0) && plain.getDouble(1).isNaN)
  }

  test("an all-NaN column answers NaN for both pushed MIN and MAX") {
    val dir = Files.createTempDirectory("graft-fstats3").toString
    spark.range(0, 1000).coalesce(1)
      .select(col("id"), lit(Double.NaN).as("score"))
      .write.format("graft").mode("append").save(dir)
    val agg = spark.read.format("graft").load(dir)
      .agg(min("score").as("mn"), max("score").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggs="))
    val row = agg.head()
    assert(row.getDouble(0).isNaN && row.getDouble(1).isNaN)
  }

  test("hostile NaN counts refuse at footer parse") {
    val dir = Files.createTempDirectory("graft-fstats4").toString
    spark.range(0, 500).coalesce(1)
      .select(col("id"), col("id").cast("double").as("score"))
      .write.format("graft").mode("append").save(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).head
    val hp = new Path(f.toString)
    val fs = hp.getFileSystem(conf)
    val r = GraftFileReader.open(fs, hp)
    val footer = r.footer
    r.close()
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    val chunk = footer.chunks.head
    val table = chunk.tables.head
    def withStats(ci: Int, st: ColStats): Array[Byte] = {
      val mutated = footer.copy(chunks = Vector(chunk.copy(tables = Vector(
        table.copy(stats = table.stats.updated(ci, st))))))
      val fb = Meta.write(mutated)
      val origLen = Bytes.le(raw).getLong(raw.length - 12)
      val tail = new Bytes(12)
      tail.putLong(fb.length.toLong)
      tail.putBytes(Meta.MagicTail)
      raw.slice(0, raw.length - 12 - origLen.toInt) ++ fb ++ tail.toArray
    }
    def tryOpen(bytes: Array[Byte]): Unit = {
      val p2 = Files.createTempDirectory("graft-fstats4m").resolve("m.graft")
      java.nio.file.Files.write(p2, bytes)
      val rr = GraftFileReader.open(
        new Path(p2.toString).getFileSystem(conf), new Path(p2.toString))
      rr.close()
    }
    val idIdx = table.schema.fieldIndex("id")
    val scIdx = table.schema.fieldIndex("score")
    // a NaN count on a BIGINT column is a structural lie
    val e1 = intercept[OliveFormatException](
      tryOpen(withStats(idIdx, table.stats(idIdx).copy(nanCount = 3))))
    assert(e1.getMessage.contains("NaN count"), e1.getMessage)
    // negative, and nulls+NaNs exceeding the row count, both refuse
    val e2 = intercept[OliveFormatException](
      tryOpen(withStats(scIdx, table.stats(scIdx).copy(nanCount = -1))))
    assert(e2.getMessage.contains("NaN count"), e2.getMessage)
    val e3 = intercept[OliveFormatException](
      tryOpen(withStats(scIdx, table.stats(scIdx).copy(nanCount = 501))))
    assert(e3.getMessage.contains("NaN count"), e3.getMessage)
  }
}
