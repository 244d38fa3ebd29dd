package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.types.{LongType, StructType}

import graft.SparkSpec

/** Regression coverage for the micro-batch stream's append-only guard
  * and filesystem-resolution wiring.
  *
  * The TOCTOU case: `latestOffset` asserts the generation pin, THEN
  * lists the directory. A rewrite that swaps the generation pointer
  * between the two resolves the listing against the NEW generation; if
  * that listing were persisted to the checkpoint's file log, the stream
  * would deliver a full batch of duplicate rows and the log would be
  * permanently poisoned with rewritten paths (the next trigger's assert
  * fires too late — the segment is already durable). The fix re-reads
  * the pointer AFTER the listing and BEFORE any durable append or
  * offset advance.
  */
class StreamGuardSpec extends SparkSpec {

  private val schema = new StructType().add("id", LongType)

  test("generation swap between listing and segment append is refused; log stays clean") {
    val dir = Files.createTempDirectory("graft-toctou").toString
    val ck = Files.createTempDirectory("graft-toctou-ck").toString
    spark.range(0, 10).selectExpr("id")
      .coalesce(1).write.format("graft").mode("append").save(dir)

    @volatile var swapMidListing = false
    val stream = new GraftMicroBatchStream(dir, ck, schema, None) {
      override protected def listDir(): Seq[String] = {
        val listed = super.listDir()
        if (swapMidListing) // the race, made deterministic: rewrite lands
          graft.operators.FormatOps.compact(spark, dir, targetFiles = 1)
        listed
      }
    }
    // trigger 1: pins the generation, discovers + durably logs file 1
    val o1 = stream.latestOffset(GraftStreamOffset(0), ReadLimit.allAvailable())
    assert(o1.asInstanceOf[GraftStreamOffset].index == 1)

    // new data lands, then a compaction swaps the pointer MID-LISTING
    spark.range(10, 20).selectExpr("id")
      .coalesce(1).write.format("graft").mode("append").save(dir)
    swapMidListing = true
    val e = intercept[graft.format.OliveFormatException] {
      stream.latestOffset(o1, ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("REWRITTEN"), s"got: ${e.getMessage}")

    // the doomed discovery must NOT have persisted a segment: a restart
    // from this checkpoint must see only the pre-swap log
    val segs = new java.io.File(ck).listFiles().map(_.getName)
      .filter(_.startsWith("graft-file-log.seg-")).toSeq
    assert(segs.size == 1,
      s"mid-swap discovery persisted a poisoned segment: $segs")
  }

  test("stream filesystem resolution uses the session's hadoop configuration") {
    // the pin/segment/log paths must resolve against the same filesystem
    // world as the data plane (spark.hadoop.* overrides, fs.defaultFS) —
    // a bare `new Configuration()` would drop session-configured stores
    val dir = Files.createTempDirectory("graft-sessconf").toString
    val ck = Files.createTempDirectory("graft-sessconf-ck").toString
    val stream = new GraftMicroBatchStream(dir, ck, schema, None)
    assert(stream.conf eq spark.sparkContext.hadoopConfiguration)
  }
}
