package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration

import graft.SparkSpec

/** APPEND half of the stats lifecycle: ANALYZE persists per-column HLL
  * sketches (int/long/string/binary); every later append unions writer-
  * task deltas into them at commit, so NDV — the one statistic byte-ratio
  * extrapolation cannot fake — stays fresh with zero extra scans. The
  * task-side value→hash mapping must MATCH `hll_sketch_agg`'s, or every
  * re-appended value double-counts: the overlap tests are the proof. */
class SketchAppendSpec extends SparkSpec {

  private def conf = new Configuration()

  private def freshDir(): String =
    Files.createTempDirectory("graft-sketch").toString

  private def write(dir: String, mode: String, lo: Long, hi: Long): Unit =
    spark.range(lo, hi)
      .selectExpr("id", "CAST(id % 97 AS INT) AS small",
        "concat('k', CAST(id % 250 AS STRING)) AS label",
        "IF(id % 5 = 0, NULL, CAST(id % 13 AS STRING)) AS gappy")
      .write.format("graft").mode(mode).save(dir)

  private def sidecar(dir: String) =
    GraftDataSource.readColStats(conf, dir, "data").get

  test("disjoint append: NDV grows to the union, rows and bytes re-anchor") {
    val dir = freshDir()
    write(dir, "overwrite", 0, 2000)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    val a0 = sidecar(dir)
    assert(a0.cols("id").sketch.isDefined && a0.cols("label").sketch.isDefined)
    assert(math.abs(a0.cols("id").ndv - 2000) <= 40)

    write(dir, "append", 2000, 3000) // id: 1000 NEW values; label/small: all overlap
    val a1 = sidecar(dir)
    assert(a1.rows == 3000, s"rows must accrue: ${a1.rows}")
    assert(math.abs(a1.cols("id").ndv - 3000) <= 60,
      s"id ndv must grow to ~3000, got ${a1.cols("id").ndv}")
    assert(!a1.exact, "merged NDVs are sketch estimates")
    val onDisk = GraftDataSource.listPartitionedSized(conf, dir).map(_._2).sum
    assert(a1.bytes == onDisk, "bytes must re-anchor at commit")
    // min/max track the append for integral columns
    assert(a1.cols("id").max.contains(2999L), a1.cols("id").max.toString)
    assert(a1.cols("id").min.contains(0L))
  }

  test("overlapping append: matching hash mapping means NDV must NOT double") {
    val dir = freshDir()
    write(dir, "overwrite", 0, 2000)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    val before = sidecar(dir)
    // append the SAME id/label/small value sets (ids 0..2000 rehashed
    // through the task-side sketcher); a mapping divergent from
    // hll_sketch_agg would land them in fresh registers and ~double NDV
    write(dir, "append", 0, 2000)
    val after = sidecar(dir)
    for (c <- Seq("id", "small", "label", "gappy")) {
      val (b, a) = (before.cols(c).ndv, after.cols(c).ndv)
      assert(math.abs(a - b).toDouble <= math.max(2.0, b * 0.02),
        s"col $c: ndv $b -> $a after a fully-overlapping append " +
          "(task-side hashing diverged from hll_sketch_agg)")
    }
    assert(after.rows == 4000)
    // null counts accrue (gappy is null for id % 5 == 0 → 400 more)
    assert(after.cols("gappy").nullCount == before.cols("gappy").nullCount + 400)
  }

  test("partitioned append merges deltas across per-partition writers") {
    val dir = freshDir()
    spark.range(0, 1000)
      .selectExpr("id", "CAST(id % 4 AS STRING) AS p")
      .write.format("graft").partitionBy("p").mode("overwrite").save(dir)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    assert(math.abs(sidecar(dir).cols("id").ndv - 1000) <= 20)
    spark.range(1000, 1500)
      .selectExpr("id", "CAST(id % 4 AS STRING) AS p")
      .write.format("graft").partitionBy("p").mode("append").save(dir)
    val a = sidecar(dir)
    assert(math.abs(a.cols("id").ndv - 1500) <= 30, s"got ${a.cols("id").ndv}")
    assert(a.rows == 1500)
  }

  test("overwrite drops the sidecar: replaced data invalidates the snapshot") {
    val dir = freshDir()
    write(dir, "overwrite", 0, 1000)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    assert(GraftDataSource.readColStats(conf, dir, "data").isDefined)
    write(dir, "overwrite", 0, 10)
    assert(GraftDataSource.readColStats(conf, dir, "data").isEmpty,
      "an overwrite must not leave a sidecar describing vanished rows")
  }

  test("streaming appends keep the FULL stats set exact: epoch-keyed counts") {
    val dir = freshDir()
    spark.range(0, 1000).selectExpr("id", "concat('k', CAST(id % 50 AS STRING)) AS label")
      .write.format("graft").mode("overwrite").save(dir)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    // stream 500 NEW ids into the analyzed table through the graft sink
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Long]
    src.addData(1000L until 1500L: _*)
    val ck = Files.createTempDirectory("graft-sketch-ck").toString
    val q = src.toDF().selectExpr("value AS id",
        "concat('k', CAST(value % 50 AS STRING)) AS label")
      .writeStream.format("graft").option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination(60000)
    q.stop()
    val after = sidecar(dir)
    // sketch union is set-semantics: NDV reflects the streamed ids
    assert(math.abs(after.cols("id").ndv - 1500) <= 30,
      s"streamed NDV must merge: ${after.cols("id").ndv}")
    assert(after.cols("id").max.contains(1499L))
    // additive counts are epoch-keyed against the sidecar's high-water
    // mark, so they accrue EXACTLY (a replayed epoch applies nothing)
    assert(after.rows == 1500, s"streamed rows must accrue exactly: ${after.rows}")
    assert(after.streamEpochs.nonEmpty, "the committing query must record its epoch mark")
    val onDisk = GraftDataSource.listPartitionedSized(conf, dir).map(_._2).sum
    assert(after.bytes == onDisk, "bytes must re-anchor at the epoch commit")
    assert(spark.read.format("graft").load(dir).count() == 1500L)
  }

  test("an epoch REPLAY applies nothing: rows stay exact, NDV unchanged") {
    val dir = freshDir()
    write(dir, "overwrite", 0, 1000)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    val a0 = sidecar(dir)
    // one writer task's delta for an epoch-7 commit, applied twice (the
    // second is a retried epoch re-committing the SAME id, the exact
    // shape Spark's exactly-once sink contract produces)
    val sk = new ColSketcher(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Seq("id"))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    (5000L until 5200L).foreach { v => row.update(0, v); sk.update(row) }
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(GraftCommitMessage("epoch-7-part-0.graft", 200L, sk.result()))
    GraftDataSource.mergeAppendStats(conf, dir, "data", msgs, epochKey = Some(("qA", 7L)))
    val a1 = sidecar(dir)
    assert(a1.rows == a0.rows + 200, s"first apply accrues: ${a1.rows}")
    assert(a1.streamEpochs == Map("qA" -> 7L))
    GraftDataSource.mergeAppendStats(conf, dir, "data", msgs, epochKey = Some(("qA", 7L)))
    val a2 = sidecar(dir)
    assert(a2.rows == a1.rows, s"replay must not double-bill rows: ${a2.rows}")
    assert(a2.cols("id").ndv == a1.cols("id").ndv)
    assert(a2.cols("id").nullCount == a1.cols("id").nullCount)
    // a LATER epoch of the same query still applies
    GraftDataSource.mergeAppendStats(conf, dir, "data", msgs, epochKey = Some(("qA", 8L)))
    assert(sidecar(dir).rows == a1.rows + 200)
    // a DIFFERENT query's epoch 0 is NOT a replay: marks are per query
    // (a fresh checkpoint restarts epochs at 0 and must still count)
    GraftDataSource.mergeAppendStats(conf, dir, "data", msgs, epochKey = Some(("qB", 0L)))
    val a3 = sidecar(dir)
    assert(a3.rows == a1.rows + 400, s"a new query's epoch 0 must accrue: ${a3.rows}")
    assert(a3.streamEpochs == Map("qA" -> 8L, "qB" -> 0L))
  }

  test("a 65th distinct query id evicts the lowest epoch instead of dropping merges forever") {
    val dir = freshDir()
    write(dir, "overwrite", 0, 1000)
    graft.operators.FormatOps.analyzeTable(spark, dir)
    val sk = new ColSketcher(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Seq("id"))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    (9000L until 9100L).foreach { v => row.update(0, v); sk.update(row) }
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(GraftCommitMessage("evict-part-0.graft", 100L, sk.result()))
    // 64 distinct stream lifetimes, ascending epochs so q00 is lowest
    (0 until 64).foreach { i =>
      GraftDataSource.mergeAppendStats(conf, dir, "data", msgs,
        epochKey = Some((f"q$i%02d", i.toLong)))
    }
    val full = sidecar(dir)
    assert(full.streamEpochs.size == 64)
    assert(full.rows == 1000 + 64 * 100)
    // the 65th DISTINCT id must still accrue (long-lived tables see many
    // stream lifetimes) — the lowest-epoch entry makes room
    GraftDataSource.mergeAppendStats(conf, dir, "data", msgs,
      epochKey = Some(("q-new", 0L)))
    val after = sidecar(dir)
    assert(after.rows == full.rows + 100,
      s"the 65th query id must not be dropped: ${after.rows}")
    assert(after.streamEpochs.size == 64, "map stays bounded")
    assert(after.streamEpochs.contains("q-new"))
    assert(!after.streamEpochs.contains("q00"), "lowest-epoch entry evicts")
  }

  test("un-analyzed tables pay nothing: no sidecar, no deltas in messages") {
    val dir = freshDir()
    write(dir, "overwrite", 0, 100)
    write(dir, "append", 100, 200)
    assert(GraftDataSource.readColStats(conf, dir, "data").isEmpty)
  }
}
