package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graft as a Structured Streaming source and sink. */
class StreamingSpec extends SparkSpec {

  test("graft micro-batch source discovers files across batches") {
    val dir = Files.createTempDirectory("graft-src").toString
    val ck = Files.createTempDirectory("graft-src-ck").toString
    spark.range(0, 100).selectExpr("id", "id * 2 AS y")
      .coalesce(1).write.format("graft").mode("append").save(dir)

    val stream = spark.readStream.format("graft").load(dir)
    val q = stream.writeStream.format("memory").queryName("graft_src_test")
      .option("checkpointLocation", ck).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_test").count() == 100)
      // second batch: new file appears, only its rows are appended
      spark.range(100, 150).selectExpr("id", "id * 2 AS y")
        .coalesce(1).write.format("graft").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table("graft_src_test")
      assert(got.count() == 150)
      assert(got.agg(sum("id")).head.getLong(0) == (0 until 150).map(_.toLong).sum)
    } finally q.stop()
  }

  test("graft streaming sink writes readable epoch files") {
    val src = Files.createTempDirectory("graft-sink-src").toString
    val out = Files.createTempDirectory("graft-sink-out").toString
    val ck = Files.createTempDirectory("graft-sink-ck").toString
    spark.range(0, 500).selectExpr("id", "concat('v', id) AS v")
      .write.format("graft").mode("append").save(src)
    val q = spark.readStream.format("graft").load(src)
      .filter(col("id") % 2 === 0)
      .writeStream.format("graft")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.format("graft").load(out)
    assert(back.count() == 250)
    assert(canon(back) == canon(
      spark.range(0, 500).selectExpr("id", "concat('v', id) AS v").filter(col("id") % 2 === 0)))
  }

  test("interval types round-trip") {
    val df = spark.range(0, 100).selectExpr(
      "id",
      "make_dt_interval(0, cast(id AS int), 30, 1.5) AS dti",
      "make_ym_interval(cast(id % 5 AS int), cast(id % 12 AS int)) AS ymi")
    val dir = Files.createTempDirectory("graft-iv").toString
    df.write.format("graft").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(canon(back) == canon(df))
  }
}
