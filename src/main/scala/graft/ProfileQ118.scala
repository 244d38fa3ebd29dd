package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: phase-by-phase wall decomposition of the q118 CDC-replica
  * gate. Usage: runMain graft.ProfileQ118 [sfDir] */
object ProfileQ118 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.FormatOps
    (1 to 2).foreach { iter =>
      val dir = "/tmp/q118prof/src"
      val repl = "/tmp/q118prof/replica"
      val ck = "/tmp/q118prof/ck"
      val hconf = spark.sparkContext.hadoopConfiguration
      Seq(dir, repl, ck).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hconf).delete(hp, true)
      }
      var t = System.nanoTime()
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"  $name%-28s ${(now - t) / 1e9}%.2f s")
        t = now
      }
      Tables.orders(spark, sfDir).repartition(8)
        .write.format("graft").mode("overwrite").save(dir)
      lap("write source")
      spark.read.format("graft").load(dir).repartition(8)
        .write.format("graft").mode("overwrite").save(repl)
      lap("seed replica")
      val o = Tables.orders(spark, sfDir)
      val updates = o.filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      val inserts = o.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(900000000L))
      FormatOps.upsert(spark, dir, "data", updates.unionByName(inserts),
        Seq("o_orderkey"), captureChanges = true)
      lap("upsert w/ capture")
      val q = FormatOps.changeFeedStream(spark, dir)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          FormatOps.applyCdcBatch(b.sparkSession, repl, "data", b,
            Seq("o_orderkey"), idempotencyKey = Some(s"q118p-$batchId"))
        }.start()
      try {
        q.processAllAvailable()
        lap("stream fold 1")
        FormatOps.deleteWhere(spark, dir, "data", col("o_orderkey") % 19 === 3,
          captureChanges = true)
        lap("delete w/ capture")
        q.processAllAvailable()
        lap("stream fold 2")
      } finally q.stop()
      val n = spark.read.format("graft").load(repl)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n")).count()
      lap(s"final agg (rows=$n)")
      println(s"iter $iter done")
    }
    spark.stop()
  }
}
