package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose q80 into write / read+agg phases, timed separately.
  * Usage: runMain graft.ProfileQ80 [sfDir] */
object ProfileQ80 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_prof/lineitem"
    val nPart = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val li0 = Tables.lineitem(spark, sfDir)
    val li = if (nPart > 0) li0.repartition(nPart) else li0
    li.groupBy().count().collect() // warm parquet read
    // track per-job wall time + summed task time, so driver-side commit
    // cost shows as (write wall) - (job wall)
    val jobWall = new java.util.concurrent.atomic.AtomicLong
    val taskSum = new java.util.concurrent.atomic.AtomicLong
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.remove(j.jobId)).foreach(t => jobWall.addAndGet(System.nanoTime() - t))
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskSum.addAndGet(t.taskInfo.duration * 1000000L)
    })
    (1 to 3).foreach { it =>
      val ts = System.nanoTime()
      li.queryExecution.toRdd.foreachPartition { it => var n = 0L; while (it.hasNext) { it.next(); n += 1 } }
      println(f"  scan-only ${(System.nanoTime() - ts) / 1e9}%.3f s")
      jobWall.set(0); taskSum.set(0)
      val t0 = System.nanoTime()
      li.write.format("graft").mode("overwrite").save(dir)
      Thread.sleep(200) // let listener events drain
      println(f"  write jobs wall ${jobWall.get / 1e9}%.3f s, task-sum ${taskSum.get / 1e9}%.3f s")
      val t1 = System.nanoTime()
      val n = spark.read.format("graft").load(dir)
        .filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"))
        .count()
      val t2 = System.nanoTime()
      println(f"iter $it: write ${(t1 - t0) / 1e9}%.3f s, read+agg ${(t2 - t1) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
