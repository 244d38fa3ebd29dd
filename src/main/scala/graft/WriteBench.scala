package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: graft vs parquet WRITE throughput, interleaved repeats so
  * neither side is charged session cold-start. Usage: runMain
  * graft.WriteBench [sfDir] */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir).repartition(cpus.toInt).cache()
    li.count() // materialize: writes then time only the write side
    (1 to 3).foreach { it =>
      val t0 = System.nanoTime()
      li.write.format("graft").mode("overwrite").save("/tmp/graft_wbench/g")
      val t1 = System.nanoTime()
      li.write.mode("overwrite").parquet("/tmp/graft_wbench/p")
      val t2 = System.nanoTime()
      println(f"iter $it: graft ${(t1 - t0) / 1e9}%.2f s, parquet ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
