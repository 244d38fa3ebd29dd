package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: loop one graft aggregate long enough to stack-sample it.
  * Usage: runMain graft.ScanProfile [sfDir] [iters] */
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(120)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-sf cache dir: a stale dir from another scale factor must not be
    // silently profiled under this one's label
    val dir = s"/tmp/graft_scanprofile/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/lineitem"
    if (!new java.io.File(dir).exists())
      Tables.lineitem(spark, sfDir).repartition(cpus.toInt)
        .write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val t0 = System.nanoTime()
    (1 to iters).foreach { _ =>
      g.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1))).collect()
    }
    println(f"per-iter: ${(System.nanoTime() - t0) / 1e9 / iters}%.3f s")
    spark.stop()
  }
}
