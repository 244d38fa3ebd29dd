package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time the streaming gate queries in an isolated fresh
  * session, min-of-N, optionally excluding a subset — the controlled
  * A/B for chasing streaming bench drift without the full suite's
  * surrounding load. Usage:
  *   runMain graft.StreamBench <sfDir> [runs] [skip=q67_...,q68_...]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val skip = args.lift(2).map(_.stripPrefix("skip=").split(",").toSet)
      .getOrElse(Set.empty[String])
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.filter(_.matches("q6[0-8].*")).toSeq.sorted
      .filterNot(skip.contains)
    // same warmup shape as Bench so numbers compare
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir) else Tables.load(spark, sfDir, n)
        df.groupBy().count().collect()
      } catch { case _: Throwable => }
    }
    names.foreach { name =>
      System.gc()
      // a failed run must NOT contribute its (near-zero) elapsed time to
      // the min — a broken query would read as a fast one
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => println(s"$name ERR ${e.getMessage}"); None }
      }
      if (times.isEmpty) println(s"SB $name FAILED all $runs runs")
      else println(f"SB $name min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
