package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time or explain a single SparkEntry query.
  * Usage: runMain graft.BenchOne <query> <sfDir> [explain] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(args(0))
    if (args.length > 2 && args(2) == "explain") fn(spark, args(1)).explain("formatted")
    else {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, args(1)).count()
        println(s"run$i: ${(System.nanoTime() - t0) / 1e9}%s sec rows=$n")
      }
    }
    spark.stop()
  }
}
