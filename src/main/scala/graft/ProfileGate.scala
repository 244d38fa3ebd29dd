package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: attribute a gate's wall time to its INNER executions.
  * Procedural gates run many inner actions (localCheckpoints, collects,
  * DML); BenchOne gives one wall number — this prints each inner
  * execution's duration and a one-line plan digest, so the expensive
  * materialization is identifiable without the Spark UI.
  * Usage: runMain graft.ProfileGate <query>[,<query>...] <sfDir> [reps]
  */
object ProfileGate {
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
    val reps = if (args.length > 2) args(2).toInt else 2
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val digest = qe.executedPlan.toString.linesIterator
          .map(_.trim).filter(_.nonEmpty).take(3).mkString(" | ").take(200)
        captured.add((funcName, durationNs, digest))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    args(0).split(',').foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        System.gc()
        captured.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, args(1)).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        println(f"==== $name rep$r wall=$wall%.2f s rows=$n")
        var i = 0
        var acc = 0L
        captured.forEach { case (f, d, p) =>
          i += 1; acc += d
          println(f"  #$i%2d ${d / 1e9}%6.3f s [$f] $p")
        }
        println(f"  inner sum: ${acc / 1e9}%.3f s of $wall%.2f s wall")
      }
    }
    spark.stop()
  }
}
