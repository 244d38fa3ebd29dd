package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: attribute cluster()'s wall time (r16: q98's engine side
  * read 20x at 10x data — is it the quantile pass, the z-sort's 4-task
  * parallelism collapse/spill, or the chunked write?).
  * Usage: runMain graft.ProfileCluster <sfDir> [targetFiles] [chunkrows]
  */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val targetFiles = if (args.length > 1) args(1).toInt else 4
    val chunkrows = if (args.length > 2) args(2) else "4000"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def phase[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val dir = "/tmp/graft_profile_cluster"
    phase("seed") {
      Tables.orders(s, sfDir).repartition(16)
        .write.format("graft").option("chunkrows", chunkrows)
        .mode("overwrite").save(dir)
    }
    phase(s"cluster(tf=$targetFiles)") {
      operators.FormatOps.cluster(s, dir, "data",
        Seq("o_custkey", "o_totalprice"), targetFiles = targetFiles,
        writeOptions = Map("chunkrows" -> chunkrows), binning = "quantile")
    }
    phase("scan") {
      s.read.format("graft").load(dir)
        .filter(col("o_custkey") < 500 || col("o_totalprice") > 400000.0)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)), round(sum(col("o_totalprice")), 4)).collect()
    }
    s.stop()
  }
}
