package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: graft vs parquet scan throughput on lineitem.
  * Usage: runMain graft.ScanBench <sfDir> */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scanbench/lineitem"
    val li = Tables.lineitem(spark, sfDir)
    // untimed warmup writes: the first write in a session carries parquet
    // source cold reads + codegen/JIT for BOTH sides' row pipelines; an
    // ordering where one format goes first charges all of that to it
    // (measured 4.3s -> 0.3s warm for the same graft write)
    li.repartition(cpus.toInt).write.format("graft").mode("overwrite").save(dir)
    li.repartition(cpus.toInt).write.mode("overwrite")
      .parquet("/tmp/graft_scanbench/lineitem_parquet")
    // write with enough partitions that the scan parallelizes
    val t0 = System.nanoTime()
    li.repartition(cpus.toInt).write.format("graft").mode("overwrite").save(dir)
    println(f"graft write: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    li.repartition(cpus.toInt).write.mode("overwrite")
      .parquet("/tmp/graft_scanbench/lineitem_parquet")
    println(f"parquet write: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    def time(tag: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t = System.nanoTime()
        f
        println(f"$tag run$i: ${(System.nanoTime() - t) / 1e9}%.3f s")
      }
    }
    val g = spark.read.format("graft").load(dir)
    time("graft  full-agg") {
      g.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1))).collect()
    }
    time("parquet full-agg") {
      li.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1))).collect()
    }
    time("graft  2col-agg") { g.select("l_quantity").agg(sum("l_quantity")).collect() }
    time("parquet 2col-agg") { li.select("l_quantity").agg(sum("l_quantity")).collect() }
    time("graft  filter") { g.filter(col("l_quantity") > 49.9).count() }
    time("parquet filter") { li.filter(col("l_quantity") > 49.9).count() }
    time("graft  strings") {
      g.agg(max(concat(col("l_returnflag"), col("l_linestatus"))), max(length(col("l_returnflag")))).collect()
    }
    time("parquet strings") {
      li.agg(max(concat(col("l_returnflag"), col("l_linestatus"))), max(length(col("l_returnflag")))).collect()
    }
    val gsize = new java.io.File(dir).listFiles().map(_.length()).sum / 1e6
    println(f"graft size: $gsize%.1f MB")
    val cdir = "/tmp/graft_scanbench/lineitem_compact"
    li.repartition(cpus.toInt).write.format("graft").option("bias", "compact")
      .mode("overwrite").save(cdir)
    val csize = new java.io.File(cdir).listFiles().map(_.length()).sum / 1e6
    println(f"graft size (compact): $csize%.1f MB")
    val gc = spark.read.format("graft").load(cdir)
    time("graft  compact full-agg") {
      gc.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1))).collect()
    }
    spark.stop()
  }
}
