package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DvScanProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_dvprobe"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.conf.set("spark.sql.catalog.dvp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvp.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvp.db")
    spark.range(0, 2000000).selectExpr("id AS k", "id * 3 AS v",
      "concat('text-', id) AS s").repartition(8)
      .createOrReplaceTempView("src")
    spark.sql("CREATE TABLE dvp.db.t AS SELECT * FROM src")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i: ${(System.nanoTime()-t0)/1e9}%.3f s rows=$n")
      }
    }
    time("clean ")(spark.table("dvp.db.t").agg(sum(col("v") + 1)).count())
    spark.conf.set("spark.graft.deleteMode", "merge-on-read")
    spark.sql("DELETE FROM dvp.db.t WHERE k % 7 = 3")
    time("dense ")(spark.table("dvp.db.t").agg(sum(col("v") + 1)).count())
    spark.sql("DELETE FROM dvp.db.t WHERE k % 2 = 0")
    time("half  ")(spark.table("dvp.db.t").agg(sum(col("v") + 1)).count())
    spark.stop()
  }
}
