package graft
import org.apache.spark.sql.SparkSession
object PartUpdProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_partupd"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.conf.set("spark.sql.catalog.pup", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pup.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pup.db")
    spark.range(0, 300)
      .selectExpr("id AS k", "concat('p', id % 3) AS part", "id % 11 AS v")
      .write.format("graft").option("table", "t").option("partitionBy", "part")
      .mode("overwrite").save(s"$root/db")
    println("table schema: " + spark.table("pup.db.t").schema.map(f =>
      f.name + (if (f.metadata.contains("graft.partitionCol")) "*" else "")).mkString(","))
    try {
      spark.sql("UPDATE pup.db.t SET v = -1 WHERE k % 17 = 6") // COW path
      println("COW UPDATE ok; v=-1 rows: " +
        spark.table("pup.db.t").filter(org.apache.spark.sql.functions.col("v") === -1).count())
      println("part intact: " + spark.table("pup.db.t")
        .filter("part <> concat('p', k % 3)").count())
    } catch { case e: Throwable => println("COW UPDATE failed: " + e) }
    spark.stop()
  }
}
