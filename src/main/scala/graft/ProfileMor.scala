package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: attribute a merge-on-read DML's wall time by phase at a
  * given scale (r16: the sf1 run showed the MoR gates' ENGINE side
  * scaling ~16-24x at 10x data — this isolates which step is
  * super-linear: the scan, the DV build, or the commit machinery).
  * Usage: runMain graft.ProfileMor <sfDir>
  */
object ProfileMor {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.profile", "true")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    val root = "/tmp/graft_profile_mor"
    org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    s.conf.set("spark.sql.catalog.graft_pm", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_pm.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_pm.db")
    s.sql("CREATE TABLE graft_pm.db.orders " +
      "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE) USING graft")
    phase("seed") {
      Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(4).writeTo("graft_pm.db.orders").append()
    }
    graft.sources.Prof.reset()
    s.conf.set("spark.graft.deleteMode", "merge-on-read")
    phase("mor_delete_1") {
      s.sql("DELETE FROM graft_pm.db.orders WHERE o_orderkey % 7 = 3") }
    phase("mor_delete_2") {
      s.sql("DELETE FROM graft_pm.db.orders WHERE o_custkey % 5 = 1") }
    s.conf.set("spark.graft.deleteMode", "copy-on-write")
    phase("post_agg") {
      s.table("graft_pm.db.orders").agg(count(lit(1))).collect() }
    graft.sources.Prof.dump("Prof (driver-side commit path):")
    s.stop()
  }
}
