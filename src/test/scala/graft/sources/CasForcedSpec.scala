package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pointer-publish CAS seam, forced onto the local scheme
  * (`spark.graft.pointer.cas=true`): every generation publish — gate
  * workloads included — must behave identically when pointer swaps go
  * through [[ConditionalPut.HadoopFsStore]] instead of the rename
  * protocol. This is the "one gate passes with the store forced on"
  * contract for rename-less object stores. */
class CasForcedSpec extends SparkSpec {

  private def withCas[T](body: => T): T = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setBoolean("spark.graft.pointer.cas", true)
    try body finally conf.unset("spark.graft.pointer.cas")
  }

  test("compact + upsert + restore cycle with the CAS pointer store forced on") {
    withCas {
      val s = spark
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("cas-forced").toString
      (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartition(4).write.format("graft").option("table", "t")
        .mode("append").save(dir)
      graft.operators.FormatOps.compact(s, dir, 2) // gen-1, CAS swap
      graft.operators.FormatOps.upsert(s, dir, "t",
        Seq((1L, "one"), (501L, "new")).toDF("id", "v"), Seq("id")) // gen-2
      val live = s.read.format("graft").option("table", "t").load(dir)
      assert(live.count() == 501)
      assert(live.filter(col("id") === 1).select("v").collect().head.getString(0) == "one")
      graft.operators.FormatOps.restore(s, dir, 1) // CAS backward swing
      assert(s.read.format("graft").option("table", "t").load(dir).count() == 500)
      graft.operators.FormatOps.deleteWhere(s, dir, "t", col("id") <= 100) // gen past 2
      assert(s.read.format("graft").option("table", "t").load(dir).count() == 400)
    }
  }

  test("the q92 compaction gate passes with the CAS store forced on") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"driver testdata not present at $sf")
    withCas {
      val df = graft.operators.FormatOps.queries("q92_graft_compact")(spark, sf)
      assert(df.collect().length == 3)
    }
  }
}
