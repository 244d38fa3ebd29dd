package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FormatOps

/** Offline compaction: many task-sized files collapse to few, content
  * and hive partition layout preserved. */
class CompactionSpec extends SparkSpec {

  private def graftFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".graft")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("flat dir: 32 small files compact to 4, content identical") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val df = spark.range(0, 20000)
      .selectExpr("id", "concat('v', id % 100) AS v", "cast(id as double) / 4 AS d")
    df.repartition(32).write.format("graft").option("chunkrows", "500")
      .mode("overwrite").save(dir)
    assert(graftFiles(dir).size == 32)
    val before = canon(spark.read.format("graft").load(dir))
    FormatOps.compact(spark, dir, targetFiles = 4)
    assert(graftFiles(dir).size == 4, s"got ${graftFiles(dir).size} files")
    assert(canon(spark.read.format("graft").load(dir)) == before)
    // leftovers swept
    assert(!new java.io.File(dir + ".compact-tmp").exists)
    assert(!new java.io.File(dir + ".compact-old").exists)
  }

  test("interrupted swap recovers: .compact-old is restored, never deleted") {
    val dir = Files.createTempDirectory("graft-compact-crash").toString
    spark.range(0, 5000).selectExpr("id", "id * 2 AS v")
      .repartition(8).write.format("graft").mode("overwrite").save(dir)
    val before = canon(spark.read.format("graft").load(dir))
    // simulate a crash between the two swap renames: data lives ONLY at
    // .compact-old, the table dir is gone
    val root = new java.io.File(dir)
    val old = new java.io.File(dir + ".compact-old")
    assert(root.renameTo(old))
    FormatOps.compact(spark, dir, targetFiles = 2)
    assert(graftFiles(dir).size == 2)
    assert(canon(spark.read.format("graft").load(dir)) == before)
    assert(!old.exists)
  }

  test("partitioned dir: layout survives compaction and still prunes") {
    val dir = Files.createTempDirectory("graft-compact-part").toString
    spark.range(0, 9000)
      .selectExpr("id", "concat('g', id % 3) AS grp")
      .repartition(16)
      .write.format("graft").option("partitionBy", "grp").option("chunkrows", "200")
      .mode("overwrite").save(dir)
    val before = canon(spark.read.format("graft").load(dir))
    val nBefore = graftFiles(dir).size
    FormatOps.compact(spark, dir, targetFiles = 2)
    assert(graftFiles(dir).size < nBefore)
    // hive layout preserved: per-partition dirs still exist
    assert(new java.io.File(dir, "grp=g0").isDirectory)
    assert(canon(spark.read.format("graft").load(dir)) == before)
    assert(spark.read.format("graft").load(dir)
      .filter(col("grp") === "g1").count() == 3000)
  }
}
