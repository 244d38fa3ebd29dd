package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hive-style partition discovery + planning-time pruning for graft dirs. */
class PartitionSpec extends SparkSpec {

  private def writePartitioned(): String = {
    val dir = Files.createTempDirectory("graft-part").toString
    for (dt <- Seq("2024-01-01", "2024-01-02", "2024-01-03"); region <- Seq("eu", "us")) {
      spark.range(0, 100)
        .selectExpr("id", s"concat('$dt-$region-', id) AS tag")
        .coalesce(1)
        .write.format("graft").mode("append").save(s"$dir/dt=$dt/region=$region")
    }
    dir
  }

  test("partition columns surface in the schema and data") {
    val dir = writePartitioned()
    val df = spark.read.format("graft").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "tag", "dt", "region"))
    assert(df.count() == 600)
    assert(df.filter(col("region") === "eu").count() == 300)
    val one = df.filter(col("dt") === "2024-01-02" && col("region") === "us" && col("id") === 5)
      .select("tag").head.getString(0)
    assert(one == "2024-01-02-us-5")
    // grouping by partition cols
    assert(canon(df.groupBy("dt").count()) ==
      canon(spark.sql("SELECT * FROM VALUES ('2024-01-01', 200L), ('2024-01-02', 200L), ('2024-01-03', 200L) AS t(dt, count)")))
  }

  test("partition pruning drops files at planning time") {
    val dir = writePartitioned()
    val df = spark.read.format("graft").load(dir)
    val pruned = df.filter(col("dt") === "2024-01-02" && col("region") === "eu")
    // one file survives pruning => exactly one RDD partition
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 100)
    val range = df.filter(col("dt") >= "2024-01-02")
    assert(range.rdd.getNumPartitions == 4)
    assert(range.count() == 400)
    // non-partition filters prune nothing at planning time
    assert(df.filter(col("id") === 1).rdd.getNumPartitions == 6)
  }
}
