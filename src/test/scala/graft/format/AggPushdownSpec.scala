package graft.format

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COUNT(*)/MIN/MAX pushdown: answered from footer metadata, zero data
  * pages read. */
class AggPushdownSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def writeSample(): String = {
    val dir = Files.createTempDirectory("graft-aggpd").toString
    spark.range(0, 30000).repartition(3).select(
      col("id"),
      (col("id") % 97).cast("int").as("i"),
      (col("id") % 2 === 0).as("b"),
      (col("id") * 1.5).as("d"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 11 === 0, null).otherwise(col("id") + 5).as("l_null"),
      timestamp_micros(col("id") * 1000000).as("ts"))
      .write.format("graft").option("chunkrows", "4000").mode("append").save(dir)
    dir
  }

  test("count/min/max on stat-exact types push to footer metadata") {
    val dir = writeSample()
    val df = spark.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"),
        min("i").as("mni"), max("b").as("mxb"), max("ts").as("mxts"),
        min("l_null").as("mnn"), count(col("l_null")).as("nn"))
    assert(plan(df).contains("pushedAggs="), plan(df))
    val r = df.head
    assert(r.getLong(0) == 30000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 29999L)
    assert(r.getInt(3) == 0)
    assert(r.getBoolean(4))
    assert(r.getTimestamp(5).toInstant.getEpochSecond == 29999L)
    assert(r.getLong(6) == 6L) // id=0 is null (0%11==0); min non-null = 1+5
    assert(r.getLong(7) == (0 until 30000).count(_ % 11 != 0).toLong) // count(col) via null counts
  }

  test("pushdown declines when unsupported: filters, doubles, strings, group-by") {
    val dir = writeSample()
    val base = spark.read.format("graft").load(dir)
    val cases = Seq(
      base.filter(col("i") > 50).agg(count(lit(1))), // residual filters
      base.agg(min("d")), // double: NaN breaks stats
      base.agg(max("s")), // string: 48-byte stat cap
      base.groupBy("i").agg(count(lit(1))), // grouping
      base.agg(countDistinct(col("i")))) // distinct needs real rows
    cases.foreach { df =>
      assert(!plan(df).contains("pushedAggs="), plan(df))
    }
    // and they still compute correctly through the normal scan
    assert(base.filter(col("i") > 50).agg(count(lit(1))).head.getLong(0) ==
      (0 until 30000).count(_ % 97 > 50))
    assert(base.agg(max("s")).head.getString(0) == "s9999")
    assert(base.agg(countDistinct(col("i"))).head.getLong(0) == 97L)
  }

  test("pushed aggregates agree with parquet on the same data") {
    val dir = writeSample()
    val g = spark.read.format("graft").load(dir)
    val pq = Files.createTempDirectory("graft-aggpq").toString
    g.write.mode("overwrite").parquet(pq)
    val p = spark.read.parquet(pq)
    def agg(df: DataFrame) =
      df.agg(count(lit(1)), min("id"), max("id"), min("ts"), max("ts"), max("i"))
    assert(canon(agg(g)) == canon(agg(p)))
  }
}
