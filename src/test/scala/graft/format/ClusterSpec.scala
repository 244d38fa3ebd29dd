package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And => FAnd, GreaterThan => FGt, LessThan => FLt}

import graft.SparkSpec
import graft.operators.FormatOps

/** Z-order clustering: after `FormatOps.cluster` on (x, y), a narrow
  * range filter on EITHER column must prune most chunks via zone maps —
  * the property a lexicographic sort only gives its leading column. */
class ClusterSpec extends SparkSpec {

  /** Fraction of the live generation's chunks a [lo, hi) range filter on
    * `c` skips, judged straight from footer stats with the scan's own
    * [[Stats.canSkip]]. */
  private def skippedFraction(dir: String, c: String, lo: Long, hi: Long): Double = {
    val conf = new Configuration()
    val files = graft.sources.GraftDataSource.listFiles(conf, dir)
    val filter = FAnd(FGt(c, lo), FLt(c, hi))
    val chunks = files.flatMap { f =>
      val r = GraftFileReader.open(f.getFileSystem(conf), f)
      try r.footer.chunks.flatMap(_.tables).toList finally r.close()
    }
    val skipped = chunks.count { t =>
      val stats = t.schema.fieldNames.zip(t.stats).toMap
      Stats.canSkip(filter, t.schema, stats, t.numRows)
    }
    assert(chunks.size >= 16, s"want many small chunks, got ${chunks.size}")
    skipped.toDouble / chunks.size
  }

  test("range filters on both clustered columns prune; content preserved") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // two independent pseudo-random uniform columns: a plain sort could
    // serve only one of them
    val df = spark.range(0, 100000).selectExpr(
      "id", "(id * 7919) % 1000 AS x", "(id * 104729) % 1000 AS y")
    df.repartition(8).write.format("graft").option("chunkrows", "2048")
      .mode("overwrite").save(dir)
    val before = canon(spark.read.format("graft").load(dir))

    FormatOps.cluster(spark, dir, "data", Seq("x", "y"),
      targetFiles = 4, writeOptions = Map("chunkrows" -> "2048"))

    // pure reordering: every row survives exactly once
    assert(canon(spark.read.format("graft").load(dir)) == before)
    // a 5%-wide slice on EITHER dimension prunes well over half the
    // chunks (z-tiles bound both coordinates); pre-clustering the data
    // was written in id order, where x and y ranges span every chunk
    val fx = skippedFraction(dir, "x", 100, 150)
    val fy = skippedFraction(dir, "y", 700, 750)
    assert(fx > 0.5, f"x-slice skipped only ${fx * 100}%.0f%% of chunks")
    assert(fy > 0.5, f"y-slice skipped only ${fy * 100}%.0f%% of chunks")
    // filtered results stay correct under all that skipping
    val got = spark.read.format("graft").load(dir)
      .filter(col("x") > 100 && col("x") < 150).agg(sum("id"), count(lit(1))).head
    val want = df.filter(col("x") > 100 && col("x") < 150)
      .agg(sum("id"), count(lit(1))).head
    assert(got == want)
  }

  test("unknown table or column refuses loudly") {
    val dir = Files.createTempDirectory("graft-zorder-bad").toString
    spark.range(0, 100).selectExpr("id", "id AS a", "id AS b")
      .write.format("graft").mode("overwrite").save(dir)
    intercept[IllegalArgumentException] {
      FormatOps.cluster(spark, dir, "nosuch", Seq("a", "b"), 2)
    }
    intercept[IllegalArgumentException] {
      FormatOps.cluster(spark, dir, "data", Seq("a", "zz"), 2)
    }
  }
}
