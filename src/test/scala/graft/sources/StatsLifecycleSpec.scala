package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FormatOps

/** ANALYZE staleness lifecycle: row counts extrapolate under appends,
  * but per-column NDV/histograms don't survive DML churn — every
  * row-churning rewrite bills the rewritten files' bytes against the
  * snapshot, crossing `spark.graft.statsChurnThreshold` stops the scan
  * from serving column stats, `spark.graft.autoReanalyze=true` re-runs
  * ANALYZE in place instead, and row-PRESERVING rewrites (compaction)
  * re-anchor the byte extrapolation without billing churn. */
class StatsLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def conf = new Configuration()

  /** 10k rows over 4 range-partitioned files so a WHERE on id prunes to
    * a strict subset of files (churn must bill only what DML touched). */
  private def buildTable(): String = {
    val dir = Files.createTempDirectory("graft-statslife").toString
    spark.range(0, 10000)
      .selectExpr("id", "CAST(id % 100 AS INT) AS bucket",
        "concat('v', CAST(id % 500 AS STRING)) AS label")
      .repartitionByRange(4, $"id")
      .sortWithinPartitions("id")
      .write.format("graft").mode("overwrite").save(dir)
    dir
  }

  private def servedAttributeStats(dir: String): Map[String, Any] = {
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.read.format("graft").load(dir).filter($"bucket" === 7)
      df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.attributeStats.map { case (a, s) => a.name -> (s: Any) }.toMap
      }.get
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("DML bills churn by touched bytes; crossing the threshold goes stats-dark") {
    val dir = buildTable()
    FormatOps.analyzeTable(spark, dir, exact = true)
    val a0 = GraftDataSource.readColStats(conf, dir, "data").get
    assert(a0.churnedBytes == 0L && a0.churnFraction == 0.0)
    assert(servedAttributeStats(dir).nonEmpty, "fresh snapshot must serve")

    // a file-granular DELETE touches ~1 of 4 files: churn accrues but
    // stays under the 0.5 default threshold — stats keep serving
    FormatOps.deleteWhere(spark, dir, "data", col("id") < 500)
    val a1 = GraftDataSource.readColStats(conf, dir, "data").get
    assert(a1.churnedBytes > 0L, "DML must bill churn")
    assert(a1.churnFraction <= 0.5,
      s"one-of-four-files delete billed ${a1.churnFraction} of the table")
    assert(servedAttributeStats(dir).nonEmpty, "under-threshold churn still serves")

    // an UPDATE touching every row crosses the threshold: the scan must
    // stop serving column stats (a churned NDV misleads join planning)
    FormatOps.updateWhere(spark, dir, "data",
      Map("label" -> lit("x")), col("id") >= 0)
    val a2 = GraftDataSource.readColStats(conf, dir, "data").get
    assert(a2.churnFraction > 0.5, s"full update left churn at ${a2.churnFraction}")
    assert(servedAttributeStats(dir).isEmpty, "over-threshold churn must go dark")

    // ANALYZE resets the lifecycle
    FormatOps.analyzeTable(spark, dir, exact = true)
    val a3 = GraftDataSource.readColStats(conf, dir, "data").get
    assert(a3.churnedBytes == 0L)
    assert(a3.cols("label").ndv == 1L, "re-analyze must see the post-DML world")
    assert(servedAttributeStats(dir).nonEmpty)
  }

  test("compaction is row-preserving: bytes re-anchor, churn stays zero") {
    val dir = buildTable()
    FormatOps.analyzeTable(spark, dir, exact = true)
    val before = GraftDataSource.readColStats(conf, dir, "data").get
    FormatOps.compact(spark, dir, targetFiles = 1)
    val after = GraftDataSource.readColStats(conf, dir, "data").get
    assert(after.churnedBytes == 0L, "compaction must not bill churn")
    val onDisk = GraftDataSource.listPartitionedSized(conf, dir).map(_._2).sum
    assert(after.bytes == onDisk,
      s"bytes must re-anchor to the compacted listing: ${after.bytes} vs $onDisk")
    assert(after.gen == GraftDataSource.readGenPointer(conf, dir))
    assert(after.rows == before.rows)
    // column stats unchanged (sketch bytes compare by content — the
    // Array field makes whole-ColAnalysis equality reference-based)
    assert(after.cols.keySet == before.cols.keySet)
    after.cols.foreach { case (n, c) =>
      val b = before.cols(n)
      assert(c.copy(sketch = None) == b.copy(sketch = None), s"col $n changed")
      assert(c.sketch.map(_.toSeq) == b.sketch.map(_.toSeq), s"col $n sketch changed")
    }
    assert(servedAttributeStats(dir).nonEmpty, "compaction must not dim stats")
  }

  test("autoReanalyze: threshold-crossing DML re-runs ANALYZE in place") {
    val dir = buildTable()
    FormatOps.analyzeTable(spark, dir, exact = true)
    spark.conf.set("spark.graft.autoReanalyze", "true")
    try {
      FormatOps.updateWhere(spark, dir, "data",
        Map("label" -> lit("y")), col("id") >= 0)
      val a = GraftDataSource.readColStats(conf, dir, "data").get
      assert(a.churnedBytes == 0L, "auto re-analyze must reset churn")
      assert(a.cols("label").ndv == 1L, "auto re-analyze must see post-DML values")
      assert(servedAttributeStats(dir).nonEmpty)
    } finally spark.conf.unset("spark.graft.autoReanalyze")
  }

  test("DESCRIBE EXTENDED narrates the lifecycle: fresh → extrapolated → stale") {
    val root = Files.createTempDirectory("graft-statsdesc").toString
    spark.conf.set("spark.sql.catalog.graft_sd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_sd.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sd.db")
    spark.range(0, 5000).selectExpr("id", "CAST(id % 7 AS INT) AS b")
      .createOrReplaceTempView("sd_src")
    spark.sql("CREATE TABLE graft_sd.db.t AS SELECT * FROM sd_src")
    def props(): String = spark.sql("DESCRIBE TABLE EXTENDED graft_sd.db.t")
      .filter($"col_name" === "Table Properties").head().getString(1)
    assert(!props().contains("stats."), "no snapshot yet → no stats properties")
    spark.sql("CALL graft_sd.sys.analyze(ns => 'db', table => 't')")
    assert(props().contains("stats.state=fresh"), props())
    // an append MERGES sketch deltas and re-anchors bytes at commit —
    // the snapshot stays fresh, rows accrue instead of extrapolating
    spark.sql("INSERT INTO graft_sd.db.t SELECT id, CAST(id % 7 AS INT) FROM sd_src")
    assert(props().contains("stats.state=fresh"), props())
    assert(props().contains("stats.rows=10000"), props())
    // an under-threshold DELETE shrinks the listing without a merge:
    // rows extrapolate by byte ratio, state says so
    spark.sql("DELETE FROM graft_sd.db.t WHERE id < 500")
    assert(props().contains("stats.state=extrapolated"), props())
    // churning DML past the threshold: stale, and the message says why
    spark.sql("UPDATE graft_sd.db.t SET b = 0")
    val p = props()
    assert(p.contains("stats.state=stale") && p.contains("column stats disabled"), p)
    spark.sql("CALL graft_sd.sys.analyze(ns => 'db', table => 't')")
    assert(props().contains("stats.state=fresh"), props())
  }

  test("appends age sketch-less columns past the threshold; sketched keep serving") {
    // `score` is a DOUBLE — unsketchable (hll_sketch_agg has no double
    // mapping), so append deltas cannot maintain its stats; `id` is a
    // sketched LONG whose NDV/bounds stay fresh by construction. Appends
    // never bill the churn counter, so without the append signal the
    // score stats would serve stale forever.
    val dir = Files.createTempDirectory("graft-statsappend").toString
    spark.range(0, 10000)
      .selectExpr("id", "CAST(id % 100 AS INT) AS bucket",
        "CAST(id AS DOUBLE) / 7.0 AS score")
      .write.format("graft").mode("overwrite").save(dir)
    FormatOps.analyzeTable(spark, dir, exact = true)
    val fresh = servedAttributeStats(dir)
    assert(fresh.contains("id") && fresh.contains("score"),
      s"freshly analyzed stats must serve both: ${fresh.keySet}")
    // append well past the 0.5 threshold (more than doubles the bytes)
    spark.range(10000, 35000)
      .selectExpr("id", "CAST(id % 100 AS INT) AS bucket",
        "CAST(id AS DOUBLE) / 7.0 AS score")
      .write.format("graft").mode("append").save(dir)
    val a = GraftDataSource.readColStats(conf, dir, "data").get
    assert(a.appendFraction > 0.5, s"appendFraction=${a.appendFraction}")
    val aged = servedAttributeStats(dir)
    assert(aged.contains("id"),
      s"sketch-maintained columns must keep serving: ${aged.keySet}")
    assert(!aged.contains("score"),
      "sketch-less column stats must stop serving once appends age them")
    // DESCRIBE narrates the state
    val props = {
      spark.conf.set("spark.sql.catalog.graft_sa", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_sa.root",
        new java.io.File(dir).getParent)
      // direct table properties through the DSv2 table
      val t = new GraftTable(Seq(dir),
        spark.read.format("graft").load(dir).schema,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap()))
      t.properties()
    }
    assert(props.get("stats.state").startsWith("append-aged"), props.get("stats.state"))
    // ANALYZE resets the signal and score serves again
    FormatOps.analyzeTable(spark, dir, exact = true)
    val reset = servedAttributeStats(dir)
    assert(reset.contains("score") &&
      GraftDataSource.readColStats(conf, dir, "data").get.appendedBytes == 0L)
  }

  test("threshold conf: a 0.0 threshold darkens on the first churned byte") {
    val dir = buildTable()
    FormatOps.analyzeTable(spark, dir, exact = true)
    FormatOps.deleteWhere(spark, dir, "data", col("id") < 500)
    spark.conf.set("spark.graft.statsChurnThreshold", "0.0")
    try assert(servedAttributeStats(dir).isEmpty)
    finally spark.conf.unset("spark.graft.statsChurnThreshold")
    assert(servedAttributeStats(dir).nonEmpty)
  }
}
