package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter}

import graft.SparkSpec
import graft.sources.{GraftDataSource, GraftPartitionReader}

/** Pushdown must SURVIVE schema evolution, not just stay correct under
  * it. A pre-rename file records zone maps, blooms, and block stats
  * under the OLD spelling; pushed filters arrive under the CURRENT one.
  * Without per-file name translation every rename silently turns a
  * pruned scan into a full scan until the next rewrite heals the names —
  * at 100 TB that's the difference between one task and a cluster wave.
  * Files that PREDATE an added column read it as all-null, which proves
  * outright skips for comparison filters. */
class PushdownRenameSpec extends SparkSpec {

  private def conf = new Configuration()

  private def filesOf(dir: String): Set[Path] =
    GraftDataSource.listPartitionedSized(conf, dir).map(_._1).toSet

  private def driveReader(p: Path, declared: org.apache.spark.sql.types.StructType,
      fls: Array[Filter]): Int = {
    val rd = new GraftPartitionReader(p.getFileSystem(conf), p, declared, None, fls, -1)
    var batches = 0
    try { while (rd.next()) batches += 1 } finally rd.close()
    batches
  }

  test("chunk skipping resolves through the rename chain on pre-rename files") {
    val root = Files.createTempDirectory("graft-pushren").toString
    spark.conf.set("spark.sql.catalog.graft_pr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pr.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pr.db")
    spark.sql("CREATE TABLE graft_pr.db.t (id BIGINT, v BIGINT) USING graft")
    spark.range(0, 40000).selectExpr("id", "id AS v")
      .repartitionByRange(4, col("v")).sortWithinPartitions("v")
      .writeTo("graft_pr.db.t").append()
    val preFiles = filesOf(s"$root/db")
    spark.sql("ALTER TABLE graft_pr.db.t RENAME COLUMN v TO val")
    spark.range(40000, 50000).selectExpr("id", "id AS val")
      .writeTo("graft_pr.db.t").append()

    val declared = spark.table("graft_pr.db.t").schema
    assert(Evolution.renamed(declared("val")), "chain metadata must ride the schema")
    // a pre-rename file, driven directly with a CURRENT-name filter that
    // its old-name zone maps disprove: zero batches decoded
    val lowFile = preFiles.find(p =>
      driveReader(p, declared, Array(EqualTo("val", 0L))) > 0).get
    assert(driveReader(lowFile, declared, Array(EqualTo("val", 39999L))) == 0,
      "pre-rename file must skip via old-name stats resolved through the chain")
    // correctness over the mixed table with the skip in play
    val t = spark.table("graft_pr.db.t")
    assert(t.filter(col("val") === 39999L).count() == 1L)
    assert(t.filter(col("val") === 123L).count() == 1L)
    assert(t.filter(col("val") === 45000L).count() == 1L)
    assert(t.filter(col("val") < 100L).count() == 100L)
    assert(t.count() == 50000L)
  }

  test("footer-answered aggregates and top-k survive a rename") {
    val root = Files.createTempDirectory("graft-pragg").toString
    spark.conf.set("spark.sql.catalog.graft_pg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pg.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pg.db")
    spark.sql("CREATE TABLE graft_pg.db.t (id BIGINT, v BIGINT) USING graft")
    spark.range(0, 30000).selectExpr("id", "id AS v").repartition(3)
      .writeTo("graft_pg.db.t").append()
    spark.sql("ALTER TABLE graft_pg.db.t RENAME COLUMN v TO val")
    spark.range(30000, 31000).selectExpr("id", "id AS val")
      .writeTo("graft_pg.db.t").append()

    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // aggregates answer from footers ACROSS the rename: pre-rename
    // files' stats resolve through the chain carried in the spec.
    // (SUM of BIGINT stays unpushed under ANSI — wrap semantics — which
    // is the pre-existing decline, not a rename one.)
    val agg = spark.sql(
      "SELECT min(val), max(val), count(val) FROM graft_pg.db.t")
    assert(plan(agg).contains("pushedAggs="),
      s"renamed column must not decline footer aggregates:\n${plan(agg)}")
    val r = agg.head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 30999L)
    assert(r.getLong(2) == 31000L)
    assert(spark.sql("SELECT sum(val) FROM graft_pg.db.t").head().getLong(0)
      == 31000L * 30999L / 2)
    // pushed top-k keeps skipping via the chain
    val top = spark.table("graft_pg.db.t").orderBy(col("val").desc).limit(3)
    assert(plan(top).contains("pushedTopN=[val DESC k=3]"), plan(top))
    assert(top.collect().map(_.getAs[Long]("val")).toSeq ==
      Seq(30999L, 30998L, 30997L))
    val bottom = spark.table("graft_pg.db.t").orderBy(col("val")).limit(2)
    assert(bottom.collect().map(_.getAs[Long]("val")).toSeq == Seq(0L, 1L))
  }

  test("planning-time manifest pruning survives a rename (files unscheduled)") {
    val root = Files.createTempDirectory("graft-prplan").toString
    spark.conf.set("spark.sql.catalog.graft_pp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pp.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pp.db")
    spark.sql("CREATE TABLE graft_pp.db.t (id BIGINT, v BIGINT) USING graft")
    spark.range(0, 40000).selectExpr("id", "id AS v")
      .repartitionByRange(8, col("v")).sortWithinPartitions("v")
      .writeTo("graft_pp.db.t").append()
    // a tiny DML creates the stats-carrying manifest (q136's technique)
    graft.operators.FormatOps.updateWhere(spark, s"$root/db", "t",
      Map("id" -> col("id")), col("v") === 1L)
    spark.sql("ALTER TABLE graft_pp.db.t RENAME COLUMN v TO w")

    val g = spark.table("graft_pp.db.t")
    assert(g.schema.fieldNames.toSeq == Seq("id", "w"))
    val sel = g.filter(col("w") === 39999L)
    val files = sel.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.collect {
          case p: graft.sources.GraftInputPartition => Seq(p.file)
          case p: graft.sources.GraftPackedPartition => p.files.map(_._1)
        }.flatten
    }.flatten
    assert(files.size <= 2,
      s"selective renamed-column filter must prune carried files, scheduled $files")
    assert(sel.count() == 1L)
  }

  test("files predating ADD COLUMN prune outright on a new-column filter") {
    val root = Files.createTempDirectory("graft-prabsent").toString
    spark.conf.set("spark.sql.catalog.graft_pa", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pa.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pa.db")
    spark.sql("CREATE TABLE graft_pa.db.t (id BIGINT) USING graft")
    spark.range(0, 20000).selectExpr("id").repartition(3)
      .writeTo("graft_pa.db.t").append()
    val preFiles = filesOf(s"$root/db")
    spark.sql("ALTER TABLE graft_pa.db.t ADD COLUMN flag BIGINT")
    spark.range(20000, 21000).selectExpr("id", "id % 7 AS flag")
      .writeTo("graft_pa.db.t").append()

    val declared = spark.table("graft_pa.db.t").schema
    // direct drive: a pre-ADD file decodes ZERO batches for flag = 3
    // (the column is provably all-null there)
    preFiles.foreach { p =>
      assert(driveReader(p, declared, Array(EqualTo("flag", 3L))) == 0,
        s"pre-ADD file $p must skip on an added-column comparison")
    }
    // IsNull must NOT skip (it matches everything in pre-ADD files)
    assert(preFiles.exists(p => driveReader(p, declared,
      Array(org.apache.spark.sql.sources.IsNull("flag"))) > 0))
    val t = spark.table("graft_pa.db.t")
    assert(t.filter(col("flag") === 3L).count() ==
      (20000 until 21000).count(_ % 7 == 3).toLong)
    assert(t.filter(col("flag").isNull).count() == 20000L)
  }

  test("nested leaf: renamed struct field still prunes pre-rename files") {
    val root = Files.createTempDirectory("graft-prnest").toString
    spark.conf.set("spark.sql.catalog.graft_pn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pn.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pn.db")
    spark.sql("CREATE TABLE graft_pn.db.t (id BIGINT, " +
      "meta STRUCT<source: STRING, w: BIGINT>) USING graft")
    spark.sql("INSERT INTO graft_pn.db.t SELECT id, " +
      "named_struct('source', concat('site', CAST(id % 3 AS STRING)), 'w', id) " +
      "FROM range(5000)")
    val preFiles = filesOf(s"$root/db")
    spark.sql("ALTER TABLE graft_pn.db.t RENAME COLUMN meta.source TO origin")

    val declared = spark.table("graft_pn.db.t").schema
    // pre-rename file: a disprovable CURRENT-name nested filter skips
    // through the chain (stats live under meta.source in the footer)
    preFiles.foreach { p =>
      assert(driveReader(p, declared, Array(EqualTo("meta.origin", "zzz"))) == 0,
        s"nested rename must not disable pruning on $p")
    }
    assert(spark.table("graft_pn.db.t")
      .filter(col("meta.origin") === "site1").count() ==
      (0 until 5000).count(_ % 3 == 1).toLong)
  }
}
