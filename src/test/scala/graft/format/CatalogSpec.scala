package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** GraftCatalog: SQL access to multi-table graft files. */
class CatalogSpec extends SparkSpec {

  private def writeMultiTable(dir: String): Unit = {
    val file = new Path(s"$dir/db1/chunked.graft")
    val fs = file.getFileSystem(new Configuration())
    fs.mkdirs(file.getParent)
    val out = fs.create(file, true)
    val w = new GraftFileWriter(out)
    val sA = StructType(Seq(StructField("k", LongType), StructField("name", StringType)))
    val sB = StructType(Seq(StructField("k", LongType), StructField("score", DoubleType)))
    val ta = new TableBuffer("users", sA)
    val tb = new TableBuffer("scores", sB)
    val encA = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(sA).createSerializer()
    val encB = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(sB).createSerializer()
    (0 until 50).foreach(i => ta.appendRow(encA(Row(i.toLong, s"u$i")).copy()))
    (0 until 50).foreach(i => tb.appendRow(encB(Row(i.toLong, i * 1.5)).copy()))
    w.writeChunk(Seq(ta, tb))
    w.finish()
    out.close()
  }

  test("SQL over catalog namespaces, tables, and cross-table joins") {
    val root = Files.createTempDirectory("graft-cat").toString
    writeMultiTable(root)
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", root)
    // both tables of ONE file, joined in SQL through the catalog
    val joined = spark.sql(
      """SELECT u.name, s.score
        |FROM graft_cat.db1.users u JOIN graft_cat.db1.scores s ON u.k = s.k
        |WHERE s.score > 60 ORDER BY u.name""".stripMargin)
    val rows = joined.collect()
    assert(rows.length == 9) // k=41..49: score 61.5..73.5
    assert(rows.head.getString(0) == "u41")
    // catalog surface
    assert(spark.sql("SHOW NAMESPACES IN graft_cat").collect().map(_.getString(0)).contains("db1"))
    val tables = spark.sql("SHOW TABLES IN graft_cat.db1").collect().map(_.getString(1)).toSet
    assert(tables == Set("users", "scores"))
  }
}
