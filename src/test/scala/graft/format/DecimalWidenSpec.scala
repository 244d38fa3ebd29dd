package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Decimal widening under ALTER COLUMN TYPE: precision and scale may
  * only GROW (integer digits non-shrinking), so every stored unscaled
  * value rescales exactly. Old files decode promoted — including the
  * i64-unscaled → 16-byte-binary physical transition at p=18→19 — and
  * zone-map pruning on the widened column stays sound across scales. */
class DecimalWidenSpec extends SparkSpec {

  private def fresh(cat: String): Unit = {
    val root = Files.createTempDirectory(s"graft-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  test("precision growth within the i64 domain: old files decode promoted") {
    fresh("decw1")
    spark.sql("CREATE TABLE decw1.db.t (id BIGINT, amt DECIMAL(10,2)) USING graft")
    spark.sql("INSERT INTO decw1.db.t VALUES (1, 12345678.91), (2, -0.07)")
    spark.sql("ALTER TABLE decw1.db.t ALTER COLUMN amt TYPE DECIMAL(16,2)")
    spark.sql("INSERT INTO decw1.db.t VALUES (3, 99999999999999.99)")
    val rows = spark.sql("SELECT id, amt FROM decw1.db.t ORDER BY id").collect()
    assert(rows.map(r => r.getDecimal(1).toPlainString).toSeq ==
      Seq("12345678.91", "-0.07", "99999999999999.99"))
    assert(spark.sql("SELECT sum(amt) FROM decw1.db.t").head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("100000012345678.83")) == 0)
  }

  test("crossing the physical boundary (p<=18 to p>18) and growing scale") {
    fresh("decw2")
    spark.sql("CREATE TABLE decw2.db.t (id BIGINT, amt DECIMAL(18,2)) USING graft")
    spark.sql("INSERT INTO decw2.db.t VALUES (1, 9999999999999999.99), (2, 1.25)")
    // p 18→24 flips the stored width from unscaled i64 to 16-byte binary
    // for NEW files; old files keep decoding their i64 form promoted.
    // Scale also grows 2→4: unscaled values rescale ×100 exactly.
    spark.sql("ALTER TABLE decw2.db.t ALTER COLUMN amt TYPE DECIMAL(24,4)")
    spark.sql("INSERT INTO decw2.db.t VALUES (3, 12345678901234567890.1234)")
    val rows = spark.sql("SELECT id, amt FROM decw2.db.t ORDER BY id").collect()
    assert(rows.map(r => r.getDecimal(1).toPlainString).toSeq ==
      Seq("9999999999999999.9900", "1.2500", "12345678901234567890.1234"))
    // filters over mixed physical forms: zone maps compare through
    // BigDecimal, scale-aware — exact counts, no lost rows
    val t = spark.table("decw2.db.t")
    assert(t.filter(col("amt") > lit(new java.math.BigDecimal("2"))).count() == 2L)
    assert(t.filter(col("amt") === lit(new java.math.BigDecimal("1.25"))).count() == 1L)
  }

  test("narrowing and integer-digit-shrinking refuse") {
    fresh("decw3")
    spark.sql("CREATE TABLE decw3.db.t (id BIGINT, amt DECIMAL(12,2)) USING graft")
    // fewer integer digits (12-2=10 → 11-3=8) would overflow stored values
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE decw3.db.t ALTER COLUMN amt TYPE DECIMAL(11,3)"))
    assert(e1.getMessage.toLowerCase.contains("wide") ||
      e1.getMessage.contains("NOT_SUPPORTED_CHANGE"), e1.getMessage)
    // shrinking scale rounds — refused
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE decw3.db.t ALTER COLUMN amt TYPE DECIMAL(12,1)"))
    assert(e2.getMessage.toLowerCase.contains("wide") ||
      e2.getMessage.contains("NOT_SUPPORTED_CHANGE"), e2.getMessage)
  }

  test("nested decimal leaf widens through the dotted DDL path") {
    fresh("decw4")
    spark.sql("CREATE TABLE decw4.db.t (id BIGINT, " +
      "m STRUCT<amt: DECIMAL(10,2), tag: STRING>) USING graft")
    spark.sql("INSERT INTO decw4.db.t VALUES (1, named_struct('amt', " +
      "CAST(7.77 AS DECIMAL(10,2)), 'tag', 'a'))")
    spark.sql("ALTER TABLE decw4.db.t ALTER COLUMN m.amt TYPE DECIMAL(20,2)")
    spark.sql("INSERT INTO decw4.db.t VALUES (2, named_struct('amt', " +
      "CAST(123456789012345678.99 AS DECIMAL(20,2)), 'tag', 'b'))")
    val rows = spark.sql(
      "SELECT id, m.amt FROM decw4.db.t ORDER BY id").collect()
    assert(rows.map(_.getDecimal(1).toPlainString).toSeq ==
      Seq("7.77", "123456789012345678.99"))
  }
}
