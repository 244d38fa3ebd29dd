package graft.format

import java.nio.file.Files

import graft.SparkSpec

/** Nested and positional DDL: RENAME / DROP / widen reach struct
  * LEAVES (the reader resolves them through per-level rename chains,
  * exactly like top-level evolution), ADD COLUMN takes FIRST/AFTER
  * positions and dotted paths into structs, and every refusal that
  * protects top-level columns (claimed names, last-field, layout
  * anchors) applies per struct level. Files written before the DDL
  * keep serving the evolved view — the q51-shaped multimodal metadata
  * struct is where users hit this first. */
class NestedDdlSpec extends SparkSpec {

  private def fresh(cat: String): String = {
    val root = Files.createTempDirectory(s"graft-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    root
  }

  test("RENAME of a struct leaf: pre-rename files keep serving; new writes heal") {
    val cat = "nestren"
    fresh(cat)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, " +
      "meta STRUCT<source: STRING, cnt: INT>) USING graft")
    spark.sql(s"INSERT INTO $cat.db.t VALUES " +
      "(1, named_struct('source', 'web', 'cnt', 10)), " +
      "(2, named_struct('source', 'pdf', 'cnt', 20))")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN meta.source TO origin")
    // visible schema shows the new leaf spelling
    assert(spark.table(s"$cat.db.t").schema("meta").dataType.catalogString
      .contains("origin"))
    // the pre-rename file serves its values under the NEW leaf name
    assert(spark.sql(s"SELECT meta.origin FROM $cat.db.t WHERE id = 1")
      .collect().head.getString(0) == "web")
    // post-rename writes mix with pre-rename files
    spark.sql(s"INSERT INTO $cat.db.t VALUES " +
      "(3, named_struct('origin', 'api', 'cnt', 30))")
    val all = spark.sql(
      s"SELECT id, meta.origin, meta.cnt FROM $cat.db.t ORDER BY id").collect()
    assert(all.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "web", 10), (2L, "pdf", 20), (3L, "api", 30)))
    // filters on the renamed leaf stay correct over mixed files
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.t WHERE meta.origin IN ('web','api')")
      .collect().head.getLong(0) == 2)
    // renaming onto a claimed prior spelling at the same level is refused
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t RENAME COLUMN meta.origin TO source"))
    assert(e.getMessage.contains("already in use"))
    // a rename CHAIN still resolves the oldest files
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN meta.origin TO src2")
    assert(spark.sql(s"SELECT meta.src2 FROM $cat.db.t WHERE id = 1")
      .collect().head.getString(0) == "web")
  }

  test("DROP of a struct leaf: hidden everywhere, re-add refused, last field protected") {
    val cat = "nestdrop"
    fresh(cat)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, " +
      "meta STRUCT<a: STRING, b: INT>) USING graft")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, named_struct('a', 'x', 'b', 7))")
    spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN meta.b")
    val metaType = spark.table(s"$cat.db.t").schema("meta").dataType.catalogString
    assert(!metaType.contains("b:") && metaType.contains("a:"),
      s"dropped leaf still visible in $metaType")
    assert(spark.sql(s"SELECT meta.a FROM $cat.db.t").collect().head.getString(0) == "x")
    // re-adding the tombstoned leaf name is refused (data resurrection)
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t ADD COLUMN meta.b STRING"))
    assert(e.getMessage.contains("already in use"))
    // but the SAME name under a different level is fine
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN b STRING")
    // dropping the struct's last live field is refused
    val last = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t DROP COLUMN meta.a"))
    assert(last.getMessage.contains("last field"))
    // dropping the struct itself remains available
    spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN meta")
    assert(spark.table(s"$cat.db.t").columns.toSeq == Seq("id", "b"))
  }

  test("widen of a struct leaf: old files decode promoted") {
    val cat = "nestwide"
    fresh(cat)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, " +
      "meta STRUCT<w: INT, tag: STRING>) USING graft")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, named_struct('w', 41, 'tag', 'p'))")
    spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN meta.w TYPE BIGINT")
    spark.sql(s"INSERT INTO $cat.db.t VALUES " +
      "(2, named_struct('w', CAST(9000000000 AS BIGINT), 'tag', 'q'))")
    val rows = spark.sql(s"SELECT id, meta.w FROM $cat.db.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 41L), (2L, 9000000000L)))
    // non-lossless nested narrow is refused (Spark's analyzer already
    // rejects narrowing for v2 tables; the catalog guard backstops it)
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t ALTER COLUMN meta.w TYPE INT"))
  }

  test("nested ADD COLUMN with positions; aggregates over mixed files agree") {
    val cat = "nestadd"
    fresh(cat)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, " +
      "meta STRUCT<a: STRING>) USING graft")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, named_struct('a', 'x'))")
    // nested add lands inside the struct; FIRST position honored
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN meta.z INT FIRST")
    val metaType = spark.table(s"$cat.db.t").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaType.fieldNames.toSeq == Seq("z", "a"))
    // old file reads the new leaf as null
    val r = spark.sql(s"SELECT meta.z, meta.a FROM $cat.db.t").collect().head
    assert(r.isNullAt(0) && r.getString(1) == "x")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (2, named_struct('z', 5, 'a', 'y'))")
    assert(spark.sql(s"SELECT sum(meta.z) FROM $cat.db.t")
      .collect().head.getLong(0) == 5L)
    // top-level AFTER anchors mid-schema
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN flag BOOLEAN AFTER id")
    assert(spark.table(s"$cat.db.t").columns.toSeq == Seq("id", "flag", "meta"))
  }

  test("nested DDL composes: rename + widen + add on one struct, mixed-file scan") {
    val cat = "nestmix"
    fresh(cat)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, " +
      "m STRUCT<v: INT, s: STRING>) USING graft")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, named_struct('v', 1, 's', 'a'))")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN m.v TO val")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (2, named_struct('val', 2, 's', 'b'))")
    spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN m.val TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN m.extra STRING")
    spark.sql(s"INSERT INTO $cat.db.t VALUES " +
      "(3, named_struct('val', CAST(3 AS BIGINT), 's', 'c', 'extra', 'e3'))")
    val rows = spark.sql(
      s"SELECT id, m.val, m.s, m.extra FROM $cat.db.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      Option(r.getString(3)))).toSeq == Seq(
      (1L, 1L, "a", None), (2L, 2L, "b", None), (3L, 3L, "c", Some("e3"))))
    assert(spark.sql(s"SELECT sum(m.val) FROM $cat.db.t")
      .collect().head.getLong(0) == 6L)
  }
}
