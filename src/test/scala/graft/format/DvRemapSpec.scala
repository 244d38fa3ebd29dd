package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The delete-vector ordinal-remap read path
  * ([[graft.sources.RemappedColumnVector]], r16): kept ranges decode
  * whole and survivors read through a zero-copy index map, replacing
  * the per-survivor-run range shredding that went quadratic on
  * scattered DVs. These tests pin the behaviors the shredding path got
  * for free and the remap must re-prove:
  *   - nested columns (struct / array / map) read correctly through
  *     the recursive child remap — struct children are addressed by
  *     the PARENT's row id, array/map children by offsets;
  *   - `_pos` stays the PHYSICAL ordinal (the DV coordinate space),
  *     never the post-filter logical row number;
  *   - a pushed LIMIT truncates the survivor map (never under- or
  *     over-delivers vs the live row count);
  *   - pushed top-k over a DV'd table never resurrects a deleted row
  *     (chunk stats include deleted rows — skipping stays conservative);
  *   - a fully-deleted chunk emits nothing;
  *   - dense + scattered stacked deletes (the measured 16x shape at
  *     sf1) stay exact. */
class DvRemapSpec extends SparkSpec {

  private def mkCatalog(name: String): String = {
    val root = Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    root
  }

  private def withMor[T](body: => T): T = {
    spark.conf.set("spark.graft.deleteMode", "merge-on-read")
    try body finally spark.conf.set("spark.graft.deleteMode", "copy-on-write")
  }

  test("nested struct/array/map columns read exactly through stacked scattered DVs") {
    mkCatalog("dvr1")
    spark.range(0, 20000).selectExpr(
      "id AS k",
      "named_struct('a', id * 2, 'b', concat('s', id)) AS st",
      "array(id, id + 1, id + 2) AS ar",
      "map(concat('m', id % 5), id) AS mp",
      "CAST(id AS DECIMAL(12,2)) / 4 AS dec")
      .coalesce(2).createOrReplaceTempView("dvr1_src")
    spark.sql("CREATE TABLE dvr1.db.t AS SELECT * FROM dvr1_src")

    withMor {
      spark.sql("DELETE FROM dvr1.db.t WHERE k % 3 = 1") // scattered, dense
      spark.sql("DELETE FROM dvr1.db.t WHERE k % 7 = 2") // stacked: merges DVs
    }
    val live = spark.table("dvr1.db.t")
      .selectExpr("k", "st.a", "st.b", "ar[2]", "mp[concat('m', k % 5)]",
        "dec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDecimal(5)))
      .sortBy(_._1)
    val expectKeys = (0L until 20000L).filter(k => k % 3 != 1 && k % 7 != 2)
    assert(live.map(_._1).toSeq == expectKeys)
    // spot-check every nested accessor against the construction
    live.foreach { case (k, a, b, ar2, mpv, dec) =>
      assert(a == k * 2 && b == s"s$k" && ar2 == k + 2 && mpv == k,
        s"nested mismatch at k=$k: ($a, $b, $ar2, $mpv)")
      assert((dec.doubleValue * 4).round == k, s"decimal mismatch at k=$k: $dec")
    }
  }

  test("_pos stays the physical ordinal under a DV (the MoR coordinate contract)") {
    mkCatalog("dvr2")
    // single file, naturally ordered: physical ordinal == id
    spark.range(0, 5000).selectExpr("id AS k").coalesce(1)
      .createOrReplaceTempView("dvr2_src")
    spark.sql("CREATE TABLE dvr2.db.t AS SELECT * FROM dvr2_src")
    withMor { spark.sql("DELETE FROM dvr2.db.t WHERE k % 2 = 0") }
    val rows = spark.table("dvr2.db.t").selectExpr("k", "_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.forall { case (k, pos) => pos == k },
      s"_pos must name the physical slot; got ${rows.take(5).toSeq}")
    // a second MoR delete keyed on those _pos values must hit exactly
    // (the DML path itself consumes this contract)
    withMor { spark.sql("DELETE FROM dvr2.db.t WHERE k % 3 = 1") }
    assert(spark.table("dvr2.db.t").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 5000L).filter(k => k % 2 != 0 && k % 3 != 1))
  }

  test("pushed LIMIT under a DV delivers exactly min(limit, live) undeleted rows") {
    mkCatalog("dvr3")
    spark.range(0, 9000).selectExpr("id AS k").coalesce(1)
      .createOrReplaceTempView("dvr3_src")
    spark.sql("CREATE TABLE dvr3.db.t AS SELECT * FROM dvr3_src")
    withMor { spark.sql("DELETE FROM dvr3.db.t WHERE k % 2 = 0") } // 4500 live
    val liveSet = (0L until 9000L).filter(_ % 2 != 0).toSet
    val got = spark.table("dvr3.db.t").limit(1000).collect().map(_.getLong(0))
    assert(got.length == 1000, s"limit under-delivered: ${got.length}")
    assert(got.forall(liveSet.contains), "limit resurrected a deleted row")
    assert(got.distinct.length == got.length, "limit duplicated a row")
    // limit above the live count returns every live row exactly once
    val all = spark.table("dvr3.db.t").limit(100000).collect().map(_.getLong(0))
    assert(all.sorted.toSeq == liveSet.toSeq.sorted)
  }

  test("pushed top-k over a DV'd table never resurrects a deleted row") {
    mkCatalog("dvr4")
    spark.range(0, 30000).selectExpr("id AS k", "id AS score").coalesce(1)
      .createOrReplaceTempView("dvr4_src")
    spark.sql("CREATE TABLE dvr4.db.t AS SELECT * FROM dvr4_src")
    // delete the GLOBAL top 100 — chunk stats still carry their values,
    // so a stats-trusting skip would resurrect them
    withMor { spark.sql("DELETE FROM dvr4.db.t WHERE score >= 29900") }
    val top = spark.table("dvr4.db.t").orderBy(col("score").desc).limit(10)
      .collect().map(_.getLong(1))
    assert(top.toSeq == (29890L until 29900L).reverse,
      s"top-k under DV wrong: ${top.toSeq}")
  }

  test("a fully-deleted chunk emits nothing and the table stays exact") {
    mkCatalog("dvr5")
    // chunkrows 1000 → first chunk = ids 0..999 exactly (single sorted file)
    spark.range(0, 6000).selectExpr("id AS k").coalesce(1)
      .write.format("graft").option("chunkrows", "1000")
      .saveAsTable("dvr5.db.t")
    withMor {
      spark.sql("DELETE FROM dvr5.db.t WHERE k < 1000")  // whole chunk 0
      spark.sql("DELETE FROM dvr5.db.t WHERE k % 11 = 5") // plus scatter
    }
    val got = spark.table("dvr5.db.t").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (1000L until 6000L).filter(_ % 11 != 5))
    assert(spark.table("dvr5.db.t").count() ==
      (1000L until 6000L).count(_ % 11 != 5))
  }
}
