package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.GraftDataSource

/** Bucket-preserving merge-on-read UPDATE/MERGE: replacement rows are
  * clustered by the declared bucket key, routed through the bucketed
  * writer, and land as bucket-TAGGED files — so the storage-partitioned
  * join claim survives a keyed upsert stream with O(changed rows) write
  * cost instead of COW whole-file rewrites (r15 verdict item 2). */
class MorBucketUpdateSpec extends SparkSpec {
  private val conf = new Configuration()

  private def mkCatalog(name: String): String = {
    val root = Files.createTempDirectory(s"graft-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    root
  }

  private def withMor[T](body: => T): T = {
    Seq("updateMode", "mergeMode").foreach(k =>
      spark.conf.set(s"spark.graft.$k", "merge-on-read"))
    try body finally Seq("updateMode", "mergeMode").foreach(k =>
      spark.conf.set(s"spark.graft.$k", "copy-on-write"))
  }

  private def files(dir: String): Map[String, Long] =
    GraftDataSource.listPartitionedSized(conf, dir)
      .map { case (p, size, _) => p.getName -> size }.toMap

  private def dvRows(dir: String): Long = {
    val resolved = GraftDataSource.resolveDataDir(conf, dir)
    GraftDataSource.readDvManifest(
      new Path(resolved).getFileSystem(conf), new Path(resolved)).map(_._4).sum
  }

  test("MoR UPDATE on a bucketed+sorted table adds only bucket-tagged files") {
    val root = mkCatalog("morb1")
    spark.sql("CREATE TABLE morb1.db.t (k BIGINT, v DOUBLE) USING graft " +
      "PARTITIONED BY (bucket(8, k))")
    spark.range(0, 8000).selectExpr("id AS k", "CAST(id % 13 AS DOUBLE) AS v")
      .repartition(8, col("k")).writeTo("morb1.db.t").append()
    val dir = s"$root/db"
    val before = files(dir)
    assert(before.nonEmpty && before.keySet.forall(
      GraftDataSource.bucketOf(_, 8,
        graft.sources.GraftBucket.layoutTag("t", "k", 8, None)).isDefined),
      s"seed write must be bucket-tagged: ${before.keySet}")

    withMor {
      spark.sql("UPDATE morb1.db.t SET v = -1.0 WHERE k % 250 = 7")
    }

    val after = files(dir)
    // originals byte-identical (MoR, not COW)
    before.foreach { case (n, sz) =>
      assert(after.get(n).contains(sz), s"$n was rewritten, not DV'd") }
    // the replacement files are new AND carry the same layout tag
    val fresh = after.keySet -- before.keySet
    assert(fresh.nonEmpty, "UPDATE wrote no replacement files")
    val tag = graft.sources.GraftBucket.layoutTag("t", "k", 8, None)
    fresh.foreach { n =>
      assert(GraftDataSource.bucketOf(n, 8, tag).isDefined,
        s"replacement file $n is not bucket-tagged — layout claim broken")
    }
    assert(dvRows(dir) == (0 until 8000).count(_ % 250 == 7))
    // content: updated rows read back, untouched rows intact
    val t = spark.table("morb1.db.t")
    assert(t.where(col("v") === -1.0).count() == (0 until 8000).count(_ % 250 == 7))
    assert(t.count() == 8000)
    // replacement rows landed in the bucket their key hashes to: read
    // each fresh file raw and recompute the id
    fresh.foreach { n =>
      val b = GraftDataSource.bucketOf(n, 8, tag).get
      val abs = GraftDataSource.listPartitionedSized(conf, dir)
        .map(_._1).find(_.getName == n).get
      val rows = spark.read.format("graft").option("table", "t")
        .load(abs.getParent.toString)
        .where(input_file_name().contains(n)).select("k").collect()
      rows.foreach { r =>
        assert(graft.sources.GraftBucket.id(r.getLong(0),
          org.apache.spark.sql.types.LongType, 8) == b,
          s"row ${r.getLong(0)} in bucket-$b file hashes elsewhere")
      }
    }
  }

  test("keyed MERGE upsert keeps the storage-partitioned join exchange-free") {
    val root = mkCatalog("morb2")
    // one namespace per table: the key-grouped claim requires a table to
    // own its directory (same layout as q100's SPJ fixture)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morb2.f")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morb2.d")
    spark.sql("CREATE TABLE morb2.f.fact (k BIGINT, qty DOUBLE) USING graft " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE morb2.d.dim (k BIGINT, name STRING) USING graft " +
      "PARTITIONED BY (bucket(8, k))")
    spark.range(0, 6000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS qty")
      .repartition(8, col("k")).writeTo("morb2.f.fact").append()
    spark.range(0, 6000).selectExpr("id AS k", "concat('n', id) AS name")
      .repartition(8, col("k")).writeTo("morb2.d.dim").append()
    val dir = s"$root/f"
    val before = files(dir)

    spark.range(0, 7000).filter(col("id") % 111 === 5)
      .selectExpr("id AS k", "CAST(-7 AS DOUBLE) AS q")
      .createOrReplaceTempView("morb2_batch")
    withMor {
      spark.sql("""MERGE INTO morb2.f.fact t USING morb2_batch b ON t.k = b.k
        |WHEN MATCHED THEN UPDATE SET qty = b.q
        |WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (b.k, b.q)""".stripMargin)
    }

    val after = files(dir)
    before.foreach { case (n, sz) =>
      assert(after.get(n).contains(sz), s"$n was rewritten, not DV'd") }
    val tag = graft.sources.GraftBucket.layoutTag("fact", "k", 8, None)
    (after.keySet -- before.keySet).foreach { n =>
      assert(GraftDataSource.bucketOf(n, 8, tag).isDefined,
        s"replacement file $n is not bucket-tagged")
    }
    // both matched updates and brand-new keys landed
    val t = spark.table("morb2.f.fact")
    val upserted = (0 until 7000).count(_ % 111 == 5)
    assert(t.where(col("qty") === -7.0).count() == upserted)
    assert(t.count() == 6000 + (6000 until 7000).count(_ % 111 == 5))

    // the join on the bucket key still plans ZERO shuffles with DVs live
    // and replacement files in the mix (AQE off so the plan is final)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.morb2", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.morb2.root", root)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val j = s.sql("""SELECT f.k, f.qty, d.name FROM morb2.f.fact f
      |JOIN morb2.d.dim d ON f.k = d.k WHERE f.qty = -7.0""".stripMargin)
    val exchanges = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    assert(exchanges == 0,
      s"bucketed join shuffles after MoR MERGE:\n${j.queryExecution.executedPlan}")
    assert(j.count() == (0 until 6000).count(_ % 111 == 5))
  }

  test("declared sort column survives: replacement files arrive key-sorted") {
    val root = mkCatalog("morb3")
    // path-level bucket + sort marker (the SQL DDL takes only bucket);
    // seed through the path API exactly as q100 does
    val dir = s"$root/db"
    spark.range(0, 4000).selectExpr("id AS k", "id % 3 AS v")
      .repartition(4, col("k")).sortWithinPartitions(col("k"))
      .write.format("graft").option("table", "t")
      .option("bucketBy", "k:4").option("sortBy", "k")
      .mode("overwrite").save(dir)
    val before = files(dir)
    withMor {
      spark.sql(s"UPDATE morb3.db.t SET v = -9 WHERE k % 333 = 11")
    }
    val after = files(dir)
    before.foreach { case (n, sz) =>
      assert(after.get(n).contains(sz), s"$n was rewritten, not DV'd") }
    val tag = graft.sources.GraftBucket.layoutTag("t", "k", 4, Some("k"))
    val fresh = after.keySet -- before.keySet
    assert(fresh.nonEmpty && fresh.forall(
      GraftDataSource.bucketOf(_, 4, tag).isDefined),
      s"sorted-bucket replacement files missing/untagged: $fresh")
    val t = spark.table("morb3.db.t")
    assert(t.where(col("v") === -9).count() == (0 until 4000).count(_ % 333 == 11))
    assert(t.count() == 4000)
  }
}
