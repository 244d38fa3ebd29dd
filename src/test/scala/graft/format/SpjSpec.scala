package graft.format

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed graft tables + storage-partitioned joins: the write routes
  * rows to per-bucket files, the scan reports key-grouped partitioning
  * through the catalog's V2 `bucket` function, and Spark plans the
  * bucketed join with NO shuffle on either side.
  */
class SpjSpec extends SparkSpec {

  /** Child session wired for SPJ: graft catalog over `root`, v2
    * bucketing on, broadcast + AQE off so the join plan shape is
    * deterministic and the shuffle assertion meaningful. */
  private def spjSession(root: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.spj_cat", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.spj_cat.root", root)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def writeBucketed(s: SparkSession, root: String): Unit = {
    import s.implicits._
    val facts = (0 until 2000).map(i => (i.toLong % 97, s"item-$i", i * 1.5))
      .toDF("k", "name", "amount")
    val dims = (0 until 97).map(i => (i.toLong, s"dim-$i")).toDF("dk", "label")
    facts.write.format("graft").option("table", "facts")
      .option("bucketBy", "k:8").mode("overwrite").save(s"$root/f")
    dims.write.format("graft").option("table", "dims")
      .option("bucketBy", "dk:8").mode("overwrite").save(s"$root/d")
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize first: plans are final after execution
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
  }

  test("same-spec bucketed join plans with zero shuffles and exact results") {
    val root = Files.createTempDirectory("graft-spj").toString
    val s = spjSession(root)
    writeBucketed(s, root)
    val joined = s.sql("""
      SELECT f.k, count(*) AS n, sum(f.amount) AS total, max(d.label) AS label
      FROM spj_cat.f.facts f JOIN spj_cat.d.dims d ON f.k = d.dk
      GROUP BY f.k""")
    // the JOIN is shuffle-free (storage-partitioned); the groupBy on the
    // same key rides the same key-grouped distribution, so the whole
    // query plans without a single exchange
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
    // correctness against the same join without any bucketing claim
    import s.implicits._
    val facts = (0 until 2000).map(i => (i.toLong % 97, s"item-$i", i * 1.5))
      .toDF("k", "name", "amount")
    val dims = (0 until 97).map(i => (i.toLong, s"dim-$i")).toDF("dk", "label")
    val expect = facts.join(dims, $"k" === $"dk")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("amount").as("total"), max("label").as("label"))
    assert(canon(joined) == canon(expect))
  }

  test("writer routing agrees with the catalog bucket function") {
    val root = Files.createTempDirectory("graft-spj-route").toString
    val s = spjSession(root)
    writeBucketed(s, root)
    // every row read back from bucket file b must hash to b: read each
    // file alone and check its rows' bucket ids
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = graft.sources.GraftDataSource.listFiles(conf, s"$root/f")
    assert(files.nonEmpty)
    val tag = graft.sources.GraftBucket.layoutTag("facts", "k", 8)
    files.foreach { p =>
      val b = graft.sources.GraftDataSource.bucketOf(p.getName, 8, tag)
      assert(b.isDefined, s"unbucketed file name: ${p.getName}")
      val rows = spark.read.format("graft").load(p.toString).select("k").collect()
      rows.foreach { r =>
        assert(graft.sources.GraftBucket.id(r.getLong(0),
          org.apache.spark.sql.types.LongType, 8) == b.get)
      }
    }
  }

  test("an unbucketed append deactivates the key-grouped claim safely") {
    val root = Files.createTempDirectory("graft-spj-mixed").toString
    val s = spjSession(root)
    writeBucketed(s, root)
    import s.implicits._
    // plain append: file has no bucket tag -> scan must stop claiming
    Seq((1000L, "late", 1.0)).toDF("k", "name", "amount")
      .write.format("graft").option("table", "facts").mode("append").save(s"$root/f")
    val joined = s.sql("""
      SELECT f.k, count(*) AS n
      FROM spj_cat.f.facts f JOIN spj_cat.d.dims d ON f.k = d.dk
      GROUP BY f.k""")
    assert(shuffles(joined) > 0) // falls back to a shuffled join
    // and the late row is present in the scan (never silently dropped)
    assert(s.sql("SELECT count(*) AS c FROM spj_cat.f.facts").head.getLong(0) == 2001L)
  }

  test("bucketing claims deactivate when the conf is off or the column is pruned") {
    val root = Files.createTempDirectory("graft-spj-off").toString
    val s = spjSession(root)
    writeBucketed(s, root)
    // conf off: still correct, just shuffled
    val off = spark.newSession()
    off.conf.set("spark.sql.catalog.spj_cat", "graft.sources.GraftCatalog")
    off.conf.set("spark.sql.catalog.spj_cat.root", root)
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    assert(off.sql("SELECT count(*) AS c FROM spj_cat.f.facts").head.getLong(0) == 2000L)
    // bucket column pruned from the read: no partitioning claim, reads fine
    assert(s.sql("SELECT count(DISTINCT name) AS c FROM spj_cat.f.facts").head.getLong(0) == 2000L)
  }

  private def sorts(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.SortExec => e
    }.size
  }

  test("sorted buckets: merge join with zero shuffles AND zero sorts") {
    val root = Files.createTempDirectory("graft-smb").toString
    val s = spjSession(root)
    s.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    import s.implicits._
    val facts = (0 until 2000).map(i => (i.toLong % 97, i * 1.5)).toDF("k", "amount")
      .repartition(8, $"k").sortWithinPartitions("k")
    val dims = (0 until 97).map(i => (i.toLong, s"d-$i")).toDF("dk", "label")
      .repartition(8, $"dk").sortWithinPartitions("dk")
    facts.write.format("graft").option("table", "facts")
      .option("bucketBy", "k:8").option("sortBy", "k").mode("overwrite").save(s"$root/f")
    dims.write.format("graft").option("table", "dims")
      .option("bucketBy", "dk:8").option("sortBy", "dk").mode("overwrite").save(s"$root/d")
    val joined = s.sql("""
      SELECT f.k, d.label, f.amount
      FROM spj_cat.f.facts f JOIN spj_cat.d.dims d ON f.k = d.dk""")
    val plan = joined.queryExecution.executedPlan
    assert(plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isDefined, plan.toString)
    assert(shuffles(joined) == 0, plan.toString)
    assert(sorts(joined) == 0, plan.toString)
    assert(joined.count() == 2000L)
  }

  test("sortBy: unsorted input refuses; second append drops only the sort claim") {
    val root = Files.createTempDirectory("graft-smb2").toString
    val s = spjSession(root)
    s.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    import s.implicits._
    // descending input: the write must fail loudly, not write garbage
    val bad = (0 until 100).map(i => (5L, 100L - i)).toDF("k", "v")
      .coalesce(1)
    val e = intercept[Exception] {
      bad.write.format("graft").option("bucketBy", "k:4").option("sortBy", "v")
        .mode("overwrite").save(s"$root/bad")
    }
    def rootMsg(t: Throwable): String = {
      var c = t; while (c.getCause != null && c.getCause != c) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("out of order") || e.getMessage.contains("out of order"))
    // sortBy without bucketBy refuses
    intercept[Exception] {
      bad.write.format("graft").option("sortBy", "v").mode("overwrite").save(s"$root/bad2")
    }
    // two sorted writes -> two files per bucket: concatenation is not
    // sorted, so the ordering claim must drop (sort reappears) while the
    // shuffle-free join claim stays
    val mk = (0 until 500).map(i => (i.toLong % 23, i.toLong)).toDF("k", "v")
      .repartition(4, $"k").sortWithinPartitions("k", "v")
    mk.write.format("graft").option("table", "t").option("bucketBy", "k:4")
      .option("sortBy", "k").mode("overwrite").save(s"$root/t")
    mk.write.format("graft").option("table", "t").option("bucketBy", "k:4")
      .option("sortBy", "k").mode("append").save(s"$root/t")
    val dim = (0 until 23).map(i => (i.toLong, s"x$i")).toDF("dk", "lbl")
      .repartition(4, $"dk").sortWithinPartitions("dk")
    dim.write.format("graft").option("table", "d").option("bucketBy", "dk:4")
      .option("sortBy", "dk").mode("overwrite").save(s"$root/dd")
    val j = s.sql("SELECT t.k, d.lbl FROM spj_cat.t.t t JOIN spj_cat.dd.d d ON t.k = d.dk")
    assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
    assert(sorts(j) > 0) // honest fallback: files per bucket > 1
    assert(j.count() == 1000L)
  }

  test("SQL DDL: CREATE TABLE PARTITIONED BY bucket(n, col) buckets every INSERT") {
    val root = Files.createTempDirectory("graft-spj-ddl").toString
    val s = spjSession(root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS spj_cat.f2")
    s.sql("CREATE NAMESPACE IF NOT EXISTS spj_cat.d2")
    s.sql("""CREATE TABLE spj_cat.f2.facts (k BIGINT, amount DOUBLE)
             PARTITIONED BY (bucket(8, k))""")
    s.sql("""CREATE TABLE spj_cat.d2.dims (dk BIGINT, label STRING)
             PARTITIONED BY (bucket(8, dk))""")
    // plain INSERT INTO — no write options anywhere: the DDL-declared
    // layout alone must route the rows bucketed
    s.sql("""INSERT INTO spj_cat.f2.facts
             SELECT CAST(id % 37 AS BIGINT), id * 2.0 FROM range(1000)""")
    s.sql("""INSERT INTO spj_cat.d2.dims
             SELECT CAST(id AS BIGINT), concat('d-', id) FROM range(37)""")
    val joined = s.sql("""
      SELECT f.k, count(*) AS n, sum(f.amount) AS total
      FROM spj_cat.f2.facts f JOIN spj_cat.d2.dims d ON f.k = d.dk
      GROUP BY f.k""")
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
    assert(joined.collect().map(_.getLong(1)).sum == 1000L)
    // a second INSERT keeps the layout (appends stay bucketed)
    s.sql("""INSERT INTO spj_cat.f2.facts
             SELECT CAST(id % 37 AS BIGINT), 1.0 FROM range(100)""")
    val again = s.sql("""
      SELECT f.k, count(*) AS n
      FROM spj_cat.f2.facts f JOIN spj_cat.d2.dims d ON f.k = d.dk
      GROUP BY f.k""")
    assert(shuffles(again) == 0, again.queryExecution.executedPlan.toString)
    assert(again.collect().map(_.getLong(1)).sum == 1100L)
  }

  test("compaction restores the sorted-bucket layout; DELETE preserves it") {
    val root = Files.createTempDirectory("graft-smb-compact").toString
    val s = spjSession(root)
    s.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    import s.implicits._
    def facts(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong % 23, i.toLong)).toDF("k", "v")
        .repartition(4, $"k").sortWithinPartitions("v")
    // two sorted writes -> 2 files/bucket: ordering claim suspended
    facts(0, 500).write.format("graft").option("table", "t")
      .option("bucketBy", "k:4").option("sortBy", "v").mode("overwrite").save(s"$root/t")
    facts(500, 1000).write.format("graft").option("table", "t")
      .option("bucketBy", "k:4").option("sortBy", "v").mode("append").save(s"$root/t")
    (0 until 23).map(i => (i.toLong, s"x$i")).toDF("dk", "lbl")
      .repartition(4, $"dk").sortWithinPartitions("dk")
      .write.format("graft").option("table", "d")
      .option("bucketBy", "dk:4").option("sortBy", "dk").mode("overwrite").save(s"$root/dd")
    def join() = s.sql(
      "SELECT t.k, t.v, d.lbl FROM spj_cat.t.t t JOIN spj_cat.dd.d d ON t.k = d.dk")
    assert(shuffles(join()) == 0)
    assert(sorts(join()) > 0) // 2 files/bucket: sort is back, honestly
    // compaction rewrites one sorted file per bucket -> claim restored
    // (sortBy=v: join still sorts by the JOIN key, but the scan-reported
    // v-ordering must be back — verify via the layout itself)
    graft.operators.FormatOps.compact(s, s"$root/t", targetFiles = 99 /* overridden */)
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = graft.sources.GraftDataSource.listFiles(conf, s"$root/t")
    assert(files.size == 4, files.mkString(","))
    val tag = graft.sources.GraftBucket.layoutTag("t", "k", 4, Some("v"))
    assert(files.forall(p =>
      graft.sources.GraftDataSource.bucketOf(p.getName, 4, tag).isDefined))
    // per-file: v ascending within each compacted bucket file
    files.foreach { p =>
      val vs = spark.read.format("graft").load(p.toString).select("v")
        .collect().map(_.getLong(0))
      assert(vs.sameElements(vs.sorted), s"unsorted after compact: ${p.getName}")
    }
    assert(shuffles(join()) == 0)
    assert(join().count() == 1000L)
    // row-level DELETE rides the same rewrite machinery: layout survives
    s.sql("DELETE FROM spj_cat.t.t WHERE v < 100")
    val after = graft.sources.GraftDataSource.listFiles(conf, s"$root/t")
    assert(after.forall(p =>
      graft.sources.GraftDataSource.bucketOf(p.getName, 4, tag).isDefined))
    assert(shuffles(join()) == 0)
    assert(join().count() == 900L)
  }

  test("MoR DELETE on a bucketed table: zero rewrites, DV applied, join still shuffle-free") {
    val root = Files.createTempDirectory("graft-spj-mor").toString
    val s = spjSession(root)
    writeBucketed(s, root)
    val conf = new org.apache.hadoop.conf.Configuration()
    def fileState(dir: String): Map[String, (Long, Long)] =
      graft.sources.GraftDataSource.listPartitionedSized(conf, dir).map { case (p, _, _) =>
        val st = p.getFileSystem(conf).getFileStatus(p)
        p.getName -> (st.getLen, st.getModificationTime)
      }.toMap
    val before = fileState(s"$root/f")
    s.conf.set("spark.graft.deleteMode", "merge-on-read")
    try s.sql("DELETE FROM spj_cat.f.facts WHERE name LIKE 'item-7%'")
    finally s.conf.set("spark.graft.deleteMode", "copy-on-write")
    // a pure position delete writes no rows: every bucket file survives
    // byte-identical (same name = same bucket tag, layout claim intact)
    val after = fileState(s"$root/f")
    assert(after == before, "MoR DELETE on a bucketed table rewrote data files")
    val dvs = graft.sources.GraftDataSource.liveDvs(conf, s"$root/f", Some("facts"))
    assert(dvs.nonEmpty, "expected live delete vectors")
    val deleted = (0 until 2000).count(i => s"item-$i".startsWith("item-7"))
    // the bucketed join stays shuffle-free AND applies the DVs
    val joined = s.sql("""
      SELECT f.k, count(*) AS n
      FROM spj_cat.f.facts f JOIN spj_cat.d.dims d ON f.k = d.dk
      GROUP BY f.k""")
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
    assert(joined.agg(sum("n")).head.getLong(0) == (2000 - deleted).toLong)
    // UPDATE in MoR mode still downgrades to COW on a bucketed table
    // (replacement rows must keep the clustered layout): data files DO
    // change, and no new DV entries appear beyond the delete's
    s.conf.set("spark.graft.updateMode", "merge-on-read")
    try s.sql("UPDATE spj_cat.f.facts SET amount = amount + 1 WHERE k = 5")
    finally s.conf.set("spark.graft.updateMode", "copy-on-write")
    val tag = graft.sources.GraftBucket.layoutTag("facts", "k", 8)
    val files2 = graft.sources.GraftDataSource.listFiles(conf, s"$root/f")
    assert(files2.forall(p =>
      graft.sources.GraftDataSource.bucketOf(p.getName, 8, tag).isDefined),
      "bucket layout lost after COW UPDATE")
    val joined2 = s.sql("""
      SELECT f.k, count(*) AS n
      FROM spj_cat.f.facts f JOIN spj_cat.d.dims d ON f.k = d.dk
      GROUP BY f.k""")
    assert(shuffles(joined2) == 0, "layout claim lost after COW UPDATE under MoR conf")
    assert(joined2.agg(sum("n")).head.getLong(0) == (2000 - deleted).toLong)
  }

  test("DROP TABLE clears the bucket spec; unbucketed overwrite resets the layout") {
    val root = Files.createTempDirectory("graft-spj-lifecycle").toString
    val s = spjSession(root)
    import s.implicits._
    // DDL lifecycle: drop must not leak the layout into a recreated table
    s.sql("CREATE NAMESPACE IF NOT EXISTS spj_cat.lc")
    s.sql("CREATE TABLE spj_cat.lc.t (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    s.sql("INSERT INTO spj_cat.lc.t SELECT CAST(id AS BIGINT), concat('v', id) FROM range(100)")
    s.sql("DROP TABLE spj_cat.lc.t")
    s.sql("CREATE TABLE spj_cat.lc.t (a BIGINT, b STRING)") // no k, no bucket
    s.sql("INSERT INTO spj_cat.lc.t SELECT CAST(id AS BIGINT), 'x' FROM range(10)")
    assert(s.sql("SELECT count(*) c FROM spj_cat.lc.t").head.getLong(0) == 10L)
    // oversized bucket counts refuse at DDL time, not at first use
    intercept[Exception] {
      s.sql("CREATE TABLE spj_cat.lc.big (k BIGINT) PARTITIONED BY (bucket(2000000, k))")
    }
    // path lifecycle: a plain overwrite resets the declared layout, so a
    // later compaction must NOT try to re-bucket by a long-gone column
    val dir = s"$root/reset"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft").option("bucketBy", "k:4").mode("overwrite").save(dir)
    Seq(("x", 1.0), ("y", 2.0)).toDF("name", "score") // k no longer exists
      .write.format("graft").mode("overwrite").save(dir)
    graft.operators.FormatOps.compact(s, dir, targetFiles = 1)
    assert(spark.read.format("graft").load(dir).count() == 2L)
  }

  test("a delete-everything rewrite keeps a bucketed table self-describing") {
    val root = Files.createTempDirectory("graft-spj-empty").toString
    val s = spjSession(root)
    import s.implicits._
    val dir = s"$root/t"
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(4, $"k")
      .write.format("graft").option("table", "t").option("bucketBy", "k:4")
      .mode("overwrite").save(dir)
    graft.operators.FormatOps.updateWhere(s, dir, "t",
      Map.empty, org.apache.spark.sql.functions.lit(false)) // no-op touchpoint
    s.sql(s"DELETE FROM spj_cat.t.t WHERE k >= 0") // removes every row
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 0L)
    assert(back.schema.fieldNames.toSeq == Seq("k", "v")) // still self-describing
  }

  test("bucketBy validation: bad specs and illegal combinations refuse loudly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    val dir = Files.createTempDirectory("graft-spj-bad").toString
    def fails(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      assert(e.getMessage != null)
    }
    fails(df.write.format("graft").option("bucketBy", "k").mode("overwrite").save(s"$dir/a"))
    fails(df.write.format("graft").option("bucketBy", "nope:8").mode("overwrite").save(s"$dir/b"))
    fails(df.write.format("graft").option("bucketBy", "k:0").mode("overwrite").save(s"$dir/c"))
    fails(df.write.format("graft").option("bucketBy", "k:8").option("partitionBy", "v")
      .mode("overwrite").save(s"$dir/d"))
    fails(df.write.format("graft").option("bucketBy", "k:8")
      .option("tables", "x:k;y:v").mode("overwrite").save(s"$dir/e"))
  }
}
