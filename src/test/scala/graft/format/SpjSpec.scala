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
