package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-phase attribution of the CDC/maintenance COMMIT cost.
  *
  * q113/q114/q118/q134 run many SMALL commits, so their wall time is
  * dominated by per-commit fixed work (listings, classification,
  * manifest folds, sidecar round-trips, pointer swaps), not by data
  * volume. This harness runs q114-shaped cycles — a small captured
  * upsert against the source table, then the aggregate fold's
  * copy-on-write rewrite of the 5-row view — with [[graft.sources.Prof]]
  * enabled, and prints ms/call per phase plus the listing counter.
  *
  * Usage: runMain graft.ProfileCommit [sfDir] [cycles]
  */
object ProfileCommit {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.profile", "true")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cycles = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.FormatOps
    import graft.sources.{GraftDataSource, Prof}

    val dir = "/tmp/graft_profcommit/src"
    val viewDir = "/tmp/graft_profcommit/view"
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(dir, viewDir).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
    }
    Tables.orders(spark, sfDir).repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val money = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    spark.read.format("graft").load(dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("o_totalprice"))).cast("decimal(20,2)").as("total"))
      .write.format("graft").mode("overwrite").save(viewDir)

    def cycle(i: Int): Unit = {
      val o = Tables.orders(spark, sfDir)
      // a small keyed batch — the q114/q118 shape: commits vastly
      // outnumber rows per commit
      val batch = o.filter(col("o_orderkey") % 1009 === (i % 997))
        .withColumn("o_totalprice", col("o_totalprice") + i)
      Prof.time("op.upsert_total") {
        FormatOps.upsert(spark, dir, "data", batch, Seq("o_orderkey"),
          captureChanges = true)
      }
      val feed = spark.read.format("graft").option("table", "changes")
        .load(s"$dir/${FormatOps.ChangesSubdir}")
      val maxV = feed.agg(max(col("_commit_version"))).head.getLong(0)
      val changes = feed.filter(col("_commit_version") === maxV) // this cycle's set
      Prof.time("op.fold_total") {
        FormatOps.applyCdcAggregate(spark, viewDir, changes,
          Seq("o_orderpriority"), "n", Map("total" -> money(col("o_totalprice"))),
          idempotencyKey = Some(s"prof-$i"))
      }
    }

    cycle(0) // warmup: JIT, codegen cache, FS client init
    Prof.reset()
    val lc0 = GraftDataSource.listingCalls.get()
    val t0 = System.nanoTime()
    (1 to cycles).foreach(cycle)
    val wall = (System.nanoTime() - t0) / 1e9
    val listings = GraftDataSource.listingCalls.get() - lc0
    println(f"== $cycles cycles (upsert+fold = ${2 * cycles} commits), " +
      f"wall ${wall}%.2f s, guarded listings $listings ==")
    Prof.dump()
    spark.stop()
  }
}
