package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hive-style partition discovery + planning-time pruning for graft dirs. */
class PartitionSpec extends SparkSpec {

  private def writePartitioned(): String = {
    val dir = Files.createTempDirectory("graft-part").toString
    for (dt <- Seq("2024-01-01", "2024-01-02", "2024-01-03"); region <- Seq("eu", "us")) {
      spark.range(0, 100)
        .selectExpr("id", s"concat('$dt-$region-', id) AS tag")
        .coalesce(1)
        .write.format("graft").mode("append").save(s"$dir/dt=$dt/region=$region")
    }
    dir
  }

  test("partition columns surface in the schema and data") {
    val dir = writePartitioned()
    val df = spark.read.format("graft").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "tag", "dt", "region"))
    assert(df.count() == 600)
    assert(df.filter(col("region") === "eu").count() == 300)
    val one = df.filter(col("dt") === "2024-01-02" && col("region") === "us" && col("id") === 5)
      .select("tag").head.getString(0)
    assert(one == "2024-01-02-us-5")
    // grouping by partition cols
    assert(canon(df.groupBy("dt").count()) ==
      canon(spark.sql("SELECT * FROM VALUES ('2024-01-01', 200L), ('2024-01-02', 200L), ('2024-01-03', 200L) AS t(dt, count)")))
  }

  test("writer partitionBy routes task-side into k=v dirs, pruning intact") {
    val dir = Files.createTempDirectory("graft-pwrite").toString
    val df = spark.range(0, 900).selectExpr(
      "id",
      "concat('doc-', id) AS body",
      "element_at(array('en','de','fr'), CAST(id % 3 + 1 AS INT)) AS lang")
    // Spark's path-based V2 save never forwards partitionBy transforms to
    // the provider — the option carries them; with both, the native
    // partitionBy equality check against Table.partitioning() passes too
    df.write.format("graft").partitionBy("lang").option("partitionBy", "lang")
      .mode("overwrite").save(dir)
    // hive layout on disk, partition column NOT in the stored table
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.toSeq == Seq("lang=de", "lang=en", "lang=fr"))
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 900)
    assert(canon(back.select("id", "body", "lang")) == canon(df))
    // planning-time pruning fires on the written layout
    val pruned = back.filter(col("lang") === "de")
    assert(pruned.count() == 300)
    assert(pruned.rdd.getNumPartitions < back.rdd.getNumPartitions)
    // overwrite truncates previous partitioned files
    df.filter(col("lang") === "en").write.format("graft")
      .partitionBy("lang").option("partitionBy", "lang").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 300)
  }

  test("option-based partitionBy, null values, and path escaping") {
    val dir = Files.createTempDirectory("graft-pesc").toString
    val df = spark.range(0, 60).selectExpr(
      "id",
      "CASE WHEN id % 3 = 0 THEN NULL WHEN id % 3 = 1 THEN 'a/b c' ELSE 'plain' END AS grp")
    df.write.format("graft").option("partitionBy", "grp").mode("overwrite").save(dir)
    val names = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(names.contains("grp=__HIVE_DEFAULT_PARTITION__"))
    assert(names.contains("grp=a%2Fb%20c")) // '/' and ' ' escaped
    val back = spark.read.format("graft").load(dir)
    assert(back.filter(col("grp") === "a/b c").count() == 20)
    assert(back.filter(col("grp") === "__HIVE_DEFAULT_PARTITION__").count() == 20)
  }

  test("runtime (DPP-style) filters prune graft partitions at execution time") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    val fact = spark.range(0, 3000).selectExpr(
      "id", "element_at(array('en','de','fr'), CAST(id % 3 + 1 AS INT)) AS lang")
    fact.write.format("graft").option("partitionBy", "lang").mode("overwrite").save(dir)
    val dim = spark.range(0, 3).selectExpr(
      "element_at(array('en','de','fr'), CAST(id + 1 AS INT)) AS lang",
      "id AS dim_attr").filter(col("dim_attr") === 1) // selects only 'de'
    val joined = spark.read.format("graft").load(dir)
      .join(dim, Seq("lang"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("RuntimeFilters: [dynamicpruning"), planStr)
    assert(joined.count() == 1000)
  }

  test("listing 10k files across 100 partition dirs stays fast and exact") {
    val dir = Files.createTempDirectory("graft-bulklist")
    // listing only reads names: empty marker files suffice
    for (p <- 0 until 100) {
      val sub = dir.resolve(f"shard=$p%03d")
      Files.createDirectory(sub)
      for (f <- 0 until 100) Files.createFile(sub.resolve(f"part-$f%05d.graft"))
    }
    val t0 = System.nanoTime()
    val files = graft.sources.GraftDataSource.listPartitionedFiles(
      new org.apache.hadoop.conf.Configuration(), dir.toString)
    val ms = (System.nanoTime() - t0) / 1000000
    assert(files.size == 10000)
    assert(files.map(_._2("shard")).distinct.size == 100)
    assert(files.map(_._1.toString) == files.map(_._1.toString).sorted)
    assert(ms < 30000, s"listing took ${ms}ms")
  }

  test("query planning lists the directory exactly once") {
    val dir = writePartitioned()
    val df = spark.read.format("graft").load(dir)
      .filter(col("region") === "eu").groupBy(col("dt")).count()
    val before = graft.sources.GraftDataSource.listingCalls.get()
    assert(df.collect().length == 3)
    val calls = graft.sources.GraftDataSource.listingCalls.get() - before
    // estimateStatistics + planInputPartitions share the scan's cached
    // listing; without the cache this query pays 2+ recursive listings
    assert(calls == 1, s"expected 1 directory listing during planning, saw $calls")
  }

  test("many tiny files bin-pack into few tasks; results and metrics exact") {
    // the small-file problem: a 10^5-file table must not schedule 10^5
    // tasks. With openCost forced to 0 the packing formula reduces to
    // bytes-per-core bins — 40 tiny files on local[4] pack to ~4
    // partitions, read through the concatenated reader
    val dir = Files.createTempDirectory("graft-packing").toString
    spark.range(0, 4000).repartition(40)
      .selectExpr("id", "id % 7 AS v")
      .write.format("graft").mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".graft")) == 40)
    val old = (spark.conf.getOption("spark.sql.files.openCostInBytes"),
      spark.conf.getOption("spark.sql.files.maxPartitionBytes"))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val df = spark.read.format("graft").load(dir)
      val n = df.rdd.getNumPartitions
      assert(n <= 8, s"40 tiny files should pack to a handful of tasks, got $n")
      assert(n >= 2, s"packing must still parallelize, got $n")
      assert(df.count() == 4000)
      assert(df.agg(sum(col("id"))).head.getLong(0) == 4000L * 3999 / 2)
      // selective predicate through packed bins: chunk skipping intact
      assert(df.filter(col("id") === 1234L).count() == 1)
    } finally {
      old._1.fold(spark.conf.unset("spark.sql.files.openCostInBytes"))(
        spark.conf.set("spark.sql.files.openCostInBytes", _))
      old._2.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
        spark.conf.set("spark.sql.files.maxPartitionBytes", _))
    }
    // with the DEFAULT 4 MB openCost, tiny-file bins stay near one file
    // per task (Spark's own behavior) — the 40-file listing still caps
    // well below 40 only when sizes say so; here openCost dominates
    val dfDefault = spark.read.format("graft").load(dir)
    assert(dfDefault.count() == 4000)
  }

  test("partition pruning drops files at planning time") {
    val dir = writePartitioned()
    val df = spark.read.format("graft").load(dir)
    val pruned = df.filter(col("dt") === "2024-01-02" && col("region") === "eu")
    // one file survives pruning => exactly one RDD partition
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 100)
    val range = df.filter(col("dt") >= "2024-01-02")
    assert(range.rdd.getNumPartitions == 4)
    assert(range.count() == 400)
    // non-partition filters prune nothing at planning time
    assert(df.filter(col("id") === 1).rdd.getNumPartitions == 6)
  }
}
