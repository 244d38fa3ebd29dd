package graft.format

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COUNT(*)/MIN/MAX pushdown: answered from footer metadata, zero data
  * pages read. */
class AggPushdownSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def writeSample(): String = {
    val dir = Files.createTempDirectory("graft-aggpd").toString
    spark.range(0, 30000).repartition(3).select(
      col("id"),
      (col("id") % 97).cast("int").as("i"),
      (col("id") % 2 === 0).as("b"),
      (col("id") * 1.5).as("d"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 11 === 0, null).otherwise(col("id") + 5).as("l_null"),
      timestamp_micros(col("id") * 1000000).as("ts"))
      .write.format("graft").option("chunkrows", "4000").mode("append").save(dir)
    dir
  }

  test("count/min/max on stat-exact types push to footer metadata") {
    val dir = writeSample()
    val df = spark.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"),
        min("i").as("mni"), max("b").as("mxb"), max("ts").as("mxts"),
        min("l_null").as("mnn"), count(col("l_null")).as("nn"))
    assert(plan(df).contains("pushedAggs="), plan(df))
    val r = df.head
    assert(r.getLong(0) == 30000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 29999L)
    assert(r.getInt(3) == 0)
    assert(r.getBoolean(4))
    assert(r.getTimestamp(5).toInstant.getEpochSecond == 29999L)
    assert(r.getLong(6) == 6L) // id=0 is null (0%11==0); min non-null = 1+5
    assert(r.getLong(7) == (0 until 30000).count(_ % 11 != 0).toLong) // count(col) via null counts
  }

  test("SUM pushes to footer sums: integral wrap domain, doubles, null rules") {
    val dir = writeSample()
    val base = spark.read.format("graft").load(dir)
    val n = 30000L
    // doubles push regardless of ANSI (f64 addition has no error mode)
    val dfd = base.agg(sum("d").as("sd"))
    assert(plan(dfd).contains("pushedAggs="), plan(dfd))
    assert(math.abs(dfd.head.getDouble(0) - 1.5 * n * (n - 1) / 2) < 1e-3)
    // integral SUM pushes only with ANSI off: footer sums wrap mod 2^64
    // (= Spark's non-ANSI codegen); ANSI must raise on overflow instead,
    // so under the default ANSI=on the plan keeps the real scan
    assert(!plan(base.agg(sum("id"))).contains("pushedAggs="))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = base.agg(sum("id").as("sid"), sum("i").as("si"),
        sum("d").as("sd"), sum("l_null").as("snn"))
      assert(plan(df).contains("pushedAggs="), plan(df))
      val r = df.head
      assert(r.getLong(0) == n * (n - 1) / 2)
      assert(r.getLong(1) == (0L until n).map(_ % 97).sum)
      assert(math.abs(r.getDouble(2) - 1.5 * n * (n - 1) / 2) < 1e-3)
      assert(r.getLong(3) == (0L until n).filter(_ % 11 != 0).map(_ + 5).sum)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // AVG rides for free: Spark rewrites a partial avg into sum+count,
    // both of which the scan answers from footers
    val dfa = base.agg(avg("d").as("ad"))
    assert(plan(dfa).contains("pushedAggs="), plan(dfa))
    assert(math.abs(dfa.head.getDouble(0) - 1.5 * (n - 1) / 2) < 1e-9)
    // sum over zero non-null rows is null, answered from null counts alone
    val allNull = spark.range(0, 100)
      .select(when(lit(false), col("id").cast("double")).as("v"), col("id"))
    val d2 = Files.createTempDirectory("graft-aggnull").toString
    allNull.write.format("graft").mode("append").save(d2)
    val dfn = spark.read.format("graft").load(d2).agg(sum("v"))
    assert(plan(dfn).contains("pushedAggs="), plan(dfn))
    assert(dfn.head.isNullAt(0))
    // a NaN must poison the pushed double sum exactly like the real one
    val d3 = Files.createTempDirectory("graft-aggnan").toString
    spark.range(0, 100)
      .select(when(col("id") === 50, lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("v"))
      .write.format("graft").mode("append").save(d3)
    val dfnan = spark.read.format("graft").load(d3).agg(sum("v"))
    assert(plan(dfnan).contains("pushedAggs="), plan(dfnan))
    assert(dfnan.head.getDouble(0).isNaN)
  }

  test("pushdown declines when unsupported: filters, group-by, distinct") {
    val dir = writeSample()
    val base = spark.read.format("graft").load(dir)
    val cases = Seq(
      base.filter(col("i") > 50).agg(count(lit(1))), // residual filters
      base.groupBy("i").agg(count(lit(1))), // grouping
      base.agg(countDistinct(col("i")))) // distinct needs real rows
    cases.foreach { df =>
      assert(!plan(df).contains("pushedAggs="), plan(df))
    }
    // doubles PUSH since footer v5's NaN accounting (FloatStatsSpec
    // covers the NaN semantics end-to-end)
    val dmin = base.agg(min("d"), max("d"))
    assert(plan(dmin).contains("pushedAggs="), plan(dmin))
    assert(dmin.head.getDouble(0) == 0.0 && dmin.head.getDouble(1) == 29999 * 1.5)
    // and the declined shapes still compute correctly through the scan
    assert(base.filter(col("i") > 50).agg(count(lit(1))).head.getLong(0) ==
      (0 until 30000).count(_ % 97 > 50))
    assert(base.agg(countDistinct(col("i"))).head.getLong(0) == 97L)
  }

  test("string MIN/MAX push: exact sub-cap bounds serve, capped chunks decode one column") {
    val dir = writeSample()
    val base = spark.read.format("graft").load(dir)
    // short strings (< 48 bytes): every chunk's bound is provably exact,
    // the whole answer comes from footers
    val df = base.agg(min("s").as("mn"), max("s").as("mx"))
    assert(plan(df).contains("pushedAggs="), plan(df))
    assert(df.head.getString(0) == "s0" && df.head.getString(1) == "s9999")
    // nested string leaves still decline (numeric-only nested fallback)
    // — covered in the nested spec below; here: values > the stat cap
    // force the per-chunk decode fallback, exact answer either way
    val dir2 = Files.createTempDirectory("graft-aggstr").toString
    val cap = Stats.MaxStringStat
    spark.range(0, 12000).selectExpr(
      "id",
      // every value over-cap with a shared prefix: bounds are truncated
      // prefixes/bumped prefixes, never servable, always decoded
      s"concat(repeat('p', $cap), lpad(CAST(id AS STRING), 7, '0')) AS long_s",
      // mixed: short in some chunks, over-cap in others
      s"CASE WHEN id % 3 = 0 THEN concat(repeat('q', $cap), CAST(id AS STRING)) " +
        "ELSE concat('m', lpad(CAST(id AS STRING), 5, '0')) END AS mixed_s",
      // all-null string column: pushed min/max over zero values is null
      "CAST(NULL AS STRING) AS null_s")
      .repartition(3)
      .write.format("graft").option("chunkrows", "2000").mode("overwrite").save(dir2)
    val g2 = spark.read.format("graft").load(dir2)
    val df2 = g2.agg(min("long_s").as("a"), max("long_s").as("b"),
      min("mixed_s").as("c"), max("mixed_s").as("d"),
      min("null_s").as("e"), max("null_s").as("f"))
    assert(plan(df2).contains("pushedAggs="), plan(df2))
    val r2 = df2.head
    assert(r2.getString(0) == "p" * cap + "0000000")
    assert(r2.getString(1) == "p" * cap + "0011999")
    assert(r2.getString(2) == "m00001") // id=1 (id=0 is a q-string)
    assert(r2.getString(3) == "q" * cap + "9999")
    assert(r2.isNullAt(4) && r2.isNullAt(5))
    // pushed answers agree with parquet on the same data
    val pq = Files.createTempDirectory("graft-aggstrpq").toString
    g2.write.mode("overwrite").parquet(pq)
    val p = spark.read.parquet(pq)
    def a(x: DataFrame) = x.agg(min("long_s"), max("long_s"),
      min("mixed_s"), max("mixed_s"), min("null_s"))
    assert(canon(a(g2)) == canon(a(p)))
    // renamed string column: stats resolve through the chain
    val dir3 = Files.createTempDirectory("graft-aggstrren").toString
    spark.conf.set("spark.sql.catalog.graft_aggs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_aggs.root", dir3)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_aggs.db")
    spark.sql("CREATE TABLE graft_aggs.db.t (k BIGINT, name STRING) USING graft")
    spark.sql("INSERT INTO graft_aggs.db.t SELECT id, concat('v', lpad(CAST(id AS STRING), 4, '0')) FROM range(0, 500)")
    spark.sql("ALTER TABLE graft_aggs.db.t RENAME COLUMN name TO label")
    spark.sql("INSERT INTO graft_aggs.db.t SELECT id, concat('w', CAST(id AS STRING)) FROM range(500, 600)")
    val df3 = spark.sql("SELECT min(label) AS mn, max(label) AS mx FROM graft_aggs.db.t")
    assert(plan(df3).contains("pushedAggs="), plan(df3))
    assert(df3.head.getString(0) == "v0000" && df3.head.getString(1) == "w599")
  }

  test("decimal MIN/MAX push: i64 and 16-byte forms, negatives, rescale across widen") {
    import org.apache.spark.sql.types.DecimalType
    val dir = Files.createTempDirectory("graft-aggdec").toString
    // small (i64-backed) and wide (16-byte BE) decimals, both signed —
    // the 16-byte comparator and the BigInteger decode are sign-carrying
    spark.range(0, 20000).select(
      col("id"),
      ((col("id") - 10000) * 100 + 7).cast(DecimalType(12, 2)).as("dec_small"),
      ((col("id") - 10000).cast(DecimalType(38, 6)) * lit("1000000000000.000001").cast(DecimalType(38, 6)))
        .cast(DecimalType(38, 6)).as("dec_wide"),
      when(lit(false), lit(1).cast(DecimalType(10, 2))).as("dec_null"))
      .repartition(3)
      .write.format("graft").option("chunkrows", "4000").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val df = g.agg(min("dec_small").as("a"), max("dec_small").as("b"),
      min("dec_wide").as("c"), max("dec_wide").as("d"),
      min("dec_null").as("e"))
    assert(plan(df).contains("pushedAggs="), plan(df))
    val r = df.head
    assert(r.getDecimal(0).toString == "-999993.00") // (0-10000)*100+7
    assert(r.getDecimal(1).toString == "999907.00")
    assert(r.getDecimal(2).toString == "-10000000000000000.010000")
    assert(r.getDecimal(3).toString == "9999000000000000.009999")
    assert(r.isNullAt(4))
    // agree with parquet end-to-end
    val pq = Files.createTempDirectory("graft-aggdecpq").toString
    g.write.mode("overwrite").parquet(pq)
    val p = spark.read.parquet(pq)
    def a(x: DataFrame) = x.agg(min("dec_small"), max("dec_small"),
      min("dec_wide"), max("dec_wide"))
    assert(canon(a(g)) == canon(a(p)))
    // rescale across a widen DDL: pre-widen chunks store unscaled at
    // scale 2, post-widen at scale 4 — one pushed MIN/MAX spans both
    val root = Files.createTempDirectory("graft-aggdecw").toString
    spark.conf.set("spark.sql.catalog.graft_adw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_adw.root", root.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_adw.db")
    spark.sql("CREATE TABLE graft_adw.db.t (k BIGINT, amt DECIMAL(12,2)) USING graft")
    spark.sql("INSERT INTO graft_adw.db.t SELECT id, CAST(concat(CAST(id AS STRING), '.25') AS DECIMAL(12,2)) FROM range(1, 100)")
    spark.sql("ALTER TABLE graft_adw.db.t ALTER COLUMN amt TYPE DECIMAL(24,4)")
    spark.sql("INSERT INTO graft_adw.db.t SELECT id, CAST('0.1234' AS DECIMAL(24,4)) FROM range(100, 110)")
    val w = spark.sql("SELECT min(amt) AS mn, max(amt) AS mx FROM graft_adw.db.t")
    assert(plan(w).contains("pushedAggs="), plan(w))
    assert(w.head.getDecimal(0).toString == "0.1234")
    assert(w.head.getDecimal(1).toString == "99.2500") // rescaled from scale-2 chunk
  }

  test("pushed aggregates agree with parquet on the same data") {
    val dir = writeSample()
    val g = spark.read.format("graft").load(dir)
    val pq = Files.createTempDirectory("graft-aggpq").toString
    g.write.mode("overwrite").parquet(pq)
    val p = spark.read.parquet(pq)
    def agg(df: DataFrame) =
      df.agg(count(lit(1)), min("id"), max("id"), min("ts"), max("ts"), max("i"),
        sum("id"), sum("i"), sum("l_null"))
    assert(canon(agg(g)) == canon(agg(p)))
  }

  test("nested struct leaves answer MIN/MAX/COUNT/SUM from nested zone maps") {
    val dir = Files.createTempDirectory("graft-aggnest").toString
    // struct-null every 11th row: nested nullCount must cover them
    spark.range(0, 20000).select(
      col("id"),
      when(col("id") % 11 === 0, null).otherwise(struct(
        (col("id") * 2).as("w"),
        concat(lit("s"), col("id")).as("s"),
        (col("id") * 1.5).as("d"))).as("m"))
      .repartition(3)
      .write.format("graft").option("chunkrows", "4000").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val nn = (0 until 20000).count(_ % 11 != 0) // non-struct-null rows
    val df = g.agg(min("m.w").as("mn"), max("m.w").as("mx"),
      count(col("m.w")).as("n"), sum("m.d").as("sd"))
    assert(plan(df).contains("pushedAggs="), plan(df))
    val r = df.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 39998L) // id=0 is struct-null
    assert(r.getLong(2) == nn.toLong)
    assert(math.abs(r.getDouble(3) -
      1.5 * (0 until 20000).filter(_ % 11 != 0).map(_.toLong).sum) < 1e-3)
    // non-statable leaf types decline (a missing nestedStats entry is
    // indistinguishable from an all-null added leaf)
    val s = g.agg(max("m.s"))
    assert(!plan(s).contains("pushedAggs="), plan(s))
    assert(s.head.getString(0) == "s9998") // s9999 is struct-null (9999 % 11 == 0)
    // values agree with the unpushed answer over the same data
    val pq = Files.createTempDirectory("graft-aggnestpq").toString
    g.write.mode("overwrite").parquet(pq)
    val p = spark.read.parquet(pq)
    def a(x: DataFrame) = x.agg(min("m.w"), max("m.w"), count(col("m.w")), sum("m.d"))
    assert(canon(a(g)) == canon(a(p)))
  }

  test("GROUP BY a partition column pushes: per-group footer answers, no pages") {
    val dir = Files.createTempDirectory("graft-agggrp").toString
    spark.range(0, 20000).selectExpr("id", "CAST(id % 5 AS STRING) AS lang")
      .write.format("graft").option("partitionBy", "lang")
      .mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val df = g.groupBy("lang").agg(count(lit(1)).as("n"), max("id").as("mx"))
    assert(plan(df).contains("pushedAggs="),
      s"partition-column grouping must push: ${plan(df)}")
    val rows = df.orderBy("lang").collect()
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getString(0) == k.toString)
      assert(r.getLong(1) == 4000L, s"group $k count ${r.getLong(1)}")
      assert(r.getLong(2) == 19995L + k, s"group $k max ${r.getLong(2)}")
    }
    // identical to the unpushed answer
    val plain = g.withColumn("x", col("id") + 0L)
      .groupBy("lang").agg(count(lit(1)), max("x")).orderBy("lang").collect()
    assert(plain.zip(rows).forall { case (a, b) =>
      a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) })
    // partition grouping composes with the round-14 string/decimal
    // MIN/MAX: per-file partials still come from footers alone
    val dirS = Files.createTempDirectory("graft-agggrps").toString
    spark.range(0, 6000).selectExpr("id", "CAST(id % 3 AS STRING) AS lang",
        "concat('w', lpad(CAST(id AS STRING), 5, '0')) AS w",
        "CAST(CAST(id AS STRING) || '.75' AS DECIMAL(12,2)) AS price")
      .write.format("graft").option("partitionBy", "lang")
      .mode("overwrite").save(dirS)
    val gs = spark.read.format("graft").load(dirS)
    val dfs = gs.groupBy("lang").agg(min("w").as("mnw"), max("w").as("mxw"),
      max("price").as("mxp"))
    assert(plan(dfs).contains("pushedAggs="), plan(dfs))
    val rowsS = dfs.orderBy("lang").collect()
    assert(rowsS.map(_.getString(1)).toSeq == Seq("w00000", "w00001", "w00002"))
    assert(rowsS.map(_.getString(2)).toSeq == Seq("w05997", "w05998", "w05999"))
    assert(rowsS.map(_.getDecimal(3).toString).toSeq ==
      Seq("5997.75", "5998.75", "5999.75"))
    // grouping by a DATA column must decline (its values need page reads)
    val dir2 = Files.createTempDirectory("graft-agggrp2").toString
    spark.range(0, 5000).selectExpr("id", "CAST(id % 3 AS STRING) AS tag")
      .write.format("graft").mode("overwrite").save(dir2)
    val d2 = spark.read.format("graft").load(dir2)
      .groupBy("tag").agg(count(lit(1)))
    assert(!plan(d2).contains("pushedAggs="), plan(d2))
    assert(d2.collect().map(_.getLong(1)).sum == 5000L)
  }

  test("consumed partition filters: aggregates push under WHERE lang = '...'") {
    val dir = Files.createTempDirectory("graft-aggpf").toString
    spark.range(0, 20000).selectExpr("id", "CAST(id % 5 AS STRING) AS lang")
      .write.format("graft").option("partitionBy", "lang")
      .mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    // the flagship: count over one partition = a footer walk of it
    val df = g.filter(col("lang") === "2").agg(count(lit(1)).as("n"), max("id").as("mx"))
    assert(plan(df).contains("pushedAggs="),
      s"aggregate must push under a consumed partition filter: ${plan(df)}")
    val r = df.head
    assert(r.getLong(0) == 4000L && r.getLong(1) == 19997L)
    // plain filtered reads stay exact with no residual re-check
    assert(g.filter(col("lang") === "2").count() == 4000L)
    assert(g.filter(col("lang").isin("1", "3")).count() == 8000L)
    assert(g.filter(col("lang").isNotNull).count() == 20000L)
    assert(g.filter(col("lang").isNull).count() == 0L)
    // grouped + filtered: one partition's groups from footers
    val gf = g.filter(col("lang") === "4").groupBy("lang").agg(count(lit(1)))
    assert(plan(gf).contains("pushedAggs="), plan(gf))
    assert(gf.head.getLong(1) == 4000L)
    // a DATA-column filter is NOT consumed: aggregation declines, rows right
    val dfd = g.filter(col("id") > 10000L).agg(count(lit(1)))
    assert(!plan(dfd).contains("pushedAggs="), plan(dfd))
    assert(dfd.head.getLong(0) == 9999L)
    // mixed partition+data filters: still correct (data half residual)
    assert(g.filter(col("lang") === "0" && col("id") < 100L).count() == 20L)
    // pushed top-k under a consumed partition filter
    val tk = g.filter(col("lang") === "3").orderBy(col("id").desc).limit(5)
    assert(tk.queryExecution.executedPlan.toString.contains("pushedTopN="),
      tk.queryExecution.executedPlan.toString)
    assert(tk.collect().map(_.getLong(0)).toSeq ==
      Seq(19998L, 19993L, 19988L, 19983L, 19978L))
  }

  test("a file carrying a leaf WITHOUT nested stats degrades to a chunk decode, not a failure") {
    // an older writer or interop edge can omit nestedStats; the pushed
    // aggregate must then compute the chunk's stats from its own data
    // (one column decode) instead of failing the whole query
    val dir = Files.createTempDirectory("graft-aggnost").toString
    spark.range(0, 9000).select(
      col("id"),
      when(col("id") % 7 === 0, null).otherwise(struct(
        (col("id") * 3).as("w"),
        (col("id") * 0.5).as("d"))).as("m"))
      .coalesce(1)
      .write.format("graft").option("chunkrows", "4000").mode("overwrite").save(dir)
    // strip every nested stat from the footer (chunk + block level)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).head
    val hp = new org.apache.hadoop.fs.Path(f.toString)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val r0 = GraftFileReader.open(fs, hp)
    val footer = r0.footer
    r0.close()
    assert(footer.chunks.forall(_.tables.forall(_.nestedStats.nonEmpty)))
    val stripped = footer.copy(chunks = footer.chunks.map(c => c.copy(
      tables = c.tables.map(_.copy(nestedStats = Map.empty,
        blockNestedStats = Vector.empty)))))
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    val fb = Meta.write(stripped)
    val origLen = Bytes.le(raw).getLong(raw.length - 12)
    val tail = new Bytes(12)
    tail.putLong(fb.length.toLong)
    tail.putBytes(Meta.MagicTail)
    java.nio.file.Files.write(f.toPath,
      raw.slice(0, raw.length - 12 - origLen.toInt) ++ fb ++ tail.toArray)

    val g = spark.read.format("graft").load(dir)
    val nn = (0 until 9000).count(_ % 7 != 0)
    val df = g.agg(min("m.w").as("mn"), max("m.w").as("mx"),
      count(col("m.w")).as("n"), sum("m.d").as("sd"))
    assert(plan(df).contains("pushedAggs="), plan(df))
    val row = df.head
    assert(row.getLong(0) == 3L && row.getLong(1) == 8999L * 3) // id=0 struct-null, 8999 isn't
    assert(row.getLong(2) == nn.toLong)
    assert(math.abs(row.getDouble(3) -
      0.5 * (0 until 9000).filter(_ % 7 != 0).map(_.toLong).sum) < 1e-3)
  }

  test("COUNT(*) stays pushed under live delete vectors; MIN/MAX/COUNT(col) decline") {
    val root = Files.createTempDirectory("graft-aggdv").toString
    spark.conf.set("spark.sql.catalog.aggdv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggdv.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aggdv.db")
    // 3 files × 2 chunks; the second delete erases one WHOLE chunk's rows
    spark.range(0, 12000).selectExpr("id AS k", "id % 5 AS v")
      .repartitionByRange(3, col("k")).createOrReplaceTempView("aggdv_src")
    spark.sql("CREATE TABLE aggdv.db.t USING graft TBLPROPERTIES('chunkrows'='2000') " +
      "AS SELECT * FROM aggdv_src")
    spark.conf.set("spark.graft.deleteMode", "merge-on-read")
    try {
      spark.sql("DELETE FROM aggdv.db.t WHERE k % 13 = 7")        // sparse across files
      spark.sql("DELETE FROM aggdv.db.t WHERE k >= 2000 AND k < 4000") // a whole chunk
    } finally spark.conf.set("spark.graft.deleteMode", "copy-on-write")
    val expect = (0L until 12000L).count(k => k % 13 != 7 && !(k >= 2000 && k < 4000)).toLong

    val cnt = spark.sql("SELECT count(*) AS n FROM aggdv.db.t")
    assert(plan(cnt).contains("pushedAggs="),
      s"COUNT(*) must stay a footer walk under live DVs\n${plan(cnt)}")
    assert(cnt.head.getLong(0) == expect)
    // count(1) is the same shape
    assert(spark.sql("SELECT count(1) FROM aggdv.db.t").head.getLong(0) == expect)

    // bounds cannot answer from footers while rows are DV-deleted (the
    // attaining row may be gone) — the plan keeps the real scan, and
    // the scan's DV application yields the exact answer
    val mm = spark.sql("SELECT min(k), max(k), count(v) FROM aggdv.db.t")
    assert(!plan(mm).contains("pushedAggs="), plan(mm))
    val r = mm.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 11999L && r.getLong(2) == expect)
    // COUNT(col) on a PROVABLY null-free column stays pushed under DVs:
    // manifest zone maps show nullCount 0 in every chunk of every DV'd
    // file, so live non-null = rows − deleted, same arithmetic as
    // COUNT(*)
    val cv = spark.sql("SELECT count(v) AS nv, count(k) AS nk FROM aggdv.db.t")
    assert(plan(cv).contains("pushedAggs="),
      s"COUNT(col) on a proven null-free column must stay a footer walk\n${plan(cv)}")
    val cr = cv.head
    assert(cr.getLong(0) == expect && cr.getLong(1) == expect)

    // a NULLABLE column is not provable: deleted rows' null-ness is
    // unknowable, so COUNT(w) must decline and scan — and still be exact
    spark.sql("ALTER TABLE aggdv.db.t ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO aggdv.db.t SELECT id AS k, id % 5 AS v, " +
      "CASE WHEN id % 3 = 0 THEN NULL ELSE id END AS w FROM range(12000, 13000)")
    spark.conf.set("spark.graft.deleteMode", "merge-on-read")
    try spark.sql("DELETE FROM aggdv.db.t WHERE k >= 12500 AND k < 12600")
    finally spark.conf.set("spark.graft.deleteMode", "copy-on-write")
    val expectW = (12000L until 13000L)
      .count(k => k % 3 != 0 && !(k >= 12500 && k < 12600)).toLong
    val cw = spark.sql("SELECT count(w) FROM aggdv.db.t")
    assert(!plan(cw).contains("pushedAggs="),
      s"COUNT(col) on a NULLABLE DV'd column must decline\n${plan(cw)}")
    assert(cw.head.getLong(0) == expectW)
    // while count(*) and the null-free count stay pushed on the same view
    val still = spark.sql("SELECT count(*) AS n, count(v) AS nv FROM aggdv.db.t")
    assert(plan(still).contains("pushedAggs="), plan(still))
    assert(still.head.getLong(0) == expect + 1000 - 100)
    assert(still.head.getLong(1) == expect + 1000 - 100)

    // compaction materializes the DVs: the full aggregate set pushes again
    spark.sql("CALL aggdv.sys.compact(ns => 'db', target_files => 2)")
    val post = spark.sql("SELECT count(*), min(k), max(k), count(w) FROM aggdv.db.t")
    assert(plan(post).contains("pushedAggs="), plan(post))
    val pr = post.head
    assert(pr.getLong(0) == expect + 1000 - 100 && pr.getLong(1) == 0L &&
      pr.getLong(2) == 12999L && pr.getLong(3) == expectW)
  }
}
