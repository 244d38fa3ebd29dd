package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
// (compactToSize coverage lives in "size-targeted compaction" below)
import graft.operators.FormatOps

/** Offline compaction: many task-sized files collapse to few, content
  * and hive partition layout preserved, and the generation-pointer swap
  * is atomic for concurrent readers. */
class CompactionSpec extends SparkSpec {

  private def graftFilesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".graft")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  /** Files of the LIVE generation only (what a reader resolves to). */
  private def liveFiles(dir: String): Seq[java.io.File] =
    graftFilesUnder(graft.sources.GraftDataSource.resolveDataDir(
      new org.apache.hadoop.conf.Configuration(), dir))

  test("flat dir: 32 small files compact to 4, content identical") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val df = spark.range(0, 20000)
      .selectExpr("id", "concat('v', id % 100) AS v", "cast(id as double) / 4 AS d")
    df.repartition(32).write.format("graft").option("chunkrows", "500")
      .mode("overwrite").save(dir)
    assert(liveFiles(dir).size == 32)
    val before = canon(spark.read.format("graft").load(dir))
    FormatOps.compact(spark, dir, targetFiles = 4)
    assert(liveFiles(dir).size == 4, s"got ${liveFiles(dir).size} files")
    assert(canon(spark.read.format("graft").load(dir)) == before)
    // legacy loose files stay (invisible) until the grace period passes
    assert(graftFilesUnder(dir).size == 32 + 4)
    // a second compaction with expired grace sweeps them at entry and
    // keeps gen-1 as the new grace copy
    FormatOps.compact(spark, dir, targetFiles = 2, graceMs = 0L)
    assert(liveFiles(dir).size == 2)
    assert(canon(spark.read.format("graft").load(dir)) == before)
    assert(graftFilesUnder(dir).size == 2 + 4) // gen-2 live + gen-1 grace copy
  }

  test("crash before the pointer swap leaves readers on the old generation") {
    val dir = Files.createTempDirectory("graft-compact-crash").toString
    spark.range(0, 5000).selectExpr("id", "id * 2 AS v")
      .repartition(8).write.format("graft").mode("overwrite").save(dir)
    val before = canon(spark.read.format("graft").load(dir))
    // simulate a compaction that died mid-write: a half-baked gen dir
    // exists but the pointer was never swapped
    val halfGen = new java.io.File(dir, "gen-00001")
    assert(halfGen.mkdir())
    spark.range(0, 7).selectExpr("id", "id AS v").coalesce(1)
      .write.format("graft").mode("append").save(halfGen.toString)
    // readers are unaffected: no pointer -> legacy layout is live
    assert(canon(spark.read.format("graft").load(dir)) == before)
    // the next compaction sweeps the orphan and completes
    FormatOps.compact(spark, dir, targetFiles = 2)
    assert(liveFiles(dir).size == 2)
    assert(canon(spark.read.format("graft").load(dir)) == before)
  }

  test("partitioned dir: layout survives compaction and still prunes") {
    val dir = Files.createTempDirectory("graft-compact-part").toString
    spark.range(0, 9000)
      .selectExpr("id", "concat('g', id % 3) AS grp")
      .repartition(16)
      .write.format("graft").option("partitionBy", "grp").option("chunkrows", "200")
      .mode("overwrite").save(dir)
    val before = canon(spark.read.format("graft").load(dir))
    val nBefore = liveFiles(dir).size
    FormatOps.compact(spark, dir, targetFiles = 2)
    assert(liveFiles(dir).size < nBefore)
    // hive layout preserved inside the live generation
    val live = graft.sources.GraftDataSource.resolveDataDir(
      new org.apache.hadoop.conf.Configuration(), dir)
    assert(live != dir, "expected a generation pointer after compaction")
    assert(new java.io.File(live, "grp=g0").isDirectory)
    assert(canon(spark.read.format("graft").load(dir)) == before)
    assert(spark.read.format("graft").load(dir)
      .filter(col("grp") === "g1").count() == 3000)
  }

  test("appends after compaction land in the live generation and read back") {
    val dir = Files.createTempDirectory("graft-compact-append").toString
    spark.range(0, 1000).selectExpr("id", "id * 3 AS v")
      .repartition(8).write.format("graft").mode("overwrite").save(dir)
    FormatOps.compact(spark, dir, targetFiles = 2)
    spark.range(1000, 1200).selectExpr("id", "id * 3 AS v")
      .coalesce(1).write.format("graft").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 1200)
    assert(back.agg(sum(col("v"))).head.getLong(0) == 3L * 1199 * 1200 / 2)
    // overwrite resets to the plain layout (pointer + generations gone)
    spark.range(0, 10).selectExpr("id", "id AS v")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 10)
    assert(!new java.io.File(dir, ".graft-gen").exists)
    assert(!new java.io.File(dir, "gen-00001").exists)
  }

  test("time travel: a superseded generation stays readable and frozen") {
    val dir = Files.createTempDirectory("graft-tt").toString
    spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
      .repartition(4).write.format("graft").mode("overwrite").save(dir)
    FormatOps.compact(spark, dir, targetFiles = 2) // gen-1
    FormatOps.compact(spark, dir, targetFiles = 2) // gen-2 freezes gen-1
    spark.range(1000, 1300).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.format("graft").mode("append").save(dir)
    // live view has the append, gen-1 does not
    assert(spark.read.format("graft").load(dir).count() == 1300)
    val v1 = spark.read.format("graft").option("generation", "1").load(dir)
    assert(v1.count() == 1000)
    assert(v1.agg(sum(col("v"))).head.getLong(0) == 2L * 999 * 1000 / 2)
    // full name addressing and both error shapes
    assert(spark.read.format("graft").option("generation", "gen-00002")
      .load(dir).count() == 1300)
    val miss = intercept[Exception] {
      spark.read.format("graft").option("generation", "7").load(dir).count()
    }
    assert(miss.getMessage.contains("never made live"), miss.getMessage)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("generation", "nope").load(dir).count()
    }
    // writes must not target a pinned generation
    val w = intercept[Exception] {
      spark.range(0, 1).selectExpr("id", "id AS v").write.format("graft")
        .option("generation", "1").mode("append").save(dir)
    }
    assert(w.getMessage.contains("read-only"), w.getMessage)
  }

  test("a dangling generation pointer fails loudly, not as an empty table") {
    val dir = Files.createTempDirectory("graft-dangling").toString
    spark.range(0, 100).selectExpr("id", "id AS v")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    FormatOps.compact(spark, dir, targetFiles = 1)
    // corrupt state: pointer intact, generation dir manually deleted
    val live = new java.io.File(graft.sources.GraftDataSource.resolveDataDir(
      new org.apache.hadoop.conf.Configuration(), dir))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(live)
    val e = intercept[Exception] {
      spark.read.format("graft").load(dir).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.isInstanceOf[OliveFormatException]),
      s"want OliveFormatException in the cause chain, got $e")
  }

  test("readers racing the swap always see one complete generation") {
    val dir = Files.createTempDirectory("graft-compact-race").toString
    spark.range(0, 30000).selectExpr("id", "id % 7 AS v")
      .repartition(24).write.format("graft").option("chunkrows", "1000")
      .mode("overwrite").save(dir)
    val expected = 30000L
    @volatile var failure: Option[String] = None
    @volatile var stop = false
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop && failure.isEmpty) {
          val n = try spark.read.format("graft").load(dir).count()
          catch { case e: Exception => failure = Some(e.toString); -1L }
          if (n >= 0 && n != expected)
            failure = Some(s"reader saw $n rows mid-swap (want $expected)")
        }
      })
    }
    readers.foreach(_.start())
    try {
      // several swaps while the readers hammer the table
      (1 to 3).foreach(_ => FormatOps.compact(spark, dir, targetFiles = 3))
    } finally {
      stop = true
      readers.foreach(_.join(30000))
    }
    assert(failure.isEmpty, failure.getOrElse(""))
    assert(liveFiles(dir).size == 3)
  }

  test("tiny grace from session conf: racing readers finish or fail cleanly, never wrong rows") {
    val dir = Files.createTempDirectory("graft-compact-grace").toString
    spark.range(0, 30000).selectExpr("id", "id % 7 AS v")
      .repartition(24).write.format("graft").option("chunkrows", "1000")
      .mode("overwrite").save(dir)
    val expected = 30000L
    @volatile var wrong: Option[String] = None
    @volatile var stop = false
    val cleanFailures = new java.util.concurrent.atomic.AtomicLong
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop && wrong.isEmpty) {
          try {
            val n = spark.read.format("graft").load(dir).count()
            if (n != expected) wrong = Some(s"reader saw $n rows (want $expected)")
          } catch {
            // planned files swept mid-read: a CLEAN failure is the
            // documented behavior when a scan outlives the grace window
            case _: Exception => cleanFailures.incrementAndGet()
          }
        }
      })
    }
    spark.conf.set("spark.graft.graceMs", "0")
    readers.foreach(_.start())
    try (1 to 4).foreach(_ => FormatOps.compact(spark, dir, targetFiles = 3))
    finally {
      stop = true
      readers.foreach(_.join(30000))
      spark.conf.unset("spark.graft.graceMs")
    }
    assert(wrong.isEmpty, wrong.getOrElse(""))
    // the 0ms grace really came from the session conf: each rewrite's
    // entry sweep reclaimed every earlier superseded generation, leaving
    // only the live one and its immediate predecessor (superseded AFTER
    // the last sweep ran) — under the 15-min default all four would
    // still be on disk
    val gens = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.matches("gen-\\d+")).toSeq.sorted
    assert(gens == Seq("gen-00003", "gen-00004"),
      s"grace 0 should leave only the last two generations, got $gens")
  }

  test("vacuum reclaims superseded generations without a rewrite; live content intact") {
    val dir = Files.createTempDirectory("graft-vacuum").toString
    spark.range(0, 5000).selectExpr("id", "id % 3 AS v")
      .repartition(8).write.format("graft").mode("overwrite").save(dir)
    // default (15 min) grace: three compactions accumulate generations
    (1 to 3).foreach(_ => FormatOps.compact(spark, dir, targetFiles = 2))
    val expected = canon(spark.read.format("graft").load(dir))
    def gens = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.matches("gen-\\d+")).toSeq.sorted
    assert(gens.size == 3, s"setup should accumulate 3 generations, got $gens")
    // a superseded generation is still time-travel readable pre-vacuum
    assert(spark.read.format("graft").option("generation", 1).load(dir).count() == 5000)
    FormatOps.vacuum(spark, dir, graceMs = 0)
    // only the live generation survives, with identical content; no new
    // generation was created
    assert(gens == Seq("gen-00003"), s"vacuum should leave only the live gen, got $gens")
    assert(canon(spark.read.format("graft").load(dir)) == expected)
    // retention has genuinely ended: time travel to the swept generation
    // now fails loudly, not as an empty table
    intercept[Exception] {
      spark.read.format("graft").option("generation", 1).load(dir).count()
    }
  }

  test("restore rolls back by pointer swing; future abandoned; next rewrite allocates past it") {
    val dir = Files.createTempDirectory("graft-restore").toString
    spark.range(0, 1000).selectExpr("id", "CAST(0 AS BIGINT) AS v")
      .write.format("graft").mode("overwrite").save(dir)
    FormatOps.compact(spark, dir, targetFiles = 2) // gen-1
    val original = canon(spark.read.format("graft").load(dir))
    FormatOps.updateWhere(spark, dir, "data",
      Map("v" -> lit(1L)), col("id") >= 0)         // gen-2: every row touched
    assert(canon(spark.read.format("graft").load(dir)) != original)
    FormatOps.restore(spark, dir, 1)
    assert(canon(spark.read.format("graft").load(dir)) == original,
      "restore must read back the gen-1 content bit-for-bit")
    // a generation that never existed (or was vacuumed) refuses loudly
    intercept[IllegalArgumentException] { FormatOps.restore(spark, dir, 99) }
    // the next rewrite allocates PAST the abandoned gen-2
    FormatOps.compact(spark, dir, targetFiles = 1)
    val live = graft.sources.GraftDataSource
      .readGenPointer(new org.apache.hadoop.conf.Configuration(), dir).get
    assert(live == "gen-00003", s"expected gen-00003 after restore+compact, got $live")
    assert(canon(spark.read.format("graft").load(dir)) == original)
  }

  test("history lists generations with live flag, birth, tag, sizes; restore flips the flag") {
    val dir = Files.createTempDirectory("graft-history").toString
    spark.range(0, 200).selectExpr("id", "id % 3 AS v")
      .write.format("graft").mode("overwrite").save(dir)
    FormatOps.compact(spark, dir, targetFiles = 2) // gen-1
    graft.sources.Generations.rewrite(spark, dir,
      (_, df) => df.filter(col("v") =!= 0),
      idempotencyKey = Some("batch-42"))           // gen-2, tagged
    val h = FormatOps.history(spark, dir).collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(h.map(_.getBoolean(1)).toSeq == Seq(false, true))
    assert(h.forall(r => r.getTimestamp(2) != null), "every generation carries a birth ts")
    assert(h.map(r => Option(r.getString(3))).toSeq == Seq(None, Some("batch-42")))
    assert(h.forall(r => r.getLong(4) > 0 && r.getLong(5) > 0))
    FormatOps.restore(spark, dir, 1)
    val h2 = FormatOps.history(spark, dir).collect()
    assert(h2.map(r => (r.getInt(0), r.getBoolean(1))).toSeq == Seq((1, true), (2, false)))
  }

  test("cross-table transfer is atomic: generation-pinned readers always see the total conserved") {
    val dir = Files.createTempDirectory("graft-xfer").toString
    spark.range(0, 500).selectExpr("id", "CAST(100 AS BIGINT) AS bal")
      .write.format("graft").option("table", "acct_a").mode("append").save(dir)
    spark.range(0, 500).selectExpr("id", "CAST(100 AS BIGINT) AS bal")
      .write.format("graft").option("table", "acct_b").mode("append").save(dir)
    FormatOps.compact(spark, dir, targetFiles = 2) // establish gen-1
    val total = 2L * 100 * 500
    val conf = new org.apache.hadoop.conf.Configuration()
    @volatile var wrong: Option[String] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && wrong.isEmpty) {
        // the consistency unit across TABLES is the generation: resolve
        // the pointer once, then read both tables pinned to it — the
        // same generation can never hold half a transfer, because a
        // rewrite stages every table before the one pointer swap
        val gen = graft.sources.GraftDataSource.readGenPointer(conf, dir)
          .flatMap(graft.sources.GraftDataSource.genIndex)
        gen.foreach { g =>
          try {
            def bal(t: String) = spark.read.format("graft")
              .option("table", t).option("generation", g).load(dir)
              .agg(sum("bal")).head.getLong(0)
            val seen = bal("acct_a") + bal("acct_b")
            if (seen != total)
              wrong = Some(s"generation $g shows $seen, want $total — half a transfer visible")
          } catch { case _: Exception => () } // gen swept mid-read: clean, covered elsewhere
        }
      }
    })
    reader.start()
    try {
      // three racing transfers of 1 per row from a to b
      (1 to 3).foreach { _ =>
        graft.sources.Generations.rewrite(spark, dir, (name, df) => name match {
          case "acct_a" => df.withColumn("bal", col("bal") - 1L)
          case "acct_b" => df.withColumn("bal", col("bal") + 1L)
          case _ => df
        })
      }
    } finally { stop = true; reader.join(30000) }
    assert(wrong.isEmpty, wrong.getOrElse(""))
    // the transfers really happened
    def live(t: String) = spark.read.format("graft")
      .option("table", t).load(dir).agg(sum("bal")).head.getLong(0)
    assert(live("acct_a") == 500L * 97 && live("acct_b") == 500L * 103)
  }

  test("racing rewrites: at most one wins per index, loser loud, content intact") {
    val dir = Files.createTempDirectory("graft-rewrite-race").toString
    spark.range(0, 20000).selectExpr("id", "id % 5 AS v")
      .repartition(16).write.format("graft").option("chunkrows", "1000")
      .mode("overwrite").save(dir)
    val before = canon(spark.read.format("graft").load(dir))
    (1 to 3).foreach { _ =>
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map(_ => new Thread(() => {
        try FormatOps.compact(spark, dir, targetFiles = 2)
        catch { case e: Throwable => errs.add(e) }
      }))
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      // permitted outcomes per round: both complete (they serialized on
      // distinct indices) or the loser fails with the CONCURRENT error —
      // never a silent mixture of two rewrites in one generation
      errs.forEach { e =>
        assert(e.isInstanceOf[OliveFormatException] &&
          e.getMessage.contains("concurrent rewrite"), s"unexpected: $e")
      }
      assert(canon(spark.read.format("graft").load(dir)) == before)
      assert(liveFiles(dir).size == 2)
    }
  }

  test("updateWhere: SET expressions see the ORIGINAL row, types stay pinned") {
    val dir = Files.createTempDirectory("graft-update").toString
    spark.range(0, 10).selectExpr("id AS a", "id * 100 AS b")
      .write.format("graft").mode("overwrite").save(dir)
    // a<->b swap on a >= 5: correct only if both SETs read the pre-update
    // row (one projection); a sequential fold would make b = new a = old b
    FormatOps.updateWhere(spark, dir, "data",
      set = Map("a" -> col("b"), "b" -> col("a")),
      where = col("a") >= 5)
    val rows = spark.read.format("graft").load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 5).map(i => (i.toLong, i * 100L)).toSet ++
      (5 until 10).map(i => (i * 100L, i.toLong)) // swapped, not folded
    assert(rows == expected)
    // misspelled table or SET column: loud refusal, no silent no-op
    intercept[IllegalArgumentException] {
      FormatOps.updateWhere(spark, dir, "nosuch", Map("a" -> lit(0L)), lit(true))
    }
    intercept[IllegalArgumentException] {
      FormatOps.updateWhere(spark, dir, "data", Map("zz" -> lit(0L)), lit(true))
    }
  }

  test("upsert: matched keys replaced, new keys inserted, rest untouched") {
    val dir = Files.createTempDirectory("graft-upsert").toString
    spark.range(1, 11).selectExpr("id AS k", "cast(id AS double) AS v")
      .write.format("graft").mode("overwrite").save(dir)
    val cdc = spark.range(6, 16).selectExpr("id AS k", "cast(-1.0 AS double) AS v")
    FormatOps.upsert(spark, dir, "data", cdc, keys = Seq("k"))
    val rows = spark.read.format("graft").load(dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 15)
    assert(rows.take(5).toSeq == (1 until 6).map(i => (i.toLong, i.toDouble))) // untouched
    assert(rows.drop(5).forall(_._2 == -1.0)) // 6..10 replaced, 11..15 inserted
  }

  test("size-targeted compaction lands near the requested file size") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sizecompact").toString
    spark.range(0, 60000).repartition(12)
      .selectExpr("id", "concat('v', id) AS v")
      .write.format("graft").mode("overwrite").save(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val total = graft.sources.GraftDataSource
      .listPartitionedSized(conf, dir).map(_._2).sum
    // target ~ a third of the table => ~3 files
    FormatOps.compactToSize(spark, dir, targetBytes = total / 3 + 1)
    val n = graft.sources.GraftDataSource.listFiles(conf, dir).size
    assert(n >= 2 && n <= 4, s"want ~3 compacted files, got $n")
    assert(spark.read.format("graft").load(dir).count() == 60000)
    // a target far above the table size compacts to ONE file
    FormatOps.compactToSize(spark, dir, targetBytes = Long.MaxValue / 2)
    assert(graft.sources.GraftDataSource.listFiles(conf, dir).size == 1)
    assert(spark.read.format("graft").load(dir).count() == 60000)
    intercept[IllegalArgumentException](
      FormatOps.compactToSize(spark, dir, targetBytes = 0))
  }
}
