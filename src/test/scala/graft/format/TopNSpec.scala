package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{GraftPartitionReader, GraftTopN}

/** Pushed ORDER BY col LIMIT k: the reader visits chunks best-stat-first
  * and skips every chunk the current k-th value already beats.
  */
class TopNSpec extends SparkSpec {

  private def graftFile(dir: String): org.apache.hadoop.fs.Path =
    graft.sources.GraftDataSource.listFiles(new Configuration(), dir).head

  private def writeSorted(rows: Int, chunkRows: Int): String = {
    val dir = Files.createTempDirectory("graft-topn").toString
    spark.range(0, rows).coalesce(1)
      .selectExpr("id", "id * 7 AS v")
      .write.format("graft").option("chunkrows", chunkRows.toString)
      .mode("overwrite").save(dir)
    dir
  }

  test("DESC top-k decodes one chunk of clustered data, skips the rest") {
    val dir = writeSorted(40000, 4096) // 10 chunks, ids ascending
    val p = graftFile(dir)
    val schema = spark.read.format("graft").load(dir).schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array.empty, -1, Map.empty, None,
      Some(GraftTopN("id", desc = true, nullsFirst = false, k = 10)))
    var rows = 0L
    var batches = 0
    try { while (rd.next()) { rows += rd.get().numRows(); batches += 1 } }
    finally rd.close()
    assert(batches == 1, s"expected 1 decoded chunk, got $batches")
    assert(rows == 3136L, s"expected only the 3136-row tail chunk, got $rows")
  }

  test("ASC top-k visits the low chunk first and stops") {
    val dir = writeSorted(40000, 4096)
    val p = graftFile(dir)
    val schema = spark.read.format("graft").load(dir).schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array.empty, -1, Map.empty, None,
      Some(GraftTopN("id", desc = false, nullsFirst = true, k = 100)))
    var rows = 0L
    var batches = 0
    try { while (rd.next()) { rows += rd.get().numRows(); batches += 1 } }
    finally rd.close()
    assert(batches == 1 && rows == 4096L, s"got $batches batches / $rows rows")
  }

  test("end-to-end: ORDER BY ... LIMIT pushes and matches the unpushed answer") {
    val dir = writeSorted(40000, 4096)
    val g = spark.read.format("graft").load(dir)
    val got = g.orderBy(col("id").desc).limit(10)
    val scanDesc = got.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scanDesc.contains("pushedTopN=[id DESC k=10]"), scanDesc)
    val expect = spark.range(0, 40000).selectExpr("id", "id * 7 AS v")
      .orderBy(col("id").desc).limit(10)
    assert(canon(got) == canon(expect))
    // ascending too
    val gotAsc = g.orderBy(col("v")).limit(7)
    val expAsc = spark.range(0, 40000).selectExpr("id", "id * 7 AS v")
      .orderBy(col("v")).limit(7)
    assert(canon(gotAsc) == canon(expAsc))
  }

  test("nulls-first ordering never skips a null-bearing chunk") {
    val dir = Files.createTempDirectory("graft-topn-null").toString
    // nulls live in the MIDDLE chunks; ASC NULLS FIRST must surface them
    spark.range(0, 30000).coalesce(1)
      .selectExpr("IF(id BETWEEN 10000 AND 10004, NULL, id) AS id")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val got = g.orderBy(col("id").asc_nulls_first).limit(8)
    val expect = spark.range(0, 30000)
      .selectExpr("IF(id BETWEEN 10000 AND 10004, NULL, id) AS id")
      .orderBy(col("id").asc_nulls_first).limit(8)
    assert(canon(got) == canon(expect)) // 5 nulls + 0,1,2
  }

  test("filters present decline the pushdown (threshold would be unsound)") {
    val dir = writeSorted(40000, 4096)
    val g = spark.read.format("graft").load(dir)
    val got = g.filter(col("v") < 70000).orderBy(col("id").desc).limit(5)
    val scanDesc = got.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(!scanDesc.contains("pushedTopN"), scanDesc)
    val expect = spark.range(0, 40000).selectExpr("id", "id * 7 AS v")
      .filter(col("v") < 70000).orderBy(col("id").desc).limit(5)
    assert(canon(got) == canon(expect))
  }

  test("top-k planning keeps whole-file partitions (no per-chunk split)") {
    val dir = writeSorted(40000, 4096) // 1 file, 10 chunks, fewer files than slots
    val schema = spark.read.format("graft").load(dir).schema
    val b = new graft.sources.GraftScanBuilder(Seq(dir), schema, None)
    b.pruneColumns(schema)
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    assert(b.pushTopN(Array(
      Expressions.sort(Expressions.column("id"), SortDirection.DESCENDING)), 10))
    val parts = b.build().toBatch.planInputPartitions()
    assert(parts.nonEmpty)
    // per-chunk splitting would hand each chunk a one-chunk skipper that
    // can never accumulate the k rows needed to prove a skip
    assert(parts.forall(_.asInstanceOf[graft.sources.GraftInputPartition].chunkRange.isEmpty))
    // without the pushed top-k the same listing DOES split for
    // parallelism (split knobs shrunk so the KB-scale fixture splits
    // like a multi-GB file would under the default formula)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val b2 = new graft.sources.GraftScanBuilder(Seq(dir), schema, None)
      b2.pruneColumns(schema)
      val parts2 = b2.build().toBatch.planInputPartitions()
      assert(parts2.length > parts.length)
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("block-level skip: the top chunk decodes one 8Ki block, not 128Ki rows") {
    val dir = Files.createTempDirectory("graft-topn-block").toString
    // ONE chunk of 120k sorted rows with zone maps (>1 block)
    spark.range(0, 120000).coalesce(1).selectExpr("id")
      .write.format("graft").mode("overwrite").save(dir)
    val p = graftFile(dir)
    val schema = spark.read.format("graft").load(dir).schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array.empty, -1, Map.empty, None,
      Some(GraftTopN("id", desc = true, nullsFirst = false, k = 10)))
    var rows = 0L
    try { while (rd.next()) rows += rd.get().numRows() } finally rd.close()
    // best block visited first fills the heap; every other block skips.
    // 120000 rows = 14 full 8192-row blocks + a 5312-row tail (the best)
    assert(rows <= 2 * Meta.BlockRows, s"expected ~1 block decoded, got $rows rows")
    // exactness end-to-end on the same layout
    val got = spark.read.format("graft").load(dir).orderBy(col("id").desc).limit(10)
    val expect = spark.range(0, 120000).selectExpr("id").orderBy(col("id").desc).limit(10)
    assert(canon(got) == canon(expect))
  }

  test("DOUBLE top-k pushes, skips chunks, and keeps Spark's NaN-largest order") {
    // "top-k documents by quality score" — the canonical LLM-curation
    // query. Scores are score-clustered so the skipper has proof to work
    // with; chunk 3 hides NaNs whose stored (non-NaN) max would license
    // a WRONG skip without the v5 nanCount guard: Spark sorts NaN first
    // under DESC, so those rows ARE the top-k.
    val dir = Files.createTempDirectory("graft-topn-dbl").toString
    spark.range(0, 40000).coalesce(1)
      .selectExpr("id",
        "IF(id BETWEEN 12288 AND 12291, CAST('NaN' AS DOUBLE), CAST(id AS DOUBLE) / 4.0) AS score")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val got = g.orderBy(col("score").desc).limit(10)
    val scanDesc = got.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scanDesc.contains("pushedTopN=[score DESC k=10]"), scanDesc)
    val expect = spark.range(0, 40000)
      .selectExpr("id",
        "IF(id BETWEEN 12288 AND 12291, CAST('NaN' AS DOUBLE), CAST(id AS DOUBLE) / 4.0) AS score")
      .orderBy(col("score").desc).limit(10)
    // 4 NaN rows first, then the finite tail — pushed == unpushed
    assert(canon(got) == canon(expect))
    assert(got.collect().count(_.getDouble(1).isNaN) == 4)

    // the skip itself: NaN-free double data decodes one chunk of ten
    val dir2 = Files.createTempDirectory("graft-topn-dbl2").toString
    spark.range(0, 40000).coalesce(1)
      .selectExpr("id", "CAST(id AS DOUBLE) / 4.0 AS score")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir2)
    val p = graftFile(dir2)
    val schema = spark.read.format("graft").load(dir2).schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array.empty, -1, Map.empty, None,
      Some(GraftTopN("score", desc = true, nullsFirst = false, k = 10)))
    var rows = 0L; var batches = 0
    try { while (rd.next()) { rows += rd.get().numRows(); batches += 1 } }
    finally rd.close()
    assert(batches == 1, s"double top-k must skip chunks like an integral key, got $batches")
    // negatives order correctly through the sortable transform (ASC)
    val dir3 = Files.createTempDirectory("graft-topn-dbl3").toString
    spark.range(0, 30000).coalesce(1)
      .selectExpr("id", "CAST(id AS DOUBLE) - 15000.0 AS score")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir3)
    val g3 = spark.read.format("graft").load(dir3)
    val gotAsc = g3.orderBy(col("score").asc).limit(7)
    val expAsc = spark.range(0, 30000)
      .selectExpr("id", "CAST(id AS DOUBLE) - 15000.0 AS score")
      .orderBy(col("score").asc).limit(7)
    assert(canon(gotAsc) == canon(expAsc))
  }

  test("DECIMAL top-k pushes, skips chunks, rescales pre-widen bounds exactly") {
    // "most expensive orders" — the canonical money top-k. Unscaled-long
    // comparison at the query scale; pre-widen chunks' bounds rescale
    // 10^Δ exactly before the skip proof.
    val dir = Files.createTempDirectory("graft-topn-dec").toString
    spark.range(0, 40000).coalesce(1)
      .selectExpr("id", "CAST(CAST(id AS STRING) || '.25' AS DECIMAL(12,2)) AS price")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val got = g.orderBy(col("price").desc).limit(10)
    val scanDesc = got.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scanDesc.contains("pushedTopN=[price DESC k=10]"), scanDesc)
    assert(got.collect().map(_.getLong(0)).toSeq == (39990L to 39999L).reverse)
    // the skip: one decoded chunk of ten
    val p = graftFile(dir)
    val schema = g.schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array.empty, -1, Map.empty, None,
      Some(GraftTopN("price", desc = true, nullsFirst = false, k = 10)))
    var batches = 0
    try { while (rd.next()) { rd.get(); batches += 1 } }
    finally rd.close()
    assert(batches == 1, s"decimal top-k must skip chunks, got $batches")
    // across a widen DDL: mixed scales, top values in the post-widen
    // half — the scale-2 chunks' rescaled bounds must prove them out
    val root = Files.createTempDirectory("graft-topn-decw").toString
    spark.conf.set("spark.sql.catalog.graft_tdw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tdw.root", root.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_tdw.db")
    spark.sql("CREATE TABLE graft_tdw.db.t (k BIGINT, price DECIMAL(12,2)) USING graft")
    spark.sql("INSERT INTO graft_tdw.db.t SELECT id, CAST(CAST(id AS STRING) || '.50' AS DECIMAL(12,2)) FROM range(0, 5000)")
    spark.sql("ALTER TABLE graft_tdw.db.t ALTER COLUMN price TYPE DECIMAL(18,4)")
    spark.sql("INSERT INTO graft_tdw.db.t SELECT id, CAST(CAST(id + 1000000 AS STRING) || '.1234' AS DECIMAL(18,4)) FROM range(5000, 5100)")
    val w = spark.sql("SELECT k FROM graft_tdw.db.t ORDER BY price DESC LIMIT 3")
    val wDesc = w.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(wDesc.contains("pushedTopN="), wDesc)
    assert(w.collect().map(_.getLong(0)).toSeq == Seq(5099L, 5098L, 5097L))
    // ASC over the widened table: the answer lives in the pre-widen half
    val asc = spark.sql("SELECT k FROM graft_tdw.db.t ORDER BY price ASC LIMIT 3")
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // p > 18 declines (unscaled exceeds the long domain)
    val wide = g.select(col("id"), col("price").cast(
      org.apache.spark.sql.types.DecimalType(24, 2)).as("pw"))
    // cast sits above the scan, so top-k on pw can't push anyway — gate
    // the TYPE rule directly at the builder level instead
    val b = new graft.sources.GraftScanBuilder(Seq(dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pw",
          org.apache.spark.sql.types.DecimalType(24, 2)))), None)
    val order = org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column("pw"),
      org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING)
    assert(!b.pushTopN(Array(order), 10), "p>18 decimal top-k must decline")
    wide.count() // keep the cast path exercised
  }

  test("tie-broken multi-key top-k: strict skips, tie-carrying chunks decode") {
    // scores tie heavily and the k-th value's ties STRADDLE a chunk
    // boundary: id 0..39999, score = id / 4000 (10 score bands of 4000
    // rows, chunkrows 4096 => each band crosses a chunk edge). Top-5 by
    // (score DESC, id ASC) = the FIRST five ids of the top band — rows
    // that live in the second-to-last chunk, reachable only if chunks
    // TYING the threshold keep decoding.
    val dir = Files.createTempDirectory("graft-topn-tie").toString
    spark.range(0, 40000).coalesce(1)
      .selectExpr("id", "CAST(id / 4000 AS BIGINT) AS score")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val got = g.orderBy(col("score").desc, col("id").asc).limit(5)
    val scanDesc = got.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scanDesc.contains("pushedTopN=[score DESC k=5]"), scanDesc)
    // ids 36000..36004 — they sit in chunk floor(36000/4096)=8, not the
    // last chunk; a non-strict (<=) skipper would skip chunk 8 after the
    // last chunk filled the heap with score-9 ties and return wrong rows
    assert(got.collect().map(_.getLong(0)).toSeq == (36000L to 36004L),
      "tie-crossing top-k must decode the tie-carrying chunk")
    // far chunks DO skip under the strict threshold: reader-level proof
    val p = graftFile(dir)
    val schema = g.schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array.empty, -1, Map.empty, None,
      Some(GraftTopN("score", desc = true, nullsFirst = false, k = 5, strict = true)))
    var batches = 0
    try { while (rd.next()) { rd.get(); batches += 1 } }
    finally rd.close()
    // 40000/4096 = 10 chunks; only the two top-score chunks carry score
    // 9 (the strict threshold) — everything below skips
    assert(batches <= 3, s"strict top-k should still skip far chunks, got $batches")
    // ASC leading key with a DESC tiebreak: same proofs at the low end
    val asc = g.orderBy(col("score").asc, col("id").desc).limit(4)
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(3999L, 3998L, 3997L, 3996L))
  }

  test("unsorted data stays exact (skipping just finds less to skip)") {
    val dir = Files.createTempDirectory("graft-topn-shuffled").toString
    spark.range(0, 30000).coalesce(1)
      .selectExpr("CAST(hash(id) AS BIGINT) AS h", "id")
      .write.format("graft").option("chunkrows", "4096").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val got = g.orderBy(col("h").desc).limit(12)
    val expect = spark.range(0, 30000)
      .selectExpr("CAST(hash(id) AS BIGINT) AS h", "id")
      .orderBy(col("h").desc).limit(12)
    assert(canon(got) == canon(expect))
  }
}
