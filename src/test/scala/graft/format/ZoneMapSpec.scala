package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.SparkSpec
import graft.sources.GraftPartitionReader

/** Block-level zone maps (parquet column-index / ClickHouse-granule idea):
  * selective filters on clustered data must decode only the ~[[Meta.BlockRows]]
  * row blocks that can match, not the whole 128Ki-row chunk — and results
  * must stay identical whether or not blocks were skipped. */
class ZoneMapSpec extends SparkSpec {

  private def writeSorted(rows: Int): String = {
    val dir = Files.createTempDirectory("graft-zone").toString
    // one partition, default 128Ki chunk rows → ONE chunk, many blocks
    spark.range(0, rows).coalesce(1)
      .selectExpr("id", "id * 3 AS v", "concat('s', id % 100) AS s")
      .write.format("graft").mode("overwrite").save(dir)
    dir
  }

  private def graftFile(dir: String): Path =
    new Path(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".graft")).head.toString)

  test("footer carries block stats; single-block chunks carry none") {
    val dir = writeSorted(40000)
    val p = graftFile(dir)
    val r = GraftFileReader.open(p.getFileSystem(new Configuration()), p)
    try {
      val t = r.footer.chunks.head.tables.head
      assert(t.numRows == 40000)
      val nb = (40000 + Meta.BlockRows - 1) / Meta.BlockRows
      assert(t.blockStats.size == nb, s"expected $nb blocks, got ${t.blockStats.size}")
      // sorted ids: block i covers exactly [i*8192, ...)
      val b1 = t.blockStats(1)(t.schema.fieldIndex("id"))
      assert(Stats.longOf(b1.min.get) == Meta.BlockRows.toLong)
      assert(Stats.longOf(b1.max.get) == 2L * Meta.BlockRows - 1)
    } finally r.close()

    val small = Files.createTempDirectory("graft-zone-small").toString
    spark.range(0, 100).coalesce(1).selectExpr("id")
      .write.format("graft").mode("overwrite").save(small)
    val ps = graftFile(small)
    val rs = GraftFileReader.open(ps.getFileSystem(new Configuration()), ps)
    try assert(rs.footer.chunks.head.tables.head.blockStats.isEmpty)
    finally rs.close()
  }

  test("point lookups decode one block of a kept chunk, not the chunk") {
    val dir = writeSorted(40000)
    val p = graftFile(dir)
    val schema = spark.read.format("graft").load(dir).schema
    // direct partition-reader drive: a point filter inside block 3
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array[Filter](EqualTo("id", 30000L)), -1)
    var rows = 0L
    var batches = 0
    try {
      while (rd.next()) { rows += rd.get().numRows(); batches += 1 }
    } finally rd.close()
    assert(batches == 1, s"expected a single kept block, got $batches batches")
    assert(rows == Meta.BlockRows.toLong,
      s"expected one ${Meta.BlockRows}-row block, decoded $rows rows")

    // range filter spanning blocks 1..2 → one merged range of 2 blocks
    val rd2 = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array[Filter](GreaterThan("id", 10000L), LessThan("id", 20000L)), -1)
    var rows2 = 0L
    try { while (rd2.next()) rows2 += rd2.get().numRows() } finally rd2.close()
    assert(rows2 == 2L * Meta.BlockRows, s"expected two blocks, decoded $rows2 rows")

    // filter matching nothing inside a kept chunk → zero batches
    // (chunk stats keep it: min<=12, max>=12 fails only at block level? no —
    // a value outside every block is outside the chunk too, so use a gap
    // that only blocks can prove: impossible (id, v) combination
    val rd3 = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array[Filter](GreaterThan("id", 100000L)), -1)
    var rows3 = 0L
    try { while (rd3.next()) rows3 += rd3.get().numRows() } finally rd3.close()
    assert(rows3 == 0L)
  }

  test("query results identical with and without block skipping") {
    val rows = 40000
    val dir = writeSorted(rows)
    val g = spark.read.format("graft").load(dir)
    val ref = spark.range(0, rows).coalesce(1)
      .selectExpr("id", "id * 3 AS v", "concat('s', id % 100) AS s")
    for (cond <- Seq(
        col("id") === 30000L, col("id") > 10000L && col("id") < 20000L,
        col("id") <= 5, col("id") > 39990L, col("v") === 90000L,
        col("id") > 100000L, col("s") === "s42")) {
      assert(canon(g.filter(cond)) == canon(ref.filter(cond)), s"mismatch for $cond")
    }
    // pushed limit composes with block skipping
    assert(g.filter(col("id") > 10000L).limit(5).collect().length == 5)
  }

  test("mid-chunk ranges decode columns with empty fixed-binary lists") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // array<struct<x: fixed_size_binary(20)>> with EVERY list empty: the
    // FSB child has NO width evidence (total == 0); a mid-chunk zone-map
    // range must decode it as empty, not reject — mid-chunk ranges
    // deliberately have no full-chunk fallback
    val elem = StructType(Seq(StructField("x", BinaryType, nullable = true,
      new MetadataBuilder().putLong(ColumnEncoder.FixedWidthKey, 20).build())))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("hs", ArrayType(elem, containsNull = true), nullable = true)))
    val rows = (0L until 40000L).map(i =>
      org.apache.spark.sql.Row(i, Seq.empty[org.apache.spark.sql.Row]))
    val df = spark.createDataFrame(rows.asJava, schema)
    val dir = Files.createTempDirectory("graft-zone-fsb").toString
    df.coalesce(1).write.format("graft").mode("overwrite").save(dir)
    val got = spark.read.format("graft").load(dir)
      .filter(col("id") === 30000L).collect()
    assert(got.length == 1)
    assert(got(0).getSeq[Any](1).isEmpty)
  }

  test("decimal zone maps: money predicates skip blocks, results exact") {
    val dir = Files.createTempDirectory("graft-zone-dec").toString
    // d = id * 0.25 exactly, as DECIMAL(12,2): ascending money values
    spark.range(0, 40000).coalesce(1)
      .selectExpr("id", "CAST(CAST(id AS DECIMAL(10,0)) * 0.25 AS DECIMAL(12,2)) AS d")
      .write.format("graft").mode("overwrite").save(dir)
    val p = graftFile(dir)
    val conf = new Configuration()
    val r = GraftFileReader.open(p.getFileSystem(conf), p)
    try {
      val t = r.footer.chunks.head.tables.head
      val ds = t.stats(t.schema.fieldIndex("d"))
      assert(ds.min.isDefined && ds.max.isDefined, "decimal chunk stats missing")
      assert(Stats.longOf(ds.min.get) == 0L)
      assert(Stats.longOf(ds.max.get) == 999975L) // 9999.75 unscaled at scale 2
    } finally r.close()
    // d > 9000.50 keeps only the last block (ids 36003.. live in block 4)
    val schema = spark.read.format("graft").load(dir).schema
    val rd = new GraftPartitionReader(p.getFileSystem(conf), p, schema, None,
      Array[Filter](GreaterThan("d", new java.math.BigDecimal("9000.50"))), -1)
    var rows = 0L
    var batches = 0
    try { while (rd.next()) { rows += rd.get().numRows(); batches += 1 } }
    finally rd.close()
    assert(batches == 1, s"expected one kept block for the money range, got $batches")
    assert(rows == 40000L - 4 * Meta.BlockRows, s"decoded $rows rows")
    // provably-empty range skips the whole chunk
    val rd2 = new GraftPartitionReader(p.getFileSystem(conf), p, schema, None,
      Array[Filter](GreaterThan("d", new java.math.BigDecimal("10000.00"))), -1)
    var rows2 = 0L
    try { while (rd2.next()) rows2 += rd2.get().numRows() } finally rd2.close()
    assert(rows2 == 0L)
    // end-to-end through the scan: exact results either way
    val g = spark.read.format("graft").load(dir)
    assert(g.filter(col("d") > 9000.5).count() == 3997)
    assert(g.filter(col("d") === lit(new java.math.BigDecimal("25.00"))).count() == 1)
  }

  test("wide-decimal (p>18) zone maps: predicates beyond long range skip, sign handled") {
    val dir = Files.createTempDirectory("graft-zone-dec38").toString
    // d = (id - 20000) * 10^20 as DECIMAL(38,4): spans negative to
    // positive with unscaled magnitudes ~2e28 — far outside i64, so any
    // 8-byte shortcut in the stat path would order these WRONG
    spark.range(0, 40000).coalesce(1)
      .selectExpr("id",
        "CAST((CAST(id AS DECIMAL(20,0)) - 20000) * CAST('100000000000000000000' AS DECIMAL(21,0)) AS DECIMAL(38,4)) AS d")
      .write.format("graft").mode("overwrite").save(dir)
    val p = graftFile(dir)
    val conf = new Configuration()
    val r = GraftFileReader.open(p.getFileSystem(conf), p)
    try {
      val t = r.footer.chunks.head.tables.head
      val ds = t.stats(t.schema.fieldIndex("d"))
      assert(ds.min.isDefined && ds.max.isDefined, "wide-decimal chunk stats missing")
      def dec(b: Array[Byte]) = new java.math.BigDecimal(new java.math.BigInteger(b), 4)
      assert(dec(ds.min.get).compareTo(new java.math.BigDecimal("-2000000000000000000000000")) == 0,
        s"min=${dec(ds.min.get)}")
      assert(dec(ds.max.get).compareTo(new java.math.BigDecimal("1999900000000000000000000")) == 0,
        s"max=${dec(ds.max.get)}")
      // block stats carry 16-byte slots too
      assert(t.blockStats.nonEmpty &&
        t.blockStats.head(t.schema.fieldIndex("d")).min.exists(_.length == 16))
    } finally r.close()
    val schema = spark.read.format("graft").load(dir).schema
    def scanRows(f: Filter): (Long, Long) = {
      val rd = new GraftPartitionReader(p.getFileSystem(conf), p, schema, None, Array(f), -1)
      var rows = 0L; var batches = 0L
      try { while (rd.next()) { rows += rd.get().numRows(); batches += 1 } }
      finally rd.close()
      (rows, batches)
    }
    // top of the range: only the last block survives
    val (hiRows, hiBatches) = scanRows(
      GreaterThan("d", new java.math.BigDecimal("1600000000000000000000000")))
    assert(hiBatches == 1, s"want one kept block, got $hiBatches")
    assert(hiRows == 40000L - 4 * Meta.BlockRows, s"decoded $hiRows rows")
    // bottom (negative) end: sign-aware compare keeps only the first block
    val (loRows, loBatches) = scanRows(
      LessThan("d", new java.math.BigDecimal("-1300000000000000000000000")))
    assert(loBatches == 1, s"want one kept block, got $loBatches")
    assert(loRows == Meta.BlockRows.toLong, s"decoded $loRows rows")
    // provably-empty ranges skip the whole chunk
    assert(scanRows(GreaterThan("d", new java.math.BigDecimal("2000000000000000000000000")))._1 == 0L)
    assert(scanRows(LessThan("d", new java.math.BigDecimal("-2000000000000000000000000")))._1 == 0L)
    // end-to-end: results exact with skipping in play
    val g = spark.read.format("graft").load(dir)
    assert(g.filter(col("d") > lit(new java.math.BigDecimal("1999800000000000000000000"))).count() == 1)
    assert(g.filter(col("d") === lit(new java.math.BigDecimal("-2000000000000000000000000"))).count() == 1)
    assert(g.filter(col("d") < lit(new java.math.BigDecimal("0"))).count() == 20000)
  }

  test("nested-leaf zone maps: struct-field predicates skip chunks (q51 shape)") {
    // the multimodal layout: opaque binary payload + typed metadata
    // struct — the exact shape where top-level-only stats prune nothing
    val dir = Files.createTempDirectory("graft-zone-nested").toString
    spark.range(0, 5000).coalesce(1)
      .selectExpr("id AS doc_id",
        "CAST(concat('payload', id) AS BINARY) AS payload",
        "named_struct('source', concat('site', id % 3), 'w', CAST(id AS INT), 'score', id * 0.5) AS meta")
      .write.format("graft").mode("overwrite").save(dir)
    val p = graftFile(dir)
    val r = GraftFileReader.open(p.getFileSystem(new Configuration()), p)
    val t = try r.footer.chunks.head.tables.head finally r.close()
    // footer v4 carries dotted leaf stats for every statable child
    assert(t.nestedStats.keySet == Set("meta.source", "meta.w", "meta.score"),
      s"got ${t.nestedStats.keySet}")
    assert(new String(t.nestedStats("meta.source").min.get, "UTF-8") == "site0")
    assert(new String(t.nestedStats("meta.source").max.get, "UTF-8") == "site2")
    assert(Stats.longOf(t.nestedStats("meta.w").min.get) == 0L)
    assert(Stats.longOf(t.nestedStats("meta.w").max.get) == 4999L)
    // a disprovable struct-field predicate skips the whole chunk
    assert(Stats.canSkipChunk(EqualTo("meta.source", "zzz"), t))
    assert(Stats.canSkipChunk(GreaterThan("meta.w", 10000), t))
    assert(Stats.canSkipChunk(LessThan("meta.score", -1.0d), t))
    // a satisfiable one must NOT skip
    assert(!Stats.canSkipChunk(EqualTo("meta.source", "site1"), t))
    assert(!Stats.canSkipChunk(EqualTo("meta.w", 4000), t))
    // reader drive: zero batches decoded under the disprovable filter
    val schema = spark.read.format("graft").load(dir).schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array[Filter](EqualTo("meta.source", "zzz")), -1)
    var batches = 0
    try { while (rd.next()) batches += 1 } finally rd.close()
    assert(batches == 0, s"expected the chunk skipped, decoded $batches batches")
    // end-to-end through Spark: correctness with the skip in play
    val g = spark.read.format("graft").load(dir)
    assert(g.filter(col("meta.source") === "zzz").count() == 0L)
    assert(g.filter(col("meta.source") === "site1").count() ==
      (0 until 5000).count(_ % 3 == 1))
    // struct-null rows: nested nullCount covers them; IsNotNull prunes
    val dir2 = Files.createTempDirectory("graft-zone-nested-null").toString
    spark.range(0, 100).coalesce(1)
      .selectExpr("id", "CAST(NULL AS STRUCT<source: STRING>) AS meta")
      .write.format("graft").mode("overwrite").save(dir2)
    val p2 = graftFile(dir2)
    val r2 = GraftFileReader.open(p2.getFileSystem(new Configuration()), p2)
    val t2 = try r2.footer.chunks.head.tables.head finally r2.close()
    assert(t2.nestedStats("meta.source").nullCount == 100)
    assert(Stats.canSkipChunk(org.apache.spark.sql.sources.IsNotNull("meta.source"), t2))
  }

  test("nested zone maps reach arbitrary depth (struct-in-struct leaves)") {
    val dir = Files.createTempDirectory("graft-zone-deep").toString
    spark.range(0, 4000).coalesce(1)
      .selectExpr("id",
        "named_struct('inner', named_struct('w', CAST(id AS INT), " +
          "'tag', concat('t', id % 4)), 'flat', CAST(id AS DOUBLE)) AS meta")
      .write.format("graft").mode("overwrite").save(dir)
    val p = graftFile(dir)
    val r = GraftFileReader.open(p.getFileSystem(new Configuration()), p)
    val t = try r.footer.chunks.head.tables.head finally r.close()
    assert(t.nestedStats.keySet ==
      Set("meta.inner.w", "meta.inner.tag", "meta.flat"), s"got ${t.nestedStats.keySet}")
    assert(Stats.longOf(t.nestedStats("meta.inner.w").min.get) == 0L)
    assert(Stats.longOf(t.nestedStats("meta.inner.w").max.get) == 3999L)
    assert(Stats.canSkipChunk(GreaterThan("meta.inner.w", 10000), t))
    assert(Stats.canSkipChunk(EqualTo("meta.inner.tag", "zzz"), t))
    assert(!Stats.canSkipChunk(EqualTo("meta.inner.tag", "t2"), t))
    // reader drive: the depth-2 predicate decodes nothing
    val schema = spark.read.format("graft").load(dir).schema
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, Array[Filter](GreaterThan("meta.inner.w", 10000)), -1)
    var batches = 0
    try { while (rd.next()) batches += 1 } finally rd.close()
    assert(batches == 0, s"expected the chunk skipped, decoded $batches batches")
    // end-to-end through Spark, correctness with the skip in play
    val g = spark.read.format("graft").load(dir)
    assert(g.filter(col("meta.inner.w") > 10000).count() == 0L)
    assert(g.filter(col("meta.inner.tag") === "t2").count() == 1000L)
  }

  test("unsorted data: zone maps keep everything, results stay correct") {
    val dir = Files.createTempDirectory("graft-zone-rand").toString
    spark.range(0, 40000).coalesce(1)
      .selectExpr("(id * 2654435761) % 40000 AS k", "id")
      .write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    assert(g.filter(col("k") === 123L).count() ==
      (0 until 40000).count(i => (i.toLong * 2654435761L) % 40000 == 123L))
  }
}
