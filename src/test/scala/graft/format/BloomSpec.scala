package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}

import graft.SparkSpec
import graft.sources.GraftPartitionReader

/** Per-chunk Bloom filters (writer option `bloom`): point lookups on
  * UNSORTED high-cardinality columns — olive's find-by-hash shape — must
  * skip chunks whose filter proves absence, with identical results. */
class BloomSpec extends SparkSpec {

  // 10 chunks of 1000 rows; uid unique across the table, hash32 a unique
  // 32-byte binary per row (the olive id-lookup shape), noise unsorted
  private def writeBloomed(): String = {
    val dir = Files.createTempDirectory("graft-bloom").toString
    spark.range(0, 10000).coalesce(1)
      .selectExpr("concat('uid-', id) AS uid",
        "sha2(cast(id as string), 256) AS hex",
        "unhex(sha2(cast(id as string), 256)) AS hash32",
        "(id * 2654435761) % 1000000 AS noise")
      .write.format("graft")
      .option("chunkrows", "1000")
      .option("bloom", "uid, hash32, noise")
      .mode("overwrite").save(dir)
    dir
  }

  private def graftFile(dir: String): Path =
    new Path(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".graft")).head.toString)

  private def countBatches(p: Path, filters: Array[Filter]): (Int, Long) = {
    val schema = StructType(spark.read.format("graft").load(p.getParent.toString).schema)
    val rd = new GraftPartitionReader(p.getFileSystem(new Configuration()), p,
      schema, None, filters, -1)
    var batches = 0
    var rows = 0L
    try { while (rd.next()) { batches += 1; rows += rd.get().numRows() } } finally rd.close()
    (batches, rows)
  }
  private def StructType(s: org.apache.spark.sql.types.StructType) = s

  test("footer carries blooms for requested supported columns only") {
    val dir = writeBloomed()
    val p = graftFile(dir)
    val r = GraftFileReader.open(p.getFileSystem(new Configuration()), p)
    try {
      val t = r.footer.chunks.head.tables.head
      assert(t.blooms.keySet == Set("uid", "hash32", "noise"))
      // ~1000 distinct values * 10 bits / 8 ≈ 1.25 KB per chunk
      assert(t.blooms("uid").bytes.length < 4096)
      // a column NOT in the option has no bloom
      assert(!t.blooms.contains("hex") || t.blooms.size == 3)
    } finally r.close()
    // no option → no blooms
    val plain = Files.createTempDirectory("graft-bloom-off").toString
    spark.range(0, 100).selectExpr("concat('u', id) AS uid").coalesce(1)
      .write.format("graft").mode("overwrite").save(plain)
    val pp = graftFile(plain)
    val rp = GraftFileReader.open(pp.getFileSystem(new Configuration()), pp)
    try assert(rp.footer.chunks.head.tables.head.blooms.isEmpty)
    finally rp.close()
  }

  test("string and long equality lookups decode ~1 chunk out of 10") {
    val dir = writeBloomed()
    val p = graftFile(dir)
    // present value: its chunk plus ~1% false positives elsewhere
    val (b1, rows1) = countBatches(p, Array(EqualTo("uid", "uid-5432")))
    assert(b1 >= 1 && b1 <= 3, s"expected ~1 chunk, decoded $b1")
    assert(rows1 <= 3000)
    // absent value: usually zero chunks (tolerate rare false positives)
    val (b2, _) = countBatches(p, Array(EqualTo("uid", "uid-999999")))
    assert(b2 <= 2, s"absent key decoded $b2 chunks")
    // IN over two values from two chunks
    val (b3, _) = countBatches(p, Array(In("uid", Array("uid-100", "uid-9900"))))
    assert(b3 >= 2 && b3 <= 4, s"expected ~2 chunks, got $b3")
    // integral column lookup (noise is unsorted: zone maps can't help)
    val noiseVal = (7777L * 2654435761L) % 1000000
    val (b4, _) = countBatches(p, Array(EqualTo("noise", noiseVal)))
    assert(b4 <= 4, s"expected few chunks for long lookup, got $b4")
  }

  test("binary (32-byte hash) lookups skip chunks — the olive id-lookup shape") {
    val dir = writeBloomed()
    val p = graftFile(dir)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("4242".getBytes("UTF-8")) // row id 4242's hash32 value
    val (b, rows) = countBatches(p, Array(EqualTo("hash32", digest)))
    assert(b >= 1 && b <= 3, s"expected ~1 chunk for binary lookup, got $b")
    assert(rows <= 3000)
  }

  test("query results identical with bloom skipping engaged") {
    val dir = writeBloomed()
    val g = spark.read.format("graft").load(dir)
    assert(g.filter(col("uid") === "uid-1234").count() == 1)
    assert(g.filter(col("uid") === "uid-123456").count() == 0)
    assert(g.filter(col("uid").isin("uid-1", "uid-5000", "uid-9999")).count() == 3)
    val row = g.filter(col("uid") === "uid-777").select("hex", "noise").head()
    assert(row.getString(0) == org.apache.commons.codec.digest.DigestUtils.sha256Hex("777"))
    assert(row.getLong(1) == (777L * 2654435761L) % 1000000)
  }
}
