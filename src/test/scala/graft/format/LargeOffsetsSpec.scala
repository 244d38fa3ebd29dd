package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

import graft.SparkSpec

/** The i64-offsets dialect (`graft.largeOffsets` — olive's large_binary/
  * large_utf8/large_list, ref `src/write.zig:795-839`): tagged columns
  * serialize 8-byte offsets, the reader infers the width from buffer
  * size, and content is bit-identical to the i32 form. */
class LargeOffsetsSpec extends SparkSpec {

  private val wide = new MetadataBuilder()
    .putBoolean(ColumnEncoder.LargeOffsetsKey, true).build()

  private def openOnly(dir: String): GraftFileReader = {
    val p = new org.apache.hadoop.fs.Path(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".graft")).head.toString)
    GraftFileReader.open(p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  test("string, list, and map columns round-trip with i64 offsets") {
    val n = 1200
    val df = spark.range(0, n).coalesce(1).select(
      col("id"),
      when(col("id") % 7 === 0, null)
        .otherwise(concat(lit("large-"), col("id"))).as("s", wide),
      sequence(lit(0), col("id") % 5).as("arr", wide),
      map_from_arrays(array(concat(lit("k"), col("id"))), array(col("id") * 2)).as("m", wide),
      concat(lit("narrow-"), col("id")).as("s32")) // untagged control column
    val dir = Files.createTempDirectory("graft-i64").toString
    df.write.format("graft").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(canon(back) == canon(df))
    val r = openOnly(dir)
    try {
      val t = r.footer.chunks.head.tables.head
      def metaOf(name: String) = t.columns(t.schema.fieldIndex(name))
      val sOff = metaOf("s").asInstanceOf[Meta.BinaryMeta].offsets
      val aOff = metaOf("arr").asInstanceOf[Meta.ListMeta].offsets
      val mOff = metaOf("m").asInstanceOf[Meta.MapMeta].offsets
      assert(sOff.rawSize == (n + 1) * 8L, s"s offsets ${sOff.rawSize}")
      assert(aOff.rawSize == (n + 1) * 8L)
      assert(mOff.rawSize == (n + 1) * 8L)
      // the untagged sibling keeps i32 offsets in the same chunk
      metaOf("s32") match {
        case b: Meta.BinaryMeta => assert(b.offsets.rawSize == (n + 1) * 4L)
        case _: Meta.BinDictMeta => // dict-compressed: no per-row offsets buffer
        case other => fail(s"unexpected meta $other")
      }
    } finally r.close()
  }

  test("i64 offsets serve page-range reads (pushed limit decodes a prefix)") {
    val n = 5000
    val df = spark.range(0, n).coalesce(1).select(
      col("id"), concat(lit("v-"), col("id")).as("s", wide))
    val dir = Files.createTempDirectory("graft-i64-range").toString
    // tiny pages so a limit genuinely reads a page prefix
    df.write.format("graft").option("pagesize", "512").mode("append").save(dir)
    val got = spark.read.format("graft").load(dir).orderBy("id").limit(7)
    assert(canon(got) == canon(df.orderBy("id").limit(7)))
  }

  test("a wide child under a struct stays readable (evidence check per child)") {
    import org.apache.spark.sql.types._
    // the struct's count evidence must check each child with the i64
    // escape — a min-over-children would read the wide child's (n+1)*8
    // offsets buffer as 2n+1 rows and reject the file it just wrote
    val inner = StructType(Seq(
      StructField("a", LongType),
      StructField("s", StringType, nullable = true,
        new MetadataBuilder().putBoolean(ColumnEncoder.LargeOffsetsKey, true).build())))
    val df = spark.range(0, 100).coalesce(1)
      .select(col("id"), struct(col("id").as("a"),
        concat(lit("w"), col("id")).as("s")).as("st"))
    val dir = Files.createTempDirectory("graft-i64-struct").toString
    val tagged = spark.createDataFrame(df.rdd,
      StructType(Seq(StructField("id", LongType), StructField("st", inner))))
    tagged.write.format("graft").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(canon(back) == canon(df))
  }

  test("hostile i64 offsets fail cleanly: cap overflow, bad width, non-monotonic") {
    import org.apache.spark.sql.types._
    // hand-build a one-row string column with attacker-chosen offsets
    def hostileFile(offBytes: Array[Byte], entrySize: Int): Array[Byte] = {
      val dir = Files.createTempDirectory("graft-i64-adv")
      val p = dir.resolve("lie.graft")
      val out = new java.io.FileOutputStream(p.toFile)
      out.write(Meta.MagicHead)
      val sink = new PageSink(out, 1 << 20, "balanced")
      val d20 = Meta.DictMeta(20, 0, sink.writeDictData(Array.empty))
      val d32 = Meta.DictMeta(32, 0, sink.writeDictData(Array.empty))
      val offMeta = sink.writeBuffer(offBytes, offBytes.length, Codec.None, entrySize)
      val dataMeta = sink.writeBuffer(Array[Byte](120), 1, Codec.None, 1)
      val colMeta = Meta.BinaryMeta(None, offMeta, dataMeta)
      val schema = StructType(Seq(StructField("s", StringType)))
      val footer = Meta.Footer(Meta.Version, sink.position, Vector(Meta.ChunkMeta(d20, d32,
        Vector(Meta.TableMeta("data", 1, schema, Vector(colMeta),
          Vector(ColStats(0, None, None)))))))
      val fb = Meta.write(footer)
      out.write(fb)
      val tail = new Bytes(12)
      tail.putLong(fb.length.toLong)
      tail.putBytes(Meta.MagicTail)
      out.close()
      Files.readAllBytes(p) ++ tail.toArray
    }
    def le(vs: Long*): Array[Byte] = {
      val b = new Bytes(vs.size * 8); vs.foreach(b.putLong); b.toArray
    }
    def leInts(vs: Int*): Array[Byte] = {
      val b = new Bytes(vs.size * 4); vs.foreach(b.putInt); b.toArray
    }
    def decodeAll(bytes: Array[Byte]): Unit = {
      val tmp = Files.createTempDirectory("graft-i64-adv2")
      val p = tmp.resolve("x.graft")
      Files.write(p, bytes)
      val hp = new org.apache.hadoop.fs.Path(p.toString)
      val r = GraftFileReader.open(hp.getFileSystem(new org.apache.hadoop.conf.Configuration()), hp)
      try r.footer.chunks.foreach(c => c.tables.foreach { t =>
        r.decodeTable(c, t, t.schema).close()
      }) finally r.close()
    }
    // an i64 entry above the JVM single-array cap must raise, not wrap
    val cap = intercept[OliveFormatException](
      decodeAll(hostileFile(le(0L, 3000000000L), 8)))
    assert(cap.getMessage.contains("2 GiB"), cap.getMessage)
    // a buffer matching neither width is rejected before decode
    intercept[OliveFormatException](
      decodeAll(hostileFile(leInts(0, 1, 1), 4))) // 12 bytes for 1 row: neither 8 nor 16
    // non-monotonic i64 offsets are rejected
    val mono = intercept[OliveFormatException](
      decodeAll(hostileFile(le(1L, 0L), 8)))
    assert(mono.getMessage.contains("monotonic") || mono.getMessage.contains("rebased"),
      mono.getMessage)
  }

  test("a repetitive wide column stays plain (dict path is i32-only)") {
    val df = spark.range(0, 2000).coalesce(1)
      .select(col("id"), (col("id") % 4).cast("string").as("rep", wide))
    val dir = Files.createTempDirectory("graft-i64-dict").toString
    df.write.format("graft").mode("append").save(dir)
    assert(canon(spark.read.format("graft").load(dir)) == canon(df))
    val r = openOnly(dir)
    try {
      val t = r.footer.chunks.head.tables.head
      val m = t.columns(t.schema.fieldIndex("rep"))
      assert(m.isInstanceOf[Meta.BinaryMeta], s"wide column dict-encoded: $m")
      assert(m.asInstanceOf[Meta.BinaryMeta].offsets.rawSize == 2001 * 8L)
    } finally r.close()
  }
}
