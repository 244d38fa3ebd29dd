package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** READ compatibility with footer v4 (everything written before the v5
  * round): no leading footer checksum, 4-field pages (no hash), no NaN
  * accounting, no delta page bases. A table written last month must not
  * brick on upgrade — it reads fully, stats still prune, and the v5-only
  * features simply degrade (no page verification, delta replays from 0).
  *
  * The spec serializes a REAL file's parsed footer back into the v4
  * layout (the data section is byte-identical across versions — hashes
  * live only in the footer) and splices it in place. */
class V4CompatSpec extends SparkSpec {

  /** The v4 wire layout, mirrored from the pre-v5 serializer. */
  private def writeV4(f: Meta.Footer): Array[Byte] = {
    import Meta._
    val b = new Bytes(1024)
    def writeString(s: String): Unit = {
      val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      b.putInt(bs.length); b.putBytes(bs)
    }
    def writeBuffer(m: BufferMeta): Unit = {
      b.putByte(m.codec); b.putLong(m.rawSize); b.putInt(m.pages.size)
      m.pages.foreach { p => // v4: no hash field
        b.putLong(p.offset); b.putInt(p.compSize); b.putInt(p.rawSize); b.putInt(p.rowEnd)
      }
    }
    def writeOptBuffer(v: Option[BufferMeta]): Unit = v match {
      case Some(bm) => b.putByte(1); writeBuffer(bm)
      case None => b.putByte(0)
    }
    def writeCol(m: ColMeta): Unit = m match {
      case PrimitiveMeta(v, values) => b.putByte(0); writeOptBuffer(v); writeBuffer(values)
      case DictIdxMeta(v, w, idx) => b.putByte(1); writeOptBuffer(v); b.putInt(w); writeBuffer(idx)
      case BinaryMeta(v, off, data) => b.putByte(2); writeOptBuffer(v); writeBuffer(off); writeBuffer(data)
      case ListMeta(v, off, child) => b.putByte(3); writeOptBuffer(v); writeBuffer(off); writeCol(child)
      case StructMeta(v, cs) => b.putByte(4); writeOptBuffer(v); b.putInt(cs.size); cs.foreach(writeCol)
      case MapMeta(v, off, k, vl) => b.putByte(5); writeOptBuffer(v); writeBuffer(off); writeCol(k); writeCol(vl)
      case BinDictMeta(v, n, w, dOff, dData, idx) =>
        b.putByte(6); writeOptBuffer(v); b.putInt(n); b.putByte(w)
        writeBuffer(dOff); writeBuffer(dData); writeBuffer(idx)
      case ForMeta(v, base, width, values) =>
        b.putByte(7); writeOptBuffer(v); b.putLong(base); b.putByte(width); writeBuffer(values)
      case UnsignedMeta(v, logical, values) =>
        b.putByte(8); writeOptBuffer(v); b.putByte(logical); writeBuffer(values)
      case ReeMeta(v, ends, values) =>
        b.putByte(9); writeOptBuffer(v); writeBuffer(ends); writeBuffer(values)
      case PrimDictMeta(v, n, w, entries, indices) =>
        b.putByte(10); writeOptBuffer(v); b.putInt(n); b.putByte(w)
        writeBuffer(entries); writeBuffer(indices)
      case DeltaMeta(v, first, width, deltas, _) => // v4: no page bases
        b.putByte(11); writeOptBuffer(v); b.putLong(first); b.putByte(width); writeBuffer(deltas)
      case ScaledMeta(v, exponent, inner) =>
        b.putByte(12); writeOptBuffer(v); b.putByte(exponent); writeCol(inner)
      case BitPackMeta(v, base, bits, values) =>
        b.putByte(13); writeOptBuffer(v); b.putLong(base); b.putByte(bits); writeBuffer(values)
      case UnsignedPackedMeta(v, logical, inner) =>
        b.putByte(14); writeOptBuffer(v); b.putByte(logical); writeCol(inner)
    }
    def writeOptBytes(v: Option[Array[Byte]]): Unit = v match {
      case Some(bs) => b.putByte(1); b.putInt(bs.length); b.putBytes(bs)
      case None => b.putByte(0)
    }
    def writeStats(st: ColStats): Unit = { // v4: no nanCount
      require(st.nanCount == 0, "v4 cannot carry NaN accounting — use NaN-free data")
      b.putInt(st.nullCount)
      writeOptBytes(st.min); writeOptBytes(st.max); writeOptBytes(st.sum)
    }
    b.putInt(4) // version — and NO leading checksum
    b.putLong(f.dataSectionSize)
    b.putInt(f.chunks.size)
    f.chunks.foreach { c =>
      Seq(c.dict20, c.dict32).foreach { d =>
        b.putInt(d.width); b.putInt(d.numEntries); writeBuffer(d.data)
      }
      b.putInt(c.tables.size)
      c.tables.foreach { t =>
        writeString(t.name)
        b.putInt(t.numRows)
        writeString(t.schema.json)
        b.putInt(t.columns.size)
        t.columns.foreach(writeCol)
        t.stats.foreach(writeStats)
        b.putInt(t.blockStats.size)
        t.blockStats.foreach(_.foreach(writeStats))
        b.putInt(t.blooms.size)
        t.blooms.toSeq.sortBy(_._1).foreach { case (col, bits) =>
          writeString(col); b.putInt(bits.bytes.length); b.putBytes(bits.bytes)
        }
        b.putInt(t.nestedStats.size)
        t.nestedStats.toSeq.sortBy(_._1).foreach { case (attr, st) =>
          writeString(attr); writeStats(st)
        }
        b.putInt(t.blockNestedStats.size)
        t.blockNestedStats.foreach { m =>
          b.putInt(m.size)
          m.toSeq.sortBy(_._1).foreach { case (attr, st) =>
            writeString(attr); writeStats(st)
          }
        }
      }
    }
    b.toArray
  }

  test("a v4 file reads whole: values equal, stats prune, delta falls back") {
    val dir = Files.createTempDirectory("graft-v4").toString
    // id delta-encodes; d is a NaN-free double; s short strings (v4
    // stored stats for exactly these shapes)
    spark.range(0, 30000).coalesce(1)
      .selectExpr("id", "CAST(id AS DOUBLE) / 2.0 AS d",
        "concat('w', CAST(id % 40 AS STRING)) AS s")
      .write.format("graft").option("pagesize", "4096")
      .option("chunkrows", "4096").mode("overwrite").save(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).head
    val hp = new Path(f.toString)
    val fs = hp.getFileSystem(new Configuration())
    val r5 = GraftFileReader.open(fs, hp)
    val footer5 = r5.footer
    r5.close()
    val want = spark.read.format("graft").load(dir).collect().map(_.toString).sorted

    // re-serialize the footer as v4 and splice it over the v5 one
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    val origLen = Bytes.le(raw).getLong(raw.length - 12)
    val v4 = writeV4(footer5)
    val tail = new Bytes(12)
    tail.putLong(v4.length.toLong)
    tail.putBytes(Meta.MagicTail)
    java.nio.file.Files.write(f.toPath,
      raw.slice(0, raw.length - 12 - origLen.toInt) ++ v4 ++ tail.toArray)

    val r4 = GraftFileReader.open(fs, hp)
    assert(r4.footer.version == 4)
    assert(r4.footer.chunks.head.tables.head.stats.forall(_.nanCount == 0))
    r4.close()

    val g = spark.read.format("graft").load(dir)
    assert(g.collect().map(_.toString).sorted.toSeq == want.toSeq,
      "v4 file must read byte-identically")
    // zone maps from the v4 footer still prune
    assert(g.filter(col("id") === 29999L).count() == 1L)
    assert(g.filter(col("d") > 14000.0).count() ==
      (0 until 30000).count(_ / 2.0 > 14000.0).toLong)
    // delta mid-range read: no bases → full replay fallback, still exact
    val rr = GraftFileReader.open(fs, hp)
    val chunk = rr.footer.chunks.head
    val t = chunk.tables.head
    val batch = rr.decodeTableRange(chunk, t, t.schema, 2000, 2100)
    assert(batch.numRows() == 100 && batch.getRow(0).getLong(0) == 2000L)
    batch.close(); rr.close()
  }

  test("v5 string bounds are proofs only: pushed MIN/MAX decodes, never serves them") {
    // a v5 bumped max could shrink below the stat cap by trailing-0xff
    // stripping, indistinguishable from an exact value — so the v6
    // sub-cap-implies-exact rule must be VERSION-GATED. Plant a v5
    // footer whose string bounds are valid but NOT-ATTAINED (exactly
    // what a strip-shortened bump looks like): a reader that trusted
    // them would emit the planted bytes; the correct reader decodes and
    // returns the true extremes.
    val dir = Files.createTempDirectory("graft-v5str").toString
    spark.range(0, 5000).coalesce(1)
      .selectExpr("id", "concat('m', lpad(CAST(id AS STRING), 5, '0')) AS s")
      .write.format("graft").option("chunkrows", "2500").mode("overwrite").save(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).head
    val hp = new Path(f.toString)
    val fs = hp.getFileSystem(new Configuration())
    val r6 = GraftFileReader.open(fs, hp)
    val footer6 = r6.footer
    r6.close()
    val loBound = Array[Byte]('a'.toByte) // valid lower bound, never attained
    val hiBound = "zzz".getBytes("US-ASCII") // valid upper bound, never attained
    val tampered = footer6.copy(version = 5, chunks = footer6.chunks.map(c => c.copy(
      tables = c.tables.map { t =>
        val sIdx = t.schema.fieldNames.indexOf("s")
        t.copy(stats = t.stats.zipWithIndex.map { case (st, i) =>
          if (i == sIdx) st.copy(min = Some(loBound), max = Some(hiBound)) else st
        })
      })))
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    val origLen = Bytes.le(raw).getLong(raw.length - 12)
    val v5 = Meta.write(tampered)
    val tail = new Bytes(12)
    tail.putLong(v5.length.toLong)
    tail.putBytes(Meta.MagicTail)
    java.nio.file.Files.write(f.toPath,
      raw.slice(0, raw.length - 12 - origLen.toInt) ++ v5 ++ tail.toArray)
    val rr = GraftFileReader.open(fs, hp)
    assert(rr.footer.version == 5)
    rr.close()
    val g = spark.read.format("graft").load(dir)
    val df = g.agg(min("s").as("mn"), max("s").as("mx"))
    assert(df.queryExecution.executedPlan.toString.contains("pushedAggs="),
      df.queryExecution.executedPlan.toString)
    val row = df.head
    assert(row.getString(0) == "m00000", s"served a v5 bound as a value: ${row.getString(0)}")
    assert(row.getString(1) == "m04999", s"served a v5 bound as a value: ${row.getString(1)}")
  }

  test("v4 NaN chunks: pushed float MIN/MAX decodes the column instead of refusing") {
    // v4 dropped min/max ENTIRELY for NaN-bearing float chunks and
    // recorded no nanCount — after upgrade, a pushed MIN/MAX over that
    // exact data must fall back to a one-column decode per chunk, not
    // throw (the pre-upgrade files are what the feature targets)
    val dir = Files.createTempDirectory("graft-v4nan").toString
    spark.range(0, 9000).coalesce(1)
      .selectExpr("id",
        "CASE WHEN id % 100 = 0 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS d")
      .write.format("graft").option("chunkrows", "3000").mode("overwrite").save(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).head
    val hp = new Path(f.toString)
    val fs = hp.getFileSystem(new Configuration())
    val r6 = GraftFileReader.open(fs, hp)
    val footer6 = r6.footer
    r6.close()
    // the v4-era stat shape for NaN-bearing columns: bounds gone, no
    // NaN accounting (sums stay — v4 stored the NaN-poisoned sum)
    def strip(st: ColStats): ColStats =
      if (st.nanCount > 0) ColStats(st.nullCount, None, None, st.sum)
      else st
    val v4Footer = footer6.copy(chunks = footer6.chunks.map(c => c.copy(
      tables = c.tables.map(t => t.copy(
        stats = t.stats.map(strip),
        blockStats = t.blockStats.map(_.map(strip)),
        nestedStats = t.nestedStats.map { case (k, v) => k -> strip(v) },
        blockNestedStats = t.blockNestedStats.map(_.map { case (k, v) => k -> strip(v) }))))))
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    val origLen = Bytes.le(raw).getLong(raw.length - 12)
    val v4 = writeV4(v4Footer)
    val tail = new Bytes(12)
    tail.putLong(v4.length.toLong)
    tail.putBytes(Meta.MagicTail)
    java.nio.file.Files.write(f.toPath,
      raw.slice(0, raw.length - 12 - origLen.toInt) ++ v4 ++ tail.toArray)
    val g = spark.read.format("graft").load(dir)
    val df = g.agg(min("d").as("mn"), max("d").as("mx"))
    assert(df.queryExecution.executedPlan.toString.contains("pushedAggs="),
      df.queryExecution.executedPlan.toString)
    val r = df.head
    // Spark orders NaN above every value: min is the smallest real
    // (id=0 is NaN, so 1.0), max is NaN
    assert(r.getDouble(0) == 1.0, s"min ${r.getDouble(0)}")
    assert(r.getDouble(1).isNaN, s"max ${r.getDouble(1)}")
  }
}
