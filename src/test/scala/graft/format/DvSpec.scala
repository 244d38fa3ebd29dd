package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** [[Dv]] position-delete blob codec: round-trip, merge, range
  * subtraction, and hostile-input refusals (the DV is a skip proof — a
  * corrupt one silently drops or resurrects rows, so every malformed
  * shape must refuse loudly). */
class DvSpec extends AnyFunSuite {

  test("round-trip: empty, single, sparse, dense, large gaps") {
    for (pos <- Seq(
        Array.empty[Long],
        Array(0L),
        Array(7L),
        Array(0L, 1L, 2L, 3L),
        Array(5L, 100L, 101L, 1000000L, (1L << 40)),
        (0L until 10000L by 3).toArray)) {
      val blob = Dv.encode(pos)
      assert(Dv.decode(blob).toSeq == pos.toSeq)
    }
  }

  test("encode refuses unsorted and negative positions") {
    intercept[IllegalArgumentException](Dv.encode(Array(3L, 2L)))
    intercept[IllegalArgumentException](Dv.encode(Array(3L, 3L)))
    intercept[IllegalArgumentException](Dv.encode(Array(-1L, 2L)))
  }

  test("decode refuses: truncation, bad magic, checksum flip, trailing bytes, out-of-range") {
    val blob = Dv.encode(Array(1L, 5L, 9L))
    // every possible truncation
    for (n <- 0 until blob.length)
      intercept[OliveFormatException](Dv.decode(java.util.Arrays.copyOf(blob, n)))
    // every single-bit flip is caught (magic, count, body, or checksum)
    for (i <- blob.indices; b <- 0 until 8) {
      val c = blob.clone(); c(i) = (c(i) ^ (1 << b)).toByte
      intercept[OliveFormatException](Dv.decode(c))
    }
    // trailing junk after a valid blob
    intercept[OliveFormatException](Dv.decode(blob ++ Array[Byte](0)))
    // maxPos bound: position 9 in a 9-row file is corruption
    intercept[OliveFormatException](Dv.decode(blob, maxPos = 9L))
    assert(Dv.decode(blob, maxPos = 10L).toSeq == Seq(1L, 5L, 9L))
  }

  test("merge: disjoint, overlapping, duplicate positions") {
    assert(Dv.merge(Array(1L, 3L), Array(2L, 4L)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(Dv.merge(Array(1L, 3L), Array(3L, 4L)).toSeq == Seq(1L, 3L, 4L))
    assert(Dv.merge(Array.empty[Long], Array(2L)).toSeq == Seq(2L))
    assert(Dv.merge(Array(2L), Array.empty[Long]).toSeq == Seq(2L))
    assert(Dv.merge(Array(1L, 2L), Array(1L, 2L)).toSeq == Seq(1L, 2L))
  }

  test("liveRanges: no deletes, interior, edges, full deletion, outside range") {
    assert(Dv.liveRanges(0, 10, Array.empty[Long]) == Seq((0L, 10L)))
    assert(Dv.liveRanges(0, 10, Array(3L)) == Seq((0L, 3L), (4L, 10L)))
    assert(Dv.liveRanges(0, 10, Array(0L)) == Seq((1L, 10L)))
    assert(Dv.liveRanges(0, 10, Array(9L)) == Seq((0L, 9L)))
    assert(Dv.liveRanges(0, 3, Array(0L, 1L, 2L)) == Seq.empty)
    // deletes entirely outside the range leave it untouched
    assert(Dv.liveRanges(5, 8, Array(0L, 4L, 8L, 20L)) == Seq((5L, 8L)))
    // adjacent deleted runs coalesce the survivors correctly
    assert(Dv.liveRanges(0, 10, Array(2L, 3L, 4L, 8L)) ==
      Seq((0L, 2L), (5L, 8L), (9L, 10L)))
    // mid-file range with deletes straddling both edges
    assert(Dv.liveRanges(10, 20, Array(9L, 10L, 19L, 20L)) == Seq((11L, 19L)))
  }

  test("page cache bounds dense-DV decode at O(pages), not O(ranges)") {
    // the merge-on-read access pattern: a chunk split into hundreds of
    // tiny live sub-ranges. Without the reader's opt-in page cache every
    // sub-range re-decompresses its covering page; with it, each page
    // (per column buffer) decompresses once per pass.
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft-dvcache").toString
    import org.apache.spark.sql.functions._
    spark.range(0, 20000).coalesce(1)
      .select(col("id"), (col("id") * 3).as("y"),
        concat(lit("value-"), col("id")).as("s"))
      .write.format("graft").option("pagesize", "4096").mode("append").save(dir)
    val p = new org.apache.hadoop.fs.Path(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".graft")).head.toString)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())

    def decodeAllRanges(r: GraftFileReader): Long = {
      val chunk = r.footer.chunks.head
      val table = chunk.tables.head
      // every 7th row deleted → live ranges of 6 rows each
      val dels = (0L until table.numRows.toLong by 7).toArray
      var rows = 0L
      Dv.liveRanges(0, table.numRows, dels).foreach { case (a, b) =>
        val batch = r.decodeTableRange(chunk, table, table.schema, a.toInt, b.toInt)
        rows += batch.numRows(); batch.close()
      }
      assert(rows == table.numRows - dels.length)
      r.pagesRead
    }
    val rCold = GraftFileReader.open(fs, p)
    val uncached = decodeAllRanges(rCold); rCold.close()
    val rWarm = GraftFileReader.open(fs, p)
    rWarm.enablePageCache()
    val cached = decodeAllRanges(rWarm); rWarm.close()
    // 20000 rows / 4 KiB pages / 3 columns ≈ dozens of pages; 2857 ranges
    assert(cached < uncached / 10,
      s"cache ineffective: $cached decompressions vs $uncached uncached")
    assert(cached <= 200, s"cached decode still decompressed $cached pages")
  }

  test("liveRanges fuzz: survivors == complement of deleted, order preserved") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(50)
      val dels = (0 until n).filter(_ => rnd.nextBoolean()).map(_.toLong).toArray
      val r0 = rnd.nextInt(n)
      val r1 = r0 + 1 + rnd.nextInt(n - r0)
      val got = Dv.liveRanges(r0, r1, dels).flatMap { case (a, b) => a until b }
      val want = (r0.toLong until r1.toLong).filterNot(dels.contains)
      assert(got == want, s"r0=$r0 r1=$r1 dels=${dels.mkString(",")}")
    }
  }
}
