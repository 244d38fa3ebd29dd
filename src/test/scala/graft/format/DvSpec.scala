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
