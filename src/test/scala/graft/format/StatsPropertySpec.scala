package graft.format

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Property gates for the columnar stats path: zone maps DRIVE chunk and
  * block skipping (a wrong min/max is silent row loss), so
  * [[ColumnEncoder.statsRange]] is checked against a brute-force
  * reference over random values/nulls/ranges, and [[Stats.InKeyRange]]
  * is checked for the only property that matters — NO false negatives
  * (a probed range containing a key must always intersect). Seeded, so
  * failures reproduce. */
class StatsPropertySpec extends AnyFunSuite {

  private val Iters = 200

  private def rowOf(v: Any): InternalRow = new GenericInternalRow(Array[Any](v))

  private def encode(dt: DataType, values: Seq[Option[Any]]): ColumnEncoder = {
    val enc = ColumnEncoder.forType(dt)
    values.foreach {
      case Some(v) => enc.appendFrom(rowOf(v), 0)
      case None => enc.appendFrom(rowOf(null), 0)
    }
    enc
  }

  private def randRange(r: Random): (Int, Int, Int) = {
    val n = r.nextInt(300)
    val from = if (n == 0) 0 else r.nextInt(n + 1)
    val to = from + (if (n - from == 0) 0 else r.nextInt(n - from + 1))
    (n, from, to)
  }

  test("long statsRange equals brute force over random values, nulls, ranges") {
    val r = new Random(0xA11CE)
    (1 to Iters).foreach { _ =>
      val (n, from, to) = randRange(r)
      val vals = Seq.fill(n)(
        if (r.nextInt(5) == 0) None
        else Some(java.lang.Long.valueOf(r.nextLong() >> r.nextInt(40))))
      val st = encode(LongType, vals).statsRange(from, to)
      val slice = vals.slice(from, to)
      val present = slice.flatten.map(_.asInstanceOf[java.lang.Long].longValue())
      assert(st.nullCount == slice.count(_.isEmpty))
      if (present.isEmpty) assert(st.min.isEmpty && st.max.isEmpty)
      else {
        assert(Stats.longOf(st.min.get) == present.min)
        assert(Stats.longOf(st.max.get) == present.max)
        assert(Stats.longOf(st.sum.get) == present.foldLeft(0L)(_ + _))
      }
    }
  }

  test("double statsRange: NaNs are counted, min/max cover the rest, sum poisons") {
    // footer v5: a NaN no longer drops the chunk's float stats — min/max
    // span the non-NaN values and nanCount says how many the range omits
    // (the skip logic treats a NaN-bearing chunk as unbounded above)
    val r = new Random(0xB0B)
    (1 to Iters).foreach { _ =>
      val (n, from, to) = randRange(r)
      val vals = Seq.fill(n)(r.nextInt(7) match {
        case 0 => None
        case 1 => Some(java.lang.Double.valueOf(Double.NaN))
        case _ => Some(java.lang.Double.valueOf(r.nextDouble() * 1e6 - 5e5))
      })
      val st = encode(DoubleType, vals).statsRange(from, to)
      val slice = vals.slice(from, to)
      val present = slice.flatten.map(_.asInstanceOf[java.lang.Double].doubleValue())
      val real = present.filterNot(_.isNaN)
      assert(st.nullCount == slice.count(_.isEmpty))
      assert(st.nanCount == present.count(_.isNaN))
      if (present.isEmpty) {
        assert(st.min.isEmpty && st.max.isEmpty && st.sum.isEmpty && st.nanCount == 0)
      } else {
        if (present.exists(_.isNaN))
          assert(java.lang.Double.isNaN(Stats.doubleOf(st.sum.get)))
        if (real.isEmpty) assert(st.min.isEmpty && st.max.isEmpty) // all-NaN
        else {
          assert(Stats.doubleOf(st.min.get) == real.min)
          assert(Stats.doubleOf(st.max.get) == real.max)
        }
      }
    }
  }

  test("string statsRange: exact short bounds, parquet-style truncated long bounds") {
    val r = new Random(0xCAFE)
    (1 to Iters).foreach { _ =>
      val (n, from, to) = randRange(r)
      val vals = Seq.fill(n)(r.nextInt(6) match {
        case 0 => None
        case 1 => Some(UTF8String.fromString(
          // over-cap values with a random tail (sorts above/below x-runs)
          "x" * (Stats.MaxStringStat + 1 + r.nextInt(5)) + r.nextPrintableChar()))
        case _ => Some(UTF8String.fromString(
          Seq.fill(r.nextInt(8))(r.nextPrintableChar()).mkString))
      })
      val st = encode(StringType, vals).statsRange(from, to)
      val slice = vals.slice(from, to)
      val present = slice.flatten.map(_.asInstanceOf[UTF8String].getBytes)
      assert(st.nullCount == slice.count(_.isEmpty))
      def cmp(a: Array[Byte], b: Array[Byte]) = java.util.Arrays.compareUnsigned(a, b)
      if (present.isEmpty) assert(st.min.isEmpty && st.max.isEmpty)
      else {
        val trueMin = present.reduceLeft((a, b) => if (cmp(b, a) < 0) b else a)
        val trueMax = present.reduceLeft((a, b) => if (cmp(a, b) < 0) b else a)
        // min is ALWAYS a valid lower bound, capped at the stat width
        assert(st.min.get.length <= Stats.MaxStringStat)
        assert(present.forall(v => cmp(st.min.get, v) <= 0), "min must bound below")
        if (trueMin.length <= Stats.MaxStringStat)
          assert(st.min.get.toSeq == trueMin.toSeq) // short min is exact
        // max: exact when short, a strict upper bound when truncated
        // (printable tails never hit the all-0xff unbounded case)
        assert(st.max.isDefined)
        assert(st.max.get.length <= Stats.MaxStringStat)
        assert(present.forall(v => cmp(st.max.get, v) >= 0), "max must bound above")
        if (trueMax.length <= Stats.MaxStringStat)
          assert(st.max.get.toSeq == trueMax.toSeq)
        // v6 exactness convention: a bound SHORTER than the cap is the
        // exact extreme value (truncated mins are full-cap prefixes,
        // bumped maxima 0x00-pad back to the cap) — what pushed string
        // MIN/MAX serves without decoding
        if (st.min.get.length < Stats.MaxStringStat)
          assert(st.min.get.toSeq == trueMin.toSeq, "sub-cap min must be exact")
        if (st.max.get.length < Stats.MaxStringStat)
          assert(st.max.get.toSeq == trueMax.toSeq, "sub-cap max must be exact")
      }
    }
  }

  test("decimal statsRange: unscaled min/max for p<=18, no sum ever") {
    val r = new Random(0xD0C)
    (1 to Iters).foreach { _ =>
      val (n, from, to) = randRange(r)
      val dt = DecimalType(12, 2)
      val vals = Seq.fill(n)(
        if (r.nextInt(5) == 0) None
        else Some(Decimal(BigDecimal(r.nextInt(2000000) - 1000000, 2), 12, 2)))
      val st = encode(dt, vals).statsRange(from, to)
      val present = vals.slice(from, to).flatten
        .map(_.asInstanceOf[Decimal].toUnscaledLong)
      if (present.isEmpty) assert(st.min.isEmpty && st.max.isEmpty)
      else {
        assert(Stats.longOf(st.min.get) == present.min)
        assert(Stats.longOf(st.max.get) == present.max)
        assert(st.sum.isEmpty) // decimal SUM is never answered from stats
      }
    }
  }

  test("mergeColStats(blocks) equals statsRange over the whole range") {
    val r = new Random(0xFEED)
    (1 to Iters).foreach { _ =>
      val blockRows = 64
      val nBlocks = 1 + r.nextInt(5)
      val n = math.max(1, nBlocks * blockRows - r.nextInt(blockRows))
      // fractional values half the time: block-order addition is a
      // DIFFERENT FP association than the flat scan, so sums agree only
      // to ulp-level tolerance (any association is a correct SQL double
      // SUM); integer-valued doubles under 2^53 are exact in every
      // association and must match bit-for-bit
      val fractional = r.nextBoolean()
      val vals = Seq.fill(n)(r.nextInt(6) match {
        case 0 => None
        case 1 => Some(java.lang.Double.valueOf(Double.NaN))
        case _ => Some(java.lang.Double.valueOf(
          if (fractional) r.nextDouble() * 1000 - 500 else r.nextInt(1000).toDouble))
      })
      val enc = encode(DoubleType, vals)
      val whole = enc.statsRange(0, n)
      val nb = (n + blockRows - 1) / blockRows
      val parts = (0 until nb).map { b =>
        enc.statsRange(b * blockRows, math.min((b + 1) * blockRows, n))
      }
      val hasValues = (0 until nb).map { b =>
        val rows = math.min((b + 1) * blockRows, n) - b * blockRows
        rows - parts(b).nullCount > 0
      }
      val merged = Stats.mergeColStats(DoubleType, parts, hasValues)
      assert(merged.nullCount == whole.nullCount)
      assert(merged.min.map(_.toSeq) == whole.min.map(_.toSeq))
      assert(merged.max.map(_.toSeq) == whole.max.map(_.toSeq))
      assert(merged.sum.isDefined == whole.sum.isDefined)
      (merged.sum, whole.sum) match {
        case (Some(mb), Some(wb)) =>
          val m = Stats.doubleOf(mb)
          val w = Stats.doubleOf(wb)
          if (m.isNaN || w.isNaN) assert(m.isNaN && w.isNaN)
          else if (fractional)
            assert(math.abs(m - w) <= 1e-9 * math.max(1.0, math.abs(w)),
              s"block-merged sum $m drifted beyond ulp noise from $w")
          else assert(mb.toSeq == wb.toSeq) // integral values: bit-exact
        case _ =>
      }
    }
  }

  test("InKeyRange never misses a probed range that contains a key") {
    val r = new Random(0x5EED)
    (1 to Iters).foreach { _ =>
      val keys = Seq.fill(1 + r.nextInt(50))(r.nextInt(4) match {
        case 0 => r.nextLong() // full-range chaos (wrap-span coverage)
        case _ => r.nextInt(1000000).toLong - 500000L
      })
      val kr = buildSummary(keys)
      (1 to 20).foreach { _ =>
        val a = r.nextLong()
        val b = r.nextLong()
        val (mn, mx) = if (a <= b) (a, b) else (b, a)
        if (keys.exists(k => k >= mn && k <= mx))
          assert(kr.mightIntersect(mn, mx), s"missed [$mn,$mx] containing a key")
      }
      keys.foreach(k => assert(kr.mightIntersect(k, k), s"missed own key $k"))
    }
  }

  /** Driver-side twin of [[Stats.InKeyRange.of]]'s bucket math (no Spark
    * session in this suite — the distributed build is exercised end-to-end
    * by SelectiveRewriteSpec; THIS pins the bitmap/probe logic). */
  private def buildSummary(keys: Seq[Long]): Stats.InKeyRange = {
    val mn = keys.min
    val mx = keys.max
    val span = mx - mn
    val width = java.lang.Long.divideUnsigned(span, 1 << 16) + 1
    val bits = new Array[Long]((1 << 16) / 64)
    keys.foreach { v =>
      val b = java.lang.Long.divideUnsigned(v - mn, width).toInt
      bits(b >> 6) |= 1L << (b & 63)
    }
    Stats.InKeyRange("k", mn, mx, width, bits, empty = false)
  }
}
