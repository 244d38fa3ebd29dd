package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The specialized per-row bucket accessor must agree BIT-FOR-BIT with
  * the boxed [[GraftBucket.id]] reference for every supported type —
  * the storage-partitioned join elides shuffles on exactly this
  * agreement, so a divergence is silent wrong results, not a perf bug. */
class BucketAccessorSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xb10c5eed)
  private def row(v: Any): InternalRow = new GenericInternalRow(Array[Any](v))

  private def check(dt: DataType, values: Seq[Any]): Unit =
    for (n <- Seq(1, 2, 7, 16, 65536); v <- values :+ null) {
      val acc = GraftBucket.accessor(dt, 0, n)
      assert(acc(row(v)) === GraftBucket.id(v, dt, n),
        s"accessor diverged from id for $dt value $v buckets $n")
    }

  test("byte/short/int/long/date/timestamp") {
    check(ByteType, Seq.fill(50)(rnd.nextInt().toByte))
    check(ShortType, Seq.fill(50)(rnd.nextInt().toShort))
    check(IntegerType, Seq.fill(50)(rnd.nextInt()) ++ Seq(0, Int.MinValue, Int.MaxValue))
    check(DateType, Seq.fill(50)(rnd.nextInt(40000)))
    check(LongType, Seq.fill(50)(rnd.nextLong()) ++ Seq(0L, Long.MinValue, Long.MaxValue))
    check(TimestampType, Seq.fill(50)(rnd.nextLong()))
  }

  test("boolean") {
    check(BooleanType, Seq(true, false))
  }

  test("string: ascii, unicode, empty, long") {
    val vals: Seq[Any] = Seq("", "a", "hello world", "ünïcödé-Ω≈ç√", "x" * 500) ++
      Seq.fill(30)(rnd.nextString(rnd.nextInt(40)))
    check(StringType, vals.map(s => UTF8String.fromString(s.asInstanceOf[String])))
  }

  test("binary") {
    val vals: Seq[Any] = Seq(Array.emptyByteArray) ++ Seq.fill(30) {
      val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b); b
    }
    check(BinaryType, vals)
  }

  test("decimal falls back to the boxed reference path") {
    val dt = DecimalType(12, 2)
    val vals: Seq[Any] = Seq.fill(20)(
      org.apache.spark.sql.types.Decimal(BigDecimal(rnd.nextLong() % 100000000L, 2), 12, 2))
    check(dt, vals)
  }
}
