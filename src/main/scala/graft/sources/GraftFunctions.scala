package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Hash-bucket assignment shared by the WRITE path (routing rows to
  * bucket files) and the V2 `bucket` function the catalog exposes for
  * storage-partitioned joins. Both sides MUST agree bit-for-bit: Spark
  * only elides the join shuffle because it trusts this function to
  * describe how rows were laid out on disk.
  *
  * The hash is Spark's own Murmur3 (the one `hash()` / shuffle
  * partitioning use) at a fixed private seed, so bucket ids are stable
  * across Spark versions, sessions and languages — a table written once
  * stays joinable forever.
  */
object GraftBucket {
  val Seed = 42L

  /** Bucket ids and counts print as %05d in file names and must stay
    * within 5 digits — the name-tag regex is the layout's proof. */
  val MaxBuckets = 65536

  def id(value: Any, dt: DataType, n: Int): Int = {
    val h = Murmur3HashFunction.hash(value, dt, Seed)
    (((h % n) + n) % n).toInt
  }

  /** Per-row bucket-id accessor resolved ONCE per (type, ordinal): the
    * fixed-width and string/binary types hash through `Murmur3_x86_32`
    * directly — no per-row boxing and no per-row type dispatch on the
    * bucketed write's hot loop. Each arm mirrors what
    * `InterpretedHashFunction.hash` does for that type at the same seed;
    * bit-equality with [[id]] is spec-gated (BucketAccessorSpec), because
    * the storage-partitioned-join contract rides on it. */
  def accessor(dt: DataType, ord: Int, n: Int): InternalRow => Int = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val seedInt = Seed.toInt
    // hash(null) = seed, same for every type
    val nullId = (((Seed % n) + n) % n).toInt
    def m(h: Int): Int = {
      val hl = h.toLong // sign-extended, as InterpretedHashFunction widens
      (((hl % n) + n) % n).toInt
    }
    dt match {
      case ByteType => row =>
        if (row.isNullAt(ord)) nullId else m(Murmur3_x86_32.hashInt(row.getByte(ord).toInt, seedInt))
      case ShortType => row =>
        if (row.isNullAt(ord)) nullId else m(Murmur3_x86_32.hashInt(row.getShort(ord).toInt, seedInt))
      case IntegerType | DateType => row =>
        if (row.isNullAt(ord)) nullId else m(Murmur3_x86_32.hashInt(row.getInt(ord), seedInt))
      case LongType | TimestampType => row =>
        if (row.isNullAt(ord)) nullId else m(Murmur3_x86_32.hashLong(row.getLong(ord), seedInt))
      case BooleanType => row =>
        if (row.isNullAt(ord)) nullId
        else m(Murmur3_x86_32.hashInt(if (row.getBoolean(ord)) 1 else 0, seedInt))
      case StringType => row =>
        if (row.isNullAt(ord)) nullId
        else {
          val s = row.getUTF8String(ord)
          m(Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seedInt))
        }
      case BinaryType => row =>
        if (row.isNullAt(ord)) nullId
        else {
          val b = row.getBinary(ord)
          m(Murmur3_x86_32.hashUnsafeBytes(b,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seedInt))
        }
      // Decimal hashing is precision-dependent; keep the boxed reference path
      case _ => row => id(if (row.isNullAt(ord)) null else row.get(ord, dt), dt, n)
    }
  }

  /** Atomic types with a stable catalyst hash; nested/float types are
    * refused at write time (float equality is a join-key smell anyway). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        DateType | TimestampType | BooleanType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Tag embedded in bucketed file names: identifies (table, column, n,
    * sort column) so a later write bucketed or sorted DIFFERENTLY — or a
    * different table reusing the directory — can never masquerade as the
    * same layout; the scan only claims key-grouping (and per-file sort
    * order) when every file's tag matches the spec marker for ITS table. */
  def layoutTag(table: String, col: String, n: Int, sortCol: Option[String] = None): Long =
    Murmur3HashFunction.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        s"$table:$col:$n${sortCol.map(s => s":sort=$s").getOrElse("")}"),
      StringType, Seed) & 0xffffffffL

  /** `bucketBy` write option: `<col>:<n>`. */
  def parseSpec(spec: String): (String, Int) = spec.split(":", 2) match {
    case Array(c, n) if c.trim.nonEmpty =>
      val buckets =
        try n.trim.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"bucketBy '$spec' is not <col>:<numBuckets>") }
      if (buckets < 1 || buckets > MaxBuckets)
        throw new IllegalArgumentException(
          s"bucketBy bucket count $buckets out of range [1, $MaxBuckets]")
      (c.trim, buckets)
    case _ => throw new IllegalArgumentException(s"bucketBy '$spec' is not <col>:<numBuckets>")
  }
}

/** The catalog-exposed `bucket(n, col)` function. Spark resolves it when
  * a [[GraftScan]] reports `KeyGroupedPartitioning(bucket(n, col))`:
  * both sides of a join over same-spec bucketed graft tables then
  * compare as co-partitioned and the shuffle is planned away entirely
  * (storage-partitioned join). `produceResult` only runs if Spark has to
  * shuffle ONE side to match the other
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) — and must equal
  * the write-side routing, which calls the same [[GraftBucket.id]].
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): graft write-time hash bucket (murmur3, fixed seed)"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.size != 2)
      throw new UnsupportedOperationException(
        s"bucket takes (numBuckets, value); got ${inputType.simpleString}")
    val dt = inputType.fields(1).dataType
    if (!GraftBucket.supported(dt))
      throw new UnsupportedOperationException(s"bucket unsupported for ${dt.simpleString}")
    new GraftBucketBound(dt)
  }
}

/** Per-bucket arrival-order validator for sorted bucketed writes: rows
  * must arrive ascending, nulls first, WITHIN each bucket (the writer
  * streams chunks out as they fill and cannot re-sort). Specialized per
  * sort type so the hot row loop stays boxing-free for the fixed-width
  * types; String/Decimal/anything else keeps the generic boxed path with
  * a stable copy of reused buffers. */
private[sources] abstract class GraftSortTracker(col: String, n: Int) {
  protected val seen = new Array[Boolean](n)
  protected val lastNull = new Array[Boolean](n)
  def check(row: InternalRow, b: Int): Unit
  protected def fail(b: Int, prev: Any, cur: Any): Nothing =
    throw new IllegalArgumentException(
      s"sortBy=$col: rows arrived out of order within bucket $b " +
        s"($prev then $cur); sortWithinPartitions(bucket column, sort column) " +
        "after repartitioning by the bucket column, or drop the sortBy option")
  /** nulls-first bookkeeping shared by every arm: returns true when the
    * non-null comparison should run (a prior non-null value exists). */
  protected final def arriveValue(b: Int): Boolean = {
    val cmp = seen(b) && !lastNull(b)
    seen(b) = true
    lastNull(b) = false
    cmp
  }
  protected final def arriveNull(b: Int, lastShown: => Any): Unit = {
    if (seen(b) && !lastNull(b)) fail(b, lastShown, null)
    seen(b) = true
    lastNull(b) = true
  }
}

private[sources] object GraftSortTracker {
  def apply(schema: StructType, col: String, n: Int): GraftSortTracker = {
    val ord = schema.fieldIndex(col)
    schema.fields(ord).dataType match {
      case ByteType => longTracker(col, n, ord, (r, o) => r.getByte(o).toLong)
      case ShortType => longTracker(col, n, ord, (r, o) => r.getShort(o).toLong)
      case IntegerType | DateType => longTracker(col, n, ord, (r, o) => r.getInt(o).toLong)
      case LongType | TimestampType | TimestampNTZType =>
        longTracker(col, n, ord, (r, o) => r.getLong(o))
      case BooleanType => longTracker(col, n, ord, (r, o) => if (r.getBoolean(o)) 1L else 0L)
      case FloatType => new GraftSortTracker(col, n) {
        private val last = new Array[Float](n)
        def check(row: InternalRow, b: Int): Unit =
          if (row.isNullAt(ord)) arriveNull(b, last(b))
          else {
            val v = row.getFloat(ord)
            if (arriveValue(b) &&
                org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareFloats(last(b), v) > 0)
              fail(b, last(b), v)
            last(b) = v
          }
      }
      case DoubleType => new GraftSortTracker(col, n) {
        private val last = new Array[Double](n)
        def check(row: InternalRow, b: Int): Unit =
          if (row.isNullAt(ord)) arriveNull(b, last(b))
          else {
            val v = row.getDouble(ord)
            if (arriveValue(b) &&
                org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(last(b), v) > 0)
              fail(b, last(b), v)
            last(b) = v
          }
      }
      case dt => new GraftSortTracker(col, n) { // generic boxed path
        private val cmp = org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
        private val last = new Array[Any](n)
        def check(row: InternalRow, b: Int): Unit =
          if (row.isNullAt(ord)) arriveNull(b, last(b))
          else {
            val v = row.get(ord, dt)
            if (arriveValue(b) && cmp.compare(last(b), v) > 0) fail(b, last(b), v)
            // values may be reused buffers (UTF8String, mutable Decimal):
            // keep a stable copy
            last(b) = v match {
              case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
              case d: org.apache.spark.sql.types.Decimal =>
                org.apache.spark.sql.types.Decimal(d.toJavaBigDecimal)
              case other => other
            }
          }
      }
    }
  }

  private def longTracker(col: String, n: Int, ord: Int,
      get: (InternalRow, Int) => Long): GraftSortTracker =
    new GraftSortTracker(col, n) {
      private val last = new Array[Long](n)
      def check(row: InternalRow, b: Int): Unit =
        if (row.isNullAt(ord)) arriveNull(b, last(b))
        else {
          val v = get(row, ord)
          if (arriveValue(b) && last(b) > v) fail(b, last(b), v)
          last(b) = v
        }
    }
}

class GraftBucketBound(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // canonicalName carries the input type: bucket(8, int_col) and
  // bucket(8, string_col) hash differently and must never compare equal
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.id(input.get(1, dt), dt, input.getInt(0))
}
