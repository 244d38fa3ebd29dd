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
