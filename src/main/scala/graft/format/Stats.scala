package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-chunk column statistics for scan pruning.
  *
  * An extension over the reference (which stores only per-page
  * `row_index_ends` and no value stats — SURVEY.md §4.1 "page-skipping
  * index"): min/max per top-level column per chunk lets the reader skip
  * whole chunks against pushed filters, the 100 TB lever where most data
  * never leaves disk.
  *
  * Encodings: integral/date/timestamp → i64 LE; float/double → f64 LE;
  * string → raw UTF-8 bytes (unsigned-lexicographic order, same as
  * Spark's UTF8String binary comparison). Strings longer than 48 bytes
  * disable stats for the column's chunk (no truncation tricks — a
  * truncated max is not an upper bound).
  */
/** `sum` (8 bytes, added in footer v3) carries the column's chunk sum for
  * SUM pushdown: wrapped-mod-2^64 long bits for integral types (wrapping
  * is associative, so per-chunk partials combine to exactly the full
  * wrapped sum Spark's non-ANSI codegen computes), f64 bits for
  * float/double. None for all-null chunks and non-summable types. */
case class ColStats(nullCount: Int, min: Option[Array[Byte]], max: Option[Array[Byte]],
    sum: Option[Array[Byte]] = None) {
  def hasNulls: Boolean = nullCount > 0
  override def equals(o: Any): Boolean = o match {
    case ColStats(nc, mn, mx, sm) =>
      nc == nullCount &&
        mn.map(_.toSeq) == min.map(_.toSeq) && mx.map(_.toSeq) == max.map(_.toSeq) &&
        sm.map(_.toSeq) == sum.map(_.toSeq)
    case _ => false
  }
}

object Stats {
  val MaxStringStat = 48

  /** Collects min/max/null stats for one top-level column while rows are
    * appended. Only "flat" orderable types participate. */
  sealed abstract class Collector(ord: Int) {
    protected var nulls = 0
    protected var seen = false
    protected var broken = false
    // updateValue runs on EVERY non-null value even after `broken`
    // (which only poisons min/max): the double collector's sum must keep
    // accumulating past the NaN that dropped its ordering stats
    final def update(row: InternalRow): Unit =
      if (row.isNullAt(ord)) nulls += 1
      else { seen = true; updateValue(row) }
    protected def updateValue(row: InternalRow): Unit
    /** Fold another collector's state into this one — the chunk-level
      * collector absorbs each block collector as its block closes, so the
      * hot row loop updates ONE collector set, not two. Same-type only
      * (both sides come from the same `collectorFor`). */
    def merge(other: Collector): Unit = {
      nulls += other.nulls
      seen |= other.seen
      broken |= other.broken
      mergeValue(other)
    }
    protected def mergeValue(other: Collector): Unit
    def result(): ColStats
    def reset(): Unit = { nulls = 0; seen = false; broken = false }
  }

  private final class LongCollector(ord: Int, get: InternalRow => Long) extends Collector(ord) {
    private var mn = Long.MaxValue
    private var mx = Long.MinValue
    private var sm = 0L
    protected def updateValue(row: InternalRow): Unit = {
      val v = get(row)
      if (v < mn) mn = v
      if (v > mx) mx = v
      sm += v // deliberate wrap: associative, matches Spark's non-ANSI sum
    }
    protected def mergeValue(other: Collector): Unit = {
      val o = other.asInstanceOf[LongCollector]
      if (o.mn < mn) mn = o.mn
      if (o.mx > mx) mx = o.mx
      sm += o.sm
    }
    def result(): ColStats =
      if (!seen) ColStats(nulls, None, None)
      else ColStats(nulls, Some(longBytes(mn)), Some(longBytes(mx)), Some(longBytes(sm)))
    override def reset(): Unit = {
      super.reset(); mn = Long.MaxValue; mx = Long.MinValue; sm = 0L
    }
  }

  private final class DoubleCollector(ord: Int, get: InternalRow => Double) extends Collector(ord) {
    private var mn = Double.PositiveInfinity
    private var mx = Double.NegativeInfinity
    private var sm = 0.0
    protected def updateValue(row: InternalRow): Unit = {
      val v = get(row)
      sm += v // a NaN poisons the sum to NaN — exactly what SUM returns
      if (broken) return
      if (v.isNaN) { broken = true; return } // NaN breaks ordering; drop min/max
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    protected def mergeValue(other: Collector): Unit = {
      val o = other.asInstanceOf[DoubleCollector]
      // sum accumulates past `broken` (NaN poisons it to NaN, which is
      // what SUM returns); block-sum addition instead of sequential
      // addition is an equally valid FP order
      sm += o.sm
      if (o.mn < mn) mn = o.mn
      if (o.mx > mx) mx = o.mx
    }
    def result(): ColStats = {
      val sum = if (seen) Some(doubleBytes(sm)) else None
      if (!seen || broken) ColStats(nulls, None, None, sum)
      else ColStats(nulls, Some(doubleBytes(mn)), Some(doubleBytes(mx)), sum)
    }
    override def reset(): Unit = {
      super.reset(); mn = Double.PositiveInfinity; mx = Double.NegativeInfinity; sm = 0.0
    }
  }

  private final class StringCollector(ord: Int) extends Collector(ord) {
    private var mn: Array[Byte] = null
    private var mx: Array[Byte] = null
    protected def updateValue(row: InternalRow): Unit = {
      if (broken) return
      val b = row.getUTF8String(ord).getBytes
      if (b.length > MaxStringStat) { broken = true; return }
      if (mn == null || java.util.Arrays.compareUnsigned(b, mn) < 0) mn = b
      if (mx == null || java.util.Arrays.compareUnsigned(b, mx) > 0) mx = b
    }
    protected def mergeValue(other: Collector): Unit = {
      val o = other.asInstanceOf[StringCollector]
      if (o.mn != null && (mn == null || java.util.Arrays.compareUnsigned(o.mn, mn) < 0)) mn = o.mn
      if (o.mx != null && (mx == null || java.util.Arrays.compareUnsigned(o.mx, mx) > 0)) mx = o.mx
    }
    def result(): ColStats =
      if (!seen || broken) ColStats(nulls, None, None)
      else ColStats(nulls, Some(mn), Some(mx))
    override def reset(): Unit = { super.reset(); mn = null; mx = null }
  }

  private final class NullOnlyCollector(ord: Int) extends Collector(ord) {
    protected def updateValue(row: InternalRow): Unit = {}
    protected def mergeValue(other: Collector): Unit = {}
    def result(): ColStats = ColStats(nulls, None, None)
  }

  def collectorFor(dt: DataType, ord: Int): Collector = dt match {
    case ByteType => new LongCollector(ord, _.getByte(ord).toLong)
    case ShortType => new LongCollector(ord, _.getShort(ord).toLong)
    case IntegerType | DateType => new LongCollector(ord, _.getInt(ord).toLong)
    case LongType | TimestampType | TimestampNTZType => new LongCollector(ord, _.getLong(ord))
    case FloatType => new DoubleCollector(ord, _.getFloat(ord).toDouble)
    case DoubleType => new DoubleCollector(ord, _.getDouble(ord))
    case BooleanType => new LongCollector(ord, r => if (r.getBoolean(ord)) 1L else 0L)
    case StringType => new StringCollector(ord)
    case _ => new NullOnlyCollector(ord)
  }

  def longBytes(v: Long): Array[Byte] = { val b = new Bytes(8); b.putLong(v); b.toArray }
  def doubleBytes(v: Double): Array[Byte] = { val b = new Bytes(8); b.putDouble(v); b.toArray }
  def longOf(b: Array[Byte]): Long = Bytes.le(b).getLong(0)
  def doubleOf(b: Array[Byte]): Double = java.lang.Double.longBitsToDouble(Bytes.le(b).getLong(0))

  // ---- chunk skipping -------------------------------------------------------

  /** Statically-typed view of one column's chunk range for comparisons. */
  private case class Range(dt: DataType, stats: ColStats) {
    def cmpMin(v: Any): Option[Int] = stats.min.flatMap(b => cmp(b, v))
    def cmpMax(v: Any): Option[Int] = stats.max.flatMap(b => cmp(b, v))
    /** compare stat bytes to the filter literal; None = incomparable. */
    private def cmp(stat: Array[Byte], v: Any): Option[Int] = (dt, v) match {
      case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
        // a fractional literal truncated to long would make the range
        // check lie (LessThan(id, 9.5) vs min=9); Catalyst's cast
        // unwrapping means this shouldn't reach us, but stay safe
        if (n.doubleValue() != n.longValue().toDouble) None
        else Some(java.lang.Long.compare(longOf(stat), n.longValue()))
      case (DateType, dd: java.sql.Date) =>
        Some(java.lang.Long.compare(longOf(stat),
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(dd).toLong))
      case (DateType, dd: java.time.LocalDate) =>
        Some(java.lang.Long.compare(longOf(stat), dd.toEpochDay))
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(java.lang.Long.compare(longOf(stat),
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)))
      case (TimestampType, t: java.time.Instant) =>
        Some(java.lang.Long.compare(longOf(stat),
          org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t)))
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        Some(java.lang.Long.compare(longOf(stat),
          org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t)))
      case (FloatType | DoubleType, n: Number) =>
        Some(java.lang.Double.compare(doubleOf(stat), n.doubleValue()))
      case (StringType, s: String) =>
        Some(java.util.Arrays.compareUnsigned(stat, UTF8String.fromString(s).getBytes))
      case (BooleanType, bl: java.lang.Boolean) =>
        Some(java.lang.Long.compare(longOf(stat), if (bl) 1L else 0L))
      case _ => None
    }
  }

  /** True iff `filter` proves the chunk can contain NO matching row.
    * Conservative: anything not understood returns false (keep chunk). */
  def canSkip(filter: Filter, schema: StructType, stats: Map[String, ColStats],
      numRows: Int = -1): Boolean = {
    def range(attr: String): Option[Range] =
      stats.get(attr).flatMap(s =>
        schema.fields.find(_.name == attr).map(f => Range(f.dataType, s)))
    filter match {
      case EqualTo(a, v) => range(a).exists(r =>
        r.cmpMin(v).exists(_ > 0) || r.cmpMax(v).exists(_ < 0))
      case GreaterThan(a, v) => range(a).exists(_.cmpMax(v).exists(_ <= 0))
      case GreaterThanOrEqual(a, v) => range(a).exists(_.cmpMax(v).exists(_ < 0))
      case LessThan(a, v) => range(a).exists(_.cmpMin(v).exists(_ >= 0))
      case LessThanOrEqual(a, v) => range(a).exists(_.cmpMin(v).exists(_ > 0))
      // an EMPTY In-list matches nothing, for every chunk — without this
      // an empty CDC batch's In(key, []) can never prove a skip and a
      // no-op fold degrades to a full-table rewrite
      case In(_, vs) if vs != null && vs.isEmpty => true
      case In(a, vs) if vs != null && vs.nonEmpty =>
        range(a).exists(r => vs.forall(v =>
          r.cmpMin(v).exists(_ > 0) || r.cmpMax(v).exists(_ < 0)))
      case IsNull(a) => stats.get(a).exists(_.nullCount == 0)
      case org.apache.spark.sql.sources.IsNotNull(a) =>
        // an ALL-null chunk proves no row passes IsNotNull
        numRows >= 0 && stats.get(a).exists(_.nullCount == numRows)
      case And(l, r) => canSkip(l, schema, stats, numRows) || canSkip(r, schema, stats, numRows)
      case Or(l, r) => canSkip(l, schema, stats, numRows) && canSkip(r, schema, stats, numRows)
      case _ => false
    }
  }

  /** Bloom-filter chunk skipping: an equality literal whose hash probes
    * miss the column's per-chunk bloom PROVES the chunk holds no match
    * (the filter shape zone maps can't serve — point lookups on unsorted
    * high-cardinality ids). Shared by the executor-side reader and the
    * driver-side DML candidate-file selection. */
  def bloomSkip(t: Meta.TableMeta, f: Filter): Boolean = {
    def bytesFor(attr: String, v: Any): Option[Array[Byte]] =
      t.schema.fields.find(_.name == attr)
        .flatMap(fl => Bloom.literalBytes(fl.dataType, v))
    f match {
      case EqualTo(a, v) => t.blooms.get(a).exists(bf =>
        bytesFor(a, v).exists(b => !Bloom.mightContain(bf.bytes, b)))
      case In(a, vs) if vs != null && vs.nonEmpty => t.blooms.get(a).exists { bf =>
        val bs = vs.map(v => bytesFor(a, v))
        bs.forall(_.isDefined) &&
          bs.forall(b => !Bloom.mightContain(bf.bytes, b.get))
      }
      case And(l, r) => bloomSkip(t, l) || bloomSkip(t, r)
      case Or(l, r) => bloomSkip(t, l) && bloomSkip(t, r)
      case _ => false
    }
  }

  /** True iff `f` proves this chunk of the table holds NO matching row —
    * zone maps plus blooms, the full skip arsenal over one TableMeta. */
  def canSkipChunk(f: Filter, t: Meta.TableMeta): Boolean = {
    val stats = t.schema.fieldNames.zip(t.stats).toMap
    canSkip(f, t.schema, stats, t.numRows) || bloomSkip(t, f)
  }

  // ---- manifest stats codec -------------------------------------------------
  // A file's per-chunk zone maps, serialized small enough to ride a carry
  // manifest line: DML candidate selection then prunes manifest-covered
  // files with ZERO per-file I/O (the iceberg/delta "stats in the
  // manifest" shape), and only footer-probes recent files plus the few
  // candidates min/max alone can't clear (giving blooms a second pass).
  // One JSON array entry per (chunk, table): name, numRows, schema DDL,
  // per-column {nc, mn, mx} with bytes base64'd. Blooms deliberately
  // stay in footers — they are KBs-MBs per column.

  def statsToJson(tables: Seq[Meta.TableMeta]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    val b64 = java.util.Base64.getEncoder
    tables.foreach { t =>
      val e = arr.addObject()
      e.put("t", t.name)
      e.put("n", t.numRows)
      e.put("s", t.schema.toDDL)
      val cols = e.putArray("c")
      t.stats.foreach { cs =>
        val c = cols.addObject()
        c.put("nc", cs.nullCount)
        cs.min.foreach(m => c.put("mn", b64.encodeToString(m)))
        cs.max.foreach(m => c.put("mx", b64.encodeToString(m)))
      }
    }
    mapper.writeValueAsString(arr)
  }

  /** Inverse of [[statsToJson]]: synthetic TableMetas carrying exactly
    * what [[canSkipChunk]]'s zone-map half consumes (no columns, no
    * blooms). Any parse failure returns None — the caller falls back to
    * the footer probe, never a wrong skip. */
  def statsFromJson(json: String): Option[Seq[Meta.TableMeta]] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      val b64 = java.util.Base64.getDecoder
      val out = Vector.newBuilder[Meta.TableMeta]
      node.forEach { e =>
        val schema = org.apache.spark.sql.types.StructType.fromDDL(e.get("s").asText())
        val stats = Vector.newBuilder[ColStats]
        e.get("c").forEach { c =>
          stats += ColStats(
            c.get("nc").asInt(),
            Option(c.get("mn")).map(m => b64.decode(m.asText())),
            Option(c.get("mx")).map(m => b64.decode(m.asText())))
        }
        out += Meta.TableMeta(e.get("t").asText(), e.get("n").asInt(), schema,
          Vector.empty, stats.result())
      }
      Some(out.result())
    } catch { case _: Exception => None }
}
