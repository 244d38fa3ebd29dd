package graft.format

import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._

import Meta._

/** Chunk-global dictionary builder for one fixed width (20 or 32).
  *
  * Mirrors the reference's signature feature (steelcake/olive
  * `src/dict.zig:493-536`): all fixed-size-binary-20/32 values from every
  * table/column of a chunk share one dictionary; columns store u32
  * indices. Entries are sorted unsigned-lexicographically (the reference's
  * comparator is order-broken by design — SURVEY.md §2.A D3 — so no
  * consumer relies on its order; ours is a real total order).
  */
final class DictBuild(val width: Int) {
  private final class Key(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }
  private val map = new java.util.HashMap[Key, Integer]()
  private var sorted: Array[Array[Byte]] = null

  def add(src: Array[Byte]): Unit = {
    require(sorted == null, "dict already finished")
    map.putIfAbsent(new Key(src), Integer.valueOf(0))
  }

  def numEntries: Int = map.size

  /** Sort entries, assign final indices, return concatenated entry bytes. */
  def finish(): Array[Byte] = {
    val keys = new Array[Array[Byte]](map.size)
    val it = map.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next().bytes; i += 1 }
    java.util.Arrays.sort(keys, java.util.Arrays.compareUnsigned(_: Array[Byte], _: Array[Byte]))
    i = 0
    while (i < keys.length) { map.put(new Key(keys(i)), Integer.valueOf(i)); i += 1 }
    sorted = keys
    val out = new Array[Byte](keys.length * width)
    i = 0
    while (i < keys.length) { System.arraycopy(keys(i), 0, out, i * width, width); i += 1 }
    out
  }

  def indexOf(bytes: Array[Byte]): Int = {
    val v = map.get(new Key(bytes))
    if (v == null) throw new IllegalStateException("value missing from dict")
    v.intValue()
  }

  def reset(): Unit = { map.clear(); sorted = null }
}

/** Optional validity bitmap; elided entirely when no nulls, like the
  * reference (`src/write.zig:841-857`). */
final class ValidityBuilder {
  private var bits = new Array[Byte](64)
  private var n = 0
  private var nulls = 0

  def add(valid: Boolean): Unit = {
    if (n / 8 >= bits.length) bits = java.util.Arrays.copyOf(bits, bits.length * 2)
    if (valid) bits(n >> 3) = (bits(n >> 3) | (1 << (n & 7))).toByte
    else nulls += 1
    n += 1
  }
  def count: Int = n
  def nullCount: Int = nulls
  def isValidAt(i: Int): Boolean = (bits(i >> 3) & (1 << (i & 7))) != 0
  /** Nulls among positions [from, to): popcount over the validity bits —
    * the null-count half of columnar stats computation. */
  def nullCountIn(from: Int, to: Int): Int = {
    if (nulls == 0 || to <= from) return 0
    var valid = 0
    var i = from
    while (i < to && (i & 7) != 0) { if (isValidAt(i)) valid += 1; i += 1 }
    while (i + 8 <= to) { valid += java.lang.Integer.bitCount(bits(i >> 3) & 0xff); i += 8 }
    while (i < to) { if (isValidAt(i)) valid += 1; i += 1 }
    (to - from) - valid
  }
  def write(sink: PageSink): Option[BufferMeta] =
    if (nulls == 0) None
    else Some(sink.writeBuffer(bits, (n + 7) / 8, Codec.Lz4, 1))
  def reset(): Unit = { java.util.Arrays.fill(bits, 0.toByte); n = 0; nulls = 0 }
}

/** Growable offsets starting at 0 (always rebased on disk, like the
  * reference `src/write.zig:962-980`). Serializes as i32 by default; a
  * column tagged `graft.largeOffsets` writes the i64 dialect instead —
  * the reference's `large_binary`/`large_list` offset width
  * (`src/write.zig:795-839`). Values themselves stay <= 2 GiB either
  * way: that is the JVM single-array materialization cap ([[Bytes
  * .MaxBufferBytes]]), an environment limit rather than a format one. */
final class OffsetsBuilder(val wide: Boolean = false) {
  private var arr = new Array[Int](64)
  private var n = 1 // offsets[0] == 0
  def last: Int = arr(n - 1)
  def add(end: Int): Unit = {
    if (n >= arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = end; n += 1
  }
  def size: Int = n
  def entry(i: Int): Int = arr(i)
  def width: Int = if (wide) 8 else 4
  def toBytes: (Array[Byte], Int) = {
    val w = width
    val out = new Array[Byte](n * w)
    val bb = Bytes.le(out)
    var i = 0
    if (wide) while (i < n) { bb.putLong(arr(i).toLong); i += 1 }
    else while (i < n) { bb.putInt(arr(i)); i += 1 }
    (out, n * w)
  }
  def reset(): Unit = { arr(0) = 0; n = 1 }
}

/** Per-column typed encoder: appends values from Spark's row/array getters
  * into columnar buffers, then serializes to pages. One encoder tree per
  * column, mirroring the reference's per-array writers
  * (`src/write.zig:114-232`).
  */
sealed abstract class ColumnEncoder {
  val validity = new ValidityBuilder
  final def appendFrom(src: SpecializedGetters, ord: Int): Unit =
    if (src.isNullAt(ord)) appendNull()
    else { validity.add(true); appendValue(src, ord) }
  final def appendNull(): Unit = { validity.add(false); appendNullSlot() }
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit
  protected def appendNullSlot(): Unit
  /** First pass of chunk-global dict encoding: offer 20/32-byte values. */
  def collectDict(d20: DictBuild, d32: DictBuild): Unit = {}
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta
  def reset(): Unit = validity.reset()
  def byteSize: Long
  /** Zone-map stats over rows [from, to), computed COLUMNAR from the
    * already-buffered values at chunk-encode time — the per-row append
    * loop does NO stats work. The default carries only the null count
    * (types without orderable value stats); flat orderable types
    * override with min/max (+ sum for SUM pushdown). */
  def statsRange(from: Int, to: Int): ColStats =
    ColStats(validity.nullCountIn(from, to), None, None)
}

object ColumnEncoder {
  /** Field metadata key declaring a BinaryType column fixed-width (the
    * Spark mapping for olive `fixed_size_binary(w)` — SURVEY.md §1.2). */
  val FixedWidthKey = "graft.fixedWidth"

  /** Writer-asserted "map keys are sorted" flag, the Spark mapping for
    * the reference's `keys_are_sorted` map header bit
    * (`src/header.zig:128`). Pure metadata passthrough, exactly like the
    * reference: the format neither sorts nor verifies — the flag rides
    * the schema JSON through the footer so a reader that can exploit
    * sorted keys (merge lookups, binary search) sees the writer's claim. */
  val MapKeysSortedKey = "graft.mapKeysSorted"

  /** Field metadata flag mapping olive's `large_binary`/`large_utf8`/
    * `large_list` (i64 offsets, ref `src/write.zig:795-839`,
    * `src/read.zig:719-754`): the tagged top-level binary/string/array/
    * map column serializes 8-byte offsets; the reader infers width from
    * buffer size, so untagged files are unaffected. */
  val LargeOffsetsKey = "graft.largeOffsets"

  private def wantsLargeOffsets(metadata: Metadata): Boolean =
    metadata.contains(LargeOffsetsKey) && metadata.getBoolean(LargeOffsetsKey)

  def forType(dt: DataType, metadata: Metadata = Metadata.empty): ColumnEncoder =
    Logical.of(metadata) match {
      case Some(lt) => forLogical(lt, dt, metadata)
      case None => forPlain(dt, metadata)
    }

  /** Columns tagged `graft.logicalType`: olive types Spark can't express
    * natively (SURVEY §1.2 #3/#4/#7, #16/#17) — the Spark-facing type must
    * be the widened mapping; storage keeps the original shape. */
  private def forLogical(lt: String, dt: DataType, metadata: Metadata): ColumnEncoder = lt match {
    case "u8" | "u16" | "u32" | "u64" | "f16" =>
      val code = Logical.code(lt)
      if (dt != Logical.sparkType(code))
        throw new OliveFormatException(
          s"graft.logicalType=$lt requires ${Logical.sparkType(code)}, column is $dt")
      new UnsignedEncoder(code)
    case "decimal256" =>
      if (dt != BinaryType)
        throw new OliveFormatException(s"graft.logicalType=decimal256 requires BinaryType, column is $dt")
      new FixedBinaryEncoder(32, dictEncode = false)
    case "union" =>
      dt match {
        case st: StructType => new UnionEncoder(st)
        case other =>
          throw new OliveFormatException(s"graft.logicalType=union requires StructType, column is $other")
      }
    case other => throw new OliveFormatException(s"unknown graft.logicalType '$other'")
  }

  private def forPlain(dt: DataType, metadata: Metadata): ColumnEncoder = dt match {
    case BooleanType => new BoolEncoder
    case ByteType => new PrimitiveEncoder(dt, 1)
    case ShortType => new PrimitiveEncoder(dt, 2)
    case IntegerType | DateType => new PrimitiveEncoder(dt, 4)
    case LongType | TimestampType | TimestampNTZType => new PrimitiveEncoder(dt, 8)
    case _: DayTimeIntervalType => new PrimitiveEncoder(dt, 8)  // i64 micros (olive duration)
    case _: YearMonthIntervalType => new PrimitiveEncoder(dt, 4) // i32 months (olive interval_year_month)
    // olive interval_month_day_nano (`src/write.zig:193-197`): 16-byte
    // (months i32, days i32, micros i64) records — micros, not nanos,
    // because that's Spark's CalendarInterval resolution
    case CalendarIntervalType => new CalendarIntervalEncoder
    case FloatType => new PrimitiveEncoder(dt, 4)
    case DoubleType => new PrimitiveEncoder(dt, 8)
    case d: DecimalType => new DecimalEncoder(d.precision, d.scale)
    case BinaryType if metadata.contains(FixedWidthKey) =>
      new FixedBinaryEncoder(metadata.getLong(FixedWidthKey).toInt)
    case StringType => new BinaryEncoder(wide = wantsLargeOffsets(metadata), isString = true)
    case BinaryType => new BinaryEncoder(wide = wantsLargeOffsets(metadata))
    case ArrayType(et, _) => new ListEncoder(forType(et), et, wide = wantsLargeOffsets(metadata))
    case st: StructType =>
      new StructEncoder(st.fields.map(f => forType(f.dataType, f.metadata)).toIndexedSeq, st.size)
    case MapType(kt, vt, _) =>
      new MapEncoder(forType(kt), forType(vt), kt, vt, wide = wantsLargeOffsets(metadata))
    case other => throw new OliveFormatException(s"unsupported graft type $other")
  }
}

final class PrimitiveEncoder(dt: DataType, elemSize: Int) extends ColumnEncoder {
  private val buf = new Bytes(256)
  // resolve the type dispatch once, not per appended value
  private val appendFn: (SpecializedGetters, Int) => Unit = dt match {
    case ByteType => (src, ord) => buf.putByte(src.getByte(ord))
    case ShortType => (src, ord) => buf.putShort(src.getShort(ord))
    case IntegerType | DateType | _: YearMonthIntervalType =>
      (src, ord) => buf.putInt(src.getInt(ord))
    case LongType | TimestampType | TimestampNTZType | _: DayTimeIntervalType =>
      (src, ord) => buf.putLong(src.getLong(ord))
    case FloatType => (src, ord) => buf.putFloat(src.getFloat(ord))
    case DoubleType => (src, ord) => buf.putDouble(src.getDouble(ord))
    case _ => throw new IllegalStateException(s"not primitive: $dt")
  }
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = appendFn(src, ord)
  protected def appendNullSlot(): Unit = {
    var i = 0
    while (i < elemSize) { buf.putByte(0); i += 1 }
  }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta =
    MeasuredWrite.write(buf, elemSize, dt, validity, sink)
  override def reset(): Unit = { super.reset(); buf.reset() }
  def byteSize: Long = buf.size

  // 0 = no value stats (intervals), 1/2/4/8 = integral widths, -4/-8 = float/double
  private val statKind: Int = dt match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType | DateType => 4
    case LongType | TimestampType | TimestampNTZType => 8
    case FloatType => -4
    case DoubleType => -8
    case _ => 0
  }

  override def statsRange(from: Int, to: Int): ColStats = {
    val nulls = validity.nullCountIn(from, to)
    if (statKind == 0 || to - from - nulls <= 0) return ColStats(nulls, None, None)
    val noNulls = nulls == 0
    val bb = Bytes.le(buf.array)
    if (statKind > 0) {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var sm = 0L // deliberate wrap: associative, matches Spark's non-ANSI sum
      var i = from
      statKind match {
        case 1 => while (i < to) {
          if (noNulls || validity.isValidAt(i)) {
            val v = buf.array(i).toLong
            if (v < mn) mn = v; if (v > mx) mx = v; sm += v
          }; i += 1
        }
        case 2 => while (i < to) {
          if (noNulls || validity.isValidAt(i)) {
            val v = bb.getShort(i * 2).toLong
            if (v < mn) mn = v; if (v > mx) mx = v; sm += v
          }; i += 1
        }
        case 4 => while (i < to) {
          if (noNulls || validity.isValidAt(i)) {
            val v = bb.getInt(i * 4).toLong
            if (v < mn) mn = v; if (v > mx) mx = v; sm += v
          }; i += 1
        }
        case _ => while (i < to) {
          if (noNulls || validity.isValidAt(i)) {
            val v = bb.getLong(i * 8)
            if (v < mn) mn = v; if (v > mx) mx = v; sm += v
          }; i += 1
        }
      }
      ColStats(nulls, Some(Stats.longBytes(mn)), Some(Stats.longBytes(mx)),
        Some(Stats.longBytes(sm)))
    } else {
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      var sm = 0.0
      // NaNs are COUNTED (footer v5), not poison: min/max cover the
      // non-NaN values and nanCount tells the skip/aggregate logic how
      // many the range omits. The sum keeps accumulating (-> NaN, what
      // SQL SUM returns).
      var nans = 0
      var seen = false
      var i = from
      while (i < to) {
        if (noNulls || validity.isValidAt(i)) {
          val v = if (statKind == -4) bb.getFloat(i * 4).toDouble else bb.getDouble(i * 8)
          sm += v
          if (v != v) nans += 1
          else { seen = true; if (v < mn) mn = v; if (v > mx) mx = v }
        }
        i += 1
      }
      val sum = Some(Stats.doubleBytes(sm))
      if (!seen) ColStats(nulls, None, None, sum, nans) // all values NaN
      else ColStats(nulls, Some(Stats.doubleBytes(mn)), Some(Stats.doubleBytes(mx)), sum, nans)
    }
  }
}

/** Pick the SMALLEST of five physical encodings for a fixed-width value
  * buffer, measured (not guessed) in one pass over the chunk:
  *
  *   - plain:  n*es
  *   - REE:    runs*(4+es)    (ref `src/write.zig:405-421`) — sorted
  *             keys, near-constant flags
  *   - dict:   d*es + n*idxW  (parquet's dict trick on fixed-width
  *             values) — low-cardinality measures, clustered dates
  *   - FOR:    n*narrowW      (integral only) — narrow ranges
  *   - delta:  n*narrowW      (integral only) — sorted/clustered keys
  *
  * Float/double columns additionally try ALP-style decimal scaling
  * first (see [[Meta.ScaledMeta]]). The winner must save >= 25% over
  * plain, so marginal gains never buy per-row decode work. Nulls occupy
  * zero slots and join whatever pattern surrounds them (validity masks
  * them on read). Shared by [[PrimitiveEncoder]] and [[DecimalEncoder]]
  * (p ≤ 18: the unscaled longs are integral, so narrow price/rate
  * columns FOR- or dict-compress like any other i64). */
private[format] object MeasuredWrite {
  def write(buf: Bytes, elemSize: Int, dt: DataType,
      validity: ValidityBuilder, sink: PageSink): ColMeta = {
    val n = buf.size / elemSize
    val plainBytes = n.toLong * elemSize
    def plain(): ColMeta =
      PrimitiveMeta(validity.write(sink), sink.writeBuffer(buf.array, buf.size, sink.valuesCodec, elemSize))
    if (n < 64) return plain()
    val integral = dt match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
           _: YearMonthIntervalType | _: DayTimeIntervalType => true
      case d: DecimalType => d.precision <= 18 // unscaled i64 stream
      case _ => false
    }
    val scaled = dt match {
      case DoubleType | FloatType =>
        tryScaled(buf, elemSize, dt == DoubleType, plainBytes, validity, sink)
      case _ => None
    }
    scaled.getOrElse(
      choose(buf, elemSize, integral, plainBytes, () => validity.write(sink), sink)
        .getOrElse(plain()))
  }

  /** ALP-style decimal scaling (see [[Meta.ScaledMeta]]): if every value
    * in the chunk is bit-exactly `m / 10^e` for one small exponent, hand
    * the integer stream to the integral chooser — FOR/delta/dict do the
    * real compression (prices, rates, measurements are short decimals far
    * more often than true reals). Exactness is verified against the
    * reader's exact arithmetic (`long → double divide [→ float cast]`),
    * so NaN, ±Inf, -0.0 and full-precision reals force fallback, never
    * drift. */
  private def tryScaled(buf: Bytes, elemSize: Int, isDouble: Boolean,
      plainBytes: Long, validity: ValidityBuilder, sink: PageSink): Option[ColMeta] = {
    val n = buf.size / elemSize
    // widen once (same monomorphic-loop reasoning as in `choose`); a
    // float survives the double round-trip bit-exactly, so `vs(i).toFloat`
    // recovers the original float for the exactness check below
    val vs = new Array[Double](n)
    val vbb = Bytes.le(buf.array)
    if (isDouble) { var w = 0; while (w < n) { vs(w) = vbb.getDouble(w * 8); w += 1 } }
    else { var w = 0; while (w < n) { vs(w) = vbb.getFloat(w * 4).toDouble; w += 1 } }
    // the exact long the reader reconstructs v from, or MinValue sentinel
    // (|m| < 2^53, so the sentinel is unreachable as a real result)
    def scaledAt(i: Int, pow: Double): Long = {
      val v = vs(i)
      val s = Math.rint(v * pow)
      if (!(Math.abs(s) < 9.007199254740992e15)) return Long.MinValue
      val m = s.toLong
      val back = m.toDouble / pow
      val exact =
        if (isDouble) java.lang.Double.doubleToRawLongBits(back) ==
          java.lang.Double.doubleToRawLongBits(v)
        else java.lang.Float.floatToRawIntBits(back.toFloat) ==
          java.lang.Float.floatToRawIntBits(v.toFloat)
      if (exact) m else Long.MinValue
    }
    val maxE = if (isDouble) 14 else 7
    var e = 0
    var i = 0 // resumes at the failing value: smaller exponents already
              // proved exact for [0, i) and exactness is monotone in e
              // for in-range decimals (out-of-range re-checked below)
    while (e <= maxE) {
      val pow = Pow10(e)
      var ok = true
      while (i < n && ok) {
        if (scaledAt(i, pow) == Long.MinValue) ok = false else i += 1
      }
      if (ok) {
        // full verify + build: every value re-checked at the FINAL e, so
        // the resume optimization can never ship an inexact long
        val out = new Bytes(n * 8)
        var j = 0
        var good = true
        while (j < n && good) {
          val m = scaledAt(j, pow)
          if (m == Long.MinValue) good = false
          else { out.putLong(m); j += 1 }
        }
        if (good)
          return choose(out, 8, integral = true, plainBytes, () => None, sink)
            .map(inner => ScaledMeta(validity.write(sink), e.toByte, inner))
        // a resume-skipped value crossed the 2^53 magnitude bound at this
        // larger e: rescan from it at the next exponent, don't give up
        i = j
      }
      e += 1
    }
    None
  }

  /** Nested-stream entry for wrappers ([[ScaledMeta]]/[[Meta.UnsignedPackedMeta]]):
    * choose over an i64 stream against the WRAPPER's own plain footprint;
    * the winning inner carries no validity. */
  private[format] def chooseWide(buf: Bytes, barBytes: Long, sink: PageSink): Option[ColMeta] =
    choose(buf, 8, integral = true, barBytes, () => None, sink)

  /** Measure REE/dict/FOR/delta in one pass; write and return the
    * smallest iff it saves >= 25% over `barBytes` (the caller's plain
    * footprint). `writeValidity` runs only inside the winning branch —
    * pass `() => None` for nested streams whose wrapper owns validity. */
  private def choose(buf: Bytes, elemSize: Int, integral: Boolean, barBytes: Long,
      writeValidity: () => Option[BufferMeta], sink: PageSink): Option[ColMeta] = {
    val n = buf.size / elemSize

    val a = buf.array
    // widen once into a long[]: the measure and encode loops below then
    // index a flat array with no per-element width dispatch (a local
    // `bits(i)` def here kept C2 in a deopt/recompile cycle as its match
    // profile shifted between columns — measured 1.7x slower writes)
    val vals = new Array[Long](n)
    val bb = Bytes.le(a)
    elemSize match {
      case 1 => var i = 0; while (i < n) { vals(i) = a(i).toLong; i += 1 }
      case 2 => var i = 0; while (i < n) { vals(i) = bb.getShort(i * 2).toLong; i += 1 }
      case 4 => var i = 0; while (i < n) { vals(i) = bb.getInt(i * 4).toLong; i += 1 }
      case _ => var i = 0; while (i < n) { vals(i) = bb.getLong(i * 8); i += 1 }
    }
    val MaxDictEntries = 1 << 16
    // dict can only win (save >= 25% over plain) while d <= 5n/8 — the
    // most favorable case is elemSize 8 with 1-byte indices: 8d + n <=
    // 6n. Tracking stops at the first count past that bound, so
    // high-cardinality columns stop paying for the hash probes early.
    val dictLimit = math.min(MaxDictEntries, (5L * n / 8).toInt + 1)
    val seen = new LongIntMap(dictLimit)
    var distinctOver = false
    var runs = 1
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var prev = 0L
    var maxZig = 0L // max zigzag(consecutive delta); -1 = delta unusable
    var i = 0
    while (i < n) {
      val v = vals(i)
      if (i > 0 && v != prev) runs += 1
      if (i > 0 && maxZig >= 0) {
        val d = v - prev
        // subtraction overflow: operand signs differ AND result sign
        // differs from the minuend's
        if (((v ^ prev) & (v ^ d)) < 0) maxZig = -1
        else {
          val z = (d << 1) ^ (d >> 63)
          if (z < 0) maxZig = -1 // zigzag overflow (Long.MinValue delta)
          else if (z > maxZig) maxZig = z
        }
      }
      prev = v
      if (!distinctOver && seen.get(v) < 0) {
        if (seen.size >= dictLimit) distinctOver = true
        else seen.put(v, seen.size)
      }
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }

    val reeBytes = runs.toLong * (4 + elemSize)
    val dictIdxW =
      if (distinctOver) 0
      else if (seen.size <= 256) 1
      else 2 // capped at 65536 entries
    val dictBytes =
      if (distinctOver) Long.MaxValue
      else seen.size.toLong * elemSize + n.toLong * dictIdxW
    val range = mx - mn // as unsigned; negative = wrapped = no FOR
    val forW =
      if (!integral || range < 0) 0
      else if (range < (1L << 8)) 1
      else if (range < (1L << 16) && elemSize >= 4) 2
      else if (range < (1L << 32) && elemSize == 8) 4
      else 0
    val forBytes = if (forW > 0 && forW < elemSize) n.toLong * forW else Long.MaxValue
    // bit-packed FOR: any 1..56-bit range, not just byte widths (8 pad
    // bytes let the reader unpack by whole-word loads)
    val packBits =
      if (!integral || range <= 0) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(range)
    val packedBytes =
      if (packBits >= 1 && packBits <= 56 && packBits < 8 * elemSize)
        (n.toLong * packBits + 7) / 8 + 8
      else Long.MaxValue
    val deltaW =
      if (!integral || maxZig < 0) 0
      else if (maxZig < (1L << 8)) 1
      else if (maxZig < (1L << 16) && elemSize >= 4) 2
      else if (maxZig < (1L << 32) && elemSize == 8) 4
      else 0
    val deltaBytes = if (deltaW > 0 && deltaW < elemSize) n.toLong * deltaW else Long.MaxValue

    val best = Seq(reeBytes, dictBytes, forBytes, deltaBytes, packedBytes).min
    if (best > barBytes * 3 / 4) return None

    // statement position on purpose: inside `Some(...)` the encode loops
    // sit on a non-empty JVM expression stack, which blocks OSR
    // compilation and leaves them running at C1 (measured 1.8x slower)
    val chosen = if (deltaBytes == best && deltaBytes < forBytes) {
      // zigzag deltas of consecutive values (delta[0] = 0)
      val out = new Bytes(n * deltaW)
      var last = 0L
      i = 0
      while (i < n) {
        val v = vals(i)
        val d = if (i == 0) 0L else v - last
        val z = (d << 1) ^ (d >> 63)
        deltaW match {
          case 1 => out.putByte(z.toByte)
          case 2 => out.putShort(z.toShort)
          case 4 => out.putInt(z.toInt)
        }
        last = v
        i += 1
      }
      val bm = sink.writeBuffer(out.array, out.size, sink.valuesCodec, deltaW)
      // per-page running bases (footer v5): the value at each page's LAST
      // element — a mid-range read resumes the prefix sum at the first
      // overlapping page instead of replaying from 0 (Reader.expandDeltaFrom)
      DeltaMeta(writeValidity(), vals(0), deltaW.toByte, bm,
        bm.pages.map(p => vals(p.rowEnd - 1)))
    } else if (forBytes == best) {
      // frame-of-reference: base + unsigned narrow deltas
      val out = new Bytes(n * forW)
      i = 0
      while (i < n) {
        val d = vals(i) - mn
        forW match {
          case 1 => out.putByte(d.toByte)
          case 2 => out.putShort(d.toShort)
          case 4 => out.putInt(d.toInt)
        }
        i += 1
      }
      ForMeta(writeValidity(), mn, forW.toByte,
        sink.writeBuffer(out.array, out.size, sink.valuesCodec, forW))
    } else if (packedBytes == best) {
      // LSB-first bitstream of (v - base), 8 zero pad bytes at the end
      val packedLen = ((n.toLong * packBits + 7) / 8).toInt
      val out = new Array[Byte](packedLen + 8)
      var acc = 0L
      var accBits = 0
      var bytePos = 0
      i = 0
      while (i < n) {
        acc |= (vals(i) - mn) << accBits // accBits <= 7, packBits <= 56: no overflow
        accBits += packBits
        while (accBits >= 8) {
          out(bytePos) = acc.toByte
          acc >>>= 8
          accBits -= 8
          bytePos += 1
        }
        i += 1
      }
      if (accBits > 0) { out(bytePos) = acc.toByte; bytePos += 1 }
      BitPackMeta(writeValidity(), mn, packBits.toByte,
        sink.writeBuffer(out, out.length, sink.valuesCodec, 1))
    } else if (dictBytes == best) {
      // per-column primitive dictionary: entries in first-seen order
      // (the scan pass assigned ids in that order, so entry writes land
      // sequentially), indices at the narrowest width that fits
      val entries = new Bytes(seen.size * elemSize)
      val written = new Array[Boolean](seen.size)
      val idx = new Bytes(n * dictIdxW)
      i = 0
      while (i < n) {
        val id = seen.get(vals(i))
        if (!written(id)) {
          entries.putBytes(a, i * elemSize, elemSize)
          written(id) = true
        }
        dictIdxW match {
          case 1 => idx.putByte(id.toByte)
          case 2 => idx.putShort(id.toShort)
        }
        i += 1
      }
      PrimDictMeta(writeValidity(), seen.size, dictIdxW.toByte,
        sink.writeBuffer(entries.array, entries.size, sink.valuesCodec, elemSize),
        sink.writeBuffer(idx.array, idx.size, sink.valuesCodec, dictIdxW))
    } else {
      // run-end encoding
      val ends = new Bytes(runs * 4)
      val rvals = new Bytes(runs * elemSize)
      var runStart = 0
      i = 1
      while (i <= n) {
        if (i == n || vals(i) != vals(runStart)) {
          ends.putInt(i)
          rvals.putBytes(a, runStart * elemSize, elemSize)
          runStart = i
        }
        i += 1
      }
      ReeMeta(writeValidity(),
        sink.writeBuffer(ends.array, ends.size, sink.valuesCodec, 4),
        sink.writeBuffer(rvals.array, rvals.size, sink.valuesCodec, elemSize))
    }
    Some(chosen)
  }
}

/** Open-addressed long -> int map for the measured-encoding scan. The
  * boxed java.util.HashMap this replaced allocated two boxes per VALUE
  * on the hottest write loop. Capacity is preallocated at twice the
  * caller's entry bound (load factor <= 0.5, so probes stay short and
  * there is no rehash path at all). Slot state lives in `ids` (0 =
  * empty, else id + 1). */
private[format] final class LongIntMap(maxEntries: Int) {
  private val cap = {
    var c = 8
    while (c < maxEntries * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val ids = new Array[Int](cap)
  private var n = 0
  def size: Int = n

  private def slot(k: Long): Int = {
    var h = k * -7046029254386353131L // 64-bit golden-ratio mix
    h ^= h >>> 32
    var i = h.toInt & mask
    while (ids(i) != 0 && keys(i) != k) i = (i + 1) & mask
    i
  }
  /** The id stored for `k`, or -1. */
  def get(k: Long): Int = { val i = slot(k); ids(i) - 1 }
  /** Insert `k -> v` (caller guarantees absence and v >= 0). */
  def put(k: Long, v: Int): Unit = {
    val i = slot(k)
    keys(i) = k; ids(i) = v + 1; n += 1
  }
}

final class BoolEncoder extends ColumnEncoder {
  private var bits = new Array[Byte](64)
  private var n = 0
  private def ensure(): Unit =
    if (n / 8 >= bits.length) bits = java.util.Arrays.copyOf(bits, bits.length * 2)
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    ensure()
    if (src.getBoolean(ord)) bits(n >> 3) = (bits(n >> 3) | (1 << (n & 7))).toByte
    n += 1
  }
  protected def appendNullSlot(): Unit = { ensure(); n += 1 }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta =
    PrimitiveMeta(validity.write(sink), sink.writeBuffer(bits, (n + 7) / 8, sink.valuesCodec, 1))
  override def reset(): Unit = { super.reset(); java.util.Arrays.fill(bits, 0.toByte); n = 0 }
  def byteSize: Long = (n + 7) / 8

  override def statsRange(from: Int, to: Int): ColStats = {
    val nulls = validity.nullCountIn(from, to)
    if (to - from - nulls <= 0) return ColStats(nulls, None, None)
    val noNulls = nulls == 0
    var trues = 0L
    var count = 0L
    var i = from
    while (i < to) {
      if (noNulls || validity.isValidAt(i)) {
        count += 1
        if ((bits(i >> 3) & (1 << (i & 7))) != 0) trues += 1
      }
      i += 1
    }
    val mn = if (trues == count) 1L else 0L
    val mx = if (trues > 0) 1L else 0L
    ColStats(nulls, Some(Stats.longBytes(mn)), Some(Stats.longBytes(mx)),
      Some(Stats.longBytes(trues)))
  }
}

/** Decimals: unscaled long (p ≤ 18) or 16-byte little-endian two's
  * complement (p ≤ 38), matching olive decimal64/decimal128 storage
  * classes (`src/write.zig:138-157`). */
final class DecimalEncoder(precision: Int, scale: Int) extends ColumnEncoder {
  val elemSize: Int = if (precision <= 18) 8 else 16
  private val buf = new Bytes(256)
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val d = src.getDecimal(ord, precision, scale)
    if (elemSize == 8) buf.putLong(d.toUnscaledLong)
    else {
      val be = d.toJavaBigDecimal.unscaledValue().toByteArray // big-endian, minimal
      val sign: Byte = if (be(0) < 0) -1 else 0
      var i = 0
      while (i < 16) {
        val beIdx = be.length - 1 - i // LE byte i
        buf.putByte(if (beIdx >= 0) be(beIdx) else sign)
        i += 1
      }
    }
  }
  protected def appendNullSlot(): Unit = {
    var i = 0
    while (i < elemSize) { buf.putByte(0); i += 1 }
  }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta =
    // p ≤ 18 decimals are unscaled i64 — the full measured-encoding
    // menu applies (prices/rates are low-cardinality or narrow-range
    // in practice); 16-byte decimals stay plain
    if (elemSize == 8) MeasuredWrite.write(buf, 8, DecimalType(precision, scale), validity, sink)
    else PrimitiveMeta(validity.write(sink), sink.writeBuffer(buf.array, buf.size, sink.valuesCodec, elemSize))
  override def reset(): Unit = { super.reset(); buf.reset() }
  def byteSize: Long = buf.size

  /** Decimal zone maps: min/max as the unscaled value — unscaled order
    * IS value order at one fixed scale, and the skip side rescales
    * through BigDecimal so a money predicate (`o_totalprice > X`) can
    * finally skip chunks. p <= 18 stores the unscaled i64; wider
    * decimals (DECIMAL(38,x) money/ID columns) store a 16-byte
    * BIG-ENDIAN two's-complement stat slot — comparisons run over the
    * buffered little-endian slots in place (no BigInteger per row), only
    * the two winners are re-ordered for storage. No sum (decimal SUM
    * isn't pushed down). */
  override def statsRange(from: Int, to: Int): ColStats = {
    val nulls = validity.nullCountIn(from, to)
    if (to - from - nulls <= 0) return ColStats(nulls, None, None)
    val noNulls = nulls == 0
    val bb = Bytes.le(buf.array)
    if (elemSize == 8) {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var i = from
      while (i < to) {
        if (noNulls || validity.isValidAt(i)) {
          val v = bb.getLong(i * 8)
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        i += 1
      }
      ColStats(nulls, Some(Stats.longBytes(mn)), Some(Stats.longBytes(mx)))
    } else {
      var mnI = -1
      var mxI = -1
      var i = from
      while (i < to) {
        if (noNulls || validity.isValidAt(i)) {
          if (mnI < 0) { mnI = i; mxI = i }
          else {
            if (cmp16le(i, mnI) < 0) mnI = i
            if (cmp16le(i, mxI) > 0) mxI = i
          }
        }
        i += 1
      }
      ColStats(nulls, Some(be16(mnI)), Some(be16(mxI)))
    }
  }

  /** Signed compare of two buffered 16-byte little-endian
    * two's-complement slots: most-significant byte (LE index 15) signed,
    * the rest unsigned, high to low. */
  private def cmp16le(i: Int, j: Int): Int = {
    val a = buf.array
    val ai = i * 16
    val aj = j * 16
    var c = java.lang.Byte.compare(a(ai + 15), a(aj + 15))
    if (c != 0) return c
    var k = 14
    while (k >= 0) {
      c = java.lang.Integer.compare(a(ai + k) & 0xFF, a(aj + k) & 0xFF)
      if (c != 0) return c
      k -= 1
    }
    0
  }

  /** Buffered LE slot -> 16-byte big-endian stat bytes (BigInteger-ready
    * on the skip side). */
  private def be16(idx: Int): Array[Byte] = {
    val out = new Array[Byte](16)
    var k = 0
    while (k < 16) { out(k) = buf.array(idx * 16 + 15 - k); k += 1 }
    out
  }
}

/** Fixed-width binary; widths 20/32 go through the chunk-global dict.
  * `dictEncode = false` opts out (decimal256 storage: high-cardinality
  * numerics would pollute the dict for no dedup win). */
final class FixedBinaryEncoder(val width: Int, dictEncode: Boolean = true) extends ColumnEncoder {
  require(width > 0, s"bad fixed width $width")
  val dictEncoded: Boolean = dictEncode && (width == 20 || width == 32)
  private val values = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val b = src.getBinary(ord)
    if (b.length != width)
      throw new OliveFormatException(s"fixed_size_binary($width) got ${b.length} bytes")
    values += b
  }
  protected def appendNullSlot(): Unit = values += null
  override def collectDict(d20: DictBuild, d32: DictBuild): Unit =
    if (dictEncoded) {
      val d = if (width == 20) d20 else d32
      values.foreach(v => if (v != null) d.add(v))
    }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta = {
    if (dictEncoded) {
      val d = if (width == 20) d20 else d32
      val buf = new Bytes(values.length * 4)
      // nulls encode index 0, like the reference (`src/dict.zig:149`).
      values.foreach(v => buf.putInt(if (v == null) 0 else d.indexOf(v)))
      DictIdxMeta(validity.write(sink), width, sink.writeBuffer(buf.array, buf.size, sink.valuesCodec, 4))
    } else {
      val buf = new Bytes(values.length * width)
      val zero = new Array[Byte](width)
      values.foreach(v => buf.putBytes(if (v == null) zero else v))
      PrimitiveMeta(validity.write(sink), sink.writeBuffer(buf.array, buf.size, sink.valuesCodec, width))
    }
  }
  override def reset(): Unit = { super.reset(); values.clear() }
  def byteSize: Long = values.length.toLong * width
}

/** Var-width string/binary: i32 offsets + data buffer. The data buffer is
  * the one place the compression bias applies (zstd balanced / lz4-hc
  * read-optimized), like the reference (`src/write.zig:802-811`).
  *
  * At write time the encoder checks the column's distinct ratio: when at
  * most half the rows are distinct (and the dictionary is small), values
  * are stored once as a per-column dictionary + u32 row indices —
  * parquet's dictionary trick, applied per chunk. Low-cardinality flag
  * columns shrink 10×+ and decode dictionary-backed (no per-row copies).
  */
final class BinaryEncoder(wide: Boolean = false, isString: Boolean = false)
    extends ColumnEncoder {
  private val data = new Bytes(1024)
  private val offsets = new OffsetsBuilder(wide)
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    // strings: getUTF8String is a zero-copy view into the row's memory on
    // every InternalRow flavor, where getBinary materializes a fresh
    // byte[] per row — one allocation per string value saved on the
    // hottest write loop
    if (isString) data.putUTF8(src.getUTF8String(ord))
    else data.putBytes(src.getBinary(ord))
    offsets.add(data.size)
  }
  protected def appendNullSlot(): Unit = offsets.add(data.size)

  private final val MaxDictEntries = 1 << 16

  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta = {
    val (offBytes, offLen) = offsets.toBytes
    val n = offLen / offsets.width - 1
    // the i64 dialect stays plain: tryDictEncode walks 4-byte entries,
    // and large-offsets columns hold huge values a dict can't pay for
    (if (offsets.wide) None else tryDictEncode(n, offBytes)) match {
      case Some((firstRows, nDistinct, indices)) =>
        val dictData = new Bytes(nDistinct * 8)
        // entry bytes are slices of `data` in first-seen order
        val eb = Bytes.le(offBytes)
        var total = 0
        val dOff = new OffsetsBuilder
        var t = 0
        while (t < nDistinct) {
          val r = firstRows(t)
          val s = eb.getInt(r * 4)
          val e = eb.getInt((r + 1) * 4)
          dictData.putBytes(data.array, s, e - s)
          total += e - s
          dOff.add(total)
          t += 1
        }
        // narrowest index width that addresses the dictionary
        val numEntries = dOff.size - 1
        val idxW = if (numEntries <= 256) 1 else if (numEntries <= 65536) 2 else 4
        val idxBytes = new Bytes(n * idxW)
        var k = 0
        while (k < indices.length) {
          val id = indices(k)
          idxW match {
            case 1 => idxBytes.putByte(id.toByte)
            case 2 => idxBytes.putShort(id.toShort)
            case _ => idxBytes.putInt(id)
          }
          k += 1
        }
        val (dOffBytes, dOffLen) = dOff.toBytes
        val dataMeta = sink.writeDataBuffer(dictData.array, dOff)
        val dOffMeta = sink.writeBuffer(dOffBytes, dOffLen, Codec.Lz4, 4)
        val idxMeta = sink.writeBuffer(idxBytes.array, idxBytes.size, sink.valuesCodec, idxW)
        BinDictMeta(validity.write(sink), numEntries, idxW.toByte, dOffMeta, dataMeta, idxMeta)
      case None =>
        val dataMeta = sink.writeDataBuffer(data.array, offsets)
        val offMeta = sink.writeBuffer(offBytes, offLen, Codec.Lz4, offsets.width)
        BinaryMeta(validity.write(sink), offMeta, dataMeta)
    }
  }

  /** (first-seen row index per distinct value, entry count, per-row dict
    * index) — or None when the column isn't dict-worthy. Open-addressed
    * probing over slices of `data` (stored hash + offset compare): no
    * per-row key object or box on the string write path, and the scan
    * bails the moment the distinct count proves the dictionary can't
    * pay for itself (> n/2 distinct). */
  private def tryDictEncode(n: Int,
      offBytes: Array[Byte]): Option[(Array[Int], Int, Array[Int])] = {
    if (n < 16) return None
    val bb = Bytes.le(offBytes) // caller's serialization, not a second one
    val arr = data.array
    val entryLimit = math.min(MaxDictEntries, n / 2)
    var cap = 8
    while (cap < (entryLimit + 1) * 2) cap <<= 1
    val mask = cap - 1
    val slots = new Array[Int](cap) // entryId + 1; 0 = empty
    val hashes = new Array[Int](cap)
    val firstRows = new Array[Int](entryLimit)
    var nEntries = 0
    val indices = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = bb.getInt(i * 4)
      val e = bb.getInt((i + 1) * 4)
      var h = 1
      var j = s
      while (j < e) { h = 31 * h + arr(j); j += 1 }
      var slot = (h ^ (h >>> 16)) & mask
      var id = -1
      var probing = true
      while (probing) {
        val sv = slots(slot)
        if (sv == 0) probing = false
        else {
          if (hashes(slot) == h) {
            val r = firstRows(sv - 1)
            val rs = bb.getInt(r * 4)
            val re = bb.getInt((r + 1) * 4)
            if (re - rs == e - s &&
              java.util.Arrays.equals(arr, s, e, arr, rs, re)) {
              id = sv - 1; probing = false
            }
          }
          if (probing) slot = (slot + 1) & mask
        }
      }
      if (id < 0) {
        if (nEntries >= entryLimit) return None // not repetitive enough
        firstRows(nEntries) = i
        slots(slot) = nEntries + 1
        hashes(slot) = h
        id = nEntries
        nEntries += 1
      }
      indices(i) = id
      i += 1
    }
    if (nEntries * 2 > n) None // not repetitive enough to pay for itself
    else Some((firstRows, nEntries, indices))
  }

  override def reset(): Unit = { super.reset(); data.reset(); offsets.reset() }
  def byteSize: Long = data.size + offsets.size.toLong * offsets.width

  /** String min/max by in-place unsigned range comparison over the data
    * buffer — zero allocation until the two winning slices are copied out
    * once per chunk/block. Values past [[Stats.MaxStringStat]] store
    * TRUNCATED BOUNDS, parquet-style: a prefix is always a valid LOWER
    * bound in unsigned-lex order, and a prefix with its last non-0xff
    * byte incremented is a strict UPPER bound; an all-0xff prefix has
    * no bounded upper (max absent, min kept). Since footer v6 a bumped
    * max 0x00-PADS back to exactly [[Stats.MaxStringStat]] bytes (the
    * pad keeps it a strict upper: it already beats the true max at the
    * bumped byte), and a truncated min is a full cap-length prefix by
    * construction — so any stored bound SHORTER than the cap is the
    * exact extreme value, servable by pushed string MIN/MAX; bounds AT
    * the cap remain proofs for the skip logic only. */
  override def statsRange(from: Int, to: Int): ColStats = {
    val nulls = validity.nullCountIn(from, to)
    if (!isString || to - from - nulls <= 0) return ColStats(nulls, None, None)
    val noNulls = nulls == 0
    val arr = data.array
    var mnS = -1; var mnE = -1
    var mxS = -1; var mxE = -1
    var i = from
    while (i < to) {
      if (noNulls || validity.isValidAt(i)) {
        val s = offsets.entry(i)
        val e = offsets.entry(i + 1)
        if (mnS < 0 || java.util.Arrays.compareUnsigned(arr, s, e, arr, mnS, mnE) < 0) { mnS = s; mnE = e }
        if (mxS < 0 || java.util.Arrays.compareUnsigned(arr, s, e, arr, mxS, mxE) > 0) { mxS = s; mxE = e }
      }
      i += 1
    }
    val cap = Stats.MaxStringStat
    val mn = // a prefix never exceeds the string it prefixes
      java.util.Arrays.copyOfRange(arr, mnS, math.min(mnE, mnS + cap))
    val mx: Option[Array[Byte]] =
      if (mxE - mxS <= cap) Some(java.util.Arrays.copyOfRange(arr, mxS, mxE))
      else {
        val b = java.util.Arrays.copyOfRange(arr, mxS, mxS + cap)
        var j = b.length - 1
        while (j >= 0 && b(j) == 0xff.toByte) j -= 1
        if (j < 0) None // all-0xff prefix: no bounded upper exists
        else {
          b(j) = (b(j) + 1).toByte
          // 0x00-pad to the cap: the bump already wins at byte j, so the
          // pad stays a strict upper bound, and full-cap width marks the
          // bound as inexact (v6 convention — see the scaladoc above)
          java.util.Arrays.fill(b, j + 1, cap, 0.toByte)
          Some(b)
        }
      }
    ColStats(nulls, Some(mn), mx)
  }
}

final class ListEncoder(child: ColumnEncoder, elemType: DataType,
    wide: Boolean = false) extends ColumnEncoder {
  private val offsets = new OffsetsBuilder(wide)
  private var childCount = 0
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val arr = src.getArray(ord)
    val n = arr.numElements()
    var i = 0
    while (i < n) { child.appendFrom(arr, i); i += 1 }
    childCount += n
    offsets.add(childCount)
  }
  protected def appendNullSlot(): Unit = offsets.add(childCount)
  override def collectDict(d20: DictBuild, d32: DictBuild): Unit = child.collectDict(d20, d32)
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta = {
    val (offBytes, offLen) = offsets.toBytes
    val offMeta = sink.writeBuffer(offBytes, offLen, Codec.Lz4, offsets.width)
    ListMeta(validity.write(sink), offMeta, child.write(sink, d20, d32))
  }
  override def reset(): Unit = { super.reset(); offsets.reset(); child.reset(); childCount = 0 }
  def byteSize: Long = child.byteSize + offsets.size.toLong * offsets.width
}

final class StructEncoder(val children: IndexedSeq[ColumnEncoder], numFields: Int) extends ColumnEncoder {
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val row = src.getStruct(ord, numFields)
    var i = 0
    while (i < numFields) { children(i).appendFrom(row, i); i += 1 }
  }
  // null struct still occupies one aligned slot in every child
  protected def appendNullSlot(): Unit = children.foreach(_.appendNull())
  override def collectDict(d20: DictBuild, d32: DictBuild): Unit =
    children.foreach(_.collectDict(d20, d32))
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta =
    StructMeta(validity.write(sink), children.map(_.write(sink, d20, d32)).toVector)
  override def reset(): Unit = { super.reset(); children.foreach(_.reset()) }
  def byteSize: Long = children.map(_.byteSize).sum
}

/** Spark `CalendarIntervalType` ↔ olive `interval_month_day_nano`
  * (ref `src/write.zig:193-197`): 16-byte (months, days, micros) LE. */
final class CalendarIntervalEncoder extends ColumnEncoder {
  private val buf = new Bytes(256)
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val iv = src.getInterval(ord)
    buf.putInt(iv.months); buf.putInt(iv.days); buf.putLong(iv.microseconds)
  }
  protected def appendNullSlot(): Unit = {
    var i = 0
    while (i < 16) { buf.putByte(0); i += 1 }
  }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta =
    PrimitiveMeta(validity.write(sink), sink.writeBuffer(buf.array, buf.size, sink.valuesCodec, 16))
  override def reset(): Unit = { super.reset(); buf.reset() }
  def byteSize: Long = buf.size
}

/** Olive u8/u16/u32/u64/f16 (ref `src/write.zig:128-132`): values arrive
  * through the widened Spark type ([[Logical.sparkType]]) and are stored
  * at the original narrow width after a range check — an out-of-domain
  * value (negative, too large, or not half-representable f16 — rounding
  * is applied, not rejected, for f16) fails the write instead of wrapping
  * silently. */
final class UnsignedEncoder(logical: Byte) extends ColumnEncoder {
  private val buf = new Bytes(256)
  private val elemSize = Logical.elemSize(logical)
  private val U64Max = java.math.BigInteger.ONE.shiftLeft(64).subtract(java.math.BigInteger.ONE)

  private def outOfRange(v: Any): Nothing =
    throw new OliveFormatException(s"value $v out of range for ${Logical.name(logical)}")

  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = logical match {
    case Logical.U8 =>
      val v = src.getShort(ord)
      if (v < 0 || v > 0xff) outOfRange(v)
      buf.putByte(v.toByte)
    case Logical.U16 =>
      val v = src.getInt(ord)
      if (v < 0 || v > 0xffff) outOfRange(v)
      buf.putShort(v.toShort)
    case Logical.U32 =>
      val v = src.getLong(ord)
      if (v < 0 || v > 0xffffffffL) outOfRange(v)
      buf.putInt(v.toInt)
    case Logical.U64 =>
      val d = src.getDecimal(ord, 20, 0)
      val bi = d.toJavaBigDecimal.toBigIntegerExact
      if (bi.signum() < 0 || bi.compareTo(U64Max) > 0) outOfRange(d)
      buf.putLong(bi.longValue()) // low 64 bits == unsigned value
    case Logical.F16 =>
      buf.putShort(Half.toHalf(src.getFloat(ord)))
    case other => throw new OliveFormatException(s"bad logical code $other")
  }
  protected def appendNullSlot(): Unit = {
    var i = 0
    while (i < elemSize) { buf.putByte(0); i += 1 }
  }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta = {
    // u8..u64 widen to their numeric i64 form and compete in the measured
    // menu against the NARROW plain bar — sorted u64 timestamps
    // delta-compress, id pools dict, random streams stay narrow plain
    val n = buf.size / elemSize
    val packed =
      if (logical == Logical.F16 || n < 64) None
      else if (logical == Logical.U64)
        // u64 raw bits ARE the i64 stream — no widening copy needed
        MeasuredWrite.chooseWide(buf, n.toLong * 8, sink)
      else {
        val wide = new Bytes(n * 8)
        val bb = Bytes.le(buf.array)
        var i = 0
        logical match {
          case Logical.U8 => while (i < n) { wide.putLong(bb.get(i) & 0xffL); i += 1 }
          case Logical.U16 => while (i < n) { wide.putLong(bb.getShort(i * 2) & 0xffffL); i += 1 }
          case _ => while (i < n) { wide.putLong(bb.getInt(i * 4) & 0xffffffffL); i += 1 } // u32
        }
        MeasuredWrite.chooseWide(wide, n.toLong * elemSize, sink)
      }
    packed match {
      case Some(inner) => UnsignedPackedMeta(validity.write(sink), logical, inner)
      case None => UnsignedMeta(validity.write(sink), logical,
        sink.writeBuffer(buf.array, buf.size, sink.valuesCodec, elemSize))
    }
  }
  override def reset(): Unit = { super.reset(); buf.reset() }
  def byteSize: Long = buf.size

  /** Stats over the UNSIGNED-widened values (what the Spark-facing widened
    * signed column holds). u64 carries no value stats: its Spark face is
    * Decimal(20,0), which the zone-map comparator doesn't serve. f16
    * stats describe the STORED (rounded) halfs — bounds that contain
    * every value a reader can decode. */
  override def statsRange(from: Int, to: Int): ColStats = {
    val nulls = validity.nullCountIn(from, to)
    if (to - from - nulls <= 0) return ColStats(nulls, None, None)
    if (logical == Logical.U64) return ColStats(nulls, None, None)
    val noNulls = nulls == 0
    val bb = Bytes.le(buf.array)
    if (logical == Logical.F16) {
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      var sm = 0.0
      var broken = false
      var i = from
      while (i < to) {
        if (noNulls || validity.isValidAt(i)) {
          val v = Half.toFloat(bb.getShort(i * 2)).toDouble
          sm += v
          if (!broken) {
            if (v != v) broken = true
            else { if (v < mn) mn = v; if (v > mx) mx = v }
          }
        }
        i += 1
      }
      val sum = Some(Stats.doubleBytes(sm))
      if (broken) ColStats(nulls, None, None, sum)
      else ColStats(nulls, Some(Stats.doubleBytes(mn)), Some(Stats.doubleBytes(mx)), sum)
    } else {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var sm = 0L
      var i = from
      while (i < to) {
        if (noNulls || validity.isValidAt(i)) {
          val v = logical match {
            case Logical.U8 => buf.array(i) & 0xffL
            case Logical.U16 => bb.getShort(i * 2) & 0xffffL
            case _ => bb.getInt(i * 4) & 0xffffffffL // u32
          }
          if (v < mn) mn = v; if (v > mx) mx = v; sm += v
        }
        i += 1
      }
      ColStats(nulls, Some(Stats.longBytes(mn)), Some(Stats.longBytes(mx)),
        Some(Stats.longBytes(sm)))
    }
  }
}

/** Olive dense/sparse unions (ref `src/write.zig:463-549`,
  * `src/read.zig:538-605`) via SURVEY §7's struct-encoding: the Spark
  * column is `struct<type_id: byte, b0, b1, …>` where exactly the branch
  * named by `type_id` is non-null. Storage is the plain struct layout
  * (inactive branches are validity-elided null slots that compress to
  * ~nothing); this wrapper enforces the union invariant at write time —
  * the type_id bounds/consistency validation the reference performs on
  * read — so a graft "union" column can't hold malformed rows. */
final class UnionEncoder(st: StructType) extends ColumnEncoder {
  if (st.isEmpty || st.fields(0).dataType != ByteType)
    throw new OliveFormatException(s"union struct must lead with type_id: byte, got $st")
  private val numBranches = st.size - 1
  if (numBranches < 1)
    throw new OliveFormatException("union needs at least one branch")
  private val inner = new StructEncoder(
    st.fields.map(f => ColumnEncoder.forType(f.dataType, f.metadata)).toIndexedSeq, st.size)

  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val row = src.getStruct(ord, st.size)
    if (row.isNullAt(0)) throw new OliveFormatException("union type_id is null")
    val tid = row.getByte(0)
    if (tid < 0 || tid >= numBranches)
      throw new OliveFormatException(s"union type_id $tid out of $numBranches branches")
    var b = 0
    while (b < numBranches) {
      val active = row.isNullAt(b + 1)
      if ((b == tid) == active) // active branch null, or inactive non-null
        throw new OliveFormatException(
          s"union row: branch $b ${if (active) "null" else "set"} but type_id=$tid")
      b += 1
    }
    inner.appendFrom(src, ord)
  }
  protected def appendNullSlot(): Unit = inner.appendNull()
  override def collectDict(d20: DictBuild, d32: DictBuild): Unit = inner.collectDict(d20, d32)
  // inner saw the exact same null/value sequence through appendFrom /
  // appendNull, so its StructMeta (incl. validity) is authoritative;
  // the wrapper's own validity builder is never written.
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta =
    inner.write(sink, d20, d32)
  override def reset(): Unit = { super.reset(); inner.reset() }
  def byteSize: Long = inner.byteSize
}

final class MapEncoder(key: ColumnEncoder, value: ColumnEncoder, kt: DataType, vt: DataType,
    wide: Boolean = false) extends ColumnEncoder {
  private val offsets = new OffsetsBuilder(wide)
  private var entryCount = 0
  protected def appendValue(src: SpecializedGetters, ord: Int): Unit = {
    val m: MapData = src.getMap(ord)
    val ks: ArrayData = m.keyArray()
    val vs: ArrayData = m.valueArray()
    val n = m.numElements()
    var i = 0
    while (i < n) { key.appendFrom(ks, i); value.appendFrom(vs, i); i += 1 }
    entryCount += n
    offsets.add(entryCount)
  }
  protected def appendNullSlot(): Unit = offsets.add(entryCount)
  override def collectDict(d20: DictBuild, d32: DictBuild): Unit = {
    key.collectDict(d20, d32); value.collectDict(d20, d32)
  }
  def write(sink: PageSink, d20: DictBuild, d32: DictBuild): ColMeta = {
    val (offBytes, offLen) = offsets.toBytes
    val offMeta = sink.writeBuffer(offBytes, offLen, Codec.Lz4, offsets.width)
    MapMeta(validity.write(sink), offMeta, key.write(sink, d20, d32), value.write(sink, d20, d32))
  }
  override def reset(): Unit = { super.reset(); offsets.reset(); key.reset(); value.reset(); entryCount = 0 }
  def byteSize: Long = key.byteSize + value.byteSize + offsets.size.toLong * offsets.width
}
