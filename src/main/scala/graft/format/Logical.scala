package graft.format

import org.apache.spark.sql.types._

/** Olive logical types with no native Spark equivalent, carried as field
  * metadata (`graft.logicalType`) on a widened Spark type and stored at
  * the original narrow width ([[Meta.UnsignedMeta]]).
  *
  * Mapping (SURVEY.md §1.2 rows 3–4; ref `src/write.zig:128-132`,
  * `src/read.zig:192-196`):
  *
  *   - u8  → ShortType        (stored 1 byte)
  *   - u16 → IntegerType      (stored 2 bytes)
  *   - u32 → LongType         (stored 4 bytes)
  *   - u64 → DecimalType(20,0) (stored 8 bytes; 2^64-1 needs 20 digits)
  *   - f16 → FloatType        (stored 2 bytes, IEEE 754 binary16)
  *
  * The same convention Spark's own parquet reader applies to UINT_8/16/32/64
  * logical annotations — widened on read, exact, no silent wrap. The writer
  * range-checks every value against the narrow domain, so a graft file can
  * never hold an out-of-range "u8" (an OliveFormatException instead).
  *
  * decimal256 (ref `src/write.zig:138-157` i256 arm) exceeds Spark's max
  * decimal precision 38; per SURVEY §1.2 #7 it maps to a 32-byte
  * BinaryType column tagged `graft.logicalType = "decimal256"` (+
  * `graft.decimalScale`), stored as a plain 32-byte little-endian
  * two's-complement primitive — NOT through the chunk-global FSB-32 dict,
  * which would dedup high-cardinality numerics for nothing.
  */
object Logical {
  /** Field-metadata key naming the olive logical type of a widened column. */
  val Key = "graft.logicalType"
  /** Metadata key carrying decimal256 scale (precision is fixed at 76). */
  val ScaleKey = "graft.decimalScale"

  val U8: Byte = 1
  val U16: Byte = 2
  val U32: Byte = 3
  val U64: Byte = 4
  val F16: Byte = 5

  def code(name: String): Byte = name match {
    case "u8" => U8
    case "u16" => U16
    case "u32" => U32
    case "u64" => U64
    case "f16" => F16
    case other => throw new OliveFormatException(s"unknown graft.logicalType '$other'")
  }

  def name(code: Byte): String = code match {
    case U8 => "u8"
    case U16 => "u16"
    case U32 => "u32"
    case U64 => "u64"
    case F16 => "f16"
    case other => throw new OliveFormatException(s"bad logical code $other")
  }

  /** Bytes per element on disk. */
  def elemSize(code: Byte): Int = code match {
    case U8 => 1
    case U16 => 2
    case U32 => 4
    case U64 => 8
    case F16 => 2
    case other => throw new OliveFormatException(s"bad logical code $other")
  }

  /** The widened Spark type the column must use. */
  def sparkType(code: Byte): DataType = code match {
    case U8 => ShortType
    case U16 => IntegerType
    case U32 => LongType
    case U64 => DecimalType(20, 0)
    case F16 => FloatType
    case other => throw new OliveFormatException(s"bad logical code $other")
  }

  /** Metadata for declaring a widened unsigned/half column. */
  def metadata(name: String): Metadata =
    new MetadataBuilder().putString(Key, name).build()

  def of(metadata: Metadata): Option[String] =
    if (metadata.contains(Key)) Some(metadata.getString(Key)) else None
}

/** IEEE 754 binary16 ↔ binary32, round-to-nearest-even (the rounding the
  * hardware would do). Java 17 lacks `Float.floatToFloat16`. */
object Half {
  def toFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    if (exp == 0x1f) // Inf / NaN
      java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    else if (exp == 0) {
      if (mant == 0) java.lang.Float.intBitsToFloat(sign) // ±0
      else {
        // subnormal half = mant * 2^-24; exact in float
        val v = mant * 5.9604644775390625e-8f // 2^-24
        if (sign != 0) -v else v
      }
    } else {
      // normal: rebias exponent 15 → 127, widen mantissa 10 → 23 bits
      java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
    }
  }

  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val abs = bits & 0x7fffffff
    if (abs >= 0x7f800000) { // Inf / NaN
      val m = if (abs > 0x7f800000) 0x200 else 0 // keep NaN a NaN
      (sign | 0x7c00 | m).toShort
    } else {
      val e = abs >>> 23 // float biased exponent
      if (e >= 143) (sign | 0x7c00).toShort // ≥ 2^16 → Inf
      else if (e >= 113) { // normal half range
        val h = ((e - 112) << 10) | ((abs >>> 13) & 0x3ff)
        val rest = abs & 0x1fff
        val r = if (rest > 0x1000 || (rest == 0x1000 && (h & 1) == 1)) h + 1 else h
        (sign | r).toShort // mantissa carry into exponent is correct (…→Inf)
      } else if (e >= 102) { // subnormal half
        val mant = (abs & 0x7fffff) | 0x800000
        val shift = 126 - e // 13 extra bits + (113 - e) subnormal shift
        val h = mant >>> shift
        val rest = mant & ((1 << shift) - 1)
        val halfway = 1 << (shift - 1)
        val r = if (rest > halfway || (rest == halfway && (h & 1) == 1)) h + 1 else h
        (sign | r).toShort
      } else sign.toShort // underflows to ±0
    }
  }
}
