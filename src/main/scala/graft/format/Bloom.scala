package graft.format

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-chunk split Bloom filters for point-lookup chunk skipping on
  * UNSORTED high-cardinality columns — the lookup shape zone maps can't
  * serve (min/max of a hash column spans everything). Parquet's
  * `bloom.filter.enabled` idea, aimed at olive's home domain: find-by-id
  * over 20/32-byte hashes. Opt-in per column via the writer option
  * `bloom` ("colA,colB"); a filter proves ABSENCE (skip the chunk),
  * presence is only "maybe" and Spark's residual filter decides.
  *
  * k=7 probes at ~10 bits per distinct value → ~1% false positives.
  * Double hashing (Kirsch-Mitzenmacher): g_i = h1 + i*h2, h1 = FNV-1a 64
  * of the value bytes, h2 = splitmix64(h1) | 1.
  */
object Bloom {
  val K = 7
  val BitsPerValue = 10
  val MaxBytes: Int = 1 << 22 // 4 MiB cap per column per chunk

  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xff; h *= 0x100000001b3L; i += 1 }
    h
  }

  private def mix(z0: Long): Long = { // splitmix64 finisher
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mightContain(bits: Array[Byte], value: Array[Byte]): Boolean = {
    val m = bits.length.toLong * 8
    if (m <= 0) return true
    val h1 = hash(value)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < K) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Accumulates distinct value HASHES; the filter is sized from the
    * exact distinct count at finish (no guessing a cardinality upfront). */
  final class Builder {
    private val seen = new java.util.HashSet[java.lang.Long]()
    def add(valueBytes: Array[Byte]): Unit = seen.add(hash(valueBytes))
    def finish(): Array[Byte] = {
      val nBits = math.max(64L, seen.size.toLong * BitsPerValue)
      val nBytes = math.min((nBits + 7) / 8, MaxBytes.toLong).toInt
      val bits = new Array[Byte](nBytes)
      val m = nBytes.toLong * 8
      seen.forEach { boxed =>
        val h1 = boxed.longValue()
        val h2 = mix(h1) | 1L
        var i = 0
        while (i < K) {
          val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
          bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7).toInt)).toByte
          i += 1
        }
      }
      bits
    }
    def reset(): Unit = seen.clear()
  }

  /** Bit array with value equality so footer round-trips compare. */
  final case class Bits(bytes: Array[Byte]) {
    override def equals(o: Any): Boolean = o match {
      case Bits(b) => java.util.Arrays.equals(bytes, b)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
  }

  /** The hashed byte form of a filter LITERAL — must agree exactly with
    * [[collectorFor]]'s write-side byte derivation. None = type not
    * bloom-comparable (never skip on it). */
  def literalBytes(dt: DataType, v: Any): Option[Array[Byte]] = (dt, v) match {
    case (StringType, s: String) => Some(UTF8String.fromString(s).getBytes)
    // a string key supplied as its RAW UTF-8 bytes (the driver-side DML
    // prune collects string keys through a BINARY cast: a String
    // round-trip would substitute U+FFFD for invalid UTF-8 and probe the
    // bloom with the WRONG bytes — a false "not present" proof)
    case (StringType, b: Array[Byte]) => Some(b)
    case (BinaryType, b: Array[Byte]) => Some(b)
    case (ByteType | ShortType | IntegerType | LongType, n: Number)
        if n.doubleValue() == n.longValue().toDouble =>
      Some(longLe(n.longValue()))
    case _ => None
  }

  private def longLe(v: Long): Array[Byte] = { val b = new Bytes(8); b.putLong(v); b.toArray }

  /** Write-side per-row byte extraction for a bloom'd column, or None
    * when the type doesn't support bloom filters. */
  def collectorFor(dt: DataType, ord: Int): Option[org.apache.spark.sql.catalyst.InternalRow => Array[Byte]] =
    dt match {
      case StringType => Some(r => r.getUTF8String(ord).getBytes)
      case BinaryType => Some(r => r.getBinary(ord))
      case ByteType => Some(r => longLe(r.getByte(ord).toLong))
      case ShortType => Some(r => longLe(r.getShort(ord).toLong))
      case IntegerType => Some(r => longLe(r.getInt(ord).toLong))
      case LongType => Some(r => longLe(r.getLong(ord)))
      case _ => None
    }
}
