package graft.format

import java.nio.{ByteBuffer, ByteOrder}

/** Growable little-endian byte buffer used by column builders and the
  * footer codec. All multi-byte values in the graft format are
  * little-endian (the reference enforces LE at compile time,
  * `src/root.zig:3-7`).
  */
final class Bytes(initial: Int = 64) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var len = 0

  def size: Int = len
  def array: Array[Byte] = buf

  private def ensure(extra: Int): Unit = {
    // i32 offsets cap any one buffer at 2 GiB (the reference's i64-offset
    // large_binary path is out of scope, `src/write.zig:795-839`): a
    // pathological value — e.g. one >2 GiB string — must fail as a clean
    // format error at write time, not wrap the length into a JVM
    // ArrayIndexOutOfBounds deep in the encoder
    if (extra < 0 || len.toLong + extra > Bytes.MaxBufferBytes)
      throw new OliveFormatException(
        s"buffer would exceed ${Bytes.MaxBufferBytes} bytes (i32-offset format limit); " +
          "split the chunk or shrink the value")
    if (len + extra > buf.length) {
      var cap = buf.length * 2
      while (cap < len + extra && cap > 0) cap *= 2
      // clamp the doubled capacity too: a positive cap above the JVM array
      // limit would still die in copyOf with OutOfMemoryError
      buf = java.util.Arrays.copyOf(buf,
        if (cap > 0) math.min(cap, Bytes.MaxBufferBytes) else Bytes.MaxBufferBytes)
    }
  }

  def putByte(v: Byte): Unit = { ensure(1); buf(len) = v; len += 1 }
  def putShort(v: Short): Unit = {
    ensure(2)
    buf(len) = v.toByte; buf(len + 1) = (v >> 8).toByte; len += 2
  }
  def putInt(v: Int): Unit = {
    ensure(4)
    buf(len) = v.toByte; buf(len + 1) = (v >> 8).toByte
    buf(len + 2) = (v >> 16).toByte; buf(len + 3) = (v >> 24).toByte
    len += 4
  }
  def putLong(v: Long): Unit = {
    ensure(8)
    var i = 0
    while (i < 8) { buf(len + i) = (v >> (8 * i)).toByte; i += 1 }
    len += 8
  }
  def putFloat(v: Float): Unit = putInt(java.lang.Float.floatToIntBits(v))
  def putDouble(v: Double): Unit = putLong(java.lang.Double.doubleToLongBits(v))
  def putBytes(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(src, off, buf, len, n); len += n
  }
  def putBytes(src: Array[Byte]): Unit = putBytes(src, 0, src.length)
  /** Copy a UTF8String's bytes directly out of its backing memory —
    * no intermediate `getBytes` array on the per-row string hot path. */
  def putUTF8(s: org.apache.spark.unsafe.types.UTF8String): Unit = {
    val n = s.numBytes
    ensure(n)
    s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
    len += n
  }

  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  def reset(): Unit = { len = 0 }
}

/** Bounds-checked little-endian cursor over untrusted bytes (footer
  * parsing). Every read validates remaining length first. */
final class ByteCursor(buf: Array[Byte], start: Int, end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)
  private var pos = start

  private def need(n: Int): Unit =
    if (n < 0 || pos + n > end) throw new OliveFormatException(
      s"footer truncated: need $n bytes at $pos, have ${end - pos}")

  def getByte(): Byte = { need(1); val v = buf(pos); pos += 1; v }
  def getInt(): Int = {
    need(4)
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4; v
  }
  def getLong(): Long = {
    need(8)
    var v = 0L; var i = 0
    while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8; v
  }
  def getBytes(n: Int): Array[Byte] = {
    need(n); val v = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; v
  }
  def getString(): String = {
    val n = getInt()
    if (n < 0 || n > (end - pos)) throw new OliveFormatException(s"bad string length $n")
    new String(getBytes(n), java.nio.charset.StandardCharsets.UTF_8)
  }
  def remaining: Int = end - pos
}

object Bytes {
  /** Hard cap per encoded buffer: i32 offsets address at most 2 GiB, and
    * the JVM caps arrays a few words short of Int.MaxValue. */
  val MaxBufferBytes: Int = Int.MaxValue - 16

  /** View a byte array region as a little-endian ByteBuffer. */
  def le(buf: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
}
