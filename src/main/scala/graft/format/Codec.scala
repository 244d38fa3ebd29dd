package graft.format

import com.github.luben.zstd.Zstd
import net.jpountz.lz4.LZ4Factory

/** Block compression codecs for graft pages.
  *
  * Mirrors the reference's codec surface (steelcake/olive
  * `src/compression.zig:12-24`): none / lz4 / lz4-hc(level 3) /
  * zstd(level 1), with the same exact-output-size enforcement on
  * decompress (`compression.zig:179,191`) so a corrupted page can never
  * silently yield short data.
  */
object Codec {
  final val None: Byte = 0
  final val Lz4: Byte = 1
  final val Lz4Hc: Byte = 2
  final val Zstd1: Byte = 3

  // lz4-java factory is thread-safe and caches instances.
  private val lz4 = LZ4Factory.fastestInstance()
  private final val Lz4HcLevel = 3
  private final val ZstdLevel = 1

  def compress(codec: Byte, src: Array[Byte], off: Int, len: Int): Array[Byte] = codec match {
    case None =>
      java.util.Arrays.copyOfRange(src, off, off + len)
    case Lz4 =>
      val c = lz4.fastCompressor()
      val dst = new Array[Byte](c.maxCompressedLength(len))
      val n = c.compress(src, off, len, dst, 0, dst.length)
      java.util.Arrays.copyOf(dst, n)
    case Lz4Hc =>
      val c = lz4.highCompressor(Lz4HcLevel)
      val dst = new Array[Byte](c.maxCompressedLength(len))
      val n = c.compress(src, off, len, dst, 0, dst.length)
      java.util.Arrays.copyOf(dst, n)
    case Zstd1 =>
      val in = if (off == 0 && len == src.length) src else java.util.Arrays.copyOfRange(src, off, off + len)
      Zstd.compress(in, ZstdLevel)
    case other => throw new OliveFormatException(s"unknown codec $other")
  }

  /** Decompress exactly `rawSize` bytes; anything else is corruption.
    * All codec-internal failures surface as OliveFormatException so a
    * hostile page can never escape the reader's error contract. */
  def decompress(codec: Byte, src: Array[Byte], off: Int, compSize: Int, rawSize: Int): Array[Byte] = {
    if (compSize < 0 || rawSize < 0 || off < 0 || off.toLong + compSize > src.length)
      throw new OliveFormatException("page out of bounds")
    try decompress0(codec, src, off, compSize, rawSize)
    catch {
      case e: OliveFormatException => throw e
      case e: Exception => throw new OliveFormatException(s"page decompression failed", e)
    }
  }

  private def decompress0(codec: Byte, src: Array[Byte], off: Int, compSize: Int, rawSize: Int): Array[Byte] = {
    codec match {
      case None =>
        if (compSize != rawSize) throw new OliveFormatException("uncompressed page size mismatch")
        java.util.Arrays.copyOfRange(src, off, off + rawSize)
      case Lz4 | Lz4Hc =>
        val dst = new Array[Byte](rawSize)
        val d = lz4.safeDecompressor()
        val n = d.decompress(src, off, compSize, dst, 0, rawSize)
        if (n != rawSize) throw new OliveFormatException(s"lz4 page decompressed to $n, want $rawSize")
        dst
      case Zstd1 =>
        val in = if (off == 0 && compSize == src.length) src else java.util.Arrays.copyOfRange(src, off, off + compSize)
        val dst = new Array[Byte](rawSize)
        val n = Zstd.decompress(dst, in)
        if (n != rawSize) throw new OliveFormatException(s"zstd page decompressed to $n, want $rawSize")
        dst
      case other => throw new OliveFormatException(s"unknown codec $other")
    }
  }
}

/** Raised for any malformed/hostile file content; the reader must fail
  * cleanly (never crash or over-read) per the reference's adversarial
  * read contract (`src/fuzz.zig:12-52`). */
class OliveFormatException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)
