package graft.format

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {
  private val payloads = Seq(
    Array.empty[Byte],
    "hello graft".getBytes,
    Array.fill(100000)(7.toByte),
    Array.tabulate(65536)(i => (i * 31 % 251).toByte))

  for (codec <- Seq(Codec.None, Codec.Lz4, Codec.Lz4Hc, Codec.Zstd1)) {
    test(s"codec $codec round-trips") {
      payloads.foreach { p =>
        val c = Codec.compress(codec, p, 0, p.length)
        val d = Codec.decompress(codec, c, 0, c.length, p.length)
        assert(d.toSeq == p.toSeq)
      }
    }
  }

  test("decompress enforces exact output size") {
    val p = Array.fill(1000)(42.toByte)
    val c = Codec.compress(Codec.Lz4, p, 0, p.length)
    intercept[OliveFormatException](Codec.decompress(Codec.Lz4, c, 0, c.length, 999))
    val z = Codec.compress(Codec.Zstd1, p, 0, p.length)
    intercept[Exception](Codec.decompress(Codec.Zstd1, z, 0, z.length, 2000))
  }

  test("corrupted compressed bytes fail cleanly") {
    val p = Array.tabulate(5000)(i => (i % 100).toByte)
    for (codec <- Seq(Codec.Lz4, Codec.Zstd1)) {
      val c = Codec.compress(codec, p, 0, p.length)
      c(c.length / 2) = (c(c.length / 2) ^ 0x5a).toByte
      // must throw or return wrong-size, never crash
      try {
        val d = Codec.decompress(codec, c, 0, c.length, p.length)
        assert(d.length == p.length)
      } catch { case _: Exception => () }
    }
  }
}
