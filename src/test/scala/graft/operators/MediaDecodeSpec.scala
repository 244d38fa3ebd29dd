package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import Multimodal._

/** The real BMP/WAV decoders (q126/q127): encode→decode round-trips on
  * known values, stride/padding handling, and loud failure on malformed
  * bytes — a decoder contract, not a length heuristic. */
class MediaDecodeSpec extends AnyFunSuite {

  test("BMP round-trip: dimensions and exact channel sum, padding honored") {
    // w=5 -> rowSize 16 (3*5=15 padded to 16): exercises the stride path
    val f = decodeBmp(42L, bmpBytes(42L, 5, 3))
    assert(f.width == 5 && f.height == 3 && f.bpp == 24)
    val expect = 3L * (for (x <- 0 until 5; y <- 0 until 3)
      yield (7 * x + 13 * y + 42L) % 256).sum
    assert(f.channel_sum == expect)
    // w=4: no padding (3*4=12, already 4-aligned)
    val g = decodeBmp(7L, bmpBytes(7L, 4, 4))
    assert(g.channel_sum ==
      3L * (for (x <- 0 until 4; y <- 0 until 4) yield (7 * x + 13 * y + 7L) % 256).sum)
  }

  test("BMP refuses junk, truncation, and unsupported variants") {
    intercept[IllegalArgumentException](decodeBmp(1L, Array.fill(54)(0x41.toByte)))
    val ok = bmpBytes(1L, 6, 6)
    intercept[IllegalArgumentException](decodeBmp(1L, ok.take(ok.length - 8)))
    val wrongBpp = ok.clone()
    wrongBpp(28) = 8 // claim 8-bit palette
    intercept[IllegalArgumentException](decodeBmp(1L, wrongBpp))
  }

  test("BMP top-down (negative height) decodes; degenerate dims refuse") {
    // a LEGAL top-down BMP stores height negative; the channel sum is
    // orientation-invariant, so flipping the sign must not change it
    // (nor silently skip the pixel loop, which it once did)
    val up = bmpBytes(9L, 5, 4)
    val down = up.clone()
    java.nio.ByteBuffer.wrap(down).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -4)
    val f = decodeBmp(9L, down)
    assert(f.height == -4 && f.channel_sum == decodeBmp(9L, up).channel_sum)
    // zero height / negative width / Int.MinValue height: loud refusal,
    // never a vacuous bounds check returning sum=0
    val zeroH = up.clone()
    java.nio.ByteBuffer.wrap(zeroH).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, 0)
    intercept[IllegalArgumentException](decodeBmp(9L, zeroH))
    val negW = up.clone()
    java.nio.ByteBuffer.wrap(negW).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(18, -5)
    intercept[IllegalArgumentException](decodeBmp(9L, negW))
    val minH = up.clone()
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    intercept[IllegalArgumentException](decodeBmp(9L, minH))
  }

  test("WAV round-trip: format fields, sample count, exact abs sum") {
    val f = decodeWav(11L, wavBytes(11L, 33))
    assert(f.sample_rate == 16000 && f.channels == 1 && f.bits == 16)
    assert(f.n_samples == 33)
    val expect = (0 until 33).map(i =>
      math.abs(((31 * 11L + 17 * i) % 65536) - 32768)).sum
    assert(f.abs_sum == expect)
  }

  test("WAV walks unknown chunks and refuses junk/truncation") {
    // splice a LIST chunk (odd length -> exercises 2-byte alignment)
    // between fmt and data: a real reader skips it
    val base = wavBytes(3L, 10)
    val bb = java.nio.ByteBuffer.allocate(base.length + 8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 36) // RIFF..fmt chunk end
    bb.put("LIST".getBytes).putInt(5).put(Array[Byte](1, 2, 3, 4, 5, 0))
    bb.put(base, 36, base.length - 36) // data chunk
    val spliced = bb.array()
    // fix RIFF size field
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val f = decodeWav(3L, spliced)
    assert(f.n_samples == 10 && f.abs_sum == decodeWav(3L, base).abs_sum)
    intercept[IllegalArgumentException](decodeWav(1L, "nonsense".getBytes))
    intercept[IllegalArgumentException](decodeWav(1L, base.take(40)))
  }

  test("PNG round-trip: all five filters inverted, gray and truecolor exact") {
    // h >= 6 covers every filter type (y % 5) plus a repeat with real
    // up-row context; both color types hit
    for (id <- Seq(2L, 7L)) { // even = grayscale, odd = RGB
      val w = 9; val h = 7
      val f = decodePng(id, pngBytes(id, w, h))
      assert(f.width == w && f.height == h)
      assert(f.color_type == (if (id % 2 == 0) 0 else 2))
      val chans = if (id % 2 == 0) 1 else 3
      val expect = (for {
        y <- 0 until h; x <- 0 until w; c <- 0 until chans
      } yield (7 * x + 13 * y + 11 * c + id) % 256).sum
      assert(f.channel_sum == expect, s"doc $id channel sum")
    }
    // 1x1 edge: no left/up context anywhere
    assert(decodePng(4L, pngBytes(4L, 1, 1)).channel_sum == 4L % 256)
  }

  test("PNG refuses junk, bad CRC, truncation; skips ancillary chunks") {
    intercept[IllegalArgumentException](decodePng(1L, "nonsense".getBytes))
    val good = pngBytes(5L, 6, 6)
    intercept[IllegalArgumentException](decodePng(5L, good.take(good.length - 9)))
    // flip one byte inside the first IDAT's data: CRC check must refuse
    // (find the chunk rather than hard-coding its offset)
    def chunkOffset(bytes: Array[Byte], typ: String): Int = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      var off = 8
      while (new String(bytes, off + 4, 4, "US-ASCII") != typ)
        off += 12 + bb.getInt(off)
      off
    }
    val corrupt = good.clone()
    val idatOff = chunkOffset(corrupt, "IDAT")
    corrupt(idatOff + 8) = (corrupt(idatOff + 8) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](decodePng(5L, corrupt))
    assert(e.getMessage.contains("CRC"))
    // the generator embeds a tEXt ancillary chunk — the decode above
    // proving exact sums already shows it is skipped; also verify the
    // chunk really is present in the byte stream
    assert(chunkOffset(good, "tEXt") > 8)
    // and the IDAT payload really is split in two (concatenation proven)
    val secondIdat = {
      val first = chunkOffset(good, "IDAT")
      val bb = java.nio.ByteBuffer.wrap(good)
      val next = first + 12 + bb.getInt(first)
      new String(good, next + 4, 4, "US-ASCII")
    }
    assert(secondIdat == "IDAT", "generator must emit two IDAT chunks")
  }

  test("JPEG (javax.imageio) decodes its own fixtures stably; junk refuses") {
    val bytes = Multimodal.jpegBytes(7L, 20, 17)
    // real baseline JPEG: SOI marker present
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    val dec = new Multimodal.JpegDecoder
    val f1 = dec.decode(Multimodal.MediaRow(7L, bytes))
    assert(f1.width == 20 && f1.height == 17 && f1.mode == "rgb")
    // lossy but DETERMINISTIC for a fixed JDK: a second decode of the
    // same bytes yields the identical checksum (what gate q144 pins)
    val f2 = dec.decode(Multimodal.MediaRow(7L, bytes))
    assert(f1.checksum == f2.checksum && f1.checksum > 0)
    // undecodable bytes refuse loudly (ImageIO returns null, we throw)
    val e = intercept[IllegalArgumentException](
      dec.decode(Multimodal.MediaRow(8L, "not a jpeg at all".getBytes)))
    assert(e.getMessage.contains("undecodable"))
    // a truncated JPEG either refuses or decodes partially — it must
    // never return the full image's checksum silently
    try {
      val part = dec.decode(Multimodal.MediaRow(9L, bytes.take(bytes.length / 4)))
      assert(part.checksum != f1.checksum)
    } catch {
      case _: IllegalArgumentException => // refusal is the better outcome
      case _: javax.imageio.IIOException => // ImageIO's own truncation error
    }
  }

  test("MP4 round-trip: geometry, codec, frames, keyframes, duration exact") {
    for (id <- Seq(0L, 1L, 5L, 12L)) {
      val w = (id % 11).toInt + 16; val h = (id % 7).toInt + 16
      val n = (id % 8).toInt + 1
      val codec = if (id % 2 == 0) "avc1" else "hev1"
      val m = Mp4.parse(Mp4.build(w, h, n, codec, keyframeEvery = 3, seed = id))
      assert(m.width == w && m.height == h, s"doc $id geometry")
      assert(m.codec == codec && m.nFrames == n)
      assert(m.keyframes == (n - 1) / 3 + 1, s"doc $id keyframes")
      assert(m.durationMs == 40L * n && m.timescale == 1000)
      // stco points into the mdat payload (past both headers)
      assert(m.firstChunkOffset > 0 && m.firstChunkOffset < Int.MaxValue)
    }
    // absent stss = every sample is sync (the spec default)
    val all = Mp4.parse(Mp4.build(8, 8, 6, "avc1", keyframeEvery = 1))
    assert(all.keyframes == 6)
    // the common real-container layout: audio track FIRST — selection
    // walks past it to the video track and parses identically
    val solo = Mp4.parse(Mp4.build(20, 12, 5, "avc1", seed = 3L))
    val multi = Mp4.parse(Mp4.build(20, 12, 5, "avc1", seed = 3L, audioTrack = true))
    assert(multi.copy(firstChunkOffset = solo.firstChunkOffset) == solo,
      "audio-first container must parse the video track identically")
  }

  test("MP4 box walker refuses truncation, junk, and hostile sizes") {
    val good = Mp4.build(16, 16, 4, "avc1", seed = 9L)
    def boom(bytes: Array[Byte]): IllegalArgumentException =
      intercept[IllegalArgumentException](Mp4.parse(bytes))
    // junk and empty
    assert(boom("not an mp4 container at all".getBytes).getMessage.contains("MP4"))
    assert(boom(Array.empty[Byte]).getMessage.contains("MP4"))
    // truncation at every box-ish granularity: the walker must refuse,
    // never index past the buffer or fabricate a value
    Seq(4, 12, good.length / 3, good.length / 2, good.length - 5).foreach { cut =>
      boom(good.take(cut))
    }
    // a child box whose size leaks past its parent (classic hostile trick)
    val leak = good.clone()
    // moov starts right after ftyp (24 bytes): inflate its first child's size
    val moovPayload = 24 + 8
    val bb = java.nio.ByteBuffer.wrap(leak)
    bb.putInt(moovPayload, Int.MaxValue)
    assert(boom(leak).getMessage.contains("leak"))
    // size smaller than its own header
    val tiny = good.clone()
    java.nio.ByteBuffer.wrap(tiny).putInt(moovPayload, 4)
    boom(tiny)
    // stss sample number beyond the frame count must refuse
    def findBox(bytes: Array[Byte], typ: String): Int = {
      val pat = typ.getBytes("US-ASCII")
      (0 until bytes.length - 4).find(i =>
        bytes(i) == pat(0) && bytes(i + 1) == pat(1) &&
          bytes(i + 2) == pat(2) && bytes(i + 3) == pat(3)).get - 4
    }
    val badSync = good.clone()
    val stss = findBox(badSync, "stss")
    // first sync entry (payload: vf 4 + count 4 + entries): set to 999
    java.nio.ByteBuffer.wrap(badSync).putInt(stss + 8 + 8, 999)
    assert(boom(badSync).getMessage.contains("stss"))
    // a non-video handler must refuse rather than emit fake geometry
    val audio = good.clone()
    val hdlr = findBox(audio, "hdlr")
    System.arraycopy("soun".getBytes("US-ASCII"), 0, audio, hdlr + 8 + 8, 4)
    assert(boom(audio).getMessage.contains("video"))
    // stts/stsz disagreement must refuse (corrupt sample tables)
    val badCount = good.clone()
    val stsz = findBox(badCount, "stsz")
    java.nio.ByteBuffer.wrap(badCount).putInt(stsz + 8 + 8, 3) // claims 3 != 4
    boom(badCount)
    // trailing junk after the last top-level box is not a box
    boom(good ++ Array[Byte](1, 2, 3, 4, 5))
  }

  test("MP4 walker handles 64-bit largesize and to-end-of-file boxes") {
    val good = Mp4.build(16, 16, 4, "avc1", seed = 2L)
    val base = Mp4.parse(good)
    // rewrite the trailing mdat header into the size==1 + 64-bit form
    // (the >4 GiB media-payload shape): [1:u32]['mdat'][largesize:u64]
    val mdatOff = {
      val pat = "mdat".getBytes("US-ASCII")
      (0 until good.length - 4).find(i =>
        good(i) == pat(0) && good(i + 1) == pat(1) &&
          good(i + 2) == pat(2) && good(i + 3) == pat(3)).get - 4
    }
    val mdatSize = java.nio.ByteBuffer.wrap(good).getInt(mdatOff)
    val big = java.nio.ByteBuffer.allocate(good.length + 8)
    big.put(good, 0, mdatOff)
    big.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(mdatSize.toLong + 8)
    big.put(good, mdatOff + 8, good.length - mdatOff - 8)
    val parsedBig = Mp4.parse(big.array())
    assert(parsedBig.copy(firstChunkOffset = base.firstChunkOffset) == base,
      "largesize mdat must parse identically")
    // size==0 = extends to end of file (legal only for the last box)
    val toEnd = good.clone()
    java.nio.ByteBuffer.wrap(toEnd).putInt(mdatOff, 0)
    assert(Mp4.parse(toEnd) == base, "to-end-of-file mdat must parse identically")
    // a LYING largesize (past the buffer) still refuses
    val lying = big.array().clone()
    java.nio.ByteBuffer.wrap(lying).putLong(mdatOff + 8, Int.MaxValue.toLong)
    intercept[IllegalArgumentException](Mp4.parse(lying))
  }
}

/** Counters for [[PluggableDecoderSpec]] — static because decoder
  * instances serialize driver→executor; in local mode all tasks share
  * this JVM, so the counts observe the real per-partition lifecycle. */
object DecoderProbe {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val decodes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0); decodes.set(0) }
}

/** Stands in for a JNI/codec decoder: counts its lifecycle and emits
  * features the stub would never produce. Top-level: decoder instances
  * serialize into tasks (an inner class would drag the spec along). */
class ProbeDecoder extends Multimodal.MediaDecoder {
  override def open(): Unit = DecoderProbe.opens.incrementAndGet()
  override def close(): Unit = DecoderProbe.closes.incrementAndGet()
  def decode(m: Multimodal.MediaRow): Multimodal.MediaFeatures = {
    DecoderProbe.decodes.incrementAndGet()
    Multimodal.MediaFeatures(m.doc_id, m.media.length.toLong, -1, -1, 99, "probe")
  }
}

/** A decoder whose decode always throws — proves close() runs on task
  * failure. */
class ExplodingDecoder extends Multimodal.MediaDecoder {
  override def open(): Unit = DecoderProbe.opens.incrementAndGet()
  override def close(): Unit = DecoderProbe.closes.incrementAndGet()
  def decode(m: Multimodal.MediaRow): Multimodal.MediaFeatures =
    throw new IllegalStateException("codec blew up")
}

/** The pluggable decode seam ([[Multimodal.MediaDecoder]]): a swapped
  * decoder flows through the identical q50 plumbing, and the lifecycle
  * contract (one open/close per partition, streaming decode) holds. */
class PluggableDecoderSpec extends graft.SparkSpec {
  import Multimodal._
  import org.apache.spark.sql.functions._

  test("a swapped decoder runs through the q50 plumbing under the lifecycle contract") {
    val s = spark
    import s.implicits._
    DecoderProbe.reset()
    val parts = 3
    val media = s.range(0, 300)
      .select(col("id").as("doc_id"),
        encode(concat(lit("doc"), col("id")), "UTF-8").as("media"))
      .repartition(parts).as[MediaRow]
    val out = decodeWith(media, () => new ProbeDecoder).collect()
    assert(out.length == 300)
    assert(out.forall(f => f.mode == "probe" && f.n_frames == 99))
    assert(DecoderProbe.decodes.get() == 300)
    assert(DecoderProbe.opens.get() == parts,
      s"one open per partition: ${DecoderProbe.opens.get()} != $parts")
    assert(DecoderProbe.closes.get() == parts,
      s"close must run per partition: ${DecoderProbe.closes.get()} != $parts")
    // the MP4 decoder through the SAME seam equals a direct parse map
    val mp4Media = s.range(0, 50)
      .map(id => MediaRow(id, Mp4.build((id % 10).toInt + 8, (id % 6).toInt + 8,
        (id % 5).toInt + 1, "avc1", seed = id)))
    val viaSeam = decodeWith(mp4Media, () => new Mp4Decoder).collect()
      .sortBy(_.doc_id).toSeq
    val direct = mp4Media.collect().map { m =>
      val x = Mp4.parse(m.media)
      MediaFeatures(m.doc_id, m.media.length.toLong, x.width, x.height,
        x.nFrames, x.codec, x.keyframes.toLong)
    }.sortBy(_.doc_id).toSeq
    assert(viaSeam == direct)
  }

  test("close() still runs when a decode throws mid-partition") {
    val s = spark
    import s.implicits._
    DecoderProbe.reset()
    val media = s.range(0, 10)
      .select(col("id").as("doc_id"), encode(lit("x"), "UTF-8").as("media"))
      .coalesce(1).as[MediaRow]
    intercept[org.apache.spark.SparkException] {
      decodeWith(media, () => new ExplodingDecoder).collect()
    }
    // Spark retries the task locally (4 attempts by default in tests is
    // 1 for local[*] with failFast? attempts vary) — every open must be
    // paired with a close, and at least one pair must have run
    assert(DecoderProbe.opens.get() >= 1)
    assert(DecoderProbe.closes.get() == DecoderProbe.opens.get(),
      "every opened codec context must be closed on task failure")
  }
}
