package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** IEEE 754 binary16 conversion used for olive f16 columns. */
class HalfSpec extends AnyFunSuite {

  test("every non-NaN half bit pattern round-trips exactly") {
    var h = 0
    var checked = 0
    while (h < 0x10000) {
      val bits = h.toShort
      val exp = (h >>> 10) & 0x1f
      val mant = h & 0x3ff
      if (!(exp == 0x1f && mant != 0)) { // skip NaNs (payload canonicalized)
        val f = Half.toFloat(bits)
        assert(Half.toHalf(f) == bits,
          f"0x$h%04x -> $f -> 0x${Half.toHalf(f) & 0xffff}%04x")
        checked += 1
      }
      h += 1
    }
    assert(checked == 0x10000 - 2 * 1023) // all but the NaN payloads
  }

  test("known values") {
    assert(Half.toHalf(0.0f) == 0x0000.toShort)
    assert(Half.toHalf(-0.0f) == 0x8000.toShort)
    assert(Half.toHalf(1.0f) == 0x3c00.toShort)
    assert(Half.toHalf(-2.0f) == 0xc000.toShort)
    assert(Half.toHalf(65504f) == 0x7bff.toShort) // max finite half
    assert(Half.toHalf(65520f) == 0x7c00.toShort) // ties-to-even -> Inf
    assert(Half.toHalf(Float.PositiveInfinity) == 0x7c00.toShort)
    assert(Half.toHalf(Float.NaN) == 0x7e00.toShort)
    assert(Half.toFloat(0x0001.toShort) == 5.9604644775390625e-8f) // min subnormal
    assert(Half.toFloat(0x3555.toShort) == 0.33325195f) // ~1/3
    assert(Half.toHalf(0.33325195f) == 0x3555.toShort)
  }

  test("rounding is to nearest, ties to even") {
    // 1 + 1/2048 is exactly halfway between 1.0 (0x3c00) and 1+1/1024
    // (0x3c01): rounds down to even mantissa
    assert(Half.toHalf(1.0f + 1.0f / 2048f) == 0x3c00.toShort)
    // 1 + 3/2048 is halfway between 0x3c01 and 0x3c02: rounds up to even
    assert(Half.toHalf(1.0f + 3.0f / 2048f) == 0x3c02.toShort)
    // just above halfway rounds up
    assert(Half.toHalf(1.0f + 1.1f / 2048f) == 0x3c01.toShort)
  }
}
