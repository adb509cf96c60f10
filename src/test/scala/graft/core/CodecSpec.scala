package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import scala.util.Random

class CodecSpec extends AnyFunSuite {
  private val rnd = new Random(99)
  private def vec(d: Int) = Array.fill(d)(rnd.nextFloat() * 4 - 2)

  test("fp16 round-trip: exact for representable values, bounded otherwise") {
    // values exactly representable in half precision survive unchanged
    Seq(0f, 1f, -1f, 0.5f, 2048f, -0.25f).foreach { f =>
      assert(Fp16Kernels.fromHalf(Fp16Kernels.toHalf(f)) == f, s"value $f")
    }
    for (_ <- 1 to 2000) {
      val f = (rnd.nextFloat() * 8 - 4)
      val back = Fp16Kernels.fromHalf(Fp16Kernels.toHalf(f))
      assert(math.abs(back - f) <= math.max(math.abs(f) * 1.0f / 1024, 1e-4f),
        s"$f -> $back")
    }
    // overflow saturates to inf like IEEE
    assert(Fp16Kernels.fromHalf(Fp16Kernels.toHalf(1e6f)).isPosInfinity)
    assert(Fp16Kernels.fromHalf(Fp16Kernels.toHalf(-1e6f)).isNegInfinity)
  }

  test("fp16 exact ties round UP in magnitude (the oracle's floor(y+0.5) grid)") {
    // 1 + 2^-11 sits exactly between half-precision neighbors 1 and
    // 1 + 2^-10. The codec's `+ 0x1000` bit-add rounds ties AWAY from
    // zero — matching the DuckDB oracles' floor(y + 0.5) replay; RNE
    // (the reference's hardware conversion) would pick 1.0 here and
    // break the hash compare by half an ulp (ADVICE r9 — this pins
    // the documented tie direction).
    val tie = 1.00048828125f // 1 + 2^-11, exact in float32
    assert(Fp16Kernels.fromHalf(Fp16Kernels.toHalf(tie)) == 1.0009765625f)
    assert(Fp16Kernels.fromHalf(Fp16Kernels.toHalf(-tie)) == -1.0009765625f)
    // a tie in the subnormal range (grain 2^-24 below 2^-14):
    // 3 * 2^-25 is exactly between 2^-24 and 2^-23
    val sub = java.lang.Math.scalb(3f, -25)
    assert(Fp16Kernels.fromHalf(Fp16Kernels.toHalf(sub)) ==
      java.lang.Math.scalb(1f, -23))
  }

  test("fp16 encode/decode arrays") {
    val v = vec(33)
    val dec = Fp16Kernels.decode(Fp16Kernels.encode(new GenericArrayData(v)))
    assert(dec.length == 33)
    v.zip(dec).foreach { case (a, b) => assert(math.abs(a - b) < 4e-3) }
  }

  test("sq4: 2 codes per byte, reconstruction within half a bin") {
    val d = 16
    val v = vec(d)
    val vmin = Array.fill(d)(-2.0); val vdiff = Array.fill(d)(4.0)
    val code = Sq4Kernels.encode(new GenericArrayData(v), vmin, vdiff)
    assert(code.length == d / 2)
    val dec = Sq4Kernels.decode(code, vmin, vdiff)
    v.zip(dec).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 4.0 / 15 / 2 + 1e-6, s"$x vs $y")
    }
  }

  test("sq6: 4 codes per 3 bytes, pack/unpack round-trips exactly") {
    val rnd6 = new Random(7)
    for (_ <- 1 to 50) {
      val d = 1 + rnd6.nextInt(40)
      val v = Array.fill(d)(rnd6.nextFloat() * 4 - 2)
      val vmin = Array.fill(d)(-2.0); val vdiff = Array.fill(d)(4.0)
      val code = Sq6Kernels.encode(new GenericArrayData(v), vmin, vdiff)
      assert(code.length == (d * 6 + 7) / 8)
      val dec = Sq6Kernels.decode(code, vmin, vdiff)
      v.zip(dec).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 4.0 / 63 / 2 + 1e-6, s"d=$d $x vs $y")
      }
    }
  }

  test("sq4 odd dimension packs the tail nibble") {
    val d = 7
    val v = vec(d)
    val vmin = Array.fill(d)(-2.0); val vdiff = Array.fill(d)(4.0)
    val code = Sq4Kernels.encode(new GenericArrayData(v), vmin, vdiff)
    assert(code.length == 4)
    assert(Sq4Kernels.decode(code, vmin, vdiff).length == 7)
  }
}
