package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Zn-sphere enumerative codec (faiss/impl/lattice_Zn.cpp) and the
  * IndexLattice codec on top: counts, bijection, nearest-point
  * optimality, and pack/unpack roundtrips — all against brute-force
  * enumeration of the integer sphere. */
class ZnLatticeSpec extends AnyFunSuite {

  /** All integer points of Z^dim with Σx² = r2, brute force. */
  private def spherePoints(dim: Int, r2: Int): Seq[Seq[Int]] = {
    val vmax = math.sqrt(r2).toInt
    def rec(left: Int, n: Int): Seq[List[Int]] =
      if (n == 0) { if (left == 0) Seq(Nil) else Seq.empty }
      else (-vmax to vmax).flatMap { v =>
        if (v * v <= left) rec(left - v * v, n - 1).map(v :: _) else Seq.empty
      }
    rec(r2, dim).map(_.toSeq)
  }

  test("nv matches brute-force sphere enumeration (d=4, r2=10 and d=6, r2=6)") {
    for ((dim, r2) <- Seq((4, 10), (6, 6))) {
      val codec = new ZnSphereCodec(dim, r2)
      val brute = spherePoints(dim, r2)
      assert(codec.nv == brute.size,
        s"d=$dim r2=$r2: nv=${codec.nv} != brute ${brute.size}")
    }
  }

  test("encode/decode is a bijection over all codes (d=4, r2=10)") {
    val codec = new ZnSphereCodec(4, 10)
    val seen = scala.collection.mutable.Set.empty[Seq[Int]]
    for (code <- 0L until codec.nv) {
      val c = codec.decode(code)
      assert(c.map(v => v * v).sum == 10, s"code $code decodes off-sphere: ${c.toSeq}")
      assert(seen.add(c.toSeq), s"code $code decodes to duplicate point ${c.toSeq}")
      val back = codec.encode(c.map(_.toFloat))
      assert(back == code, s"encode(decode($code)) = $back")
    }
    assert(seen.size.toLong == codec.nv)
  }

  test("ZnSphereCodecRec: DP count equals atom count equals brute force " +
    "(power-of-2 dims)") {
    for ((dim, r2) <- Seq((4, 10), (8, 6), (8, 14), (16, 4))) {
      val rec = new ZnSphereCodecRec(dim, r2)
      val atom = new ZnSphereCodec(dim, r2)
      assert(rec.nv == atom.nv, s"d=$dim r2=$r2: rec ${rec.nv} != atom ${atom.nv}")
      if (dim <= 8) assert(rec.nv == spherePoints(dim, r2).size)
      assert(rec.codeSize == atom.codeSize)
    }
  }

  test("ZnSphereCodecRec: encode/decode is a bijection over all codes " +
    "(d=8, r2=6), codes differ from the atom codec's") {
    val rec = new ZnSphereCodecRec(8, 6)
    val atom = new ZnSphereCodec(8, 6)
    val seen = scala.collection.mutable.Set.empty[Long]
    var anyDifferent = false
    for (code <- 0L until atom.nv) {
      val p = atom.decode(code) // enumerate via the atom codec
      val rc = rec.encodeCentroid(p)
      assert(rc >= 0 && rc < rec.nv, s"rec code $rc out of range")
      assert(seen.add(rc), s"duplicate rec code $rc for point ${p.toSeq}")
      assert(rec.decode(rc).toSeq == p.toSeq,
        s"rec roundtrip broke for ${p.toSeq}")
      if (rc != code) anyDifferent = true
    }
    assert(seen.size.toLong == rec.nv)
    // the two enumerations are genuinely different orders (the
    // reference's codes are incompatible by design)
    assert(anyDifferent, "rec and atom enumerations unexpectedly identical")
  }

  test("ZnSphereCodecRec rejects non-power-of-2 dims (the reference's assert)") {
    intercept[IllegalArgumentException] { new ZnSphereCodecRec(6, 6) }
  }

  test("search returns the true nearest sphere point (d=4, r2=10)") {
    val codec = new ZnSphereCodec(4, 10)
    val pts = spherePoints(4, 10)
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 50) {
      val x = Array.fill(4)((rnd.nextFloat() - 0.5f) * 6)
      val (c, _) = codec.search(x)
      def d2(p: Seq[Int]) = p.zip(x).map { case (a, b) => (a - b.toDouble) * (a - b.toDouble) }.sum
      val got = d2(c.toSeq)
      val best = pts.map(d2).min
      assert(math.abs(got - best) < 1e-9, s"x=${x.toSeq}: got $got best $best")
    }
  }

  test("LatticeCodec pack/unpack roundtrip and code size (d=8, nsq=2, r2=10, 8-bit scale)") {
    val rnd = new scala.util.Random(17)
    val train = Array.fill(200)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val mins = Array.tabulate(2)(j =>
      train.map(v => math.sqrt(v.slice(j * 4, j * 4 + 4).map(x => x * x.toDouble).sum)).min.toFloat)
    val maxs = Array.tabulate(2)(j =>
      train.map(v => math.sqrt(v.slice(j * 4, j * 4 + 4).map(x => x * x.toDouble).sum)).max.toFloat)
    val lat = new LatticeCodec(8, 2, 8, 10, mins, maxs)
    assert(lat.codeSize == (2 * (lat.latticeNbit + 8) + 7) / 8)
    for (v <- train.take(50)) {
      val packed = lat.encode(v)
      assert(packed.length == lat.codeSize)
      val sub = lat.subCodes(v)
      // packed and unpacked views agree
      val dec = lat.decode(packed)
      val dec2 = (0 until 2).flatMap(j => lat.decodeSub(j, sub(2 * j), sub(2 * j + 1)))
      assert(dec.toSeq == dec2, "packed and unpacked decode disagree")
      // decoded direction is on the sphere, norm within the trained range
      for (j <- 0 until 2) {
        val s = dec.slice(j * 4, j * 4 + 4)
        val n = math.sqrt(s.map(x => x * x.toDouble).sum)
        assert(n >= mins(j) / math.sqrt(10) - 1e-3 && n <= maxs(j) + 1e-3)
      }
    }
  }

  test("quantization error shrinks as r2 grows (rate/distortion sanity)") {
    val rnd = new scala.util.Random(23)
    val xs = Array.fill(100)(Array.fill(4)(rnd.nextFloat() + 0.1f))
    def avgErr(r2: Int): Double = {
      val codec = new ZnSphereCodec(4, r2)
      xs.map { x =>
        val nrm = math.sqrt(x.map(v => v * v.toDouble).sum)
        val xs2 = x.map(v => (v * math.sqrt(r2) / nrm).toFloat)
        val (c, _) = codec.search(xs2)
        val cn = math.sqrt(c.map(v => v * v.toDouble).sum)
        c.zip(xs2).map { case (a, b) => (a / cn - b / math.sqrt(r2)) * (a / cn - b / math.sqrt(r2)) }.sum
      }.sum / xs.length
    }
    val e4 = avgErr(4); val e36 = avgErr(36)
    assert(e36 < e4, s"err(r2=36)=$e36 not < err(r2=4)=$e4")
  }
}
