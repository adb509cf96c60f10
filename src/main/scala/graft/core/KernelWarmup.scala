package graft.core

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side JIT warmup for the hot static kernels.
  *
  * Why: every per-row hot loop in this engine bottoms out in a static
  * kernel method (distances, SQ/PQ codecs, text shingling/minhash,
  * centroid assignment). In a cold JVM the FIRST query to consume a
  * kernel at scale runs it interpreted/C1 while C2 chews through a
  * long compile queue shared with hundreds of janino whole-stage
  * classes — profiled repeatedly as 2–30× task-CPU inflation on
  * whichever big query touches a kernel first (the r06/r07 wandering
  * bench stalls). Spinning each kernel past the C2 invocation
  * threshold on tiny synthetic inputs BEFORE any timed work makes
  * first-touch cost deterministic for a few hundred ms of driver
  * time. Inputs go through [[UnsafeArrayData]], the representation
  * scans actually feed, so the compiled type profile matches
  * production.
  *
  * This is the JVM analog of the reference's practice of warming an
  * index before benchmarking; it does not touch Spark state and is
  * safe to call more than once.
  */
object KernelWarmup {

  private val N = 20000 // > C2 Tier4 invocation threshold (default 15k)

  @volatile private var ran = false
  // accumulate into a volatile sink so the JIT cannot dead-code the loops
  @volatile private var sink = 0.0

  def run(): Unit = synchronized {
    if (ran) return
    val rnd = new java.util.Random(42)
    val d = 8
    val fa = Array.fill(d)(rnd.nextFloat())
    val fb = Array.fill(d)(rnd.nextFloat())
    val ua = UnsafeArrayData.fromPrimitiveArray(fa)
    val ub = UnsafeArrayData.fromPrimitiveArray(fb)
    var s = 0.0

    // distance metrics (the kNN/range scan inner loops)
    var i = 0
    while (i < N) {
      s += VecKernels.l2sq(ua, ub) + VecKernels.ip(ua, ub) +
        VecKernels.cosine(ua, ub) + VecKernels.l1(ua, ub) +
        VecKernels.linf(ua, ub) + VecKernels.lp(ua, ub, 3.0) +
        VecKernels.canberra(ua, ub) + VecKernels.braycurtis(ua, ub) +
        VecKernels.jensenshannon(ua, ub) + VecKernels.jaccardFloat(ua, ub) +
        VecKernels.hammingFloat(ua, ub) + VecKernels.normL2(ua)
      i += 1
    }
    val ba = VecKernels.packSignBits(ua)
    val bb = VecKernels.packSignBits(ub)
    i = 0
    while (i < N) {
      s += VecKernels.hamming(ba, bb) + VecKernels.jaccardBinary(ba, bb)
      i += 1
    }

    // SQ / fp16 codecs + ADC
    val vmin = Array.fill(d)(0.0)
    val vdiff = Array.fill(d)(1.0)
    i = 0
    while (i < N) {
      val c8 = SqKernels.encode(ua, vmin, vdiff)
      s += SqKernels.decode(c8, vmin, vdiff)(0) +
        SqKernels.adcL2sq(ub, c8, vmin, vdiff)
      val c4 = Sq4Kernels.encode(ua, vmin, vdiff)
      s += Sq4Kernels.decode(c4, vmin, vdiff)(0) + SqAdcKernels.l2sq4(ub, c4, vmin, vdiff)
      s += Fp16Kernels.toHalf(fa(i % d))
      i += 1
    }

    // PQ codec + fast-scan integer ADC
    val cb = Array.fill(4)(Array.fill(16)(Array.fill(d / 4)(rnd.nextFloat())))
    i = 0
    while (i < N) {
      val code = PqKernels.encode(ua, cb)
      val lut = PqKernels.lut(ub, cb)
      s += PqKernels.decode(code, cb)(0) +
        PqKernels.adcFromLut(code, UnsafeArrayData.fromPrimitiveArray(lut), 16)
      val packed = Pq4Kernels.pack(code)
      val (lutq, a, b) = Pq4Kernels.quantLut(lut, 4, 16)
      s += Pq4Kernels.adcQ(packed, lutq) + a + b
      i += 1
    }

    // centroid assignment (IVF coarse quantizer path)
    val cents = Array.fill(16)(Array.fill(d)(rnd.nextFloat()))
    i = 0
    while (i < N) {
      s += CentroidKernels.dist(ua, cents(i & 15), "l2sq")
      CentroidKernels.nearest(ua, cents, "l2sq")
      CentroidKernels.nearestK(ua, cents, 4, "l2sq")
      i += 1
    }

    // text kernels (shingle/minhash/near-dup chain)
    val txt = UTF8String.fromString((1 to 60).map(i => s"tok${i % 23}").mkString(" "))
    val sw = new java.util.HashSet[UTF8String]()
    sw.add(UTF8String.fromString("tok1"))
    i = 0
    while (i < 4000) { // heavier per call; loop count still > threshold via inner loops
      TextKernels.shingleSet(txt, 3)
      val bs = TextKernels.minhashBandsAndHashSet(txt, 3, 12, 4)
      TextKernels.minhashBands(txt, 3, 12, 4)
      s += TextKernels.qualityScore(txt, sw) + TextKernels.md5Prefix60(txt) +
        TextKernels.sortedLongIntersect(bs.getArray(1), bs.getArray(1))
      TextKernels.pairTails(UnsafeArrayData.fromPrimitiveArray(Array(1L, 2L, 3L)))
      s += SimHash64.fnv1a64(ba)
      i += 1
    }

    // dedup-signature + binary-code kernels (codegen'd static calls
    // since r20 — warm them like the rest so their first at-scale
    // consumer doesn't run interpreted)
    val toks = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      (1 to 12).map(j => UTF8String.fromString(s"tok${j % 7}")).toArray[Any])
    val longs = UnsafeArrayData.fromPrimitiveArray(Array.tabulate(12)(j => (j * 2654435761L) & 0x7fffffffffffffL))
    i = 0
    while (i < 4000) {
      s += SimHashKernels.simhash64(toks)
      SimHashKernels.minhashBase(toks)
      SimHashKernels.minhashSig(longs, 12)
      WinnowKernels.fingerprints(txt, 8, 4)
      s += VecKernels.bitSlice(ba, 0, 6)
      VecKernels.unpackBits(ba, 8)
      i += 1
    }

    sink = s
    // only a COMPLETED warmup disables re-runs: a throw mid-way must
    // leave the next call free to retry, not silently run the whole
    // session on cold kernels
    ran = true
  }
}
