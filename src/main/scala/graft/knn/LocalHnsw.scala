package graft.knn

import scala.reflect.ClassTag

/** In-memory single-JVM HNSW graph — the per-partition building block
  * of [[PartitionedHnsw]] (the IndexShards pattern,
  * faiss/IndexShards.h:20: independent sub-indexes whose results are
  * heap-merged). Algorithm re-derived from the HNSW paper semantics as
  * implemented by the reference's HNSWfast variant
  * (faiss/IndexHNSWfast.h:63, faiss/impl/HNSWfast.cpp:368 add/search):
  * geometric level assignment, greedy descent through upper levels,
  * beam (ef) search at level 0, bidirectional links pruned to the M
  * best. Written for the JVM hot path: primitive-array heaps, a BitSet
  * visited set, flat int adjacency lists — no boxing anywhere in the
  * build/search loops (a partition builds single-threaded).
  *
  * Generic in the STORED vector representation `S` (the reference's
  * storage-index split, faiss/IndexHNSW.h:34: the graph walks ids, the
  * storage supplies a DistanceComputer): [[LocalHnsw]] stores float32
  * (IndexHNSWFlat), [[LocalHnswSq]] stores 1-byte-per-dim SQ8 codes
  * decoded on the fly (IndexHNSWSQ, faiss/IndexHNSW.h:168) — 4× less
  * executor memory per graph, the difference between an in-memory
  * shard and a spilled one at 100 TB.
  *
  * Deterministic given (seed, insertion order): level draws come from a
  * seeded RNG, and candidate selection orders are fixed by the heap
  * comparisons (dist, then insertion index).
  */
abstract class LocalHnswCore[S <: AnyRef: ClassTag](
    m: Int, efConstruction: Int, seed: Long) {

  /** Stored-vs-stored distance (graph construction). */
  protected def sdist(a: S, b: S): Double

  private val rng = new java.util.Random(seed)
  private val mL = 1.0 / math.log(m.toDouble)
  private val maxM0 = 2 * m

  private var n = 0
  private var cap = 1024
  private var vecs = new Array[S](cap)
  private var ids = new Array[Long](cap)
  private var levels = new Array[Int](cap)
  /** nbrA(node)(level) = int array, nbrN(node)(level) = used length. */
  private var nbrA = new Array[Array[Array[Int]]](cap)
  private var nbrN = new Array[Array[Int]](cap)
  private var entry = -1
  private var maxLevel = -1


  def size: Int = n

  private def grow(): Unit = {
    cap *= 2
    vecs = java.util.Arrays.copyOf(vecs, cap).asInstanceOf[Array[S]]
    ids = java.util.Arrays.copyOf(ids, cap)
    levels = java.util.Arrays.copyOf(levels, cap)
    nbrA = java.util.Arrays.copyOf(nbrA, cap)
    nbrN = java.util.Arrays.copyOf(nbrN, cap)
  }

  private def addLink(node: Int, level: Int, nb: Int): Unit = {
    val arr = nbrA(node)(level)
    val used = nbrN(node)(level)
    if (used == arr.length)
      nbrA(node)(level) = java.util.Arrays.copyOf(arr, arr.length * 2)
    nbrA(node)(level)(used) = nb
    nbrN(node)(level) = used + 1
  }

  /** Keep the `capL` closest neighbors of `node` at `level` (amortized:
    * callers let the list overshoot by a small slack first). */
  private def pruneTo(node: Int, level: Int, capL: Int): Unit = {
    val arr = nbrA(node)(level)
    val used = nbrN(node)(level)
    val ds = new Array[Double](used)
    val v = vecs(node)
    var i = 0
    while (i < used) { ds(i) = sdist(v, vecs(arr(i))); i += 1 }
    // insertion sort by (dist, id) — used <= capL + slack is small
    i = 1
    while (i < used) {
      val dv = ds(i); val av = arr(i)
      var j = i - 1
      while (j >= 0 && (ds(j) > dv || (ds(j) == dv && arr(j) > av))) {
        ds(j + 1) = ds(j); arr(j + 1) = arr(j); j -= 1
      }
      ds(j + 1) = dv; arr(j + 1) = av
      i += 1
    }
    nbrN(node)(level) = capL
  }

  /** Greedy single-step descent at `level` from `start`; `distTo` is
    * the distance from the (implicit) query to a stored vector. */
  private def greedy(distTo: S => Double, start: Int, level: Int): Int = {
    var cur = start
    var curD = distTo(vecs(cur))
    var improved = true
    while (improved) {
      improved = false
      val arr = nbrA(cur)(level)
      val used = nbrN(cur)(level)
      var i = 0
      while (i < used) {
        val nd = arr(i)
        val d = distTo(vecs(nd))
        if (d < curD) { cur = nd; curD = d; improved = true }
        i += 1
      }
    }
    cur
  }

  // ---- primitive heaps (per-THREAD scratch, resized on demand) --------
  // One graph instance serves CONCURRENT searches when it backs a
  // coarse quantizer shared across executor threads
  // (graft.core.CentroidHnswCache): per-instance scratch would let
  // parallel tasks corrupt each other's beam state — wrong probe sets
  // under concurrency (found round 11 on the at-scale HNSW-coarse
  // twin). Builds (add) stay single-threaded by construction: the
  // cache's first-toucher builds under its lock and the per-partition
  // graphs build inside one task, so only SEARCH needs isolation.
  private final class Scratch {
    // results: max-heap of (dist, node) capped at ef — worst on top
    var resD = new Array[Double](0)
    var resX = new Array[Int](0)
    var resN = 0
    // frontier: min-heap of (dist, node)
    var froD = new Array[Double](64)
    var froX = new Array[Int](64)
    var froN = 0
    val visited = new java.util.BitSet()
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  private def resPush(sc: Scratch, d: Double, x: Int, ef: Int): Unit = {
    import sc._
    if (resN < ef) {
      var i = resN; resD(i) = d; resX(i) = x; resN += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (resD(p) < resD(i) || (resD(p) == resD(i) && resX(p) < resX(i))) {
          val td = resD(p); resD(p) = resD(i); resD(i) = td
          val tx = resX(p); resX(p) = resX(i); resX(i) = tx
          i = p
        } else return
      }
    } else if (d < resD(0) || (d == resD(0) && x < resX(0))) {
      resD(0) = d; resX(0) = x
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var big = i
        if (l < resN && (resD(l) > resD(big) || (resD(l) == resD(big) && resX(l) > resX(big)))) big = l
        if (r < resN && (resD(r) > resD(big) || (resD(r) == resD(big) && resX(r) > resX(big)))) big = r
        if (big == i) return
        val td = resD(big); resD(big) = resD(i); resD(i) = td
        val tx = resX(big); resX(big) = resX(i); resX(i) = tx
        i = big
      }
    }
  }

  private def froPush(sc: Scratch, d: Double, x: Int): Unit = {
    import sc._
    if (froN == froD.length) {
      froD = java.util.Arrays.copyOf(froD, froN * 2)
      froX = java.util.Arrays.copyOf(froX, froN * 2)
    }
    var i = froN; froD(i) = d; froX(i) = x; froN += 1
    while (i > 0) {
      val p = (i - 1) >> 1
      if (froD(p) > froD(i)) {
        val td = froD(p); froD(p) = froD(i); froD(i) = td
        val tx = froX(p); froX(p) = froX(i); froX(i) = tx
        i = p
      } else return
    }
  }

  private def froPop(sc: Scratch): Unit = {
    import sc._
    froN -= 1
    froD(0) = froD(froN); froX(0) = froX(froN)
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var small = i
      if (l < froN && froD(l) < froD(small)) small = l
      if (r < froN && froD(r) < froD(small)) small = r
      if (small == i) return
      val td = froD(small); froD(small) = froD(i); froD(i) = td
      val tx = froX(small); froX(small) = froX(i); froX(i) = tx
      i = small
    }
  }

  /** Beam search at `level` from `start`. Fills sc.resD/resX (heap
    * order) with the <= ef best candidates. */
  private def beam(sc: Scratch, distTo: S => Double, start: Int, level: Int, ef: Int): Unit = {
    if (sc.resD.length < ef) { sc.resD = new Array[Double](ef); sc.resX = new Array[Int](ef) }
    sc.resN = 0; sc.froN = 0
    sc.visited.clear()
    val d0 = distTo(vecs(start))
    resPush(sc, d0, start, ef); froPush(sc, d0, start); sc.visited.set(start)
    while (sc.froN > 0) {
      val cd = sc.froD(0); val cn = sc.froX(0); froPop(sc)
      if (sc.resN >= ef && cd > sc.resD(0)) { sc.froN = 0 }
      else {
        val arr = nbrA(cn)(level)
        val used = nbrN(cn)(level)
        var i = 0
        while (i < used) {
          val nd = arr(i)
          if (!sc.visited.get(nd)) {
            sc.visited.set(nd)
            val d = distTo(vecs(nd))
            if (sc.resN < ef || d < sc.resD(0) || (d == sc.resD(0) && nd < sc.resX(0))) {
              resPush(sc, d, nd, ef); froPush(sc, d, nd)
            }
          }
          i += 1
        }
      }
    }
  }

  /** Current beam results sorted ascending by (dist, node). */
  private def beamSorted(sc: Scratch): (Array[Int], Array[Double], Int) = {
    val k = sc.resN
    val xs = java.util.Arrays.copyOf(sc.resX, k)
    val ds = java.util.Arrays.copyOf(sc.resD, k)
    // heap is small: insertion sort by (dist, id)
    var i = 1
    while (i < k) {
      val dv = ds(i); val xv = xs(i)
      var j = i - 1
      while (j >= 0 && (ds(j) > dv || (ds(j) == dv && xs(j) > xv))) {
        ds(j + 1) = ds(j); xs(j + 1) = xs(j); j -= 1
      }
      ds(j + 1) = dv; xs(j + 1) = xv
      i += 1
    }
    (xs, ds, k)
  }

  def add(id: Long, v: S): Unit = {
    if (n == cap) grow()
    val node = n
    val level = math.min((-math.log(math.max(rng.nextDouble(), 1e-12)) * mL).toInt, 24)
    vecs(node) = v; ids(node) = id; levels(node) = level
    nbrA(node) = Array.tabulate(level + 1)(l =>
      new Array[Int](if (l == 0) maxM0 + 9 else m + 9))
    nbrN(node) = new Array[Int](level + 1)
    n += 1
    if (entry < 0) { entry = node; maxLevel = level; return }
    val distTo: S => Double = s => sdist(v, s)
    var cur = entry
    var l = maxLevel
    while (l > level) { cur = greedy(distTo, cur, l); l -= 1 }
    val sc = scratch.get()
    while (l >= 0) {
      beam(sc, distTo, cur, l, efConstruction)
      val (bi, _, bn) = beamSorted(sc)
      val take = math.min(m, bn)
      val capL = if (l == 0) maxM0 else m
      var t = 0
      while (t < take) {
        val nb = bi(t)
        addLink(node, l, nb)
        addLink(nb, l, node)
        // amortized prune: allow a small overshoot before re-selecting
        if (nbrN(nb)(l) > capL + 8) pruneTo(nb, l, capL)
        t += 1
      }
      if (take > 0) cur = bi(0)
      l -= 1
    }
    if (level > maxLevel) { maxLevel = level; entry = node }
  }

  /** Top-k (id, dist) best-first under an arbitrary query-to-stored
    * distance; ef = max(efSearch, k). */
  def searchWith(distTo: S => Double, k: Int, efSearch: Int): Array[(Long, Double)] = {
    if (entry < 0) return Array.empty
    var cur = entry
    var l = maxLevel
    while (l > 0) { cur = greedy(distTo, cur, l); l -= 1 }
    val sc = scratch.get()
    beam(sc, distTo, cur, 0, math.max(efSearch, k))
    val (xs, ds, bn) = beamSorted(sc)
    val out = new Array[(Long, Double)](math.min(k, bn))
    var i = 0
    while (i < out.length) { out(i) = (ids(xs(i)), ds(i)); i += 1 }
    out
  }
}

/** Float32-storage HNSW (IndexHNSWFlat, faiss/IndexHNSW.h:152). */
final class LocalHnsw(m: Int = 16, efConstruction: Int = 64, seed: Long = 42L)
    extends LocalHnswCore[Array[Float]](m, efConstruction, seed) {

  protected def sdist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Top-k (id, dist) best-first; ef = max(efSearch, k). */
  def search(q: Array[Float], k: Int, efSearch: Int = 64): Array[(Long, Double)] =
    searchWith(s => sdist(q, s), k, efSearch)
}

/** SQ8-storage HNSW (IndexHNSWSQ, faiss/IndexHNSW.h:168, QT_8bit):
  * the graph stores 1-byte-per-dim codes and decodes inside the
  * distance — build distances are symmetric decode-decode, search is
  * the same asymmetric float-vs-code kernel as the flat SQ8 scan
  * ([[graft.core.SqKernels.adcL2sq]] arithmetic, term for term), so an
  * exhaustive-ef search reproduces [[graft.index.SqIndex.search]]
  * exactly. */
final class LocalHnswSq(vmin: Array[Double], vdiff: Array[Double],
    m: Int = 16, efConstruction: Int = 64, seed: Long = 42L)
    extends LocalHnswCore[Array[Byte]](m, efConstruction, seed) {

  protected def sdist(a: Array[Byte], b: Array[Byte]): Double = {
    val d = vmin.length
    var s = 0.0; var i = 0
    while (i < d) {
      // decoded difference: the vmin terms cancel
      val df = ((a(i) & 0xff) - (b(i) & 0xff)) / 255.0 * vdiff(i)
      s += df * df
      i += 1
    }
    s
  }

  /** Asymmetric top-k: float query vs decoded codes, identical
    * arithmetic to SqKernels.adcL2sq (same decode expression, same
    * accumulation order — bit-equal distances to the flat SQ8 scan). */
  def search(q: Array[Float], k: Int, efSearch: Int = 64): Array[(Long, Double)] =
    searchWith(code => {
      val d = vmin.length
      var s = 0.0; var i = 0
      while (i < d) {
        val dec = vmin(i) + ((code(i) & 0xff) + 0.5) / 255.0 * vdiff(i)
        val df = q(i).toDouble - dec
        s += df * df
        i += 1
      }
      s
    }, k, efSearch)
}

/** PQ-storage HNSW (IndexHNSWPQ, faiss/IndexHNSW.h:152): the graph
  * stores M-byte PQ codes. Build distances are symmetric
  * code-vs-code sums over per-subspace ksub×ksub tables (the
  * reference's sdc_table, impl/ProductQuantizer.cpp
  * compute_sdc_table — O(M) per pair after O(M·ksub²·dsub) setup);
  * search precomputes the per-query ADC LUT with EXACTLY
  * [[graft.core.PqKernels.lut]]'s arithmetic (float subtraction in
  * double, subspace-ascending accumulation), so an exhaustive-ef
  * search reproduces the flat [[graft.index.PqIndex.search]] ADC
  * ranking bit-for-bit. */
final class LocalHnswPq(codebooks: Array[Array[Array[Float]]],
    m: Int = 16, efConstruction: Int = 64, seed: Long = 42L)
    extends LocalHnswCore[Array[Byte]](m, efConstruction, seed) {

  private val nsub = codebooks.length
  private val ksub = codebooks(0).length
  // symmetric sub-distance tables: sdc(mi)(a*ksub + b) = ||cb_a - cb_b||²
  private val sdc: Array[Array[Double]] = Array.tabulate(nsub) { mi =>
    val t = new Array[Double](ksub * ksub)
    var a = 0
    while (a < ksub) {
      var b = a + 1
      while (b < ksub) {
        val ca = codebooks(mi)(a); val cb = codebooks(mi)(b)
        var s = 0.0; var i = 0
        while (i < ca.length) { val d = ca(i).toDouble - cb(i); s += d * d; i += 1 }
        t(a * ksub + b) = s; t(b * ksub + a) = s
        b += 1
      }
      a += 1
    }
    t
  }

  protected def sdist(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0; var mi = 0
    while (mi < nsub) { s += sdc(mi)((a(mi) & 0xff) * ksub + (b(mi) & 0xff)); mi += 1 }
    s
  }

  /** Asymmetric top-k via a per-query LUT — same arithmetic as
    * PqKernels.lut + adcFromLut, term for term. */
  def search(q: Array[Float], k: Int, efSearch: Int = 64): Array[(Long, Double)] = {
    val dsub = codebooks(0)(0).length
    val lut = new Array[Double](nsub * ksub)
    var mi = 0
    while (mi < nsub) {
      val base = mi * dsub
      var j = 0
      while (j < ksub) {
        val c = codebooks(mi)(j)
        var s = 0.0; var i = 0
        while (i < dsub) { val d = q(base + i).toDouble - c(i); s += d * d; i += 1 }
        lut(mi * ksub + j) = s
        j += 1
      }
      mi += 1
    }
    searchWith(code => {
      var s = 0.0; var t = 0
      while (t < nsub) { s += lut(t * ksub + (code(t) & 0xff)); t += 1 }
      s
    }, k, efSearch)
  }
}
