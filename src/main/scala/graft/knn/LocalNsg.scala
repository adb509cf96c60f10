package graft.knn

/** In-memory single-JVM NSG graph (Fu et al., "Fast Approximate
  * Nearest Neighbor Search With The Navigating Spreading-out Graph",
  * VLDB'19) — the per-partition building block of [[PartitionedNsg]],
  * covering the reference's IndexNSG (faiss/IndexNSG.h:26) and, in
  * `prune = false` mode, IndexNNDescent's search-the-raw-kNN-graph
  * semantics (faiss/IndexNNDescent.h:23) under the same IndexShards
  * re-expression as [[LocalHnsw]].
  *
  * Generic in the STORED vector representation `S` (the reference's
  * storage/graph split, faiss/IndexNSG.h:30 `storage` field):
  * [[LocalNsg]] stores float32 (IndexNSGFlat), [[LocalNsgSq]] stores
  * 1-byte-per-dim SQ8 codes decoded inside the distance (IndexNSGSQ,
  * faiss/IndexNSG.h:91) — same split as [[LocalHnswCore]].
  *
  * Algorithm re-derived from faiss/impl/NSG.cpp:
  *  - init kNN graph (faiss/IndexNSG.cpp build_type 0/1: brute force
  *    or NNDescent): brute force for small partitions, otherwise a
  *    [[LocalHnswCore]] bootstrap — the reference only needs an
  *    APPROXIMATE kNN graph here (NNDescent's output is approximate
  *    too), and the HNSW bootstrap is the already-tested local
  *    machinery with the same contract.
  *  - navigating point = node nearest the centroid (NSG.cpp:240
  *    init_graph; the reference approximates the argmin by a graph
  *    search from a random node — we compute it exactly, one O(n·d)
  *    scan, deterministic).
  *  - per-node candidate pool via search_on_graph collecting the
  *    visited set (NSG.cpp:277-358), then MRNG edge selection
  *    sync_prune (NSG.cpp:406-460): keep candidate p unless some
  *    already-kept t has d(t,p) < d(q,p); degree capped at R,
  *    candidate scan capped at C.
  *  - add_reverse_links (NSG.cpp:462-540): each kept edge q→p is
  *    offered back to p, re-pruned by the same rule when p is full.
  *  - tree_grow / dfs / attach_unlinked (NSG.cpp:542-663): DFS from
  *    the enterpoint; every unreached node is attached to its nearest
  *    reached node with spare degree, so the final graph is CONNECTED
  *    — which makes searchL >= n provably exact (the degenerate gate
  *    [[graft.Queries]] uses).
  *  - search = search_on_graph over the final graph (NSG.cpp:149-168):
  *    fixed-size sorted candidate pool, expand-best-unexpanded until
  *    no pool entry is unexpanded; pool seeded from the enterpoint's
  *    neighbors plus deterministic pseudo-random fill (the reference
  *    seeds a fixed RandomGenerator(0x1234) per search — same here).
  *
  * Deterministic given (ids, vecs, parameters): all ties break on
  * (dist, node index) and the only RNG is fixed-seeded per search.
  * Single-threaded by design — a Spark partition IS the parallel unit.
  *
  * The graph is built lazily on first search (abstract distance
  * methods may close over subclass state, which is not yet initialized
  * while the superclass constructor runs).
  */
abstract class LocalNsgCore[S <: AnyRef](
    ids: Array[Long], vecs: Array[S],
    gk: Int, r: Int, buildL: Int, c: Int,
    prune: Boolean, seed: Long) {

  /** Stored-vs-stored distance (graph construction). */
  protected def sdist(a: S, b: S): Double
  /** Float-query-vs-stored distance (search; for quantized storage
    * this is the SAME asymmetric kernel as the flat scan, term for
    * term, so exhaustive searchL reproduces the flat ranking). */
  protected def qdist(q: Array[Float], s: S): Double
  /** Decode to float32 — used once, for the navigating-point centroid. */
  protected def decode(s: S): Array[Float]
  /** Bootstrap graph for the approximate init-kNN phase (large n). */
  protected def newBootstrap(seed: Long): LocalHnswCore[S]

  private val n = vecs.length
  require(n > 0, "empty partition")

  def size: Int = n

  // ---- 1. initial kNN graph (degree <= gk, self excluded) -------------
  private lazy val knnG: Array[Array[Int]] = {
    val k = math.min(gk, n - 1)
    if (k <= 0) Array.fill(n)(Array.emptyIntArray)
    else if (n <= 2048) {
      // brute force (IndexNSG.cpp build_type 0)
      Array.tabulate(n) { i =>
        val ds = new Array[Double](n)
        var j = 0
        while (j < n) { ds(j) = if (j == i) Double.MaxValue else sdist(vecs(i), vecs(j)); j += 1 }
        val idx = Array.range(0, n)
        // partial selection: k smallest by (dist, idx)
        val out = new Array[Int](k)
        var t = 0
        while (t < k) {
          var best = -1; var bd = Double.MaxValue
          var m = 0
          while (m < n) {
            val jj = idx(m)
            if (jj >= 0 && (ds(jj) < bd || (ds(jj) == bd && (best < 0 || jj < best)))) { bd = ds(jj); best = jj }
            m += 1
          }
          out(t) = best; idx(best) = -1; t += 1
        }
        out
      }
    } else {
      // HNSW bootstrap (stands in for IndexNSG.cpp build_type 1
      // NNDescent: any high-recall approximate kNN graph works)
      val h = newBootstrap(seed)
      var i = 0
      while (i < n) { h.add(i.toLong, vecs(i)); i += 1 }
      Array.tabulate(n) { q =>
        h.searchWith(s => sdist(vecs(q), s), k + 1, efSearch = math.max(64, k + 16))
          .iterator.map(_._1.toInt).filter(_ != q).take(k).toArray
      }
    }
  }

  // ---- 2. navigating point (exact medoid vs centroid) -----------------
  private lazy val enterpoint: Int = {
    val d = decode(vecs(0)).length
    val center = new Array[Float](d)
    var i = 0
    while (i < n) {
      val v = decode(vecs(i)); var j = 0
      while (j < d) { center(j) += v(j); j += 1 }
      i += 1
    }
    var j = 0
    while (j < d) { center(j) /= n; j += 1 }
    var best = 0; var bd = Double.MaxValue
    i = 0
    while (i < n) {
      val dd = qdist(center, vecs(i))
      if (dd < bd) { bd = dd; best = i }
      i += 1
    }
    best
  }

  // ---- search_on_graph scratch (per THREAD) ---------------------------
  // One graph instance serves CONCURRENT searches when it backs a
  // coarse quantizer shared across executor threads
  // (graft.core.CentroidNsgCache) — per-instance scratch would let
  // parallel tasks corrupt each other's pools (the round-11 LocalHnsw
  // finding; same shape here). Builds run single-threaded under the
  // cache lock / inside one task.
  private final class Scratch {
    val visited = new java.util.BitSet()
    // sorted candidate pool: ascending (dist, node); flag = not expanded
    var poolD = new Array[Double](0)
    var poolX = new Array[Int](0)
    var poolF = new Array[Boolean](0)
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Insert (d,x,unexpanded) into the sorted pool of current size
    * `size` capped at `cap`; returns the insert position (or cap if
    * dropped). Classic NSG insert_into_pool. */
  private def poolInsert(sc: Scratch, size: Int, cap: Int, d: Double, x: Int): Int = {
    import sc._
    if (size == cap && (d > poolD(cap - 1) || (d == poolD(cap - 1) && x >= poolX(cap - 1)))) return cap
    // binary search for first position with (dist, id) > (d, x)
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (poolD(mid) < d || (poolD(mid) == d && poolX(mid) < x)) lo = mid + 1 else hi = mid
    }
    val pos = lo
    val last = math.min(size, cap - 1)
    var i = last
    while (i > pos) { poolD(i) = poolD(i - 1); poolX(i) = poolX(i - 1); poolF(i) = poolF(i - 1); i -= 1 }
    poolD(pos) = d; poolX(pos) = x; poolF(pos) = true
    pos
  }

  /** Best-first search over `graph` from `ep` with pool size `poolSize`.
    * Returns the pool size used; pool arrays hold ascending results.
    * When `collect` is non-null, every visited (node, dist) is appended
    * (the sync_prune candidate set, NSG.cpp:360-388). `distTo` is the
    * distance from the (implicit) query to a stored vector. */
  private def searchOnGraph(sc: Scratch, graph: Array[Array[Int]], distTo: S => Double,
      ep: Int, poolSize: Int, collect: java.util.ArrayList[(Int, Double)]): Int = {
    import sc._
    val ps = math.min(poolSize, n)
    if (poolD.length < ps + 1) {
      sc.poolD = new Array[Double](ps + 1); sc.poolX = new Array[Int](ps + 1); sc.poolF = new Array[Boolean](ps + 1)
    }
    visited.clear()
    // init ids: enterpoint's neighbors, then deterministic random fill
    val init = new Array[Int](ps)
    var num = 0
    val epN = graph(ep)
    var i = 0
    while (i < epN.length && num < ps) {
      val id = epN(i)
      if (!visited.get(id)) { visited.set(id); init(num) = id; num += 1 }
      i += 1
    }
    val rng = new java.util.Random(0x1234)  // NSG.cpp:284 fixed seed
    var guard = 0
    while (num < ps && guard < 16 * ps) {
      val id = rng.nextInt(n)
      if (!visited.get(id)) { visited.set(id); init(num) = id; num += 1 }
      guard += 1
    }
    // fallback fill (rng may stall when ps ~ n): linear scan
    if (num < ps) {
      var id = 0
      while (num < ps && id < n) {
        if (!visited.get(id)) { visited.set(id); init(num) = id; num += 1 }
        id += 1
      }
    }
    var size = 0
    i = 0
    while (i < num) {
      val id = init(i)
      val d = distTo(vecs(id))
      poolInsert(sc, size, ps, d, id)
      size = math.min(size + 1, ps)
      if (collect ne null) collect.add((id, d))
      i += 1
    }
    // expand best unexpanded until none left below the pool horizon
    var k = 0
    while (k < size) {
      if (poolF(k)) {
        poolF(k) = false
        val node = poolX(k)
        var updated = size
        val nbrs = graph(node)
        var t = 0
        while (t < nbrs.length) {
          val id = nbrs(t)
          if (id >= 0 && !visited.get(id)) {
            visited.set(id)
            val d = distTo(vecs(id))
            if (collect ne null) collect.add((id, d))
            val pos = poolInsert(sc, size, ps, d, id)
            if (pos < size || size < ps) {
              size = math.min(size + 1, ps)
              if (pos < updated) updated = pos
            }
          }
          t += 1
        }
        k = if (updated < k) updated else k + 1
      } else k += 1
    }
    size
  }

  // ---- 3..5. NSG link + reverse links + tree_grow ---------------------
  /** final graph: flat n×cap adjacency (-1 = empty) + degrees. In
    * `prune = false` mode this is just the kNN graph (IndexNNDescent:
    * the search structure IS the raw graph). */
  private val capR = if (prune) r else math.max(1, math.min(gk, math.max(1, n - 1)))
  private val finalA = Array.fill(n * capR)(-1)
  private val degrees = new Array[Int](n)

  private def mrngSelect(q: Int, pool: java.util.ArrayList[(Int, Double)],
      out: Array[Int], outD: Array[Double]): Int = {
    // sort ascending (dist, id); drop self and duplicates
    val arr = pool.toArray(new Array[(Int, Double)](pool.size()))
    java.util.Arrays.sort(arr, new java.util.Comparator[(Int, Double)] {
      def compare(a: (Int, Double), b: (Int, Double)): Int = {
        val c = java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else Integer.compare(a._1, b._1)
      }
    })
    var cnt = 0
    var start = 0
    var scanned = 0
    while (cnt < r && start < arr.length && scanned < c) {
      val (p, dqp) = arr(start)
      start += 1; scanned += 1
      if (p != q) {
        var occlude = false
        var t = 0
        while (!occlude && t < cnt) {
          if (out(t) == p) occlude = true
          else if (sdist(vecs(out(t)), vecs(p)) < dqp) occlude = true  // MRNG rule, NSG.cpp:441
          t += 1
        }
        if (!occlude) { out(cnt) = p; outD(cnt) = dqp; cnt += 1 }
      }
    }
    cnt
  }

  /** Lazily-forced build (see class doc: subclass distance state). */
  private lazy val built: Unit = {
    if (prune && n > 1) {
      val outBuf = new Array[Int](r)
      val outD = new Array[Double](r)
      var q = 0
      while (q < n) {
        val pool = new java.util.ArrayList[(Int, Double)](buildL * 4)
        searchOnGraph(scratch.get(), knnG, s => sdist(vecs(q), s), enterpoint, buildL, pool)
        // also offer q's own kNN neighbors (NSG.cpp:413-421)
        val kn = knnG(q)
        var i = 0
        while (i < kn.length) { pool.add((kn(i), sdist(vecs(q), vecs(kn(i))))); i += 1 }
        val cnt = mrngSelect(q, pool, outBuf, outD)
        i = 0
        while (i < cnt) { finalA(q * capR + i) = outBuf(i); i += 1 }
        degrees(q) = cnt
        q += 1
      }
      // add_reverse_links (NSG.cpp:462)
      q = 0
      while (q < n) {
        var i = 0
        while (i < degrees(q)) {
          val des = finalA(q * capR + i)
          var dup = false
          var j = 0
          while (!dup && j < degrees(des)) { if (finalA(des * capR + j) == q) dup = true; j += 1 }
          if (!dup) {
            if (degrees(des) < r) {
              finalA(des * capR + degrees(des)) = q
              degrees(des) += 1
            } else {
              // full: re-prune des's R+1 candidates by the same rule
              val pool = new java.util.ArrayList[(Int, Double)](r + 1)
              var t = 0
              while (t < degrees(des)) {
                val nb = finalA(des * capR + t)
                pool.add((nb, sdist(vecs(des), vecs(nb)))); t += 1
              }
              pool.add((q, sdist(vecs(des), vecs(q))))
              val cnt = mrngSelect(des, pool, outBuf, outD)
              t = 0
              while (t < cnt) { finalA(des * capR + t) = outBuf(t); t += 1 }
              t = cnt
              while (t < r) { finalA(des * capR + t) = -1; t += 1 }
              degrees(des) = cnt
            }
          }
          i += 1
        }
        q += 1
      }
      // tree_grow (NSG.cpp:542): connect every node to the enterpoint tree
      val reached = new java.util.BitSet(n)
      def dfs(root: Int): Unit = {
        val stack = new java.util.ArrayDeque[Integer]()
        stack.push(root); reached.set(root)
        while (!stack.isEmpty) {
          val node = stack.peek().intValue()
          var next = -1
          var i2 = 0
          while (next < 0 && i2 < degrees(node)) {
            val id = finalA(node * capR + i2)
            if (id >= 0 && !reached.get(id)) next = id
            i2 += 1
          }
          if (next < 0) stack.pop()
          else { reached.set(next); stack.push(next) }
        }
      }
      dfs(enterpoint)
      var unreachedFrom = 0
      var continueGrow = reached.cardinality() < n
      while (continueGrow) {
        // first unreached node (attach_unlinked, NSG.cpp:600)
        var id = -1
        var i2 = unreachedFrom
        while (id < 0 && i2 < n) { if (!reached.get(i2)) id = i2; i2 += 1 }
        if (id < 0) continueGrow = false
        else {
          unreachedFrom = id
          // nearest REACHED node with spare degree, via graph search on
          // the final graph (searchL pool), else linear fallback
          val pool = new java.util.ArrayList[(Int, Double)](buildL * 4)
          searchOnGraph(scratch.get(), snapshotView(), s => sdist(vecs(id), s), enterpoint, buildL, pool)
          val arr = pool.toArray(new Array[(Int, Double)](pool.size()))
          java.util.Arrays.sort(arr, new java.util.Comparator[(Int, Double)] {
            def compare(a: (Int, Double), b: (Int, Double)): Int = {
              val cc = java.lang.Double.compare(a._2, b._2)
              if (cc != 0) cc else Integer.compare(a._1, b._1)
            }
          })
          var node = -1
          var t = 0
          while (node < 0 && t < arr.length) {
            val cand = arr(t)._1
            if (cand != id && reached.get(cand) && degrees(cand) < capR) node = cand
            t += 1
          }
          if (node < 0) {
            // fallback: any reached node with spare degree; else steal the
            // enterpoint's last slot (degree invariant beats optimality)
            var t2 = 0
            while (node < 0 && t2 < n) {
              if (t2 != id && reached.get(t2) && degrees(t2) < capR) node = t2
              t2 += 1
            }
            if (node < 0) { node = enterpoint; degrees(node) = capR - 1 }
          }
          finalA(node * capR + degrees(node)) = id
          degrees(node) += 1
          dfs(node)
          continueGrow = reached.cardinality() < n
        }
      }
    } else if (!prune) {
      var q = 0
      while (q < n) {
        val kn = knnG(q)
        var i = 0
        while (i < kn.length && i < capR) { finalA(q * capR + i) = kn(i); i += 1 }
        degrees(q) = math.min(kn.length, capR)
        q += 1
      }
    }
  }

  /** Fresh adjacency view of the (possibly still-growing) final graph. */
  private def snapshotView(): Array[Array[Int]] =
    Array.tabulate(n)(i => java.util.Arrays.copyOfRange(finalA, i * capR, i * capR + degrees(i)))

  /** Adjacency view of the final graph for search (built once, after
    * `built` has finished mutating finalA/degrees — tree_grow uses
    * snapshotView() precisely so this stays unforced until the graph
    * is final). */
  private lazy val finalGraphView: Array[Array[Int]] = { built; snapshotView() }

  /** Top-k (id, dist) by NSG graph search; pool = max(searchL, k).
    * searchL >= n degenerates to exact (connected graph, full pool). */
  def search(q: Array[Float], k: Int, searchL: Int = 64): Array[(Long, Double)] =
    searchDist(s => qdist(q, s), k, searchL)

  /** Top-k under an arbitrary query-to-stored distance (subclasses
    * override `search` through this to plug per-query LUTs). */
  protected final def searchDist(distTo: S => Double, k: Int,
      searchL: Int): Array[(Long, Double)] = {
    val sc = scratch.get()
    val sz = searchOnGraph(sc, finalGraphView, distTo, enterpoint, math.max(searchL, k), null)
    val out = new Array[(Long, Double)](math.min(k, sz))
    var i = 0
    while (i < out.length) { out(i) = (ids(sc.poolX(i)), sc.poolD(i)); i += 1 }
    out
  }

  /** Max out-degree (spec support: must be <= R in pruned mode). */
  def maxDegree: Int = {
    built
    var m = 0; var i = 0
    while (i < n) { if (degrees(i) > m) m = degrees(i); i += 1 }
    m
  }
}

/** Float32-storage NSG (IndexNSGFlat, faiss/IndexNSG.h:83). */
final class LocalNsg(
    ids: Array[Long], vecs: Array[Array[Float]],
    gk: Int = 32, r: Int = 32, buildL: Int = 64, c: Int = 100,
    prune: Boolean = true, seed: Long = 42L)
    extends LocalNsgCore[Array[Float]](ids, vecs, gk, r, buildL, c, prune, seed) {

  protected def sdist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }
  protected def qdist(q: Array[Float], s: Array[Float]): Double = sdist(q, s)
  protected def decode(s: Array[Float]): Array[Float] = s
  protected def newBootstrap(sd: Long): LocalHnswCore[Array[Float]] =
    new LocalHnsw(m = 16, efConstruction = 64, seed = sd)
}

/** SQ8-storage NSG (IndexNSGSQ, faiss/IndexNSG.h:91, QT_8bit): the
  * graph stores 1-byte-per-dim codes and decodes inside the distance —
  * build distances are symmetric decode-decode (the vmin terms
  * cancel), search is the same asymmetric float-vs-code kernel as the
  * flat SQ8 scan ([[graft.core.SqKernels.adcL2sq]] arithmetic, term
  * for term), so an exhaustive-searchL search reproduces
  * [[graft.index.SqIndex.search]] exactly — the same contract as
  * [[LocalHnswSq]]. */
final class LocalNsgSq(vmin: Array[Double], vdiff: Array[Double],
    ids: Array[Long], codes: Array[Array[Byte]],
    gk: Int = 32, r: Int = 32, buildL: Int = 64, c: Int = 100,
    prune: Boolean = true, seed: Long = 42L)
    extends LocalNsgCore[Array[Byte]](ids, codes, gk, r, buildL, c, prune, seed) {

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
  protected def qdist(q: Array[Float], code: Array[Byte]): Double = {
    val d = vmin.length
    var s = 0.0; var i = 0
    while (i < d) {
      val dec = vmin(i) + ((code(i) & 0xff) + 0.5) / 255.0 * vdiff(i)
      val df = q(i).toDouble - dec
      s += df * df
      i += 1
    }
    s
  }
  protected def decode(code: Array[Byte]): Array[Float] = {
    val d = vmin.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      out(i) = (vmin(i) + ((code(i) & 0xff) + 0.5) / 255.0 * vdiff(i)).toFloat
      i += 1
    }
    out
  }
  protected def newBootstrap(sd: Long): LocalHnswCore[Array[Byte]] =
    new LocalHnswSq(vmin, vdiff, m = 16, efConstruction = 64, seed = sd)
}

/** PQ-storage NSG (IndexNSGPQ, faiss/IndexNSG.h:83): the graph stores
  * M-byte PQ codes. Build distances are symmetric sums over
  * per-subspace sdc tables; search precomputes the per-query ADC LUT
  * with exactly [[graft.core.PqKernels.lut]]'s arithmetic, so an
  * exhaustive-searchL search over the connected graph reproduces the
  * flat [[graft.index.PqIndex.search]] ADC ranking — the same
  * contract as [[LocalHnswPq]]. */
final class LocalNsgPq(codebooks: Array[Array[Array[Float]]],
    ids: Array[Long], codes: Array[Array[Byte]],
    gk: Int = 32, r: Int = 32, buildL: Int = 64, c: Int = 100,
    prune: Boolean = true, seed: Long = 42L)
    extends LocalNsgCore[Array[Byte]](ids, codes, gk, r, buildL, c, prune, seed) {

  private val nsub = codebooks.length
  private val ksub = codebooks(0).length
  private val dsub = codebooks(0)(0).length
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
  protected def qdist(q: Array[Float], code: Array[Byte]): Double = {
    // per-call exact ADC (used only for the one-time centroid argmin;
    // bulk search goes through the LUT overload below)
    var s = 0.0; var mi = 0
    while (mi < nsub) {
      val cb = codebooks(mi)(code(mi) & 0xff)
      var i = 0
      while (i < dsub) { val d = q(mi * dsub + i).toDouble - cb(i); s += d * d; i += 1 }
      mi += 1
    }
    s
  }
  protected def decode(code: Array[Byte]): Array[Float] = {
    val out = new Array[Float](nsub * dsub)
    var mi = 0
    while (mi < nsub) {
      System.arraycopy(codebooks(mi)(code(mi) & 0xff), 0, out, mi * dsub, dsub)
      mi += 1
    }
    out
  }
  protected def newBootstrap(sd: Long): LocalHnswCore[Array[Byte]] =
    new LocalHnswPq(codebooks, m = 16, efConstruction = 64, seed = sd)

  /** LUT-based top-k: PqKernels.lut + adcFromLut arithmetic term for
    * term (overrides the generic per-call qdist search path). */
  override def search(q: Array[Float], k: Int, searchL: Int = 64): Array[(Long, Double)] = {
    val lut = new Array[Double](nsub * ksub)
    var mi = 0
    while (mi < nsub) {
      val base = mi * dsub
      var j = 0
      while (j < ksub) {
        val cb = codebooks(mi)(j)
        var s = 0.0; var i = 0
        while (i < dsub) { val d = q(base + i).toDouble - cb(i); s += d * d; i += 1 }
        lut(mi * ksub + j) = s
        j += 1
      }
      mi += 1
    }
    searchDist(code => {
      var s = 0.0; var t = 0
      while (t < nsub) { s += lut(t * ksub + (code(t) & 0xff)); t += 1 }
      s
    }, k, searchL)
  }
}
