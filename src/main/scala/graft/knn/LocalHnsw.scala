package graft.knn

import scala.collection.mutable

/** In-memory single-JVM HNSW graph — the per-partition building block
  * of [[PartitionedHnsw]] (the IndexShards pattern,
  * faiss/IndexShards.h:20: independent sub-indexes whose results are
  * heap-merged). Algorithm re-derived from the HNSW paper semantics as
  * implemented by the reference's HNSWfast variant
  * (faiss/IndexHNSWfast.h:63, faiss/impl/HNSWfast.cpp:368 add/search):
  * geometric level assignment, greedy descent through upper levels,
  * beam (ef) search at level 0, bidirectional links pruned to the M
  * best. Written from scratch for the JVM: flat int adjacency arrays,
  * no locks (a partition builds single-threaded).
  *
  * Deterministic given (seed, insertion order): level draws come from a
  * seeded RNG and all ties break on the lower node id.
  */
final class LocalHnsw(m: Int = 16, efConstruction: Int = 64, seed: Long = 42L) {

  private val rng = new java.util.Random(seed)
  private val mL = 1.0 / math.log(m.toDouble)
  private val maxM0 = 2 * m

  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val ids = mutable.ArrayBuffer.empty[Long]
  private val levels = mutable.ArrayBuffer.empty[Int]
  /** neighbors(node)(level) = growable int list. */
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var maxLevel = -1

  def size: Int = vecs.length

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Greedy single-step descent at `level` from `start`. */
  private def greedy(q: Array[Float], start: Int, level: Int): Int = {
    var cur = start
    var curD = dist(q, vecs(cur))
    var improved = true
    while (improved) {
      improved = false
      val ns = neighbors(cur)(level)
      var i = 0
      while (i < ns.length) {
        val n = ns(i)
        val d = dist(q, vecs(n))
        if (d < curD || (d == curD && n < cur)) { cur = n; curD = d; improved = true }
        i += 1
      }
    }
    cur
  }

  /** Beam search at `level`: the ef best candidates found from
    * `start`, as a max-heap-ordered array of (dist, node). */
  private def beam(q: Array[Float], start: Int, level: Int, ef: Int): mutable.PriorityQueue[(Double, Int)] = {
    // results: max-heap by dist (worst on top); frontier: min-heap
    val results = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), (Double, Int)](t => (t._1, -t._2)))
    val frontier = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), (Double, Int)](t => (-t._1, t._2)))
    val visited = mutable.HashSet.empty[Int]
    val d0 = dist(q, vecs(start))
    results.enqueue((d0, start)); frontier.enqueue((d0, start)); visited += start
    while (frontier.nonEmpty) {
      val (cd, cn) = frontier.dequeue()
      if (results.size >= ef && cd > results.head._1) {
        frontier.clear()
      } else {
        val ns = neighbors(cn)(level)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          if (!visited.contains(n)) {
            visited += n
            val d = dist(q, vecs(n))
            if (results.size < ef || d < results.head._1) {
              results.enqueue((d, n)); frontier.enqueue((d, n))
              if (results.size > ef) results.dequeue()
            }
          }
          i += 1
        }
      }
    }
    results
  }

  def add(id: Long, v: Array[Float]): Unit = {
    val node = vecs.length
    val level = math.min((-math.log(math.max(rng.nextDouble(), 1e-12)) * mL).toInt, 24)
    vecs += v; ids += id; levels += level
    neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = node; maxLevel = level; return }
    var cur = entry
    var l = maxLevel
    while (l > level) { cur = greedy(v, cur, l); l -= 1 }
    while (l >= 0) {
      val cands = beam(v, cur, l, efConstruction).dequeueAll.reverse // best-first
      val cap = if (l == 0) maxM0 else m
      val selected = cands.take(m)
      selected.foreach { case (_, n) =>
        neighbors(node)(l) += n
        val back = neighbors(n)(l)
        back += node
        if (back.length > cap) {
          // prune: keep the `cap` closest to n (ties on lower id)
          val kept = back.map(x => (dist(vecs(n), vecs(x)), x))
            .sortBy(t => (t._1, t._2)).take(cap).map(_._2)
          back.clear(); back ++= kept
        }
      }
      if (selected.nonEmpty) cur = selected.head._2
      l -= 1
    }
    if (level > maxLevel) { maxLevel = level; entry = node }
  }

  /** Top-k (id, dist) best-first; ef = max(efSearch, k). */
  def search(q: Array[Float], k: Int, efSearch: Int = 64): Array[(Long, Double)] = {
    if (entry < 0) return Array.empty
    var cur = entry
    var l = maxLevel
    while (l > 0) { cur = greedy(q, cur, l); l -= 1 }
    val res = beam(q, cur, 0, math.max(efSearch, k)).dequeueAll.reverse
    res.take(k).map { case (d, n) => (ids(n), d) }.toArray
  }
}
