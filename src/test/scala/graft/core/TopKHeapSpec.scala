package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TopKHeapSpec extends AnyFunSuite {

  private def oracle(xs: Seq[(Double, Long)], k: Int, asc: Boolean): Seq[(Long, Double)] = {
    val sorted =
      if (asc) xs.sortBy { case (s, id) => (s, id) }
      else xs.sortBy { case (s, id) => (-s, id) }
    sorted.take(k).map { case (s, id) => (id, s) }
  }

  private def viaHeap(xs: Seq[(Double, Long)], k: Int, asc: Boolean): Seq[(Long, Double)] = {
    val h = new TopKHeap(k, asc)
    xs.foreach { case (s, id) => h.insert(s, id) }
    val (ids, scores) = h.sorted()
    ids.zip(scores).toSeq
  }

  test("heap matches sort-based oracle (randomized, both directions)") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(20)
      val asc = rnd.nextBoolean()
      // small score/id ranges to force ties
      val xs = Seq.fill(n)((rnd.nextInt(10).toDouble, rnd.nextInt(30).toLong))
      assert(viaHeap(xs, k, asc) == oracle(xs, k, asc), s"n=$n k=$k asc=$asc")
    }
  }

  test("merge of split streams equals single stream (faiss heap merge)") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(8)
      val xs = Seq.fill(rnd.nextInt(40))((rnd.nextDouble(), rnd.nextInt(1000).toLong))
      val ys = Seq.fill(rnd.nextInt(40))((rnd.nextDouble(), rnd.nextInt(1000).toLong))
      val h1 = new TopKHeap(k, true); xs.foreach { case (s, i) => h1.insert(s, i) }
      val h2 = new TopKHeap(k, true); ys.foreach { case (s, i) => h2.insert(s, i) }
      h1.merge(h2)
      val (ids, scores) = h1.sorted()
      assert(ids.zip(scores).toSeq == oracle(xs ++ ys, k, asc = true))
    }
  }

  test("ties break on ascending id") {
    val xs = Seq((1.0, 5L), (1.0, 2L), (1.0, 9L), (0.5, 7L))
    assert(viaHeap(xs, 3, asc = true) == Seq((7L, 0.5), (2L, 1.0), (5L, 1.0)))
  }

  test("serialization round-trip preserves contents") {
    val agg = TopKAgg(null, null, 5, asc = true)
    val h = new TopKHeap(5, asc = true)
    Seq((3.0, 1L), (1.0, 2L), (2.0, 3L), (0.5, 4L), (9.0, 5L), (0.1, 6L))
      .foreach { case (s, i) => h.insert(s, i) }
    val h2 = agg.deserialize(agg.serialize(h))
    assert(h2.sorted()._1.toSeq == h.sorted()._1.toSeq)
  }
}
