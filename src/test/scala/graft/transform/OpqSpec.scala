package graft.transform

import graft.SparkTestBase
import graft.cluster.TwoLevelClustering
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{PQDecode, PQEncode}

class OpqSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private def pqError(rot: Linear, pq: graft.index.PqModel): Double = {
    val rotated = rot.applyCol(col("embedding"))
    val dec = shim.col(PQDecode(PQEncode(shim.expr(rotated), pq.codebooks), pq.codebooks))
    emb.select(avg(graft.functions.l2sq(rotated, dec)).as("e"))
      .collect().head.getDouble(0)
  }

  test("OPQ rotation stays orthonormal and beats identity-rotation PQ error") {
    val (rot, pq) = Opq.trainOpq(emb, "embedding", m = 8, ksub = 16,
      outerIters = 2, pqIters = 3)
    // orthonormality
    val a = rot.a
    for (i <- 0 until 8; j <- 0 until 8) { // spot check top-left block
      val dot = a(i).indices.map(k => a(i)(k).toDouble * a(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-3)
    }
    val opqErr = pqError(rot, pq)
    val plainPq = graft.index.Pq.train(
      emb.select(col("embedding").as("v")), "v", 8, 16, 3)
    val idRot = Linear(Array.tabulate(64, 64)((i, j) => if (i == j) 1f else 0f))
    val plainErr = pqError(idRot, plainPq)
    assert(opqErr <= plainErr * 1.10, s"opq $opqErr vs plain $plainErr")
  }

  test("ITQ rotation produces balanced-ish sign bits") {
    val itq = Opq.trainItq(emb, "embedding", nbits = 8, iters = 3)
    val bits = emb.select(graft.functions.sign_bits(
      itq.applyCol(col("embedding"))).as("c"))
    val firstByteOnes = bits.collect().map { r =>
      java.lang.Integer.bitCount(r.getAs[Array[Byte]](0)(0) & 0xff)
    }
    val meanOnes = firstByteOnes.sum.toDouble / firstByteOnes.length
    assert(meanOnes > 2.0 && meanOnes < 6.0, s"mean ones/byte $meanOnes")
  }

  test("two-level clustering covers all points with nlist centroids") {
    val cents = TwoLevelClustering.fit(emb, "embedding", nlist = 12,
      niter1 = 3, niter2 = 3)
    assert(cents.length == 12)
    assert(cents.forall(_.length == 64))
    // all centroids distinct
    assert(cents.map(_.toSeq).distinct.length == 12)
  }
}
