package graft.transform

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{OuterSumAgg, PQDecode, PQEncode}
import graft.index.{Pq, PqModel}

/** Learned-rotation transforms: OPQ (OPQMatrix,
  * faiss/VectorTransform.h:234) and ITQ (ITQMatrix/ITQTransform,
  * VectorTransform.h:190-204).
  *
  * Both alternate a distributed encode step with a driver-side
  * orthogonal-Procrustes update: R = U·Vᵀ from SVD(Σ target·xᵀ). The
  * d×d cross-covariance is collected with ONE OuterSumAgg pass over
  * concat(x, target) (the cross block of the (2d)² moment matrix), so
  * each outer iteration is a single shuffle-free aggregate regardless
  * of data size.
  */
object Opq {

  /** Procrustes solve: argmin_{R orthogonal} ||R x - t||² given
    * C = Σ t xᵀ → R = U Vᵀ with svd(C) = U Σ Vᵀ. */
  private def procrustes(c: DenseMatrix[Double]): Array[Array[Float]] = {
    val s = svd(c)
    val r = s.U * s.Vt
    Array.tabulate(r.rows)(i => Array.tabulate(r.cols)(j => r(i, j).toFloat))
  }

  /** Extract the lower-left d2×d1 cross block Σ b·aᵀ from the moment
    * matrix of concat(a, b). */
  private def crossBlock(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column, d1: Int, d2: Int): DenseMatrix[Double] = {
    val z = concat(aCol.cast("array<float>"), bCol.cast("array<float>"))
    val r = df.agg(shim.agg(OuterSumAgg(shim.expr(z))).as("s"))
      .select(col("s.outer")).collect().head.getSeq[Double](0)
    val dd = d1 + d2
    DenseMatrix.tabulate(d2, d1)((i, j) => r((d1 + i) * dd + j))
  }

  /** OPQ training (OPQMatrix::train spirit): random-rotation init,
    * then alternate [PQ train on rotated data → decode → Procrustes].
    * Returns the rotation and the final codebooks (trained on the
    * rotated space). */
  def trainOpq(df: DataFrame, vecCol: String, m: Int, ksub: Int,
      outerIters: Int = 3, pqIters: Int = 3, seed: Long = 1234L): (Linear, PqModel) = {
    val d = df.select(size(col(vecCol))).first().getInt(0)
    var rot = Transforms.randomRotation(d, seed)
    var pq: PqModel = null
    for (it <- 0 until outerIters) {
      val rotCol = rot.applyCol(col(vecCol))
      val rotated = df.select(rotCol.as("vr")).cache()
      pq = Pq.train(rotated, "vr", m, ksub, pqIters, seed + it)
      rotated.unpersist()
      // dec = decode(encode(R x)) lives in the rotated space; solve
      // R' minimizing ||R' x - dec||² (Procrustes toward the codes)
      val decCol = shim.col(PQDecode(
        PQEncode(shim.expr(rotCol), pq.codebooks), pq.codebooks))
      val c = crossBlock(df, col(vecCol), decCol, d, d)
      rot = Linear(procrustes(c))
    }
    (rot, pq)
  }

  /** ITQ binary-code rotation (ITQMatrix::train): PCA to nbits dims,
    * then alternate [B = sign(Rx) → Procrustes toward B]. Returns the
    * composed Linear (rotation ∘ PCA). */
  def trainItq(df: DataFrame, vecCol: String, nbits: Int,
      iters: Int = 5, seed: Long = 1234L): Linear = {
    val pca = Transforms.pca(df, vecCol, nbits)
    val projected = df.select(pca.applyCol(col(vecCol)).as("xp")).cache()
    var rot = Transforms.randomRotation(nbits, seed)
    try {
      for (_ <- 0 until iters) {
        val signs = transform(rot.applyCol(col("xp")),
          x => when(x >= 0f, 1f).otherwise(-1f))
        val c = crossBlock(projected, col("xp"), signs, nbits, nbits)
        rot = Linear(procrustes(c))
      }
    } finally projected.unpersist()
    // compose: y = R (P x + b) = (R P) x + R b
    val rp = Array.tabulate(nbits)(i => Array.tabulate(pca.a(0).length) { j =>
      (0 until nbits).map(k => rot.a(i)(k).toDouble * pca.a(k)(j)).sum.toFloat
    })
    val rb = Array.tabulate(nbits)(i =>
      (0 until nbits).map(k => rot.a(i)(k).toDouble * pca.b(k)).sum.toFloat)
    Linear(rp, rb)
  }
}
