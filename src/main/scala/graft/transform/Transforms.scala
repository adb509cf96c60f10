package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.core.{MatVec, NormalizeL2, OuterSumAgg, VecSub}

/** VectorTransform family (faiss/VectorTransform.h:25-295): trainable
  * d_in -> d_out column maps, chainable like IndexPreTransform
  * (faiss/IndexPreTransform.h:25, apply_chain:83). All transforms
  * apply as plan expressions (no shuffles); training is an aggregate.
  */
sealed trait VecTransform extends Serializable {
  def applyCol(c: Column): Column
}

/** L2 normalization (NormalizationTransform, VectorTransform.h:280). */
case object Normalization extends VecTransform {
  def applyCol(c: Column): Column = shim.col(NormalizeL2(shim.expr(c)))
}

/** x - mean (CenteringTransform, VectorTransform.h:295). */
case class Centering(mean: Array[Float]) extends VecTransform {
  def applyCol(c: Column): Column = {
    val lit = shim.col(Literal.create(mean, ArrayType(FloatType, containsNull = false)))
    shim.col(VecSub(shim.expr(c), shim.expr(lit)))
  }
}

object Centering {
  def train(df: DataFrame, vecCol: String): Centering = {
    val r = df.agg(shim.agg(graft.core.VecSumAgg(shim.expr(col(vecCol)))).as("s"))
      .select(col("s.sum"), col("s.cnt")).collect().head
    val sum = r.getSeq[Double](0); val n = r.getLong(1)
    Centering(sum.map(x => (x / n).toFloat).toArray)
  }
}

/** y = A x + b (LinearTransform, VectorTransform.h:73). Output cast
  * back to float for chaining. */
case class Linear(a: Array[Array[Float]], b: Array[Float] = null) extends VecTransform {
  def dOut: Int = a.length
  def applyCol(c: Column): Column =
    shim.col(MatVec(shim.expr(c), a, b)).cast("array<float>")
}

/** Dimension selection/permutation (RemapDimensionsTransform,
  * VectorTransform.h:257) — a 0/1 row-per-output matrix would also do,
  * but element selection is cheaper. `indices` are 0-based input dims;
  * -1 emits a ZERO component (the transform's padding convention,
  * used by the `Pad<d>` factory form, index_factory.cpp:216). */
case class Remap(indices: Array[Int]) extends VecTransform {
  def applyCol(c: Column): Column = {
    val idx = array(indices.map(i => lit(i + 1)): _*)
    transform(idx, i => when(i === 0, lit(0.0f)).otherwise(element_at(c, i)))
  }
}

/** Chain (IndexPreTransform.apply_chain). */
case class Chain(transforms: Seq[VecTransform]) extends VecTransform {
  def applyCol(c: Column): Column = transforms.foldLeft(c)((acc, t) => t.applyCol(acc))
}

object Transforms {

  /** Seeded random rotation (RandomRotationMatrix,
    * VectorTransform.h:117): Gaussian matrix + Gram-Schmidt
    * orthonormalization, driver-side (d×d floats). */
  def randomRotation(d: Int, seed: Long = 1234L): Linear = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(d, d)(rnd.nextGaussian())
    // Gram-Schmidt
    for (i <- 0 until d) {
      for (j <- 0 until i) {
        var dot = 0.0
        var k = 0
        while (k < d) { dot += a(i)(k) * a(j)(k); k += 1 }
        k = 0
        while (k < d) { a(i)(k) -= dot * a(j)(k); k += 1 }
      }
      val n = math.sqrt(a(i).map(x => x * x).sum)
      for (k <- 0 until d) a(i)(k) /= n
    }
    Linear(a.map(_.map(_.toFloat)))
  }

  /** outer ∘ inner for affine maps:
    * A2(A1 x + b1) + b2 = (A2 A1) x + (A2 b1 + b2). */
  def compose(outer: Linear, inner: Linear): Linear = {
    val dOut = outer.a.length
    val rp = Array.tabulate(dOut)(i =>
      Array.tabulate(inner.a(0).length) { j =>
        var s = 0.0; var k = 0
        while (k < inner.a.length) { s += outer.a(i)(k).toDouble * inner.a(k)(j); k += 1 }
        s.toFloat
      })
    val rb =
      if (inner.b == null && outer.b == null) null
      else Array.tabulate(dOut) { i =>
        var s = if (outer.b != null) outer.b(i).toDouble else 0.0
        if (inner.b != null) {
          var k = 0
          while (k < inner.b.length) { s += outer.a(i)(k).toDouble * inner.b(k); k += 1 }
        }
        s.toFloat
      }
    Linear(rp, rb)
  }

  /** PCA with optional whitening (PCAMatrix,
    * VectorTransform.h:133-188). Training = one distributed pass
    * (mean + covariance via [[graft.core.OuterSumAgg]]; d×d doubles to
    * the driver) + a local eigendecomposition; applying = a
    * plan-embedded mat-vec. Returns the transform projecting onto the
    * top dOut components (rows sorted by decreasing eigenvalue).
    * eigenPower = -0.5 gives whitening (VectorTransform.h:147). */
  def pca(df: DataFrame, vecCol: String, dOut: Int,
      whiten: Boolean = false): Linear = {
    val r = df.agg(shim.agg(OuterSumAgg(shim.expr(col(vecCol)))).as("s"))
      .select(col("s.n"), col("s.sum"), col("s.outer")).collect().head
    val n = r.getLong(0).toDouble
    val sum = r.getSeq[Double](1).toArray
    val outer = r.getSeq[Double](2).toArray
    val d = sum.length
    val mean = sum.map(_ / n)
    val cov = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) =>
      outer(i * d + j) / n - mean(i) * mean(j))
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues; take top dOut descending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(dOut)
    val rows = order.map { i =>
      val v = es.eigenvectors(::, i)
      val scale = if (whiten) 1.0 / math.sqrt(math.max(es.eigenvalues(i), 1e-12)) else 1.0
      Array.tabulate(d)(j => (v(j) * scale).toFloat)
    }.toArray
    // fold the centering into the bias: y = R(x - mean) = Rx - R mean
    val bias = rows.map { row =>
      -(row.zip(mean).map { case (w, m) => w * m }.sum).toFloat
    }
    Linear(rows, bias)
  }

  /** MatrixStats-style profile (faiss/MatrixStats.h:19): per-dim
    * mean/std/min/max as a DataFrame. */
  def matrixStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("_p", "_e")))
      .select((col("_p") + 1).as("dim"), col("_e").cast("double").as("e"))
      .groupBy("dim")
      .agg(avg(col("e")).as("mean"), stddev_samp(col("e")).as("std"),
        min(col("e")).as("min"), max(col("e")).as("max"))
      .orderBy("dim")
}

/** Transform-prefixed coarse quantizer support (the
  * `IVF<n>(PCA<k>,Flat)` paren sub-index, index_factory.cpp:719: ANY
  * factory string inside the parens becomes the quantizer — an
  * IndexPreTransform maps both add-time assignment and search-time
  * probe ranking through its transform while stored vectors and
  * result distances stay in the original space). */
object CoarseTransform {

  /** PCA trained on the CENTROID table — Level1Quantizer::train_q1
    * trains the quantizer on the cluster centers, so the transform's
    * statistics come from the nlist-row centroid set (driver-resident
    * by construction, like [[graft.core.CoarsePq]]'s codebooks). */
  def pcaOverCentroids(s: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Float]], dOut: Int): Linear = {
    import s.implicits._
    val centDf = centroids.toSeq.map(_.toSeq).toDF("c")
      .select(col("c").cast("array<float>").as("c"))
    Transforms.pca(centDf, "c", dOut)
  }

  /** Driver twin of `Linear.applyCol`: the SAME MatVec kernel the
    * plan expression runs (double accumulation, bias after the
    * product sum) followed by the same per-element float cast —
    * delegating rather than re-implementing, so driver-side
    * transformed centroids can never drift from a plan-side
    * transform of the same rows. */
  def applyLin(lin: Linear, x: Array[Float]): Array[Float] =
    graft.core.MatVecKernels.apply(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(x),
      lin.a, lin.b).toDoubleArray().map(_.toFloat)
}
