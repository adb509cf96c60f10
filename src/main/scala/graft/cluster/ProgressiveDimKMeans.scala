package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.transform.Transforms

/** ProgressiveDimClustering (faiss/Clustering.h:128-176,
  * impl in faiss/Clustering.cpp): k-means warm-started over PCA-dim
  * prefixes. Vectors are PCA-rotated once; clustering runs on the
  * first d₁ < d₂ < ... < d dims, each level initialized from the
  * previous level's centroids zero-extended into the new dims (PCA
  * orders variance, so new tail dims start best-guessed at 0). The
  * early levels are much cheaper (small d) and give the final full-dim
  * Lloyd a near-converged start. */
object ProgressiveDimKMeans {

  def fit(df: DataFrame, vecCol: String, k: Int,
      levels: Seq[Int], niterPerLevel: Int = 4,
      seed: Long = 1234L): KMeans.Model =
    fitWithTransform(df, vecCol, k, levels, niterPerLevel, seed)._2

  /** Like [[fit]] but also returns the PCA rotation the centroids live
    * in (callers that assign new points must rotate them first). */
  def fitWithTransform(df: DataFrame, vecCol: String, k: Int,
      levels: Seq[Int], niterPerLevel: Int = 4,
      seed: Long = 1234L): (graft.transform.Linear, KMeans.Model) = {
    require(levels.nonEmpty && levels == levels.sorted, "levels must ascend")
    val d = df.select(size(col(vecCol))).first().getInt(0)
    require(levels.last <= d, s"level ${levels.last} > d=$d")

    val pca = Transforms.pca(df, vecCol, d) // full rotation, variance-ordered
    val rotated = df.select(pca.applyCol(col(vecCol)).as("vr")).cache()
    try {
      var init: Option[Array[Array[Float]]] = None
      var model: KMeans.Model = null
      for (dPrefix <- levels) {
        val sliced = rotated.select(slice(col("vr"), 1, dPrefix).as("vp"))
        model = KMeans.fit(sliced, "vp",
          KMeans.Params(k = k, niter = niterPerLevel, seed = seed), init)
        init = Some(model.centroids.map { c =>
          val next = levels.indexOf(dPrefix) + 1
          val target = if (next < levels.length) levels(next) else dPrefix
          java.util.Arrays.copyOf(c, target) // zero-extend into new dims
        })
      }
      (pca, model)
    } finally rotated.unpersist()
  }
}
