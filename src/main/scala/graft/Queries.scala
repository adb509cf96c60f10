package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.functions._
import graft.knn.Knn
import graft.core.{NearestCentroid, VecSumAgg}
import graft.index.IvfIndex
import graft.llm.{Dedup, Multimodal, TextFunctions => TF}

/** The driver-facing query catalog: one entry per implemented operator
  * from SURVEY.md §2, each with an equivalent DuckDB oracle in
  * [[Queries.oracle]].
  *
  * Float policy for oracle parity: every distance is accumulated in
  * double precision (see [[graft.core.VecKernels]]) and ROUNDED to 4
  * decimals in both the Spark output and the DuckDB SQL, so the
  * driver's value-hash compare is deterministic; integer/rank outputs
  * are cast to BIGINT on both sides (SURVEY.md §7 "exact float parity"
  * non-goal).
  */
object Queries {

  // ---- table helpers ---------------------------------------------------
  // Table DataFrames are memoized per (session, path): spark.read
  // re-lists files and re-infers the parquet schema (a small Spark job)
  // on EVERY call, and the catalog's ~90 queries each read 1-3 tables —
  // reusing the analyzed plan removes ~200 fixed-overhead jobs per
  // session without changing any scan plan.
  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    cached(s"table:$dir/$name:${s.hashCode}") {
      s.read.parquet(s"$dir/$name.parquet")
    }
  private def emb(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")

  /** Query side: vec_id < n. */
  private def qDf(s: SparkSession, dir: String, n: Long): DataFrame =
    emb(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  /** Base side: vec_id >= from. */
  private def bDf(s: SparkSession, dir: String, from: Long): DataFrame =
    emb(s, dir).filter(col("vec_id") >= from)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def r4(c: String): org.apache.spark.sql.Column = round(col(c), 4)

  /** Memo for trained indexes shared across catalog entries (Verify
    * and Bench run many queries in one session; rebuilding the same
    * index per query would redo identical kmeans jobs). */
  private val memo = scala.collection.concurrent.TrieMap.empty[String, Any]
  /** Cumulative wall time spent COMPUTING memo entries (misses only).
    * Bench takes a per-query delta: a timed run that populated a memo
    * entry did one-off build/train work a warm rerun would NOT
    * repeat, so the gate-borderline rerun publishes `warm + missCost`
    * — the same-work-profile reconstruction (ADVICE r9: gating the
    * memoized rerun alone understates build-bearing queries). Helpers
    * that persist+count eagerly have their execution captured here;
    * helpers that return lazy plans cost ~0 here but the rerun
    * recomputes them anyway — either way the sum reflects the cold
    * run's work profile. */
  private val memoMissNanos = new java.util.concurrent.atomic.AtomicLong
  def memoMissNanosTotal: Long = memoMissNanos.get
  // nesting depth per thread: a helper that misses and internally
  // misses ANOTHER helper must count the outer elapsed time once, not
  // outer + inner (the outer timer already contains the inner work)
  private val missDepth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }
  private def cached[T](key: String)(f: => T): T =
    memo.getOrElseUpdate(key, {
      val outer = missDepth.get == 0
      missDepth.set(missDepth.get + 1)
      val t0 = System.nanoTime()
      try {
        val v = f.asInstanceOf[Any]
        if (outer) memoMissNanos.addAndGet(System.nanoTime() - t0)
        v
      } finally missDepth.set(missDepth.get - 1)
    }).asInstanceOf[T]

  private def ivf16(s: SparkSession, dir: String): IvfIndex =
    cached(s"ivf16:$dir") {
      IvfIndex.build(bDf(s, dir, 10), "id", "vec", nlist = 16, niter = 4)
    }
  private def ivf20(s: SparkSession, dir: String): IvfIndex =
    cached(s"ivf20:$dir") {
      IvfIndex.build(bDf(s, dir, 20), "id", "vec", nlist = 16, niter = 4)
    }
  private def ivfsq16(s: SparkSession, dir: String): graft.index.IvfSqIndex =
    cached(s"ivfsq16:$dir") {
      graft.index.IvfSqIndex.build(bDf(s, dir, 10), "id", "vec", nlist = 16, niter = 4)
    }
  /** IVF-SQ with by_residual = true — the reference DEFAULT for
    * IndexIVFScalarQuantizer (IndexScalarQuantizer.h:64): the shared
    * range is trained over residuals, which concentrate near 0. */
  private def ivfsqRes16(s: SparkSession, dir: String): graft.index.IvfSqIndex =
    cached(s"ivfsqres16:$dir") {
      graft.index.IvfSqIndex.build(bDf(s, dir, 10), "id", "vec", nlist = 16,
        niter = 4, byResidual = true)
    }
  private def pq16(s: SparkSession, dir: String): graft.index.PqIndex =
    cached(s"pq16:$dir") {
      graft.index.PqIndex.build(bDf(s, dir, 10), "id", "vec", m = 8, ksub = 16, niter = 4)
    }
  private def rot64(s: SparkSession, dir: String): graft.transform.Linear =
    cached(s"rot64:$dir") { graft.transform.Transforms.randomRotation(64, 42L) }
  private def opqModel(s: SparkSession, dir: String): (graft.transform.Linear, graft.index.PqModel) =
    cached(s"opq:$dir") {
      graft.transform.Opq.trainOpq(bDf(s, dir, 10), "vec", m = 8, ksub = 16,
        outerIters = 2, pqIters = 3)
    }
  private def ivfpq8(s: SparkSession, dir: String): graft.index.IvfPqIndex =
    cached(s"ivfpq:$dir") {
      graft.index.IvfPqIndex.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, m = 8, ksub = 16, niterCoarse = 4, niterPq = 4)
    }
  /** `IVF16(PQ8x8),Flat` — the generic paren coarse with an IndexPQ
    * quantizer (index_factory.cpp:263-267): add-time assignment AND
    * probe selection rank cells by ADC over a PQ of the centroids. */
  private def parenPq16(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"parenpq:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF16(PQ8x8),Flat", niter = 4)
    }
  /** Probe dump of the (nprobe × quantizer_efSearch) autotune grid:
    * (ef, qid, list_no, pr) at npMax = 8 per walk budget over the
    * ivfpq8 index. Graph walks are not SQL-replayable, so the oracle
    * takes these probe SETS as given and re-derives everything
    * downstream (assignment, codes, LUTs, ADC, recall, fractions,
    * Pareto) independently. Deterministic: the walk runs over the
    * memoized index's per-executor graph cache, seeded. */
  private def hnswTuneProbes(s: SparkSession, dir: String): DataFrame =
    cached(s"hnswtuneprobes:$dir") {
      val idx = ivfpq8(s, dir)
      Seq(2, 4, 1024).map { ef =>
        idx.sweepCandidates(qDf(s, dir, 10), 8,
          coarse = Some(graft.index.Probes.HnswCoarse(ef)))
          .select(lit(ef).as("ef"), col("qid"), col("list_no"), col("pr"))
          .distinct()
      }.reduce(_ unionByName _)
    }
  private def factoryIvf16(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"factoryIvf:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF16,Flat", niter = 4)
    }
  /** `IVF8,RQ2x4_Nqint8` — the aq_norm clause INSIDE the IVF code
    * token (index_factory.cpp:293-430): residual-AQ lists searched by
    * the ST_norm_qint8 LUT scan. */
  private def ivfRqNorm8(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"ivfrqnorm8:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF8,RQ2x4_Nqint8", niter = 4)
    }
  /** Twin-call IvfRq of the `IVF8,RQ2x4_Nqint8` factory route: the
    * same deterministic build (coarse k-means, residual RQ train,
    * beam-2 + 1-ICM encode) the factory runs internally — the
    * parenPqPq16 twin-call convention; the oracle sidecars come from
    * this twin while the catalog query searches the factory Built. */
  private def ivfRqNormTwin(s: SparkSession, dir: String): graft.index.IvfRqIndex =
    cached(s"ivfrqnormtwin:$dir") {
      graft.index.IvfRq.build(bDf(s, dir, 10), "id", "vec", nlist = 8,
        levels = 2, k = 16, niterCoarse = 4, niterRq = 4, beam = 2,
        icmIters = 1, seed = 1234L)
    }
  private def factoryRefine8(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"factoryRefine:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF8,Flat,Refine(Flat)", niter = 4)
    }
  private def factoryIvfHnswPq8(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"factoryIvfHnswPq:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF8_HNSW16,PQ8", niter = 4)
    }
  /** `IVF16(SQ8),Flat` — the SQ-quantizer paren coarse: assignment
    * and probe selection rank by exact L2 to the SQ-DECODED centroid
    * table (the asymmetric-distance identity, core/CoarseSq). */
  private def parenSq16(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"parensq:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF16(SQ8),Flat", niter = 4)
    }
  /** `IVF16(PCA8,Flat),Flat` — transform-prefixed paren quantizer:
    * assignment and probes rank in the PCA space (trained on the
    * cluster centers), distances stay original. */
  private def parenPca16(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"parenpca:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF16(PCA8,Flat),Flat", niter = 4)
    }
  /** Twin-call PCA of the `IVF16(PCA8,Flat)` quantizer: the same
    * deterministic pcaOverCentroids call the factory route runs
    * internally, over the same deterministic k-means centroids (the
    * parenPqPq16 twin-call convention). */
  private def parenPcaLin(s: SparkSession, dir: String): graft.transform.Linear =
    cached(s"parenpcalin:$dir") {
      graft.transform.CoarseTransform.pcaOverCentroids(s,
        cached(s"parensqcents:$dir") {
          graft.cluster.KMeans.fit(bDf(s, dir, 10), "vec",
            graft.cluster.KMeans.Params(k = 16, niter = 4, seed = 1234L))
            .centroids
        }, 8)
    }
  /** `IVF16(PQ8x8),PQ8` — the lossy-quantizer composition: residuals
    * subtract the quantizer's DECODED reconstruction, and adds assign
    * through it (= exact argmin over the decoded table). Built through
    * the same deterministic calls as the factory route. */
  private def parenPqPq16(s: SparkSession, dir: String): graft.index.IvfPqIndex =
    cached(s"parenpqpq:$dir") {
      val km = graft.cluster.KMeans.fit(bDf(s, dir, 10), "vec",
        graft.cluster.KMeans.Params(k = 16, niter = 4, seed = 1234L))
      val cdec = graft.core.CoarsePq.decodedCentroids(
        graft.core.CoarsePq.model(km.centroids, 8, 8))
      graft.index.IvfPqIndex.build(bDf(s, dir, 10), "id", "vec",
        nlist = 16, m = 8, ksub = 16, niterCoarse = 4, niterPq = 4,
        centroids0 = cdec)
    }
  /** The paren-coarse trained state for the sidecar dump — recomputed
    * through the same deterministic calls the factory route makes
    * (KMeans.fit k=16/niter=4/seed=1234, CoarsePq over the centroids),
    * so the dumped values are bit-identical to the searched model. */
  private def parenPqModel(s: SparkSession, dir: String): (Array[Array[Float]], Array[Array[Array[Float]]]) =
    cached(s"parenpqmodel:$dir") {
      val km = graft.cluster.KMeans.fit(bDf(s, dir, 10), "vec",
        graft.cluster.KMeans.Params(k = 16, niter = 4, seed = 1234L))
      val (cb, _) = graft.core.CoarsePq.model(km.centroids, 8, 8)
      (km.centroids, cb)
    }
  private def ivfpqr8(s: SparkSession, dir: String): graft.index.IvfPqrIndex =
    cached(s"ivfpqr:$dir") {
      graft.index.IvfPqrIndex.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, m = 8, ksub = 16, niterCoarse = 4, niterPq = 4)
    }
  /** Residual2x4,PQ8 — the MIQ-first-layer Index2Layer
    * (index_factory.cpp:270-278); built through the same
    * deterministic calls as the factory route. */
  private def resMiq24(s: SparkSession, dir: String): graft.index.MiqTwoLayerIndex =
    cached(s"resmiq24:$dir") {
      graft.index.MiqTwoLayerIndex.build(
        emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec")),
        "id", "vec", mCoarse = 2, nbit = 4, m = 8, ksub = 16,
        niterCoarse = 4, niterPq = 4)
    }
  private def twoLayer16(s: SparkSession, dir: String): graft.index.TwoLayerIndex =
    cached(s"twolayer16:$dir") {
      graft.index.TwoLayerIndex.build(
        emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec")),
        "id", "vec", nlist = 16, m = 8, ksub = 16, niterCoarse = 4, niterPq = 4)
    }
  private def sqMeanstd(s: SparkSession, dir: String): graft.index.SqIndex =
    cached(s"sqmeanstd:$dir") {
      graft.index.SqIndex.build(emb(s, dir), "vec_id", "embedding",
        rangeStat = "meanstd", rsArg = 2.5)
    }
  private def ivfsh8(s: SparkSession, dir: String): graft.index.IvfSpectralHashIndex =
    cached(s"ivfsh8:$dir") {
      graft.index.IvfSpectralHash.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, nbit = 32, period = 1.0, thresholdType = "median", niter = 4)
    }
  /** Thresh_centroid_half twin of [[ivfsh8]]: identical data/seeds, so
    * the coarse centroids and rotation match ivfsh8's sidecars bit for
    * bit — only the thresholds differ (centroid - period/4), which the
    * oracle derives ITSELF from those sidecars. */
  private def ivfshCh8(s: SparkSession, dir: String): graft.index.IvfSpectralHashIndex =
    cached(s"ivfshch8:$dir") {
      graft.index.IvfSpectralHash.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, nbit = 32, period = 1.0, thresholdType = "centroid_half",
        niter = 4)
    }
  private def ivf8(s: SparkSession, dir: String): IvfIndex =
    cached(s"ivf8:$dir") {
      IvfIndex.build(bDf(s, dir, 10), "id", "vec", nlist = 8, niter = 3)
    }
  private def km8(s: SparkSession, dir: String): graft.cluster.KMeans.Model =
    cached(s"km8:$dir") {
      graft.cluster.KMeans.fit(emb(s, dir).select(col("embedding")), "embedding",
        graft.cluster.KMeans.Params(k = 8, niter = 5))
    }
  /** Spherical k-means (ClusteringParameters.spherical,
    * Clustering.cpp:65-68): centroids L2-renormalized after every
    * update — the trainer FAISS uses for IP/cosine coarse quantizers
    * (assignment stays L2, as in the reference). */
  private def kmSph8(s: SparkSession, dir: String): graft.cluster.KMeans.Model =
    cached(s"kmsph8:$dir") {
      graft.cluster.KMeans.fit(emb(s, dir).select(col("embedding")), "embedding",
        graft.cluster.KMeans.Params(k = 8, niter = 5, spherical = true))
    }
  /** Clustering::train_encoded state (Clustering.cpp:271): SQ8 codec
    * over embeddings + k-means trained DIRECTLY on the codes (decode
    * inside each iteration's assign — the memory-bounded train path).
    * Returns (vmin, vdiff, model). */
  private def kmEnc8(s: SparkSession, dir: String):
      (Array[Double], Array[Double], graft.cluster.KMeans.Model) =
    cached(s"kmenc8:$dir") {
      val e = emb(s, dir)
      val (mins, vdiff) = graft.index.SqIndex.trainRange(e, "embedding")
      val codes = e.select(col("vec_id").as("id"),
        shim.col(graft.index.SqVariant.encode("SQ8",
          shim.expr(col("embedding")), mins, vdiff)).as("code"))
      val m = graft.cluster.KMeans.fitEncoded(codes, "code",
        c => shim.col(graft.index.SqVariant.decode("SQ8",
          shim.expr(c), mins, vdiff)).cast("array<float>"),
        graft.cluster.KMeans.Params(k = 8, niter = 5))
      (mins, vdiff, m)
    }
  private def twoLevel12(s: SparkSession, dir: String): Array[Array[Float]] =
    cached(s"twolevel12:$dir") {
      graft.cluster.TwoLevelClustering.fit(emb(s, dir), "embedding",
        nlist = 12, niter1 = 3, niter2 = 3)
    }
  /** Shared quantizer of the distributed_ondisk recipe: two-level
    * k-means over the base set (the recipe's own scalable train step,
    * benchs/distributed_ondisk/README.md step 1 +
    * contrib/clustering.py train_ivf_index_with_2level). */
  private def ondiskCents16(s: SparkSession, dir: String): Array[Array[Float]] =
    cached(s"ondisk16:$dir") {
      graft.cluster.TwoLevelClustering.fit(bDf(s, dir, 10), "vec",
        nlist = 16, niter1 = 3, niter2 = 3)
    }
  private def pdk8(s: SparkSession, dir: String): (graft.transform.Linear, graft.cluster.KMeans.Model) =
    cached(s"pdk8:$dir") {
      graft.cluster.ProgressiveDimKMeans.fitWithTransform(emb(s, dir), "embedding",
        k = 8, levels = Seq(8, 24, 64), niterPerLevel = 3)
    }
  /** PCA to 16 dims trained on the full embeddings table (PCAMatrix,
    * faiss/VectorTransform.h:124; centering folded into the bias). */
  private def pca16(s: SparkSession, dir: String): graft.transform.Linear =
    cached(s"pca16:$dir") {
      graft.transform.Transforms.pca(emb(s, dir), "embedding", 16)
    }
  /** ITQ rotation to 32 bits (ITQMatrix, faiss/VectorTransform.h:178:
    * PCA then iterative Procrustes toward the sign codes). */
  private def itq32(s: SparkSession, dir: String): graft.transform.Linear =
    cached(s"itq32:$dir") {
      graft.transform.Opq.trainItq(emb(s, dir), "embedding", 32, iters = 5)
    }
  private def ivfsq4(s: SparkSession, dir: String): graft.index.IvfSqIndex =
    cached(s"ivfsq4:$dir") {
      graft.index.IvfSqIndex.build(bDf(s, dir, 10), "id", "vec",
        nlist = 16, niter = 4, qtype = "SQ4")
    }
  private def rqfs2(s: SparkSession, dir: String): graft.index.Rq4FastScanIndex =
    cached(s"rqfs2:$dir") {
      graft.index.Rq4FastScanIndex.build(bDf(s, dir, 10), "id", "vec",
        levels = 2, model0 = rqModel16(s, dir))
    }
  private def ivfrqfs8(s: SparkSession, dir: String): graft.index.IvfRq4FastScanIndex =
    cached(s"ivfrqfs8:$dir") {
      graft.index.IvfRq4FastScanIndex.fromFlat(rqfs2(s, dir),
        bDf(s, dir, 10), "id", "vec", nlist = 8, niterCoarse = 4)
    }
  /** Adversarial-span base table (VERDICT r13 #3): vectors scaled by
    * 1/6/11/16x (exact small-int REAL arithmetic — replays verbatim in
    * DuckDB), so reconstruction norms spread ~256x and the norm-LUT
    * span dominates the IP-LUT span: the regime where the reference's
    * flat-family rescale_norm default actually rescales. */
  private def advVecs(s: SparkSession, dir: String): DataFrame =
    bDf(s, dir, 10).select(col("id"),
      transform(col("vec"), x =>
        x * (lit(1.0f) + pmod(col("id"), lit(4)).cast("float") * lit(5.0f)))
        .as("vec"))
  /** Flat AQ fast-scan over [[advVecs]]: estimate_norm_scale lands
    * well above 1 (measured 8 at sf0.001), so the quantized LUT
    * carries DIVIDED norm columns and the scan multiplies them back
    * (NormTableScaler) — the rescale path under test. */
  private def rqfsRs(s: SparkSession, dir: String): graft.index.Rq4FastScanIndex =
    cached(s"rqfsrs:$dir") {
      graft.index.Rq4FastScanIndex.build(advVecs(s, dir), "id", "vec",
        levels = 2, niter = 4)
    }
  /** `LSQ2x4fs` (IndexLocalSearchQuantizerFastScan): ICM-refined codes
    * over the same (L+2)-column integer scan. */
  private def lsqfs2(s: SparkSession, dir: String): graft.index.Rq4FastScanIndex =
    cached(s"lsqfs2:$dir") {
      graft.index.Rq4FastScanIndex.build(bDf(s, dir, 10), "id", "vec",
        levels = 2, niter = 4, icmIters = 3)
    }
  /** `PRQ2x2x4fs` (IndexProductResidualQuantizerFastScan): per-split
    * RQs scanned through zero-padded effective codebooks. */
  private def prqfs22(s: SparkSession, dir: String): graft.index.Rq4FastScanIndex =
    cached(s"prqfs22:$dir") {
      graft.index.Rq4FastScanIndex.build(bDf(s, dir, 10), "id", "vec",
        levels = 2, niter = 4, nsplit = 2)
    }
  /** Twin-call PRQ model of [[prqfs22]] (the same deterministic
    * Prq.train the builder runs): the oracle-codes sidecar re-runs its
    * per-split encode, which the EFFECTIVE flat model cannot express. */
  private def prqfsModel(s: SparkSession, dir: String): graft.index.PrqModel =
    cached(s"prqfsmodel:$dir") {
      graft.index.Prq.train(bDf(s, dir, 10).select(col("vec")), "vec",
        nsplit = 2, levels = 2, k = 16, niter = 4, seed = 1234L, beam = 1)
    }
  /** `IVF8,PRQ2x2x4` (IndexIVFProductResidualQuantizer,
    * index_factory.cpp:351): per-split residual AQ lists searched by
    * decompress through the zero-padded effective model — built by the
    * SAME deterministic calls the factory route runs (the parenPqPq16
    * twin-call convention; FastScanSpec asserts factory equality). */
  private def ivfPrq8(s: SparkSession, dir: String): graft.index.IvfRqIndex =
    cached(s"ivfprq8:$dir") {
      val data = bDf(s, dir, 10)
      val km = graft.cluster.KMeans.fit(data, "vec",
        graft.cluster.KMeans.Params(k = 8, niter = 4, seed = 1234L))
      val centDf = graft.index.Probes.centroidsDf(s, km.centroids)
      val assigned = km.assign(data, "vec")
        .join(broadcast(centDf), "list_no")
        .select(col("id"), col("list_no"),
          graft.functions.vec_sub(col("vec"), col("centroid")).as("res"))
      val prq = graft.index.Prq.train(assigned.select(col("res")), "res",
        nsplit = 2, levels = 2, k = 16, niter = 4, seed = 1234L, beam = 2)
      val codes = assigned.select(col("id"), col("list_no"),
        prq.encodeCol(col("res"), 2, 1).as("code")).cache()
      codes.count()
      new graft.index.IvfRqIndex(8, km.centroids,
        graft.index.Rq4FastScanIndex.effectiveModel(prq), codes)
    }
  /** `IVF8,PCA8,SH` — the reference's spectral-hash spelling with a
    * REPLACED PCA transform, period absent (simple thresholding) and
    * the Thresh_global default: factory-built; the twin-call PCA
    * sidecar feeds the oracle (the parenPcaLin convention). */
  private def ivfShPca8(s: SparkSession, dir: String): graft.index.IndexFactory.Built =
    cached(s"ivfshpca8:$dir") {
      graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec",
        "IVF8,PCA8,SH", niter = 4)
    }
  /** Twin-call PCA of the `IVF8,PCA8,SH` route (same deterministic
    * Transforms.pca call over the same data). */
  private def ivfShPcaLin(s: SparkSession, dir: String): graft.transform.Linear =
    cached(s"ivfshpcalin:$dir") {
      graft.transform.Transforms.pca(bDf(s, dir, 10), "vec", 8)
    }
  /** Twin-call coarse centroids of the `IVF8,PCA8,SH` route. */
  private def ivfShPcaCents(s: SparkSession, dir: String): Array[Array[Float]] =
    cached(s"ivfshpcacents:$dir") {
      graft.cluster.KMeans.fit(bDf(s, dir, 10), "vec",
        graft.cluster.KMeans.Params(k = 8, niter = 4, seed = 1234L)).centroids
    }
  private def pqfs8(s: SparkSession, dir: String): graft.index.Pq4FastScanIndex =
    cached(s"pqfs8:$dir") {
      graft.index.Pq4FastScanIndex.build(bDf(s, dir, 10), "id", "vec",
        m = 8, niter = 4)
    }
  private def ivfpqfs8(s: SparkSession, dir: String): graft.index.IvfPq4FastScanIndex =
    cached(s"ivfpqfs8:$dir") {
      graft.index.IvfPq4FastScanIndex.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, m = 8, niterCoarse = 4, niterPq = 4)
    }
  /** Residual IVFPQ fast-scan bulk-loaded from [[ivfpq8]] (the
    * IndexIVFPQFastScan(const IndexIVFPQ&) path): shares its
    * centroid/codebook sidecars, so the oracle replays residual
    * encode + LUT quantization from the same trained state. */
  private def ivfpqfsr8(s: SparkSession, dir: String): graft.index.IvfPq4FastScanRIndex =
    cached(s"ivfpqfsr8:$dir") {
      graft.index.IvfPq4FastScanRIndex.fromIvfPq(ivfpq8(s, dir))
    }
  /** By-residual IVF AQ fast-scan (`IVF8,RQ2x4fsr`,
    * IndexIVFAdditiveQuantizerFastScan.cpp:590): residual RQ codes +
    * the FULL-reconstruction-norm 2x4 codec, one LUT per query plus a
    * per-probe scalar bias. */
  private def ivfrqfsr8(s: SparkSession, dir: String): graft.index.IvfRq4FastScanRIndex =
    cached(s"ivfrqfsr8:$dir") {
      graft.index.IvfRq4FastScanRIndex.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, levels = 2, niterCoarse = 4, niter = 4)
    }
  /** Documents corpus with planted exact duplicates (id + 100000):
    * guarantees the simhash near-dup query returns rows at any sf. */
  private def simhashCorpus(s: SparkSession, dir: String): DataFrame =
    cached(s"simhashCorpus:$dir") {
      val d = docsDf(s, dir).select(col("doc_id"), col("text"))
      d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    }

  /** Deterministic ~300k-doc text corpus (sf0.1) with planted
    * duplicates for the at-scale minhash dedup query: 12 md5-derived
    * tokens per lineitem row (the testdata has no long-text column at
    * lineitem scale), identically derivable in DuckDB. Tokens are
    * unique per doc, so the only >=0.8-Jaccard pairs are the planted
    * copies — the LOAD is real (full shingle/minhash/band join over
    * the corpus), the answer is exactly replayable. */
  private[graft] def commentCorpus(s: SparkSession, dir: String): DataFrame =
    cached(s"commentCorpus:$dir") {
      val did = (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
      val ids0 = lineitem(s, dir).filter(col("l_orderkey") % 4 === 0)
        .select(did.as("_did"))
      // bench-only 10x tier: replicate the DOC IDS before token
      // derivation, so every replica is a distinct doc with 12 fresh
      // md5 tokens (replicating the text instead would plant a
      // quadratic near-dup candidate blow-up no real corpus has); the
      // planted-copy offset moves out of the scaled id range
      val ids = if (scaleX <= 1) ids0 else
        ids0.select(col("_did"),
          explode(sequence(lit(0), lit(scaleX - 1))).as("_k"))
          .select((col("_did") * scaleX + col("_k")).as("_did"))
      // widen before the 12-md5s-per-doc derivation (see bigVecs); the
      // scaled tier widens BY scaleX so the per-task md5/shingle work
      // stays constant as the corpus grows (a cluster adds executors
      // with data; a fixed 32-way cache would make every downstream
      // map stage a wave of 10x-fat stragglers)
      val target = s.sparkContext.defaultParallelism * scaleX
      val widened =
        if (ids.rdd.getNumPartitions >= target) ids
        else ids.repartition(target)
      val toks = (0 until 12).map(i =>
        substring(md5(concat(col("_did").cast("string"), lit("_" + i))), 1, 6))
      // single-pass planting: the duplicate copy shares the ORIGINAL
      // doc's text, so emit both rows from one derivation via an
      // exploded id-offset instead of a union whose second branch
      // re-computes all 12 md5s per doc (profiled: halves the most
      // expensive derivation in the catalog, ~7 s -> ~3.5 s at sf0.1)
      val base = widened
        .select(col("_did"), concat_ws(" ", toks: _*).as("text"))
      val plantOff = if (scaleX <= 1) 1000000000L else 1L << 40
      // persist: 12 md5s/doc over ~600k docs is the most expensive
      // derivation in the catalog and the minhash pipeline reads the
      // corpus twice (band table + shingle sets) — ~100 MB cached vs
      // re-hashing 7M md5s per pass
      base
        .select(explode(array(lit(0L), lit(plantOff))).as("_off"),
          col("_did"), col("text"))
        .select((col("_did") + col("_off")).as("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
  private val commentCorpusSql =
    """SELECT doc_id, array_to_string(
      |         [substr(md5(doc_id::VARCHAR || '_' || i), 1, 6) for i in range(0, 12)], ' ') AS text
      |       FROM (SELECT (l_orderkey*10 + l_linenumber)::BIGINT AS doc_id
      |             FROM lineitem WHERE l_orderkey % 4 = 0) b0
      |       UNION ALL
      |       SELECT doc_id + 1000000000, array_to_string(
      |         [substr(md5(doc_id::VARCHAR || '_' || i), 1, 6) for i in range(0, 12)], ' ')
      |       FROM (SELECT (l_orderkey*10 + l_linenumber)::BIGINT AS doc_id
      |             FROM lineitem WHERE l_orderkey % 4 = 0) b1""".stripMargin

  /** Unigram-LM document scoring (the CCNet/KenLM perplexity-proxy
    * filter): corpus token frequencies -> per-token negative log
    * likelihood -> per-doc average. ONE tokenize pass and ONE shuffle
    * of the token table: the per-token corpus frequency is a window
    * count over the token-partitioned shuffle, not a separate
    * counts aggregate joined back (which re-scans and re-shuffles the
    * token table per consumer — the r8 3.9x gate breach). Rows are
    * colocated by token either way, so the window adds only a cheap
    * per-partition radix sort of 8-byte keys; hot-token skew hits the
    * window and join shapes identically (salt the token key if a
    * stopword list dominates at scale).
    *
    * Tokens are keyed by xxhash64 (the HashingTF trick): 8-byte
    * shuffle keys instead of strings; collision odds across a
    * corpus vocabulary are ~n^2/2^64, and a collision would have to
    * be token-vs-token to perturb a count. doc_id stays a LONG — an
    * int would silently wrap past 2^31 ids, exactly the regime this
    * word-count shape is meant for (r9 review). Corpus size T needs
    * no token-table pass at all: it is the sum of per-doc token
    * counts, computed narrowly with size(filter(...)) and broadcast
    * as one row.
    *
    * Per-token nll is snapped to an INTEGER 1e-4 grid before the
    * per-doc sum, so the aggregate is a long sum — exact and
    * partition-order independent in both engines (a double sum can
    * flip a 2-dp rounding boundary under AQE re-plans; ADVICE r8).
    *
    * Both unigram queries (documents table + derived corpus) run
    * through this ONE helper so the post-shuffle stages generate
    * byte-identical codegen classes: the small query's run leaves the
    * big query's window/aggregate stages codegen-cached and
    * JIT-compiled (measured: the window stage is 4.1 s wall JIT-cold
    * vs 0.7 s warm at sf0.1).
    */
  private def unigramDocScores(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tDf = docs.select(
      sum(size(filter(TF.tokenize(col("text")),
        tk => length(tk) > 0))).cast("double").as("T"))
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(TF.tokenize(col("text"))).as("tok0"))
      .filter(length(col("tok0")) > 0)
      .select(col("doc_id"), xxhash64(col("tok0")).as("tok"))
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .crossJoin(broadcast(tDf))
      .select(col("doc_id"),
        round(-log(col("c") / col("T")) * 10000).cast("int").as("nll_i"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("nll_i")) / 10000.0 / count(lit(1)), 2).as("avg_nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** The DuckDB replay of the engine's minhash pipeline (3-gram
    * shingles -> md5 minhash signature over 12 permutations -> 4-band
    * LSH join -> exact-Jaccard verify) over any (doc_id, text)
    * source. Ends with the `jac` CTE (i, j, inter, tot). */
  private def minhashChainSql(src: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $src),
       |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
       |         ELSE []::VARCHAR[] END) AS s FROM toks),
       |hs AS (SELECT doc_id, s, list_transform(s,
       |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1048573) AS hv FROM sh),
       |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
       |          j -> list_aggregate(list_transform(hv,
       |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
       |            'min')) AS sg FROM hs),
       |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
       |         FROM sig, range(0, 4) r(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
       |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
       |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j)""".stripMargin

  /** Force every SMALL memoized trained model — those without an
    * explicit *_build catalog entry — so Bench's per-query timings
    * measure SEARCH against pre-trained state, the same basis as the
    * DuckDB oracles (which read trained sidecars). The big models
    * (ivfBig / ivfpqBig / bigVecs) are deliberately NOT warmed:
    * `ivf_build_big` / `ivfpq_build_big` / `bigvec_derive` exist to
    * time exactly those builds. */
  def warmTrainedModels(s: SparkSession, dir: String): Unit = {
    ivf16(s, dir); ivf20(s, dir); ivf8(s, dir); ivfsq16(s, dir)
    ivfsqRes16(s, dir)
    pq16(s, dir); rot64(s, dir); opqModel(s, dir); ivfpq8(s, dir)
    ivfpqr8(s, dir); twoLayer16(s, dir); ivfsh8(s, dir); ivfshCh8(s, dir)
    km8(s, dir)
    twoLevel12(s, dir); pdk8(s, dir); bivf8(s, dir); rqModel16(s, dir)
    prqModel(s, dir); imi16(s, dir); imipq16(s, dir); imisq16(s, dir)
    imisqRes16(s, dir); sqMeanstd(s, dir); ivfrq8(s, dir)
    kmSph8(s, dir); kmEnc8(s, dir); znLat16(s, dir); pca16(s, dir)
    itq32(s, dir)
    pqfs8(s, dir); ivfpqfs8(s, dir); ivfsq4(s, dir); rqfs2(s, dir)
    rqfsRs(s, dir)
    ivfrqfs8(s, dir); ivfpqfsr8(s, dir); ivfrqfsr8(s, dir); rcq16(s, dir)
    lsqfs2(s, dir); prqfs22(s, dir); prqfsModel(s, dir)
    ivfPrq8(s, dir); ivfShPca8(s, dir); ivfShPcaLin(s, dir)
    ivfShPcaCents(s, dir)
    opq32Ivfpq(s, dir)
    // factory/paren-built twins: same pre-trained-vs-search basis as
    // the direct fixtures (their oracles replay trained state too)
    factoryIvf16(s, dir); factoryRefine8(s, dir); factoryIvfHnswPq8(s, dir)
    parenPq16(s, dir); parenPqPq16(s, dir); parenSq16(s, dir)
    parenPca16(s, dir); parenPcaLin(s, dir)
    // AQ stored-norm codec state + the distributed_ondisk shared
    // quantizer: their oracles read engine sidecars / replay from the
    // trained centroid table, so training stays outside the timer
    rqNormBase(s, dir); rqNormRange(s, dir)
    rqNormCq(s, dir, 256); rqNormCq(s, dir, 16)
    rqNorm2Cb(s, dir, 0); rqNorm2Cb(s, dir, 3)
    ondiskCents16(s, dir)
    ivfRqNorm8(s, dir); ivfRqNormTwin(s, dir)
    // skewed-IVF fixture: its oracle replays search against the
    // trained-centroid sidecar, so the (hot-list) build stays outside
    // the timed run; there is no ivf_build_skewed entry to protect
    ivfSkew(s, dir)
    ()
  }

  /** Writes the trained-state sidecars that the sidecar-based oracle
    * SQLs read (see [[OracleAux]]); called by Verify after the query
    * dump so the sidecars always come from the same session (and thus
    * the same memoized models) as the compared outputs. */
  def writeOracleAux(s: SparkSession, dir: String): Unit = {
    OracleAux.write(dir, "ivf16_centroids",
      OracleAux.centroidsDf(s, ivf16(s, dir).centroids))
    OracleAux.write(dir, "pq16_codebooks",
      OracleAux.codebooksDf(s, pq16(s, dir).model.codebooks))
    OracleAux.write(dir, "pqfs_codebooks",
      OracleAux.codebooksDf(s, pqfs8(s, dir).model.codebooks))
    OracleAux.write(dir, "ivfrqfs_centroids",
      OracleAux.centroidsDf(s, ivfrqfs8(s, dir).centroids))
    // LSQ-family fast-scan trained state: codebooks + ICM-encoded int
    // codes (the twin-call of the builder's own encode; ICM descent is
    // not SQL-replayable) + norm codebooks — the oracle replays norm
    // encode, LUT quantization and the integer scan from these
    val lfs = lsqfs2(s, dir)
    OracleAux.write(dir, "lsq4fs_codebooks",
      OracleAux.codebooksDf(s, lfs.model.codebooks))
    OracleAux.write(dir, "lsq4fs_normcb",
      OracleAux.normCbDf(s, lfs.normCb))
    OracleAux.write(dir, "lsq4fs_codes",
      bDf(s, dir, 10).select(col("id"),
        lfs.model.encodeCol(col("vec"), 1, 3).as("codes")))
    // product AQ fast-scan: the EFFECTIVE zero-padded codebooks (the
    // scan's view) + per-split-encoded int codes via the twin model
    val pfs = prqfs22(s, dir)
    OracleAux.write(dir, "prq4fs_codebooks",
      OracleAux.codebooksDf(s, pfs.model.codebooks))
    OracleAux.write(dir, "prq4fs_normcb",
      OracleAux.normCbDf(s, pfs.normCb))
    OracleAux.write(dir, "prq4fs_codes",
      bDf(s, dir, 10).select(col("id"),
        prqfsModel(s, dir).encodeCol(col("vec"), 1, 0).as("codes")))
    // by-residual AQ fast-scan trained state: the oracle replays the
    // WHOLE chain (assign, greedy residual encode, reconstruction
    // norm, norm encode, LUT quantization, integer scan, bias) from
    // these three sidecars alone
    val rqfsr = ivfrqfsr8(s, dir)
    OracleAux.write(dir, "ivfrqfsr_centroids",
      OracleAux.centroidsDf(s, rqfsr.centroids))
    OracleAux.write(dir, "ivfrqfsr_codebooks",
      OracleAux.codebooksDf(s, rqfsr.model.codebooks))
    OracleAux.write(dir, "ivfrqfsr_normcb",
      OracleAux.normCbDf(s, rqfsr.normCb))
    OracleAux.write(dir, "rq4fs_normcb",
      OracleAux.normCbDf(s, rqfs2(s, dir).normCb))
    // flat AQ fast-scan trained norm_scale (rescale_norm defaults TRUE
    // for the flat family, IndexAdditiveQuantizerFastScan.h:34): the
    // oracles replay the divided-norm-column LUT quantization and the
    // NormTableScaler accumulate from this one int — typically 1 on
    // the embeddings fixture, but the replay must track whatever the
    // estimate lands on at any sf
    def writeNormScale(name: String, ns: Int): Unit = {
      import s.implicits._
      OracleAux.write(dir, name, Seq(ns).toDF("ns"))
    }
    writeNormScale("rq4fs_normscale", rqfs2(s, dir).normScale)
    writeNormScale("lsq4fs_normscale", lsqfs2(s, dir).normScale)
    writeNormScale("prq4fs_normscale", prqfs22(s, dir).normScale)
    // adversarial-span rescale fixture (norm_scale > 1 by
    // construction): codebooks + norm codebooks + int codes + the
    // trained scale — the oracle replays decode, norms, norm encode,
    // the divided-LUT quantization and the scaled integer accumulate
    val rfsrs = rqfsRs(s, dir)
    OracleAux.write(dir, "rq4fsrs_codebooks",
      OracleAux.codebooksDf(s, rfsrs.model.codebooks))
    OracleAux.write(dir, "rq4fsrs_normcb", OracleAux.normCbDf(s, rfsrs.normCb))
    OracleAux.write(dir, "rq4fsrs_codes",
      advVecs(s, dir).select(col("id"),
        rfsrs.model.encodeCol(col("vec"), 1, 0).as("codes")))
    writeNormScale("rq4fsrs_normscale", rfsrs.normScale)
    val ipqfs = ivfpqfs8(s, dir)
    OracleAux.write(dir, "ivfpqfs_centroids", OracleAux.centroidsDf(s, ipqfs.centroids))
    OracleAux.write(dir, "ivfpqfs_codebooks", OracleAux.codebooksDf(s, ipqfs.model.codebooks))
    OracleAux.write(dir, "rot64", OracleAux.matrixDf(s, rot64(s, dir).a))
    val (orot, opqm) = opqModel(s, dir)
    OracleAux.write(dir, "opq_rot", OracleAux.matrixDf(s, orot.a))
    OracleAux.write(dir, "opq_codebooks", OracleAux.codebooksDf(s, opqm.codebooks))
    val ipq = ivfpq8(s, dir)
    OracleAux.write(dir, "ivfpq_centroids", OracleAux.centroidsDf(s, ipq.centroids))
    OracleAux.write(dir, "ivfpq_codebooks", OracleAux.codebooksDf(s, ipq.model.codebooks))
    val ipqr = ivfpqr8(s, dir)
    OracleAux.write(dir, "ivfpqr_centroids", OracleAux.centroidsDf(s, ipqr.centroids))
    OracleAux.write(dir, "ivfpqr_codebooks1", OracleAux.codebooksDf(s, ipqr.model1.codebooks))
    OracleAux.write(dir, "ivfpqr_codebooks2", OracleAux.codebooksDf(s, ipqr.model2.codebooks))
    val (ppCents, ppCb) = parenPqModel(s, dir)
    OracleAux.write(dir, "parenpq_centroids", OracleAux.centroidsDf(s, ppCents))
    OracleAux.write(dir, "parenpq_codebooks", OracleAux.codebooksDf(s, ppCb))
    // RAW centroids under the SQ paren coarse (the oracle re-derives
    // the range + decode grid from these): the same deterministic
    // KMeans call the IVF16(SQ8) factory route runs internally —
    // the parenPqPq16 twin-call convention
    OracleAux.write(dir, "parensq_centroids",
      OracleAux.centroidsDf(s, cached(s"parensqcents:$dir") {
        graft.cluster.KMeans.fit(bDf(s, dir, 10), "vec",
          graft.cluster.KMeans.Params(k = 16, niter = 4, seed = 1234L))
          .centroids
      }))
    OracleAux.write(dir, "hnswtune_probes", hnswTuneProbes(s, dir))
    OracleAux.write(dir, "parenpca_rot",
      OracleAux.linearDf(s, parenPcaLin(s, dir)))
    OracleAux.write(dir, "ivfbig_centroids",
      OracleAux.centroidsDf(s, ivfBig(s, dir).centroids))
    OracleAux.write(dir, "ivfskew_centroids",
      OracleAux.centroidsDf(s, ivfSkew(s, dir).centroids))
    OracleAux.write(dir, "ondisk_centroids",
      OracleAux.centroidsDf(s, ondiskCents16(s, dir)))
    val ipqb = ivfpqBig(s, dir)
    OracleAux.write(dir, "ivfpqbig_centroids", OracleAux.centroidsDf(s, ipqb.centroids))
    OracleAux.write(dir, "ivfpqbig_codebooks", OracleAux.codebooksDf(s, ipqb.model.codebooks))
    OracleAux.write(dir, "pqfsbig_codebooks",
      OracleAux.codebooksDf(s, pqfsBig(s, dir).model.codebooks))
    val ipqImiBig = imipqBig(s, dir)
    OracleAux.write(dir, "imipqbig_coarse_cb",
      OracleAux.codebooksDf(s, ipqImiBig.coarse.codebooks))
    OracleAux.write(dir, "imipqbig_codebooks",
      OracleAux.codebooksDf(s, ipqImiBig.model.codebooks))
    OracleAux.write(dir, "bivf_centroids",
      OracleAux.bitsDf(s, bivf8(s, dir).centroidBits))
    OracleAux.write(dir, "rq_codebooks",
      OracleAux.codebooksDf(s, rqModel16(s, dir).codebooks))
    // engine-encoded base codes for the LUT search types (ST_LUT_*):
    // the oracle replays decode + LUT arithmetic from these integers
    OracleAux.write(dir, "parensub_big_centroids", {
      import s.implicits._
      val (cb, _) = graft.core.CoarsePq.assignModel(ivfBig(s, dir).centroids, 8)
      cb.zipWithIndex.toSeq.map { case (c, j) => (j, c.toSeq) }.toDF("j", "c")
        .select(col("j"), col("c").cast("array<float>").as("c"))
    })
    OracleAux.write(dir, "parensub_centroids", {
      import s.implicits._
      val (cb, _) = graft.core.CoarsePq.assignModel(ivf16(s, dir).centroids, 4)
      cb.zipWithIndex.toSeq.map { case (c, j) => (j, c.toSeq) }.toDF("j", "c")
        .select(col("j"), col("c").cast("array<float>").as("c"))
    })
    val ppq = parenPqPq16(s, dir)
    OracleAux.write(dir, "parenpqpq_cdec", OracleAux.centroidsDf(s, ppq.centroids))
    OracleAux.write(dir, "parenpqpq_codebooks",
      OracleAux.codebooksDf(s, ppq.model.codebooks))
    OracleAux.write(dir, "minmaxpq_codebooks",
      OracleAux.codebooksDf(s, minmaxPqModel(s, dir).codebooks))
    OracleAux.write(dir, "rqnorm_cq8", {
      import s.implicits._
      rqNormCq(s, dir, 256).zipWithIndex.map { case (c, j) => (j, c) }
        .toSeq.toDF("j", "c")
    })
    OracleAux.write(dir, "rqnorm_cq4", {
      import s.implicits._
      rqNormCq(s, dir, 16).zipWithIndex.map { case (c, j) => (j, c) }
        .toSeq.toDF("j", "c")
    })
    // 2-level norm codecs (rq2x4 greedy / lsq2x4 LSQ-refined): the
    // oracle replays DECODE ONLY from the engine-encoded code pairs —
    // the lsq_codes pattern
    for ((tag, iters) <- Seq(("rq", 0), ("lsq", 3))) {
      val cb = rqNorm2Cb(s, dir, iters)
      OracleAux.write(dir, s"rqnorm_${tag}2x4_cb", {
        import s.implicits._
        (for (l <- cb.indices; j <- cb(l).indices) yield (l, j, cb(l)(j)))
          .toDF("l", "j", "c")
      })
      val enc =
        if (iters == 0) graft.index.RqNorms.rq2EncodeCol(col("normsq"), cb)
        else graft.index.RqNorms.lsq2EncodeCol(col("normsq"), cb)
      OracleAux.write(dir, s"rqnorm_${tag}2x4_codes",
        rqNormBase(s, dir).withColumn("_nc", enc)
          .select(col("id"), element_at(col("_nc"), 1).as("n1"),
            element_at(col("_nc"), 2).as("n2")))
    }
    OracleAux.write(dir, "rq_codes",
      emb(s, dir).filter(col("vec_id") >= 10).select(col("vec_id").as("id"),
        rqModel16(s, dir).encodeCol(col("embedding")).as("codes")))
    // ICM-encoded (LSQ) codes over the same codebooks — the oracle
    // verifies decode-from-codes (the prq/index2layer pattern)
    OracleAux.write(dir, "lsq_codes", lsqCodes(s, dir))
    // RCQ coarse codebooks: the oracle enumerates the codeword sums
    // (exact at the rcq16 full beam) to replay assign + probes
    OracleAux.write(dir, "rcq_codebooks",
      OracleAux.codebooksDf(s, rcq16(s, dir).model.codebooks))
    // OPQ8_32,IVF16,PQ8 pipeline stages
    val (o32p, o32r, o32idx) = opq32Ivfpq(s, dir)
    OracleAux.write(dir, "opq32_pca", OracleAux.linearDf(s, o32p))
    OracleAux.write(dir, "opq32_rot", OracleAux.matrixDf(s, o32r.a))
    OracleAux.write(dir, "opq32_centroids", OracleAux.centroidsDf(s, o32idx.centroids))
    OracleAux.write(dir, "opq32_codebooks", OracleAux.codebooksDf(s, o32idx.model.codebooks))
    OracleAux.write(dir, "imi_codebooks",
      OracleAux.codebooksDf(s, imi16(s, dir).model.codebooks))
    val ipqImi = imipq16(s, dir)
    OracleAux.write(dir, "imipq_coarse_cb",
      OracleAux.codebooksDf(s, ipqImi.coarse.codebooks))
    OracleAux.write(dir, "imipq_codebooks",
      OracleAux.codebooksDf(s, ipqImi.model.codebooks))
    OracleAux.write(dir, "imisq_coarse_cb",
      OracleAux.codebooksDf(s, imisq16(s, dir).coarse.codebooks))
    OracleAux.write(dir, "imisqres_coarse_cb",
      OracleAux.codebooksDf(s, imisqRes16(s, dir).coarse.codebooks))
    OracleAux.write(dir, "kmeans8_centroids",
      OracleAux.centroidsDf(s, km8(s, dir).centroids))
    OracleAux.write(dir, "kmeans_enc_centroids",
      OracleAux.centroidsDf(s, kmEnc8(s, dir)._3.centroids))
    OracleAux.write(dir, "kmeans_sph_centroids",
      OracleAux.centroidsDf(s, kmSph8(s, dir).centroids))
    OracleAux.write(dir, "twolevel_centroids",
      OracleAux.centroidsDf(s, twoLevel12(s, dir)))
    val (prot, pmodel) = pdk8(s, dir)
    OracleAux.write(dir, "pdk_rot", OracleAux.linearDf(s, prot))
    OracleAux.write(dir, "pdk_centroids", OracleAux.centroidsDf(s, pmodel.centroids))
    OracleAux.write(dir, "pca16", OracleAux.linearDf(s, pca16(s, dir)))
    OracleAux.write(dir, "itq32", OracleAux.linearDf(s, itq32(s, dir)))
    OracleAux.write(dir, "simhash_codes",
      simhashCorpus(s, dir).select(col("doc_id").as("cid"),
        simhash64(TF.tokenize(col("text"))).as("code")))
    val tl = twoLayer16(s, dir)
    OracleAux.write(dir, "twolayer_centroids", OracleAux.centroidsDf(s, tl.centroids))
    OracleAux.write(dir, "twolayer_codebooks", OracleAux.codebooksDf(s, tl.model.codebooks))
    // Engine-encoded (id, list_no, code) with the PQ code unpacked to
    // int subquantizer indices: the index2layer oracle verifies
    // DECODE-from-codes (integer lookups + one float add) instead of
    // replaying both chained argmins in DOUBLE — near-tie assignments
    // diverge between float32 (engine) and double (SQL replay), which
    // was the only hash-red row through r05.
    val rmq = resMiq24(s, dir)
    OracleAux.write(dir, "resmiq_coarse_codebooks",
      OracleAux.codebooksDf(s, rmq.coarse.codebooks))
    OracleAux.write(dir, "resmiq_codebooks",
      OracleAux.codebooksDf(s, rmq.model.codebooks))
    // (id, j0, j1, code) with the PQ code unpacked to int indices —
    // the decode-from-codes oracle convention (see twolayer_codes)
    OracleAux.write(dir, "resmiq_codes",
      rmq.codes.select(col("id"),
        (col("cell") / 16).cast("long").cast("int").as("j0"),
        (col("cell") % 16).cast("int").as("j1"),
        transform(sequence(lit(1), lit(8)),
          i => conv(hex(col("code").substr(i, lit(1))), 16, 10).cast("int")).as("code")))
    OracleAux.write(dir, "twolayer_codes",
      tl.codes.select(col("id"), col("list_no"),
        transform(sequence(lit(1), lit(8)),
          i => conv(hex(col("code").substr(i, lit(1))), 16, 10).cast("int")).as("code")))
    val sh = ivfsh8(s, dir)
    OracleAux.write(dir, "sh_centroids", OracleAux.centroidsDf(s, sh.centroids))
    OracleAux.write(dir, "sh_rot", OracleAux.matrixDf(s, sh.vt.a))
    OracleAux.write(dir, "sh_thresh", OracleAux.centroidsDf(s, sh.thresholds))
    OracleAux.write(dir, "ivfsqres_centroids",
      OracleAux.centroidsDf(s, ivfsqRes16(s, dir).centroids))
    OracleAux.write(dir, "ivf8_centroids",
      OracleAux.centroidsDf(s, ivf8(s, dir).centroids))
    val sqm = sqMeanstd(s, dir)
    OracleAux.write(dir, "sq_meanstd_range", {
      import s.implicits._
      sqm.vmin.zip(sqm.vdiff).zipWithIndex.toSeq
        .map { case ((mn, vd), i) => (i, mn, vd) }.toDF("i", "vmn", "vd")
    })
    val prq = prqModel(s, dir)
    OracleAux.write(dir, "prq_codebooks",
      OracleAux.codebooksDf(s, prq.flatCodebooks))
    // engine-encoded PRQ codes (beam=2 + ICM, not SQL-replayable):
    // the oracle verifies decode-from-codes, the index2layer pattern
    OracleAux.write(dir, "prq_codes",
      emb(s, dir).select(col("vec_id").as("id"),
        prq.encodeCol(col("embedding"), beam = 2, icmIters = 2).as("code")))
    // IVF product-AQ trained state (effective zero-padded codebooks —
    // the scan's view; decode replay uses them directly)
    val iprq = ivfPrq8(s, dir)
    OracleAux.write(dir, "ivfprq_centroids",
      OracleAux.centroidsDf(s, iprq.centroids))
    OracleAux.write(dir, "ivfprq_codebooks",
      OracleAux.codebooksDf(s, iprq.model.codebooks))
    OracleAux.write(dir, "ivfprq_codes", iprq.codes)
    // spectral hash with the replaced PCA transform: the twin-call PCA
    // (rotation + mean bias) and coarse centroids
    OracleAux.write(dir, "ivfshpca_rot",
      OracleAux.linearDf(s, ivfShPcaLin(s, dir)))
    OracleAux.write(dir, "ivfshpca_centroids",
      OracleAux.centroidsDf(s, ivfShPcaCents(s, dir)))
    val ivfrq = ivfrq8(s, dir)
    OracleAux.write(dir, "ivfrq_centroids",
      OracleAux.centroidsDf(s, ivfrq.centroids))
    OracleAux.write(dir, "ivfrq_codebooks",
      OracleAux.codebooksDf(s, ivfrq.model.codebooks))
    OracleAux.write(dir, "ivfrq_codes", ivfrq.codes)
    // IVF-prefixed aq_norm clause (IVF8,RQ2x4_Nqint8): trained state
    // of the twin-call build — the oracle replays decode, the stored
    // residual-reconstruction norms, the qint8 grid, probe selection
    // and the LUT arithmetic from these
    val ivfrqn = ivfRqNormTwin(s, dir)
    OracleAux.write(dir, "ivfrqn_centroids",
      OracleAux.centroidsDf(s, ivfrqn.centroids))
    OracleAux.write(dir, "ivfrqn_codebooks",
      OracleAux.codebooksDf(s, ivfrqn.model.codebooks))
    OracleAux.write(dir, "ivfrqn_codes", ivfrqn.codes)
    // ZnLattice: trained norm ranges, engine-encoded per-subvector
    // integer codes, and the enumerated sphere codebook (the dataflow
    // decode_cache, lattice_Zn.h:163) — the oracle replays DECODE only
    // (integer lookups + double arithmetic), the index2layer pattern.
    val zl = znLat16(s, dir)
    OracleAux.write(dir, "zn_range", {
      import s.implicits._
      (0 until zl.nsq).map(j => (j, zl.mins(j), zl.maxs(j))).toDF("j", "mn", "mx")
    })
    OracleAux.write(dir, "zn_codes",
      emb(s, dir).select(col("vec_id").as("id"),
        graft.index.Lattice.subCodesCol(zl, col("embedding")).as("codes")))
    OracleAux.write(dir, "zn_codebook", graft.index.Lattice.codebookDf(s, zl))
  }

  /** Root the static sidecar-oracle SQLs read from: the driver's
    * correctness gate always runs at sf0.01. */
  private val AUX = s"${OracleAux.Root}/sf0.01"

  // ---- at-scale vector table -------------------------------------------
  // The embeddings table is tiny even at sf0.1 (2,000 rows), so vector
  // plans there are overhead-dominated. This derives a |lineitem|-sized
  // (600k rows at sf0.1) d=8 float vector table with exact-arithmetic
  // features (no dates, no floating parity risk), used by the *_big
  // queries that actually stress the scan/prune/top-k machinery.
  // Row id = 60-bit md5 content hash over integer-exact column casts:
  // the synthetic lineitem has no unique natural key ((orderkey,
  // linenumber) repeats with different payloads), and the hash is
  // reproducible verbatim in DuckDB (same trick as the minhash
  // oracle). Full-row duplicates collapse under DISTINCT identically
  // in both engines.
  /** Bench-only fixture multiplier (SPARK_GRAFT_SCALE_X, default 1,
    * max 16): the sf1-equivalent scaling tier replicates the derived
    * big fixtures 10x with per-copy id shifts and perturbations
    * (VERDICT r13 #4 — pushes SCALING.md a decade past the overhead
    * floor without writing to the read-only testdata). The driver's
    * correctness gate never sets it, so every oracle run sees the
    * scaleX = 1 derivations bit-identical to r13. */
  private def scaleX: Int = {
    val x = sys.env.get("SPARK_GRAFT_SCALE_X")
      .map(_.trim.toInt).filter(_ > 1).getOrElse(1)
    require(x <= 16, s"SPARK_GRAFT_SCALE_X=$x exceeds the 4-bit id shift")
    x
  }
  private def bigVecs(s: SparkSession, dir: String): DataFrame =
    cached(s"bigvecs:$dir") {
      val key = concat_ws("|",
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("l_partkey").cast("long"), col("l_suppkey").cast("long"),
        col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      // widen before hashing: the sf0.1 lineitem parquet arrives as a
      // couple of file splits, which would run the 600k md5 derivations
      // on as few cores (same fix as Dedup.widen). Project to the 8
      // consumed columns FIRST so the widening shuffle moves only the
      // bytes the derivation reads.
      val src = {
        val li = lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"))
        val target = s.sparkContext.defaultParallelism
        if (li.rdd.getNumPartitions >= target) li else li.repartition(target)
      }
      val derived = src.select(
        graft.llm.TextFunctions.fingerprint60(key).as("id"),
        array(
          col("l_quantity") / 50.0,
          col("l_extendedprice") / 100000.0,
          col("l_discount") * 10.0,
          col("l_tax") * 10.0,
          (col("l_partkey") % 1000) / 1000.0,
          (col("l_suppkey") % 100) / 100.0,
          (col("l_orderkey") % 97) / 97.0,
          col("l_linenumber") / 7.0
        ).cast("array<float>").as("vec"))
        .distinct()
      // bench-only sf1-equivalent tier (VERDICT r13 #4): replicate the
      // derived table SPARK_GRAFT_SCALE_X times with distinct ids
      // (60-bit hash truncated to 56 and shifted — no long overflow)
      // and a per-copy float perturbation so the copies are distinct
      // vectors, not co-located duplicates. scaleX = 1 (every oracle
      // run) leaves the derivation bit-identical.
      val scaled =
        if (scaleX <= 1) derived
        else derived
          .select(col("id"), col("vec"),
            explode(sequence(lit(0), lit(scaleX - 1))).as("_k"))
          .select(
            (shiftleft(col("id").bitwiseAND(lit((1L << 56) - 1)), 4) + col("_k"))
              .as("id"),
            transform(col("vec"),
              x => x + col("_k").cast("float") * lit(1.0e-4f)).as("vec"))
      val df = scaled
        // feeds every *_big query (flat scan, index builds, searches):
        // cache the ~30 MB derived table once per session rather than
        // re-running the md5+distinct shuffle per action
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
  /** ~1 query per 10k base rows, deterministically spread. */
  private def bigQueries(s: SparkSession, dir: String): DataFrame =
    bigVecs(s, dir).filter(col("id") % 9973 === 1)
      .select(col("id").as("qid"), col("vec").as("qvec"))
  /** Exact top-10 ground truth over the big table — the shared recall
    * denominator of every *_partition_search gate (tiny result:
    * |queries| x 10 rows; memoized so the three recall-gated queries
    * compute it once, the same reuse contract as the trained models). */
  private def bigTruth(s: SparkSession, dir: String): DataFrame =
    cached(s"bigtruth:$dir") {
      val t = Knn.knnJoin(bigQueries(s, dir), bigVecs(s, dir), 10)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.count()
      t
    }
  private val bigVecSql =
    """SELECT DISTINCT ('0x' || substr(md5(
      |    l_orderkey::BIGINT::VARCHAR || '|' || l_linenumber::BIGINT::VARCHAR || '|' ||
      |    l_partkey::BIGINT::VARCHAR || '|' || l_suppkey::BIGINT::VARCHAR || '|' ||
      |    l_quantity::BIGINT::VARCHAR || '|' || round(l_extendedprice*100)::BIGINT::VARCHAR || '|' ||
      |    round(l_discount*100)::BIGINT::VARCHAR || '|' || round(l_tax*100)::BIGINT::VARCHAR), 1, 15))::BIGINT AS id,
      |  [l_quantity/50.0, l_extendedprice/100000.0, l_discount*10.0, l_tax*10.0,
      |   (l_partkey % 1000)/1000.0, (l_suppkey % 100)/100.0,
      |   (l_orderkey % 97)/97.0, l_linenumber/7.0]::REAL[] AS vec
      |FROM lineitem""".stripMargin
  private def ivfBig(s: SparkSession, dir: String): IvfIndex =
    cached(s"ivfbig:$dir") {
      val idx = IvfIndex.build(bigVecs(s, dir), "id", "vec", nlist = 64, niter = 4)
      // materialize the assignment once: every search re-scans the
      // invlists, and the assign expression over 600k rows shouldn't
      // re-run per probe action
      idx.invlists.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      idx
    }
  /** Deliberately SKEWED big-vector table: half the rows (id % 2 = 0)
    * collapse into a tight cluster near the origin (vec * 0.001f), so
    * a trained IVF puts ~50% of the corpus into ONE hot list
    * (imbalance_factor >> 1) — the shape that kills a naive
    * list-partitioned scan at 100 TB. Float multiply replays exactly
    * in DuckDB (REAL * REAL stays REAL). */
  private def skewVecs(s: SparkSession, dir: String): DataFrame =
    cached(s"skewvecs:$dir") {
      bigVecs(s, dir).select(col("id"),
        when(pmod(col("id"), lit(2)) === 0,
          transform(col("vec"), x => x * lit(0.001f)))
          .otherwise(col("vec")).as("vec"))
    }
  /** IVF over the skewed table: one hot list with ~half the rows. */
  private def ivfSkew(s: SparkSession, dir: String): IvfIndex =
    cached(s"ivfskew:$dir") {
      val idx = IvfIndex.build(skewVecs(s, dir), "id", "vec",
        nlist = 16, niter = 4)
      idx.invlists.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .count()
      idx
    }
  private def ivfpqBig(s: SparkSession, dir: String): graft.index.IvfPqIndex =
    cached(s"ivfpqbig:$dir") {
      graft.index.IvfPqIndex.build(bigVecs(s, dir), "id", "vec",
        nlist = 64, m = 4, ksub = 16, niterCoarse = 4, niterPq = 4)
    }
  private def pqfsBig(s: SparkSession, dir: String): graft.index.Pq4FastScanIndex =
    cached(s"pqfsbig:$dir") {
      graft.index.Pq4FastScanIndex.build(bigVecs(s, dir), "id", "vec",
        m = 4, niter = 4)
    }
  /** IMI2x3,PQ4 at scale (the SIFT1B flagship composition on the
    * 600k-row derived table): 64 cartesian cells from two 8-entry
    * half-space codebooks, 4-byte residual PQ codes. */
  private def imipqBig(s: SparkSession, dir: String): graft.index.ImiPqIndex =
    cached(s"imipqbig:$dir") {
      graft.index.ImiPqIndex.build(bigVecs(s, dir), "id", "vec",
        ksub = 8, m = 4, pqKsub = 16, niterCoarse = 4, niterPq = 4)
    }
  private def bivf8(s: SparkSession, dir: String): graft.index.BinaryIvfIndex =
    cached(s"bivf8:$dir") {
      graft.index.BinaryIvfIndex.buildFromVectors(bDf(s, dir, 10), "id", "vec",
        nlist = 8, niter = 4)
    }
  private def imi16(s: SparkSession, dir: String): graft.index.ImiIndex =
    cached(s"imi16:$dir") {
      graft.index.ImiIndex.build(bDf(s, dir, 10), "id", "vec", ksub = 16, niter = 4)
    }
  /** IMI2x4,PQ8 (IndexIVFPQ over the multi-index coarse — the SIFT1B
    * flagship composition at test scale, index_factory.cpp:834-878). */
  private def imipq16(s: SparkSession, dir: String): graft.index.ImiPqIndex =
    cached(s"imipq16:$dir") {
      graft.index.ImiPqIndex.build(bDf(s, dir, 10), "id", "vec", ksub = 16,
        m = 8, pqKsub = 16, niterCoarse = 4, niterPq = 4)
    }
  /** IMI2x4,SQ8 (IndexIVFScalarQuantizer over the multi-index coarse
    * — the grammar composes IMI with any IVF code). */
  private def imisq16(s: SparkSession, dir: String): graft.index.ImiSqIndex =
    cached(s"imisq16:$dir") {
      graft.index.ImiSqIndex.build(bDf(s, dir, 10), "id", "vec", ksub = 16,
        qtype = "SQ8", niterCoarse = 4)
    }
  /** The by_residual=true IMI+SQ form — what the factory builds. */
  private def imisqRes16(s: SparkSession, dir: String): graft.index.ImiSqIndex =
    cached(s"imisqres16:$dir") {
      graft.index.ImiSqIndex.build(bDf(s, dir, 10), "id", "vec", ksub = 16,
        qtype = "SQ8", niterCoarse = 4, byResidual = true)
    }
  private def rqModel16(s: SparkSession, dir: String): graft.index.RqModel =
    cached(s"rq16:$dir") {
      graft.index.Rq.train(emb(s, dir).select(col("embedding")), "embedding",
        levels = 2, k = 16, niter = 4)
    }
  /** Inner-PQ model of the MinMax,PQ8 wrapper — trained on the scaled
    * rows through the same deterministic calls roundtripDf makes. */
  private def minmaxPqModel(s: SparkSession, dir: String): graft.index.PqModel =
    cached(s"minmaxpq:$dir") {
      val scaled = graft.index.MinMaxCodec.scaledDf(
        emb(s, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", fp16Coeffs = false)
      // bounded-sample in-memory training — the reference's k-means
      // max_points_per_centroid convention (Clustering.h:42: ~256
      // training points per centroid, never the full add set), so the
      // sample is a CONSTANT-size collect at any sf and the driver
      // Lloyd runs in microseconds where the distributed trainer pays
      // m*niter fixed job overheads. Deterministic: id-ordered prefix
      // of the id-residue sample, seeded local k-means.
      val n = scaled.count()
      val samp = (if (n >= 8192) scaled.filter(pmod(col("id"), lit(8)) === 0)
        else scaled)
        .orderBy(col("id")).limit(4096)
        .select(col("_scaled")).collect()
        .map(_.getSeq[Float](0).toArray)
      val (cb, _) = graft.core.CoarsePq.trainEncode(samp, 8, 16,
        niter = 10, seed = 1234L)
      graft.index.PqModel(8, 16, samp(0).length / 8, cb)
    }
  /** (id, codes, normsq) base table of the AQ LUT search types — RQ
    * codes + the decoded-vector norm stored at add time. */
  private def rqNormBase(s: SparkSession, dir: String): DataFrame =
    cached(s"rqnormbase:$dir") {
      val rq = rqModel16(s, dir)
      bDf(s, dir, 10)
        .select(col("id"), rq.encodeCol(col("vec")).as("codes"))
        .withColumn("normsq", aggregate(
          rq.decodeCol(col("codes")).cast("array<double>"),
          lit(0.0), (a, x) => a + x * x))
        .cache()
    }
  /** Trained [norm_min, norm_max] (AdditiveQuantizer::train_norm). */
  private def rqNormRange(s: SparkSession, dir: String): (Double, Double) =
    cached(s"rqnrange:$dir") {
      graft.index.RqNorms.range(rqNormBase(s, dir), "normsq")
    }
  /** cqint<b> 1-D norm codebook (Clustering1D::train_exact). */
  private def rqNormCq(s: SparkSession, dir: String, k: Int): Array[Double] =
    cached(s"rqcq$k:$dir") {
      graft.index.RqNorms.cqCentroids(rqNormBase(s, dir), "normsq", k)
    }
  /** Two-level 1-D norm codebooks over the stored norms —
    * `lsqIters = 0` is the greedy rq2x4 trainer, `> 0` the
    * LSQ-refined lsq2x4 one (ST_norm_rq2x4 / ST_norm_lsq2x4). */
  private def rqNorm2Cb(s: SparkSession, dir: String, lsqIters: Int): Array[Array[Double]] =
    cached(s"rqn2cb$lsqIters:$dir") {
      graft.index.RqNorms.norm2Codebooks(rqNormBase(s, dir), "normsq",
        lsqIters = lsqIters)
    }
  /** Shared engine chain of the quantized-norm AQ search types
    * (ST_norm_qint8/qint4/cqint8/cqint4): identical to rq_lut_search
    * except the stored ||x̂||² term goes through `dec`. */
  private def rqQnormSearch(s: SparkSession, dir: String,
      dec: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val rq = rqModel16(s, dir)
    val b = rqNormBase(s, dir).withColumn("nq", dec(col("normsq")))
    val q = qDf(s, dir, 10).select(col("qid"), rq.lutCol(col("qvec")).as("lut"),
      aggregate(col("qvec").cast("array<double>"), lit(0.0),
        (a, x) => a + x * x).as("qn"))
    b.crossJoin(broadcast(q))
      .select(col("qid"), col("id"),
        (col("qn") - lit(2.0) * rq.ipFromLutCol(col("codes"), col("lut"))
          + col("nq")).as("_d"))
      .groupBy(col("qid"))
      .agg(topk(col("_d"), col("id"), 5, asc = true).as("_tk"))
      .select(col("qid"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
      .select(col("qid"), (col("_pos") + 1).cast("long").as("rank"),
        col("_r.id").as("id"), round(col("_r.dist"), 4).as("dist"))
  }
  private def prqModel(s: SparkSession, dir: String): graft.index.PrqModel =
    cached(s"prq:$dir") {
      graft.index.Prq.train(emb(s, dir).select(col("embedding")), "embedding",
        nsplit = 2, levels = 2, k = 16, niter = 4, beam = 2)
    }
  private def ivfrq8(s: SparkSession, dir: String): graft.index.IvfRqIndex =
    cached(s"ivfrq8:$dir") {
      graft.index.IvfRq.build(bDf(s, dir, 10), "id", "vec",
        nlist = 8, levels = 2, k = 16, niterCoarse = 4, niterRq = 4,
        beam = 2, icmIters = 1)
    }
  /** LSQ codes (IndexLocalSearchQuantizer, IndexAdditiveQuantizer.h:119):
    * the rq16 codebooks ENCODED by iterated conditional modes
    * (LocalSearchQuantizer::icm_encode — RqKernels.encodeIcm) instead
    * of beam search; decode/search are the shared AQ paths. */
  private def lsqCodes(s: SparkSession, dir: String): DataFrame =
    cached(s"lsqcodes:$dir") {
      bDf(s, dir, 10).select(col("id"),
        rqModel16(s, dir).encodeCol(col("vec"), beam = 1, icmIters = 2).as("codes"))
    }
  /** IVF16(RCQ2x2),Flat at FULL beam (16 = nlist = 4^2): assignment
    * and probe selection degenerate to the exact argmin over the
    * enumerated codeword sums, so the oracle can replay them from the
    * codebooks sidecar. */
  private def rcq16(s: SparkSession, dir: String): graft.index.IvfRcqFlatIndex =
    cached(s"rcq16:$dir") {
      graft.index.IvfRcq.build(bDf(s, dir, 10), "id", "vec",
        levels = 2, bits = 2, beam = 16, niter = 4)
    }
  /** The OPQ8_32,IVF16,PQ8 pipeline (dimension-changing OPQ prefix,
    * reference tests/test_factory.py OPQ16_64 form): PCA 64→32, OPQ
    * rotation in the reduced space, residual IVFPQ — the exact steps
    * IndexFactory takes for the same string at niter = 4, held as
    * pieces so the sidecars can replay each stage. */
  private def opq32Ivfpq(s: SparkSession, dir: String):
      (graft.transform.Linear, graft.transform.Linear, graft.index.IvfPqIndex) =
    cached(s"opq32ivfpq:$dir") {
      val base = bDf(s, dir, 10)
      val p = graft.transform.Transforms.pca(base, "vec", 32)
      val reduced = base.withColumn("vec", p.applyCol(col("vec")))
      val (rot, _) = graft.transform.Opq.trainOpq(reduced, "vec", 8,
        ksub = 16, outerIters = 2, pqIters = 4)
      val rotated = reduced.withColumn("vec", rot.applyCol(col("vec")))
      val idx = graft.index.IvfPqIndex.build(rotated, "id", "vec",
        nlist = 16, m = 8, ksub = 16, niterCoarse = 4, niterPq = 4)
      (p, rot, idx)
    }
  /** ZnLattice16x10_8 over the d=64 embeddings: 16 subvectors of
    * dim 4, sphere r2=10 (nv=144 points, 8-bit lattice code), 8-bit
    * scale (faiss/IndexLattice.h:22; factory index_factory.cpp:536). */
  private def znLat16(s: SparkSession, dir: String): graft.core.LatticeCodec =
    cached(s"znlat16:$dir") {
      graft.index.Lattice.train(emb(s, dir), "embedding",
        nsq = 16, scaleNbit = 8, r2 = 10)
    }
  private def docsDf(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
  /** Embeddings with planted exact duplicates (vec_id + 10000): the
    * corpus the embedding near-dup and semantic-dedup queries run on
    * (guarantees >= 0.95-cosine pairs exist at any sf). */
  private def doubledEmb(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    e.unionByName(
      e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
  }
  /** The verified >= 0.95-cosine embedding near-dup pair set, shared
    * by the pair-listing and semantic-dedup queries (same
    * run-once-per-session contract as [[nearDups08]]). */
  private def embPairs95(s: SparkSession, dir: String): DataFrame =
    cached(s"embpairs95:$dir") {
      Dedup.embeddingNearDups(doubledEmb(s, dir), "vec_id", "embedding", 0.95)
    }
  /** The one MinHash-LSH near-dup pipeline at the catalog's standard
    * parameters, shared by every query that consumes its verified
    * pairs (candidates, corpus dedup) — the signature+band+verify
    * pipeline is the most expensive job in the catalog and must run
    * once per session, not once per consuming query. */
  private def nearDups08(s: SparkSession, dir: String): DataFrame =
    cached(s"neardups08:$dir") {
      Dedup.nearDupPairs(docsDf(s, dir), "doc_id", "text",
        threshold = 0.8, ngram = 3, hashes = 12, bands = 4)
    }
  private def commentPairs(s: SparkSession, dir: String): DataFrame =
    cached(s"commentPairs:$dir") {
      Dedup.nearDupPairs(commentCorpus(s, dir), "doc_id", "text",
        threshold = 0.8, ngram = 3, hashes = 12, bands = 4)
    }

  // DuckDB SQL fragments ------------------------------------------------
  private val dL2 = "list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2"
  private val dIp = "list_inner_product(q.embedding::DOUBLE[], b.embedding::DOUBLE[])"
  private val dCos = "list_cosine_similarity(q.embedding::DOUBLE[], b.embedding::DOUBLE[])"
  private val dL1 =
    "list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> abs(p[1]-p[2])), 'sum')"
  private val dLinf =
    "list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> abs(p[1]-p[2])), 'max')"
  private val dLp3 =
    "list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> abs(p[1]-p[2])^3), 'sum')"
  private val dCanb =
    "list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> CASE WHEN abs(p[1])+abs(p[2]) > 0 THEN abs(p[1]-p[2])/(abs(p[1])+abs(p[2])) ELSE 0 END), 'sum')"
  // float (generalized) Jaccard over |x| vectors: (sum max - sum min) /
  // sum max — the same formula order as VecKernels.jaccardFloat so the
  // doubles agree bit-for-bit before rounding
  private val dJacSumMin =
    "list_aggregate(list_transform(list_zip(list_transform(q.embedding::DOUBLE[], v -> abs(v)), list_transform(b.embedding::DOUBLE[], v -> abs(v))), p -> least(p[1], p[2])), 'sum')"
  private val dJacSumMax =
    "list_aggregate(list_transform(list_zip(list_transform(q.embedding::DOUBLE[], v -> abs(v)), list_transform(b.embedding::DOUBLE[], v -> abs(v))), p -> greatest(p[1], p[2])), 'sum')"
  private val dJacF =
    s"(CASE WHEN $dJacSumMax = 0 THEN 1.0 ELSE ($dJacSumMax - $dJacSumMin) / $dJacSumMax END)"
  // float Hamming over floor(x*2)-quantized vectors: mismatch count
  private val dHamF =
    "list_aggregate(list_transform(list_zip(list_transform(q.embedding::DOUBLE[], v -> floor(v*2)), list_transform(b.embedding::DOUBLE[], v -> floor(v*2))), p -> CASE WHEN p[1] <> p[2] THEN 1.0 ELSE 0.0 END), 'sum')"

  /** Windowed-top-k oracle: the SQL-expressible form of the TopK
    * aggregate (SURVEY §2.5). */
  private def knnOracle(dist: String, qPred: String, bPred: String, k: Int,
      desc: Boolean = false): String = {
    val ord = if (desc) s"$dist DESC, b.vec_id" else s"$dist, b.vec_id"
    s"""SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
       |  SELECT q.vec_id AS qid, b.vec_id AS id, $dist AS dist,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $ord) AS "rank"
       |  FROM embeddings q CROSS JOIN embeddings b
       |  WHERE $qPred AND $bPred) t
       |WHERE "rank" <= $k""".stripMargin
  }

  /** Probe-replay IVF oracle at nprobe=4, parameterized by the
    * centroid sidecar: shared by the exact coarse assign
    * (`ivf_search_nprobe4`), its HNSW-degenerate twin
    * (`ivf_hnsw_search`), and — over the two-level-trained
    * `ondisk_centroids` sidecar — the distributed_ondisk recipe
    * (whose merged store must search exactly like a single build
    * against the same quantizer). */
  private def ivfNprobe4SqlOver(centName: String): String =
    s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/$centName/*.parquet')),
       |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
       |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
       |basg AS (SELECT id, list_no FROM (
       |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
       |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
       |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
       |d AS (SELECT p.qid, a.id,
       |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
       |  FROM probes p JOIN basg a ON a.list_no = p.list_no
       |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
       |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
       |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
       |WHERE "rank" <= 10""".stripMargin

  private lazy val ivfNprobe4Sql: String = ivfNprobe4SqlOver("ivf16_centroids")
  private lazy val ondiskNprobe4Sql: String = ivfNprobe4SqlOver("ondisk_centroids")

  /** Probe-replay IVF oracle at nprobe=8 over the big corpus + ivfbig
    * centroid sidecar — shared by the single-build search
    * (`ivf_search_big`) and the distributed_ondisk recipe's big twin
    * (same quantizer ⇒ merged shard-built store must return the
    * identical top-k: the merge≡single-index invariant of
    * tests/test_merge.cpp at scale). */
  private lazy val ivfBigNprobe8Sql: String =
    s"""WITH v AS ($bigVecSql),
       |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfbig_centroids/*.parquet')),
       |qc AS (SELECT q.id AS qid, c.list_no, row_number() OVER (PARTITION BY q.id ORDER BY
       |    list_aggregate(list_transform(list_zip(q.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
       |  FROM v q CROSS JOIN cent c WHERE q.id % 9973 = 1),
       |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 8),
       |basg AS (SELECT id, list_no FROM (
       |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
       |    list_aggregate(list_transform(list_zip(b.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
       |  FROM v b CROSS JOIN cent c) t WHERE rn = 1),
       |d AS (SELECT p.qid, a.id,
       |    list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2 AS dist
       |  FROM probes p JOIN basg a ON a.list_no = p.list_no
       |  JOIN v q ON q.id = p.qid JOIN v b ON b.id = a.id)
       |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
       |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
       |WHERE "rank" <= 10""".stripMargin

  /** Quantized-norm AQ oracle for the 2-level 1-D codecs
    * (ST_norm_rq2x4 / ST_norm_lsq2x4): the shared rq_codes decode
    * chain with the stored-norm term DECODED from the engine-encoded
    * code pairs (`rqnorm_<tag>2x4_codes`) against the codebook
    * sidecar — nqd = cb1[n1] + cb2[n2]. */
  private def rqNorm2x4Sql(tag: String): String =
    s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
       |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
       |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1
       |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
       |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
       |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rqnorm_${tag}2x4_cb/*.parquet')),
       |ncodes AS (SELECT id, n1, n2 FROM read_parquet('$AUX/rqnorm_${tag}2x4_codes/*.parquet')),
       |nq AS (SELECT d.id, d.cv0, d.cv1, c1.c + c2.c AS nqd
       |  FROM dec d JOIN ncodes nc ON nc.id = d.id
       |  JOIN ncb c1 ON c1.l = 0 AND c1.j = nc.n1
       |  JOIN ncb c2 ON c2.l = 1 AND c2.j = nc.n2),
       |d AS (SELECT q.vec_id AS qid, nq.id,
       |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], q.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')
       |     - 2*(list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
       |        + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')))
       |    + nq.nqd AS dist
       |  FROM nq CROSS JOIN embeddings q WHERE q.vec_id < 10)
       |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
       |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
       |WHERE "rank" <= 5""".stripMargin

  /** Full IVFPQ replay at nprobe = nlist, parameterized by the
    * centroid/codebook sidecars — shared by the exact coarse assign
    * (`ivfpq_search`), its HNSW-coarse degenerate twin, and the
    * lossy-quantizer composition (whose "centroids" are the decoded
    * table). */
  private def ivfpqFullProbeSql(centName: String, cbName: String): String =
    s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/$centName/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/$cbName/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qres AS (SELECT q.vec_id AS qid, c.list_no,
              |    list_transform(list_zip(q.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin

  private lazy val ivfpqNprobe8Sql: String =
    ivfpqFullProbeSql("ivfpq_centroids", "ivfpq_codebooks")

  /** Quantized-LUT integer fast-scan replay at nprobe=4, shared by
    * `ivfpq4fs_search` and its HNSW-coarse degenerate twin. */
  private lazy val ivfpq4fsNprobe4Sql: String =
    s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpqfs_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpqfs_codebooks/*.parquet')),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j
              |  JOIN basg ba ON ba.id = e.id JOIN probes p ON p.qid = l.qid AND p.list_no = ba.list_no
              |  GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid WHERE "rank" <= 10""".stripMargin

  /** by_residual IVF-SQ replay at nprobe = nlist, shared by
    * `ivfsq_residual_search` and its HNSW-coarse degenerate twin. */
  private lazy val ivfsqResidualSql: String =
    s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfsqres_centroids/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |dims AS (
              |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
              |    SELECT i, min(e) AS mn, max(e) AS mx
              |    FROM (SELECT unnest(res::DOUBLE[]) AS e, generate_subscripts(res, 1) AS i
              |          FROM bres) u GROUP BY i) t),
              |dec AS (SELECT id, list_no,
              |  list_transform(res::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
              |  FROM bres, dims),
              |qres AS (SELECT q.vec_id AS qid, c.list_no,
              |    list_transform(list_zip(q.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qd AS (SELECT qr.qid, b.id,
              |  list_aggregate(list_transform(list_zip(qr.res::DOUBLE[], b.dv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM dec b JOIN qres qr ON qr.list_no = b.list_no)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
              |  FROM qd) w WHERE "rank" <= 5""".stripMargin

  /** Full IVFPQ replay at scale (nprobe=8 over the ivfpqbig
    * sidecars) — shared by the exact coarse assign
    * (`ivfpq_search_big`) and its HNSW-coarse degenerate twin. */
  private lazy val ivfpqBigSql: String =
    s"""WITH v AS ($bigVecSql),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpqbig_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpqbig_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM v b CROSS JOIN cent c) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.vec, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN v b ON b.id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*2+1:r.m*2+2]::DOUBLE[] AS sv
              |         FROM bres, range(0,4) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qc AS (SELECT q.id AS qid, c.list_no, q.vec, c.c, row_number() OVER (PARTITION BY q.id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM v q CROSS JOIN cent c WHERE q.id % 9973 = 1),
              |qres AS (SELECT qid, list_no,
              |    list_transform(list_zip(vec, c), p -> p[1] - p[2]) AS res
              |  FROM qc WHERE pr <= 8),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*2+1:r.m*2+2]::DOUBLE[] AS sv
              |         FROM qres, range(0,4) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin

  // ---------------------------------------------------------------------
  // The catalog. Names are stable keys; comments map to SURVEY.md §2 rows.
  // ---------------------------------------------------------------------
  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // §2.3 IndexFlat::search — exact brute-force kNN, per metric
    ("knn_flat_l2", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 10)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 10))),

    ("knn_flat_ip", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 10, metric = "ip")
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dIp, "q.vec_id < 10", "b.vec_id >= 10", 10, desc = true))),

    ("knn_flat_cosine", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 10, metric = "cosine")
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dCos, "q.vec_id < 10", "b.vec_id >= 10", 10, desc = true))),

    ("knn_flat_l1", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5, metric = "l1")
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL1, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    ("knn_flat_linf", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5, metric = "linf")
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dLinf, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.8 metric_arg / Lp metric
    ("knn_flat_lp3", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5, metric = "lp", metricArg = 3.0)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dLp3, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    ("knn_flat_canberra", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5, metric = "canberra")
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dCanb, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    ("knn_flat_braycurtis", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5, metric = "braycurtis")
        .withColumn("dist", r4("dist")),
      Some(knnOracle(
        "CASE WHEN list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> abs(p[1]+p[2])), 'sum') > 0 THEN list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> abs(p[1]-p[2])), 'sum') / list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), p -> abs(p[1]+p[2])), 'sum') ELSE 0 END",
        "q.vec_id < 10", "b.vec_id >= 10", 5))),

    ("knn_flat_jensenshannon", (s: SparkSession, dir: String) => {
      // JS needs nonnegative components: search over |x| vectors
      val absv = (c: org.apache.spark.sql.Column) => transform(c, x => abs(x))
      Knn.knnJoin(
        qDf(s, dir, 10).withColumn("qvec", absv(col("qvec"))),
        bDf(s, dir, 10).withColumn("vec", absv(col("vec"))), 5,
        metric = "jensenshannon")
        .withColumn("dist", r4("dist"))
    },
      Some(knnOracle(
        "0.5 * list_aggregate(list_transform(list_zip(list_transform(q.embedding::DOUBLE[], v -> abs(v)), list_transform(b.embedding::DOUBLE[], v -> abs(v))), p -> CASE WHEN p[1] > 0 AND p[2] > 0 THEN p[1]*ln(p[1]/((p[1]+p[2])/2)) + p[2]*ln(p[2]/((p[1]+p[2])/2)) ELSE 0 END), 'sum')",
        "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.8 the MyScale fork's float-enum METRIC_JACCARD
    // (faiss/MetricType.h:27; binary kernel utils/binary_distances.h
    // bvec_jaccard generalized to sum-min/sum-max over reals).
    // Jaccard needs nonnegative components: search over |x| vectors.
    ("knn_flat_jaccard", (s: SparkSession, dir: String) => {
      val absv = (c: org.apache.spark.sql.Column) => transform(c, x => abs(x))
      Knn.knnJoin(
        qDf(s, dir, 10).withColumn("qvec", absv(col("qvec"))),
        bDf(s, dir, 10).withColumn("vec", absv(col("vec"))), 5,
        metric = "jaccard")
        .withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dJacF, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.8 the fork's float-enum METRIC_HAMMING (faiss/MetricType.h:28;
    // popcount(a XOR b) generalized to component mismatch count).
    // Quantize to floor(x*2) first so mismatch counts are non-trivial
    // on continuous embeddings (and exactly replayable: integer-valued
    // floats on both sides).
    ("knn_flat_hamming_float", (s: SparkSession, dir: String) => {
      val quant = (c: org.apache.spark.sql.Column) =>
        transform(c, x => floor(x.cast("double") * 2).cast("float"))
      Knn.knnJoin(
        qDf(s, dir, 10).withColumn("qvec", quant(col("qvec"))),
        bDf(s, dir, 10).withColumn("vec", quant(col("vec"))), 5,
        metric = "hamming")
        .withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dHamF, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.3 flat range search (radius theta-join, long-format output)
    ("range_search_l2", (s: SparkSession, dir: String) =>
      Knn.rangeJoin(qDf(s, dir, 20), bDf(s, dir, 20), 1.45)
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT q.vec_id AS qid, b.vec_id AS id, round($dL2, 4) AS dist
              |FROM embeddings q CROSS JOIN embeddings b
              |WHERE q.vec_id < 20 AND b.vec_id >= 20 AND $dL2 < 1.45""".stripMargin)),

    // §2.3 Index::assign (1-NN)
    ("assign_1nn", (s: SparkSession, dir: String) =>
      Knn.assign(qDf(s, dir, 50), bDf(s, dir, 50))
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT qid, id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $dL2, b.vec_id) AS rn
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 50 AND b.vec_id >= 50) t WHERE rn = 1""".stripMargin)),

    // §2.3 pairwise distance matrix
    ("pairwise_l2", (s: SparkSession, dir: String) =>
      Knn.pairwise(qDf(s, dir, 8), bDf(s, dir, 0).filter(col("id") < 8))
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT q.vec_id AS qid, b.vec_id AS id, round($dL2, 4) AS dist
              |FROM embeddings q CROSS JOIN embeddings b
              |WHERE q.vec_id < 8 AND b.vec_id < 8""".stripMargin)),

    // §2.3 knn_by_idx — kNN over per-query candidate lists
    ("knn_by_idx", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 5); val b = bDf(s, dir, 10)
      val cand = b.select(col("id")).crossJoin(q.select(col("qid")))
        .filter(col("id") % 5 === col("qid") % 5)
      Knn.knnByIdx(q, b, cand, 3).withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dL2, "q.vec_id < 5", "b.vec_id >= 10 AND b.vec_id % 5 = q.vec_id % 5", 3))),

    // §2.2 IDSelectorRange pushdown
    ("knn_idsel_range", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5,
        filter = Some(col("id").between(100, 299)))
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id BETWEEN 100 AND 299", 5))),

    // §2.2 IDSelectorArray (isin)
    ("knn_idsel_array", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5,
        filter = Some(col("id").isin(14L to 147L by 7L: _*)))
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10",
        s"b.vec_id IN (${(14L to 147L by 7L).mkString(",")})", 5))),

    // §2.2 IDSelectorBatch (broadcast semi-join against an id set)
    ("knn_idsel_batch", (s: SparkSession, dir: String) => {
      val base = bDf(s, dir, 10)
      val ids = base.select(col("id")).filter(col("id") % 7 === 0)
      val filtered = base.join(broadcast(ids), Seq("id"), "left_semi")
      Knn.knnJoin(qDf(s, dir, 10), filtered, 5).withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10 AND b.vec_id % 7 = 0", 5))),

    // §2.2 IDSelectorBitmap (arbitrary per-id bit: even ids)
    ("knn_idsel_bitmap", (s: SparkSession, dir: String) =>
      Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5,
        filter = Some(col("id") % 2 === 0))
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10 AND b.vec_id % 2 = 0", 5))),

    // §2.2 IDSelectorNot (anti-join rewrite)
    ("knn_idsel_not", (s: SparkSession, dir: String) => {
      val base = bDf(s, dir, 10)
      val del = base.select(col("id")).filter(col("id") % 3 === 0)
      val filtered = base.join(broadcast(del), Seq("id"), "left_anti")
      Knn.knnJoin(qDf(s, dir, 10), filtered, 5).withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10 AND b.vec_id % 3 <> 0", 5))),

    // §2.2 reconstruct / reconstruct_batch (point lookups by id).
    // Output is exploded to scalar (vec_id, dim, val) rows: the driver's
    // comparator cannot sort array-typed cells (VERDICT r02 finding #1).
    ("reconstruct", (s: SparkSession, dir: String) =>
      emb(s, dir).filter(col("vec_id").isin(3L, 7L, 11L, 123L))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("_p", "_e")))
        .select(col("vec_id"), (col("_p") + 1).cast("long").as("dim"),
          round(col("_e").cast("double"), 4).as("val")),
      Some("""SELECT vec_id, generate_subscripts(embedding, 1)::BIGINT AS dim,
             |  round(unnest(embedding::DOUBLE[]), 4) AS val
             |FROM embeddings WHERE vec_id IN (3, 7, 11, 123)""".stripMargin)),

    // §2.2 reconstruct_n (contiguous id range), exploded like reconstruct
    ("reconstruct_n", (s: SparkSession, dir: String) =>
      emb(s, dir).filter(col("vec_id").between(50, 59))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("_p", "_e")))
        .select(col("vec_id"), (col("_p") + 1).cast("long").as("dim"),
          round(col("_e").cast("double"), 4).as("val")),
      Some("""SELECT vec_id, generate_subscripts(embedding, 1)::BIGINT AS dim,
             |  round(unnest(embedding::DOUBLE[]), 4) AS val
             |FROM embeddings WHERE vec_id BETWEEN 50 AND 59""".stripMargin)),

    // §2.4/§2.8 norms (fvec_norms_L2)
    ("norms_l2", (s: SparkSession, dir: String) =>
      emb(s, dir).filter(col("vec_id") < 100)
        .select(col("vec_id"), round(norm_l2(col("embedding")), 4).as("norm")),
      Some("""SELECT vec_id, round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')), 4) AS norm
             |FROM embeddings WHERE vec_id < 100""".stripMargin)),

    // §2.9 CenteringTransform (x - mean), first two dims. BOTH operands
    // are rounded to 4dp before subtracting: the difference of two
    // on-grid 4dp doubles is within 1e-15 of a 4dp grid point — never
    // near the x.xxxx5 half-grid boundary where Spark's decimal-string
    // rounding and DuckDB's fp-multiply rounding can disagree (the r03
    // hash mismatch; the 6dp-mean variant still produced 6dp-ish
    // differences that could sit exactly on that boundary).
    ("centering", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val means = e.agg(
        round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("m1"),
        round(avg(element_at(col("embedding"), 2).cast("double")), 4).as("m2"))
      e.crossJoin(broadcast(means)).select(
        col("vec_id"),
        round(round(element_at(col("embedding"), 1).cast("double"), 4) - col("m1"), 4).as("c1"),
        round(round(element_at(col("embedding"), 2).cast("double"), 4) - col("m2"), 4).as("c2"))
    },
      Some("""SELECT vec_id, round(round(embedding[1]::DOUBLE, 4) - m1, 4) AS c1, round(round(embedding[2]::DOUBLE, 4) - m2, 4) AS c2
             |FROM embeddings, (SELECT round(avg(embedding[1]::DOUBLE), 4) AS m1, round(avg(embedding[2]::DOUBLE), 4) AS m2 FROM embeddings)""".stripMargin)),

    // §2.8 hamming over sign-bit codes (LSH binarization + popcount)
    ("hamming_signbits", (s: SparkSession, dir: String) => {
      val a = emb(s, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("i"), sign_bits(col("embedding")).as("ca"))
      val b = emb(s, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("j"), sign_bits(col("embedding")).as("cb"))
      a.crossJoin(b).filter(col("i") < col("j"))
        .select(col("i"), col("j"), hamming_dist(col("ca"), col("cb")).as("hd"))
    },
      Some("""SELECT a.vec_id AS i, b.vec_id AS j,
             |  (SELECT count(*) FROM range(1, 65) r(k) WHERE (a.embedding[k] >= 0) <> (b.embedding[k] >= 0)) AS hd
             |FROM embeddings a CROSS JOIN embeddings b
             |WHERE a.vec_id < b.vec_id AND b.vec_id < 16""".stripMargin)),

    // §2.8 binary jaccard over sign-bit codes
    ("jaccard_signbits", (s: SparkSession, dir: String) => {
      val a = emb(s, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("i"), sign_bits(col("embedding")).as("ca"))
      val b = emb(s, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("j"), sign_bits(col("embedding")).as("cb"))
      a.crossJoin(b).filter(col("i") < col("j"))
        .select(col("i"), col("j"), round(jaccard_dist(col("ca"), col("cb")), 4).as("jd"))
    },
      Some("""SELECT i, j, CASE WHEN uni = 0 THEN 0.0 ELSE round(1.0 - inter*1.0/uni, 4) END AS jd FROM (
             |  SELECT a.vec_id AS i, b.vec_id AS j,
             |    (SELECT count(*) FROM range(1, 65) r(k) WHERE a.embedding[k] >= 0 AND b.embedding[k] >= 0) AS inter,
             |    (SELECT count(*) FROM range(1, 65) r(k) WHERE a.embedding[k] >= 0 OR b.embedding[k] >= 0) AS uni
             |  FROM embeddings a CROSS JOIN embeddings b
             |  WHERE a.vec_id < b.vec_id AND b.vec_id < 16) t""".stripMargin)),

    // §2.7 merge_from (unionByName + id shift)
    ("merge_from", (s: SparkSession, dir: String) => {
      val a = emb(s, dir).filter(col("vec_id") < 100).select(col("vec_id"), col("label"))
      val b = emb(s, dir).filter(col("vec_id") < 100)
        .select((col("vec_id") + 1000).as("vec_id"), col("label"))
      a.unionByName(b)
    },
      Some("""SELECT vec_id, label FROM embeddings WHERE vec_id < 100
             |UNION ALL SELECT vec_id + 1000 AS vec_id, label FROM embeddings WHERE vec_id < 100""".stripMargin)),

    // §2.7 remove_ids (anti-join rewrite)
    ("remove_ids", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val del = e.select(col("vec_id")).filter(col("vec_id") % 5 === 2)
      e.join(broadcast(del), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
    },
      Some("SELECT vec_id, label FROM embeddings WHERE vec_id % 5 <> 2")),

    // §2.7 update_vectors (delete + insert)
    ("update_vectors", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val untouched = e.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"))
      val replaced = e.filter(col("vec_id") < 5).select(col("vec_id"))
        .join(e.select((col("vec_id") - 200).as("vec_id"), col("embedding")), "vec_id")
      untouched.unionByName(replaced)
        .select(col("vec_id"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"))
    },
      Some("""SELECT a.vec_id, round(b.embedding[1]::DOUBLE, 4) AS e1
             |FROM embeddings a JOIN embeddings b
             |  ON b.vec_id = CASE WHEN a.vec_id < 5 THEN a.vec_id + 200 ELSE a.vec_id END
             |WHERE a.vec_id < 10""".stripMargin)),

    // §2.7 copy_subset_to (filtered write)
    ("copy_subset_to", (s: SparkSession, dir: String) =>
      emb(s, dir).filter(col("vec_id") % 4 === 1).select(col("vec_id"), col("label")),
      Some("SELECT vec_id, label FROM embeddings WHERE vec_id % 4 = 1")),

    // §2.5/2.6 TopK-per-group on a relational table (argsort/windowing)
    ("topk_group_lineitem", (s: SparkSession, dir: String) => {
      val li = lineitem(s, dir).select(
        col("l_returnflag"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_extendedprice").as("price"))
      li.groupBy(col("l_returnflag"))
        .agg(topk(col("price"), col("id"), 3, asc = false).as("_tk"))
        .select(col("l_returnflag"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
        .select(col("l_returnflag"), (col("_pos") + 1).cast("long").as("rank"),
          col("_r.id").as("id"), col("_r.dist").as("price"))
    },
      Some("""SELECT l_returnflag, "rank", id, price FROM (
             |  SELECT l_returnflag, l_orderkey*10 + l_linenumber AS id, l_extendedprice AS price,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey*10 + l_linenumber) AS "rank"
             |  FROM lineitem) t WHERE "rank" <= 3""".stripMargin)),

    // §2.4 k-means assign step / coarse quantizer (NearestCentroid
    // expression against fixed centroids = embeddings 0..3)
    ("assign_centroids", (s: SparkSession, dir: String) => {
      val cents = emb(s, dir).filter(col("vec_id") < 4).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      emb(s, dir).filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"),
          shim.col(NearestCentroid(shim.expr(col("embedding")), cents)).as("_a"))
        .select(col("id"), col("_a.list_no").cast("long").as("list_no"),
          round(col("_a.dist"), 4).as("dist"))
    },
      Some(s"""SELECT id, list_no, round(dist, 4) AS dist FROM (
              |  SELECT b.vec_id AS id, q.vec_id AS list_no, $dL2 AS dist,
              |    row_number() OVER (PARTITION BY b.vec_id ORDER BY $dL2, q.vec_id) AS rn
              |  FROM embeddings b CROSS JOIN embeddings q
              |  WHERE q.vec_id < 4 AND b.vec_id >= 10) t WHERE rn = 1""".stripMargin)),

    // §2.4 compute_centroids kernel (VecSumAgg): mean vector per label
    ("centroid_per_label", (s: SparkSession, dir: String) =>
      emb(s, dir).groupBy(col("label"))
        .agg(shim.agg(VecSumAgg(shim.expr(col("embedding")))).as("_s"))
        .select(col("label"), col("_s.cnt").as("cnt"),
          round(element_at(col("_s.sum"), 1) / col("_s.cnt"), 4).as("m1"),
          round(element_at(col("_s.sum"), 2) / col("_s.cnt"), 4).as("m2")),
      Some("""SELECT label, count(*) AS cnt, round(avg(embedding[1]::DOUBLE), 4) AS m1,
             |  round(avg(embedding[2]::DOUBLE), 4) AS m2
             |FROM embeddings GROUP BY label""".stripMargin)),

    // §2.4 MatrixStats profiling (per-dim mean/std/min/max)
    ("matrix_stats", (s: SparkSession, dir: String) =>
      emb(s, dir).select(posexplode(col("embedding")).as(Seq("_p", "_e")))
        .select((col("_p") + 1).cast("long").as("dim"), col("_e").cast("double").as("e"))
        .groupBy(col("dim"))
        .agg(round(avg(col("e")), 4).as("mean"), round(stddev_samp(col("e")), 4).as("sd"),
          round(min(col("e")), 4).as("mn"), round(max(col("e")), 4).as("mx")),
      Some("""SELECT i::BIGINT AS dim, round(avg(e), 4) AS mean, round(stddev_samp(e), 4) AS sd,
             |  round(min(e), 4) AS mn, round(max(e), 4) AS mx
             |FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |      FROM embeddings) t GROUP BY i""".stripMargin)),

    // §2.4 imbalance_factor over a deterministic assignment
    ("imbalance_factor", (s: SparkSession, dir: String) => {
      val cents = emb(s, dir).filter(col("vec_id") < 4).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      emb(s, dir).filter(col("vec_id") >= 10)
        .select(shim.col(NearestCentroid(shim.expr(col("embedding")), cents)).as("_a"))
        .groupBy(col("_a.list_no")).count()
        .agg(round(lit(4.0) * sum(col("count") * col("count")).cast("double") /
          (sum(col("count")).cast("double") * sum(col("count")).cast("double")), 4)
          .as("imbalance"))
    },
      Some(s"""WITH asg AS (
              |  SELECT id, list_no FROM (
              |    SELECT b.vec_id AS id, q.vec_id AS list_no, $dL2 AS dist,
              |      row_number() OVER (PARTITION BY b.vec_id ORDER BY $dL2, q.vec_id) AS rn
              |    FROM embeddings b CROSS JOIN embeddings q
              |    WHERE q.vec_id < 4 AND b.vec_id >= 10) t WHERE rn = 1),
              |sz AS (SELECT list_no, count(*) AS c FROM asg GROUP BY list_no)
              |SELECT round(4.0 * sum(c*c)::DOUBLE / (sum(c)::DOUBLE * sum(c)::DOUBLE), 4) AS imbalance
              |FROM sz""".stripMargin)),

    // §2.3 IVF search with nprobe = nlist ⇒ must equal exact kNN (the
    // end-to-end test of train/assign/partition-pruned join/top-k)
    ("ivf_search_exact", (s: SparkSession, dir: String) =>
      ivf16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 16)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 10))),

    // §2.3 IVF range search, nprobe = nlist ⇒ exact
    ("ivf_range_exact", (s: SparkSession, dir: String) =>
      ivf20(s, dir).rangeSearch(qDf(s, dir, 20), radius = 1.45, nprobe = 16)
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT q.vec_id AS qid, b.vec_id AS id, round($dL2, 4) AS dist
              |FROM embeddings q CROSS JOIN embeddings b
              |WHERE q.vec_id < 20 AND b.vec_id >= 20 AND $dL2 < 1.45""".stripMargin)),

    // range_search_with_parameters (faiss/IVFlib.h:46): the radius
    // scan under the same knobs search_with_parameters takes — an
    // IDSelector pushed inside the scan and the max_codes budget: a
    // per-query TOTAL consumed in probe-rank order (IndexIVF.cpp:586
    // accumulates WHOLE scanned lists and breaks once nscan >=
    // max_codes), sized on RAW pre-selector list sizes. The oracle
    // replays assignment from the centroid sidecar, the per-query
    // probe ranking, the cumulative budget cut, the id filter, and
    // the radius cut. maxCodes=8 admits ~2-3 lists per query.
    ("ivf_range_params", (s: SparkSession, dir: String) =>
      ivf16(s, dir).rangeSearch(qDf(s, dir, 10), radius = 1.5, nprobe = 16,
        filter = Some(pmod(col("id"), lit(3)) === 0), maxCodes = Some(8))
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf16_centroids/*.parquet')),
              |basg_all AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |lsz AS (SELECT list_no, count(*) AS c FROM basg_all GROUP BY list_no),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |cum AS (SELECT p.qid, p.list_no,
              |    sum(coalesce(l.c, 0)) OVER (PARTITION BY p.qid ORDER BY p.pr) - coalesce(l.c, 0) AS bef
              |  FROM qc p LEFT JOIN lsz l USING (list_no))
              |SELECT u.qid, a.id,
              |  round(list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, 4) AS dist
              |FROM cum u JOIN basg_all a USING (list_no)
              |JOIN embeddings q ON q.vec_id = u.qid JOIN embeddings b ON b.vec_id = a.id
              |WHERE u.bef < 8 AND a.id % 3 = 0
              |  AND list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 < 1.5""".stripMargin)),

    // §2.3 the real approximate path (nprobe << nlist). Oracle reads
    // the trained-centroid sidecar, re-derives per-query probe lists
    // (4 nearest centroids), base-list assignment, and the pruned
    // exact top-k — a full hash check of IVF pruning semantics.
    ("ivf_search_nprobe4", (s: SparkSession, dir: String) =>
      ivf16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(ivfNprobe4Sql)),

    // §2.7 the distributed_ondisk recipe END TO END
    // (benchs/distributed_ondisk/README.md:1-30 — the reference's
    // authoritative 1T-vector ingestion story): (1) train the shared
    // quantizer with scalable two-level k-means, (2) every data slice
    // builds its OWN invlists against that one quantizer, (3) merge
    // the slices into a single on-disk list_no-partitioned store —
    // a write, never a recluster — then (4) load and search it. The
    // oracle replays a SINGLE-build IVF search over the same
    // quantizer sidecar: hash-equality IS the merge≡single-index
    // invariant of tests/test_merge.cpp. The tiny top-k result is
    // collected so the temp store can be removed inside the builder
    // (same bounded-output idiom as stream_ivf_ingest_search).
    ("distributed_ondisk_recipe", (s: SparkSession, dir: String) => {
      import java.nio.file.Files
      import graft.streaming.StreamingIngest.rmTree
      val cents = ondiskCents16(s, dir)
      val base = bDf(s, dir, 10)
      val tmp = Files.createTempDirectory("graft_ondisk_recipe")
      try {
        val shards = (0 until 4).map { g =>
          IvfIndex.build(base.filter(pmod(col("id"), lit(4)) === g),
            "id", "vec", nlist = 16, centroids0 = cents)
        }
        val merged = IvfIndex.mergeOnDisk(shards, s"$tmp/index")
        val out = merged.search(qDf(s, dir, 10), k = 10, nprobe = 4)
          .withColumn("dist", r4("dist"))
        val rows = out.collect().toSeq // bounded: nq x k = 100 rows
        s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
      } finally rmTree(tmp)
    },
      Some(ondiskNprobe4Sql)),

    // search_preassigned (faiss/IndexIVF.h:377, the IVFlib big-batch
    // entry point): kNN over CALLER-PROVIDED (qid, list_no) probe
    // assignments — the coarse quantizer never runs. The probe rule
    // here (qid % 16 and (7·qid + 3) % 16) is deliberately NOT the
    // nearest-centroid set, so a pass proves the engine scanned
    // exactly the lists it was handed; the oracle replays the same
    // rule against the sidecar-derived list assignment.
    ("ivf_search_preassigned", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10)
      val probesDf = q
        .select(col("qid"),
          explode(array(pmod(col("qid"), lit(16)),
            pmod(col("qid") * 7 + 3, lit(16)))).as("_l"))
        .select(col("qid"), col("_l").cast("int").as("list_no"))
      ivf16(s, dir).searchPreassigned(q, probesDf, k = 10)
        .withColumn("dist", r4("dist"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf16_centroids/*.parquet')),
              |probes AS (SELECT vec_id AS qid, unnest([vec_id % 16, (vec_id*7+3) % 16]) AS list_no
              |           FROM embeddings WHERE vec_id < 10),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // range_search_preassigned (contrib/ivf_tools.py:57): radius
    // search over the same caller-provided probe rule — together with
    // ivf_search_preassigned this covers the whole preassigned
    // ivf_tools trio (add/search/range_search).
    ("ivf_range_preassigned", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10)
      val probesDf = q
        .select(col("qid"),
          explode(array(pmod(col("qid"), lit(16)),
            pmod(col("qid") * 7 + 3, lit(16)))).as("_l"))
        .select(col("qid"), col("_l").cast("int").as("list_no"))
      ivf16(s, dir).rangeSearchPreassigned(q, probesDf, radius = 1.45)
        .withColumn("dist", r4("dist"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf16_centroids/*.parquet')),
              |probes AS (SELECT vec_id AS qid, unnest([vec_id % 16, (vec_id*7+3) % 16]) AS list_no
              |           FROM embeddings WHERE vec_id < 10),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1)
              |SELECT p.qid, a.id,
              |    round(list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, 4) AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id
              |  WHERE list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 < 1.45""".stripMargin)),

    // add_preassigned (contrib/ivf_tools.py:9): append vectors with an
    // externally computed list assignment (no quantizer run), then
    // search at nprobe = nlist — the result must be the exact kNN over
    // the UNION of base and added vectors, which the oracle computes
    // directly (the added vectors' arbitrary list placement cannot
    // change an all-lists scan).
    ("ivf_add_preassigned", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10)
      val extra = q.select(col("qid").as("id"), col("qvec").as("vec"),
        pmod(col("qid"), lit(16)).cast("int").as("list_no"))
      ivf16(s, dir).addPreassigned(extra).search(q, k = 10, nprobe = 16)
        .withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dL2, "q.vec_id < 10", "true", 10))),

    // IVF with an HNSW coarse quantizer (the reference's
    // `IVF<n>_HNSW<m>` coarse grammar, index_factory.cpp:241-291):
    // probe selection walks a per-executor HNSW graph over the
    // centroids instead of the exact O(nlist) argmin — at nlist ~ 1M
    // this is what keeps coarse quantization off the critical path.
    // efSearch >= nlist makes the walk cover the whole graph, so the
    // probe set — and therefore the result — must be bit-identical to
    // the exact coarse assign: same oracle as ivf_search_nprobe4.
    ("ivf_hnsw_search", (s: SparkSession, dir: String) =>
      ivf16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 4,
        coarse = Some(graft.index.Probes.HnswCoarse(4096)))
        .withColumn("dist", r4("dist")),
      Some(ivfNprobe4Sql)),

    // IVF with an NSG coarse quantizer (`IVF<n>_NSG<R>`,
    // index_factory.cpp:258-262 — IndexNSGFlat as quantizer): same
    // contract as the HNSW coarse, with the walk over a per-executor
    // NSG graph of the centroids. searchL >= nlist seeds the full
    // pool, so the probe set — and the result — must be bit-identical
    // to the exact coarse assign: same oracle as ivf_search_nprobe4.
    ("ivf_nsg_search", (s: SparkSession, dir: String) =>
      ivf16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 4,
        coarse = Some(graft.index.Probes.NsgCoarse(4096)))
        .withColumn("dist", r4("dist")),
      Some(ivfNprobe4Sql)),

    // `IVF16(PQ8x8),PQ8` — the lossy-quantizer composition
    // (IndexIVF::add_core assigns through the quantizer; residual =
    // vec − quantizer.reconstruct(cell) = vec − PQ-DECODE of the cell
    // code). ADC distance to a code equals the exact squared L2 to
    // its decode, so the engine builds the residual-PQ index over the
    // DECODED centroid table and the oracle replays the standard
    // IVFPQ chain against that table's sidecar — the lossy centroids
    // appear on BOTH assignment and residual arithmetic.
    ("ivf_paren_pq_pq_search", (s: SparkSession, dir: String) =>
      parenPqPq16(s, dir).search(qDf(s, dir, 10), 10, nprobe = 16)
        .withColumn("dist", r4("dist")),
      Some(ivfpqFullProbeSql("parenpqpq_cdec", "parenpqpq_codebooks"))),

    // Two-level coarse assignment (`IVF<n>(IVF<n2>,Flat)`,
    // index_factory.cpp:263-267 with an IVF-Flat sub-index as the
    // quantizer) in the APPROXIMATE regime: the quantizer ranks the
    // nlist2 = 4 sub-centroids, scans only the centroids of the best
    // nprobe2 = 2 sub-cells, and the top-nprobe among them become the
    // probed lists. The oracle replays the whole chain: the sub-cell
    // assignment of every centroid (argmin over the sub-centroid
    // sidecar), the query's sub-cell ranking, the pruned centroid
    // ranking, then the standard exact scan over the probed lists.
    ("ivf_two_level_search", (s: SparkSession, dir: String) =>
      ivf16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 4,
        coarse = Some(graft.index.Probes.IvfFlatCoarse(4, 2)))
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf16_centroids/*.parquet')),
              |sub AS (SELECT j, c FROM read_parquet('$AUX/parensub_centroids/*.parquet')),
              |casg AS (SELECT list_no, j FROM (
              |  SELECT ct.list_no, sb.j, row_number() OVER (PARTITION BY ct.list_no ORDER BY
              |    list_aggregate(list_transform(list_zip(ct.c::DOUBLE[], sb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), sb.j) AS rn
              |  FROM cent ct CROSS JOIN sub sb) t WHERE rn = 1),
              |qcell AS (SELECT qid, j FROM (
              |  SELECT q.vec_id AS qid, sb.j, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], sb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), sb.j) AS pr
              |  FROM embeddings q CROSS JOIN sub sb WHERE q.vec_id < 10) t WHERE pr <= 2),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT qc.qid, ct.list_no, row_number() OVER (PARTITION BY qc.qid ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], ct.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), ct.list_no) AS pr
              |  FROM qcell qc JOIN casg ca ON ca.j = qc.j JOIN cent ct ON ct.list_no = ca.list_no
              |  JOIN embeddings q ON q.vec_id = qc.qid) t WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // Generic parenthesized coarse with an IndexPQ quantizer
    // (`IVF16(PQ8x8),Flat`, index_factory.cpp:263-267,719): the
    // quantizer is a PQ trained over the centroid table, so BOTH the
    // add-time cell assignment and the search-time probe ranking are
    // ADC distances through the coarse codes (IndexIVF::add_core
    // assigns through the quantizer). The oracle replays the whole
    // chain: centroid encode (per-subspace argmin), per-row subspace
    // LUTs, ordered ADC sums, probe top-4 / assignment top-1, then
    // exact L2 over the probed lists.
    ("ivf_paren_pq_search", (s: SparkSession, dir: String) =>
      parenPq16(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/parenpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/parenpq_codebooks/*.parquet')),
              |csub AS (SELECT list_no, r.m AS m, c[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv FROM cent, range(0,8) r(m)),
              |cenc AS (SELECT list_no, m, j FROM (
              |  SELECT cs.list_no, cs.m, cb.j, row_number() OVER (PARTITION BY cs.list_no, cs.m ORDER BY
              |    list_aggregate(list_transform(list_zip(cs.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM csub cs JOIN cb ON cb.m = cs.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |qlut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |qadc AS (SELECT l.qid, e.list_no, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS adc
              |  FROM cenc e JOIN qlut l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.list_no),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT qid, list_no, row_number() OVER (PARTITION BY qid ORDER BY adc, list_no) AS pr FROM qadc) t WHERE pr <= 4),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |blut AS (SELECT b.id, b.m, cb.j,
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM bsub b JOIN cb ON cb.m = b.m),
              |badc AS (SELECT l.id, e.list_no, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS adc
              |  FROM cenc e JOIN blut l ON l.m = e.m AND l.j = e.j GROUP BY l.id, e.list_no),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT id, list_no, row_number() OVER (PARTITION BY id ORDER BY adc, list_no) AS rn FROM badc) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVF16(SQ8),Flat — the SQ-quantizer paren coarse
    // (index_factory.cpp:719: ANY factory string inside the parens
    // becomes the quantizer): an IndexScalarQuantizer assigns by
    // asymmetric distance query→decode(code), which is the exact L2
    // to the SQ-decoded centroid, so BOTH add-time assignment and
    // probe selection rank over the decoded table. The oracle replays
    // the whole chain from the RAW centroid sidecar: per-dim min/max
    // range over the centroid training set (train_q1 trains the
    // quantizer on the cluster centers), the SQ8 encode/decode grid
    // (float32-rounded like the engine's decoded table), then the
    // decoded-table IVF search.
    ("ivf_paren_sq_search", (s: SparkSession, dir: String) =>
      parenSq16(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/parensq_centroids/*.parquet')),
              |dims AS (SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
              |  SELECT i, min(e) AS mn, max(e) AS mx
              |  FROM (SELECT unnest(c::DOUBLE[]) AS e, generate_subscripts(c, 1) AS i FROM cent) u GROUP BY i) t),
              |dec AS (SELECT list_no,
              |  list_transform(c::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i])::REAL[] AS dc
              |  FROM cent, dims),
              |qc AS (SELECT q.vec_id AS qid, dd.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], dd.dc::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), dd.list_no) AS pr
              |  FROM embeddings q CROSS JOIN dec dd WHERE q.vec_id < 10),
              |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, dd.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], dd.dc::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), dd.list_no) AS rn
              |  FROM embeddings b CROSS JOIN dec dd WHERE b.vec_id >= 10) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVF16(PCA8,Flat),Flat — the transform-prefixed paren quantizer
    // (index_factory.cpp:719 with an IndexPreTransform sub-index): the
    // PCA is trained on the cluster centers (train_q1), assignment AND
    // probe selection rank ||PCA(x) − PCA(c)||² while candidate
    // distances stay exact in the original space. The oracle replays
    // the affine map from the trained-rotation sidecar (the pca_knn
    // idiom, REAL-rounded like the engine's float chain), then the
    // transformed assignment, the transformed probe ranking, and the
    // original-space pruned top-k.
    ("ivf_paren_pca_search", (s: SparkSession, dir: String) =>
      parenPca16(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/parensq_centroids/*.parquet')),
              |rot AS (SELECT d, r::DOUBLE[] AS r, bias FROM read_parquet('$AUX/parenpca_rot/*.parquet')),
              |tc AS (SELECT list_no, list(yv ORDER BY d) AS v FROM (
              |  SELECT ct.list_no, r.d,
              |    ((list_aggregate(list_transform(list_zip(r.r, ct.c::DOUBLE[]), p -> p[1]*p[2]), 'sum')) + r.bias::DOUBLE)::REAL AS yv
              |  FROM cent ct CROSS JOIN rot r) t GROUP BY list_no),
              |tv AS (SELECT vec_id, list(yv ORDER BY d) AS v FROM (
              |  SELECT e.vec_id, r.d,
              |    ((list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')) + r.bias::DOUBLE)::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |qc AS (SELECT q.vec_id AS qid, tc.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(tq.v::DOUBLE[], tc.v::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), tc.list_no) AS pr
              |  FROM embeddings q JOIN tv tq ON tq.vec_id = q.vec_id CROSS JOIN tc WHERE q.vec_id < 10),
              |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, tc.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(tb.v::DOUBLE[], tc.v::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), tc.list_no) AS rn
              |  FROM embeddings b JOIN tv tb ON tb.vec_id = b.vec_id CROSS JOIN tc WHERE b.vec_id >= 10) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IndexShards as an explicit API (faiss/IndexShards.h:27): two
    // IVF indexes built over DISJOINT halves of the corpus, searched
    // as one logical index — every shard searched, candidate streams
    // merged by one more top-k (the same partial/merge aggregate every
    // single index already uses, one level up). At full probe budget
    // each shard is exact over its half, so the merge must equal the
    // exact search over the union — the brute-force oracle verbatim.
    ("shards_search", (s: SparkSession, dir: String) => {
      val built = cached(s"shards:$dir") {
        Seq(0L, 1L).map(p => graft.index.IndexFactory.build(
          bDf(s, dir, 10).filter(pmod(col("id"), lit(2)) === p),
          "id", "vec", "IVF4,Flat", niter = 3))
      }
      graft.index.Shards.search(built, qDf(s, dir, 10), k = 10, nprobe = 4)
        .withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 10))),

    // §2.7 search_and_return_centroids: list_no as an output column.
    // nprobe = nlist, so the result is the exact top-k plus each
    // match's home list from the centroid-sidecar assignment.
    ("ivf_search_centroids", (s: SparkSession, dir: String) =>
      ivf16(s, dir).search(qDf(s, dir, 10), k = 5, nprobe = 16,
        withCentroid = true).withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf16_centroids/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |d AS (SELECT q.vec_id AS qid, b.vec_id AS id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10)
              |SELECT qid, "rank", id, list_no, round(dist, 4) AS dist FROM (
              |  SELECT d.qid, d.id, a.list_no, d.dist,
              |    row_number() OVER (PARTITION BY d.qid ORDER BY d.dist, d.id) AS "rank"
              |  FROM d JOIN basg a ON a.id = d.id) w
              |WHERE "rank" <= 5""".stripMargin)),

    // §2.4 k-means train. The oracle reads the trained centroids from
    // the sidecar and independently replays the ASSIGNMENT arithmetic
    // (argmin L2 over all points) — per-cluster sizes and objective
    // must agree, verifying that the trained model is consistent with
    // the data rather than just echoing a dump.
    ("kmeans_train", (s: SparkSession, dir: String) => {
      val m = km8(s, dir)
      m.assign(emb(s, dir), "embedding")
        .groupBy(col("list_no"))
        .agg(count(lit(1)).as("n"), round(sum(col("centroid_dist")), 3).as("obj"))
        .select(col("list_no"), col("n"), col("obj"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/kmeans8_centroids/*.parquet')),
              |d AS (SELECT e.vec_id, c.list_no,
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM embeddings e CROSS JOIN cent c),
              |a AS (SELECT vec_id, list_no, dist FROM (
              |  SELECT vec_id, list_no, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_no) AS rn FROM d) t
              |  WHERE rn = 1)
              |SELECT list_no, count(*)::BIGINT AS n, round(sum(dist), 3) AS obj
              |FROM a GROUP BY list_no""".stripMargin)),

    // Clustering::train_encoded (Clustering.cpp:271): k-means over
    // SQ8-ENCODED vectors, decoded inside each iteration's assign —
    // the memory-bounded train path for huge train sets. Same
    // assignment-replay oracle as kmeans_train, but over the SQL-
    // re-derived SQ8 roundtrip (min/max range recomputed in SQL, the
    // sq8_roundtrip formula, cast through FLOAT to match the engine's
    // float32 decoded vectors) against the encoded-trained centroid
    // sidecar — so a model NOT trained on the decoded geometry flips
    // the rows red.
    ("kmeans_train_encoded", (s: SparkSession, dir: String) => {
      val (mins, vdiff, m) = kmEnc8(s, dir)
      val roundtrip = shim.col(graft.index.SqVariant.decode("SQ8",
        graft.index.SqVariant.encode("SQ8",
          shim.expr(col("embedding")), mins, vdiff),
        mins, vdiff)).cast("array<float>")
      m.assign(emb(s, dir).select(col("vec_id"), roundtrip.as("vec")), "vec")
        .groupBy(col("list_no"))
        .agg(count(lit(1)).as("n"), round(sum(col("centroid_dist")), 3).as("obj"))
        .select(col("list_no"), col("n"), col("obj"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/kmeans_enc_centroids/*.parquet')),
              |dims AS (
              |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
              |    SELECT i, min(e) AS mn, max(e) AS mx
              |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
              |          FROM embeddings) u GROUP BY i) t),
              |dec AS (SELECT vec_id,
              |  list_transform(embedding::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i])::FLOAT[]::DOUBLE[] AS dv
              |  FROM embeddings, dims),
              |d AS (SELECT e.vec_id, c.list_no,
              |    list_aggregate(list_transform(list_zip(e.dv, c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM dec e CROSS JOIN cent c),
              |a AS (SELECT vec_id, list_no, dist FROM (
              |  SELECT vec_id, list_no, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_no) AS rn FROM d) t
              |  WHERE rn = 1)
              |SELECT list_no, count(*)::BIGINT AS n, round(sum(dist), 3) AS obj
              |FROM a GROUP BY list_no""".stripMargin)),

    // Spherical k-means (ClusteringParameters.spherical,
    // Clustering.cpp:65-68): same assignment-replay oracle as
    // kmeans_train, plus the per-centroid L2 norm in the hashed output
    // — the oracle recomputes it from the sidecar, so a centroid that
    // isn't unit-renormalized flips the row red.
    ("kmeans_spherical", (s: SparkSession, dir: String) => {
      val m = kmSph8(s, dir)
      import s.implicits._
      val normDf = m.centroids.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.map(x => x.toDouble * x).sum) }
        .toDF("list_no", "_n2")
        .select(col("list_no"), round(sqrt(col("_n2")), 3).as("nrm"))
      m.assign(emb(s, dir), "embedding")
        .groupBy(col("list_no"))
        .agg(count(lit(1)).as("n"), round(sum(col("centroid_dist")), 3).as("obj"))
        .join(broadcast(normDf), "list_no")
        .select(col("list_no"), col("n"), col("obj"), col("nrm"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/kmeans_sph_centroids/*.parquet')),
              |d AS (SELECT e.vec_id, c.list_no,
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM embeddings e CROSS JOIN cent c),
              |a AS (SELECT vec_id, list_no, dist FROM (
              |  SELECT vec_id, list_no, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_no) AS rn FROM d) t
              |  WHERE rn = 1),
              |nrm AS (SELECT list_no, round(sqrt(list_aggregate(list_transform(c, x -> x*x), 'sum')), 3) AS nrm FROM cent)
              |SELECT g.list_no, g.n, g.obj, nrm.nrm FROM (
              |  SELECT list_no, count(*)::BIGINT AS n, round(sum(dist), 3) AS obj
              |  FROM a GROUP BY list_no) g JOIN nrm ON nrm.list_no = g.list_no""".stripMargin)),

    // §2.11/§2.8 SQ8 codec: train (per-dim min/max) + encode + decode;
    // oracle reproduces the codec arithmetic in SQL
    ("sq8_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val sq = graft.index.SqIndex.build(e, "vec_id", "embedding")
      sq.reconstruct
        .join(e.select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"), round(element_at(col("vec"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("vec"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims)
             |SELECT id, round(dv[1], 4) AS d1,
             |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
             |FROM dec""".stripMargin)),

    // §2.11/§2.8 SQ8 with the RS_meanstd range statistic
    // (faiss/impl/ScalarQuantizer.h:46: [mean - std·rs, mean + std·rs],
    // per-dimension via train_NonUniform). The oracle reads the trained
    // per-dim range from the sq_meanstd_range sidecar and replays
    // encode + decode + reconstruction error — same pattern as
    // kmeans_train (trained state dumped, arithmetic re-derived).
    ("sq8_meanstd_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val sq = sqMeanstd(s, dir)
      sq.reconstruct
        .join(e.select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"), round(element_at(col("vec"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("vec"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some(s"""WITH dims AS (
              |  SELECT list(vmn ORDER BY i) AS vmn, list(vd ORDER BY i) AS vd
              |  FROM read_parquet('$AUX/sq_meanstd_range/*.parquet')),
              |dec AS (SELECT vec_id AS id, embedding,
              |  list_transform(embedding::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
              |  FROM embeddings, dims)
              |SELECT id, round(dv[1], 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM dec""".stripMargin)),

    // §2.11 SQ4 codec (4-bit, two codes per byte)
    ("sq4_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val mm = e.agg(shim.agg(graft.core.VecMinMaxAgg(shim.expr(col("embedding")))).as("_mm"))
        .select(col("_mm.mins"), col("_mm.maxs")).collect().head
      val mins = mm.getSeq[Double](0).toArray
      val vdiff = mins.indices.map(i => mm.getSeq[Double](1)(i) - mins(i)).toArray
      e.select(col("vec_id"),
        shim.col(graft.core.SQ4Decode(
          graft.core.SQ4Encode(shim.expr(col("embedding")), mins, vdiff),
          mins, vdiff)).as("_dv"),
        col("embedding"))
        .select(col("vec_id"), round(element_at(col("_dv"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings) u GROUP BY i) t),
             |dec AS (SELECT vec_id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(15 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 15 * vd[i]) AS dv
             |  FROM embeddings, dims)
             |SELECT vec_id, round(dv[1], 4) AS d1,
             |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
             |FROM dec""".stripMargin)),

    // §2.11 SQ6 codec (6-bit, four codes per three bytes)
    ("sq6_roundtrip", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val mm = e.agg(shim.agg(graft.core.VecMinMaxAgg(shim.expr(col("embedding")))).as("_mm"))
        .select(col("_mm.mins"), col("_mm.maxs")).collect().head
      val mins = mm.getSeq[Double](0).toArray
      val vdiff = mins.indices.map(i => mm.getSeq[Double](1)(i) - mins(i)).toArray
      e.select(col("vec_id"),
        shim.col(graft.core.SQ6Decode(
          graft.core.SQ6Encode(shim.expr(col("embedding")), mins, vdiff),
          mins, vdiff)).as("_dv"),
        col("embedding"))
        .select(col("vec_id"), round(element_at(col("_dv"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings) u GROUP BY i) t),
             |dec AS (SELECT vec_id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(63 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 63 * vd[i]) AS dv
             |  FROM embeddings, dims)
             |SELECT vec_id, round(dv[1], 4) AS d1,
             |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
             |FROM dec""".stripMargin)),

    // §2.11 fp16 codec (IEEE half, round-half-up in magnitude — the
    // codec's bit arithmetic, SqCodec.toHalf). The oracle re-derives
    // the half-precision rounding from first principles in SQL: find
    // the exponent e with 2^e <= |x| < 2^(e+1) (exact power-of-2 join,
    // no log2 misrounding), quantize the 10-bit mantissa grain with
    // floor(y + 0.5), handle subnormals (grain 2^-24 below 2^-14) and
    // the underflow-to-zero cutoff at 2^-25.
    ("fp16_roundtrip", (s: SparkSession, dir: String) =>
      emb(s, dir).select(col("vec_id"),
        shim.col(graft.core.Fp16Decode(
          graft.core.Fp16Encode(shim.expr(col("embedding"))))).as("_dv"),
        col("embedding"))
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1).cast("double"), 6).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("_dv").cast("array<double>"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 8).as("err")),
      Some("""WITH el AS (SELECT vec_id, i, x, abs(x) AS ax FROM (
             |    SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
             |           generate_subscripts(embedding, 1) AS i FROM embeddings) u),
             |ee AS (SELECT e.vec_id, e.i, e.x, e.ax, max(t.e) AS ex
             |       FROM el e LEFT JOIN range(-45,16) t(e) ON power(2.0, t.e) <= e.ax
             |       GROUP BY e.vec_id, e.i, e.x, e.ax),
             |hv AS (SELECT vec_id, i, x,
             |  CASE WHEN ax < power(2.0, -25) THEN 0.0
             |       WHEN ex >= -14 THEN sign(x) * floor(ax / power(2.0, ex-10) + 0.5) * power(2.0, ex-10)
             |       ELSE sign(x) * floor(ax * power(2.0, 24) + 0.5) * power(2.0, -24) END AS dv
             |  FROM ee)
             |SELECT vec_id,
             |  round(max(CASE WHEN i = 1 THEN dv END), 6) AS d1,
             |  round(sum((x-dv)*(x-dv)), 8) AS err
             |FROM hv GROUP BY vec_id""".stripMargin)),

    // IndexRowwiseMinMax (faiss/IndexRowwiseMinMax.h:34; factory
    // prefix `MinMax,`): rowwise scale to [0,1], fp32 (scaler, minv)
    // coefficients, SQfp16 inner codec, decode rescales. A vector
    // CODEC in the reference (search throws) — the oracle replays the
    // whole chain per element: row min/max, fp32 coefficient
    // rounding, the float32 scaled value, IEEE-half re-derivation
    // (the fp16_roundtrip formula) and the rescale.
    ("minmax_roundtrip", (s: SparkSession, dir: String) => {
      val src = emb(s, dir).select(col("vec_id"), col("embedding"))
      val dec = graft.index.MinMaxCodec
        .roundtripDf(src, "vec_id", "embedding", "SQfp16", fp16Coeffs = false)
        .withColumnRenamed("id", "vec_id").withColumnRenamed("vec", "_dv")
      src.join(dec, "vec_id")
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1), 6).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 6).as("err"))
    },
      Some("""WITH el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |    unnest(embedding::DOUBLE[]) AS x FROM embeddings),
             |mm AS (SELECT vec_id, min(x) AS mn,
             |    CAST(max(x) - min(x) AS REAL)::DOUBLE AS sc0 FROM el GROUP BY vec_id),
             |mm2 AS (SELECT vec_id, mn, CASE WHEN sc0 = 0 THEN 1.0 ELSE sc0 END AS sc FROM mm),
             |sv AS (SELECT e.vec_id, e.i, e.x, m.mn, m.sc,
             |    CAST((e.x - m.mn) / m.sc AS REAL)::DOUBLE AS s
             |  FROM el e JOIN mm2 m USING (vec_id)),
             |ee AS (SELECT sv.vec_id, sv.i, sv.x, sv.mn, sv.sc, sv.s, abs(sv.s) AS axs,
             |    max(t.e) AS ex
             |  FROM sv LEFT JOIN range(-45,16) t(e) ON power(2.0, t.e) <= abs(sv.s)
             |  GROUP BY sv.vec_id, sv.i, sv.x, sv.mn, sv.sc, sv.s),
             |hv AS (SELECT vec_id, i, x, mn, sc,
             |  CASE WHEN axs < power(2.0, -25) THEN 0.0
             |       WHEN ex >= -14 THEN sign(s) * floor(axs / power(2.0, ex-10) + 0.5) * power(2.0, ex-10)
             |       ELSE sign(s) * floor(axs * power(2.0, 24) + 0.5) * power(2.0, -24) END AS hval
             |  FROM ee),
             |dec AS (SELECT vec_id, i, x, sc * hval + mn AS dv FROM hv)
             |SELECT vec_id, round(max(CASE WHEN i = 1 THEN dv END), 6) AS d1,
             |  round(sum((x-dv)*(x-dv)), 6) AS err
             |FROM dec GROUP BY vec_id""".stripMargin)),

    // MinMax wrapper with a PQ inner (IndexRowwiseMinMax wraps ANY
    // index, IndexRowwiseMinMax.h:34; factory "MinMax,PQ8"): per-row
    // [0,1] scaling, PQ codebooks trained ON THE SCALED ROWS, encode/
    // decode, rescale. The oracle replays the whole chain: the REAL-
    // rounded scale coefficients, the scaled subvectors, the encode
    // argmin against the trained-codebook sidecar, the ordered decode
    // concat, and the per-element rescale.
    ("minmax_pq_roundtrip", (s: SparkSession, dir: String) => {
      val src = emb(s, dir).select(col("vec_id"), col("embedding"))
      val dec = graft.index.MinMaxCodec
        .roundtripDf(src, "vec_id", "embedding", "PQ8", fp16Coeffs = false,
          pqModel = minmaxPqModel(s, dir))
        .withColumnRenamed("id", "vec_id").withColumnRenamed("vec", "_dv")
      src.join(dec, "vec_id")
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1), 6).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("_dv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 6).as("err"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/minmaxpq_codebooks/*.parquet')),
              |el AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              |    unnest(embedding::DOUBLE[]) AS x FROM embeddings),
              |mm AS (SELECT vec_id, min(x) AS mn,
              |    CAST(max(x) - min(x) AS REAL)::DOUBLE AS sc0 FROM el GROUP BY vec_id),
              |mm2 AS (SELECT vec_id, mn, CASE WHEN sc0 = 0 THEN 1.0 ELSE sc0 END AS sc FROM mm),
              |sv AS (SELECT e.vec_id, e.i,
              |    CAST((e.x - m.mn) / m.sc AS REAL)::DOUBLE AS s
              |  FROM el e JOIN mm2 m USING (vec_id)),
              |sub AS (SELECT vec_id, (i-1)//8 AS m, list(s ORDER BY i) AS svec
              |  FROM sv GROUP BY vec_id, (i-1)//8),
              |enc AS (SELECT vec_id, m, j FROM (
              |  SELECT b.vec_id, b.m, cb.j, row_number() OVER (PARTITION BY b.vec_id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.svec, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM sub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |dec AS (SELECT e.vec_id, flatten(list(cb.c ORDER BY e.m)) AS dv
              |  FROM enc e JOIN cb ON cb.m = e.m AND cb.j = e.j GROUP BY e.vec_id)
              |SELECT d.vec_id,
              |  round(d.dv[1] * m.sc + m.mn, 6) AS d1,
              |  round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], d.dv),
              |    p -> (p[1] - (p[2]*m.sc + m.mn)) * (p[1] - (p[2]*m.sc + m.mn))), 'sum'), 6) AS err
              |FROM dec d JOIN mm2 m USING (vec_id)
              |JOIN embeddings b ON b.vec_id = d.vec_id""".stripMargin)),

    // §2.11 SQ8 asymmetric (ADC) kNN search
    ("sq8_knn", (s: SparkSession, dir: String) => {
      val sq = graft.index.SqIndex.build(bDf(s, dir, 10), "id", "vec")
      sq.search(qDf(s, dir, 10), 5).withColumn("dist", r4("dist"))
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
             |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
             |  FROM qd) w WHERE "rank" <= 5""".stripMargin)),

    // §2.3 IndexRefine: SQ8 coarse stage (k*k_factor) + exact re-rank
    ("refine_sq8_rerank", (s: SparkSession, dir: String) =>
      graft.index.Refine.sqRefineSearch(qDf(s, dir, 10), bDf(s, dir, 10),
        k = 5, kFactor = 4).withColumn("dist", r4("dist")),
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id, embedding,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS adc,
             |  list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS ed
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10),
             |cand AS (SELECT qid, id, ed FROM (
             |  SELECT qid, id, ed, row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS r1
             |  FROM qd) w WHERE r1 <= 20)
             |SELECT qid, "rank", id, round(ed, 4) AS dist FROM (
             |  SELECT qid, id, ed, row_number() OVER (PARTITION BY qid ORDER BY ed, id) AS "rank"
             |  FROM cand) w2 WHERE "rank" <= 5""".stripMargin)),

    // §2.2/§2.9 RemapDimensionsTransform: kNN in a projected subspace
    ("remap_dims_knn", (s: SparkSession, dir: String) =>
      Knn.knnJoin(
        qDf(s, dir, 10).withColumn("qvec", slice(col("qvec"), 1, 16)),
        bDf(s, dir, 10).withColumn("vec", slice(col("vec"), 1, 16)), 5)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(
        "list_distance(q.embedding[1:16]::DOUBLE[], b.embedding[1:16]::DOUBLE[])^2",
        "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.2 IndexSplitVectors: vertical split, partial distances summed
    ("split_vectors", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 5); val b = bDf(s, dir, 5).filter(col("id") < 26)
      b.crossJoin(broadcast(q)).select(col("qid"), col("id"),
        round(l2sq(slice(col("qvec"), 1, 32), slice(col("vec"), 1, 32)) +
          l2sq(slice(col("qvec"), 33, 32), slice(col("vec"), 33, 32)), 4).as("dist"))
    },
      Some(s"""SELECT q.vec_id AS qid, b.vec_id AS id, round($dL2, 4) AS dist
              |FROM embeddings q CROSS JOIN embeddings b
              |WHERE q.vec_id < 5 AND b.vec_id BETWEEN 5 AND 25""".stripMargin)),

    // §2.9 IndexRowwiseMinMax: per-row scaling stored alongside codes
    ("rowwise_minmax", (s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      e.select(col("vec_id"),
        round(array_min(col("v")), 4).as("rmin"),
        round(array_max(col("v")), 4).as("rmax"),
        round((element_at(col("v"), 1) - array_min(col("v"))) /
          (array_max(col("v")) - array_min(col("v"))), 4).as("s1"))
    },
      Some("""SELECT vec_id,
             |  round(list_aggregate(embedding::DOUBLE[], 'min'), 4) AS rmin,
             |  round(list_aggregate(embedding::DOUBLE[], 'max'), 4) AS rmax,
             |  round((embedding[1]::DOUBLE - list_aggregate(embedding::DOUBLE[], 'min'))
             |    / (list_aggregate(embedding::DOUBLE[], 'max') - list_aggregate(embedding::DOUBLE[], 'min')), 4) AS s1
             |FROM embeddings""".stripMargin)),

    // §2.9 LinearTransform y = Ax (Walsh-pattern ±1 matrix, 4 outputs)
    ("linear_transform", (s: SparkSession, dir: String) => {
      val mat = Array.tabulate(4, 64)((j, i) => if (((i >> j) & 1) == 0) 1f else -1f)
      val y = shim.col(graft.core.MatVec(shim.expr(col("embedding")), mat))
      emb(s, dir).select(col("vec_id"), y.as("_y"))
        .select(col("vec_id"),
          round(element_at(col("_y"), 1), 4).as("y0"),
          round(element_at(col("_y"), 2), 4).as("y1"),
          round(element_at(col("_y"), 3), 4).as("y2"),
          round(element_at(col("_y"), 4), 4).as("y3"))
    },
      Some((0 until 4).map(j =>
        s"round(list_aggregate(list_transform(embedding::DOUBLE[], (x, i) -> CASE WHEN (((i-1)::BIGINT >> $j) & 1) = 0 THEN x ELSE -x END), 'sum'), 4) AS y$j")
        .mkString("SELECT vec_id, ", ", ", " FROM embeddings"))),

    // §2.1 fvecs reader/writer round-trip (fvecs_read / fvecs_write,
    // faiss utils; SURVEY §2.1 row 4): the sf's embeddings are written
    // to a real little-endian .fvecs file (ordered by vec_id), read
    // back with the distributed binaryRecords reader, and fingerprinted
    // per row. The oracle replays the SAME fingerprint from the
    // parquet source with id = row_number over vec_id — any byte-level
    // corruption, dim mix-up, or row reorder breaks the hash.
    ("fvecs_roundtrip", (s: SparkSession, dir: String) => {
      val path = new java.io.File(
        s"target/vecs_io_${math.abs(dir.hashCode)}.fvecs").getAbsolutePath
      val rows = emb(s, dir).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .iterator.map(_.getSeq[Float](0).toArray)
      graft.io.VecsIO.writeFvecsLocal(path, rows)
      graft.io.VecsIO.readFvecs(s, path)
        .select(col("id"),
          round(element_at(col("vec"), 1), 4).as("y0"),
          round(aggregate(col("vec").cast("array<double>"), lit(0.0),
            (a, x) => a + x * x), 4).as("nrm"))
    },
      Some("""SELECT row_number() OVER (ORDER BY vec_id) - 1 AS id,
             |  round(embedding[1], 4) AS y0,
             |  round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'), 4) AS nrm
             |FROM embeddings""".stripMargin)),

    // §2.1 VectorTransform persistence round-trip (write_VectorTransform
    // / read_VectorTransform, faiss/impl/index_write.cpp): save a
    // transform chain, load it back, apply the LOADED transform. Same
    // deterministic ±1 matrix and oracle as linear_transform — a
    // persistence bug (row/col swap, bias drop, float corruption)
    // breaks the value compare.
    ("transform_io_roundtrip", (s: SparkSession, dir: String) => {
      val mat = Array.tabulate(4, 64)((j, i) => if (((i >> j) & 1) == 0) 1f else -1f)
      val path = s"target/transform_io_${math.abs(dir.hashCode)}"
      graft.io.IndexIO.saveTransform(s, graft.transform.Chain(
        Seq(graft.transform.Linear(mat))), path)
      // unwrap to the raw matrix and apply via MatVec so the output
      // stays double (Linear.applyCol casts to float for chaining,
      // which would flip the compare schema to float32)
      val lin = graft.io.IndexIO.loadTransform(s, path) match {
        case l: graft.transform.Linear => l
        case graft.transform.Chain(Seq(l: graft.transform.Linear)) => l
        case other => throw new IllegalStateException(s"unexpected $other")
      }
      emb(s, dir).select(col("vec_id"),
        shim.col(graft.core.MatVec(shim.expr(col("embedding")), lin.a)).as("_y"))
        .select(col("vec_id"),
          round(element_at(col("_y"), 1), 4).as("y0"),
          round(element_at(col("_y"), 2), 4).as("y1"),
          round(element_at(col("_y"), 3), 4).as("y2"),
          round(element_at(col("_y"), 4), 4).as("y3"))
    },
      Some((0 until 4).map(j =>
        s"round(list_aggregate(list_transform(embedding::DOUBLE[], (x, i) -> CASE WHEN (((i-1)::BIGINT >> $j) & 1) = 0 THEN x ELSE -x END), 'sum'), 4) AS y$j")
        .mkString("SELECT vec_id, ", ", ", " FROM embeddings"))),

    // §2.11 index_factory end-to-end (index_factory.cpp:885): the
    // factory-built "IVF16,Flat" trains with the same deterministic
    // seed/iters as the memoized ivf16, so its centroids — and
    // therefore the nprobe=4 search — must match the ivf16 sidecar
    // replay exactly. Oracle-gates the parser + build + search path.
    ("factory_ivf_search", (s: SparkSession, dir: String) =>
      factoryIvf16(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(ivfNprobe4Sql)),

    // ,Refine(<code>) factory suffix (IndexRefine, index_factory.cpp:
    // 664): IVF coarse stage at full probe + a Refine(Flat) re-rank —
    // exact end to end (Refine(Flat) ≡ RFlat), so the oracle is the
    // plain exact top-5, proving the whole parse → coarse → k·kFactor
    // candidates → re-rank composition returns exactly the brute-force
    // answer.
    ("factory_refine_search", (s: SparkSession, dir: String) =>
      factoryRefine8(s, dir).search(qDf(s, dir, 10), 5, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $dL2, b.vec_id) AS "rank"
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 5""".stripMargin)),

    // §2.11 binary flat (BFlat): Hamming kNN over packed sign-bit codes
    ("knn_binary_hamming", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), sign_bits(col("embedding")).as("qcode"))
      val b = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), sign_bits(col("embedding")).as("code"))
      graft.index.BinaryFlat.knnJoin(q, b, 5)
    },
      Some("""SELECT qid, "rank", id, hd FROM (
             |  SELECT q.vec_id AS qid, b.vec_id AS id,
             |    (SELECT count(*) FROM range(1, 65) r(kk)
             |     WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)) AS hd,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      (SELECT count(*) FROM range(1, 65) r(kk)
             |       WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)), b.vec_id) AS "rank"
             |  FROM embeddings q CROSS JOIN embeddings b
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 5""".stripMargin)),

    // §2.12 recall / eval_intersection: recall@10 of half-dim search
    ("recall_half_dims", (s: SparkSession, dir: String) => {
      val truth = Knn.knnJoin(qDf(s, dir, 20), bDf(s, dir, 20), 10)
      val approx = Knn.knnJoin(
        qDf(s, dir, 20).withColumn("qvec", slice(col("qvec"), 1, 32)),
        bDf(s, dir, 20).withColumn("vec", slice(col("vec"), 1, 32)), 10)
      graft.eval.Recall.perQuery(truth, approx)
        .withColumn("recall", round(col("recall"), 4))
    },
      Some("""WITH t AS (SELECT qid, id FROM (
             |    SELECT q.vec_id AS qid, b.vec_id AS id,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS r
             |    FROM embeddings q CROSS JOIN embeddings b
             |    WHERE q.vec_id < 20 AND b.vec_id >= 20) x WHERE r <= 10),
             |a AS (SELECT qid, id FROM (
             |    SELECT q.vec_id AS qid, b.vec_id AS id,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_distance(q.embedding[1:32]::DOUBLE[], b.embedding[1:32]::DOUBLE[])^2, b.vec_id) AS r
             |    FROM embeddings q CROSS JOIN embeddings b
             |    WHERE q.vec_id < 20 AND b.vec_id >= 20) x WHERE r <= 10),
             |i AS (SELECT t.qid, count(*) AS c FROM t JOIN a ON t.qid = a.qid AND t.id = a.id GROUP BY t.qid)
             |SELECT q.qid, coalesce(c, 0)::BIGINT AS n_intersect, round(coalesce(c, 0)/10.0, 4) AS recall
             |FROM (SELECT DISTINCT qid FROM t) q LEFT JOIN i ON q.qid = i.qid""".stripMargin)),

    // §2.12 range_PR (contrib/evaluation.py:38-130): precision/recall
    // of a range-search result vs the exact radius scan, distances
    // ignored — here the half-dim scan plays the approximate side, so
    // both spurious results (precision < 1) and misses (recall < 1)
    // occur. Both reference modes: 'overall' pools the counts,
    // 'average' applies the per-query empty-set conventions then
    // averages. Oracle replays the set arithmetic per query in SQL.
    ("range_pr", (s: SparkSession, dir: String) => {
      val qs = qDf(s, dir, 10)
      val truth = Knn.rangeJoin(qs, bDf(s, dir, 10), 1.5)
      val approx = Knn.rangeJoin(
        qs.withColumn("qvec", slice(col("qvec"), 1, 32)),
        bDf(s, dir, 10).withColumn("vec", slice(col("vec"), 1, 32)), 1.5)
      val c = graft.eval.Recall.rangePRCounts(truth, approx, qs)
      graft.eval.Recall.rangePR(c, "overall").withColumn("mode", lit("overall"))
        .unionByName(
          graft.eval.Recall.rangePR(c, "average").withColumn("mode", lit("average")))
        .select(col("mode"), round(col("precision"), 4).as("precision"),
          round(col("recall"), 4).as("recall"))
    },
      Some(s"""WITH qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10),
              |gt AS (SELECT q.vec_id AS qid, b.vec_id AS id
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10 AND $dL2 < 1.5),
              |ap AS (SELECT q.vec_id AS qid, b.vec_id AS id
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10
              |    AND list_distance(q.embedding[1:32]::DOUBLE[], b.embedding[1:32]::DOUBLE[])^2 < 1.5),
              |c AS (SELECT qs.qid,
              |    coalesce(g.c, 0) AS ngt, coalesce(a.c, 0) AS nres, coalesce(i.c, 0) AS ninter
              |  FROM qs
              |  LEFT JOIN (SELECT qid, count(*) AS c FROM gt GROUP BY qid) g USING (qid)
              |  LEFT JOIN (SELECT qid, count(*) AS c FROM ap GROUP BY qid) a USING (qid)
              |  LEFT JOIN (SELECT gt.qid, count(*) AS c FROM gt JOIN ap ON ap.qid = gt.qid AND ap.id = gt.id GROUP BY gt.qid) i USING (qid))
              |SELECT 'overall' AS "mode",
              |  round(CASE WHEN sum(nres) > 0 THEN sum(ninter)*1.0/sum(nres) ELSE 1.0 END, 4) AS "precision",
              |  round(CASE WHEN sum(ngt) > 0 THEN sum(ninter)*1.0/sum(ngt)
              |             WHEN sum(nres) = 0 THEN 1.0 ELSE 0.0 END, 4) AS recall
              |FROM c
              |UNION ALL
              |SELECT 'average' AS "mode",
              |  round(avg(CASE WHEN nres > 0 THEN ninter*1.0/nres ELSE 1.0 END), 4) AS "precision",
              |  round(avg(CASE WHEN ngt > 0 THEN ninter*1.0/ngt WHEN nres = 0 THEN 1.0 ELSE 0.0 END), 4) AS recall
              |FROM c""".stripMargin)),

    // §2.6 range_search_max_results: radius search with a global cap
    ("range_maxres", (s: SparkSession, dir: String) =>
      Knn.rangeJoin(qDf(s, dir, 20), bDf(s, dir, 20), 2.0)
        .orderBy(col("dist"), col("qid"), col("id")).limit(50)
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT qid, id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 20 AND b.vec_id >= 20 AND $dL2 < 2.0
              |  ORDER BY dist, qid, id LIMIT 50) t""".stripMargin)),

    // §2.11 IndexPQ ADC search. Oracle reads the trained codebooks
    // sidecar (written by Verify, see OracleAux) and independently
    // re-derives encode (per-subspace argmin), the per-query LUT, and
    // the ADC sum in SQL — full hash check of the PQ pipeline.
    ("pq_adc_search", (s: SparkSession, dir: String) =>
      pq16(s, dir).search(qDf(s, dir, 10), 10).withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pq16_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.3 polysemous-style Hamming pre-filter before ADC: the oracle
    // additionally encodes the QUERIES and applies the same byte-wise
    // popcount filter before the ADC ranking.
    ("pq_polysemous_filter", (s: SparkSession, dir: String) =>
      pq16(s, dir).search(qDf(s, dir, 10), 10, polysemousHt = Some(48))
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pq16_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |qenc AS (SELECT qid, m, j FROM (
              |  SELECT q.qid, q.m, cb.j, row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qsub q JOIN cb ON cb.m = q.m) t WHERE rn = 1),
              |ham AS (SELECT qe.qid, e.id,
              |    list_aggregate(list(bit_count(xor(e.j::BIGINT, qe.j::BIGINT)) ORDER BY e.m), 'sum') AS hd
              |  FROM enc e JOIN qenc qe ON qe.m = e.m GROUP BY qe.qid, e.id),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j
              |  JOIN ham h ON h.qid = l.qid AND h.id = e.id
              |  WHERE h.hd <= 48 GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 fast-scan PQ (IndexPQFastScan, faiss/IndexPQFastScan.h:20;
    // quantize_lut.cpp round_uint8_per_column): 4-bit codes, per-query
    // LUT affine-quantized to uint8, INTEGER accumulation. The oracle
    // replays the whole pipeline — encode from the codebook sidecar,
    // LUT in double arithmetic, quantization (shared a = 255/max_span,
    // per-subquantizer bias), integer sum — exactly; qdist is integer
    // on both sides so the ranking compare is arithmetic-exact, and
    // dist = qdist/a + b is the same two double ops on both sides.
    ("pq4fs_search", (s: SparkSession, dir: String) =>
      pqfs8(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pqfs_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid WHERE "rank" <= 10""".stripMargin)),

    // §2.11 additive-quantizer fast-scan (ST_norm_rq2x4,
    // faiss/IndexAdditiveQuantizerFastScan.h:30): RQ codes + 2-nibble
    // scalar-RQ norm code scanned as one quantized-LUT integer
    // accumulate over L+2 columns. Oracle replays EVERYTHING from the
    // codes/codebook sidecars: reconstruction norms, greedy norm
    // encode, the −2·<q,cb> + norm-codebook LUT, uint8 quantization,
    // integer sum — qdist is integer-exact on both sides.
    ("rq4fs_search", (s: SparkSession, dir: String) =>
      rqfs2(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rq4fs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/rq4fs_normscale/*.parquet')),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id,
              |    sum(CASE WHEN l.m >= 2 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // LSQ-family AQ fast-scan (`LSQ2x4fs`,
    // IndexLocalSearchQuantizerFastScan, index_factory.cpp:610): the
    // SAME (L+2)-column quantized-LUT integer scan as rq4fs, with the
    // codes refined by iterated conditional modes. The ICM descent is
    // not SQL-replayable, so the oracle takes the engine's integer
    // codes (twin-call sidecar) and replays EVERYTHING downstream:
    // decode, reconstruction norms, greedy norm encode, the
    // -2<q,cb> + norm-codebook LUT, uint8 quantization, integer sum —
    // qdist integer-exact on both sides.
    ("lsq4fs_search", (s: SparkSession, dir: String) =>
      lsqfs2(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/lsq4fs_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/lsq4fs_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/lsq4fs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/lsq4fs_normscale/*.parquet')),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, sum(CASE WHEN l.m >= 2 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // Product AQ fast-scan (`PRQ2x2x4fs`,
    // IndexProductResidualQuantizerFastScan, index_factory.cpp:626):
    // two independent per-split RQs whose (ns*L+2)-column integer scan
    // reuses the flat machinery through ZERO-PADDED effective
    // codebooks (<q, cb_eff[s*L+l][j]> = <q_slice, cb_s[l][j]>). The
    // oracle reads the effective codebooks + the per-split-encoded
    // integer codes and replays decode (per-component the zero terms
    // are exact, so the 2-float round-once argument still holds),
    // norms, norm encode, the 6-column LUT, quantization and the
    // integer sum.
    ("prq4fs_search", (s: SparkSession, dir: String) =>
      prqfs22(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/prq4fs_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/prq4fs_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/prq4fs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/prq4fs_normscale/*.parquet')),
              |enc0 AS (SELECT id, r.m AS m, codes[r.m+1] AS j FROM codes, range(0,4) r(m)),
              |comp AS (SELECT e.id, generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM enc0 e JOIN cb ON cb.m = e.m AND cb.j = e.j),
              |sumd AS (SELECT id, i, sum(v)::REAL AS v FROM comp GROUP BY id, i),
              |dv AS (SELECT id, list(v ORDER BY i) AS dv FROM sumd GROUP BY id),
              |nb AS (SELECT id, list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dv),
              |n1 AS (SELECT id, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, m, j FROM enc0
              |  UNION ALL SELECT id, 4, j1 FROM n2
              |  UNION ALL SELECT id, 5, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 4 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, sum(CASE WHEN l.m >= 4 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // rescale_norm EXERCISED (VERDICT r13 #3): the flat AQ fast-scan
    // over the adversarial-span table trains norm_scale well above 1
    // (measured 8 at sf0.001), so the quantized LUT's two norm columns
    // are DIVIDED by it before the shared uint8 grid and the integer
    // scan multiplies their lookups back (NormTableScaler,
    // faiss/impl/LookupTableScaler.h:50; estimate_norm_scale,
    // IndexAdditiveQuantizerFastScan.cpp:111-145). The oracle replays
    // the whole chain from sidecars — decode, reconstruction norms,
    // greedy norm encode, divided-column LUT, quantization, the SCALED
    // integer accumulate — qdist integer-exact on both sides.
    ("rq4fs_rescale_search", (s: SparkSession, dir: String) =>
      rqfsRs(s, dir).search(qDf(s, dir, 10), 10),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq4fsrs_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq4fsrs_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rq4fsrs_normcb/*.parquet')),
              |ns AS (SELECT ns FROM read_parquet('$AUX/rq4fsrs_normscale/*.parquet')),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c / (SELECT ns FROM ns) AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id,
              |    sum(CASE WHEN l.m >= 2 THEN l.lq * (SELECT ns FROM ns) ELSE l.lq END)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 IVF AQ fast-scan (IndexIVFAdditiveQuantizerFastScan,
    // non-residual): the flat rq4fs scan behind a coarse-quantizer
    // probe at nprobe=4 of nlist=8. Oracle = probe replay (centroid
    // sidecar) + the full rq4fs integer replay with candidates
    // restricted to the probed lists' base assignment.
    ("ivfrq4fs_search", (s: SparkSession, dir: String) =>
      ivfrqfs8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/rq4fs_normcb/*.parquet')),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfrqfs_centroids/*.parquet')),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |dec AS (SELECT codes.id, codes.codes,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, codes,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS nv FROM dec),
              |n1 AS (SELECT id, codes, nv, j AS j1, c AS c1 FROM (
              |  SELECT nb.id, nb.codes, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, codes, j1, j AS j2 FROM (
              |  SELECT n1.id, n1.codes, n1.j1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, 0 AS m, codes[1] AS j FROM n2
              |  UNION ALL SELECT id, 1, codes[2] FROM n2
              |  UNION ALL SELECT id, 2, j1 FROM n2
              |  UNION ALL SELECT id, 3, j2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j
              |  JOIN basg ba ON ba.id = e.id JOIN probes p ON p.qid = l.qid AND p.list_no = ba.list_no
              |  GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qn.qn + qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid JOIN qn ON qn.qid = w.qid
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 IVF fast-scan (IndexIVFPQFastScan, non-residual — the
    // reference default, IndexIVFPQFastScan.cpp:47): probe replay at
    // nprobe=4 + the same exact quantized-LUT integer replay over the
    // probed lists' candidates.
    ("ivfpq4fs_search", (s: SparkSession, dir: String) =>
      ivfpqfs8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(ivfpq4fsNprobe4Sql)),

    // `IVF<n>_HNSW<m>,PQ<M>x4fs` — HNSW coarse composed with the
    // nibble-packed fast-scan code (the factory parses the coarse
    // independently of the code, index_factory.cpp:253-256). Same
    // memoized index as ivfpq4fs_search; efSearch = 4096 >= nlist
    // degenerates the walk to the exact probe set, so the quantized
    // integer-LUT replay applies verbatim.
    ("ivf_hnsw_pq4fs_search", (s: SparkSession, dir: String) =>
      ivfpqfs8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4,
        coarse = Some(graft.index.Probes.HnswCoarse(4096))),
      Some(ivfpq4fsNprobe4Sql)),

    // Residual IVFPQ fast-scan (IVF8,PQ8x4fsr — by_residual = true,
    // bulk-loaded from the trained ivfpq8 via the
    // IndexIVFPQFastScan(const IndexIVFPQ&) path, so the oracle reads
    // the SAME centroid/codebook sidecars): per-(query, probed-list)
    // quantized LUT over the float32 residual, integer ADC, candidates
    // ranked on the dequantized qdist/a + b (the reference's per-list
    // normalizers applied before the cross-list merge).
    ("ivfpq4fsr_search", (s: SparkSession, dir: String) =>
      ivfpqfsr8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
              |qres AS (SELECT q.vec_id AS qid, p.list_no,
              |    list_transform(list_zip(q.embedding, c.c), x -> x[1] - x[2]) AS res
              |  FROM embeddings q JOIN probes p ON p.qid = q.vec_id
              |  JOIN cent c ON c.list_no = p.list_no),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |colstat AS (SELECT qid, list_no, m, min(pd) AS mn, max(pd) - min(pd) AS span
              |  FROM lut GROUP BY qid, list_no, m),
              |scal AS (SELECT qid, list_no, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid, list_no),
              |lq AS (SELECT l.qid, l.list_no, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.list_no = l.list_no AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid AND sc.list_no = l.list_no),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::DOUBLE / any_value(sc.a) + any_value(sc.b) AS dist
              |  FROM enc e JOIN lq l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  JOIN scal sc ON sc.qid = l.qid AND sc.list_no = e.list_no
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM acc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // By-residual IVF AQ fast-scan (IVF8,RQ2x4fsr,
    // IndexIVFAdditiveQuantizerFastScan.cpp:590 + the LUT-math block
    // :353-403): the RQ encodes RESIDUALS but the stored 2-nibble norm
    // carries the FULL reconstruction norm ||c + decode(r)||^2, so the
    // LUT stays one-per-query over q itself and the by-residual part
    // is a scalar -2<q,c> bias per probed list; candidates rank on the
    // dequantized q^2 + bias + qdist/a + b. The oracle replays the
    // ENTIRE chain from three sidecars (centroids, residual codebooks,
    // norm codebooks): coarse assignment, float32 residuals, the
    // greedy (beam=1) two-level RQ encode, decode + reconstruction
    // norm, the greedy 2x4 norm encode, the (L+2)-column LUT, uint8
    // quantization, probe selection, integer accumulate, bias and
    // dequantized ranking.
    ("ivfrq4fsr_search", (s: SparkSession, dir: String) =>
      ivfrqfsr8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfrqfsr_centroids/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/ivfrqfsr_codebooks/*.parquet')),
              |ncb AS (SELECT l, j, c FROM read_parquet('$AUX/ivfrqfsr_normcb/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |e0 AS (SELECT id, list_no, res, j AS j0 FROM (
              |  SELECT b.id, b.list_no, b.res, cb.j, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.res::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bres b JOIN cb ON cb.m = 0) t WHERE rn = 1),
              |r1 AS (SELECT e0.id, e0.list_no, e0.j0,
              |    list_transform(list_zip(e0.res, c0.c), p -> p[1] - p[2]) AS res1
              |  FROM e0 JOIN cb c0 ON c0.m = 0 AND c0.j = e0.j0),
              |e1 AS (SELECT id, list_no, j0, j AS j1 FROM (
              |  SELECT r.id, r.list_no, r.j0, cb.j, row_number() OVER (PARTITION BY r.id ORDER BY
              |    list_aggregate(list_transform(list_zip(r.res1::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM r1 r JOIN cb ON cb.m = 1) t WHERE rn = 1),
              |dec AS (SELECT e1.id, e1.list_no, e1.j0, e1.j1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM e1 JOIN cb c0 ON c0.m = 0 AND c0.j = e1.j0
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = e1.j1),
              |nb AS (SELECT d.id, d.list_no, d.j0, d.j1,
              |    list_aggregate(list_transform(list_transform(list_zip(c.c, d.dv), p -> (p[1] + p[2])::REAL)::DOUBLE[], x -> x*x), 'sum') AS nv
              |  FROM dec d JOIN cent c ON c.list_no = d.list_no),
              |n1 AS (SELECT id, list_no, j0, j1, nv, j AS m1, c AS c1 FROM (
              |  SELECT nb.id, nb.list_no, nb.j0, nb.j1, nb.nv, ncb.j, ncb.c,
              |    row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.nv - ncb.c), ncb.j) AS rn
              |  FROM nb JOIN ncb ON ncb.l = 0) t WHERE rn = 1),
              |n2 AS (SELECT id, list_no, j0, j1, m1, j AS m2 FROM (
              |  SELECT n1.id, n1.list_no, n1.j0, n1.j1, n1.m1, ncb.j,
              |    row_number() OVER (PARTITION BY n1.id ORDER BY abs((n1.nv - n1.c1) - ncb.c), ncb.j) AS rn
              |  FROM n1 JOIN ncb ON ncb.l = 1) t WHERE rn = 1),
              |enc AS (SELECT id, list_no, 0 AS m, j0 AS j FROM n2
              |  UNION ALL SELECT id, list_no, 1, j1 FROM n2
              |  UNION ALL SELECT id, list_no, 2, m1 FROM n2
              |  UNION ALL SELECT id, list_no, 3, m2 FROM n2),
              |lut AS (SELECT q.vec_id AS qid, cb.m, cb.j,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS pd
              |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < 10
              |  UNION ALL
              |  SELECT q.vec_id AS qid, 2 + ncb.l AS m, ncb.j, ncb.c AS pd
              |  FROM embeddings q CROSS JOIN ncb WHERE q.vec_id < 10),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |probes AS (SELECT qid, list_no, bias FROM (
              |  SELECT q.vec_id AS qid, c.list_no,
              |    -2 * list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> p[1]*p[2]), 'sum') AS bias,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |qn AS (SELECT vec_id AS qid,
              |    list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') AS qn
              |  FROM embeddings WHERE vec_id < 10),
              |acc AS (SELECT l.qid, e.id, any_value(p.bias) AS bias, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j
              |  JOIN probes p ON p.qid = l.qid AND p.list_no = e.list_no
              |  GROUP BY l.qid, e.id),
              |d AS (SELECT a.qid, a.id, qn.qn + a.bias + a.qdist / sc.a + sc.b AS dist
              |  FROM acc a JOIN scal sc ON sc.qid = a.qid JOIN qn ON qn.qid = a.qid)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 IVFPQ: residual PQ inside the pruned IVF join. nprobe =
    // nlist here, so the oracle replays coarse assignment (argmin over
    // the centroid sidecar), the float32 residual, residual encode,
    // per-(query, list) LUT over (q - centroid), and the ADC sum.
    ("ivfpq_search", (s: SparkSession, dir: String) =>
      ivfpq8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(ivfpqNprobe8Sql)),

    // `IVF<n>_HNSW<m>,PQ<m>` — the canonical billion-scale factory
    // recipe (index_factory.cpp:253-256 parses the coarse quantizer
    // independently of the code; benchs/bench_all_ivf runs
    // IVF65536_HNSW32,PQ16): probe selection walks a per-executor
    // HNSW graph over the centroids instead of the exact O(nlist)
    // argmin, then the residual-PQ ADC search is unchanged. The
    // factory trains with the same deterministic seed/iters as the
    // memoized ivfpq8, and efSearch = max(32, 4·nprobe) >= nlist here
    // makes the walk cover the whole graph — so the full parse →
    // build → HNSW-probe → ADC chain must reproduce the ivfpq replay
    // exactly (the ivf_hnsw_search convention).
    ("ivf_hnsw_pq_search", (s: SparkSession, dir: String) =>
      factoryIvfHnswPq8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(ivfpqNprobe8Sql)),

    // IVFPQ + polysemous Hamming pre-filter (IndexIVFPQ.h:41
    // polysemous_ht — the filter every SIFT1B/Deep1B operating point
    // sets): candidates whose stored code is more than ht bits from
    // the query's per-list residual code are dropped BEFORE the ADC
    // distance. The oracle replays the full ivfpq chain plus the
    // query-side residual encode and the integer Hamming filter.
    ("ivfpq_polysemous_search", (s: SparkSession, dir: String) =>
      ivfpq8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 8,
        polysemousHt = Some(16))
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qres AS (SELECT q.vec_id AS qid, c.list_no,
              |    list_transform(list_zip(q.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |qenc AS (SELECT qid, list_no, m, j FROM (
              |  SELECT q.qid, q.list_no, q.m, cb.j, row_number() OVER (PARTITION BY q.qid, q.list_no, q.m ORDER BY
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qsub q JOIN cb ON cb.m = q.m) t WHERE rn = 1),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |ham AS (SELECT e.id, qe.qid, e.list_no,
              |    sum(bit_count(xor(e.j::BIGINT, qe.j::BIGINT)))::INT AS hd
              |  FROM enc e JOIN qenc qe ON qe.list_no = e.list_no AND qe.m = e.m
              |  GROUP BY e.id, qe.qid, e.list_no),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  JOIN ham h ON h.id = e.id AND h.qid = l.qid AND h.list_no = e.list_no
              |  WHERE h.hd <= 16
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVFPQ lossy reconstruction (reconstruct_from_offset,
    // faiss/IndexIVFPQ.cpp): centroid + decoded residual, one
    // broadcast join + in-row decode. The oracle replays assignment,
    // residual encode, codeword lookup, and the float32 centroid add.
    ("ivfpq_reconstruct", (s: SparkSession, dir: String) =>
      ivfpq8(s, dir).reconstruct
        .join(emb(s, dir).select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"), round(element_at(col("vec"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("vec").cast("array<double>"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |cbf AS (SELECT m, j, c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |dres AS (SELECT e.id, flatten(list(f.c ORDER BY e.m)) AS dv
              |  FROM enc e JOIN cbf f ON f.m = e.m AND f.j = e.j GROUP BY e.id),
              |rec AS (SELECT a.id,
              |    list_transform(list_zip(c.c, d.dv), p -> p[1] + p[2]) AS rv
              |  FROM basg a JOIN cent c ON c.list_no = a.list_no JOIN dres d ON d.id = a.id)
              |SELECT r.id, round(r.rv[1], 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], r.rv::DOUBLE[]),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM rec r JOIN embeddings b ON b.vec_id = r.id""".stripMargin)),

    // IVFPQ range search (IndexIVFPQ::range_search): every candidate
    // in the probed lists whose ADC distance over the residual LUT is
    // under the radius — the filter applies below any aggregation, so
    // only in-radius rows leave the scan. nprobe = nlist ⇒ the probed
    // set is the whole base; the oracle replays the full residual
    // encode + LUT + ADC chain and keeps dist < r.
    ("ivfpq_range_search", (s: SparkSession, dir: String) =>
      ivfpq8(s, dir).rangeSearch(qDf(s, dir, 10), radius = 1.3, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qres AS (SELECT q.vec_id AS qid, c.list_no,
              |    list_transform(list_zip(q.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, id, round(dist, 4) AS dist FROM adc WHERE dist < 1.3""".stripMargin)),

    // §2.7 intersect (left_semi) of two id sets
    ("intersect_ids", (s: SparkSession, dir: String) => {
      val a = emb(s, dir).filter(col("vec_id") % 2 === 0).select(col("vec_id"))
      val b = emb(s, dir).filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      a.join(b, Seq("vec_id"), "left_semi")
    },
      Some("SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 3 = 0")),

    // §2.7 except (left_anti)
    ("except_ids", (s: SparkSession, dir: String) => {
      val a = emb(s, dir).filter(col("vec_id") % 2 === 0).select(col("vec_id"))
      val b = emb(s, dir).filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      a.join(b, Seq("vec_id"), "left_anti")
    },
      Some("SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 3 <> 0")),

    // §2.3 search_and_reconstruct: kNN that also returns the matched
    // vector (joined back on id, rounded first component as witness)
    ("search_and_reconstruct", (s: SparkSession, dir: String) => {
      val res = Knn.knnJoin(qDf(s, dir, 10), bDf(s, dir, 10), 5)
      res.join(bDf(s, dir, 10), "id")
        .select(col("qid"), col("rank"), col("id"), r4("dist").as("dist"),
          round(element_at(col("vec"), 1).cast("double"), 4).as("v1"))
    },
      Some(s"""SELECT qid, "rank", id, round(dist, 4) AS dist, round(v1, 4) AS v1 FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist,
              |    b.embedding[1]::DOUBLE AS v1,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $dL2, b.vec_id) AS "rank"
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 5""".stripMargin)),

    // §2.3 IndexFlat1D: exact 1-D nearest search (|q - v| metric)
    ("knn_1d", (s: SparkSession, dir: String) => {
      val vals = emb(s, dir).select(col("vec_id").as("id"),
        element_at(col("embedding"), 1).cast("double").as("v"))
      val qs = vals.filter(col("id") < 10)
        .select(col("id").as("qid"), col("v").as("qv"))
      val base = vals.filter(col("id") >= 10)
      base.crossJoin(broadcast(qs))
        .select(col("qid"), col("id"), abs(col("v") - col("qv")).as("_d"))
        .groupBy(col("qid"))
        .agg(topk(col("_d"), col("id"), 3, asc = true).as("_tk"))
        .select(col("qid"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
        .select(col("qid"), (col("_pos") + 1).cast("long").as("rank"),
          col("_r.id").as("id"), round(col("_r.dist"), 4).as("dist"))
    },
      Some("""SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT q.vec_id AS qid, b.vec_id AS id,
             |    abs(b.embedding[1]::DOUBLE - q.embedding[1]::DOUBLE) AS dist,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      abs(b.embedding[1]::DOUBLE - q.embedding[1]::DOUBLE), b.vec_id) AS "rank"
             |  FROM embeddings q CROSS JOIN embeddings b
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 3""".stripMargin)),

    // §2.3 range search under a similarity metric (IP: dist > radius)
    ("range_search_ip", (s: SparkSession, dir: String) =>
      Knn.rangeJoin(qDf(s, dir, 20), bDf(s, dir, 20), 0.35, metric = "ip")
        .withColumn("dist", r4("dist")),
      Some(s"""SELECT q.vec_id AS qid, b.vec_id AS id, round($dIp, 4) AS dist
              |FROM embeddings q CROSS JOIN embeddings b
              |WHERE q.vec_id < 20 AND b.vec_id >= 20 AND $dIp > 0.35""".stripMargin)),

    // §2.7 get_invlist_range: export a contiguous range of lists.
    // Oracle re-derives the list assignment from the centroid sidecar.
    ("invlist_range", (s: SparkSession, dir: String) =>
      ivf16(s, dir).invlists.filter(col("list_no").between(0, 7))
        .groupBy(col("list_no")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).cast("long").as("n_lists"), sum(col("cnt")).as("n_rows")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf16_centroids/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1)
              |SELECT count(DISTINCT list_no)::BIGINT AS n_lists, count(*)::BIGINT AS n_rows
              |FROM basg WHERE list_no BETWEEN 0 AND 7""".stripMargin)),

    // §2.11 LSH: seeded random rotation + sign bits + Hamming search.
    // Oracle reads the rotation-matrix sidecar, re-derives the rotated
    // float32 sign bits per dim, and counts mismatches (Hamming is
    // bit-packing-independent).
    ("lsh_search", (s: SparkSession, dir: String) => {
      val rot = rot64(s, dir)
      val enc = (c: org.apache.spark.sql.Column) => sign_bits(rot.applyCol(c))
      val q = qDf(s, dir, 10).select(col("qid"), enc(col("qvec")).as("qcode"))
      val b = bDf(s, dir, 10).select(col("id"), enc(col("vec")).as("code"))
      graft.index.BinaryFlat.knnJoin(q, b, 10)
    },
      Some(s"""WITH bits AS (SELECT vec_id, list((yv >= 0) ORDER BY d) AS bv FROM (
              |  SELECT e.vec_id, r.d,
              |    (list_aggregate(list_transform(list_zip(r.r::DOUBLE[], e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum'))::REAL AS yv
              |  FROM embeddings e CROSS JOIN read_parquet('$AUX/rot64/*.parquet') r) t GROUP BY vec_id),
              |hd AS (SELECT q.vec_id AS qid, b.vec_id AS id,
              |    len(list_filter(list_zip(q.bv, b.bv), p -> p[1] <> p[2]))::BIGINT AS hd
              |  FROM bits q JOIN bits b ON q.vec_id < 10 AND b.vec_id >= 10)
              |SELECT qid, "rank", id, hd FROM (
              |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 10""".stripMargin)),

    // Reference LSH spelling with trained thresholds (factory "LSHt",
    // IndexLSH.cpp:58-97: nbits = d, bit = component >= its
    // per-component MEDIAN over the training set). Fully replayable
    // with no sidecar: DuckDB's interpolated median matches Spark's
    // exact percentile(0.5), the centered value is float-cast before
    // the sign test (the engine's array<float> codes), and the
    // Hamming ranking follows the lsh_search replay.
    ("lsh_threshold_search", (s: SparkSession, dir: String) =>
      cached(s"lshT:$dir") {
        graft.index.IndexFactory.build(bDf(s, dir, 10), "id", "vec", "LSHt")
      }.search(qDf(s, dir, 10), 10),
      Some("""WITH med AS (SELECT i, median(x) AS md FROM (
             |  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding::DOUBLE[]) AS x
             |  FROM embeddings WHERE vec_id >= 10) t GROUP BY i),
             |bits AS (SELECT vec_id, list((CAST(e.x - m.md AS REAL) >= 0) ORDER BY e.i) AS bv FROM (
             |  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding::DOUBLE[]) AS x
             |  FROM embeddings) e JOIN med m ON m.i = e.i GROUP BY vec_id),
             |hd AS (SELECT q.vec_id AS qid, b.vec_id AS id,
             |    len(list_filter(list_zip(q.bv, b.bv), p -> p[1] <> p[2]))::BIGINT AS hd
             |  FROM bits q JOIN bits b ON q.vec_id < 10 AND b.vec_id >= 10)
             |SELECT qid, "rank", id, hd FROM (
             |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank" FROM hd) w
             |WHERE "rank" <= 10""".stripMargin)),

    // §2.9 PCAMatrix as a DIRECT oracle row (canonical #63; previously
    // ScalaTest-only): kNN in the PCA-16 space. The oracle replays the
    // trained projection from the pca16 sidecar (double mat-vec + bias,
    // float32 cast — the Linear output contract, pdk_rot precedent)
    // then the exact L2 ranking.
    ("pca_knn", (s: SparkSession, dir: String) => {
      val p = pca16(s, dir)
      Knn.knnJoin(
        qDf(s, dir, 10).withColumn("qvec", p.applyCol(col("qvec"))),
        bDf(s, dir, 10).withColumn("vec", p.applyCol(col("vec"))), 5)
        .withColumn("dist", r4("dist"))
    },
      Some(s"""WITH rot AS (SELECT d, r::DOUBLE[] AS r, bias FROM read_parquet('$AUX/pca16/*.parquet')),
              |rv AS (SELECT vec_id, list(yv ORDER BY d) AS v FROM (
              |  SELECT e.vec_id, r.d,
              |    ((list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')) + r.bias::DOUBLE)::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |dd AS (SELECT q.vec_id AS qid, b.vec_id AS id,
              |    list_aggregate(list_transform(list_zip(q.v::DOUBLE[], b.v::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM rv q CROSS JOIN rv b WHERE q.vec_id < 10 AND b.vec_id >= 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM dd) w
              |WHERE "rank" <= 5""".stripMargin)),

    // §2.9 ITQMatrix as a DIRECT oracle row (canonical #65; previously
    // ScalaTest-only): sign-binarize under the trained ITQ rotation,
    // then Hamming kNN — the lsh_search replay with the itq32 sidecar
    // (which folds PCA + Procrustes rotation + centering bias).
    ("itq_lsh_search", (s: SparkSession, dir: String) => {
      val it = itq32(s, dir)
      val enc = (c: org.apache.spark.sql.Column) => sign_bits(it.applyCol(c))
      val q = qDf(s, dir, 10).select(col("qid"), enc(col("qvec")).as("qcode"))
      val b = bDf(s, dir, 10).select(col("id"), enc(col("vec")).as("code"))
      graft.index.BinaryFlat.knnJoin(q, b, 10)
    },
      Some(s"""WITH rot AS (SELECT d, r::DOUBLE[] AS r, bias FROM read_parquet('$AUX/itq32/*.parquet')),
              |bits AS (SELECT vec_id, list((yv >= 0) ORDER BY d) AS bv FROM (
              |  SELECT e.vec_id, r.d,
              |    ((list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')) + r.bias::DOUBLE)::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |hd AS (SELECT q.vec_id AS qid, b.vec_id AS id,
              |    len(list_filter(list_zip(q.bv, b.bv), p -> p[1] <> p[2]))::BIGINT AS hd
              |  FROM bits q JOIN bits b ON q.vec_id < 10 AND b.vec_id >= 10)
              |SELECT qid, "rank", id, hd FROM (
              |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.9 OPQ: learned rotation + PQ. Oracle rotates both sides with
    // the rotation sidecar (double mat-vec, float32 cast — the Linear
    // transform's output contract), then replays the flat-PQ
    // encode/LUT/ADC with the OPQ codebooks sidecar.
    ("opq_pq_search", (s: SparkSession, dir: String) => {
      val base = bDf(s, dir, 10)
      val (rot, pqm) = opqModel(s, dir)
      val idx = new graft.index.PqIndex(pqm,
        pqm.encode(base.withColumn("vec", rot.applyCol(col("vec"))), "id", "vec"))
      idx.search(qDf(s, dir, 10).withColumn("qvec", rot.applyCol(col("qvec"))), 10)
        .withColumn("dist", r4("dist"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/opq_codebooks/*.parquet')),
              |rv AS (SELECT vec_id, list(yv ORDER BY d) AS v FROM (
              |  SELECT e.vec_id, r.d,
              |    (list_aggregate(list_transform(list_zip(r.r::DOUBLE[], e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum'))::REAL AS yv
              |  FROM embeddings e CROSS JOIN read_parquet('$AUX/opq_rot/*.parquet') r) t GROUP BY vec_id),
              |bsub AS (SELECT vec_id AS id, r.m AS m, v[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM rv, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, v[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM rv, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // Dimension-CHANGING OPQ prefix (factory OPQ8_32 — OPQMatrix
    // (d, M, d_out), index_factory.cpp:211; reference test_factory.py
    // uses OPQ16_64): PCA 64→32, OPQ rotation in the reduced space,
    // then residual IVFPQ over the 32-dim vectors. The oracle replays
    // EVERY stage from sidecars: both linear stages (::REAL after each,
    // matching the engine's per-transform float32 output), coarse
    // argmin assign, residual PQ encode, per-query residual LUT, ADC.
    // nprobe = nlist so no probe pruning enters the replay.
    ("opq32_ivfpq_search", (s: SparkSession, dir: String) => {
      val (p, rot, idx) = opq32Ivfpq(s, dir)
      val tq = qDf(s, dir, 10)
        .withColumn("qvec", rot.applyCol(p.applyCol(col("qvec"))))
      idx.search(tq, 10, nprobe = 16).withColumn("dist", r4("dist"))
    },
      Some(s"""WITH pc AS (SELECT d, r::DOUBLE[] AS r, bias FROM read_parquet('$AUX/opq32_pca/*.parquet')),
              |rt AS (SELECT d, r::DOUBLE[] AS r FROM read_parquet('$AUX/opq32_rot/*.parquet')),
              |pv AS (SELECT vec_id, list(yv ORDER BY d) AS v FROM (
              |  SELECT e.vec_id, p.d,
              |    ((list_aggregate(list_transform(list_zip(p.r, e.embedding::DOUBLE[]), z -> z[1]*z[2]), 'sum')) + p.bias::DOUBLE)::REAL AS yv
              |  FROM embeddings e CROSS JOIN pc p) t GROUP BY vec_id),
              |rv AS (SELECT vec_id, list(yv ORDER BY d) AS v FROM (
              |  SELECT x.vec_id, r.d,
              |    (list_aggregate(list_transform(list_zip(r.r, x.v::DOUBLE[]), z -> z[1]*z[2]), 'sum'))::REAL AS yv
              |  FROM pv x CROSS JOIN rt r) t GROUP BY vec_id),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/opq32_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/opq32_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.v::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM rv b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.v, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN rv b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub2 AS (SELECT id, list_no, r.m AS m, res[r.m*4+1:r.m*4+4]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc2 AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub2 b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qres AS (SELECT q.vec_id AS qid, c.list_no,
              |    list_transform(list_zip(q.v, c.c), p -> p[1] - p[2]) AS res
              |  FROM rv q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qsub2 AS (SELECT qid, list_no, r.m AS m, res[r.m*4+1:r.m*4+4]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub2 q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc2 e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.4 two-level clustering (scalable nlist path). Sidecar oracle
    // replays the final assignment (sizes + objective) like kmeans_train.
    ("two_level_centroids", (s: SparkSession, dir: String) => {
      val cents = twoLevel12(s, dir)
      val a = shim.col(graft.core.NearestCentroid(shim.expr(col("embedding")), cents))
      emb(s, dir).select(col("vec_id"), a.as("_a"))
        .select(col("vec_id"), col("_a.list_no").as("list_no"), col("_a.dist").as("dist"))
        .groupBy(col("list_no"))
        .agg(count(lit(1)).as("n"), round(sum(col("dist")), 3).as("obj"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/twolevel_centroids/*.parquet')),
              |d AS (SELECT e.vec_id, c.list_no,
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM embeddings e CROSS JOIN cent c),
              |a AS (SELECT vec_id, list_no, dist FROM (
              |  SELECT vec_id, list_no, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_no) AS rn FROM d) t
              |  WHERE rn = 1)
              |SELECT list_no, count(*)::BIGINT AS n, round(sum(dist), 3) AS obj
              |FROM a GROUP BY list_no""".stripMargin)),

    // §2.3 IVFPQR: second residual codebook re-rank (true faiss shape,
    // no raw vectors stored); exact-vector re-rank variant remains in
    // Refine.ivfPqRefineSearch. The oracle replays BOTH stages: ADC
    // over codebook-1 keeps k*kFactor candidates, then the
    // two-codebook float32 reconstruction re-ranks them.
    ("ivfpqr_search", (s: SparkSession, dir: String) =>
      ivfpqr8(s, dir).search(qDf(s, dir, 10), k = 5, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpqr_centroids/*.parquet')),
              |cb1 AS (SELECT m, j, c FROM read_parquet('$AUX/ivfpqr_codebooks1/*.parquet')),
              |cb2 AS (SELECT m, j, c FROM read_parquet('$AUX/ivfpqr_codebooks2/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc1 AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb1 cb ON cb.m = b.m) t WHERE rn = 1),
              |dec1 AS (SELECT e.id, flatten(list(cb.c ORDER BY e.m)) AS v
              |  FROM enc1 e JOIN cb1 cb ON cb.m = e.m AND cb.j = e.j GROUP BY e.id),
              |res2 AS (SELECT r.id, r.list_no,
              |    list_transform(list_zip(r.res, d.v), p -> p[1] - p[2]) AS res
              |  FROM bres r JOIN dec1 d ON d.id = r.id),
              |bsub2 AS (SELECT id, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |          FROM res2, range(0,8) r(m)),
              |enc2 AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub2 b JOIN cb2 cb ON cb.m = b.m) t WHERE rn = 1),
              |dec2 AS (SELECT e.id, flatten(list(cb.c ORDER BY e.m)) AS v
              |  FROM enc2 e JOIN cb2 cb ON cb.m = e.m AND cb.j = e.j GROUP BY e.id),
              |qres AS (SELECT q.vec_id AS qid, c.list_no,
              |    list_transform(list_zip(q.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb1 cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS d1
              |  FROM enc1 e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id),
              |st1 AS (SELECT qid, id FROM (
              |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY d1, id) AS rn FROM adc) t
              |  WHERE rn <= 20),
              |resc AS (SELECT s1.qid, s1.id,
              |    list_aggregate(list_transform(
              |      list_zip(q.res::DOUBLE[], list_transform(list_zip(d1.v, d2.v), p -> p[1] + p[2])::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM st1 s1
              |  JOIN basg a ON a.id = s1.id
              |  JOIN qres q ON q.qid = s1.qid AND q.list_no = a.list_no
              |  JOIN dec1 d1 ON d1.id = s1.id
              |  JOIN dec2 d2 ON d2.id = s1.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM resc) w
              |WHERE "rank" <= 5""".stripMargin)),

    // Index2Layer (faiss/Index2Layer.h:29): IVFPQ codes without
    // inverted lists — random-access encoded storage; the faithful API
    // surface is encode + reconstruct (search is unimplemented in the
    // reference, Index2Layer.h:53). Both sides DECODE from the
    // engine's stored integer codes in IDENTICAL pure-DOUBLE
    // arithmetic — codebook lookup, coarse-centroid add, error fold —
    // the exact pattern that greens zn_lattice_roundtrip — but the
    // compared columns are INTEGER-quantized (round(x*1e4) as BIGINT)
    // rather than 4-dp doubles: Spark's round (BigDecimal→nearest
    // double) and DuckDB's (decimal-corrected double rounding,
    // half-away-from-zero at the requested digit — verified
    // round(2.675::DOUBLE,2)=2.68, so NOT a naive std::round(x*1e2);
    // ADVICE r07/r08) can disagree by 1 ulp on the
    // REPRESENTATION of the same 4-dp decimal, which
    // passes a 6-dp-tolerant compare but flips an exact value hash
    // (the r04-r06 red). round-to-integer of bit-identical doubles is
    // semantics-identical on both stacks (half-away-from-zero), so
    // BIGINTs hash exactly. Float reconstruct-vs-decode consistency
    // is covered by TwoLayerSpec; replaying the chained argmin ENCODE
    // in SQL stays deliberately avoided (near-tie float32 vs DOUBLE
    // assignments diverge).
    ("index2layer_roundtrip", (s: SparkSession, dir: String) => {
      val tl = twoLayer16(s, dir)
      val codes = tl.codes.select(col("id"), col("list_no"),
        transform(sequence(lit(1), lit(8)),
          i => conv(hex(col("code").substr(i, lit(1))), 16, 10).cast("int")).as("code"))
      val centD = OracleAux.centroidsDf(s, tl.centroids)
        .select(col("list_no"), col("c").cast("array<double>").as("cent"))
      val cbD = OracleAux.codebooksDf(s, tl.model.codebooks)
        .select(col("m"), col("j"), col("c").cast("array<double>").as("cc"))
      val per = codes.select(col("id"), col("list_no"), posexplode(col("code")))
        .withColumnRenamed("pos", "m").withColumnRenamed("col", "j")
      val dec = per.join(broadcast(cbD), Seq("m", "j"))
        .groupBy("id", "list_no")
        .agg(sort_array(collect_list(struct(col("m"), col("cc")))).as("parts"))
        .select(col("id"), col("list_no"),
          flatten(transform(col("parts"), p => p.getField("cc"))).as("dv"))
      dec.join(broadcast(centD), "list_no")
        .select(col("id"), zip_with(col("cent"), col("dv"), (a, b) => a + b).as("rv"))
        .join(emb(s, dir).select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"),
          round(element_at(col("rv"), 1) * lit(10000.0)).cast("long").as("d1q"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("rv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x) * lit(10000.0)).cast("long").as("errq"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/twolayer_centroids/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/twolayer_codebooks/*.parquet')),
              |codes AS (SELECT id, list_no, code FROM read_parquet('$AUX/twolayer_codes/*.parquet')),
              |dec AS (SELECT cs.id, flatten(list(cb.c::DOUBLE[] ORDER BY cb.m)) AS dv
              |  FROM (SELECT id, r.m AS m, code[r.m+1] AS j FROM codes, range(0,8) r(m)) cs
              |  JOIN cb ON cb.m = cs.m AND cb.j = cs.j GROUP BY cs.id),
              |recon AS (SELECT c0.id,
              |    list_transform(list_zip(ct.c::DOUBLE[], d.dv), p -> p[1] + p[2]) AS rv
              |  FROM codes c0 JOIN cent ct ON ct.list_no = c0.list_no JOIN dec d ON d.id = c0.id)
              |SELECT r.id, CAST(round(r.rv[1] * 10000.0) AS BIGINT) AS d1q,
              |  CAST(round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], r.rv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') * 10000.0) AS BIGINT) AS errq
              |FROM recon r JOIN embeddings b ON b.vec_id = r.id""".stripMargin)),

    // Residual2x4,PQ8 — the MIQ-first-layer 2-layer form
    // (index_factory.cpp:270-278: `Residual<M>x<nbit>` returns a
    // MultiIndexQuantizer with nlist = 2^(M*nbit), use_2layer).
    // Decode-from-codes oracle, the index2layer_roundtrip convention:
    // both sides reconstruct rv = concat(coarse_cb0[j0], coarse_cb1[j1])
    // + PQ-decode(code) in DOUBLE from the engine's stored digits and
    // compare quantized first-dim and reconstruction-error values
    // (replaying the chained float32 argmin encodes in SQL diverges on
    // near-ties; TwoLayerSpec proves encode consistency).
    ("residual_mxn_roundtrip", (s: SparkSession, dir: String) => {
      val rmq = resMiq24(s, dir)
      val codes = rmq.codes.select(col("id"),
        (col("cell") / 16).cast("long").cast("int").as("_j0"),
        (col("cell") % 16).cast("int").as("_j1"),
        transform(sequence(lit(1), lit(8)),
          i => conv(hex(col("code").substr(i, lit(1))), 16, 10).cast("int")).as("code"))
      val ccbD = OracleAux.codebooksDf(s, rmq.coarse.codebooks)
      val c0 = ccbD.filter(col("m") === 0)
        .select(col("j").as("_j0"), col("c").cast("array<double>").as("_c0"))
      val c1 = ccbD.filter(col("m") === 1)
        .select(col("j").as("_j1"), col("c").cast("array<double>").as("_c1"))
      val cbD = OracleAux.codebooksDf(s, rmq.model.codebooks)
        .select(col("m"), col("j"), col("c").cast("array<double>").as("cc"))
      val per = codes.select(col("id"), col("_j0"), col("_j1"),
          posexplode(col("code")))
        .withColumnRenamed("pos", "m").withColumnRenamed("col", "j")
      val dec = per.join(broadcast(cbD), Seq("m", "j"))
        .groupBy("id", "_j0", "_j1")
        .agg(sort_array(collect_list(struct(col("m"), col("cc")))).as("parts"))
        .select(col("id"), col("_j0"), col("_j1"),
          flatten(transform(col("parts"), p => p.getField("cc"))).as("dv"))
      dec.join(broadcast(c0), "_j0").join(broadcast(c1), "_j1")
        .select(col("id"),
          zip_with(concat(col("_c0"), col("_c1")), col("dv"),
            (a, b) => a + b).as("rv"))
        .join(emb(s, dir).select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"),
          round(element_at(col("rv"), 1) * lit(10000.0)).cast("long").as("d1q"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"), col("rv"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x) * lit(10000.0)).cast("long").as("errq"))
    },
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/resmiq_coarse_codebooks/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/resmiq_codebooks/*.parquet')),
              |codes AS (SELECT id, j0, j1, code FROM read_parquet('$AUX/resmiq_codes/*.parquet')),
              |dec AS (SELECT cs.id, flatten(list(cb.c::DOUBLE[] ORDER BY cb.m)) AS dv
              |  FROM (SELECT id, r.m AS m, code[r.m+1] AS j FROM codes, range(0,8) r(m)) cs
              |  JOIN cb ON cb.m = cs.m AND cb.j = cs.j GROUP BY cs.id),
              |recon AS (SELECT c0.id,
              |    list_transform(list_zip(flatten([h0.c::DOUBLE[], h1.c::DOUBLE[]]), d.dv), p -> p[1] + p[2]) AS rv
              |  FROM codes c0
              |  JOIN ccb h0 ON h0.m = 0 AND h0.j = c0.j0
              |  JOIN ccb h1 ON h1.m = 1 AND h1.j = c0.j1
              |  JOIN dec d ON d.id = c0.id)
              |SELECT r.id, CAST(round(r.rv[1] * 10000.0) AS BIGINT) AS d1q,
              |  CAST(round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], r.rv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') * 10000.0) AS BIGINT) AS errq
              |FROM recon r JOIN embeddings b ON b.vec_id = r.id""".stripMargin)),

    // IndexHNSW2Level (IndexHNSW.h:179; factory "HNSW16,2x4+PQ8",
    // index_factory.cpp:463-472): an HNSW graph whose storage is the
    // MIQ-coarse Index2Layer. Exact-degenerate gate (efSearch >= any
    // partition's size): the graph search must equal the exact kNN
    // over the DECODED storage. The oracle reconstructs each stored
    // vector from the resmiq code sidecars with FLOAT-rounded adds —
    // CAST(cent + dv AS FLOAT) is the engine's float32 vec_add (double
    // add of two floats rounded once) — then ranks exact L2 in DOUBLE.
    ("hnsw2level_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedHnsw.knnJoin(
        qDf(s, dir, 10), resMiq24(s, dir).reconstruct, 10,
        m = 16, efConstruction = 64, efSearch = 4096)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/resmiq_coarse_codebooks/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/resmiq_codebooks/*.parquet')),
              |codes AS (SELECT id, j0, j1, code FROM read_parquet('$AUX/resmiq_codes/*.parquet')),
              |dec AS (SELECT cs.id, flatten(list(cb.c::DOUBLE[] ORDER BY cb.m)) AS dv
              |  FROM (SELECT id, r.m AS m, code[r.m+1] AS j FROM codes, range(0,8) r(m)) cs
              |  JOIN cb ON cb.m = cs.m AND cb.j = cs.j GROUP BY cs.id),
              |recon AS (SELECT c0.id,
              |    list_transform(list_zip(flatten([h0.c::DOUBLE[], h1.c::DOUBLE[]]), d.dv),
              |      p -> CAST(CAST(p[1] + p[2] AS FLOAT) AS DOUBLE)) AS rv
              |  FROM codes c0
              |  JOIN ccb h0 ON h0.m = 0 AND h0.j = c0.j0
              |  JOIN ccb h1 ON h1.m = 1 AND h1.j = c0.j1
              |  JOIN dec d ON d.id = c0.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, r.id AS id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], r.rv),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], r.rv),
              |        p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), r.id) AS "rank"
              |  FROM embeddings q CROSS JOIN recon r WHERE q.vec_id < 10) w
              |WHERE "rank" <= 10""".stripMargin)),

    // ZnLattice codec roundtrip (faiss/IndexLattice.h:22, codec
    // machinery faiss/impl/lattice_Zn.cpp): vectors encoded as 16
    // (8-bit scale, 8-bit sphere-point) pairs by the enumerative
    // Zn codec — no trained codebook at all. Engine and oracle both
    // DECODE from the engine's integer codes (zn_codes sidecar) via
    // the enumerated sphere table (zn_codebook) in identical DOUBLE
    // arithmetic, then compare reconstruction error vs the original —
    // re-running the combinatorial ENCODE in SQL is neither possible
    // nor needed (ZnLatticeSpec proves encode optimal + bijective).
    // ZnSphereCodecRec (lattice_Zn.cpp:470+, power-of-2 dims): the
    // recursive pairing-DP enumeration over the same sphere point set
    // as ZnSphereCodec (codes incompatible by design — the reference
    // keeps both and ZnSphereCodecAlt picks Rec for 2^k dims). The
    // engine enumerates the dim=8, r2=6 sphere through the ATOM codec
    // (one derivation), rec-encodes and rec-decodes every point
    // distributed, and emits the bijectivity gates; the oracle
    // re-derives the point count by brute-force enumeration of Z^8
    // (components in [-2,2], Σx² = 6 — a THIRD independent
    // derivation) and the code width from it, so a counting bug in
    // either codec flips the hash red.
    ("zn_rec_roundtrip", (s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.graft.shim
      val zn = new graft.core.ZnSphereCodec(8, 6)
      val rec = new graft.core.ZnSphereCodecRec(8, 6)
      // bounded enumeration via the atom codec (nv = a few thousand)
      val pts = (0L until zn.nv).map(c => zn.decode(c).toSeq)
        .zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("i", "p")
        .select(col("i"), col("p").cast("array<int>").as("p"))
      pts.select(col("i"), col("p"),
          shim.col(graft.core.ZnRecEncode(shim.expr(col("p")), rec)).as("code"))
        .withColumn("ok",
          shim.col(graft.core.ZnRecDecode(shim.expr(col("code")), rec)) === col("p"))
        .agg(count(lit(1)).as("n_points"),
          (count_distinct(col("code")) === count(lit(1)) &&
            min(col("code")) === 0 &&
            max(col("code")) === count(lit(1)) - 1 &&
            lit(rec.nv == zn.nv)).as("codes_bijective"),
          (sum(when(col("ok"), 0).otherwise(1)) === 0).as("roundtrip_ok"),
          first(lit(rec.codeSize)).as("code_size"))
    },
      Some("""WITH c AS (SELECT x, x*x AS n FROM (SELECT unnest([-2,-1,0,1,2]) AS x) t),
             |d2 AS (SELECT a.n + b.n AS n FROM c a CROSS JOIN c b WHERE a.n + b.n <= 6),
             |d4 AS (SELECT a.n + b.n AS n FROM d2 a CROSS JOIN d2 b WHERE a.n + b.n <= 6),
             |cnt AS (SELECT count(*)::BIGINT AS n_points FROM d4 a CROSS JOIN d4 b WHERE a.n + b.n = 6)
             |SELECT n_points, true AS codes_bijective, true AS roundtrip_ok,
             |  (floor(ln(n_points)/ln(256)) + 1)::INT AS code_size FROM cnt""".stripMargin)),

    ("zn_lattice_roundtrip", (s: SparkSession, dir: String) => {
      val lat = znLat16(s, dir)
      import s.implicits._
      val cb = graft.index.Lattice.codebookDf(s, lat)
      val rng = (0 until lat.nsq).map(j => (j, lat.mins(j), lat.maxs(j)))
        .toDF("j", "mn", "mx")
      val per = emb(s, dir)
        .select(col("vec_id").as("id"), col("embedding"),
          graft.index.Lattice.subCodesCol(lat, col("embedding")).as("codes"))
        .select(col("id"), col("embedding"),
          explode(transform(sequence(lit(0), lit(lat.nsq - 1)), j =>
            struct(j.as("j"),
              element_at(col("codes"), j * 2 + 1).as("scale"),
              element_at(col("codes"), j * 2 + 2).as("lat_code")))).as("s"))
        .select(col("id"), col("embedding"),
          col("s.j").as("j"), col("s.scale").as("scale"), col("s.lat_code").as("lat_code"))
      val dec = per
        .join(broadcast(rng), "j")
        .join(broadcast(cb), "lat_code")
        .withColumn("nrm",
          ((col("scale").cast("double") + lit(0.5)) *
            (col("mx").cast("double") - col("mn").cast("double")) / lit(256.0) +
            col("mn").cast("double")) / lit(math.sqrt(10.0)))
        .select(col("id"), col("embedding"), col("j"),
          transform(col("c"), x => x.cast("double") * col("nrm")).as("dv"))
      dec.groupBy("id")
        .agg(first(col("embedding")).as("embedding"),
          sort_array(collect_list(struct(col("j"), col("dv")))).as("parts"))
        .select(col("id"), col("embedding"),
          flatten(transform(col("parts"), p => p.getField("dv"))).as("rv"))
        .select(col("id"),
          round(element_at(col("rv"), 1), 4).as("d1"),
          round(aggregate(zip_with(col("embedding").cast("array<double>"), col("rv"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some(s"""WITH rngv AS (SELECT j, mn, mx FROM read_parquet('$AUX/zn_range/*.parquet')),
              |cbv AS (SELECT lat_code, c FROM read_parquet('$AUX/zn_codebook/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/zn_codes/*.parquet')),
              |per AS (SELECT id, r.j AS j, codes[2*r.j+1] AS scale, codes[2*r.j+2] AS lat_code
              |  FROM codes, range(0,16) r(j)),
              |dec AS (SELECT p.id, p.j,
              |    list_transform(cb.c, x -> x::DOUBLE *
              |      (((p.scale::DOUBLE + 0.5) * (g.mx::DOUBLE - g.mn::DOUBLE) / 256.0 + g.mn::DOUBLE) / sqrt(10.0))) AS dv
              |  FROM per p JOIN rngv g ON g.j = p.j JOIN cbv cb ON cb.lat_code = p.lat_code),
              |rv AS (SELECT id, flatten(list(dv ORDER BY j)) AS rv FROM dec GROUP BY id)
              |SELECT r.id, round(r.rv[1], 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], r.rv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM rv r JOIN embeddings b ON b.vec_id = r.id""".stripMargin)),

    // IndexIVFSpectralHash (faiss/IndexIVFSpectralHash.h:31): binary
    // signatures from periodic threshold intervals of the rotated
    // vector, Hamming-ranked inside the probed IVF lists. Oracle
    // replays rotation (sidecar matrix), per-list median thresholds
    // (sidecar), bit extraction floor((y-c)*2/period)&1, probe
    // selection, and Hamming top-k — all integers after the floor.
    ("ivfsh_search", (s: SparkSession, dir: String) =>
      ivfsh8(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 4),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/sh_centroids/*.parquet')),
              |rot AS (SELECT d, r::DOUBLE[] AS r FROM read_parquet('$AUX/sh_rot/*.parquet')),
              |th AS (SELECT list_no, c::DOUBLE[] AS t FROM read_parquet('$AUX/sh_thresh/*.parquet')),
              |ry AS (SELECT vec_id, list(yv ORDER BY d) AS y FROM (
              |  SELECT e.vec_id, r.d,
              |    (list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum'))::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |bbits AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(y.y::DOUBLE[], t.t), p -> floor((p[1]-p[2])*2.0)::BIGINT & 1) AS bits
              |  FROM basg a JOIN ry y ON y.vec_id = a.id JOIN th t ON t.list_no = a.list_no),
              |qbits AS (SELECT p.qid, p.list_no,
              |    list_transform(list_zip(y.y::DOUBLE[], t.t), p -> floor((p[1]-p[2])*2.0)::BIGINT & 1) AS bits
              |  FROM probes p JOIN ry y ON y.vec_id = p.qid JOIN th t ON t.list_no = p.list_no),
              |hd AS (SELECT q.qid, b.id,
              |    len(list_filter(list_zip(q.bits, b.bits), p -> p[1] <> p[2]))::BIGINT AS hamming
              |  FROM qbits q JOIN bbits b ON b.list_no = q.list_no)
              |SELECT qid, "rank", id, hamming FROM (
              |  SELECT qid, id, hamming, row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 10""".stripMargin)),

    // Thresh_centroid_half (IndexIVFSpectralHash.h:45, .cpp:86-90):
    // the fourth threshold mode — the FLOAT-rounded transformed list
    // centroid shifted by -period/4 ("central interval around
    // centroid"). The twin index shares ivfsh8's data/seeds, so its
    // coarse centroids and rotation equal the sh_* sidecars bit for
    // bit; the oracle derives the thresholds ITSELF from those
    // sidecars (t = (rot·centroid)::REAL - period/4) — an engine that
    // dropped or misplaced the shift (the dual of the r13 median bug,
    // which a threshold sidecar masked) hash-mismatches here.
    ("ivfsh_centroid_half_search", (s: SparkSession, dir: String) =>
      ivfshCh8(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 4),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/sh_centroids/*.parquet')),
              |rot AS (SELECT d, r::DOUBLE[] AS r FROM read_parquet('$AUX/sh_rot/*.parquet')),
              |th AS (SELECT list_no, list(tv ORDER BY d) AS t FROM (
              |  SELECT c.list_no, r.d,
              |    ((list_aggregate(list_transform(list_zip(r.r, c.c::DOUBLE[]), p -> p[1]*p[2]), 'sum'))::REAL::DOUBLE - 0.25)::REAL AS tv
              |  FROM cent c CROSS JOIN rot r) z GROUP BY list_no),
              |ry AS (SELECT vec_id, list(yv ORDER BY d) AS y FROM (
              |  SELECT e.vec_id, r.d,
              |    (list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum'))::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |bbits AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(y.y::DOUBLE[], t.t::DOUBLE[]), p -> floor((p[1]-p[2])*2.0)::BIGINT & 1) AS bits
              |  FROM basg a JOIN ry y ON y.vec_id = a.id JOIN th t ON t.list_no = a.list_no),
              |qbits AS (SELECT p.qid, p.list_no,
              |    list_transform(list_zip(y.y::DOUBLE[], t.t::DOUBLE[]), p -> floor((p[1]-p[2])*2.0)::BIGINT & 1) AS bits
              |  FROM probes p JOIN ry y ON y.vec_id = p.qid JOIN th t ON t.list_no = p.list_no),
              |hd AS (SELECT q.qid, b.id,
              |    len(list_filter(list_zip(q.bits, b.bits), p -> p[1] <> p[2]))::BIGINT AS hamming
              |  FROM qbits q JOIN bbits b ON b.list_no = q.list_no)
              |SELECT qid, "rank", id, hamming FROM (
              |  SELECT qid, id, hamming, row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 IVF-SQ: SQ8 codes inside the pruned IVF join; nprobe=nlist
    // makes it equal the flat SQ8 ADC search, so the sq8_knn oracle
    // applies verbatim
    ("ivfsq_search_exact", (s: SparkSession, dir: String) =>
      ivfsq16(s, dir).search(qDf(s, dir, 10), 5, nprobe = 16)
        .withColumn("dist", r4("dist")),
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
             |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
             |  FROM qd) w WHERE "rank" <= 5""".stripMargin)),

    // IVF-SQ by_residual = true — the DEFAULT IndexIVFScalarQuantizer
    // form (IndexScalarQuantizer.h:64): the shared per-dim range is
    // trained over RESIDUALS (vec − centroid), the query side
    // subtracts the probed centroid before the ADC. nprobe = nlist,
    // so the oracle replays assignment, the float32 residuals, the
    // residual-trained range, encode/decode, and the residual ADC.
    ("ivfsq_residual_search", (s: SparkSession, dir: String) =>
      ivfsqRes16(s, dir).search(qDf(s, dir, 10), 5, nprobe = 16)
        .withColumn("dist", r4("dist")),
      Some(ivfsqResidualSql)),

    // `IVF<n>_HNSW<m>,SQ<w>` — HNSW coarse composed with the scalar
    // quantizer code (index_factory.cpp:253-256; by_residual = true,
    // the IndexIVFScalarQuantizer default). Same memoized index as
    // ivfsq_residual_search; efSearch = 4096 >= nlist degenerates the
    // walk to the exact probe set, so the residual-SQ replay applies
    // verbatim.
    ("ivf_hnsw_sq_search", (s: SparkSession, dir: String) =>
      ivfsqRes16(s, dir).search(qDf(s, dir, 10), 5, nprobe = 16,
        coarse = Some(graft.index.Probes.HnswCoarse(4096)))
        .withColumn("dist", r4("dist")),
      Some(ivfsqResidualSql)),

    // §2.11 IVF + 4-bit scalar quantizer (IndexIVFScalarQuantizer
    // QT_4bit, impl/ScalarQuantizer.h:32; factory IVF<n>,SQ4).
    // nprobe = nlist, so the oracle replays the codec exactly:
    // code = floor(15·clamped), decode = (code + 0.5)/15 over the
    // base-side minmax range — the SQ8 replay with 15 for 255.
    ("ivfsq4_search_exact", (s: SparkSession, dir: String) =>
      ivfsq4(s, dir).search(qDf(s, dir, 10), 5, nprobe = 16)
        .withColumn("dist", r4("dist")),
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(15 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 15 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
             |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
             |  FROM qd) w WHERE "rank" <= 5""".stripMargin)),

    // §2.11 IndexBinaryHash: bit-prefix buckets, query scans its bucket
    ("bhash_search", (s: SparkSession, dir: String) => {
      val bucketOf = (v: org.apache.spark.sql.Column) =>
        (0 until 8).map(i => when(element_at(v, i + 1) >= 0f, lit(1L << i))
          .otherwise(lit(0L))).reduce(_ + _)
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
        sign_bits(col("embedding")).as("qcode"), bucketOf(col("embedding")).as("bucket"))
      val b = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"),
        sign_bits(col("embedding")).as("code"), bucketOf(col("embedding")).as("bucket"))
      graft.index.BinaryFlat.hashSearch(q, b, 3)
    },
      Some("""WITH coded AS (SELECT vec_id, embedding,
             |  list_aggregate(list_transform(range(1, 9),
             |    i -> CASE WHEN embedding[i] >= 0 THEN (2^(i-1))::BIGINT ELSE 0 END), 'sum') AS bucket
             |  FROM embeddings)
             |SELECT qid, "rank", id, hd FROM (
             |  SELECT q.vec_id AS qid, b.vec_id AS id,
             |    (SELECT count(*) FROM range(1, 65) r(kk)
             |     WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)) AS hd,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      (SELECT count(*) FROM range(1, 65) r(kk)
             |       WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)), b.vec_id) AS "rank"
             |  FROM coded q JOIN coded b ON q.bucket = b.bucket
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 3""".stripMargin)),

    // §2.11 IndexBinaryMultiHash (faiss/IndexBinaryHash.h:83,
    // factory BHash4x8): 4 hash tables on disjoint 8-bit ranges of the
    // 64-bit sign code; a query probes its bucket in every table and
    // the deduplicated candidate union is Hamming-verified. The oracle
    // replays the per-table keys, the EXISTS-a-colliding-table
    // candidate set, and the (hd, id) ranking.
    ("bhash_multi_search", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
        sign_bits(col("embedding")).as("qcode"))
      val b = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"),
        sign_bits(col("embedding")).as("code"))
      graft.index.BinaryFlat.multiHashSearch(q, b, 3, nhash = 4, b = 8)
    },
      Some("""WITH keys AS (SELECT vec_id, t, list_aggregate(list_transform(range(1, 9),
             |    i -> CASE WHEN embedding[t*8 + i] >= 0 THEN (2^(i-1))::BIGINT ELSE 0 END), 'sum') AS key
             |  FROM embeddings, range(0, 4) r(t)),
             |cand AS (SELECT DISTINCT q.vec_id AS qid, b.vec_id AS id
             |  FROM keys q JOIN keys b ON q.t = b.t AND q.key = b.key
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10),
             |hd AS (SELECT c.qid, c.id,
             |    (SELECT count(*) FROM range(1, 65) r(kk)
             |     WHERE (qe.embedding[kk] >= 0) <> (be.embedding[kk] >= 0)) AS hd
             |  FROM cand c JOIN embeddings qe ON qe.vec_id = c.qid
             |  JOIN embeddings be ON be.vec_id = c.id)
             |SELECT qid, "rank", id, hd FROM (
             |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank"
             |  FROM hd) w WHERE "rank" <= 3""".stripMargin)),

    // IndexBinaryFromFloat (faiss/IndexBinaryFromFloat.h:26): binary
    // index backed by a FLOAT index — codes unpack to ±1 floats
    // (binary_to_real), an IVF float index searches them, and
    // round(L2²/4) is EXACT Hamming (each mismatching bit contributes
    // 4). nprobe = nlist makes the inner IVF exact, so the oracle is
    // the flat Hamming ranking.
    ("binary_from_float_search", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val codes = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"),
        sign_bits(col("embedding")).as("code"))
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
        sign_bits(col("embedding")).as("qcode"))
      val bff = cached(s"bff4:$dir") {
        graft.index.IndexFactory.buildBinaryFromFloat(
          codes, "id", "code", 64, "IVF4,Flat", niter = 3)
      }
      bff.search(q, 3, nprobe = 4)
    },
      Some("""SELECT qid, "rank", id, hd FROM (
             |  SELECT q.vec_id AS qid, b.vec_id AS id,
             |    (SELECT count(*) FROM range(1, 65) r(kk)
             |     WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)) AS hd,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      (SELECT count(*) FROM range(1, 65) r(kk)
             |       WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)), b.vec_id) AS "rank"
             |  FROM embeddings q CROSS JOIN embeddings b
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 3""".stripMargin)),

    // §2.8 Hamming range search over packed codes
    ("hamming_range", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
        sign_bits(col("embedding")).as("qcode"))
      val b = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"),
        sign_bits(col("embedding")).as("code"))
      graft.index.BinaryFlat.rangeJoin(q, b, maxHamming = 20)
    },
      Some("""SELECT q.vec_id AS qid, b.vec_id AS id,
             |  (SELECT count(*) FROM range(1, 65) r(kk)
             |   WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)) AS hd
             |FROM embeddings q CROSS JOIN embeddings b
             |WHERE q.vec_id < 10 AND b.vec_id >= 10
             |  AND (SELECT count(*) FROM range(1, 65) r(kk)
             |       WHERE (q.embedding[kk] >= 0) <> (b.embedding[kk] >= 0)) <= 20""".stripMargin)),

    // blocked kNN for huge query sets (same oracle as knn_flat_l2 k=5:
    // blocking must not change results)
    ("knn_flat_blocked", (s: SparkSession, dir: String) =>
      Knn.knnJoinBlocked(qDf(s, dir, 10), bDf(s, dir, 10), 5, blocks = 3)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 5))),

    // §2.11 batch kNN-graph construction (NNDescent build phase /
    // Deep1B kNN-graph use case): exact graph oracle-checked
    ("knn_graph_exact", (s: SparkSession, dir: String) =>
      graft.knn.KnnGraph.exact(
        emb(s, dir).filter(col("vec_id") < 100)
          .select(col("vec_id").as("id"), col("embedding").as("vec")), 5)
        .withColumn("dist", r4("dist")),
      Some("""SELECT src, "rank", dst, round(dist, 4) AS dist FROM (
             |  SELECT q.vec_id AS src, b.vec_id AS dst,
             |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS "rank"
             |  FROM embeddings q CROSS JOIN embeddings b
             |  WHERE q.vec_id < 100 AND b.vec_id < 100 AND q.vec_id <> b.vec_id) t
             |WHERE "rank" <= 5""".stripMargin)),

    // nn-descent refinement of the graph (iterative, approximate).
    // Driver gate: edge recall vs the exact graph (computed in-engine,
    // both sides Spark) must clear 0.8 — the oracle independently
    // derives the exact-graph edge count (n nodes × k, k < n) and
    // asserts the gate boolean, so a recall regression flips the hash
    // red (precedent: recall_half_dims). KnnGraphSpec additionally
    // asserts per-iteration convergence.
    ("knn_graph_nndescent", (s: SparkSession, dir: String) => {
      val pts = emb(s, dir).filter(col("vec_id") < 100)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val exact = graft.knn.KnnGraph.exact(pts, 5)
      val approx = graft.knn.KnnGraph.nnDescent(pts, 5, iters = 3)
      val hits = exact.select(col("src"), col("dst"))
        .join(approx.select(col("src"), col("dst")), Seq("src", "dst"), "left_semi")
        .agg(count(lit(1)).as("_h"))
      exact.agg(count(lit(1)).as("n_edges")).crossJoin(hits)
        .select(col("n_edges"),
          (col("_h").cast("double") / col("n_edges").cast("double") >= 0.8)
            .as("recall_ge_080"))
    },
      Some("""SELECT (count(*) * 5)::BIGINT AS n_edges, true AS recall_ge_080
             |FROM embeddings WHERE vec_id < 100""".stripMargin)),

    // §2.4 ProgressiveDimClustering (PCA-prefix warm-started k-means).
    // Sidecar oracle rotates every point with the learned PCA (mat-vec
    // + centering bias, float32 output contract), then replays the
    // final-level assignment: per-cluster sizes must agree.
    ("progressive_dim_kmeans", (s: SparkSession, dir: String) => {
      val (rot, m) = pdk8(s, dir)
      val rotated = emb(s, dir).select(col("vec_id"), rot.applyCol(col("embedding")).as("vr"))
      m.assign(rotated, "vr")
        .groupBy(col("list_no")).agg(count(lit(1)).as("n"))
    },
      Some(s"""WITH rot AS (SELECT d, r::DOUBLE[] AS r, bias FROM read_parquet('$AUX/pdk_rot/*.parquet')),
              |rv AS (SELECT vec_id, list(yv ORDER BY d) AS v FROM (
              |  SELECT e.vec_id, r.d,
              |    ((list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')) + r.bias::DOUBLE)::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/pdk_centroids/*.parquet')),
              |d AS (SELECT rv.vec_id, c.list_no,
              |    list_aggregate(list_transform(list_zip(rv.v::DOUBLE[], c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM rv CROSS JOIN cent c),
              |a AS (SELECT vec_id, list_no FROM (
              |  SELECT vec_id, list_no, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_no) AS rn FROM d) t
              |  WHERE rn = 1)
              |SELECT list_no, count(*)::BIGINT AS n FROM a GROUP BY list_no""".stripMargin)),

    // ---- LLM-pipeline operators (north star) --------------------------

    // exact dedup with instances table (IVFFlatDedup analog) on a
    // corpus with planted duplicates (embeddings unioned with an
    // id-shifted copy)
    ("exact_dedup_vectors", (s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val doubled = e.unionByName(
        e.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      // ids list rendered as a comma string: the driver's comparator
      // cannot hash array-typed cells (VERDICT r02 finding #1)
      Dedup.exactDupGroups(doubled, "vec_id", col("embedding"))
        .withColumn("ids", array_join(col("ids"), ","))
    },
      Some("""WITH u AS (SELECT vec_id, embedding FROM embeddings
             |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings)
             |SELECT min(vec_id) AS rep_id, count(*) AS cnt,
             |  array_to_string(list_sort(list(vec_id)), ',') AS ids
             |FROM u GROUP BY embedding""".stripMargin)),

    // MinHash + LSH banding near-dup dedup, end-to-end (shingle ->
    // md5 minhash signature -> band hashes -> bucket join -> exact
    // Jaccard verify). The oracle replicates the identical pipeline.
    // MinHash near-dup at lineitem scale: ~300k-doc corpus (sf0.1)
    // with planted duplicates — the text-dedup path measured under
    // real load; the oracle replays the identical discrete pipeline
    // (shingle -> md5 minhash -> band join -> exact-Jaccard verify)
    // over the same corpus CTE.
    ("minhash_neardup_big", (s: SparkSession, dir: String) =>
      commentPairs(s, dir).withColumn("jaccard", round(col("jaccard"), 4)),
      Some(s"""WITH corpus AS ($commentCorpusSql),
              |${minhashChainSql("corpus")}
              |SELECT i, j, round(inter/(tot-inter), 4) AS jaccard
              |FROM jac WHERE inter/(tot-inter) >= 0.8""".stripMargin)),

    // end-to-end corpus dedup at scale: drop the keep-first losers of
    // every >=0.8 pair from the 300k-doc corpus and count survivors
    ("neardup_dedup_big", (s: SparkSession, dir: String) =>
      Dedup.dropPairsLosers(commentCorpus(s, dir), "doc_id",
        commentPairs(s, dir))
        .agg(count(lit(1)).as("n_survivors")),
      Some(s"""WITH corpus AS ($commentCorpusSql),
              |${minhashChainSql("corpus")},
              |losers AS (SELECT DISTINCT j FROM jac WHERE inter/(tot-inter) >= 0.8)
              |SELECT count(*)::BIGINT AS n_survivors
              |FROM corpus WHERE doc_id NOT IN (SELECT j FROM losers)""".stripMargin)),

    ("minhash_lsh_neardup", (s: SparkSession, dir: String) =>
      nearDups08(s, dir)
        .withColumn("jaccard", round(col("jaccard"), 4)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END) AS s FROM toks),
             |hs AS (SELECT doc_id, s, list_transform(s,
             |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1048573) AS hv FROM sh),
             |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
             |          j -> list_aggregate(list_transform(hv,
             |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
             |            'min')) AS sg FROM hs),
             |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
             |         FROM sig, range(0, 4) r(b)),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
             |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
             |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
             |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
             |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j)
             |SELECT i, j, round(inter/(tot-inter), 4) AS jaccard
             |FROM jac WHERE inter/(tot-inter) >= 0.8""".stripMargin)),

    // full dedup pipeline output: the corpus after near-dup removal
    // (keep-first policy), oracle replays the whole minhash pipeline
    ("neardup_dedup_corpus", (s: SparkSession, dir: String) =>
      Dedup.dropPairsLosers(docsDf(s, dir), "doc_id", nearDups08(s, dir))
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END) AS s FROM toks),
             |hs AS (SELECT doc_id, s, list_transform(s,
             |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1048573) AS hv FROM sh),
             |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
             |          j -> list_aggregate(list_transform(hv,
             |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
             |            'min')) AS sg FROM hs),
             |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
             |         FROM sig, range(0, 4) r(b)),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
             |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
             |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
             |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
             |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j),
             |losers AS (SELECT DISTINCT j FROM jac WHERE inter/(tot-inter) >= 0.8)
             |SELECT doc_id, lang, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT j FROM losers)""".stripMargin)),

    // near-dup connected components (the duplicate-CLUSTER view the
    // keep-first policy collapses): distributed min-label propagation
    // over the verified pair set — each iteration shuffles only the
    // edge set, never the corpus. The oracle replays the minhash chain
    // and computes min-reachable-id per doc via a recursive CTE
    // (transitive closure over the symmetric edge set — exact on the
    // shallow near-dup graph, where min-label converges long before
    // maxIter).
    ("neardup_components", (s: SparkSession, dir: String) =>
      Dedup.nearDupComponents(docsDf(s, dir).select(col("doc_id")),
          nearDups08(s, dir), "doc_id")
        .select(col("id").as("doc_id"), col("component")),
      Some(s"""WITH RECURSIVE ${minhashChainSql("documents")},
              |pairs AS (SELECT i, j FROM jac WHERE inter/(tot-inter) >= 0.8),
              |edges AS (SELECT i AS a, j AS b FROM pairs
              |          UNION ALL SELECT j AS a, i AS b FROM pairs),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
              |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin)),

    // exact n-gram Jaccard via inverted shingle index (no cross join)
    ("ngram_jaccard_pairs", (s: SparkSession, dir: String) =>
      Dedup.ngramJaccardPairs(
        docsDf(s, dir).filter(col("doc_id") < 150),
        "doc_id", "text", threshold = 0.5, ngram = 3)
        .withColumn("jaccard", round(col("jaccard"), 4)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 150),
             |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END)) AS sh FROM toks),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
             |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT i, j, round(c::DOUBLE/(na.n + nb.n - c), 4) AS jaccard
             |FROM inter JOIN sizes na ON na.doc_id = i JOIN sizes nb ON nb.doc_id = j
             |WHERE c::DOUBLE/(na.n + nb.n - c) >= 0.5""".stripMargin)),

    // Fixed-size token chunking with overlap — the unit-of-training
    // split of every LLM corpus pipeline. Narrow map per document
    // (posexplode, nothing shuffles); oracle re-derives every chunk
    // boundary and tail in SQL.
    ("chunk_documents", (s: SparkSession, dir: String) =>
      graft.llm.Corpus.chunk(docsDf(s, dir).filter(col("doc_id") < 100),
        "doc_id", "text", size = 64, overlap = 16),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 100),
             |c AS (SELECT doc_id, t, greatest(1, ceil((len(t) - 16)::DOUBLE / 48)::INT) AS nc FROM toks),
             |e AS (SELECT doc_id, t, unnest(range(0, nc)) AS chunk_no FROM c)
             |SELECT doc_id, chunk_no::BIGINT AS chunk_no,
             |  array_to_string(t[chunk_no*48+1 : chunk_no*48+64], ' ') AS chunk_text,
             |  len(string_split(array_to_string(t[chunk_no*48+1 : chunk_no*48+64], ' '), ' '))::BIGINT AS n_tokens
             |FROM e""".stripMargin)),

    // Benchmark decontamination: corpus docs sharing any distinct
    // 3-gram with the benchmark split (doc_id % 7 == 0 stands in for
    // an eval set). Inverted shingle index equi-join, one aggregate —
    // the standard pre-training contamination sweep, never a cross
    // join.
    ("benchmark_decontaminate", (s: SparkSession, dir: String) => {
      val d = docsDf(s, dir).filter(col("doc_id") < 200)
      graft.llm.Corpus.contaminated(
        d.filter(col("doc_id") % 7 =!= 0),
        d.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", ngram = 3)
    },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 200),
             |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END)) AS sh FROM toks),
             |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 7 = 0),
             |csh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 7 <> 0)
             |SELECT c.doc_id, count(DISTINCT c.sh)::BIGINT AS n_shared
             |FROM csh c JOIN bsh b ON b.sh = c.sh GROUP BY c.doc_id""".stripMargin)),

    // embedding near-dup (cosine >= 0.95) on the doubled corpus
    ("embedding_near_dup", (s: SparkSession, dir: String) =>
      embPairs95(s, dir).withColumn("cos", round(col("cos"), 4)),
      Some("""WITH u AS (SELECT vec_id, embedding FROM embeddings
             |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
             |FROM u a CROSS JOIN u b
             |WHERE a.vec_id < b.vec_id
             |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95""".stripMargin)),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): one
    // representative per connected component of the >= 0.95-cosine
    // embedding near-dup graph — the cluster-then-keep-one policy, vs
    // the pairwise keep-first of neardup_dedup_corpus. Components via
    // distributed min-label propagation over the (small) verified
    // pair set; the oracle replays them with a recursive CTE.
    ("semantic_dedup", (s: SparkSession, dir: String) =>
      Dedup.nearDupComponents(doubledEmb(s, dir).select(col("vec_id")),
          embPairs95(s, dir), "vec_id")
        .select(col("component").as("vec_id")).distinct(),
      Some("""WITH RECURSIVE u AS (SELECT vec_id, embedding FROM embeddings
             |           UNION ALL SELECT vec_id + 10000, embedding FROM embeddings),
             |pairs AS (SELECT a.vec_id AS i, b.vec_id AS j
             |          FROM u a CROSS JOIN u b WHERE a.vec_id < b.vec_id
             |            AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95),
             |edges AS (SELECT i AS a, j AS b FROM pairs
             |          UNION ALL SELECT j AS a, i AS b FROM pairs),
             |reach(id, r) AS (
             |  SELECT vec_id, vec_id FROM u
             |  UNION
             |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
             |SELECT DISTINCT min_r AS vec_id
             |FROM (SELECT id, min(r) AS min_r FROM reach GROUP BY id) c""".stripMargin)),

    // unigram-LM quality score (the CCNet/KenLM perplexity-proxy
    // filter): corpus unigram frequencies -> per-token negative log
    // likelihood -> per-doc average. Two grouped shuffles (token
    // counts, per-doc agg) + one equi-join on token — every step
    // scales like a word count. Per-token nll is snapped to an
    // INTEGER 1e-4 grid before the per-doc sum so the aggregate is a
    // long sum — exact and partition-order independent in both
    // engines (a double sum can flip a 2-dp rounding boundary under
    // AQE re-plans; ADVICE r8).
    ("unigram_logprob", (s: SparkSession, dir: String) =>
      unigramDocScores(docsDf(s, dir))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("avg_nll"), col("n_tokens")),
      Some("""WITH tk AS (SELECT doc_id, tok
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |        WHERE length(tok) > 0),
             |counts AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
             |tot AS (SELECT sum(c)::DOUBLE AS T FROM counts),
             |vocab AS (SELECT tok, CAST(round(-ln(c / T) * 10000) AS BIGINT) AS nll_i FROM counts, tot)
             |SELECT doc_id, round(sum(nll_i) / 10000.0 / count(*), 2) AS avg_nll,
             |  count(*)::BIGINT AS n_tokens
             |FROM tk JOIN vocab USING (tok) GROUP BY doc_id""".stripMargin)),

    // bigram-LM quality score (the conditional-probability step up
    // from unigram_logprob): per-doc average of
    // -ln(c(w1,w2) / c(w1·)) over adjacent token pairs. Bigrams come
    // from a NARROW zip of two array slices (no self-join on
    // position); the bigram counts are one grouped shuffle and the
    // prefix counts derive from them (sum per w1) — never a second
    // pass over the corpus. nll on the INTEGER 1e-4 grid like the
    // unigram queries, so the per-doc sum is exact.
    ("bigram_logprob", (s: SparkSession, dir: String) => {
      val toksArr = filter(TF.tokenize(col("text")), t => length(t) > 0)
      val bigrams = docsDf(s, dir)
        .select(col("doc_id"), toksArr.as("_t"))
        .filter(size(col("_t")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("_t"), lit(1), size(col("_t")) - 1),
          slice(col("_t"), lit(2), size(col("_t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("_bg"))
        .select(col("doc_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
      val prob = c12.join(c1, "w1")
        .select(col("w1"), col("w2"),
          round(-log(col("c") / col("c1")) * 10000).cast("long").as("nll_i"))
      bigrams.join(prob, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("nll_i")) / 10000.0 / count(lit(1)), 2).as("avg_nll"),
          count(lit(1)).as("n_bigrams"))
    },
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS t
             |  FROM documents),
             |bg AS (SELECT doc_id,
             |    unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
             |  FROM tk WHERE len(t) >= 2),
             |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
             |c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY w1),
             |prob AS (SELECT c12.w1, c12.w2,
             |    CAST(round(-ln(c / c1) * 10000) AS BIGINT) AS nll_i
             |  FROM c12 JOIN c1 USING (w1))
             |SELECT doc_id, round(sum(nll_i) / 10000.0 / count(*), 2) AS avg_nll,
             |  count(*)::BIGINT AS n_bigrams
             |FROM bg JOIN prob USING (w1, w2) GROUP BY doc_id""".stripMargin)),

    // unigram-LM scoring at scale: the same pipeline over the 300k-doc
    // derived corpus — 3.6M token rows through the vocab aggregate and
    // the token equi-join (the word-count shape the filter has at
    // 100 TB). The 300k per-doc scores are folded to their 2-dp
    // histogram so the compared result stays small while every
    // upstream row is real.
    ("unigram_logprob_big", (s: SparkSession, dir: String) =>
      unigramDocScores(commentCorpus(s, dir))
        .groupBy(col("avg_nll"))
        .agg(count(lit(1)).as("n_docs")),
      Some(s"""WITH corpus AS ($commentCorpusSql),
              |tk AS (SELECT doc_id, tok
              |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus) t
              |        WHERE length(tok) > 0),
              |counts AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
              |tot AS (SELECT sum(c)::DOUBLE AS T FROM counts),
              |vocab AS (SELECT tok, CAST(round(-ln(c / T) * 10000) AS BIGINT) AS nll_i FROM counts, tot),
              |scored AS (SELECT doc_id, round(sum(nll_i) / 10000.0 / count(*), 2) AS avg_nll
              |           FROM tk JOIN vocab USING (tok) GROUP BY doc_id)
              |SELECT avg_nll, count(*)::BIGINT AS n_docs FROM scored GROUP BY avg_nll""".stripMargin)),

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln(N/df), ranked on the 2-dp-rounded weight with a lexical
    // tie-break so near-equal weights order identically in both
    // engines. Term and document frequencies are grouped shuffles;
    // the corpus size joins in as a broadcast scalar.
    ("tfidf_top_terms", (s: SparkSession, dir: String) => {
      val toks = docsDf(s, dir)
        .select(col("doc_id"), explode(TF.tokenize(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
      val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docsDf(s, dir).agg(count(lit(1)).as("N"))
      val w = tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("w", round(col("tf") * log(col("N") / col("df")), 2))
      import org.apache.spark.sql.expressions.Window
      w.withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("w").desc, col("tok").asc)).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("w"))
    },
      Some("""WITH tk AS (SELECT doc_id, tok
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |        WHERE length(tok) > 0),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
             |n AS (SELECT count(*)::DOUBLE AS N FROM documents),
             |w AS (SELECT doc_id, tok, round(tf * ln(N / df), 2) AS w
             |      FROM tf JOIN dfreq USING (tok), n)
             |SELECT doc_id, "rank", tok, w FROM (
             |  SELECT doc_id, tok, w,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, tok ASC) AS "rank"
             |  FROM w) r
             |WHERE "rank" <= 3""".stripMargin)),

    // simhash near-dup pairs over a corpus with planted exact
    // duplicates. 8 chunks of 8 bits with maxHamming=7 make the
    // chunk-LSH candidate set COMPLETE by pigeonhole, so the sidecar
    // oracle (engine-computed 64-bit codes, then an independent
    // all-pairs xor/popcount in SQL) must agree exactly — this checks
    // that the bucketed pipeline loses no pair vs brute force.
    ("simhash_neardup", (s: SparkSession, dir: String) =>
      Dedup.simhashNearDups(
        simhashCorpus(s, dir), "doc_id", "text",
        maxHamming = 7, chunks = 8),
      Some(s"""WITH c AS (SELECT cid, code FROM read_parquet('$AUX/simhash_codes/*.parquet'))
              |SELECT a.cid AS i, b.cid AS j,
              |  bit_count(xor(a.code, b.code))::BIGINT AS hamming
              |FROM c a JOIN c b ON a.cid < b.cid
              |WHERE bit_count(xor(a.code, b.code)) <= 7""".stripMargin)),

    // text analysis: token/char counts
    ("token_count", (s: SparkSession, dir: String) =>
      docsDf(s, dir).select(
        col("doc_id"), TF.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("len_chars")),
      Some("""SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
             |  length(text)::BIGINT AS len_chars FROM documents""".stripMargin)),

    // CCNet-style line-level boilerplate removal: per-line document
    // frequency across the corpus -> drop lines above the df
    // threshold -> ordered reassembly. Both sides SEED each document
    // with a corpus-wide 8-token header and a per-source 8-token
    // footer (the corpus has no natural boilerplate), so the header
    // always crosses the threshold and the footers sit near it — the
    // one hash shuffle on the line is the shape this op has at 100 TB.
    ("boilerplate_removal", (s: SparkSession, dir: String) => {
      val seeded = docsDf(s, dir).select(col("doc_id"),
        concat(lit("this document is provided under the standard disclaimer "),
          lit("footer of source "), col("source"),
          lit(" applies to every document "), col("text")).as("t"))
      graft.llm.Corpus.dropBoilerplate(seeded, "doc_id", "t",
        window = 8, maxDfFrac = 0.04)
        .withColumnRenamed("id", "doc_id")
    },
      Some("""WITH seeded AS (SELECT doc_id,
             |  concat('this document is provided under the standard disclaimer ',
             |         'footer of source ', source, ' applies to every document ', text) AS t
             |  FROM documents),
             |toks AS (SELECT doc_id, string_split(t, ' ') AS t FROM seeded),
             |c AS (SELECT doc_id, t, ceil(len(t)::DOUBLE / 8)::INT AS nl FROM toks),
             |lines AS (SELECT doc_id, unnest(range(0, nl)) AS pos, t FROM c),
             |lv AS (SELECT doc_id, pos, array_to_string(t[pos*8+1 : pos*8+8], ' ') AS line FROM lines),
             |dfc AS (SELECT line, count(DISTINCT doc_id) AS df FROM lv GROUP BY line),
             |nd AS (SELECT count(*)::DOUBLE AS n FROM seeded),
             |dropped AS (SELECT line FROM dfc, nd WHERE df > greatest(1.0, 0.04 * n)),
             |agg AS (SELECT l.doc_id, count(*)::BIGINT AS n_lines,
             |    sum(CASE WHEN d.line IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
             |    md5(coalesce(string_agg(CASE WHEN d.line IS NULL THEN l.line END, ' ' ORDER BY l.pos), '')) AS kept_md5
             |  FROM lv l LEFT JOIN dropped d ON d.line = l.line GROUP BY l.doc_id)
             |SELECT doc_id, n_lines, n_dropped, kept_md5 FROM agg""".stripMargin)),

    // PII redaction — the standard pre-training scrub pass (emails,
    // phone numbers, IPv4 literals -> type tags). The synthetic corpus
    // carries no PII, so both sides SEED each document with
    // deterministic doc_id-derived PII first (the planted-duplicates
    // convention of simhashCorpus), then redact: match counts and the
    // md5 of the redacted text must agree, which gates the identical
    // RE2-subset regexes through Spark's codegen'd regexp engine and
    // the oracle's. Per-row projection, no shuffle — the 100 TB shape.
    ("pii_redact", (s: SparkSession, dir: String) => {
      val seeded = docsDf(s, dir).select(col("doc_id"),
        concat(lit("email u"), col("doc_id").cast("string"),
          lit("@ex"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".com tel 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" ip 10.1."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
          lit(" "), col("text")).as("t"))
      seeded.select(col("doc_id"),
        TF.piiCount(col("t")).cast("long").as("n_pii"),
        md5(TF.redactPii(col("t"))).as("redacted_md5"))
    },
      Some(s"""WITH seeded AS (SELECT doc_id,
              |  concat('email u', doc_id, '@ex', doc_id % 7, '.com tel 555-',
              |         lpad((doc_id % 10000)::VARCHAR, 4, '0'),
              |         ' ip 10.1.', doc_id % 256, '.', (doc_id*7) % 256, ' ', text) AS t
              |  FROM documents)
              |SELECT doc_id,
              |  (len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
              |   + len(regexp_extract_all(t, '\\b555-[0-9]{4}\\b'))
              |   + len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')))::BIGINT AS n_pii,
              |  md5(regexp_replace(regexp_replace(regexp_replace(t,
              |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              |    '\\b555-[0-9]{4}\\b', '[PHONE]', 'g'),
              |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g')) AS redacted_md5
              |FROM seeded""".stripMargin)),

    // quality signal: within-document 3-gram repetition ratio (the
    // C4/Dolma-style repetitive-text filter) — built-in array
    // functions only, stays inside whole-stage codegen
    ("repetition_ratio", (s: SparkSession, dir: String) => {
      val toks = TF.tokenize(col("text"))
      val n = size(toks)
      val grams = transform(sequence(lit(1), n - 2),
        i => concat_ws(" ", slice(toks, i, lit(3))))
      val total = (n - 2).cast("double")
      docsDf(s, dir).select(col("doc_id"),
        when(n >= 3,
          round((total - size(array_distinct(grams)).cast("double")) / total, 4))
          .otherwise(lit(0.0)).as("rep_ratio"))
    },
      Some("""SELECT doc_id,
             |  CASE WHEN len(tk) >= 3
             |    THEN round(((len(tk)-2) - len(list_distinct(g))) / (len(tk)-2)::DOUBLE, 4)
             |    ELSE 0.0 END AS rep_ratio
             |FROM (SELECT doc_id, tk,
             |        list_transform(generate_series(1, len(tk)-2),
             |                       i -> array_to_string(tk[i:i+2], ' ')) AS g
             |      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t) u""".stripMargin)),

    // corpus statistics: exact vocabulary size per language (distinct
    // whitespace tokens) — the shuffle is on (lang, token) with
    // map-side partial distinct, so it scales like any groupBy
    ("vocab_size", (s: SparkSession, dir: String) =>
      docsDf(s, dir)
        .select(col("lang"), explode(TF.tokenize(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("vocab"), count(lit(1)).as("total_tokens")),
      Some("""SELECT lang, count(DISTINCT tok)::BIGINT AS vocab, count(*)::BIGINT AS total_tokens
             |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |WHERE length(tok) > 0 GROUP BY lang""".stripMargin)),

    // corpus statistics: exact length quantiles per source (median +
    // p90 of n_chars, linear interpolation in both engines)
    ("length_quantiles", (s: SparkSession, dir: String) =>
      docsDf(s, dir).groupBy(col("source")).agg(
        round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n_docs")),
      Some("""SELECT source, round(quantile_cont(n_chars, 0.5), 2) AS p50,
             |  round(quantile_cont(n_chars, 0.9), 2) AS p90, count(*) AS n_docs
             |FROM documents GROUP BY source""".stripMargin)),

    // text analysis: quality scoring (length/stopword/token-length)
    ("quality_score", (s: SparkSession, dir: String) =>
      docsDf(s, dir).select(
        col("doc_id"),
        round(TF.avgTokenLength(col("text")), 4).as("avg_tok_len"),
        round(TF.stopwordRatio(col("text"), TF.EnStopwords), 4).as("sw_ratio"),
        round(TF.qualityScore(col("text"), TF.EnStopwords), 4).as("score")),
      Some("""SELECT doc_id,
             |  round(list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE / len(t), 4) AS avg_tok_len,
             |  round(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE / len(t), 4) AS sw_ratio,
             |  round((least(length(text)::DOUBLE / 500.0, 1.0)
             |    + least(5.0 * len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE / len(t), 1.0)
             |    + CASE WHEN list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE / len(t) <= 8.0 THEN 1.0 ELSE 0.5 END) / 3.0, 4) AS score
             |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) d""".stripMargin)),

    // text analysis: stopword-based language-ID heuristic
    ("langid_stopwords", (s: SparkSession, dir: String) => {
      val ratio = TF.stopwordRatio(col("text"), TF.EnStopwords)
      docsDf(s, dir).select(
        col("doc_id"), round(ratio, 4).as("en_ratio"),
        when(ratio > 0.02, "en").otherwise("und").as("pred"))
    },
      Some("""SELECT doc_id, round(r, 4) AS en_ratio,
             |  CASE WHEN r > 0.02 THEN 'en' ELSE 'und' END AS pred
             |FROM (SELECT doc_id,
             |        len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE
             |          / len(string_split(text, ' ')) AS r
             |      FROM documents) t""".stripMargin)),

    // document fingerprinting (content hash)
    ("fingerprint_md5", (s: SparkSession, dir: String) =>
      docsDf(s, dir)
        .select(col("doc_id"), TF.fingerprint(col("text")).as("fp")),
      Some("SELECT doc_id, md5(text) AS fp FROM documents")),

    // document fingerprinting, ROLLING-hash variant (winnowing, MOSS —
    // Schleimer/Wilkerson/Aiken SIGMOD'03): Rabin-Karp rolling hashes
    // of every 8-char window (base 256 mod 2^31−1, maintained
    // incrementally), then the rightmost-min of each 4-hash sliding
    // window. Local + position-aware, so matches of length >= 11 share
    // a fingerprint — the plagiarism/provenance complement of the
    // whole-content hash above. The oracle recomputes the exact
    // integers (2^31 ≡ 1 mod p makes the window constants powers of
    // two) and replays the winnow as a rightmost-min row_number.
    ("winnow_fingerprints", (s: SparkSession, dir: String) =>
      docsDf(s, dir).select(col("doc_id"),
        explode(shim.col(graft.core.WinnowFingerprints(
          shim.expr(col("text")), 8, 4))).as("_f"))
        .select(col("doc_id"), col("_f.pos").cast("long").as("pos"),
          col("_f.fp").as("fp")),
      Some("""WITH cst AS (SELECT [33554432, 131072, 512, 2, 16777216, 65536, 256, 1]::BIGINT[] AS c),
             |ppos AS (SELECT doc_id, text, unnest(range(1, length(text) - 8 + 2)) AS pos FROM documents),
             |h AS (SELECT doc_id, pos,
             |    (list_aggregate(list_transform(range(0, 8),
             |      j -> ord(substring(text, (pos + j)::INT, 1)) * cst.c[(j + 1)::INT]), 'sum')
             |      % 2147483647)::BIGINT AS fp
             |  FROM ppos, cst),
             |nh AS (SELECT doc_id, unnest(range(1, count(*) - 4 + 2)) AS t
             |  FROM h GROUP BY doc_id),
             |sel AS (SELECT DISTINCT doc_id, pos, fp FROM (
             |    SELECT h.doc_id, nh.t, h.pos, h.fp,
             |      row_number() OVER (PARTITION BY h.doc_id, nh.t ORDER BY h.fp, h.pos DESC) AS rn
             |    FROM nh JOIN h ON h.doc_id = nh.doc_id AND h.pos BETWEEN nh.t AND nh.t + 3) x
             |  WHERE rn = 1)
             |SELECT doc_id, pos, fp FROM sel""".stripMargin)),

    // cross-document copied-span detection: two docs share a winnow
    // fingerprint iff they share a character span of length >= 11
    // (w + k - 1 = 4 + 8 - 1), so counting shared distinct
    // fingerprints per pair finds copied passages — the
    // provenance/contamination complement of whole-doc near-dup. The
    // inverted fingerprint index is an equi-join with a max-df cap on
    // hot fingerprints (the ngramJaccardPairs skew guard): no
    // all-pairs work at any scale.
    ("winnow_shared_spans", (s: SparkSession, dir: String) => {
      val fps = docsDf(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), explode(shim.col(graft.core.WinnowFingerprints(
          shim.expr(col("text")), 8, 4))).as("_f"))
        .select(col("doc_id"), col("_f.fp").as("fp")).distinct()
      val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= 20)
      val pruned = fps.join(rare.select("fp"), "fp")
      pruned.select(col("fp"), col("doc_id").as("i"))
        .join(pruned.select(col("fp"), col("doc_id").as("j")), "fp")
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
    },
      Some("""WITH cst AS (SELECT [33554432, 131072, 512, 2, 16777216, 65536, 256, 1]::BIGINT[] AS c),
             |docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
             |ppos AS (SELECT doc_id, text, unnest(range(1, length(text) - 8 + 2)) AS pos FROM docs),
             |h AS (SELECT doc_id, pos,
             |    (list_aggregate(list_transform(range(0, 8),
             |      j -> ord(substring(text, (pos + j)::INT, 1)) * cst.c[(j + 1)::INT]), 'sum')
             |      % 2147483647)::BIGINT AS fp
             |  FROM ppos, cst),
             |nh AS (SELECT doc_id, unnest(range(1, count(*) - 4 + 2)) AS t
             |  FROM h GROUP BY doc_id),
             |sel AS (SELECT DISTINCT doc_id, fp FROM (
             |    SELECT h.doc_id, nh.t, h.pos, h.fp,
             |      row_number() OVER (PARTITION BY h.doc_id, nh.t ORDER BY h.fp, h.pos DESC) AS rn
             |    FROM nh JOIN h ON h.doc_id = nh.doc_id AND h.pos BETWEEN nh.t AND nh.t + 3) x
             |  WHERE rn = 1),
             |rare AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 20)
             |SELECT a.doc_id AS i, b.doc_id AS j, count(*)::BIGINT AS shared
             |FROM sel a JOIN rare USING (fp) JOIN sel b ON b.fp = a.fp AND a.doc_id < b.doc_id
             |GROUP BY i, j HAVING count(*) >= 2""".stripMargin)),

    // deterministic content-hash corpus split (train/val): the
    // split of every production corpus pipeline — stable under
    // re-sharding and re-ingestion because it keys on content
    // identity, not row order. Output: per-(lang, split) counts.
    ("corpus_split", (s: SparkSession, dir: String) =>
      docsDf(s, dir)
        .select(col("lang"),
          when(pmod(TF.fingerprint60(col("doc_id").cast("string")), lit(10)) < 9,
            "train").otherwise("val").as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs")),
      Some("""SELECT lang,
             |  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 < 9
             |    THEN 'train' ELSE 'val' END AS split,
             |  count(*)::BIGINT AS n_docs
             |FROM documents GROUP BY lang, split""".stripMargin)),

    // Sequence packing (the concat-and-chop batching step of every
    // GPT-style pretraining pipeline): documents concatenate in a
    // deterministic content-hash order and chop into fixed
    // context-length sequences; each doc belongs to the sequence its
    // START offset falls in. Packing is PER HASH BUCKET, not global —
    // a global order would need a full sort at 100 TB, while bucketed
    // packing is a window over each bucket's partition (16 parallel
    // prefix sums here, thousands on a cluster). Output = per-sequence
    // doc count and token fill, the packing-efficiency stats.
    ("sequence_packing", (s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val ctx = 512
      val toks = docsDf(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tok"),
        TF.fingerprint60(col("doc_id").cast("string")).as("_h"))
        .withColumn("bucket", pmod(col("_h"), lit(16)))
      val w = Window.partitionBy("bucket").orderBy(col("_h"), col("doc_id"))
      toks
        .withColumn("_end", sum(col("n_tok")).over(w))
        .withColumn("seq_id",
          floor((col("_end") - col("n_tok")) / ctx).cast("long"))
        .groupBy(col("bucket"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
    },
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
             |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h FROM documents),
             |b AS (SELECT doc_id, n_tok, h, h % 16 AS bucket FROM t),
             |c AS (SELECT bucket, n_tok,
             |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY h, doc_id
             |                     ROWS UNBOUNDED PRECEDING) AS e FROM b),
             |p AS (SELECT bucket, n_tok, ((e - n_tok) // 512)::BIGINT AS seq_id FROM c)
             |SELECT bucket, seq_id, count(*)::BIGINT AS n_docs,
             |  sum(n_tok)::BIGINT AS tok_sum
             |FROM p GROUP BY bucket, seq_id""".stripMargin)),

    // Stratified (topic-balanced) corpus sampling — the cluster-then-
    // cap resampling step of large-scale dataset curation: k-means
    // clusters over the embedding column, then a deterministic
    // content-hash cap per cluster (keep iff hash(id) mod n_c < cap,
    // expected cap rows/cluster; clusters under the cap keep all).
    // At 100 TB this is a map-side assign expression + a hash filter —
    // no shuffle beyond the 8-row size/stat aggregates. id_sum is the
    // integer-exact witness of the exact kept SET. The oracle replays
    // assignment from the centroid sidecar, the per-cluster counts,
    // and the same md5-hash cap.
    ("corpus_stratified_sample", (s: SparkSession, dir: String) => {
      val m = km8(s, dir)
      val assigned = m.assign(
        emb(s, dir).select(col("vec_id"), col("embedding")), "embedding")
        .select(col("vec_id"), col("list_no"))
      val sizes = assigned.groupBy("list_no")
        .agg(count(lit(1)).as("n_total"))
      val keep = pmod(TF.fingerprint60(col("vec_id").cast("string")),
        col("n_total")) < lit(40)
      assigned.join(broadcast(sizes), "list_no")
        .groupBy(col("list_no"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("vec_id")).otherwise(0L)).as("id_sum"))
    },
      Some(s"""WITH cent AS (SELECT list_no, c::DOUBLE[] AS c FROM read_parquet('$AUX/kmeans8_centroids/*.parquet')),
              |a AS (SELECT vec_id, list_no FROM (
              |  SELECT e.vec_id, c.list_no, row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], c.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
              |sz AS (SELECT list_no, count(*)::BIGINT AS n_total FROM a GROUP BY list_no),
              |k AS (SELECT a.vec_id, a.list_no, sz.n_total,
              |    (('0x' || substr(md5(a.vec_id::VARCHAR), 1, 15))::BIGINT % sz.n_total) < 40 AS keep
              |  FROM a JOIN sz USING (list_no))
              |SELECT list_no, count(*)::BIGINT AS n_total,
              |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
              |  sum(CASE WHEN keep THEN vec_id ELSE 0 END)::BIGINT AS id_sum
              |FROM k GROUP BY list_no""".stripMargin)),

    // multimodal: opaque binary column -> batched mapPartitions decode
    // (stub) -> typed features; oracle checks the byte-derived fields
    ("multimodal_features", (s: SparkSession, dir: String) => {
      val media = docsDf(s, dir).select(
        col("doc_id").as("id"), col("text").cast("binary").as("media"),
        lit("text-as-image").as("kind"))
      Multimodal.extractFeatures(media)
        .select(col("id"), col("n_bytes"), col("f_first"), col("f_last"))
    },
      Some("""SELECT doc_id AS id, octet_length(text::BLOB)::BIGINT AS n_bytes,
             |  ascii(substr(text, 1, 1))::DOUBLE AS f_first,
             |  ascii(substr(text, -1, 1))::DOUBLE AS f_last
             |FROM documents""".stripMargin)),

    // §2.10 Structured Streaming: tumbling-window agg over the events
    // stream, drained to completion — result equals the batch query
    ("stream_window_agg", (s: SparkSession, dir: String) =>
      graft.streaming.StreamingIngest.windowedEventCounts(
        s, s"$dir/events.parquet"),
      Some("""SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT AS ws, event_type,
             |  count(*) AS cnt, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // §2.10 session-window streaming aggregation (session_window —
    // sessionization): per-user inactivity-gap sessions with exact-µs
    // session starts; the oracle replays the island detection with a
    // lag() break column and a running sum (break iff the inter-event
    // gap is >= the session gap, matching session_window's
    // strictly-inside merge rule).
    ("stream_session_window", (s: SparkSession, dir: String) =>
      graft.streaming.StreamingIngest.sessionizedEventCounts(
        s, s"$dir/events.parquet", gap = "12 hours", maxUser = 40),
      Some("""WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id < 40),
             |wm AS (SELECT max(ts) AS m FROM e),
             |b AS (SELECT user_id, ts, value, CASE WHEN lag(ts) OVER w IS NULL
             |        OR ts - lag(ts) OVER w >= INTERVAL 12 HOUR THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (SELECT user_id, ts, value,
             |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM b)
             |SELECT user_id, epoch_us(min(ts))::BIGINT AS session_start,
             |  count(*)::BIGINT AS n_events, round(sum(value), 2) AS sv
             |FROM s, wm GROUP BY user_id, sid, wm.m
             |HAVING max(ts) + INTERVAL 12 HOUR <= wm.m""".stripMargin)),

    // §2.10 SlidingIndexWindow retention (IVFlib SlidingIndexWindow
    // ::step, faiss/IVFlib.h:61): keep only the newest `keep`
    // time-partitions of the ingested data. The query derives hourly
    // partitions from events, retains the newest 3, and aggregates the
    // survivors; the oracle replays the retention as ORDER BY DESC
    // LIMIT 3 over the distinct partition keys.
    ("sliding_index_window", (s: SparkSession, dir: String) => {
      // ts arrives as either nanos-long or native timestamp; normTs
      // handles both. The nanosAsLong flag is scoped: the batch read
      // materializes inside the collect so the conf restore is safe
      // (the same save/restore the streaming helpers use, ADVICE r8).
      val out = graft.streaming.StreamingIngest.withNanosAsLong(s) {
        val ev = graft.streaming.StreamingIngest
          .normTs(s.read.parquet(s"$dir/events.parquet"))
          .withColumn("part", date_trunc("hour", col("ts")))
        val res = graft.streaming.StreamingIngest.slidingWindow(ev, "part", keep = 3)
          .groupBy(col("part"))
          .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sv"))
          .select(unix_timestamp(col("part")).as("part"), col("cnt"), col("sv"))
        (res.collect().toSeq, res.schema)
      }
      s.createDataFrame(s.sparkContext.parallelize(out._1, 1), out._2)
    },
      Some("""WITH ev AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS part, value FROM events),
             |keep AS (SELECT DISTINCT part FROM ev ORDER BY part DESC LIMIT 3)
             |SELECT epoch(part)::BIGINT AS part, count(*) AS cnt, round(sum(value), 2) AS sv
             |FROM ev JOIN keep USING (part) GROUP BY 1""".stripMargin)),

    // §2.10 streaming IVF ingest END TO END (startIngest — the
    // reference's incremental add loop, IndexIVF.cpp:254, as a
    // Structured Stream): the embeddings table streams through
    // foreachBatch coarse-assign+append into a fresh
    // list_no-partitioned on-disk index, which is then LOADED and
    // searched at nprobe = nlist — so whatever the per-batch
    // assignment did, the result must equal the exact brute-force
    // top-5. The tiny result is collected so the temp index/source
    // dirs can be removed inside the builder.
    ("stream_ivf_ingest_search", (s: SparkSession, dir: String) => {
      import java.nio.file.{Files, Paths}
      import graft.streaming.StreamingIngest.rmTree
      val model = km8(s, dir)
      val tmp = Files.createTempDirectory("graft_stream_ivf")
      val src = Files.createTempDirectory("graft_stream_ivf_src")
      try {
        Files.copy(Paths.get(s"$dir/embeddings.parquet"),
          src.resolve("embeddings.parquet"))
        val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
        val stream = s.readStream.schema(schema).parquet(src.toString)
          .filter(col("vec_id") >= 10)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val q = graft.streaming.StreamingIngest.startIngest(
          stream, model, s"$tmp/index", s"$tmp/ckpt")
        try q.processAllAvailable() finally q.stop()
        val invlists = s.read.parquet(s"$tmp/index/invlists")
          .select(col("id"), col("vec"), col("list_no").cast("int").as("list_no"))
        val idx = new graft.index.IvfIndex(model.centroids(0).length, "l2sq",
          model.centroids.length, model.centroids, invlists)
        val out = idx.search(qDf(s, dir, 10), 5, nprobe = model.centroids.length)
          .withColumn("dist", r4("dist"))
        // BOUNDED collect, deliberately: the temp-dir invlists are
        // deleted in the finally below, so the ≤ k·nq (= 50-row) final
        // result must be materialized off them before returning. This
        // idiom is only safe because the collected set is the already-
        // top-k'd OUTPUT — never copy it onto a query whose result
        // scales with the data (VERDICT r9 #3).
        val rows = out.collect().toSeq
        s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
      } finally { rmTree(tmp); rmTree(src) }
    },
      Some(s"""SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, $dL2 AS dist,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $dL2, b.vec_id) AS "rank"
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE "rank" <= 5""".stripMargin)),

    // streaming exactly-once dedup ingest (training-pipeline shape:
    // drop duplicate records by key as they arrive, stateful
    // dropDuplicates); the oracle is the batch count-distinct
    ("stream_dedup_ingest", (s: SparkSession, dir: String) =>
      graft.streaming.StreamingIngest.dedupIngest(
        s, s"$dir/events.parquet", Seq("user_id", "event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique_users")),
      Some("""SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_unique_users
             |FROM events GROUP BY event_type""".stripMargin)),

    // watermark-BOUNDED streaming dedup (dropDuplicatesWithinWatermark
    // — the 100 TB ingest shape: per-key state is dropped once the
    // watermark passes first-seen + delay instead of growing with
    // every key ever seen). The staged file drains as one batch, so
    // every duplicate key dedups while its state is live and the
    // result is exactly batch-distinct.
    ("stream_dedup_watermark", (s: SparkSession, dir: String) =>
      graft.streaming.StreamingIngest.dedupIngestWithinWatermark(
        s, s"$dir/events.parquet", Seq("user_id", "event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique_users")),
      Some("""SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_unique_users
             |FROM events GROUP BY event_type""".stripMargin)),

    // custom per-key streaming state (flatMapGroupsWithState over a
    // KeyValueGroupedDataset — the arbitrary-state-machine surface;
    // state store entry per user). Outputs are count/max/min —
    // order-insensitive, so the streaming result is exactly
    // batch-equivalent and the oracle is the plain GROUP BY.
    ("stream_user_state", (s: SparkSession, dir: String) =>
      graft.streaming.StreamingIngest.statefulUserStats(
        s, s"$dir/events.parquet", maxUser = 50),
      Some("""SELECT user_id, count(*)::BIGINT AS cnt,
             |  round(max(value), 2) AS mx, round(min(value), 2) AS mn
             |FROM events WHERE user_id < 50 GROUP BY user_id""".stripMargin)),

    // the same stateful dedup ingest at lineitem scale (600k rows at
    // sf0.1 through the microbatch + state store machinery): dedup by
    // (l_orderkey, l_partkey) — a genuinely duplicated key pair. Only
    // the key COUNT is aggregated (which duplicate survives depends on
    // arrival order, so any payload column would be nondeterministic).
    ("stream_dedup_big", (s: SparkSession, dir: String) =>
      graft.streaming.StreamingIngest.dedupIngest(
        s, s"$dir/lineitem.parquet", Seq("l_orderkey", "l_partkey"))
        .agg(count(lit(1)).as("n_unique_keys")),
      Some("""SELECT count(*)::BIGINT AS n_unique_keys FROM (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) t""".stripMargin)),

    // §2.12 autotune: nprobe operating points -> Pareto frontier
    // (recall needs our seeded kmeans; deterministic per engine,
    // rows-only for the driver)
    // Recall and scan-fraction are deterministic given the trained
    // coarse quantizer (the cost proxy is scanned rows, not
    // wall-clock), so the WHOLE autotune loop is oracle-checkable: the
    // SQL replays, for every nprobe operating point, the probe
    // selection, pruned search, recall vs the exact top-k, and probed
    // list mass, then applies the same Pareto-domination filter.
    ("autotune_pareto", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = graft.tune.AutoTune.explore(
        ivf8(s, dir), qDf(s, dir, 10), bDf(s, dir, 10), 10, Seq(1, 2, 4, 8))
      graft.tune.AutoTune.paretoFront(pts)
        .map(p => (p.nprobe, math.rint(p.recall * 1000) / 1000, math.rint(p.scannedFrac * 1000) / 1000))
        .toDF("nprobe", "recall", "scanned_frac")
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf8_centroids/*.parquet')),
              |nps AS (SELECT unnest([1, 2, 4, 8]) AS np),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |lsz AS (SELECT list_no, count(*)::DOUBLE AS sz FROM basg GROUP BY list_no),
              |tot AS (SELECT sum(sz) AS t FROM lsz),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |truth AS (SELECT qid, id FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS rk
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE rk <= 10),
              |cand AS (SELECT n.np, p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM nps n JOIN qc p ON p.pr <= n.np
              |  JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid
              |  JOIN embeddings b ON b.vec_id = a.id),
              |approx AS (SELECT np, qid, id FROM (
              |  SELECT np, qid, id, row_number() OVER (PARTITION BY np, qid ORDER BY dist, id) AS rk
              |  FROM cand) t WHERE rk <= 10),
              |allq AS (SELECT n.np, q.vec_id AS qid FROM nps n, embeddings q WHERE q.vec_id < 10),
              |inter AS (SELECT a.np, a.qid, count(*)::DOUBLE AS i
              |  FROM approx a JOIN truth t ON t.qid = a.qid AND t.id = a.id
              |  GROUP BY a.np, a.qid),
              |rec AS (SELECT np, avg(coalesce(i, 0) / 10.0) AS recall
              |  FROM allq LEFT JOIN inter USING (np, qid) GROUP BY np),
              |pl AS (SELECT DISTINCT n.np, p.list_no FROM nps n JOIN qc p ON p.pr <= n.np),
              |frac AS (SELECT np, sum(l.sz) / (SELECT t FROM tot) AS f
              |  FROM pl JOIN lsz l USING (list_no) GROUP BY np),
              |pts AS (SELECT r.np, r.recall, f.f FROM rec r JOIN frac f USING (np))
              |SELECT np AS nprobe, round(recall, 3) AS recall, round(f, 3) AS scanned_frac
              |FROM pts p
              |WHERE NOT EXISTS (SELECT 1 FROM pts q
              |  WHERE (q.recall > p.recall AND q.f <= p.f)
              |     OR (q.recall >= p.recall AND q.f < p.f))""".stripMargin)),

    // OneRecallAtRCriterion (AutoTune.h:44) — the R@R criterion of the
    // SIFT1B/Deep1B tables: fraction of queries whose TRUE 1-NN lands
    // in the top R, per nprobe operating point (vs autotune_pareto's
    // IntersectionCriterion). Same one-scan sweep; the oracle replays
    // the 1-NN truth, the sweep, the per-point hit counts, and the
    // Pareto filter.
    ("autotune_pareto_1r", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = graft.tune.AutoTune.explore1RecallAtR(
        ivf8(s, dir), qDf(s, dir, 10), bDf(s, dir, 10), r = 10,
        nprobes = Seq(1, 2, 4, 8))
      graft.tune.AutoTune.paretoFront(pts)
        .map(p => (p.nprobe, math.rint(p.recall * 1000) / 1000,
          math.rint(p.scannedFrac * 1000) / 1000))
        .toDF("nprobe", "recall_at_r", "scanned_frac")
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivf8_centroids/*.parquet')),
              |nps AS (SELECT unnest([1, 2, 4, 8]) AS np),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |lsz AS (SELECT list_no, count(*)::DOUBLE AS sz FROM basg GROUP BY list_no),
              |tot AS (SELECT sum(sz) AS t FROM lsz),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |truth1 AS (SELECT qid, id FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS rk
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE rk <= 1),
              |cand AS (SELECT n.np, p.qid, a.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM nps n JOIN qc p ON p.pr <= n.np
              |  JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid
              |  JOIN embeddings b ON b.vec_id = a.id),
              |approx AS (SELECT np, qid, id FROM (
              |  SELECT np, qid, id, row_number() OVER (PARTITION BY np, qid ORDER BY dist, id) AS rk
              |  FROM cand) t WHERE rk <= 10),
              |nq AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE vec_id < 10),
              |hits AS (SELECT a.np, count(*)::DOUBLE AS h
              |  FROM approx a JOIN truth1 t ON t.qid = a.qid AND t.id = a.id GROUP BY a.np),
              |pl AS (SELECT DISTINCT n.np, p.list_no FROM nps n JOIN qc p ON p.pr <= n.np),
              |frac AS (SELECT np, sum(l.sz) / (SELECT t FROM tot) AS f
              |  FROM pl JOIN lsz l USING (list_no) GROUP BY np),
              |pts AS (SELECT n.np, coalesce(h.h, 0) / (SELECT n FROM nq) AS recall, f.f
              |  FROM nps n LEFT JOIN hits h USING (np) JOIN frac f USING (np))
              |SELECT np AS nprobe, round(recall, 3) AS recall_at_r, round(f, 3) AS scanned_frac
              |FROM pts p
              |WHERE NOT EXISTS (SELECT 1 FROM pts q
              |  WHERE (q.recall > p.recall AND q.f <= p.f)
              |     OR (q.recall >= p.recall AND q.f < p.f))""".stripMargin)),

    // k_factor autotune axis (ParameterSpace "k_factor"/"k_factor_rf",
    // AutoTune.cpp:347,397) over the SQ8 + exact-re-rank composite:
    // ONE stage-1 ADC ranking at max(k_factors) + ONE exact-distance
    // join serve every point (the k_factor = f candidate set is the
    // stage-1 rank prefix <= k·f). The oracle replays SQ8 train/
    // decode, the ADC ranking, the prefix subsets, the exact re-rank,
    // recall vs the exact truth, and the Pareto dominance filter.
    ("autotune_pareto_refine", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = graft.tune.AutoTune.exploreKFactor(
        qDf(s, dir, 10), bDf(s, dir, 10), 10, Seq(1, 2, 4, 8))
      graft.tune.AutoTune.paretoFrontKf(pts)
        .map(p => (p.kFactor, math.rint(p.recall * 1000) / 1000,
          math.rint(p.rerankedFrac * 1000) / 1000))
        .toDF("k_factor", "recall", "reranked_frac")
    },
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |s1 AS (SELECT qid, id, rn FROM (
             |  SELECT q.vec_id AS qid, b.id,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |        p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), b.id) AS rn
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10) t WHERE rn <= 80),
             |kfs AS (SELECT unnest([1, 2, 4, 8]) AS kf),
             |cand AS (SELECT k.kf, s.qid, s.id,
             |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
             |  FROM s1 s JOIN kfs k ON s.rn <= k.kf * 10
             |  JOIN embeddings q ON q.vec_id = s.qid
             |  JOIN embeddings b ON b.vec_id = s.id),
             |approx AS (SELECT kf, qid, id FROM (
             |  SELECT kf, qid, id, row_number() OVER (PARTITION BY kf, qid ORDER BY dist, id) AS rk
             |  FROM cand) t WHERE rk <= 10),
             |truth AS (SELECT qid, id FROM (
             |  SELECT q.vec_id AS qid, b.vec_id AS id,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS rk
             |  FROM embeddings q CROSS JOIN embeddings b
             |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE rk <= 10),
             |nq AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE vec_id < 10),
             |nb AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE vec_id >= 10),
             |inter AS (SELECT a.kf, count(*)::DOUBLE AS i
             |  FROM approx a JOIN truth t ON t.qid = a.qid AND t.id = a.id GROUP BY a.kf),
             |pts AS (SELECT k.kf,
             |    coalesce(i.i, 0) / ((SELECT n FROM nq) * 10.0) AS recall,
             |    least(10.0 * k.kf, (SELECT n FROM nb)) / (SELECT n FROM nb) AS f
             |  FROM kfs k LEFT JOIN inter i USING (kf))
             |SELECT kf AS k_factor, round(recall, 3) AS recall, round(f, 3) AS reranked_frac
             |FROM pts p
             |WHERE NOT EXISTS (SELECT 1 FROM pts q
             |  WHERE (q.recall > p.recall AND q.f <= p.f)
             |     OR (q.recall >= p.recall AND q.f < p.f))""".stripMargin)),

    // Multi-parameter autotune (ParameterSpace, AutoTune.cpp:347-403):
    // the (nprobe, ht, max_codes) triple the reference's SIFT1B/Deep1B
    // operating points are expressed in. ONE candidate scan at
    // max(nprobes) serves the whole grid; the oracle replays the full
    // IVFPQ chain (coarse assign, residual encode base AND query,
    // per-list LUT + ADC, polysemous Hamming between the code pairs,
    // per-query cumulative scan budget in probe-rank order
    // (IndexIVF.cpp:586)), the grid filters, the
    // recall/scanned aggregates, and the Pareto dominance filter.
    ("autotune_pareto_multi", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = graft.tune.AutoTune.exploreMulti(
        ivfpq8(s, dir), qDf(s, dir, 10), bDf(s, dir, 10), 10,
        nprobes = Seq(2, 8), hts = Seq(12, 32), maxCodesList = Seq(5, 1000000))
      graft.tune.AutoTune.paretoFrontM(pts)
        .map(p => (p.nprobe, p.ht, p.maxCodes,
          math.rint(p.recall * 1000) / 1000, math.rint(p.scannedFrac * 1000) / 1000))
        .toDF("nprobe", "ht", "max_codes", "recall", "scanned_frac")
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qc AS (SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10),
              |qres AS (SELECT p.qid, p.list_no, p.pr,
              |    list_transform(list_zip(q.embedding, c.c), x -> x[1] - x[2]) AS res
              |  FROM qc p JOIN embeddings q ON q.vec_id = p.qid JOIN cent c ON c.list_no = p.list_no),
              |qsub AS (SELECT qid, list_no, pr, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |qenc AS (SELECT qid, list_no, m, j FROM (
              |  SELECT q.qid, q.list_no, q.m, cb.j, row_number() OVER (PARTITION BY q.qid, q.list_no, q.m ORDER BY
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qsub q JOIN cb ON cb.m = q.m) t WHERE rn = 1),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |ham AS (SELECT e.id, qe.qid, e.list_no,
              |    sum(bit_count(xor(e.j::BIGINT, qe.j::BIGINT)))::INT AS hd
              |  FROM enc e JOIN qenc qe ON qe.list_no = e.list_no AND qe.m = e.m
              |  GROUP BY e.id, qe.qid, e.list_no),
              |cand0 AS (SELECT l.qid, e.list_no, p.pr, e.id,
              |    list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist, any_value(h.hd) AS hd
              |  FROM enc e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  JOIN qc p ON p.qid = l.qid AND p.list_no = e.list_no
              |  JOIN ham h ON h.id = e.id AND h.qid = l.qid AND h.list_no = e.list_no
              |  GROUP BY l.qid, e.list_no, p.pr, e.id),
              |hts AS (SELECT unnest([12, 32]) AS ht),
              |lsz AS (SELECT list_no, count(*) AS c FROM basg GROUP BY list_no),
              |cum AS (SELECT p.qid, p.list_no,
              |    sum(coalesce(l.c, 0)) OVER (PARTITION BY p.qid ORDER BY p.pr) - coalesce(l.c, 0) AS bef
              |  FROM qc p LEFT JOIN lsz l USING (list_no)),
              |candh AS (SELECT c.*, h.ht FROM cand0 c JOIN hts h ON c.hd <= h.ht),
              |grid AS (SELECT n.np, m.mc FROM (SELECT unnest([2, 8]) AS np) n,
              |  (SELECT unnest([5, 1000000]) AS mc) m),
              |allc AS (SELECT g.np, c.ht, g.mc, c.qid, c.id, c.dist
              |  FROM candh c JOIN cum u ON u.qid = c.qid AND u.list_no = c.list_no
              |  JOIN grid g ON c.pr <= g.np AND u.bef < g.mc),
              |scanned AS (SELECT np, ht, mc, count(*)::DOUBLE AS s FROM allc GROUP BY np, ht, mc),
              |tot AS (SELECT count(*)::DOUBLE *
              |    (SELECT count(*) FROM embeddings WHERE vec_id < 10) AS t FROM basg),
              |truth AS (SELECT qid, id FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS rk
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE rk <= 10),
              |approx AS (SELECT np, ht, mc, qid, id FROM (
              |  SELECT np, ht, mc, qid, id, row_number() OVER (
              |    PARTITION BY np, ht, mc, qid ORDER BY dist, id) AS rk FROM allc) t WHERE rk <= 10),
              |nq AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE vec_id < 10),
              |gridh AS (SELECT g.np, h.ht, g.mc FROM grid g, hts h),
              |inter AS (SELECT a.np, a.ht, a.mc, count(*)::DOUBLE AS i
              |  FROM approx a JOIN truth t ON t.qid = a.qid AND t.id = a.id
              |  GROUP BY a.np, a.ht, a.mc),
              |pts AS (SELECT g.np, g.ht, g.mc,
              |    coalesce(i.i, 0) / ((SELECT n FROM nq) * 10.0) AS recall,
              |    coalesce(s.s, 0) / (SELECT t FROM tot) AS f
              |  FROM gridh g LEFT JOIN inter i USING (np, ht, mc)
              |  LEFT JOIN scanned s USING (np, ht, mc))
              |SELECT np AS nprobe, ht, mc AS max_codes,
              |  round(recall, 3) AS recall, round(f, 3) AS scanned_frac
              |FROM pts p
              |WHERE NOT EXISTS (SELECT 1 FROM pts q
              |  WHERE (q.recall > p.recall AND q.f <= p.f)
              |     OR (q.recall >= p.recall AND q.f < p.f))""".stripMargin)),

    // The Deep1B operating-point shape (BASELINE.md: IMI2x14,PQ20
    // tuned on (nprobe, ht, max_codes) triples; AutoTune.cpp:347-403):
    // the same 3-axis grid as autotune_pareto_multi but over the IMI
    // coarse — one MinSumK-probed candidate scan serves every grid
    // point. The oracle replays the entire imi_pq_search chain PLUS
    // the query-side residual encode (for the polysemous Hamming),
    // the per-query cumulative scan budget in probe-rank order
    // (IndexIVF.cpp:586), the grid filters,
    // the recall/scanned aggregates, and the Pareto dominance filter.
    ("autotune_pareto_imi", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = graft.tune.AutoTune.exploreMultiImi(
        imipq16(s, dir), qDf(s, dir, 10), bDf(s, dir, 10), 10,
        nprobes = Seq(2, 8), hts = Seq(12, 32), maxCodesList = Seq(5, 1000000))
      graft.tune.AutoTune.paretoFrontM(pts)
        .map(p => (p.nprobe, p.ht, p.maxCodes,
          math.rint(p.recall * 1000) / 1000, math.rint(p.scannedFrac * 1000) / 1000))
        .toDF("nprobe", "ht", "max_codes", "recall", "scanned_frac")
    },
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imipq_coarse_cb/*.parquet')),
              |rcb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imipq_codebooks/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j AS j0, a1.j AS j1, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |bres AS (SELECT bc.id, bc.cell,
              |    list_transform(list_zip(b.embedding, c0.c || c1.c), p -> p[1] - p[2]) AS res
              |  FROM bcell bc JOIN embeddings b ON b.vec_id = bc.id
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = bc.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = bc.j1),
              |bsub AS (SELECT id, cell, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, cell, m, j FROM (
              |  SELECT b.id, b.cell, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN rcb cb ON cb.m = b.m) t WHERE rn = 1),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN ccb cb ON cb.m = q.m) t WHERE rn <= 8),
              |cells AS (SELECT d0.qid, d0.j AS j0, d1.j AS j1, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, j0, j1, cell, pr FROM (
              |  SELECT qid, j0, j1, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |qres AS (SELECT p.qid, p.cell, p.pr,
              |    list_transform(list_zip(q.embedding, c0.c || c1.c), x -> x[1] - x[2]) AS res
              |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = p.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = p.j1),
              |qsub AS (SELECT qid, cell, pr, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |qenc AS (SELECT qid, cell, m, j FROM (
              |  SELECT q.qid, q.cell, q.m, cb.j, row_number() OVER (PARTITION BY q.qid, q.cell, q.m ORDER BY
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qsub q JOIN rcb cb ON cb.m = q.m) t WHERE rn = 1),
              |lut AS (SELECT q.qid, q.cell, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN rcb cb ON cb.m = q.m),
              |ham AS (SELECT e.id, qe.qid, e.cell,
              |    sum(bit_count(xor(e.j::BIGINT, qe.j::BIGINT)))::INT AS hd
              |  FROM enc e JOIN qenc qe ON qe.cell = e.cell AND qe.m = e.m
              |  GROUP BY e.id, qe.qid, e.cell),
              |cand0 AS (SELECT l.qid, e.cell, any_value(p.pr) AS pr, e.id,
              |    list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist, any_value(h.hd) AS hd
              |  FROM enc e JOIN lut l ON l.cell = e.cell AND l.m = e.m AND l.j = e.j
              |  JOIN probes p ON p.qid = l.qid AND p.cell = e.cell
              |  JOIN ham h ON h.id = e.id AND h.qid = l.qid AND h.cell = e.cell
              |  GROUP BY l.qid, e.cell, e.id),
              |hts AS (SELECT unnest([12, 32]) AS ht),
              |lsz AS (SELECT cell, count(*) AS c FROM bcell GROUP BY cell),
              |cum AS (SELECT p.qid, p.cell,
              |    sum(coalesce(l.c, 0)) OVER (PARTITION BY p.qid ORDER BY p.pr) - coalesce(l.c, 0) AS bef
              |  FROM probes p LEFT JOIN lsz l USING (cell)),
              |candh AS (SELECT c.*, h.ht FROM cand0 c JOIN hts h ON c.hd <= h.ht),
              |grid AS (SELECT n.np, m.mc FROM (SELECT unnest([2, 8]) AS np) n,
              |  (SELECT unnest([5, 1000000]) AS mc) m),
              |allc AS (SELECT g.np, c.ht, g.mc, c.qid, c.id, c.dist
              |  FROM candh c JOIN cum u ON u.qid = c.qid AND u.cell = c.cell
              |  JOIN grid g ON c.pr <= g.np AND u.bef < g.mc),
              |scanned AS (SELECT np, ht, mc, count(*)::DOUBLE AS s FROM allc GROUP BY np, ht, mc),
              |tot AS (SELECT count(*)::DOUBLE *
              |    (SELECT count(*) FROM embeddings WHERE vec_id < 10) AS t FROM bcell),
              |truth AS (SELECT qid, id FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS rk
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE rk <= 10),
              |approx AS (SELECT np, ht, mc, qid, id FROM (
              |  SELECT np, ht, mc, qid, id, row_number() OVER (
              |    PARTITION BY np, ht, mc, qid ORDER BY dist, id) AS rk FROM allc) t WHERE rk <= 10),
              |nq AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE vec_id < 10),
              |gridh AS (SELECT g.np, h.ht, g.mc FROM grid g, hts h),
              |inter AS (SELECT a.np, a.ht, a.mc, count(*)::DOUBLE AS i
              |  FROM approx a JOIN truth t ON t.qid = a.qid AND t.id = a.id
              |  GROUP BY a.np, a.ht, a.mc),
              |pts AS (SELECT g.np, g.ht, g.mc,
              |    coalesce(i.i, 0) / ((SELECT n FROM nq) * 10.0) AS recall,
              |    coalesce(s.s, 0) / (SELECT t FROM tot) AS f
              |  FROM gridh g LEFT JOIN inter i USING (np, ht, mc)
              |  LEFT JOIN scanned s USING (np, ht, mc))
              |SELECT np AS nprobe, ht, mc AS max_codes,
              |  round(recall, 3) AS recall, round(f, 3) AS scanned_frac
              |FROM pts p
              |WHERE NOT EXISTS (SELECT 1 FROM pts q
              |  WHERE (q.recall > p.recall AND q.f <= p.f)
              |     OR (q.recall >= p.recall AND q.f < p.f))""".stripMargin)),

    // ParameterSpace over the HNSW-coarse composition (AutoTune.cpp:
    // 370 adds nprobe plus the quantizer's own space under the
    // `quantizer_` prefix; :403 adds efSearch for an HNSW quantizer):
    // the (nprobe × quantizer_efSearch) grid on IVF8_HNSW,PQ8,
    // Pareto-filtered on (recall, scanned fraction). Graph walks are
    // not SQL-replayable, so the engine dumps its probe SETS per walk
    // budget (hnswtune_probes sidecar) and the oracle independently
    // re-derives everything downstream: exact base assignment, PQ
    // codes, residual LUTs, ADC ranking, recall vs the exact truth,
    // scan fractions, and the Pareto dominance filter.
    ("autotune_pareto_hnsw_coarse", (s: SparkSession, dir: String) => {
      import s.implicits._
      val pts = graft.tune.AutoTune.exploreQuantizerEf(
        ivfpq8(s, dir), qDf(s, dir, 10), bDf(s, dir, 10), 5,
        nprobes = Seq(2, 4, 8), efs = Seq(2, 4, 1024))
      graft.tune.AutoTune.paretoFrontQef(pts)
        .map(p => (p.nprobe, p.quantizerEf,
          math.rint(p.recall * 1000) / 1000,
          math.rint(p.scannedFrac * 1000) / 1000))
        .toDF("nprobe", "quantizer_ef", "recall", "scanned_frac")
    },
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/ivfpq_codebooks/*.parquet')),
              |prb AS (SELECT ef, qid, list_no, pr FROM read_parquet('$AUX/hnswtune_probes/*.parquet')),
              |grid AS (SELECT e.ef, n.np FROM (SELECT DISTINCT ef FROM prb) e
              |  CROSS JOIN (SELECT unnest([2, 4, 8]) AS np) n),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |lsz AS (SELECT list_no, count(*)::DOUBLE AS sz FROM basg GROUP BY list_no),
              |tot AS (SELECT sum(sz) AS t FROM lsz),
              |bres AS (SELECT a.id, a.list_no,
              |    list_transform(list_zip(b.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM basg a JOIN embeddings b ON b.vec_id = a.id JOIN cent c ON c.list_no = a.list_no),
              |bsub AS (SELECT id, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, list_no, m, j FROM (
              |  SELECT b.id, b.list_no, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |ql AS (SELECT DISTINCT qid, list_no FROM prb),
              |qres AS (SELECT ql.qid, ql.list_no,
              |    list_transform(list_zip(q.embedding, c.c), p -> p[1] - p[2]) AS res
              |  FROM ql JOIN embeddings q ON q.vec_id = ql.qid JOIN cent c ON c.list_no = ql.list_no),
              |qsub AS (SELECT qid, list_no, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.list_no, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.list_no, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.list_no = e.list_no AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.list_no, e.id),
              |approx AS (SELECT ef, np, qid, id FROM (
              |  SELECT g.ef, g.np, a.qid, a.id,
              |    row_number() OVER (PARTITION BY g.ef, g.np, a.qid ORDER BY a.dist, a.id) AS rk
              |  FROM grid g JOIN prb p ON p.ef = g.ef AND p.pr < g.np
              |  JOIN adc a ON a.qid = p.qid AND a.list_no = p.list_no) t WHERE rk <= 5),
              |truth AS (SELECT qid, id FROM (
              |  SELECT q.vec_id AS qid, b.vec_id AS id, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS rk
              |  FROM embeddings q CROSS JOIN embeddings b
              |  WHERE q.vec_id < 10 AND b.vec_id >= 10) t WHERE rk <= 5),
              |allq AS (SELECT g.ef, g.np, q.vec_id AS qid FROM grid g CROSS JOIN embeddings q WHERE q.vec_id < 10),
              |inter AS (SELECT a.ef, a.np, a.qid, count(*)::DOUBLE AS i
              |  FROM approx a JOIN truth t ON t.qid = a.qid AND t.id = a.id
              |  GROUP BY a.ef, a.np, a.qid),
              |rec AS (SELECT ef, np, avg(coalesce(i, 0) / 5.0) AS recall
              |  FROM allq LEFT JOIN inter USING (ef, np, qid) GROUP BY ef, np),
              |pl AS (SELECT DISTINCT g.ef, g.np, p.list_no
              |  FROM grid g JOIN prb p ON p.ef = g.ef AND p.pr < g.np),
              |frac AS (SELECT ef, np, sum(l.sz) / (SELECT t FROM tot) AS f
              |  FROM pl JOIN lsz l USING (list_no) GROUP BY ef, np),
              |pts AS (SELECT r.ef, r.np, r.recall, f.f FROM rec r JOIN frac f USING (ef, np))
              |SELECT np AS nprobe, ef AS quantizer_ef, round(recall, 3) AS recall, round(f, 3) AS scanned_frac
              |FROM pts p
              |WHERE NOT EXISTS (SELECT 1 FROM pts q
              |  WHERE (q.recall > p.recall AND q.f <= p.f)
              |     OR (q.recall >= p.recall AND q.f < p.f))""".stripMargin)),

    // §2.4 exact 1-D k-means (DP over the value histogram). The DP is
    // exactly optimal, so the oracle can find the SAME optimum a
    // different way: enumerate every (k-1)-boundary segmentation of
    // the sorted distinct values via prefix sums (C(m-1,3) combos for
    // m distinct values — cheap for histogram-sized m) and take the
    // minimum weighted SSE. Agreement proves global optimality, not
    // just engine determinism.
    ("kmeans1d_quantity", (s: SparkSession, dir: String) => {
      import s.implicits._
      val r = graft.cluster.KMeans1D.fit(lineitem(s, dir), "l_quantity", 4)
      // per-cluster mass from the same histogram the DP consumed
      val hist = lineitem(s, dir)
        .select(col("l_quantity").cast("double").as("v"))
        .groupBy("v").agg(count(lit(1)).as("c"))
        .collect().map(row => (row.getDouble(0), row.getLong(1))).sortBy(_._1)
      val k = r.boundaries.length
      val sizes = Array.tabulate(k) { c =>
        val lo = r.boundaries(c)
        val hi = if (c == k - 1) Double.MaxValue else r.boundaries(c + 1)
        hist.filter { case (v, _) => v >= lo && v < hi }.map(_._2).sum
      }
      (0 until k).map(c =>
        (c.toLong, r.boundaries(c), math.rint(r.centroids(c) * 1000) / 1000, sizes(c)))
        .toDF("cluster", "boundary", "centroid", "n")
    },
      Some("""WITH h AS (SELECT l_quantity::DOUBLE AS v, count(*)::DOUBLE AS w FROM lineitem GROUP BY 1),
             |o AS (SELECT v, w, row_number() OVER (ORDER BY v) AS i FROM h),
             |p AS (SELECT i, v, sum(w) OVER (ORDER BY i) AS cw, sum(w*v) OVER (ORDER BY i) AS cs, sum(w*v*v) OVER (ORDER BY i) AS cq FROM o),
             |p0 AS (SELECT 0 AS i, NULL::DOUBLE AS v, 0.0 AS cw, 0.0 AS cs, 0.0 AS cq UNION ALL SELECT i, v, cw, cs, cq FROM p),
             |seg AS (SELECT a.i AS lo, b.i AS hi,
             |    b.cq - a.cq - (b.cs - a.cs)*(b.cs - a.cs)/(b.cw - a.cw) AS sse
             |  FROM p0 a JOIN p0 b ON b.i > a.i),
             |mx AS (SELECT max(i) AS mi FROM p),
             |best AS (SELECT s1.hi AS b1, s2.hi AS b2, s3.hi AS b3
             |  FROM seg s1 JOIN seg s2 ON s2.lo = s1.hi JOIN seg s3 ON s3.lo = s2.hi
             |       JOIN seg s4 ON s4.lo = s3.hi, mx
             |  WHERE s1.lo = 0 AND s4.hi = mx.mi
             |  ORDER BY s1.sse + s2.sse + s3.sse + s4.sse, b1, b2, b3 LIMIT 1),
             |bnds AS (SELECT 0 AS cluster, 0 AS lo, b1 AS hi FROM best
             |  UNION ALL SELECT 1, b1, b2 FROM best
             |  UNION ALL SELECT 2, b2, b3 FROM best
             |  UNION ALL SELECT 3, b3, mx.mi FROM best, mx)
             |SELECT b.cluster::BIGINT AS cluster,
             |  (SELECT v FROM p WHERE i = b.lo + 1) AS boundary,
             |  round((ph.cs - pl.cs) / (ph.cw - pl.cw), 3) AS centroid,
             |  (ph.cw - pl.cw)::BIGINT AS n
             |FROM bnds b JOIN p0 pl ON pl.i = b.lo JOIN p0 ph ON ph.i = b.hi""".stripMargin)),

    // end-to-end LLM training-data pipeline: quality filter -> minhash
    // near-dup removal -> per-language corpus stats; every stage
    // replayed by the oracle
    ("training_data_pipeline", (s: SparkSession, dir: String) => {
      val docs = docsDf(s, dir)
      val quality = docs.filter(
        TF.qualityScore(col("text"), TF.EnStopwords) >= 0.5)
      val deduped = Dedup.dropNearDups(quality, "doc_id", "text",
        threshold = 0.8, ngram = 3, hashes = 12, bands = 4)
      deduped.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars").cast("double")), 2).as("avg_chars"),
        sum(TF.tokenCount(col("text"))).as("total_tokens"))
    },
      Some("""WITH quality AS (
             |  SELECT * FROM (
             |    SELECT d.*, string_split(text, ' ') AS t FROM documents d) q
             |  WHERE (least(length(text)::DOUBLE / 500.0, 1.0)
             |    + least(5.0 * len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on'], x)))::DOUBLE / len(t), 1.0)
             |    + CASE WHEN list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE / len(t) <= 8.0 THEN 1.0 ELSE 0.5 END) / 3.0 >= 0.5),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
             |         THEN list_transform(t[1:len(t)-2], (x, i) -> x || ' ' || t[i+1] || ' ' || t[i+2])
             |         ELSE []::VARCHAR[] END) AS s FROM quality),
             |hs AS (SELECT doc_id, s, list_transform(s,
             |         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1048573) AS hv FROM sh),
             |sig AS (SELECT doc_id, s, list_transform(range(0, 12),
             |          j -> list_aggregate(list_transform(hv,
             |            h -> (h * ((2654435761 * (j+1)) % 1000000007) + (97531 * (j+13)) % 1000000007) % 1000000007),
             |            'min')) AS sg FROM hs),
             |band AS (SELECT doc_id, b, md5(array_to_string(sg[3*b+1:3*b+3], '|')) AS bh
             |         FROM sig, range(0, 4) r(b)),
             |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
             |         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
             |jac AS (SELECT i, j, len(list_intersect(sa.s, sb.s))::DOUBLE AS inter,
             |               (len(sa.s) + len(sb.s))::DOUBLE AS tot
             |        FROM cand JOIN sh sa ON sa.doc_id = i JOIN sh sb ON sb.doc_id = j),
             |losers AS (SELECT DISTINCT j FROM jac WHERE inter/(tot-inter) >= 0.8),
             |deduped AS (SELECT * FROM quality WHERE doc_id NOT IN (SELECT j FROM losers))
             |SELECT lang, count(*) AS n_docs, round(avg(n_chars::DOUBLE), 2) AS avg_chars,
             |  CAST(sum(len(t)) AS BIGINT) AS total_tokens
             |FROM deduped GROUP BY lang""".stripMargin)),

    // ---- at-scale vector queries (600k-row lineitem-derived table;
    // the bench rows that actually stress scan/prune/top-k) ----------

    // Materializes the 600k-row derived vector table (md5 ids +
    // distinct + persist) as its own timed entry, so every downstream
    // *_big query measures its own work instead of whoever runs first
    // paying the derivation.
    ("bigvec_derive", (s: SparkSession, dir: String) => {
      import s.implicits._
      Seq(bigVecs(s, dir).count()).toDF("n_rows")
    },
      Some(s"WITH v AS ($bigVecSql) SELECT count(*) AS n_rows FROM v")),

    // exact brute-force kNN at |lineitem| scale: broadcast-NLJ + heap
    // aggregate over 600k rows x ~60 queries (sf0.1)
    ("knn_flat_l2_big", (s: SparkSession, dir: String) =>
      Knn.knnJoin(bigQueries(s, dir), bigVecs(s, dir), 10)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH v AS ($bigVecSql)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT q.id AS qid, b.id AS id,
              |    list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2 AS dist,
              |    row_number() OVER (PARTITION BY q.id ORDER BY
              |      list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2, b.id) AS "rank"
              |  FROM v q CROSS JOIN v b WHERE q.id % 9973 = 1) t
              |WHERE "rank" <= 10""".stripMargin)),

    // SQ8 ADC kNN at scale: 8-byte codes (vs 32 raw bytes) over the
    // 600k-row table; oracle replays the min/max training and the
    // codec arithmetic
    ("sq8_knn_big", (s: SparkSession, dir: String) => {
      val sq = cached(s"sq8big:$dir") {
        graft.index.SqIndex.build(bigVecs(s, dir), "id", "vec")
      }
      sq.search(bigQueries(s, dir), 10).withColumn("dist", r4("dist"))
    },
      Some(s"""WITH v AS ($bigVecSql),
              |dims AS (
              |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
              |    SELECT i, min(e) AS mn, max(e) AS mx
              |    FROM (SELECT unnest(vec::DOUBLE[]) AS e, generate_subscripts(vec, 1) AS i
              |          FROM v) u GROUP BY i) t),
              |dec AS (SELECT v.id,
              |  list_transform(vec::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
              |  FROM v, dims),
              |qd AS (SELECT q.id AS qid, b.id AS id,
              |  list_aggregate(list_transform(list_zip(q.vec::DOUBLE[], b.dv),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM v q CROSS JOIN dec b WHERE q.id % 9973 = 1)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
              |  FROM qd) w WHERE "rank" <= 10""".stripMargin)),

    // radius search at scale over the 600k-row table
    ("range_search_big", (s: SparkSession, dir: String) =>
      Knn.rangeJoin(bigQueries(s, dir), bigVecs(s, dir), 0.02)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH v AS ($bigVecSql)
              |SELECT q.id AS qid, b.id AS id,
              |  round(list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2, 4) AS dist
              |FROM v q CROSS JOIN v b
              |WHERE q.id % 9973 = 1
              |  AND list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2 < 0.02""".stripMargin)),

    // binary Hamming kNN at scale: centered sign-bit codes over the
    // 600k-row table (1 byte/vector scanned); oracle replays the
    // centering, sign extraction, and popcount ranking
    ("knn_binary_hamming_big", (s: SparkSession, dir: String) => {
      val enc = (c: org.apache.spark.sql.Column) =>
        sign_bits(transform(c, x => x - lit(0.5f)))
      val q = bigQueries(s, dir).select(col("qid"), enc(col("qvec")).as("qcode"))
      val b = bigVecs(s, dir).select(col("id"), enc(col("vec")).as("code"))
      graft.index.BinaryFlat.knnJoin(q, b, 10)
    },
      Some(s"""WITH v AS ($bigVecSql),
              |bits AS (SELECT id, list_transform(v.vec::DOUBLE[], x -> x - 0.5 >= 0) AS bv FROM v),
              |hd AS (SELECT q.id AS qid, b.id AS id,
              |    len(list_filter(list_zip(q.bv, b.bv), p -> p[1] <> p[2]))::BIGINT AS hd
              |  FROM bits q JOIN bits b ON q.id % 9973 = 1)
              |SELECT qid, "rank", id, hd FROM (
              |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVF index build at scale, timed separately from search (faiss
    // benches train/add apart from search for the same reason). Runs
    // before ivf_search_big in catalog order, so the search timing
    // measures pure search against the memoized index. Output = the
    // inverted-list histogram; the oracle replays the coarse
    // assignment over all 600k rows from the centroid sidecar.
    ("ivf_build_big", (s: SparkSession, dir: String) =>
      ivfBig(s, dir).invlists
        .groupBy(col("list_no")).agg(count(lit(1)).as("n")),
      Some(s"""WITH v AS ($bigVecSql),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfbig_centroids/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM v b CROSS JOIN cent c) t WHERE rn = 1)
              |SELECT list_no, count(*)::BIGINT AS n FROM basg GROUP BY list_no""".stripMargin)),

    // IVF at scale: nprobe/nlist = 8/64 prunes 87.5% of the scan; the
    // oracle replays probe selection + assignment from the centroid
    // sidecar. Bench contrast vs knn_flat_l2_big is the IVF pruning
    // claim measured under real load.
    ("ivf_search_big", (s: SparkSession, dir: String) =>
      ivfBig(s, dir).search(bigQueries(s, dir), k = 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(ivfBigNprobe8Sql)),

    // Skewed-IVF stress (VERDICT r12 #6): the corpus is deliberately
    // imbalanced — half the rows collapse to one tight cluster, so one
    // list holds ~50% of the data (imbalance_factor >> 1,
    // IvfSpec asserts it). At 100 TB a hot list is the first thing
    // that kills an ANN join; here the session-built invlists keep the
    // SOURCE partitioning (the probed-list filter selects hot-list
    // rows wherever they lie, the top-k is partial+final), so the hot
    // list spreads over every core instead of one straggler task —
    // Bench's per-query task_max_ms/task_p50_ms fields record the
    // histogram evidence. The oracle replays the same skew transform
    // (float-exact in DuckDB) and the standard IVF search from the
    // trained-centroid sidecar.
    ("ivf_search_skewed", (s: SparkSession, dir: String) =>
      ivfSkew(s, dir).search(
        skewVecs(s, dir).filter(col("id") % 9973 === 1)
          .select(col("id").as("qid"), col("vec").as("qvec")),
        k = 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH v0 AS ($bigVecSql),
              |v AS (SELECT id, CASE WHEN id % 2 = 0
              |    THEN list_transform(vec, x -> x * 0.001::REAL) ELSE vec END AS vec FROM v0),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfskew_centroids/*.parquet')),
              |qc AS (SELECT q.id AS qid, c.list_no, row_number() OVER (PARTITION BY q.id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM v q CROSS JOIN cent c WHERE q.id % 9973 = 1),
              |probes AS (SELECT qid, list_no FROM qc WHERE pr <= 4),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM v b CROSS JOIN cent c) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN v q ON q.id = p.qid JOIN v b ON b.id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // big-batch IVF search (IVFlib's big-batch entry point / the
    // contrib big_batch_search recipe): when the QUERY SET itself is
    // corpus-sized, broadcasting the probe table is the wrong plan —
    // broadcastQueries = false keeps the probe side distributed and
    // the scan becomes a shuffle equi-join on list_no (partition
    // pruning still applies). Results are bit-identical to the
    // broadcast plan, so the oracle is ivf_search_big's verbatim; the
    // bench contrast shows the alternative 100 TB plan's cost.
    ("ivf_search_big_batch", (s: SparkSession, dir: String) =>
      ivfBig(s, dir).search(bigQueries(s, dir), k = 10, nprobe = 8,
        broadcastQueries = false)
        .withColumn("dist", r4("dist")),
      Some(ivfBigNprobe8Sql)),

    // distributed_ondisk recipe AT SCALE: 4 slices of the 600k-row
    // corpus each build invlists against the ivfbig quantizer, merge
    // to one on-disk store, load, search — and must return the top-k
    // of the SINGLE-build index bit for bit (shared oracle =
    // ivf_search_big's replay; the merge≡single-index invariant of
    // tests/test_merge.cpp under real load). This is the 100 TB
    // ingestion lifecycle measured end to end: per-slice assignment
    // is one NearestCentroid pass, the merge is a partitioned
    // parquet write, and the search partition-prunes the merged
    // store like any loaded index.
    ("distributed_ondisk_recipe_big", (s: SparkSession, dir: String) => {
      import java.nio.file.Files
      import graft.streaming.StreamingIngest.rmTree
      val single = ivfBig(s, dir)
      val base = bigVecs(s, dir)
      val tmp = Files.createTempDirectory("graft_ondisk_recipe_big")
      try {
        val shards = (0 until 4).map { g =>
          IvfIndex.build(base.filter(pmod(col("id"), lit(4)) === g),
            "id", "vec", nlist = single.nlist, centroids0 = single.centroids)
        }
        val merged = IvfIndex.mergeOnDisk(shards, s"$tmp/index")
        val out = merged.search(bigQueries(s, dir), k = 10, nprobe = 8)
          .withColumn("dist", r4("dist"))
        val rows = out.collect().toSeq // bounded: ~60 queries x k
        s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
      } finally rmTree(tmp)
    },
      Some(ivfBigNprobe8Sql)),

    // Two-level coarse AT SCALE (`IVF64(IVF8,Flat)` over the 600k-row
    // corpus, approximate regime nprobe2 = 3 of 8 sub-cells): the
    // regime the sub-index quantizer exists for — the quantizer scans
    // ~3/8 of the centroid table per query instead of all of it. The
    // oracle replays centroid sub-cell assignment, the query's
    // sub-cell ranking, the pruned centroid ranking and the exact
    // probed-list scan, all over the big-corpus sidecars.
    ("ivf_two_level_search_big", (s: SparkSession, dir: String) =>
      ivfBig(s, dir).search(bigQueries(s, dir), k = 10, nprobe = 8,
        coarse = Some(graft.index.Probes.IvfFlatCoarse(8, 3)))
        .withColumn("dist", r4("dist")),
      Some(s"""WITH v AS ($bigVecSql),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfbig_centroids/*.parquet')),
              |sub AS (SELECT j, c FROM read_parquet('$AUX/parensub_big_centroids/*.parquet')),
              |casg AS (SELECT list_no, j FROM (
              |  SELECT ct.list_no, sb.j, row_number() OVER (PARTITION BY ct.list_no ORDER BY
              |    list_aggregate(list_transform(list_zip(ct.c::DOUBLE[], sb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), sb.j) AS rn
              |  FROM cent ct CROSS JOIN sub sb) t WHERE rn = 1),
              |qcell AS (SELECT qid, j FROM (
              |  SELECT q.id AS qid, sb.j, row_number() OVER (PARTITION BY q.id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.vec::DOUBLE[], sb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), sb.j) AS pr
              |  FROM v q CROSS JOIN sub sb WHERE q.id % 9973 = 1) t WHERE pr <= 3),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT qc.qid, ct.list_no, row_number() OVER (PARTITION BY qc.qid ORDER BY
              |    list_aggregate(list_transform(list_zip(q.vec::DOUBLE[], ct.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), ct.list_no) AS pr
              |  FROM qcell qc JOIN casg ca ON ca.j = qc.j JOIN cent ct ON ct.list_no = ca.list_no
              |  JOIN v q ON q.id = qc.qid) t WHERE pr <= 8),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM v b CROSS JOIN cent c) t WHERE rn = 1),
              |d AS (SELECT p.qid, a.id,
              |    list_distance(q.vec::DOUBLE[], b.vec::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN v q ON q.id = p.qid JOIN v b ON b.id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVFPQ build at scale, timed apart from search (see ivf_build_big)
    ("ivfpq_build_big", (s: SparkSession, dir: String) =>
      ivfpqBig(s, dir).codes
        .groupBy(col("list_no")).agg(count(lit(1)).as("n")),
      Some(s"""WITH v AS ($bigVecSql),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfpqbig_centroids/*.parquet')),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.vec::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM v b CROSS JOIN cent c) t WHERE rn = 1)
              |SELECT list_no, count(*)::BIGINT AS n FROM basg GROUP BY list_no""".stripMargin)),

    // fast-scan at scale: 600k rows at TWO bytes/row (4 nibble codes)
    // vs 32 float bytes — the memory story the fast-scan family exists
    // for. The oracle replays encode + LUT quantization + the integer
    // scan over the whole table; qdist is integer-exact at any scale.
    ("pq4fs_search_big", (s: SparkSession, dir: String) =>
      pqfsBig(s, dir).search(bigQueries(s, dir), k = 10),
      Some(s"""WITH v AS ($bigVecSql),
              |cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pqfsbig_codebooks/*.parquet')),
              |bsub AS (SELECT id, r.m AS m, vec[r.m*2+1:r.m*2+2]::DOUBLE[] AS sv
              |         FROM v, range(0,4) r(m)),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT id AS qid, r.m AS m, vec[r.m*2+1:r.m*2+2]::DOUBLE[] AS sv
              |         FROM v, range(0,4) r(m) WHERE id % 9973 = 1),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |colstat AS (SELECT qid, m, min(pd) AS mn, max(pd) - min(pd) AS span FROM lut GROUP BY qid, m),
              |scal AS (SELECT qid, 255.0 / max(span) AS a,
              |    list_aggregate(list(mn ORDER BY m), 'sum') AS b FROM colstat GROUP BY qid),
              |lq AS (SELECT l.qid, l.m, l.j, floor((l.pd - cs.mn) * sc.a + 0.5)::BIGINT AS lq
              |  FROM lut l JOIN colstat cs ON cs.qid = l.qid AND cs.m = l.m
              |  JOIN scal sc ON sc.qid = l.qid),
              |acc AS (SELECT l.qid, e.id, sum(l.lq)::BIGINT AS qdist
              |  FROM enc e JOIN lq l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT w.qid, "rank", id, qdist, round(qdist / sc.a + sc.b, 4) AS dist FROM (
              |  SELECT qid, id, qdist, row_number() OVER (PARTITION BY qid ORDER BY qdist, id) AS "rank" FROM acc) w
              |JOIN scal sc ON sc.qid = w.qid WHERE "rank" <= 10""".stripMargin)),

    // IVFPQ at scale (m=4, dsub=2 over d=8): codes are 4 bytes/row vs
    // 32 bytes of floats; oracle replays the full residual-encode +
    // LUT + ADC pipeline from the sidecars.
    ("ivfpq_search_big", (s: SparkSession, dir: String) =>
      ivfpqBig(s, dir).search(bigQueries(s, dir), k = 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(ivfpqBigSql)),

    // The HNSW-coarse composition AT SCALE (`IVF64_HNSW32,PQ4` over
    // the 600k-row corpus): probe selection walks the per-executor
    // centroid graph instead of the exact argmin — the regime the
    // composition exists for. efSearch = 4096 >= nlist keeps the walk
    // exact-degenerate, so the ivfpq replay applies verbatim.
    ("ivf_hnsw_pq_search_big", (s: SparkSession, dir: String) =>
      ivfpqBig(s, dir).search(bigQueries(s, dir), k = 10, nprobe = 8,
        coarse = Some(graft.index.Probes.HnswCoarse(4096)))
        .withColumn("dist", r4("dist")),
      Some(ivfpqBigSql)),

    // IMI+PQ build at scale, timed apart from search (see
    // ivf_build_big): per-half coarse assignment + residual PQ encode
    // over all 600k rows. Output = the cell histogram; the oracle
    // replays both half-space argmins from the coarse sidecar.
    ("imi_pq_build_big", (s: SparkSession, dir: String) =>
      imipqBig(s, dir).codes
        .groupBy(col("cell")).agg(count(lit(1)).as("n")),
      Some(s"""WITH v AS ($bigVecSql),
              |ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imipqbig_coarse_cb/*.parquet')),
              |bh AS (SELECT id, r.m AS m, vec[r.m*4+1:r.m*4+4]::DOUBLE[] AS sv
              |       FROM v, range(0,2) r(m)),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, (a0.j*8 + a1.j)::INT AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1)
              |SELECT cell, count(*)::BIGINT AS n FROM bcell GROUP BY cell""".stripMargin)),

    // IMI+PQ search at scale (the SIFT1B flagship composition shape —
    // IMI2x12,PQ16 scaled to the 600k derived table as IMI2x3,PQ4):
    // MinSumK probe ranking, statically pruned cell scan, residual ADC.
    // The oracle replays the full chain from the two codebook sidecars.
    ("imi_pq_search_big", (s: SparkSession, dir: String) =>
      imipqBig(s, dir).search(bigQueries(s, dir), k = 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH v AS ($bigVecSql),
              |ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imipqbig_coarse_cb/*.parquet')),
              |rcb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imipqbig_codebooks/*.parquet')),
              |bh AS (SELECT id, r.m AS m, vec[r.m*4+1:r.m*4+4]::DOUBLE[] AS sv
              |       FROM v, range(0,2) r(m)),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j AS j0, a1.j AS j1, a0.j*8 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |bres AS (SELECT bc.id, bc.cell,
              |    list_transform(list_zip(b.vec, c0.c || c1.c), p -> p[1] - p[2]) AS res
              |  FROM bcell bc JOIN v b ON b.id = bc.id
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = bc.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = bc.j1),
              |bsub AS (SELECT id, cell, r.m AS m, res[r.m*2+1:r.m*2+2]::DOUBLE[] AS sv
              |         FROM bres, range(0,4) r(m)),
              |enc AS (SELECT id, cell, m, j FROM (
              |  SELECT b.id, b.cell, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN rcb cb ON cb.m = b.m) t WHERE rn = 1),
              |qh AS (SELECT id AS qid, r.m AS m, vec[r.m*4+1:r.m*4+4]::DOUBLE[] AS sv
              |       FROM v, range(0,2) r(m) WHERE id % 9973 = 1),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN ccb cb ON cb.m = q.m) t WHERE rn <= 8),
              |cells AS (SELECT d0.qid, d0.j AS j0, d1.j AS j1, d0.j*8 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, j0, j1, cell FROM (
              |  SELECT qid, j0, j1, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |qres AS (SELECT p.qid, p.cell,
              |    list_transform(list_zip(q.vec, c0.c || c1.c), x -> x[1] - x[2]) AS res
              |  FROM probes p JOIN v q ON q.id = p.qid
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = p.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = p.j1),
              |qsub AS (SELECT qid, cell, r.m AS m, res[r.m*2+1:r.m*2+2]::DOUBLE[] AS sv
              |         FROM qres, range(0,4) r(m)),
              |lut AS (SELECT q.qid, q.cell, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN rcb cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.cell = e.cell AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // §2.11 IMI multi-index (MultiIndexQuantizer / IMI2x4 coarse
    // quantizer): K² cartesian cells from two K-entry half-space
    // codebooks; probes ranked by the decomposed LUT sum. The oracle
    // replays half-space assignment, cell ranking, and the pruned
    // exact top-k from the codebook sidecar.
    ("imi_search", (s: SparkSession, dir: String) =>
      imi16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imi_codebooks/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qd AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d
              |  FROM qh q JOIN cb ON cb.m = q.m),
              |cells AS (SELECT d0.qid, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qd d0 JOIN qd d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, cell FROM (
              |  SELECT qid, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |d AS (SELECT p.qid, bc.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN bcell bc ON bc.cell = p.cell
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = bc.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // MultiIndexQuantizer2 (faiss/IndexPQ.h:171, search IndexPQ.cpp:
    // 1042): the cell ranking runs BOTH levels — per-half top-k2
    // through the assign sub-indexes (k2 = min(nprobe, ksub); flat
    // exact, the reference default), then the MinSumK combine of the
    // two k2-lists — instead of enumerating all K² cells. The oracle
    // replays both levels: per-half dists from the codebooks sidecar,
    // rn <= k2 per half, pair combine, top-nprobe cells, exact scan.
    ("imi2_search", (s: SparkSession, dir: String) =>
      imi16(s, dir).search2(qDf(s, dir, 10), k = 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imi_codebooks/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN cb ON cb.m = q.m) t WHERE rn <= 4),
              |cells AS (SELECT d0.qid, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, cell FROM (
              |  SELECT qid, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 4),
              |d AS (SELECT p.qid, bc.id,
              |    list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[])^2 AS dist
              |  FROM probes p JOIN bcell bc ON bc.cell = p.cell
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = bc.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IMI2x<b>,PQ<m> (IndexIVFPQ over the multi-index coarse — the
    // SIFT1B flagship composition, index_factory.cpp:834-878;
    // benchs/README.md:107 IMI2x12,PQ16). The oracle replays the whole
    // chain from the two codebook sidecars: per-half cell assignment,
    // float32 residual against the concat half-centroids, residual PQ
    // encode, the MinSumK probe ranking (per-half top-nprobe + min-sum
    // combine — never the K² enumeration), per-(query, cell) residual
    // LUT, and the ADC sum.
    ("imi_pq_search", (s: SparkSession, dir: String) =>
      imipq16(s, dir).search(qDf(s, dir, 10), k = 10, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imipq_coarse_cb/*.parquet')),
              |rcb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imipq_codebooks/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j AS j0, a1.j AS j1, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |bres AS (SELECT bc.id, bc.cell,
              |    list_transform(list_zip(b.embedding, c0.c || c1.c), p -> p[1] - p[2]) AS res
              |  FROM bcell bc JOIN embeddings b ON b.vec_id = bc.id
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = bc.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = bc.j1),
              |bsub AS (SELECT id, cell, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, cell, m, j FROM (
              |  SELECT b.id, b.cell, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN rcb cb ON cb.m = b.m) t WHERE rn = 1),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN ccb cb ON cb.m = q.m) t WHERE rn <= 8),
              |cells AS (SELECT d0.qid, d0.j AS j0, d1.j AS j1, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, j0, j1, cell FROM (
              |  SELECT qid, j0, j1, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |qres AS (SELECT p.qid, p.cell,
              |    list_transform(list_zip(q.embedding, c0.c || c1.c), x -> x[1] - x[2]) AS res
              |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = p.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = p.j1),
              |qsub AS (SELECT qid, cell, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.cell, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN rcb cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.cell = e.cell AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IMI2x<b>,SQ<w> (IndexIVFScalarQuantizer over the multi-index
    // coarse — the grammar composes IMI with any IVF code,
    // index_factory.cpp:834-878). This is the EXPLICIT by_residual =
    // false variant (the factory builds the by_residual=true ctor
    // default, asserted equal to a direct residual build in ImiSpec):
    // codes are the shared-range SQ8 quantization of the RAW vectors,
    // so the oracle replays cell assignment + MinSumK probes from the coarse
    // sidecar, the SQ8 range/encode/decode from the base itself (the
    // sq8_knn formula), and the pruned asymmetric ADC top-k.
    ("imi_sq_search", (s: SparkSession, dir: String) =>
      imisq16(s, dir).search(qDf(s, dir, 10), k = 5, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imisq_coarse_cb/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |dims AS (
              |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
              |    SELECT i, min(e) AS mn, max(e) AS mx
              |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
              |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
              |dec AS (SELECT vec_id AS id,
              |  list_transform(embedding::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
              |  FROM embeddings, dims WHERE vec_id >= 10),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN ccb cb ON cb.m = q.m) t WHERE rn <= 8),
              |cells AS (SELECT d0.qid, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, cell FROM (
              |  SELECT qid, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |d AS (SELECT p.qid, bc.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
              |      x -> (x[1]-x[2])*(x[1]-x[2])), 'sum') AS dist
              |  FROM probes p JOIN bcell bc ON bc.cell = p.cell
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN dec b ON b.id = bc.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // IMI+PQ lossy reconstruction (reconstruct_from_offset under the
    // IMI coarse): cell centroid (concat of the two half codewords) +
    // decoded residual — two K-row broadcast joins, in-row decode.
    ("imi_pq_reconstruct", (s: SparkSession, dir: String) =>
      imipq16(s, dir).reconstruct
        .join(emb(s, dir).select(col("vec_id").as("id"), col("embedding")), "id")
        .select(col("id"), round(element_at(col("vec"), 1), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("vec").cast("array<double>"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err")),
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imipq_coarse_cb/*.parquet')),
              |rcb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imipq_codebooks/*.parquet')),
              |rcbf AS (SELECT m, j, c FROM read_parquet('$AUX/imipq_codebooks/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j AS j0, a1.j AS j1
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |bres AS (SELECT bc.id, bc.j0, bc.j1,
              |    list_transform(list_zip(b.embedding, c0.c || c1.c), p -> p[1] - p[2]) AS res
              |  FROM bcell bc JOIN embeddings b ON b.vec_id = bc.id
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = bc.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = bc.j1),
              |bsub AS (SELECT id, j0, j1, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, j0, j1, m, j FROM (
              |  SELECT b.id, b.j0, b.j1, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN rcb cb ON cb.m = b.m) t WHERE rn = 1),
              |dres AS (SELECT e.id, any_value(e.j0) AS j0, any_value(e.j1) AS j1,
              |    flatten(list(f.c ORDER BY e.m)) AS dv
              |  FROM enc e JOIN rcbf f ON f.m = e.m AND f.j = e.j GROUP BY e.id),
              |rec AS (SELECT d.id,
              |    list_transform(list_zip(c0.c || c1.c, d.dv), p -> p[1] + p[2]) AS rv
              |  FROM dres d JOIN ccb c0 ON c0.m = 0 AND c0.j = d.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = d.j1)
              |SELECT r.id, round(r.rv[1], 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], r.rv::DOUBLE[]),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM rec r JOIN embeddings b ON b.vec_id = r.id""".stripMargin)),

    // IMI+PQ range search (IndexIVF::range_search under the IMI
    // coarse): every candidate in the probed cells whose residual-ADC
    // distance is under the radius — filter below any aggregation.
    // The oracle replays the imi_pq_search chain with the radius cut.
    ("imi_pq_range_search", (s: SparkSession, dir: String) =>
      imipq16(s, dir).rangeSearch(qDf(s, dir, 10), radius = 1.3, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imipq_coarse_cb/*.parquet')),
              |rcb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/imipq_codebooks/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j AS j0, a1.j AS j1, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |bres AS (SELECT bc.id, bc.cell,
              |    list_transform(list_zip(b.embedding, c0.c || c1.c), p -> p[1] - p[2]) AS res
              |  FROM bcell bc JOIN embeddings b ON b.vec_id = bc.id
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = bc.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = bc.j1),
              |bsub AS (SELECT id, cell, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM bres, range(0,8) r(m)),
              |enc AS (SELECT id, cell, m, j FROM (
              |  SELECT b.id, b.cell, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN rcb cb ON cb.m = b.m) t WHERE rn = 1),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN ccb cb ON cb.m = q.m) t WHERE rn <= 8),
              |cells AS (SELECT d0.qid, d0.j AS j0, d1.j AS j1, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, j0, j1, cell FROM (
              |  SELECT qid, j0, j1, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |qres AS (SELECT p.qid, p.cell,
              |    list_transform(list_zip(q.embedding, c0.c || c1.c), x -> x[1] - x[2]) AS res
              |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = p.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = p.j1),
              |qsub AS (SELECT qid, cell, r.m AS m, res[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM qres, range(0,8) r(m)),
              |lut AS (SELECT q.qid, q.cell, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN rcb cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.cell = e.cell AND l.m = e.m AND l.j = e.j
              |  GROUP BY l.qid, e.id)
              |SELECT qid, id, round(dist, 4) AS dist FROM adc WHERE dist < 1.3""".stripMargin)),

    // IMI2x<b>,SQ<w> with by_residual = true — the form the FACTORY
    // builds (IndexScalarQuantizer.h:74 ctor default, consistent with
    // the IVF<n>,SQ<w> route): the shared range trains over residuals
    // against the cell centroid (concat of the two half codewords),
    // and the query side subtracts the probed centroid before the
    // ADC. The oracle replays cell assignment, float32 residuals, the
    // residual-trained range, encode/decode, MinSumK probes, the
    // query-side residual, and the residual ADC top-k.
    ("imi_sq_residual_search", (s: SparkSession, dir: String) =>
      imisqRes16(s, dir).search(qDf(s, dir, 10), k = 5, nprobe = 8)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH ccb AS (SELECT m, j, c FROM read_parquet('$AUX/imisqres_coarse_cb/*.parquet')),
              |bh AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id >= 10),
              |benc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bh b JOIN ccb cb ON cb.m = b.m) t WHERE rn = 1),
              |bcell AS (SELECT a0.id, a0.j AS j0, a1.j AS j1, a0.j*16 + a1.j AS cell
              |  FROM benc a0 JOIN benc a1 ON a0.id = a1.id AND a0.m = 0 AND a1.m = 1),
              |bres AS (SELECT bc.id, bc.cell,
              |    list_transform(list_zip(b.embedding, c0.c || c1.c), p -> p[1] - p[2]) AS res
              |  FROM bcell bc JOIN embeddings b ON b.vec_id = bc.id
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = bc.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = bc.j1),
              |dims AS (
              |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
              |    SELECT i, min(e) AS mn, max(e) AS mx
              |    FROM (SELECT unnest(res::DOUBLE[]) AS e, generate_subscripts(res, 1) AS i
              |          FROM bres) u GROUP BY i) t),
              |dec AS (SELECT id, cell,
              |  list_transform(res::DOUBLE[], (x, i) ->
              |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
              |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
              |  FROM bres, dims),
              |qh AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*32+1:r.m*32+32]::DOUBLE[] AS sv
              |       FROM embeddings, range(0,2) r(m) WHERE vec_id < 10),
              |qtop AS (SELECT qid, m, j, d FROM (
              |  SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS d,
              |    row_number() OVER (PARTITION BY q.qid, q.m ORDER BY
              |      list_aggregate(list_transform(list_zip(q.sv, cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM qh q JOIN ccb cb ON cb.m = q.m) t WHERE rn <= 8),
              |cells AS (SELECT d0.qid, d0.j AS j0, d1.j AS j1, d0.j*16 + d1.j AS cell, d0.d + d1.d AS cd
              |  FROM qtop d0 JOIN qtop d1 ON d0.qid = d1.qid AND d0.m = 0 AND d1.m = 1),
              |probes AS (SELECT qid, j0, j1, cell FROM (
              |  SELECT qid, j0, j1, cell, cd, row_number() OVER (PARTITION BY qid ORDER BY cd, cell) AS pr
              |  FROM cells) t WHERE pr <= 8),
              |qres AS (SELECT p.qid, p.cell,
              |    list_transform(list_zip(q.embedding, c0.c || c1.c), x -> x[1] - x[2]) AS res
              |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
              |  JOIN ccb c0 ON c0.m = 0 AND c0.j = p.j0
              |  JOIN ccb c1 ON c1.m = 1 AND c1.j = p.j1),
              |d AS (SELECT qr.qid, b.id,
              |    list_aggregate(list_transform(list_zip(qr.res::DOUBLE[], b.dv),
              |      x -> (x[1]-x[2])*(x[1]-x[2])), 'sum') AS dist
              |  FROM qres qr JOIN dec b ON b.cell = qr.cell)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // Binary IVF range search (IndexBinaryIVF::range_search): the
    // Hamming-pruned lists under a radius predicate (inclusive bound,
    // the BinaryFlat.rangeJoin convention) — all-integer replay.
    ("bivf_range_search", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10)
        .select(col("qid"), sign_bits(col("qvec")).as("qcode"))
      bivf8(s, dir).rangeSearch(q, maxHamming = 24, nprobe = 2)
    },
      Some(s"""WITH cent AS (SELECT list_no, bits FROM read_parquet('$AUX/bivf_centroids/*.parquet')),
              |bbits AS (SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
              |          FROM embeddings WHERE vec_id >= 10),
              |qbits AS (SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
              |          FROM embeddings WHERE vec_id < 10),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    len(list_filter(list_zip(b.bits, c.bits), p -> p[1] <> p[2])), c.list_no) AS rn
              |  FROM bbits b CROSS JOIN cent c) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.id AS qid, c.list_no, row_number() OVER (PARTITION BY q.id ORDER BY
              |    len(list_filter(list_zip(q.bits, c.bits), p -> p[1] <> p[2])), c.list_no) AS pr
              |  FROM qbits q CROSS JOIN cent c) t WHERE pr <= 2)
              |SELECT p.qid, a.id,
              |    len(list_filter(list_zip(qb.bits, bb.bits), p -> p[1] <> p[2]))::BIGINT AS hd
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN qbits qb ON qb.id = p.qid JOIN bbits bb ON bb.id = a.id
              |  WHERE len(list_filter(list_zip(qb.bits, bb.bits), p -> p[1] <> p[2])) <= 24""".stripMargin)),

    // §2.11 Binary IVF (IndexBinaryIVF): Hamming-pruned inverted lists
    // of sign-bit codes. All-integer arithmetic, so the oracle replays
    // assignment, probe selection, and the pruned Hamming top-k
    // exactly from the binarized-centroid sidecar.
    ("bivf_search", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10)
        .select(col("qid"), sign_bits(col("qvec")).as("qcode"))
      bivf8(s, dir).search(q, k = 5, nprobe = 2)
    },
      Some(s"""WITH cent AS (SELECT list_no, bits FROM read_parquet('$AUX/bivf_centroids/*.parquet')),
              |bbits AS (SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
              |          FROM embeddings WHERE vec_id >= 10),
              |qbits AS (SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
              |          FROM embeddings WHERE vec_id < 10),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    len(list_filter(list_zip(b.bits, c.bits), p -> p[1] <> p[2])), c.list_no) AS rn
              |  FROM bbits b CROSS JOIN cent c) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.id AS qid, c.list_no, row_number() OVER (PARTITION BY q.id ORDER BY
              |    len(list_filter(list_zip(q.bits, c.bits), p -> p[1] <> p[2])), c.list_no) AS pr
              |  FROM qbits q CROSS JOIN cent c) t WHERE pr <= 2),
              |hd AS (SELECT p.qid, a.id,
              |    len(list_filter(list_zip(qb.bits, bb.bits), p -> p[1] <> p[2]))::BIGINT AS hd
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN qbits qb ON qb.id = p.qid JOIN bbits bb ON bb.id = a.id)
              |SELECT qid, "rank", id, hd FROM (
              |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 5""".stripMargin)),

    // BIVF<n>_HNSW<m> (index_factory.cpp:895-900): binary IVF whose
    // probe selection walks an HNSW graph over the 0/1-unpacked
    // centroids — Hamming == squared L2 on unpacked bits, so the float
    // graph ranks probes Hamming-correctly. efSearch >= nlist is
    // exact-degenerate: the oracle is the SAME exact Hamming replay as
    // bivf_search (probe ranking, pruned scan, integer Hamming top-k).
    ("bivf_hnsw_search", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10)
        .select(col("qid"), sign_bits(col("qvec")).as("qcode"))
      bivf8(s, dir).search(q, k = 5, nprobe = 2, hnswCoarse = Some(1024))
    },
      Some(s"""WITH cent AS (SELECT list_no, bits FROM read_parquet('$AUX/bivf_centroids/*.parquet')),
              |bbits AS (SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
              |          FROM embeddings WHERE vec_id >= 10),
              |qbits AS (SELECT vec_id AS id, list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
              |          FROM embeddings WHERE vec_id < 10),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.id, c.list_no, row_number() OVER (PARTITION BY b.id ORDER BY
              |    len(list_filter(list_zip(b.bits, c.bits), p -> p[1] <> p[2])), c.list_no) AS rn
              |  FROM bbits b CROSS JOIN cent c) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.id AS qid, c.list_no, row_number() OVER (PARTITION BY q.id ORDER BY
              |    len(list_filter(list_zip(q.bits, c.bits), p -> p[1] <> p[2])), c.list_no) AS pr
              |  FROM qbits q CROSS JOIN cent c) t WHERE pr <= 2),
              |hd AS (SELECT p.qid, a.id,
              |    len(list_filter(list_zip(qb.bits, bb.bits), p -> p[1] <> p[2]))::BIGINT AS hd
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN qbits qb ON qb.id = p.qid JOIN bbits bb ON bb.id = a.id)
              |SELECT qid, "rank", id, hd FROM (
              |  SELECT qid, id, hd, row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 5""".stripMargin)),

    // §2.11 residual quantizer roundtrip (IndexAdditiveQuantizer /
    // ResidualQuantizer minimal slice): 2 greedy levels of
    // full-dimension codebooks. The oracle replays the level-by-level
    // argmin encode, float32 residual, and codeword-sum decode from
    // the codebook sidecar.
    ("rq_roundtrip", (s: SparkSession, dir: String) => {
      val rq = rqModel16(s, dir)
      emb(s, dir).select(col("vec_id"),
        rq.roundtripCol(col("embedding")).as("_dv"), col("embedding"))
        .select(col("vec_id"),
          round(element_at(col("_dv"), 1).cast("double"), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("_dv").cast("array<double>"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |a0 AS (SELECT vec_id, embedding, j0 FROM (
              |  SELECT e.vec_id, e.embedding, cb.j AS j0, row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM embeddings e JOIN cb ON cb.m = 0) t WHERE rn = 1),
              |r1 AS (SELECT a0.vec_id, a0.embedding, a0.j0,
              |    list_transform(list_zip(a0.embedding, cb.c), p -> p[1] - p[2]) AS res
              |  FROM a0 JOIN cb ON cb.m = 0 AND cb.j = a0.j0),
              |a1 AS (SELECT vec_id, embedding, j0, j1 FROM (
              |  SELECT r1.vec_id, r1.embedding, r1.j0, cb.j AS j1, row_number() OVER (PARTITION BY r1.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(r1.res::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM r1 JOIN cb ON cb.m = 1) t WHERE rn = 1),
              |dec AS (SELECT a1.vec_id, a1.embedding,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM a1 JOIN cb c0 ON c0.m = 0 AND c0.j = a1.j0
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = a1.j1)
              |SELECT vec_id, round(dv[1]::DOUBLE, 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], dv::DOUBLE[]),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM dec""".stripMargin)),

    // Product-residual quantizer roundtrip (ProductResidualQuantizer /
    // ProductLocalSearchQuantizer, faiss/impl/ProductAdditiveQuantizer
    // .h:28,114): 2 splits x 2 levels, beam=2 encode + 2 ICM sweeps
    // (the LSQ refinement). Beam/ICM encoding is not SQL-replayable,
    // so the oracle verifies DECODE from the engine's stored codes
    // (prq_codes sidecar): per-split per-level integer codebook
    // lookups, the level float add, split concat, then the
    // reconstruction error vs the original vectors.
    ("prq_roundtrip", (s: SparkSession, dir: String) => {
      val prq = prqModel(s, dir)
      emb(s, dir).select(col("vec_id").as("id"),
        prq.roundtripCol(col("embedding"), beam = 2, icmIters = 2).as("_dv"),
        col("embedding"))
        .select(col("id"),
          round(element_at(col("_dv"), 1).cast("double"), 4).as("d1"),
          round(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              col("_dv").cast("array<double>"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x), 4).as("err"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/prq_codebooks/*.parquet')),
              |codes AS (SELECT id, code FROM read_parquet('$AUX/prq_codes/*.parquet')),
              |enc AS (SELECT id, r.m AS m, code[r.m+1] AS j FROM codes, range(0,4) r(m)),
              |comp AS (SELECT e.id, (e.m // 2) AS s,
              |    generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM enc e JOIN cb ON cb.m = e.m AND cb.j = e.j),
              |sumd AS (SELECT id, s, i, sum(v)::REAL AS v FROM comp GROUP BY id, s, i),
              |dv AS (SELECT id, list(v ORDER BY s, i) AS dv FROM sumd GROUP BY id)
              |SELECT d.id, round(d.dv[1]::DOUBLE, 4) AS d1,
              |  round(list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], d.dv::DOUBLE[]),
              |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), 4) AS err
              |FROM dv d JOIN embeddings b ON b.vec_id = d.id""".stripMargin)),

    // ivf_residual_from_quantizer + ivf_residual_add_from_flat_codes
    // (faiss/IVFlib.h:154,166): the trained RQ's FIRST level becomes
    // the coarse quantizer and the index is populated from
    // pre-encoded flat codes alone — list_no = code[0], invlist code =
    // the tail — without touching a raw vector (the bulk re-ingest
    // path; codes are 8-32x smaller than vectors). nprobe = nlist, so
    // the oracle is the pure decode-from-codes scan: dv = cb0[c0] +
    // cb1[c1] (float adds), exact double distance ranking.
    ("ivfrq_from_codes_search", (s: SparkSession, dir: String) => {
      val model = rqModel16(s, dir)
      val codes = bDf(s, dir, 10).select(col("id"),
        model.encodeCol(col("vec")).as("codes"))
      graft.index.IvfRq.addFromFlatCodes(model, codes)
        .search(qDf(s, dir, 10), 5, nprobe = 16)
        .withColumn("dist", r4("dist"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |d AS (SELECT q.vec_id AS qid, dec.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], dec.dv::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM dec CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // IndexIVFResidualQuantizer (faiss/IndexIVFAdditiveQuantizer.h:26,
    // 64): coarse quantizer + beam/ICM-encoded residual codes per
    // list, searched by reconstruction distance (AQ_decompress) over
    // the probed lists. The oracle replays probe selection from the
    // centroid sidecar (the green ivfpq/ivfsh pattern) and verifies
    // DECODE from the engine's stored codes (beam+ICM encoding is not
    // SQL-replayable): integer codebook lookups, level sum, coarse
    // float add, exact distance ranking.
    ("ivfrq_search", (s: SparkSession, dir: String) =>
      ivfrq8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfrq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/ivfrq_codebooks/*.parquet')),
              |codes AS (SELECT id, list_no, code FROM read_parquet('$AUX/ivfrq_codes/*.parquet')),
              |comp AS (SELECT cs.id, generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM (SELECT id, r.m AS m, code[r.m+1] AS j FROM codes, range(0,2) r(m)) cs
              |  JOIN cb ON cb.m = cs.m AND cb.j = cs.j),
              |sumd AS (SELECT id, i, sum(v)::REAL AS v FROM comp GROUP BY id, i),
              |dv AS (SELECT id, list(v ORDER BY i) AS dv FROM sumd GROUP BY id),
              |recon AS (SELECT c0.id, c0.list_no,
              |    list_transform(list_zip(ct.c, d.dv), p -> (p[1] + p[2])::REAL) AS rv
              |  FROM codes c0 JOIN cent ct ON ct.list_no = c0.list_no JOIN dv d ON d.id = c0.id),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |d AS (SELECT p.qid, r.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], r.rv::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM probes p JOIN recon r ON r.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVF-prefixed aq_norm clause (`IVF8,RQ2x4_Nqint8`,
    // index_factory.cpp:293-430 parses _N<norm> inside the IVF code
    // token; AQInvertedListScannerLUT, IndexIVFAdditiveQuantizer.cpp:
    // 204): the same residual lists as ivfrq_search, searched by the
    // per-(query, probed-list) LUT scan with a stored qint8-quantized
    // residual-reconstruction norm —
    //   dist = ||q-c||^2 - 2<q-c, x_hat> + qint8(||x_hat||^2).
    // The catalog query searches the FACTORY-built index (proving the
    // grammar clause end-to-end); the sidecars come from the
    // deterministic twin-call build. The oracle replays the WHOLE
    // chain in SQL: decode-from-codes, the stored norms, the trained
    // qint8 grid (min/max over all stored norms), probe selection,
    // float residual queries, per-level LUT dots, the bias+norm
    // formula, (dist, id)-ascending top-k.
    ("ivfrq_qnorm_search", (s: SparkSession, dir: String) =>
      ivfRqNorm8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfrqn_centroids/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/ivfrqn_codebooks/*.parquet')),
              |codes AS (SELECT id, list_no, code FROM read_parquet('$AUX/ivfrqn_codes/*.parquet')),
              |enc AS (SELECT id, list_no, r.m AS m, code[r.m+1] AS j FROM codes, range(0,2) r(m)),
              |comp AS (SELECT e.id, generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM enc e JOIN cb ON cb.m = e.m AND cb.j = e.j),
              |sumd AS (SELECT id, i, sum(v)::REAL AS v FROM comp GROUP BY id, i),
              |dv AS (SELECT id, list(v ORDER BY i) AS dv FROM sumd GROUP BY id),
              |nb AS (SELECT id, list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS normsq FROM dv),
              |nstat AS (SELECT min(normsq) AS nmin, max(normsq) AS nmax FROM nb),
              |nq AS (SELECT nb.id, CASE WHEN ns.nmax = ns.nmin THEN ns.nmin ELSE
              |    (least(greatest(floor((nb.normsq - ns.nmin)/(ns.nmax - ns.nmin)*256), 0), 255) + 0.5)/256*(ns.nmax - ns.nmin) + ns.nmin END AS nqd
              |  FROM nb, nstat ns),
              |probes AS (SELECT qid, list_no, cd FROM (
              |  SELECT q.vec_id AS qid, c.list_no,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS cd,
              |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |      list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |qr AS (SELECT p.qid, p.list_no, p.cd,
              |    list_transform(list_zip(q.embedding, c.c), p2 -> p2[1] - p2[2]) AS res
              |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid JOIN cent c ON c.list_no = p.list_no),
              |ip AS (SELECT q.qid, e.id, q.cd,
              |    sum(list_aggregate(list_transform(list_zip(q.res::DOUBLE[], cb.c::DOUBLE[]), p -> p[1]*p[2]), 'sum')) AS ip
              |  FROM qr q JOIN enc e ON e.list_no = q.list_no
              |  JOIN cb ON cb.m = e.m AND cb.j = e.j
              |  GROUP BY q.qid, e.id, q.cd),
              |d AS (SELECT ip.qid, ip.id, ip.cd - 2*ip.ip + nq.nqd AS dist
              |  FROM ip JOIN nq ON nq.id = ip.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // IVF product-AQ decompress (`IVF8,PRQ2x2x4`,
    // IndexIVFProductResidualQuantizer, index_factory.cpp:351): two
    // per-split residual RQs whose decode/search run through the
    // ZERO-PADDED effective model (the fast-scan closure's trick on
    // the decompress scan). Oracle = probe replay + decode-from-codes
    // over the effective codebooks sidecar (the ivfrq_search pattern
    // at 4 levels; per component only one split's 2 levels are
    // nonzero, so the float round-once argument still holds).
    ("ivfprq_search", (s: SparkSession, dir: String) =>
      ivfPrq8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfprq_centroids/*.parquet')),
              |cb AS (SELECT m, j, c FROM read_parquet('$AUX/ivfprq_codebooks/*.parquet')),
              |codes AS (SELECT id, list_no, code FROM read_parquet('$AUX/ivfprq_codes/*.parquet')),
              |comp AS (SELECT cs.id, generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM (SELECT id, r.m AS m, code[r.m+1] AS j FROM codes, range(0,4) r(m)) cs
              |  JOIN cb ON cb.m = cs.m AND cb.j = cs.j),
              |sumd AS (SELECT id, i, sum(v)::REAL AS v FROM comp GROUP BY id, i),
              |dv AS (SELECT id, list(v ORDER BY i) AS dv FROM sumd GROUP BY id),
              |recon AS (SELECT c0.id, c0.list_no,
              |    list_transform(list_zip(ct.c, d.dv), p -> (p[1] + p[2])::REAL) AS rv
              |  FROM codes c0 JOIN cent ct ON ct.list_no = c0.list_no JOIN dv d ON d.id = c0.id),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |d AS (SELECT p.qid, r.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], r.rv::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM probes p JOIN recon r ON r.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 10""".stripMargin)),

    // The reference's spectral-hash spelling (`IVF8,PCA8,SH`,
    // index_factory.cpp:398): IndexIVFSpectralHash with the d->nbit
    // transform REPLACED by a trained PCA, period ABSENT (the -1e10
    // simple-thresholding sentinel) and the Thresh_global ctor default
    // — signatures degenerate to sign bits of the centered projection.
    // The catalog query searches the FACTORY-built index; the oracle
    // replays the twin-call PCA (rotation + mean bias, REAL-rounded),
    // probe selection, the floor((y-0) * 2/period) & 1 bit formula and
    // the in-list Hamming ranking.
    ("ivfsh_pca_search", (s: SparkSession, dir: String) =>
      ivfShPca8(s, dir).search(qDf(s, dir, 10), 10, nprobe = 4),
      Some(s"""WITH rot AS (SELECT d, r::DOUBLE[] AS r, bias FROM read_parquet('$AUX/ivfshpca_rot/*.parquet')),
              |cent AS (SELECT list_no, c FROM read_parquet('$AUX/ivfshpca_centroids/*.parquet')),
              |ry AS (SELECT vec_id, list(yv ORDER BY d) AS y FROM (
              |  SELECT e.vec_id, r.d,
              |    (list_aggregate(list_transform(list_zip(r.r, e.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum') + r.bias)::REAL AS yv
              |  FROM embeddings e CROSS JOIN rot r) t GROUP BY vec_id),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cent c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS pr
              |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10) t WHERE pr <= 4),
              |bbits AS (SELECT a.id, a.list_no,
              |    list_transform(y.y::DOUBLE[], v -> floor(v * (2.0 / (-1e10)))::BIGINT & 1) AS bits
              |  FROM basg a JOIN ry y ON y.vec_id = a.id),
              |qbits AS (SELECT p.qid, p.list_no,
              |    list_transform(y.y::DOUBLE[], v -> floor(v * (2.0 / (-1e10)))::BIGINT & 1) AS bits
              |  FROM probes p JOIN ry y ON y.vec_id = p.qid),
              |hd AS (SELECT q.qid, b.id,
              |    len(list_filter(list_zip(q.bits, b.bits), p -> p[1] <> p[2]))::BIGINT AS hamming
              |  FROM qbits q JOIN bbits b ON b.list_no = q.list_no)
              |SELECT qid, "rank", id, hamming FROM (
              |  SELECT qid, id, hamming, row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS "rank" FROM hd) w
              |WHERE "rank" <= 10""".stripMargin)),

    // LSQ (IndexLocalSearchQuantizer, IndexAdditiveQuantizer.h:119;
    // factory LSQ2x4): the rq16 codebooks ENCODED by iterated
    // conditional modes (icm_encode, impl/LocalSearchQuantizer.cpp:505)
    // instead of beam search. The ICM descent itself is not
    // SQL-replayable, so the oracle verifies DECODE-from-codes + the
    // reconstruction-distance ranking from the engine's integer codes
    // (the prq/index2layer sidecar pattern).
    ("lsq_search", (s: SparkSession, dir: String) => {
      val m = rqModel16(s, dir)
      val b = lsqCodes(s, dir).select(col("id"), m.decodeCol(col("codes")).as("dv"))
      val q = qDf(s, dir, 10)
      b.crossJoin(broadcast(q))
        .select(col("qid"), col("id"), l2sq(col("qvec"), col("dv")).as("_d"))
        .groupBy(col("qid"))
        .agg(topk(col("_d"), col("id"), 5, asc = true).as("_tk"))
        .select(col("qid"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
        .select(col("qid"), (col("_pos") + 1).cast("long").as("rank"),
          col("_r.id").as("id"), round(col("_r.dist"), 4).as("dist"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/lsq_codes/*.parquet')),
              |enc AS (SELECT id, r.m AS m, codes[r.m+1] AS j FROM codes, range(0,2) r(m)),
              |comp AS (SELECT e.id, generate_subscripts(cb.c, 1) AS i, unnest(cb.c) AS v
              |  FROM enc e JOIN cb ON cb.m = e.m AND cb.j = e.j),
              |sumd AS (SELECT id, i, sum(v)::REAL AS v FROM comp GROUP BY id, i),
              |dv AS (SELECT id, list(v ORDER BY i) AS dv FROM sumd GROUP BY id),
              |d AS (SELECT q.vec_id AS qid, b.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM embeddings q CROSS JOIN dv b WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // ResidualCoarseQuantizer as the IVF coarse quantizer
    // (IndexAdditiveQuantizer.h:193; factory IVF16(RCQ2x2),Flat): the
    // 16 coarse centroids are codeword sums that are never
    // materialized — assignment and probe selection run the RQ beam
    // search at L·beam·k·d cost (core/RqExpressions.scala rcqTopLists).
    // At FULL beam (16 = nlist) both degenerate to the exact argmin
    // over the enumerated sums, which the oracle replays from the
    // codebooks sidecar: enumerate cents, argmin-assign the base,
    // top-4 probe lists per query, exact distance over probed lists.
    ("ivf_rcq_search", (s: SparkSession, dir: String) =>
      rcq16(s, dir).search(qDf(s, dir, 10), k = 5, nprobe = 4)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/rcq_codebooks/*.parquet')),
              |cents AS (SELECT c0.j*4 + c1.j AS list_no,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS cent
              |  FROM cb c0 JOIN cb c1 ON c0.m = 0 AND c1.m = 1),
              |basg AS (SELECT id, list_no FROM (
              |  SELECT b.vec_id AS id, c.list_no, row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], c.cent), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings b CROSS JOIN cents c WHERE b.vec_id >= 10) t WHERE rn = 1),
              |probes AS (SELECT qid, list_no FROM (
              |  SELECT q.vec_id AS qid, c.list_no, row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], c.cent), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), c.list_no) AS rn
              |  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10) t WHERE rn <= 4),
              |d AS (SELECT p.qid, a.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.embedding::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM probes p JOIN basg a ON a.list_no = p.list_no
              |  JOIN embeddings q ON q.vec_id = p.qid JOIN embeddings b ON b.vec_id = a.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // RQ reconstruction-distance search (the SDC-style use of the
    // additive code): rank base by ||q - decode(encode(b))||².
    ("rq_search", (s: SparkSession, dir: String) => {
      val rq = rqModel16(s, dir)
      val b = bDf(s, dir, 10).select(col("id"), rq.roundtripCol(col("vec")).as("dv"))
      val q = qDf(s, dir, 10)
      b.crossJoin(broadcast(q))
        .select(col("qid"), col("id"), l2sq(col("qvec"), col("dv")).as("_d"))
        .groupBy(col("qid"))
        .agg(topk(col("_d"), col("id"), 5, asc = true).as("_tk"))
        .select(col("qid"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
        .select(col("qid"), (col("_pos") + 1).cast("long").as("rank"),
          col("_r.id").as("id"), round(col("_r.dist"), 4).as("dist"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |a0 AS (SELECT vec_id, embedding, j0 FROM (
              |  SELECT e.vec_id, e.embedding, cb.j AS j0, row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM embeddings e JOIN cb ON cb.m = 0 WHERE e.vec_id >= 10) t WHERE rn = 1),
              |r1 AS (SELECT a0.vec_id, a0.embedding, a0.j0,
              |    list_transform(list_zip(a0.embedding, cb.c), p -> p[1] - p[2]) AS res
              |  FROM a0 JOIN cb ON cb.m = 0 AND cb.j = a0.j0),
              |a1 AS (SELECT vec_id, embedding, j0, j1 FROM (
              |  SELECT r1.vec_id, r1.embedding, r1.j0, cb.j AS j1, row_number() OVER (PARTITION BY r1.vec_id ORDER BY
              |    list_aggregate(list_transform(list_zip(r1.res::DOUBLE[], cb.c::DOUBLE[]), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM r1 JOIN cb ON cb.m = 1) t WHERE rn = 1),
              |dec AS (SELECT a1.vec_id AS id,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM a1 JOIN cb c0 ON c0.m = 0 AND c0.j = a1.j0
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = a1.j1),
              |d AS (SELECT q.vec_id AS qid, b.id,
              |    list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv::DOUBLE[]),
              |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
              |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // Additive-quantizer LUT search (Search_type_t ST_norm_float,
    // faiss/impl/AdditiveQuantizer.h:58-67): the scan computes
    // d = ||q||^2 - 2·<q,x̂> + ||x̂||^2 where <q,x̂> is L lookups into a
    // per-query LUT (exact: x̂ is a SUM of codewords, so the inner
    // product distributes) and ||x̂||^2 is the norm stored with the
    // codes at add time — no per-candidate decode. Oracle replays the
    // whole chain from the engine's integer codes (rq_codes sidecar):
    // decode, stored norm, LUT terms, same formula, same order.
    ("rq_lut_search", (s: SparkSession, dir: String) => {
      val rq = rqModel16(s, dir)
      val b = bDf(s, dir, 10)
        .select(col("id"), rq.encodeCol(col("vec")).as("codes"))
        .withColumn("normsq", aggregate(
          rq.decodeCol(col("codes")).cast("array<double>"),
          lit(0.0), (a, x) => a + x * x))
      val q = qDf(s, dir, 10).select(col("qid"),
        rq.lutCol(col("qvec")).as("lut"),
        aggregate(col("qvec").cast("array<double>"), lit(0.0),
          (a, x) => a + x * x).as("qn"))
      b.crossJoin(broadcast(q))
        .select(col("qid"), col("id"),
          (col("qn") - lit(2.0) * rq.ipFromLutCol(col("codes"), col("lut"))
            + col("normsq")).as("_d"))
        .groupBy(col("qid"))
        .agg(topk(col("_d"), col("id"), 5, asc = true).as("_tk"))
        .select(col("qid"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
        .select(col("qid"), (col("_pos") + 1).cast("long").as("rank"),
          col("_r.id").as("id"), round(col("_r.dist"), 4).as("dist"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, cv0, cv1,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS normsq FROM dec),
              |d AS (SELECT q.vec_id AS qid, nb.id,
              |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], q.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |     - 2*(list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nb.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |        + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nb.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')))
              |    + nb.normsq AS dist
              |  FROM nb CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // Quantized stored-norm AQ search types (Search_type_t
    // ST_norm_qint8/qint4/cqint8/cqint4, AdditiveQuantizer.h:58-67):
    // the same LUT scan as rq_lut_search, with the stored ||x̂||² term
    // quantized — uniformly over the trained [norm_min, norm_max]
    // range (encode_qint8/decode_qint8, AdditiveQuantizer.cpp:167-186)
    // or through a 256/16-entry exact-DP 1-D k-means codebook
    // (train_norm:124-131 Clustering1D). The oracle replays the whole
    // chain from the rq_codes sidecar: decode, stored norm, the
    // clamp/floor qint grid (or the codebook argmin from the cq
    // sidecar), LUT terms, same formula.
    ("rq_qnorm_qint8_search", (s: SparkSession, dir: String) => {
      val (nmin, nmax) = rqNormRange(s, dir)
      rqQnormSearch(s, dir, graft.index.RqNorms.qintDecode(_, 256, nmin, nmax))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, cv0, cv1,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS normsq FROM dec),
              |nstat AS (SELECT min(normsq) AS nmin, max(normsq) AS nmax FROM nb),
              |nq AS (SELECT nb.id, nb.cv0, nb.cv1, CASE WHEN ns.nmax = ns.nmin THEN ns.nmin ELSE
              |    (least(greatest(floor((nb.normsq - ns.nmin)/(ns.nmax - ns.nmin)*256), 0), 255) + 0.5)/256*(ns.nmax - ns.nmin) + ns.nmin END AS nqd
              |  FROM nb, nstat ns),
              |d AS (SELECT q.vec_id AS qid, nq.id,
              |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], q.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |     - 2*(list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |        + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')))
              |    + nq.nqd AS dist
              |  FROM nq CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    ("rq_qnorm_qint4_search", (s: SparkSession, dir: String) => {
      val (nmin, nmax) = rqNormRange(s, dir)
      rqQnormSearch(s, dir, graft.index.RqNorms.qintDecode(_, 16, nmin, nmax))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, cv0, cv1,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS normsq FROM dec),
              |nstat AS (SELECT min(normsq) AS nmin, max(normsq) AS nmax FROM nb),
              |nq AS (SELECT nb.id, nb.cv0, nb.cv1, CASE WHEN ns.nmax = ns.nmin THEN ns.nmin ELSE
              |    (least(greatest(floor((nb.normsq - ns.nmin)/(ns.nmax - ns.nmin)*16), 0), 15) + 0.5)/16*(ns.nmax - ns.nmin) + ns.nmin END AS nqd
              |  FROM nb, nstat ns),
              |d AS (SELECT q.vec_id AS qid, nq.id,
              |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], q.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |     - 2*(list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |        + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')))
              |    + nq.nqd AS dist
              |  FROM nq CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    ("rq_qnorm_cqint8_search", (s: SparkSession, dir: String) =>
      rqQnormSearch(s, dir,
        graft.index.RqNorms.cqDecode(_, rqNormCq(s, dir, 256))),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, cv0, cv1,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS normsq FROM dec),
              |cq AS (SELECT j, c FROM read_parquet('$AUX/rqnorm_cq8/*.parquet')),
              |nq AS (SELECT id, cv0, cv1, c AS nqd FROM (
              |  SELECT nb.id, nb.cv0, nb.cv1, cq.c, row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.normsq - cq.c), cq.j) AS rn
              |  FROM nb CROSS JOIN cq) t WHERE rn = 1),
              |d AS (SELECT q.vec_id AS qid, nq.id,
              |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], q.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |     - 2*(list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |        + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')))
              |    + nq.nqd AS dist
              |  FROM nq CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    ("rq_qnorm_cqint4_search", (s: SparkSession, dir: String) =>
      rqQnormSearch(s, dir,
        graft.index.RqNorms.cqDecode(_, rqNormCq(s, dir, 16))),
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1,
              |    list_transform(list_zip(c0.c, c1.c), p -> p[1] + p[2]) AS dv
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |nb AS (SELECT id, cv0, cv1,
              |    list_aggregate(list_transform(dv::DOUBLE[], x -> x*x), 'sum') AS normsq FROM dec),
              |cq AS (SELECT j, c FROM read_parquet('$AUX/rqnorm_cq4/*.parquet')),
              |nq AS (SELECT id, cv0, cv1, c AS nqd FROM (
              |  SELECT nb.id, nb.cv0, nb.cv1, cq.c, row_number() OVER (PARTITION BY nb.id ORDER BY abs(nb.normsq - cq.c), cq.j) AS rn
              |  FROM nb CROSS JOIN cq) t WHERE rn = 1),
              |d AS (SELECT q.vec_id AS qid, nq.id,
              |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], q.embedding::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |     - 2*(list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |        + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], nq.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')))
              |    + nq.nqd AS dist
              |  FROM nq CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // ST_LUT_nonorm (`RQ2x4_Nnone`, AdditiveQuantizer.h:60): the
    // inner-product-only LUT mode — similarity = <q,x̂> from L lookups,
    // no norm stored or read, ranked DESCENDING. Oracle replays the
    // decode + dot products from the engine's integer codes.
    ("rq_nonorm_search", (s: SparkSession, dir: String) => {
      val rq = rqModel16(s, dir)
      val q = qDf(s, dir, 10).select(col("qid"), rq.lutCol(col("qvec")).as("lut"))
      rqNormBase(s, dir).crossJoin(broadcast(q))
        .select(col("qid"), col("id"),
          rq.ipFromLutCol(col("codes"), col("lut")).as("_d"))
        .groupBy(col("qid"))
        .agg(topk(col("_d"), col("id"), 5, asc = false).as("_tk"))
        .select(col("qid"), posexplode(col("_tk")).as(Seq("_pos", "_r")))
        .select(col("qid"), (col("_pos") + 1).cast("long").as("rank"),
          col("_r.id").as("id"), round(col("_r.dist"), 4).as("dist"))
    },
      Some(s"""WITH cb AS (SELECT m, j, c FROM read_parquet('$AUX/rq_codebooks/*.parquet')),
              |codes AS (SELECT id, codes FROM read_parquet('$AUX/rq_codes/*.parquet')),
              |dec AS (SELECT codes.id, c0.c AS cv0, c1.c AS cv1
              |  FROM codes JOIN cb c0 ON c0.m = 0 AND c0.j = codes.codes[1]
              |  JOIN cb c1 ON c1.m = 1 AND c1.j = codes.codes[2]),
              |d AS (SELECT q.vec_id AS qid, dec.id,
              |    (list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], dec.cv0::DOUBLE[]), p -> p[1]*p[2]), 'sum')
              |   + list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], dec.cv1::DOUBLE[]), p -> p[1]*p[2]), 'sum')) AS dist
              |  FROM dec CROSS JOIN embeddings q WHERE q.vec_id < 10)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist DESC, id) AS "rank" FROM d) w
              |WHERE "rank" <= 5""".stripMargin)),

    // ST_norm_rq2x4 on the FLAT AQ route (AdditiveQuantizer.h:63; the
    // packed-LUT twin lives in the 4fs family): the stored norm goes
    // through a greedy 2-level 1-D RQ. Oracle = decode replay of the
    // engine-encoded code pairs against the codebook sidecar — the
    // lsq_codes pattern.
    ("rq_qnorm_rq2x4_search", (s: SparkSession, dir: String) => {
      val cb = rqNorm2Cb(s, dir, 0)
      rqQnormSearch(s, dir, n => graft.index.RqNorms.norm2Decode(
        graft.index.RqNorms.rq2EncodeCol(n, cb), cb))
    },
      Some(rqNorm2x4Sql("rq"))),

    // ST_norm_lsq2x4 (AdditiveQuantizer.h:64): same 2-level codec with
    // LSQ-refined codebooks and the exact joint 256-pair assignment
    // (the 1-D fixed point of LocalSearchQuantizer::icm_encode).
    ("rq_qnorm_lsq2x4_search", (s: SparkSession, dir: String) => {
      val cb = rqNorm2Cb(s, dir, 3)
      rqQnormSearch(s, dir, n => graft.index.RqNorms.norm2Decode(
        graft.index.RqNorms.lsq2EncodeCol(n, cb), cb))
    },
      Some(rqNorm2x4Sql("lsq"))),

    // per-partition HNSW graph accelerator (IndexHNSWfast capability,
    // IndexShards merge). Approximate + partitioning-dependent, so no
    // per-row oracle; the driver gate is mean recall@10 vs the exact
    // flat search (both computed in-engine) >= 0.9, with the oracle
    // independently re-deriving the query count from lineitem and
    // asserting the gate boolean — a recall regression flips the hash
    // red (precedent: recall_half_dims). HnswSpec asserts recall too.
    ("hnsw_partition_search", (s: SparkSession, dir: String) => {
      val q = bigQueries(s, dir); val b = bigVecs(s, dir)
      val approx = graft.knn.PartitionedHnsw.knnJoin(q, b, 10,
        m = 16, efConstruction = 64, efSearch = 96)
      val truth = bigTruth(s, dir)
      graft.eval.Recall.perQuery(truth, approx)
        .agg(count(lit(1)).as("n_queries"),
          // vacuously true when the sf yields no big queries (sf0.001)
          coalesce(avg(col("recall")) >= 0.9, lit(true)).as("recall_ge_090"))
    },
      Some(s"""SELECT count(*)::BIGINT AS n_queries, true AS recall_ge_090
              |FROM ($bigVecSql) v WHERE id % 9973 = 1""".stripMargin)),

    // HNSW exact-degenerate: efSearch >= any partition's size makes
    // the greedy beam cover the whole (connected-by-construction)
    // per-partition graph, so the sharded HNSW must reproduce the flat
    // exact search bit-for-bit — an end-to-end driver-gate check of
    // the graph build, beam search, and shard merge. The approximate
    // regime (efSearch << n) stays covered by hnsw_partition_search +
    // HnswSpec's recall bound.
    ("hnsw_exact_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedHnsw.knnJoin(
        qDf(s, dir, 10), bDf(s, dir, 10), 10,
        m = 16, efConstruction = 64, efSearch = 4096)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 10))),

    // ReconstructFromNeighbors estimate_code + reconstruct
    // (faiss/IndexHNSW.cpp:796,639; nsq=1, the constructor default):
    // per vector, the argmin codebook row over reconstruction error
    // from [self, M neighbors] of the deterministic exact kNN graph.
    // The oracle replays the WHOLE chain in SQL: the kNN graph, the
    // beta-weighted vector sums for every codebook row, the error
    // argmin, and the chosen row's error.
    ("reconstruct_neighbors_codes", (s: SparkSession, dir: String) => {
      val base = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val graph = graft.knn.KnnGraph.exact(base, 4)
      val cb = graft.knn.ReconstructFromNeighbors.smoothingCodebook(4, 4)
      graft.knn.ReconstructFromNeighbors.encode(base, graph, cb)
        .select(col("id"), col("code").cast("long").as("code"), r4("err").as("err"))
    },
      Some("""WITH g AS (SELECT src, "rank", dst FROM (
             |  SELECT a.vec_id AS src, b.vec_id AS dst, row_number() OVER (PARTITION BY a.vec_id ORDER BY
             |    list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])^2, b.vec_id) AS "rank"
             |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id) t WHERE "rank" <= 4),
             |tblv AS (SELECT g.src AS id, g."rank" AS pos, b.embedding::DOUBLE[] AS nv
             |         FROM g JOIN embeddings b ON b.vec_id = g.dst
             |         UNION ALL SELECT vec_id, 0, embedding::DOUBLE[] FROM embeddings),
             |betas AS (SELECT j FROM range(0,4) r(j)),
             |contrib AS (SELECT t.id, bt.j,
             |    list_transform(t.nv, x -> x * CASE WHEN t.pos = 0 THEN 1.0
             |      WHEN t.pos = bt.j + 1 THEN 0.1
             |      WHEN t.pos = ((bt.j + 1) % 4) + 1 THEN -0.1 ELSE 0 END) AS wv
             |  FROM tblv t CROSS JOIN betas bt),
             |rc AS (SELECT id, j, i, sum(x) AS v FROM (
             |  SELECT id, j, unnest(wv) AS x, generate_subscripts(wv, 1) AS i FROM contrib) u
             |  GROUP BY id, j, i),
             |recon AS (SELECT id, j, list(v ORDER BY i) AS rv FROM rc GROUP BY id, j),
             |e AS (SELECT r.id, r.j,
             |    list_aggregate(list_transform(list_zip(b.embedding::DOUBLE[], r.rv),
             |      p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS err
             |  FROM recon r JOIN embeddings b ON b.vec_id = r.id)
             |SELECT id, code, round(err, 4) AS err FROM (
             |  SELECT id, j AS code, err, row_number() OVER (PARTITION BY id ORDER BY err, j) AS rn
             |  FROM e) t WHERE rn = 1""".stripMargin)),

    // k_reorder re-rank (ReconstructFromNeighbors, IndexHNSW.cpp:
    // 334-345): HNSW shortlist re-ranked on neighbor reconstructions.
    // Exact-degenerate gate: codebook [[1,0,...]] (k=1 — no codes,
    // IndexHNSW.cpp:846) makes reconstruction == stored vector, and
    // efSearch covers every partition graph, so the re-ranked result
    // must equal the flat exact search — proving the shortlist join,
    // reconstruction distances, and reorder window end-to-end.
    ("hnsw_reconstruct_rerank", (s: SparkSession, dir: String) => {
      val q = qDf(s, dir, 10); val b = bDf(s, dir, 10)
      val graph = graft.knn.KnnGraph.exact(b, 4)
      val recon = graft.knn.ReconstructFromNeighbors.encode(
        b, graph, Array(Array(1f, 0f, 0f, 0f, 0f)))
      val stage1 = graft.knn.PartitionedHnsw.knnJoin(q, b, 10,
        m = 16, efConstruction = 64, efSearch = 4096)
      graft.knn.ReconstructFromNeighbors.rerank(stage1, q, recon, kReorder = 10)
        .withColumn("dist", r4("dist"))
    },
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 10))),

    // per-partition NSG (IndexNSG capability, faiss/IndexNSG.h:26) —
    // exact-degenerate gate: searchL >= any partition's size seeds the
    // full candidate pool in LocalNsg.searchOnGraph, so the sharded
    // NSG must reproduce the flat exact search bit-for-bit. An
    // end-to-end driver gate on the kNN-graph bootstrap, MRNG prune,
    // tree_grow connectivity fix, graph search, and shard merge.
    ("nsg_exact_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedNsg.knnJoin(
        qDf(s, dir, 10), bDf(s, dir, 10), 10,
        gk = 16, r = 16, buildL = 32, searchL = 4096)
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10", 10))),

    // Filtered graph search — the fork's IDSelector-inside-HNSW
    // headline (faiss/IndexHNSWfast.h:87 remove_ids, :99 search with
    // SearchParameters): the predicate is pushed BELOW the per-
    // partition graph build, so the graph contains only admissible
    // points; with the exact-degenerate efSearch the result must be
    // bit-identical to the filtered flat search.
    ("hnsw_filtered_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedHnsw.knnJoin(
        qDf(s, dir, 10), bDf(s, dir, 10), 10,
        m = 16, efConstruction = 64, efSearch = 4096,
        filter = Some(pmod(col("id"), lit(3)) === 0))
        .withColumn("dist", r4("dist")),
      Some(knnOracle(dL2, "q.vec_id < 10", "b.vec_id >= 10 AND b.vec_id % 3 = 0", 10))),

    // HNSW over SQ8 code storage (IndexHNSWSQ, faiss/IndexHNSW.h:168,
    // factory "HNSW16,SQ8"): each partition's graph stores
    // 1-byte-per-dim codes and decodes inside the distance
    // (LocalHnswSq) — 4x less executor memory per graph shard. Exact-
    // degenerate gate: efSearch >= any partition's size makes the
    // asymmetric ADC beam cover the whole graph, so the result must
    // equal the flat SQ8 ADC scan bit-for-bit (the sq8_knn oracle
    // verbatim: same trained range, same codes, same kernel).
    ("hnsw_sq_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedHnsw.knnJoinSq(
        qDf(s, dir, 10), bDf(s, dir, 10), 5,
        m = 16, efConstruction = 64, efSearch = 4096)
        .withColumn("dist", r4("dist")),
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
             |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
             |  FROM qd) w WHERE "rank" <= 5""".stripMargin)),

    // HNSW-SQ8 approximate regime at 600k-row scale: recall@10 vs the
    // FLOAT exact truth (the verdict-prescribed basis — the gate spans
    // both the graph approximation and the SQ8 quantization error).
    ("hnsw_sq_big", (s: SparkSession, dir: String) => {
      val q = bigQueries(s, dir); val b = bigVecs(s, dir)
      val approx = graft.knn.PartitionedHnsw.knnJoinSq(q, b, 10,
        m = 16, efConstruction = 64, efSearch = 96)
      val truth = bigTruth(s, dir)
      graft.eval.Recall.perQuery(truth, approx)
        .agg(count(lit(1)).as("n_queries"),
          coalesce(avg(col("recall")) >= 0.85, lit(true)).as("recall_ge_085"))
    },
      Some(s"""SELECT count(*)::BIGINT AS n_queries, true AS recall_ge_085
              |FROM ($bigVecSql) v WHERE id % 9973 = 1""".stripMargin)),

    // HNSW over PQ code storage (IndexHNSWPQ, faiss/IndexHNSW.h:152,
    // factory "HNSW16,PQ8"): each partition's graph stores M-byte PQ
    // codes (LocalHnswPq) — symmetric sdc-table distances for
    // construction, per-query ADC LUT for search, arithmetic identical
    // to the flat PQ path (PqKernels.lut + adcFromLut term for term).
    // Exact-degenerate gate: efSearch >= any partition's size makes
    // the beam cover the whole graph, so the result must equal the
    // flat IndexPQ ADC scan bit-for-bit — the pq_adc_search oracle
    // verbatim (same trained pq16 codebooks sidecar).
    ("hnsw_pq_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedHnsw.knnJoinPq(
        qDf(s, dir, 10), bDf(s, dir, 10), 10, pq16(s, dir).model,
        m = 16, efConstruction = 64, efSearch = 4096)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pq16_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // NSG over PQ code storage (IndexNSGPQ, faiss/IndexNSG.h:83,
    // factory "NSG32,PQ8"): LocalNsgPq — sdc-table build distances,
    // per-query ADC LUT search. Exact-degenerate gate: searchL >= any
    // partition's size over the connected graph must equal the flat
    // IndexPQ ADC scan — the pq_adc_search oracle verbatim (same
    // trained pq16 codebooks sidecar as hnsw_pq_search).
    ("nsg_pq_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedNsg.knnJoinPq(
        qDf(s, dir, 10), bDf(s, dir, 10), 10, pq16(s, dir).model,
        gk = 32, r = 32, buildL = 64, searchL = 4096)
        .withColumn("dist", r4("dist")),
      Some(s"""WITH cb AS (SELECT m, j, c::DOUBLE[] AS c FROM read_parquet('$AUX/pq16_codebooks/*.parquet')),
              |bsub AS (SELECT vec_id AS id, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id >= 10),
              |enc AS (SELECT id, m, j FROM (
              |  SELECT b.id, b.m, cb.j, row_number() OVER (PARTITION BY b.id, b.m ORDER BY
              |    list_aggregate(list_transform(list_zip(b.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'), cb.j) AS rn
              |  FROM bsub b JOIN cb ON cb.m = b.m) t WHERE rn = 1),
              |qsub AS (SELECT vec_id AS qid, r.m AS m, embedding[r.m*8+1:r.m*8+8]::DOUBLE[] AS sv
              |         FROM embeddings, range(0,8) r(m) WHERE vec_id < 10),
              |lut AS (SELECT q.qid, q.m, cb.j,
              |    list_aggregate(list_transform(list_zip(q.sv, cb.c), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS pd
              |  FROM qsub q JOIN cb ON cb.m = q.m),
              |adc AS (SELECT l.qid, e.id, list_aggregate(list(l.pd ORDER BY l.m), 'sum') AS dist
              |  FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.j GROUP BY l.qid, e.id)
              |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
              |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank" FROM adc) w
              |WHERE "rank" <= 10""".stripMargin)),

    // NSG over SQ8 code storage (IndexNSGSQ, faiss/IndexNSG.h:91,
    // factory "NSG32,SQ8"): each partition's NSG stores 1-byte-per-dim
    // codes and decodes inside the distance (LocalNsgSq). Exact-
    // degenerate gate: searchL >= any partition's size seeds the full
    // pool over a CONNECTED graph, so the asymmetric ADC ranking must
    // equal the flat SQ8 scan bit-for-bit — the same decode-replay
    // oracle as hnsw_sq_search (both degenerate to the identical flat
    // SQ8 ADC ranking: same trained range, same codes, same kernel).
    ("nsg_sq_search", (s: SparkSession, dir: String) =>
      graft.knn.PartitionedNsg.knnJoinSq(
        qDf(s, dir, 10), bDf(s, dir, 10), 5,
        gk = 32, r = 32, buildL = 64, searchL = 4096)
        .withColumn("dist", r4("dist")),
      Some("""WITH dims AS (
             |  SELECT list(mn ORDER BY i) AS vmn, list(mx - mn ORDER BY i) AS vd FROM (
             |    SELECT i, min(e) AS mn, max(e) AS mx
             |    FROM (SELECT unnest(embedding::DOUBLE[]) AS e, generate_subscripts(embedding, 1) AS i
             |          FROM embeddings WHERE vec_id >= 10) u GROUP BY i) t),
             |dec AS (SELECT vec_id AS id,
             |  list_transform(embedding::DOUBLE[], (x, i) ->
             |    vmn[i] + (floor(255 * (CASE WHEN vd[i] = 0 THEN 0
             |      ELSE least(greatest((x - vmn[i]) / vd[i], 0), 1) END)) + 0.5) / 255 * vd[i]) AS dv
             |  FROM embeddings, dims WHERE vec_id >= 10),
             |qd AS (SELECT q.vec_id AS qid, b.id AS id,
             |  list_aggregate(list_transform(list_zip(q.embedding::DOUBLE[], b.dv),
             |    p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dist
             |  FROM embeddings q CROSS JOIN dec b WHERE q.vec_id < 10)
             |SELECT qid, "rank", id, round(dist, 4) AS dist FROM (
             |  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS "rank"
             |  FROM qd) w WHERE "rank" <= 5""".stripMargin)),

    // NSG approximate regime at 600k-row scale: driver gate is mean
    // recall@10 vs the exact flat search >= 0.9 (same pattern as
    // hnsw_partition_search; the oracle re-derives the query count and
    // asserts the gate boolean — a recall regression flips the hash).
    ("nsg_partition_search", (s: SparkSession, dir: String) => {
      val q = bigQueries(s, dir); val b = bigVecs(s, dir)
      val approx = graft.knn.PartitionedNsg.knnJoin(q, b, 10,
        gk = 32, r = 32, buildL = 64, searchL = 96)
      val truth = bigTruth(s, dir)
      graft.eval.Recall.perQuery(truth, approx)
        .agg(count(lit(1)).as("n_queries"),
          coalesce(avg(col("recall")) >= 0.9, lit(true)).as("recall_ge_090"))
    },
      Some(s"""SELECT count(*)::BIGINT AS n_queries, true AS recall_ge_090
              |FROM ($bigVecSql) v WHERE id % 9973 = 1""".stripMargin)),

    // IndexNNDescent searched as an index (faiss/IndexNNDescent.h:23):
    // the raw (unpruned) per-partition kNN graph IS the search
    // structure, walked by the same search_on_graph. Gate: recall@10
    // vs exact >= 0.8 (the reference's own NNDescent tests gate on
    // recall, tests/test_index_accuracy.py pattern).
    ("nndescent_index_search", (s: SparkSession, dir: String) => {
      val q = bigQueries(s, dir); val b = bigVecs(s, dir)
      val approx = graft.knn.PartitionedNsg.knnJoin(q, b, 10,
        gk = 32, r = 32, buildL = 64, searchL = 96, pruneToNsg = false)
      val truth = bigTruth(s, dir)
      graft.eval.Recall.perQuery(truth, approx)
        .agg(count(lit(1)).as("n_queries"),
          coalesce(avg(col("recall")) >= 0.8, lit(true)).as("recall_ge_080"))
    },
      Some(s"""SELECT count(*)::BIGINT AS n_queries, true AS recall_ge_080
              |FROM ($bigVecSql) v WHERE id % 9973 = 1""".stripMargin)),

    // sanity: classic aggregation pipeline (partial agg + shuffle)
    ("q1_agg", (s: SparkSession, dir: String) =>
      lineitem(s, dir).groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        round(sum(col("l_quantity")), 1).as("sum_qty"),
        count(lit(1)).as("cnt"),
        round(avg(col("l_extendedprice")), 2).as("avg_price")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 1) AS sum_qty,
             |  count(*) AS cnt, round(avg(l_extendedprice), 2) AS avg_price
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin))
  )

  // ListMap: Verify/Bench iterate in CATALOG order, so build-timing
  // queries (ivf_build_big) deterministically precede the searches
  // that reuse their memoized index — search timings measure search.
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      catalog.map { case (n, f, _) => n -> f }: _*)

  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      catalog.collect { case (n, _, Some(sql)) => n -> sql }: _*)
}
