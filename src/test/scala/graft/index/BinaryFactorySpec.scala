package graft.index

import graft.SparkTestBase
import graft.functions.sign_bits
import org.apache.spark.sql.functions._

/** index_binary_factory analog (faiss/index_factory.cpp:889):
  * BFlat | BIVF<nlist> | BHash<b> over packed binary codes. */
class BinaryFactorySpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private def codes = emb.select(col("vec_id").as("id"),
    sign_bits(col("embedding")).as("code"))
  private def q = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), sign_bits(col("embedding")).as("qcode"))

  private def results(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("BFlat equals the direct Hamming knnJoin") {
    val built = IndexFactory.buildBinary(codes, "id", "code", 64, "BFlat")
    assert(results(built.search(q, 5)) ==
      results(BinaryFlat.knnJoin(q, codes, 5)))
  }

  test("BIVF with nprobe = nlist reproduces the flat search") {
    val built = IndexFactory.buildBinary(codes, "id", "code", 64, "BIVF4", niter = 3)
    assert(results(built.search(q, 5, nprobe = 4)) ==
      results(BinaryFlat.knnJoin(q, codes, 5)))
  }

  test("BIVF_HNSW coarse (index_factory.cpp:895-900): exact-degenerate == BIVF") {
    // efSearch (= max(32, 4*np)) >= nlist=4 covers the whole centroid
    // graph, so the HNSW walk must select the exact Hamming probe set
    // and reproduce the plain BIVF result at every nprobe
    val plain = IndexFactory.buildBinary(codes, "id", "code", 64, "BIVF4", niter = 3)
    val hnsw = IndexFactory.buildBinary(codes, "id", "code", 64, "BIVF4_HNSW8", niter = 3)
    for (np <- Seq(1, 2, 4)) {
      assert(results(hnsw.search(q, 5, nprobe = np)) ==
        results(plain.search(q, 5, nprobe = np)), s"nprobe=$np")
    }
  }

  test("BHash buckets by bit prefix; every query finds itself") {
    val built = IndexFactory.buildBinary(codes, "id", "code", 64, "BHash8")
    val top = built.search(q, 1, nprobe = 1)
      .filter(col("rank") === 1).select("qid", "id", "hd").collect()
    assert(top.length == 5)
    // a query is its own bucket-mate at Hamming 0
    assert(top.forall(_.getLong(2) == 0L))
  }

  test("float factory LSH32 builds and self-matches at Hamming 0") {
    val data = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val built = IndexFactory.build(data, "id", "vec", "LSH32", niter = 2)
    val fq = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = built.search(fq, 1).filter(col("rank") === 1)
      .select("qid", "id", "hd").collect()
    assert(top.length == 5 && top.forall(_.getLong(2) == 0L))
    assert(IndexFactory.codeSize("LSH32", 64) == 4)
  }

  test("BHNSW with generous efSearch equals the flat Hamming search") {
    // Hamming on 0/1-unpacked bits == squared L2; k=32 pushes the
    // factory's efSearch (4k = 128) past the ~125-row partition size,
    // so the beam covers every (connected-by-construction) partition
    // graph -> exact, including tie order (both paths break on id)
    val built = IndexFactory.buildBinary(codes, "id", "code", 64, "BHNSW16")
    assert(results(built.search(q, 32)) ==
      results(BinaryFlat.knnJoin(q, codes, 32)))
  }

  test("multi-hash BHash4x8: superset of single-table candidates, self at 0") {
    val built = IndexFactory.buildBinary(codes, "id", "code", 64, "BHash4x8")
    val top = built.search(q, 1).filter(col("rank") === 1)
      .select("qid", "id", "hd").collect()
    assert(top.length == 5)
    assert(top.forall(_.getLong(2) == 0L))
    // table 0 keys on the same bit range as BHash8: every single-table
    // bucket-mate must appear among the multi-hash candidates, so at
    // equal k the multi-hash hd can only be <= the single-table hd
    val single = IndexFactory.buildBinary(codes, "id", "code", 64, "BHash8")
      .search(q, 3).groupBy("qid").agg(max(col("hd")).as("h1"))
    val multi = built.search(q, 3).groupBy("qid").agg(max(col("hd")).as("hn"))
    val joined = single.join(multi, "qid")
      .filter(col("hn") > col("h1")).count()
    assert(joined == 0, "multi-hash recall fell below the single-table path")
  }

  test("IndexBinaryFromFloat over exact-degenerate IVF equals flat Hamming") {
    // codes -> ±1 floats -> float IVF(nprobe=nlist, exact) -> /4 = hd
    val bff = IndexFactory.buildBinaryFromFloat(
      codes, "id", "code", 64, "IVF4,Flat", niter = 3)
    val got = bff.search(q, 5, nprobe = 4)
    assert(results(got) == results(BinaryFlat.knnJoin(q, codes, 5)))
    // distances are EXACT Hamming, not an approximation
    val hd = got.select("qid", "id", "hd").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val flat = BinaryFlat.knnJoin(q, codes, 5).select("qid", "id", "hd")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(hd == flat)
  }

  test("binary IVF range search composes with the HNSW coarse (exact-degenerate)") {
    // same contract as the float side: efSearch >= nlist walks the
    // whole centroid graph, so the radius results equal the exact
    // coarse ranking's
    val idx = BinaryIvfIndex.buildFromCodes(codes, "id", "code", 64,
      nlist = 4, niter = 3)
    def rset(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rset(idx.rangeSearch(q, maxHamming = 20, nprobe = 2))
    val got = rset(idx.rangeSearch(q, maxHamming = 20, nprobe = 2,
      hnswCoarse = Some(1024)))
    assert(got == want)
  }

  test("multi-hash BHash9x8 over a 64-bit code is rejected") {
    val e = intercept[IllegalArgumentException] {
      IndexFactory.buildBinary(codes, "id", "code", 64, "BHash9x8")
    }
    assert(e.getMessage.contains("code bits"))
  }
}
